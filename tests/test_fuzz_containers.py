"""Mutation fuzz over every container parser.

Contract under test: for ANY byte mutation of a valid file (or pure
random bytes), `sniff_container` / `read_audio` / `read_audio_info` /
`open_source` either succeed or raise ValueError/OSError subclasses —
never IndexError/struct.error/KeyError/ZeroDivisionError tracebacks,
never hangs, never native crashes.  The serving runtime's
probe-and-fallback depends on exactly this contract
(convolve-file-handler.cc:62-76's sf_open probe analog).
"""

import io

import numpy as np
import pytest

from folve_tpu.audio import read_audio, read_audio_info, sniff_container
from folve_tpu.audio.source import open_source

RATE = 44100
_OK_ERRORS = (ValueError, OSError, EOFError)


def _fixtures(tmp_path, rng):
    """One small valid file per container we parse."""
    x = np.round(rng.uniform(-0.4, 0.4, (700, 2)).astype(np.float32)
                 * 32768) / 32768
    mono = x[:, :1]
    out = {}

    from folve_tpu.audio.flac import write_flac

    p = tmp_path / "f.flac"
    write_flac(str(p), x, RATE, bits=16)
    out["flac"] = p.read_bytes()

    from folve_tpu.audio.wav import write_wav
    from folve_tpu.audio.types import SampleCodec

    p = tmp_path / "f.wav"
    write_wav(str(p), x, RATE, SampleCodec.PCM_16)
    out["wav"] = p.read_bytes()

    from folve_tpu.audio.aiff import write_aiff

    p = tmp_path / "f.aiff"
    write_aiff(str(p), x, RATE, bits=16)
    out["aiff"] = p.read_bytes()

    from folve_tpu.audio.au import write_au
    from folve_tpu.audio.caf import write_caf
    from folve_tpu.audio.w64 import write_w64

    for name, writer in (("au", write_au), ("caf", write_caf),
                         ("w64", write_w64)):
        p = tmp_path / f"f.{name}"
        writer(str(p), x, RATE, bits=16)
        out[name] = p.read_bytes()

    # legacy encoders
    from folve_tpu.audio.legacy import (
        AvrStreamEncoder,
        IrcamStreamEncoder,
        NistStreamEncoder,
        PafStreamEncoder,
        PvfStreamEncoder,
        VocStreamEncoder,
    )

    for name, enc_cls in (("voc", VocStreamEncoder),
                          ("ircam", IrcamStreamEncoder),
                          ("nist", NistStreamEncoder),
                          ("pvf", PvfStreamEncoder),
                          ("paf", PafStreamEncoder),
                          ("avr", AvrStreamEncoder)):
        enc = enc_cls(RATE, 2, 16, x.shape[0])
        out[name] = enc.header() + enc.write_float(x) + enc.finish()

    # mp3 / mp2 via lame/twolame when present
    try:
        from folve_tpu.tools.mp3_oracle import (
            lame_available,
            lame_encode,
            twolame_available,
            twolame_encode,
        )

        if lame_available():
            out["mp3"] = lame_encode(mono, RATE, 128)
        if twolame_available():
            out["mp2"] = twolame_encode(x, RATE, 192)
    except Exception:
        pass

    # ogg-flac via the test muxer
    from tests.test_oggflac import make_ogg_flac

    p = tmp_path / "f.oga"
    make_ogg_flac(str(p), x, rate=RATE)
    out["oggflac"] = p.read_bytes()
    return out


def _probe(path):
    try:
        sniff_container(str(path))
    except _OK_ERRORS:
        pass
    try:
        read_audio_info(str(path))
    except _OK_ERRORS:
        pass
    try:
        data, _ = read_audio(str(path))
        assert data.shape[0] < 10_000_000  # no absurd allocations
    except _OK_ERRORS:
        pass
    try:
        src = open_source(str(path))
        if src is not None:
            for _ in range(4):
                if src.read_float(4096).shape[0] == 0:
                    break
            src.close()
    except _OK_ERRORS:
        pass


def test_fuzz_mutations(tmp_path, rng):
    """Byte flips, truncations and block shuffles of valid files."""
    fixtures = _fixtures(tmp_path, rng)
    work = tmp_path / "m.bin"
    for name, blob in fixtures.items():
        arr = bytearray(blob)
        n = len(arr)
        for trial in range(60):
            mutated = bytearray(arr)
            kind = trial % 4
            if kind == 0:  # random byte flips (headers biased)
                for _ in range(int(rng.integers(1, 8))):
                    i = int(rng.integers(0, min(n, 4096)))
                    mutated[i] = int(rng.integers(0, 256))
            elif kind == 1:  # flips anywhere
                for _ in range(int(rng.integers(1, 16))):
                    i = int(rng.integers(0, n))
                    mutated[i] = int(rng.integers(0, 256))
            elif kind == 2:  # truncation
                mutated = mutated[: int(rng.integers(0, n))]
            else:  # splice a random window over another offset
                if n > 64:
                    a = int(rng.integers(0, n - 32))
                    b = int(rng.integers(0, n - 32))
                    ln = int(rng.integers(1, 32))
                    mutated[b : b + ln] = mutated[a : a + ln]
            work.write_bytes(bytes(mutated))
            _probe(work)


def test_fuzz_random_bytes(tmp_path, rng):
    """Pure garbage, including magic-prefixed garbage."""
    magics = [b"", b"fLaC", b"RIFF", b"OggS", b"FORM", b".snd", b"caff",
              b"Creative Voice File\x1a", b"NIST_1A\n", b"PVF1\n",
              b"\x64\xa3\x03\x00", b"ID3\x03\x00\x00", b"\xff\xfb",
              b"RIFF\xff\xff\xff\xffWAVE", b"FORM\x00\x00\x00\x0861SV",
              b" paf", b"fap ", b"2BIT", b"ALawSoundFile**\x00",
              b"MATLAB 5.0 MAT-file", b"\xf0\x7e\x00\x01", b"\x01\x04",
              b"\x00\x00\x01\xf4\x00\x00\x02\x71\x00\x02\x00\x00",
              b"\x00\x00\x00\x00\x01\x00\x00\x00\x01\x00\x00\x00"
              b"\x00\x00\x00\x00\x0b\x00\x00\x00samplerate\x00"]
    work = tmp_path / "g.bin"
    for magic in magics:
        for size in (0, 3, 12, 64, 700, 5000):
            blob = magic + bytes(rng.integers(0, 256, size, dtype=np.uint8))
            work.write_bytes(blob)
            _probe(work)


def test_cross_sniff_matrix(tmp_path, rng):
    """Every fixture sniffs as ITS OWN container — none of the
    weak-magic formats (HTK size-consistency, MPC2000 2-byte magic,
    MP3 sync scan) may claim another container's file."""
    from folve_tpu.audio import Container

    expect = {"flac": Container.FLAC, "wav": Container.WAV,
              "aiff": Container.AIFF, "au": Container.AU,
              "w64": Container.W64, "caf": Container.CAF,
              "voc": Container.VOC, "ircam": Container.IRCAM,
              "nist": Container.NIST, "pvf": Container.PVF,
              "paf": Container.PAF, "avr": Container.AVR,
              "mp3": Container.MP3, "mp2": Container.MP3,
              "oggflac": Container.OGG}
    fixtures = _fixtures(tmp_path, rng)
    work = tmp_path / "x.bin"  # extension must not matter (except .sd2)
    for name, blob in fixtures.items():
        work.write_bytes(blob)
        got = sniff_container(str(work))
        assert got == expect[name], (name, got)
