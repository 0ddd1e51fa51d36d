"""Apple Lossless (ALAC) in CAF.

Reference parity: libsndfile 1.1 bundles Apple's ALAC codec, so the
reference convolves CAF/alac files (probe at
convolve-file-handler.cc:62-76).  Ours is a from-scratch decoder
(native/alac_codec.cc, semantics recovered behaviorally — see
tools/alac_probe.py).  Being lossless, the encoder's input is an exact
oracle: every intact stream must decode bit-identically.

Known oracle bugs we do NOT reproduce: the bundled libsndfile ENCODER
destroys escape (verbatim) frames at 20/24-bit (stores mixed top bytes
only — its own decoder can't round-trip them either, mangling negative
right-channel samples to +255).  Intact high-depth escape streams
(32-bit) DO round-trip losslessly here.
"""

import ctypes
import os

import numpy as np
import pytest

from folve_tpu.audio import Container, read_audio, read_audio_info, sniff_container
from folve_tpu.audio.source import open_source
from folve_tpu.audio.types import SampleCodec

from tests.test_extra_formats import _sf, _sf_read, _sf_write

SF_CAF = 0x180000
SUB = {16: 0x0070, 20: 0x0071, 24: 0x0072, 32: 0x0073}
RATE = 44100


def _sf_write_int(path, vals, bits, rate=RATE):
    """Write exact integer samples (at `bits` depth) through the oracle
    encoder via the int API — the float API's ALAC conversion is lossy
    in the bundled build."""
    lib = _sf()
    if not hasattr(lib, "sf_writef_int"):
        pass
    lib.sf_writef_int.restype = ctypes.c_int64
    lib.sf_writef_int.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64]
    info = lib.SfInfo(frames=0, samplerate=rate, channels=vals.shape[1],
                      format=SF_CAF | SUB[bits], sections=0, seekable=0)
    snd = lib.sf_open(str(path).encode(), 0x20, ctypes.byref(info))
    assert snd, "sf_open write failed"
    ints32 = np.ascontiguousarray(
        np.asarray(vals, np.int64) << (32 - bits), np.int32)
    assert lib.sf_writef_int(snd, ints32.ctypes.data, vals.shape[0]) == vals.shape[0]
    lib.sf_close(snd)


def _vals(rng, n, ch, bits, kind="mixed"):
    grid = (1 << (bits - 1)) - 1
    t = np.arange(n) / RATE
    base = 0.4 * np.sin(2 * np.pi * 330 * t)
    if kind == "mixed":
        x = base[:, None] * np.linspace(1.0, 0.6, ch)[None, :]
        x = x + 0.02 * rng.standard_normal((n, ch))
    elif kind == "noise":
        x = rng.uniform(-0.35, 0.35, (n, ch))
    elif kind == "quiet":
        return np.round(rng.uniform(-30, 30, (n, ch))).astype(np.int64)
    return np.round(np.clip(x, -1, 1) * grid).astype(np.int64)


@pytest.mark.parametrize("bits", [16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2])
def test_lossless_roundtrip(tmp_path, rng, bits, ch):
    vals = _vals(rng, 30000, ch, bits)
    p = tmp_path / "t.caf"
    _sf_write_int(p, vals, bits)
    assert sniff_container(str(p)) == Container.CAF

    info = read_audio_info(str(p))
    assert info.codec == SampleCodec.ALAC
    assert info.rate == RATE and info.channels == ch
    assert info.bits_per_sample == bits and info.frames == 30000

    got, _ = read_audio(str(p))
    g = np.round(np.asarray(got, np.float64) * (1 << (bits - 1))).astype(np.int64)
    # The serving pipeline is float32 end to end (the reference reads
    # through sf_readf_float too) — at 32-bit the float path carries the
    # float32 rounding of each sample, at <=24-bit it is exact.
    expect = vals if bits <= 24 else (
        np.asarray(vals, np.float64).astype(np.float32).astype(np.int64))
    np.testing.assert_array_equal(g, expect)


@pytest.mark.parametrize("bits", [16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2])
def test_decoder_bit_exact_int(tmp_path, rng, bits, ch):
    """The native decoder itself is LOSSLESS at every depth: packet-level
    int32 output equals the encoder's input exactly (no float involved)."""
    from folve_tpu.audio.alac import _caf_alac_layout, _lib

    vals = _vals(rng, 30000, ch, bits)
    p = tmp_path / "t.caf"
    _sf_write_int(p, vals, bits)
    with open(p, "rb") as f:
        cfg, _rate, pkts, n_valid, priming = _caf_alac_layout(f)
        lib = _lib()
        h = lib.folve_alac_create(cfg["frame_length"], cfg["bit_depth"],
                                  cfg["pb"], cfg["mb"], cfg["kb"],
                                  cfg["channels"])
        assert h
        buf = np.empty(cfg["frame_length"] * ch, np.int32)
        out = []
        try:
            for off, size in pkts:
                f.seek(off)
                raw = f.read(size)
                n = lib.folve_alac_decode_packet(
                    h, raw, len(raw), buf.ctypes.data_as(ctypes.c_void_p))
                assert n > 0
                out.append(buf[: n * ch].reshape(-1, ch).astype(np.int64))
        finally:
            lib.folve_alac_close(h)
    dec = np.concatenate(out)[priming:priming + n_valid]
    np.testing.assert_array_equal(dec, vals)


@pytest.mark.parametrize("ch", [1, 2])
def test_alac_20bit_compressible(tmp_path, rng, ch):
    """20-bit ALAC decodes bit-exactly on compressible material.  The
    oracle ENCODER corrupts escape (verbatim) frames at 20-bit — it
    stores 16-bit-wide raw samples and its own decoder reads back
    garbage (see the native decoder's header note) — so material here
    is gentle enough that every frame stays compressed; at stereo even
    moderate noise trips the escape, hence the quiet noise floor."""
    t = np.arange(30000) / RATE
    x = 0.4 * np.sin(2 * np.pi * np.array([330.0, 523.0])[:ch] * t[:, None])
    x += 0.0005 * rng.standard_normal((30000, ch))
    vals = np.round(np.clip(x, -1, 1) * ((1 << 19) - 1)).astype(np.int64)
    p = tmp_path / "t20.caf"
    _sf_write_int(p, vals, 20)
    got, info = read_audio(str(p))
    assert info.bits_per_sample == 20 and info.frames == 30000
    g = np.round(np.asarray(got, np.float64) * (1 << 19)).astype(np.int64)
    np.testing.assert_array_equal(g, vals)


def test_quiet_zero_runs(tmp_path, rng):
    """Near-silence exercises the zero-run entropy mode heavily."""
    vals = _vals(rng, 30000, 2, 16, kind="quiet")
    vals[5000:12000] = 0  # long exact-zero span
    p = tmp_path / "q.caf"
    _sf_write_int(p, vals, 16)
    got, _ = read_audio(str(p))
    g = np.round(np.asarray(got, np.float64) * 32768).astype(np.int64)
    np.testing.assert_array_equal(g, vals)


def test_matches_oracle_decode_float_path(tmp_path, rng):
    """Files written through the oracle's float API decode identically
    to the oracle's own decoder (even where its encode-side conversion
    is quirky)."""
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(60000) / RATE)
         + 0.05 * rng.standard_normal(60000)).astype(np.float32)
    x = np.stack([x, 0.7 * x], 1)
    p = tmp_path / "f.caf"
    _sf_write(p, x, RATE, SF_CAF | SUB[16])
    oracle, orate = _sf_read(p)
    got, info = read_audio(str(p))
    assert orate == RATE and got.shape == oracle.shape
    np.testing.assert_array_equal(
        np.round(got * 32768), np.round(oracle * 32768))


def test_stream_matches_whole_and_seeks(tmp_path, rng):
    vals = _vals(rng, 50000, 2, 16)
    p = tmp_path / "s.caf"
    _sf_write_int(p, vals, 16)
    whole, _ = read_audio(str(p))

    src = open_source(str(p))
    assert src is not None and src.info.codec == SampleCodec.ALAC
    chunks, sizes = [], [1, 4095, 4096, 4097, 333, 1 << 15]
    i = 0
    while True:
        blk = src.read_float(sizes[i % len(sizes)])
        i += 1
        if blk.shape[0] == 0:
            break
        chunks.append(blk)
    np.testing.assert_array_equal(np.concatenate(chunks), whole)

    # packets are stateless: random access both directions is exact
    for target in (30000, 100, 49990, 4096, 4095):
        src.seek(target)
        blk = src.read_float(64)
        np.testing.assert_array_equal(blk, whole[target:target + 64])
    src.close()


def test_truncated_file_short_decodes(tmp_path, rng):
    """Chopping the data chunk mid-packet must short-decode (drop the
    mangled tail packet), never hang or error out of read_audio."""
    vals = _vals(rng, 30000, 2, 16)
    p = tmp_path / "t.caf"
    _sf_write_int(p, vals, 16)
    blob = open(p, "rb").read()
    p2 = tmp_path / "cut.caf"
    p2.write_bytes(blob[: len(blob) - len(blob) // 4])

    got, info = read_audio(str(p2))
    assert 0 < got.shape[0] <= 30000
    g = np.round(np.asarray(got, np.float64) * 32768).astype(np.int64)
    np.testing.assert_array_equal(g, vals[: g.shape[0]])


def test_alac_through_filesystem(tmp_path, rng):
    """An ALAC CAF convolves (pure bundled-codec territory in the
    reference) and comes back out as CAF."""
    from tests.test_runtime import make_fs, read_all

    vals = _vals(rng, 20000, 2, 16)
    conf = (
        "/convolver/new 2 2 64 512\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    fs, src_dir = make_fs(tmp_path, conf_text=conf)
    _sf_write_int(src_dir / "song.caf", vals, 16)
    h = fs.get_or_create_handler("/song.caf")
    blob = read_all(h)
    fs.close_handler("/song.caf", h)
    assert blob[:4] == b"caff"
    out = tmp_path / "out.caf"
    out.write_bytes(blob)
    got, info = read_audio(str(out))
    assert info.frames == 20000
    np.testing.assert_allclose(
        got, 0.5 * vals.astype(np.float64) / 32768, atol=2.5 / 32768)
