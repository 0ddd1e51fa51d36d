"""GSM 6.10 decode (WAV "WAV49", AIFC "GSM ", W64).

Reference parity: the reference convolves anything libsndfile decodes
(convolve-file-handler.cc:62-76), and libsndfile links libgsm for the
GSM610 subtype.  Ours is a from-scratch ETSI 06.10 fixed-point decoder
(native/gsm_codec.cc) — the spec's saturating 16-bit arithmetic is
deterministic, so output must be SAMPLE-EXACT against libsndfile's
libgsm, which these tests assert.

Frame-count note: for WAV49 libsndfile reports (and "reads") one extra
phantom 320-sample block past the coded data — decoding garbage at the
tail (observed full-scale samples past EOF).  We report the true
ceil(data_bytes / 65) * 320 instead; the comparison tests therefore
compare over OUR frame count, which is the coded content.
"""

import os

import numpy as np
import pytest

from folve_tpu.audio import Container, read_audio, read_audio_info, sniff_container
from folve_tpu.audio.source import open_source
from folve_tpu.audio.types import SampleCodec

from tests.test_extra_formats import _sf_read, _sf_write

SF_WAV, SF_AIFF, SF_W64, SF_GSM = 0x010000, 0x020000, 0x0B0000, 0x0020
RATE = 8000  # classic GSM rate; the codec itself is rate-agnostic


def _speech(rng, seconds=2.1):
    """Speech-like mono material (GSM is tuned for speech; white noise
    at full scale saturates the APCM and hides decode bugs)."""
    t = np.arange(int(RATE * seconds)) / RATE
    x = 0.4 * np.sin(2 * np.pi * 220 * t) * np.exp(-((t % 0.5) - 0.25) ** 2 * 40)
    x += 0.05 * rng.standard_normal(t.size)
    return x.astype(np.float32).reshape(-1, 1)


@pytest.mark.parametrize("ext,fmt,container", [
    ("wav", SF_WAV, Container.WAV),
    ("aiff", SF_AIFF, Container.AIFF),
    ("w64", SF_W64, Container.W64),
])
def test_sample_exact_vs_libgsm(tmp_path, rng, ext, fmt, container):
    p = tmp_path / f"t.{ext}"
    _sf_write(p, _speech(rng), RATE, fmt | SF_GSM)
    assert sniff_container(str(p)) == container

    info = read_audio_info(str(p))
    assert info.codec == SampleCodec.GSM610
    assert info.channels == 1 and info.rate == RATE
    assert info.bits_per_sample == 16

    got, _ = read_audio(str(p))
    oracle, orate = _sf_read(p)
    assert orate == RATE
    n = got.shape[0]
    assert n == info.frames and n >= oracle.shape[0] - 320
    np.testing.assert_array_equal(
        np.round(got[:, 0] * 32768), np.round(oracle[:n, 0] * 32768)
    )


@pytest.mark.parametrize("ext,fmt", [
    ("wav", SF_WAV), ("aiff", SF_AIFF), ("w64", SF_W64),
])
def test_sample_exact_at_full_scale(tmp_path, rng, ext, fmt):
    """Full-scale noise drives xmaxc >= 56 (exp == 6), where the spec's
    asl(1, -1) in APCM inverse quantization means a RIGHT shift to 0 --
    a `1 << -1` there is C++ UB that miscompiled the whole dequant path
    under -O2 (regression: decoder output saturated on loud material)."""
    x = (np.round(rng.uniform(-1, 1, (3200, 1)) * 32767) / 32768).astype(np.float32)
    p = tmp_path / f"loud.{ext}"
    _sf_write(p, x, RATE, fmt | SF_GSM)
    got, _ = read_audio(str(p))
    oracle, _ = _sf_read(p)
    n = min(got.shape[0], oracle.shape[0])
    np.testing.assert_array_equal(
        np.round(got[:n, 0] * 32768), np.round(oracle[:n, 0] * 32768)
    )


@pytest.mark.parametrize("ext,fmt", [
    ("wav", SF_WAV), ("aiff", SF_AIFF), ("w64", SF_W64),
])
def test_stream_matches_whole_file(tmp_path, rng, ext, fmt):
    """Chunked odd-size streaming reads == whole-file decode (state is
    continuous across coded blocks — a fresh-state blockwise reader
    would diverge)."""
    p = tmp_path / f"t.{ext}"
    _sf_write(p, _speech(rng), RATE, fmt | SF_GSM)
    whole, info = read_audio(str(p))

    src = open_source(str(p))
    assert src is not None and src.info.codec == SampleCodec.GSM610
    chunks, sizes = [], [1, 159, 320, 333, 7, 4096]
    i = 0
    while True:
        blk = src.read_float(sizes[i % len(sizes)])
        i += 1
        if blk.shape[0] == 0:
            break
        chunks.append(blk)
    got = np.concatenate(chunks)
    src.close()
    np.testing.assert_array_equal(got, whole)


def test_backward_seek_is_exact(tmp_path, rng):
    """Backward seek resets the decoder and re-decodes from the start
    (GSM has no random access) — the result must be sample-exact."""
    p = tmp_path / "t.wav"
    _sf_write(p, _speech(rng), RATE, SF_WAV | SF_GSM)
    whole, _ = read_audio(str(p))

    src = open_source(str(p))
    src.read_float(5000)
    src.seek(1234)
    got = src.read_float(2000)
    src.close()
    np.testing.assert_array_equal(got, whole[1234:3234])


def test_aifc_bad_signature_short_decodes(tmp_path, rng):
    """A native 33-byte frame without the 0xD signature nibble stops
    the stream (short decode) instead of emitting garbage."""
    p = tmp_path / "t.aiff"
    _sf_write(p, _speech(rng, seconds=0.5), RATE, SF_AIFF | SF_GSM)
    blob = bytearray(open(p, "rb").read())
    # Corrupt the signature of a mid-stream frame: find the SSND body.
    ssnd = blob.find(b"SSND")
    assert ssnd > 0
    body = ssnd + 16  # chunk id + size + offset + blocksize
    blob[body + 5 * 33] = 0x00  # 6th frame loses its 0xD nibble
    p2 = tmp_path / "bad.aiff"
    p2.write_bytes(bytes(blob))

    src = open_source(str(p2))
    chunks = []
    while True:
        blk = src.read_float(4096)
        if blk.shape[0] == 0:
            break
        chunks.append(blk)
    src.close()
    got = np.concatenate(chunks)
    assert got.shape[0] == 5 * 160  # the frames before the corruption

    good = read_audio(str(p))[0]
    np.testing.assert_array_equal(got, good[: 5 * 160])


def test_truncated_tail_block_zero_pads(tmp_path, rng):
    """WAV49: a partial trailing block decodes zero-padded (blockwise
    ceil), matching the header-declared frame count."""
    p = tmp_path / "t.wav"
    _sf_write(p, _speech(rng), RATE, SF_WAV | SF_GSM)
    blob = open(p, "rb").read()
    cut = blob[:-30]  # chop mid-block
    p2 = tmp_path / "cut.wav"
    p2.write_bytes(cut)

    # data chunk size in the header still claims the full payload; the
    # reader clamps to what is present and ceils the tail.
    got, info = read_audio(str(p2))
    full, _ = read_audio(str(p))
    n = got.shape[0]
    assert n % 320 == 0 and n >= full.shape[0] - 320


def test_gsm_wav_through_filesystem(tmp_path, rng):
    """A GSM WAV (pure libsndfile+libgsm territory in the reference)
    must convolve — and come out as FLAC like any other WAV input."""
    from tests.test_runtime import make_fs, read_all

    x = _speech(rng)
    src_file = tmp_path / "in.wav"
    _sf_write(src_file, x, RATE, SF_WAV | SF_GSM)
    decoded, dinfo = read_audio(str(src_file))

    conf = "/convolver/new 1 1 64 512\n/impulse/dirac 1 1 0.5 0\n"
    fs, src = make_fs(tmp_path, conf_text=conf)
    (tmp_path / "filters" / "echo" / "filter-8000.conf").write_text(conf)
    os.rename(src_file, src / "song.wav")
    h = fs.get_or_create_handler("/song.wav")
    blob = read_all(h)
    fs.close_handler("/song.wav", h)
    assert blob[:4] == b"fLaC"
    out = tmp_path / "out.flac"
    out.write_bytes(blob)
    got, info = read_audio(str(out))
    assert info.codec != SampleCodec.GSM610  # decoded output, not coded
    assert info.frames == dinfo.frames
    np.testing.assert_allclose(got, 0.5 * decoded, atol=2.5 / 32768)
