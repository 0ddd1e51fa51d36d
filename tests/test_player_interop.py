"""Player-side interop: files OUR encoders produce must decode in a
THIRD-PARTY decoder (libsndfile — what mplayer/VLC-class players link).

This is the reverse direction of the vendored conformance corpus
(third-party encode -> our decode, tests/test_flac_corpus.py): every
mount read in production serves bytes written by our encoders to a
player we don't control, exactly the compatibility surface the
reference gets for free by linking libsndfile for output
(convolve-file-handler.cc:86-96).
"""

import ctypes
import os

import numpy as np
import pytest

from folve_tpu.audio.aiff import write_aiff
from folve_tpu.audio.au import write_au
from folve_tpu.audio.caf import write_caf
from folve_tpu.audio.flac import write_flac
from folve_tpu.audio.w64 import write_w64
from folve_tpu.audio.wav import write_wav

from tests.test_extra_formats import _sf

RATE = 44100


def _sf_read_int(path):
    """Decode any libsndfile-supported file to left-justified int32
    PCM + (frames, channels, format)."""
    lib = _sf()
    lib.sf_readf_int.restype = ctypes.c_int64
    lib.sf_readf_int.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    info = lib.SfInfo()
    snd = lib.sf_open(str(path).encode(), 0x10, ctypes.byref(info))  # SFM_READ
    assert snd, f"libsndfile rejected {path}"
    out = np.empty((info.frames, info.channels), dtype=np.int32)
    got = lib.sf_readf_int(snd, out.ctypes.data, info.frames)
    lib.sf_close(snd)
    assert got == info.frames
    return out, info


def _int_material(rng, frames, channels, bits):
    lim = 1 << (bits - 1)
    x = rng.integers(-lim // 2, lim // 2, (frames, channels), dtype=np.int64)
    x[5:40] = 0  # constant run
    ramp = np.arange(min(200, frames), dtype=np.int64)[:, None] * 3
    x[: ramp.shape[0]] += ramp
    return np.clip(x, -lim, lim - 1).astype(np.int32)


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("channels", [1, 2])
def test_libsndfile_decodes_our_flac_bit_exact(tmp_path, rng, bits, channels):
    from tests.test_flac import encode_to_bytes

    x = _int_material(rng, 4096 * 2 + 777, channels, bits)  # odd final frame
    p = tmp_path / "ours.flac"
    p.write_bytes(encode_to_bytes(x, RATE, bits=bits))
    got, info = _sf_read_int(p)
    assert (info.frames, info.channels) == x.shape
    # sf_readf_int returns samples left-justified in 32 bits.
    np.testing.assert_array_equal(got >> (32 - bits), x)


@pytest.mark.parametrize("bits", [16, 24])
def test_libsndfile_decodes_hot_residuals(tmp_path, rng, bits):
    """Full-scale noise forces the Rice2 (5-bit parameter) coding
    method and the VERBATIM/raw escapes at 24-bit; the file must stay
    near raw size (pre-fix, a k<=14 cap ballooned 24-bit noise to ~11x
    raw in kilobit unary runs) and decode bit-exactly in libsndfile."""
    from tests.test_flac import encode_to_bytes

    lim = 1 << (bits - 1)
    x = rng.integers(-lim, lim, (4096 * 3 + 77, 2), dtype=np.int64).astype(
        np.int32)
    p = tmp_path / "hot.flac"
    blob = encode_to_bytes(x, RATE, bits=bits)
    p.write_bytes(blob)
    raw_bytes = x.shape[0] * 2 * bits // 8
    assert len(blob) < raw_bytes * 1.08, (len(blob), raw_bytes)
    got, info = _sf_read_int(p)
    assert (info.frames, info.channels) == x.shape
    np.testing.assert_array_equal(got >> (32 - bits), x)


def test_libsndfile_decodes_our_flac_small_blocksize(tmp_path, rng):
    from tests.test_flac import encode_to_bytes

    x = _int_material(rng, 1024 * 5 + 13, 2, 16)
    p = tmp_path / "ours.flac"
    p.write_bytes(encode_to_bytes(x, RATE, bits=16, blocksize=1024))
    got, info = _sf_read_int(p)
    np.testing.assert_array_equal(got >> 16, x)


def _write_wav_bits(dst, data, rate, bits):
    from folve_tpu.audio import SampleCodec

    codec = SampleCodec.PCM_16 if bits == 16 else SampleCodec.PCM_24
    write_wav(dst, data, rate, codec)


@pytest.mark.parametrize("fmt,write,bits", [
    ("wav", _write_wav_bits, 16),
    ("wav", _write_wav_bits, 24),
    ("aiff", write_aiff, 16),
    ("aiff", write_aiff, 24),
    ("au", write_au, 16),
    ("au", write_au, 24),
    ("w64", write_w64, 16),
    ("w64", write_w64, 24),
    ("caf", write_caf, 16),
    ("caf", write_caf, 24),
])
def test_libsndfile_decodes_our_pcm_containers(tmp_path, rng, fmt, write, bits):
    grid = 1 << (bits - 1)
    xi = _int_material(rng, 3001, 2, bits)
    x = (xi.astype(np.float64) / grid).astype(np.float32)
    p = tmp_path / f"ours.{fmt}"
    write(str(p), x, RATE, bits)
    got, info = _sf_read_int(p)
    assert (info.frames, info.channels) == x.shape
    np.testing.assert_array_equal(got >> (32 - bits), xi)


def test_libsndfile_decodes_a_mounted_flac_stream(tmp_path, rng):
    """The actual production artifact: a FLAC stream assembled by the
    handler (verbatim-header copy + byte surgery + streaming frames)
    must decode in libsndfile with the convolved PCM."""
    from tests.test_runtime import make_fs, read_all

    grid = 32768
    x = np.round(
        rng.uniform(-0.4, 0.4, (3000, 2)).astype(np.float32) * grid
    ) / grid
    conf = (
        "/convolver/new 2 2 64 512\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    fs, src = make_fs(tmp_path, conf_text=conf)
    write_flac(str(src / "song.flac"), x.astype(np.float32), RATE)
    h = fs.get_or_create_handler("/song.flac")
    blob = read_all(h)
    fs.close_handler("/song.flac", h)
    out = tmp_path / "mounted.flac"
    out.write_bytes(blob)
    got, info = _sf_read_int(out)
    assert (info.frames, info.channels) == x.shape
    np.testing.assert_allclose(
        (got >> 16).astype(np.float64) / grid, 0.5 * x, atol=2.5 / grid
    )
