"""DWVW (Delta Word Variable Width) decode tests.

The reference convolves AIFC/DWVW files via libsndfile
(convolve-file-handler.cc:62-76).  The bundled libsndfile is the
encode oracle for 16/24-bit; its own 12-bit path is non-functional
(both read and write return zero frames — probed below), so 12-bit is
validated by round-tripping our encoder through our decoder, plus the
crafted bit-vector recovery in the native codec's development history.
"""

import ctypes
import struct

import numpy as np
import pytest

from folve_tpu.audio import read_audio, read_audio_info
from folve_tpu.audio.types import Container, SampleCodec

from tests.test_extra_formats import _sf

RATE = 44100
AIFF = 0x020000
DWVW = {12: 0x0040, 16: 0x0041, 24: 0x0042}


def _sf_write_mono(lib, path, x, fmt, rate=RATE):
    info = lib.SfInfo(frames=0, samplerate=rate, channels=1,
                      format=fmt, sections=0, seekable=0)
    snd = lib.sf_open(str(path).encode(), 0x20, ctypes.byref(info))
    assert snd, "oracle sf_open failed"
    a = np.ascontiguousarray(x.reshape(-1, 1), np.float32)
    wrote = lib.sf_writef_float(snd, a.ctypes.data, a.shape[0])
    lib.sf_close(snd)
    assert wrote == a.shape[0]


def _sf_read(lib, path):
    info = lib.SfInfo(0, 0, 0, 0, 0, 0)
    snd = lib.sf_open(str(path).encode(), 0x10, ctypes.byref(info))
    assert snd
    out = np.zeros((max(1, info.frames), max(1, info.channels)), np.float32)
    got = lib.sf_readf_float(snd, out.ctypes.data, info.frames)
    lib.sf_close(snd)
    return out[:got], info


def _material(rng, n, kind):
    if kind == "noise":
        return np.clip(rng.uniform(-1, 1, n) * 1.6, -1, 1).astype(np.float32)
    if kind == "tone":
        return (0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / RATE)
                ).astype(np.float32)
    return (0.2 * np.sin(2 * np.pi * 220 * np.arange(n) / RATE)
            + 0.01 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("bits", [16, 24])
@pytest.mark.parametrize("kind", ["noise", "tone", "mixed"])
def test_decode_matches_oracle(tmp_path, rng, bits, kind):
    lib = _sf()
    x = _material(rng, 30000, kind)
    p = tmp_path / "t.aiff"
    _sf_write_mono(lib, p, x, AIFF | DWVW[bits])
    got, info = read_audio(str(p))
    assert info.container == Container.AIFF
    assert info.codec == SampleCodec.DWVW
    assert info.bits_per_sample == bits
    oracle, oinfo = _sf_read(lib, p)
    assert got.shape == oracle.shape == (30000, 1)
    np.testing.assert_array_equal(got, oracle)
    assert read_audio_info(str(p)).frames == 30000


@pytest.mark.parametrize("n", [1, 2, 7])
def test_tiny_streams(tmp_path, rng, n):
    lib = _sf()
    x = _material(rng, n, "noise")
    p = tmp_path / "t.aiff"
    _sf_write_mono(lib, p, x, AIFF | DWVW[16])
    got, _ = read_audio(str(p))
    oracle, _ = _sf_read(lib, p)
    np.testing.assert_array_equal(got, oracle)


def test_streaming_source_bit_identical_and_seeks(tmp_path, rng):
    """DwvwSource (chunked, stateful) must reproduce the whole-file
    decode exactly, and a backward seek re-decodes from the start."""
    from folve_tpu.audio.source import open_source

    lib = _sf()
    x = _material(rng, 20000, "mixed")
    p = tmp_path / "t.aiff"
    _sf_write_mono(lib, p, x, AIFF | DWVW[24])
    whole, _ = read_audio(str(p))
    src = open_source(str(p))
    assert type(src).__name__ == "DwvwSource"
    parts = []
    for n in (1, 3, 500, 1021, 4096, 99999):
        parts.append(src.read_float(n))
    got = np.concatenate(parts, axis=0)
    assert got.shape == whole.shape
    np.testing.assert_array_equal(got, whole)
    src.seek(17)  # backward: reset + re-decode path
    np.testing.assert_array_equal(src.read_float(100), whole[17:117])
    src.close()


def test_truncated_file_short_decodes(tmp_path, rng):
    lib = _sf()
    x = _material(rng, 10000, "mixed")
    p = tmp_path / "t.aiff"
    _sf_write_mono(lib, p, x, AIFF | DWVW[16])
    whole, _ = read_audio(str(p))
    blob = open(p, "rb").read()
    q = tmp_path / "cut.aiff"
    q.write_bytes(blob[: len(blob) - len(blob) // 3])
    got, info = read_audio(str(q))
    assert 0 < got.shape[0] < 10000
    np.testing.assert_array_equal(got, whole[: got.shape[0]])


def test_dwvw12_roundtrip_beats_reference(tmp_path, rng):
    """12-bit DWVW: the oracle's own reader returns zero frames (the
    reference cannot decode these files at all) — our codec round-trips
    them exactly, extremes included."""
    from folve_tpu.audio.dwvw import decode_dwvw, encode_dwvw

    vals = np.round(np.clip(rng.uniform(-1, 1, 5000) * 1.5, -1, 1)
                    * 2047).astype(np.int32)
    vals[10] = -2048  # most-negative escape
    vals[11] = 2047
    payload = encode_dwvw(vals, 12)
    dec = decode_dwvw(payload, 12, max_frames=5000)
    got = np.round(dec[:, 0] * 2048).astype(np.int32)
    np.testing.assert_array_equal(got, vals)

    # Wrap it in an AIFC and read through the normal path too.
    comm = (struct.pack(">hIh", 1, 5000, 12)
            + bytes.fromhex("400bfa00000000000000") + b"DWVW\x00\x00")
    body = struct.pack(">II", 0, 0) + payload
    chunks = (b"COMM" + struct.pack(">I", len(comm)) + comm
              + b"SSND" + struct.pack(">I", len(body)) + body)
    p = tmp_path / "t12.aiff"
    p.write_bytes(b"FORM" + struct.pack(">I", 4 + len(chunks))
                  + b"AIFC" + chunks)
    full, info = read_audio(str(p))
    assert info.codec == SampleCodec.DWVW and info.bits_per_sample == 12
    np.testing.assert_array_equal(
        np.round(full[:, 0] * 2048).astype(np.int32), vals)

    # The documented reference gap: its libsndfile reads zero frames.
    lib = _sf()
    oracle, _ = _sf_read(lib, p)
    assert oracle.shape[0] == 0


def test_encoder_matches_oracle_bitstream_semantics(tmp_path, rng):
    """Our encoder's output decodes identically through the ORACLE at
    16/24-bit (cross-validation of both directions)."""
    lib = _sf()
    for bits in (16, 24):
        from folve_tpu.audio.dwvw import encode_dwvw

        lim = (1 << (bits - 1)) - 1
        vals = np.round(np.clip(rng.uniform(-1, 1, 8000) * 1.4, -1, 1)
                        * lim).astype(np.int32)
        vals[5] = -lim - 1
        payload = encode_dwvw(vals, bits)
        comm = (struct.pack(">hIh", 1, len(vals), bits)
                + bytes.fromhex("400bfa00000000000000") + b"DWVW\x00\x00")
        body = struct.pack(">II", 0, 0) + payload
        chunks = (b"COMM" + struct.pack(">I", len(comm)) + comm
                  + b"SSND" + struct.pack(">I", len(body)) + body)
        p = tmp_path / "enc.aiff"
        p.write_bytes(b"FORM" + struct.pack(">I", 4 + len(chunks))
                      + b"AIFC" + chunks)
        oracle, _ = _sf_read(lib, p)
        got = np.round(np.asarray(oracle[:, 0], np.float64)
                       * (1 << (bits - 1))).astype(np.int64)
        np.testing.assert_array_equal(got, vals.astype(np.int64))


def test_dwvw_through_filesystem(tmp_path, rng):
    """A DWVW-16 AIFC convolves through the runtime and comes out as a
    plain-PCM AIFF (exact-size header) instead of passing through."""
    import shutil

    from folve_tpu.audio.aiff import read_aiff
    from tests.test_runtime import make_fs, read_all

    lib = _sf()
    x = _material(rng, 3000, "mixed")
    src_file = tmp_path / "in.aiff"
    _sf_write_mono(lib, src_file, x, AIFF | DWVW[16])

    fs, src_dir = make_fs(tmp_path)
    shutil.copy(src_file, src_dir / "song.aiff")
    h = fs.get_or_create_handler("/song.aiff")
    blob = read_all(h)
    fs.close_handler("/song.aiff", h)
    assert blob[:4] == b"FORM"
    got, info = read_aiff(blob)
    assert info.frames == 3000 and info.bits_per_sample == 16
