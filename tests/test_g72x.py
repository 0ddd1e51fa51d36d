"""CCITT G.721/G.723 ADPCM decode (AU encodings 23/25/26, WAV tag 0x0040).

Reference parity: the reference convolves anything libsndfile decodes
(convolve-file-handler.cc:62-76); libsndfile ships Sun's G.72x ADPCM.
Ours is a from-scratch CCITT implementation (native/g72x_codec.cc)
whose integer arithmetic is deterministic, so decode must be
SAMPLE-EXACT against the oracle — including the oracle's truncating
float-multiply (no +0x30 rounding bias), which
test_truncating_fmult_is_load_bearing pins down.

Oracle quirk: the bundled libsndfile CRASHES in sf_close for g72x
handles (read and write), so every oracle call here runs in a
subprocess that exits via os._exit(0) after flushing.  On the encode
side the final partial code block stays buffered (never flushed), so
fixtures are a hair shorter than the input — irrelevant, since the
decode comparison runs over the oracle's own output.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from folve_tpu.audio import Container, read_audio, read_audio_info, sniff_container
from folve_tpu.audio.source import open_source
from folve_tpu.audio.types import SampleCodec

RATE = 8000

SF_AU, SF_WAV = 0x030000, 0x010000
SF_G721_32, SF_G723_24, SF_G723_40 = 0x30, 0x31, 0x32

_ORACLE = r"""
import ctypes, glob, os, sys
import numpy as np
cands = sorted(glob.glob("/opt/venv/lib/python3*/site-packages/pygame.libs/libsndfile*.so*"))
if not cands:
    os._exit(3)
for dep in sorted(glob.glob(os.path.join(os.path.dirname(cands[0]), "*.so*"))):
    if "sndfile" not in dep:
        try: ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
        except OSError: pass
lib = ctypes.CDLL(cands[0])
class SfInfo(ctypes.Structure):
    _fields_=[("frames",ctypes.c_int64),("samplerate",ctypes.c_int),("channels",ctypes.c_int),
              ("format",ctypes.c_int),("sections",ctypes.c_int),("seekable",ctypes.c_int)]
lib.sf_open.restype = ctypes.c_void_p
lib.sf_open.argtypes=[ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(SfInfo)]
for f in ("sf_writef_short", "sf_readf_short"):
    getattr(lib, f).restype = ctypes.c_int64
    getattr(lib, f).argtypes=[ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
lib.sf_command.argtypes=[ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
mode, path = sys.argv[1], sys.argv[2].encode()
if mode == "enc":
    fmt, rate = int(sys.argv[3], 0), int(sys.argv[4])
    x = np.load(sys.argv[5])
    info = SfInfo(frames=0, samplerate=rate, channels=1, format=fmt)
    snd = lib.sf_open(path, 0x20, ctypes.byref(info))
    assert snd
    n = x.shape[0]
    assert lib.sf_writef_short(snd, np.ascontiguousarray(x, np.int16).ctypes.data, n) == n
    lib.sf_command(snd, 0x1060, None, 0)  # SFC_UPDATE_HEADER_NOW
else:
    info = SfInfo()
    snd = lib.sf_open(path, 0x10, ctypes.byref(info))
    assert snd
    out = np.zeros(max(int(info.frames), 1), np.int16)
    got = lib.sf_readf_short(snd, out.ctypes.data, info.frames)
    np.save(sys.argv[3], out[:got])
os._exit(0)  # sf_close crashes for g72x handles in this build
"""


def _oracle(args, *npy):
    r = subprocess.run([sys.executable, "-c", _ORACLE] + args,
                       capture_output=True)
    if r.returncode == 3:
        pytest.skip("no libsndfile oracle")
    assert r.returncode == 0, r.stderr.decode()[-2000:]


def oracle_encode(tmp_path, x, fmt, name):
    xp, out = str(tmp_path / "x.npy"), str(tmp_path / name)
    np.save(xp, np.asarray(x, np.int16))
    _oracle(["enc", out, hex(fmt), str(RATE), xp])
    return out


def oracle_decode(tmp_path, path):
    yp = str(tmp_path / "y.npy")
    _oracle(["dec", str(path), yp])
    return np.load(yp)


def _material(rng, n=20000):
    t = np.arange(n) / RATE
    x = 6000 * np.sin(2 * np.pi * 220 * t) * np.exp(-((t % 0.5) - 0.2) ** 2 * 30)
    x += 400 * rng.standard_normal(n)
    return np.round(x).astype(np.int16)


CASES = [
    ("g721.au", SF_AU | SF_G721_32, SampleCodec.G721_32, Container.AU),
    ("g723_24.au", SF_AU | SF_G723_24, SampleCodec.G723_24, Container.AU),
    ("g723_40.au", SF_AU | SF_G723_40, SampleCodec.G723_40, Container.AU),
    ("g721.wav", SF_WAV | SF_G721_32, SampleCodec.G721_32, Container.WAV),
]


@pytest.mark.parametrize("name,fmt,codec,container", CASES)
def test_sample_exact_vs_oracle(tmp_path, rng, name, fmt, codec, container):
    x = _material(rng)
    p = oracle_encode(tmp_path, x, fmt, name)
    assert sniff_container(p) == container

    info = read_audio_info(p)
    assert info.codec == codec
    assert info.channels == 1 and info.rate == RATE
    assert info.bits_per_sample == 16

    got, ginfo = read_audio(p)
    want = oracle_decode(tmp_path, p)
    g = np.round(np.asarray(got[:, 0], np.float64) * 32768).astype(np.int64)
    m = min(len(want), len(g))
    assert m >= len(x) - 512  # tail loss is only the oracle's unflushed block
    np.testing.assert_array_equal(g[:m], want[:m])
    assert ginfo.frames == info.frames == len(g)


@pytest.mark.parametrize("name,fmt,codec,container", CASES[:1] + CASES[3:])
def test_stream_matches_whole_and_seeks(tmp_path, rng, name, fmt, codec,
                                        container):
    x = _material(rng, 30000)
    p = oracle_encode(tmp_path, x, fmt, name)
    whole, _ = read_audio(p)

    src = open_source(p)
    assert src is not None and src.info.codec == codec
    chunks, sizes = [], [1, 777, 4096, 4097, 63]
    i = 0
    while True:
        blk = src.read_float(sizes[i % len(sizes)])
        i += 1
        if blk.shape[0] == 0:
            break
        chunks.append(blk)
    np.testing.assert_array_equal(np.concatenate(chunks), whole)

    # backward seek resets and re-decodes from the start — exact
    for target in (12345, 100, 29990, 0):
        src.seek(target)
        blk = src.read_float(64)
        np.testing.assert_array_equal(blk, whole[target:target + 64])
    src.close()


def test_truncating_fmult_is_load_bearing(tmp_path, rng):
    """A long loud stream drifts if the decoder rounds the float
    multiply the classic way (+0x30); exactness over it proves we match
    the oracle's truncating variant."""
    t = np.arange(30000) / RATE
    x = np.round(20000 * np.sin(2 * np.pi * 300 * t)).astype(np.int16)
    p = oracle_encode(tmp_path, x, SF_AU | SF_G721_32, "loud.au")
    got, _ = read_audio(p)
    want = oracle_decode(tmp_path, p)
    g = np.round(np.asarray(got[:, 0], np.float64) * 32768).astype(np.int64)
    m = min(len(want), len(g))
    np.testing.assert_array_equal(g[:m], want[:m])


def test_truncated_au_short_decodes(tmp_path, rng):
    x = _material(rng)
    p = oracle_encode(tmp_path, x, SF_AU | SF_G721_32, "t.au")
    blob = open(p, "rb").read()
    p2 = tmp_path / "cut.au"
    p2.write_bytes(blob[: len(blob) * 2 // 3])
    got, info = read_audio(str(p2))
    want = oracle_decode(tmp_path, p)
    n = got.shape[0]
    assert 0 < n < len(x)
    g = np.round(np.asarray(got[:, 0], np.float64) * 32768).astype(np.int64)
    np.testing.assert_array_equal(g, want[:n])


def test_stereo_g72x_rejected(tmp_path):
    # Hand-build a stereo G.721 AU header: mono-only (as in libsndfile),
    # must fall back to pass-through (open_source -> None), not decode
    # garbage.
    payload = bytes(200)
    hdr = b".snd" + struct.pack(">IIIII", 24, len(payload), 23, RATE, 2)
    p = tmp_path / "stereo.au"
    p.write_bytes(hdr + payload)
    assert open_source(str(p)) is None


def test_au_g721_through_filesystem(tmp_path, rng):
    """An AU/G.721 file convolves and comes back out as an AU the
    oracle can read (PCM re-encode, original container kept)."""
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, 16000)
    p = oracle_encode(tmp_path, x, SF_AU | SF_G721_32, "song.au")
    conf = "/convolver/new 1 1 64 512\n/impulse/dirac 1 1 0.5 0\n"
    fs, src_dir = make_fs(tmp_path, conf_text=conf)
    (tmp_path / "filters" / "echo" / "filter-8000.conf").write_text(conf)
    os.rename(p, src_dir / "song.au")
    h = fs.get_or_create_handler("/song.au")
    blob = read_all(h)
    fs.close_handler("/song.au", h)
    assert blob[:4] == b".snd"
    out = tmp_path / "out.au"
    out.write_bytes(blob)
    got, info = read_audio(str(out))
    ref, _ = read_audio(str(src_dir / "song.au"))
    assert info.container == Container.AU
    np.testing.assert_allclose(got, 0.5 * ref, atol=1.5 / 32768)
