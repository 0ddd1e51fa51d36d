"""AU / Wave64 / CAF readers+encoders.

Reference parity: libsndfile-probed inputs get convolved instead of
falling back to pass-through (convolve-file-handler.cc:62-76), and the
output keeps the original container ("else: original format",
convolve-file-handler.cc:249-251).  Cross-validated against files
written by libsndfile itself (test-only third-party oracle).
"""

import ctypes
import glob
import os

import numpy as np
import pytest

from folve_tpu.audio import Container, read_audio, read_audio_info, sniff_container
from folve_tpu.audio.au import read_au, write_au
from folve_tpu.audio.caf import read_caf, write_caf
from folve_tpu.audio.w64 import read_w64, write_w64

RATE = 44100


def _material(rng, frames=5000, ch=2, grid=32768):
    x = rng.uniform(-0.5, 0.5, (frames, ch)).astype(np.float32)
    return np.round(x * grid) / grid


@pytest.mark.parametrize("fmt,write,read,container", [
    ("au", write_au, read_au, Container.AU),
    ("w64", write_w64, read_w64, Container.W64),
    ("caf", write_caf, read_caf, Container.CAF),
])
@pytest.mark.parametrize("bits", [16, 24])
def test_roundtrip(tmp_path, rng, fmt, write, read, container, bits):
    grid = 1 << (bits - 1)
    x = _material(rng, grid=grid)
    p = tmp_path / f"t.{fmt}"
    write(str(p), x, RATE, bits=bits)
    assert sniff_container(str(p)) == container
    got, info = read(str(p))
    assert info.rate == RATE and info.channels == 2
    assert info.bits_per_sample == bits and info.container == container
    np.testing.assert_allclose(got, x, atol=0.51 / grid)
    info2 = read_audio_info(str(p))
    assert info2.frames == x.shape[0]


# --- cross-validation against libsndfile-written files ---------------------

SF_AU, SF_W64, SF_CAF = 0x030000, 0x0B0000, 0x180000
SF_PCM_16, SF_PCM_24, SF_FLOAT, SF_ULAW = 0x0002, 0x0003, 0x0006, 0x0010


def _sf():
    cands = sorted(
        glob.glob("/opt/venv/lib/python3*/site-packages/pygame.libs/libsndfile*.so*")
    )
    if not cands:
        pytest.skip("no libsndfile oracle")
    for dep in sorted(glob.glob(os.path.join(os.path.dirname(cands[0]), "*.so*"))):
        if "sndfile" not in dep:
            try:
                ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
            except OSError:
                pass
    lib = ctypes.CDLL(cands[0])

    class SfInfo(ctypes.Structure):
        _fields_ = [
            ("frames", ctypes.c_int64), ("samplerate", ctypes.c_int),
            ("channels", ctypes.c_int), ("format", ctypes.c_int),
            ("sections", ctypes.c_int), ("seekable", ctypes.c_int),
        ]

    lib.SfInfo = SfInfo
    lib.sf_open.restype = ctypes.c_void_p
    lib.sf_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(SfInfo)]
    lib.sf_writef_float.restype = ctypes.c_int64
    lib.sf_writef_float.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.sf_readf_float.restype = ctypes.c_int64
    lib.sf_readf_float.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.sf_close.argtypes = [ctypes.c_void_p]
    return lib


def _sf_read(path):
    """Decode via the libsndfile oracle -> (float32 [n, ch], rate)."""
    lib = _sf()
    info = lib.SfInfo()
    snd = lib.sf_open(str(path).encode(), 0x10, ctypes.byref(info))
    assert snd, "sf_open (read) failed"
    out = np.empty((info.frames, info.channels), np.float32)
    got = lib.sf_readf_float(snd, out.ctypes.data, info.frames)
    lib.sf_close(snd)
    return out[:got], info.samplerate


def _sf_write(path, x, rate, fmt):
    lib = _sf()
    info = lib.SfInfo(frames=0, samplerate=rate, channels=x.shape[1],
                      format=fmt, sections=0, seekable=0)
    snd = lib.sf_open(str(path).encode(), 0x20, ctypes.byref(info))
    assert snd, "sf_open failed"
    flat = np.ascontiguousarray(x, np.float32)
    assert lib.sf_writef_float(snd, flat.ctypes.data, x.shape[0]) == x.shape[0]
    lib.sf_close(snd)


@pytest.mark.parametrize("fmt,sub,container,tol", [
    (SF_AU, SF_PCM_16, Container.AU, 1.0 / 32768),
    (SF_AU, SF_PCM_24, Container.AU, 1.0 / (1 << 23)),
    (SF_AU, SF_ULAW, Container.AU, 0.05),  # mu-law is lossy
    (SF_W64, SF_PCM_16, Container.W64, 1.0 / 32768),
    (SF_W64, SF_PCM_24, Container.W64, 1.0 / (1 << 23)),
    (SF_W64, SF_FLOAT, Container.W64, 1e-7),
    (SF_CAF, SF_PCM_16, Container.CAF, 1.0 / 32768),
    (SF_CAF, SF_PCM_24, Container.CAF, 1.0 / (1 << 23)),
    (SF_CAF, SF_FLOAT, Container.CAF, 1e-7),
])
def test_decodes_libsndfile_files(tmp_path, rng, fmt, sub, container, tol):
    x = _material(rng, frames=3001)
    p = tmp_path / "sf_file"
    _sf_write(p, x, RATE, fmt | sub)
    assert sniff_container(str(p)) == container
    got, info = read_audio(str(p))
    assert info.container == container
    assert got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=tol)


def test_mulaw_au_through_filesystem(tmp_path, rng):
    """A mu-law AU file (pure libsndfile territory in the reference)
    must convolve — and come back out as AU, not pass-through."""
    from folve_tpu.audio.au import read_au
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, frames=3000)
    src_file = tmp_path / "in.au"
    _sf_write(src_file, x, RATE, SF_AU | SF_PCM_16)

    conf = (
        "/convolver/new 2 2 64 512\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    fs, src = make_fs(tmp_path, conf_text=conf)
    os.rename(src_file, src / "song.au")
    h = fs.get_or_create_handler("/song.au")
    blob = read_all(h)
    fs.close_handler("/song.au", h)
    assert blob[:4] == b".snd"
    out = tmp_path / "out.au"
    out.write_bytes(blob)
    got, info = read_au(str(out))
    assert info.frames == x.shape[0]
    np.testing.assert_allclose(got, 0.5 * x, atol=2.5 / 32768)


@pytest.mark.parametrize("fmt,write,magic", [
    ("w64", write_w64, b"riff"),
    ("caf", write_caf, b"caff"),
])
def test_w64_caf_through_filesystem(tmp_path, rng, fmt, write, magic):
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, frames=2800)
    conf = (
        "/convolver/new 2 2 64 512\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    fs, src = make_fs(tmp_path, conf_text=conf)
    write(str(src / f"song.{fmt}"), x, RATE, bits=16)
    h = fs.get_or_create_handler(f"/song.{fmt}")
    blob = read_all(h)
    fs.close_handler(f"/song.{fmt}", h)
    assert blob[:4] == magic
    out = tmp_path / f"out.{fmt}"
    out.write_bytes(blob)
    got, info = read_audio(str(out))
    assert info.frames == x.shape[0]
    np.testing.assert_allclose(got, 0.5 * x, atol=2.5 / 32768)


def test_caf_tags_survive(tmp_path, rng):
    from folve_tpu.audio.caf import CafStreamEncoder, read_caf_metadata

    enc = CafStreamEncoder(RATE, 2, 16, 100)
    blob = enc.header({"TITLE": "caf title"}) + enc.write_float(
        _material(rng, frames=100)
    )
    p = tmp_path / "t.caf"
    p.write_bytes(blob)
    assert read_caf_metadata(str(p))["TITLE"] == "caf title"


# --- RF64 (64-bit WAV, EBU 3306) -------------------------------------------

SF_RF64 = 0x220000


def test_decodes_libsndfile_rf64(tmp_path, rng):
    """libsndfile-written RF64 (what the reference would probe for >4 GB
    captures) decodes through the WAV reader via the ds64 sizes."""
    from folve_tpu.audio.wav import read_wav

    x = _material(rng, frames=4567)
    p = tmp_path / "t.rf64"
    _sf_write(p, x, RATE, SF_RF64 | SF_PCM_24)
    assert open(p, "rb").read(4) in (b"RF64", b"BW64")
    assert sniff_container(str(p)) == Container.WAV
    got, info = read_wav(str(p))
    assert info.container == Container.WAV
    assert got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=1.0 / (1 << 23))


def test_rf64_through_filesystem(tmp_path, rng):
    """RF64 input convolves and, per the wav policy, comes out FLAC24
    (convolve-file-handler.cc:237-251: wav -> FLAC24)."""
    from folve_tpu.audio.flac import read_flac
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, frames=3000)
    src_file = tmp_path / "in.rf64"
    _sf_write(src_file, x, RATE, SF_RF64 | SF_PCM_16)

    conf = (
        "/convolver/new 2 2 64 512\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    fs, src = make_fs(tmp_path, conf_text=conf)
    os.rename(src_file, src / "song.wav")
    h = fs.get_or_create_handler("/song.wav")
    blob = read_all(h)
    fs.close_handler("/song.wav", h)
    assert blob[:4] == b"fLaC"
    got, info = read_flac(blob)
    assert info.frames == x.shape[0] and info.bits_per_sample == 24
    np.testing.assert_allclose(got, 0.5 * x, atol=2.5 / 32768)


# --- corrupt / truncated input robustness ----------------------------------


def test_corrupt_caf_negative_chunk_size_terminates(tmp_path):
    """A crafted CAF whose chunk size is a negative non-sentinel used to
    busy-loop the chunk walker forever (advisor round 3); it must raise
    instead of hanging the serving thread."""
    from folve_tpu.audio.caf import CafError, read_caf, read_caf_info, read_caf_metadata

    p = tmp_path / "evil.caf"
    import struct

    # caff header + one chunk header declaring size -12 (walker would
    # compute pos = body_off - 12 = pos forever).
    p.write_bytes(b"caff" + struct.pack(">HH", 1, 0) + b"desc" + struct.pack(">q", -12) + b"x")
    for fn in (read_caf, read_caf_info):
        with pytest.raises((CafError, ValueError)):
            fn(str(p))
    assert read_caf_metadata(str(p)) == {}  # swallows, returns empty


@pytest.mark.parametrize("fmt,write", [
    ("au", write_au), ("w64", write_w64), ("caf", write_caf),
])
def test_truncated_payload_short_decodes(tmp_path, rng, fmt, write):
    """A payload cut mid-sample short-decodes (like WAV/AIFF) instead of
    raising from np.frombuffer and silently passing through."""
    x = _material(rng, frames=1000)
    p = tmp_path / f"t.{fmt}"
    write(str(p), x, RATE, bits=16)
    blob = p.read_bytes()
    p.write_bytes(blob[:-3])  # cut mid-sample
    got, info = read_audio(str(p))
    assert got.shape[1] == 2 and 0 < got.shape[0] <= 1000
    np.testing.assert_allclose(got[:-1], x[: got.shape[0] - 1], atol=1.1 / 32768)


# --- streaming sources (constant memory, VERDICT r3 #2) --------------------


@pytest.mark.parametrize("fmt,write", [
    ("au", write_au), ("w64", write_w64), ("caf", write_caf),
])
def test_chunk_source_bit_identical(tmp_path, rng, fmt, write):
    """PcmChunkSource (chunked reads) must produce exactly what the
    whole-file decoder produces, across chunk boundaries."""
    from folve_tpu.audio.source import open_source

    x = _material(rng, frames=4321)
    p = tmp_path / f"t.{fmt}"
    write(str(p), x, RATE, bits=16)
    whole, info = read_audio(str(p))
    src = open_source(str(p))
    # W64 streams through the shared WavSource (same chunked reads);
    # the others through PcmChunkSource.
    assert type(src).__name__ in ("PcmChunkSource", "WavSource")
    got = []
    for n in (1, 7, 512, 4096, 4096):  # uneven chunk sizes
        got.append(src.read_float(n))
    got = np.concatenate(got, axis=0)
    src.close()
    assert got.shape == whole.shape
    np.testing.assert_array_equal(got, whole)


def test_chunk_source_aiff_bit_identical(tmp_path, rng):
    from folve_tpu.audio.aiff import write_aiff
    from folve_tpu.audio.source import open_source

    x = _material(rng, frames=3333)
    p = tmp_path / "t.aiff"
    write_aiff(str(p), x, RATE, bits=24)
    whole, info = read_audio(str(p))
    src = open_source(str(p))
    assert type(src).__name__ == "PcmChunkSource"
    got = []
    while True:
        chunk = src.read_float(1000)
        if chunk.shape[0] == 0:
            break
        got.append(chunk)
    got = np.concatenate(got, axis=0)
    src.close()
    np.testing.assert_array_equal(got, whole)


def test_chunk_source_constant_memory_multi_gb(tmp_path, rng):
    """A ~2.5 GB Wave64 (sparse on disk) opens and streams in constant
    memory — the old ArraySource would have decoded ~5 GB of float32
    into RAM at open.  Ref: libsndfile streaming, sound-processor.cc:76-84."""
    import resource

    from folve_tpu.audio.source import open_source
    from folve_tpu.audio.w64 import W64StreamEncoder

    frames = 700_000_000  # ~2.6 GB of 16-bit stereo payload
    enc = W64StreamEncoder(RATE, 2, 16, frames)
    p = tmp_path / "huge.w64"
    with open(p, "wb") as f:
        hdr = enc.header()
        f.write(hdr)
        f.seek(len(hdr) + frames * 4 - 2)  # sparse hole = zeros
        f.write(b"\0\0")
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    src = open_source(str(p))
    assert type(src).__name__ == "WavSource"  # chunked, not whole-file
    assert src.info.frames == frames
    total = 0
    for _ in range(20):
        chunk = src.read_float(16384)
        total += chunk.shape[0]
        assert np.all(chunk == 0.0)
    src.seek(frames - 100)
    tail = src.read_float(1000)
    assert tail.shape[0] == 100
    src.close()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # Peak RSS must not have grown by anything near the payload size.
    assert rss1 - rss0 < 200_000, f"RSS grew {rss1 - rss0} KiB"
    assert total == 20 * 16384


SF_ULAW_SUB, SF_ALAW_SUB = 0x0010, 0x0011


@pytest.mark.parametrize("fmt,sub,container", [
    (SF_W64, SF_ULAW_SUB, Container.W64),
    (SF_W64, SF_ALAW_SUB, Container.W64),
    (SF_CAF, SF_ULAW_SUB, Container.CAF),
    (SF_CAF, SF_ALAW_SUB, Container.CAF),
])
@pytest.mark.parametrize("ch", [1, 2])
def test_g711_in_w64_and_caf(tmp_path, rng, fmt, sub, container, ch):
    """libsndfile also writes G.711 into W64 and CAF containers; decode
    sample-exact and report 16-bit decoded depth."""
    x = _material(rng, frames=2500, ch=ch)
    p = tmp_path / "g711"
    _sf_write(p, x, RATE, fmt | sub)
    assert sniff_container(str(p)) == container
    got, info = read_audio(str(p))
    assert info.bits_per_sample == 16
    oracle, orate = _sf_read(p)
    assert orate == RATE and got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)
    assert read_audio_info(str(p)).frames == oracle.shape[0]


SF_SUB_IMA, SF_SUB_MS = 0x0012, 0x0013


@pytest.mark.parametrize("sub,codec_name", [
    (SF_SUB_IMA, "ima_adpcm"),
    (SF_SUB_MS, "ms_adpcm"),
])
@pytest.mark.parametrize("ch", [1, 2])
def test_adpcm_in_w64(tmp_path, rng, sub, codec_name, ch):
    """Wave64 carries a byte-identical WAVEFORMAT fmt chunk, so every
    WAV sample codec decodes in W64 too — here the block-coded ADPCMs
    through the shared fmt interpreter, sample-exact vs libsndfile and
    bit-identical between whole-file and chunked-streaming reads."""
    from folve_tpu.audio.source import open_source

    x = _material(rng, frames=4421, ch=ch)
    p = tmp_path / "a.w64"
    _sf_write(p, x, RATE, SF_W64 | sub)
    assert sniff_container(str(p)) == Container.W64
    got, info = read_audio(str(p))
    assert info.codec.value == codec_name
    oracle, orate = _sf_read(p)
    assert orate == RATE and got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)
    src = open_source(str(p))
    chunks = []
    for n in (1, 7, 512, 4096, 4096):
        chunks.append(src.read_float(n))
    src.close()
    np.testing.assert_array_equal(np.concatenate(chunks, axis=0), got)
