"""Ogg Vorbis decode tests — the from-scratch native decoder
(native/vorbis_codec.cc) against two independent oracles: pygame's
SDL_mixer and (for float precision) the system libvorbisfile, both
bound test-locally only.
"""

import ctypes
import glob
import os

import numpy as np
import pytest

from folve_tpu.audio.ogg import OggSource, read_ogg, read_ogg_info, vorbis_available

SAMPLE_CANDIDATES = glob.glob(
    "/opt/venv/lib/python3*/site-packages/pygame/examples/data/*.ogg"
)

pytestmark = pytest.mark.skipif(
    not (vorbis_available() and SAMPLE_CANDIDATES),
    reason="libvorbisfile or sample ogg not available",
)

SAMPLE = SAMPLE_CANDIDATES[0] if SAMPLE_CANDIDATES else ""


def test_info():
    info = read_ogg_info(SAMPLE)
    assert info.rate > 0 and info.channels in (1, 2)
    assert info.frames > 0


def test_full_decode_matches_pygame_oracle(tmp_path):
    data, info = read_ogg(SAMPLE)
    assert data.shape[0] == info.frames
    # pygame/SDL segfaults when initialized inside a process that has
    # already run heavy jax multi-device work — decode in a subprocess.
    import subprocess
    import sys

    raw_path = tmp_path / "ref.raw"
    script = (
        "import os; os.environ.setdefault('SDL_AUDIODRIVER', 'dummy')\n"
        "import pygame\n"
        f"pygame.mixer.init(frequency={info.rate}, size=-16, "
        f"channels={info.channels})\n"
        f"open({str(raw_path)!r}, 'wb').write("
        f"pygame.mixer.Sound({SAMPLE!r}).get_raw())\n"
    )
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=120)
    if r.returncode != 0:
        pytest.skip(f"pygame oracle unavailable: {r.stderr[-200:]}")
    ref = np.frombuffer(raw_path.read_bytes(), dtype=np.int16).reshape(
        -1, info.channels
    ).astype(np.float64) / 32768.0
    n = min(len(ref), len(data))
    assert abs(len(ref) - len(data)) < 4096  # codec delay conventions
    err = 10 * np.log10(
        np.sum((data[:n].astype(np.float64) - ref[:n]) ** 2)
        / max(np.sum(ref[:n] ** 2), 1e-30)
    )
    assert err < -35  # both are the same float decode, 16-bit quantized ref


def test_streaming_chunks_match_full():
    data, _ = read_ogg(SAMPLE)
    src = OggSource(SAMPLE)
    pieces = []
    while True:
        blk = src.read_float(1000)
        if blk.shape[0] == 0:
            break
        pieces.append(blk)
    src.close()
    got = np.concatenate(pieces)
    np.testing.assert_allclose(got, data, atol=1e-7)


def _splice_tags(ogg_bytes: bytes, tags: dict) -> bytes:
    """Inject vorbis comments into an ogg stream (re-lace the header
    pages, renumber sequences, recompute page CRCs) — the only way to
    get a tagged fixture without an ogg encoder in the image."""
    import struct

    tab = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
            r &= 0xFFFFFFFF
        tab.append(r)

    def crc(b):
        c = 0
        for byte in b:
            c = ((c << 8) & 0xFFFFFFFF) ^ tab[((c >> 24) & 0xFF) ^ byte]
        return c

    pages = []
    pos = 0
    while pos < len(ogg_bytes):
        assert ogg_bytes[pos : pos + 4] == b"OggS"
        nseg = ogg_bytes[pos + 26]
        lacing = ogg_bytes[pos + 27 : pos + 27 + nseg]
        paylen = sum(lacing)
        pages.append(
            (
                bytearray(ogg_bytes[pos : pos + 27 + nseg]),
                lacing,
                ogg_bytes[pos + 27 + nseg : pos + 27 + nseg + paylen],
            )
        )
        pos += 27 + nseg + paylen

    # Header packets 2+3 (comment, setup) from pages 1..k.
    pkts, cur, last_hdr = [], b"", 1
    for pi in range(1, len(pages)):
        _, lacing, payload = pages[pi]
        off = 0
        for l in lacing:
            cur += payload[off : off + l]
            off += l
            if l < 255:
                pkts.append(cur)
                cur = b""
        last_hdr = pi
        if len(pkts) >= 2:
            break
    comment, setup = pkts[0], pkts[1]
    assert comment[:7] == b"\x03vorbis"
    vlen = struct.unpack("<I", comment[7:11])[0]
    vendor = comment[11 : 11 + vlen]
    items = [f"{k}={v}".encode() for k, v in tags.items()]
    new = b"\x03vorbis" + struct.pack("<I", vlen) + vendor
    new += struct.pack("<I", len(items))
    for it in items:
        new += struct.pack("<I", len(it)) + it
    new += b"\x01"

    def lace(n):
        out = []
        while n >= 255:
            out.append(255)
            n -= 255
        out.append(n)
        return bytes(out)

    serial = pages[0][0][14:18]
    lacing = lace(len(new)) + lace(len(setup))
    assert len(lacing) < 255
    hdr = (
        b"OggS\x00\x00" + struct.pack("<q", 0) + serial + struct.pack("<I", 1)
        + b"\x00\x00\x00\x00" + bytes([len(lacing)]) + lacing
    )
    page1 = bytearray(hdr + new + setup)
    page1[22:26] = struct.pack("<I", crc(page1))

    out = bytearray(bytes(pages[0][0]) + pages[0][2])  # ID page, seq 0
    out += page1
    seq = 2
    for pi in range(last_hdr + 1, len(pages)):
        h, _, payload = pages[pi]
        h2 = bytearray(h)
        h2[18:22] = struct.pack("<I", seq)
        h2[22:26] = b"\x00\x00\x00\x00"
        page = bytearray(bytes(h2) + payload)
        page[22:26] = struct.pack("<I", crc(page))
        out += page
        seq += 1
    return bytes(out)


def test_ogg_tags_carried_into_flac(tmp_path):
    """ogg vorbis comments survive into the FLAC output's
    VORBIS_COMMENT block (convolve-file-handler.cc:484-495)."""
    from folve_tpu.audio.flac import read_flac_metadata
    from folve_tpu.audio.ogg import read_ogg_comments
    from tests.test_runtime import make_fs, read_all

    tagged = _splice_tags(
        open(SAMPLE, "rb").read(),
        {"TITLE": "Spliced Song", "ARTIST": "Test Harness"},
    )
    info = read_ogg_info(SAMPLE)
    fs, src = make_fs(tmp_path)
    cfg = tmp_path / "filters" / "echo"
    (cfg / f"filter-{info.rate}-{info.channels}.conf").write_text(
        f"/convolver/new {info.channels} {info.channels} 64 512\n"
        + "".join(
            f"/impulse/dirac {c} {c} 0.5 0\n" for c in range(1, info.channels + 1)
        )
    )
    (src / "song.ogg").write_bytes(tagged)
    assert read_ogg_comments(str(src / "song.ogg"))["TITLE"] == "Spliced Song"
    h = fs.get_or_create_handler("/song.ogg")
    blob = read_all(h, cap=2000)
    fs.close_handler("/song.ogg", h)
    assert blob[:4] == b"fLaC"
    got = read_flac_metadata(blob)
    assert got["TITLE"] == "Spliced Song"
    assert got["ARTIST"] == "Test Harness"


# ---------------------------------------------------------------------------
# Test-local third-party oracles (product code no longer binds these).
# ---------------------------------------------------------------------------


def _libsndfile():
    cands = sorted(
        glob.glob("/opt/venv/lib/python3*/site-packages/pygame.libs/libsndfile*.so*")
    )
    if not cands:
        return None
    libdir = os.path.dirname(cands[0])
    for dep in sorted(glob.glob(os.path.join(libdir, "*.so*"))):
        if "sndfile" not in dep:
            try:
                ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
            except OSError:
                pass
    lib = ctypes.CDLL(cands[0])

    class SfInfo(ctypes.Structure):
        _fields_ = [
            ("frames", ctypes.c_int64),
            ("samplerate", ctypes.c_int),
            ("channels", ctypes.c_int),
            ("format", ctypes.c_int),
            ("sections", ctypes.c_int),
            ("seekable", ctypes.c_int),
        ]

    lib.SfInfo = SfInfo
    lib.sf_open.restype = ctypes.c_void_p
    lib.sf_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(SfInfo)]
    lib.sf_writef_float.restype = ctypes.c_int64
    lib.sf_writef_float.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.sf_set_string.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]
    lib.sf_close.argtypes = [ctypes.c_void_p]
    return lib


def _encode_ogg(path, x, rate, title=None):
    """Encode float PCM to Ogg Vorbis with libsndfile/libvorbisenc (a
    THIRD-PARTY encoder — exactly what the decoder must interoperate
    with)."""
    lib = _libsndfile()
    if lib is None:
        pytest.skip("no libsndfile to encode fixtures")
    SF_FORMAT_OGG, SF_FORMAT_VORBIS, SFM_WRITE, SF_STR_TITLE = (
        0x200000, 0x0060, 0x20, 0x01,
    )
    info = lib.SfInfo(
        frames=0, samplerate=rate, channels=x.shape[1],
        format=SF_FORMAT_OGG | SF_FORMAT_VORBIS, sections=0, seekable=0,
    )
    snd = lib.sf_open(str(path).encode(), SFM_WRITE, ctypes.byref(info))
    assert snd, "libsndfile ogg open failed"
    if title is not None:
        lib.sf_set_string(snd, SF_STR_TITLE, title.encode())
    flat = np.ascontiguousarray(x, dtype=np.float32)
    n = lib.sf_writef_float(snd, flat.ctypes.data, x.shape[0])
    lib.sf_close(snd)
    assert n == x.shape[0]


def _oracle_decode(path):
    """Float-precision reference decode via libvorbisfile (test-only)."""
    cands = sorted(
        glob.glob(
            "/opt/venv/lib/python3*/site-packages/pygame.libs/libvorbisfile*.so*"
        )
    ) or sorted(glob.glob("/usr/lib/*/libvorbisfile.so*"))
    if not cands:
        pytest.skip("no libvorbisfile oracle")
    libdir = os.path.dirname(cands[0])
    for pat in ("libogg*.so*", "libvorbis-*.so*", "libvorbis.so*"):
        for dep in sorted(glob.glob(os.path.join(libdir, pat))):
            try:
                ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
            except OSError:
                pass
    lib = ctypes.CDLL(cands[0])

    class VInfo(ctypes.Structure):
        _fields_ = [
            ("version", ctypes.c_int), ("channels", ctypes.c_int),
            ("rate", ctypes.c_long), ("bu", ctypes.c_long),
            ("bn", ctypes.c_long), ("bl", ctypes.c_long),
            ("bw", ctypes.c_long), ("cs", ctypes.c_void_p),
        ]

    lib.ov_fopen.restype = ctypes.c_int
    lib.ov_fopen.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.ov_info.restype = ctypes.POINTER(VInfo)
    lib.ov_info.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ov_read_float.restype = ctypes.c_long
    lib.ov_read_float.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float))),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.ov_clear.argtypes = [ctypes.c_void_p]
    vf = ctypes.create_string_buffer(2048)
    assert lib.ov_fopen(str(path).encode(), vf) == 0
    vi = lib.ov_info(vf, -1)
    ch = vi.contents.channels
    pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
    bs = ctypes.c_int(0)
    chunks = []
    while True:
        n = lib.ov_read_float(vf, ctypes.byref(pcm), 65536, ctypes.byref(bs))
        if n <= 0:
            break
        blk = np.empty((n, ch), np.float32)
        for c in range(ch):
            blk[:, c] = np.ctypeslib.as_array(pcm[c], shape=(n,))
        chunks.append(blk)
    lib.ov_clear(vf)
    return np.concatenate(chunks) if chunks else np.zeros((0, ch), np.float32)


def _stereo_material(seconds=2.2, rate=44100):
    """Tonal + transient + noise: exercises coupling, long blocks and
    long/short switching."""
    rng = np.random.default_rng(99)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    left = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 2930 * t)
    right = 0.5 * np.sin(2 * np.pi * 440 * t + 0.7) + 0.08 * rng.standard_normal(n)
    x = np.stack([left, right], axis=1).astype(np.float32)
    # Hard transients force short blocks.
    for pos in (n // 4, n // 2, 3 * n // 4):
        x[pos : pos + 64] += rng.uniform(-0.4, 0.4, (64, 2)).astype(np.float32)
    x[n // 3 : n // 3 + rate // 10] = 0.0  # a silence gap
    return np.clip(x, -0.98, 0.98)


def test_stereo_coupling_matches_reference_decoder(tmp_path):
    """Stereo 44.1 kHz music-like material through a third-party
    ENCODER; our decode must match libvorbisfile's float output to
    float32 precision (coupling, block switching, silence)."""
    path = tmp_path / "stereo.ogg"
    _encode_ogg(path, _stereo_material(), 44100)
    ref = _oracle_decode(path)
    got, info = read_ogg(str(path))
    assert info.channels == 2 and info.rate == 44100
    assert got.shape == ref.shape, (got.shape, ref.shape)
    num = np.sum((got.astype(np.float64) - ref.astype(np.float64)) ** 2)
    den = max(np.sum(ref.astype(np.float64) ** 2), 1e-30)
    snr = 10 * np.log10(num / den) if num else -200.0
    assert snr < -100, f"decode disagrees with reference: {snr:.1f} dB"


@pytest.mark.parametrize("rate", [8000, 48000])
def test_mono_matches_reference_decoder(tmp_path, rate):
    """Mono at 48 kHz and at 8 kHz (low-rate encoder modes use small
    blocksizes and different codebook sets)."""
    path = tmp_path / "mono.ogg"
    rng = np.random.default_rng(3)
    n = rate
    x = (0.4 * np.sin(2 * np.pi * 600 * np.arange(n) / rate)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)[:, None]
    _encode_ogg(path, x, rate)
    ref = _oracle_decode(path)
    got, info = read_ogg(str(path))
    assert info.channels == 1 and got.shape == ref.shape
    num = np.sum((got.astype(np.float64) - ref.astype(np.float64)) ** 2)
    den = max(np.sum(ref.astype(np.float64) ** 2), 1e-30)
    assert 10 * np.log10(num / den) < -100


def test_encoder_tags_read_back(tmp_path):
    from folve_tpu.audio.ogg import read_ogg_comments

    path = tmp_path / "tagged.ogg"
    _encode_ogg(path, _stereo_material(0.3), 44100, title="Corpus Title")
    assert read_ogg_comments(str(path))["TITLE"] == "Corpus Title"


def test_rewind_restarts_stream(tmp_path):
    path = tmp_path / "rw.ogg"
    _encode_ogg(path, _stereo_material(0.5), 44100)
    src = OggSource(str(path))
    a = src.read_float(5000)
    src.rewind()
    b = src.read_float(5000)
    src.close()
    np.testing.assert_array_equal(a, b)


def test_fuzz_bitflips_never_crash(tmp_path):
    """Corrupted streams must fail cleanly (error or truncated/garbage
    audio), never crash — same bar as the FLAC fuzz suite."""
    path = tmp_path / "fz.ogg"
    _encode_ogg(path, _stereo_material(0.4), 44100)
    blob = bytearray(open(path, "rb").read())
    rng = np.random.default_rng(17)
    for trial in range(60):
        fuzz = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            fuzz[int(rng.integers(0, len(fuzz)))] ^= 1 << int(rng.integers(0, 8))
        p = tmp_path / "fuzzed.ogg"
        p.write_bytes(bytes(fuzz))
        try:
            read_ogg(str(p))
        except Exception:
            pass
    for cut in (0, 3, 57, len(blob) // 3, len(blob) - 2):
        p = tmp_path / "cut.ogg"
        p.write_bytes(bytes(blob[:cut]))
        try:
            read_ogg(str(p))
        except Exception:
            pass


def test_huge_comment_spans_many_segments(tmp_path):
    """A ~30 KiB comment header forces >100 lacing segments (255-byte
    continuation runs) — exercises packet reassembly across segments."""
    from folve_tpu.audio.ogg import read_ogg, read_ogg_comments

    big = "x" * 30000
    tagged = _splice_tags(
        open(SAMPLE, "rb").read(), {"TITLE": "big", "LYRICS": big}
    )
    p = tmp_path / "big.ogg"
    p.write_bytes(tagged)
    tags = read_ogg_comments(str(p))
    assert tags["TITLE"] == "big" and tags["LYRICS"] == big
    data, info = read_ogg(str(p))
    ref, _ = read_ogg(SAMPLE)
    np.testing.assert_array_equal(data, ref)


def test_comments_binding():
    from folve_tpu.audio.ogg import read_ogg_comments

    # The pygame sample carries no tags; the binding must return a dict
    # without crashing, and {} for non-ogg input.
    assert isinstance(read_ogg_comments(SAMPLE), dict)
    assert read_ogg_comments("/etc/hostname") == {}


def test_ogg_through_filesystem(tmp_path):
    """ogg in -> FLAC/16 out (output format policy,
    convolve-file-handler.cc:237-243)."""
    import shutil

    from folve_tpu.audio.flac import read_flac
    from tests.test_runtime import make_fs, read_all

    info = read_ogg_info(SAMPLE)
    conf = (
        "/convolver/new 2 2 64 512\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    fs, src = make_fs(tmp_path, conf_text=conf)
    # The filter must resolve for the ogg's rate/channels.
    cfg = tmp_path / "filters" / "echo"
    (cfg / f"filter-{info.rate}-{info.channels}.conf").write_text(
        f"/convolver/new {info.channels} {info.channels} 64 512\n"
        + "".join(
            f"/impulse/dirac {c} {c} 0.5 0\n" for c in range(1, info.channels + 1)
        )
    )
    shutil.copy(SAMPLE, src / "song.ogg")
    h = fs.get_or_create_handler("/song.ogg")
    blob = read_all(h, cap=2000)
    assert blob[:4] == b"fLaC"
    got, out_info = read_flac(blob)
    assert out_info.bits_per_sample == 16
    assert out_info.rate == info.rate
    data, _ = read_ogg(SAMPLE)
    n = got.shape[0]
    assert n == data.shape[0]
    np.testing.assert_allclose(got, 0.5 * data[:, : got.shape[1]], atol=2.5 / 32768)
    fs.close_handler("/song.ogg", h)


class TestParallelPacketDecode:
    """Multi-packet reads fan Vorbis packet synthesis across the codec
    pool (floors/residues/coupling/IMDCT/window per packet; only the
    overlap-add is sequential).  Output must be IDENTICAL to the serial
    path — same packets, same placement, same adds in the same order —
    including for corrupted streams."""

    @pytest.fixture(autouse=True)
    def _restore_threads(self):
        from folve_tpu.audio.flac import set_encoder_threads

        yield
        set_encoder_threads(0)

    def _ab(self, path, chunk=None):
        from folve_tpu.audio.flac import set_encoder_threads

        def decode(threads):
            set_encoder_threads(threads)
            if chunk is None:
                return read_ogg(path)[0]
            src = OggSource(path)
            parts = []
            while True:
                got = src.read_float(chunk)
                if got.shape[0] == 0:
                    break
                parts.append(got)
            src.close()
            return np.concatenate(parts) if parts else np.empty((0, 2), np.float32)

        serial = decode(1)
        parallel = decode(4)
        np.testing.assert_array_equal(serial, parallel)
        return serial

    def test_bit_identical_to_serial(self, tmp_path):
        path = tmp_path / "p.ogg"
        _encode_ogg(path, _stereo_material(4.0), 44100)
        got = self._ab(str(path))
        assert got.shape[0] > 0

    def test_pygame_sample_parallel(self):
        self._ab(SAMPLE)

    def test_odd_chunked_reads(self, tmp_path):
        path = tmp_path / "p.ogg"
        _encode_ogg(path, _stereo_material(2.5), 44100)
        for chunk in (1, 999, 1024, 4097, 30000):
            self._ab(str(path), chunk=chunk)

    def test_rewind_then_parallel_again(self, tmp_path):
        from folve_tpu.audio.flac import set_encoder_threads

        path = tmp_path / "p.ogg"
        _encode_ogg(path, _stereo_material(1.5), 44100)
        set_encoder_threads(4)
        src = OggSource(str(path))
        first = src.read_float(10 ** 9)
        src.rewind()
        second = src.read_float(10 ** 9)
        src.close()
        np.testing.assert_array_equal(first, second)

    def test_corrupt_streams_match_serial(self, tmp_path):
        path = tmp_path / "p.ogg"
        _encode_ogg(path, _stereo_material(1.2), 44100)
        blob = bytearray(open(path, "rb").read())
        r = np.random.default_rng(41)
        for _ in range(30):
            fuzz = bytearray(blob)
            for _ in range(int(r.integers(1, 6))):
                fuzz[int(r.integers(0, len(fuzz)))] ^= 1 << int(r.integers(0, 8))
            fp = tmp_path / "fz.ogg"
            fp.write_bytes(bytes(fuzz))
            from folve_tpu.audio.flac import set_encoder_threads
            from folve_tpu.audio.ogg import OggError

            def outcome(threads):
                set_encoder_threads(threads)
                try:
                    return read_ogg(str(fp))[0]
                except OggError:
                    return None

            a, b = outcome(1), outcome(4)
            # Reject/accept must agree, and accepted data must match.
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_array_equal(a, b)
