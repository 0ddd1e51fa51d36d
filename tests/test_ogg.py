"""Ogg Vorbis decode tests (libvorbisfile binding).

Oracle: pygame's SDL_mixer (a different binding of the same codec
family) decoding the same file.
"""

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


def test_full_decode_matches_pygame_oracle():
    data, info = read_ogg(SAMPLE)
    assert data.shape[0] == info.frames
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame = pytest.importorskip("pygame")
    pygame.mixer.quit()
    pygame.mixer.init(frequency=info.rate, size=-16, channels=info.channels)
    ref = np.frombuffer(
        pygame.mixer.Sound(SAMPLE).get_raw(), dtype=np.int16
    ).reshape(-1, info.channels).astype(np.float64) / 32768.0
    pygame.mixer.quit()
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
