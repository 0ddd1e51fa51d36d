"""MP3 decoder — from-scratch MPEG-1 Layer III vs the mpg123 oracle.

The reference convolves MP3 whenever its libsndfile links mpg123
(convolve-file-handler.cc:62-76).  Fixtures are encoded with the
system libmp3lame; correctness is asserted against the system
libmpg123 decode (both test-only oracles, folve_tpu/tools/mp3_oracle).
"""

import numpy as np
import pytest

from folve_tpu.audio import Container, read_audio, read_audio_info, sniff_container
from folve_tpu.audio.mp3 import Mp3Source, read_mp3, read_mp3_metadata, sniff_mp3
from folve_tpu.tools.mp3_oracle import (
    lame_available,
    lame_encode,
    mpg123_available,
    mpg123_decode,
)

pytestmark = pytest.mark.skipif(
    not (lame_available() and mpg123_available()),
    reason="lame/mpg123 oracles not present",
)

RATE = 44100


def _material(rng, seconds=2.0, ch=2, rate=RATE):
    n = int(rate * seconds)
    t = np.arange(n) / rate
    base = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1330 * t)
    noise = 0.1 * rng.standard_normal(n)
    x = np.stack([base + noise, 0.7 * base - noise][:ch], axis=1)
    return x.astype(np.float32)


def _err_db(ours, oracle):
    n = min(len(ours), len(oracle))
    assert n > 0
    ch = min(ours.shape[1], oracle.shape[1])
    d = ours[:n, :ch] - oracle[:n, :ch]
    denom = float((oracle[:n, :ch] ** 2).sum()) or 1.0
    return 10 * np.log10(max(1e-30, float((d * d).sum())) / denom)


@pytest.mark.parametrize("name,kbps,mode,vbr,rate,ch", [
    ("mono-128", 128, None, None, 44100, 1),
    ("joint-192", 192, 1, None, 44100, 2),
    ("stereo-320", 320, 0, None, 44100, 2),
    ("joint-vbr", 128, 1, 4, 44100, 2),
    ("48k-joint", 192, 1, None, 48000, 2),
    ("32k-joint", 96, 1, None, 32000, 2),
])
def test_matches_mpg123(tmp_path, rng, name, kbps, mode, vbr, rate, ch):
    x = _material(rng, ch=ch, rate=rate)
    blob = lame_encode(x, rate, kbps, mode=mode, vbr=vbr)
    p = tmp_path / f"{name}.mp3"
    p.write_bytes(blob)
    got, info = read_audio(str(p))
    assert info.container == Container.MP3
    assert info.rate == rate and info.channels == ch
    oracle = mpg123_decode(blob)
    assert abs(len(got) - len(oracle)) <= 1152
    err = _err_db(got, oracle)
    assert err < -90, f"{name}: err {err:.1f} dB vs oracle"


def test_transients_short_blocks(tmp_path, rng):
    """Clicky material forces window switching / short blocks."""
    x = _material(rng, ch=1)
    x[::4000] = 0.9  # transients
    blob = lame_encode(x, RATE, 192)
    oracle = mpg123_decode(blob)
    (tmp_path / "t.mp3").write_bytes(blob)
    got, _ = read_audio(str(tmp_path / "t.mp3"))
    err = _err_db(got, oracle)
    assert err < -90, f"transients: err {err:.1f} dB"


def test_sniffing(tmp_path, rng):
    x = _material(rng, seconds=0.5)
    p = tmp_path / "a.mp3"
    p.write_bytes(lame_encode(x, RATE, 128))
    assert sniff_container(str(p)) == Container.MP3
    # random binary junk must NOT sniff as mp3
    junk = tmp_path / "junk.bin"
    junk.write_bytes(rng.integers(0, 256, 65536, dtype=np.uint8).tobytes())
    assert sniff_mp3(str(junk)) is False
    # nor must other containers
    from folve_tpu.audio.flac import write_flac

    f = tmp_path / "a.flac"
    write_flac(str(f), x, RATE, bits=16)
    assert sniff_container(str(f)) == Container.FLAC


def test_streaming_source_chunks(tmp_path, rng):
    x = _material(rng)
    p = tmp_path / "s.mp3"
    p.write_bytes(lame_encode(x, RATE, 192, mode=1))
    whole, _ = read_mp3(str(p))
    src = Mp3Source(str(p))
    parts = []
    for n in (1, 100, 1152, 4096, 10 ** 9):
        parts.append(src.read_float(n))
    got = np.concatenate(parts, axis=0)
    src.close()
    np.testing.assert_array_equal(got, whole)


def test_id3_tags(tmp_path, rng):
    x = _material(rng, seconds=0.3)
    blob = lame_encode(x, RATE, 128)
    # hand-build an ID3v2.3 tag with TIT2/TPE1
    def frame(fid, text):
        body = b"\x00" + text.encode("latin-1")
        import struct

        return fid + struct.pack(">I", len(body)) + b"\x00\x00" + body
    frames = frame(b"TIT2", "Test Title") + frame(b"TPE1", "Test Artist")
    import struct

    sz = len(frames)
    syncsafe = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                      (sz >> 7) & 0x7F, sz & 0x7F])
    tag = b"ID3\x03\x00\x00" + syncsafe + frames
    p = tmp_path / "tagged.mp3"
    p.write_bytes(tag + blob)
    md = read_mp3_metadata(str(p))
    assert md.get("TITLE") == "Test Title"
    assert md.get("ARTIST") == "Test Artist"
    got, info = read_audio(str(p))  # tag skipped, audio decodes
    assert info.rate == RATE and len(got) > 0


def test_real_files_decode():
    """The two real-world MP3s in this image decode sanely and closely
    match the oracle after alignment (mpg123 applies LAME-tag gapless
    trimming that a raw frame decoder intentionally does not)."""
    import os

    for path in (
        "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3",
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3",
    ):
        if not os.path.exists(path):
            continue
        got, info = read_audio(path)
        assert info.rate in (8000, 11025, 12000, 16000, 22050, 24000,
                             32000, 44100, 48000)
        assert 1 <= info.channels <= 2
        assert len(got) > info.rate / 10  # at least 100 ms
        with open(path, "rb") as f:
            oracle = mpg123_decode(f.read())
        if len(oracle) == 0:
            continue
        if float(np.abs(oracle).max()) < 1e-6:
            # digitally silent file (the gsutil fixture): ours must be too
            assert float(np.abs(got).max()) < 1e-6
            continue
        # search alignment (gapless trim offset) then compare
        best = 0.0
        o = oracle[:, 0]
        g = got[:, 0]
        n = min(len(o), len(g)) - 2304
        if n < 1000:
            continue
        for off in range(0, 2304, 24):
            c = float(np.dot(g[off : off + n], o[:n]))
            denom = float(np.linalg.norm(g[off : off + n]) *
                          np.linalg.norm(o[:n])) or 1.0
            best = max(best, c / denom)
        assert best > 0.98, f"{path}: best alignment corr {best:.3f}"


def test_truncated_and_garbage(tmp_path, rng):
    x = _material(rng, seconds=0.5)
    blob = lame_encode(x, RATE, 128)
    p = tmp_path / "trunc.mp3"
    p.write_bytes(blob[: len(blob) // 2])
    got, info = read_audio(str(p))  # decodes the frames present
    assert got.shape[0] > 0
    bad = tmp_path / "bad.mp3"
    bad.write_bytes(b"\xff\xfb" + bytes(64))  # sync but nothing behind it
    try:
        read_audio(str(bad))
    except Exception:
        pass  # rejecting is fine; crashing is not


def test_through_filesystem(tmp_path, rng):
    """An MP3 convolves through the runtime and comes out FLAC/16
    (lossy input -> FLAC like the reference's ogg rule)."""
    from folve_tpu.audio.flac import read_flac
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, seconds=1.0)
    fs, src_dir = make_fs(tmp_path)
    (src_dir / "song.mp3").write_bytes(lame_encode(x, RATE, 192, mode=1))
    h = fs.get_or_create_handler("/song.mp3")
    blob = read_all(h)
    fs.close_handler("/song.mp3", h)
    assert blob[:4] == b"fLaC"
    got, info = read_flac(blob)
    assert info.rate == RATE and info.bits_per_sample == 16
    assert got.shape[0] > RATE / 2


def test_recovered_tables_still_match_oracle():
    """Gated deep check: re-run the black-box Huffman recovery for a
    sample of tables and compare against the embedded .inc data."""
    import re

    from folve_tpu.tools.gen_mp3_tables import Recovery

    rec = Recovery()
    rec.verify_count1b()
    codes, L, dims = rec.walk_table(7)
    inc = open("native/mp3_huffman.inc").read()
    m = re.search(r"static const HuffEntry kHuffTab7\[\] = \{(.*?)\};",
                  inc, re.S)
    assert m
    entries = re.findall(r"\{0x([0-9a-f]+),(\d+),0x([0-9a-f]+)\}", m.group(1))
    embedded = {}
    for xy, ln, code in entries:
        bits = format(int(code, 16), "0%db" % int(ln))
        embedded[bits] = (int(xy, 16) >> 4, int(xy, 16) & 15)
    assert embedded == codes


# --- Layers I and II -------------------------------------------------------


@pytest.mark.parametrize("name,kbps,mode,rate,ch", [
    ("l2-192-stereo", 192, 0, 44100, 2),
    ("l2-384-tableB", 384, 0, 44100, 2),
    ("l2-32-tableC", 32, None, 44100, 1),
    ("l2-32k-tableD", 32, None, 32000, 1),
    ("l2-joint", 192, 1, 44100, 2),
    ("l2-lsf-22k", 64, 0, 22050, 2),
    ("l2-lsf-16k", 32, None, 16000, 1),
])
def test_layer2_matches_mpg123(tmp_path, rng, name, kbps, mode, rate, ch):
    from folve_tpu.tools.mp3_oracle import twolame_available, twolame_encode

    if not twolame_available():
        pytest.skip("no twolame fixture encoder")
    x = _material(rng, ch=ch, rate=rate)
    blob = twolame_encode(x, rate, kbps, mode=mode)
    p = tmp_path / f"{name}.mp2"
    p.write_bytes(blob)
    got, info = read_audio(str(p))
    assert info.container == Container.MP3  # MPEG audio family
    assert info.rate == rate and info.channels == ch
    oracle = mpg123_decode(blob)
    err = _err_db(got, oracle)
    assert err < -90, f"{name}: err {err:.1f} dB vs oracle"


def test_layer1_matches_mpg123(tmp_path, rng):
    """No Layer I encoder exists in this image, so hand-craft valid
    frames (alloc + scalefactors + linear samples) and compare both
    decoders on them."""
    from folve_tpu.tools.mp3_frames import BitPacker

    def craft(allocs, sfs, samples):
        bp = BitPacker()
        bp.put(0x7FF, 11); bp.put(3, 2); bp.put(3, 2); bp.put(1, 1)
        bp.put(12, 4); bp.put(0, 2); bp.put(0, 1); bp.put(0, 1)
        bp.put(3, 2); bp.put(0, 2); bp.put(0, 1); bp.put(1, 1); bp.put(0, 2)
        for sb in range(32):
            bp.put(allocs[sb], 4)
        for sb in range(32):
            if allocs[sb]:
                bp.put(sfs[sb], 6)
        for gr in range(12):
            for sb in range(32):
                if allocs[sb]:
                    bp.put(samples[gr][sb], allocs[sb] + 1)
        return bp.bytes(pad_to=(12 * 384000 // 44100) * 4)

    allocs = [0] * 32
    sfs = [0] * 32
    for sb in range(16):
        allocs[sb] = int(rng.integers(1, 15))
        sfs[sb] = int(rng.integers(0, 48))
    samples = [
        [int(rng.integers(0, (1 << (allocs[sb] + 1)) - 1)) if allocs[sb] else 0
         for sb in range(32)]
        for _ in range(12)
    ]
    stream = craft(allocs, sfs, samples) * 4
    p = tmp_path / "l1.mp1"
    p.write_bytes(stream)
    got, info = read_audio(str(p))
    assert info.rate == 44100 and info.channels == 1
    oracle = mpg123_decode(stream)
    err = _err_db(got, oracle)
    assert err < -90, f"layer1: err {err:.1f} dB vs oracle"


def test_layer2_through_filesystem(tmp_path, rng):
    from folve_tpu.audio.flac import read_flac
    from folve_tpu.tools.mp3_oracle import twolame_available, twolame_encode
    from tests.test_runtime import make_fs, read_all

    if not twolame_available():
        pytest.skip("no twolame fixture encoder")
    x = _material(rng, seconds=1.0)
    fs, src_dir = make_fs(tmp_path)
    (src_dir / "song.mp2").write_bytes(twolame_encode(x, RATE, 192))
    h = fs.get_or_create_handler("/song.mp2")
    blob = read_all(h)
    fs.close_handler("/song.mp2", h)
    assert blob[:4] == b"fLaC"
    got, info = read_flac(blob)
    assert info.rate == RATE and got.shape[0] > RATE / 2


# --- MPEG-in-WAV (fmt tags 0x50/0x55) --------------------------------------
# libsndfile 1.1 decodes MPEG audio wrapped in a WAV data chunk for the
# reference (when built with mpg123 — the bundled test oracle is not, so
# the payload oracle here is mpg123 on the raw bitstream, same as above).


def _wrap_mpeg_in_wav(blob: bytes, rate: int, channels: int, tag=0x0055) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", tag, channels, rate, 16000, 1, 0)
    fmt += struct.pack("<H", 12) + struct.pack("<HHHIH", 1, 2, 0, 0, 0)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(blob)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(blob)) + blob
    return out


@pytest.mark.parametrize("tag,layer", [(0x0055, 3), (0x0050, 2)])
def test_mpeg_in_wav_matches_mpg123(tmp_path, rng, tag, layer):
    x = _material(rng)
    if layer == 3:
        blob = lame_encode(x, RATE, 128, mode=1)
    else:
        from folve_tpu.tools.mp3_oracle import twolame_available, twolame_encode

        if not twolame_available():
            pytest.skip("no twolame fixture encoder")
        blob = twolame_encode(x, RATE, 192)
    p = tmp_path / "m.wav"
    p.write_bytes(_wrap_mpeg_in_wav(blob, RATE, 2, tag=tag))

    assert sniff_container(str(p)) == Container.WAV
    info = read_audio_info(str(p))
    assert info.rate == RATE and info.channels == 2
    got, ginfo = read_audio(str(p))
    assert ginfo.container == Container.WAV
    assert got.shape[0] == info.frames
    oracle = mpg123_decode(blob)
    err = _err_db(got, oracle)
    assert err < -90, f"tag 0x{tag:04x}: err {err:.1f} dB vs oracle"


def test_mpeg_in_wav_streaming_source(tmp_path, rng):
    from folve_tpu.audio.source import open_source

    x = _material(rng)
    blob = lame_encode(x, RATE, 128)
    p = tmp_path / "m.wav"
    p.write_bytes(_wrap_mpeg_in_wav(blob, RATE, 2))
    whole, _ = read_audio(str(p))

    src = open_source(str(p))
    assert src is not None and src.info.container == Container.WAV
    chunks = []
    while True:
        blk = src.read_float(3001)
        if blk.shape[0] == 0:
            break
        chunks.append(blk)
    src.close()
    np.testing.assert_array_equal(np.concatenate(chunks), whole)


def test_mpeg_in_wav_through_filesystem(tmp_path, rng):
    from folve_tpu.audio.flac import read_flac
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, seconds=1.0)
    fs, src_dir = make_fs(tmp_path)
    (src_dir / "song.wav").write_bytes(
        _wrap_mpeg_in_wav(lame_encode(x, RATE, 192), RATE, 2)
    )
    h = fs.get_or_create_handler("/song.wav")
    blob = read_all(h)
    fs.close_handler("/song.wav", h)
    assert blob[:4] == b"fLaC"
    got, info = read_flac(blob)
    assert info.rate == RATE and got.shape[0] > RATE / 2
