"""AIFF codec + runtime integration tests."""

import io

import numpy as np
import pytest

import struct

from folve_tpu.audio.aiff import (
    AiffError,
    AiffStreamEncoder,
    read_aiff,
    read_aiff_info,
    read_aiff_metadata,
    write_aiff,
)

from tests.test_runtime import echo_ir, expected_conv, make_fs, read_all


def _add_text_chunks(blob: bytes, chunks: dict) -> bytes:
    """Splice NAME/AUTH/... text chunks into a FORM/AIFF blob."""
    text = b""
    for cid, value in chunks.items():
        payload = value.encode()
        text += cid + struct.pack(">I", len(payload)) + payload
        if len(payload) & 1:
            text += b"\0"
    body_len = struct.unpack(">I", blob[4:8])[0] + len(text)
    return blob[:4] + struct.pack(">I", body_len) + blob[8:12] + text + blob[12:]


@pytest.mark.parametrize("bits,atol", [(16, 1 / 32768), (24, 1 / 8388608), (32, 1e-7)])
def test_roundtrip(rng, bits, atol):
    x = rng.uniform(-0.8, 0.8, (1000, 2)).astype(np.float32)
    buf = io.BytesIO()
    write_aiff(buf, x, 44100, bits)
    data, info = read_aiff(buf.getvalue())
    assert info.rate == 44100 and info.channels == 2 and info.frames == 1000
    assert info.bits_per_sample == bits
    np.testing.assert_allclose(data, x, atol=atol)


def test_extended_float_rates(rng):
    for rate in (8000, 22050, 44100, 48000, 96000, 192000):
        buf = io.BytesIO()
        write_aiff(buf, np.zeros((10, 1), np.float32), rate, 16)
        assert read_aiff_info(buf.getvalue()).rate == rate


def test_rejects_garbage():
    with pytest.raises(AiffError):
        read_aiff(b"FORMxxxxWAVE....")


def test_stream_encoder_matches_offline(rng):
    x = rng.uniform(-0.5, 0.5, (500, 2)).astype(np.float32)
    x = np.round(x * 32768) / 32768
    enc = AiffStreamEncoder(44100, 2, 16, 500)
    blob = enc.header() + enc.write_float(x[:123]) + enc.write_float(x[123:]) + enc.finish()
    data, info = read_aiff(blob)
    assert info.frames == 500
    np.testing.assert_allclose(data, x, atol=1e-7)


def test_metadata_read_and_encode(rng):
    buf = io.BytesIO()
    write_aiff(buf, np.zeros((10, 2), np.float32), 44100, 16)
    tagged = _add_text_chunks(
        buf.getvalue(),
        {b"NAME": "My Song", b"AUTH": "An Artist", b"(c) ": "2026", b"ANNO": "note"},
    )
    tags = read_aiff_metadata(tagged)
    assert tags == {
        "TITLE": "My Song",
        "ARTIST": "An Artist",
        "COPYRIGHT": "2026",
        "COMMENT": "note",
    }
    # Audio still decodes with the extra chunks in front.
    data, info = read_aiff(tagged)
    assert info.frames == 10
    # Encoder emits them back out.
    enc = AiffStreamEncoder(44100, 2, 16, 5)
    x = np.zeros((5, 2), np.float32)
    blob = enc.header(tags) + enc.write_float(x) + enc.finish()
    assert read_aiff_metadata(blob) == tags
    data, info = read_aiff(blob)
    assert info.frames == 5


def test_aiff_tags_carried_through_filesystem(tmp_path, rng):
    """Reference behavior: string tags survive the convolution
    (convolve-file-handler.cc:484-495) — the round-1 known gap."""
    fs, src = make_fs(tmp_path)
    x = np.round(rng.uniform(-0.4, 0.4, (1500, 2)) * 32768) / 32768
    buf = io.BytesIO()
    write_aiff(buf, x.astype(np.float32), 44100, 16)
    (src / "tagged.aiff").write_bytes(
        _add_text_chunks(buf.getvalue(), {b"NAME": "Tag Me", b"AUTH": "Artist X"})
    )
    h = fs.get_or_create_handler("/tagged.aiff")
    blob = read_all(h)
    fs.close_handler("/tagged.aiff", h)
    tags = read_aiff_metadata(blob)
    assert tags["TITLE"] == "Tag Me"
    assert tags["ARTIST"] == "Artist X"
    got, _ = read_aiff(blob)
    ref = expected_conv(x, echo_ir())
    assert np.max(np.abs(got - ref)) < 2.5 / 32768


def test_aiff_through_filesystem(tmp_path, rng):
    """AIFF in -> convolved AIFF out (reference keeps original format)."""
    fs, src = make_fs(tmp_path)
    x = rng.uniform(-0.4, 0.4, (2000, 2)).astype(np.float32)
    x = np.round(x * 32768) / 32768
    write_aiff(str(src / "song.aiff"), x, 44100, 16)
    h = fs.get_or_create_handler("/song.aiff")
    blob = read_all(h)
    assert blob[:4] == b"FORM"
    got, info = read_aiff(blob)
    assert got.shape[0] == 2000
    ref = expected_conv(x, echo_ir())
    assert np.max(np.abs(got - ref)) < 2.5 / 32768
    fs.close_handler("/song.aiff", h)


def test_truncated_aiff_short_decodes_and_reports_short_frames(tmp_path, rng):
    """A truncated SSND must decode the frames actually present AND
    report that short count in AudioInfo — exact-size output headers
    are built from it (the WAV parser clamps the same way)."""
    from folve_tpu.audio.aiff import read_aiff, read_aiff_info, write_aiff

    x = (np.round(rng.uniform(-0.5, 0.5, (2000, 2)) * 32768) / 32768).astype(
        np.float32
    )
    p = tmp_path / "t.aiff"
    write_aiff(str(p), x, 44100, bits=16)
    blob = p.read_bytes()
    cut = tmp_path / "cut.aiff"
    cut.write_bytes(blob[: len(blob) - 1000 * 2 * 2 - 1])  # mid-sample cut
    got, info = read_aiff(str(cut))
    assert info.frames == got.shape[0] < 2000
    np.testing.assert_array_equal(got, x[: got.shape[0]])
    assert read_aiff_info(str(cut)).frames == got.shape[0]


def test_zero_rate_aiff_is_rejected_not_hung(tmp_path, rng):
    """A COMM chunk whose 80-bit rate decodes to 0 (or an inf/NaN
    encoding) must raise AiffError — the stream encoder used to spin
    forever normalizing a zero mantissa."""
    import struct

    from folve_tpu.audio.aiff import AiffError, AiffStreamEncoder, read_aiff_info, write_aiff

    x = np.zeros((64, 2), np.float32)
    p = tmp_path / "t.aiff"
    write_aiff(str(p), x, 44100, bits=16)
    blob = bytearray(p.read_bytes())
    comm = blob.index(b"COMM")
    # rate field = COMM body offset 8..18
    blob[comm + 8 + 8 : comm + 8 + 18] = bytes(10)  # rate := 0
    zp = tmp_path / "zero.aiff"
    zp.write_bytes(bytes(blob))
    with pytest.raises(AiffError):
        read_aiff_info(str(zp))
    blob[comm + 8 + 8 : comm + 8 + 18] = struct.pack(">HQ", 0x7FFF, 1 << 63)
    ip = tmp_path / "inf.aiff"
    ip.write_bytes(bytes(blob))
    with pytest.raises(AiffError):
        read_aiff_info(str(ip))
    with pytest.raises(AiffError):
        AiffStreamEncoder(0, 2, 16, 64).header()


# --- AIFC compression variants vs libsndfile -------------------------------

SF_AIFF = 0x020000
AIFC_SUBS = {"ulaw": 0x10, "alaw": 0x11, "ima4": 0x12, "fl64": 0x07,
             "u8": 0x05}


@pytest.mark.parametrize("name", ["ulaw", "alaw", "ima4", "fl64", "u8"])
@pytest.mark.parametrize("ch", [1, 2])
def test_aifc_compressions_match_libsndfile(tmp_path, rng, name, ch):
    from tests.test_extra_formats import _sf_read, _sf_write

    x = np.round(rng.uniform(-0.5, 0.5, (3333, ch)).astype(np.float32)
                 * 32768) / 32768
    p = tmp_path / f"{name}.aifc"
    _sf_write(p, x, 44100, SF_AIFF | AIFC_SUBS[name])
    got, info = read_aiff(str(p))
    oracle, orate = _sf_read(p)
    assert orate == 44100
    assert got.shape == oracle.shape, (name, got.shape, oracle.shape)
    np.testing.assert_array_equal(got, oracle)
    from folve_tpu.audio import read_audio_info

    assert read_audio_info(str(p)).frames == oracle.shape[0]


@pytest.mark.parametrize("name", ["ulaw", "ima4"])
def test_aifc_streaming_source(tmp_path, rng, name):
    from folve_tpu.audio.source import open_source
    from tests.test_extra_formats import _sf_write

    x = rng.uniform(-0.5, 0.5, (5000, 2)).astype(np.float32)
    p = tmp_path / f"{name}.aifc"
    _sf_write(p, x, 44100, SF_AIFF | AIFC_SUBS[name])
    whole, _ = read_aiff(str(p))
    src = open_source(str(p))
    parts = []
    for n in (1, 63, 64, 1000, 10 ** 9):
        parts.append(src.read_float(n))
    got = np.concatenate(parts, axis=0)
    src.close()
    np.testing.assert_array_equal(got, whole)


def test_aifc_ulaw_quicktime_samplesize_convention(tmp_path, rng):
    """AIFF-C's COMM sampleSize for compressed audio is the UNcompressed
    width; QuickTime writes 16 for ulaw (libsndfile writes 8).  The
    frame count must not be halved by a 16-bit storage assumption."""
    from folve_tpu.audio import read_audio_info
    from folve_tpu.audio.source import open_source
    from tests.test_extra_formats import _sf_write

    x = rng.uniform(-0.5, 0.5, (1000, 1)).astype(np.float32)
    p = tmp_path / "qt.aifc"
    _sf_write(p, x, 44100, SF_AIFF | AIFC_SUBS["ulaw"])
    blob = bytearray(p.read_bytes())
    i = blob.find(b"COMM")
    # COMM body: channels(2) frames(4) sampleSize(2): patch 8 -> 16
    assert blob[i + 14 : i + 16] == (8).to_bytes(2, "big")
    blob[i + 14 : i + 16] = (16).to_bytes(2, "big")
    p.write_bytes(bytes(blob))
    info = read_audio_info(str(p))
    assert info.frames == 1000
    got, info2 = read_aiff(str(p))
    assert got.shape[0] == 1000 and info2.frames == 1000
    src = open_source(str(p))
    streamed = src.read_float(10 ** 9)
    src.close()
    assert streamed.shape[0] == 1000


def test_aifc_twos_alias(tmp_path, rng):
    """QuickTime writes compression 'twos' for plain big-endian PCM."""
    x = np.round(rng.uniform(-0.5, 0.5, (500, 2)).astype(np.float32)
                 * 32768) / 32768
    p = tmp_path / "t.aifc"
    from folve_tpu.audio.aiff import write_aiff

    write_aiff(str(p), x, 44100, bits=16)
    blob = bytearray(p.read_bytes())
    # rewrite as AIFC with a 'twos' COMM
    blob[8:12] = b"AIFC"
    i = blob.find(b"COMM")
    size = int.from_bytes(blob[i + 4 : i + 8], "big")
    body = blob[i + 8 : i + 8 + size] + b"twos"
    out = blob[: i + 4] + len(body).to_bytes(4, "big") + body + blob[i + 8 + size :]
    p.write_bytes(bytes(out))
    got, info = read_aiff(str(p))
    np.testing.assert_allclose(got, x, atol=1 / 32768)
