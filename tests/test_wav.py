"""WAV codec round-trip tests."""

import io

import numpy as np
import pytest

from folve_tpu.audio import SampleCodec, read_wav, read_wav_info, write_wav
from folve_tpu.audio.wav import WavError


@pytest.mark.parametrize(
    "codec,atol",
    [
        (SampleCodec.PCM_16, 1 / 32768),
        (SampleCodec.PCM_24, 1 / 8388608),
        (SampleCodec.PCM_32, 1 / 2147483648 * 4),
        (SampleCodec.FLOAT, 0),
        (SampleCodec.DOUBLE, 1e-7),
    ],
)
def test_roundtrip(rng, codec, atol):
    x = rng.uniform(-0.9, 0.9, (1000, 2)).astype(np.float32)
    buf = io.BytesIO()
    write_wav(buf, x, 44100, codec)
    data, info = read_wav(buf.getvalue())
    assert info.rate == 44100
    assert info.channels == 2
    assert info.frames == 1000
    np.testing.assert_allclose(data, x, atol=atol or 1e-7)


def test_mono_1d_input(rng):
    x = rng.standard_normal(256).astype(np.float32) * 0.1
    buf = io.BytesIO()
    write_wav(buf, x, 48000, SampleCodec.FLOAT)
    data, info = read_wav(buf.getvalue())
    assert info.channels == 1
    np.testing.assert_allclose(data[:, 0], x)


def test_info_only(rng, tmp_path):
    x = rng.standard_normal((100, 2)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 96000, SampleCodec.PCM_24)
    info = read_wav_info(p)
    assert (info.rate, info.channels, info.frames, info.bits_per_sample) == (
        96000,
        2,
        100,
        24,
    )


def test_corrupt_block_align_does_not_missize_stream(rng):
    """For simple sample codecs the frame count derives from
    channels x storage width (libsndfile's computed blockwidth), NOT
    the declared block_align — a corrupt alignment field must not
    inflate the frame count and read past the data chunk."""
    import struct

    x = rng.uniform(-0.5, 0.5, (100, 2)).astype(np.float32)
    buf = io.BytesIO()
    write_wav(buf, x, 44100, SampleCodec.PCM_16)
    blob = bytearray(buf.getvalue())
    i = blob.index(b"fmt ")
    struct.pack_into("<H", blob, i + 8 + 12, 2)  # block_align: 4 -> 2
    data, info = read_wav(bytes(blob))
    assert info.frames == 100 and data.shape == (100, 2)


def test_rejects_garbage():
    with pytest.raises(WavError):
        read_wav(b"not a wav file at all........")


def test_clipping_on_pcm_write():
    x = np.array([[1.5], [-1.5]], dtype=np.float32)
    buf = io.BytesIO()
    write_wav(buf, x, 44100, SampleCodec.PCM_16)
    data, _ = read_wav(buf.getvalue())
    assert data[0, 0] == pytest.approx(32767 / 32768)
    assert data[1, 0] == pytest.approx(-1.0)


# --- alaw / ulaw / IMA-ADPCM sample codecs (VERDICT r3 #3) -----------------
# The reference convolves any WAV libsndfile decodes, including telephony
# codecs and IMA ADPCM (probe at convolve-file-handler.cc:62-76).  The
# libsndfile bundled with pygame is the encode+decode oracle.

SF_WAV = 0x010000
SF_SUB_ULAW, SF_SUB_ALAW, SF_SUB_IMA = 0x0010, 0x0011, 0x0012


@pytest.mark.parametrize("sub,codec_name", [
    (SF_SUB_ULAW, "ulaw"),
    (SF_SUB_ALAW, "alaw"),
    (SF_SUB_IMA, "ima_adpcm"),
])
def test_wav_codec_matches_libsndfile(tmp_path, rng, sub, codec_name):
    from tests.test_extra_formats import _sf_read, _sf_write

    x = (rng.uniform(-0.5, 0.5, (4421, 2))).astype(np.float32)
    x = np.round(x * 32768) / 32768
    p = tmp_path / "c.wav"
    _sf_write(p, x, 44100, SF_WAV | sub)
    got, info = read_wav(str(p))
    assert info.codec.value == codec_name
    oracle, orate = _sf_read(p)
    assert orate == 44100
    assert got.shape == oracle.shape, (got.shape, oracle.shape)
    # Same int16 reconstruction -> identical floats.
    np.testing.assert_array_equal(got, oracle)


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_ima_adpcm_streaming_source(tmp_path, rng, ch):
    """WavSource must slice IMA ADPCM block decodes bit-identically to
    the whole-file decode, across uneven chunk boundaries."""
    from folve_tpu.audio.source import WavSource
    from tests.test_extra_formats import _sf_write

    x = (rng.uniform(-0.5, 0.5, (10000, ch))).astype(np.float32)
    p = tmp_path / "s.wav"
    _sf_write(p, x, 44100, SF_WAV | SF_SUB_IMA)
    whole, info = read_wav(str(p))
    src = WavSource(str(p))
    parts = []
    for n in (1, 3, 500, 1021, 2048, 99999):
        parts.append(src.read_float(n))
    got = np.concatenate(parts, axis=0)
    src.close()
    assert got.shape == whole.shape
    np.testing.assert_array_equal(got, whole)


def test_wav_adpcm_through_filesystem(tmp_path, rng):
    """An IMA ADPCM WAV convolves through the runtime (out as FLAC per
    the wav->flac output rule) instead of passing through unfiltered."""
    from folve_tpu.audio.flac import read_flac
    from tests.test_extra_formats import _sf_write
    from tests.test_runtime import make_fs, read_all

    x = (rng.uniform(-0.4, 0.4, (3000, 2))).astype(np.float32)
    src_file = tmp_path / "in.wav"
    _sf_write(src_file, x, 44100, SF_WAV | SF_SUB_IMA)

    fs, src_dir = make_fs(tmp_path)
    import shutil

    shutil.copy(src_file, src_dir / "song.wav")
    h = fs.get_or_create_handler("/song.wav")
    blob = read_all(h)
    fs.close_handler("/song.wav", h)
    assert blob[:4] == b"fLaC"
    got, info = read_flac(blob)
    assert info.frames == read_wav(str(src_file))[1].frames


def test_wav_adpcm_odd_block_align_no_crash(tmp_path):
    """A block_align that is not header + k*4*ch whole nibble groups
    must decode what the groups carry, not raise IndexError."""
    import struct

    ch, ba = 2, 12  # passes the minimum-size guard; zero whole groups
    fmt = struct.pack("<HHIIHH", 0x0011, ch, 8000, 8000, ba, 4)
    fmt += struct.pack("<HH", 2, 99)  # absurd declared spb: ignored
    data = bytes(ba * 3)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    p = tmp_path / "odd.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    got, info = read_wav(str(p))
    assert info.samples_per_block == 1  # header-only blocks
    assert got.shape == (3, ch)  # the predictors decode, nothing else


def test_wav_alaw_reports_16_bit(tmp_path, rng):
    """G.711 reports decoded 16-bit depth (like the AU reader), so the
    CLI's FLAC output does not quantize to 8 bits."""
    from folve_tpu.audio.source import WavSource
    from tests.test_extra_formats import _sf_write

    x = (rng.uniform(-0.5, 0.5, (2000, 1))).astype(np.float32)
    p = tmp_path / "a.wav"
    _sf_write(p, x, 8000, 0x010000 | 0x0011)
    whole, info = read_wav(str(p))
    assert info.bits_per_sample == 16
    src = WavSource(str(p))  # storage width stays 1 byte/sample
    got = src.read_float(10 ** 9)
    src.close()
    np.testing.assert_array_equal(got, whole)


SF_SUB_MS = 0x0013


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_ms_adpcm_matches_libsndfile(tmp_path, rng, ch):
    from tests.test_extra_formats import _sf_read, _sf_write

    x = (rng.uniform(-0.5, 0.5, (9777, ch))).astype(np.float32)
    p = tmp_path / "ms.wav"
    _sf_write(p, x, 44100, SF_WAV | SF_SUB_MS)
    got, info = read_wav(str(p))
    assert info.codec == SampleCodec.MS_ADPCM
    oracle, orate = _sf_read(p)
    assert orate == 44100
    assert got.shape == oracle.shape, (got.shape, oracle.shape)
    np.testing.assert_array_equal(got, oracle)


def test_wav_ms_adpcm_streaming_source(tmp_path, rng):
    from folve_tpu.audio.source import WavSource
    from tests.test_extra_formats import _sf_write

    x = (rng.uniform(-0.5, 0.5, (8000, 2))).astype(np.float32)
    p = tmp_path / "s.wav"
    _sf_write(p, x, 44100, SF_WAV | SF_SUB_MS)
    whole, info = read_wav(str(p))
    src = WavSource(str(p))
    parts = []
    for n in (1, 3, 777, 2048, 99999):
        parts.append(src.read_float(n))
    got = np.concatenate(parts, axis=0)
    src.close()
    np.testing.assert_array_equal(got, whole)
