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
