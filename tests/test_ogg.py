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
