"""Legacy containers (VOC / IRCAM / NIST / 8SVX / PVF) vs libsndfile.

The reference convolves anything libsndfile decodes
(convolve-file-handler.cc:62-76); these historical formats are the long
tail of that claim.  Fixtures are written by the libsndfile oracle and
must decode sample-exact; VOC/IRCAM/NIST/PVF also round-trip through
our streaming encoders and back through libsndfile.
"""

import ctypes
import os

import numpy as np
import pytest

from folve_tpu.audio import Container, read_audio, read_audio_info, sniff_container
from tests.test_extra_formats import _sf, _sf_read, _sf_write

RATE = 44100

SF_VOC, SF_NIST, SF_SVX, SF_IRCAM, SF_PVF = (
    0x080000, 0x070000, 0x060000, 0x0A0000, 0x0E0000,
)
SF_PCM_16, SF_PCM_S8, SF_ULAW = 0x0002, 0x0001, 0x0010


def _material(rng, frames=5000, ch=2):
    x = rng.uniform(-0.5, 0.5, (frames, ch)).astype(np.float32)
    return np.round(x * 32768) / 32768


@pytest.mark.parametrize("name,fmt,sub,container,ch,tol", [
    ("voc", SF_VOC, SF_PCM_16, Container.VOC, 1, 1 / 32768),
    ("voc-stereo", SF_VOC, SF_PCM_16, Container.VOC, 2, 1 / 32768),
    ("voc-ulaw", SF_VOC, SF_ULAW, Container.VOC, 1, 0.05),
    ("ircam", SF_IRCAM, SF_PCM_16, Container.IRCAM, 2, 1 / 32768),
    ("ircam-ulaw", SF_IRCAM, SF_ULAW, Container.IRCAM, 1, 0.05),
    ("nist", SF_NIST, SF_PCM_16, Container.NIST, 2, 1 / 32768),
    ("nist-ulaw", SF_NIST, SF_ULAW, Container.NIST, 1, 0.05),
    ("svx16", SF_SVX, SF_PCM_16, Container.SVX, 1, 1 / 32768),
    ("svx8", SF_SVX, SF_PCM_S8, Container.SVX, 1, 1 / 128),
    ("pvf", SF_PVF, SF_PCM_16, Container.PVF, 1, 1 / 32768),
    ("pvf-stereo", SF_PVF, SF_PCM_16, Container.PVF, 2, 1 / 32768),
])
def test_decodes_libsndfile_files(tmp_path, rng, name, fmt, sub, container,
                                  ch, tol):
    x = _material(rng, ch=ch)
    p = tmp_path / name
    _sf_write(p, x, RATE, fmt | sub)
    assert sniff_container(str(p)) == container
    got, info = read_audio(str(p))
    assert info.container == container
    oracle, orate = _sf_read(p)
    assert orate == RATE
    assert got.shape == oracle.shape, (got.shape, oracle.shape)
    # Same integer reconstruction -> identical floats (lossy codecs
    # compare against the ORACLE decode, also exact).
    np.testing.assert_array_equal(got, oracle)
    info2 = read_audio_info(str(p))
    assert info2.frames == got.shape[0]
    assert info2.rate == RATE and info2.channels == ch


@pytest.mark.parametrize("name,container", [
    ("song.voc", Container.VOC),
    ("song.sf", Container.IRCAM),
    ("song.nist", Container.NIST),
    ("song.pvf", Container.PVF),
])
def test_through_filesystem_same_container(tmp_path, rng, name, container):
    """Legacy input convolves and comes back out in its ORIGINAL
    container ('else: original format'), readable by libsndfile."""
    from tests.test_runtime import make_fs, read_all

    fmt = {Container.VOC: SF_VOC, Container.IRCAM: SF_IRCAM,
           Container.NIST: SF_NIST, Container.PVF: SF_PVF}[container]
    x = _material(rng, frames=3000, ch=2)
    fs, src_dir = make_fs(tmp_path)
    _sf_write(src_dir / name, x, RATE, fmt | SF_PCM_16)
    h = fs.get_or_create_handler(f"/{name}")
    blob = read_all(h)
    fs.close_handler(f"/{name}", h)
    out = tmp_path / f"out-{name}"
    out.write_bytes(blob)
    assert sniff_container(str(out)) == container
    got, info = read_audio(str(out))
    assert info.rate == RATE and info.channels == 2
    assert got.shape[0] == x.shape[0]
    # and the ORACLE can read our output too
    oracle, orate = _sf_read(out)
    assert orate == RATE and oracle.shape == got.shape
    np.testing.assert_array_equal(got, oracle)


def test_svx_falls_back_to_flac(tmp_path, rng):
    """8SVX input convolves; output is FLAC (the container can't carry
    our stereo 16-bit output sensibly)."""
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, frames=3000, ch=1)
    fs, src_dir = make_fs(tmp_path, conf_text=(
        "/convolver/new 1 1 64 512\n"
        "/impulse/dirac 1 1 0.7 0\n"
        "/impulse/dirac 1 1 0.3 100\n"
    ))
    _sf_write(src_dir / "song.8svx", x, RATE, SF_SVX | SF_PCM_16)
    h = fs.get_or_create_handler("/song.8svx")
    blob = read_all(h)
    fs.close_handler("/song.8svx", h)
    assert blob[:4] == b"fLaC"


def test_corrupt_legacy_headers_reject(tmp_path):
    from folve_tpu.audio.legacy import LegacyError, parse_nist, parse_pvf, parse_voc

    with pytest.raises(LegacyError):
        parse_voc(b"Creative Voice File\x1a" + bytes(6))
    with pytest.raises(LegacyError):
        parse_nist(b"NIST_1A\nxxxxxxxx\n" + bytes(32), 2000)
    with pytest.raises(LegacyError):
        parse_pvf(b"PVF1\nnot numbers\n", 100)


def test_voc_continuation_blocks(tmp_path, rng):
    """Type-1 sound data followed by type-2 continuation blocks: the
    extents concatenate; the streaming opener falls back to the
    in-memory source (multi-extent payload)."""
    import struct

    from folve_tpu.audio.legacy import read_voc
    from folve_tpu.audio.source import open_source

    x = np.round(rng.uniform(-0.5, 0.5, 3000).astype(np.float32) * 128) / 128
    pcm = np.clip(np.round(x * 128), -128, 127).astype(np.int8)
    u8 = (pcm.astype(np.int16) + 128).astype(np.uint8).tobytes()
    sr_code = 256 - round(1000000 / 22050)
    head = b"Creative Voice File\x1a" + struct.pack("<HHH", 26, 0x010A,
                                                    (~0x010A + 0x1234) & 0xFFFF)
    b1 = bytes([1]) + (len(u8) // 2 + 2).to_bytes(3, "little") + bytes(
        [sr_code, 0]) + u8[: len(u8) // 2]
    b2 = bytes([2]) + (len(u8) - len(u8) // 2).to_bytes(3, "little") + u8[
        len(u8) // 2 :]
    p = tmp_path / "multi.voc"
    p.write_bytes(head + b1 + b2 + b"\x00")
    got, info = read_voc(str(p))
    assert info.channels == 1 and got.shape[0] == 3000
    expect = (np.frombuffer(u8, np.uint8).astype(np.float32) - 128.0) / 128.0
    np.testing.assert_array_equal(got[:, 0], expect)
    src = open_source(str(p))
    assert type(src).__name__ == "_MemorySource"
    streamed = src.read_float(10 ** 9)
    src.close()
    np.testing.assert_array_equal(streamed, got)


# ---------------------------------------------------------------------------
# Round-4b additions: PAF / AVR / WVE / MAT4 / MAT5
# ---------------------------------------------------------------------------

SF_PAF, SF_AVR, SF_WVE, SF_MAT4, SF_MAT5 = (
    0x050000, 0x120000, 0x190000, 0x0C0000, 0x0D0000,
)
SF_ALAW, SF_FLOAT, SF_DOUBLE = 0x0011, 0x0006, 0x0007


@pytest.mark.parametrize("name,fmt,sub,container,ch,rate,tol", [
    ("f.paf", SF_PAF, SF_PCM_16, Container.PAF, 2, RATE, 0),
    ("f8.paf", SF_PAF, SF_PCM_S8, Container.PAF, 1, RATE, 0),
    ("f.avr", SF_AVR, SF_PCM_16, Container.AVR, 2, RATE, 0),
    ("f8.avr", SF_AVR, SF_PCM_S8, Container.AVR, 1, RATE, 0),
    ("f.wve", SF_WVE, SF_ALAW, Container.WVE, 1, 8000, 0),
    ("f.mat4", SF_MAT4, SF_PCM_16, Container.MAT, 2, RATE, 0),
    ("fd.mat4", SF_MAT4, SF_DOUBLE, Container.MAT, 1, RATE, 0),
    ("f.mat5", SF_MAT5, SF_PCM_16, Container.MAT, 2, RATE, 0),
    ("ff.mat5", SF_MAT5, SF_FLOAT, Container.MAT, 1, RATE, 0),
])
def test_decodes_more_libsndfile_files(tmp_path, rng, name, fmt, sub,
                                       container, ch, rate, tol):
    x = _material(rng, frames=1500, ch=ch)
    p = tmp_path / name
    _sf_write(p, x, rate, fmt | sub)
    assert sniff_container(str(p)) == container
    got, info = read_audio(str(p))
    assert info.container == container
    oracle, orate = _sf_read(p)
    assert orate == rate
    assert got.shape == oracle.shape, (got.shape, oracle.shape)
    np.testing.assert_allclose(got, oracle, atol=tol)
    info2 = read_audio_info(str(p))
    assert info2.frames == got.shape[0]
    assert info2.rate == rate and info2.channels == ch


@pytest.mark.parametrize("name,container", [
    ("song.paf", Container.PAF),
    ("song.avr", Container.AVR),
])
def test_paf_avr_through_filesystem(tmp_path, rng, name, container):
    """PAF/AVR input -> convolved output in the ORIGINAL container,
    readable by libsndfile."""
    from tests.test_runtime import make_fs, read_all

    fmt = {Container.PAF: SF_PAF, Container.AVR: SF_AVR}[container]
    x = _material(rng, frames=3000, ch=2)
    fs, src_dir = make_fs(tmp_path)
    _sf_write(src_dir / name, x, RATE, fmt | SF_PCM_16)
    h = fs.get_or_create_handler(f"/{name}")
    blob = read_all(h)
    fs.close_handler(f"/{name}", h)
    out = tmp_path / f"out-{name}"
    out.write_bytes(blob)
    assert sniff_container(str(out)) == container
    got, info = read_audio(str(out))
    assert info.rate == RATE and info.channels == 2
    assert got.shape[0] == x.shape[0]
    oracle, orate = _sf_read(out)
    assert orate == RATE and oracle.shape == got.shape
    np.testing.assert_array_equal(got, oracle)


def test_paf24_through_filesystem_keeps_depth(tmp_path, rng):
    """A 24-bit PAF input convolves to a 24-bit fmt-1 PAF (block-packed
    units), bit-equal under libsndfile's own reader."""
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, frames=3000, ch=2)
    fs, src_dir = make_fs(tmp_path)
    _sf_write(src_dir / "song.paf", x, RATE, SF_PAF | 0x03)
    h = fs.get_or_create_handler("/song.paf")
    blob = read_all(h)
    fs.close_handler("/song.paf", h)
    out = tmp_path / "out.paf"
    out.write_bytes(blob)
    got, info = read_audio(str(out))
    assert info.codec.value == "pcm_24" and info.bits_per_sample == 24
    oracle, orate = _sf_read(out)
    assert orate == RATE and oracle.shape == got.shape
    np.testing.assert_array_equal(got, oracle)


@pytest.mark.parametrize("frames", [2997, 3000, 1])
@pytest.mark.parametrize("ch", [1, 2])
def test_paf24_encoder_roundtrip(tmp_path, rng, frames, ch):
    """PafStreamEncoder fmt-1: chunked writes + finish produce a stream
    both our reader and libsndfile decode to the input exactly; a
    partial final unit zero-pads (readers derive the ceil'd count from
    the size, as libsndfile's own writer/reader pair does)."""
    from folve_tpu.audio.legacy import PafStreamEncoder

    x = _material(rng, frames=frames, ch=ch)
    xq = np.round(np.clip(x, -1, 1) * (1 << 23)) / (1 << 23)
    enc = PafStreamEncoder(rate=RATE, channels=ch, bits=24,
                           total_frames=frames)
    blob = enc.header()
    for i in range(0, frames, 777):  # uneven chunking across units
        blob += enc.write_float(xq[i : i + 777])
    blob += enc.finish()
    p = tmp_path / "enc.paf"
    p.write_bytes(blob)
    got, info = read_audio(str(p))
    ceil10 = -(-frames // 10) * 10
    assert info.bits_per_sample == 24 and got.shape == (ceil10, ch)
    np.testing.assert_array_equal(got[:frames], xq.astype(np.float32))
    assert np.all(got[frames:] == 0)
    oracle, orate = _sf_read(p)
    assert orate == RATE
    if frames >= 10:
        assert oracle.shape == got.shape
        np.testing.assert_array_equal(got, oracle)
    # frames=1 (a single 32-byte unit): libsndfile's own paf24 reader
    # returns zero frames below its internal block size — nothing to
    # compare against; our reader recovers the unit.


def test_sds_sd2_fall_back_to_flac(tmp_path, rng):
    """SDS (MIDI dump) and SD2 (resource-fork metadata) can't carry the
    convolved stream in-band; output falls back to FLAC.  (WVE, HTK and
    MAT gained same-container writers — see the round-5 tests below.)"""
    from tests.test_runtime import make_fs, read_all

    fs, src_dir = make_fs(tmp_path)
    (tmp_path / "filters" / "echo" / "filter-16000.conf").write_text(
        "/convolver/new 1 1 64 512\n"
        "/impulse/dirac 1 1 0.7 0\n"
        "/impulse/dirac 1 1 0.3 100\n"
    )
    _sf_write(src_dir / "a.sds", _material(rng, 2000, 1), 16000,
              SF_SDS | SF_PCM_16)
    for name in ("a.sds",):
        h = fs.get_or_create_handler(f"/{name}")
        blob = read_all(h)
        fs.close_handler(f"/{name}", h)
        assert blob[:4] == b"fLaC"


def test_streaming_sources_new_legacy(tmp_path, rng):
    """PAF/AVR/WVE stream chunk-wise; MAT uses the in-memory fallback."""
    from folve_tpu.audio.source import open_source

    cases = [("s.paf", SF_PAF | SF_PCM_16, 2, RATE),
             ("s.avr", SF_AVR | SF_PCM_16, 2, RATE),
             ("s.wve", SF_WVE | SF_ALAW, 1, 8000),
             ("s.mat5", SF_MAT5 | SF_PCM_16, 2, RATE)]
    for name, fmt, ch, rate in cases:
        x = _material(rng, frames=2500, ch=ch)
        p = tmp_path / name
        _sf_write(p, x, rate, fmt)
        whole, _ = read_audio(str(p))
        src = open_source(str(p))
        assert src is not None, name
        chunks = []
        while True:
            blk = src.read_float(777)
            if blk.shape[0] == 0:
                break
            chunks.append(blk)
        src.close()
        np.testing.assert_array_equal(np.concatenate(chunks), whole)


# ---------------------------------------------------------------------------
# HTK / SDS / MPC2000
# ---------------------------------------------------------------------------

SF_HTK, SF_SDS, SF_MPC2K = 0x100000, 0x110000, 0x210000


@pytest.mark.parametrize("name,fmt,sub,container,ch,rate", [
    ("f.htk", SF_HTK, SF_PCM_16, Container.HTK, 1, 16000),
    ("f.sds", SF_SDS, SF_PCM_16, Container.SDS, 1, 16000),
    ("f8.sds", SF_SDS, SF_PCM_S8, Container.SDS, 1, 22050),
    ("f.mpc", SF_MPC2K, SF_PCM_16, Container.MPC, 1, 44100),
    ("f2.mpc", SF_MPC2K, SF_PCM_16, Container.MPC, 2, 44100),
])
def test_decodes_htk_sds_mpc(tmp_path, rng, name, fmt, sub, container, ch,
                             rate):
    x = _material(rng, frames=1500, ch=ch)
    if sub == SF_PCM_S8:
        x = np.round(x * 128) / 128
    p = tmp_path / name
    _sf_write(p, x, rate, fmt | sub)
    assert sniff_container(str(p)) == container
    got, info = read_audio(str(p))
    assert info.container == container
    oracle, orate = _sf_read(p)
    assert orate == rate
    assert got.shape == oracle.shape, (got.shape, oracle.shape)
    if fmt == SF_SDS:
        # libsndfile's own SDS reader zero-fills the final partial
        # packet; our decoder recovers the written samples exactly, so
        # compare against the source material instead.
        np.testing.assert_array_equal(got, x.astype(np.float32))
    else:
        np.testing.assert_array_equal(got, oracle)
    info2 = read_audio_info(str(p))
    assert info2.frames == got.shape[0]
    assert info2.rate == rate and info2.channels == ch


def test_mpc_through_filesystem(tmp_path, rng):
    """Stereo MPC2000 input -> convolved output stays MPC2000 and the
    oracle reads it back."""
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, frames=3000, ch=2)
    fs, src_dir = make_fs(tmp_path)
    _sf_write(src_dir / "song.mpc", x, RATE, SF_MPC2K | SF_PCM_16)
    h = fs.get_or_create_handler("/song.mpc")
    blob = read_all(h)
    fs.close_handler("/song.mpc", h)
    out = tmp_path / "out.mpc"
    out.write_bytes(blob)
    assert sniff_container(str(out)) == Container.MPC
    got, info = read_audio(str(out))
    assert info.rate == RATE and info.channels == 2
    assert got.shape[0] == x.shape[0]
    oracle, orate = _sf_read(out)
    assert orate == RATE and oracle.shape == got.shape
    np.testing.assert_array_equal(got, oracle)


def test_htk_sds_streaming(tmp_path, rng):
    """HTK streams chunk-wise; SDS (7-bit packets) uses the in-memory
    fallback — both match the whole-file decode."""
    from folve_tpu.audio.source import open_source

    for name, fmt, rate in (("s.htk", SF_HTK | SF_PCM_16, 16000),
                            ("s.sds", SF_SDS | SF_PCM_16, 16000)):
        x = _material(rng, frames=2500, ch=1)
        p = tmp_path / name
        _sf_write(p, x, rate, fmt)
        whole, _ = read_audio(str(p))
        src = open_source(str(p))
        assert src is not None, name
        chunks = []
        while True:
            blk = src.read_float(777)
            if blk.shape[0] == 0:
                break
            chunks.append(blk)
        src.close()
        np.testing.assert_array_equal(np.concatenate(chunks), whole)


SF_SD2, SF_PCM_24 = 0x160000, 0x0003


@pytest.mark.parametrize("name,sub,ch", [
    ("a.sd2", SF_PCM_16, 2),
    ("b.sd2", SF_PCM_24, 2),
    ("c.sd2", SF_PCM_S8, 1),
])
def test_decodes_sd2(tmp_path, rng, name, sub, ch):
    """SD2: headerless BE PCM + '._name' resource-fork side file."""
    x = _material(rng, frames=1500, ch=ch)
    p = tmp_path / name
    _sf_write(p, x, RATE, SF_SD2 | sub)
    assert (tmp_path / f"._{name}").exists()  # the oracle wrote the fork
    assert sniff_container(str(p)) == Container.SD2
    got, info = read_audio(str(p))
    assert info.container == Container.SD2
    oracle, orate = _sf_read(p)
    assert orate == RATE
    assert got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)
    info2 = read_audio_info(str(p))
    assert info2.rate == RATE and info2.channels == ch


def test_sd2_without_fork_not_claimed(tmp_path, rng):
    """A bare .sd2 with no resource fork cannot be identified."""
    p = tmp_path / "naked.sd2"
    p.write_bytes(bytes(rng.integers(0, 256, 1000, dtype=np.uint8)))
    assert sniff_container(str(p)) is None


def test_sd2_fork_mutation_robust(tmp_path, rng):
    """Mutating the resource fork never crashes the prober — it either
    parses or raises ValueError/OSError (the fuzz contract)."""
    x = _material(rng, frames=600, ch=1)
    p = tmp_path / "m.sd2"
    _sf_write(p, x, RATE, SF_SD2 | SF_PCM_16)
    fork = tmp_path / "._m.sd2"
    orig = bytearray(fork.read_bytes())
    for trial in range(120):
        mutated = bytearray(orig)
        kind = trial % 3
        if kind == 0:
            for _ in range(int(rng.integers(1, 6))):
                i = int(rng.integers(0, len(mutated)))
                mutated[i] = int(rng.integers(0, 256))
        elif kind == 1:
            mutated = mutated[: int(rng.integers(0, len(mutated)))]
        else:
            mutated += bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        fork.write_bytes(bytes(mutated))
        try:
            sniff_container(str(p))
            read_audio(str(p))
        except (ValueError, OSError):
            pass


# ---------------------------------------------------------------------------
# XI (FastTracker II instrument, DPCM sample data)
# ---------------------------------------------------------------------------

SF_XI, SF_DPCM_8, SF_DPCM_16 = 0x0F0000, 0x0050, 0x0051


@pytest.mark.parametrize("name,sub", [
    ("a.xi", SF_DPCM_16),
    ("b.xi", SF_DPCM_8),
])
def test_decodes_xi(tmp_path, rng, name, sub):
    """XI DPCM decodes sample-exact vs the oracle's own read-back."""
    x = _material(rng, frames=2000, ch=1)
    p = tmp_path / name
    _sf_write(p, x, RATE, SF_XI | sub)
    assert sniff_container(str(p)) == Container.XI
    got, info = read_audio(str(p))
    assert info.container == Container.XI
    oracle, orate = _sf_read(p)
    assert got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)
    info2 = read_audio_info(str(p))
    assert info2.frames == got.shape[0] and info2.channels == 1
    assert info2.rate == orate  # the format carries no rate; match oracle


def test_xi_dpcm_wraparound(tmp_path):
    """The delta accumulator wraps at its natural width (probed against
    the oracle: 30000+30000 -> -5536 as a C short)."""
    import struct

    from folve_tpu.audio.legacy import read_xi

    head = bytearray(338)
    head[:21] = b"Extended Instrument: "
    head[43] = 0x1A
    head[296:298] = (1).to_bytes(2, "little")
    head[312] = 0x10  # 16-bit flag
    p = tmp_path / "wrap.xi"
    p.write_bytes(bytes(head) + struct.pack("<3h", 30000, 30000, -30000))
    x, info = read_xi(str(p))
    np.testing.assert_array_equal(
        np.round(x[:, 0] * 32768).astype(int), [30000, -5536, 30000])
    head[312] = 0x00  # 8-bit
    p.write_bytes(bytes(head) + struct.pack("3b", 100, 100, -100))
    x, info = read_xi(str(p))
    np.testing.assert_array_equal(
        np.round(x[:, 0] * 128).astype(int), [100, -56, 100])


def test_xi_through_filesystem_flac_fallback(tmp_path, rng):
    """XI input convolves; output falls back to FLAC (XI is a mono
    instrument container, not an interchange target)."""
    from tests.test_runtime import make_fs, read_all

    x = _material(rng, frames=2500, ch=1)
    fs, src_dir = make_fs(tmp_path, conf_text=(
        "/convolver/new 1 1 64 512\n"
        "/impulse/dirac 1 1 0.7 0\n"
        "/impulse/dirac 1 1 0.3 100\n"
    ))
    _sf_write(src_dir / "song.xi", x, RATE, SF_XI | SF_DPCM_16)
    h = fs.get_or_create_handler("/song.xi")
    blob = read_all(h)
    fs.close_handler("/song.xi", h)
    assert blob[:4] == b"fLaC"


def test_xi_corrupt_headers_reject():
    from folve_tpu.audio.legacy import LegacyError, parse_xi

    good = bytearray(338)
    good[:21] = b"Extended Instrument: "
    good[43] = 0x1A
    good[296:298] = (1).to_bytes(2, "little")
    parse_xi(bytes(good), 400)  # sanity: accepted
    with pytest.raises(LegacyError):
        parse_xi(bytes(good)[:200], 400)  # truncated header
    bad = bytearray(good)
    bad[43] = 0
    with pytest.raises(LegacyError):
        parse_xi(bytes(bad), 400)  # marker byte missing
    bad = bytearray(good)
    bad[296:298] = (0).to_bytes(2, "little")
    with pytest.raises(LegacyError):
        parse_xi(bytes(bad), 400)  # no samples
    bad = bytearray(good)
    bad[296:298] = (500).to_bytes(2, "little")
    with pytest.raises(LegacyError):
        parse_xi(bytes(bad), 400)  # sample headers past EOF


def test_wve_through_filesystem_same_container(tmp_path, rng):
    """WVE (Psion A-law, 8 kHz mono) convolves through a mono filter and
    comes back out as WVE with byte-exact oracle-compatible A-law."""
    from tests.test_runtime import make_fs, read_all

    conf = "/convolver/new 1 1 64 512\n/impulse/dirac 1 1 0.5 0\n"
    x = _material(rng, frames=4000, ch=1)
    fs, src_dir = make_fs(tmp_path, conf_text=conf)
    (tmp_path / "filters" / "echo" / "filter-8000.conf").write_text(conf)
    _sf_write(src_dir / "song.wve", x, 8000, SF_WVE | SF_ALAW)
    h = fs.get_or_create_handler("/song.wve")
    blob = read_all(h)
    fs.close_handler("/song.wve", h)
    out = tmp_path / "out.wve"
    out.write_bytes(blob)
    assert sniff_container(str(out)) == Container.WVE
    got, info = read_audio(str(out))
    assert info.rate == 8000 and info.channels == 1
    oracle, orate = _sf_read(out)
    assert orate == 8000 and oracle.shape == got.shape
    np.testing.assert_array_equal(got, oracle)


def test_htk_through_filesystem_same_container(tmp_path, rng):
    from tests.test_runtime import make_fs, read_all

    conf = "/convolver/new 1 1 64 512\n/impulse/dirac 1 1 0.5 0\n"
    x = _material(rng, frames=4000, ch=1)
    fs, src_dir = make_fs(tmp_path, conf_text=conf)
    (tmp_path / "filters" / "echo" / "filter-16000.conf").write_text(conf)
    _sf_write(src_dir / "song.htk", x, 16000, SF_HTK | SF_PCM_16)
    h = fs.get_or_create_handler("/song.htk")
    blob = read_all(h)
    fs.close_handler("/song.htk", h)
    out = tmp_path / "out.htk"
    out.write_bytes(blob)
    got, info = read_audio(str(out))
    assert info.rate == 16000 and info.channels == 1
    assert got.shape[0] == x.shape[0]
    oracle, orate = _sf_read(out)
    assert orate == 16000 and oracle.shape == got.shape
    np.testing.assert_array_equal(got, oracle)


def test_wve_stereo_filter_falls_back_to_flac(tmp_path, rng):
    """An upmixing (1-in 2-out) filter cannot keep the mono-only WVE
    container: output falls back to FLAC."""
    from tests.test_runtime import make_fs, read_all

    conf = ("/convolver/new 1 2 64 512\n"
            "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 1 2 0.5 0\n")
    x = _material(rng, frames=3000, ch=1)
    fs, src_dir = make_fs(tmp_path, conf_text=conf)
    (tmp_path / "filters" / "echo" / "filter-8000.conf").write_text(conf)
    _sf_write(src_dir / "song.wve", x, 8000, SF_WVE | SF_ALAW)
    h = fs.get_or_create_handler("/song.wve")
    blob = read_all(h)
    fs.close_handler("/song.wve", h)
    assert blob[:4] == b"fLaC"


def test_mat_through_filesystem_same_container(tmp_path, rng):
    """MAT4 or MAT5 input -> convolved output is a MAT5 file libsndfile
    reads back bit-equal to our own decode."""
    from tests.test_runtime import make_fs, read_all

    for name, fmt in (("song4.mat", SF_MAT4 | SF_PCM_16),
                      ("song5.mat", SF_MAT5 | SF_PCM_16)):
        x = _material(rng, frames=3000, ch=2)
        fs, src_dir = make_fs(tmp_path)
        _sf_write(src_dir / name, x, RATE, fmt)
        h = fs.get_or_create_handler(f"/{name}")
        blob = read_all(h)
        fs.close_handler(f"/{name}", h)
        out = tmp_path / f"out-{name}"
        out.write_bytes(blob)
        assert sniff_container(str(out)) == Container.MAT
        got, info = read_audio(str(out))
        assert info.rate == RATE and info.channels == 2
        assert got.shape[0] == x.shape[0]
        oracle, orate = _sf_read(out)
        assert orate == RATE and oracle.shape == got.shape
        np.testing.assert_array_equal(got, oracle)


def test_mat_wide_depth_keeps_flac24(tmp_path, rng):
    """A MAT5 file with double wavedata must NOT be downgraded to the
    int16 MAT5 writer: it keeps its depth via FLAC/24 (the pre-MAT-writer
    policy; regression guard for the 16-bit forcing)."""
    from tests.test_runtime import make_fs, read_all, read_audio_bytes

    x = _material(rng, frames=2000, ch=2)
    fs, src_dir = make_fs(tmp_path)
    _sf_write(src_dir / "wide.mat", x, RATE, SF_MAT5 | SF_DOUBLE)
    h = fs.get_or_create_handler("/wide.mat")
    blob = read_all(h)
    fs.close_handler("/wide.mat", h)
    assert blob[:4] == b"fLaC"
    got, info = read_audio_bytes(blob)
    assert info.bits_per_sample == 24
    assert got.shape[0] == x.shape[0]


def test_alaw_encode_matches_oracle_exhaustive(tmp_path):
    """_alaw_encode == libsndfile's encoder over ALL 65536 int16."""
    import ctypes

    from folve_tpu.audio.legacy import _alaw_encode

    lib = _sf()
    vals = np.arange(-32768, 32768, dtype=np.int16)
    p = tmp_path / "all.wve"
    info = lib.SfInfo()
    info.samplerate, info.channels, info.format = 8000, 1, SF_WVE | SF_ALAW
    snd = lib.sf_open(str(p).encode(), 0x20, ctypes.byref(info))
    assert snd
    lib.sf_writef_short.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    lib.sf_writef_short.restype = ctypes.c_long
    lib.sf_writef_short(snd, vals.ctypes.data, len(vals))
    lib.sf_close(snd)
    oracle = np.frombuffer(p.read_bytes()[32:], np.uint8)
    ours = _alaw_encode(vals)
    np.testing.assert_array_equal(ours, oracle)
