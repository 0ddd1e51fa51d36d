"""Ogg Opus decode: CELT layer + Ogg end-to-end vs the oracles.

Reference parity: the reference convolves anything libsndfile decodes;
libsndfile 1.1 decodes Ogg Opus through libopus.  Ours is a
from-scratch RFC 6716 decoder — CELT (native/celt_codec.cc, trained
tables extracted from the libopus oracle binary by
tools/gen_celt_tables.py), SILK (native/silk_codec.cc, covered in
tests/test_silk.py), the packet layer (native/opus_api.cc) — plus an
RFC 7845 Ogg layer (folve_tpu/audio/opus.py).

The bar has two levels:

* ENTROPY BIT-EXACTNESS: our final range-coder state must equal the
  oracle's OPUS_GET_FINAL_RANGE for every packet — the Opus standard's
  own conformance check, proving every decoded symbol identical.
* PCM: float-precision agreement (the synthesis filterbank is float
  math in a different operation order), < -40 dB relative error;
  SILK-only output is sample-exact (fixed-point normative synthesis).
"""

import ctypes
import glob
import struct
import zlib

import numpy as np
import pytest

from folve_tpu.audio import Container, read_audio, read_audio_info
from folve_tpu.audio.opus import OpusError, OpusSource, read_opus
from folve_tpu.audio.source import open_source
from folve_tpu.audio.types import SampleCodec

RATE = 48000


def _libopus():
    cands = sorted(glob.glob(
        "/opt/venv/lib/python3*/site-packages/pygame.libs/libopus*.so*"))
    if not cands:
        pytest.skip("no libopus oracle")
    lib = ctypes.CDLL(cands[0])
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_encode_float.restype = ctypes.c_int
    lib.opus_decode_float.restype = ctypes.c_int
    return lib


def _ours():
    from folve_tpu.audio.opus import _lib

    lib = _lib()
    # The serving path only binds folve_opus_*; the CELT-layer tests
    # below talk to the frame codec directly.
    if not hasattr(lib.folve_celt_create, "_celt_ready"):
        lib.folve_celt_create.restype = ctypes.c_void_p
        lib.folve_celt_create.argtypes = [ctypes.c_int]
        lib.folve_celt_reset.argtypes = [ctypes.c_void_p]
        lib.folve_celt_close.argtypes = [ctypes.c_void_p]
        lib.folve_celt_probe.restype = ctypes.c_int
        lib.folve_celt_probe.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.folve_celt_decode.restype = ctypes.c_int
        lib.folve_celt_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.folve_celt_final_range.restype = ctypes.c_uint32
        lib.folve_celt_final_range.argtypes = [ctypes.c_void_p]
        lib.folve_celt_create._celt_ready = True
    return lib


OPUS_APP_AUDIO = 2049
CTL_FORCE_MODE, MODE_CELT = 11002, 1002
CTL_BITRATE, CTL_VBR, CTL_COMPLEXITY = 4002, 4006, 4010
CTL_FINAL_RANGE, CTL_LOOKAHEAD = 4031, 4027


def make_encoder(ol, ch, bitrate, cbr=True, complexity=10):
    err = ctypes.c_int()
    enc = ol.opus_encoder_create(RATE, ch, OPUS_APP_AUDIO, ctypes.byref(err))
    assert err.value == 0
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_FORCE_MODE, MODE_CELT)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_BITRATE, bitrate)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_VBR, 0 if cbr else 1)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_COMPLEXITY, complexity)
    return enc


def encode_packets(ol, enc, sig, frame):
    pkts = []
    n = sig.shape[0] // frame
    for i in range(n):
        buf = ctypes.create_string_buffer(4000)
        x = np.ascontiguousarray(sig[i * frame:(i + 1) * frame], np.float32)
        ln = ol.opus_encode_float(ctypes.c_void_p(enc),
                                  x.ctypes.data_as(ctypes.c_void_p), frame,
                                  buf, 4000)
        assert ln > 0
        pkts.append(buf.raw[:ln])
    return pkts


def _material(rng, kind, n, ch):
    t = np.arange(n) / RATE
    if kind == "tone":
        x = 0.4 * np.sin(2 * np.pi * 440 * t)[:, None] * np.ones(ch)
        if ch == 2:
            x[:, 1] = 0.3 * np.sin(2 * np.pi * 661 * t)
    elif kind == "noise":
        x = 0.3 * rng.standard_normal((n, ch))
    elif kind == "transient":
        x = 0.02 * rng.standard_normal((n, ch))
        for p in range(480, n, 2400):
            x[p:p + 60] += rng.standard_normal((min(60, n - p), ch)) * 0.8
    else:  # sweep
        ph = np.cumsum(2 * np.pi * (100 + 12000 * t / t[-1]) / RATE)
        x = 0.4 * np.sin(ph)[:, None] * np.ones(ch)
    return np.clip(x, -1, 1).astype(np.float32)


# ---------------------------------------------------------------------------
# Raw CELT packets vs the libopus decoder.

CASES = [
    ("tone", 1, 960, 96000, False),
    ("tone", 2, 960, 64000, True),
    ("noise", 1, 120, 96000, True),
    ("noise", 2, 240, 32000, True),
    ("noise", 1, 240, 6000, True),     # the tiny-budget fold regime
    ("transient", 2, 480, 48000, False),
    ("transient", 1, 960, 32000, True),
    ("sweep", 2, 960, 128000, False),
    ("sweep", 1, 480, 12000, True),
]


@pytest.mark.parametrize("kind,ch,frame,bitrate,cbr", CASES)
def test_celt_bit_exact_entropy_and_pcm(rng, kind, ch, frame, bitrate, cbr):
    ol = _libopus()
    lib = _ours()
    enc = make_encoder(ol, ch, bitrate, cbr)
    err = ctypes.c_int()
    dec = ol.opus_decoder_create(RATE, ch, ctypes.byref(err))
    ours = lib.folve_celt_create(ch)
    sig = _material(rng, kind, frame * 25, ch)
    esum = rsum = 0.0
    for pkt in encode_packets(ol, enc, sig, frame):
        ref = np.zeros((frame, ch), np.float32)
        m = ol.opus_decode_float(ctypes.c_void_p(dec), pkt, len(pkt),
                                 ref.ctypes.data_as(ctypes.c_void_p),
                                 frame, 0)
        assert m == frame
        got = np.zeros((frame, ch), np.float32)
        r = lib.folve_celt_decode(ours, pkt, len(pkt),
                                  got.ctypes.data_as(ctypes.c_void_p))
        assert r == frame
        fr = ctypes.c_uint32(0)
        ol.opus_decoder_ctl(ctypes.c_void_p(dec), CTL_FINAL_RANGE,
                            ctypes.byref(fr))
        assert lib.folve_celt_final_range(ours) == fr.value, \
            "entropy decode diverged from the oracle"
        esum += float(((got - ref) ** 2).sum())
        rsum += float((ref ** 2).sum())
    lib.folve_celt_close(ours)
    ol.opus_decoder_destroy(ctypes.c_void_p(dec))
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    db = 10 * np.log10((esum + 1e-30) / (rsum + 1e-20))
    assert db < -40, f"PCM mismatch: {db:.1f} dB"


def test_celt_rejects_silk_and_garbage(rng):
    lib = _ours()
    # SILK config (0..11) and hybrid (12..15) TOCs must be refused.
    for config in (0, 5, 11, 12, 15):
        pkt = bytes([config << 3]) + bytes(40)
        assert lib.folve_celt_probe(pkt, len(pkt)) == -2
    assert lib.folve_celt_probe(b"", 0) == -1
    ours = lib.folve_celt_create(1)
    for _ in range(200):
        blob = bytes(rng.integers(0, 256, rng.integers(1, 300),
                                  dtype=np.uint8))
        n = lib.folve_celt_probe(blob, len(blob))
        if n > 0:
            out = np.zeros((n, 1), np.float32)
            lib.folve_celt_decode(ours, blob, len(blob),
                                  out.ctypes.data_as(ctypes.c_void_p))
            assert np.all(np.isfinite(out))
    lib.folve_celt_close(ours)


# ---------------------------------------------------------------------------
# Ogg layer: our own muxer for fixtures, libopusfile as PCM oracle.

def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 \
                else (crc << 1) & 0xFFFFFFFF
    return crc


def _page(serial, seq, granule, packets, bos=False, eos=False):
    segs = b""
    body = b""
    for pkt in packets:
        ln = len(pkt)
        while ln >= 255:
            segs += b"\xff"
            ln -= 255
        segs += bytes([ln])
        body += pkt
    hdr = struct.pack("<4sBBqIII", b"OggS", 0,
                      (2 if bos else 0) | (4 if eos else 0),
                      granule, serial, seq, 0) + bytes([len(segs)]) + segs
    crc = _ogg_crc(hdr + body)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + body


def _packet_samples(pkt):
    """Samples per channel at 48 kHz for any Opus packet (RFC 6716 3.1)."""
    cfg = pkt[0] >> 3
    if cfg < 12:
        frame = (480, 960, 1920, 2880)[cfg & 3]
    elif cfg < 16:
        frame = 960 if cfg & 1 else 480
    else:
        frame = 120 << (cfg & 3)
    code = pkt[0] & 3
    nf = {0: 1, 1: 2, 2: 2}.get(code)
    if nf is None:
        nf = pkt[1] & 0x3F if len(pkt) > 1 else 1
    return frame * nf


def mux_ogg_opus(pkts, ch, pre_skip, nsamples, gain_q8=0):
    head = (b"OpusHead" + bytes([1, ch]) + struct.pack("<H", pre_skip) +
            struct.pack("<I", RATE) + struct.pack("<h", gain_q8) + b"\x00")
    tags = b"OpusTags" + struct.pack("<I", 5) + b"folve" + struct.pack("<I", 0)
    out = _page(0x1234, 0, 0, [head], bos=True)
    out += _page(0x1234, 1, 0, [tags])
    # Granules count coded samples from zero (the pre-skip region is
    # inside them); the final page's granule trims the end.
    gran = 0
    for i, pkt in enumerate(pkts):
        gran += _packet_samples(pkt)
        last = i == len(pkts) - 1
        if last:
            gran = nsamples + pre_skip
        out += _page(0x1234, 2 + i, gran, [pkt], eos=last)
    return out


def _opusfile():
    libs = sorted(glob.glob(
        "/opt/venv/lib/python3*/site-packages/pygame.libs/*.so*"))
    for dep in libs:
        if "opusfile" not in dep:
            try:
                ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
            except OSError:
                pass
    cands = [p for p in libs if "opusfile" in p]
    if not cands:
        pytest.skip("no libopusfile oracle")
    of = ctypes.CDLL(cands[0])
    of.op_open_memory.restype = ctypes.c_void_p
    of.op_open_memory.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.POINTER(ctypes.c_int)]
    of.op_read_float.restype = ctypes.c_int
    of.op_read_float.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_void_p]
    of.op_channel_count.restype = ctypes.c_int
    of.op_channel_count.argtypes = [ctypes.c_void_p, ctypes.c_int]
    of.op_free.argtypes = [ctypes.c_void_p]
    return of


def _opusfile_decode(blob, ch):
    of = _opusfile()
    err = ctypes.c_int(0)
    h = of.op_open_memory(blob, len(blob), ctypes.byref(err))
    assert h, f"libopusfile refused our mux (err {err.value})"
    out = []
    buf = np.zeros(5760 * 2, np.float32)
    while True:
        n = of.op_read_float(ctypes.c_void_p(h), buf.ctypes.data,
                             buf.size, None)
        if n <= 0:
            break
        out.append(buf[:n * ch].reshape(-1, ch).copy())
    of.op_free(ctypes.c_void_p(h))
    return np.concatenate(out) if out else np.zeros((0, ch), np.float32)


@pytest.mark.parametrize("ch,gain_q8", [(1, 0), (2, 0), (2, -1536)])
def test_ogg_opus_end_to_end_vs_opusfile(tmp_path, rng, ch, gain_q8):
    ol = _libopus()
    enc = make_encoder(ol, ch, 96000, cbr=False)
    look = ctypes.c_int(0)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_LOOKAHEAD,
                        ctypes.byref(look))
    nsamples = 960 * 12 - 333  # non-multiple: exercises end trimming
    sig = _material(rng, "tone", 960 * 12, ch)
    pkts = encode_packets(ol, enc, sig, 960)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    blob = mux_ogg_opus(pkts, ch, look.value, nsamples, gain_q8)
    p = tmp_path / "t.opus.ogg"
    p.write_bytes(blob)

    info = read_audio_info(str(p))
    assert info.container == Container.OGG
    assert info.codec == SampleCodec.OPUS
    assert info.rate == RATE and info.channels == ch
    assert info.frames == nsamples

    got, _ = read_audio(str(p))
    ref = _opusfile_decode(blob, ch)
    assert got.shape == (nsamples, ch)
    assert ref.shape[0] == nsamples
    err = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert 20 * np.log10(err + 1e-12) < -40


def test_ogg_opus_streaming_source_and_seek(tmp_path, rng):
    ol = _libopus()
    enc = make_encoder(ol, 2, 64000)
    look = ctypes.c_int(0)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_LOOKAHEAD,
                        ctypes.byref(look))
    n = 960 * 20
    sig = _material(rng, "sweep", n, 2)
    pkts = encode_packets(ol, enc, sig, 960)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    blob = mux_ogg_opus(pkts, 2, look.value, n)
    p = tmp_path / "s.opus.ogg"
    p.write_bytes(blob)

    whole, _ = read_audio(str(p))
    src = open_source(str(p))
    assert src is not None and isinstance(src, OpusSource)
    chunks, sizes, i = [], [1, 959, 960, 961, 4096, 77], 0
    while True:
        blk = src.read_float(sizes[i % len(sizes)])
        i += 1
        if blk.shape[0] == 0:
            break
        chunks.append(blk)
    np.testing.assert_array_equal(np.concatenate(chunks), whole)
    for target in (12345, 100, n - 10, 0):
        src.seek(target)
        np.testing.assert_array_equal(src.read_float(64),
                                      whole[target:target + 64])
    src.close()


@pytest.mark.parametrize("mode,bw,bitrate,exact", [
    (1000, 1103, 20000, True),    # SILK WB: fixed-point, sample-exact
    (1001, 1105, 48000, False),   # hybrid FB: float CELT band on top
])
def test_ogg_opus_speech_modes_end_to_end(tmp_path, rng, mode, bw, bitrate,
                                          exact):
    """SILK-only and hybrid Ogg Opus streams decode through the
    filesystem path, matching libopusfile (sample-exact for SILK —
    both stacks emit int16-derived floats)."""
    from tests.test_silk import _make_enc, _speech_like

    ol = _libopus()
    ch, frame = 2, 960
    enc = _make_enc(ol, ch, bitrate, mode=mode, bw=bw)
    look = ctypes.c_int(0)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_LOOKAHEAD,
                        ctypes.byref(look))
    n = frame * 15
    sig = _speech_like(rng, n, ch)
    pkts = encode_packets(ol, enc, sig, frame)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    # SILK-mode lookahead (pre-skip) is larger than CELT's; the declared
    # length must fit inside total-coded-samples minus pre-skip.
    n_out = n - look.value - 217
    blob = mux_ogg_opus(pkts, ch, look.value, n_out)
    p = tmp_path / "speech.opus.ogg"
    p.write_bytes(blob)

    info = read_audio_info(str(p))
    assert info.codec == SampleCodec.OPUS and info.frames == n_out
    got, _ = read_audio(str(p))
    ref = _opusfile_decode(blob, ch)
    assert got.shape == ref.shape == (n_out, ch)
    if exact:
        np.testing.assert_array_equal(got, ref)
    else:
        err = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
        assert 20 * np.log10(err + 1e-12) < -40


def test_malformed_opus_stream_passes_through(tmp_path):
    # A stream whose packets are structurally invalid (here: a code-3
    # packet with frame count 0) must be refused by the Opus reader so
    # the runtime serves it unfiltered instead of mis-decoding.
    bad_pkt = bytes([(1 << 3) | 3, 0]) + bytes(30)
    blob = mux_ogg_opus([bad_pkt], 1, 0, 960)
    p = tmp_path / "bad.opus.ogg"
    p.write_bytes(blob)
    with pytest.raises(OpusError):
        read_opus(str(p))
    assert open_source(str(p)) is None


def test_undecodable_packet_recovers_not_truncates(tmp_path, rng):
    """One corrupt payload mid-stream must NOT silence the rest of the
    track: the reader stands in the packet's nominal duration as
    silence, resets the decoder, and resumes with the next packet
    (regression: the batched decode path used to mark the stream dead
    and zero-pad everything after the first failure)."""
    ol = _libopus()
    enc = make_encoder(ol, 2, 96000)
    look = ctypes.c_int(0)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_LOOKAHEAD,
                        ctypes.byref(look))
    npkt = 12
    sig = _material(rng, "tone", 960 * npkt, 2)
    pkts = encode_packets(ol, enc, sig, 960)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    nsamples = 960 * npkt

    clean, _ = read_audio_bytes_helper(
        tmp_path, "clean.opus.ogg", mux_ogg_opus(pkts, 2, look.value, nsamples))

    # Same-duration packet (20 ms SILK NB TOC) whose payload reliably
    # fails the SILK layer — probes fine (passes the parse), decodes -3.
    bad = 5
    pkts = list(pkts)
    pkts[bad] = bytes([0x0C]) + b"\xff" * 50
    got, info = read_audio_bytes_helper(
        tmp_path, "corrupt.opus.ogg", mux_ogg_opus(pkts, 2, look.value, nsamples))

    # Declared length = total packet samples - pre-skip (the mux's
    # granule is not the binding cap here); the corrupt stream must
    # keep the SAME length as the clean one.
    assert clean.shape == (nsamples - look.value, 2)
    assert got.shape == clean.shape
    # Audio BEFORE the bad packet is untouched.
    pre = 960 * bad - look.value - 48  # a hair before the seam
    np.testing.assert_allclose(got[:pre], clean[:pre], atol=1e-6)
    # Audio well AFTER the bad packet is alive again (the old bug made
    # everything from the bad packet on exactly zero).
    tail = got[960 * (bad + 3):]
    assert np.max(np.abs(tail)) > 0.05, "stream stayed dead after a bad packet"
    assert np.all(np.isfinite(got))


def read_audio_bytes_helper(tmp_path, name, blob):
    p = tmp_path / name
    p.write_bytes(blob)
    return read_audio(str(p))


def test_garbage_ogg_opus_never_crashes(tmp_path, rng):
    ol = _libopus()
    enc = make_encoder(ol, 1, 32000)
    sig = _material(rng, "noise", 960 * 4, 1)
    pkts = encode_packets(ol, enc, sig, 960)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    blob = bytearray(mux_ogg_opus(pkts, 1, 312, 960 * 4))
    for trial in range(40):
        fz = bytearray(blob)
        for _ in range(8):
            fz[rng.integers(0, len(fz))] = rng.integers(0, 256)
        p = tmp_path / f"fz{trial}.ogg"
        p.write_bytes(bytes(fz))
        try:
            out, _ = read_audio(str(p))
            assert np.all(np.isfinite(out))
        except Exception:
            pass  # refusing corrupt input is fine; crashing is not


def test_opus_through_filesystem(tmp_path, rng):
    """An Ogg Opus file convolves through the runtime (FLAC out, the
    reference's SF_FORMAT_OGG policy) instead of passing through."""
    import os

    from tests.test_runtime import make_fs, read_all

    ol = _libopus()
    enc = make_encoder(ol, 2, 96000)
    look = ctypes.c_int(0)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_LOOKAHEAD,
                        ctypes.byref(look))
    n = 960 * 15
    sig = _material(rng, "tone", n, 2)
    pkts = encode_packets(ol, enc, sig, 960)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    p = tmp_path / "song.opus.ogg"
    p.write_bytes(mux_ogg_opus(pkts, 2, look.value, n))

    conf = "/convolver/new 2 2 64 512\n" \
           "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    fs, src_dir = make_fs(tmp_path, conf_text=conf)
    (tmp_path / "filters" / "echo" / "filter-48000.conf").write_text(conf)
    os.rename(p, src_dir / "song.opus.ogg")
    h = fs.get_or_create_handler("/song.opus.ogg")
    blob = read_all(h)
    fs.close_handler("/song.opus.ogg", h)
    assert blob[:4] == b"fLaC"
    out = tmp_path / "out.flac"
    out.write_bytes(blob)
    got, info = read_audio(str(out))
    ref, _ = read_audio(str(src_dir / "song.opus.ogg"))
    assert info.rate == RATE
    np.testing.assert_allclose(got, 0.5 * ref, atol=2.0 / 32768)
