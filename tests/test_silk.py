"""SILK-mode and hybrid-mode Opus decode vs the libopus oracle.

Validates the full Opus packet layer (native/opus_api.cc) — the
opus_decoder.c equivalent dispatching SILK (native/silk_codec.cc) and
CELT (native/celt_codec.cc) with a shared range coder — against the
libopus oracle, packet by packet:

* FINAL RANGE: our range-coder state after every packet must equal
  OPUS_GET_FINAL_RANGE — the Opus standard's own conformance check
  (every entropy symbol decoded identically, including LBRR/FEC
  layers and redundancy signalling).
* PCM: SILK synthesis is fixed-point normative, so SILK-only output
  is sample-exact (only the int16->float scaling is float); hybrid
  adds the float CELT band, so it gets the same float-precision bar
  as the CELT tests (< -40 dB).

Reference parity: the reference convolves anything libsndfile decodes
(/root/reference/convolve-file-handler.cc:62-76); libsndfile >= 1.1
decodes Ogg Opus via libopus, including speech-mode (SILK/hybrid)
streams — the last Opus gap closed here.
"""

import ctypes

import numpy as np
import pytest

from tests.test_opus import (
    CTL_FINAL_RANGE,
    RATE,
    _libopus,
    _material,
    _ours,
)

APP_VOIP, APP_AUDIO = 2048, 2049
CTL_FORCE_MODE = 11002
MODE_SILK, MODE_HYBRID, MODE_CELT = 1000, 1001, 1002
CTL_BITRATE, CTL_VBR, CTL_COMPLEXITY = 4002, 4006, 4010
CTL_BANDWIDTH = 4008
BW_NB, BW_MB, BW_WB, BW_SWB, BW_FB = 1101, 1102, 1103, 1104, 1105
CTL_INBAND_FEC, CTL_LOSS_PERC = 4012, 4014


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _opus_lib():
    lib = _ours()
    if not hasattr(lib.folve_opus_create, "_ready"):
        lib.folve_opus_create.restype = ctypes.c_void_p
        lib.folve_opus_create.argtypes = [ctypes.c_int]
        lib.folve_opus_reset.argtypes = [ctypes.c_void_p]
        lib.folve_opus_close.argtypes = [ctypes.c_void_p]
        lib.folve_opus_probe.restype = ctypes.c_int
        lib.folve_opus_probe.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.folve_opus_decode.restype = ctypes.c_int
        lib.folve_opus_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.folve_opus_final_range.restype = ctypes.c_uint32
        lib.folve_opus_final_range.argtypes = [ctypes.c_void_p]
        lib.folve_opus_create._ready = True
    return lib


def _make_enc(ol, ch, bitrate, app=APP_VOIP, mode=None, bw=None, cbr=False,
              fec=0):
    err = ctypes.c_int()
    enc = ol.opus_encoder_create(RATE, ch, app, ctypes.byref(err))
    assert err.value == 0
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_BITRATE, bitrate)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_VBR, 0 if cbr else 1)
    ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_COMPLEXITY, 10)
    if mode is not None:
        ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_FORCE_MODE, mode)
    if bw is not None:
        ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_BANDWIDTH, bw)
    if fec:
        ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_INBAND_FEC, 1)
        ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_LOSS_PERC, fec)
    return enc


def _speech_like(rng, n, ch):
    """Pitch-pulsed, formant-filtered material so SILK's LTP engages."""
    t = np.arange(n) / RATE
    f0 = 110 * (1 + 0.15 * np.sin(2 * np.pi * 2.5 * t))
    ph = np.cumsum(f0) / RATE
    pulses = (np.mod(ph, 1.0) < 0.04).astype(np.float32)
    x = np.zeros(n, np.float32)
    # Two crude formants via resonant one-pole pairs.
    for fc, r in ((700, 0.96), (1800, 0.93)):
        y1 = y2 = 0.0
        c = 2 * r * np.cos(2 * np.pi * fc / RATE)
        g = r * r
        y = np.empty(n, np.float32)
        for i in range(n):
            y0 = pulses[i] + c * y1 - g * y2
            y[i] = y0
            y2, y1 = y1, y0
        x += 0.2 * y
    x += 0.01 * rng.standard_normal(n).astype(np.float32)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t)
    x *= env.astype(np.float32)
    out = np.clip(x, -1, 1)[:, None] * np.ones(ch, np.float32)
    if ch == 2:
        out[:, 1] = np.roll(out[:, 1], 180) * 0.8
    return np.ascontiguousarray(out, np.float32)


def _run_battery(ol, lib, enc, sig, ch, frame, silk_exact):
    err = ctypes.c_int()
    dec = ol.opus_decoder_create(RATE, ch, ctypes.byref(err))
    ours = lib.folve_opus_create(ch)
    assert ours
    esum = rsum = 0.0
    npkt = 0
    n = sig.shape[0] // frame
    for i in range(n):
        buf = ctypes.create_string_buffer(4000)
        x = np.ascontiguousarray(sig[i * frame:(i + 1) * frame], np.float32)
        ln = ol.opus_encode_float(ctypes.c_void_p(enc),
                                  x.ctypes.data_as(ctypes.c_void_p), frame,
                                  buf, 4000)
        assert ln > 0
        pkt = buf.raw[:ln]
        if ln <= 2:
            continue  # DTX-ish packet; PLC semantics differ, skip
        ref = np.zeros((frame, ch), np.float32)
        m = ol.opus_decode_float(ctypes.c_void_p(dec), pkt, ln,
                                 ref.ctypes.data_as(ctypes.c_void_p),
                                 frame, 0)
        assert m == frame
        ns = lib.folve_opus_probe(pkt, ln)
        assert ns == frame, f"probe said {ns}, packet is {frame}"
        got = np.zeros((frame, ch), np.float32)
        r = lib.folve_opus_decode(ours, pkt, ln,
                                  got.ctypes.data_as(ctypes.c_void_p))
        assert r == frame, f"decode returned {r}"
        fr = ctypes.c_uint32(0)
        ol.opus_decoder_ctl(ctypes.c_void_p(dec), CTL_FINAL_RANGE,
                            ctypes.byref(fr))
        assert lib.folve_opus_final_range(ours) == fr.value, \
            f"entropy decode diverged from the oracle at packet {i}"
        if silk_exact:
            np.testing.assert_array_equal(
                got, ref, err_msg=f"SILK PCM not sample-exact at packet {i}")
        esum += float(((got - ref) ** 2).sum())
        rsum += float((ref ** 2).sum())
        npkt += 1
    lib.folve_opus_close(ours)
    ol.opus_decoder_destroy(ctypes.c_void_p(dec))
    assert npkt >= n - 2
    return 10 * np.log10((esum + 1e-30) / (rsum + 1e-20))


SILK_CASES = [
    # (bw, ch, frame, bitrate, fec)
    (BW_NB, 1, 960, 10000, 0),
    (BW_NB, 2, 2880, 14000, 0),
    (BW_MB, 1, 1920, 14000, 0),
    (BW_MB, 2, 960, 20000, 0),
    (BW_WB, 1, 480, 20000, 0),
    (BW_WB, 2, 960, 24000, 0),
    (BW_WB, 1, 2880, 16000, 0),
    (BW_WB, 1, 960, 18000, 20),   # LBRR/FEC layer present
    (BW_WB, 2, 960, 24000, 30),
]


@pytest.mark.parametrize("bw,ch,frame,bitrate,fec", SILK_CASES)
def test_silk_only_bit_exact(rng, bw, ch, frame, bitrate, fec):
    ol = _libopus()
    lib = _opus_lib()
    enc = _make_enc(ol, ch, bitrate, mode=MODE_SILK, bw=bw, fec=fec)
    sig = _speech_like(rng, frame * 20, ch)
    # With FEC on, some packets also carry a CELT redundancy frame whose
    # band mix is float math — those packets are float-precision, not
    # sample-exact, so the exactness bar drops to the CELT-grade SNR.
    db = _run_battery(ol, lib, enc, sig, ch, frame, silk_exact=(fec == 0))
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    assert db < (-90 if fec == 0 else -60), f"SILK PCM mismatch: {db:.1f} dB"


HYBRID_CASES = [
    (BW_SWB, 1, 960, 32000),
    (BW_SWB, 2, 960, 48000),
    (BW_FB, 1, 480, 40000),
    (BW_FB, 2, 960, 64000),
]


@pytest.mark.parametrize("bw,ch,frame,bitrate", HYBRID_CASES)
def test_hybrid_bit_exact_entropy_and_pcm(rng, bw, ch, frame, bitrate):
    ol = _libopus()
    lib = _opus_lib()
    enc = _make_enc(ol, ch, bitrate, mode=MODE_HYBRID, bw=bw)
    sig = _speech_like(rng, frame * 20, ch)
    db = _run_battery(ol, lib, enc, sig, ch, frame, silk_exact=False)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    assert db < -40, f"hybrid PCM mismatch: {db:.1f} dB"


def test_celt_through_packet_layer(rng):
    """CELT-only packets decode identically through folve_opus_*."""
    ol = _libopus()
    lib = _opus_lib()
    enc = _make_enc(ol, 2, 96000, app=APP_AUDIO, mode=MODE_CELT)
    sig = _material(rng, "sweep", 960 * 15, 2)
    db = _run_battery(ol, lib, enc, sig, 2, 960, silk_exact=False)
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    assert db < -40, f"CELT PCM mismatch: {db:.1f} dB"


def test_mode_switching_stream(rng):
    """SILK -> hybrid -> CELT -> SILK transitions in one stream.

    Final range must stay oracle-exact through every switch (the
    redundancy signalling is entropy-coded).  PCM: transition frames
    the encoder protects with redundancy are handled exactly; the only
    tolerated divergence is the 5 ms fade source on unprotected
    switches (we fade from silence instead of running PLC), so the
    whole-stream error bar stays strict but not sample-exact.
    """
    ol = _libopus()
    lib = _opus_lib()
    frame, ch = 960, 2
    enc = _make_enc(ol, ch, 32000, app=APP_VOIP)
    sig = _speech_like(rng, frame * 40, ch)
    err = ctypes.c_int()
    dec = ol.opus_decoder_create(RATE, ch, ctypes.byref(err))
    ours = lib.folve_opus_create(ch)
    schedule = [(0, MODE_SILK, BW_WB), (10, MODE_HYBRID, BW_SWB),
                (20, MODE_CELT, BW_FB), (30, MODE_SILK, BW_WB)]
    esum = rsum = 0.0
    for i in range(40):
        for at, mode, bw in schedule:
            if i == at:
                ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_FORCE_MODE,
                                    mode)
                ol.opus_encoder_ctl(ctypes.c_void_p(enc), CTL_BANDWIDTH, bw)
        buf = ctypes.create_string_buffer(4000)
        x = np.ascontiguousarray(sig[i * frame:(i + 1) * frame], np.float32)
        ln = ol.opus_encode_float(ctypes.c_void_p(enc),
                                  x.ctypes.data_as(ctypes.c_void_p), frame,
                                  buf, 4000)
        assert ln > 0
        pkt = buf.raw[:ln]
        ref = np.zeros((frame, ch), np.float32)
        assert ol.opus_decode_float(
            ctypes.c_void_p(dec), pkt, ln,
            ref.ctypes.data_as(ctypes.c_void_p), frame, 0) == frame
        got = np.zeros((frame, ch), np.float32)
        assert lib.folve_opus_decode(
            ours, pkt, ln, got.ctypes.data_as(ctypes.c_void_p)) == frame
        fr = ctypes.c_uint32(0)
        ol.opus_decoder_ctl(ctypes.c_void_p(dec), CTL_FINAL_RANGE,
                            ctypes.byref(fr))
        assert lib.folve_opus_final_range(ours) == fr.value, \
            f"entropy diverged at packet {i}"
        esum += float(((got - ref) ** 2).sum())
        rsum += float((ref ** 2).sum())
    lib.folve_opus_close(ours)
    ol.opus_decoder_destroy(ctypes.c_void_p(dec))
    ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    db = 10 * np.log10((esum + 1e-30) / (rsum + 1e-20))
    assert db < -35, f"mode-switching PCM error too high: {db:.1f} dB"


def test_garbage_packets_never_crash(rng):
    lib = _opus_lib()
    ours = lib.folve_opus_create(2)
    out = np.zeros((5760, 2), np.float32)
    for _ in range(300):
        n = int(rng.integers(1, 300))
        pkt = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        ns = lib.folve_opus_probe(pkt, n)
        if ns > 0:
            lib.folve_opus_decode(ours, pkt, n,
                                  out.ctypes.data_as(ctypes.c_void_p))
    lib.folve_opus_close(ours)
