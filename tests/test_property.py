"""Property-based tests (hypothesis): codecs, tokenizer, engine invariants.

The reference has no tests at all (SURVEY §4); beyond the golden suite,
these hunt edge cases by construction: arbitrary shapes/depths round-trip
the codecs exactly, the engine is invariant to how a stream is chunked,
and hand-mutated streams never crash the native decoder.  (The round-2
tiny-final-frame FLAC bug is exactly the class these catch.)
"""

import io
import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

COMMON = dict(
    deadline=None,
    max_examples=30,
    suppress_health_check=[HealthCheck.too_slow],
)


def _quantized(data, bits):
    scale = float(1 << (bits - 1))
    return np.clip(np.round(data * scale), -scale, scale - 1) / scale


@settings(**COMMON)
@given(
    frames=st.integers(0, 3000),
    channels=st.integers(1, 4),
    bits=st.sampled_from([8, 16, 24]),
    blocksize=st.sampled_from([192, 576, 1024, 4096]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_exact(frames, channels, bits, blocksize, seed):
    from folve_tpu.audio.flac import read_flac, write_flac

    rng = np.random.default_rng(seed)
    x = _quantized(
        rng.uniform(-1.0, 0.999, (frames, channels)).astype(np.float64), bits
    ).astype(np.float32)
    buf = io.BytesIO()
    write_flac(buf, x, 44100, bits=bits, blocksize=blocksize)
    got, info = read_flac(buf.getvalue())
    assert info.channels == channels and info.bits_per_sample == bits
    assert got.shape == (frames, channels)
    scale = float(1 << (bits - 1))
    np.testing.assert_array_equal(
        np.round(got * scale).astype(np.int64),
        np.round(x.astype(np.float64) * scale).astype(np.int64),
    )


@settings(**COMMON)
@given(
    frames=st.integers(0, 2000),
    channels=st.integers(1, 4),
    codec_bits=st.sampled_from([16, 24, 32]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_exact(frames, channels, codec_bits, seed):
    from folve_tpu.audio.types import SampleCodec
    from folve_tpu.audio.wav import read_wav, write_wav

    codec = {16: SampleCodec.PCM_16, 24: SampleCodec.PCM_24,
             32: SampleCodec.PCM_32}[codec_bits]
    rng = np.random.default_rng(seed)
    x = _quantized(
        rng.uniform(-1.0, 0.999, (frames, channels)).astype(np.float64),
        codec_bits,
    ).astype(np.float32)
    buf = io.BytesIO()
    write_wav(buf, x, 48000, codec)
    got, info = read_wav(buf.getvalue())
    assert got.shape == (frames, channels)
    scale = float(1 << (codec_bits - 1))
    np.testing.assert_allclose(got, x, atol=0.6 / scale)


@settings(**COMMON)
@given(
    frames=st.integers(0, 2000),
    channels=st.integers(1, 2),
    bits=st.sampled_from([16, 24, 32]),
    seed=st.integers(0, 2**31 - 1),
)
def test_aiff_roundtrip_exact(frames, channels, bits, seed):
    from folve_tpu.audio.aiff import read_aiff, write_aiff

    rng = np.random.default_rng(seed)
    x = _quantized(
        rng.uniform(-1.0, 0.999, (frames, channels)).astype(np.float64), bits
    ).astype(np.float32)
    buf = io.BytesIO()
    write_aiff(buf, x, 44100, bits)
    got, info = read_aiff(buf.getvalue())
    assert got.shape == (frames, channels)
    scale = float(1 << (bits - 1))
    np.testing.assert_allclose(got, x, atol=0.6 / scale)


@settings(**COMMON)
@given(
    frames=st.integers(0, 2000),
    bits=st.sampled_from([12, 16, 24]),
    seed=st.integers(0, 2**31 - 1),
)
def test_dwvw_roundtrip_exact(frames, bits, seed):
    """DWVW encode->decode is the identity for any integer sequence at
    the codec's depth, extremes included (the most-negative value uses
    the max-width escape bit)."""
    from folve_tpu.audio.dwvw import decode_dwvw, encode_dwvw

    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    vals = rng.integers(lo, hi + 1, frames, dtype=np.int32)
    payload = encode_dwvw(vals, bits)
    dec = decode_dwvw(payload, bits, max_frames=frames)
    got = np.round(dec[:, 0] * (1 << (bits - 1))).astype(np.int32)
    np.testing.assert_array_equal(got, vals)


@settings(deadline=None, max_examples=60)
@given(blob=st.binary(min_size=0, max_size=2048))
def test_dwvw_decoder_never_crashes_on_garbage(blob):
    from folve_tpu.audio.dwvw import decode_dwvw

    for bits in (12, 16, 24):
        out = decode_dwvw(blob, bits, max_frames=8192)
        assert out.shape[0] <= 8192


@settings(deadline=None, max_examples=60)
@given(blob=st.binary(min_size=0, max_size=2048))
def test_flac_decoder_never_crashes_on_garbage(blob):
    from folve_tpu.audio.flac import read_flac

    try:
        read_flac(b"fLaC" + blob)
    except Exception:
        pass  # rejecting is fine; crashing the process is not
    try:
        read_flac(blob)
    except Exception:
        pass


@settings(deadline=None, max_examples=40)
@given(
    flips=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 7)),
        min_size=1,
        max_size=6,
    ),
    seed=st.integers(0, 1000),
)
def test_flac_decoder_survives_bitflips(flips, seed):
    from folve_tpu.audio.flac import read_flac, write_flac

    rng = np.random.default_rng(seed)
    x = _quantized(rng.uniform(-0.5, 0.5, (800, 2)), 16).astype(np.float32)
    buf = io.BytesIO()
    write_flac(buf, x, 44100, bits=16, blocksize=256)
    blob = bytearray(buf.getvalue())
    for pos, bit in flips:
        blob[pos % len(blob)] ^= 1 << bit
    try:
        got, _ = read_flac(bytes(blob))
        assert got.shape[1] == 2 or got.shape[0] == 0
    except Exception:
        pass


_TOKEN_CHARS = st.text(
    alphabet=st.characters(
        # Quotes inside a quoted token are an error in the reference
        # scanner (zita-sstring.cc), and backslash starts an escape.
        min_codepoint=0x21, max_codepoint=0x7E, blacklist_characters="\"'\\"
    ),
    min_size=1,
    max_size=24,
)


@settings(**COMMON)
@given(token=_TOKEN_CHARS)
def test_sstring_quoted_roundtrip(token):
    """Any printable token survives quoting (jconvolver file names)."""
    from folve_tpu.filters.sstring import sstring

    out, consumed = sstring(f'"{token}" rest')
    assert out == token
    assert consumed == len(token) + 2


@settings(deadline=None, max_examples=60)
@given(line=st.text(max_size=80))
def test_zita_parser_never_crashes(line):
    """Arbitrary config lines produce errors/warnings, not crashes."""
    import os
    import tempfile

    from folve_tpu.filters.zita_parser import parse_config

    with tempfile.NamedTemporaryFile("w", suffix=".conf", delete=False) as f:
        f.write(line + "\n")
        path = f.name
    try:
        try:
            parse_config(path)
        except Exception as e:
            assert not isinstance(e, (SystemExit, MemoryError))
    finally:
        os.unlink(path)


@settings(deadline=None, max_examples=15)
@given(
    size=st.integers(1, 300),
    fragm_log=st.integers(4, 7),
    cin=st.integers(1, 3),
    cout=st.integers(1, 3),
    extra=st.integers(0, 50),
    seed=st.integers(0, 2**31 - 1),
)
def test_engine_matches_oracle_odd_shapes(size, fragm_log, cin, cout, extra,
                                          seed):
    """Engine == direct convolution for arbitrary IR lengths (incl.
    1-tap, shorter/longer than a block, non-power-of-two), channel
    combos and a declared size exceeding the IR."""
    from scipy import signal

    from folve_tpu.engine import chunk_step, compile_filter_bank, init_state

    fragm = 1 << fragm_log
    rng = np.random.default_rng(seed)
    ir = rng.standard_normal((cin, cout, size)).astype(np.float32) / max(
        np.sqrt(size), 4
    )
    bank = compile_filter_bank(ir, fragm=fragm, size=size + extra)
    t = max(2, -(-(size + extra) // fragm) + 1)  # cover > one FDL wrap
    x = rng.standard_normal((t, cin, fragm)).astype(np.float32)
    st_ = init_state(bank)
    _, y = chunk_step(bank, st_, x, t * fragm)
    got = np.asarray(y).transpose(0, 2, 1).reshape(t * fragm, cout)
    flat = x.transpose(0, 2, 1).reshape(t * fragm, cin)
    ref = np.zeros((t * fragm, cout))
    for o in range(cout):
        for i in range(cin):
            ref[:, o] += signal.fftconvolve(
                flat[:, i].astype(np.float64), ir[i, o].astype(np.float64)
            )[: t * fragm]
    err = np.sum((got - ref) ** 2)
    denom = max(np.sum(ref**2), 1e-30)
    assert 10 * np.log10(max(err, 1e-300) / denom) < -90


@settings(deadline=None, max_examples=15)
@given(
    splits=st.lists(st.integers(1, 7), min_size=1, max_size=4),
    seed=st.integers(0, 2**31 - 1),
)
def test_engine_chunking_invariance(splits, seed):
    """The convolution result is independent of how blocks are grouped
    into device chunks (the FDL carries all cross-chunk state)."""
    from folve_tpu.engine import chunk_step, compile_filter_bank, init_state

    fragm, size = 64, 256
    rng = np.random.default_rng(seed)
    ir = rng.standard_normal((2, 2, size)).astype(np.float32) / 16
    bank = compile_filter_bank(ir, fragm=fragm, size=size)
    total_blocks = sum(splits)
    x = rng.standard_normal((total_blocks, 2, fragm)).astype(np.float32)

    st1 = init_state(bank)
    _, ref = chunk_step(bank, st1, x, total_blocks * fragm)
    ref = np.asarray(ref)

    st2 = init_state(bank)
    pos = 0
    outs = []
    for t in splits:
        st2, y = chunk_step(bank, st2, x[pos : pos + t], t * fragm)
        outs.append(np.asarray(y))
        pos += t
    got = np.concatenate(outs)
    np.testing.assert_allclose(got, ref, atol=2e-5)


@settings(**COMMON)
@given(
    frames=st.integers(0, 20000),
    channels=st.integers(1, 4),
    bits=st.sampled_from([8, 16, 24]),
    blocksize=st.sampled_from([192, 576, 1024, 4096]),
    threads=st.sampled_from([2, 3, 4, 8]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_parallel_decode_equals_serial(
    frames, channels, bits, blocksize, threads, seed
):
    """For ANY (shape, depth, blocksize, pool width): the batched
    parallel frame decode must be byte-identical to serial."""
    from folve_tpu.audio.flac import read_flac, set_encoder_threads, write_flac

    rng = np.random.default_rng(seed)
    x = _quantized(
        rng.uniform(-1.0, 0.999, (frames, channels)).astype(np.float64), bits
    ).astype(np.float32)
    buf = io.BytesIO()
    write_flac(buf, x, 44100, bits=bits, blocksize=blocksize)
    blob = buf.getvalue()
    try:
        set_encoder_threads(1)
        serial, _ = read_flac(blob)
        set_encoder_threads(threads)
        parallel, _ = read_flac(blob)
    finally:
        set_encoder_threads(0)
    np.testing.assert_array_equal(serial, parallel)


@settings(**COMMON)
@given(
    frames=st.integers(0, 3000),
    channels=st.integers(1, 2),
    rate=st.sampled_from([8000, 22050, 44100, 48000]),
    fmt=st.sampled_from(["voc", "ircam", "nist", "pvf", "paf", "avr",
                         "mpc"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_legacy_encoder_roundtrip_exact(frames, channels, rate, fmt, seed):
    """Every legacy streaming encoder round-trips through our own
    reader sample-exact at arbitrary lengths/rates/channel counts."""
    from folve_tpu.audio import legacy, read_audio

    enc_cls = {"voc": legacy.VocStreamEncoder,
               "ircam": legacy.IrcamStreamEncoder,
               "nist": legacy.NistStreamEncoder,
               "pvf": legacy.PvfStreamEncoder,
               "paf": legacy.PafStreamEncoder,
               "avr": legacy.AvrStreamEncoder,
               "mpc": legacy.MpcStreamEncoder}[fmt]
    rng = np.random.default_rng(seed)
    x = _quantized(
        rng.uniform(-1.0, 0.999, (frames, channels)).astype(np.float64), 16
    ).astype(np.float32)
    enc = enc_cls(rate, channels, 16, frames)
    blob = enc.header() + enc.write_float(x) + enc.finish()
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=f".{fmt}", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        got, info = read_audio(path)
    finally:
        os.unlink(path)
    assert info.rate == rate and info.channels == channels
    assert got.shape == (frames, channels)
    np.testing.assert_array_equal(got, x)
