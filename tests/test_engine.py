"""Golden tests: the TPU engine vs a float64 direct-convolution oracle.

The reference has no tests (SURVEY.md §4); its oracle was "listen to it".
Ours is numeric: output must match linear convolution to better than
-90 dB error (BASELINE.md accuracy target).
"""

import numpy as np
import pytest
from scipy import signal

from folve_tpu.engine import (
    block_step,
    chunk_step,
    compile_filter_bank,
    derive_fragm,
    init_state,
    num_partitions,
)


def snr_db(ref, out):
    ref = np.asarray(ref, dtype=np.float64)
    out = np.asarray(out, dtype=np.float64)
    err = out - ref
    denom = np.sum(ref**2)
    if denom == 0:
        return -np.inf if np.sum(err**2) == 0 else np.inf
    return 10 * np.log10(np.sum(err**2) / denom + 1e-300)


def oracle(ir, x):
    """Linear convolution truncated to input length.

    ir: [Cin, Cout, L]; x: [N, Cin] -> [N, Cout] (float64).
    """
    cin, cout, _ = ir.shape
    n = x.shape[0]
    y = np.zeros((n, cout))
    for o in range(cout):
        for i in range(cin):
            y[:, o] += signal.fftconvolve(
                x[:, i].astype(np.float64), ir[i, o].astype(np.float64)
            )[:n]
    return y


def run_engine(ir, x, fragm=None, size=None, chunk_blocks=4):
    """Feed x through the engine in chunks, zero-padding the tail block."""
    bank = compile_filter_bank(ir, fragm=fragm, size=size)
    b = bank.fragm
    n, cin = x.shape
    t_total = -(-n // b)
    padded = np.zeros((t_total * b, cin), dtype=np.float32)
    padded[:n] = x
    blocks = padded.reshape(t_total, b, cin).transpose(0, 2, 1)  # [T, Cin, B]
    state = init_state(bank)
    outs = []
    done = 0
    for start in range(0, t_total, chunk_blocks):
        chunk = blocks[start : start + chunk_blocks]
        n_valid = min(n - start * b, chunk.shape[0] * b)
        state, y = chunk_step(bank, state, chunk, n_valid=max(n_valid, 0))
        outs.append(np.asarray(y))
        done += chunk.shape[0]
    y = np.concatenate(outs, axis=0)  # [T, Cout, B]
    y = y.transpose(0, 2, 1).reshape(t_total * b, -1)[:n]
    return bank, state, y


def test_derive_fragm_matches_reference_policy():
    # zita-fconfig.cc:74-77 — halve MAXQUANT while >= 2*size and > MINPART.
    assert derive_fragm(65536) == 8192
    assert derive_fragm(204800) == 8192
    assert derive_fragm(131072) == 8192
    assert derive_fragm(100) == 128
    assert derive_fragm(32) == 64
    assert derive_fragm(1) == 64
    assert num_partitions(65536, 8192) == 8
    assert num_partitions(131072, 8192) == 16
    assert num_partitions(204800, 8192) == 25


@pytest.mark.parametrize(
    "cin,cout,size,fragm",
    [
        (1, 1, 64, None),  # P=1 short filter
        (2, 2, 300, 64),  # P=5, ragged last partition
        (2, 2, 1024, 128),  # P=8
        (1, 2, 700, 256),  # channel upmix
        (2, 1, 513, 256),  # downmix, ragged
    ],
)
def test_chunk_matches_oracle(rng, cin, cout, size, fragm):
    ir = rng.standard_normal((cin, cout, size)).astype(np.float32) / np.sqrt(size)
    n = 5 * (fragm or derive_fragm(size)) + 37
    x = rng.standard_normal((n, cin)).astype(np.float32)
    _, _, y = run_engine(ir, x, fragm=fragm, size=size)
    ref = oracle(ir, x)
    assert snr_db(ref, y) < -90


def test_declared_size_larger_than_ir(rng):
    # /convolver/new declares maxsize; actual IR may be shorter
    # (zita-config.cc:130-135 truncates the other way round).
    ir = rng.standard_normal((2, 2, 1000)).astype(np.float32) / 30
    n = 4096 + 17
    x = rng.standard_normal((n, 2)).astype(np.float32)
    _, _, y = run_engine(ir, x, size=4096, fragm=512)
    ref = oracle(ir, x)
    assert snr_db(ref, y) < -90


def test_chunking_invariance(rng):
    """Different chunk sizes must be bit-identical state machines."""
    ir = rng.standard_normal((2, 2, 500)).astype(np.float32) / 20
    x = rng.standard_normal((8 * 128, 2)).astype(np.float32)
    _, _, y1 = run_engine(ir, x, fragm=128, chunk_blocks=1)
    _, _, y8 = run_engine(ir, x, fragm=128, chunk_blocks=8)
    np.testing.assert_allclose(y1, y8, atol=2e-6)
    ref = oracle(ir, x)
    assert snr_db(ref, y1) < -90


def test_block_step_matches_chunk(rng):
    ir = rng.standard_normal((2, 2, 256)).astype(np.float32) / 16
    bank = compile_filter_bank(ir, fragm=128)
    x = rng.standard_normal((4, 2, 128)).astype(np.float32)
    s1 = init_state(bank)
    outs = []
    for t in range(4):
        s1, y = block_step(bank, s1, x[t])
        outs.append(np.asarray(y))
    s2 = init_state(bank)
    s2, ychunk = chunk_step(bank, s2, x)
    np.testing.assert_allclose(np.stack(outs), np.asarray(ychunk), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.tail), np.asarray(s2.tail), atol=1e-6)


def test_max_abs_monitor(rng):
    """max_abs tracks peak |output| over valid frames only
    (reference clipping monitor, sound-processor.cc:119-124)."""
    ir = np.zeros((1, 1, 64), dtype=np.float32)
    ir[0, 0, 0] = 2.0  # pure gain of 2
    bank = compile_filter_bank(ir, fragm=64)
    x = np.zeros((2, 1, 64), dtype=np.float32)
    x[0, 0, 5] = 0.6
    x[1, 0, 3] = 0.9  # lands in the invalid (padding) region below
    state = init_state(bank)
    state, _ = chunk_step(bank, state, x, n_valid=64)
    assert np.asarray(state.max_abs) == pytest.approx(1.2, rel=1e-5)
    # With everything valid the later peak dominates.
    state2 = init_state(bank)
    state2, _ = chunk_step(bank, state2, x, n_valid=128)
    assert np.asarray(state2.max_abs) == pytest.approx(1.8, rel=1e-5)


def test_long_ir_131k(rng):
    """BASELINE headline config: 131,072-tap stereo filter."""
    size = 131072
    ir = rng.standard_normal((2, 2, size)).astype(np.float32) / np.sqrt(size)
    fragm = derive_fragm(size)
    assert fragm == 8192
    n = 3 * fragm + 1234
    x = rng.standard_normal((n, 2)).astype(np.float32)
    _, _, y = run_engine(ir, x)
    ref = oracle(ir, x)
    assert snr_db(ref, y) < -90


def test_many_channels_einsum_path(rng):
    """cin*cout > 16 exercises the einsum MAC fallback."""
    cin, cout, size, fragm = 5, 4, 300, 64
    ir = rng.standard_normal((cin, cout, size)).astype(np.float32) / 17
    n = 4 * fragm + 31
    x = rng.standard_normal((n, cin)).astype(np.float32)
    _, _, y = run_engine(ir, x, fragm=fragm, size=size)
    ref = oracle(ir, x)
    assert snr_db(ref, y) < -90


def test_maxinp_maxout_64x64(rng):
    """The engine limit the reference enforces (Convproc MAXINP/MAXOUT,
    zita-fconfig.cc:49-60): a full 64x64 matrix convolver is accepted
    and correct."""
    from folve_tpu.engine import MAXINP, MAXOUT

    assert MAXINP == MAXOUT == 64
    cin, cout, size, fragm = 64, 64, 96, 32
    ir = rng.standard_normal((cin, cout, size)).astype(np.float32) / 80
    n = 2 * fragm + 7
    x = (rng.standard_normal((n, cin)) * 0.1).astype(np.float32)
    _, _, y = run_engine(ir, x, fragm=fragm, size=size)
    ref = oracle(ir, x)
    assert snr_db(ref, y) < -90
    # One past the limit is rejected (zita-fconfig.cc bounds checks).
    from folve_tpu.engine import compile_filter_bank

    with pytest.raises(ValueError):
        compile_filter_bank(np.zeros((65, 1, 8), np.float32), fragm=32, size=8)
    with pytest.raises(ValueError):
        compile_filter_bank(np.zeros((1, 65, 8), np.float32), fragm=32, size=8)
