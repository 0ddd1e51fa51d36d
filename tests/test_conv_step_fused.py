"""Fused single-kernel conv step vs the engine's XLA path (interpret
mode on CPU).  The fused kernel must match chunk_step exactly in
semantics: same y, same carried state (hist/tail/max), across chunk
boundaries, for T >= P-1 and T < P-1, and honoring the valid-frame
clipping mask."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from folve_tpu.engine import stream as st
from folve_tpu.engine.filter_bank import compile_filter_bank
from folve_tpu.engine.kernels.conv_step import (
    fused_supported,
    pallas_conv_step_fused,
    permute_h_for_fused,
)


def _ref_chunks(bank, x, n_valid):
    """XLA chunk_step over one chunk per stream."""
    st.set_mac_impl("xla")
    try:
        step = jax.jit(
            lambda b, s, xx, nv: st.chunk_step(b, s, xx, nv),
            static_argnames=(),
        )
        ys, states = [], []
        for si in range(x.shape[0]):
            state = st.init_state(bank)
            state, y = st.chunk_step(bank, state, x[si], n_valid[si])
            ys.append(np.asarray(y))
            states.append(state)
        return np.stack(ys), states
    finally:
        st.set_mac_impl("auto")


def _run_fused(bank, x, n_valid, passes=6):
    s, t, cin, b = x.shape
    p = bank.partitions
    cout = bank.nout
    hp = permute_h_for_fused(bank.h_spec, 2 * bank.fragm)
    hist_re = jnp.zeros((s, p - 1, cin, bank.bins), jnp.float32)
    hist_im = jnp.zeros_like(hist_re)
    tail = jnp.zeros((s, cout, b), jnp.float32)
    blk = np.arange(t) * b
    valid = np.clip(n_valid[:, None] - blk[None, :], 0, b).astype(np.int32)
    return pallas_conv_step_fused(
        hp, x, hist_re, hist_im, tail, jnp.asarray(valid), 2 * b,
        interpret=True, passes=passes,
    )


@pytest.mark.parametrize(
    "p,t,fragm,cin,cout",
    [
        (4, 6, 64, 2, 2),    # T >= P-1
        (4, 2, 64, 2, 2),    # T < P-1: old hist rows shift
        (6, 5, 128, 1, 1),   # mono, T == P-1
        (3, 4, 64, 1, 2),    # upmix
        (2, 3, 64, 2, 2),    # minimal ring (1 slot)
    ],
)
def test_fused_matches_xla_single_chunk(rng, p, t, fragm, cin, cout):
    assert fused_supported(p, cin, cout, t, 2 * fragm)
    ir = rng.standard_normal((cin, cout, p * fragm - 3)).astype(np.float32)
    bank = compile_filter_bank(ir, fragm=fragm)
    assert bank.partitions == p
    s = 3
    x = rng.standard_normal((s, t, cin, fragm)).astype(np.float32)
    n_valid = np.array([t * fragm, t * fragm - fragm // 2, 1], np.int64)

    ref_y, ref_states = _ref_chunks(bank, x, n_valid)
    y, hr, hi, tl, mx = _run_fused(bank, x, n_valid)

    np.testing.assert_allclose(np.asarray(y), ref_y, atol=2e-4)
    max_st = np.asarray(mx)
    for si in range(s):
        rs = ref_states[si]
        np.testing.assert_allclose(
            np.asarray(hr[si]), np.asarray(rs.hist_re), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(hi[si]), np.asarray(rs.hist_im), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(tl[si]), np.asarray(rs.tail), atol=2e-4)
        np.testing.assert_allclose(
            max_st[si], np.asarray(rs.max_abs), atol=2e-4)


def test_fused_streaming_across_chunks(rng):
    """Two consecutive fused chunks == one long XLA convolution; the
    exported hist/tail feed chunk 2 exactly."""
    p, t, fragm, cin, cout = 5, 3, 64, 2, 2
    ir = rng.standard_normal((cin, cout, p * fragm)).astype(np.float32)
    bank = compile_filter_bank(ir, fragm=fragm)
    s = 2
    x1 = rng.standard_normal((s, t, cin, fragm)).astype(np.float32)
    x2 = rng.standard_normal((s, t, cin, fragm)).astype(np.float32)

    hp = permute_h_for_fused(bank.h_spec, 2 * bank.fragm)
    hist_re = jnp.zeros((s, p - 1, cin, bank.bins), jnp.float32)
    hist_im = jnp.zeros_like(hist_re)
    tail = jnp.zeros((s, cout, fragm), jnp.float32)
    valid = np.full((s, t), fragm, np.int32)
    y1, hr, hi, tl, _ = pallas_conv_step_fused(
        hp, x1, hist_re, hist_im, tail, jnp.asarray(valid), 2 * fragm,
        interpret=True, passes=6)
    y2, _, _, _, _ = pallas_conv_step_fused(
        hp, x2, hr, hi, tl, jnp.asarray(valid), 2 * fragm, interpret=True,
        passes=6)

    st.set_mac_impl("xla")
    try:
        for si in range(s):
            state = st.init_state(bank)
            state, ry1 = st.chunk_step(bank, state, x1[si])
            state, ry2 = st.chunk_step(bank, state, x2[si])
            np.testing.assert_allclose(
                np.asarray(y1[si]), np.asarray(ry1), atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(y2[si]), np.asarray(ry2), atol=2e-4)
    finally:
        st.set_mac_impl("auto")


def test_serving_chunk_step_routes_fused(rng):
    """serving_chunk_step under pallas_interpret (fused route) must
    match the XLA vmapped path, including carried state."""
    p, t, fragm, cin, cout = 4, 5, 64, 2, 2
    ir = rng.standard_normal((cin, cout, p * fragm - 7)).astype(np.float32)
    bank = compile_filter_bank(ir, fragm=fragm)
    assert st.fused_serving_supported(bank, t)
    s = 2
    x = rng.standard_normal((s, t, cin, fragm)).astype(np.float32)
    nv = np.array([t * fragm, t * fragm - 9], np.int32)
    states = jax.vmap(lambda _: st.init_state(bank))(np.arange(s))

    st.set_mac_impl("xla")
    try:
        ref_states, ref_y = st.serving_chunk_step(
            bank, states, jnp.asarray(x), jnp.asarray(nv))
    finally:
        st.set_mac_impl("auto")
    st.set_mac_impl("pallas_interpret")
    try:
        got_states, got_y = st.serving_chunk_step(
            bank, states, jnp.asarray(x), jnp.asarray(nv))
    finally:
        st.set_mac_impl("auto")
    # The serving route runs the production default FFT_DOT_PASSES=3
    # (bf16x3 dots, ~2^-18 relative per dot): scale the tolerance to
    # the signal instead of using the exact-mode atol.
    tol = 1e-4 * float(np.max(np.abs(np.asarray(ref_y))))
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               atol=tol)
    for f in ("hist_re", "hist_im", "tail", "max_abs"):
        r = np.asarray(getattr(ref_states, f))
        np.testing.assert_allclose(
            np.asarray(getattr(got_states, f)), r,
            atol=max(2e-4, 1e-4 * float(np.max(np.abs(r)))))


def test_fused_three_pass_accuracy(rng):
    """The production default (FFT_DOT_PASSES=3, bf16x3 dots) stays
    within a scaled tolerance of the exact XLA path — the on-chip
    end-to-end figure is -102 dB vs the HIGHEST oracle (DEVNOTES r5)."""
    p, t, fragm, cin, cout = 4, 6, 64, 2, 2
    ir = rng.standard_normal((cin, cout, p * fragm - 3)).astype(np.float32)
    bank = compile_filter_bank(ir, fragm=fragm)
    s = 2
    x = rng.standard_normal((s, t, cin, fragm)).astype(np.float32)
    n_valid = np.full((s,), t * fragm, np.int64)
    ref_y, _ = _ref_chunks(bank, x, n_valid)
    y, *_ = _run_fused(bank, x, n_valid, passes=3)
    tol = 1e-4 * float(np.max(np.abs(ref_y)))
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=tol)


def test_fused_pre_shaped_path_matches(rng):
    """The steady-state pre-shaped loop (host-staged x, 5-D carry, no
    device retiles) == serving_chunk_step across two chunks, including
    the carry conversion round-trip."""
    p, t, fragm, cin, cout = 4, 5, 64, 2, 2
    ir = rng.standard_normal((cin, cout, p * fragm - 7)).astype(np.float32)
    bank = compile_filter_bank(ir, fragm=fragm)
    s = 2
    x1 = rng.standard_normal((s, t, cin, fragm)).astype(np.float32)
    x2 = rng.standard_normal((s, t, cin, fragm)).astype(np.float32)
    nv = np.array([t * fragm, t * fragm - 9], np.int32)

    st.set_mac_impl("xla")
    try:
        states = jax.vmap(lambda _: st.init_state(bank))(np.arange(s))
        states, ry1 = st.serving_chunk_step(
            bank, states, jnp.asarray(x1), jnp.asarray(nv))
        states, ry2 = st.serving_chunk_step(
            bank, states, jnp.asarray(x2), jnp.asarray(nv))
        ref_states = states
    finally:
        st.set_mac_impl("auto")

    carry = st.fused_carry_init(bank, s)
    got = []
    for x in (x1, x2):
        x5 = jnp.asarray(st.stage_x_for_fused(bank, x))
        carry, y5 = st.fused_serving_step_pre(
            bank, carry, x5, jnp.asarray(nv), interpret=True)
        got.append(np.asarray(y5).reshape(s, t, cout, fragm))
    tol = 1e-4 * float(np.max(np.abs(np.asarray(ry2))))
    np.testing.assert_allclose(got[0], np.asarray(ry1), atol=tol)
    np.testing.assert_allclose(got[1], np.asarray(ry2), atol=tol)
    back = st.states_from_carry(bank, carry)
    for f in ("hist_re", "hist_im", "tail", "max_abs"):
        r = np.asarray(getattr(ref_states, f))
        np.testing.assert_allclose(
            np.asarray(getattr(back, f)), r,
            atol=max(2e-4, 1e-4 * float(np.max(np.abs(r)))))


def test_fused_stacked_dot_path(rng, monkeypatch):
    """The opt-in stacked-dot kernel layout (re/im constant pairs
    concatenated, half the dots at twice the size; FOLVE_FUSED_STACK —
    off by default, measured slower on v5e) must stay numerically
    equal to the XLA path at the smallest qualifying bank."""
    monkeypatch.setenv("FOLVE_FUSED_STACK", "all")
    p, t, fragm = 2, 3, 8192  # n=16384 -> m1=m2=128
    from folve_tpu.engine.rfft import get_plan

    assert get_plan(2 * fragm).m1 % 128 == 0
    ir = rng.standard_normal((2, 2, p * fragm - 11)).astype(np.float32)
    bank = compile_filter_bank(ir, fragm=fragm)
    assert bank.partitions == p
    s = 2
    x = (rng.standard_normal((s, t, 2, fragm)) * 0.3).astype(np.float32)
    n_valid = np.array([t * fragm, t * fragm - 100], np.int64)

    ref_y, ref_states = _ref_chunks(bank, x, n_valid)
    y, hr, hi, tl, mx = _run_fused(bank, x, n_valid)

    tol = 1e-4 * float(np.max(np.abs(ref_y)))
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=tol)
    for si in range(s):
        rs = ref_states[si]
        for got, ref in (
            (hr[si], rs.hist_re), (hi[si], rs.hist_im), (tl[si], rs.tail),
        ):
            r = np.asarray(ref)
            np.testing.assert_allclose(
                np.asarray(got), r,
                atol=max(2e-4, 1e-4 * float(np.max(np.abs(r)))))
        np.testing.assert_allclose(
            np.asarray(mx)[si], np.asarray(rs.max_abs), rtol=1e-3)

    # 3-pass (production default) accuracy on the stacked layout too.
    y3, *_ = _run_fused(bank, x, n_valid, passes=3)
    np.testing.assert_allclose(np.asarray(y3), ref_y, atol=tol)


def test_fused_support_gate():
    # MAXSIZE-class FDL depth must NOT claim fused support (VMEM).
    assert not fused_supported(128, 2, 2, 4, 2 * 8192)
    assert fused_supported(16, 2, 2, 64, 2 * 8192)
    assert not fused_supported(1, 2, 2, 4, 2 * 8192)  # P=1: no ring


def test_single_chunk_step_routes_fused(rng):
    """The lone-stream pump entry (processor._jitted_chunk) routed
    through the fused kernel == chunk_step, including partial-block
    n_valid and carried state."""
    p, t, fragm = 4, 3, 64
    ir = rng.standard_normal((2, 2, p * fragm - 5)).astype(np.float32)
    bank = compile_filter_bank(ir, fragm=fragm)
    x1 = rng.standard_normal((t, 2, fragm)).astype(np.float32)
    x2 = rng.standard_normal((t, 2, fragm)).astype(np.float32)
    nv = t * fragm - 17

    st.set_mac_impl("xla")
    try:
        state = st.init_state(bank)
        state, r1 = st.chunk_step(bank, state, x1, nv)
        state, r2 = st.chunk_step(bank, state, x2, nv)
        ref_state = state
    finally:
        st.set_mac_impl("auto")

    st.set_mac_impl("pallas_interpret")
    try:
        state = st.init_state(bank)
        state, g1 = st.single_chunk_step(bank, state, x1, nv)
        state, g2 = st.single_chunk_step(bank, state, x2, nv)
    finally:
        st.set_mac_impl("auto")
    tol = 1e-4 * float(np.max(np.abs(np.asarray(r2)))) + 1e-5
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), atol=tol)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), atol=tol)
    for f in ("hist_re", "hist_im", "tail", "max_abs"):
        r = np.asarray(getattr(ref_state, f))
        np.testing.assert_allclose(
            np.asarray(getattr(state, f)), r,
            atol=max(2e-4, 1e-4 * float(np.max(np.abs(r)))))
