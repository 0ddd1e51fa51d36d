"""Pallas FDL-MAC kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax

from folve_tpu.engine import stream as st
from folve_tpu.engine.kernels.fdl_mac import pallas_fdl_mac


@pytest.mark.parametrize(
    "p,cin,cout,k,t",
    [
        (4, 1, 1, 256, 3),
        (16, 2, 2, 2048, 4),
        (2, 1, 2, 4096, 2),  # k > tile width: multi-tile grid
        (1, 2, 2, 128, 5),  # single partition
    ],
)
def test_matches_xla_path(rng, p, cin, cout, k, t):
    h = rng.standard_normal((p, cin, cout, 2, k)).astype(np.float32)
    xall_re = rng.standard_normal((t + p - 1, cin, k)).astype(np.float32)
    xall_im = rng.standard_normal((t + p - 1, cin, k)).astype(np.float32)
    st.set_mac_impl("xla")
    try:
        ref = jax.jit(lambda h, xr, xi: st._fdl_mac(h, xr, xi, t))(h, xall_re, xall_im)
    finally:
        st.set_mac_impl("auto")
    got = pallas_fdl_mac(h, xall_re, xall_im, t, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-4)


@pytest.mark.parametrize(
    "p,cin,cout,k,t",
    [
        (4, 1, 1, 256, 3),
        (16, 2, 2, 2048, 4),
        (2, 1, 2, 4096, 2),
        (8, 2, 2, 512, 3),   # t < p-1: history outlives the chunk
        (4, 2, 2, 512, 8),   # t >= p-1: new hist is a slice of xr
        (40, 2, 2, 256, 4),  # p > unroll limit: fori tail engaged
        (128, 1, 1, 256, 2),  # MAXSIZE-class partition count
    ],
)
def test_split_kernel_matches_xla(rng, p, cin, cout, k, t):
    """Concat-free (hist, new) kernel == XLA over the stitched window."""
    from folve_tpu.engine.kernels.fdl_mac import pallas_fdl_mac_split

    h = rng.standard_normal((p, cin, cout, 2, k)).astype(np.float32)
    hist_re = rng.standard_normal((p - 1, cin, k)).astype(np.float32)
    hist_im = rng.standard_normal((p - 1, cin, k)).astype(np.float32)
    xr = rng.standard_normal((t, cin, k)).astype(np.float32)
    xi = rng.standard_normal((t, cin, k)).astype(np.float32)
    xall_re = np.concatenate([hist_re, xr])
    xall_im = np.concatenate([hist_im, xi])
    ref = jax.jit(lambda h, a, b: st._fdl_mac(h, a, b, t))(h, xall_re, xall_im)
    got = pallas_fdl_mac_split(h, hist_re, hist_im, xr, xi, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-4)


def test_vmapped_batching(rng):
    p, cin, cout, k, t, s = 4, 2, 2, 512, 3, 5
    h = rng.standard_normal((p, cin, cout, 2, k)).astype(np.float32)
    xbr = rng.standard_normal((s, t + p - 1, cin, k)).astype(np.float32)
    xbi = rng.standard_normal((s, t + p - 1, cin, k)).astype(np.float32)
    got = jax.vmap(lambda xr, xi: pallas_fdl_mac(h, xr, xi, t, interpret=True))(xbr, xbi)
    for i in range(s):
        ref = pallas_fdl_mac(h, xbr[i], xbi[i], t, interpret=True)
        np.testing.assert_allclose(np.asarray(got[0][i]), np.asarray(ref[0]), atol=1e-5)


def test_chunk_step_split_path_streaming(rng):
    """chunk_step on the split-kernel route (interpret): multi-step
    streaming equals the XLA route bit-for-tolerance, covering both the
    t >= P-1 (hist from xr) and t < P-1 (stitched hist) carries."""
    from folve_tpu.engine import chunk_step, compile_filter_bank, init_state

    fragm, size = 64, 512  # P = 8
    ir = rng.standard_normal((2, 2, size)).astype(np.float32) / 16
    bank = compile_filter_bank(ir, fragm=fragm, size=size)
    xs = [rng.standard_normal((t, 2, fragm)).astype(np.float32)
          for t in (3, 12, 2, 9)]  # mixes t < P-1 and t >= P-1

    def run():
        state = init_state(bank)
        outs = []
        for x in xs:
            state, y = chunk_step(bank, state, x, x.shape[0] * fragm)
            outs.append(np.asarray(y))
        return np.concatenate(outs), np.asarray(state.hist_re)

    st.set_mac_impl("xla")
    try:
        ref_y, ref_hist = run()
    finally:
        st.set_mac_impl("auto")
    st.set_mac_impl("pallas_interpret")
    try:
        got_y, got_hist = run()
    finally:
        st.set_mac_impl("auto")
    np.testing.assert_allclose(got_y, ref_y, atol=2e-5)
    np.testing.assert_allclose(got_hist, ref_hist, atol=2e-5)


def test_vmapped_chunk_step_matches_single(rng):
    """vmap of the full pallas chunk step == per-stream, including the
    OLA kernel's scratch tail carry (validated bit-exact on real TPU;
    this pins the interpret-mode equivalent in CI)."""
    from folve_tpu.engine import (
        batched_chunk_step,
        chunk_step,
        compile_filter_bank,
        init_state,
    )
    from folve_tpu.engine.filter_bank import FilterBank

    fragm, size, s, t = 64, 256, 3, 4
    banks = []
    for _ in range(s):
        ir = rng.standard_normal((2, 2, size)).astype(np.float32) / 16
        banks.append(compile_filter_bank(ir, fragm=fragm, size=size))
    bank_b = FilterBank(
        h_spec=jax.numpy.stack([b.h_spec for b in banks]),
        fragm=fragm,
        size=size,
    )
    x = rng.standard_normal((s, t, 2, fragm)).astype(np.float32)
    nv = np.full((s,), t * fragm, np.int32)

    st.set_mac_impl("pallas_interpret")
    try:
        states = jax.vmap(lambda i: init_state(banks[0]))(np.arange(s))
        st1, y1 = batched_chunk_step(bank_b, states, jax.numpy.asarray(x), nv)
        st2, y2 = batched_chunk_step(bank_b, st1, jax.numpy.asarray(x[:, ::-1]), nv)
        for i in range(s):
            ss = init_state(banks[i])
            ss, r1 = chunk_step(banks[i], ss, x[i], int(nv[i]))
            ss, r2 = chunk_step(banks[i], ss, x[i, ::-1], int(nv[i]))
            np.testing.assert_array_equal(np.asarray(y1[i]), np.asarray(r1))
            np.testing.assert_array_equal(np.asarray(y2[i]), np.asarray(r2))
            np.testing.assert_array_equal(
                np.asarray(st2.tail[i]), np.asarray(ss.tail)
            )
    finally:
        st.set_mac_impl("auto")


def test_large_p_fori_path(rng):
    """P > unroll limit exercises the in-kernel fori_loop."""
    p, cin, cout, k, t = 40, 1, 1, 256, 2
    h = rng.standard_normal((p, cin, cout, 2, k)).astype(np.float32)
    xr = rng.standard_normal((t + p - 1, cin, k)).astype(np.float32)
    xi = rng.standard_normal((t + p - 1, cin, k)).astype(np.float32)
    st.set_mac_impl("xla")
    try:
        ref = jax.jit(lambda h, a, b: st._fdl_mac(h, a, b, t))(h, xr, xi)
    finally:
        st.set_mac_impl("auto")
    got = pallas_fdl_mac(h, xr, xi, t, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-4)


