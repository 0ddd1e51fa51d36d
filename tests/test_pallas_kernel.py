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


def test_vmapped_batching(rng):
    p, cin, cout, k, t, s = 4, 2, 2, 512, 3, 5
    h = rng.standard_normal((p, cin, cout, 2, k)).astype(np.float32)
    xbr = rng.standard_normal((s, t + p - 1, cin, k)).astype(np.float32)
    xbi = rng.standard_normal((s, t + p - 1, cin, k)).astype(np.float32)
    got = jax.vmap(lambda xr, xi: pallas_fdl_mac(h, xr, xi, t, interpret=True))(xbr, xbi)
    for i in range(s):
        ref = pallas_fdl_mac(h, xbr[i], xbi[i], t, interpret=True)
        np.testing.assert_allclose(np.asarray(got[0][i]), np.asarray(ref[0]), atol=1e-5)


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


