"""Pallas TPU kernel for the two-stage inverse DFT (real output).

The engine's inverse transform is two complex matmul stages
(engine/rfft.ifft_to_real).  Under XLA each stage materializes its
[.., N] intermediates in HBM; for the bench shapes that is the single
most expensive piece of the step (~9 ms of a ~21 ms S=32/T=32 step).
This kernel runs both stages per spectrum entirely in VMEM: the 128x128
factor matrices ride along as constants, each grid step loads R spectra,
does the stage-1 complex matmul, the conjugate twiddle, and the
real-part stage-2 matmul on the MXU, and writes the time-domain rows
once.

Matmuls use precision=HIGHEST (6-pass bf16) — required for the
< -90 dB accuracy budget; single-pass bf16 would sit near -30 dB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from folve_tpu.engine.rfft import get_plan

_PRECISION = lax.Precision.HIGHEST
_ROWS = 8  # spectra per grid step


def _kernel(xr_ref, xi_ref, f2r_ref, f2i_ref, twr_ref, twi_ref, f1r_ref, f1i_ref,
            out_ref, *, m1, m2, rows, inv_n):
    f2r, f2i = f2r_ref[...], f2i_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    # Blocks arrive as [R, M1, M2] (the flat k1-major layout reshaped in
    # HBM — no data movement).  Collapsing [R, M1] is sublane-free, so
    # stage 1 is ONE large matmul per plane.
    ar = xr_ref[...].reshape(rows * m1, m2)
    ai = xi_ref[...].reshape(rows * m1, m2)
    # Stage 1: U = X @ conj(F2)  (contract k2; row-independent).
    ur = (
        jnp.dot(ar, f2r, precision=_PRECISION)
        + jnp.dot(ai, f2i, precision=_PRECISION)
    )
    ui = (
        jnp.dot(ai, f2r, precision=_PRECISION)
        - jnp.dot(ar, f2i, precision=_PRECISION)
    )
    # Conjugate twiddle, broadcast over spectra.
    ur = ur.reshape(rows, m1, m2)
    ui = ui.reshape(rows, m1, m2)
    vr = ur * twr + ui * twi
    vi = ui * twr - ur * twi
    # Stage 2 contracts k1 within each spectrum: out[r] = F1 @ V[r]
    # (F1 symmetric).  dot_general with F1 as lhs gives [M1, R, M2];
    # move the n1 axis back without a flat reshape.
    dn = (((1,), (1,)), ((), ()))
    w = (
        lax.dot_general(f1r, vr, dn, precision=_PRECISION)
        + lax.dot_general(f1i, vi, dn, precision=_PRECISION)
    )  # [M1, R, M2]
    out_ref[...] = jnp.swapaxes(w, 0, 1) * inv_n


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_ifft_to_real(xr: jax.Array, xi: jax.Array, n: int, interpret: bool = False):
    """Inverse DFT of permuted-layout full spectra -> real signal.

    ``xr``/``xi``: [..., n]; returns float32 [..., n].
    """
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    batch = xr.shape[:-1]
    g = 1
    for d in batch:
        g *= d
    xr2 = xr.reshape(g, m1, m2)
    xi2 = xi.reshape(g, m1, m2)
    rows = _ROWS
    pad = (-g) % rows
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0), (0, 0)))
    gp = g + pad
    mem = {"memory_space": _VMEM} if _VMEM else {}
    spec_x = pl.BlockSpec((rows, m1, m2), lambda j: (j, 0, 0), **mem)
    spec_f2 = pl.BlockSpec((m2, m2), lambda j: (0, 0), **mem)
    spec_tw = pl.BlockSpec((m1, m2), lambda j: (0, 0), **mem)
    spec_f1 = pl.BlockSpec((m1, m1), lambda j: (0, 0), **mem)
    kernel = functools.partial(
        _kernel, m1=m1, m2=m2, rows=rows, inv_n=1.0 / n
    )
    out = pl.pallas_call(
        kernel,
        grid=(gp // rows,),
        in_specs=[spec_x, spec_x, spec_f2, spec_f2, spec_tw, spec_tw, spec_f1, spec_f1],
        out_specs=pl.BlockSpec((rows, m1, m2), lambda j: (j, 0, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((gp, m1, m2), jnp.float32),
        interpret=interpret,
    )(
        xr2,
        xi2,
        jnp.asarray(plan.f2_re),
        jnp.asarray(plan.f2_im),
        jnp.asarray(plan.tw_re),
        jnp.asarray(plan.tw_im),
        jnp.asarray(plan.f1_re),
        jnp.asarray(plan.f1_im),
    )
    return out[:g].reshape(*batch, n)
