"""Fused forward real-FFT (half-spectrum output) — both stages in VMEM.

Companion of :mod:`ifft_half`: XLA spills the stage-1/twiddle
intermediates of the two-stage matmul FFT to HBM; this kernel computes
the whole transform per batch unit in VMEM.  Zero-padding awareness is
kept: a real signal of L < N samples fills only the first ceil(L/M2)
rows of the [n1, n2] input matrix, so stage 1 contracts those rows only
(for the engine's 2x zero-pad this halves the stage-1 matmul).

Layouts are the free-contiguity tricks from ifft_half: input viewed as
[R, rows, M2] (row-major reshape of the flat signal), output stored as
[R, M1, cols] whose row-major flattening IS the engine's permuted
half-spectrum bin order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax
from jax.experimental import pallas as pl

from folve_tpu.engine.rfft import get_plan

from jax.experimental.pallas import tpu as pltpu

from folve_tpu.engine.kernels.common import VMEM as _VMEM, promote_vma, sds as _sds

_PREC = lax.Precision.HIGHEST


def _kernel(x_ref, f1r_ref, f1i_ref, twr_ref, twi_ref, f2r_ref, f2i_ref,
            yr_ref, yi_ref):
    a = x_ref[0]  # [rows, M2]
    # Stage 1 (real input): S1 = F1[:, :rows] @ A.
    s1r = jax.lax.dot(f1r_ref[...], a, precision=_PREC)
    s1i = jax.lax.dot(f1i_ref[...], a, precision=_PREC)
    # Twiddle.
    t_r = s1r * twr_ref[...] - s1i * twi_ref[...]
    t_i = s1r * twi_ref[...] + s1i * twr_ref[...]
    # Stage 2, half output: X = T @ F2[:, :cols].
    yr_ref[0] = (
        jax.lax.dot(t_r, f2r_ref[...], precision=_PREC)
        - jax.lax.dot(t_i, f2i_ref[...], precision=_PREC)
    )
    yi_ref[0] = (
        jax.lax.dot(t_r, f2i_ref[...], precision=_PREC)
        + jax.lax.dot(t_i, f2r_ref[...], precision=_PREC)
    )


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_fft_real_half_rows(x: jax.Array, n: int,
                              f1r, f1i, twr, twi,
                              interpret: bool = False):
    """Freq-sharded variant: compute only a window of k1 rows.

    The stage factors vary per shard (k1_start = axis_index * k1_n), so
    they are INPUTS instead of baked constants: ``f1r``/``f1i``
    ``[k1_n, rows]`` (the local rows of F1's used columns), ``twr``/
    ``twi`` ``[k1_n, M2]``.  Returns ``(re, im)`` each
    ``[..., k1_n * cols]`` local permuted half-spectrum bins.
    """
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    k1_n = f1r.shape[0]
    length = x.shape[-1]
    rows = min(m1, -(-length // m2))
    if length < rows * m2:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, rows * m2 - length)]
        x = jnp.pad(x, pad)
    batch = x.shape[:-1]
    r = int(np.prod(batch)) if batch else 1
    a = x.reshape(r, rows, m2)
    f2r = jnp.asarray(np.ascontiguousarray(plan.f2_re[:, :cols]))
    f2i = jnp.asarray(np.ascontiguousarray(plan.f2_im[:, :cols]))
    # Mixed vma sets (stream-varying audio, freq-varying factors,
    # unvarying constants) must be unified for pallas_call in shard_map.
    a, f1r, f1i, twr, twi, f2r, f2i = promote_vma(
        a, f1r, f1i, twr, twi, f2r, f2i
    )

    mem = {"memory_space": _VMEM} if _VMEM else {}
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **mem)
    out_spec = pl.BlockSpec((1, k1_n, cols), lambda i: (i, 0, 0), **mem)
    yr, yi = pl.pallas_call(
        functools.partial(_kernel),
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, rows, m2), lambda i: (i, 0, 0), **mem),
            const((k1_n, rows)),
            const((k1_n, rows)),
            const((k1_n, m2)),
            const((k1_n, m2)),
            const((m2, cols)),
            const((m2, cols)),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            _sds((r, k1_n, cols), jnp.float32, a),
            _sds((r, k1_n, cols), jnp.float32, a),
        ],
        interpret=interpret,
    )(a, f1r, f1i, twr, twi, f2r, f2i)
    k = k1_n * cols
    return yr.reshape(*batch, k), yi.reshape(*batch, k)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_fft_real_half(x: jax.Array, n: int,
                         interpret: bool = False):
    """Drop-in for ``engine.rfft.fft_real(x, n, half=True)`` on TPU.

    ``x``: float32 ``[..., L]`` with L <= n.  Returns ``(re, im)`` each
    ``[..., half_bins(n)]`` in the permuted half-spectrum layout.
    """
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    length = x.shape[-1]
    rows = min(m1, -(-length // m2))
    if length < rows * m2:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, rows * m2 - length)]
        x = jnp.pad(x, pad)
    elif length > rows * m2:
        raise ValueError(f"signal length {length} exceeds {rows}x{m2}")
    batch = x.shape[:-1]
    r = int(np.prod(batch)) if batch else 1
    a = x.reshape(r, rows, m2)  # contiguous: free

    f1r = np.ascontiguousarray(plan.f1_re[:, :rows])  # [M1, rows]
    f1i = np.ascontiguousarray(plan.f1_im[:, :rows])
    f2r = np.ascontiguousarray(plan.f2_re[:, :cols])  # [M2, cols]
    f2i = np.ascontiguousarray(plan.f2_im[:, :cols])

    mem = {"memory_space": _VMEM} if _VMEM else {}
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **mem)
    out_spec = pl.BlockSpec((1, m1, cols), lambda i: (i, 0, 0), **mem)
    yr, yi = pl.pallas_call(
        _kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, rows, m2), lambda i: (i, 0, 0), **mem),
            const((m1, rows)),
            const((m1, rows)),
            const((m1, m2)),
            const((m1, m2)),
            const((m2, cols)),
            const((m2, cols)),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((r, m1, cols), jnp.float32),
            jax.ShapeDtypeStruct((r, m1, cols), jnp.float32),
        ],
        interpret=interpret,
    )(a, f1r, f1i, plan.tw_re, plan.tw_im, f2r, f2i)
    k = m1 * cols
    return yr.reshape(*batch, k), yi.reshape(*batch, k)
