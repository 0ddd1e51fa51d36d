"""Fused half-spectrum inverse FFT — both Cooley-Tukey stages in VMEM.

Measured on v5e (S=32 T=32, 131k-tap serving step): the XLA two-stage
inverse (`engine.rfft.ifft_from_half`) runs at ~3.2x its minimum HBM
traffic because the stage-1/stage-2 matmul intermediates spill to HBM
(XLA cannot fuse matmul->matmul chains).  This kernel keeps U/V in VMEM:
per (batch, k1-block) grid step it loads the [M1, cols] half-spectrum
rectangle, contracts k2 against conj(F2)^T on the MXU, applies the
conjugate twiddle, contracts k1 against conj(F1), and stores the real
output tile — each byte of Y read once, each output byte written once.

Layout trick that makes this work: the engine's flattened permuted bins
``[..., M1*cols]`` are row-major contiguous as ``[..., M1, cols]``, so
the reshape outside the kernel is free and the kernel reads natural
[sublane=M1-tile, lane=cols] blocks (cols=65 is allowed as a full-dim
lane count).  The output index n = M2*n1 + n2 means the [n1, n2] result
tile is likewise the flat output, contiguous.

The 1/N scale and the conjugate-multiplicity weights are folded into a
single per-bin constant (exact: weights are {1,2} and N a power of two).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax
from jax.experimental import pallas as pl

from folve_tpu.engine.rfft import _half_weights, get_plan

from jax.experimental.pallas import tpu as pltpu

from folve_tpu.engine.kernels.common import VMEM as _VMEM, promote_vma, sds as _sds

_PREC = lax.Precision.HIGHEST


def _kernel(yr_ref, yi_ref, wn_ref, f2tr_ref, f2ti_ref, twr_ref, twi_ref,
            f1r_ref, f1i_ref, out_ref):
    # Weighted half rectangle: [M1, cols].
    ar = yr_ref[0] * wn_ref[...]
    ai = yi_ref[0] * wn_ref[...]
    # Stage 1 (contract k2 over the stored cols): U = A @ conj(F2)^T.
    ur = (
        jax.lax.dot(ar, f2tr_ref[...], precision=_PREC)
        + jax.lax.dot(ai, f2ti_ref[...], precision=_PREC)
    )
    ui = (
        jax.lax.dot(ai, f2tr_ref[...], precision=_PREC)
        - jax.lax.dot(ar, f2ti_ref[...], precision=_PREC)
    )
    # Conjugate twiddle.
    vr = ur * twr_ref[...] + ui * twi_ref[...]
    vi = ui * twr_ref[...] - ur * twi_ref[...]
    # Stage 2 (contract k1): x[n1, n2] = Re(conj(F1) @ V).
    out_ref[0] = (
        jax.lax.dot(f1r_ref[...], vr, precision=_PREC)
        + jax.lax.dot(f1i_ref[...], vi, precision=_PREC)
    )


def _ola_kernel(yr_ref, yi_ref, tail_in_ref, wn_ref, f2tr_ref, f2ti_ref,
                twr_ref, twi_ref, f1r_ref, f1i_ref,
                y_ref, tail_out_ref, scratch, *, t_total):
    """Inverse + overlap-add fused: per (channel, t) grid step the real
    output tile [M1, M2] splits at row M1/2 into head/tail halves
    (flat index n = M2*n1 + n2, so the first half of the samples IS the
    first half of the rows); the head adds the previous block's tail,
    carried across the sequential t grid dim in VMEM scratch."""
    t_idx = pl.program_id(1)
    ar = yr_ref[0, 0] * wn_ref[...]
    ai = yi_ref[0, 0] * wn_ref[...]
    ur = (
        jax.lax.dot(ar, f2tr_ref[...], precision=_PREC)
        + jax.lax.dot(ai, f2ti_ref[...], precision=_PREC)
    )
    ui = (
        jax.lax.dot(ai, f2tr_ref[...], precision=_PREC)
        - jax.lax.dot(ar, f2ti_ref[...], precision=_PREC)
    )
    vr = ur * twr_ref[...] + ui * twi_ref[...]
    vi = ui * twr_ref[...] - ur * twi_ref[...]
    x = (
        jax.lax.dot(f1r_ref[...], vr, precision=_PREC)
        + jax.lax.dot(f1i_ref[...], vi, precision=_PREC)
    )
    m1 = x.shape[0]
    half_rows = m1 // 2

    @pl.when(t_idx == 0)
    def _():
        scratch[...] = tail_in_ref[0]

    y_ref[0, 0] = x[:half_rows] + scratch[...]
    scratch[...] = x[half_rows:]

    @pl.when(t_idx == t_total - 1)
    def _():
        tail_out_ref[0] = x[half_rows:]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_ifft_ola(yr: jax.Array, yi: jax.Array, tail: jax.Array, n: int,
                    interpret: bool = False):
    """Fused inverse + overlap-add for the engine's chunk step.

    ``yr``/``yi``: float32 ``[T, C, half_bins(n)]``; ``tail``: float32
    ``[C, n//2]`` — the previous chunk's overlap carry.  Returns
    ``(y, new_tail)`` with ``y`` ``[T, C, n//2]`` = the overlap-added
    audio blocks and ``new_tail`` ``[C, n//2]``.  Never materializes the
    length-``n`` intermediate (saves its HBM write + read).
    """
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    half_rows = m1 // 2
    t_total, c = yr.shape[0], yr.shape[1]
    a_r = yr.reshape(t_total, c, m1, cols)
    a_i = yi.reshape(t_total, c, m1, cols)
    tail3 = tail.reshape(c, half_rows, m2)

    wn = (_half_weights(n) / float(n)).astype(np.float32)
    f2tr = np.ascontiguousarray(plan.f2_re[:, :cols].T)
    f2ti = np.ascontiguousarray(plan.f2_im[:, :cols].T)

    mem = {"memory_space": _VMEM} if _VMEM else {}
    y_spec = pl.BlockSpec((1, 1, m1, cols), lambda o, t: (t, o, 0, 0), **mem)
    const = lambda shape: pl.BlockSpec(
        shape, lambda o, t: tuple(0 for _ in shape), **mem
    )
    kernel = functools.partial(_ola_kernel, t_total=t_total)
    kwargs = {}
    if pltpu is not None and not interpret:
        # The t grid dim carries state in scratch: forbid parallel
        # execution of grid steps (megacore splitting).
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        )
    y, new_tail = pl.pallas_call(
        kernel,
        grid=(c, t_total),
        in_specs=[
            y_spec,
            y_spec,
            pl.BlockSpec((1, half_rows, m2), lambda o, t: (o, 0, 0), **mem),
            const((m1, cols)),
            const((cols, m2)),
            const((cols, m2)),
            const((m1, m2)),
            const((m1, m2)),
            const((m1, m1)),
            const((m1, m1)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, half_rows, m2), lambda o, t: (t, o, 0, 0), **mem),
            pl.BlockSpec((1, half_rows, m2), lambda o, t: (o, 0, 0), **mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, c, half_rows, m2), jnp.float32),
            jax.ShapeDtypeStruct((c, half_rows, m2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((half_rows, m2), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(a_r, a_i, tail3, wn, f2tr, f2ti, plan.tw_re, plan.tw_im,
      plan.f1_re, plan.f1_im)
    b = n // 2
    return y.reshape(t_total, c, b), new_tail.reshape(c, b)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_ifft_partial_rows(yr: jax.Array, yi: jax.Array, n: int,
                             wn, f1r_cols, f1i_cols, twr, twi,
                             interpret: bool = False) -> jax.Array:
    """Freq-sharded variant: inverse from a k1-row window of the half
    rectangle, producing this shard's PARTIAL stage-2 sum (the caller
    psums over the freq axis and applies the overlap-add after).

    Shard-varying factors are inputs: ``wn`` ``[k1_n, cols]`` (the local
    multiplicity-weight rows, already scaled by 1/N), ``f1r_cols``/
    ``f1i_cols`` ``[M1, k1_n]`` (conj(F1)'s local k1 columns), ``twr``/
    ``twi`` ``[k1_n, M2]``.
    """
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    k1_n = wn.shape[0]
    batch = yr.shape[:-1]
    r = int(np.prod(batch)) if batch else 1
    a_r = yr.reshape(r, k1_n, cols)
    a_i = yi.reshape(r, k1_n, cols)
    f2tr = jnp.asarray(np.ascontiguousarray(plan.f2_re[:, :cols].T))
    f2ti = jnp.asarray(np.ascontiguousarray(plan.f2_im[:, :cols].T))
    # Unify mixed vma sets for pallas_call inside shard_map.
    a_r, a_i, wn, f2tr, f2ti, twr, twi, f1r_cols, f1i_cols = promote_vma(
        a_r, a_i, wn, f2tr, f2ti, twr, twi, f1r_cols, f1i_cols
    )

    mem = {"memory_space": _VMEM} if _VMEM else {}
    y_spec = pl.BlockSpec((1, k1_n, cols), lambda i: (i, 0, 0), **mem)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), **mem
    )
    out = pl.pallas_call(
        _kernel,
        grid=(r,),
        in_specs=[
            y_spec,
            y_spec,
            const((k1_n, cols)),
            const((cols, m2)),
            const((cols, m2)),
            const((k1_n, m2)),
            const((k1_n, m2)),
            const((m1, k1_n)),
            const((m1, k1_n)),
        ],
        out_specs=pl.BlockSpec((1, m1, m2), lambda i: (i, 0, 0), **mem),
        out_shape=_sds((r, m1, m2), jnp.float32, a_r),
        interpret=interpret,
    )(a_r, a_i, wn, f2tr, f2ti, twr, twi, f1r_cols, f1i_cols)
    return out.reshape(*batch, n)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_ifft_from_half(yr: jax.Array, yi: jax.Array, n: int,
                          interpret: bool = False) -> jax.Array:
    """Drop-in for :func:`engine.rfft.ifft_from_half` (TPU fast path).

    ``yr``/``yi``: float32 ``[..., half_bins(n)]`` permuted half-spectrum
    planes.  Returns float32 ``[..., n]``.
    """
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    batch = yr.shape[:-1]
    r = int(np.prod(batch)) if batch else 1
    a_r = yr.reshape(r, m1, cols)  # contiguous: free
    a_i = yi.reshape(r, m1, cols)

    # Per-bin constant: multiplicity weights * 1/N (exact for pow-2 N).
    wn = (_half_weights(n) / float(n)).astype(np.float32)
    f2tr = np.ascontiguousarray(plan.f2_re[:, :cols].T)  # [cols, M2]
    f2ti = np.ascontiguousarray(plan.f2_im[:, :cols].T)

    mem = {"memory_space": _VMEM} if _VMEM else {}
    y_spec = pl.BlockSpec((1, m1, cols), lambda i: (i, 0, 0), **mem)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **mem)
    out = pl.pallas_call(
        _kernel,
        grid=(r,),
        in_specs=[
            y_spec,
            y_spec,
            const((m1, cols)),
            const((cols, m2)),
            const((cols, m2)),
            const((m1, m2)),
            const((m1, m2)),
            const((m1, m1)),
            const((m1, m1)),
        ],
        out_specs=pl.BlockSpec((1, m1, m2), lambda i: (i, 0, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((r, m1, m2), jnp.float32),
        interpret=interpret,
    )(a_r, a_i, wn, f2tr, f2ti, plan.tw_re, plan.tw_im, plan.f1_re, plan.f1_im)
    # x index n = M2*n1 + n2 -> [n1, n2] row-major IS the flat output.
    return out.reshape(*batch, n)
