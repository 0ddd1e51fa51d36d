"""Pallas TPU kernel for the frequency-delay-line MAC.

The FDL MAC is the engine's hot loop: Y[t] = sum_p H[p] * X[t+P-1-p]
over re/im planes, elementwise in frequency bins.  The XLA elementwise
formulation re-materializes the accumulators in HBM for every partition
(~16 round trips of the [T, Cout, K] buffers); this kernel keeps the
whole accumulation in VMEM and streams each frequency tile exactly once:

  grid over K tiles -> load H[P, Cin, Cout, 2, KT] and the windowed
  spectra X[T+P-1, Cin, 2, KT] into VMEM, unroll partitions and channel
  pairs as fused multiply-adds on the VPU, write Y tiles once.

Batching over streams composes via jax.vmap of the pallas_call (adds a
grid dimension; the shared filter broadcasts without copies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

from folve_tpu.engine.kernels.common import VMEM as _VMEM, promote_vma, sds as _sds

# VMEM budget for one grid step's blocks (H + X + Y tiles); the actual
# tile width adapts so MAXSIZE filters (P=128, zita-config.h:61) fit.
_VMEM_BUDGET = 6 * 1024 * 1024
_MAX_KT = 2048
_MIN_KT = 128


def _fits(p, cin, cout, t, kt):
    h_bytes = p * cin * cout * 2 * kt * 4
    x_bytes = (t + p - 1) * cin * 2 * kt * 4
    y_bytes = 2 * t * cout * kt * 4
    return h_bytes + x_bytes + y_bytes <= _VMEM_BUDGET


def _pick_tile(p: int, cin: int, cout: int, t: int, k: int) -> int:
    """Largest divisor of k within [_MIN_KT, _MAX_KT] that fits the VMEM
    budget (k is a power of two for full-spectrum banks, m1*(m2/2+1)
    for half-spectrum ones).  Mosaic requires the lane (last) block dim
    to be a multiple of 128 unless it equals the full array dim."""
    divisors = sorted(
        (
            d
            for d in range(1, k + 1)
            if k % d == 0 and d <= _MAX_KT and (d % 128 == 0 or d == k)
        ),
        reverse=True,
    )
    for d in divisors:
        if d <= _MIN_KT or _fits(p, cin, cout, t, d):
            return d
    return divisors[-1] if divisors else k


# Above this partition count the kernel loops with lax.fori_loop instead
# of a Python unroll — a P=128 (MAXSIZE) unroll took minutes to compile.
_UNROLL_LIMIT = 32


def pallas_mac_supported(p: int, cin: int, cout: int, t: int, k: int) -> bool:
    """True when a VMEM-fitting lane-legal tile exists for these shapes.

    Freq-sharded half-layout bin counts like (M1/N)*65 have no
    multiple-of-128 divisor, so the only legal tile is the full width —
    which for deep FDLs (MAXSIZE P=128) would not fit VMEM.  Callers
    route such shapes to the XLA MAC instead."""
    kt = _pick_tile(p, cin, cout, t, k)
    return k % kt == 0 and _fits(p, cin, cout, t, kt)


def _kernel(h_ref, xr_ref, xi_ref, yr_ref, yi_ref, *, p, cin, cout, t):
    acc_shape = yr_ref.shape[0:1] + yr_ref.shape[2:]
    for o in range(cout):
        if p <= _UNROLL_LIMIT:
            acc_r = jnp.zeros(acc_shape, jnp.float32)
            acc_i = jnp.zeros_like(acc_r)
            for pi in range(p):
                off = (p - 1) - pi
                for i in range(cin):
                    xr = xr_ref[pl.ds(off, t), i, :]
                    xi = xi_ref[pl.ds(off, t), i, :]
                    hr = h_ref[pi, i, o, 0, :]
                    hi = h_ref[pi, i, o, 1, :]
                    acc_r = acc_r + (xr * hr - xi * hi)
                    acc_i = acc_i + (xr * hi + xi * hr)
        else:
            def body(pi, acc):
                acc_r, acc_i = acc
                off = (p - 1) - pi
                for i in range(cin):
                    xr = xr_ref[pl.ds(off, t), i, :]
                    xi = xi_ref[pl.ds(off, t), i, :]
                    hr = h_ref[pi, i, o, 0, :]
                    hi = h_ref[pi, i, o, 1, :]
                    acc_r = acc_r + (xr * hr - xi * hi)
                    acc_i = acc_i + (xr * hi + xi * hr)
                return acc_r, acc_i

            acc_r, acc_i = jax.lax.fori_loop(
                0,
                p,
                body,
                (jnp.zeros(acc_shape, jnp.float32), jnp.zeros(acc_shape, jnp.float32)),
            )
        yr_ref[:, o, :] = acc_r
        yi_ref[:, o, :] = acc_i


def _split_kernel(h_ref, hr_re, hr_im, xr_re, xr_im, yr_ref, yi_ref,
                  *, p, cin, cout, t):
    """Two-input variant: the FDL history and the new block spectra stay
    SEPARATE buffers — the caller never materializes the concatenated
    [T+P-1] window (one full extra HBM write per step in the fused
    variant below).  Partition ``pi`` contributes
      Y[tt] += H[pi] * X[tt + (P-1) - pi]
    where window row w = tt + (P-1) - pi reads hist for w < P-1 and the
    new spectra for w >= P-1; the boundary splits the T output rows at
    ``split = min(pi, t)``.  For pi < T the two strips have static
    shapes and unroll; for pi >= T every output row reads hist (one
    uniform full-T strip at dynamic offset), so the long tail of a
    MAXSIZE filter runs as a ``fori_loop`` — no compile-time blowup and
    still no window concat."""
    yr_ref[...] = jnp.zeros_like(yr_ref)
    yi_ref[...] = jnp.zeros_like(yi_ref)
    for pi in range(min(p, t)):  # static boundary region
        off = (p - 1) - pi
        split = pi
        for o in range(cout):
            for i in range(cin):
                hr = h_ref[pi, i, o, 0, :]
                hi = h_ref[pi, i, o, 1, :]
                if split > 0:
                    # Output rows [0, split) read hist rows [off, P-1).
                    n = split
                    xr = hr_re[pl.ds(off, n), i, :]
                    xi = hr_im[pl.ds(off, n), i, :]
                    yr_ref[pl.ds(0, n), o, :] += xr * hr - xi * hi
                    yi_ref[pl.ds(0, n), o, :] += xr * hi + xi * hr
                # Output rows [split, T) read new rows [0, T-split).
                n = t - split
                xr = xr_re[pl.ds(0, n), i, :]
                xi = xr_im[pl.ds(0, n), i, :]
                yr_ref[pl.ds(split, n), o, :] += xr * hr - xi * hi
                yi_ref[pl.ds(split, n), o, :] += xr * hi + xi * hr

    if p > t:
        def body(pi, _):
            off = (p - 1) - pi
            for o in range(cout):
                for i in range(cin):
                    hr = h_ref[pi, i, o, 0, :]
                    hi = h_ref[pi, i, o, 1, :]
                    xr = hr_re[pl.ds(off, t), i, :]
                    xi = hr_im[pl.ds(off, t), i, :]
                    yr_ref[:, o, :] += xr * hr - xi * hi
                    yi_ref[:, o, :] += xr * hi + xi * hr
            return 0

        jax.lax.fori_loop(t, p, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_fdl_mac_split(
    h_spec: jax.Array,
    hist_re: jax.Array,
    hist_im: jax.Array,
    xr: jax.Array,
    xi: jax.Array,
    interpret: bool = False,
):
    """FDL MAC over (history, new-spectra) pairs without concatenation.

    ``h_spec``: [P, Cin, Cout, 2, K]; ``hist_re``/``hist_im``:
    [P-1, Cin, K]; ``xr``/``xi``: [T, Cin, K].  Returns (yr, yi) each
    [T, Cout, K].  The unrolled boundary region is min(P, T) partitions
    (caller gates on that staying <= _UNROLL_LIMIT); partitions beyond T
    loop with ``fori``.
    """
    p, cin, cout, _, k = h_spec.shape
    t = xr.shape[0]
    h_spec, hist_re, hist_im, xr, xi = promote_vma(
        h_spec, hist_re, hist_im, xr, xi
    )
    kt = _pick_tile(p, cin, cout, t, k)
    assert k % kt == 0
    grid = (k // kt,)
    kernel = functools.partial(_split_kernel, p=p, cin=cin, cout=cout, t=t)
    mem = {"memory_space": _VMEM} if _VMEM else {}
    hist_spec = pl.BlockSpec((p - 1, cin, kt), lambda j: (0, 0, j), **mem)
    x_spec = pl.BlockSpec((t, cin, kt), lambda j: (0, 0, j), **mem)
    in_specs = [
        pl.BlockSpec((p, cin, cout, 2, kt), lambda j: (0, 0, 0, 0, j), **mem),
        hist_spec,
        hist_spec,
        x_spec,
        x_spec,
    ]
    out_specs = [
        pl.BlockSpec((t, cout, kt), lambda j: (0, 0, j), **mem) for _ in range(2)
    ]
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            _sds((t, cout, k), jnp.float32, xr),
            _sds((t, cout, k), jnp.float32, xr),
        ],
        interpret=interpret,
    )(h_spec, hist_re, hist_im, xr, xi)
    return yr, yi


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def pallas_fdl_mac(
    h_spec: jax.Array,
    xall_re: jax.Array,
    xall_im: jax.Array,
    t: int,
    interpret: bool = False,
):
    """Drop-in for engine.stream._fdl_mac.

    ``h_spec``: [P, Cin, Cout, 2, K]; ``xall_re``/``xall_im``:
    [T+P-1, Cin, K].  Returns (yr, yi) each [T, Cout, K].
    """
    p, cin, cout, _, k = h_spec.shape
    h_spec, xall_re, xall_im = promote_vma(h_spec, xall_re, xall_im)
    kt = _pick_tile(p, cin, cout, t, k)
    assert k % kt == 0
    grid = (k // kt,)
    kernel = functools.partial(_kernel, p=p, cin=cin, cout=cout, t=t)
    mem = {"memory_space": _VMEM} if _VMEM else {}
    x_spec = pl.BlockSpec((t + p - 1, cin, kt), lambda j: (0, 0, j), **mem)
    in_specs = [
        pl.BlockSpec((p, cin, cout, 2, kt), lambda j: (0, 0, 0, 0, j), **mem),
        x_spec,
        x_spec,
    ]
    out_specs = [
        pl.BlockSpec((t, cout, kt), lambda j: (0, 0, j), **mem) for _ in range(2)
    ]
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            _sds((t, cout, k), jnp.float32, xall_re),
            _sds((t, cout, k), jnp.float32, xall_re),
        ],
        interpret=interpret,
    )(h_spec, xall_re, xall_im)
    return yr, yi
