"""EXPERIMENTAL — DO NOT USE IN PRODUCTION: fully-fused chunk kernel.

STATUS (round 1): compiles for production shapes but CRASHES the TPU
worker at runtime (suspects: input_output_aliases combined with manual
ANY-space DMA, or the bare SemaphoreType.DMA scratch; try DMA(()) and
dropping the alias first).  Nothing imports this module; it preserves
the design + the Mosaic constraints learned:
  * vector reshape cannot split/merge a non-128 lane dim
    ([128,65]<->[8320] rejected) — keep spectra 2-D,
  * DMA slices need a 128-aligned (or full) lane dim — store ring
    spectra transposed [cols, M1] so lanes are 128,
  * dot_general dimension numbers express both transposed products
    without materializing transposes.

Fully-fused convolution chunk kernel.

One pallas grid step processes one stream's whole T-block chunk with
every intermediate in VMEM: per block — forward matmul-FFT (half
spectrum), push into a VMEM frequency-delay-line ring, partition MAC,
conjugate-multiplicity-weighted inverse, overlap-add — so HBM traffic
collapses to: PCM in, filter + ring state once per stream, PCM out.  On
the bandwidth-limited dev chip (DEVNOTES.md) that bound is ~3x below
the stage-by-stage pipeline's.

The FDL ring lives in HBM between calls and is DMA'd to/from a VMEM
scratch once per stream (it doesn't fit VMEM alongside H with block
double-buffering).

Scope (v1): T % P == 0 (ring phase stays aligned across calls),
n_valid == T*fragm, channel counts <= 4x4, half-layout banks.  The
canonical `chunk_step` remains the general path.
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
    _ANY = pltpu.ANY
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _ANY = None

from folve_tpu.engine.filter_bank import FilterBank
from folve_tpu.engine.rfft import _half_weights, get_plan, half_bins

_PRECISION = lax.Precision.HIGHEST


def _dg00(a, b):
    """Contract dim0 of a with dim0 of b -> [a.dim1, b.dim1]."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())), precision=_PRECISION)


def _dg01(a, b):
    """Contract dim0 of a with dim1 of b -> [a.dim1 x ...]? (see use)."""
    return lax.dot_general(a, b, (((0,), (1,)), ((), ())), precision=_PRECISION)


def _kernel(h_ref, x_ref, ring_in_ref, tail_in_ref,
            f1r_ref, f1i_ref, twr_ref, twi_ref, f2r_ref, f2i_ref,
            f2rt_ref, f2it_ref, w_ref,
            ring_out_ref, tail_out_ref, y_ref,
            ring, sem_in, sem_out,
            *, p, cin, cout, t, b, m1, m2, cols, rows_in):
    s_idx = pl.program_id(0)
    # Bring this stream's FDL ring into VMEM.
    load = pltpu.make_async_copy(ring_in_ref.at[s_idx], ring, sem_in)
    load.start()

    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]      # [m2, cols] (forward)
    f2rt, f2it = f2rt_ref[...], f2it_ref[...]  # [cols, m2] (inverse)
    w = w_ref[...]  # [cols, m1] (transposed like the spectra)
    f1r_in = f1r[:, :rows_in]
    f1i_in = f1i[:, :rows_in]

    tail = [tail_in_ref[0, o, :] for o in range(cout)]
    load.wait()

    for tt in range(t):
        slot = tt % p
        spec_r, spec_i = [], []
        # ---- forward FFT of each input channel (half spectrum) -------
        for i in range(cin):
            a = x_ref[0, tt, i, :].reshape(rows_in, m2)
            s1r = jnp.dot(f1r_in, a, precision=_PRECISION)  # [m1, m2]
            s1i = jnp.dot(f1i_in, a, precision=_PRECISION)
            t_r = s1r * twr - s1i * twi
            t_i = s1r * twi + s1i * twr
            # Spectra are stored TRANSPOSED [cols, m1] so the last dim
            # is 128-lane aligned for state DMA; dot_general dimension
            # numbers avoid materializing any transpose.
            xr = _dg01(f2r, t_r) - _dg01(f2i, t_i)  # [cols, m1]
            xi = _dg01(f2i, t_r) + _dg01(f2r, t_i)
            spec_r.append(xr)
            spec_i.append(xi)
            ring[slot, i, 0] = xr
            ring[slot, i, 1] = xi

        # ---- FDL MAC + inverse per output channel --------------------
        for o in range(cout):
            acc_r = jnp.zeros((cols, m1), jnp.float32)
            acc_i = jnp.zeros((cols, m1), jnp.float32)
            for pi in range(p):
                sp = (slot - pi) % p
                for i in range(cin):
                    if pi == 0:
                        xr, xi = spec_r[i], spec_i[i]
                    else:
                        xr = ring[sp, i, 0]
                        xi = ring[sp, i, 1]
                    hr = h_ref[pi, i, o, 0]
                    hi = h_ref[pi, i, o, 1]
                    acc_r = acc_r + (xr * hr - xi * hi)
                    acc_i = acc_i + (xr * hi + xi * hr)
            ar = acc_r * w  # [cols, m1], w transposed likewise
            ai = acc_i * w
            ur = _dg00(ar, f2rt) + _dg00(ai, f2it)  # [m1, m2]
            ui = -_dg00(ar, f2it) + _dg00(ai, f2rt)
            vr = ur * twr + ui * twi
            vi = -ur * twi + ui * twr
            out = (
                jnp.dot(f1r, vr, precision=_PRECISION)
                + jnp.dot(f1i, vi, precision=_PRECISION)
            ) * (1.0 / (m1 * m2))
            y2 = out.reshape(2 * b)
            y_ref[0, tt, o, :] = y2[:b] + tail[o]
            tail[o] = y2[b:]

    for o in range(cout):
        tail_out_ref[0, o, :] = tail[o]
    store = pltpu.make_async_copy(ring, ring_out_ref.at[s_idx], sem_out)
    store.start()
    store.wait()


@functools.partial(jax.jit, static_argnames=("t",))
def fused_chunk(bank: FilterBank, ring, tail, x, t: int):
    """Run T blocks for S streams with the fused kernel.

    ``ring``: [S, P, Cin, 2, cols, M1] FDL in ring layout — slot g%P
    holds the (transposed, lane-aligned) half spectrum of global block
    g; T % P == 0 keeps the phase aligned across calls.  Opaque to
    callers: create with init_ring_state.  ``tail``: [S, Cout, B].
    ``x``: [S, T, Cin, B].  Returns (ring', tail', y [S, T, Cout, B]).
    """
    p, cin, cout, _, kh = bank.h_spec.shape
    b = bank.fragm
    n = 2 * b
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    assert kh == half_bins(n), "fused_chunk requires half-layout banks"
    assert t % p == 0 or p == 1, "v1 requires T % P == 0"
    cols = m2 // 2 + 1
    rows_in = -(-b // m2)
    s = x.shape[0]
    mem = {"memory_space": _VMEM} if _VMEM else {}

    kernel = functools.partial(
        _kernel, p=p, cin=cin, cout=cout, t=t, b=b,
        m1=m1, m2=m2, cols=cols, rows_in=rows_in,
    )

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda s_: (0,) * nd, **mem)

    out = pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            const((p, cin, cout, 2, cols, m1)),
            pl.BlockSpec((1, t, cin, b), lambda s_: (s_, 0, 0, 0), **mem),
            pl.BlockSpec(memory_space=_ANY),  # ring stays in HBM
            pl.BlockSpec((1, cout, b), lambda s_: (s_, 0, 0), **mem),
            const((m1, m1)),
            const((m1, m1)),
            const((m1, m2)),
            const((m1, m2)),
            const((m2, cols)),
            const((m2, cols)),
            const((cols, m2)),
            const((cols, m2)),
            const((cols, m1)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=_ANY),
            pl.BlockSpec((1, cout, b), lambda s_: (s_, 0, 0), **mem),
            pl.BlockSpec((1, t, cout, b), lambda s_: (s_, 0, 0, 0), **mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, p, cin, 2, cols, m1), jnp.float32),
            jax.ShapeDtypeStruct(tail.shape, jnp.float32),
            jax.ShapeDtypeStruct((s, t, cout, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, cin, 2, cols, m1), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.swapaxes(bank.h_spec.reshape(p, cin, cout, 2, m1, cols), -1, -2),
        x,
        ring,
        tail,
        jnp.asarray(plan.f1_re),
        jnp.asarray(plan.f1_im),
        jnp.asarray(plan.tw_re),
        jnp.asarray(plan.tw_im),
        jnp.asarray(plan.f2_re[:, :cols]),
        jnp.asarray(plan.f2_im[:, :cols]),
        jnp.asarray(np_ascontig(plan.f2_re[:, :cols].T)),
        jnp.asarray(np_ascontig(plan.f2_im[:, :cols].T)),
        jnp.asarray(np_ascontig(_half_weights(n).T)),
    )
    return out[0], out[1], out[2]


def np_ascontig(a):
    import numpy as np

    return np.ascontiguousarray(a)


def init_ring_state(bank: FilterBank, s: int):
    """Zero FDL ring + tail for ``s`` streams."""
    p, cin, cout, _, kh = bank.h_spec.shape
    plan = get_plan(2 * bank.fragm)
    cols = plan.m2 // 2 + 1
    ring = jnp.zeros((s, p, cin, 2, cols, plan.m1), jnp.float32)
    tail = jnp.zeros((s, cout, bank.fragm), jnp.float32)
    return ring, tail
