"""Shared Pallas kernel plumbing (VMEM handles, shard_map vma helpers)."""

from __future__ import annotations

import jax

from jax import lax
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu

    VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    VMEM = None

PREC = lax.Precision.HIGHEST


def _vma(x) -> frozenset:
    try:
        return frozenset(getattr(jax.typeof(x), "vma", None) or ())
    except Exception:  # pragma: no cover - non-traced values
        return frozenset()


def sds(shape, dtype, *likes):
    """ShapeDtypeStruct carrying the UNION of the operands'
    varying-manual-axes sets — required for pallas_call outputs inside
    shard_map (check_vma); a plain struct elsewhere."""
    union = frozenset().union(*(_vma(a) for a in likes))
    if union:
        return jax.ShapeDtypeStruct(shape, dtype, vma=union)
    return jax.ShapeDtypeStruct(shape, dtype)


def promote_vma(*arrays):
    """Promote every array to the union of the group's varying axes
    (``lax.pvary``), so mixed-vma operands (e.g. stream-varying audio
    with freq-varying per-shard FFT factors) are legal pallas_call
    inputs under shard_map's vma checking.  No-op outside shard_map."""
    vmas = [_vma(a) for a in arrays]
    union = frozenset().union(*vmas)
    if not union:
        return arrays
    return tuple(
        a if v == union else lax.pvary(a, tuple(union - v))
        for a, v in zip(arrays, vmas)
    )


def const_spec(shape, memory_space=VMEM):
    """BlockSpec for a whole-array constant operand (same block every
    grid step)."""
    kw = {"memory_space": memory_space} if memory_space else {}
    return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape), **kw)
