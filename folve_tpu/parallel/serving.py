"""Multi-chip sharded serving — mesh, shardings, collectives.

The reference's only scale-out is "multiple cores via parallel file
accesses" (README.md:362-364).  The TPU-native equivalent is a 2D device
mesh:

* ``stream`` axis — data parallelism over the batch of open streams.
  The workload has no cross-stream coupling, so this axis needs no
  collectives; it rides pure SPMD.
* ``freq`` axis — tensor/sequence parallelism *within* a stream over
  frequency bins.  The matmul-FFT's permuted layout [k1, k2] is sharded
  by k1 rows: the forward transform computes only local rows (no
  communication), the frequency-domain MAC is elementwise in bins (no
  communication), and only the inverse transform's second stage — a
  contraction over k1 — needs a single ``psum`` over the ``freq`` axis.
  This also shards the FDL state and the filter spectra across HBMs,
  which is what lets very long IRs and deep FDLs scale.

Built with ``shard_map`` so the collective placement is explicit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from folve_tpu.engine.rfft import get_plan
from folve_tpu.engine.stream import StreamState

_PRECISION = lax.Precision.HIGHEST


def make_serving_mesh(
    n_devices: Optional[int] = None, freq_parallel: int = 1
) -> Mesh:
    """Devices factored into (stream, freq) axes."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    if n % freq_parallel:
        raise ValueError(f"{n} devices not divisible by freq_parallel={freq_parallel}")
    grid = devices.reshape(n // freq_parallel, freq_parallel)
    return Mesh(grid, axis_names=("stream", "freq"))


def _local_fft_rows(x, n, k1_n, freq_idx):
    """Forward DFT computing only this shard's k1 rows.

    ``x``: [..., L<=n] real.  Returns (re, im) of shape [..., k1_n * M2].
    """
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    if x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    a = x.reshape(*x.shape[:-1], m1, m2)
    start = freq_idx * k1_n
    f1r = lax.dynamic_slice_in_dim(jnp.asarray(plan.f1_re), start, k1_n, axis=0)
    f1i = lax.dynamic_slice_in_dim(jnp.asarray(plan.f1_im), start, k1_n, axis=0)
    twr = lax.dynamic_slice_in_dim(jnp.asarray(plan.tw_re), start, k1_n, axis=0)
    twi = lax.dynamic_slice_in_dim(jnp.asarray(plan.tw_im), start, k1_n, axis=0)
    s1r = jnp.einsum("kn,...nm->...km", f1r, a, precision=_PRECISION)
    s1i = jnp.einsum("kn,...nm->...km", f1i, a, precision=_PRECISION)
    t_r = s1r * twr - s1i * twi
    t_i = s1r * twi + s1i * twr
    xr = (
        jnp.einsum("...km,ml->...kl", t_r, plan.f2_re, precision=_PRECISION)
        - jnp.einsum("...km,ml->...kl", t_i, plan.f2_im, precision=_PRECISION)
    )
    xi = (
        jnp.einsum("...km,ml->...kl", t_r, plan.f2_im, precision=_PRECISION)
        + jnp.einsum("...km,ml->...kl", t_i, plan.f2_re, precision=_PRECISION)
    )
    batch = x.shape[:-1]
    return xr.reshape(*batch, k1_n * m2), xi.reshape(*batch, k1_n * m2)


def _local_ifft_psum(xr, xi, n, k1_n, freq_idx, axis_name):
    """Inverse DFT from k1-sharded rows; one psum over ``axis_name``."""
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    ar = xr.reshape(*xr.shape[:-1], k1_n, m2)
    ai = xi.reshape(*xi.shape[:-1], k1_n, m2)
    start = freq_idx * k1_n
    twr = lax.dynamic_slice_in_dim(jnp.asarray(plan.tw_re), start, k1_n, axis=0)
    twi = lax.dynamic_slice_in_dim(jnp.asarray(plan.tw_im), start, k1_n, axis=0)
    # F1 columns for our k1 rows.
    f1r = lax.dynamic_slice_in_dim(jnp.asarray(plan.f1_re), start, k1_n, axis=1)
    f1i = lax.dynamic_slice_in_dim(jnp.asarray(plan.f1_im), start, k1_n, axis=1)
    # Stage 1: contract k2 (local).
    ur = (
        jnp.einsum("...kl,ml->...km", ar, plan.f2_re, precision=_PRECISION)
        + jnp.einsum("...kl,ml->...km", ai, plan.f2_im, precision=_PRECISION)
    )
    ui = (
        -jnp.einsum("...kl,ml->...km", ar, plan.f2_im, precision=_PRECISION)
        + jnp.einsum("...kl,ml->...km", ai, plan.f2_re, precision=_PRECISION)
    )
    vr = ur * twr + ui * twi
    vi = -ur * twi + ui * twr
    # Stage 2: contraction over k1 is split across the freq axis -> psum.
    partial_out = (
        jnp.einsum("nk,...km->...nm", f1r, vr, precision=_PRECISION)
        + jnp.einsum("nk,...km->...nm", f1i, vi, precision=_PRECISION)
    )
    out = lax.psum(partial_out, axis_name)
    return (out / n).reshape(*xr.shape[:-1], n)


def _local_chunk_step(bank_spec, state, x, n_valid, *, fragm, k1_n, axis_name):
    """Per-shard step: local streams x local frequency rows."""
    freq_idx = lax.axis_index(axis_name)
    p = bank_spec.shape[0]
    b = fragm
    t = x.shape[0]
    n = 2 * b

    xr, xi = _local_fft_rows(x, n, k1_n, freq_idx)  # [T, Cin, Klocal]
    xall_re = jnp.concatenate([state.hist_re, xr], axis=0)
    xall_im = jnp.concatenate([state.hist_im, xi], axis=0)

    cout = bank_spec.shape[2]
    klocal = bank_spec.shape[4]

    # Static Python unroll over partitions; elementwise channel chains
    # for small channel counts (see engine.stream._fdl_mac — XLA lowers
    # the tiny contraction poorly on TPU), einsum for many channels or
    # on CPU (virtual-mesh tests) where einsum traces/compiles faster.
    from folve_tpu.engine.stream import _is_tpu_backend

    cin = bank_spec.shape[1]
    if cin * cout <= 16 and _is_tpu_backend():
        acc_r = [jnp.zeros((t, klocal), jnp.float32) for _ in range(cout)]
        acc_i = [jnp.zeros((t, klocal), jnp.float32) for _ in range(cout)]
        for pi in range(p):
            off = (p - 1) - pi
            for o in range(cout):
                for i in range(cin):
                    xr_ = xall_re[off : off + t, i]
                    xi_ = xall_im[off : off + t, i]
                    hr = bank_spec[pi, i, o, 0]
                    hi = bank_spec[pi, i, o, 1]
                    acc_r[o] = acc_r[o] + (xr_ * hr - xi_ * hi)
                    acc_i[o] = acc_i[o] + (xr_ * hi + xi_ * hr)
        y_re = jnp.stack(acc_r, axis=1)
        y_im = jnp.stack(acc_i, axis=1)
    else:
        y_re = jnp.zeros((t, cout, klocal), dtype=jnp.float32)
        y_im = jnp.zeros((t, cout, klocal), dtype=jnp.float32)
        for pi in range(p):
            off = (p - 1) - pi
            xr_ = xall_re[off : off + t]
            xi_ = xall_im[off : off + t]
            hr, hi = bank_spec[pi, :, :, 0], bank_spec[pi, :, :, 1]
            rr = jnp.einsum("tik,iok->tok", xr_, hr, precision=_PRECISION)
            ii = jnp.einsum("tik,iok->tok", xi_, hi, precision=_PRECISION)
            ri = jnp.einsum("tik,iok->tok", xr_, hi, precision=_PRECISION)
            ir = jnp.einsum("tik,iok->tok", xi_, hr, precision=_PRECISION)
            y_re = y_re + (rr - ii)
            y_im = y_im + (ri + ir)

    y2 = _local_ifft_psum(y_re, y_im, n, k1_n, freq_idx, axis_name)  # [T, Cout, 2B]
    heads, tails = y2[:, :, :b], y2[:, :, b:]
    carry_in = jnp.concatenate([state.tail[None], tails[:-1]], axis=0)
    y = heads + carry_in

    frame_idx = lax.broadcasted_iota(jnp.int32, (t, 1, b), 0) * b + lax.broadcasted_iota(
        jnp.int32, (t, 1, b), 2
    )
    valid = frame_idx < n_valid
    max_abs = jnp.maximum(state.max_abs, jnp.max(jnp.where(valid, jnp.abs(y), 0.0)))

    if p > 1:
        new_re, new_im = xall_re[t:], xall_im[t:]
    else:
        new_re, new_im = state.hist_re, state.hist_im
    return (
        StreamState(hist_re=new_re, hist_im=new_im, tail=tails[-1], max_abs=max_abs),
        y,
    )


def make_sharded_serving_step(mesh: Mesh, fragm: int):
    """Build the jitted multi-chip serving step for one block length.

    Inputs (global shapes):
      ``h_spec``  [S, P, Cin, Cout, 2, K]  — per-stream filter spectra
      ``states``  StreamState batched over S
      ``x``       [S, T, Cin, fragm]
      ``n_valid`` [S] int32
    Streams shard over the ``stream`` axis; the K bin axis shards over
    ``freq`` (k1-row blocks of the permuted FFT layout).
    """
    n = 2 * fragm
    plan = get_plan(n)
    freq_size = mesh.shape["freq"]
    if plan.m1 % freq_size:
        raise ValueError(f"M1={plan.m1} not divisible by freq={freq_size}")
    k1_n = plan.m1 // freq_size

    spec_h = P("stream", None, None, None, None, "freq")
    spec_hist = P("stream", None, None, "freq")
    spec_tail = P("stream", None, None)
    spec_scalar = P("stream")
    spec_x = P("stream", None, None, None)
    spec_y = P("stream", None, None, None)

    def step(h_spec, hist_re, hist_im, tail, max_abs, x, n_valid):
        def local(h_spec, hist_re, hist_im, tail, max_abs, x, n_valid):
            def one(hs, hre, him, ta, ma, xx, nv):
                st = StreamState(hist_re=hre, hist_im=him, tail=ta, max_abs=ma)
                st2, y = _local_chunk_step(
                    hs, st, xx, nv, fragm=fragm, k1_n=k1_n, axis_name="freq"
                )
                return st2.hist_re, st2.hist_im, st2.tail, st2.max_abs, y

            return jax.vmap(one)(h_spec, hist_re, hist_im, tail, max_abs, x, n_valid)

        return _shard_map(
            local,
            mesh=mesh,
            in_specs=(
                spec_h, spec_hist, spec_hist, spec_tail, spec_scalar,
                spec_x, spec_scalar,
            ),
            out_specs=(spec_hist, spec_hist, spec_tail, spec_scalar, spec_y),
            # The loop carry starts from constant zeros (unvarying) and
            # becomes shard-varying after the first MAC; skip the
            # varying-manual-axes check rather than pcast-ing the seed.
            check_vma=False,
        )(h_spec, hist_re, hist_im, tail, max_abs, x, n_valid)

    return jax.jit(step)


def shard_states_and_bank(mesh: Mesh, h_spec, hist_re, hist_im, tail, max_abs, x, n_valid):
    """Place global arrays with the serving shardings (helper for callers
    that build inputs on host)."""
    put = lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec))
    return (
        put(h_spec, P("stream", None, None, None, None, "freq")),
        put(hist_re, P("stream", None, None, "freq")),
        put(hist_im, P("stream", None, None, "freq")),
        put(tail, P("stream", None, None)),
        put(max_abs, P("stream")),
        put(x, P("stream", None, None, None)),
        put(n_valid, P("stream")),
    )
