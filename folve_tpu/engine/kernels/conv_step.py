"""Fully-fused convolution step: forward FFT -> FDL MAC -> inverse+OLA
in ONE Pallas kernel.

Motivation (VERDICT r4): as three kernels (fft_half -> fdl_mac ->
ifft_half) every block spectrum round-trips HBM twice between stages —
at S=64 T=64 (headline serving shape) that is ~2.2 GB of the step's
~3 GB HBM traffic.  Fused, the only HBM traffic is: input blocks in,
output blocks out, the filter spectra once per stream, and the FDL
history once per chunk — ~3.4x less.

Design:

* Grid ``(S, T)`` — streams outer, blocks inner (t fastest).  The t
  dimension is SEQUENTIAL: two VMEM scratch carries live across it:
  - ``ring``: the last P-1 input-block spectra (the frequency-delay
    line).  Slot invariant: slot ``b mod (P-1)`` holds block ``b``'s
    spectrum; at t==0 it is loaded from the hist input (old block
    ``-p`` lands at slot ``P-1-p`` = its hist row index), and after
    each step the current block overwrites the oldest slot.
  - ``tail``: the overlap-add carry (same scheme as ifft_half's
    _ola_kernel).

* Transposed-tile spectrum layout.  A half-spectrum rectangle is
  canonically ``[m1, cols]`` with cols = m2/2+1; as a VMEM tile that
  pads lanes cols->128 (~2x waste), which the resident H + ring cannot
  afford.  All in-kernel spectra therefore live as ``[cols, m1]`` tiles
  (sublane pad 65->72, ~11%): the FFT stages become ``dot_general``
  contractions over the transposed operands, the MAC is elementwise in
  either layout, and ``h_perm`` is the filter spectra pre-permuted to
  the transposed flatten (``k' = m1*c + q``) outside the kernel.  Only
  the hist import/export transposes tiles (canonical StreamState layout
  is preserved exactly — states remain portable across engine paths).

* The clipping monitor (reference: sound-processor.cc:119-124) is
  folded in: the masked max|y| accumulates in VMEM scratch and is
  written once per stream, so the XLA max pass no longer re-reads the
  [S,T,Cout,B] output from HBM (~256 MB at the headline shape).

* FFT dot precision.  ``FFT_DOT_PASSES = 3`` runs each dot as a manual
  3-pass split (a_hi*b_hi + a_hi*b_lo + a_lo*b_hi with the constant DFT
  factors pre-split to bf16 hi/lo outside the kernel; Mosaic rejects
  lax.Precision.HIGH so the split is hand-rolled).  The dropped
  a_lo*b_lo term is ~2^-18 relative per dot; measured end-to-end SNR is
  -102 dB vs the HIGHEST time-domain oracle (budget -90; DEVNOTES r5).
  Set to 6 for full f32 (HIGHEST) dots (~17% slower, -110 dB).

Spec matched: uniform partitioned convolution, quantum = minpart =
maxpart = fragm (reference zita-fconfig.cc:74-94).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax
from jax.experimental import pallas as pl

from folve_tpu.engine.rfft import _half_weights, get_plan

try:  # pragma: no cover - absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from folve_tpu.engine.kernels.common import VMEM as _VMEM, sds as _sds

_PREC = lax.Precision.HIGHEST

# 3 = manual bf16x3 dots (~2^-18 rel error per dot); 6 = full f32 dots
# (Precision.HIGHEST, 6 bf16 passes).  Measured on chip at the headline
# shape (S=64 T=64, 131072-tap): 3-pass 24.1 ms/step vs 6-pass 28.3 —
# the kernel is not purely MXU-bound, so halving dot passes buys ~17%,
# and end-to-end SNR vs the HIGHEST time-domain oracle stays -102 dB
# (vs -110 for the split path; budget -90).  DEVNOTES round 5.
FFT_DOT_PASSES = 3

# VMEM budget for the resident set (H + ring + hist blocks + consts +
# working tiles), derived from the local chip generation: v4/v5-class
# cores have 128 MiB VMEM (the 16 MiB figure is the default *scoped*
# compiler limit, which the pallas_call raises via ``vmem_limit_bytes``),
# v2/v3 only 16 MiB.  The gate must be sized to the REAL hardware — a
# 128 MiB-sized budget on a v3 would claim fused support and then fail
# at Mosaic compile time instead of taking the split-kernel fallback.
# Budget = 3/8 of VMEM (headroom for double-buffering + temporaries);
# scoped limit = 3/4.
_VMEM_HW_BYTES: int | None = None


def _vmem_hw_bytes() -> int:
    global _VMEM_HW_BYTES
    if _VMEM_HW_BYTES is None:
        size = 128 * 1024 * 1024
        try:
            kind = jax.devices()[0].device_kind.lower()
            if "v2" in kind or "v3" in kind:
                size = 16 * 1024 * 1024
        except Exception:  # pragma: no cover - no backend at all
            pass
        _VMEM_HW_BYTES = size
    return _VMEM_HW_BYTES


def _vmem_budget() -> int:
    return _vmem_hw_bytes() * 3 // 8


def _vmem_limit_bytes() -> int:
    return _vmem_hw_bytes() * 3 // 4


def _pad_sub(rows: int) -> int:
    return -(-rows // 8) * 8


def _pad_lane(cols: int) -> int:
    return -(-cols // 128) * 128


def fused_supported(p: int, cin: int, cout: int, t: int, n: int) -> bool:
    """True when the fused kernel's resident set fits the VMEM budget.

    ``n`` = 2*fragm (the DFT size).  Shapes that do not fit (deep FDLs,
    very wide channel counts) stay on the split three-kernel path.
    """
    if p < 2 or cin * cout > 16 or t < 1:
        return False
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    if m1 % 2:
        return False
    tile_t = _pad_sub(cols) * m1 * 4       # transposed spectrum tile
    tile_c = m1 * _pad_lane(cols) * 4      # canonical (lane-padded) tile
    h_bytes = p * cin * cout * 2 * tile_t
    ring_bytes = (p - 1) * cin * 2 * tile_t
    hist_bytes = 2 * (p - 1) * cin * tile_c  # aliased in/out (re+im)
    x_bytes = 2 * cin * (m1 // 2) * m2 * 4   # double-buffered
    y_bytes = 2 * cout * (m1 // 2) * m2 * 4
    tail_bytes = 2 * cout * (m1 // 2) * m2 * 4
    consts = (2 * m1 * (m1 // 2) + 4 * m1 * m2 + 2 * m2 * _pad_lane(cols)
              + 3 * _pad_sub(cols) * m2 + 2 * m1 * m1) * 4
    # Working tiles live per channel during the FFT stages.
    work = 8 * m2 * m1 * 4 * max(cin, cout)
    total = (h_bytes + ring_bytes + hist_bytes + x_bytes
             + y_bytes + tail_bytes + consts + work)
    return total <= _vmem_budget()


def _stack_flags(m1: int) -> tuple[bool, bool, bool, bool]:
    """Per-stage stacked-dot flags (fwd1, fwd2, inv1, inv2) from the
    FOLVE_FUSED_STACK env ("all" or a comma list of f1,f2,i1,i2).
    Default: all off (measured slower on v5e, see the kernel docstring);
    f1/i2 require m1 % 128 == 0 for lane-aligned slices/concats."""
    spec = os.environ.get("FOLVE_FUSED_STACK", "")
    if not spec:
        return (False, False, False, False)
    names = {"f1", "f2", "i1", "i2"}
    on = names if spec.strip() == "all" else {
        s.strip() for s in spec.split(",")} & names
    aligned = m1 % 128 == 0
    return (
        "f1" in on and aligned,
        "f2" in on,
        "i1" in on,
        "i2" in on and aligned,
    )


def _bf16_split(m: np.ndarray):
    """Pre-split a constant factor matrix into bf16 (hi, lo) planes.
    hi + lo reproduces the f32 value to ~2^-18 relative (lo itself is
    bf16-rounded)."""
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.ascontiguousarray(hi), np.ascontiguousarray(lo)


def _mk_dot(three: bool):
    """Dot helpers: ``(prep, dotp)``.

    ``prep(x)`` pre-stages a runtime f32 operand (the bf16 hi/lo split in
    3-pass mode — done ONCE even when the operand feeds several dots);
    ``dotp(c, xp, dn, const_first)`` runs the dot against a (hi, lo)
    const-ref pair (lo is None in 6-pass mode).  ``const_first`` picks
    the operand order of the underlying dot_general."""

    if not three:
        def prep(x):
            return (x,)

        def dotp(c, xp, dn, const_first):
            cv = c[0][...]
            return (lax.dot_general(cv, xp[0], dn, precision=_PREC)
                    if const_first else
                    lax.dot_general(xp[0], cv, dn, precision=_PREC))
        return prep, dotp

    def prep(x):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        return xh, xl

    def dotp(c, xp, dn, const_first):
        ch, cl = c[0][...], c[1][...]
        xh, xl = xp
        f32 = jnp.float32
        if const_first:
            o = lax.dot_general(ch, xh, dn, preferred_element_type=f32)
            o = o + lax.dot_general(cl, xh, dn, preferred_element_type=f32)
            o = o + lax.dot_general(ch, xl, dn, preferred_element_type=f32)
        else:
            o = lax.dot_general(xh, ch, dn, preferred_element_type=f32)
            o = o + lax.dot_general(xh, cl, dn, preferred_element_type=f32)
            o = o + lax.dot_general(xl, ch, dn, preferred_element_type=f32)
        return o

    return prep, dotp


def _kernel(x_ref, hr_in, hi_in, tail_in, valid_ref, h_ref,
            twr_t, twi_t, wn_t, *rest,
            p, cin, cout, t_total, rows, three, stack, hist_t):
    """One (stream, block) grid step.  See module docstring.

    ``rest``: ``nd`` dot-constant hi refs [+ ``nd`` lo refs in 3-pass
    mode], then the 5 outputs, then the 3 scratch refs.  ``stack`` is a
    4-tuple of per-stage stacked-dot flags (fwd stage 1/2, inv stage
    1/2): a stacked stage's re/im constant pair is pre-concatenated so
    it runs half as many, twice-as-large MXU dots.  MEASURED SLOWER
    end-to-end on v5e as of 2026-08 (the all-on variant was ~10x
    slower — in-kernel concats/slices are not free in Mosaic), so all
    four default off; kept behind FOLVE_FUSED_STACK for re-evaluation
    on future toolchains.

    ``hist_t``: the hist rows are stored in the kernel's TRANSPOSED tile
    layout [cols, m1] (the steady-state carry), so ring import/export
    are plain copies; False = canonical [m1, cols] rows, transposed on
    the way in and out (2*(P-1)*Cin*2 in-kernel tile transposes per
    stream per step at the headline shape — the reason the carry path
    uses True).
    """
    f1, f2, i1, i2 = stack
    nd = (1 if f1 else 2) + 2 + (1 if i1 else 2) + (1 if i2 else 2)
    hi_refs = rest[:nd]
    lo_refs = rest[nd:2 * nd] if three else (None,) * nd
    consts = list(zip(hi_refs, lo_refs))
    it = iter(consts)
    if f1:
        f1s = next(it)
    else:
        f1r_u, f1i_u = next(it), next(it)
    c_f2a, c_f2b = next(it), next(it)  # stacked: (cr, ci); else (re, im)
    if i1:
        inv_uv = next(it)
    else:
        f2tr, f2ti = next(it), next(it)
    if i2:
        inv_c2 = next(it)
    else:
        if1r, if1i = next(it), next(it)
    y_ref, hr_out, hi_out, tail_out, max_ref = rest[-8:-3]
    ring, tail_scr, max_scr = rest[-3:]
    prep, dot = _mk_dot(three)
    m2_k, m1_k = twr_t.shape  # transposed twiddle: [m2, m1]

    t = pl.program_id(1)
    s_idx = pl.program_id(0)
    pm1 = p - 1

    # --- t == 0: import state ------------------------------------------
    @pl.when(t == 0)
    def _init():
        # Ring slots from hist rows; slot index == hist row index (see
        # invariant).  hist_t: rows are already transposed [cols, m1] —
        # plain copies; else canonical [m1, cols] rows transpose in.
        for h in range(pm1):
            for i in range(cin):
                if hist_t:
                    ring[h, i, 0] = hr_in[0, h, i]
                    ring[h, i, 1] = hi_in[0, h, i]
                else:
                    ring[h, i, 0] = jnp.transpose(hr_in[0, h, i])
                    ring[h, i, 1] = jnp.transpose(hi_in[0, h, i])
        tail_scr[...] = tail_in[0]
        max_scr[...] = jnp.zeros_like(max_scr)
        # T < P-1: hist rows that outlive the whole chunk move from old
        # row T+j to row j (pure canonical copy, same aliased buffer;
        # reads of row T+j precede the overwrite of row j since j < T+j).
        for j in range(max(0, pm1 - t_total)):
            for i in range(cin):
                hr_out[0, j, i] = hr_in[0, t_total + j, i]
                hi_out[0, j, i] = hi_in[0, t_total + j, i]

    # --- forward FFT of each input channel (transposed tiles) ----------
    a_all = x_ref[0, 0]  # [cin, rows, m2]
    tw_r = twr_t[...]
    tw_i = twi_t[...]
    dn = (((0,), (1,)), ((), ()))
    dn0 = (((0,), (0,)), ((), ()))
    cur = []
    for i in range(cin):
        ap = prep(a_all[i])  # [rows, m2] real
        if f1:
            # S1^T for re AND im in one dot: [m2, 2*m1], lane-split.
            s1 = dot(f1s, ap, dn, False)
            s1r, s1i = s1[:, :m1_k], s1[:, m1_k:]
        else:
            # S1^T [m2, m1] = contract rows: sum_r a[r, b] * F1u[q, r].
            s1r = dot(f1r_u, ap, dn, False)
            s1i = dot(f1i_u, ap, dn, False)
        # Twiddle (transposed tables).
        t_r = s1r * tw_r - s1i * tw_i
        t_i = s1r * tw_i + s1i * tw_r
        # Y^T [cols, m1] = contract m2: sum_b F2c[b, c] * T^T[b, q].
        if f2:
            # Contraction-stacked: [F2r; -F2i]·[t_r; t_i] folds the
            # complex sub/add into the MXU accumulate.
            tp = prep(jnp.concatenate([t_r, t_i], axis=0))
            yr = dot(c_f2a, tp, dn0, True)
            yi = dot(c_f2b, tp, dn0, True)
        else:
            tpr, tpi = prep(t_r), prep(t_i)
            yr = dot(c_f2a, tpr, dn0, True) - dot(c_f2b, tpi, dn0, True)
            yi = dot(c_f2b, tpr, dn0, True) + dot(c_f2a, tpi, dn0, True)
        cur.append((yr, yi))

    # --- FDL MAC (elementwise on [cols, m1] tiles) ----------------------
    acc_r = [None] * cout
    acc_i = [None] * cout
    for o in range(cout):
        for i in range(cin):
            xr, xi = cur[i]
            hr = h_ref[0, i, o, 0]
            hi = h_ref[0, i, o, 1]
            tr = xr * hr - xi * hi
            ti = xr * hi + xi * hr
            acc_r[o] = tr if acc_r[o] is None else acc_r[o] + tr
            acc_i[o] = ti if acc_i[o] is None else acc_i[o] + ti
    for pi in range(1, p):
        slot = lax.rem(t - pi + pm1, pm1)
        for i in range(cin):
            xr = ring[pl.ds(slot, 1), i, 0][0]
            xi = ring[pl.ds(slot, 1), i, 1][0]
            for o in range(cout):
                hr = h_ref[pi, i, o, 0]
                hi = h_ref[pi, i, o, 1]
                acc_r[o] += xr * hr - xi * hi
                acc_i[o] += xr * hi + xi * hr

    # --- ring update: current block replaces the oldest ----------------
    slot_w = lax.rem(t, pm1)
    for i in range(cin):
        ring[pl.ds(slot_w, 1), i, 0] = cur[i][0][None]
        ring[pl.ds(slot_w, 1), i, 1] = cur[i][1][None]

    # --- hist export: the last P-1 blocks' spectra, canonical layout ---
    first_exported = max(0, t_total - pm1)

    @pl.when(t >= first_exported)
    def _export():
        j = t - first_exported if t_total >= pm1 else t + (pm1 - t_total)
        for i in range(cin):
            if hist_t:
                hr_out[0, pl.ds(j, 1), i] = cur[i][0][None]
                hi_out[0, pl.ds(j, 1), i] = cur[i][1][None]
            else:
                hr_out[0, pl.ds(j, 1), i] = jnp.transpose(cur[i][0])[None]
                hi_out[0, pl.ds(j, 1), i] = jnp.transpose(cur[i][1])[None]

    # --- inverse FFT + overlap-add + clipping max -----------------------
    half_rows = m1_k // 2
    wn = wn_t[...]
    dn1 = (((1,), (1,)), ((), ()))
    vb = valid_ref[s_idx, t]
    blk_max = None
    for o in range(cout):
        ar = acc_r[o] * wn
        ai = acc_i[o] * wn
        if i1:
            # Output-stacked [F2r, F2i] along m2: q = [A.x; B.x].
            q_r = dot(inv_uv, prep(ar), dn0, True)  # [2*m2, m1]
            q_i = dot(inv_uv, prep(ai), dn0, True)
            ur = q_r[:m2_k] + q_i[m2_k:]
            ui = q_i[:m2_k] - q_r[m2_k:]
        else:
            arp, aip = prep(ar), prep(ai)
            ur = dot(f2tr, arp, dn0, True) + dot(f2ti, aip, dn0, True)
            ui = dot(f2tr, aip, dn0, True) - dot(f2ti, arp, dn0, True)
        vr = ur * tw_r + ui * tw_i
        vi = ui * tw_r - ur * tw_i
        # x[n1, n2] = contract q: sum_q F1[n1, q] * V^T[n2, q].
        if i2:
            # Contraction-stacked: [F1r, F1i]·[vr, vi] folds the add.
            xo = dot(inv_c2, prep(jnp.concatenate([vr, vi], axis=1)),
                     dn1, True)
        else:
            xo = (dot(if1r, prep(vr), dn1, True)
                  + dot(if1i, prep(vi), dn1, True))
        yo = xo[:half_rows] + tail_scr[o]
        tail_scr[o] = xo[half_rows:]
        y_ref[0, 0, o] = yo
        # Masked |y| max for the clipping monitor.
        n2 = yo.shape[1]
        fidx = (lax.broadcasted_iota(jnp.int32, yo.shape, 0) * n2
                + lax.broadcasted_iota(jnp.int32, yo.shape, 1))
        m = jnp.max(jnp.where(fidx < vb, jnp.abs(yo), 0.0))
        blk_max = m if blk_max is None else jnp.maximum(blk_max, m)
    max_scr[...] = jnp.maximum(max_scr[...], blk_max)

    @pl.when(t == t_total - 1)
    def _fin():
        tail_out[0] = tail_scr[...]
        max_ref[0] = max_scr[...]


def fused_preshape(n: int) -> tuple[int, int, int, int]:
    """(rows, m2, m1, cols) of the fused kernel's pre-shaped layouts for
    DFT size ``n``.  Hosts staging arrays for the _pre entry use these:
    ``x5`` [S,T,Cin,rows,m2], ``hist5`` [S,P-1,Cin,m1,cols], ``tail4``
    [S,Cout,rows,m2] — all plain row-major reshapes of the canonical
    flat layouts (free on host; a PHYSICAL retile on device, which is
    exactly why the caller should stage them host-side — DEVNOTES r5)."""
    plan = get_plan(n)
    cols = plan.m2 // 2 + 1
    return plan.m1 // 2, plan.m2, plan.m1, cols


@functools.partial(jax.jit, static_argnames=("n", "interpret", "passes"))
def pallas_conv_step_fused(
    h_perm: jax.Array,
    x: jax.Array,
    hist_re: jax.Array,
    hist_im: jax.Array,
    tail: jax.Array,
    valid: jax.Array,
    n: int,
    interpret: bool = False,
    passes: int | None = None,
):
    """Batched fused convolution step (canonical flat layouts).

    ``h_perm``: [P, Cin, Cout, 2, K] filter spectra with bins in the
    TRANSPOSED-tile flatten (k' = m1*c + q — produce with
    :func:`permute_h_for_fused`).  ``x``: [S, T, Cin, B].  ``hist_re``/
    ``hist_im``: [S, P-1, Cin, K] canonical engine layout.  ``tail``:
    [S, Cout, B].  ``valid``: int32 [S, T] — number of valid frames per
    block (clipping-monitor mask).  ``n`` = 2*B.

    Returns ``(y, new_hist_re, new_hist_im, new_tail, max_s)`` with
    ``y`` [S, T, Cout, B] and ``max_s`` float32 [S] — the per-stream
    masked max|y| over the whole chunk (the clipping monitor).

    NOTE: the 4-D<->5-D reshapes here are PHYSICAL retiles on TPU (the
    (8,128) tile spans the last two dims, so re-splitting the minormost
    dim moves bytes — measured 3.1 ms/step at the headline shape).
    Steady-state callers should host-stage ``x``/carry the state in the
    pre-shaped layouts and call :func:`pallas_conv_step_fused_pre`.
    """
    p, cin, cout, _, k = h_perm.shape
    s, t_total = x.shape[0], x.shape[1]
    b = n // 2
    rows, m2, m1, cols = fused_preshape(n)
    assert k == m1 * cols, (k, m1, cols)
    half_rows = m1 // 2

    xg = x.reshape(s, t_total, cin, rows, m2)
    hr = hist_re.reshape(s, p - 1, cin, m1, cols)
    hi = hist_im.reshape(s, p - 1, cin, m1, cols)
    tl = tail.reshape(s, cout, half_rows, m2)
    y, hr_o, hi_o, tl_o, mx = pallas_conv_step_fused_pre(
        h_perm, xg, hr, hi, tl, valid, n,
        interpret=interpret, passes=passes,
    )
    return (
        y.reshape(s, t_total, cout, b),
        hr_o.reshape(s, p - 1, cin, k),
        hi_o.reshape(s, p - 1, cin, k),
        tl_o.reshape(s, cout, b),
        mx,
    )


@functools.partial(
    jax.jit, static_argnames=("n", "interpret", "passes", "hist_t"))
def pallas_conv_step_fused_pre(
    h_perm: jax.Array,
    xg: jax.Array,
    hr: jax.Array,
    hi: jax.Array,
    tl: jax.Array,
    valid: jax.Array,
    n: int,
    interpret: bool = False,
    passes: int | None = None,
    hist_t: bool = False,
):
    """Fused step on PRE-SHAPED arrays (no device retiles).

    ``xg``: [S, T, Cin, rows, m2]; ``hr``/``hi``: [S, P-1, Cin, m1,
    cols] — or the kernel's TRANSPOSED tile layout [S, P-1, Cin, cols,
    m1] with ``hist_t=True`` (the steady-state carry: skips every
    in-kernel hist tile transpose); ``tl``: [S, Cout, rows, m2] (see
    :func:`fused_preshape`); ``h_perm`` flat as in
    :func:`pallas_conv_step_fused` (reshaped here — it is placed once
    per filter, not per step).  Returns ``(y5, hr5, hi5, tl4, max_s)``
    with ``y5`` [S, T, Cout, rows, m2] and hist outputs in the same
    layout as the inputs.
    """
    if passes is None:
        passes = FFT_DOT_PASSES
    three = passes == 3
    p, cin, cout, _, k = h_perm.shape
    s, t_total = xg.shape[0], xg.shape[1]
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    assert k == m1 * cols, (k, m1, cols)
    rows = m1 // 2
    half_rows = m1 // 2

    hp = h_perm.reshape(p, cin, cout, 2, cols, m1)

    # Constants (trace-time numpy; free).
    f1r_u = np.ascontiguousarray(plan.f1_re[:, :rows])   # [m1, rows]
    f1i_u = np.ascontiguousarray(plan.f1_im[:, :rows])
    twr_t = np.ascontiguousarray(plan.tw_re.T)           # [m2, m1]
    twi_t = np.ascontiguousarray(plan.tw_im.T)
    f2r_c = np.ascontiguousarray(plan.f2_re[:, :cols])   # [m2, cols]
    f2i_c = np.ascontiguousarray(plan.f2_im[:, :cols])
    wn = (_half_weights(n) / float(n)).astype(np.float32)  # [m1, cols]
    wn_t = np.ascontiguousarray(wn.T)                    # [cols, m1]
    f2tr = np.ascontiguousarray(plan.f2_re[:, :cols].T)  # [cols, m2]
    f2ti = np.ascontiguousarray(plan.f2_im[:, :cols].T)

    # Per-stage stacked-dot variants: pre-concatenate a stage's re/im
    # constant pair so it issues HALF as many dots of TWICE the size
    # (the legacy layout runs 72 hw dots per grid step at the headline
    # shape — 24 logical x 3 bf16 passes — of near-minimum MXU size).
    # MEASURED SLOWER on v5e (2026-08): the all-on variant was ~10x
    # slower end-to-end — in-kernel concats/slices are not free in
    # Mosaic — so every stage defaults OFF.  FOLVE_FUSED_STACK takes a
    # comma list of f1,f2,i1,i2 (or "all") for re-evaluation on future
    # toolchains; f1/i2 additionally need m1 % 128 == 0 (lane-aligned
    # slices/concats).
    stack = _stack_flags(m1)
    f1, f2, i1, i2 = stack
    dot_consts = []
    if f1:
        dot_consts.append(np.concatenate([f1r_u, f1i_u], axis=0))
    else:
        dot_consts += [f1r_u, f1i_u]
    if f2:
        dot_consts.append(np.concatenate([f2r_c, -f2i_c], axis=0))
        dot_consts.append(np.concatenate([f2i_c, f2r_c], axis=0))
    else:
        dot_consts += [f2r_c, f2i_c]
    if i1:
        dot_consts.append(np.concatenate([f2tr, f2ti], axis=1))
    else:
        dot_consts += [f2tr, f2ti]
    if i2:
        dot_consts.append(
            np.concatenate([plan.f1_re, plan.f1_im], axis=1))
    else:
        dot_consts += [plan.f1_re, plan.f1_im]
    if three:
        pairs = [_bf16_split(m) for m in dot_consts]
        dot_arrays = [hl[0] for hl in pairs] + [hl[1] for hl in pairs]
    else:
        dot_arrays = dot_consts

    mem = {"memory_space": _VMEM} if _VMEM else {}
    const = lambda shape: pl.BlockSpec(
        shape, lambda si, ti: tuple(0 for _ in shape), **mem)
    per_s = lambda shape: pl.BlockSpec(
        shape, lambda si, ti: (si,) + tuple(0 for _ in shape[1:]), **mem)

    kernel = functools.partial(
        _kernel, p=p, cin=cin, cout=cout, t_total=t_total, rows=rows,
        three=three, stack=stack, hist_t=hist_t)
    hist_shape = ((1, p - 1, cin, cols, m1) if hist_t
                  else (1, p - 1, cin, m1, cols))
    kwargs = {}
    if pltpu is not None and not interpret:
        # The s grid dim is parallel in principle (independent streams;
        # scratch re-initializes at t==0) — FOLVE_FUSED_DIMSEM=parallel
        # lets Mosaic know, for A/B on hardware where it matters
        # (megacore partitioning); default stays conservative.
        s_sem = ("parallel"
                 if os.environ.get("FOLVE_FUSED_DIMSEM") == "parallel"
                 else "arbitrary")
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(s_sem, "arbitrary"),
            vmem_limit_bytes=_vmem_limit_bytes(),
        )

    scratch = [
        pltpu.VMEM((p - 1, cin, 2, cols, m1), jnp.float32)
        if pltpu else None,
        pltpu.VMEM((cout, half_rows, m2), jnp.float32) if pltpu else None,
        pltpu.VMEM((8, 128), jnp.float32) if pltpu else None,
    ]
    if pltpu is None:  # pragma: no cover - interpret-only environments
        raise RuntimeError("fused conv step requires pallas TPU scratch")

    y, hr_o, hi_o, tl_o, mx = pl.pallas_call(
        kernel,
        grid=(s, t_total),
        in_specs=[
            pl.BlockSpec((1, 1, cin, rows, m2),
                         lambda si, ti: (si, ti, 0, 0, 0), **mem),
            per_s(hist_shape),
            per_s(hist_shape),
            per_s((1, cout, half_rows, m2)),
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if pltpu else pl.BlockSpec((1, 1), lambda si, ti: (si, ti), **mem),
            const((p, cin, cout, 2, cols, m1)),
            const((m2, m1)),
            const((m2, m1)),
            const((cols, m1)),
        ] + [const(a.shape) for a in dot_arrays],
        out_specs=[
            pl.BlockSpec((1, 1, cout, half_rows, m2),
                         lambda si, ti: (si, ti, 0, 0, 0), **mem),
            per_s(hist_shape),
            per_s(hist_shape),
            per_s((1, cout, half_rows, m2)),
            per_s((1, 8, 128)),
        ],
        out_shape=[
            _sds((s, t_total, cout, half_rows, m2), jnp.float32, xg),
            _sds((s,) + hist_shape[1:], jnp.float32, xg),
            _sds((s,) + hist_shape[1:], jnp.float32, xg),
            _sds((s, cout, half_rows, m2), jnp.float32, xg),
            _sds((s, 8, 128), jnp.float32, xg),
        ],
        scratch_shapes=scratch,
        input_output_aliases={1: 1, 2: 2, 3: 3},
        interpret=interpret,
        **kwargs,
    )(xg, hr, hi, tl, valid.astype(jnp.int32), hp,
      twr_t, twi_t, wn_t, *dot_arrays)

    return y, hr_o, hi_o, tl_o, jnp.max(mx, axis=(1, 2))


def permute_h_for_fused(h_spec: jax.Array, n: int) -> jax.Array:
    """Re-flatten canonical half-spectrum bins (k = cols*q + c) into the
    fused kernel's transposed-tile order (k' = m1*c + q).  Do this ONCE
    per compiled filter — it is a real transpose."""
    plan = get_plan(n)
    m1, m2 = plan.m1, plan.m2
    cols = m2 // 2 + 1
    lead = h_spec.shape[:-1]
    k = h_spec.shape[-1]
    assert k == m1 * cols, (k, m1, cols)
    r = h_spec.reshape(*lead, m1, cols)
    return jnp.swapaxes(r, -1, -2).reshape(*lead, k)
