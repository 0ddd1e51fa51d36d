"""A/B the fused single-kernel conv step vs the 3-kernel path on chip.

Methodology per DEVNOTES: chain state across iterations so nothing
dedupes, force with float(jnp.sum(...)), report seconds/step and
realtime-x at the headline serving shape.  Run each variant in a FRESH
process (jit caches lie in-process).

  python tools/bench_fused_step.py fused|pre|split [S] [T] [iters] [passes]

``pre`` = the steady-state pre-shaped loop (host-staged x, donated 5-D
carry, no device retiles) — what bench.py's headline runs.

``passes`` (fused only): 3 = bf16x3 split dots, 6 = full f32 dots
(conv_step.FFT_DOT_PASSES default).
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/folve_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, ".")

from folve_tpu.engine import stream as st
from folve_tpu.engine.filter_bank import compile_filter_bank
from folve_tpu.engine.stream import init_state, shared_filter_chunk_step


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    passes = int(sys.argv[5]) if len(sys.argv) > 5 else None
    taps = 131072
    rate = 44100
    rng = np.random.default_rng(0)
    ir = (rng.standard_normal((2, 2, taps)) / np.sqrt(taps)).astype(np.float32)
    bank = compile_filter_bank(ir)
    b = bank.fragm
    p = bank.partitions
    print(f"fragm={b} P={p} S={s} T={t} mode={mode}", file=sys.stderr)

    x = jnp.asarray(rng.standard_normal((s, t, 2, b)).astype(np.float32))

    if mode == "pre":
        nv = jnp.full((s,), t * b, jnp.int32)
        pre_step = jax.jit(
            st.fused_serving_step_pre,
            static_argnames=("interpret",), donate_argnums=(1,))
        carry = st.fused_carry_init(bank, s)
        x5 = jax.device_put(st.stage_x_for_fused(
            bank, rng.standard_normal((s, t, 2, b)).astype(np.float32)))
        hp = st.eager_h_perm(bank)
        carry, y = pre_step(bank, carry, x5, nv, h_perm=hp)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, y = pre_step(bank, carry, x5, nv, h_perm=hp)
        force = float(jnp.sum(y)) + float(jnp.sum(carry.tail))
        dt = (time.perf_counter() - t0) / iters
    elif mode == "fused":
        from folve_tpu.engine.kernels.conv_step import (
            pallas_conv_step_fused, permute_h_for_fused)

        hp = jax.device_put(permute_h_for_fused(bank.h_spec, 2 * b))
        valid = jnp.full((s, t), b, jnp.int32)

        # Donate the carried state: without donation XLA must keep the
        # caller's buffers intact while the pallas_call aliases its
        # hist/tail operands, so it inserts defensive whole-array
        # copies (measured: 3.1 ms/step of 'reshape' HBM copies).
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(hr, hi, tl, xx):
            y, hr, hi, tl, mx = pallas_conv_step_fused(
                hp, xx, hr, hi, tl, valid, 2 * b, passes=passes)
            # Chain: feed a whiff of output back so steps can't dedupe.
            xx2 = xx + y[:, :1, :, :1].mean() * 1e-20
            return hr, hi, tl, xx2, y

        hr = jnp.zeros((s, p - 1, 2, bank.bins), jnp.float32)
        hi = jnp.zeros_like(hr)
        tl = jnp.zeros((s, 2, b), jnp.float32)
        hr, hi, tl, xx, y = step(hr, hi, tl, x)  # compile+warm
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            hr, hi, tl, xx, y = step(hr, hi, tl, xx)
        force = float(jnp.sum(y)) + float(jnp.sum(tl))
        dt = (time.perf_counter() - t0) / iters
    else:
        nv = jnp.full((s,), t * b, jnp.int32)

        @jax.jit
        def step(state, xx):
            state, y = shared_filter_chunk_step(bank, state, xx, nv)
            xx2 = xx + y[:, :1, :, :1].mean() * 1e-20
            return state, xx2, y

        state = jax.vmap(lambda _: init_state(bank))(jnp.arange(s))
        state, xx, y = step(state, x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, xx, y = step(state, xx)
        force = float(jnp.sum(y)) + float(jnp.sum(state.tail))
        dt = (time.perf_counter() - t0) / iters

    audio_sec = s * t * b / rate
    print(f"{mode}: {dt*1e3:.2f} ms/step -> {audio_sec/dt:.0f}x realtime"
          f" (force={force:.3e})")


if __name__ == "__main__":
    main()
