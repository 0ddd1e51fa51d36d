"""On-chip experiment: FFT matmul precision HIGHEST (6-pass bf16) vs
HIGH (3-pass).  3-pass drops only the lo*lo cross term (~2^-32 relative,
below f32 epsilon) so accuracy should hold while MXU time halves.

  python tools/exp_precision.py high|highest [S] [T]

Reports the fused-step time and the engine-vs-oracle SNR (oracle stays
HIGHEST time-domain convolution).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/folve_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, ".")

mode = sys.argv[1] if len(sys.argv) > 1 else "high"
s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
t = int(sys.argv[3]) if len(sys.argv) > 3 else 64

prec = lax.Precision.HIGH if mode == "high" else lax.Precision.HIGHEST

from folve_tpu.engine import rfft
from folve_tpu.engine.kernels import common, conv_step

rfft._PRECISION = prec
common.PREC = prec
conv_step._PREC = prec

from folve_tpu.engine import stream as st
from folve_tpu.engine.filter_bank import compile_filter_bank
from folve_tpu.engine.stream import init_state

st._PRECISION = prec

taps = 131072
rate = 44100
rng = np.random.default_rng(0)
ir = (rng.standard_normal((2, 2, taps)) / np.sqrt(taps)).astype(np.float32)
bank = compile_filter_bank(ir)
b = bank.fragm
p = bank.partitions
print(f"fragm={b} P={p} S={s} T={t} prec={mode}", file=sys.stderr)

# --- accuracy: chunk_step vs HIGHEST-precision direct convolution.
t_acc = 3
n_acc = t_acc * b
x_acc = (rng.standard_normal((t_acc, 2, b)) * 0.3).astype(np.float32)


@jax.jit
def accuracy(bank, x):
    state = init_state(bank)
    _, y = st.chunk_step(bank, state, x, n_acc)
    got = jnp.transpose(y, (0, 2, 1)).reshape(n_acc, 2)
    flat = jnp.transpose(x, (0, 2, 1)).reshape(n_acc, 2)
    irj = jnp.asarray(ir)
    sig = jnp.pad(flat.T, ((0, 0), (taps - 1, 0)))[None]
    ker = jnp.flip(irj, axis=-1)
    ref = lax.conv_general_dilated(
        sig, jnp.transpose(ker, (1, 0, 2)), window_strides=(1,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,
    )[0].T
    err = jnp.sum((got - ref) ** 2)
    return 10.0 * jnp.log10(err / jnp.sum(ref**2))


print(f"snr_vs_oracle_db: {float(accuracy(bank, x_acc)):.1f}")

# --- fused-step accuracy at the same precision (the serving path).
from folve_tpu.engine.kernels.conv_step import (pallas_conv_step_fused,
                                                permute_h_for_fused)

hp = jax.device_put(permute_h_for_fused(bank.h_spec, 2 * b))
valid1 = jnp.full((1, t_acc), b, jnp.int32)
y_f, _, _, _, _ = pallas_conv_step_fused(
    hp, jnp.asarray(x_acc)[None],
    jnp.zeros((1, p - 1, 2, bank.bins), jnp.float32),
    jnp.zeros((1, p - 1, 2, bank.bins), jnp.float32),
    jnp.zeros((1, 2, b), jnp.float32), valid1, 2 * b)


# CAUTION: do NOT compute sum((got-ref)**2)/sum(ref**2) INSIDE a jit
# at this shape — XLA's algebraic rewrite of the difference of squares
# cancels catastrophically in f32 and reports garbage (+3 dB observed
# for a -102 dB true error; DEVNOTES round 5).  Fetch got/ref and do
# the error arithmetic on host in f64.
@jax.jit
def oracle_ref():
    flat = jnp.transpose(jnp.asarray(x_acc), (0, 2, 1)).reshape(n_acc, 2)
    irj = jnp.asarray(ir)
    sig = jnp.pad(flat.T, ((0, 0), (taps - 1, 0)))[None]
    ker = jnp.flip(irj, axis=-1)
    return lax.conv_general_dilated(
        sig, jnp.transpose(ker, (1, 0, 2)), window_strides=(1,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,
    )[0].T


_ref = np.asarray(oracle_ref(), dtype=np.float64)
_got = np.asarray(
    jnp.transpose(y_f[0], (0, 2, 1)).reshape(n_acc, 2), dtype=np.float64)
_err = np.sum((_got - _ref) ** 2)
print(f"snr_fused_db: {10.0 * np.log10(_err / np.sum(_ref ** 2)):.1f}")

# --- fused-step speed.
x = jnp.asarray(rng.standard_normal((s, t, 2, b)).astype(np.float32))
valid = jnp.full((s, t), b, jnp.int32)


@jax.jit
def step(hr, hi, tl, xx):
    y, hr, hi, tl, mx = pallas_conv_step_fused(hp, xx, hr, hi, tl, valid, 2 * b)
    xx2 = xx + y[:, :1, :, :1].mean() * 1e-20
    return hr, hi, tl, xx2, y


hr = jnp.zeros((s, p - 1, 2, bank.bins), jnp.float32)
hi = jnp.zeros_like(hr)
tl = jnp.zeros((s, 2, b), jnp.float32)
hr, hi, tl, xx, y = step(hr, hi, tl, x)
jax.block_until_ready(y)
iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    hr, hi, tl, xx, y = step(hr, hi, tl, xx)
force = float(jnp.sum(y))
dt = (time.perf_counter() - t0) / iters
audio_sec = s * t * b / rate
print(f"fused[{mode}]: {dt*1e3:.2f} ms/step -> {audio_sec/dt:.0f}x realtime"
      f" (force={force:.3e})")
