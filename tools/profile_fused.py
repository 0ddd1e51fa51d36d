"""Capture a device trace of the fused serving step and dump per-op
time via xprof's xspace converter.

  python tools/profile_fused.py [S] [T] [iters]
"""

import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/folve_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, ".")

from folve_tpu.engine.filter_bank import compile_filter_bank
from folve_tpu.engine.kernels.conv_step import (pallas_conv_step_fused,
                                                permute_h_for_fused)

s = int(sys.argv[1]) if len(sys.argv) > 1 else 64
t = int(sys.argv[2]) if len(sys.argv) > 2 else 64
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

taps = 131072
rng = np.random.default_rng(0)
ir = (rng.standard_normal((2, 2, taps)) / np.sqrt(taps)).astype(np.float32)
bank = compile_filter_bank(ir)
b = bank.fragm
p = bank.partitions
hp = jax.device_put(permute_h_for_fused(bank.h_spec, 2 * b))
valid = jnp.full((s, t), b, jnp.int32)
x = jnp.asarray(rng.standard_normal((s, t, 2, b)).astype(np.float32))


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

log_dir = tempfile.mkdtemp(prefix="folve_prof_")
t0 = time.perf_counter()
with jax.profiler.trace(log_dir):
    for _ in range(iters):
        hr, hi, tl, xx, y = step(hr, hi, tl, xx)
    float(jnp.sum(y))
wall = time.perf_counter() - t0
print(f"wall: {wall*1e3/iters:.2f} ms/step", file=sys.stderr)

paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
print("xplane:", paths, file=sys.stderr)

from folve_tpu.utils.profiling import analyze_device_trace

prof = analyze_device_trace(log_dir)
print(f"device: {prof.get('device_time_ms', 0)/iters:.2f} ms/step, "
      f"mem bw {100*prof.get('mem_bw_frac', 0):.1f}% of peak")
for name, ms in prof.get("ops", [])[:12]:
    print(f"  {name[:64]:64s} {ms/iters:7.3f} ms/step")

# Raw tool dumps for deeper digging (str paths only — bytes silently
# returns an error blob, DEVNOTES r5).
from xprof.convert import _pywrap_profiler_plugin as pw

for tool in ("op_profile", "framework_op_stats"):
    try:
        data = pw.xspace_to_tools_data([paths[0]], tool, {})
        blob = data[0] if isinstance(data, tuple) else data
        out = f"/tmp/prof_{tool}.out"
        mode = "wb" if isinstance(blob, bytes) else "w"
        with open(out, mode) as f:
            f.write(blob)
        print(tool, "->", out, len(blob), file=sys.stderr)
    except Exception as e:
        print(tool, "FAILED:", e, file=sys.stderr)
