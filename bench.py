"""Benchmark: TPU partitioned-convolution serving throughput + accuracy.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline config (BASELINE.md): stereo 44.1 kHz, 131,072-tap filter.
``value`` is aggregate audio-seconds convolved per wall second on one
chip (realtime multiples) for batched multi-stream serving — the TPU
analog of the reference's "3% of one 2012 core at 1x realtime"
(README.md:357-360), i.e. ~30x realtime per reference core, which is
the vs_baseline denominator.

Measurement notes: inputs/states/outputs stay device-resident and only
scalar metrics are fetched — the dev harness reaches the chip through a
tunnel whose device->host readback is ~3 MB/s, which would measure the
tunnel, not the engine.  Accuracy (SNR vs a direct time-domain
convolution oracle) is likewise computed on device.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:  # reuse compilations across driver rounds (first compile through
        # the remote-compile tunnel can take minutes)
        jax.config.update("jax_compilation_cache_dir", "/tmp/folve_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from folve_tpu.engine import (
        chunk_step,
        compile_filter_bank,
        derive_fragm,
        init_state,
        shared_filter_chunk_step,
    )

    rate = 44100
    size = 131072
    rng = np.random.default_rng(42)
    ir = rng.standard_normal((2, 2, size)).astype(np.float32) / np.sqrt(size)
    bank = compile_filter_bank(ir)
    fragm = bank.fragm
    assert fragm == derive_fragm(size)

    # --- accuracy: engine vs direct time-domain convolution, on device.
    t_acc = 3
    n_acc = t_acc * fragm
    x_acc = (rng.standard_normal((t_acc, 2, fragm)) * 0.3).astype(np.float32)

    @jax.jit
    def accuracy(bank, x):
        state = init_state(bank)
        _, y = chunk_step(bank, state, x, n_acc)
        got = jnp.transpose(y, (0, 2, 1)).reshape(n_acc, 2)  # [N, Cout]
        flat = jnp.transpose(x, (0, 2, 1)).reshape(n_acc, 2)  # [N, Cin]
        irj = jnp.asarray(ir)  # [Cin, Cout, L]
        # Direct convolution oracle via conv_general_dilated (no FFT):
        # pad the signal and correlate with the flipped IR.
        sig = jnp.pad(flat.T, ((0, 0), (size - 1, 0)))[None]  # [1, Cin, N+L-1]
        ker = jnp.flip(irj, axis=-1)  # [Cin, Cout, L] -> conv kernel
        ref = lax.conv_general_dilated(
            sig,
            jnp.transpose(ker, (1, 0, 2)),  # [Cout, Cin, L]
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST,
        )[0].T  # [N, Cout]
        err = jnp.sum((got - ref) ** 2)
        denom = jnp.sum(ref**2)
        return 10.0 * jnp.log10(err / denom)

    snr_db = float(accuracy(bank, x_acc))

    # --- throughput: batched serving, S streams x T blocks per step.
    s_streams, t_blocks = 32, 32
    states = jax.vmap(lambda _: init_state(bank))(np.arange(s_streams))
    x = jax.device_put(
        rng.standard_normal((s_streams, t_blocks, 2, fragm)).astype(np.float32)
    )
    n_valid = jax.device_put(np.full((s_streams,), t_blocks * fragm, np.int32))
    step = jax.jit(shared_filter_chunk_step)

    states, y = step(bank, states, x, n_valid)  # compile + warmup
    float(jnp.sum(y))  # force (block_until_ready is unreliable for
    # pallas outputs through this backend's tunnel — DEVNOTES.md)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        states, y = step(bank, states, x, n_valid)
    # The state chain threads every iteration; summing the final output
    # forces the full sequence before the clock stops.
    float(jnp.sum(y))
    dt = time.perf_counter() - t0

    audio_sec = iters * s_streams * t_blocks * fragm / rate
    value = audio_sec / dt

    # --- secondary: long-IR reverb config (BASELINE config 2 —
    # SantaLucia-class impulse, 204,800 taps -> 25 partitions/block).
    size2 = 204800
    ir2 = rng.standard_normal((2, 2, size2)).astype(np.float32) / np.sqrt(size2)
    bank2 = compile_filter_bank(ir2)
    s2, t2 = 8, 16
    states2 = jax.vmap(lambda _: init_state(bank2))(np.arange(s2))
    x2 = jax.device_put(rng.standard_normal((s2, t2, 2, fragm)).astype(np.float32))
    nv2 = jax.device_put(np.full((s2,), t2 * fragm, np.int32))
    states2, y2 = step(bank2, states2, x2, nv2)
    float(jnp.sum(y2))
    t0 = time.perf_counter()
    for _ in range(10):
        states2, y2 = step(bank2, states2, x2, nv2)
    float(jnp.sum(y2))
    long_ir_value = 10 * s2 * t2 * fragm / rate / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "audio-sec/sec/chip (realtimex), 131072-tap stereo 44.1kHz",
                "value": round(value, 1),
                "unit": "x realtime",
                "vs_baseline": round(value / 30.0, 1),
                "snr_vs_oracle_db": round(snr_db, 1),
                "long_ir_204800_x": round(long_ir_value, 1),
                "batch_streams": s_streams,
                "blocks_per_step": t_blocks,
                "fragm": fragm,
                "partitions": bank.partitions,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
