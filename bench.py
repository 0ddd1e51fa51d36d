"""Benchmark: TPU partitioned-convolution serving — all five BASELINE configs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``value`` is BASELINE config 5 (batched multi-stream serving, aggregate
audio-seconds convolved per wall second on one chip) at the headline
shape: stereo 44.1 kHz, 131,072-tap filter.  The vs_baseline
denominator is the reference's ~30x realtime per 2012 core
(README.md:357-360).  Also reported:

  config 1  single_stream_lowpass_x — the demo lowpass filter, S=1
            (what one blocking media player sees)
  config 2  long_ir_204800_x — SantaLucia-class reverb IR
  config 3  gapless_join_x — two-file album join through the real
            runtime (decode -> convolve -> FLAC encode + handover)
  config 4  filter_switch_* — processor-pool miss/hit timings across
            44.1/48/96 kHz configs
  latency   block_step_p50_ms / p99 (single-block device step) and
            ttfb_cold_ms / ttfb_warm_ms (time to first byte of a
            fresh handler, cold pool vs pool hit)
  traffic   hbm_gbps + pct_of_peak_v5e — modeled minimum HBM bytes of
            the config-5 step vs measured wall time (v5e peak 819 GB/s)

Measurement notes: engine configs keep inputs/states/outputs
device-resident and fetch only scalars — the dev harness reaches the
chip through a tunnel whose device->host readback is ~3 MB/s
(DEVNOTES.md).  Runtime configs (3/4, TTFB) necessarily include host
decode/encode work; that is the product's real serving path.
"""

import json
import os
import tempfile
import time

import numpy as np


def _engine_configs(out, rng):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from folve_tpu.engine import (
        chunk_step,
        compile_filter_bank,
        derive_fragm,
        init_state,
    )
    from folve_tpu.engine.stream import serving_chunk_step

    smoke = bool(os.environ.get("FOLVE_BENCH_SMOKE"))
    rate = 44100
    size = 16384 if smoke else 131072
    ir = rng.standard_normal((2, 2, size)).astype(np.float32) / np.sqrt(size)
    bank = compile_filter_bank(ir)
    fragm = bank.fragm
    assert fragm == derive_fragm(size)

    # --- accuracy: engine vs direct time-domain convolution, on device.
    t_acc = 3
    n_acc = t_acc * fragm
    x_acc = (rng.standard_normal((t_acc, 2, fragm)) * 0.3).astype(np.float32)

    # NOTE: got/ref come back to host and the error ratio is computed in
    # f64 here — computing sum((got-ref)**2)/sum(ref**2) inside a jit
    # lets XLA rewrite the difference of squares into a catastrophically
    # cancelling f32 form at these shapes (observed: +3 dB reported for
    # a true -102 dB error; DEVNOTES round 5).
    @jax.jit
    def oracle_ref(x):
        flat = jnp.transpose(x, (0, 2, 1)).reshape(n_acc, 2)
        irj = jnp.asarray(ir)
        sig = jnp.pad(flat.T, ((0, 0), (size - 1, 0)))[None]
        ker = jnp.flip(irj, axis=-1)
        return lax.conv_general_dilated(
            sig,
            jnp.transpose(ker, (1, 0, 2)),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST,
        )[0].T

    def snr_db(y):
        got = np.asarray(
            jnp.transpose(y, (0, 2, 1)).reshape(n_acc, 2), dtype=np.float64
        )
        err = np.sum((got - ref_acc) ** 2)
        return round(10.0 * np.log10(err / np.sum(ref_acc**2)), 1)

    ref_acc = np.asarray(oracle_ref(jnp.asarray(x_acc)), dtype=np.float64)
    _, y_acc = jax.jit(chunk_step)(bank, init_state(bank), x_acc, n_acc)
    out["snr_vs_oracle_db"] = snr_db(y_acc)

    # Routes to the fully-fused single-Pallas-kernel step where the
    # shape supports it (block spectra stay in VMEM between FFT / MAC /
    # inverse stages), else the vmapped three-kernel path.
    step = jax.jit(serving_chunk_step)

    # Accuracy of the HEADLINE path itself (the fused kernel runs
    # 3-pass bf16 FFT dots; budget -90 dB vs the HIGHEST oracle).
    st1 = jax.vmap(lambda _: init_state(bank))(np.arange(1))
    _, y_srv = step(
        bank, st1, jnp.asarray(x_acc)[None],
        jnp.asarray([n_acc], np.int32),
    )
    out["snr_serving_db"] = snr_db(y_srv[0])

    from folve_tpu.engine import stream as _stream

    # Steady-state fused loop: host-staged 5-D x, donated pre-shaped
    # carry — no per-step device retiles (they are physical HBM copies
    # on TPU, 3.1 ms of the 23.8 ms step; DEVNOTES r5).
    pre_step = jax.jit(
        _stream.fused_serving_step_pre,
        static_argnames=("interpret",),
        donate_argnums=(1,),
    )

    import contextlib

    def run(bank, s, t, iters, trace_dir=None):
        nv = jax.device_put(np.full((s,), t * bank.fragm, np.int32))
        xh = rng.standard_normal((s, t, 2, bank.fragm)).astype(np.float32)
        fused = _stream._is_tpu_backend() and _stream.fused_serving_supported(
            bank, t
        )
        if trace_dir:
            from folve_tpu.utils.profiling import device_trace

            scope = lambda: device_trace(trace_dir)
        else:
            scope = contextlib.nullcontext
        if fused:
            carry = _stream.fused_carry_init(bank, s)
            x = jax.device_put(_stream.stage_x_for_fused(bank, xh))
            # Filter permute hoisted out of the jitted loop (once per
            # bank, not once per step).
            hp = _stream.eager_h_perm(bank)
            carry, y = pre_step(bank, carry, x, nv, h_perm=hp)  # compile
            float(jnp.sum(y))
            t0 = time.perf_counter()
            with scope():
                for _ in range(iters):
                    carry, y = pre_step(bank, carry, x, nv, h_perm=hp)
                float(jnp.sum(y))
        else:
            states = jax.vmap(lambda _: init_state(bank))(np.arange(s))
            x = jax.device_put(xh)
            states, y = step(bank, states, x, nv)  # compile + warmup
            float(jnp.sum(y))  # force (block_until_ready unreliable)
            t0 = time.perf_counter()
            with scope():
                for _ in range(iters):
                    # State chain threads every iteration; the final sum
                    # forces the whole sequence.
                    states, y = step(bank, states, x, nv)
                float(jnp.sum(y))
        dt = time.perf_counter() - t0
        return iters * s * t * bank.fragm / rate / dt, dt

    # --- config 5: batched serving (headline value).
    # 64x64 chosen by on-chip sweep (S,T in {16..128}^2): 22.2kx vs
    # 19.2kx at 32x32; larger configs regress (DEVNOTES round 4b).
    s5, t5, iters5 = (4, 4, 2) if smoke else (64, 64, 20)
    value, dt5 = run(bank, s5, t5, iters5)
    out["metric"] = (
        f"audio-sec/sec/chip (realtimex), {size}-tap stereo 44.1kHz, "
        "batched serving"
    )
    out["value"] = round(value, 1)
    out["unit"] = "x realtime"
    out["vs_baseline"] = round(value / 30.0, 1)
    out["batch_streams"] = s5
    out["blocks_per_step"] = t5
    out["fragm"] = fragm
    out["partitions"] = bank.partitions

    # Modeled minimum HBM traffic of one FUSED step: block spectra never
    # leave VMEM between the FFT / MAC / inverse stages, so the only HBM
    # traffic is the audio in/out, the filter spectra (once — resident
    # across the whole grid), the FDL history in+out, and the OLA tail.
    p, k, b = bank.partitions, bank.bins, bank.fragm
    cin = cout = 2
    bytes_per_step = 4 * (
        s5 * t5 * cin * b  # read x
        + s5 * t5 * cout * b  # write y
        + p * cin * cout * 2 * k  # filter spectra (VMEM-resident)
        + 2 * s5 * (p - 1) * cin * 2 * k  # hist import + export
        + 2 * s5 * cout * b  # tail in + out
    )
    hbm_gbps = bytes_per_step * iters5 / dt5 / 1e9
    out["hbm_gbps_model_min"] = round(hbm_gbps, 1)
    out["pct_of_peak_v5e"] = round(100.0 * hbm_gbps / 819.0, 1)

    # Measured (not modeled) utilization: trace a few headline steps,
    # let xprof account device time + HBM bandwidth (VERDICT r4 item 3).
    try:
        prof_dir = tempfile.mkdtemp(prefix="folve_bench_prof_")
        prof_iters = 2 if smoke else 5
        _, dtp = run(bank, s5, t5, prof_iters, trace_dir=prof_dir)
        from folve_tpu.utils.profiling import analyze_device_trace

        prof = analyze_device_trace(prof_dir)
        if prof:
            out["hbm_gbps_measured"] = round(819.0 * prof["mem_bw_frac"], 1)
            out["device_step_ms_measured"] = round(
                prof["device_time_ms"] / prof_iters, 2
            )
            out["wall_step_ms"] = round(1000.0 * dtp / prof_iters, 2)
            if prof["ops"]:
                name, ms = prof["ops"][0]
                out["top_device_op"] = name[:48]
                out["top_device_op_ms_per_step"] = round(ms / prof_iters, 2)
    except Exception:
        pass  # profiling is best-effort; the bench numbers stand alone

    # --- config 2: long-IR reverb (SantaLucia-class, 204,800 taps).
    size2 = 32768 if smoke else 204800
    ir2 = rng.standard_normal((2, 2, size2)).astype(np.float32) / np.sqrt(size2)
    bank2 = compile_filter_bank(ir2)
    out["long_ir_204800_x"] = round(run(bank2, 2 if smoke else 8, 4 if smoke else 32, 2 if smoke else 10)[0], 1)

    # --- config 1: single stream, demo-lowpass-class filter (65,536
    # taps).  S=1, T=8 — the runtime's bulk pump chunk (the
    # blocking-reader case).
    size1 = 16384 if smoke else 65536
    ir1 = rng.standard_normal((2, 2, size1)).astype(np.float32) / 256.0
    bank1 = compile_filter_bank(ir1)
    # 150 iters x 3 repeats: single-stream dispatches are tiny (~2 ms),
    # so this config is at the mercy of tunnel RTT weather (measured
    # swings 1,209 <-> 4,074x on identical code, DEVNOTES).  Report the
    # spread so a reader can tell tunnel state from regression.
    ss = sorted(run(bank1, 1, 8, 3 if smoke else 150)[0] for _ in range(3))
    out["single_stream_lowpass_x"] = round(ss[-1], 1)  # best of 3
    out["single_stream_lowpass_median_x"] = round(ss[len(ss) // 2], 1)
    out["single_stream_lowpass_spread_pct"] = round(
        100.0 * (ss[-1] - ss[0]) / ss[-1], 1
    )

    # --- MAXSIZE: 1M-tap batched serving (zita-config.h:61's upper
    # bound).  S=4 x T=32 — long-reverb mastering at scale (T=16 was
    # dispatch-amortization-bound: 1.7k vs 2.7k, fresh-process sweep).
    sizem = 65536 if smoke else 1 << 20
    irm = rng.standard_normal((2, 2, sizem)).astype(np.float32) / np.sqrt(sizem)
    bankm = compile_filter_bank(irm)
    out["maxsize_1m_x"] = round(
        run(bankm, 2 if smoke else 4, 4 if smoke else 32, 2 if smoke else 6)[0], 1
    )

    # --- latency: single-block single-stream step, forced per call.
    st = init_state(bank1)
    x1 = jax.device_put(rng.standard_normal((1, 2, bank1.fragm)).astype(np.float32))
    nv1 = np.int32(bank1.fragm)
    jstep = jax.jit(chunk_step)
    st, y = jstep(bank1, st, x1, nv1)
    float(jnp.sum(y))
    lat = []
    for _ in range(5 if smoke else 30):
        t0 = time.perf_counter()
        st, y = jstep(bank1, st, x1, nv1)
        float(jnp.sum(y))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    out["block_step_p50_ms"] = round(1000 * lat[len(lat) // 2], 2)
    out["block_step_p99_ms"] = round(1000 * lat[min(len(lat) - 1, int(len(lat) * 0.99))], 2)
    return out


def _link_probe(out, rng):
    """Direct host<->device link health measurement, so every bench
    record carries the tunnel state that RTT/D2H-bound configs (1 and 3)
    depend on.  On a real TPU VM these read as GB/s; through the dev
    tunnel D2H has measured as low as 0.4 MB/s (DEVNOTES)."""
    import jax
    import jax.numpy as jnp

    mb = 2
    host = rng.standard_normal((mb * 1024 * 1024 // 4,)).astype(np.float32)
    # H2D, once warm.
    dev = jax.device_put(host)
    float(jnp.sum(dev))  # force
    t0 = time.perf_counter()
    dev = jax.device_put(host)
    float(jnp.sum(dev))
    out["link_h2d_mbps"] = round(mb / (time.perf_counter() - t0), 1)
    t0 = time.perf_counter()
    np.asarray(dev)  # D2H
    out["link_d2h_mbps"] = round(mb / (time.perf_counter() - t0), 1)


def _runtime_configs(out, rng):
    """Configs 3 & 4 + TTFB: the real serving runtime (host + device)."""
    from folve_tpu.audio.flac import write_flac
    from folve_tpu.runtime.filesystem import FolveFilesystem
    from folve_tpu.tools.make_demo_filters import make_lowpass

    rate = 44100

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        filters = os.path.join(tmp, "filters")
        os.makedirs(src)
        make_lowpass(filters)  # writes filters/lowpass/filter-<rate>.conf

        # 6 s per track: long enough that the pipelined pump reaches
        # steady state (2 s tracks spent most of the wall in per-file
        # open/handover + first-dispatch RTT, not streaming).
        seconds = 2.0 if os.environ.get("FOLVE_BENCH_SMOKE") else 6.0
        frames = int(rate * seconds)
        for name, seed in (("01-a.flac", 1), ("02-b.flac", 2)):
            x = rng.uniform(-0.4, 0.4, (frames, 2)).astype(np.float32)
            x = np.round(x * 32768) / 32768
            write_flac(os.path.join(src, name), x, rate, bits=16)

        def make_fs(gapless):
            fs = FolveFilesystem()
            fs.underlying_dir = src
            fs.base_config_dir = filters
            fs.current_config_subdir = "lowpass"
            fs.gapless_processing = gapless
            return fs

        def read_all(h):
            blob = b""
            while True:
                d = h.read(1 << 16, len(blob))
                if not d:
                    break
                blob += d
            return blob

        # TTFB: cold (filter compile + pool miss) then warm (pool hit).
        fs = make_fs(gapless=False)
        t0 = time.perf_counter()
        h = fs.get_or_create_handler("/01-a.flac")
        h.read(1 << 16, 0)
        out["ttfb_cold_ms"] = round(1000 * (time.perf_counter() - t0), 1)
        read_all(h)
        fs.close_handler("/01-a.flac", h)
        t0 = time.perf_counter()
        h = fs.get_or_create_handler("/02-b.flac")
        h.read(1 << 16, 0)
        out["ttfb_warm_ms"] = round(1000 * (time.perf_counter() - t0), 1)
        read_all(h)
        fs.close_handler("/02-b.flac", h)

        # --- config 3: gapless two-file album join, full pipeline.
        # Three repeats: this config's wall is dominated by D2H through
        # the dev tunnel (~3 MB/s, stalls for minutes when degraded), so
        # one sample is weather, not signal.  Best/median/spread make
        # the tunnel state visible inside the bench output itself.
        runs = []
        breakdown = None
        for rep in range(4):  # first run = warmup (filter compile, jit)
            fs = make_fs(gapless=True)
            t0 = time.perf_counter()
            h1 = fs.get_or_create_handler("/01-a.flac")
            read_all(h1)  # triggers the handover into 02-b
            h2 = fs.get_or_create_handler("/02-b.flac")
            read_all(h2)
            dt = time.perf_counter() - t0
            # Where the wall time went (device dispatch+wait / D2H fetch
            # / host FLAC encode) — proves what the pipelined pump
            # overlaps.  Keep the breakdown of the BEST run.
            bk = [h.get_handler_status() for h in (h1, h2)]
            if rep > 0:
                if not runs or dt < min(runs):
                    breakdown = {
                        "wall": round(dt, 2),
                        "device_dispatch": round(sum(s.pump_dispatch_s for s in bk), 2),
                        "d2h_fetch": round(sum(s.pump_fetch_s for s in bk), 2),
                        "encode": round(sum(s.pump_encode_s for s in bk), 2),
                    }
                runs.append(dt)
            fs.close_handler("/01-a.flac", h1)
            fs.close_handler("/02-b.flac", h2)
        runs.sort()
        out["gapless_breakdown_s"] = breakdown
        out["gapless_join_x"] = round(2 * seconds / runs[0], 1)  # best of 3
        out["gapless_join_median_x"] = round(2 * seconds / runs[len(runs) // 2], 1)
        out["gapless_join_spread_pct"] = round(
            100.0 * (runs[-1] - runs[0]) / runs[-1], 1
        )

        # --- BASELINE config 5, END-TO-END: N concurrently open files
        # through the FULL pipeline — FLAC decode -> coalescing
        # DeviceScheduler (one fused batched device step) -> FLAC
        # encode — one reader thread per open file, the FUSE model.
        # The engine headline above is device-only; the reference's own
        # perf claim is end-to-end (README.md:357-364), so report both.
        # Aggregate audio-seconds served per wall second; D2H crosses
        # the link whose health link_d2h_mbps records.
        import threading

        smoke = bool(os.environ.get("FOLVE_BENCH_SMOKE"))
        n_streams = 2 if smoke else 8
        for i in range(n_streams):
            x = rng.uniform(-0.4, 0.4, (frames, 2)).astype(np.float32)
            x = np.round(x * 32768) / 32768
            write_flac(os.path.join(src, f"e2e-{i:02d}.flac"), x, rate, bits=16)

        def serve_all(fs):
            outs = [None] * n_streams

            def worker(i):
                path = f"/e2e-{i:02d}.flac"
                h = fs.get_or_create_handler(path)
                outs[i] = len(read_all(h))
                fs.close_handler(path, h)

            ts = [
                threading.Thread(target=worker, args=(i,))
                for i in range(n_streams)
            ]
            t0 = time.perf_counter()
            for th in ts:
                th.start()
            for th in ts:
                th.join()
            dt = time.perf_counter() - t0
            assert all(o and o > 1000 for o in outs), outs
            return dt

        serve_all(make_fs(gapless=False))  # warmup: batched-shape compiles
        e2e_runs = sorted(
            serve_all(make_fs(gapless=False)) for _ in range(2)
        )
        total_audio = n_streams * seconds
        out["e2e_serving_streams"] = n_streams
        out["e2e_serving_x"] = round(total_audio / e2e_runs[0], 1)
        out["e2e_serving_median_x"] = round(
            total_audio / e2e_runs[len(e2e_runs) // 2], 1
        )
        out["e2e_serving_host_cores"] = os.cpu_count()

        # --- config 4: filter switching across rates; true-compile pool
        # miss (persistent spectra cache disabled), disk-cache cold hit
        # (fresh pool, cache enabled), and in-process pool hit.
        from folve_tpu.runtime.pool import ProcessorPool

        cache_dir = os.path.join(tmp, "spectra_cache")
        saved_env = os.environ.get("FOLVE_SPECTRA_CACHE")
        cfg = os.path.join(filters, "lowpass")
        try:
            os.environ["FOLVE_SPECTRA_CACHE"] = "0"
            pool = ProcessorPool()
            misses, hits = [], []
            for r in (44100, 48000, 96000):
                t0 = time.perf_counter()
                proc, err = pool.get_or_create(cfg, r, 2, 16)
                misses.append(time.perf_counter() - t0)
                assert proc is not None, err
                pool.return_processor(proc)
                t0 = time.perf_counter()
                proc, err = pool.get_or_create(cfg, r, 2, 16)
                hits.append(time.perf_counter() - t0)
                assert proc is not None, err
                pool.return_processor(proc)
            os.environ["FOLVE_SPECTRA_CACHE"] = cache_dir
            ProcessorPool().get_or_create(cfg, 44100, 2, 16)  # populate
            pool2 = ProcessorPool()  # fresh daemon start
            t0 = time.perf_counter()
            proc, err = pool2.get_or_create(cfg, 44100, 2, 16)
            disk_hit = time.perf_counter() - t0
            assert proc is not None, err
        finally:
            if saved_env is None:
                os.environ.pop("FOLVE_SPECTRA_CACHE", None)
            else:
                os.environ["FOLVE_SPECTRA_CACHE"] = saved_env
        out["filter_switch_pool_miss_ms"] = round(1000 * max(misses), 1)
        out["filter_switch_disk_cache_ms"] = round(1000 * disk_hit, 1)
        out["filter_switch_pool_hit_ms"] = round(1000 * max(hits), 2)
        out["filter_switch_rates"] = [44100, 48000, 96000]
    return out


def _codec_configs(out, rng):
    """Host-side codec throughput (one core on this box; the codec pool
    scales these near-linearly on real multi-core serving hosts —
    bit-identity at any width is asserted by the test suite)."""
    import io
    import time

    from folve_tpu.audio.flac import read_flac, write_flac

    smoke = bool(os.environ.get("FOLVE_BENCH_SMOKE"))
    dur = 4 if smoke else 20
    rate = 44100
    t = np.arange(rate * dur) / rate
    x = np.stack(
        [0.4 * np.sin(2 * np.pi * 440 * t), 0.35 * np.sin(2 * np.pi * 660 * t)],
        axis=1,
    ).astype(np.float32)
    x += (0.02 * rng.standard_normal(x.shape)).astype(np.float32)
    x = np.round(x * 32768) / 32768

    best_enc = 1e9
    for _ in range(3):
        buf = io.BytesIO()
        t0 = time.perf_counter()
        write_flac(buf, x, rate)
        best_enc = min(best_enc, time.perf_counter() - t0)
    blob = buf.getvalue()
    best_dec = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        read_flac(blob)
        best_dec = min(best_dec, time.perf_counter() - t0)
    out["flac_encode_x"] = round(dur / best_enc, 1)
    out["flac_decode_x"] = round(dur / best_dec, 1)

    # Serving-mode encode: the FUSE path skips the MD5 pass (the served
    # header's digest field is redacted either way) — this is the
    # number the gapless/single-stream serve actually pays.
    from folve_tpu.audio.flac import FlacEncoder

    xi = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int32)
    best_srv = 1e9
    for _ in range(3):
        enc = FlacEncoder(rate, 2, bits=16, md5=False)
        t0 = time.perf_counter()
        enc.header()
        enc.write_int(xi)
        enc.finish()
        best_srv = min(best_srv, time.perf_counter() - t0)
        enc.close()
    out["flac_encode_serving_x"] = round(dur / best_srv, 1)

    # 24-bit is the DEFAULT output depth for WAV inputs (wav -> FLAC/24
    # policy, convolve-file-handler.cc:246-248), with a real noise
    # floor in the low bits — the Rice2/5-bit-parameter path.  The
    # 16-bit-grid signal above would leave 8 zero LSBs (flattering the
    # ratio); add noise below the 16-bit LSB first.
    x24 = x + (2.0 ** -17) * rng.standard_normal(x.shape)
    x24 = np.round(x24 * (1 << 23)) / (1 << 23)
    best24 = 1e9
    for _ in range(3):
        buf = io.BytesIO()
        t0 = time.perf_counter()
        write_flac(buf, x24, rate, bits=24)
        best24 = min(best24, time.perf_counter() - t0)
    out["flac_encode_24_x"] = round(dur / best24, 1)
    out["flac_ratio_24"] = round(
        len(buf.getvalue()) / (x24.shape[0] * 2 * 3), 3)
    xi24 = np.clip(
        np.round(x24 * (1 << 23)), -(1 << 23), (1 << 23) - 1
    ).astype(np.int32)
    best24s = 1e9
    for _ in range(3):
        enc = FlacEncoder(rate, 2, bits=24, md5=False)
        t0 = time.perf_counter()
        enc.header()
        enc.write_int(xi24)
        enc.finish()
        best24s = min(best24s, time.perf_counter() - t0)
        enc.close()
    out["flac_encode_24_serving_x"] = round(dur / best24s, 1)

    # Config-3 projection off the dev tunnel: on real PCIe (D2H >=
    # 1 GB/s) the int16 stream fetch (176 KB/s of audio) runs >5000x
    # realtime, so the gapless serve becomes codec-bound.  Worst case
    # fully-serial single core = harmonic sum of decode+encode; the
    # FramePool frame-parallel codecs (bit-identity asserted by
    # tests/test_parallel.py at any width) scale that near-linearly
    # with cores — 8 cores clears the 1000x bar with margin.
    serial = 1.0 / (
        1.0 / out["flac_decode_x"] + 1.0 / out["flac_encode_serving_x"]
    )
    out["gapless_projection_pcie_1core_x"] = round(serial, 0)
    out["gapless_projection_pcie_8core_x"] = round(8 * serial, 0)

    try:  # mp3 needs the lame fixture encoder; skip when absent
        from folve_tpu.tools.mp3_oracle import lame_available, lame_encode

        have_lame = lame_available()
    except Exception:
        have_lame = False
    if have_lame:
        import tempfile

        from folve_tpu.audio.mp3 import read_mp3

        with tempfile.NamedTemporaryFile(suffix=".mp3") as tf:
            tf.write(lame_encode(x, rate, 192, mode=1))
            tf.flush()
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                data, _info = read_mp3(tf.name)
                best = min(best, time.perf_counter() - t0)
            out["mp3_decode_x"] = round(data.shape[0] / rate / best, 1)

    try:  # vorbis needs a third-party-encoded fixture; skip if the
        # test oracle encoder is absent in this image
        import glob

        from folve_tpu.audio.ogg import read_ogg

        samples = glob.glob(
            "/opt/venv/lib/python3*/site-packages/pygame/examples/data/*.ogg"
        )
        if samples:
            info = None
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                data, info = read_ogg(samples[0])
                best = min(best, time.perf_counter() - t0)
            out["vorbis_decode_x"] = round(
                (info.frames / info.rate) / best, 1
            )
    except Exception:
        pass

    try:  # Opus: CELT (music) + SILK (speech) material through the
        # from-scratch decoder (fixture encoded by the libopus oracle;
        # skip when the oracle is absent in this image)
        import tempfile

        from folve_tpu.audio import read_audio
        from folve_tpu.tools.opus_oracle import (opus_available,
                                                 opus_encode_ogg)

        if opus_available():
            t = np.arange(48000 * 20) / 48000.0
            music = np.stack([
                0.35 * np.sin(2 * np.pi * 440 * t) +
                0.15 * rng.standard_normal(t.shape),
                0.35 * np.sin(2 * np.pi * 554 * t) +
                0.15 * rng.standard_normal(t.shape),
            ], axis=1).astype(np.float32)
            for key, mode, kbps, sig in (
                ("opus_decode_x", "celt", 96000, music),
                ("opus_silk_decode_x", "silk", 32000, music[:, :1]),
            ):
                with tempfile.NamedTemporaryFile(suffix=".ogg") as tf:
                    tf.write(opus_encode_ogg(sig, mode, bitrate=kbps))
                    tf.flush()
                    best = 1e9
                    info = None
                    for _ in range(3):
                        t0 = time.perf_counter()
                        data, info = read_audio(tf.name)
                        best = min(best, time.perf_counter() - t0)
                    out[key] = round((info.frames / info.rate) / best, 1)
    except Exception:
        pass


def _backend_watchdog(timeout_s: float = 180.0) -> None:
    """Fail loudly if the TPU backend cannot initialize.

    Backend init (`make_c_api_client`) blocks with no timeout of its
    own; when the tunnel endpoint is wedged (observed: a killed client
    can leave the chip held remotely for a while) the whole bench would
    hang forever and the driver records nothing.  Probe `jax.devices()`
    on a daemon thread; on timeout emit an honest one-line JSON error
    and exit non-zero instead of hanging."""
    import threading

    done = threading.Event()
    err = []

    def probe():
        try:
            import jax

            jax.devices()
        except Exception as e:  # report, don't stall 180s on a raise
            err.append(f"{type(e).__name__}: {e}")
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    timed_out = not done.wait(timeout_s)
    if timed_out or err:
        msg = {
            "metric": "audio-sec/sec/chip (realtimex), 131072-tap stereo"
                      " 44.1kHz, batched serving",
            "value": 0, "unit": "x realtime", "vs_baseline": 0,
            "error": (err[0] if err else
                      f"TPU backend init exceeded {timeout_s:.0f}s "
                      "(tunnel endpoint unresponsive)") + "; no measurement",
        }
        # Point at the most recent real measurement so a dead tunnel is
        # distinguishable from a perf regression.
        try:
            import glob
            prev = sorted(glob.glob(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_r*.json")))
            if prev:
                with open(prev[-1]) as f:
                    parsed = json.load(f).get("parsed") or {}
                if parsed.get("value"):
                    msg["last_good"] = {
                        "file": os.path.basename(prev[-1]),
                        "value": parsed["value"],
                        "vs_baseline": parsed.get("vs_baseline"),
                    }
        except Exception:
            pass
        print(json.dumps(msg))
        os._exit(3)


def main():
    import jax

    try:  # reuse compilations across driver rounds (first compile through
        # the remote-compile tunnel can take minutes)
        jax.config.update("jax_compilation_cache_dir", "/tmp/folve_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        platform = os.environ.get("FOLVE_PLATFORM")
        if platform:
            jax.config.update("jax_platforms", platform)
    except Exception:
        pass

    _backend_watchdog()
    rng = np.random.default_rng(42)
    out = {}
    _engine_configs(out, rng)
    _link_probe(out, rng)
    _runtime_configs(out, rng)
    _codec_configs(out, rng)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
