"""Multi-host serving tier (parallel/multihost.py) on a virtual mesh.

Two simulated hosts x 2 stream-slots x 2 freq shards over the 8-device
CPU mesh.  SURVEY §2 extension: the reference has no multi-machine
analog (its only socket is the localhost status server).
"""

import jax
import numpy as np
import pytest

from folve_tpu.engine import chunk_step, compile_filter_bank, init_state


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh(freq=2):
    from folve_tpu.parallel.multihost import make_multihost_serving_mesh

    return make_multihost_serving_mesh(n_hosts=2, freq_parallel=freq)


def _bank(rng, size=512, fragm=128):
    ir = rng.standard_normal((2, 2, size)).astype(np.float32) / 16
    return compile_filter_bank(ir, fragm=fragm, size=size)


def test_mesh_keeps_freq_groups_on_one_host():
    mesh = _mesh()
    assert mesh.shape == {"host": 2, "stream": 2, "freq": 2}
    # Each host row must be a contiguous process-local device group —
    # that is what keeps the freq psum on ICI instead of DCN.
    devs = np.asarray(mesh.devices, dtype=object)
    flat_host0 = {d.id for d in devs[0].ravel()}
    flat_host1 = {d.id for d in devs[1].ravel()}
    assert flat_host0 == {0, 1, 2, 3}
    assert flat_host1 == {4, 5, 6, 7}


def _collective_groups(hlo: str):
    """Explicit replica_groups={{...},{...}} occurrences as id lists."""
    import re

    groups = []
    for m in re.finditer(r"replica_groups=\{(\{[^=]*?\})\}", hlo):
        for g in re.findall(r"\{([0-9,\s]+)\}", m.group(1)):
            groups.append([int(v) for v in g.split(",") if v.strip()])
    return groups


@pytest.mark.parametrize("freq", [1, 2])
def test_collectives_never_span_hosts(freq):
    """The ONLY collective in the compiled step is the freq psum, and
    its replica groups stay inside one host's device block — DCN carries
    no tensor traffic, only program-launch coordination."""
    from folve_tpu.parallel import multihost as mh

    mesh = _mesh(freq=freq)
    rng = np.random.default_rng(0)
    bank = _bank(rng)
    s_local = 4 // freq
    srv = mh.SlotServer(mesh, bank, s_local=s_local, t=2)
    s = 2 * s_local
    lowered = srv._step.lower(
        srv._h, srv._hist_re, srv._hist_im, srv._tail, srv._max,
        jax.device_put(np.zeros((s, 2, 2, bank.fragm), np.float32),
                       jax.sharding.NamedSharding(mesh, mh.SPEC_X)),
        jax.device_put(np.zeros(s, np.int32),
                       jax.sharding.NamedSharding(mesh, mh.SPEC_SCALAR)),
        jax.device_put(np.zeros(s, bool),
                       jax.sharding.NamedSharding(mesh, mh.SPEC_SCALAR)),
    )
    hlo = lowered.compile().as_text()
    host_of = {d.id: h for h, row in enumerate(
        np.asarray(mesh.devices, dtype=object)) for d in row.ravel()}
    groups = _collective_groups(hlo)
    assert groups, "expected the freq psum's replica groups in the HLO"
    for g in groups:
        hosts = {host_of[i] for i in g}
        assert len(hosts) == 1, f"collective group {g} spans hosts {hosts}"
        assert len(g) <= freq  # psum is over freq only, never stream


def test_slot_server_matches_single_device_bit_exact():
    """4 global slots over 2 hosts, 4 ticks, with one slot joining late
    and one pausing mid-stream — every served block equals the
    single-device engine's output, and a frozen slot resumes exactly."""
    from folve_tpu.parallel.multihost import SlotServer

    mesh = _mesh()
    rng = np.random.default_rng(7)
    bank = _bank(rng)
    t = 2
    srv = SlotServer(mesh, bank, s_local=2, t=t)
    n_ticks, s = 4, 4
    xs = rng.standard_normal((n_ticks, s, t, 2, bank.fragm)).astype(np.float32)

    # Slot 3 joins at tick 1; slot 1 pauses during tick 2.
    feeds = []  # per tick: which rows are fed, with which stream-step
    progress = [0] * s
    got = [[] for _ in range(s)]
    for tick in range(n_ticks):
        rows = [r for r in range(s)
                if not (r == 3 and tick < 1) and not (r == 1 and tick == 2)]
        blocks = {r: xs[progress[r], r] for r in rows}
        feeds.append({r: progress[r] for r in rows})
        ys = srv.tick(blocks)
        for r in rows:
            got[r].append((progress[r], ys[r]))
            progress[r] += 1

    for r in range(s):
        st = init_state(bank)
        step_i = 0
        for i, y in got[r]:
            assert i == step_i  # paused slots must not have advanced
            st, ref = chunk_step(bank, st, xs[i, r], t * bank.fragm)
            np.testing.assert_allclose(
                y, np.asarray(ref), atol=1e-5,
                err_msg=f"slot {r} diverged at its step {i}",
            )
            step_i += 1


def test_slot_reset_reclaims_for_new_stream():
    from folve_tpu.parallel.multihost import SlotServer

    mesh = _mesh()
    rng = np.random.default_rng(11)
    bank = _bank(rng)
    srv = SlotServer(mesh, bank, s_local=2, t=2)
    x1 = rng.standard_normal((2, 2, 2, bank.fragm)).astype(np.float32)
    srv.tick({0: x1[0]})
    srv.tick({0: x1[1]})  # stream A used slot 0 for two blocks
    srv.reset_slot(0)
    xb = rng.standard_normal((2, 2, bank.fragm)).astype(np.float32)
    y = srv.tick({0: xb})[0]
    st, ref = chunk_step(bank, init_state(bank), xb, 2 * bank.fragm)
    np.testing.assert_allclose(y, np.asarray(ref), atol=1e-5)


def test_partial_final_block_n_valid():
    from folve_tpu.parallel.multihost import SlotServer

    mesh = _mesh()
    rng = np.random.default_rng(13)
    bank = _bank(rng)
    t = 2
    srv = SlotServer(mesh, bank, s_local=2, t=t)
    x = rng.standard_normal((t, 2, bank.fragm)).astype(np.float32)
    nv = t * bank.fragm - 77
    y = srv.tick({2: x}, n_valid={2: nv})[2]
    st, ref = chunk_step(bank, init_state(bank), x, nv)
    np.testing.assert_allclose(y, np.asarray(ref), atol=1e-5)


# --- REAL two-process jax.distributed run (VERDICT r3 #4) ------------------


def test_two_process_distributed_matches_virtual_mesh(tmp_path):
    """Spawns TWO real processes coordinated via jax.distributed on
    CPU.  Each owns 2 devices (stream x freq grid) and feeds only its
    own slot rows — exercising SlotServer's multi-process branches
    (make_array_from_process_local_data assembly, foreign-row
    rejection, addressable-shard readback with freq-replica dedup)
    that the single-process virtual mesh cannot reach.  Outputs must
    match the virtual-mesh reference bit-for-bit."""
    import os
    import socket
    import subprocess
    import sys

    from tests._slotserver_worker import make_inputs

    # free port for the coordination service
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    worker = os.path.join(os.path.dirname(__file__), "_slotserver_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    # APPEND the repo (don't clobber: the image routes sitecustomize
    # through PYTHONPATH)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = [str(tmp_path / f"w{p}.npz") for p in range(2)]
    for p in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(p), "2", coord, outs[p]],
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {p} timed out")
        logs.append(out.decode(errors="replace"))
        assert proc.returncode == 0, f"worker {p} failed:\n{logs[-1]}"
        assert "WORKER_OK" in logs[-1]

    # Virtual-mesh reference: same bank, same feed, one process driving
    # both simulated hosts over 4 of the session's virtual devices.
    from folve_tpu.parallel.multihost import (
        SlotServer,
        make_multihost_serving_mesh,
    )

    rng = np.random.default_rng(5)
    size = 4096
    ir = (rng.standard_normal((2, 2, size)) / np.sqrt(size)).astype(np.float32)
    bank = compile_filter_bank(ir)
    mesh = make_multihost_serving_mesh(
        n_hosts=2, freq_parallel=2, devices=jax.devices()[:4]
    )
    srv = SlotServer(mesh, bank, s_local=2, t=2)
    expect = {}
    for tick in range(3):
        x_blocks = {row: make_inputs(row, tick, 2, 2, bank.fragm)
                    for row in range(4)}
        if tick == 2:
            del x_blocks[1]
            del x_blocks[3]
        y = srv.tick(x_blocks)
        for row, blk in y.items():
            expect[f"r{row}_t{tick}"] = blk

    got = {}
    for p in range(2):
        with np.load(outs[p]) as z:
            for k in z.files:
                got[k] = z[k]
    assert sorted(got) == sorted(expect)
    for k in sorted(expect):
        np.testing.assert_allclose(got[k], expect[k], atol=1e-6, err_msg=k)
