"""Operational-longevity soak: a REAL kernel mount replaying the player
behaviors the reference was hardened against (README.md:355-382 — its
entire QA story was operational longevity), with memory bounds.

Run with ``pytest -m soak tests/test_soak.py``; duration defaults to
600 s, override with FOLVE_SOAK_SECS (CI smoke uses a short value).

Behaviors replayed in a randomized loop (each maps to a documented
reference workaround):
  * stat-polling while a file plays (minidlna / players polling size)
  * header-only indexing sweeps that must never start the convolver
    (conversion-buffer.cc:165-192 short-read rule)
  * end-skip reads near EOF (convolve-file-handler.cc:107-126)
  * re-opens of recently played files (handler cache reuse)
  * filter switches mid-play via the control API
    (folve-filesystem.cc:212-228)
  * sequential album reads (gapless handover)

Bounds asserted at the end:
  * RSS growth after warmup stays under a fixed budget
  * the handler cache never exceeds its configured max
  * the status server still responds and reports sane stats
"""

import os
import random
import threading
import time

import numpy as np
import pytest

from folve_tpu.fuse.mount import FuseSession
from folve_tpu.server.status import StatusServer
from folve_tpu.server.vfs import FolveVfs

from tests.test_runtime import make_fs, write_song

pytestmark = pytest.mark.soak


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


@pytest.mark.skipif(not os.path.exists("/dev/fuse"), reason="no /dev/fuse")
def test_kernel_mount_soak(tmp_path):
    secs = float(os.environ.get("FOLVE_SOAK_SECS", "600"))
    rng = random.Random(42)

    fs, src = make_fs(tmp_path, gapless=True)
    # A second filter so switches exercise the pool/cache key paths.
    alt = tmp_path / "filters" / "alt"
    alt.mkdir()
    (alt / "filter-44100.conf").write_text(
        "/convolver/new 2 2 64 512\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    # An album (alphabetic successors for gapless) + standalone tracks.
    names = []
    for i in range(4):
        n = f"album-{i:02d}.flac"
        write_song(src, n, 44100 // 2, seed=i)
        names.append(n)
    for i in range(4):
        n = f"track-{chr(ord('p') + i)}.flac"
        write_song(src, n, 44100 // 4, seed=10 + i)
        names.append(n)

    status = StatusServer(fs)
    vfs = FolveVfs(fs, status_server=status)
    mnt = tmp_path / "mnt"
    mnt.mkdir()
    session = FuseSession(vfs)
    try:
        session.mount(str(mnt))
    except OSError as e:
        pytest.skip(f"mount not permitted here: {e}")
    t = threading.Thread(target=session.loop, daemon=True)
    t.start()

    stats = {"plays": 0, "indexes": 0, "stats": 0, "switches": 0,
             "endskips": 0, "reopens": 0}
    errors = []
    rss_after_warmup = None

    def play(name, whole=True):
        with open(mnt / name, "rb") as f:
            while True:
                b = f.read(65536)
                if not b:
                    break
                if not whole and rng.random() < 0.3:
                    break
        stats["plays"] += 1

    def index_sweep():
        # Header-only reads over every file (a player building its
        # library) — must never convolve whole files.
        for n in os.listdir(mnt):
            p = mnt / n
            if not n.endswith(".flac"):
                continue
            with open(p, "rb") as f:
                f.read(4096)
        stats["indexes"] += 1

    def stat_poll():
        for n in names:
            os.stat(mnt / n)
        stats["stats"] += 1

    def end_skip(name):
        with open(mnt / name, "rb") as f:
            size = os.fstat(f.fileno()).st_size
            f.seek(max(0, size - 8192))
            f.read(8192)
        stats["endskips"] += 1

    def switch():
        cur = fs.current_config_subdir
        fs.switch_current_config_dir("alt" if cur == "echo" else "echo")
        stats["switches"] += 1

    deadline = time.time() + secs
    warmup_at = time.time() + min(secs * 0.25, 60.0)
    actions = [lambda: play(rng.choice(names), whole=rng.random() < 0.5),
               index_sweep, stat_poll,
               lambda: end_skip(rng.choice(names)),
               switch,
               lambda: play("album-00.flac")]  # gapless chain seed
    try:
        while time.time() < deadline:
            try:
                rng.choice(actions)()
            except OSError as e:
                errors.append(repr(e))
                if len(errors) > 3:
                    break
            if rss_after_warmup is None and time.time() >= warmup_at:
                rss_after_warmup = _rss_mb()
            stats["reopens"] = fs.total_file_reopen
        rss_end = _rss_mb()
    finally:
        session.unmount()

    assert not errors, errors
    assert stats["plays"] > 0 and stats["indexes"] > 0
    # Handler cache bounded at its configured max (+ pins in flight).
    assert fs.open_file_cache.size() <= fs.open_file_cache.max_size + 2, (
        fs.open_file_cache.size())
    # Status page still renders and carries sane counters.
    page = status.create_page()
    assert b"folve" in page.lower()
    # RSS growth after warmup bounded: spill buffers are per-handler and
    # the caches are capped, so a leak shows as monotone growth here.
    assert rss_after_warmup is not None
    growth = rss_end - rss_after_warmup
    assert growth < 256.0, (
        f"RSS grew {growth:.0f} MB after warmup "
        f"({rss_after_warmup:.0f} -> {rss_end:.0f})")
    print(f"soak ok: {stats}, rss {rss_after_warmup:.0f} -> {rss_end:.0f} MB")
