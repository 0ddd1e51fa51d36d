"""Concurrency stress: parallel readers, prefetch, gapless under load.

The reference's concurrency discipline is hand-rolled mutexes with
documented deadlock avoidance (SURVEY.md §5 'race detection'); these
tests hammer the equivalent paths.
"""

import threading
import time

import numpy as np
import pytest

from folve_tpu.audio.flac import read_flac

from tests.test_runtime import echo_ir, expected_conv, make_fs, write_song


def _read_all_threaded(handler, results, idx, chunk=32768):
    out = b""
    for _ in range(1000):
        data = handler.read(chunk, len(out))
        if not data:
            break
        out += data
    results[idx] = out


def test_parallel_streams_correct(tmp_path):
    """8 files read concurrently (the FUSE-multithread model,
    folve-main.cc:539 / README.md:362)."""
    fs, src = make_fs(tmp_path)
    n = 6 * 512 + 77
    xs = [write_song(src, f"s{i}.flac", n, seed=i) for i in range(8)]
    fs.open_file_cache.set_max_size(8)
    handlers = [fs.get_or_create_handler(f"/s{i}.flac") for i in range(8)]
    results = {}
    threads = [
        threading.Thread(target=_read_all_threaded, args=(h, results, i))
        for i, h in enumerate(handlers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "reader thread deadlocked"
    for i in range(8):
        got, _ = read_flac(results[i])
        ref = expected_conv(xs[i], echo_ir())
        assert np.max(np.abs(got - ref)) < 2.5 / 32768, f"stream {i}"
        fs.close_handler(f"/s{i}.flac", handlers[i])
    # Under concurrent load the scheduler should have fused some jobs.
    assert fs.device_scheduler.jobs > 0


def test_concurrent_same_file_readers(tmp_path):
    """Multiple threads reading ONE handler (kernel readahead does this);
    fill_until serializes per stream (conversion-buffer.cc:151-163)."""
    fs, src = make_fs(tmp_path)
    x = write_song(src, "a.flac", 4000, seed=3)
    h = fs.get_or_create_handler("/a.flac")
    results = {}
    threads = [
        threading.Thread(target=_read_all_threaded, args=(h, results, i))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive()
    blobs = set(results.values())
    assert len(blobs) == 1  # all readers saw identical bytes
    got, _ = read_flac(results[0])
    ref = expected_conv(x, echo_ir())
    assert np.max(np.abs(got - ref)) < 2.5 / 32768
    fs.close_handler("/a.flac", h)


def test_gapless_album_under_concurrent_readers(tmp_path):
    """Gapless chain with a second thread polling stats/stat the whole
    time (the status server + media player pattern)."""
    fs, src = make_fs(tmp_path, gapless=True)
    n1, n2, n3 = 512 + 100, 2 * 512 + 50, 512 + 200
    x1 = write_song(src, "t1.flac", n1, seed=1)
    x2 = write_song(src, "t2.flac", n2, seed=2)
    x3 = write_song(src, "t3.flac", n3, seed=3)
    stop = threading.Event()

    def poller():
        while not stop.is_set():
            fs.open_file_cache.get_stats()
            fs.stat_by_filename("/t2.flac")

    t = threading.Thread(target=poller)
    t.start()
    try:
        outs = []
        for name in ("t1", "t2", "t3"):
            h = fs.get_or_create_handler(f"/{name}.flac")
            results = {}
            _read_all_threaded(h, results, 0)
            outs.append(results[0])
            fs.close_handler(f"/{name}.flac", h)
    finally:
        stop.set()
        t.join(timeout=30)
    ys = [read_flac(o)[0] for o in outs]
    ref = expected_conv(np.concatenate([x1, x2, x3]), echo_ir())
    got = np.concatenate(ys)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2.5 / 32768


def test_gapless_handover_races_successor_reader(tmp_path):
    """Regression: a reader of the NEXT track racing the donor's
    handover.  passover_processor publishes the donor processor to the
    successor; before the fix this happened BEFORE the donor's split
    write, so the successor's pump could process the split block with
    its own sink (previous track's tail misrouted into the next file)
    or trip fill_buffer's full-block invariant.  The whole adoption now
    runs under the successor's pump lock.  Both outputs must match the
    continuous-convolution oracle on every iteration."""
    for it in range(6):
        fs, src = make_fs(tmp_path / f"it{it}", gapless=True)
        n1 = 2 * 512 + 300 + 17 * it  # partial block at the seam
        n2 = 3 * 512 + 100 + 13 * it
        x1 = write_song(src, "r_t1.flac", n1, seed=10 + it)
        x2 = write_song(src, "r_t2.flac", n2, seed=20 + it)

        h2 = fs.get_or_create_handler("/r_t2.flac")
        results = {}
        # Successor reader starts FIRST so it is pumping while the
        # donor reaches its final partial block and hands over.
        t2 = threading.Thread(target=_read_all_threaded, args=(h2, results, 2))
        t2.start()
        h1 = fs.get_or_create_handler("/r_t1.flac")
        t1 = threading.Thread(target=_read_all_threaded, args=(h1, results, 1))
        t1.start()
        for t in (t1, t2):
            t.join(timeout=120)
            assert not t.is_alive(), "reader deadlocked"
        fs.close_handler("/r_t1.flac", h1)
        fs.close_handler("/r_t2.flac", h2)

        y1, _ = read_flac(results[1])
        y2, _ = read_flac(results[2])
        assert y1.shape[0] == n1 and y2.shape[0] == n2
        ir = echo_ir()
        if h1.get_handler_status().out_gapless:
            # Joined: one continuous convolution across the seam.
            ref = expected_conv(np.concatenate([x1, x2]), ir)
            got = np.concatenate([y1, y2])
        else:
            # Successor had already started: two independent streams.
            ref = np.concatenate([expected_conv(x1, ir), expected_conv(x2, ir)])
            got = np.concatenate([y1, y2])
        assert np.max(np.abs(got - ref)) < 2.5 / 32768, it


@pytest.mark.parametrize("codec_threads", [0, 4])
def test_soak_everything_at_once(tmp_path, codec_threads):
    """Soak: concurrent readers across two filters (via -t-style per-open
    filter keys), mid-run filter switching, cache eviction pressure,
    status-page polling and prebuffer — all at once; every stream's
    output must match ITS filter's oracle and nothing may raise.

    Runs twice: with the codec worker pool off and ON (handler threads
    then contend for the shared FramePool while encoding AND decoding
    in parallel — the production configuration on multi-core hosts)."""
    import numpy as np
    from scipy import signal

    from folve_tpu.audio.flac import set_encoder_threads
    from folve_tpu.server.status import StatusServer
    from tests.test_runtime import RATE, make_fs, read_all, write_song

    set_encoder_threads(codec_threads)
    try:
        _soak_everything(tmp_path, np, signal, StatusServer,
                         RATE, make_fs, read_all, write_song)
    finally:
        set_encoder_threads(0)


def _soak_everything(tmp_path, np, signal, StatusServer,
                     RATE, make_fs, read_all, write_song):
    fs, src = make_fs(tmp_path)
    # Second filter with a different echo tap.
    other = tmp_path / "filters" / "other"
    other.mkdir()
    (other / f"filter-{RATE}.conf").write_text(
        "/convolver/new 2 2 64 256\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
        "/impulse/dirac 1 1 0.2 40\n/impulse/dirac 2 2 0.2 40\n"
    )
    fs.gapless_processing = True
    fs.open_file_cache.set_max_size(3)  # eviction pressure
    status = StatusServer(fs)

    def ir_for(filt):
        ir = np.zeros(512 if filt == "echo" else 256)
        if filt == "echo":
            ir[0], ir[100] = 0.7, 0.3
        else:
            ir[0], ir[40] = 0.5, 0.2
        return ir

    n_files = 6
    songs = {}
    for i in range(n_files):
        songs[f"/s{i}.flac"] = write_song(src, f"s{i}.flac", 1200 + 97 * i, seed=i)

    errors = []
    results = {}

    def reader(i):
        try:
            path = f"/s{i}.flac"
            h = fs.get_or_create_handler(path)
            # Whatever filter was current at open time stays with this
            # handler for its whole life (cache key = filter + path,
            # folve-filesystem.cc:91-94) even while the switcher runs.
            filt = h.filter_dir()
            blob = read_all(h)
            fs.close_handler(path, h)
            results[i] = (filt, blob)
        except Exception as e:  # pragma: no cover
            errors.append((i, e))

    def poller():
        try:
            for _ in range(30):
                status.handle_http("/")
                time.sleep(0.01)
        except Exception as e:  # pragma: no cover
            errors.append(("poller", e))

    def switcher():
        try:
            for f in ("other", "echo", "other", "echo"):
                status.handle_http(f"/settings?f={f}")
                time.sleep(0.03)
        except Exception as e:  # pragma: no cover
            errors.append(("switcher", e))

    threads = [threading.Thread(target=poller), threading.Thread(target=switcher)]
    for i in range(n_files):
        threads.append(threading.Thread(target=reader, args=(i,)))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results) == n_files

    from folve_tpu.audio.flac import read_flac

    for i, (filt, blob) in results.items():
        assert filt in ("echo", "other"), filt
        got, _ = read_flac(blob)
        x = songs[f"/s{i}.flac"]
        ir = ir_for(filt)
        ref = np.zeros_like(x)
        for c in range(2):
            ref[:, c] = signal.fftconvolve(x[:, c].astype(np.float64), ir)[: x.shape[0]]
        assert np.max(np.abs(got - ref)) < 2.5 / 32768, (i, filt)


def test_demo_reverb_filter_end_to_end(tmp_path):
    """Generated demo reverb (real IR file, /impulse/read + dirac mix)
    through the full pipeline."""
    from folve_tpu.filters import compile_config_file, resolve_filter_config
    from folve_tpu.tools.make_demo_filters import make_reverb

    rate = 8000
    make_reverb(str(tmp_path / "filters"), rate=rate, seconds=2.0)
    conf = resolve_filter_config(str(tmp_path / "filters" / "reverb"), rate, 2, 16)
    assert conf
    cf = compile_config_file(conf, fsamp=rate)
    # dry dirac mixed in: ir[0,0,0] has the 0.4 dry tap
    assert cf.ir[0, 0, 0] != 0.0

    fs, src = make_fs(tmp_path, filter_name="reverb")
    rng = np.random.default_rng(9)
    x = np.round(rng.uniform(-0.3, 0.3, (rate, 2)) * 32768) / 32768
    from folve_tpu.audio.flac import write_flac

    write_flac(str(src / "song.flac"), x.astype(np.float32), rate, bits=16)
    fs.current_config_subdir = "reverb"
    h = fs.get_or_create_handler("/song.flac")
    results = {}
    _read_all_threaded(h, results, 0)
    got, info = read_flac(results[0])
    assert info.rate == rate
    y = np.zeros_like(x)
    for o in range(2):
        for i in range(2):
            from scipy import signal

            y[:, o] += signal.fftconvolve(
                x[:, i].astype(np.float64), cf.ir[i, o].astype(np.float64)
            )[: x.shape[0]]
    assert np.max(np.abs(got - y)) < 3 / 32768
    fs.close_handler("/song.flac", h)
