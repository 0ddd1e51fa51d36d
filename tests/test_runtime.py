"""Runtime integration tests: the in-process fake-VFS harness.

The reference has no tests; SURVEY.md §4 prescribes an in-process
harness driving open/read/stat/release sequences that replay real player
behaviors (header-only indexing, size polling, end-skip) plus gapless
join bit-exactness.  These are those tests.
"""

import os
import time

import numpy as np
import pytest
from scipy import signal

from folve_tpu.audio import read_audio
from folve_tpu.audio.flac import write_flac
from folve_tpu.audio.wav import write_wav
from folve_tpu.audio.types import SampleCodec
from folve_tpu.runtime import FolveFilesystem, PassThroughHandler, ConvolveFileHandler

RATE = 44100


def make_fs(tmp_path, conf_text=None, gapless=False, filter_name="echo",
            serving_mesh=None):
    src = tmp_path / "src"
    cfg = tmp_path / "filters" / filter_name
    os.makedirs(src, exist_ok=True)
    os.makedirs(cfg, exist_ok=True)
    if conf_text is None:
        conf_text = (
            "/convolver/new 2 2 64 512\n"
            "/impulse/dirac 1 1 0.7 0\n"
            "/impulse/dirac 2 2 0.7 0\n"
            "/impulse/dirac 1 1 0.3 100\n"
            "/impulse/dirac 2 2 0.3 100\n"
        )
    (cfg / f"filter-{RATE}.conf").write_text(conf_text)
    fs = FolveFilesystem(serving_mesh=serving_mesh)
    fs.underlying_dir = str(src)
    fs.base_config_dir = str(tmp_path / "filters")
    fs.current_config_subdir = filter_name
    fs.gapless_processing = gapless
    assert fs.check_initialized()
    return fs, src


def echo_ir(size=512):
    ir = np.zeros(size)
    ir[0] = 0.7
    ir[100] = 0.3
    return ir


def write_song(src_dir, name, frames, seed=0, amp=0.4):
    rng = np.random.default_rng(seed)
    x = (rng.uniform(-amp, amp, (frames, 2))).astype(np.float32)
    # Round to 16-bit grid so FLAC decode returns exactly this.
    x = np.round(x * 32768) / 32768
    write_flac(str(src_dir / name), x, RATE, bits=16)
    return x


def read_all(handler, chunk=65536, cap=400):
    out = b""
    for _ in range(cap):
        data = handler.read(chunk, len(out))
        if not data:
            break
        out += data
    return out


def expected_conv(x, ir):
    y = np.zeros_like(x)
    for c in range(x.shape[1]):
        y[:, c] = signal.fftconvolve(x[:, c].astype(np.float64), ir)[: x.shape[0]]
    return y


class TestEndToEnd:
    def test_flac_convolve_roundtrip(self, tmp_path):
        fs, src = make_fs(tmp_path)
        x = write_song(src, "song.flac", 3 * 512 + 123)
        h = fs.get_or_create_handler("/song.flac")
        assert isinstance(h, ConvolveFileHandler)
        blob = read_all(h)
        got, info = read_audio_bytes(blob)
        assert info.rate == RATE and info.channels == 2
        assert got.shape[0] == x.shape[0]
        ref = expected_conv(x, echo_ir())
        err = np.max(np.abs(got - ref))
        assert err < 2.5 / 32768  # 16-bit quantization budget
        fs.close_handler("/song.flac", h)

    def test_wav_input_becomes_flac24(self, tmp_path):
        fs, src = make_fs(tmp_path)
        rng = np.random.default_rng(7)
        x = rng.uniform(-0.4, 0.4, (1000, 2)).astype(np.float32)
        write_wav(str(src / "a.wav"), x, RATE, SampleCodec.PCM_16)
        h = fs.get_or_create_handler("/a.wav")
        assert isinstance(h, ConvolveFileHandler)
        blob = read_all(h)
        assert blob[:4] == b"fLaC"
        got, info = read_audio_bytes(blob)
        assert info.bits_per_sample == 24
        x16 = np.round(x * 32768) / 32768
        ref = expected_conv(x16, echo_ir())
        assert np.max(np.abs(got - ref)) < 4 / 8388608
        fs.close_handler("/a.wav", h)

    def test_non_audio_passthrough(self, tmp_path):
        fs, src = make_fs(tmp_path)
        (src / "notes.txt").write_bytes(b"hello world")
        h = fs.get_or_create_handler("/notes.txt")
        assert isinstance(h, PassThroughHandler)
        assert h.read(100, 0) == b"hello world"
        fs.close_handler("/notes.txt", h)

    def test_empty_filter_passthrough(self, tmp_path):
        fs, src = make_fs(tmp_path)
        fs.current_config_subdir = ""
        x = write_song(src, "song.flac", 1000)
        h = fs.get_or_create_handler("/song.flac")
        assert isinstance(h, PassThroughHandler)
        raw = open(src / "song.flac", "rb").read()
        assert h.read(len(raw) + 10, 0) == raw
        fs.close_handler("/song.flac", h)

    def test_verbatim_flac_header_copied_and_patched(self, tmp_path):
        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 5000)
        h = fs.get_or_create_handler("/song.flac")
        hdr = h.read(8 + 34, 0)
        assert hdr[:4] == b"fLaC"
        # Patched blocksize = encoder blocksize (4096) in min and max.
        assert hdr[8:10] == (4096).to_bytes(2, "big")
        assert hdr[10:12] == (4096).to_bytes(2, "big")
        # Frame sizes zeroed.
        assert hdr[12:18] == bytes(6)
        # MD5 redacted.
        assert hdr[8 + 18 : 8 + 34] == bytes(16)
        # Total samples preserved (bytes 21-25 tail of streaminfo).
        total = int.from_bytes(hdr[21:26], "big") & ((1 << 36) - 1)
        assert total == 5000
        fs.close_handler("/song.flac", h)


def read_audio_bytes(blob):
    from folve_tpu.audio.flac import read_flac

    return read_flac(blob)


class TestPlayerBehaviors:
    def test_header_only_read_does_not_convolve(self, tmp_path):
        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 200000)
        h = fs.get_or_create_handler("/song.flac")
        header_size = h._buffer.header_size()
        assert header_size > 0
        h.read(header_size, 0)  # metadata indexing
        assert h._buffer.file_size() == header_size  # no audio produced
        fs.close_handler("/song.flac", h)

    def test_end_skip_returns_zeros(self, tmp_path):
        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 500000)
        h = fs.get_or_create_handler("/song.flac")
        st = h.stat()
        produced_before = h._buffer.file_size()
        data = h.read(4096, st.st_size - 4096)  # skip to the end (indexing)
        assert data == bytes(4096)
        assert h._buffer.file_size() == produced_before  # nothing convolved
        fs.close_handler("/song.flac", h)

    def test_stat_size_estimation_monotonic(self, tmp_path):
        fs, src = make_fs(tmp_path)
        x = write_song(src, "song.flac", 300000)
        h = fs.get_or_create_handler("/song.flac")
        initial = h.stat().st_size
        original = os.stat(src / "song.flac").st_size
        assert initial == int(original * fs.file_oversize_factor)
        sizes = [initial]
        offset = 0
        for _ in range(40):
            data = h.read(65536, offset)
            if not data:
                break
            offset += len(data)
            sizes.append(h.stat().st_size)
        assert all(b >= a for a, b in zip(sizes, sizes[1:]))
        fs.close_handler("/song.flac", h)


class TestCachesAndPool:
    def test_reopen_uses_cache(self, tmp_path):
        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 2000)
        h1 = fs.get_or_create_handler("/song.flac")
        out1 = read_all(h1)
        fs.close_handler("/song.flac", h1)
        h2 = fs.get_or_create_handler("/song.flac")
        assert h2 is h1  # cached, idle handler reused
        assert fs.total_file_reopen == 1
        # Re-read served from the spill file, bit-identical.
        assert read_all(h2) == out1
        fs.close_handler("/song.flac", h2)

    def test_cache_evicts_oldest_idle(self, tmp_path):
        fs, src = make_fs(tmp_path)
        fs.open_file_cache.set_max_size(2)
        for i in range(4):
            write_song(src, f"s{i}.flac", 600, seed=i)
        handlers = []
        for i in range(4):
            h = fs.get_or_create_handler(f"/s{i}.flac")
            read_all(h)
            fs.close_handler(f"/s{i}.flac", h)
            handlers.append(h)
        assert fs.open_file_cache.size() <= 2

    def test_filter_switch_keeps_old_handler_key(self, tmp_path):
        fs, src = make_fs(tmp_path)
        other = tmp_path / "filters" / "other"
        os.makedirs(other)
        (other / f"filter-{RATE}.conf").write_text(
            "/convolver/new 2 2 64 128\n/impulse/dirac 1 1 1.0 0\n/impulse/dirac 2 2 1.0 0\n"
        )
        write_song(src, "song.flac", 1500)
        h1 = fs.get_or_create_handler("/song.flac")
        assert fs.switch_current_config_dir("other")
        h2 = fs.get_or_create_handler("/song.flac")
        assert h2 is not h1  # cache key includes the filter
        assert h1.filter_dir() == "echo" and h2.filter_dir() == "other"
        fs.close_handler("/song.flac", h1)
        fs.close_handler("/song.flac", h2)

    def test_processor_pool_reuse_and_staleness(self, tmp_path):
        fs, src = make_fs(tmp_path)
        cfg_dir = os.path.join(fs.base_config_dir, "echo")
        p1, msg = fs.processor_pool.get_or_create(cfg_dir, RATE, 2, 16)
        assert p1 is not None, msg
        fs.processor_pool.return_processor(p1)
        p2, _ = fs.processor_pool.get_or_create(cfg_dir, RATE, 2, 16)
        assert p2 is p1  # pooled
        fs.processor_pool.return_processor(p2)
        # Touch the config: pooled processor must be discarded.
        conf = os.path.join(cfg_dir, f"filter-{RATE}.conf")
        os.utime(conf, (time.time() + 5, time.time() + 5))
        p3, _ = fs.processor_pool.get_or_create(cfg_dir, RATE, 2, 16)
        assert p3 is not p1
        fs.processor_pool.return_processor(p3)

    def test_no_filter_for_rate_falls_back_passthrough(self, tmp_path):
        fs, src = make_fs(tmp_path)
        rng = np.random.default_rng(1)
        x = rng.uniform(-0.3, 0.3, (500, 2)).astype(np.float32)
        write_wav(str(src / "hi.wav"), x, 96000, SampleCodec.PCM_16)
        h = fs.get_or_create_handler("/hi.wav")
        assert isinstance(h, PassThroughHandler)
        stats = h.get_handler_status()
        assert "No filter" in stats.message
        fs.close_handler("/hi.wav", h)


class TestGapless:
    def test_two_file_join_is_continuous_convolution(self, tmp_path):
        fs, src = make_fs(tmp_path, gapless=True)
        n1, n2 = 2 * 512 + 300, 3 * 512 + 100  # partial blocks at the seam
        x1 = write_song(src, "a_track1.flac", n1, seed=1)
        x2 = write_song(src, "a_track2.flac", n2, seed=2)

        h1 = fs.get_or_create_handler("/a_track1.flac")
        out1 = read_all(h1)
        s1 = h1.get_handler_status()
        assert s1.out_gapless, "handover should have happened at EOF"
        fs.close_handler("/a_track1.flac", h1)

        h2 = fs.get_or_create_handler("/a_track2.flac")
        assert h2.get_handler_status().in_gapless
        out2 = read_all(h2)
        fs.close_handler("/a_track2.flac", h2)

        y1, _ = read_audio_bytes(out1)
        y2, _ = read_audio_bytes(out2)
        assert y1.shape[0] == n1 and y2.shape[0] == n2
        ref = expected_conv(np.concatenate([x1, x2]), echo_ir())
        got = np.concatenate([y1, y2])
        assert np.max(np.abs(got - ref)) < 2.5 / 32768

    def test_successor_prewarmed_before_eof(self, tmp_path):
        """Nearing EOF with gapless on, the successor's handler is built
        in the background BEFORE the handover (VERDICT r4 item 4: the
        reference only prebuffers at handover,
        convolve-file-handler.cc:414)."""
        fs, src = make_fs(tmp_path, gapless=True)
        write_song(src, "c_track1.flac", 30000, seed=1)
        write_song(src, "c_track2.flac", 3000, seed=2)
        h1 = fs.get_or_create_handler("/c_track1.flac")
        # Pump past the header into the body (a header-area read is a
        # short read and convolves nothing), but stay well short of EOF:
        # ~20k of track1's 30k frames, inside the prewarm window.
        h1.read(1 << 14, 0)
        h1.read(1 << 14, 65536)
        stats = []
        deadline = time.time() + 10
        while time.time() < deadline:
            stats = [s.filename for s in fs.open_file_cache.get_stats()]
            if "/c_track2.flac" in stats:
                break
            time.sleep(0.05)
        assert "/c_track2.flac" in stats, stats
        # The prewarmed successor is unpinned (cached, not leaked) and
        # has not started streaming — the handover must still succeed
        # AND must REUSE the prewarmed handler: no new file opening may
        # happen at the seam (a prefer_gapless eviction of the prewarm
        # would rebuild it, wasting the prewarm — the regression this
        # pins down).
        openings_before = fs.total_file_openings
        out1 = read_all(h1)
        assert h1.get_handler_status().out_gapless
        assert fs.total_file_openings == openings_before, (
            "gapless handover rebuilt the successor instead of adopting"
            " the prewarmed handler")
        fs.close_handler("/c_track1.flac", h1)
        h2 = fs.get_or_create_handler("/c_track2.flac")
        assert h2.get_handler_status().in_gapless
        read_all(h2)
        fs.close_handler("/c_track2.flac", h2)
        assert out1  # stream completed

    def test_no_gapless_when_disabled(self, tmp_path):
        fs, src = make_fs(tmp_path, gapless=False)
        write_song(src, "t1.flac", 700, seed=1)
        write_song(src, "t2.flac", 700, seed=2)
        h1 = fs.get_or_create_handler("/t1.flac")
        read_all(h1)
        assert not h1.get_handler_status().out_gapless
        fs.close_handler("/t1.flac", h1)


class TestConversionBuffer:
    def test_header_short_reads(self, tmp_path):
        from folve_tpu.runtime.conversion_buffer import ConversionBuffer

        calls = []

        class Src:
            def add_more_sound_data(self):
                calls.append(1)
                return False

        buf = ConversionBuffer(Src())
        buf.append(b"HEADERDATA")
        buf.header_finished()
        # Reads inside the header: short, no pump.
        assert buf.read(100, 0) == b"HEADERDATA"
        assert calls == []
        # Read past the header pumps the source.
        buf.read(10, 10)
        assert calls == [1]

    def test_max_accessed_vs_file_size(self, tmp_path):
        from folve_tpu.runtime.conversion_buffer import ConversionBuffer

        class Src:
            def __init__(self):
                self.n = 0

            def add_more_sound_data(self):
                self.n += 1
                buf.append(b"x" * 100)
                return self.n < 50

        src = Src()
        buf = ConversionBuffer(src)
        buf.append(b"h" * 10)
        buf.header_finished()
        buf.read(20, 10)
        assert buf.max_accessed() == 30
        assert buf.file_size() >= 30  # may have produced more than accessed


class TestPrebuffer:
    def test_prebuffer_fills_ahead(self, tmp_path):
        fs, src = make_fs(tmp_path)
        fs.pre_buffer_size = 1 << 20
        write_song(src, "song.flac", 400000)
        h = fs.get_or_create_handler("/song.flac")
        # Read beyond header+64k to trigger the prefetcher.
        hdr = h._buffer.header_size()
        offset = 0
        while offset < hdr + (64 << 10) + 4096:
            data = h.read(16384, offset)
            if not data:
                break
            offset += len(data)
        deadline = time.time() + 30
        target = offset + (1 << 18)
        while time.time() < deadline and h._buffer.file_size() < target:
            if h._buffer.is_file_complete():
                break
            time.sleep(0.05)
        assert h._buffer.file_size() >= min(target, h._buffer.file_size() + 0) or \
            h._buffer.is_file_complete()
        assert h._buffer.file_size() > offset  # produced beyond what was read
        fs.close_handler("/song.flac", h)


class TestFailureModes:
    def test_truncated_flac_premature_eof(self, tmp_path):
        """Corrupt/short input closes the stream cleanly with a message
        (convolve-file-handler.cc:378-386)."""
        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 30000)
        blob = (src / "song.flac").read_bytes()
        # Cut the file in half: STREAMINFO still claims 30000 frames but
        # only a few complete FLAC frames remain.
        (src / "song.flac").write_bytes(blob[: len(blob) // 2])
        h = fs.get_or_create_handler("/song.flac")
        out = read_all(h)
        stats = h.get_handler_status()
        assert "premature eof" in stats.message.lower()
        # Whatever was produced is still a valid FLAC prefix.
        from folve_tpu.audio.flac import read_flac

        got, _ = read_flac(out)
        assert 0 < got.shape[0] < 30000
        fs.close_handler("/song.flac", h)

    def test_broken_filter_config_falls_back(self, tmp_path):
        fs, src = make_fs(tmp_path, conf_text="/convolver/bogus nonsense\n")
        write_song(src, "song.flac", 800)
        h = fs.get_or_create_handler("/song.flac")
        assert isinstance(h, PassThroughHandler)
        assert "Problem parsing" in h.get_handler_status().message
        fs.close_handler("/song.flac", h)

    def test_unreadable_file_returns_none(self, tmp_path):
        fs, src = make_fs(tmp_path)
        assert fs.get_or_create_handler("/ghost.flac") is None


class TestMultiRate:
    """BASELINE config 4: filter resolution + pool across sample rates."""

    def test_per_rate_filter_resolution(self, tmp_path):
        fs, src = make_fs(tmp_path)
        cfg = tmp_path / "filters" / "echo"
        # Distinct delays per rate so outputs prove which config ran.
        for rate, delay in ((48000, 120), (96000, 240)):
            (cfg / f"filter-{rate}.conf").write_text(
                "/convolver/new 2 2 64 512\n"
                "/impulse/dirac 1 1 0.7 0\n/impulse/dirac 2 2 0.7 0\n"
                f"/impulse/dirac 1 1 0.3 {delay}\n/impulse/dirac 2 2 0.3 {delay}\n"
            )
        for rate, delay in ((44100, 100), (48000, 120), (96000, 240)):
            rng = np.random.default_rng(rate)
            x = np.round(rng.uniform(-0.4, 0.4, (1500, 2)) * 32768) / 32768
            write_flac(str(src / f"s{rate}.flac"), x.astype(np.float32), rate, bits=16)
            h = fs.get_or_create_handler(f"/s{rate}.flac")
            blob = read_all(h)
            got, info = read_audio_bytes(blob)
            assert info.rate == rate
            ir = np.zeros(512)
            ir[0], ir[delay] = 0.7, 0.3
            ref = expected_conv(x, ir)
            assert np.max(np.abs(got - ref)) < 2.5 / 32768, f"rate {rate}"
            fs.close_handler(f"/s{rate}.flac", h)

    def test_channel_specific_config_wins(self, tmp_path):
        fs, src = make_fs(tmp_path)
        cfg = tmp_path / "filters" / "echo"
        # Mono-specific config with a pure 0.5 gain.
        (cfg / f"filter-{RATE}-1.conf").write_text(
            "/convolver/new 1 1 64 64\n/impulse/dirac 1 1 0.5 0\n"
        )
        rng = np.random.default_rng(5)
        x = np.round(rng.uniform(-0.4, 0.4, (800, 1)) * 32768) / 32768
        write_flac(str(src / "mono.flac"), x.astype(np.float32), RATE, bits=16)
        h = fs.get_or_create_handler("/mono.flac")
        blob = read_all(h)
        got, info = read_audio_bytes(blob)
        assert info.channels == 1
        assert np.max(np.abs(got - 0.5 * x)) < 2.5 / 32768
        fs.close_handler("/mono.flac", h)


class TestGaplessEdgeCases:
    def test_exact_block_multiple_closes_cleanly(self, tmp_path):
        """A file of exactly N full blocks: the bulk pump must leave the
        last block for fill_buffer so EOF / close() fires, and no
        handover happens (there is no partial block to bridge)."""
        fs, src = make_fs(tmp_path, gapless=True)
        n = 6 * 512  # exact block multiple (fragm=512)
        x1 = write_song(src, "t1.flac", n, seed=1)
        write_song(src, "t2.flac", 700, seed=2)
        h1 = fs.get_or_create_handler("/t1.flac")
        out1 = read_all(h1)
        assert not h1.get_handler_status().out_gapless
        fs.close_handler("/t1.flac", h1)
        y1, _ = read_audio_bytes(out1)
        assert y1.shape[0] == n
        ref = expected_conv(x1, echo_ir())
        assert np.max(np.abs(y1 - ref)) < 2.5 / 32768

    def test_mixed_bit_depth_gapless_join(self, tmp_path):
        """16-bit track into a 24-bit successor: the split block stays
        float so each side's encoder quantizes at its own depth."""
        fs, src = make_fs(tmp_path, gapless=True)
        rng = np.random.default_rng(5)
        n1, n2 = 2 * 512 + 300, 2 * 512 + 100
        x1 = np.round(rng.uniform(-0.4, 0.4, (n1, 2)) * 32768) / 32768
        x2 = np.round(rng.uniform(-0.4, 0.4, (n2, 2)) * (1 << 23)) / (1 << 23)
        write_flac(str(src / "m1.flac"), x1.astype(np.float32), RATE, bits=16)
        write_flac(str(src / "m2.flac"), x2.astype(np.float32), RATE, bits=24)
        h1 = fs.get_or_create_handler("/m1.flac")
        out1 = read_all(h1)
        assert h1.get_handler_status().out_gapless
        fs.close_handler("/m1.flac", h1)
        h2 = fs.get_or_create_handler("/m2.flac")
        assert h2.get_handler_status().in_gapless
        out2 = read_all(h2)
        fs.close_handler("/m2.flac", h2)
        y1, info1 = read_audio_bytes(out1)
        y2, info2 = read_audio_bytes(out2)
        assert info1.bits_per_sample == 16 and info2.bits_per_sample == 24
        ref = expected_conv(
            np.concatenate([x1, x2]).astype(np.float64), echo_ir()
        )
        assert np.max(np.abs(y1 - ref[:n1])) < 2.5 / 32768
        assert np.max(np.abs(y2 - ref[n1:])) < 2.5 / 32768

    def test_handover_rejected_after_config_change(self, tmp_path):
        """PassoverProcessor rejects when the filter mtime changed
        (convolve-file-handler.cc:334-341)."""
        fs, src = make_fs(tmp_path, gapless=True)
        write_song(src, "t1.flac", 700, seed=1)
        write_song(src, "t2.flac", 700, seed=2)
        h1 = fs.get_or_create_handler("/t1.flac")
        # Read a bit, then touch the config mid-play.
        h1.read(4096, 0)
        conf = os.path.join(fs.base_config_dir, "echo", f"filter-{RATE}.conf")
        os.utime(conf, (time.time() + 7, time.time() + 7))
        read_all(h1)
        # Donor processor is stale -> the new handler built a fresh
        # processor and the handover must have been refused.
        assert not h1.get_handler_status().out_gapless
        fs.close_handler("/t1.flac", h1)

    def test_handover_rejected_when_next_already_started(self, tmp_path):
        """Cannot bridge into an already-playing file
        (convolve-file-handler.cc:329-333)."""
        fs, src = make_fs(tmp_path, gapless=True)
        write_song(src, "t1.flac", 700, seed=1)
        write_song(src, "t2.flac", 700, seed=2)
        h2 = fs.get_or_create_handler("/t2.flac")
        read_all(h2)  # t2 fully played already
        h1 = fs.get_or_create_handler("/t1.flac")
        read_all(h1)
        assert not h1.get_handler_status().out_gapless
        fs.close_handler("/t1.flac", h1)
        fs.close_handler("/t2.flac", h2)


class TestChunkedPump:
    def test_bulk_path_bit_identical_to_block_path(self, tmp_path):
        from folve_tpu.runtime.handler import ConvolveFileHandler as CFH

        fs, src = make_fs(tmp_path)
        write_song(src, "song.flac", 20 * 512 + 123)
        h1 = fs.get_or_create_handler("/song.flac")
        out_bulk = read_all(h1)
        fs.close_handler("/song.flac", h1)
        old = CFH.CHUNK_BLOCKS
        CFH.CHUNK_BLOCKS = 1
        try:
            fs2, src2 = make_fs(tmp_path / "b")
            write_song(src2, "song.flac", 20 * 512 + 123)
            h2 = fs2.get_or_create_handler("/song.flac")
            out_block = read_all(h2)
            fs2.close_handler("/song.flac", h2)
        finally:
            CFH.CHUNK_BLOCKS = old
        assert out_bulk == out_block

    def test_bulk_pump_hands_encoder_int16(self, tmp_path, rng):
        """pump_chunk(quantize_bits=16) quantizes on device and delivers
        int16 frames — half the device->host transfer — with values
        identical to the host float64 quantization."""
        from folve_tpu.engine import compile_filter_bank, init_state
        from folve_tpu.runtime.processor import SoundProcessor
        from folve_tpu.filters.compiler import CompiledFilter

        ir = np.zeros((2, 2, 64), np.float32)
        ir[0, 0, 0] = ir[1, 1, 0] = 0.8
        bank = compile_filter_bank(ir, fragm=64, size=64)
        compiled = CompiledFilter(ir=ir, bank=bank, fsamp=RATE, warnings=[])
        proc = SoundProcessor(compiled, config_file="/nonexistent")

        x = (rng.uniform(-0.6, 0.6, (256, 2))).astype(np.float32)

        class Src:
            pos = 0

            def read_float(self, n):
                blk = x[self.pos : self.pos + n]
                self.pos += blk.shape[0]
                return blk

        got = []
        r = proc.pump_chunk(Src(), lambda f: got.append(f), 4, quantize_bits=16)
        assert r == 256
        assert got == []  # pipelined: chunk N emits while N+1 runs
        proc.drain_pipeline()
        out = np.concatenate(got)
        assert out.dtype == np.int16
        ref = np.clip(np.round(x.astype(np.float64) * 0.8 * 32768), -32768, 32767)
        np.testing.assert_array_equal(out.astype(np.int64), ref.astype(np.int64))


def test_channel_mismatch_falls_back(tmp_path):
    """Stereo-only filter + mono file -> clean pass-through with message."""
    fs, src = make_fs(tmp_path)  # echo filter is 2x2
    rng = np.random.default_rng(11)
    x = np.round(rng.uniform(-0.4, 0.4, (600, 1)) * 32768) / 32768
    write_flac(str(src / "mono.flac"), x.astype(np.float32), RATE, bits=16)
    h = fs.get_or_create_handler("/mono.flac")
    assert isinstance(h, PassThroughHandler)
    assert "channels" in h.get_handler_status().message
    fs.close_handler("/mono.flac", h)


class TestMultichannel:
    def test_four_channel_pipeline(self, tmp_path):
        """4x4 filter on a 4-channel WAV -> 4-channel FLAC/24
        (channel counts beyond stereo; FLAC has no >2ch decorrelation)."""
        conf = "/convolver/new 4 4 64 128\n" + "".join(
            f"/impulse/dirac {c} {c} 0.5 {10 * c}\n" for c in range(1, 5)
        )
        fs, src = make_fs(tmp_path, conf_text=conf)
        rng = np.random.default_rng(21)
        x = np.round(rng.uniform(-0.4, 0.4, (1200, 4)) * 32768) / 32768
        write_wav(str(src / "quad.wav"), x.astype(np.float32), RATE, SampleCodec.PCM_16)
        h = fs.get_or_create_handler("/quad.wav")
        blob = read_all(h)
        got, info = read_audio_bytes(blob)
        assert info.channels == 4
        for c in range(4):
            ref = np.zeros(1200)
            d = 10 * (c + 1)
            ref[d:] = 0.5 * x[: 1200 - d, c]
            assert np.max(np.abs(got[:, c] - ref)) < 2.5 / 32768, f"ch {c}"
        fs.close_handler("/quad.wav", h)

    def test_workaround_header_mode(self, tmp_path):
        """workaround_flac_header_issue forces regenerated headers
        (folve-main.cc:295-300)."""
        fs, src = make_fs(tmp_path)
        fs.workaround_flac_header_issue = True
        x = write_song(src, "song.flac", 900)
        h = fs.get_or_create_handler("/song.flac")
        blob = read_all(h)
        got, info = read_audio_bytes(blob)
        assert got.shape[0] == 900
        # Regenerated header carries a real MD5 of... no - streaming mode
        # keeps hint-based totals; just verify decode + frame count.
        ref = expected_conv(x, echo_ir())
        assert np.max(np.abs(got - ref)) < 2.5 / 32768
        fs.close_handler("/song.flac", h)


def test_odd_depth_flac_source_declares_capped_bits(tmp_path, rng):
    """A 12-bit FLAC source (a depth our encoder cannot emit) caps to
    24-bit output; the verbatim-copied STREAMINFO must declare 24 in
    BOTH bytes of the bits-per-sample field (byte 20 bit 0 AND byte
    21's high nibble — the stale source nibble used to survive),
    and the stream must decode in a third-party decoder."""
    import struct

    from folve_tpu.audio.flac import read_flac

    rate, bs, nframes, ch, bits = 44100, 256, 4, 2, 12

    class BW:
        def __init__(self):
            self.bits = []

        def w(self, v, n):
            for i in range(n - 1, -1, -1):
                self.bits.append((v >> i) & 1)

        def bytes(self):
            while len(self.bits) % 8:
                self.bits.append(0)
            out = bytearray()
            for i in range(0, len(self.bits), 8):
                b = 0
                for j in range(8):
                    b = (b << 1) | self.bits[i + j]
                out.append(b)
            return bytes(out)

    total = bs * nframes
    samples = (
        rng.integers(-(1 << 11), 1 << 11, (total, ch), dtype=np.int64)
        .astype(np.int32)
    )

    si = BW()
    si.w(bs, 16); si.w(bs, 16)          # min/max blocksize
    si.w(0, 24); si.w(0, 24)            # min/max framesize unknown
    si.w(rate, 20); si.w(ch - 1, 3); si.w(bits - 1, 5); si.w(total, 36)
    si_bytes = si.bytes() + bytes(16)   # md5 zero
    blob = bytearray(b"fLaC" + bytes([0x80, 0, 0, 34]) + si_bytes)

    from tests.test_flac import _crc8, _crc16

    for f in range(nframes):
        h = BW()
        h.w(0b11111111111110, 14); h.w(0, 1); h.w(0, 1)  # sync, res, fixed-bs
        h.w(8, 4)   # blocksize code 8 = 256
        h.w(9, 4)   # rate code 9 = 44100
        h.w(1, 4)   # 2 channels, independent
        h.w(2, 3)   # sample size code 2 = 12 bit
        h.w(0, 1)
        h.w(f, 8)   # coded frame number (f < 128 -> 1 byte)
        hdr = h.bytes()
        hdr += bytes([_crc8(hdr)])
        body = BW()
        for c in range(ch):
            body.w(0x02, 8)  # verbatim subframe
            for i in range(bs):
                body.w(int(samples[f * bs + i, c]) & 0xFFF, 12)
        frame = hdr + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        blob += frame

    src_file = tmp_path / "twelve.flac"
    src_file.write_bytes(bytes(blob))
    # Sanity: our decoder reads the crafted source exactly.
    got, info = read_flac(str(src_file))
    assert info.bits_per_sample == 12 and info.frames == total
    np.testing.assert_array_equal(np.round(got * (1 << 11)).astype(np.int32), samples)

    conf = (
        "/convolver/new 2 2 64 256\n"
        "/impulse/dirac 1 1 0.5 0\n/impulse/dirac 2 2 0.5 0\n"
    )
    fs, src = make_fs(tmp_path, conf_text=conf)
    os.rename(src_file, src / "song.flac")
    h = fs.get_or_create_handler("/song.flac")
    out = read_all(h)
    fs.close_handler("/song.flac", h)

    assert out[:4] == b"fLaC"
    streaminfo = out[8 : 8 + 34]
    declared = ((streaminfo[12] & 0x01) << 4) | (streaminfo[13] >> 4)
    assert declared + 1 == 24, f"STREAMINFO declares {declared + 1} bits"
    got2, info2 = read_flac(out)
    assert info2.bits_per_sample == 24 and info2.frames == total
    x = samples.astype(np.float64) / (1 << 11)
    np.testing.assert_allclose(got2, 0.5 * x, atol=2.5 / (1 << 23) + 1e-7)


# --- SEEKTABLE regeneration (VERDICT r3 #6: beat the reference) ------------


def _inject_seektable(flac_path, samples):
    """Insert a SEEKTABLE metadata block (source-style, bogus offsets)
    after STREAMINFO, like real encoders produce."""
    import struct

    blob = open(flac_path, "rb").read()
    assert blob[:4] == b"fLaC"
    # STREAMINFO is first; clear its last-block flag if set
    hdr = bytearray(blob[4:8])
    si_end = 8 + ((hdr[1] << 16) | (hdr[2] << 8) | hdr[3])
    was_last = hdr[0] & 0x80
    hdr[0] &= 0x7F
    body = b"".join(
        struct.pack(">QQH", s, 0xDEAD + i, 4096) for i, s in enumerate(samples)
    )
    st_hdr = bytes([(0x80 if was_last else 0) | 3]) + len(body).to_bytes(3, "big")
    out = blob[:4] + bytes(hdr) + blob[8:si_end] + st_hdr + body + blob[si_end:]
    open(flac_path, "wb").write(out)


def _parse_flac_blocks(blob):
    assert blob[:4] == b"fLaC"
    pos = 4
    blocks = []
    while True:
        h = blob[pos : pos + 4]
        last, btype = bool(h[0] & 0x80), h[0] & 0x7F
        blen = (h[1] << 16) | (h[2] << 8) | h[3]
        blocks.append((btype, blob[pos + 4 : pos + 4 + blen]))
        pos += 4 + blen
        if last:
            return blocks, pos  # pos = first audio byte


def test_seektable_regenerated_with_real_offsets(tmp_path, rng):
    """The reference DROPS a source SEEKTABLE (bogus after re-encode,
    convolve-file-handler.cc:459-464); we regenerate it with the output
    encoder's true frame offsets, patched in as frames stream out."""
    import struct

    fs, src = make_fs(tmp_path)
    x = write_song(src, "song.flac", 44100 * 2, seed=3)
    seek_samples = [0, 10000, 30000, 44100, 80000]
    _inject_seektable(str(src / "song.flac"), seek_samples)
    h = fs.get_or_create_handler("/song.flac")
    read_all(h)  # first pass drives the whole convolution
    # Re-read now that the stream is complete: the placeholder points
    # were patched into the buffer as frames were emitted (same
    # semantics as the reference's on-close header fixups).
    blob = read_all(h)
    fs.close_handler("/song.flac", h)

    blocks, audio_start = _parse_flac_blocks(blob)
    tables = [b for t, b in blocks if t == 3]
    assert len(tables) == 1, "regenerated SEEKTABLE missing"
    body = tables[0]
    assert len(body) == 18 * len(seek_samples)
    points = [struct.unpack(">QQH", body[i * 18 : i * 18 + 18])
              for i in range(len(seek_samples))]
    real = [p for p in points if p[0] != 0xFFFFFFFFFFFFFFFF]
    assert len(real) == len(set(s // 4096 for s in seek_samples))
    last_off = -1
    for sample, offset, nsamp in real:
        assert sample % 4096 == 0  # frame-aligned
        assert offset > last_off  # strictly ascending
        last_off = offset
        frame = blob[audio_start + offset : audio_start + offset + 2]
        assert frame[0] == 0xFF and (frame[1] & 0xFC) == 0xF8, (
            f"seekpoint {sample} does not land on a frame header")
        assert nsamp == 4096 or sample + nsamp == x.shape[0]
    # placeholders (dedup'd slots) sit at the END, per spec
    for i, p in enumerate(points):
        if p[0] == 0xFFFFFFFFFFFFFFFF:
            assert all(q[0] == 0xFFFFFFFFFFFFFFFF for q in points[i:])
            break

    # seek oracle: libsndfile seeks our output via the table and reads
    # exactly what a full decode shows at that position
    from tests.test_extra_formats import _sf

    lib = _sf()
    import ctypes

    lib.sf_seek.restype = ctypes.c_int64
    lib.sf_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    out_path = tmp_path / "out.flac"
    out_path.write_bytes(blob)
    info = lib.SfInfo()
    snd = lib.sf_open(str(out_path).encode(), 0x10, ctypes.byref(info))
    assert snd, "libsndfile cannot open the regenerated output"
    import numpy as np

    full = np.empty((info.frames, info.channels), np.float32)
    assert lib.sf_readf_float(snd, full.ctypes.data, info.frames) == info.frames
    target = 44100
    assert lib.sf_seek(snd, target, 0) == target
    chunk = np.empty((2048, info.channels), np.float32)
    got = lib.sf_readf_float(snd, chunk.ctypes.data, 2048)
    lib.sf_close(snd)
    assert got == 2048
    np.testing.assert_array_equal(chunk, full[target : target + 2048])


def test_malformed_seektable_dropped(tmp_path, rng):
    """A source SEEKTABLE whose length is not a multiple of 18 cannot be
    regenerated size-for-size; it must be dropped (old behavior), never
    emitted short (which would shift the whole stream)."""
    import struct

    fs, src = make_fs(tmp_path)
    write_song(src, "song.flac", 20000, seed=4)
    blob = open(src / "song.flac", "rb").read()
    hdr = bytearray(blob[4:8])
    si_end = 8 + ((hdr[1] << 16) | (hdr[2] << 8) | hdr[3])
    was_last = hdr[0] & 0x80
    hdr[0] &= 0x7F
    body = bytes(25)  # 25 % 18 != 0: malformed
    st_hdr = bytes([(0x80 if was_last else 0) | 3]) + len(body).to_bytes(3, "big")
    (src / "song.flac").write_bytes(
        blob[:4] + bytes(hdr) + blob[8:si_end] + st_hdr + body + blob[si_end:]
    )
    h = fs.get_or_create_handler("/song.flac")
    out = read_all(h)
    out = read_all(h)
    fs.close_handler("/song.flac", h)
    blocks, audio_start = _parse_flac_blocks(out)
    assert not any(t == 3 for t, _ in blocks)  # dropped
    from folve_tpu.audio.flac import read_flac

    got, info = read_flac(out)  # stream still fully valid
    assert info.frames == 20000
