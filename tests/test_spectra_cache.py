"""Persistent on-disk compiled-spectra cache (filters/spectra_cache.py).

No reference analog (it recompiles filters every daemon start,
processor-pool.cc:48-92); content-addressed keys make staleness
impossible by construction.
"""

import os

import numpy as np
import pytest

from folve_tpu.audio.wav import write_wav
from folve_tpu.filters import spectra_cache
from folve_tpu.filters.compiler import compile_config_file

RATE = 44100


def _make_filter(tmp_path, rng, name="f", taps=600):
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    ir = (rng.standard_normal((taps, 1)) / 64).astype(np.float32)
    write_wav(str(d / "ir.wav"), ir, RATE)
    conf = d / f"filter-{RATE}.conf"
    conf.write_text(
        "/cd %s\n/convolver/new 2 2 64 1024\n"
        "/impulse/read 1 1 1.0 0 0 0 1 ir.wav\n"
        "/impulse/read 2 2 1.0 0 0 0 1 ir.wav\n" % d
    )
    return str(conf), d / "ir.wav", ir


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    cdir = tmp_path / "cache"
    monkeypatch.setenv("FOLVE_SPECTRA_CACHE", str(cdir))
    return cdir


def test_hit_is_equal_and_skips_compile(tmp_path, rng, cache_env, monkeypatch):
    conf, _, _ = _make_filter(tmp_path, rng)
    first = spectra_cache.compile_with_cache(conf, RATE)
    assert len(os.listdir(cache_env)) == 1

    def boom(*a, **k):
        raise AssertionError("cache miss: compile_spec was called")

    monkeypatch.setattr("folve_tpu.filters.compiler.compile_spec", boom)
    second = spectra_cache.compile_with_cache(conf, RATE)
    np.testing.assert_array_equal(
        np.asarray(first.bank.h_spec), np.asarray(second.bank.h_spec)
    )
    np.testing.assert_array_equal(first.ir, second.ir)
    assert first.bank.fragm == second.bank.fragm
    assert first.warnings == second.warnings


def test_ir_content_change_misses_even_with_same_mtime(
    tmp_path, rng, cache_env
):
    conf, ir_path, ir = _make_filter(tmp_path, rng)
    spectra_cache.compile_with_cache(conf, RATE)
    st = os.stat(ir_path)
    write_wav(str(ir_path), (ir * 0.5).astype(np.float32), RATE)
    os.utime(ir_path, (st.st_atime, st.st_mtime))  # mtime would lie
    fresh = spectra_cache.compile_with_cache(conf, RATE)
    ref = compile_config_file(conf, fsamp=RATE)
    np.testing.assert_array_equal(
        np.asarray(fresh.bank.h_spec), np.asarray(ref.bank.h_spec)
    )
    assert len(os.listdir(cache_env)) == 2  # distinct keys


def test_rate_is_part_of_the_key(tmp_path, rng, cache_env):
    conf, _, _ = _make_filter(tmp_path, rng)
    spectra_cache.compile_with_cache(conf, RATE)
    spectra_cache.compile_with_cache(conf, 48000)
    assert len(os.listdir(cache_env)) == 2


def test_corrupt_entry_recompiles(tmp_path, rng, cache_env):
    conf, _, _ = _make_filter(tmp_path, rng)
    first = spectra_cache.compile_with_cache(conf, RATE)
    (entry,) = os.listdir(cache_env)
    (cache_env / entry).write_bytes(b"garbage")
    again = spectra_cache.compile_with_cache(conf, RATE)
    np.testing.assert_array_equal(
        np.asarray(first.bank.h_spec), np.asarray(again.bank.h_spec)
    )


def test_disabled_by_env(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("FOLVE_SPECTRA_CACHE", "0")
    conf, _, _ = _make_filter(tmp_path, rng)
    c = spectra_cache.compile_with_cache(conf, RATE)
    assert c.bank.fragm > 0
    assert spectra_cache.cache_dir() is None


def test_warnings_survive_cache(tmp_path, rng, cache_env):
    conf, _, _ = _make_filter(tmp_path, rng)
    # A 48k stream over a 44.1k IR: rate-mismatch warning.
    first = spectra_cache.compile_with_cache(conf, 48000)
    assert any("does not match" in w for w in first.warnings)
    second = spectra_cache.compile_with_cache(conf, 48000)
    assert second.warnings == first.warnings


def test_pool_cold_create_served_from_disk(tmp_path, rng, cache_env,
                                           monkeypatch):
    """A fresh ProcessorPool (new mount/daemon) finds the spectra on
    disk — the expensive compile never runs."""
    from folve_tpu.runtime.pool import ProcessorPool

    conf, _, _ = _make_filter(tmp_path, rng)
    base_dir = os.path.dirname(conf)
    pool1 = ProcessorPool()
    proc, err = pool1.get_or_create(base_dir, RATE, 2, 16)
    assert proc is not None, err

    def boom(*a, **k):
        raise AssertionError("disk cache missed in fresh pool")

    monkeypatch.setattr("folve_tpu.filters.compiler.compile_spec", boom)
    pool2 = ProcessorPool()
    proc2, err = pool2.get_or_create(base_dir, RATE, 2, 16)
    assert proc2 is not None, err
    np.testing.assert_array_equal(
        np.asarray(proc.bank.h_spec), np.asarray(proc2.bank.h_spec)
    )
