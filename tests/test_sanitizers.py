"""Sanitizer CI for the native layer (SURVEY §5 commitment).

Builds the ASAN+UBSAN and TSAN variants of libfolve_native.so and runs
``tests/sanitize_driver.py`` (FLAC round-trips + fuzz, multithreaded
FUSE protocol session) against each in a subprocess.  The driver avoids
jax entirely — the sanitizer runtimes are incompatible with jaxlib's
hermetic C++ — so these tests sanitize exactly the repo's own C++.

Round-2 history: this setup caught a real TSAN use-after-free window
(DoReaddir replying outside the lock vs RELEASEDIR deleting the
DirBuffer) and a UBSAN null-memcpy in folve_flac_enc_copy.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
DRIVER = os.path.join(REPO, "tests", "sanitize_driver.py")


def _runtime_lib(name: str) -> str:
    out = subprocess.run(
        ["gcc", f"-print-file-name=lib{name}.so"], capture_output=True, text=True
    )
    path = out.stdout.strip()
    return path if os.path.isabs(path) else ""


def _build(target: str) -> str:
    subprocess.run(
        ["make", "-s", target], cwd=NATIVE, check=True, capture_output=True
    )
    return os.path.join(NATIVE, target)


def _run_driver(lib: str, preload: str, extra_env: dict) -> str:
    env = {**os.environ, "FOLVE_NATIVE_LIB": lib, "LD_PRELOAD": preload,
           **extra_env}
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, DRIVER],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    output = r.stdout + r.stderr
    assert r.returncode == 0, f"driver rc={r.returncode}\n{output[-4000:]}"
    assert "SANITIZE_DRIVER_OK" in output, output[-4000:]
    return output


def _with_stdcpp(preload: str) -> str:
    # CPython itself doesn't link libstdc++, so the sanitizer runtime's
    # __cxa_throw interceptor finds no real symbol at startup and
    # CHECK-fails on the first C++ exception (vorbis_codec throws).
    # Preloading libstdc++ alongside fixes interception.
    stdcpp = _runtime_lib("stdc++")
    if not stdcpp:
        out = subprocess.run(
            ["gcc", "-print-file-name=libstdc++.so.6"],
            capture_output=True, text=True,
        ).stdout.strip()
        stdcpp = out if os.path.isabs(out) else ""
    return f"{preload} {stdcpp}".strip()


def test_asan_ubsan():
    preload = _runtime_lib("asan")
    if not preload:
        pytest.skip("no libasan runtime")
    lib = _build("libfolve_native_asan.so")
    out = _run_driver(
        lib, _with_stdcpp(preload),
        {"ASAN_OPTIONS": "detect_leaks=0", "UBSAN_OPTIONS": "print_stacktrace=1"},
    )
    assert "ERROR: AddressSanitizer" not in out
    assert "runtime error:" not in out  # UBSAN


def test_tsan():
    preload = _runtime_lib("tsan")
    if not preload:
        pytest.skip("no libtsan runtime")
    lib = _build("libfolve_native_tsan.so")
    out = _run_driver(lib, _with_stdcpp(preload), {"TSAN_OPTIONS": "halt_on_error=0"})
    assert "WARNING: ThreadSanitizer" not in out
