"""Build-on-demand for the native runtime library.

Compiles ``native/libfolve_native.so`` with the system toolchain the
first time it is needed (or when sources changed), mirroring how the
reference assumes locally-built native deps (Makefile:14-19).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfolve_native.so")
_STAMP_PATH = os.path.join(_NATIVE_DIR, ".build_stamp")
_lock = threading.Lock()
_lib = None


def _source_digest() -> str:
    """Hash every build input (all sources/headers/tables + Makefile)."""
    h = hashlib.sha256()
    names = sorted(
        n for n in os.listdir(_NATIVE_DIR)
        if n == "Makefile" or n.endswith((".cc", ".h", ".inc"))
    )
    for name in names:
        path = os.path.join(_NATIVE_DIR, name)
        h.update(name.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def ensure_built() -> str:
    """Build the shared library if missing or stale; returns its path."""
    digest = _source_digest()
    with _lock:
        if os.path.exists(_LIB_PATH) and os.path.exists(_STAMP_PATH):
            with open(_STAMP_PATH) as f:
                if f.read().strip() == digest:
                    return _LIB_PATH
        subprocess.run(
            ["make", "-s", "libfolve_native.so"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
        )
        with open(_STAMP_PATH, "w") as f:
            f.write(digest)
    return _LIB_PATH


def load_native() -> ctypes.CDLL:
    """Load (building if necessary) the native library, cached.

    ``FOLVE_NATIVE_LIB`` overrides the library path — the sanitizer CI
    runs the suite against the ASAN/TSAN builds this way (SURVEY §5)."""
    global _lib
    if _lib is None:
        override = os.environ.get("FOLVE_NATIVE_LIB")
        if override:
            _lib = ctypes.CDLL(override)
            return _lib
        with _lock:
            pass  # ensure_built has its own lock; read check below
        path = ensure_built()
        _lib = ctypes.CDLL(path)
    return _lib
