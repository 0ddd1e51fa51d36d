"""Persistent on-disk cache of compiled filter spectra.

The reference recompiles every filter (IR decode + Convproc::configure)
on every daemon start; here the expensive part is the device FFT of the
impulse response, and its result is immutable for given inputs — so it
is content-addressed and reused across mounts and restarts.  Keys hash
the config file BYTES, the sample rate, the engine layout version and
the CONTENT of every IR file the config reads, so edits to any input
(not just mtimes) miss cleanly and stale entries are simply never
addressed again.

Default location ``$XDG_CACHE_HOME/folve_tpu/spectra`` (or
``~/.cache/...``); override with ``FOLVE_SPECTRA_CACHE=<dir>``,
disable with ``FOLVE_SPECTRA_CACHE=0``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import List, Optional

import numpy as np

# Bump when the on-disk layout or the engine's spectra layout changes.
_VERSION = 1


def cache_dir() -> Optional[str]:
    env = os.environ.get("FOLVE_SPECTRA_CACHE")
    if env is not None:
        if env in ("", "0", "off", "none"):
            return None
        return env
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "folve_tpu", "spectra")


def _key(config_path: str, fsamp: int, source_paths: List[str]) -> Optional[str]:
    h = hashlib.sha256()
    h.update(f"v{_VERSION}:{fsamp}:".encode())
    try:
        with open(config_path, "rb") as f:
            h.update(f.read())
        for p in sorted(source_paths):
            h.update(b"\0" + p.encode("utf-8", "surrogateescape") + b"\0")
            with open(p, "rb") as f:
                h.update(f.read())
    except OSError:
        return None  # unreadable input: don't cache (ERR_OTHER semantics)
    return h.hexdigest()


def _load(path: str):
    from folve_tpu.engine.filter_bank import FilterBank
    from folve_tpu.filters.compiler import CompiledFilter

    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        if int(z["version"]) != _VERSION:
            return None
        # NpzFile re-reads the zip member on every subscript; decompress
        # the (large) spectra exactly once for both fields.
        spec = z["h_spec"]
        bank = FilterBank(
            h_spec=jnp.asarray(spec),
            fragm=int(z["fragm"]),
            size=int(z["size"]),
        )
        return CompiledFilter(
            ir=z["ir"],
            bank=bank,
            fsamp=int(z["fsamp"]),
            warnings=[str(w) for w in z["warnings"]],
            host_spec=spec,
        )


def _store(path: str, compiled) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                version=np.int64(_VERSION),
                # host_spec avoids a device->host fetch of the spectra
                # (painfully slow on remote-attached devices).
                h_spec=compiled.host_spec
                if compiled.host_spec is not None
                else np.asarray(compiled.bank.h_spec),
                fragm=np.int64(compiled.bank.fragm),
                size=np.int64(compiled.bank.size),
                ir=compiled.ir,
                fsamp=np.int64(compiled.fsamp),
                warnings=np.asarray(compiled.warnings, dtype="U")
                if compiled.warnings
                else np.asarray([], dtype="U1"),
            )
        os.replace(tmp, path)  # atomic vs concurrent mounts
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def compile_with_cache(config_path: str, fsamp: int):
    """compile_config_file with a content-addressed disk cache in front.

    Falls back to a plain compile whenever the cache is disabled, any
    input is unreadable, or a cache file is corrupt."""
    from folve_tpu.filters.compiler import FilterCompileError, compile_spec
    from folve_tpu.filters.zita_parser import ReadOp, ZitaConfigError, parse_config

    try:
        spec = parse_config(config_path)
    except ZitaConfigError as e:
        raise FilterCompileError(str(e)) from e

    cdir = cache_dir()
    key = None
    if cdir is not None:
        sources = [op.path for op in spec.ops if isinstance(op, ReadOp)]
        key = _key(config_path, fsamp, sources)
    if key is not None:
        path = os.path.join(cdir, key + ".npz")
        try:
            if os.path.exists(path):
                hit = _load(path)
                if hit is not None:
                    return hit
        except Exception:
            pass  # corrupt entry: recompile and overwrite
    compiled = compile_spec(spec, fsamp=fsamp)
    if key is not None:
        try:
            _store(os.path.join(cdir, key + ".npz"), compiled)
        except Exception:
            pass
    return compiled
