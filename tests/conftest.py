"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding is
validated on virtual CPU devices (and separately by the driver's
``dryrun_multichip``).  These env vars must be set before jax imports.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The image presets JAX_PLATFORMS=axon (the TPU tunnel) and its
# sitecustomize imports jax at interpreter startup, so jax's config has
# already captured that env var — override through jax.config instead.
# Use FOLVE_TEST_PLATFORM to run the suite on real hardware.
_platform = os.environ.get("FOLVE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

# Keep the persistent spectra cache out of ~/.cache during tests (its
# own tests point FOLVE_SPECTRA_CACHE at per-test tmp dirs).
import tempfile  # noqa: E402

os.environ.setdefault(
    "FOLVE_SPECTRA_CACHE", tempfile.mkdtemp(prefix="folve_spectra_test_")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
if _platform != "cpu":
    # Real-chip runs: persist compiled executables across processes —
    # remote compilation through the dev tunnel can take minutes per
    # shape when the link degrades, while cached loads stay fast.
    jax.config.update("jax_compilation_cache_dir", "/tmp/folve_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xF01BE)
