"""Matmul-FFT vs numpy.fft golden tests (CPU)."""

import numpy as np
import pytest

from folve_tpu.engine.rfft import fft_real, get_plan, ifft_to_real, permute_spectrum


@pytest.mark.parametrize("n", [128, 512, 2048, 16384])
def test_forward_matches_numpy(rng, n):
    x = rng.standard_normal((3, n)).astype(np.float32)
    xr, xi = fft_real(x, n)
    got = np.asarray(xr) + 1j * np.asarray(xi)
    ref = permute_spectrum(np.fft.fft(x.astype(np.float64), n=n, axis=-1), n)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < 1e-5


@pytest.mark.parametrize("n", [128, 2048, 16384])
def test_roundtrip(rng, n):
    x = rng.standard_normal((2, n)).astype(np.float32)
    xr, xi = fft_real(x, n)
    back = np.asarray(ifft_to_real(xr, xi, n))
    assert np.max(np.abs(back - x)) < 1e-4 * np.max(np.abs(x))


def test_zero_padding(rng):
    n = 256
    x = rng.standard_normal((n // 2,)).astype(np.float32)
    xr, xi = fft_real(x, n)
    ref = permute_spectrum(np.fft.fft(x.astype(np.float64), n=n), n)
    got = np.asarray(xr) + 1j * np.asarray(xi)
    assert np.max(np.abs(got - ref)) < 1e-4 * np.max(np.abs(ref))


def test_plan_factors():
    plan = get_plan(16384)
    assert (plan.m1, plan.m2) == (128, 128)
    assert get_plan(128).m1 * get_plan(128).m2 == 128
