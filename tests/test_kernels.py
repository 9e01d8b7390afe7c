"""Smoothing-kernel unit tests against closed-form values."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.config import SphConfig
from smoothed_particle_hydrodynamics_tpu.ops import kernels


@pytest.fixture(scope="module")
def cfg():
    return SphConfig()


def test_poly6_at_zero(cfg):
    # W(0) = 315/(64 pi h^9) * h^6
    expected = 315.0 / (64.0 * math.pi * cfg.h_scaled9) * cfg.h_scaled2 ** 3
    got = kernels.poly6(cfg, jnp.asarray(0.0))
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)
    np.testing.assert_allclose(kernels.poly6_self(cfg), expected, rtol=1e-5)


def test_poly6_support(cfg):
    h = cfg.h_scaled
    assert float(kernels.poly6(cfg, jnp.asarray(h * 1.0001))) == 0.0
    assert float(kernels.poly6(cfg, jnp.asarray(h * 2.0))) == 0.0
    assert float(kernels.poly6(cfg, jnp.asarray(h * 0.5))) > 0.0


def test_poly6_normalisation(cfg):
    """Integral of W over R^3 should be ~1 (it is a density estimator)."""
    h = cfg.h_scaled
    r = np.linspace(0.0, h, 20001, dtype=np.float64)
    w = np.asarray(kernels.poly6(cfg, jnp.asarray(r, jnp.float32)), np.float64)
    integral = np.trapezoid(4.0 * np.pi * r**2 * w, r)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-3)


def test_spiky_gradient_magnitude(cfg):
    h = cfg.h_scaled
    d = 0.3 * h
    expected = 45.0 / (math.pi * cfg.h_scaled6) * (h - d) ** 2
    got = float(kernels.spiky_grad_magnitude(cfg, jnp.asarray(d)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    assert float(kernels.spiky_grad_magnitude(cfg, jnp.asarray(1.1 * h))) == 0.0


def test_visc_laplacian(cfg):
    h = cfg.h_scaled
    d = 0.25 * h
    expected = 45.0 / (math.pi * cfg.h_scaled6) * (h - d)
    got = float(kernels.visc_laplacian(cfg, jnp.asarray(d)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_reference_norm_constants(cfg):
    """The three constants match the reference constructor
    (/root/reference/src/sph.cpp:93-95) evaluated in float32."""
    h9 = np.float32(cfg.h_scaled9)
    np.testing.assert_allclose(
        cfg.poly6_norm, np.float32(315.0) / (np.float32(64.0) * np.float32(math.pi) * h9),
        rtol=1e-6)
    h6 = np.float32(cfg.h_scaled6)
    np.testing.assert_allclose(
        cfg.spiky_grad_norm, np.float32(-45.0) / (np.float32(math.pi) * h6), rtol=1e-6)
    assert cfg.visc_lap_norm == -cfg.spiky_grad_norm
