"""SPH smoothing kernels (Muller/Monaghan family).

The reference bakes three normalisation constants in its constructor
(`/root/reference/src/sph.cpp:93-95`) and applies the polynomials inline in
its density / acceleration loops (`src/sph.cpp:751-760`, `:854-877`).  Here
each kernel is a pure elementwise function of the *scaled* pair distance so it
fuses into whatever surrounds it (XLA) or inlines into a Pallas body.

All kernels return 0 outside the support radius h.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SphConfig


def poly6(cfg: SphConfig, d: jnp.ndarray) -> jnp.ndarray:
    """W_poly6(d) = 315/(64 pi h^9) * (h^2 - d^2)^3 for d <= h else 0.

    Reference math at /root/reference/src/sph.cpp:744-760.
    """
    h2 = jnp.float32(cfg.h_scaled2)
    t = h2 - d * d
    w = jnp.float32(cfg.poly6_norm) * t * t * t
    return jnp.where(d <= jnp.float32(cfg.h_scaled), w, 0.0)


def spiky_grad_magnitude(cfg: SphConfig, d: jnp.ndarray) -> jnp.ndarray:
    """|grad W_spiky|(d) = 45/(pi h^6) * (h-d)^2 for d <= h else 0.

    The reference folds the sign into its -45/(pi h^6) constant and multiplies
    by the un-normalised direction (r_i - r_j)/(d + eps)
    (/root/reference/src/sph.cpp:854-865).  We return the positive magnitude;
    callers apply direction and sign.
    """
    h = jnp.float32(cfg.h_scaled)
    t = h - d
    w = jnp.float32(cfg.visc_lap_norm) * t * t  # 45/(pi h^6), same magnitude
    return jnp.where(d <= h, w, 0.0)


def visc_laplacian(cfg: SphConfig, d: jnp.ndarray) -> jnp.ndarray:
    """lap W_visc(d) = 45/(pi h^6) * (h - d) for d <= h else 0.

    Reference math at /root/reference/src/sph.cpp:870-877 (mKernel3Scaled).
    """
    h = jnp.float32(cfg.h_scaled)
    w = jnp.float32(cfg.visc_lap_norm) * (h - d)
    return jnp.where(d <= h, w, 0.0)


def poly6_self(cfg: SphConfig) -> float:
    """W_poly6(0): the self-contribution the reference *omits* (src/sph.cpp:737)."""
    return float(cfg.poly6_norm) * float(cfg.h_scaled2) ** 3
