"""Pair physics: density, equation of state, forces.

Every function here is elementwise over a per-particle candidate axis ``K`` so
the same math backs three execution paths: the O(N^2) all-pairs oracle, the
sorted cell-list XLA backend, and the fused Pallas kernel.  Nothing allocates;
everything fuses.

Two modes (selected by ``cfg.compat``):

* **default** — textbook Muller SPH: symmetric pressure term
  ``m_j (p_i/rho_i^2 + p_j/rho_j^2)``, single post-sum viscosity scale.
* **compat** — bit-faithful to the reference's quirks (SURVEY.md §2.1):
  the i-side ``1/rho_i`` is really ``1/p_i`` (/root/reference/src/sph.cpp:785-788),
  the pressure weight is a *product* ``(p_i/rho_i^2)*(p_j/rho_j^2)``
  (src/sph.cpp:860), and the viscosity accumulator is rescaled by
  ``mu/rho_i`` once per neighbor *inside* the loop (src/sph.cpp:875-882),
  making the n-th neighbor contribution scale like ``s^(count-n+1)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SphConfig

_f32 = jnp.float32


def pressure_from_density(cfg: SphConfig, rho: jnp.ndarray) -> jnp.ndarray:
    """Stiff EoS p = k (rho - rho0) (/root/reference/src/sph.cpp:785)."""
    return (rho - _f32(cfg.rho0)) * _f32(cfg.stiffness)


def density_sum(cfg: SphConfig, m_j: jnp.ndarray, d: jnp.ndarray,
                mask: jnp.ndarray, m_self: jnp.ndarray | None = None) -> jnp.ndarray:
    """rho_i = sum_j m_j W_poly6(d_ij) over masked candidates (last axis).

    Reference loop: /root/reference/src/sph.cpp:721-766 (no self term).
    ``m_self`` adds the textbook self-contribution when configured.
    """
    h2 = _f32(cfg.h_scaled2)
    t = h2 - d * d
    w = _f32(cfg.poly6_norm) * t * t * t
    w = jnp.where(mask & (d <= _f32(cfg.h_scaled)), w, 0.0)
    rho = jnp.sum(m_j * w, axis=-1)
    if cfg.include_self_density and m_self is not None:
        rho = rho + m_self * _f32(cfg.poly6_norm) * h2 * h2 * h2
    return rho


def central_gravity(cfg: SphConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """Point-mass acceleration a = -G M r_vec/(|r|+eps)^3 about the box centre.

    Matches /root/reference/src/sph.cpp:893-915: the numerator is the
    *unnormalised* offset, the softened cube uses (|r|+eps)^3.
    pos: [..., 3] world coords -> returns [..., 3].
    """
    center = jnp.asarray(cfg.central_pos, jnp.float32)
    rel = (pos - center) * _f32(cfg.sim_scale)
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True))
    denom = (dist + _f32(cfg.softening_eff)) ** 3
    return -_f32(cfg.grav_constant) * _f32(cfg.central_mass) * rel / denom


def cfl_clamp(cfg: SphConfig, acc: jnp.ndarray) -> jnp.ndarray:
    """Clamp |a| to cfg.cfl_limit (/root/reference/src/sph.cpp:918-929)."""
    dot = jnp.sum(acc * acc, axis=-1, keepdims=True)
    limit2 = _f32(cfg.cfl_limit) ** 2
    scale = jnp.where(dot > limit2, _f32(cfg.cfl_limit) / jnp.sqrt(dot), 1.0)
    return acc * scale


def sph_acceleration(
    cfg: SphConfig,
    pos_i: jnp.ndarray,        # [..., 3]
    vel_i: jnp.ndarray,        # [..., 3]
    rho_i: jnp.ndarray,        # [...]
    pos_j: jnp.ndarray,        # [..., K, 3]
    vel_j: jnp.ndarray,        # [..., K, 3]
    rho_j: jnp.ndarray,        # [..., K]
    m_j: jnp.ndarray,          # [..., K]
    d: jnp.ndarray,            # [..., K] scaled pair distance
    mask: jnp.ndarray,         # [..., K] bool: valid, non-self, d < h
) -> jnp.ndarray:
    """Hydro acceleration (pressure gradient + viscosity) for particle(s) i.

    Returns [..., 3].  Central gravity / CFL are applied by the caller so this
    stays a pure pair reduction.  Reference loop:
    /root/reference/src/sph.cpp:778-890.
    """
    h = _f32(cfg.h_scaled)
    eps = _f32(cfg.pressure_softening)
    p_i = pressure_from_density(cfg, rho_i)
    p_j = pressure_from_density(cfg, rho_j)
    rho_j_inv = jnp.where(rho_j > 0.0, 1.0 / jnp.where(rho_j > 0.0, rho_j, 1.0), 1.0)

    rel = (pos_i[..., None, :] - pos_j) * _f32(cfg.sim_scale)   # [..., K, 3]
    hd = jnp.where(mask, h - d, 0.0)                            # (h-d) >= 0 on valid pairs

    # --- pressure gradient -----------------------------------------------------
    # direction term: (r_i - r_j) / (d + eps); |grad W_spiky| ~ 45/(pi h^6)(h-d)^2
    dir_term = rel / (d + eps)[..., None]
    if cfg.compat:
        # quirk 1: i-side inverse density is really 1/p_i (fallback 1 if p<=0)
        rho_i_inv = jnp.where(p_i > 0.0, 1.0 / jnp.where(p_i > 0.0, p_i, 1.0), 1.0)
        # quirk: product (p_i/rho_i^2)*(p_j/rho_j^2) instead of symmetric sum
        pweight = (p_i * rho_i_inv * rho_i_inv)[..., None] * (p_j * rho_j_inv * rho_j_inv)
    else:
        rho_i_inv = jnp.where(rho_i > 0.0, 1.0 / jnp.where(rho_i > 0.0, rho_i, 1.0), 1.0)
        pweight = (p_i * rho_i_inv * rho_i_inv)[..., None] + p_j * rho_j_inv * rho_j_inv
    center = hd * hd * m_j * pweight
    center = jnp.where(mask, center, 0.0)
    # reference: pressureGradient += K2 * dir * center; accel -= pressureGradient,
    # with K2 = -45/(pi h^6)  =>  accel += |K2| * dir * center
    a_pressure = _f32(cfg.visc_lap_norm) * jnp.sum(dir_term * center[..., None], axis=-2)

    # --- viscosity ---------------------------------------------------------------
    dv = vel_j - vel_i[..., None, :]                            # [..., K, 3]
    vweight = hd * rho_j_inv * m_j * _f32(cfg.visc_lap_norm)
    vweight = jnp.where(mask, vweight, 0.0)
    s = _f32(cfg.viscosity) * rho_i_inv                          # per-particle scale
    if cfg.compat:
        # quirk 2: accumulator rescaled by s after every neighbor, so the n-th
        # valid neighbor (1-indexed, in iteration order) ends up weighted by
        # s^(count - n + 1).  Closed form via per-slot exponents.
        count = jnp.sum(mask, axis=-1, keepdims=True)            # [..., 1]
        order = jnp.cumsum(mask, axis=-1)                        # n for valid slots
        expo = jnp.where(mask, (count - order + 1).astype(jnp.float32), 0.0)
        w_order = jnp.where(mask, s[..., None] ** expo, 0.0)
        a_visc = jnp.sum(dv * (vweight * w_order)[..., None], axis=-2)
    else:
        a_visc = s[..., None] * jnp.sum(dv * vweight[..., None], axis=-2)

    return a_visc + a_pressure
