"""Initial conditions.

The reference seeds glibc ``rand()`` with 42 and rejection-samples a uniform
ball of radius 2 at the box centre, then assigns near-Keplerian tangential
velocities v = 20 (d + h/2)^(-1/2) in the x-z plane plus uniform vertical
jitter in [-0.25, 0.25) (`/root/reference/src/sph.cpp:361-425`).

Two paths:

* :func:`init_rotating_sphere` — native ``jax.random`` equivalent (same
  distribution, different RNG stream).
* :func:`load_state` — load a dumped golden state (e.g. from the compiled C++
  reference via ``tools/``) for bitwise-matched parity runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import SphConfig
from .state import ParticleState


def init_rotating_sphere(key: jax.Array, cfg: SphConfig, radius: float = 2.0,
                         v_scale: float = 20.0, v_jitter: float = 0.25) -> ParticleState:
    """Rotating gas sphere: uniform ball + tangential near-Keplerian disk velocity.

    Distributionally equivalent to /root/reference/src/sph.cpp:361-425 (which
    rejection-samples the ball); here the ball is sampled directly so the whole
    init jits with static shapes.
    """
    n = cfg.num_particles
    k_dir, k_rad, k_jit = jax.random.split(key, 3)
    center = jnp.asarray(cfg.central_pos, jnp.float32)

    # Uniform in ball: random direction x cube-root radius.
    direction = jax.random.normal(k_dir, (n, 3), jnp.float32)
    direction = direction / jnp.linalg.norm(direction, axis=1, keepdims=True)
    r = radius * jax.random.uniform(k_rad, (n,), jnp.float32) ** (1.0 / 3.0)
    pos = center + direction * r[:, None]

    vel = disk_velocity(cfg, pos, v_scale=v_scale)
    jitter = jax.random.uniform(k_jit, (n,), jnp.float32, -v_jitter, v_jitter)
    vel = vel.at[:, 1].add(jitter)

    return ParticleState.from_arrays(pos, vel, cfg=cfg)


def disk_velocity(cfg: SphConfig, pos: jnp.ndarray, v_scale: float = 20.0) -> jnp.ndarray:
    """Tangential velocity field of the reference ICs (src/sph.cpp:413-416).

    v_tan = v_scale * (dist + h/2)^(-1/2) in the x-z plane; y (vertical) zero.
    ``dist`` is the full 3-D distance from the centre, as in the reference.
    """
    center = jnp.asarray(cfg.central_pos, jnp.float32)
    rel = pos - center
    dist = jnp.linalg.norm(rel, axis=1)
    phi = jnp.arctan2(rel[:, 2], rel[:, 0])
    vmag = v_scale * (dist + jnp.float32(cfg.h_scaled * 0.5)) ** -0.5
    vx = vmag * -jnp.sin(phi)
    vz = vmag * jnp.cos(phi)
    return jnp.stack([vx, jnp.zeros_like(vx), vz], axis=1)


def default_spacing(cfg: SphConfig) -> float:
    """Rest lattice spacing h/2: ~33 neighbors inside the support radius,
    the standard Muller SPH regime.  Physical neighbor counts keep the pair
    work O(N) — packing far above this density degenerates toward O(N^2)."""
    return float(cfg.h) * 0.5


def _lattice_block(key: jax.Array, n: int, origin, dims_xyz, spacing: float,
                   jitter: float = 0.2) -> jnp.ndarray:
    """n points on a jittered cubic lattice filling ``dims_xyz`` cells."""
    nx, ny, nz = dims_xyz
    idx = jnp.arange(n)
    iy, rem = jnp.divmod(idx, nx * nz)
    iz, ix = jnp.divmod(rem, nx)
    lattice = jnp.stack([ix, iy, iz], axis=1).astype(jnp.float32)
    noise = jax.random.uniform(key, (n, 3), jnp.float32, -jitter, jitter)
    return jnp.asarray(origin, jnp.float32) + (lattice + 0.5 + noise) * spacing


def init_dam_break(key: jax.Array, cfg: SphConfig, spacing: float | None = None,
                   base_fraction: tuple[float, float] = (0.35, 0.7)) -> ParticleState:
    """Dam-break column at rest in a box corner, at physical rest spacing.

    No reference counterpart (the upstream demo's water-in-box scene was
    replaced); provided for the BASELINE.json dam-break configs.  The column's
    footprint is ``base_fraction`` of the floor; its height follows from N and
    the lattice spacing.
    """
    n = cfg.num_particles
    box = np.asarray(cfg.box_max)
    dx = default_spacing(cfg) if spacing is None else spacing
    nx = max(int(box[0] * base_fraction[0] / dx), 1)
    nz = max(int(box[2] * base_fraction[1] / dx), 1)
    ny = -(-n // (nx * nz))
    if ny * dx > box[1] * 0.95:
        raise ValueError(
            f"dam_break: {n} particles at spacing {dx:g} overflow the box; "
            "increase the grid/box or the spacing")
    pos = _lattice_block(key, n, (dx, dx, dx), (nx, ny, nz), dx)
    pos = jnp.clip(pos, 1e-4, jnp.asarray(box - 1e-4, jnp.float32))
    return ParticleState.from_arrays(pos, jnp.zeros((n, 3), jnp.float32), cfg=cfg)


def init_splash(key: jax.Array, cfg: SphConfig, spacing: float | None = None,
                drop_fraction: float = 0.15, drop_height: float = 0.6,
                speed: float = 5.0) -> ParticleState:
    """Splash: a falling drop over a resting pool (BASELINE config 3).

    Pool depth and drop radius are derived from N and the rest spacing so the
    scene is physically packed at any particle count.
    """
    n = cfg.num_particles
    n_drop = int(n * drop_fraction)
    n_pool = n - n_drop
    box = np.asarray(cfg.box_max)
    dx = default_spacing(cfg) if spacing is None else spacing
    k_drop, k_pool = jax.random.split(key)

    # pool: full floor footprint, height from N
    nx = max(int(box[0] * 0.98 / dx), 1)
    nz = max(int(box[2] * 0.98 / dx), 1)
    ny = -(-n_pool // (nx * nz))
    pos_pool = _lattice_block(k_pool, n_pool, (dx * 0.5,) * 3, (nx, ny, nz), dx)

    # drop: ball of radius from N at drop_height
    drop_radius = (3.0 * n_drop * dx ** 3 / (4.0 * np.pi)) ** (1.0 / 3.0)
    d = jax.random.normal(k_drop, (n_drop, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    r = drop_radius * jax.random.uniform(k_drop, (n_drop,), jnp.float32) ** (1.0 / 3.0)
    center = jnp.asarray([box[0] * 0.5, box[1] * drop_height, box[2] * 0.5],
                         jnp.float32)
    pos_drop = center + d * r[:, None]
    vel_drop = jnp.tile(jnp.asarray([0.0, -speed, 0.0], jnp.float32), (n_drop, 1))

    pos = jnp.concatenate([pos_drop, pos_pool], axis=0)
    vel = jnp.concatenate([vel_drop, jnp.zeros((n_pool, 3), jnp.float32)], axis=0)
    pos = jnp.clip(pos, 1e-4, jnp.asarray(box - 1e-4, jnp.float32))
    return ParticleState.from_arrays(pos, vel, cfg=cfg)


def load_state(path: str) -> ParticleState:
    """Load a ParticleState from .npz (ours) or a golden dump from tools/."""
    d = np.load(path)
    return ParticleState.from_numpy({k: d[k] for k in d.files})
