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


def init_dam_break(key: jax.Array, cfg: SphConfig, fill: tuple[float, float, float] = (0.25, 0.9, 0.5),
                   jitter: float = 0.25) -> ParticleState:
    """Dam-break block: particles fill a box-corner column, at rest.

    No reference counterpart (the upstream demo's water-in-box scene was
    replaced); provided for the BASELINE.json dam-break configs.  ``fill`` is
    the fraction of the box occupied along each axis.
    """
    n = cfg.num_particles
    box = jnp.asarray(cfg.box_max, jnp.float32)
    extent = box * jnp.asarray(fill, jnp.float32)
    # Regular lattice with RNG jitter so densities start smooth.
    per_axis = int(np.ceil(n ** (1.0 / 3.0)))
    idx = jnp.arange(per_axis ** 3)[:n]
    iz, rem = jnp.divmod(idx, per_axis * per_axis)
    iy, ix = jnp.divmod(rem, per_axis)
    lattice = jnp.stack([ix, iy, iz], axis=1).astype(jnp.float32) / per_axis
    spacing = extent / per_axis
    noise = jax.random.uniform(key, (n, 3), jnp.float32, -jitter, jitter) * spacing
    pos = lattice * extent + 0.5 * spacing + noise
    # Keep strictly inside the box.
    pos = jnp.clip(pos, 1e-4, box - 1e-4)
    vel = jnp.zeros((n, 3), jnp.float32)
    return ParticleState.from_arrays(pos, vel, cfg=cfg)


def init_splash(key: jax.Array, cfg: SphConfig, drop_radius: float = 1.0,
                drop_height: float = 0.75, pool_depth: float = 0.2,
                drop_fraction: float = 0.3, speed: float = 5.0) -> ParticleState:
    """Splash scene: a falling ball over a resting pool (BASELINE config 3)."""
    n = cfg.num_particles
    n_drop = int(n * drop_fraction)
    n_pool = n - n_drop
    box = jnp.asarray(cfg.box_max, jnp.float32)
    k_drop, k_pool = jax.random.split(key)

    d = jax.random.normal(k_drop, (n_drop, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    r = drop_radius * jax.random.uniform(k_drop, (n_drop,), jnp.float32) ** (1.0 / 3.0)
    drop_center = jnp.asarray([box[0] * 0.5, box[1] * drop_height, box[2] * 0.5], jnp.float32)
    pos_drop = drop_center + d * r[:, None]
    vel_drop = jnp.tile(jnp.asarray([0.0, -speed, 0.0], jnp.float32), (n_drop, 1))

    u = jax.random.uniform(k_pool, (n_pool, 3), jnp.float32)
    pos_pool = u * jnp.asarray([box[0], box[1] * pool_depth, box[2]], jnp.float32)
    vel_pool = jnp.zeros((n_pool, 3), jnp.float32)

    pos = jnp.concatenate([pos_drop, pos_pool], axis=0)
    vel = jnp.concatenate([vel_drop, vel_pool], axis=0)
    pos = jnp.clip(pos, 1e-4, box - 1e-4)
    return ParticleState.from_arrays(pos, vel, cfg=cfg)


def load_state(path: str) -> ParticleState:
    """Load a ParticleState from .npz (ours) or a golden dump from tools/."""
    d = np.load(path)
    return ParticleState.from_numpy({k: d[k] for k in d.files})
