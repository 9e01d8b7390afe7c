"""Scene catalogue — the five BASELINE.json configurations.

Each scene is a named factory returning ``(SphConfig, ParticleState)``:

1. ``disk``      — the reference's rotating gas-disk scene (32k particles,
                   /root/reference/src/sph.cpp:46-98,361-425), the parity target.
2. ``dam_break`` — 100k-particle 3-D dam break with reflective box walls.
3. ``splash``    — 1M-particle drop-into-pool splash.
4. ``honey``     — high-viscosity / low-stiffness stability stress test.
5. ``dam_break_10m`` — 10M-particle dam break for the sharded multi-chip path.
"""

from __future__ import annotations

from typing import Callable

import jax

from ..config import SphConfig
from ..init import init_dam_break, init_rotating_sphere, init_splash
from ..state import ParticleState


def _disk(n: int = 32 * 1024, exact_ic: bool = False,
          **overrides) -> tuple[SphConfig, ParticleState]:
    """``exact_ic=True`` reproduces the reference's srand(42) initial state
    bit-for-bit (compat.exact_ic, no C++ toolchain needed) instead of the
    statistically-equivalent jax.random sampler."""
    overrides.setdefault("num_particles", n)
    cfg = SphConfig(**overrides)
    if exact_ic:
        from ..compat.exact_ic import reference_initial_state

        return cfg, reference_initial_state(cfg)
    state = init_rotating_sphere(jax.random.PRNGKey(42), cfg)
    return cfg, state


def _dam_break(n: int = 100_000, **overrides) -> tuple[SphConfig, ParticleState]:
    defaults = dict(
        num_particles=n,
        boundary="reflect",
        gravity=(0.0, -9.81, 0.0),
        central_mass=0.0,           # pure fluid scene: no point mass
        rho0=1.0,
        stiffness=1.0,
        viscosity=0.1,
        damping=0.5,
        total_time=0.5,
        include_self_density=True,
        second_kick="none",
        # h-sized cells + 27-stencil: 8x lower occupancy than the reference's
        # 2h cells (same 6.4^3 box via doubled grid dims)
        cell_size_factor=1.0,
        neighborhood="cell27",
        grid_nx=64, grid_ny=64, grid_nz=64,
    )
    defaults.update(overrides)
    defaults["num_particles"] = overrides.get("num_particles", n)
    cfg = SphConfig(**defaults)
    state = init_dam_break(jax.random.PRNGKey(7), cfg)
    return cfg, state


def _splash(n: int = 1_000_000, **overrides) -> tuple[SphConfig, ParticleState]:
    defaults = dict(
        num_particles=n,
        boundary="reflect",
        gravity=(0.0, -9.81, 0.0),
        central_mass=0.0,
        rho0=1.0,
        stiffness=1.0,
        viscosity=0.05,
        damping=0.5,
        total_time=0.25,
        include_self_density=True,
        second_kick="none",
        cell_size_factor=1.0,
        neighborhood="cell27",
        grid_nx=128, grid_ny=128, grid_nz=128,   # 12.8^3 box of h-cells
        cell_capacity=64,
        range_slice=128,
    )
    defaults.update(overrides)
    defaults["num_particles"] = overrides.get("num_particles", n)
    cfg = SphConfig(**defaults)
    state = init_splash(jax.random.PRNGKey(11), cfg)
    return cfg, state


def _honey(n: int = 32 * 1024, **overrides) -> tuple[SphConfig, ParticleState]:
    defaults = dict(
        num_particles=n,
        viscosity=10.0,             # "1e+1~2 == nice disk formation" (src/sph.cpp:77)
        stiffness=1e-4,
    )
    defaults.update(overrides)
    defaults["num_particles"] = overrides.get("num_particles", n)
    cfg = SphConfig(**defaults)
    state = init_rotating_sphere(jax.random.PRNGKey(42), cfg)
    return cfg, state


def _dam_break_10m(n: int = 10_000_000, **overrides) -> tuple[SphConfig, ParticleState]:
    defaults = dict(grid_nx=256, grid_ny=256, grid_nz=256,  # 25.6^3 box, h-cells
                    cell_capacity=64, range_slice=96)
    defaults.update(overrides)
    return _dam_break(n, **defaults)


SCENES: dict[str, Callable[..., tuple[SphConfig, ParticleState]]] = {
    "disk": _disk,
    "dam_break": _dam_break,
    "splash": _splash,
    "honey": _honey,
    "dam_break_10m": _dam_break_10m,
}


def make_scene(name: str, **overrides) -> tuple[SphConfig, ParticleState]:
    if name not in SCENES:
        raise KeyError(f"unknown scene {name!r}; available: {sorted(SCENES)}")
    return SCENES[name](**overrides)
