"""A/B the single-chip lazy capped engine vs the 1-device slab capped engine.

Both run the same scene with the same kept-set policy, so their trajectories
should agree to f32 noise.  Prints per-step max displacement (in skin units
— the rebin driver) and the positional rel-L2 between engines.  Written to
chase the observed rebin-cadence gap at 1M on hardware (slab alternated,
single-chip rebinned every ~3.3 steps — same physics should give the same
drift rate).

Usage: python tools/ab_engines.py [N] [K_c] [steps]   (CPU: interpret mode)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst
from smoothed_particle_hydrodynamics_tpu.parallel import slabs


def main(n=8192, k_c=4, steps=24):
    on_cpu = jax.devices()[0].platform == "cpu"
    ov = dict(num_particles=n, cell_size_factor=1.25,
              pallas_interpret=on_cpu)
    if k_c:
        ov.update(capped_candidates=k_c, pallas_window_t=0)
    cfg, state = make_scene("splash", **ov)
    if cfg.pallas_window_t == 0:
        cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    if k_c and cfg.capped_sub_len == 0:
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
    skin = lazy.skin_half(cfg)
    print(f"n={n} K_c={k_c} skin={skin:.6f} window_t={cfg.pallas_window_t} "
          f"device={jax.devices()[0]}")

    # single-chip lazy driver
    carry = jax.jit(lambda s: lazy.init_lazy(cfg, s))(state)
    step1 = lazy._cached_lazy_step(cfg)

    # slab engine, 1-device mesh
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    zsplit = slabs.derive_zsplit(cfg, state, 1)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 1,
                                                 zsplit=zsplit, headroom=1.05)
    sub_len = (slabs.derive_sub_len_slab(cfg, state, 1, zsplit)
               if cfg.capped_candidates else None)
    scarry = slabs.distribute(cfg, state, mesh, p_cap, zsplit=zsplit)
    step2 = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                 sweeps="pallas", zsplit=zsplit, donate=False,
                                 sub_len=sub_len)

    prev1 = prev2 = None
    rb1p = rb2p = 0
    for i in range(steps):
        carry, _ = step1(carry)
        scarry, _ = step2(scarry)
        # single-chip positions in ORIGINAL order
        st1 = lazy.unsort_carry(carry)
        p1 = np.asarray(st1.position)
        # slab positions keyed by original id
        f = np.asarray(scarry.fields)
        valid = f[:, 7] >= 0.0
        oid = f[valid, 7].astype(np.int64)
        p2 = np.zeros_like(p1)
        p2[oid] = f[valid, 0:3]
        rel = (np.linalg.norm(p1 - p2)
               / max(np.linalg.norm(p1), 1e-30))
        d1 = np.abs(p1 - prev1).max() / skin if prev1 is not None else 0.0
        d2 = np.abs(p2 - prev2).max() / skin if prev2 is not None else 0.0
        rb1 = int(carry.rebin_count)
        rb2 = int(np.asarray(scarry.rebin_count)[0])
        print(f"step {i:3d}  d1/skin {d1:5.2f}{' R' if rb1 > rb1p else '  '}"
              f"  d2/skin {d2:5.2f}{' R' if rb2 > rb2p else '  '}"
              f"  relL2 {rel:.3e}  nvalid {int(valid.sum())}")
        prev1, prev2, rb1p, rb2p = p1, p2, rb1, rb2


if __name__ == "__main__":
    a = sys.argv[1:]
    main(n=int(a[0]) if len(a) > 0 else 8192,
         k_c=int(a[1]) if len(a) > 1 else 4,
         steps=int(a[2]) if len(a) > 2 else 24)
