"""Quickstart: the reference's rotating gas disk in ~20 lines.

Runs the astrophysical disk scene (the C++ reference's only workload:
32,768 particles around a central point mass, /root/reference/src/sph.cpp:59)
at a laptop-friendly size, prints the same conservation diagnostics the
reference writes to out/energy.txt, and renders the final state to a PNG.

Runs anywhere JAX runs (CPU included):   python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from smoothed_particle_hydrodynamics_tpu import simulate
from smoothed_particle_hydrodynamics_tpu.models import make_scene

# Any SphConfig field can be overridden by keyword; num_particles rounds to
# the scene's lattice/packing rules.  Scenes: disk, honey, dam_break,
# splash, dam_break_10m  (the five BASELINE.json configs).
# num_steps is derived as total_time/dt, exactly like the reference
# (totalSteps = round(time/dt), /root/reference/src/sph.cpp:71)
_quick = os.environ.get("SPH_EXAMPLE_QUICK") == "1"   # tiny run for CI
cfg, state = make_scene("disk", num_particles=2048 if _quick else 8192,
                        total_time=0.01 if _quick else 0.1)

print(f"scene=disk n={cfg.num_particles} steps={cfg.num_steps} "
      f"device={jax.devices()[0]}")

final, diags = simulate(cfg, state, backend="celllist")

ke, pe = diags.kinetic_energy, diags.potential_energy
e = ke + pe
print(f"step   0: KE={ke[0]:.4g} PE={pe[0]:.4g} |L|={diags.angular_momentum[0]:.4g}")
print(f"step {len(ke) - 1}: KE={ke[-1]:.4g} PE={pe[-1]:.4g} "
      f"|L|={diags.angular_momentum[-1]:.4g}")
print(f"total-energy drift: {abs(float(e[-1] - e[0]) / float(e[0])):.3%}")
print(f"neighbor count mean at end: {float(diags.neighbor_mean[-1]):.1f}")

from smoothed_particle_hydrodynamics_tpu.utils.render import render_frame, save_png

save_png(render_frame(cfg, final), "quickstart_final.png")
print("wrote quickstart_final.png")
