"""Run the CLI on the CPU backend from a TPU-tunnel environment.

The axon sitecustomize force-sets ``JAX_PLATFORMS=axon`` at interpreter
startup, so ``JAX_PLATFORMS=cpu python -m smoothed_particle_hydrodynamics_tpu``
still dials the tunnel.  This wrapper re-points jax at CPU the way
tests/conftest.py does (env + jax.config BEFORE any device touch), then
hands argv to the real CLI.

Usage: python tools/cli_cpu.py [N_VIRTUAL_DEVICES] -- <cli args...>
       (N_VIRTUAL_DEVICES defaults to 8)
"""

import os
import sys

args = sys.argv[1:]
ndev = "8"
if args and args[0].isdigit():
    ndev, args = args[0], args[1:]
if args and args[0] == "--":
    args = args[1:]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={ndev}").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from smoothed_particle_hydrodynamics_tpu.cli import main  # noqa: E402

sys.exit(main(args))
