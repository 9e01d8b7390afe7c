"""Self-contained exact-IC parity: glibc rand emulation + seeded init.

Two layers: the rand() stream is validated against the host libc (ctypes —
no toolchain), and the full initial state is validated bit-exactly against
the compiled reference's golden dump when the toolchain is available.
"""

import ctypes
import ctypes.util
import os
import subprocess

import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.compat.crand import rand_stream
from smoothed_particle_hydrodynamics_tpu.compat.exact_ic import reference_initial_state
from smoothed_particle_hydrodynamics_tpu.config import SphConfig

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
GOLDEN_DIR = os.path.join(TOOLS, "golden_m32")


def test_rand_stream_matches_libc():
    libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
    libc.srand(42)
    want = [libc.rand() for _ in range(5000)]
    got = rand_stream(42, 5000)
    assert got == want

    libc.srand(7)
    assert rand_stream(7, 100) == [libc.rand() for _ in range(100)]


@pytest.mark.skipif(not os.path.isdir("/root/reference/src"),
                    reason="reference not mounted")
def test_exact_ic_matches_golden_dump():
    if not os.path.exists(os.path.join(GOLDEN_DIR, "state_00000.bin")):
        subprocess.run([os.path.join(TOOLS, "build_reference.sh"), "32",
                        "golden_gen_m32"], check=True, cwd=TOOLS)
        subprocess.run([os.path.join(TOOLS, "golden_gen_m32"), "3",
                        "golden_m32", "1"], check=True, cwd=TOOLS)
    from smoothed_particle_hydrodynamics_tpu.compat import golden as G

    g0 = G.load_golden(os.path.join(GOLDEN_DIR, "state_00000.bin"))
    cfg = SphConfig(num_particles=g0.n)
    state = reference_initial_state(cfg)
    np.testing.assert_array_equal(np.asarray(state.position), g0.position)
    np.testing.assert_array_equal(np.asarray(state.velocity), g0.velocity)
