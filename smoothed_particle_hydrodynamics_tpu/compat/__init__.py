"""Bit-faithful reproduction of the C++ reference's behavior (SURVEY.md §2.1).

This package exists for one purpose: golden parity.  The reference's neighbor
search is stochastic (LCG-offset subsampling), order-dependent, and buggy
(octant-table slot overwrite, boundary-plane exclusion); its force loop has an
order-dependent viscosity rescale.  Default mode fixes all of that; this
module reproduces it exactly so densities/forces can be compared against
dumps from the compiled reference (tools/golden_gen)."""

from .neighbors import find_neighbors_compat
from .step import compat_step, compute_compat_quantities

__all__ = ["find_neighbors_compat", "compat_step", "compute_compat_quantities"]
