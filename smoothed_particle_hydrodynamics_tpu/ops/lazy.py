"""Lazy rebinning: keep state sorted, rebuild the cell structure only on drift.

The reference rebins every step (/root/reference/src/sph.cpp:438-481).  On
TPU the rebin (pair sort + window tables) and the frame changes around it
(field gather into sorted order, inverse-permute of the outputs) cost more
than the physics at 1M particles — and they are unnecessary most steps,
because particles move a small fraction of a cell per step.

Design
------
* The authoritative state lives permanently in the SORTED frame (sorted by
  the cell id of the *bin-time* positions).  Sweeps, integration, and
  diagnostics all run in that frame; nothing is un-permuted per step.
  ``LazyCarry.order`` tracks the accumulated permutation so callers can
  recover the original particle indexing at the end of a run.
* The window tables and candidate cell ids are FROZEN between rebins.  The
  pair mask in the kernels tests true (current-position) distances, so stale
  bins only affect which candidates are *considered*, never the physics.

Correctness bound
-----------------
Let c = cell_size, h = support radius, and δ_i = x_i(now) - x_i(bin) the
per-particle displacement VECTOR since binning.  For a true pair
(|dx(now)| < h per axis) the bin-time separation obeys, per axis a,
|dx(bin)^a| = |dx(now)^a - (δ_i^a - δ_j^a)| <= h + (max_k δ_k^a - min_k δ_k^a).
Bin-time cells are adjacent (the 27-stencil covers the pair) whenever
|dx(bin)| < c per axis, so the frozen structure is a superset of the true
neighbor graph as long as the per-axis displacement SPREAD obeys

    max_k δ_k^a - min_k δ_k^a <= c - h        for every axis a.

Only RELATIVE drift matters: a uniformly translating cloud (the falling
phase of the splash scene, or the drop while the pool rests) never expires
its bins no matter how far it falls — the common-mode displacement cancels
out of every pair separation.  (The earlier per-particle bound
max|δ| <= (c-h)/2 is the special case of displacements symmetric about 0;
the spread bound strictly dominates it — measured at 1M splash it halves
the rebin count in the falling phase.)

``lazy_step`` checks this bound against the positions the sweep is about to
use and rebuilds *first* when it would be violated, so the invariant holds
exactly at every sweep.  With ``cell_size_factor == 1`` the skin is zero and
the driver degrades to rebinning every step — still correct, never faster.
``StepDiagnostics`` are unaffected (all reductions are permutation-invariant
up to f32 summation order).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SphConfig
from ..state import ParticleState, StepDiagnostics, make_step_diagnostics
from .grid import inverse_order, unsort_stacked
from .integrate import kdk_integrate
from .pallas_step_t import PreparedT, prepare_t, sweeps_sorted


class LazyCarry(NamedTuple):
    """Sorted-frame state + frozen binning structure."""

    state: ParticleState     # sorted frame
    order: jnp.ndarray       # [N] i32: state[i] == initial_state[order[i]]
    pos_bin: jnp.ndarray     # [N,3] sorted-frame positions at bin time
    cid_f: jnp.ndarray       # [N] frozen cell ids (f32, kernel candidate lane)
    ws: jnp.ndarray          # [nblocks*9] frozen window starts
    wc: jnp.ndarray          # [nblocks*9] frozen chunk counts
    ref: jnp.ndarray         # [nblocks*3] frozen per-block reference points
    steps_since: jnp.ndarray  # i32 scalar: steps since last rebin
    rebin_count: jnp.ndarray  # i32 scalar: total rebins so far
    # capped ("subsets") mode only — None otherwise (static pytree per cfg):
    sub_perm: jnp.ndarray | None = None    # [S] frozen sub -> full row map
    cand_cid_f: jnp.ndarray | None = None  # [S] frozen sub cids (-10 tail)
    wm_sub: jnp.ndarray | None = None      # [S] frozen reweighted cand mass
    sub_dropped: jnp.ndarray | None = None  # i32 kept rows beyond S (counted)
    ws_sub: jnp.ndarray | None = None      # fused: frozen sub-block windows
    wc_sub: jnp.ndarray | None = None      # fused: frozen sub chunk counts


def skin_half(cfg: SphConfig) -> float:
    """Half the tolerated per-axis displacement SPREAD (world units) under
    frozen bins; the full budget is ``2 * skin_half = cell_size - h``."""
    return max(0.5 * (cfg.cell_size - cfg.h), 0.0)


def drift_spread(position: jnp.ndarray, pos_bin: jnp.ndarray) -> jnp.ndarray:
    """Max over axes of the displacement spread (max_k δ^a - min_k δ^a)."""
    delta = position - pos_bin
    return jnp.max(jnp.max(delta, axis=0) - jnp.min(delta, axis=0))


def _validate(cfg: SphConfig) -> None:
    if cfg.compat:
        raise ValueError("lazy driver supports default mode only")
    if cfg.second_kick == "full":
        raise ValueError("lazy driver requires second_kick in ('gravity', 'none')"
                         " — 'full' re-evaluates forces inside the integrator")
    if cfg.pallas_layout != "sublane":
        raise ValueError("lazy driver uses the sublane pallas layout")


def _carry_fields(cfg: SphConfig, state: ParticleState):
    """(sorted_state, order, pos_bin, cid_f, ws, wc, ref, sub...) from scratch."""
    p = prepare_t(cfg, state)
    zeros = jnp.zeros_like(p.mass_s)
    sorted_state = state._replace(
        position=p.pos_s, velocity=p.vel_s, mass=p.mass_s,
        density=zeros,
        acceleration=jnp.zeros_like(p.pos_s),
        neighbor_count=jnp.zeros_like(p.mass_s, dtype=jnp.int32),
    )
    return (sorted_state, p.order, p.pos_s, p.cid_f, p.ws, p.wc, p.ref,
            p.sub_perm, p.cand_cid_f, p.wm_sub, p.sub_dropped,
            p.ws_sub, p.wc_sub)


def init_lazy(cfg: SphConfig, state: ParticleState) -> LazyCarry:
    """Sort the initial state and build the first binning structure."""
    _validate(cfg)
    (sorted_state, order, pos_bin, cid_f, ws, wc, ref,
     sub_perm, cand_cid_f, wm_sub, sub_dropped,
     ws_sub, wc_sub) = _carry_fields(cfg, state)
    return LazyCarry(sorted_state, order, pos_bin, cid_f, ws, wc, ref,
                     steps_since=jnp.zeros((), jnp.int32),
                     rebin_count=jnp.zeros((), jnp.int32),
                     sub_perm=sub_perm, cand_cid_f=cand_cid_f, wm_sub=wm_sub,
                     sub_dropped=sub_dropped, ws_sub=ws_sub, wc_sub=wc_sub)


def lazy_step(cfg: SphConfig, carry: LazyCarry
              ) -> tuple[LazyCarry, StepDiagnostics]:
    """One physics step under frozen bins, rebuilding first if drift demands.

    Call under jit.  The drift check runs against exactly the positions the
    sweeps consume, so the spread bound in the module docstring holds at
    every sweep by construction.
    """
    need = (drift_spread(carry.state.position, carry.pos_bin)
            > jnp.float32(2.0 * skin_half(cfg)))

    def rebuild(c: LazyCarry):
        (st, perm, pos_bin, cid_f, ws, wc, ref,
         sub_perm, cand_cid_f, wm_sub, sub_dropped,
         ws_sub, wc_sub) = _carry_fields(cfg, c.state)
        return (st, c.order[perm], pos_bin, cid_f, ws, wc, ref,
                jnp.zeros((), jnp.int32), c.rebin_count + 1,
                sub_perm, cand_cid_f, wm_sub, sub_dropped, ws_sub, wc_sub)

    def keep(c: LazyCarry):
        return (c.state, c.order, c.pos_bin, c.cid_f, c.ws, c.wc, c.ref,
                c.steps_since + 1, c.rebin_count,
                c.sub_perm, c.cand_cid_f, c.wm_sub, c.sub_dropped,
                c.ws_sub, c.wc_sub)

    (state, order, pos_bin, cid_f, ws, wc, ref,
     steps_since, rebin_count, sub_perm, cand_cid_f, wm_sub, sub_dropped,
     ws_sub, wc_sub) = jax.lax.cond(need, rebuild, keep, carry)

    p = PreparedT(order=order, pos_s=state.position, vel_s=state.velocity,
                  mass_s=state.mass, cid_f=cid_f, ws=ws, wc=wc, ref=ref,
                  sub_perm=sub_perm, cand_cid_f=cand_cid_f, wm_sub=wm_sub,
                  sub_dropped=sub_dropped, ws_sub=ws_sub, wc_sub=wc_sub)
    acc_s, rho_s, ncount_s = sweeps_sorted(cfg, p)
    state = state._replace(density=rho_s, neighbor_count=ncount_s)
    new_state, tally = kdk_integrate(cfg, state, acc_s)

    diag = make_step_diagnostics(
        tally, ncount_s, overflow_cells=jnp.zeros((), jnp.int32),
        truncated_ranges=(sub_dropped if sub_dropped is not None
                          else jnp.zeros((), jnp.int32)))
    new_carry = LazyCarry(new_state, order, pos_bin, cid_f, ws, wc, ref,
                          steps_since, rebin_count,
                          sub_perm, cand_cid_f, wm_sub, sub_dropped,
                          ws_sub, wc_sub)
    return new_carry, diag


def unsort_carry(carry: LazyCarry) -> ParticleState:
    """Recover the original particle indexing from a lazy run's final carry."""
    st = carry.state
    inv = inverse_order(carry.order)
    pos, vel, acc, mass, rho, ncount = unsort_stacked(
        inv, [st.position, st.velocity, st.acceleration,
              st.mass, st.density, st.neighbor_count])
    return st._replace(position=pos, velocity=vel, acceleration=acc,
                       mass=mass, density=rho, neighbor_count=ncount)


_LAZY_CACHE: dict = {}


def _cached_lazy_step(cfg: SphConfig):
    if cfg not in _LAZY_CACHE:
        _LAZY_CACHE[cfg] = jax.jit(partial(lazy_step, cfg), donate_argnums=(0,))
    return _LAZY_CACHE[cfg]


def _cached_lazy_scan(cfg: SphConfig, k: int):
    """K lazy steps inside ONE jit call (per-step diagnostics as scan ys).

    At small n the axon tunnel's per-dispatch overhead (~2.4 ms/call plus
    per-output-buffer cost, docs/PERFORMANCE.md r2 #2 / r3 #12) is a large
    share of the step; scanning K steps amortizes it K-fold.  At 1M the
    overhead hides under the 60-120 ms device step and scan ys were
    measured SLOWER there (r2 finding 1), so this stays opt-in via
    ``drive_loop_lazy(scan_block=K)``.
    """
    key = (cfg, k)
    if key not in _LAZY_CACHE:
        def block(carry: LazyCarry):
            def body(c, _):
                return lazy_step(cfg, c)
            return jax.lax.scan(body, carry, None, length=k)
        _LAZY_CACHE[key] = jax.jit(block, donate_argnums=(0,))
    return _LAZY_CACHE[key]


def drive_loop_lazy(cfg: SphConfig, state: ParticleState, num_steps: int,
                    collect_diags: bool = True, carry: LazyCarry | None = None,
                    keep_carry: bool = False, scan_block: int = 0):
    """Host-driven lazy loop (the pallas production driver).

    Returns ``(state, diags)`` like ``ops.step.drive_loop``; the returned
    state is restored to the caller's particle order.  Pass ``keep_carry=True``
    to get ``(carry, diags)`` instead for chained blocks without the
    per-block unsort.  ``scan_block=K`` (K > 1) runs K steps per dispatch via
    ``lax.scan`` — a dispatch-amortization dial for small scenes; per-step
    diagnostics are preserved as scan ys.
    """
    if carry is None:
        carry = jax.jit(partial(init_lazy, cfg))(state)
    f = _cached_lazy_step(cfg)
    diags = []
    remaining = num_steps
    if scan_block > 1:
        fk = _cached_lazy_scan(cfg, scan_block)
        while remaining >= scan_block:
            carry, dk = fk(carry)
            remaining -= scan_block
            if collect_diags:
                diags.extend(jax.tree.map(lambda x, i=i: x[i], dk)
                             for i in range(scan_block))
    for _ in range(remaining):
        carry, d = f(carry)
        if collect_diags:
            diags.append(d)
    stacked = (jax.tree.map(lambda *xs: jnp.stack(xs), *diags)
               if collect_diags else None)
    if keep_carry:
        return carry, stacked
    return unsort_carry(carry), stacked
