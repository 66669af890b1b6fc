"""MAC and nodal (hg) projections + viscous solves (single-level).

TPU-native re-derivations of:
  * macproject      — reference src/macproject.f90:20-133 (divumac :137-225,
                      mk_mac_coeffs :280-401, mkumac :403-645)
  * hgproject       — reference src/hgproject.f90:17-177 (create_uvec
                      :374-513, mkgphi :517-577, hg_update :581-698)
  * visc_solve / diff_scalar_solve — reference src/viscsolve.f90:19-513
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import INLET
from .ops import basic
from .solvers import mg, nodal
from .state import Sim

# Projection types (reference src/proj_parameters.f90:5-8)
INITIAL_PROJECTION = 1
DIVU_ITERS = 2
PRESSURE_ITERS = 3
REGULAR_TIMESTEP = 4


# ---------------------------------------------------------------------------
# MAC projection
# ---------------------------------------------------------------------------

def mk_mac_coeffs(sim: Sim, rho: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """beta_d = 2/(rho_i + rho_{i-1}) on all faces including domain faces
    (uses physbc-filled rho ghosts; reference macproject.f90:339-401)."""
    dm = sim.dm
    rho_p = sim.fill_comp(rho, sim.scal_comp(0), 1)
    betas = []
    for d in range(dm):
        axis = rho_p.ndim - dm + d
        q = rho_p
        for t in range(dm):
            if t != d:
                ax = q.ndim - dm + t
                sl = [slice(None)] * q.ndim
                sl[ax] = slice(1, -1)
                q = q[tuple(sl)]
        lo = [slice(None)] * q.ndim
        hi = [slice(None)] * q.ndim
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        betas.append(2.0 / (q[tuple(hi)] + q[tuple(lo)]))
    return tuple(betas)


def macproject(sim: Sim, umac: Tuple[jnp.ndarray, ...], rho: jnp.ndarray,
               mac_rhs: Optional[jnp.ndarray] = None,
               rel_eps: Optional[float] = None, phi0=None):
    """Project MAC velocities onto div(umac) = mac_rhs.

    Returns (umac_projected, div_before, div_after, phi). phi0 warm-starts
    the solve (pressure evolves slowly between steps). The default rel_eps
    mirrors the reference override at macproject.f90:92.
    """
    dm, dx, n = sim.dm, sim.dx, sim.n_cell
    rel_eps = sim.eps(1.0e-10 if rel_eps is None else rel_eps)
    if mac_rhs is None:
        mac_rhs = jnp.zeros(n, sim.dtype)

    div_before = basic.mac_div(umac, dx) - mac_rhs
    # solver convention: (alpha - div beta grad) phi = rhs with alpha = 0,
    # so rhs = mac_rhs - div(umac)  (macproject.f90:186-199)
    rhs = -div_before

    beta = mk_mac_coeffs(sim, rho)
    ell_bc = [tuple(sim.ell_bc[sim.press_comp][d]) for d in range(dm)]
    aco = jnp.zeros(n, sim.dtype)
    with jax.named_scope("mac_solve"):
        phi, (mac_rn, _iters, mac_ratio) = mg.solve(
            n, dx, ell_bc, aco, beta, rhs, alpha=0.0,
            phi0=phi0, rel_eps=rel_eps, abs_eps=-1.0, return_info=True,
            bottom=sim.mg_bottom)

    # subtract beta * grad(phi) on every face; the BC-aware ghost pad makes
    # the 2-point difference realize the one-sided boundary gradient that the
    # reference gets from its flux registers (mkumac, macproject.f90:533-581)
    phi_p = mg._pad_ghost(phi, ell_bc, [[0.0, 0.0]] * dm, dm)
    new_umac = []
    for d in range(dm):
        axis = phi_p.ndim - dm + d
        q = phi_p
        for t in range(dm):
            if t != d:
                ax = q.ndim - dm + t
                sl = [slice(None)] * q.ndim
                sl[ax] = slice(1, -1)
                q = q[tuple(sl)]
        lo = [slice(None)] * q.ndim
        hi = [slice(None)] * q.ndim
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        grad = (q[tuple(hi)] - q[tuple(lo)]) / dx[d]
        new_umac.append(umac[d] - beta[d] * grad)
    new_umac = tuple(new_umac)

    div_after = basic.mac_div(new_umac, dx) - mac_rhs
    return (new_umac, jnp.max(jnp.abs(div_before)),
            jnp.max(jnp.abs(div_after)), phi, mac_rn, mac_ratio)


# ---------------------------------------------------------------------------
# Nodal (hg) projection
# ---------------------------------------------------------------------------

def _inflow_pad(sim: Sim):
    """EXT_DIR ghost velocity for the weak divergence: inflow values at INLET
    faces, zero elsewhere (create_uvec wall zeroing, hgproject.f90:424-427)."""
    def pad(comp, d, side):
        if sim.phys_bc[d][side] == INLET:
            return sim.bvals[comp][d][side]
        return 0.0
    return pad


def hgproject(sim: Sim, proj_type: int, unew: jnp.ndarray, uold: jnp.ndarray,
              rhohalf: jnp.ndarray, p: jnp.ndarray, gp: jnp.ndarray,
              dt, rel_eps: Optional[float] = None, abs_eps: float = -1.0,
              phi0=None):
    """Approximate nodal projection.

    Returns (unew, p, gp, phi, resnorm, ratio) where ratio is
    resnorm / effective-tolerance (> 1 marks an under-converged exit).

    phi0 warm-starts the nodal solve. proj_type semantics follow reference
    hgproject.f90:374-430 & :581-634. resnorm is the nodal solver's final
    residual max-norm — surfaced so stagnation-cut exits (an under-converged
    projection) are detectable in the step diagnostics.
    """
    dm, dx, n = sim.dm, sim.dx, sim.n_cell
    pmask = sim.pmask
    rel_eps = sim.eps(1.0e-12 if rel_eps is None else rel_eps)

    # build the vector field to project (create_uvec)
    if proj_type in (INITIAL_PROJECTION, DIVU_ITERS):
        vel = unew
    elif proj_type == PRESSURE_ITERS:
        vel = (unew - uold) / dt
    elif proj_type == REGULAR_TIMESTEP:
        vel = unew + dt * gp / rhohalf
    else:
        raise ValueError(f"bad proj_type {proj_type}")

    sigma = 1.0 / rhohalf
    mask = sim.nodal_mask()
    rhs = nodal.divu_rhs(vel, dx, pmask, dm, inflow_pad=_inflow_pad(sim))
    with jax.named_scope("hg_solve"):
        phi, (hg_rn, _iters, hg_ratio) = nodal.solve(
            n, dx, pmask, sigma, rhs, mask=mask, phi0=phi0,
            rel_eps=rel_eps, abs_eps=abs_eps, return_info=True,
            bottom=sim.hg_bottom)
    gphi = nodal.cell_grad(phi, dx, pmask, dm)

    # hg_update (hgproject.f90:581-634)
    vel = vel - gphi / rhohalf
    if proj_type == PRESSURE_ITERS:
        unew = uold + dt * vel
    else:
        unew = vel

    if proj_type in (INITIAL_PROJECTION, DIVU_ITERS):
        gp = jnp.zeros_like(gp)
        p = jnp.zeros_like(p)
    elif proj_type == PRESSURE_ITERS:
        gp = gp + gphi
        p = p + phi
    else:  # REGULAR_TIMESTEP: phi held dt*pressure
        gp = gphi / dt
        p = phi / dt
    return unew, p, gp, phi, hg_rn, hg_ratio


# ---------------------------------------------------------------------------
# Viscous / diffusive implicit solves
# ---------------------------------------------------------------------------

def _grad_cc(f_pad1, d, dm, dx_d):
    """Centered cell gradient from a 1-ghost padded scalar."""
    axis = f_pad1.ndim - dm + d
    q = f_pad1
    for t in range(dm):
        ax = q.ndim - dm + t
        sl = [slice(None)] * q.ndim
        if t == d:
            continue
        sl[ax] = slice(1, -1)
        q = q[tuple(sl)]
    p_ = [slice(None)] * q.ndim
    m_ = [slice(None)] * q.ndim
    p_[axis] = slice(2, None)
    m_[axis] = slice(0, -2)
    return (q[tuple(p_)] - q[tuple(m_)]) / (2.0 * dx_d)


def visc_solve(sim: Sim, unew: jnp.ndarray, lapu: jnp.ndarray,
               rho: jnp.ndarray, mac_rhs: jnp.ndarray, visc_mu,
               diffusion_type: int, rel_eps: Optional[float] = None) -> jnp.ndarray:
    """Per-component Helmholtz solve (rho - div mu grad) u = rhs
    (reference visc_solve, src/viscsolve.f90:19-145; RHS at :194-304).

    visc_mu is dt*mu/2 (CN) or dt*mu (BE), as set by velocity_advance.
    """
    dm, dx, n = sim.dm, sim.dx, sim.n_cell
    rel_eps = sim.eps(1.0e-12 if rel_eps is None else rel_eps)
    mac_rhs_p = sim.fill_extrap(mac_rhs, 1)

    rhs_list = []
    for d in range(dm):
        rh = unew[d] * rho
        if diffusion_type == 1:
            rh = rh + visc_mu * lapu[d]
            visc_mu_dt = 2.0 * visc_mu
        else:
            visc_mu_dt = visc_mu
        # (1/3) mu dt grad(divu) term (viscsolve.f90:227-239)
        rh = rh + (1.0 / 3.0) * visc_mu_dt * _grad_cc(mac_rhs_p, d, dm, dx[d])
        rhs_list.append(rh)

    def comp_bc(d):
        ell = [tuple(sim.ell_bc[d][t]) for t in range(dm)]
        bv = [[sim.bvals[d][t][s] for s in range(2)] for t in range(dm)]
        return ell, bv

    # constant coefficient: pass traced scalars — no face arrays are
    # materialized and the solver takes its fused constant-stencil path
    beta = (visc_mu,) * dm
    bcs = [comp_bc(d) for d in range(dm)]
    if all(b == bcs[0] for b in bcs[1:]):
        # identical operator across components (e.g. NO_SLIP walls): one
        # BATCHED solve — a single smoothing loop over all components and,
        # crucially, a single scalar-predicate lax.cond around the MG
        # hierarchy. (A jax.vmap here turns that cond into a select that
        # executes the full MG machinery even when the fast Jacobi path
        # already converged — measured 84ms -> ~10ms at 256^3 f32.)
        ell_bc, bvals = bcs[0]
        with jax.named_scope("visc_solve"):
            phi, _ = mg.solve(n, dx, ell_bc, jnp.asarray(rho), beta,
                              jnp.stack(rhs_list), alpha=1.0, bvals=bvals,
                              phi0=unew, rel_eps=rel_eps, abs_eps=-1.0,
                              bottom=sim.mg_bottom)
        return phi
    out = []
    for d in range(dm):
        ell_bc, bvals = bcs[d]
        with jax.named_scope("visc_solve"):
            phi, _ = mg.solve(n, dx, ell_bc, jnp.asarray(rho), beta,
                              rhs_list[d], alpha=1.0, bvals=bvals,
                              phi0=unew[d], rel_eps=rel_eps, abs_eps=-1.0,
                              bottom=sim.mg_bottom)
        out.append(phi)
    return jnp.stack(out)


def diff_scalar_solve(sim: Sim, snew: jnp.ndarray, laps: jnp.ndarray,
                      visc_mu, diffusion_type: int,
                      rel_eps: Optional[float] = None) -> jnp.ndarray:
    """Tracer diffusion solve (1 - div mu grad) s = rhs for comps >= 1
    (reference diff_scalar_solve, src/viscsolve.f90:308-424)."""
    dm, dx, n = sim.dm, sim.dx, sim.n_cell
    rel_eps = sim.eps(1.0e-12 if rel_eps is None else rel_eps)
    out = [snew[0]]
    for i in range(1, snew.shape[0]):
        comp = sim.scal_comp(i)
        rh = snew[i]
        if diffusion_type == 1:
            rh = rh + visc_mu * laps[i]
        ell_bc = [tuple(sim.ell_bc[comp][t]) for t in range(dm)]
        bvals = [[sim.bvals[comp][t][s] for s in range(2)] for t in range(dm)]
        beta = (visc_mu,) * dm
        aco = jnp.ones(n, sim.dtype)
        with jax.named_scope("diff_solve"):
            phi, _ = mg.solve(n, dx, ell_bc, aco, beta, rh, alpha=1.0,
                              bvals=bvals, phi0=snew[i], rel_eps=rel_eps,
                              abs_eps=-1.0, bottom=sim.mg_bottom)
        out.append(phi)
    return jnp.stack(out)


def get_explicit_diffusive_term(sim: Sim, f: jnp.ndarray, comp: int) -> jnp.ndarray:
    """lap(f) for one variable with its elliptic BCs (reference
    get_explicit_diffusive_term, src/explicit_diffusive_term.f90:16-88)."""
    dm = sim.dm
    ell_bc = [tuple(sim.ell_bc[comp][t]) for t in range(dm)]
    bvals = [[sim.bvals[comp][t][s] for s in range(2)] for t in range(dm)]
    return mg.laplacian(f, sim.n_cell, sim.dx, ell_bc, bvals)
