"""One full timestep: the reference's advance_timestep call stack
(src/advance_timestep.f90:26-170) — premac (src/advance_premac.f90:17-61),
MAC projection, scalar_advance (src/scalar_advance.f90:17-173),
make_at_halftime, velocity_advance (src/velocity_advance.f90:17-142), and the
nodal projection — as one pure jittable function of (state, dt).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import projection
from .ops import basic, godunov, godunov3d, godunov_ref
from .bc import grow_mac
from .state import Sim, State


def godunov_mods(cfg):
    """The Godunov implementation pair: windowed fast path, or the full-array
    debug oracle when use_godunov_debug is set (reference velpred.f90:61-87,
    mkflux.f90:87-121 select *_debug_* the same way)."""
    if cfg.use_godunov_debug:
        return godunov_ref, godunov_ref
    return godunov, godunov3d


def embed_faces(sim: Sim, umac, ng: int):
    """Embed interior MAC components into ghost-padded cell-aligned arrays
    (face i at padded index ng+i) with one valid tangential ghost layer —
    the single-level analogue of create_umac_grown/fill_boundary
    (reference macproject.f90:107-120)."""
    dm, n = sim.dm, sim.n_cell
    grown = grow_mac(umac, 1, sim.pmask)
    out = []
    for d in range(dm):
        shape = tuple(s + 2 * ng for s in n)
        arr = jnp.zeros(shape, umac[d].dtype)
        sl = []
        for t in range(dm):
            if t == d:
                sl.append(slice(ng, ng + n[t] + 1))
            else:
                sl.append(slice(ng - 1, ng + n[t] + 1))
        out.append(arr.at[tuple(sl)].set(grown[d]))
    return tuple(out)


def lap_velocity(sim: Sim, u: jnp.ndarray) -> jnp.ndarray:
    dm = sim.dm
    bcs = [([tuple(sim.ell_bc[d][t]) for t in range(dm)],
            [[sim.bvals[d][t][s] for s in range(2)] for t in range(dm)])
           for d in range(dm)]
    if all(b == bcs[0] for b in bcs[1:]):
        # identical BCs across components (e.g. NO_SLIP): one batched
        # laplacian — the ghost pad + stencil run once over the stacked
        # components instead of dm sequential passes
        from .solvers import mg
        ell_bc, bvals = bcs[0]
        return mg.laplacian(u, sim.n_cell, sim.dx, ell_bc, bvals)
    return jnp.stack([projection.get_explicit_diffusive_term(sim, u[d], d)
                      for d in range(sim.dm)])


def lap_tracers(sim: Sim, s: jnp.ndarray) -> jnp.ndarray:
    out = [jnp.zeros_like(s[0])]
    for i in range(1, s.shape[0]):
        out.append(projection.get_explicit_diffusive_term(sim, s[i],
                                                          sim.scal_comp(i)))
    return jnp.stack(out)


def advance_timestep(sim: Sim, state: State, dt, proj_type: int,
                     hints: Dict = None
                     ) -> Tuple[State, Dict[str, jnp.ndarray]]:
    """One full timestep. ``hints`` optionally carries the previous step's
    projection solutions ({'phi_mac', 'phi_hg'}) to warm-start the elliptic
    solves; the new ones are returned in the diag dict."""
    cfg = sim.cfg
    dm, dx, n, ng = sim.dm, sim.dx, sim.n_cell, sim.ng
    uold, sold, gp, p = state.u, state.s, state.gp, state.p
    adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
    adv_bc_scal = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]

    mac_rhs = jnp.zeros(n, sim.dtype)  # no divu sources in this app

    # ---- explicit viscous term at t^n (advance_timestep.f90:85-93)
    if cfg.visc_coef > 0.0:
        lapu = lap_velocity(sim, uold)
    else:
        lapu = jnp.zeros_like(uold)

    # ---- premac: cell force then Godunov MAC prediction
    vel_force = basic.mkvelforce(cfg.ext_force, sold, gp, lapu,
                                 cfg.visc_coef, 1.0, cfg.boussinesq)
    god2, god3 = godunov_mods(cfg)
    u_pad = sim.fill_vel(uold)
    vf_pad = sim.fill_extrap(vel_force, ng)
    scope = jax.named_scope
    if dm == 2:
        from .ops import pallas_godunov
        vp2 = (pallas_godunov.velpred_2d_fused if god2 is godunov
               else god2.velpred_2d)
        mf2 = (pallas_godunov.mkflux_2d_fused if god2 is godunov
               else god2.mkflux_2d)
        with scope("velpred"):
            umac = vp2(u_pad, vf_pad, dt, dx, sim.phys_bc,
                       adv_bc_vel, ng, n, cfg.slope_order,
                       cfg.use_minion)
    else:
        from .ops import pallas_godunov
        fused = (god3 is godunov3d and
                 pallas_godunov.tiles_supported(n, sim.dtype, ng))
        with scope("velpred"):
            if fused:
                u_slopes = None
                umac = pallas_godunov.velpred_3d_fused(
                    u_pad, vf_pad, dt, dx, sim.phys_bc, adv_bc_vel, ng, n,
                    cfg.slope_order, cfg.use_minion)
            else:
                u_slopes = god3.vel_slopes_3d(u_pad, adv_bc_vel, ng, n,
                                              cfg.slope_order)
                umac = god3.velpred_3d(u_pad, vf_pad, dt, dx, sim.phys_bc,
                                       adv_bc_vel, ng, n, cfg.slope_order,
                                       cfg.use_minion, slopes=u_slopes)

    # ---- MAC projection
    # warm start: linear time-extrapolation when two past solutions are
    # available (pressure-like fields evolve smoothly step to step)
    def _warm(cur_key, prev_key):
        if hints is None:
            return None
        cur = hints.get(cur_key)
        prev = hints.get(prev_key)
        if cur is not None and prev is not None:
            # only extrapolate once the pair is genuinely consecutive
            # (a zero/cold prev would double the guess instead)
            delta = cur - prev
            ok = jnp.max(jnp.abs(delta)) < 0.5 * jnp.max(jnp.abs(cur))
            return jnp.where(ok, cur + delta, cur)
        return cur

    phi_mac0 = _warm("phi_mac", "phi_mac_prev")
    umac, div_b, div_a, phi_mac, mac_rn, mac_ratio = projection.macproject(
        sim, umac, sold[0], mac_rhs, phi0=phi_mac0)

    # ---- scalar advance
    if cfg.diff_coef > 0.0:
        laps = lap_tracers(sim, sold)
    else:
        laps = jnp.zeros_like(sold)
    ext_scal = jnp.zeros_like(sold)
    scal_force = basic.mkscalforce(ext_scal, laps, cfg.diff_coef, 1.0)
    is_cons = [True] + [False] * (sim.nscal - 1)

    s_pad = sim.fill_scal(sold)
    sf_pad = sim.fill_extrap(scal_force, ng)
    mrhs_pad = sim.fill_extrap(mac_rhs, ng)
    mac_pads = embed_faces(sim, umac, ng)
    scal_force_half = basic.mkscalforce(ext_scal, laps, cfg.diff_coef, 0.0)
    with scope("mkflux_s"):
        if dm == 2:
            sedgex, sedgey, fluxx, fluxy = mf2(
                s_pad, mac_pads[0], mac_pads[1], sf_pad, mrhs_pad, dt, dx,
                sim.phys_bc, adv_bc_scal, ng, n, False, is_cons,
                cfg.slope_order, cfg.use_minion)
            sedge, sflux = (sedgex, sedgey), (fluxx, fluxy)
            snew = basic.update(sold, umac, sedge, sflux, scal_force_half,
                                dt, dx, is_cons)
        elif fused:
            # fused mkflux + update: faces never touch HBM (see
            # pallas_godunov.mkflux_update_3d_fused). mac_rhs is
            # identically zero in this app, and with diff_coef=0 both
            # scalar forces are too: pass None so the kernel synthesizes
            # the zeros in VMEM instead of reading real HBM buffers.
            have_sf = cfg.diff_coef > 0.0
            snew = pallas_godunov.mkflux_update_3d_fused(
                s_pad, mac_pads, sf_pad if have_sf else None,
                scal_force_half if have_sf else None, None, dt, dx,
                sim.phys_bc, adv_bc_scal, ng, n, False, is_cons,
                cfg.slope_order, cfg.use_minion)
        else:
            sedge, sflux = god3.mkflux_3d(
                s_pad, mac_pads, sf_pad, mrhs_pad, dt, dx, sim.phys_bc,
                adv_bc_scal, ng, n, False, is_cons, cfg.slope_order,
                cfg.use_minion)
            snew = basic.update(sold, umac, sedge, sflux, scal_force_half,
                                dt, dx, is_cons)

    if cfg.diff_coef > 0.0:
        visc_mu = (0.5 * dt * cfg.diff_coef if cfg.diffusion_type == 1
                   else dt * cfg.diff_coef)
        snew = projection.diff_scalar_solve(sim, snew, laps, visc_mu,
                                            cfg.diffusion_type)

    # ---- half-time density
    rhohalf = basic.make_at_halftime(sold[0], snew[0])

    # ---- velocity advance
    vel_is_cons = [False] * dm
    uf_pad = sim.fill_extrap(vel_force, ng)  # t^n force (visc_fac=1)

    # backward Euler drops the explicit viscous term (advance_timestep.f90:116-120)
    if cfg.diffusion_type == 2:
        lapu = jnp.zeros_like(lapu)

    # half-time force: rhohalf density, visc_fac=0 (velocity_advance.f90:86);
    # the dedicated variant skips the 0*lapu term and the stacked-scalar
    # copy that s.at[0].set(rhohalf) would materialize
    vel_force_half = basic.mkvelforce_half(
        cfg.ext_force, rhohalf, sold[1] if cfg.boussinesq == 1 else None,
        gp, cfg.boussinesq)
    with scope("mkflux_u"):
        if dm == 2:
            uex, uey, ufx, ufy = mf2(
                u_pad, mac_pads[0], mac_pads[1], uf_pad, mrhs_pad, dt, dx,
                sim.phys_bc, adv_bc_vel, ng, n, True, vel_is_cons,
                cfg.slope_order, cfg.use_minion)
            unew = basic.update(uold, umac, (uex, uey), (ufx, ufy),
                                vel_force_half, dt, dx, vel_is_cons)
        elif fused:
            unew = pallas_godunov.mkflux_update_3d_fused(
                u_pad, mac_pads, uf_pad, vel_force_half, None, dt, dx,
                sim.phys_bc, adv_bc_vel, ng, n, True, vel_is_cons,
                cfg.slope_order, cfg.use_minion)
        else:
            uedge, uflux = god3.mkflux_3d(
                u_pad, mac_pads, uf_pad, mrhs_pad, dt, dx, sim.phys_bc,
                adv_bc_vel, ng, n, True, vel_is_cons, cfg.slope_order,
                cfg.use_minion, slopes=u_slopes)
            unew = basic.update(uold, umac, uedge, uflux, vel_force_half,
                                dt, dx, vel_is_cons)

    if cfg.visc_coef > 0.0:
        visc_mu = (0.5 * dt * cfg.visc_coef if cfg.diffusion_type == 1
                   else dt * cfg.visc_coef)
        unew = projection.visc_solve(sim, unew, lapu, rhohalf, mac_rhs,
                                     visc_mu, cfg.diffusion_type)

    # ---- nodal projection
    phi_hg0 = _warm("phi_hg", "phi_hg_prev")
    diag = {}
    if cfg.verbose >= 1:
        # velocity extrema before/after projection (hgproject.f90:81-109)
        diag["u_pre_min"] = jnp.min(unew.reshape(dm, -1), axis=1)
        diag["u_pre_max"] = jnp.max(unew.reshape(dm, -1), axis=1)
    unew, p, gp, phi_hg, hg_rn, hg_ratio = projection.hgproject(
        sim, proj_type, unew, uold, rhohalf, p, gp, dt, phi0=phi_hg0)
    if cfg.verbose >= 1:
        diag["u_post_min"] = jnp.min(unew.reshape(dm, -1), axis=1)
        diag["u_post_max"] = jnp.max(unew.reshape(dm, -1), axis=1)

    diag.update({"div_before": div_b, "div_after": div_a,
                 "smin": jnp.min(snew[0]), "smax": jnp.max(snew[0]),
                 "umax": jnp.max(jnp.abs(unew)),
                 "mac_resnorm": mac_rn, "hg_resnorm": hg_rn,
                 "mac_ratio": mac_ratio, "hg_ratio": hg_ratio,
                 "phi_mac": phi_mac, "phi_hg": phi_hg})
    return State(u=unew, s=snew, gp=gp, p=p), diag


def estdt(sim: Sim, state: State, dtold):
    return basic.estdt(state.u, state.s[0], state.gp, sim.cfg.ext_force,
                       sim.dx, dtold, sim.cfg.cflfac, sim.cfg.max_dt_growth)
