"""Multi-level (AMR) advance_timestep.

The reference's non-subcycled multilevel step (advance_timestep.f90 with
nlevs>1): every phase runs on all levels with coarse-fine coupling —
fillpatch ghosts, create_umac_grown, ml_edge_restriction, composite MAC /
nodal projections, conservative flux synchronization, ml_restrict_and_fill.
All levels advance with the same dt (Docs/DesignDocument.tex:54-55).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from .. import projection
from ..ops import basic, godunov, godunov3d
from ..solvers import mg, nodal
from ..state import State
from . import solve as amr_solve
from .fill import MLGeom, pad_ml, pad_ml_multi
from .hierarchy import restrict_cells, restrict_faces
from .solve import covered_slice_rel, pad_phi


# ---------------------------------------------------------------------------
# MAC helpers
# ---------------------------------------------------------------------------

def edge_restrict_mac(geom: MLGeom, umac_l):
    """Average fine faces onto coincident coarse faces (ml_edge_restriction,
    velpred.f90:115-119, macproject.f90:497-501). Children fold into their
    parents in reverse node order (fine to coarse)."""
    dm = geom.dm
    out = [list(u) for u in umac_l]
    for c in range(geom.nlev - 1, 0, -1):
        p = geom.parent[c]
        child, spec = geom.specs[c], geom.specs[p]
        for d in range(dm):
            rf = restrict_faces(out[c][d], d, dm)
            sl = []
            for t in range(dm):
                lo = child.lo[t] // 2 - spec.lo[t]
                hi = child.hi[t] // 2 - spec.lo[t]
                sl.append(slice(lo, hi + (1 if t == d else 0)))
            out[p] = list(out[p])
            out[p][d] = out[p][d].at[tuple(sl)].set(rf)
    return [tuple(u) for u in out]


def grow_mac_ml(geom: MLGeom, umac_l, lev: int, ng: int):
    """Cell-aligned padded MAC arrays with one valid tangential ghost layer.

    Level 0 wraps/extrapolates (bc.grow_mac); finer levels take coarse-fine
    tangential ghosts from the parent's MAC field — the two-stage linear
    interpolation of create_umac_grown.f90 (consumed at velpred.f90:102-106):
    linear in the normal direction (even fine faces coincide with coarse
    faces, odd ones average the bracketing pair) and linear tangentially
    (the 3/4-1/4 face-prolongation rule: the two fine faces inside coarse
    cell i sit at +-h/4 of its center, so fine = 3/4 c[i] + 1/4 c[i -+ 1]).
    A globally linear MAC field is reproduced exactly on interior ghost
    faces (tests/test_amr.py::test_grow_mac_linear_exact).
    """
    from ..advance import embed_faces
    sim = geom.sim
    dm = geom.dm
    if lev == 0:
        return embed_faces(sim, umac_l[0], ng)

    par = geom.parent[lev]
    spec, pspec = geom.specs[lev], geom.specs[par]
    n = spec.n
    out = []
    for d in range(dm):
        shape = tuple(s + 2 * ng for s in n)
        arr = jnp.zeros(shape, umac_l[lev][d].dtype)
        # coarse-interpolated field over the fine box + 1 tangential ghost
        cu = umac_l[par][d]
        # upsample: normal axis -> even planes coincide, odd = average;
        # tangential axes -> repeat
        up = cu
        for t in range(dm):
            axis = t
            if t == d:
                lo_ = [slice(None)] * up.ndim
                hi_ = [slice(None)] * up.ndim
                lo_[axis] = slice(0, -1)
                hi_[axis] = slice(1, None)
                mid = 0.5 * (up[tuple(lo_)] + up[tuple(hi_)])
                pad = [(0, 0)] * up.ndim
                pad[axis] = (0, 1)
                midp = jnp.pad(mid, pad)
                st = jnp.stack([up, midp], axis=axis + 1)
                shp = list(up.shape)
                shp[axis] = 2 * up.shape[axis]
                up = st.reshape(shp)
                sl = [slice(None)] * up.ndim
                sl[axis] = slice(0, 2 * cu.shape[axis] - 1)
                up = up[tuple(sl)]
            else:
                take = [slice(None)] * up.ndim
                take[axis] = slice(0, 1)
                first = up[tuple(take)]
                take[axis] = slice(-1, None)
                last = up[tuple(take)]
                body = [slice(None)] * up.ndim
                body[axis] = slice(0, -1)
                prv = jnp.concatenate([first, up[tuple(body)]], axis=axis)
                body[axis] = slice(1, None)
                nxt = jnp.concatenate([up[tuple(body)], last], axis=axis)
                lo_f = 0.75 * up + 0.25 * prv   # fine face 2i (clamped edge)
                hi_f = 0.75 * up + 0.25 * nxt   # fine face 2i+1
                st = jnp.stack([lo_f, hi_f], axis=axis + 1)
                shp = list(up.shape)
                shp[axis] = 2 * up.shape[axis]
                up = st.reshape(shp)
        # up: fine-index face field with origin (2*pspec.lo); clip the source
        # window where the ghost ring would leave the parent's face range
        # (a box corner on the domain boundary — those ghost faces feed only
        # edge states that physical-boundary logic overwrites)
        sl, dst = [], []
        for t in range(dm):
            g = 0 if t == d else 1
            start = spec.lo[t] - 2 * pspec.lo[t] - g
            stop = start + n[t] + 2 * g + (1 if t == d else 0)
            s_lo, s_hi = max(start, 0), min(stop, up.shape[t])
            sl.append(slice(s_lo, s_hi))
            d_lo = ng - g + (s_lo - start)
            dst.append(slice(d_lo, d_lo + (s_hi - s_lo)))
        arr = arr.at[tuple(dst)].set(up[tuple(sl)])
        # overwrite interior faces with the fine data
        own = []
        for t in range(dm):
            own.append(slice(ng, ng + n[t] + (1 if t == d else 0)))
        arr = arr.at[tuple(own)].set(umac_l[lev][d])
        out.append(arr)
    return tuple(out)


# ---------------------------------------------------------------------------
# composite projections
# ---------------------------------------------------------------------------

def macproject_ml(geom: MLGeom, umac_l, rho_l, phi0_l=None):
    """Composite MAC projection (reference macproject.f90:20-133 over the
    level hierarchy). phi0_l warm-starts the composite solve."""
    sim = geom.sim
    dm, nlev = geom.dm, geom.nlev
    rel_eps = sim.eps(1.0e-10)

    beta_l, rhs_l = [], []
    for l in range(nlev):
        rho_pad = pad_ml(geom, [s[0:1] for s in rho_l], sim.scal_comp(0), l, 1)
        rho_pad = rho_pad[0] if rho_pad.ndim > dm else rho_pad
        betas = []
        for d in range(dm):
            q = rho_pad
            for t in range(dm):
                if t != d:
                    ax = q.ndim - dm + t
                    sl = [slice(None)] * q.ndim
                    sl[ax] = slice(1, -1)
                    q = q[tuple(sl)]
            lo = [slice(None)] * q.ndim
            hi = [slice(None)] * q.ndim
            axis = q.ndim - dm + d
            lo[axis] = slice(0, -1)
            hi[axis] = slice(1, None)
            betas.append(2.0 / (q[tuple(hi)] + q[tuple(lo)]))
        beta_l.append(tuple(betas))
        rhs_l.append(-basic.mac_div(umac_l[l], geom.dx(l)))

    div_before = jnp.max(jnp.stack([jnp.max(jnp.abs(r)) for r in rhs_l]))
    aco_l = [jnp.zeros(geom.specs[l].n, sim.dtype) for l in range(nlev)]
    phis, (_rn, _iters, mac_ratio) = amr_solve.composite_cc_solve(
        geom, sim.press_comp, rhs_l, aco_l, beta_l, 0.0, phi0_l=phi0_l,
        rel_eps=rel_eps, return_info=True)

    ell0 = [tuple(sim.ell_bc[sim.press_comp][d]) for d in range(dm)]
    new_umac = []
    for l in range(nlev):
        pad = pad_phi(geom, l, phis, ell0, [[0.0, 0.0]] * dm, ng=1)
        comps = []
        for d in range(dm):
            q = pad
            for t in range(dm):
                if t != d:
                    ax = q.ndim - dm + t
                    sl = [slice(None)] * q.ndim
                    sl[ax] = slice(1, -1)
                    q = q[tuple(sl)]
            axis = q.ndim - dm + d
            lo = [slice(None)] * q.ndim
            hi = [slice(None)] * q.ndim
            lo[axis] = slice(0, -1)
            hi[axis] = slice(1, None)
            grad = (q[tuple(hi)] - q[tuple(lo)]) / geom.dx(l)[d]
            comps.append(umac_l[l][d] - beta_l[l][d] * grad)
        new_umac.append(tuple(comps))
    new_umac = edge_restrict_mac(geom, new_umac)
    div_after = jnp.max(jnp.stack(
        [jnp.max(jnp.abs(basic.mac_div(new_umac[l], geom.dx(l)) + 0.0))
         for l in range(nlev)]))
    return new_umac, div_before, div_after, phis, mac_ratio


def hgproject_ml(geom: MLGeom, proj_type, unew_l, uold_l, rhohalf_l, p_l,
                 gp_l, dt, phi0_l=None):
    """Composite nodal projection (reference hgproject.f90 over the level
    hierarchy). phi0_l warm-starts the composite nodal solve."""
    sim = geom.sim
    dm, nlev = geom.dm, geom.nlev
    rel_eps = sim.eps(1.0e-10)

    vel_l, sigma_l, inflow_l = [], [], []
    pmask_l = [[geom.side_kind(l, d, 0) == "per" for d in range(dm)]
               for l in range(nlev)]
    for l in range(nlev):
        if proj_type in (projection.INITIAL_PROJECTION, projection.DIVU_ITERS):
            vel = unew_l[l]
        elif proj_type == projection.PRESSURE_ITERS:
            vel = (unew_l[l] - uold_l[l]) / dt
        else:
            vel = unew_l[l] + dt * gp_l[l] / rhohalf_l[l]
        vel_l.append(vel)
        sigma_l.append(1.0 / rhohalf_l[l])
        if l == 0:
            inflow = projection._inflow_pad(sim)
        else:
            # a fine level whose box touches an INLET domain side needs the
            # same EXT_DIR ghost velocity in its weak divergence; coarse-fine
            # sides stay zero (those rows are interface-masked anyway)
            def inflow(c, d, side, _l=l, _p=projection._inflow_pad(sim)):
                if geom.side_kind(_l, d, side) == "phys":
                    return _p(c, d, side)
                return 0.0
        inflow_l.append(inflow)

    phis, (_rn, _iters, hg_ratio) = amr_solve.composite_nodal_solve(
        geom, sigma_l, vel_l, inflow_pad_l=inflow_l, phi0_l=phi0_l,
        rel_eps=rel_eps, return_info=True)

    new_u, new_p, new_gp = [], [], []
    for l in range(nlev):
        gphi = nodal.cell_grad(phis[l], geom.dx(l), pmask_l[l], dm)
        vel = vel_l[l] - gphi / rhohalf_l[l]
        if proj_type == projection.PRESSURE_ITERS:
            u = uold_l[l] + dt * vel
        else:
            u = vel
        if proj_type in (projection.INITIAL_PROJECTION, projection.DIVU_ITERS):
            gp = jnp.zeros_like(gp_l[l])
            p = jnp.zeros_like(p_l[l])
        elif proj_type == projection.PRESSURE_ITERS:
            gp = gp_l[l] + gphi
            p = p_l[l] + phis[l]
        else:
            gp = gphi / dt
            p = phis[l] / dt
        new_u.append(u)
        new_p.append(p)
        new_gp.append(gp)
    new_u = restrict_and_sync(geom, new_u)
    new_gp = restrict_and_sync(geom, new_gp)
    return new_u, new_p, new_gp, phis, hg_ratio


def restrict_and_sync(geom: MLGeom, arrs_l):
    """Average fine data down onto covered coarse cells
    (ml_restrict_and_fill's restriction half); children fold into their
    parents in reverse node order."""
    out = list(arrs_l)
    for c in range(geom.nlev - 1, 0, -1):
        p = geom.parent[c]
        cov = covered_slice_rel(geom, c)
        lead = out[p].ndim - geom.dm
        sl = tuple([slice(None)] * lead) + cov
        out[p] = out[p].at[sl].set(restrict_cells(out[c], geom.dm))
    return out


def flux_sync(geom: MLGeom, flux_l, is_cons):
    """Replace coarse conservative fluxes on faces coincident with fine faces
    by the averaged fine fluxes (ml_edge_restriction_c, mkflux.f90:137-146)."""
    dm = geom.dm
    out = [list(f) for f in flux_l]
    for ci in range(geom.nlev - 1, 0, -1):
        p = geom.parent[ci]
        child, spec = geom.specs[ci], geom.specs[p]
        for d in range(dm):
            rf = restrict_faces(out[ci][d], d, dm)
            sl = [slice(None)]  # component axis
            for t in range(dm):
                lo = child.lo[t] // 2 - spec.lo[t]
                hi = child.hi[t] // 2 - spec.lo[t]
                sl.append(slice(lo, hi + (1 if t == d else 0)))
            cons_mask = jnp.asarray([1.0 if c else 0.0 for c in is_cons],
                                    rf.dtype).reshape((-1,) + (1,) * dm)
            cur = out[p][d][tuple(sl)]
            out[p][d] = out[p][d].at[tuple(sl)].set(
                cons_mask * rf + (1.0 - cons_mask) * cur)
    return [tuple(f) for f in out]


# ---------------------------------------------------------------------------
# the multilevel step
# ---------------------------------------------------------------------------

def ml_advance(geom: MLGeom, states: List[State], dt, proj_type: int,
               hints: Dict = None) -> Tuple[List[State], Dict]:
    sim = geom.sim
    cfg = sim.cfg
    dm, nlev, ng = geom.dm, geom.nlev, sim.ng
    vel_comps = list(range(dm))
    scal_comps = [sim.scal_comp(i) for i in range(sim.nscal)]

    u_l = [st.u for st in states]
    s_l = [st.s for st in states]
    gp_l = [st.gp for st in states]
    p_l = [st.p for st in states]

    def _warm(cur_key, prev_key):
        """Per-node linear warm-start extrapolation (see advance._warm)."""
        if hints is None:
            return None
        cur = hints.get(cur_key)
        prev = hints.get(prev_key)
        if cur is None:
            return None
        if prev is None:
            return cur
        out = []
        for c, pv in zip(cur, prev):
            delta = c - pv
            ok = jnp.max(jnp.abs(delta)) < 0.5 * jnp.max(jnp.abs(c))
            out.append(jnp.where(ok, c + delta, c))
        return out

    u_pads = [pad_ml_multi(geom, u_l, vel_comps, l, ng) for l in range(nlev)]
    s_pads = [pad_ml_multi(geom, s_l, scal_comps, l, ng) for l in range(nlev)]

    ell_bc_vel = [[tuple(sim.ell_bc[d][t]) for t in range(dm)]
                  for d in range(dm)]
    bv_vel = [[[sim.bvals[d][t][s2] for s2 in range(2)] for t in range(dm)]
              for d in range(dm)]

    # explicit viscous term per level (CF ghosts via the solver pad)
    if cfg.visc_coef > 0.0:
        lapu_l = []
        for l in range(nlev):
            comps = []
            for d in range(dm):
                pad = pad_phi(geom, l, [u[d] for u in u_l], ell_bc_vel[d],
                              bv_vel[d], ng=1)
                beta1 = (jnp.asarray(1.0, sim.dtype),) * dm
                comps.append(-mg.apply_padded(
                    pad, jnp.zeros(geom.specs[l].n, sim.dtype), beta1, 0.0,
                    geom.dx(l), dm))
            lapu_l.append(jnp.stack(comps))
    else:
        lapu_l = [jnp.zeros_like(u) for u in u_l]

    # ---- premac
    vf_l = [basic.mkvelforce(cfg.ext_force, s_l[l], gp_l[l], lapu_l[l],
                             cfg.visc_coef, 1.0, cfg.boussinesq)
            for l in range(nlev)]
    vf_pads = [pad_ml_multi(geom, vf_l, [sim.extrap_comp] * dm, l, ng)
               for l in range(nlev)]
    adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
    # the fused Pallas Godunov tiles run per level exactly as on the single
    # level (the reference runs the SAME kernels at every level,
    # advance_timestep.f90:26); levels too small for the tile plan fall
    # back to the windowed path
    from ..ops import pallas_godunov
    fused_l = [dm == 3 and not cfg.use_godunov_debug and
               pallas_godunov.tiles_supported(geom.specs[l].n, sim.dtype, ng)
               for l in range(nlev)]
    umac_l = []
    for l in range(nlev):
        pb = geom.phys_bc_level(l)
        if dm == 2:
            umac = pallas_godunov.velpred_2d_fused(
                u_pads[l], vf_pads[l], dt, geom.dx(l), pb, adv_bc_vel, ng,
                geom.specs[l].n, cfg.slope_order, cfg.use_minion)
        elif fused_l[l]:
            umac = pallas_godunov.velpred_3d_fused(
                u_pads[l], vf_pads[l], dt, geom.dx(l), pb, adv_bc_vel, ng,
                geom.specs[l].n, cfg.slope_order, cfg.use_minion)
        else:
            umac = godunov3d.velpred_3d(u_pads[l], vf_pads[l], dt, geom.dx(l),
                                        pb, adv_bc_vel, ng, geom.specs[l].n,
                                        cfg.slope_order, cfg.use_minion)
        umac_l.append(umac)
    umac_l = edge_restrict_mac(geom, umac_l)

    # ---- composite MAC projection
    umac_l, div_b, div_a, phi_mac_l, mac_ratio = macproject_ml(
        geom, umac_l, s_l, phi0_l=_warm("phi_mac", "phi_mac_prev"))

    mac_pads_l = [grow_mac_ml(geom, umac_l, l, ng) for l in range(nlev)]

    # ---- scalar advance
    if cfg.diff_coef > 0.0:
        laps_l = []
        for l in range(nlev):
            comps = [jnp.zeros(geom.specs[l].n, sim.dtype)]
            for i in range(1, sim.nscal):
                comp = sim.scal_comp(i)
                ell = [tuple(sim.ell_bc[comp][t]) for t in range(dm)]
                bv = [[sim.bvals[comp][t][s2] for s2 in range(2)]
                      for t in range(dm)]
                pad = pad_phi(geom, l, [s[i] for s in s_l], ell, bv, ng=1)
                beta1 = (jnp.asarray(1.0, sim.dtype),) * dm
                comps.append(-mg.apply_padded(
                    pad, jnp.zeros(geom.specs[l].n, sim.dtype), beta1, 0.0,
                    geom.dx(l), dm))
            laps_l.append(jnp.stack(comps))
    else:
        laps_l = [jnp.zeros_like(s) for s in s_l]

    is_cons = [True] + [False] * (sim.nscal - 1)
    adv_bc_scal = [sim.adv_bc[c] for c in scal_comps]
    sf_l = [basic.mkscalforce(jnp.zeros_like(s_l[l]), laps_l[l],
                              cfg.diff_coef, 1.0) for l in range(nlev)]
    sf_pads = [pad_ml_multi(geom, sf_l, [sim.extrap_comp] * sim.nscal, l, ng)
               for l in range(nlev)]
    mrhs_pads = [jnp.zeros_like(s_pads[l][0]) for l in range(nlev)]

    # Scalar update runs with each level's OWN fluxes (fused kernel emits
    # snew directly); the inter-level conservative flux sync
    # (ml_edge_restriction_c, mkflux.f90:137-146) is then applied as an
    # equivalent post-correction: snew += -dt*div(F_synced - F_own), which
    # is nonzero only on/near faces covered by children. This keeps the
    # fused path's face arrays out of HBM for the convective components.
    import numpy as _np
    cons_idx = _np.asarray([i for i in range(sim.nscal) if is_cons[i]])
    sf2_l = [basic.mkscalforce(jnp.zeros_like(s_l[l]), laps_l[l],
                               cfg.diff_coef, 0.0) for l in range(nlev)]
    snew_l, sflux_own_l = [], []
    need_flux = nlev > 1 and cons_idx.size > 0
    for l in range(nlev):
        pb = geom.phys_bc_level(l)
        if dm == 2:
            ex, ey, fx, fy = pallas_godunov.mkflux_2d_fused(
                s_pads[l], mac_pads_l[l][0], mac_pads_l[l][1], sf_pads[l],
                mrhs_pads[l], dt, geom.dx(l), pb, adv_bc_scal, ng,
                geom.specs[l].n, False, is_cons, cfg.slope_order,
                cfg.use_minion)
            snew_l.append(basic.update(s_l[l], umac_l[l], (ex, ey),
                                       (fx, fy), sf2_l[l], dt, geom.dx(l),
                                       is_cons))
            sflux_own_l.append((fx[cons_idx], fy[cons_idx]))
        elif fused_l[l]:
            # mac_rhs is identically zero; with diff_coef=0 the scalar
            # forces are too — None lets the kernel synthesize the zeros
            # in VMEM (full-size HBM zero buffers cost ~1.5 GiB across a
            # 256^3 3-level hierarchy)
            have_sf = cfg.diff_coef > 0.0
            out = pallas_godunov.mkflux_update_3d_fused(
                s_pads[l], mac_pads_l[l], sf_pads[l] if have_sf else None,
                sf2_l[l] if have_sf else None,
                None, dt, geom.dx(l), pb, adv_bc_scal, ng,
                geom.specs[l].n, False, is_cons, cfg.slope_order,
                cfg.use_minion,
                flux_comps=tuple(cons_idx) if need_flux else ())
            if need_flux:
                snew_l.append(out[0])
                sflux_own_l.append(out[1])
            else:
                snew_l.append(out)
                sflux_own_l.append(None)
        else:
            se, sf = godunov3d.mkflux_3d(
                s_pads[l], mac_pads_l[l], sf_pads[l], mrhs_pads[l], dt,
                geom.dx(l), pb, adv_bc_scal, ng, geom.specs[l].n, False,
                is_cons, cfg.slope_order, cfg.use_minion)
            snew_l.append(basic.update(s_l[l], umac_l[l], se, sf, sf2_l[l],
                                       dt, geom.dx(l), is_cons))
            sflux_own_l.append(tuple(sf[d][cons_idx] for d in range(dm)))
    if need_flux:
        synced = flux_sync(geom, sflux_own_l, [True] * len(cons_idx))
        from ..ops.basic import _fdiff
        for l in range(nlev):
            if not geom.children[l]:
                continue  # F_synced == F_own on childless nodes
            corr = sum(_fdiff(synced[l][d] - sflux_own_l[l][d], d, dm)
                       / geom.dx(l)[d] for d in range(dm))
            snew_l[l] = snew_l[l].at[cons_idx].add(-dt * corr)
    snew_l = restrict_and_sync(geom, snew_l)

    if cfg.diff_coef > 0.0:
        visc_mu = (0.5 * dt * cfg.diff_coef if cfg.diffusion_type == 1
                   else dt * cfg.diff_coef)
        for i in range(1, sim.nscal):
            comp = sim.scal_comp(i)
            bv = [[sim.bvals[comp][t][s2] for s2 in range(2)]
                  for t in range(dm)]
            rhs_l, aco_l, beta_l, phi0_l = [], [], [], []
            for l in range(nlev):
                rh = snew_l[l][i]
                if cfg.diffusion_type == 1:
                    rh = rh + visc_mu * laps_l[l][i]
                rhs_l.append(rh)
                aco_l.append(jnp.ones(geom.specs[l].n, sim.dtype))
                beta_l.append((jnp.asarray(visc_mu, sim.dtype),) * dm)
                phi0_l.append(snew_l[l][i])
            phis, _ = amr_solve.composite_cc_solve(
                geom, comp, rhs_l, aco_l, beta_l, 1.0, phi0_l=phi0_l,
                bvals=bv, rel_eps=sim.eps(1.0e-12))
            snew_l = [snew_l[l].at[i].set(phis[l]) for l in range(nlev)]
        snew_l = restrict_and_sync(geom, snew_l)

    # ---- half-time density
    rhohalf_l = [basic.make_at_halftime(s_l[l][0], snew_l[l][0])
                 for l in range(nlev)]

    # ---- velocity advance
    # No inter-level flux coupling exists here (the reference's
    # ml_edge_restriction_c applies to conservative fluxes only;
    # velocity is convective) — so the fused mkflux+update kernel runs
    # per level and face arrays never reach HBM.
    vel_is_cons = [False] * dm
    lapu_pre = lapu_l          # t^n viscous term for the t^n force rebuild
    if cfg.diffusion_type == 2:
        lapu_l = [jnp.zeros_like(x) for x in lapu_l]
    # Rebuild the t^n velocity force AND the ghost pads from barriered
    # inputs instead of reusing the premac-phase values: the barrier blocks
    # CSE with the premac computation, so the ~0.9 GB-per-fine-level padded
    # stacks (and XLA's compressed remat copies of them) die after premac
    # instead of staying live across the MAC solve and scalar advance —
    # the liveness that OOMed 256^3 + 2 AMR levels. The barrier also takes
    # rhohalf (a scalar-advance product), so its outputs CANNOT be
    # scheduled before the scalar phase completes; the recompute costs one
    # bandwidth pass over fields that are live anyway (s_old, gp, lapu).
    u_lb, s_lb, gp_lb, lapu_b, _ = jax.lax.optimization_barrier(
        (tuple(u_l), tuple(s_l), tuple(gp_l), tuple(lapu_pre),
         tuple(rhohalf_l)))
    u_lb = list(u_lb)
    vf_lb = [basic.mkvelforce(cfg.ext_force, s_lb[l], gp_lb[l], lapu_b[l],
                              cfg.visc_coef, 1.0, cfg.boussinesq)
             for l in range(nlev)]
    u_padsv = [pad_ml_multi(geom, u_lb, vel_comps, l, ng)
               for l in range(nlev)]
    vf_padsv = [pad_ml_multi(geom, vf_lb, [sim.extrap_comp] * dm, l, ng)
                for l in range(nlev)]
    vfh_l = [basic.mkvelforce_half(
        cfg.ext_force, rhohalf_l[l],
        s_l[l][1] if cfg.boussinesq == 1 else None, gp_l[l],
        cfg.boussinesq) for l in range(nlev)]
    unew_l = []
    for l in range(nlev):
        pb = geom.phys_bc_level(l)
        if dm == 2:
            ex, ey, fx, fy = pallas_godunov.mkflux_2d_fused(
                u_padsv[l], mac_pads_l[l][0], mac_pads_l[l][1], vf_padsv[l],
                mrhs_pads[l], dt, geom.dx(l), pb, adv_bc_vel, ng,
                geom.specs[l].n, True, vel_is_cons, cfg.slope_order,
                cfg.use_minion)
            unew_l.append(basic.update(u_l[l], umac_l[l], (ex, ey),
                                       (fx, fy), vfh_l[l], dt, geom.dx(l),
                                       vel_is_cons))
        elif fused_l[l]:
            unew_l.append(pallas_godunov.mkflux_update_3d_fused(
                u_padsv[l], mac_pads_l[l], vf_padsv[l], vfh_l[l],
                None, dt, geom.dx(l), pb, adv_bc_vel, ng,
                geom.specs[l].n, True, vel_is_cons, cfg.slope_order,
                cfg.use_minion))
        else:
            se, sf = godunov3d.mkflux_3d(
                u_padsv[l], mac_pads_l[l], vf_padsv[l], mrhs_pads[l], dt,
                geom.dx(l), pb, adv_bc_vel, ng, geom.specs[l].n, True,
                vel_is_cons, cfg.slope_order, cfg.use_minion)
            unew_l.append(basic.update(u_l[l], umac_l[l], se, sf, vfh_l[l],
                                       dt, geom.dx(l), vel_is_cons))

    if cfg.visc_coef > 0.0:
        visc_mu = (0.5 * dt * cfg.visc_coef if cfg.diffusion_type == 1
                   else dt * cfg.visc_coef)

        def beta_for(_l):
            # scalar (constant-coefficient) beta: mg never materializes
            # face arrays and the composite reflux uses it directly — at
            # 384^3 the full(visc_mu) arrays alone were ~0.65 GB/level
            return (jnp.asarray(visc_mu, sim.dtype),) * dm

        # All velocity components share the Helmholtz operator
        # (alpha=rhohalf, beta=visc_mu); when the elliptic BC tables agree
        # (e.g. NO_SLIP walls) ONE batched composite solve replaces dm
        # sequential ones — the composite cycle's dozens of small kernels
        # are the latency bottleneck of SMALL AMR steps, and batching
        # amortizes every one of them over the components
        # (viscsolve.f90:94-105). On LARGE hierarchies the (dm, *n) solve
        # stacks triple the phase's footprint for latency that compute
        # already hides, so batching gates on a cell budget.
        import math as _math
        import os as _os
        cells = sum(_math.prod(s.n) for s in geom.specs)
        batch_cap = float(_os.environ.get("VARDEN_ML_BATCH_MAX_CELLS",
                                          "5e7"))
        ell_same = all(sim.ell_bc[d2] == sim.ell_bc[0] for d2 in range(dm))
        if ell_same and cells <= batch_cap:
            rhs_l, aco_l, beta_l, phi0_l = [], [], [], []
            for l in range(nlev):
                rh = unew_l[l] * rhohalf_l[l]
                if cfg.diffusion_type == 1:
                    rh = rh + visc_mu * lapu_l[l]
                rhs_l.append(rh)
                aco_l.append(rhohalf_l[l])
                beta_l.append(beta_for(l))
                phi0_l.append(unew_l[l])
            # per-component boundary values ride a leading batch axis
            bv_b = [[jnp.asarray([bv_vel[c][t][s2] for c in range(dm)],
                                 sim.dtype).reshape((dm,) + (1,) * dm)
                     for s2 in range(2)] for t in range(dm)]
            phis, _ = amr_solve.composite_cc_solve(
                geom, 0, rhs_l, aco_l, beta_l, 1.0, phi0_l=phi0_l,
                bvals=bv_b, rel_eps=sim.eps(1.0e-12))
            unew_l = [phis[l] for l in range(nlev)]
        else:
            for d in range(dm):
                rhs_l, aco_l, beta_l, phi0_l = [], [], [], []
                for l in range(nlev):
                    rh = unew_l[l][d] * rhohalf_l[l]
                    if cfg.diffusion_type == 1:
                        rh = rh + visc_mu * lapu_l[l][d]
                    rhs_l.append(rh)
                    aco_l.append(rhohalf_l[l])
                    beta_l.append(beta_for(l))
                    phi0_l.append(unew_l[l][d])
                phis, _ = amr_solve.composite_cc_solve(
                    geom, d, rhs_l, aco_l, beta_l, 1.0, phi0_l=phi0_l,
                    bvals=bv_vel[d], rel_eps=sim.eps(1.0e-12))
                unew_l = [unew_l[l].at[d].set(phis[l]) for l in range(nlev)]
        unew_l = restrict_and_sync(geom, unew_l)

    # ---- composite nodal projection
    unew_l, p_l, gp_l, phi_hg_l, hg_ratio = hgproject_ml(
        geom, proj_type, unew_l, u_l, rhohalf_l, p_l, gp_l, dt,
        phi0_l=_warm("phi_hg", "phi_hg_prev"))

    new_states = [State(u=unew_l[l], s=snew_l[l], gp=gp_l[l], p=p_l[l])
                  for l in range(nlev)]
    diag = {"div_before": div_b, "div_after": div_a,
            "smin": jnp.min(snew_l[0][0]), "smax": jnp.max(snew_l[0][0]),
            "umax": jnp.max(jnp.abs(unew_l[0])),
            "mac_ratio": mac_ratio, "hg_ratio": hg_ratio,
            "phi_mac": phi_mac_l, "phi_hg": phi_hg_l}
    return new_states, diag


def ml_estdt(geom: MLGeom, states, dtold):
    sim = geom.sim
    dt = jnp.asarray(1.0e20, sim.dtype)
    for l in range(geom.nlev):
        dt_l = basic.estdt(states[l].u, states[l].s[0], states[l].gp,
                           sim.cfg.ext_force, geom.dx(l), dtold,
                           sim.cfg.cflfac, sim.cfg.max_dt_growth)
        dt = jnp.minimum(dt, dt_l)
    return dt
