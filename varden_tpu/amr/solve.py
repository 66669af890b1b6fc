"""Composite (multi-level) elliptic solves.

TPU-native equivalent of FBoxLib's ml_cc_solve / ml_nd_solve consumed by the
reference's mac_multigrid/hg_multigrid wrappers: the coupled coarse/fine
problem is iterated with a RECURSIVE composite V-cycle (the ml_cc/ml_nd
structure), each outer cycle being

  * composite residuals folded fine -> coarse, with flux-register
    corrections at coarse-fine faces (the bndry_reg/fine_flx role,
    macproject.f90:522-609) and covered rows restricted from the child,
  * a downward correction pass: per-level mini V-cycle with homogeneous
    interface ghosts, then the CORRECTION's own defect + flux registers
    folded into the parent (this is what makes middle levels of 3+ level
    hierarchies converge),
  * a coarsest-level full solve, and an upward pass re-smoothing each level
    with parent-interpolated interface ghosts,
  * covered coarse data slaved to the restriction of the fine solution.

Both the cell-centered and the nodal (slave-node composite FEM) variants
converge to solver tolerance at any hierarchy depth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bc import BC_DIR, BC_NEU
from ..solvers import mg, nodal
from .fill import MLGeom
from .hierarchy import prolong_cells, prolong_nodes, restrict_cells

DEFAULT_OUTER = 20


def _bcov(arr, cov):
    """Covered-region index, passing leading batch axes through."""
    return (slice(None),) * (arr.ndim - len(cov)) + tuple(cov)


def _mean_sp(arr, dm):
    """Mean over the trailing spatial axes (keepdims: broadcasts back)."""
    ax = tuple(range(arr.ndim - dm, arr.ndim))
    return jnp.mean(arr, axis=ax, keepdims=True)


def _axslice(f, axis, i0, i1):
    sl = [slice(None)] * f.ndim
    sl[axis] = slice(i0, i1)
    return f[tuple(sl)]


def _solver_slab(fint, axis, side, ng, kind, code, bval):
    """Width-ng ghost slab realizing the solver BC on one side. Layer 1 uses
    the exact formula; outer layers copy it (they only feed interp slopes)."""
    if kind == "per":
        return (_axslice(fint, axis, -ng, None) if side == 0
                else _axslice(fint, axis, 0, ng))
    if side == 0:
        p0, p1 = _axslice(fint, axis, 0, 1), _axslice(fint, axis, 1, 2)
    else:
        p0, p1 = _axslice(fint, axis, -1, None), _axslice(fint, axis, -2, -1)
    if code == BC_NEU:
        g = p0
    elif code == BC_DIR:
        g = (8.0 / 3.0) * bval - 2.0 * p0 + (1.0 / 3.0) * p1
    else:  # BC_GHOST used on phys side should not occur; fall back to copy
        g = p0
    slab = jnp.concatenate([g] * ng, axis=axis)
    return slab


def pad_phi(geom: MLGeom, lev: int, phis, ell_bc_phys, bvals,
            ng: int = 1) -> jnp.ndarray:
    """Padded solver variable at one level: physical sides via solver BC
    formulas, periodic wrap, coarse-fine sides by limited-slope interpolation
    from the parent's padded phi."""
    dm = geom.dm
    phi = phis[lev]

    if lev == 0:
        out = phi
        for d in range(dm):
            axis = out.ndim - dm + d
            kind_lo = "per" if geom.sim.pmask[d] else "phys"
            lo = _solver_slab(out, axis, 0, ng, kind_lo,
                              ell_bc_phys[d][0], bvals[d][0])
            hi = _solver_slab(out, axis, 1, ng, kind_lo,
                              ell_bc_phys[d][1], bvals[d][1])
            out = jnp.concatenate([lo, out, hi], axis=axis)
        return out

    par = geom.parent[lev]
    ppad = pad_phi(geom, par, phis, ell_bc_phys, bvals, ng=2)
    spec, pspec = geom.specs[lev], geom.specs[par]
    c0 = [(spec.lo[d] - ng) // 2 - 1 for d in range(dm)]
    c1 = [-((-(spec.hi[d] + ng)) // 2) + 1 for d in range(dm)]
    sl = [slice(None)] * (ppad.ndim - dm)
    for d in range(dm):
        origin = pspec.lo[d] - 2
        sl.append(slice(c0[d] - origin, c1[d] - origin))
    up = prolong_cells(ppad[tuple(sl)], dm, limit=False)
    sl = [slice(None)] * (up.ndim - dm)
    for d in range(dm):
        start = (spec.lo[d] - ng) - 2 * c0[d]
        sl.append(slice(start, start + spec.n[d] + 2 * ng))
    out = up[tuple(sl)]
    il = [slice(None)] * (out.ndim - dm) + [slice(ng, -ng)] * dm
    out = out.at[tuple(il)].set(phi)

    for d in range(dm):
        axis = out.ndim - dm + d
        for side in range(2):
            kind = geom.side_kind(lev, d, side)
            if kind == "cf":
                continue
            fint = _axslice(out, axis, ng, -ng)
            slab = _solver_slab(fint, axis, side, ng, kind,
                                ell_bc_phys[d][side], bvals[d][side])
            dst = [slice(None)] * out.ndim
            dst[axis] = slice(0, ng) if side == 0 else slice(-ng, None)
            out = out.at[tuple(dst)].set(slab)
    return out


def pad_corr(geom: MLGeom, lev: int, phi, ell_bc_phys,
             ng: int = 1) -> jnp.ndarray:
    """Cheap pad for CORRECTION-cycle defect math: coarse-fine ghosts are
    ZERO (the parent correction is still zero on the composite down pass),
    physical sides use the homogeneous solver-BC slabs, periodic wraps.
    Skips pad_phi's parent-prolong chain entirely."""
    dm = geom.dm
    out = phi
    for d in range(dm):
        axis = out.ndim - dm + d
        pw = [(0, 0)] * out.ndim
        pw[axis] = (ng, ng)
        lo_k = geom.side_kind(lev, d, 0) if lev > 0 else (
            "per" if geom.sim.pmask[d] else "phys")
        hi_k = geom.side_kind(lev, d, 1) if lev > 0 else lo_k
        fint = out

        def slab(side, kind):
            if kind == "cf":
                shp = list(fint.shape)
                shp[axis] = ng
                return jnp.zeros(shp, fint.dtype)
            return _solver_slab(fint, axis, side, ng, kind,
                                ell_bc_phys[d][side], 0.0)

        out = jnp.concatenate([slab(0, lo_k), out, slab(1, hi_k)], axis=axis)
    return out


def _reflux_correct(geom: MLGeom, ci, res_c, pad_c, pad_f, beta_c, beta_f):
    """Replace the coarse flux with the averaged fine flux in the coarse
    residual at coarse-fine faces of child node ``ci`` (flux registers).
    pad_c=None means the coarse field is identically zero (correction
    down pass): the coarse flux term is skipped."""
    dm = geom.dm
    child = geom.specs[ci]
    par = geom.parent[ci]
    dxc = geom.dx(par)
    dxf = geom.dx(ci)
    cspec = geom.specs[par]
    cl = [child.lo[d] // 2 - cspec.lo[d] for d in range(dm)]   # rel. coarse idx
    ch = [child.hi[d] // 2 - cspec.lo[d] for d in range(dm)]
    for d in range(dm):
        for side in range(2):
            if geom.side_kind(ci, d, side) != "cf":
                continue
            face_c = cl[d] if side == 0 else ch[d]   # coarse face plane index
            # coarse flux across the plane: beta * (phi[face]-phi[face-1])/dxc
            # from the coarse padded array (pad offset +1)
            if pad_c is None:
                Fc = 0.0
            else:
                lo_cell = _slab_cell(pad_c, d, dm, face_c - 1 + 1, cl, ch)
                hi_cell = _slab_cell(pad_c, d, dm, face_c + 1, cl, ch)
                Fc = _beta_plane(beta_c, d, dm, face_c, cl, ch) * \
                    (hi_cell - lo_cell) / dxc[d]
            # fine flux on the coincident plane, averaged to coarse faces
            fface = 0 if side == 0 else child.n[d]
            f_lo = _fine_plane(pad_f, d, dm, fface - 1 + 1)
            f_hi = _fine_plane(pad_f, d, dm, fface + 1)
            Ff = _beta_plane_full(beta_f, d, dm, fface) * (f_hi - f_lo) / dxf[d]
            Favg = _avg_plane(Ff, d, dm)
            diff = (Favg - Fc) / dxc[d]
            # r[left of lo-face] += diff ; r[right of hi-face] -= diff
            cell = face_c - 1 if side == 0 else face_c
            sgn = 1.0 if side == 0 else -1.0
            lead = res_c.ndim - dm
            idx = [slice(None)] * lead
            for t in range(dm):
                if t == d:
                    idx.append(slice(cell, cell + 1))
                else:
                    idx.append(slice(cl[t], ch[t]))
            res_c = res_c.at[tuple(idx)].add(
                sgn * jnp.expand_dims(diff, axis=lead + d))
    return res_c


def _slab_cell(pad, d, dm, idx, cl, ch):
    """Cell plane slab from a 1-ghost padded coarse array, cropped to the
    covered tangential range (leading batch axes pass through)."""
    lead = pad.ndim - dm
    sl = [slice(None)] * lead
    for t in range(dm):
        if t == d:
            sl.append(slice(idx, idx + 1))
        else:
            sl.append(slice(cl[t] + 1, ch[t] + 1))
    out = pad[tuple(sl)]
    return jnp.squeeze(out, axis=lead + d)


def _fine_plane(pad, d, dm, idx):
    lead = pad.ndim - dm
    sl = [slice(None)] * lead
    for t in range(dm):
        if t == d:
            sl.append(slice(idx, idx + 1))
        else:
            sl.append(slice(1, -1))
    return jnp.squeeze(pad[tuple(sl)], axis=lead + d)


def _beta_plane(beta, d, dm, face, cl, ch):
    if mg._is_scalar_coef(beta[d]):  # constant-coefficient operator
        return beta[d]
    sl = []
    for t in range(dm):
        if t == d:
            sl.append(slice(face, face + 1))
        else:
            sl.append(slice(cl[t], ch[t]))
    return jnp.squeeze(beta[d][tuple(sl)], axis=d)


def _beta_plane_full(beta, d, dm, face):
    if mg._is_scalar_coef(beta[d]):
        return beta[d]
    sl = []
    for t in range(dm):
        if t == d:
            sl.append(slice(face, face + 1))
        else:
            sl.append(slice(None))
    return jnp.squeeze(beta[d][tuple(sl)], axis=d)


def _avg_plane(f, d, dm):
    """2x tangential average of a (dm-1)-plane (fine faces -> coarse faces)."""
    for t in range(dm - 1):
        a = [slice(None)] * f.ndim
        b = [slice(None)] * f.ndim
        ax = f.ndim - (dm - 1) + t
        a[ax] = slice(0, None, 2)
        b[ax] = slice(1, None, 2)
        f = 0.5 * (f[tuple(a)] + f[tuple(b)])
    return f


def composite_cc_solve(geom: MLGeom, comp: int, rhs_l, aco_l, beta_l, alpha,
                       phi0_l=None, bvals=None, rel_eps=1e-10,
                       max_outer=DEFAULT_OUTER, return_info=False,
                       nv_fine=1, nv_coarse=2):
    """Solve the composite problem (alpha*aco - div beta grad) phi = rhs over
    all levels. Returns (phi_l, resnorm) — or (phi_l, (resnorm, iters))
    with return_info. nv_fine / nv_coarse: V-cycles per level visit inside
    each outer composite cycle. nv_fine MUST stay 1: over-solving a fine
    level against its homogeneous interface ghosts drives the correction
    toward the wrong (decoupled) solution and STALLS the composite
    iteration (measured: nv_fine=2 stalls at ~1e-4 where nv_fine=1
    converges in 8 outers); nv_coarse=2 shaves ~1 outer."""
    sim = geom.sim
    dm, nlev = geom.dm, geom.nlev
    ell0 = [tuple(sim.ell_bc[comp][d]) for d in range(dm)]
    if bvals is None:
        bvals = [[0.0, 0.0]] * dm
    if phi0_l is None:
        phi0_l = [jnp.zeros(geom.specs[l].n, sim.dtype) for l in range(nlev)]
    if nlev == 1:
        return_phi, info = mg.solve(geom.specs[0].n, geom.dx(0), ell0,
                                    aco_l[0], beta_l[0], rhs_l[0],
                                    alpha=alpha, bvals=bvals, phi0=phi0_l[0],
                                    rel_eps=rel_eps, return_info=return_info)
        return [return_phi], info

    ell_bcs = [ell0] + [geom.ell_bc_level(l, comp) for l in range(1, nlev)]
    hiers = [mg.build_hierarchy(list(geom.specs[l].n), list(geom.dx(l)),
                                ell_bcs[l], aco_l[l], list(beta_l[l]), alpha)
             for l in range(nlev)]
    # composite null space = constants iff the level-0 problem is singular
    singular = mg.is_singular(ell0, alpha)
    if singular:
        # Make the rhs compatible with the COMPOSITE left null vector (uniform
        # over coarse cells with covered entries = restriction of fine): an
        # incompatible component cannot be destroyed by the solves — it only
        # circulates between levels through the reflux and stalls convergence.
        rhs_l = list(rhs_l)
        comp = list(rhs_l)
        for c in range(nlev - 1, 0, -1):
            p_ = geom.parent[c]
            comp[p_] = comp[p_].at[
                _bcov(comp[p_], covered_slice_rel(geom, c))].set(
                    restrict_cells(comp[c], dm))
        mu = _mean_sp(comp[0], dm)
        rhs_l = [r - mu for r in rhs_l]

    def residuals(phis):
        pads = [pad_phi(geom, l, phis, ell0, bvals, ng=1) for l in range(nlev)]
        res = [rhs_l[l] - mg.apply_padded(pads[l], aco_l[l], beta_l[l],
                                          alpha, geom.dx(l), dm)
               for l in range(nlev)]
        # fold FINE -> COARSE (children in reverse node order) so a middle
        # node's covered/reflux corrections are in place before being
        # restricted into its own parent
        for c in range(nlev - 1, 0, -1):
            p = geom.parent[c]
            res[p] = _reflux_correct(geom, c, res[p], pads[p], pads[c],
                                     beta_l[p], beta_l[c])
            cov = _bcov(res[p], covered_slice_rel(geom, c))
            res[p] = res[p].at[cov].set(restrict_cells(res[c], dm))
        return res

    def resnorm(res):
        if singular:
            # project out the composite incompatibility (constant) component,
            # exactly as the correction solves do
            m = _mean_sp(res[0], dm)
            res = [r - m for r in res]
        return jnp.max(jnp.stack([jnp.max(jnp.abs(r)) for r in res]))

    bnorm = jnp.max(jnp.stack([jnp.max(jnp.abs(r)) for r in rhs_l]))
    tol = rel_eps * bnorm

    def slave(phis):
        for c in range(nlev - 1, 0, -1):
            p = geom.parent[c]
            cov = _bcov(phis[p], covered_slice_rel(geom, c))
            phis[p] = phis[p].at[cov].set(restrict_cells(phis[c], dm))
        return phis

    zb = [[0.0, 0.0]] * dm

    def comp_correction(res):
        """One composite V-cycle on the correction problem A_comp d = res
        (homogeneous BCs) — the ml_cc structure (FBoxLib ml_cc.f90 consumed
        via /root/reference/src/mac_multigrid.f90:53-62): downward per-node
        smooth + defect restriction carrying the CORRECTION's own flux
        registers into the parent (the piece the round-1 block sweep lacked
        at middle levels), coarsest full solve, upward prolong + re-smooth
        with parent-interpolated interface ghosts. Fine-to-coarse node order
        visits every child before its parent; sibling contributions land in
        disjoint parent regions."""
        d = [jnp.zeros_like(r) for r in res]
        res = list(res)
        for c in range(nlev - 1, 0, -1):
            p = geom.parent[c]
            for _ in range(nv_fine):
                d[c] = mg.v_cycle(hiers[c], d[c], res[c], zb)
            # on the down pass the PARENT correction is still zero, so the
            # child's cf ghosts are zero (pad_corr: no parent-prolong chain)
            # and the parent-side reflux flux vanishes (fine-only reflux) —
            # both were measured glue hot spots of the outer cycle
            pad_f = pad_corr(geom, c, d[c], ell0, ng=1)
            dres = res[c] - mg.apply_padded(pad_f, aco_l[c], beta_l[c],
                                            alpha, geom.dx(c), dm)
            cov = _bcov(res[p], covered_slice_rel(geom, c))
            res[p] = res[p].at[cov].set(restrict_cells(dres, dm))
            res[p] = _reflux_correct(geom, c, res[p], None,
                                     pad_f, beta_l[p], beta_l[c])
        r0 = res[0] - _mean_sp(res[0], dm) if singular else res[0]
        for _ in range(nv_coarse):
            d[0] = mg.v_cycle(hiers[0], d[0], r0, zb, singular=singular)
        for c in range(1, nlev):
            dp = d[geom.parent[c]]
            cov = _bcov(dp, covered_slice_rel(geom, c))
            # plain linear prolongation: a slope LIMITER on the correction
            # clamps it at extrema (where the residual concentrates) and
            # measurably weakens per-outer contraction
            d[c] = d[c] + prolong_cells(dp[cov], dm, limit=False)
            pad = pad_phi(geom, c, d, ell0, zb, ng=1)
            rl = res[c] - mg.apply_padded(pad, aco_l[c], beta_l[c], alpha,
                                          geom.dx(c), dm)
            du = jnp.zeros_like(rl)
            for _ in range(nv_fine):
                du = mg.v_cycle(hiers[c], du, rl, zb)
            d[c] = d[c] + du
        return d

    def body(carry):
        # ONE composite residual evaluation per outer cycle: the residual
        # computed for monitoring doubles as the next correction's source
        # (the earlier two-evaluation form dominated the latency-bound
        # small-level composite solves)
        phis, res, k, _ = carry
        phis = list(phis)
        d = comp_correction(list(res))
        phis = [p + di for p, di in zip(phis, d)]
        phis = slave(phis)
        if singular:
            m = _mean_sp(phis[0], dm)
            phis = [p - m for p in phis]
        res = residuals(phis)
        return tuple(phis), tuple(res), k + 1, resnorm(res)

    def cond(carry):
        _, _, k, rn = carry
        return jnp.logical_and(k < max_outer, rn > tol)

    phis0 = slave(list(phi0_l))
    res0 = residuals(phis0)
    init = (tuple(phis0), tuple(res0), jnp.array(0), resnorm(res0))
    phis, _, iters, rn = jax.lax.while_loop(cond, body, init)
    if return_info:
        tiny = jnp.asarray(jnp.finfo(rn.dtype).tiny, rn.dtype)
        return list(phis), (rn, iters, rn / jnp.maximum(tol, tiny))
    return list(phis), rn


def covered_slice_rel(geom: MLGeom, ci: int):
    """Slice of the PARENT array covered by child node ``ci``."""
    child, spec = geom.specs[ci], geom.specs[geom.parent[ci]]
    return tuple(slice(child.lo[d] // 2 - spec.lo[d],
                       child.hi[d] // 2 - spec.lo[d])
                 for d in range(geom.dm))


# ---------------------------------------------------------------------------
# composite nodal solve
# ---------------------------------------------------------------------------

def _interface_values(geom: MLGeom, lev, phi_c):
    """Fine-node boundary values on CF sides of node ``lev``, interpolated
    from its parent's nodal phi (linear along the interface)."""
    dm = geom.dm
    par = geom.parent[lev]
    spec, pspec = geom.specs[lev], geom.specs[par]
    # wrap-pad parent nodal array along its periodic axes so prolongation
    # covers the last midpoint, then prolong once and slice the box faces
    pc = phi_c
    for d in range(dm):
        if geom.side_kind(par, d, 0) == "per":
            sl = [slice(None)] * dm
            sl[d] = slice(0, 1)
            pc = jnp.concatenate([pc, pc[tuple(sl)]], axis=d)
    up = prolong_nodes(pc, dm)  # fine-node array, origin 2*pspec.lo
    vals = {}
    for d in range(dm):
        for side in range(2):
            if geom.side_kind(lev, d, side) != "cf":
                continue
            fnode = spec.lo[d] if side == 0 else spec.hi[d]
            sl = []
            for t in range(dm):
                if t == d:
                    i = fnode - 2 * pspec.lo[t]
                    sl.append(slice(i, i + 1))
                else:
                    fn_t = spec.n[t] + (0 if geom.side_kind(lev, t, 0) == "per"
                                        else 1)
                    i = spec.lo[t] - 2 * pspec.lo[t]
                    sl.append(slice(i, i + fn_t))
            vals[(d, side)] = jnp.squeeze(up[tuple(sl)], axis=d)
    return vals


def _set_interface(geom: MLGeom, lev, phi_f, vals):
    dm = geom.dm
    spec = geom.specs[lev]
    for (d, side), v in vals.items():
        sl = []
        for t in range(dm):
            if t == d:
                sl.append(slice(0, 1) if side == 0 else slice(-1, None))
            else:
                sl.append(slice(None))
        phi_f = phi_f.at[tuple(sl)].set(jnp.expand_dims(v, axis=d))
    return phi_f


def fine_nodal_mask(geom: MLGeom, lev, extra_mask=None):
    """1 = solve, 0 = fixed: CF boundary nodes + any physical Dirichlet."""
    dm = geom.dm
    spec = geom.specs[lev]
    pm = [geom.side_kind(lev, d, 0) == "per" for d in range(dm)]
    ns = nodal.node_shape(spec.n, pm)
    mask = jnp.ones(ns, geom.sim.dtype)
    from ..config import OUTLET
    for d in range(dm):
        for side in range(2):
            kind = geom.side_kind(lev, d, side)
            fixed = kind == "cf" or (
                kind == "phys" and geom.sim.phys_bc[d][side] == OUTLET)
            if fixed:
                sl = [slice(None)] * dm
                sl[d] = slice(0, 1) if side == 0 else slice(-1, None)
                mask = mask.at[tuple(sl)].set(0.0)
    return mask


def composite_nodal_solve(geom: MLGeom, sigma_l, vel_l, inflow_pad_l=None,
                          return_info=False,
                          phi0_l=None, rel_eps=1e-10,
                          max_outer=DEFAULT_OUTER):
    """Composite nodal (hg) solve over the hierarchy: the slave-node
    composite FEM problem (FBoxLib ml_nd_solve semantics, consumed via
    /root/reference/src/hg_multigrid.f90:95-105).

    The composite residual at a coarse interface node carries BOTH sides:
    the uncovered-cell coarse contributions plus the P^T-restricted
    fine-cell contributions (the nodal flux-register role). Fine midpoint
    nodes on the interface are slaves (linear interp of the coarse trace)
    whose residuals fold into their master rows through P^T. The correction
    cycle recurses fine->coarse with the correction's own interface defects
    folded down, so 3+ level hierarchies converge to solver tolerance.

    vel_l: (dm, *cells) velocity per level — needed to split the weak-form
    RHS b_i = sum_c u_c·∫∇N_i into covered / uncovered cell contributions.
    Returns (phi_l, resnorm)."""
    sim = geom.sim
    dm, nlev = geom.dm, geom.nlev
    pmask_l = [[geom.side_kind(l, d, 0) == "per" for d in range(dm)]
               for l in range(nlev)]
    if inflow_pad_l is None:
        inflow_pad_l = [None] * nlev
    rhs_l = [nodal.divu_rhs(vel_l[l], geom.dx(l), pmask_l[l], dm,
                            inflow_pad=inflow_pad_l[l])
             for l in range(nlev)]
    if nlev == 1:
        phi, info = nodal.solve(geom.specs[0].n, geom.dx(0), sim.pmask,
                                sigma_l[0], rhs_l[0], mask=sim.nodal_mask(),
                                phi0=None if phi0_l is None else phi0_l[0],
                                rel_eps=rel_eps, return_info=return_info)
        return [phi], info

    mask0 = sim.nodal_mask()
    masks = [mask0] + [fine_nodal_mask(geom, l) for l in range(1, nlev)]
    singular = mask0 is None

    # sigma folded coarse-ward (rediscretized composite coefficient for the
    # correction hierarchies) and the uncovered-only coefficient/velocity
    # (per node: zero/restrict EVERY child's covered region)
    sig_t = list(sigma_l)
    for c in range(nlev - 1, 0, -1):
        p = geom.parent[c]
        sig_t[p] = sig_t[p].at[covered_slice_rel(geom, c)].set(
            restrict_cells(sig_t[c], dm))
    sig_uncov, rhs_uncov = [None] * nlev, [None] * nlev
    for l in range(nlev):
        if not geom.children[l]:
            continue
        su = sigma_l[l]
        vu = vel_l[l]
        for c in geom.children[l]:
            cov = covered_slice_rel(geom, c)
            su = su.at[cov].set(0.0)
            vu = vu.at[(slice(None),) + cov].set(0.0)
        sig_uncov[l] = su
        rhs_uncov[l] = nodal.divu_rhs(vu, geom.dx(l), pmask_l[l], dm,
                                      inflow_pad=inflow_pad_l[l])

    hiers = [nodal.build_hierarchy(list(geom.specs[l].n), list(geom.dx(l)),
                                   pmask_l[l], sig_t[l], masks[l])
             for l in range(nlev)]
    # unmasked-apply levels: true per-level coefficients for residual math
    lev_true = [nodal.NodalLevel(tuple(geom.specs[l].n),
                                 tuple(geom.dx(l)), tuple(pmask_l[l]),
                                 sigma_l[l], hiers[l][0].diag, None)
                for l in range(nlev)]

    if phi0_l is None:
        phis = [jnp.zeros(nodal.node_shape(geom.specs[l].n, pmask_l[l]),
                          sim.dtype) for l in range(nlev)]
    else:
        phis = [jnp.asarray(p) for p in phi0_l]

    def covered_nodes(ci, full):
        """Parent-node window coincident with child ``ci``'s lattice;
        ``full`` includes the interface ring on cf sides."""
        child, spec = geom.specs[ci], geom.specs[geom.parent[ci]]
        sl = []
        for d in range(dm):
            lo = child.lo[d] // 2 - spec.lo[d]
            hi = child.hi[d] // 2 - spec.lo[d] + 1
            if geom.side_kind(ci, d, 0) == "per":
                hi -= 1
            elif not full and geom.side_kind(ci, d, 0) == "cf":
                lo += 1
            if not full and geom.side_kind(ci, d, 1) == "cf":
                hi -= 1
            sl.append(slice(lo, hi))
        return tuple(sl)

    def restrict_full(r_f, ci):
        """P^T restriction of an (unmasked) child residual onto the
        coincident coarse window (interface ring included)."""
        pm = pmask_l[ci]
        return nodal._restrict(r_f, pm, dm)

    def fine_node_window(ci):
        """Strided slices into child ``ci``'s node array giving the nodes
        coincident with covered_nodes(ci, False)."""
        child = geom.specs[ci]
        sl = []
        for d in range(dm):
            per = geom.side_kind(ci, d, 0) == "per"
            count = child.n[d] + (0 if per else 1)
            lo = 2 if geom.side_kind(ci, d, 0) == "cf" else 0
            stop = count - 2 if geom.side_kind(ci, d, 1) == "cf" else count
            sl.append(slice(lo, stop + 1, 2))
        return tuple(sl)

    def set_interfaces(phis):
        for l in range(1, nlev):
            phis[l] = _set_interface(
                geom, l, phis[l],
                _interface_values(geom, l, phis[geom.parent[l]]))
        return phis

    def comp_residuals(phis):
        """Unmasked composite residual per node, folded fine->coarse:
        leaf rows = b - A phi (zero-extended); covered + interface rows of
        a parent = uncovered-cell part + P^T(each child's residual)."""
        res = [None] * nlev
        for l in range(nlev - 1, -1, -1):
            if not geom.children[l]:
                res[l] = rhs_l[l] - nodal.nd_apply_raw(lev_true[l], phis[l])
                continue
            r_own = rhs_uncov[l] - nodal._factored_apply(
                phis[l], sig_uncov[l], geom.dx(l), pmask_l[l], dm)
            for c in geom.children[l]:
                r_own = r_own.at[covered_nodes(c, True)].add(
                    restrict_full(res[c], c))
            res[l] = r_own
        return res

    def resnorm(res):
        parts = []
        r0 = res[0] if masks[0] is None else res[0] * masks[0]
        r0 = r0 - jnp.mean(r0) if singular else r0
        parts.append(jnp.max(jnp.abs(r0)))
        for l in range(1, nlev):
            parts.append(jnp.max(jnp.abs(res[l] * masks[l])))
        return jnp.max(jnp.stack(parts))

    def comp_correction(res):
        """One recursive composite V-cycle on A_comp d = res (homogeneous
        interface/physical BCs), the ml_nd structure."""
        d = [jnp.zeros_like(r) for r in res]
        res = list(res)
        for l in range(nlev - 1, 0, -1):
            p = geom.parent[l]
            d[l] = nodal.v_cycle(hiers[l], d[l], res[l] * masks[l])
            d[l] = d[l] * masks[l]
            # fold the correction's composite defect into the parent rows
            res[p] = res[p].at[covered_nodes(l, True)].add(
                restrict_full(-nodal.nd_apply_raw(hiers[l][0], d[l]), l))
        r0 = res[0]
        if singular:
            r0 = r0 - jnp.mean(r0)
        if masks[0] is not None:
            r0 = r0 * masks[0]
        d[0] = nodal.v_cycle(hiers[0], d[0], r0)
        for l in range(1, nlev):
            seed = _prolong_node_patch(geom, l, d[geom.parent[l]])
            d[l] = d[l] + seed  # interface rows get the parent-interp trace
            rl = (res[l] - nodal.nd_apply_raw(hiers[l][0], d[l])) * masks[l]
            d[l] = d[l] + nodal.v_cycle(hiers[l], jnp.zeros_like(rl),
                                        rl) * masks[l]
        return d

    def slave(phis):
        for c in range(nlev - 1, 0, -1):
            p = geom.parent[c]
            phis[p] = phis[p].at[covered_nodes(c, False)].set(
                phis[c][fine_node_window(c)])
        return phis

    def body(carry):
        # one composite residual evaluation per outer (monitor doubles as
        # the next correction's source; see composite_cc_solve)
        phis, res, k, _ = carry
        phis = list(phis)
        d = comp_correction(list(res))
        phis = [p + di for p, di in zip(phis, d)]
        phis = set_interfaces(phis)
        phis = slave(phis)
        if singular:
            m = jnp.mean(phis[0])
            phis = [p - m for p in phis]
        res = comp_residuals(phis)
        return tuple(phis), tuple(res), k + 1, resnorm(res)

    bnorm = jnp.max(jnp.stack([jnp.max(jnp.abs(r)) for r in rhs_l]))

    def cond(carry):
        _, _, k, rn = carry
        return jnp.logical_and(k < max_outer, rn > rel_eps * bnorm)

    phis = set_interfaces(list(phis))
    res0 = comp_residuals(phis)
    init = (tuple(phis), tuple(res0), jnp.array(0), resnorm(res0))
    phis, _, iters, rn = jax.lax.while_loop(cond, body, init)
    out_phis = list(set_interfaces(list(phis)))
    if return_info:
        tiny = jnp.asarray(jnp.finfo(rn.dtype).tiny, rn.dtype)
        return out_phis, (rn, iters, rn / jnp.maximum(rel_eps * bnorm, tiny))
    return out_phis, rn


def _prolong_node_patch(geom: MLGeom, lev, dc):
    """Prolong a parent nodal correction onto node ``lev``'s lattice."""
    dm = geom.dm
    par = geom.parent[lev]
    spec, pspec = geom.specs[lev], geom.specs[par]
    pc = dc
    for d in range(dm):
        if geom.side_kind(par, d, 0) == "per":
            sl = [slice(None)] * dm
            sl[d] = slice(0, 1)
            pc = jnp.concatenate([pc, pc[tuple(sl)]], axis=d)
    up = prolong_nodes(pc, dm)  # fine-node lattice, origin 2*pspec.lo
    sl = []
    for d in range(dm):
        fn = spec.n[d] + (0 if geom.side_kind(lev, d, 0) == "per" else 1)
        i = spec.lo[d] - 2 * pspec.lo[d]
        sl.append(slice(i, i + fn))
    return up[tuple(sl)]
