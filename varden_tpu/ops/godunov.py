"""Unsplit BCG Godunov edge-state prediction (2-D).

TPU-native re-derivation of the reference's velpred (src/velpred.f90:125-524)
and mkflux (src/mkflux.f90:152-691). The reference streams rolling 2-row
windows through memory — a CPU cache trick; here every stage is a vectorized
op over *windowed* arrays (ops/window.Win): shifts are zero-copy coordinate
relabelings, combinations are static-slice intersections that XLA fuses.
The round-1 full-array jnp.roll formulation is preserved in godunov_ref.py
as the debug oracle (the reference's *_debug_* role).

Face-array convention: an x-face value for the face between cells i-1 and i is
stored at padded cell coordinate i ("cell-aligned" face windows; the physical
face range along x is [ng, ng+nx]).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..config import INLET, NO_SLIP_WALL, OUTLET, PERIODIC, SLIP_WALL, SYMMETRY
from .slopes import slope
from .window import Win, full, wmap

ABS_EPS = 1.0e-8  # velpred.f90:204 / mkflux.f90:238


def _riemann_normal(l, r, eps):
    """Normal-velocity Riemann upwind (velpred.f90:310-316)."""
    uavg = 0.5 * (l + r)
    test = jnp.logical_or(jnp.logical_and(l <= 0.0, r >= 0.0),
                          jnp.abs(l + r) < eps)
    sel = jnp.where(uavg > 0.0, l, r)
    return jnp.where(test, 0.0, sel)


def _riemann_transverse(l, r, adv, eps):
    """Upwind a transverse/scalar state by advection velocity ``adv``
    (velpred.f90:318-321, mkflux.f90:371-376)."""
    sel = jnp.where(adv > 0.0, l, r)
    return jnp.where(jnp.abs(adv) > eps, sel, 0.5 * (l + r))


def _riemann_normal_w(l: Win, r: Win, eps) -> Win:
    return wmap(lambda lv, rv: _riemann_normal(lv, rv, eps), l, r)


def _riemann_transverse_w(l: Win, r: Win, adv: Win, eps) -> Win:
    return wmap(lambda lv, rv, av: _riemann_transverse(lv, rv, av, eps),
                l, r, adv)


def mac_wins(mac_pads, ng, n_cell):
    """Wrap padded cell-aligned MAC arrays as Wins restricted to their valid
    region: faces [ng, ng+n+1) along the own axis, cells [ng-1, ng+n+1)
    tangentially (one valid tangential ghost — what embed_faces/grow_mac_ml
    provide; anything outside is zero fill and must never be read)."""
    dm = len(mac_pads)
    out = []
    for d in range(dm):
        lo = [ng if t == d else ng - 1 for t in range(dm)]
        hi = [ng + n_cell[t] + 1 for t in range(dm)]
        out.append(full(mac_pads[d], dm).to(lo, hi))
    return out


# ---------------------------------------------------------------------------
# velpred: MAC velocity prediction
# ---------------------------------------------------------------------------

def velpred_2d(u: jnp.ndarray, force: jnp.ndarray, dt: float,
               dx: Sequence[float], phys_bc, adv_bc_vel, ng: int,
               n_cell: Sequence[int], slope_order: int, use_minion: bool
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict face-centered MAC velocities.

    u, force: (2, Nx, Ny) ghost-padded. Returns interior (nx+1, ny) umac and
    (nx, ny+1) vmac.
    """
    dm = 2
    nx, ny = n_cell
    dt2, dt4 = 0.5 * dt, 0.25 * dt
    hx, hy = dx

    umax = jnp.max(jnp.abs(u[:, ng:ng + nx, ng:ng + ny]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    uw = [full(u[c], dm) for c in range(dm)]
    fw = [full(force[c], dm) for c in range(dm)]
    slopes = [[slope(u[c], a, ng, adv_bc_vel[c][a][0], adv_bc_vel[c][a][1],
                     slope_order, n_cell[a], dm=dm) for c in range(dm)]
              for a in range(dm)]

    def normal_states(axis, h):
        """1-D extrapolation of both velocity components to ``axis`` faces
        (velpred.f90:258-273)."""
        un = uw[axis]  # normal velocity component
        lo_fac = wmap(lambda x: 0.5 - dt2 * jnp.maximum(0.0, x) / h, un)
        hi_fac = wmap(lambda x: 0.5 + dt2 * jnp.minimum(0.0, x) / h, un)
        l = [(uw[c] + lo_fac * slopes[axis][c]).shift(axis, -1)
             for c in range(dm)]
        r = [uw[c] - hi_fac * slopes[axis][c] for c in range(dm)]
        if use_minion:
            l = [l[c] + dt2 * fw[c].shift(axis, -1) for c in range(dm)]
            r = [r[c] + dt2 * fw[c] for c in range(dm)]
        return l, r

    def apply_face_bc(l, r, axis, n_ax):
        """Physical-boundary overrides on the normal-face states
        (velpred.f90:276-308)."""
        nrm, tng = axis, 1 - axis
        for side, fidx in ((0, ng), (1, ng + n_ax)):
            pb = phys_bc[axis][side]
            if pb in (PERIODIC,):
                continue
            gidx = fidx - 1 if side == 0 else fidx  # ghost cell just outside
            ug = [uw[c].plane(axis, gidx, as_coord=fidx) for c in range(dm)]
            ln = l[nrm].plane(axis, fidx)
            rn = r[nrm].plane(axis, fidx)
            lt = l[tng].plane(axis, fidx)
            rt = r[tng].plane(axis, fidx)
            if pb == INLET:
                ln = rn = ug[nrm]
                lt = rt = ug[tng]
            elif pb == SLIP_WALL:
                ln = rn = ln.zeros_like()
                if side == 0:
                    lt = rt
                else:
                    rt = lt
            elif pb == NO_SLIP_WALL:
                ln = rn = ln.zeros_like()
                lt = rt = lt.zeros_like()
            elif pb == OUTLET:
                if side == 0:
                    rn = wmap(lambda x: jnp.minimum(x, 0.0), rn)
                    ln = rn
                    lt = rt
                else:
                    ln = wmap(lambda x: jnp.maximum(x, 0.0), ln)
                    rn = ln
                    rt = lt
            elif pb == SYMMETRY:
                # reflect: normal odd -> face value 0; tangential even
                ln = rn = ln.zeros_like()
            l[nrm] = l[nrm].set_plane(axis, fidx, ln)
            r[nrm] = r[nrm].set_plane(axis, fidx, rn)
            l[tng] = l[tng].set_plane(axis, fidx, lt)
            r[tng] = r[tng].set_plane(axis, fidx, rt)
        return l, r

    # intermediate (hat) states on x- and y-faces
    ulx, urx = normal_states(0, hx)
    ulx, urx = apply_face_bc(ulx, urx, 0, nx)
    uimhx0 = _riemann_normal_w(ulx[0], urx[0], eps)
    uimhx1 = _riemann_transverse_w(ulx[1], urx[1], uimhx0, eps)

    uly, ury = normal_states(1, hy)
    uly, ury = apply_face_bc(uly, ury, 1, ny)
    uimhy1 = _riemann_normal_w(uly[1], ury[1], eps)
    uimhy0 = _riemann_transverse_w(uly[0], ury[0], uimhy1, eps)

    def full_states(axis, l_ax, r_ax, t_imh_n, t_imh_t, h_t):
        """Add the transverse correction (velpred.f90:402-498).

        axis: direction of the predicted MAC component. t_imh_n: the hat
        normal velocity on transverse faces; t_imh_t: the hat velocity
        component ``axis`` on transverse faces. h_t: transverse spacing.
        """
        t = 1 - axis
        # transverse faces bounding a cell row: face j (lo) and j+1 (hi)
        corr = (dt4 / h_t) * (t_imh_n + t_imh_n.shift(t, 1)) * \
            (t_imh_t.shift(t, 1) - t_imh_t)
        # left state comes from the cell behind the face along ``axis``
        macl = l_ax[axis] - corr.shift(axis, -1)
        macr = r_ax[axis] - corr
        if not use_minion:
            macl = macl + dt2 * fw[axis].shift(axis, -1)
            macr = macr + dt2 * fw[axis]
        return macl, macr

    umacl, umacr = full_states(0, ulx, urx, uimhy1, uimhy0, hy)
    vmacl, vmacr = full_states(1, uly, ury, uimhx0, uimhx1, hx)

    def finalize(axis, macl, macr, n_ax):
        mac = _riemann_normal_w(macl, macr, eps)
        for side, fidx in ((0, ng), (1, ng + n_ax)):
            pb = phys_bc[axis][side]
            if pb == PERIODIC:
                continue
            if pb in (SLIP_WALL, NO_SLIP_WALL, SYMMETRY):
                val = mac.plane(axis, fidx).zeros_like()
            elif pb == INLET:
                gidx = fidx - 1 if side == 0 else fidx
                val = uw[axis].plane(axis, gidx, as_coord=fidx)
            elif pb == OUTLET:
                if side == 0:
                    val = wmap(lambda x: jnp.minimum(x, 0.0),
                               macr.plane(axis, fidx))
                else:
                    val = wmap(lambda x: jnp.maximum(x, 0.0),
                               macl.plane(axis, fidx))
            else:
                continue
            mac = mac.set_plane(axis, fidx, val)
        return mac

    umac = finalize(0, umacl, umacr, nx)
    vmac = finalize(1, vmacl, vmacr, ny)

    return (umac.crop((ng, ng), (ng + nx + 1, ng + ny)),
            vmac.crop((ng, ng), (ng + nx, ng + ny + 1)))


# ---------------------------------------------------------------------------
# mkflux: edge states / fluxes for cell-centered quantities
# ---------------------------------------------------------------------------

def mkflux_2d(s: jnp.ndarray, umac_pad: jnp.ndarray, vmac_pad: jnp.ndarray,
              force: jnp.ndarray, mac_rhs: jnp.ndarray, dt: float,
              dx: Sequence[float], phys_bc, adv_bc, ng: int,
              n_cell: Sequence[int], is_vel: bool,
              is_conservative: Sequence[bool], slope_order: int,
              use_minion: bool):
    """Godunov edge states sedgex/sedgey and conservative fluxes.

    s, force: (nc, Nx, Ny) ghost-padded cell arrays; mac_rhs is (Nx, Ny).
    umac_pad/vmac_pad: cell-aligned padded face arrays with >=1 valid
    tangential ghost row. Returns interior sedgex (nc, nx+1, ny),
    sedgey (nc, nx, ny+1), fluxx, fluxy.
    """
    dm = 2
    nx, ny = n_cell
    nc = s.shape[0]
    dt2, dt4 = 0.5 * dt, 0.25 * dt

    macw = mac_wins((umac_pad, vmac_pad), ng, n_cell)

    umax = jnp.maximum(
        jnp.max(jnp.abs(umac_pad[ng:ng + nx + 1, ng:ng + ny])),
        jnp.max(jnp.abs(vmac_pad[ng:ng + nx, ng:ng + ny + 1])))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    sw = [full(s[c], dm) for c in range(nc)]
    fw = [full(force[c], dm) for c in range(nc)]
    mrw = full(mac_rhs, dm)

    slopes = [[slope(s[c], a, ng, adv_bc[c][a][0], adv_bc[c][a][1],
                     slope_order, n_cell[a], dm=dm) for c in range(nc)]
              for a in range(dm)]
    n_ax = (nx, ny)

    def normal_states(c, axis):
        """1-D extrapolation of s[c] to ``axis`` faces (mkflux.f90:299-314)."""
        adv = macw[axis]
        sl_ax = slopes[axis][c]
        h = dx[axis]
        l = (sw[c] + 0.5 * sl_ax).shift(axis, -1) - \
            (dt2 / h) * adv * sl_ax.shift(axis, -1)
        r = sw[c] - (0.5 + dt2 * adv / h) * sl_ax
        if use_minion:
            l = l + dt2 * fw[c].shift(axis, -1)
            r = r + dt2 * fw[c]
        if use_minion and is_conservative[c]:
            l = l - dt2 * (sw[c] * mrw).shift(axis, -1)
            r = r - dt2 * sw[c] * mrw
        return l, r

    def apply_face_bc(l, r, c, axis):
        """mkflux.f90:318-376 boundary overrides on normal states."""
        for side, fidx in ((0, ng), (1, ng + n_ax[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC:
                continue
            gidx = fidx - 1 if side == 0 else fidx
            sg = sw[c].plane(axis, gidx, as_coord=fidx)
            lv = l.plane(axis, fidx)
            rv = r.plane(axis, fidx)
            normal_vel = is_vel and c == axis
            if pb == INLET:
                lv = rv = sg
            elif pb == SLIP_WALL:
                if normal_vel:
                    lv = rv = lv.zeros_like()
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == NO_SLIP_WALL:
                if is_vel:
                    lv = rv = lv.zeros_like()
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == OUTLET:
                if normal_vel:
                    if side == 0:
                        lv = rv = wmap(lambda x: jnp.minimum(x, 0.0), rv)
                    else:
                        lv = rv = wmap(lambda x: jnp.maximum(x, 0.0), lv)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == SYMMETRY:
                if normal_vel:
                    lv = rv = lv.zeros_like()
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            l = l.set_plane(axis, fidx, lv)
            r = r.set_plane(axis, fidx, rv)
        return l, r

    sedgex_l, sedgey_l, fluxx_l, fluxy_l = [], [], [], []

    for c in range(nc):
        # hat states on both face sets
        slx_, srx_ = normal_states(c, 0)
        slx_, srx_ = apply_face_bc(slx_, srx_, c, 0)
        simhx = _riemann_transverse_w(slx_, srx_, macw[0], eps)

        sly_, sry_ = normal_states(c, 1)
        sly_, sry_ = apply_face_bc(sly_, sry_, c, 1)
        simhy = _riemann_transverse_w(sly_, sry_, macw[1], eps)

        hats = (simhx, simhy)
        ls = (slx_, sly_)
        rs = (srx_, sry_)

        def edge_states(axis):
            """Transverse-corrected edge states (mkflux.f90:470-505,573-601)."""
            t = 1 - axis
            h_t = dx[t]
            adv_t = macw[t]
            hat_t = hats[t]
            a_lo, a_hi = adv_t, adv_t.shift(t, 1)
            h_lo, h_hi = hat_t, hat_t.shift(t, 1)
            if is_conservative[c]:
                corr = (dt2 / h_t) * (h_hi * a_hi - h_lo * a_lo) \
                    - (dt2 / h_t) * sw[c] * (a_hi - a_lo)
            else:
                corr = (dt4 / h_t) * (a_lo + a_hi) * (h_hi - h_lo)
            el = ls[axis] - corr.shift(axis, -1)
            er = rs[axis] - corr
            if not use_minion:
                el = el + dt2 * fw[c].shift(axis, -1)
                er = er + dt2 * fw[c]
            if (not use_minion) and is_conservative[c]:
                el = el - dt2 * (sw[c] * mrw).shift(axis, -1)
                er = er - dt2 * sw[c] * mrw
            return el, er

        def finalize(axis, el, er):
            """Riemann + boundary overrides on final edge states
            (mkflux.f90:508-553, 604-651)."""
            edge = _riemann_transverse_w(el, er, macw[axis], eps)
            for side, fidx in ((0, ng), (1, ng + n_ax[axis])):
                pb = phys_bc[axis][side]
                if pb == PERIODIC:
                    continue
                gidx = fidx - 1 if side == 0 else fidx
                inner = (er if side == 0 else el).plane(axis, fidx)
                normal_vel = is_vel and c == axis
                if pb == INLET:
                    val = sw[c].plane(axis, gidx, as_coord=fidx)
                elif pb in (SLIP_WALL, NO_SLIP_WALL, SYMMETRY):
                    if (is_vel and pb == NO_SLIP_WALL) or normal_vel:
                        val = inner.zeros_like()
                    else:
                        val = inner
                elif pb == OUTLET:
                    if normal_vel:
                        val = wmap(lambda x: jnp.minimum(x, 0.0), inner) \
                            if side == 0 else \
                            wmap(lambda x: jnp.maximum(x, 0.0), inner)
                    else:
                        val = inner
                else:
                    continue
                edge = edge.set_plane(axis, fidx, val)
            return edge

        ex_l, ex_r = edge_states(0)
        ey_l, ey_r = edge_states(1)
        ex = finalize(0, ex_l, ex_r)
        ey = finalize(1, ey_l, ey_r)
        sedgex_l.append(ex)
        sedgey_l.append(ey)
        fluxx_l.append(ex * macw[0] if is_conservative[c] else None)
        fluxy_l.append(ey * macw[1] if is_conservative[c] else None)

    def crop_x(f):
        return f.crop((ng, ng), (ng + nx + 1, ng + ny))

    def crop_y(f):
        return f.crop((ng, ng), (ng + nx, ng + ny + 1))

    # crop BEFORE stacking so the stack concatenates small interior arrays
    sedgex = jnp.stack([crop_x(f) for f in sedgex_l])
    sedgey = jnp.stack([crop_y(f) for f in sedgey_l])
    fluxx = jnp.stack([crop_x(f) if f is not None
                       else jnp.zeros_like(crop_x(sedgex_l[i]))
                       for i, f in enumerate(fluxx_l)])
    fluxy = jnp.stack([crop_y(f) if f is not None
                       else jnp.zeros_like(crop_y(sedgey_l[i]))
                       for i, f in enumerate(fluxy_l)])
    return sedgex, sedgey, fluxx, fluxy
