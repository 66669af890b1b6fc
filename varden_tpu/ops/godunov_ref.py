"""Debug-oracle Godunov implementations (full-array jnp.roll form).

These are the round-1 implementations, preserved verbatim as the reference
oracle for the windowed fast path in godunov.py/godunov3d.py — the exact role
the reference's *_debug_* variants play (src/velpred.f90:526-1774,
src/mkflux.f90:693-1184,2569-3882, selected by use_godunov_debug,
_parameters:83): same math, simpler full-array indexing, used to validate the
optimized implementation against itself. Also selected at runtime by the
use_godunov_debug config flag.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..config import INLET, NO_SLIP_WALL, OUTLET, PERIODIC, SLIP_WALL, SYMMETRY
from .slopes import slope_ref as slope
from .stencil import shift

ABS_EPS = 1.0e-8  # velpred.f90:204 / mkflux.f90:238


def _face_set(arr, axis, idx, val):
    """Overwrite one face plane. Implemented as a fusable select (a
    dynamic-update-slice would materialize a full-array copy on TPU — the
    profiler showed those copies rivaling the actual Godunov math)."""
    shape = [1] * arr.ndim
    shape[axis] = arr.shape[axis]
    ii = jnp.arange(arr.shape[axis]).reshape(shape)
    return jnp.where(ii == idx, val, arr)


def _face_get(arr, axis, idx):
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(idx, idx + 1)
    return arr[tuple(sl)]


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
    nx, ny = n_cell
    dt2, dt4 = 0.5 * dt, 0.25 * dt
    hx, hy = dx

    umax = jnp.max(jnp.abs(u[:, ng:ng + nx, ng:ng + ny]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    slx = jnp.stack([slope(u[c], 0, ng, adv_bc_vel[c][0][0], adv_bc_vel[c][0][1],
                           slope_order, nx) for c in range(2)])
    sly = jnp.stack([slope(u[c], 1, ng, adv_bc_vel[c][1][0], adv_bc_vel[c][1][1],
                           slope_order, ny) for c in range(2)])

    def normal_states(axis, sl_ax, h):
        """1-D extrapolation of both velocity components to ``axis`` faces
        (velpred.f90:258-273)."""
        un = u[axis]  # normal velocity component
        lo_fac = 0.5 - dt2 * jnp.maximum(0.0, un) / h
        hi_fac = 0.5 + dt2 * jnp.minimum(0.0, un) / h
        l = [shift(u[c] + lo_fac * sl_ax[c], axis, -1) for c in range(2)]
        r = [u[c] - hi_fac * sl_ax[c] for c in range(2)]
        if use_minion:
            l = [l[c] + dt2 * shift(force[c], axis, -1) for c in range(2)]
            r = [r[c] + dt2 * force[c] for c in range(2)]
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
            ug = [_face_get(u[c], axis, gidx) for c in range(2)]
            ln = _face_get(l[nrm], axis, fidx)
            rn = _face_get(r[nrm], axis, fidx)
            lt = _face_get(l[tng], axis, fidx)
            rt = _face_get(r[tng], axis, fidx)
            if pb == INLET:
                ln = rn = ug[nrm]
                lt = rt = ug[tng]
            elif pb == SLIP_WALL:
                ln = rn = jnp.zeros_like(ln)
                if side == 0:
                    lt = rt
                else:
                    rt = lt
            elif pb == NO_SLIP_WALL:
                ln = rn = jnp.zeros_like(ln)
                lt = rt = jnp.zeros_like(lt)
            elif pb == OUTLET:
                if side == 0:
                    rn = jnp.minimum(rn, 0.0)
                    ln = rn
                    lt = rt
                else:
                    ln = jnp.maximum(ln, 0.0)
                    rn = ln
                    rt = lt
            elif pb == SYMMETRY:
                # reflect: normal odd -> face value 0; tangential even
                ln = rn = jnp.zeros_like(ln)
            l[nrm] = _face_set(l[nrm], axis, fidx, ln)
            r[nrm] = _face_set(r[nrm], axis, fidx, rn)
            l[tng] = _face_set(l[tng], axis, fidx, lt)
            r[tng] = _face_set(r[tng], axis, fidx, rt)
        return l, r

    # intermediate (hat) states on x- and y-faces
    ulx, urx = normal_states(0, slx, hx)
    ulx, urx = apply_face_bc(ulx, urx, 0, nx)
    uimhx0 = _riemann_normal(ulx[0], urx[0], eps)
    uimhx1 = _riemann_transverse(ulx[1], urx[1], uimhx0, eps)

    uly, ury = normal_states(1, sly, hy)
    uly, ury = apply_face_bc(uly, ury, 1, ny)
    uimhy1 = _riemann_normal(uly[1], ury[1], eps)
    uimhy0 = _riemann_transverse(uly[0], ury[0], uimhy1, eps)

    def full_states(axis, l_ax, r_ax, t_imh_n, t_imh_t, h_t):
        """Add the transverse correction (velpred.f90:402-498).

        axis: direction of the predicted MAC component. t_imh_n: the hat
        normal velocity on transverse faces; t_imh_t: the hat velocity
        component ``axis`` on transverse faces. h_t: transverse spacing.
        """
        t = 1 - axis
        # transverse faces bounding a cell row: face j (lo) and j+1 (hi)
        tn_lo, tn_hi = t_imh_n, shift(t_imh_n, t, 1)
        tt_lo, tt_hi = t_imh_t, shift(t_imh_t, t, 1)
        corr = (dt4 / h_t) * (tn_lo + tn_hi) * (tt_hi - tt_lo)
        # left state comes from the cell behind the face along ``axis``
        macl = l_ax[axis] - shift(corr, axis, -1)
        macr = r_ax[axis] - corr
        if not use_minion:
            macl = macl + dt2 * shift(force[axis], axis, -1)
            macr = macr + dt2 * force[axis]
        return macl, macr

    umacl, umacr = full_states(0, ulx, urx, uimhy1, uimhy0, hy)
    vmacl, vmacr = full_states(1, uly, ury, uimhx0, uimhx1, hx)

    def finalize(axis, macl, macr, n_ax):
        mac = _riemann_normal(macl, macr, eps)
        for side, fidx in ((0, ng), (1, ng + n_ax)):
            pb = phys_bc[axis][side]
            if pb == PERIODIC:
                continue
            cur = _face_get(mac, axis, fidx)
            if pb in (SLIP_WALL, NO_SLIP_WALL, SYMMETRY):
                val = jnp.zeros_like(cur)
            elif pb == INLET:
                gidx = fidx - 1 if side == 0 else fidx
                val = _face_get(u[axis], axis, gidx)
            elif pb == OUTLET:
                if side == 0:
                    val = jnp.minimum(_face_get(macr, axis, fidx), 0.0)
                else:
                    val = jnp.maximum(_face_get(macl, axis, fidx), 0.0)
            else:
                continue
            mac = _face_set(mac, axis, fidx, val)
        return mac

    umac = finalize(0, umacl, umacr, nx)
    vmac = finalize(1, vmacl, vmacr, ny)

    return (umac[ng:ng + nx + 1, ng:ng + ny],
            vmac[ng:ng + nx, ng:ng + ny + 1])


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

    s, force, mac_rhs: (nc, Nx, Ny) ghost-padded cell arrays (mac_rhs is
    (Nx, Ny)). umac_pad/vmac_pad: cell-aligned padded face arrays with valid
    tangential ghost rows (>=1). Returns interior sedgex (nc, nx+1, ny),
    sedgey (nc, nx, ny+1), fluxx, fluxy.
    """
    nx, ny = n_cell
    nc = s.shape[0]
    dt2, dt4 = 0.5 * dt, 0.25 * dt
    hx, hy = dx

    umax = jnp.maximum(
        jnp.max(jnp.abs(umac_pad[ng:ng + nx + 1, ng:ng + ny])),
        jnp.max(jnp.abs(vmac_pad[ng:ng + nx, ng:ng + ny + 1])))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    slopex = jnp.stack([slope(s[c], 0, ng, adv_bc[c][0][0], adv_bc[c][0][1],
                              slope_order, nx) for c in range(nc)])
    slopey = jnp.stack([slope(s[c], 1, ng, adv_bc[c][1][0], adv_bc[c][1][1],
                              slope_order, ny) for c in range(nc)])

    mac = (umac_pad, vmac_pad)
    slopes = (slopex, slopey)
    n_ax = (nx, ny)

    def normal_states(c, axis):
        """1-D extrapolation of s[c] to ``axis`` faces (mkflux.f90:299-314)."""
        adv = mac[axis]
        sl_ax = slopes[axis][c]
        l = shift(s[c] + (0.5 * jnp.ones_like(adv)) * sl_ax, axis, -1) \
            - (dt2 / (hx if axis == 0 else hy)) * adv * shift(sl_ax, axis, -1)
        r = s[c] - (0.5 + dt2 * adv / (hx if axis == 0 else hy)) * sl_ax
        if use_minion:
            l = l + dt2 * shift(force[c], axis, -1)
            r = r + dt2 * force[c]
        if use_minion and is_conservative[c]:
            l = l - dt2 * shift(s[c] * mac_rhs, axis, -1)
            r = r - dt2 * s[c] * mac_rhs
        return l, r

    def apply_face_bc(l, r, c, axis):
        """mkflux.f90:318-376 boundary overrides on normal states."""
        for side, fidx in ((0, ng), (1, ng + n_ax[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC:
                continue
            gidx = fidx - 1 if side == 0 else fidx
            sg = _face_get(s[c], axis, gidx)
            lv = _face_get(l, axis, fidx)
            rv = _face_get(r, axis, fidx)
            normal_vel = is_vel and c == axis
            if pb == INLET:
                lv = rv = sg
            elif pb == SLIP_WALL:
                if normal_vel:
                    lv = rv = jnp.zeros_like(lv)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == NO_SLIP_WALL:
                if is_vel:
                    lv = rv = jnp.zeros_like(lv)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == OUTLET:
                if normal_vel:
                    if side == 0:
                        lv = rv = jnp.minimum(rv, 0.0)
                    else:
                        lv = rv = jnp.maximum(lv, 0.0)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == SYMMETRY:
                if normal_vel:
                    lv = rv = jnp.zeros_like(lv)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            l = _face_set(l, axis, fidx, lv)
            r = _face_set(r, axis, fidx, rv)
        return l, r

    sedgex_l, sedgey_l, fluxx_l, fluxy_l = [], [], [], []

    for c in range(nc):
        # hat states on both face sets
        slx_, srx_ = normal_states(c, 0)
        slx_, srx_ = apply_face_bc(slx_, srx_, c, 0)
        simhx = _riemann_transverse(slx_, srx_, umac_pad, eps)

        sly_, sry_ = normal_states(c, 1)
        sly_, sry_ = apply_face_bc(sly_, sry_, c, 1)
        simhy = _riemann_transverse(sly_, sry_, vmac_pad, eps)

        hats = (simhx, simhy)
        ls = (slx_, sly_)
        rs = (srx_, sry_)

        def edge_states(axis):
            """Transverse-corrected edge states (mkflux.f90:470-505,573-601)."""
            t = 1 - axis
            h_t = hy if axis == 0 else hx
            adv_t = mac[t]
            hat_t = hats[t]
            a_lo, a_hi = adv_t, shift(adv_t, t, 1)
            h_lo, h_hi = hat_t, shift(hat_t, t, 1)
            if is_conservative[c]:
                corr = (dt2 / h_t) * (h_hi * a_hi - h_lo * a_lo) \
                    - (dt2 / h_t) * s[c] * (a_hi - a_lo)
            else:
                corr = (dt4 / h_t) * (a_lo + a_hi) * (h_hi - h_lo)
            el = ls[axis] - shift(corr, axis, -1)
            er = rs[axis] - corr
            if not use_minion:
                el = el + dt2 * shift(force[c], axis, -1)
                er = er + dt2 * force[c]
            if (not use_minion) and is_conservative[c]:
                el = el - dt2 * shift(s[c] * mac_rhs, axis, -1)
                er = er - dt2 * s[c] * mac_rhs
            return el, er

        def finalize(axis, el, er):
            """Riemann + boundary overrides on final edge states
            (mkflux.f90:508-553, 604-651)."""
            edge = _riemann_transverse(el, er, mac[axis], eps)
            for side, fidx in ((0, ng), (1, ng + n_ax[axis])):
                pb = phys_bc[axis][side]
                if pb == PERIODIC:
                    continue
                gidx = fidx - 1 if side == 0 else fidx
                cur = _face_get(edge, axis, fidx)
                inner = _face_get(er if side == 0 else el, axis, fidx)
                normal_vel = is_vel and c == axis
                if pb == INLET:
                    val = _face_get(s[c], axis, gidx)
                elif pb in (SLIP_WALL, NO_SLIP_WALL, SYMMETRY):
                    if (is_vel and pb == NO_SLIP_WALL) or normal_vel:
                        val = jnp.zeros_like(cur)
                    else:
                        val = inner
                elif pb == OUTLET:
                    if normal_vel:
                        val = jnp.minimum(inner, 0.0) if side == 0 \
                            else jnp.maximum(inner, 0.0)
                    else:
                        val = inner
                else:
                    continue
                edge = _face_set(edge, axis, fidx, val)
            return edge

        ex_l, ex_r = edge_states(0)
        ey_l, ey_r = edge_states(1)
        ex = finalize(0, ex_l, ex_r)
        ey = finalize(1, ey_l, ey_r)
        sedgex_l.append(ex)
        sedgey_l.append(ey)
        zero = jnp.zeros_like(ex)
        fluxx_l.append(ex * umac_pad if is_conservative[c] else zero)
        fluxy_l.append(ey * vmac_pad if is_conservative[c] else zero)

    def crop_x(f):
        return f[..., ng:ng + nx + 1, ng:ng + ny]

    def crop_y(f):
        return f[..., ng:ng + nx, ng:ng + ny + 1]

    # crop BEFORE stacking so the stack concatenates small interior arrays
    sedgex = jnp.stack([crop_x(f) for f in sedgex_l])
    sedgey = jnp.stack([crop_y(f) for f in sedgey_l])
    fluxx = jnp.stack([crop_x(f) for f in fluxx_l])
    fluxy = jnp.stack([crop_y(f) for f in fluxy_l])
    return sedgex, sedgey, fluxx, fluxy


# ---------------------------------------------------------------------------
# 3-D
# ---------------------------------------------------------------------------

_OTHERS = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


def _third(a, b):
    return 3 - a - b


def vel_slopes_3d(u, adv_bc_vel, ng, n_cell, slope_order):
    """Per-axis limited slopes of all velocity components (shared between
    velpred and the velocity mkflux — the math is identical)."""
    dm = 3
    return [jnp.stack([slope(u[c], a, ng, adv_bc_vel[c][a][0],
                             adv_bc_vel[c][a][1], slope_order, n_cell[a])
                       for c in range(dm)]) for a in range(dm)]


def velpred_3d(u: jnp.ndarray, force: jnp.ndarray, dt, dx: Sequence[float],
               phys_bc, adv_bc_vel, ng: int, n_cell: Sequence[int],
               slope_order: int, use_minion: bool, slopes=None
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """u, force: (3, Nx, Ny, Nz) ghost-padded. Returns interior MAC faces."""
    dm = 3
    dt2, dt4, dt6 = 0.5 * dt, 0.25 * dt, dt / 6.0

    umax = jnp.max(jnp.abs(u[:, ng:ng + n_cell[0], ng:ng + n_cell[1],
                           ng:ng + n_cell[2]]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    if slopes is None:
        slopes = vel_slopes_3d(u, adv_bc_vel, ng, n_cell, slope_order)

    def apply_face_bc(l, r, axis, comp_is_normal_zero=True):
        """velpred.f90:1074-1105-style overrides on hat states (all comps)."""
        for side, fidx in ((0, ng), (1, ng + n_cell[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC:
                continue
            gidx = fidx - 1 if side == 0 else fidx
            for c in range(dm):
                lv = _face_get(l[c], axis, fidx)
                rv = _face_get(r[c], axis, fidx)
                if pb == INLET:
                    lv = rv = _face_get(u[c], axis, gidx)
                elif pb == SLIP_WALL:
                    if c == axis:
                        lv = rv = jnp.zeros_like(lv)
                    elif side == 0:
                        lv = rv
                    else:
                        rv = lv
                elif pb == NO_SLIP_WALL:
                    lv = rv = jnp.zeros_like(lv)
                elif pb == OUTLET:
                    if c == axis:
                        if side == 0:
                            lv = rv = jnp.minimum(rv, 0.0)
                        else:
                            lv = rv = jnp.maximum(lv, 0.0)
                    elif side == 0:
                        lv = rv
                    else:
                        rv = lv
                elif pb == SYMMETRY:
                    if c == axis:
                        lv = rv = jnp.zeros_like(lv)
                l[c] = _face_set(l[c], axis, fidx, lv)
                r[c] = _face_set(r[c], axis, fidx, rv)
        return l, r

    # ---- stage 1: hat states on each face set
    uls, urs, uimh = [], [], []
    for a in range(dm):
        un = u[a]
        lo_fac = 0.5 - dt2 * jnp.maximum(0.0, un) / dx[a]
        hi_fac = 0.5 + dt2 * jnp.minimum(0.0, un) / dx[a]
        l = [shift(u[c] + lo_fac * slopes[a][c], a, -1) for c in range(dm)]
        r = [u[c] - hi_fac * slopes[a][c] for c in range(dm)]
        if use_minion:
            l = [l[c] + dt2 * shift(force[c], a, -1) for c in range(dm)]
            r = [r[c] + dt2 * force[c] for c in range(dm)]
        l, r = apply_face_bc(l, r, a)
        normal = _riemann_normal(l[a], r[a], eps)
        hat = [None] * dm
        hat[a] = normal
        for c in range(dm):
            if c != a:
                hat[c] = _riemann_transverse(l[c], r[c], normal, eps)
        uls.append(l)
        urs.append(r)
        uimh.append(hat)

    def dhat_bc(l, r, axis, comp):
        """Double-hat / full-state transverse BC (velpred.f90:1324-1341):
        INLET -> ghost value; SLIP_WALL/OUTLET -> copy inner; NO_SLIP -> 0."""
        for side, fidx in ((0, ng), (1, ng + n_cell[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC:
                continue
            gidx = fidx - 1 if side == 0 else fidx
            lv = _face_get(l, axis, fidx)
            rv = _face_get(r, axis, fidx)
            if pb == INLET:
                lv = rv = _face_get(u[comp], axis, gidx)
            elif pb in (SLIP_WALL, OUTLET, SYMMETRY):
                if side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == NO_SLIP_WALL:
                lv = rv = jnp.zeros_like(lv)
            l = _face_set(l, axis, fidx, lv)
            r = _face_set(r, axis, fidx, rv)
        return l, r

    # ---- stage 2: double-hat states dhat[(n, a)] = comp n on a-faces
    # corrected along b = third axis (velpred.f90:1306-1600)
    dhat = {}
    for n in range(dm):
        for a in _OTHERS[n]:
            b = _third(n, a)
            hb_b = uimh[b][b]
            hb_n = uimh[b][n]
            corr = (dt6 / dx[b]) * (hb_b + shift(hb_b, b, 1)) * \
                (shift(hb_n, b, 1) - hb_n)
            l = uls[a][n] - shift(corr, a, -1)
            r = urs[a][n] - corr
            l, r = dhat_bc(l, r, a, n)
            dhat[(n, a)] = _riemann_transverse(l, r, uimh[a][a], eps)

    # ---- stage 3: full MAC states (velpred.f90:1587-1774)
    macs = []
    for nrm in range(dm):
        t1, t2 = _OTHERS[nrm]
        corr = jnp.zeros_like(u[0])
        for t in (t1, t2):
            ht = uimh[t][t]
            dh = dhat[(nrm, t)]
            corr = corr + (dt4 / dx[t]) * (ht + shift(ht, t, 1)) * \
                (shift(dh, t, 1) - dh)
        macl = uls[nrm][nrm] - shift(corr, nrm, -1)
        macr = urs[nrm][nrm] - corr
        if not use_minion:
            macl = macl + dt2 * shift(force[nrm], nrm, -1)
            macr = macr + dt2 * force[nrm]
        mac = _riemann_normal(macl, macr, eps)
        for side, fidx in ((0, ng), (1, ng + n_cell[nrm])):
            pb = phys_bc[nrm][side]
            if pb == PERIODIC:
                continue
            cur = _face_get(mac, nrm, fidx)
            if pb in (SLIP_WALL, NO_SLIP_WALL, SYMMETRY):
                val = jnp.zeros_like(cur)
            elif pb == INLET:
                gidx = fidx - 1 if side == 0 else fidx
                val = _face_get(u[nrm], nrm, gidx)
            elif pb == OUTLET:
                if side == 0:
                    val = jnp.minimum(_face_get(macr, nrm, fidx), 0.0)
                else:
                    val = jnp.maximum(_face_get(macl, nrm, fidx), 0.0)
            else:
                continue
            mac = _face_set(mac, nrm, fidx, val)
        macs.append(mac)

    def crop(f, a):
        sl = []
        for t in range(dm):
            if t == a:
                sl.append(slice(ng, ng + n_cell[t] + 1))
            else:
                sl.append(slice(ng, ng + n_cell[t]))
        return f[tuple(sl)]

    return tuple(crop(macs[a], a) for a in range(dm))


# ---------------------------------------------------------------------------
# mkflux 3-D
# ---------------------------------------------------------------------------

def mkflux_3d(s: jnp.ndarray, mac_pads: Sequence[jnp.ndarray],
              force: jnp.ndarray, mac_rhs: jnp.ndarray, dt,
              dx: Sequence[float], phys_bc, adv_bc, ng: int,
              n_cell: Sequence[int], is_vel: bool,
              is_conservative: Sequence[bool], slope_order: int,
              use_minion: bool, slopes=None):
    """Edge states & fluxes on all three face sets.

    s/force: (nc, N...) padded; mac_rhs: (N...) padded; mac_pads: cell-aligned
    padded MAC faces with valid tangential ghosts. Returns (sedge, sflux)
    tuples of (nc, faces) interior arrays per direction.
    """
    dm = 3
    nc = s.shape[0]
    dt2, dt3 = 0.5 * dt, dt / 3.0
    dt4, dt6 = 0.25 * dt, dt / 6.0

    umax = jnp.max(jnp.stack([
        jnp.max(jnp.abs(mac_pads[a])) for a in range(dm)]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    if slopes is None:
        slopes = [jnp.stack([slope(s[c], a, ng, adv_bc[c][a][0],
                                   adv_bc[c][a][1], slope_order, n_cell[a])
                             for c in range(nc)]) for a in range(dm)]

    sedge_lists = [[] for _ in range(dm)]
    sflux_lists = [[] for _ in range(dm)]

    def face_bc(l, r, axis, c, sc, clamp=True):
        """mkflux.f90 boundary overrides on l/r states at axis faces; the
        full hat-state rules (clamp=True) or the final-edge variant."""
        for side, fidx in ((0, ng), (1, ng + n_cell[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC:
                continue
            gidx = fidx - 1 if side == 0 else fidx
            sg = _face_get(sc, axis, gidx)
            lv = _face_get(l, axis, fidx)
            rv = _face_get(r, axis, fidx)
            normal_vel = is_vel and c == axis
            if pb == INLET:
                lv = rv = sg
            elif pb == SLIP_WALL or pb == SYMMETRY:
                if normal_vel:
                    lv = rv = jnp.zeros_like(lv)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == NO_SLIP_WALL:
                if is_vel:
                    lv = rv = jnp.zeros_like(lv)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == OUTLET:
                if normal_vel and clamp:
                    if side == 0:
                        lv = rv = jnp.minimum(rv, 0.0)
                    else:
                        lv = rv = jnp.maximum(lv, 0.0)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            l = _face_set(l, axis, fidx, lv)
            r = _face_set(r, axis, fidx, rv)
        return l, r

    for c in range(nc):
        sc = s[c]
        fc = force[c]
        cons = is_conservative[c]

        # stage 1: hat states
        sls, srs, simh = [], [], []
        for a in range(dm):
            adv = mac_pads[a]
            sl_a = slopes[a][c]
            l = shift(sc + 0.5 * sl_a, a, -1) - (dt2 / dx[a]) * adv * \
                shift(sl_a, a, -1)
            r = sc - (0.5 + dt2 * adv / dx[a]) * sl_a
            if use_minion:
                l = l + dt2 * shift(fc, a, -1)
                r = r + dt2 * fc
            if use_minion and cons:
                l = l - dt2 * shift(sc * mac_rhs, a, -1)
                r = r - dt2 * sc * mac_rhs
            l, r = face_bc(l, r, a, c, sc)
            sls.append(l)
            srs.append(r)
            simh.append(_riemann_transverse(l, r, adv, eps))

        # stage 2: double-hat states dh[(a, b)] = s on a-faces corrected by b
        dh = {}
        for a in range(dm):
            for b in _OTHERS[a]:
                mb = mac_pads[b]
                hb = simh[b]
                if cons:
                    fl = hb * mb
                    corr = (dt3 / dx[b]) * (shift(fl, b, 1) - fl)
                else:
                    corr = (dt6 / dx[b]) * (mb + shift(mb, b, 1)) * \
                        (shift(hb, b, 1) - hb)
                l = sls[a] - shift(corr, a, -1)
                r = srs[a] - corr
                l, r = face_bc(l, r, a, c, sc)
                dh[(a, b)] = _riemann_transverse(l, r, mac_pads[a], eps)

        # stage 3: final edge states with both transverse corrections
        for a in range(dm):
            t1, t2 = _OTHERS[a]
            corr = jnp.zeros_like(sc)
            for t in (t1, t2):
                b = _third(a, t)
                mt = mac_pads[t]
                dht = dh[(t, b)]
                if cons:
                    fl = dht * mt
                    corr = corr + (dt2 / dx[t]) * (shift(fl, t, 1) - fl) \
                        - (dt2 / dx[t]) * sc * (shift(mt, t, 1) - mt)
                else:
                    corr = corr + (dt4 / dx[t]) * (mt + shift(mt, t, 1)) * \
                        (shift(dht, t, 1) - dht)
            el = sls[a] - shift(corr, a, -1)
            er = srs[a] - corr
            if not use_minion:
                el = el + dt2 * shift(fc, a, -1)
                er = er + dt2 * fc
            if (not use_minion) and cons:
                el = el - dt2 * shift(sc * mac_rhs, a, -1)
                er = er - dt2 * sc * mac_rhs
            edge = _riemann_transverse(el, er, mac_pads[a], eps)
            # final boundary overrides (pick inner state / clamp / zero)
            for side, fidx in ((0, ng), (1, ng + n_cell[a])):
                pb = phys_bc[a][side]
                if pb == PERIODIC:
                    continue
                gidx = fidx - 1 if side == 0 else fidx
                inner = _face_get(er if side == 0 else el, a, fidx)
                normal_vel = is_vel and c == a
                if pb == INLET:
                    val = _face_get(sc, a, gidx)
                elif pb in (SLIP_WALL, NO_SLIP_WALL, SYMMETRY):
                    if (is_vel and pb == NO_SLIP_WALL) or normal_vel:
                        val = jnp.zeros_like(inner)
                    else:
                        val = inner
                elif pb == OUTLET:
                    if normal_vel:
                        val = jnp.minimum(inner, 0.0) if side == 0 \
                            else jnp.maximum(inner, 0.0)
                    else:
                        val = inner
                else:
                    continue
                edge = _face_set(edge, a, fidx, val)
            sedge_lists[a].append(edge)
            sflux_lists[a].append(edge * mac_pads[a] if cons
                                  else jnp.zeros_like(edge))

    def crop(f, a):
        sl = []
        for t in range(dm):
            if t == a:
                sl.append(slice(ng, ng + n_cell[t] + 1))
            else:
                sl.append(slice(ng, ng + n_cell[t]))
        return f[tuple(sl)]

    # crop before stacking: the stack then concatenates interior-sized arrays
    sedge = tuple(jnp.stack([crop(f, a) for f in sedge_lists[a]])
                  for a in range(dm))
    sflux = tuple(jnp.stack([crop(f, a) for f in sflux_lists[a]])
                  for a in range(dm))
    return sedge, sflux
