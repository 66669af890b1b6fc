"""Unsplit BCG Godunov edge-state prediction (2-D).

TPU-native re-derivation of the reference's velpred (src/velpred.f90:125-524)
and mkflux (src/mkflux.f90:152-691). The reference streams rolling 2-row
windows through memory — a CPU cache trick; here every stage is a full-array
vectorized op (the same math as the reference's *_debug_* oracles), which XLA
tiles onto the VPU.

Face-array convention: an x-face value for the face between cells i-1 and i is
stored at padded cell index i ("cell-aligned" face arrays, same shape as the
padded cell arrays). The physical face range along x is [ng, ng+nx].
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..config import INLET, NO_SLIP_WALL, OUTLET, PERIODIC, SLIP_WALL, SYMMETRY
from .slopes import slope
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
