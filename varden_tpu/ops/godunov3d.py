"""Unsplit BCG Godunov edge-state prediction, 3-D with full corner coupling.

TPU-native re-derivation of the reference's 3-D machinery
(velpred_3d/velpred_debug_3d, src/velpred.f90:880-2767; mkflux_3d/
mkflux_debug_3d, src/mkflux.f90:1186-3882). The reference streams rolling
2-plane windows (kc/kp) through memory; here every stage is a full-array
vectorized op over cell-aligned face arrays — the same math as the debug
oracles — which XLA fuses and tiles.

Stage structure (velpred.f90:1995-2004 pseudo-code):
  1. hat states     uimh{x,y,z}  — 1-D normal predictor + Riemann per face set
  2. double-hat     uimh{yz,zy}, vimh{xz,zx}, wimh{xy,yx} — one transverse
                    correction (dt/6 convective, dt/3 conservative in mkflux)
  3. full states    umac/vmac/wmac (or sedge) — both transverse corrections
                    (dt/4 convective, dt/2 conservative) + forces + Riemann.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..config import INLET, NO_SLIP_WALL, OUTLET, PERIODIC, SLIP_WALL, SYMMETRY
from .godunov import (ABS_EPS, _face_get, _face_set, _riemann_normal,
                      _riemann_transverse)
from .slopes import slope
from .stencil import shift

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
