"""Unsplit BCG Godunov edge-state prediction, 3-D with full corner coupling.

TPU-native re-derivation of the reference's 3-D machinery
(velpred_3d/velpred_debug_3d, src/velpred.f90:880-2767; mkflux_3d/
mkflux_debug_3d, src/mkflux.f90:1186-3882). The reference streams rolling
2-plane windows (kc/kp) through memory; here every stage is a vectorized op
over *windowed* face arrays (ops/window.Win): shifts are zero-copy coordinate
relabelings and every combination is a static-slice intersection that XLA
fuses — no jnp.roll copies (the round-1 formulation spent as much time moving
roll/concat copies as computing; see godunov_ref.py for that oracle form).

Stage structure (velpred.f90:1995-2004 pseudo-code):
  1. hat states     uimh{x,y,z}  — 1-D normal predictor + Riemann per face set
  2. double-hat     uimh{yz,zy}, vimh{xz,zx}, wimh{xy,yx} — one transverse
                    correction (dt/6 convective, dt/3 conservative in mkflux)
  3. full states    umac/vmac/wmac (or sedge) — both transverse corrections
                    (dt/4 convective, dt/2 conservative) + forces + Riemann.

Window bookkeeping doubles as a proof of ghost sufficiency: with ng=3 the
final interior crops are exactly satisfied (stage-3 faces come out valid on
[ng, ng+n] normal / [ng, ng+n) transverse with zero slack).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..config import INLET, NO_SLIP_WALL, OUTLET, PERIODIC, SLIP_WALL, SYMMETRY
from .godunov import (ABS_EPS, _riemann_normal_w, _riemann_transverse_w,
                      mac_wins)
from .slopes import slope
from .window import Win, full, wmap

_OTHERS = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


def _third(a, b):
    return 3 - a - b


def vel_slopes_3d(u, adv_bc_vel, ng, n_cell, slope_order):
    """Per-axis limited slopes of all velocity components (shared between
    velpred and the velocity mkflux — the math is identical).
    Returns [axis][comp] Wins."""
    dm = 3
    return [[slope(u[c], a, ng, adv_bc_vel[c][a][0], adv_bc_vel[c][a][1],
                   slope_order, n_cell[a], dm=dm)
             for c in range(dm)] for a in range(dm)]


def velpred_3d(u: jnp.ndarray, force: jnp.ndarray, dt, dx: Sequence[float],
               phys_bc, adv_bc_vel, ng: int, n_cell: Sequence[int],
               slope_order: int, use_minion: bool, slopes=None,
               bc_sides=None, eps=None
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """u, force: (3, Nx, Ny, Nz) ghost-padded. Returns interior MAC faces.

    ``bc_sides`` restricts physical-boundary treatment to the given
    (axis, side) pairs (None = all); the Pallas tile path uses this to run
    pure interior math along tiled axes (boundary slabs are recomputed with
    full treatment and spliced). ``eps`` overrides the Riemann tie epsilon
    (the tile path passes the globally-reduced value).
    """
    dm = 3
    dt2, dt4, dt6 = 0.5 * dt, 0.25 * dt, dt / 6.0

    if eps is None:
        umax = jnp.max(jnp.abs(u[:, ng:ng + n_cell[0], ng:ng + n_cell[1],
                               ng:ng + n_cell[2]]))
        eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    uw = [full(u[c], dm) for c in range(dm)]
    fw = [full(force[c], dm) for c in range(dm)]
    if slopes is None:
        slopes = vel_slopes_3d(u, adv_bc_vel, ng, n_cell, slope_order)

    def skip_bc(axis, side):
        return bc_sides is not None and (axis, side) not in bc_sides

    def apply_face_bc(l, r, axis):
        """velpred.f90:1074-1105-style overrides on hat states (all comps)."""
        for side, fidx in ((0, ng), (1, ng + n_cell[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC or skip_bc(axis, side):
                continue
            gidx = fidx - 1 if side == 0 else fidx
            for c in range(dm):
                lv = l[c].plane(axis, fidx)
                rv = r[c].plane(axis, fidx)
                if pb == INLET:
                    lv = rv = uw[c].plane(axis, gidx, as_coord=fidx)
                elif pb == SLIP_WALL:
                    if c == axis:
                        lv = rv = lv.zeros_like()
                    elif side == 0:
                        lv = rv
                    else:
                        rv = lv
                elif pb == NO_SLIP_WALL:
                    lv = rv = lv.zeros_like()
                elif pb == OUTLET:
                    if c == axis:
                        if side == 0:
                            lv = rv = wmap(lambda x: jnp.minimum(x, 0.0), rv)
                        else:
                            lv = rv = wmap(lambda x: jnp.maximum(x, 0.0), lv)
                    elif side == 0:
                        lv = rv
                    else:
                        rv = lv
                elif pb == SYMMETRY:
                    if c == axis:
                        lv = rv = lv.zeros_like()
                l[c] = l[c].set_plane(axis, fidx, lv)
                r[c] = r[c].set_plane(axis, fidx, rv)
        return l, r

    # ---- stage 1: hat states on each face set
    uls, urs, uimh = [], [], []
    for a in range(dm):
        un = uw[a]
        lo_fac = wmap(lambda x: 0.5 - dt2 * jnp.maximum(0.0, x) / dx[a], un)
        hi_fac = wmap(lambda x: 0.5 + dt2 * jnp.minimum(0.0, x) / dx[a], un)
        l = [(uw[c] + lo_fac * slopes[a][c]).shift(a, -1) for c in range(dm)]
        r = [uw[c] - hi_fac * slopes[a][c] for c in range(dm)]
        if use_minion:
            l = [l[c] + dt2 * fw[c].shift(a, -1) for c in range(dm)]
            r = [r[c] + dt2 * fw[c] for c in range(dm)]
        l, r = apply_face_bc(l, r, a)
        normal = _riemann_normal_w(l[a], r[a], eps)
        hat = [None] * dm
        hat[a] = normal
        for c in range(dm):
            if c != a:
                hat[c] = _riemann_transverse_w(l[c], r[c], normal, eps)
        uls.append(l)
        urs.append(r)
        uimh.append(hat)

    def dhat_bc(l, r, axis, comp):
        """Double-hat / full-state transverse BC (velpred.f90:1324-1341):
        INLET -> ghost value; SLIP_WALL/OUTLET -> copy inner; NO_SLIP -> 0."""
        for side, fidx in ((0, ng), (1, ng + n_cell[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC or skip_bc(axis, side):
                continue
            gidx = fidx - 1 if side == 0 else fidx
            lv = l.plane(axis, fidx)
            rv = r.plane(axis, fidx)
            if pb == INLET:
                lv = rv = uw[comp].plane(axis, gidx, as_coord=fidx)
            elif pb in (SLIP_WALL, OUTLET, SYMMETRY):
                if side == 0:
                    lv = rv
                else:
                    rv = lv
            elif pb == NO_SLIP_WALL:
                lv = rv = lv.zeros_like()
            l = l.set_plane(axis, fidx, lv)
            r = r.set_plane(axis, fidx, rv)
        return l, r

    # ---- stage 2: double-hat states dhat[(n, a)] = comp n on a-faces
    # corrected along b = third axis (velpred.f90:1306-1600)
    dhat = {}
    for n in range(dm):
        for a in _OTHERS[n]:
            b = _third(n, a)
            hb_b = uimh[b][b]
            hb_n = uimh[b][n]
            corr = (dt6 / dx[b]) * (hb_b + hb_b.shift(b, 1)) * \
                (hb_n.shift(b, 1) - hb_n)
            l = uls[a][n] - corr.shift(a, -1)
            r = urs[a][n] - corr
            l, r = dhat_bc(l, r, a, n)
            dhat[(n, a)] = _riemann_transverse_w(l, r, uimh[a][a], eps)

    # ---- stage 3: full MAC states (velpred.f90:1587-1774)
    macs = []
    for nrm in range(dm):
        t1, t2 = _OTHERS[nrm]
        corr = None
        for t in (t1, t2):
            ht = uimh[t][t]
            dh = dhat[(nrm, t)]
            term = (dt4 / dx[t]) * (ht + ht.shift(t, 1)) * \
                (dh.shift(t, 1) - dh)
            corr = term if corr is None else corr + term
        macl = uls[nrm][nrm] - corr.shift(nrm, -1)
        macr = urs[nrm][nrm] - corr
        if not use_minion:
            macl = macl + dt2 * fw[nrm].shift(nrm, -1)
            macr = macr + dt2 * fw[nrm]
        mac = _riemann_normal_w(macl, macr, eps)
        for side, fidx in ((0, ng), (1, ng + n_cell[nrm])):
            pb = phys_bc[nrm][side]
            if pb == PERIODIC or skip_bc(nrm, side):
                continue
            if pb in (SLIP_WALL, NO_SLIP_WALL, SYMMETRY):
                val = mac.plane(nrm, fidx).zeros_like()
            elif pb == INLET:
                gidx = fidx - 1 if side == 0 else fidx
                val = uw[nrm].plane(nrm, gidx, as_coord=fidx)
            elif pb == OUTLET:
                if side == 0:
                    val = wmap(lambda x: jnp.minimum(x, 0.0),
                               macr.plane(nrm, fidx))
                else:
                    val = wmap(lambda x: jnp.maximum(x, 0.0),
                               macl.plane(nrm, fidx))
            else:
                continue
            mac = mac.set_plane(nrm, fidx, val)
        macs.append(mac)

    def crop(f, a):
        lo = [ng] * dm
        hi = [ng + n_cell[t] + (1 if t == a else 0) for t in range(dm)]
        return f.crop(lo, hi)

    return tuple(crop(macs[a], a) for a in range(dm))


# ---------------------------------------------------------------------------
# mkflux 3-D
# ---------------------------------------------------------------------------

def mkflux_3d(s: jnp.ndarray, mac_pads: Sequence[jnp.ndarray],
              force: jnp.ndarray, mac_rhs: jnp.ndarray, dt,
              dx: Sequence[float], phys_bc, adv_bc, ng: int,
              n_cell: Sequence[int], is_vel: bool,
              is_conservative: Sequence[bool], slope_order: int,
              use_minion: bool, slopes=None, bc_sides=None, eps=None):
    """Edge states & fluxes on all three face sets.

    s/force: (nc, N...) padded; mac_rhs: (N...) padded; mac_pads: cell-aligned
    padded MAC faces with valid tangential ghosts (valid region: [ng, ng+n+1)
    along own axis, [ng-1, ng+n+1) tangentially). Returns (sedge, sflux)
    tuples of (nc, faces) interior arrays per direction.
    """
    dm = 3
    nc = s.shape[0]
    dt2, dt3 = 0.5 * dt, dt / 3.0
    dt4, dt6 = 0.25 * dt, dt / 6.0

    macw = mac_wins(mac_pads, ng, n_cell)

    if eps is None:
        umax = jnp.max(jnp.stack([jnp.max(jnp.abs(m.arr)) for m in macw]))
        eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    def skip_bc(axis, side):
        return bc_sides is not None and (axis, side) not in bc_sides

    # force / mac_rhs may be None (statically zero): their terms are skipped
    # algebraically — adding a broadcast-zero array inside a Pallas kernel
    # trips a Mosaic lowering crash, and the skipped ops are free
    sw = [full(s[c], dm) for c in range(nc)]
    fw = ([full(force[c], dm) for c in range(nc)]
          if force is not None else None)
    mrw = full(mac_rhs, dm) if mac_rhs is not None else None

    if slopes is None:
        slopes = [[slope(s[c], a, ng, adv_bc[c][a][0], adv_bc[c][a][1],
                         slope_order, n_cell[a], dm=dm)
                   for c in range(nc)] for a in range(dm)]

    sedge_lists = [[] for _ in range(dm)]
    sflux_lists = [[] for _ in range(dm)]

    def face_bc(l, r, axis, c, sc, clamp=True):
        """mkflux.f90 boundary overrides on l/r states at axis faces; the
        full hat-state rules (clamp=True) or the final-edge variant."""
        for side, fidx in ((0, ng), (1, ng + n_cell[axis])):
            pb = phys_bc[axis][side]
            if pb == PERIODIC or skip_bc(axis, side):
                continue
            gidx = fidx - 1 if side == 0 else fidx
            sg = sc.plane(axis, gidx, as_coord=fidx)
            lv = l.plane(axis, fidx)
            rv = r.plane(axis, fidx)
            normal_vel = is_vel and c == axis
            if pb == INLET:
                lv = rv = sg
            elif pb == SLIP_WALL or pb == SYMMETRY:
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
                if normal_vel and clamp:
                    if side == 0:
                        lv = rv = wmap(lambda x: jnp.minimum(x, 0.0), rv)
                    else:
                        lv = rv = wmap(lambda x: jnp.maximum(x, 0.0), lv)
                elif side == 0:
                    lv = rv
                else:
                    rv = lv
            l = l.set_plane(axis, fidx, lv)
            r = r.set_plane(axis, fidx, rv)
        return l, r

    for c in range(nc):
        sc = sw[c]
        fc = fw[c] if fw is not None else None
        cons = is_conservative[c]

        # stage 1: hat states
        sls, srs, simh = [], [], []
        for a in range(dm):
            adv = macw[a]
            sl_a = slopes[a][c]
            l = (sc + 0.5 * sl_a).shift(a, -1) - (dt2 / dx[a]) * adv * \
                sl_a.shift(a, -1)
            r = sc - (0.5 + dt2 * adv / dx[a]) * sl_a
            if use_minion and fc is not None:
                l = l + dt2 * fc.shift(a, -1)
                r = r + dt2 * fc
            if use_minion and cons and mrw is not None:
                l = l - dt2 * (sc * mrw).shift(a, -1)
                r = r - dt2 * sc * mrw
            l, r = face_bc(l, r, a, c, sc)
            sls.append(l)
            srs.append(r)
            simh.append(_riemann_transverse_w(l, r, adv, eps))

        # stage 2: double-hat states dh[(a, b)] = s on a-faces corrected by b
        dh = {}
        for a in range(dm):
            for b in _OTHERS[a]:
                mb = macw[b]
                hb = simh[b]
                if cons:
                    fl = hb * mb
                    corr = (dt3 / dx[b]) * (fl.shift(b, 1) - fl)
                else:
                    corr = (dt6 / dx[b]) * (mb + mb.shift(b, 1)) * \
                        (hb.shift(b, 1) - hb)
                l = sls[a] - corr.shift(a, -1)
                r = srs[a] - corr
                l, r = face_bc(l, r, a, c, sc)
                dh[(a, b)] = _riemann_transverse_w(l, r, macw[a], eps)

        # stage 3: final edge states with both transverse corrections
        for a in range(dm):
            t1, t2 = _OTHERS[a]
            corr = None
            for t in (t1, t2):
                b = _third(a, t)
                mt = macw[t]
                dht = dh[(t, b)]
                if cons:
                    # accumulate as (corr + A) - B to stay bitwise-identical
                    # to the oracle's running-sum association
                    flux_div = (dt2 / dx[t]) * ((dht * mt).shift(t, 1)
                                                - dht * mt)
                    compr = (dt2 / dx[t]) * sc * (mt.shift(t, 1) - mt)
                    corr = (flux_div - compr if corr is None
                            else (corr + flux_div) - compr)
                else:
                    term = (dt4 / dx[t]) * (mt + mt.shift(t, 1)) * \
                        (dht.shift(t, 1) - dht)
                    corr = term if corr is None else corr + term
            el = sls[a] - corr.shift(a, -1)
            er = srs[a] - corr
            if (not use_minion) and fc is not None:
                el = el + dt2 * fc.shift(a, -1)
                er = er + dt2 * fc
            if (not use_minion) and cons and mrw is not None:
                el = el - dt2 * (sc * mrw).shift(a, -1)
                er = er - dt2 * sc * mrw
            edge = _riemann_transverse_w(el, er, macw[a], eps)
            # final boundary overrides (pick inner state / clamp / zero)
            for side, fidx in ((0, ng), (1, ng + n_cell[a])):
                pb = phys_bc[a][side]
                if pb == PERIODIC or skip_bc(a, side):
                    continue
                gidx = fidx - 1 if side == 0 else fidx
                inner = (er if side == 0 else el).plane(a, fidx)
                normal_vel = is_vel and c == a
                if pb == INLET:
                    val = sc.plane(a, gidx, as_coord=fidx)
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
                edge = edge.set_plane(a, fidx, val)
            sedge_lists[a].append(edge)
            sflux_lists[a].append(edge * macw[a] if cons else None)

    def crop(f, a):
        lo = [ng] * dm
        hi = [ng + n_cell[t] + (1 if t == a else 0) for t in range(dm)]
        return f.crop(lo, hi)

    # crop before stacking: the stack then concatenates interior-sized arrays
    sedge = tuple(jnp.stack([crop(f, a) for f in sedge_lists[a]])
                  for a in range(dm))
    sflux = tuple(jnp.stack(
        [crop(f, a) if f is not None else jnp.zeros_like(crop(sedge_lists[a][i], a))
         for i, f in enumerate(sflux_lists[a])]) for a in range(dm))
    return sedge, sflux
