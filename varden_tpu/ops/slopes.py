"""Monotonicity-limited slopes (orders 0/2/4) with one-sided boundary stencils.

TPU-native, dimension-agnostic re-derivation of the reference's slope module
(src/slope.f90: slopex_2d :148-289, slopey_2d :291-435, slopez_3d :437-588 all
collapse to one vectorized routine per axis here). The 4th-order variant is the
limited-Fromm scheme (slope.f90:222-286); EXT_DIR/HOEXTRAP boundaries use the
same one-sided difference formulas (slope.f90:190-216, 243-283).

``slope`` is the fast path: it takes a ghost-padded array and returns a
:class:`~varden_tpu.ops.window.Win` valid on [2, P-2) along the slope axis
(order 4; [1, P-1) for order 2) — shifts are zero-copy window relabelings.
``slope_ref`` is the original full-array jnp.roll formulation, kept as the
debug oracle (the role the reference's *_debug_* variants play)."""
from __future__ import annotations

import jax.numpy as jnp

from ..bc import EXT_DIR, HOEXTRAP
from .stencil import shift
from .window import Win, full, minimum, wmap


def _mc_limit(dpls, dmin, cen):
    slim = minimum(abs_(dpls), abs_(dmin))
    slim = wmap(lambda sl, p, m: jnp.where(p * m > 0.0, sl, 0.0),
                slim, dpls, dmin)
    return wmap(lambda c, sl: jnp.sign(c) * jnp.minimum(sl, jnp.abs(c)),
                cen, slim), slim


def abs_(w):
    return wmap(jnp.abs, w)


def slope(s: jnp.ndarray, axis: int, ng: int, bc_lo: int, bc_hi: int,
          order: int, n_interior: int, dm: int = None) -> Win:
    """Limited slope of padded array ``s`` along spatial axis ``axis``.

    ``ng`` is the ghost width along ``axis`` (interior cells occupy padded
    coords [ng, ng+n_interior)). Returns a Win.
    """
    dm = dm if dm is not None else s.ndim
    sw = full(s, dm)
    if order == 0:
        return sw.zeros_like()

    sp = sw.shift(axis, 1)
    sm = sw.shift(axis, -1)
    cen = 0.5 * (sp - sm)
    dpls = 2.0 * (sp - sw)
    dmin = 2.0 * (sw - sm)

    if order == 2:
        sl, _ = _mc_limit(dpls, dmin, cen)
    elif order == 4:
        fromm, lim = _mc_limit(dpls, dmin, cen)
        flag = wmap(jnp.sign, cen)
        ds = (4.0 / 3.0) * cen - (1.0 / 6.0) * (fromm.shift(axis, 1) +
                                                fromm.shift(axis, -1))
        sl = flag * minimum(abs_(ds), lim)
    else:
        raise ValueError(f"slope_order must be 0/2/4, got {order}")

    lo_edge = bc_lo in (EXT_DIR, HOEXTRAP)
    hi_edge = bc_hi in (EXT_DIR, HOEXTRAP)
    if not (lo_edge or hi_edge):
        return sl

    # One-sided boundary treatment on the boundary planes (slope.f90
    # :190-216, 243-283). Coordinates along ``axis``: ghost just outside -> 0;
    # first interior -> one-sided formula; second interior (order 4) ->
    # recomputed with the revised Fromm neighbor.
    i_lo, i_hi = ng, ng + n_interior - 1

    def one_sided(sgn, sl_cur):
        # sgn=+1 for lo side (interior to the right), -1 for hi side. All
        # planes are relabeled to coordinate i_first so they combine.
        i_first = i_lo if sgn > 0 else i_hi
        s0 = sw.plane(axis, i_first)
        s1 = sw.plane(axis, i_first + sgn, as_coord=i_first)
        s2 = sw.plane(axis, i_first + 2 * sgn, as_coord=i_first)
        sg = sw.plane(axis, i_first - sgn, as_coord=i_first)  # boundary ghost
        if order == 2:
            cen_b = sgn * (s1 + 3.0 * s0 - 4.0 * sg) / 3.0
        else:
            cen_b = sgn * (-(16.0 / 15.0) * sg + 0.5 * s0 +
                           (2.0 / 3.0) * s1 - 0.1 * s2)
        d_out = 2.0 * sgn * (s0 - sg)
        d_in = 2.0 * sgn * (s1 - s0)
        # the MC limiter is symmetric in (dpls, dmin); order is immaterial
        sl_b, _ = _mc_limit(d_in, d_out, cen_b)
        sl_cur = sl_cur.set_plane(axis, i_first - sgn, sl_b.zeros_like())
        sl_cur = sl_cur.set_plane(axis, i_first, sl_b)
        if order == 4:
            # Recompute the slope one cell further in using the revised
            # boundary slope as that cell's neighbor Fromm value
            # (slope.f90:264-269, 284-286):
            i2 = i_first + sgn
            ds2 = (4.0 / 3.0) * cen.plane(axis, i2) - (1.0 / 6.0) * (
                fromm.plane(axis, i2 + sgn, as_coord=i2) +
                Win(sl_b.arr, [i2 if d == axis else c
                               for d, c in enumerate(sl_b.lo)]))
            sl2 = flag.plane(axis, i2) * minimum(abs_(ds2),
                                                 lim.plane(axis, i2))
            sl_cur = sl_cur.set_plane(axis, i2, sl2)
        return sl_cur

    if lo_edge:
        sl = one_sided(+1, sl)
    if hi_edge:
        sl = one_sided(-1, sl)
    return sl


# ---------------------------------------------------------------------------
# debug oracle: the original full-array jnp.roll formulation
# ---------------------------------------------------------------------------

def _mc_limit_ref(dpls, dmin, cen):
    slim = jnp.minimum(jnp.abs(dpls), jnp.abs(dmin))
    slim = jnp.where(dpls * dmin > 0.0, slim, 0.0)
    return jnp.sign(cen) * jnp.minimum(slim, jnp.abs(cen)), slim


def slope_ref(s: jnp.ndarray, axis: int, ng: int, bc_lo: int, bc_hi: int,
              order: int, n_interior: int) -> jnp.ndarray:
    """Original roll-based slope: same math as :func:`slope`, full-array form
    (same shape as ``s``; values outside [2, P-2) wrap and are garbage)."""
    if order == 0:
        return jnp.zeros_like(s)

    sp = shift(s, axis, 1)
    sm = shift(s, axis, -1)
    cen = 0.5 * (sp - sm)
    dpls = 2.0 * (sp - s)
    dmin = 2.0 * (s - sm)

    if order == 2:
        sl, _ = _mc_limit_ref(dpls, dmin, cen)
    elif order == 4:
        fromm, lim = _mc_limit_ref(dpls, dmin, cen)
        flag = jnp.sign(cen)
        ds = (4.0 / 3.0) * cen - (1.0 / 6.0) * (shift(fromm, axis, 1) +
                                                shift(fromm, axis, -1))
        sl = flag * jnp.minimum(jnp.abs(ds), lim)
    else:
        raise ValueError(f"slope_order must be 0/2/4, got {order}")

    lo_edge = bc_lo in (EXT_DIR, HOEXTRAP)
    hi_edge = bc_hi in (EXT_DIR, HOEXTRAP)
    if not (lo_edge or hi_edge):
        return sl

    i_lo, i_hi = ng, ng + n_interior - 1

    def plane(arr, i):
        sl_ = [slice(None)] * arr.ndim
        sl_[axis] = slice(i, i + 1)
        return arr[tuple(sl_)]

    ishape = [1] * s.ndim
    ishape[axis] = s.shape[axis]
    iax = jnp.arange(s.shape[axis]).reshape(ishape)

    def set_plane(arr, i, val):
        return jnp.where(iax == i, val, arr)

    def one_sided(sgn, sl_cur):
        i_first = i_lo if sgn > 0 else i_hi
        s0 = plane(s, i_first)
        s1 = plane(s, i_first + sgn)
        s2 = plane(s, i_first + 2 * sgn)
        sg = plane(s, i_first - sgn)
        if order == 2:
            cen_b = sgn * (s1 + 3.0 * s0 - 4.0 * sg) / 3.0
        else:
            cen_b = sgn * (-(16.0 / 15.0) * sg + 0.5 * s0 +
                           (2.0 / 3.0) * s1 - 0.1 * s2)
        d_out = 2.0 * sgn * (s0 - sg)
        d_in = 2.0 * sgn * (s1 - s0)
        sl_b, _ = _mc_limit_ref(d_in, d_out, cen_b)
        sl_cur = set_plane(sl_cur, i_first - sgn, jnp.zeros_like(sl_b))
        sl_cur = set_plane(sl_cur, i_first, sl_b)
        if order == 4:
            i2 = i_first + sgn
            ds2 = (4.0 / 3.0) * plane(cen, i2) - (1.0 / 6.0) * (
                plane(fromm, i2 + sgn) + sl_b)
            sl2 = plane(flag, i2) * jnp.minimum(jnp.abs(ds2), plane(lim, i2))
            sl_cur = set_plane(sl_cur, i2, sl2)
        return sl_cur

    if lo_edge:
        sl = one_sided(+1, sl)
    if hi_edge:
        sl = one_sided(-1, sl)
    return sl
