"""Monotonicity-limited slopes (orders 0/2/4) with one-sided boundary stencils.

TPU-native, dimension-agnostic re-derivation of the reference's slope module
(src/slope.f90: slopex_2d :148-289, slopey_2d :291-435, slopez_3d :437-588 all
collapse to one vectorized routine per axis here). The 4th-order variant is the
limited-Fromm scheme (slope.f90:222-286); EXT_DIR/HOEXTRAP boundaries use the
same one-sided difference formulas (slope.f90:190-216, 243-283).

Inputs are ghost-padded arrays; slopes are valid on interior±1 cells along the
slope axis (callers must supply ng>=3 ghosts for order 4, ng>=2 for order 2).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..bc import EXT_DIR, HOEXTRAP
from .stencil import shift


def _mc_limit(dpls, dmin, cen):
    slim = jnp.minimum(jnp.abs(dpls), jnp.abs(dmin))
    slim = jnp.where(dpls * dmin > 0.0, slim, 0.0)
    return jnp.sign(cen) * jnp.minimum(slim, jnp.abs(cen)), slim


def slope(s: jnp.ndarray, axis: int, ng: int, bc_lo: int, bc_hi: int,
          order: int, n_interior: int) -> jnp.ndarray:
    """Limited slope of ``s`` along ``axis``.

    ``ng`` is the ghost width along ``axis`` (interior cells occupy indices
    [ng, ng+n_interior)). Returns an array of the same shape as ``s``.
    """
    if order == 0:
        return jnp.zeros_like(s)

    sp = shift(s, axis, 1)
    sm = shift(s, axis, -1)
    cen = 0.5 * (sp - sm)
    dpls = 2.0 * (sp - s)
    dmin = 2.0 * (s - sm)

    if order == 2:
        sl, _ = _mc_limit(dpls, dmin, cen)
    elif order == 4:
        fromm, lim = _mc_limit(dpls, dmin, cen)
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

    # One-sided boundary treatment, computed only on the boundary SLABS
    # (one plane each) rather than as full-array selects. Positions along
    # ``axis``: ghost cell just outside -> 0; first interior -> one-sided
    # formula; second interior (order 4) -> recomputed with revised fromm.
    i_lo, i_hi = ng, ng + n_interior - 1

    def plane(arr, i):
        sl_ = [slice(None)] * arr.ndim
        sl_[axis] = slice(i, i + 1)
        return arr[tuple(sl_)]

    ishape = [1] * s.ndim
    ishape[axis] = s.shape[axis]
    iax = jnp.arange(s.shape[axis]).reshape(ishape)

    def set_plane(arr, i, val):
        # fusable select, not a dynamic-update-slice (which copies the
        # whole array on TPU)
        return jnp.where(iax == i, val, arr)

    def one_sided(sgn, sl_cur):
        # sgn=+1 for lo side (interior to the right), -1 for hi side.
        i_first = i_lo if sgn > 0 else i_hi
        s0 = plane(s, i_first)
        s1 = plane(s, i_first + sgn)
        s2 = plane(s, i_first + 2 * sgn)
        sg = plane(s, i_first - sgn)  # the boundary ghost cell
        if order == 2:
            cen_b = sgn * (s1 + 3.0 * s0 - 4.0 * sg) / 3.0
        else:
            cen_b = sgn * (-(16.0 / 15.0) * sg + 0.5 * s0 +
                           (2.0 / 3.0) * s1 - 0.1 * s2)
        d_out = 2.0 * sgn * (s0 - sg)
        d_in = 2.0 * sgn * (s1 - s0)
        # the MC limiter is symmetric in (dpls, dmin); order is immaterial
        sl_b, _ = _mc_limit(d_in, d_out, cen_b)
        sl_cur = set_plane(sl_cur, i_first - sgn, jnp.zeros_like(sl_b))
        sl_cur = set_plane(sl_cur, i_first, sl_b)
        if order == 4:
            # Recompute the slope one cell further in using the revised
            # boundary slope as that cell's neighbor Fromm value
            # (slope.f90:264-269, 284-286):
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
