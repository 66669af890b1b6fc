"""AMR hierarchy: level descriptors and grid-transfer operators.

TPU-native equivalents of the FBoxLib surface the reference consumes
(SURVEY.md §2b): ml_cc_restriction / ml_edge_restriction, lin_cc_interp-style
limited-slope prolongation (fillpatch / multifab_fill_ghost_cells), and nodal
prolongation (ml_prolongation).

Design: the reference decomposes each level into distributed boxes (an MPI
artifact); here every level is ONE dense rectangular array over the level's
bounding box, described by a static LevelSpec. ref_ratio = 2 throughout
(reference _parameters:25).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    """Static geometry of one AMR level (index space of that level).

    Level 0 covers the whole domain: lo = 0, n = n_cell. Finer levels are a
    single (clustered, quantized) box."""
    lo: Tuple[int, ...]
    n: Tuple[int, ...]

    @property
    def hi(self):
        return tuple(l + s for l, s in zip(self.lo, self.n))

    @property
    def dm(self):
        return len(self.n)


def domain_spec(n_cell, level):
    return LevelSpec(lo=(0,) * len(n_cell),
                     n=tuple(s * 2 ** level for s in n_cell))


def covered_slice(fine_spec: LevelSpec, r: int = 2):
    """Slice of the parent-level array covered by the fine box (parent array
    assumed to span its own full LevelSpec)."""
    return tuple(slice(l // r, (l + s) // r)
                 for l, s in zip(fine_spec.lo, fine_spec.n))


# ---------------------------------------------------------------------------
# restriction / prolongation
# ---------------------------------------------------------------------------

def restrict_cells(f: jnp.ndarray, dm: int) -> jnp.ndarray:
    """2^dm-cell average (ml_cc_restriction)."""
    for d in range(dm):
        axis = f.ndim - dm + d
        a = [slice(None)] * f.ndim
        b = [slice(None)] * f.ndim
        a[axis] = slice(0, None, 2)
        b[axis] = slice(1, None, 2)
        f = 0.5 * (f[tuple(a)] + f[tuple(b)])
    return f


def restrict_faces(f: jnp.ndarray, d: int, dm: int) -> jnp.ndarray:
    """Average fine faces onto coincident coarse faces (ml_edge_restriction):
    keep even planes along d, average 2-blocks tangentially."""
    axis_d = f.ndim - dm + d
    sl = [slice(None)] * f.ndim
    sl[axis_d] = slice(0, None, 2)
    out = f[tuple(sl)]
    for t in range(dm):
        if t == d:
            continue
        axis = out.ndim - dm + t
        a = [slice(None)] * out.ndim
        b = [slice(None)] * out.ndim
        a[axis] = slice(0, None, 2)
        b[axis] = slice(1, None, 2)
        out = 0.5 * (out[tuple(a)] + out[tuple(b)])
    return out


def _mc_slopes(c: jnp.ndarray, axis: int, limit: bool = True) -> jnp.ndarray:
    """Undivided central slopes (MC-limited by default); zero in the
    outermost cells."""
    sl_p = [slice(None)] * c.ndim
    sl_m = [slice(None)] * c.ndim
    sl_p[axis] = slice(2, None)
    sl_m[axis] = slice(0, -2)
    sl_c = [slice(None)] * c.ndim
    sl_c[axis] = slice(1, -1)
    cp, cm, cc = c[tuple(sl_p)], c[tuple(sl_m)], c[tuple(sl_c)]
    cen = 0.5 * (cp - cm)
    if limit:
        dpls = 2.0 * (cp - cc)
        dmin = 2.0 * (cc - cm)
        lim = jnp.minimum(jnp.abs(dpls), jnp.abs(dmin))
        lim = jnp.where(dpls * dmin > 0.0, lim, 0.0)
        s = jnp.sign(cen) * jnp.minimum(lim, jnp.abs(cen))
    else:
        s = cen
    pad = [(0, 0)] * c.ndim
    pad[axis] = (1, 1)
    return jnp.pad(s, pad)


def prolong_cells(c: jnp.ndarray, dm: int, order: int = 1,
                  limit: bool = True) -> jnp.ndarray:
    """Linear prolongation to 2x resolution. limit=True gives lin_cc_interp
    semantics (limited slopes, used by fillpatch ghost fills of advected
    state); limit=False is the plain linear operator required for solver
    coarse-fine ghosts (a limiter would make the composite operator
    nonlinear). The outermost source cells interpolate piecewise-constant."""
    out = c
    for d in range(dm):
        axis = out.ndim - dm + d
        if order >= 1:
            s = _mc_slopes(out, axis, limit=limit)
        else:
            s = jnp.zeros_like(out)
        lo = out - 0.25 * s
        hi = out + 0.25 * s
        stacked = jnp.stack([lo, hi], axis=axis + 1)
        shape = list(out.shape)
        shape[axis] = 2 * out.shape[axis]
        out = stacked.reshape(shape)
    return out


def prolong_nodes(c: jnp.ndarray, dm: int) -> jnp.ndarray:
    """Linear nodal prolongation (ml_nodal_prolongation): coarse node array
    with n+1 nodes per axis -> fine with 2n+1 nodes."""
    for d in range(dm):
        axis = c.ndim - dm + d
        sl_p = [slice(None)] * c.ndim
        sl_p[axis] = slice(1, None)
        sl_m = [slice(None)] * c.ndim
        sl_m[axis] = slice(0, -1)
        mid = 0.5 * (c[tuple(sl_p)] + c[tuple(sl_m)])
        n = c.shape[axis]
        # interleave: [c0, m0, c1, m1, ..., c_{n-1}] -> 2n-1 entries
        pad = [(0, 0)] * c.ndim
        pad[axis] = (0, 1)
        mid_p = jnp.pad(mid, pad)
        stacked = jnp.stack([c, mid_p], axis=axis + 1)
        shape = list(c.shape)
        shape[axis] = 2 * n
        out = stacked.reshape(shape)
        sl = [slice(None)] * c.ndim
        sl[axis] = slice(0, 2 * n - 1)
        c = out[tuple(sl)]
    return c


def interp_patch(coarse: jnp.ndarray, coarse_lo: Sequence[int],
                 fine_lo: Sequence[int], fine_n: Sequence[int],
                 dm: int) -> jnp.ndarray:
    """Interpolate a fine-index-space patch [fine_lo, fine_lo+fine_n) from a
    coarse array whose element 0 sits at coarse index ``coarse_lo``.

    The caller must supply a coarse slab that covers ceil-range(patch)/2
    grown by 1 (for slopes)."""
    up = prolong_cells(coarse, dm)  # fine-space array starting at 2*coarse_lo
    sl = [slice(None)] * (up.ndim - dm)
    for d in range(dm):
        start = fine_lo[d] - 2 * coarse_lo[d]
        sl.append(slice(start, start + fine_n[d]))
    return up[tuple(sl)]
