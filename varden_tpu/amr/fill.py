"""Multi-level ghost filling (fillpatch / multifab_fill_ghost_cells).

TPU-native equivalent of the reference's pre-step ghost machinery
(varden.f90:273-300): every level's padded array is derived functionally —
interior data, coarse-fine ghosts by limited-slope interpolation from the
parent level (lin_cc_interp), physical-boundary ghosts by the physbc recipes,
periodic wrap where a level spans a periodic axis.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .. import bc as bc_mod
from ..state import Sim
from .hierarchy import LevelSpec, prolong_cells


class MLGeom:
    """Static multilevel geometry: a PATCH TREE of dense rectangles.

    Nodes are LevelSpec patches sorted by refinement depth; node 0 is the
    root (whole domain, depth 0) and every other node has a ``parent`` it
    is properly nested in. A classic level chain is the special case
    parent = [-1, 0, 1, ...] (one patch per level) — the default when no
    parent list is given, so single-patch hierarchies behave identically.

    Patches at the same depth are ISOLATED (the clustering merges boxes
    closer than the ghost width): they interact only through their common
    parent, which is exactly the reference's coarse-fine machinery applied
    patchwise (its boxes within a level DO exchange ghosts — our merged
    patches make that exchange empty by construction).

    ``nlev`` is the NODE count (the historical name — most loops iterate
    nodes); ``ndepth`` is the number of refinement levels.
    """

    def __init__(self, sim: Sim, specs: List[LevelSpec], parent=None,
                 depth=None):
        self.sim = sim
        self.specs = specs
        self.nlev = len(specs)
        self.dm = sim.dm
        if parent is None:
            parent = [i - 1 for i in range(len(specs))]
            depth = list(range(len(specs)))
        self.parent = list(parent)
        self.depth = list(depth)
        assert len(self.parent) == len(specs) and len(self.depth) == len(specs)
        assert all(self.depth[self.parent[i]] == self.depth[i] - 1
                   for i in range(1, len(specs)))
        assert all(self.depth[i] <= self.depth[i + 1]
                   for i in range(len(specs) - 1)), "nodes must be depth-sorted"
        self.children = [[] for _ in specs]
        for i in range(1, len(specs)):
            self.children[self.parent[i]].append(i)
        self.ndepth = (max(self.depth) + 1) if specs else 0

    def nodes_at(self, d):
        return [i for i in range(self.nlev) if self.depth[i] == d]

    def key(self):
        """Static identity for jit-cache keys."""
        return tuple((s.lo, s.n, p, d) for s, p, d in
                     zip(self.specs, self.parent, self.depth))

    def dx(self, node):
        return tuple(h / 2 ** self.depth[node] for h in self.sim.dx)

    def domain_n(self, node):
        return tuple(s * 2 ** self.depth[node] for s in self.sim.n_cell)

    def side_kind(self, node, d, side):
        """'per' (wraps on itself), 'phys', or 'cf' (interp from parent)."""
        spec = self.specs[node]
        dn = self.domain_n(node)
        spans = spec.lo[d] == 0 and spec.hi[d] == dn[d]
        at_edge = (spec.lo[d] == 0) if side == 0 else (spec.hi[d] == dn[d])
        if self.sim.pmask[d]:
            return "per" if spans else "cf"
        return "phys" if at_edge else "cf"

    def phys_bc_level(self, lev):
        """phys_bc codes for the Godunov kernels: the domain code on physical
        sides, INTERIOR(0)/PERIODIC elsewhere (overrides are skipped there —
        ghosts already hold coarse-interpolated data)."""
        from ..config import INTERIOR, PERIODIC
        out = []
        for d in range(self.dm):
            pair = []
            for side in range(2):
                kind = self.side_kind(lev, d, side)
                if kind == "per":
                    pair.append(PERIODIC)
                elif kind == "phys":
                    pair.append(self.sim.phys_bc[d][side])
                else:
                    pair.append(INTERIOR)
            out.append(tuple(pair))
        return tuple(out)

    def ell_bc_level(self, lev, comp):
        """Elliptic BC codes per side for solvers at this level: domain codes
        on physical/periodic sides, BC_GHOST at coarse-fine sides."""
        from ..solvers.mg import BC_GHOST
        from ..bc import BC_PER
        out = []
        for d in range(self.dm):
            pair = []
            for side in range(2):
                kind = self.side_kind(lev, d, side)
                if kind == "per":
                    pair.append(BC_PER)
                elif kind == "phys":
                    pair.append(self.sim.ell_bc[comp][d][side])
                else:
                    pair.append(BC_GHOST)
            out.append(tuple(pair))
        return out


def _apply_physbc_pad(geom: MLGeom, lev, fpad, ng, adv, vals):
    """Overwrite ghost slabs of an already-padded array on physical /
    self-periodic sides (x,y,z order so later axes own the corners)."""
    dm = geom.dm
    for d in range(dm):
        axis = fpad.ndim - dm + d
        kinds = (geom.side_kind(lev, d, 0), geom.side_kind(lev, d, 1))
        if kinds[0] == "cf" and kinds[1] == "cf":
            continue
        sl_int = [slice(None)] * fpad.ndim
        sl_int[axis] = slice(ng, -ng)
        fint = fpad[tuple(sl_int)]
        for side in range(2):
            kind = kinds[side]
            if kind == "cf":
                continue
            if kind == "per":
                src = [slice(None)] * fpad.ndim
                src[axis] = slice(-ng, None) if side == 0 else slice(0, ng)
                slab = fint[tuple(src)]
            else:
                code = adv[d][side]
                if code == bc_mod.ADV_INTERIOR:
                    continue
                if side == 0:
                    slab = bc_mod._lo_slab(fint, axis, ng, code, vals[d][side])
                else:
                    slab = bc_mod._hi_slab(fint, axis, ng, code, vals[d][side])
            dst = [slice(None)] * fpad.ndim
            dst[axis] = slice(0, ng) if side == 0 else slice(-ng, None)
            fpad = fpad.at[tuple(dst)].set(slab)
    return fpad


def pad_ml(geom: MLGeom, arrs: List[jnp.ndarray], comp: int, lev: int,
           ng: int) -> jnp.ndarray:
    """Ghost-padded array for one variable at one level.

    arrs[l]: interior array at level l (leading axes broadcast). Recursion
    pads the parent with ng//2+2 ghosts so the interpolation slab (including
    its slope halo) is always in range under proper nesting."""
    sim = geom.sim
    dm = geom.dm
    adv = sim.adv_bc[comp]
    vals = sim.bvals[comp] if comp < len(sim.bvals) else [[0.0, 0.0]] * dm

    if lev == 0:
        return bc_mod.fill_ghost(arrs[0], ng, adv, vals, sim.pmask, dm)

    par = geom.parent[lev]
    ngp = ng // 2 + 2
    ppad = pad_ml(geom, arrs, comp, par, ngp)
    spec = geom.specs[lev]
    pspec = geom.specs[par]

    c0 = [(spec.lo[d] - ng) // 2 - 1 for d in range(dm)]
    c1 = [-((-(spec.hi[d] + ng)) // 2) + 1 for d in range(dm)]
    sl = [slice(None)] * (ppad.ndim - dm)
    for d in range(dm):
        origin = pspec.lo[d] - ngp
        sl.append(slice(c0[d] - origin, c1[d] - origin))
    slab = ppad[tuple(sl)]

    up = prolong_cells(slab, dm)  # fine-space array with origin 2*c0
    sl = [slice(None)] * (up.ndim - dm)
    for d in range(dm):
        start = (spec.lo[d] - ng) - 2 * c0[d]
        sl.append(slice(start, start + spec.n[d] + 2 * ng))
    fpad = up[tuple(sl)]

    # overwrite interior with the fine data
    sl = [slice(None)] * (fpad.ndim - dm) + [slice(ng, -ng)] * dm
    fpad = fpad.at[tuple(sl)].set(arrs[lev])

    return _apply_physbc_pad(geom, lev, fpad, ng, adv, vals)


def pad_ml_multi(geom: MLGeom, arrs_by_level, comps: Sequence[int], lev: int,
                 ng: int) -> jnp.ndarray:
    """Stack of padded components: arrs_by_level[l] has leading comp axis."""
    out = []
    for i, comp in enumerate(comps):
        arrs = [arrs_by_level[l][i] for l in range(len(arrs_by_level))]
        out.append(pad_ml(geom, arrs, comp, lev, ng))
    return jnp.stack(out)
