"""Tagging, clustering and regridding.

TPU-native replacement for the reference's tag_boxes -> make_new_grids ->
enforce_proper_nesting pipeline (initialize.f90:152-342, regrid.f90:20-272):
tagged cells are clustered into ONE bounding box per level, grown by the
buffer width and quantized to TPU-friendly multiples so recompilation only
happens when the box genuinely changes shape.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .. import problems
from ..state import Sim, State
from .fill import MLGeom
from .hierarchy import LevelSpec, prolong_cells, prolong_nodes

QUANT = 8          # box edges quantized to multiples of this (fine index)
NEST_BUFFER = 2    # coarse-cell proper-nesting margin (enforce_proper_nesting)


def cluster_tagged(tags: np.ndarray, min_eff: float = 0.7,
                   blocking: int = 4, min_width: int = 4):
    """Berger-Rigoutsos-style clustering of a boolean tag array into a list
    of boxes [(lo, hi)) in the tag array's own index space.

    The reference gets this from FBoxLib's cluster module (knobs
    cluster_min_eff / cluster_blocking_factor / cluster_minwidth,
    probin.template:192-194; consumed via make_new_grids at
    initialize.f90:237-299): recursively split the tag bounding box at
    signature holes, else at the strongest Laplacian inflection of the
    signature, until each box's tagged-cell fraction reaches ``min_eff``;
    box edges are quantized to ``blocking``. Currently used for grid
    diagnostics and fixed-grids fidelity (levels remain single dense
    rectangles; the multi-patch level representation is the planned
    consumer)."""
    dm = tags.ndim

    def bbox(t):
        idx = np.argwhere(t)
        return idx.min(axis=0), idx.max(axis=0) + 1

    def quantize(lo, hi, shape):
        lo = (lo // blocking) * blocking
        hi = np.minimum(-((-hi) // blocking) * blocking, shape)
        return lo, hi

    def rec(lo, hi, depth):
        sub = tags[tuple(slice(lo[d], hi[d]) for d in range(dm))]
        if not sub.any():
            return []
        blo, bhi = bbox(sub)
        lo2, hi2 = lo + blo, lo + bhi
        sub = tags[tuple(slice(lo2[d], hi2[d]) for d in range(dm))]
        eff = sub.sum() / sub.size
        widths = hi2 - lo2
        if eff >= min_eff or depth > 12 or (widths <= min_width).all():
            return [(lo2, hi2)]
        # per-axis signatures
        best = None
        for d in range(dm):
            axes = tuple(t for t in range(dm) if t != d)
            sig = sub.sum(axis=axes)
            if widths[d] < 2 * min_width:
                continue
            # hole split: a zero plane strictly inside
            holes = np.nonzero(sig == 0)[0]
            holes = holes[(holes >= min_width) &
                          (holes <= widths[d] - min_width)]
            if holes.size:
                cut = int(holes[holes.size // 2])
                best = (2, d, cut)
                break
            # inflection split: max |second difference| sign change
            if widths[d] >= 4:
                lap = sig[2:] - 2 * sig[1:-1] + sig[:-2]
                cand_best = None
                for i in range(len(lap) - 1):
                    if lap[i] * lap[i + 1] < 0:
                        strength = abs(int(lap[i]) - int(lap[i + 1]))
                        cut = i + 2
                        if (cut >= min_width and
                                cut <= widths[d] - min_width and
                                (cand_best is None or
                                 strength > cand_best[0])):
                            cand_best = (strength, cut)
                if cand_best is not None:
                    if best is None or best[0] < 1:
                        best = (1, d, cand_best[1])
        if best is None:
            # fall back: bisect the longest axis
            d = int(np.argmax(widths))
            if widths[d] < 2 * min_width:
                return [(lo2, hi2)]
            best = (0, d, int(widths[d] // 2))
        _, d, cut = best
        mid = lo2.copy()
        mid[d] += cut
        hi_a = hi2.copy()
        hi_a[d] = mid[d]
        return rec(lo2, hi_a, depth + 1) + rec(mid, hi2, depth + 1)

    shape = np.array(tags.shape)
    out = [quantize(lo, hi, shape) for lo, hi in
           rec(np.zeros(dm, int), shape, 0)]
    # merge boxes that overlap after quantization
    merged = True
    while merged and len(out) > 1:
        merged = False
        for i in range(len(out)):
            for j in range(i + 1, len(out)):
                (l1, h1), (l2, h2) = out[i], out[j]
                if (np.minimum(h1, h2) > np.maximum(l1, l2)).all():
                    out[i] = (np.minimum(l1, l2), np.maximum(h1, h2))
                    out.pop(j)
                    merged = True
                    break
            if merged:
                break
    return [(tuple(int(v) for v in lo), tuple(int(v) for v in hi))
            for lo, hi in out]


def cluster_box(sim: Sim, tags: np.ndarray, tag_spec: LevelSpec,
                parent_level: int, buf: int,
                nest_spec: Optional[LevelSpec] = None) -> Optional[LevelSpec]:
    """Bounding-box clustering of tagged cells on the parent level -> new
    fine-level spec (fine index space), quantized and properly nested.

    ``tag_spec``: box of the tagged array (index offset); ``nest_spec``: the
    (possibly new) parent box to nest inside (defaults to tag_spec)."""
    dm = tags.ndim
    parent = nest_spec if nest_spec is not None else tag_spec
    if not tags.any():
        return None
    idx = np.argwhere(tags)
    lo_c = idx.min(axis=0) + np.array(tag_spec.lo)
    hi_c = idx.max(axis=0) + 1 + np.array(tag_spec.lo)
    lo_c = lo_c - buf
    hi_c = hi_c + buf

    dn_parent = [s * 2 ** parent_level for s in sim.n_cell]
    lo_f, hi_f = [], []
    for d in range(dm):
        l = 2 * int(lo_c[d])
        h = 2 * int(hi_c[d])
        # quantize to multiples of QUANT (fine index space)
        l = (l // QUANT) * QUANT
        h = -((-h) // QUANT) * QUANT
        dn_f = 2 * dn_parent[d]
        # proper nesting: stay NEST_BUFFER coarse cells inside the parent box
        # unless flush with the domain boundary
        pl = 2 * (parent.lo[d] + NEST_BUFFER) if parent.lo[d] > 0 else 0
        ph = 2 * (parent.hi[d] - NEST_BUFFER) if parent.hi[d] < dn_parent[d] \
            else dn_f
        l = max(l, pl, 0)
        h = min(h, ph, dn_f)
        if h - l < 2 * QUANT:
            mid = (l + h) // 2
            l = max(min(l, mid - QUANT), 0)
            h = min(max(h, mid + QUANT), dn_f)
        lo_f.append(l)
        hi_f.append(h)
    if any(h - l <= 0 for l, h in zip(lo_f, hi_f)):
        return None
    return LevelSpec(tuple(lo_f), tuple(h - l for l, h in zip(lo_f, hi_f)))


def compute_specs(sim: Sim, states: List[State], specs: List[LevelSpec]
                  ) -> List[LevelSpec]:
    """New level specs from density tagging of the current state
    (regrid.f90:131-202 loop)."""
    buf = max(sim.cfg.amr_buf_width, 2)
    new_specs = [specs[0]]
    nlev_avail = len(states)
    for l in range(sim.cfg.max_levs - 1):
        if l >= nlev_avail:
            break
        rho = np.asarray(states[l].s[0])
        tags = np.asarray(problems.tag_cells(sim, jnp.asarray(rho), l))
        child = cluster_box(sim, tags, specs[l], l, buf,
                            nest_spec=new_specs[l])
        if child is None:
            break
        if tags.any():
            boxes = cluster_tagged(tags, min_eff=sim.cfg.cluster_min_eff,
                                   blocking=sim.cfg.cluster_blocking_factor,
                                   min_width=sim.cfg.cluster_min_width)
            if len(boxes) > 1:
                cover = sum(int(np.prod([h[d] - lo[d] for d in range(tags.ndim)]))
                            for lo, h in boxes)
                bb = int(np.prod(child.n)) // 2 ** tags.ndim
                print(f"WARNING: level {l + 1} tagging clusters into "
                      f"{len(boxes)} boxes; single-rectangle level covers "
                      f"{bb / max(cover, 1):.1f}x the clustered area")
        new_specs.append(child)
    return new_specs


def build_level_data(sim: Sim, old_geom: MLGeom, states: List[State],
                     new_specs: List[LevelSpec]) -> List[State]:
    """Move state onto the new hierarchy: interpolate from the parent, copy
    where the old fine level overlaps (regrid.f90:274-341), nodal-prolong p."""
    dm = sim.dm
    new_states = [states[0]]
    for l in range(1, len(new_specs)):
        spec = new_specs[l]
        parent = new_states[l - 1]
        pspec = new_specs[l - 1]
        # interpolate u, s, gp from the parent level
        def interp(arr):
            lead = arr.ndim - dm
            up = prolong_cells(arr, dm)
            sl = [slice(None)] * lead
            for d in range(dm):
                start = spec.lo[d] - 2 * pspec.lo[d]
                sl.append(slice(start, start + spec.n[d]))
            return up[tuple(sl)]

        u = interp(parent.u)
        s = interp(parent.s)
        gp = interp(parent.gp)
        # nodal prolongation of p
        pm_parent = [old_geom.sim.pmask[d] and pspec.lo[d] == 0 and
                     pspec.hi[d] == sim.n_cell[d] * 2 ** (l - 1)
                     for d in range(dm)]
        pc = parent.p
        for d in range(dm):
            if pm_parent[d]:
                slp = [slice(None)] * dm
                slp[d] = slice(0, 1)
                pc = jnp.concatenate([pc, pc[tuple(slp)]], axis=d)
        pup = prolong_nodes(pc, dm)
        pm_new = [sim.pmask[d] and spec.lo[d] == 0 and
                  spec.hi[d] == sim.n_cell[d] * 2 ** l for d in range(dm)]
        slp = []
        for d in range(dm):
            count = spec.n[d] + (0 if pm_new[d] else 1)
            start = spec.lo[d] - 2 * pspec.lo[d]
            slp.append(slice(start, start + count))
        p = pup[tuple(slp)]

        # copy-overlap data from the old fine level where it exists
        if l < len(states):
            old = states[l]
            ospec = old_geom.specs[l]
            lo = [max(spec.lo[d], ospec.lo[d]) for d in range(dm)]
            hi = [min(spec.hi[d], ospec.hi[d]) for d in range(dm)]
            if all(h > lo_ for lo_, h in zip(lo, hi)):
                src = tuple(slice(lo[d] - ospec.lo[d], hi[d] - ospec.lo[d])
                            for d in range(dm))
                dst = tuple(slice(lo[d] - spec.lo[d], hi[d] - spec.lo[d])
                            for d in range(dm))
                u = u.at[(slice(None),) + dst].set(old.u[(slice(None),) + src])
                s = s.at[(slice(None),) + dst].set(old.s[(slice(None),) + src])
                gp = gp.at[(slice(None),) + dst].set(
                    old.gp[(slice(None),) + src])
        new_states.append(State(u=u, s=s, gp=gp, p=p))
    return new_states


def initialize_adaptive(sim: Sim) -> Tuple[MLGeom, List[State]]:
    """Adaptive hierarchy construction (initialize_with_adaptive_grids,
    initialize.f90:152-342): init level 0, tag, build finer levels from fresh
    initdata at their own resolution, iterate."""
    from .hierarchy import domain_spec
    specs = [domain_spec(sim.n_cell, 0)]
    states = [problems.initdata(sim)]
    buf = max(sim.cfg.amr_buf_width, 2)
    for l in range(sim.cfg.max_levs - 1):
        rho = states[l].s[0]
        tags = np.asarray(problems.tag_cells(sim, rho, l))
        child = cluster_box(sim, tags, specs[l], l, buf)
        if child is None:
            break
        specs.append(child)
        states.append(problems.initdata_on_spec(sim, child, l + 1))
    geom = MLGeom(sim, specs)
    return geom, states


def parse_fixed_grids(path: str, dm: int):
    """Parse a fixed-grids file (the read_a_hgproj_grid format the reference
    consumes at initialize.f90:113): first line = number of levels; then per
    fine level a box count followed by box lines ``((lo..) (hi..) (t..))``.
    Multiple boxes per level are clustered to their bounding box (our levels
    are single dense rectangles)."""
    import re
    box_re = re.compile(r"\(\(([^)]*)\)\s*\(([^)]*)\)")
    with open(path) as f:
        tokens = f.read().split("\n")
    lines = [ln.strip() for ln in tokens if ln.strip()]
    nlev = int(lines[0].split()[0])
    idx = 1
    out = []
    for _ in range(nlev - 1):
        # optional box-count line
        if re.fullmatch(r"\d+", lines[idx]):
            nbox = int(lines[idx])
            idx += 1
        else:
            nbox = 1
        lo = [10 ** 9] * dm
        hi = [-10 ** 9] * dm
        box_cells = 0
        for _b in range(nbox):
            m = box_re.search(lines[idx])
            idx += 1
            blo = [int(v) for v in m.group(1).split(",")[:dm]]
            bhi = [int(v) for v in m.group(2).split(",")[:dm]]
            box_cells += int(np.prod([bhi[d] + 1 - blo[d] for d in range(dm)]))
            lo = [min(lo[d], blo[d]) for d in range(dm)]
            hi = [max(hi[d], bhi[d] + 1) for d in range(dm)]
        # even alignment for ratio-2 hierarchies
        lo = [(v // 2) * 2 for v in lo]
        hi = [-((-v) // 2) * 2 for v in hi]
        if nbox > 1:
            bb_cells = int(np.prod([h - l for l, h in zip(lo, hi)]))
            print(f"WARNING: fixed-grids level with {nbox} boxes collapsed "
                  f"to bounding box; coverage ratio "
                  f"{box_cells / max(bb_cells, 1):.2f} — grid hierarchy and "
                  f"cost differ from the reference run")
        out.append(LevelSpec(tuple(lo), tuple(h - l for l, h in zip(lo, hi))))
    return out


def initialize_fixed(sim: Sim) -> Tuple[MLGeom, List[State]]:
    """Fixed-grids hierarchy construction (initialize_with_fixed_grids,
    initialize.f90:93-150)."""
    from .hierarchy import domain_spec
    specs = [domain_spec(sim.n_cell, 0)]
    # note: the file's first level entry describes level 2 of the reference
    specs += parse_fixed_grids(sim.cfg.fixed_grids, sim.dm)
    states = [problems.initdata(sim)]
    for l in range(1, len(specs)):
        states.append(problems.initdata_on_spec(sim, specs[l], l))
    geom = MLGeom(sim, specs)
    return geom, states


def write_grids(path: str, geom: MLGeom, istep: int):
    """Append the current box hierarchy (the grdlog of varden.f90:622-663)."""
    with open(path, "a") as f:
        f.write(f"step {istep}: {geom.nlev} levels\n")
        for l, spec in enumerate(geom.specs):
            hi = tuple(h - 1 for h in spec.hi)
            f.write(f"  level {l + 1}: (({','.join(map(str, spec.lo))}) "
                    f"({','.join(map(str, hi))}))\n")
