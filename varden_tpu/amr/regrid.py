"""Tagging, clustering and regridding.

TPU-native replacement for the reference's tag_boxes -> make_new_grids ->
enforce_proper_nesting pipeline (initialize.f90:152-342, regrid.f90:20-272):
tagged cells cluster into Berger-Rigoutsos boxes, buffer/quantize to
TPU-friendly multiples (recompiles only when a box genuinely changes
shape), merge into ISOLATED patches, and nest into the patch tree.
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
    box edges are quantized to ``blocking``. Feeds the patch-tree level
    representation: boxes buffer/quantize in _child_boxes, then merge into
    isolated patches (compute_tree / initialize_adaptive)."""
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


MERGE_GAP = 8      # fine cells: boxes closer than this merge (>= ghost width
                   # so sibling patches never interact through a stencil)


def _merge_near(boxes, gap):
    """Merge fine-space boxes whose separation is < ``gap`` cells (grown
    boxes overlap) until stable; the survivors are ISOLATED patches."""
    out = [(np.asarray(lo), np.asarray(hi)) for lo, hi in boxes]
    merged = True
    while merged and len(out) > 1:
        merged = False
        for i in range(len(out)):
            for j in range(i + 1, len(out)):
                (l1, h1), (l2, h2) = out[i], out[j]
                if (np.minimum(h1 + gap, h2 + gap)
                        > np.maximum(l1 - gap, l2 - gap)).all():
                    out[i] = (np.minimum(l1, l2), np.maximum(h1, h2))
                    out.pop(j)
                    merged = True
                    break
            if merged:
                break
    return out


def _child_boxes(sim: Sim, tags: np.ndarray, tag_spec: LevelSpec, buf: int):
    """Cluster one node's tags into candidate CHILD boxes in the fine index
    space: Berger-Rigoutsos boxes -> global coarse cells -> buffer ->
    fine space -> QUANT alignment (isolation is enforced globally by the
    caller across all of a depth's candidates)."""
    if not tags.any():
        return []
    boxes = cluster_tagged(tags, min_eff=sim.cfg.cluster_min_eff,
                           blocking=sim.cfg.cluster_blocking_factor,
                           min_width=sim.cfg.cluster_min_width)
    out = []
    for lo, hi in boxes:
        lo_c = np.asarray(lo) + np.asarray(tag_spec.lo) - buf
        hi_c = np.asarray(hi) + np.asarray(tag_spec.lo) + buf
        lo_f = (2 * lo_c // QUANT) * QUANT
        hi_f = -((-2 * hi_c) // QUANT) * QUANT
        out.append((lo_f, hi_f))
    return out


def _mesh_quanta(sim: Sim):
    """Per-axis extent quanta for mesh runs: a patch axis only shards when
    its extent divides the mesh axis size (parallel/mesh._even_cell_spec),
    so when cfg.mesh > 0 the regridder aligns extents to lcm(2, mesh_axis)
    — the sharding analogue of the reference's max_grid_size/blocking
    quantization (initialize.f90:200). Returns None off-mesh."""
    if sim.cfg.mesh <= 0:
        return None
    import math
    from ..parallel.mesh import mesh_shape
    shape = mesh_shape(sim.cfg.mesh)
    return [math.lcm(2, shape[d]) if d < len(shape) else 1
            for d in range(sim.dm)]


def _nest_into(sim: Sim, lo_f, hi_f, parent: LevelSpec, parent_depth: int):
    """Clip a fine-space box to nest NEST_BUFFER coarse cells inside its
    parent patch (flush sides at the domain boundary are exempt); returns a
    LevelSpec or None if the clip empties it. On mesh runs, extents snap to
    mesh-divisible sizes (growing within the nesting window when possible,
    shrinking otherwise) so fine patches actually shard."""
    dm = sim.dm
    dn_parent = [s * 2 ** parent_depth for s in sim.n_cell]
    quanta = _mesh_quanta(sim)
    lo, hi = [], []
    for d in range(dm):
        dn_f = 2 * dn_parent[d]
        pl = 2 * (parent.lo[d] + NEST_BUFFER) if parent.lo[d] > 0 else 0
        ph = 2 * (parent.hi[d] - NEST_BUFFER) \
            if parent.hi[d] < dn_parent[d] else dn_f
        l = max(int(lo_f[d]), pl, 0)
        h = min(int(hi_f[d]), ph, dn_f)
        if h - l < 2 * QUANT:
            mid = (l + h) // 2
            l = max(min(l, mid - QUANT), pl, 0)
            h = min(max(h, mid + QUANT), ph, dn_f)
        if h - l <= 0:
            return None
        if quanta is not None and quanta[d] > 1 and (h - l) % quanta[d]:
            q = quanta[d]
            want = -((-(h - l)) // q) * q     # round extent up to q
            # grow toward hi, then lo, inside the nesting window; else shrink
            h2 = min(l + want, ph, dn_f)
            l2 = max(h2 - want, pl, 0)
            # q is even and every bound is even, so alignment keeps the
            # ratio-2 even-index invariant automatically
            if (h2 - l2) % q == 0 and h2 - l2 > 0:
                l, h = l2, h2
            # else: keep the UNQUANTIZED extent. Shrinking to the next
            # multiple of q below could cut tagged cells (plus buffer) out
            # of the refined region — silently losing resolution where the
            # error estimator demanded it (the reference's blocking /
            # max_grid_size quantization never drops tagged cells,
            # initialize.f90:200). A non-divisible patch merely replicates
            # on the mesh, which shard_ml_states already warns about.
        lo.append(l)
        hi.append(h)
    return LevelSpec(tuple(lo), tuple(h - l for l, h in zip(lo, hi)))


def _overlap_cells(spec: LevelSpec, lo_f, hi_f) -> int:
    v = 1
    for d in range(len(lo_f)):
        w = min(spec.hi[d], int(hi_f[d])) - max(spec.lo[d], int(lo_f[d]))
        if w <= 0:
            return 0
        v *= w
    return v


_TAG_FN_CACHE = {}


def _tag_nodes(sim: Sim, geom) -> List[int]:
    """Node indices whose tags compute_tree consumes (depth < max_levs-1)."""
    return [i for i in range(geom.nlev)
            if geom.depth[i] < sim.cfg.max_levs - 1]


def compute_tags(sim: Sim, geom, states: List[State]):
    """All tag arrays compute_tree needs, from ONE jitted dispatch, with
    host copies started immediately.

    On a tunneled device every device->host fetch costs a full round trip
    (~30 ms); the eager per-node ``np.asarray(tag_cells(...))`` made regrid
    cost nlev RTTs. Batching into one program + one async transfer (and
    prefetching it from the step *before* the regrid — driver.step_ml)
    makes the reference's regrid cadence (regrid.f90:131-202 every
    regrid_int steps) nearly free in wall-clock."""
    import jax
    nodes = _tag_nodes(sim, geom)
    key = (geom.key(), sim.cfg.prob_type, sim.cfg.max_levs)
    fn = _TAG_FN_CACHE.get(key)
    if fn is None:
        depths = [geom.depth[i] for i in nodes]

        def all_tags(rhos):
            return tuple(problems.tag_cells(sim, r, d)
                         for r, d in zip(rhos, depths))
        fn = jax.jit(all_tags)
        _TAG_FN_CACHE[key] = fn
    tags = fn([states[i].s[0] for i in nodes])
    for t in tags:
        t.copy_to_host_async()
    return dict(zip(nodes, tags))


def compute_tree(sim: Sim, geom, states: List[State], tags=None):
    """New patch tree from density tagging of the current states
    (regrid.f90:131-202 loop, with FBoxLib's make_new_grids clustering):
    each depth-d node's tags cluster into Berger-Rigoutsos boxes; boxes
    from all of a depth's nodes are merged into ISOLATED patches (gap >=
    MERGE_GAP fine cells) and nested into the new depth-d patch with the
    largest overlap.

    Returns (specs, parent, depth) lists, depth-sorted (node 0 = root)."""
    buf = max(sim.cfg.amr_buf_width, 2)
    slack = max(int(getattr(sim.cfg, "regrid_slack", 0)), 0)
    slack = -(-slack // QUANT) * QUANT if slack else 0  # keep QUANT alignment
    if tags is None:
        tags = compute_tags(sim, geom, states)
    specs = [geom.specs[0]]
    parent = [-1]
    depth = [0]
    for d in range(sim.cfg.max_levs - 1):
        old_nodes = [i for i in range(geom.nlev) if geom.depth[i] == d
                     and i < len(states) and i in tags]
        if not old_nodes:
            break
        cand = []
        for i in old_nodes:
            cand += _child_boxes(sim, np.asarray(tags[i]), geom.specs[i],
                                 buf)
        if slack:
            # grow candidates so the feature can move/expand within the
            # slack before the next geometry (and XLA retrace) is needed
            cand = [(np.asarray(lo) - slack, np.asarray(hi) + slack)
                    for lo, hi in cand]
        cand = _merge_near(cand, MERGE_GAP)
        parents_d = [j for j in range(len(specs)) if depth[j] == d]
        children = {}          # parent node -> list of LevelSpec
        for lo_f, hi_f in cand:
            best, ov = None, 0
            for j in parents_d:
                o = _overlap_cells(
                    LevelSpec(tuple(2 * l for l in specs[j].lo),
                              tuple(2 * n for n in specs[j].n)), lo_f, hi_f)
                if o > ov:
                    best, ov = j, o
            if best is None:
                continue
            child = _nest_into(sim, lo_f, hi_f, specs[best], d)
            if child is not None:
                children.setdefault(best, []).append(child)
        added = False
        for j in sorted(children):
            # a late clip can re-overlap siblings: merge those
            boxes = _merge_near([(c.lo, c.hi) for c in children[j]], 0)
            for lo, hi in boxes:
                specs.append(LevelSpec(tuple(int(v) for v in lo),
                                       tuple(int(h - l)
                                             for l, h in zip(lo, hi))))
                parent.append(j)
                depth.append(d + 1)
                added = True
        if not added:
            break
    return specs, parent, depth


def geom_covers(geom: MLGeom, specs, parent, depth, waste: float) -> bool:
    """Regrid hysteresis test: the CURRENT hierarchy still serves if every
    newly computed patch nests inside a current patch of the same depth
    (the current fine regions cover all tagged+buffered cells) and the
    current hierarchy is not wastefully large (< waste x the needed fine
    cells). Keeping the geometry skips both the data move and — the real
    cost — the XLA retrace of the whole ML step for a new shape key."""
    import math
    dm = geom.dm
    for i in range(1, len(specs)):
        d = depth[i]
        lo, hi = specs[i].lo, specs[i].hi
        ok = False
        for j in range(1, geom.nlev):
            if geom.depth[j] != d:
                continue
            cl, ch = geom.specs[j].lo, geom.specs[j].hi
            if all(cl[t] <= lo[t] and hi[t] <= ch[t] for t in range(dm)):
                ok = True
                break
        if not ok:
            return False
    ndepth = max([geom.ndepth - 1] + list(depth))
    for d in range(1, ndepth + 1):
        need = sum(math.prod(specs[i].n) for i in range(len(specs))
                   if depth[i] == d)
        have = sum(math.prod(geom.specs[j].n) for j in range(geom.nlev)
                   if geom.depth[j] == d)
        if need > 0 and have > waste * need:
            return False
        if need == 0 and have > 0:
            return False  # feature vanished at this depth: rebuild
    return True


def build_level_data(sim: Sim, old_geom: MLGeom, states: List[State],
                     new_geom: MLGeom) -> List[State]:
    """Move state onto the new patch tree: interpolate each node from its
    (already-built) parent, copy where old same-depth patches overlap
    (regrid.f90:274-341), nodal-prolong p."""
    dm = sim.dm
    new_states = [states[0]]
    for c in range(1, new_geom.nlev):
        spec = new_geom.specs[c]
        pi = new_geom.parent[c]
        parent = new_states[pi]
        pspec = new_geom.specs[pi]
        d_new = new_geom.depth[c]

        # interpolate u, s, gp from the parent patch
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
        pm_parent = [new_geom.side_kind(pi, d, 0) == "per" for d in range(dm)]
        pc = parent.p
        for d in range(dm):
            if pm_parent[d]:
                slp = [slice(None)] * dm
                slp[d] = slice(0, 1)
                pc = jnp.concatenate([pc, pc[tuple(slp)]], axis=d)
        pup = prolong_nodes(pc, dm)
        pm_new = [new_geom.side_kind(c, d, 0) == "per" for d in range(dm)]
        slp = []
        for d in range(dm):
            count = spec.n[d] + (0 if pm_new[d] else 1)
            start = spec.lo[d] - 2 * pspec.lo[d]
            slp.append(slice(start, start + count))
        p = pup[tuple(slp)]

        # copy-overlap data from every old same-depth patch that intersects
        for o in range(1, old_geom.nlev):
            if old_geom.depth[o] != d_new or o >= len(states):
                continue
            old = states[o]
            ospec = old_geom.specs[o]
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
    """Adaptive patch-tree construction (initialize_with_adaptive_grids,
    initialize.f90:152-342): init level 0, tag, cluster into isolated
    patches, init each from fresh initdata at its own resolution, recurse
    per depth."""
    from .hierarchy import domain_spec
    buf = max(sim.cfg.amr_buf_width, 2)
    specs = [domain_spec(sim.n_cell, 0)]
    parent = [-1]
    depth = [0]
    states = [problems.initdata(sim)]
    for d in range(sim.cfg.max_levs - 1):
        nodes_d = [i for i in range(len(specs)) if depth[i] == d]
        cand = []
        for i in nodes_d:
            tags = np.asarray(problems.tag_cells(sim, states[i].s[0], d))
            cand += _child_boxes(sim, tags, specs[i], buf)
        cand = _merge_near(cand, MERGE_GAP)
        children = {}
        for lo_f, hi_f in cand:
            best, ov = None, 0
            for j in nodes_d:
                o = _overlap_cells(
                    LevelSpec(tuple(2 * l for l in specs[j].lo),
                              tuple(2 * n for n in specs[j].n)), lo_f, hi_f)
                if o > ov:
                    best, ov = j, o
            if best is None:
                continue
            child = _nest_into(sim, lo_f, hi_f, specs[best], d)
            if child is not None:
                children.setdefault(best, []).append(child)
        added = False
        for j in sorted(children):
            boxes = _merge_near([(c.lo, c.hi) for c in children[j]], 0)
            for lo, hi in boxes:
                spec = LevelSpec(tuple(int(v) for v in lo),
                                 tuple(int(h - l) for l, h in zip(lo, hi)))
                specs.append(spec)
                parent.append(j)
                depth.append(d + 1)
                states.append(problems.initdata_on_spec(sim, spec, d + 1))
                added = True
        if not added:
            break
    geom = MLGeom(sim, specs, parent, depth)
    return geom, states


def parse_fixed_grids(path: str, dm: int):
    """Parse a fixed-grids file (the read_a_hgproj_grid format the reference
    consumes at initialize.f90:113): first line = number of levels; then per
    fine level a box count followed by box lines ``((lo..) (hi..) (t..))``.
    Returns a list per fine level of even-aligned LevelSpec boxes (multi-box
    levels are kept as separate patches; boxes closer than MERGE_GAP fine
    cells merge into one — the isolated-patch invariant)."""
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
        boxes = []
        for _b in range(nbox):
            m = box_re.search(lines[idx])
            idx += 1
            blo = [int(v) for v in m.group(1).split(",")[:dm]]
            bhi = [int(v) for v in m.group(2).split(",")[:dm]]
            # even alignment for ratio-2 hierarchies
            lo = [(v // 2) * 2 for v in blo]
            hi = [-((-(v + 1)) // 2) * 2 for v in bhi]
            boxes.append((np.asarray(lo), np.asarray(hi)))
        merged = _merge_near(boxes, MERGE_GAP)
        if len(merged) < len(boxes):
            print(f"note: fixed-grids level: {len(boxes)} boxes merged into "
                  f"{len(merged)} isolated patch(es) (gap < {MERGE_GAP})")
        out.append([LevelSpec(tuple(int(v) for v in lo),
                              tuple(int(h - l) for l, h in zip(lo, hi)))
                    for lo, hi in merged])
    return out


def initialize_fixed(sim: Sim) -> Tuple[MLGeom, List[State]]:
    """Fixed-grids patch-tree construction (initialize_with_fixed_grids,
    initialize.f90:93-150); each box becomes a patch parented to the
    previous-depth patch with the largest overlap."""
    from .hierarchy import domain_spec
    specs = [domain_spec(sim.n_cell, 0)]
    parent = [-1]
    depth = [0]
    states = [problems.initdata(sim)]
    # note: the file's first level entry describes level 2 of the reference
    per_level = parse_fixed_grids(sim.cfg.fixed_grids, sim.dm)
    for li, boxes in enumerate(per_level):
        d = li + 1
        parents_d = [j for j in range(len(specs)) if depth[j] == d - 1]
        for spec in boxes:
            best, ov = None, 0
            for j in parents_d:
                o = _overlap_cells(
                    LevelSpec(tuple(2 * l for l in specs[j].lo),
                              tuple(2 * n for n in specs[j].n)),
                    spec.lo, spec.hi)
                if o > ov:
                    best, ov = j, o
            if best is None:
                print(f"WARNING: fixed-grids box {spec.lo}+{spec.n} at level "
                      f"{d + 1} nests in no parent patch; dropped")
                continue
            specs.append(spec)
            parent.append(best)
            depth.append(d)
            states.append(problems.initdata_on_spec(sim, spec, d))
    geom = MLGeom(sim, specs, parent, depth)
    return geom, states


def write_grids(path: str, geom: MLGeom, istep: int, compiled: int = None):
    """Append the current box hierarchy (the grdlog of varden.f90:622-663);
    ``compiled`` logs the distinct-ML-step compile count (retrace audit)."""
    with open(path, "a") as f:
        extra = "" if compiled is None else f", {compiled} compiled steps"
        f.write(f"step {istep}: {geom.ndepth} levels, {geom.nlev} boxes"
                f"{extra}\n")
        for d in range(geom.ndepth):
            for i in geom.nodes_at(d):
                spec = geom.specs[i]
                hi = tuple(h - 1 for h in spec.hi)
                f.write(f"  level {d + 1}: "
                        f"(({','.join(map(str, spec.lo))}) "
                        f"({','.join(map(str, hi))}))\n")
