"""Multi-patch (patch-tree) AMR: disjoint tagged regions become ISOLATED
patches instead of one bounding rectangle (reference make_new_grids
clustering, initialize.f90:237-299 / regrid.f90:131-202)."""
import os

import numpy as np
import jax.numpy as jnp

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim, State
from varden_tpu.driver import Varden
from varden_tpu.amr.fill import MLGeom
from varden_tpu.amr import regrid as regrid_mod
from varden_tpu.amr.hierarchy import restrict_cells, domain_spec
from varden_tpu.amr.solve import covered_slice_rel


def _cfg(**kw):
    base = dict(dim_in=2, prob_type=1, n_cellx=64, n_celly=64, max_levs=2,
                regrid_int=2, max_step=2, init_iter=1, grav=-9.8,
                bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                cflfac=0.9, init_shrink=0.1)
    base.update(kw)
    return VardenConfig(**base)


def _two_blob_state(sim, centers, radius=0.08):
    """Synthetic density with tanh blobs at the given centers."""
    n = sim.n_cell
    x = (np.arange(n[0]) + 0.5) * sim.dx[0]
    y = (np.arange(n[1]) + 0.5) * sim.dx[1]
    X, Y = np.meshgrid(x, y, indexing="ij")
    rho = np.ones(n)
    for cx, cy in centers:
        r = np.sqrt((X - cx) ** 2 + (Y - cy) ** 2)
        rho += 0.5 * (1.0 - np.tanh((r - radius) / 0.02))
    s = jnp.stack([jnp.asarray(rho), jnp.zeros(n)])
    z = jnp.zeros((2,) + tuple(n))
    p = jnp.zeros(tuple(v + 1 for v in n))
    return State(u=z, s=s, gp=z, p=p)


def test_two_blobs_make_two_patches():
    """Far-apart blobs refine as two disjoint patches whose total fine-cell
    count is well under the bounding rectangle's (the round-2 warning path
    is gone)."""
    sim = Sim(_cfg())
    st = _two_blob_state(sim, [(0.2, 0.2), (0.8, 0.8)])
    geom0 = MLGeom(sim, [domain_spec(sim.n_cell, 0)])
    specs, parent, depth = regrid_mod.compute_tree(sim, geom0, [st])
    assert depth.count(1) == 2, f"expected 2 patches, got {specs[1:]}"
    kids = [specs[i] for i in range(len(specs)) if depth[i] == 1]
    # disjoint with at least MERGE_GAP separation
    (l1, h1), (l2, h2) = [(k.lo, k.hi) for k in kids]
    gap_ok = any(l2[d] >= h1[d] + regrid_mod.MERGE_GAP or
                 l1[d] >= h2[d] + regrid_mod.MERGE_GAP for d in range(2))
    assert gap_ok, f"patches not isolated: {kids}"
    fine = sum(int(np.prod(k.n)) for k in kids)
    blo = [min(k.lo[d] for k in kids) for d in range(2)]
    bhi = [max(k.hi[d] for k in kids) for d in range(2)]
    bbox = int(np.prod([bhi[d] - blo[d] for d in range(2)]))
    assert fine < 0.5 * bbox, (fine, bbox)


def test_close_blobs_merge():
    """Blobs closer than the isolation gap merge into ONE patch."""
    sim = Sim(_cfg())
    st = _two_blob_state(sim, [(0.42, 0.5), (0.58, 0.5)])
    geom0 = MLGeom(sim, [domain_spec(sim.n_cell, 0)])
    specs, parent, depth = regrid_mod.compute_tree(sim, geom0, [st])
    assert depth.count(1) == 1


def test_two_patch_step_invariants(tmp_path):
    """End-to-end ML run on a 3-node tree (two disjoint depth-1 patches via
    a fixed-grids file): projection kills div(umac), density stays bounded,
    covered coarse cells slave to each child's restriction."""
    grids = tmp_path / "grids_2box"
    grids.write_text(
        "2\n2\n((8,8) (39,39) (0,0))\n((88,88) (119,119) (0,0))\n")
    v = Varden(_cfg(fixed_grids=str(grids), regrid_int=-1, max_step=2))
    sts = v.run()
    assert v.geom.nlev == 3
    assert v.geom.depth == [0, 1, 1]
    assert float(v.last_diag["div_after"]) < 1e-8
    for st in sts:
        rho = np.asarray(st.s[0])
        assert rho.min() > 1.0 - 1e-10 and rho.max() < 2.0 + 1e-10
        assert np.isfinite(np.asarray(st.u)).all()
    for c in (1, 2):
        cov = covered_slice_rel(v.geom, c)
        for name in ("s", "u", "gp"):
            coarse = np.asarray(getattr(sts[0], name))[(slice(None),) + cov]
            fine = np.asarray(restrict_cells(getattr(sts[c], name), 2))
            assert np.max(np.abs(coarse - fine)) < 1e-12, (c, name)


def test_two_patch_checkpoint_roundtrip(tmp_path):
    """Multi-box checkpoint (one FAB per patch) restores the identical
    tree and state."""
    from varden_tpu.io import output
    grids = tmp_path / "grids_2box"
    grids.write_text(
        "2\n2\n((8,8) (39,39) (0,0))\n((88,88) (119,119) (0,0))\n")
    cfg = _cfg(fixed_grids=str(grids), regrid_int=-1, max_step=1,
               check_base_name=str(tmp_path / "chk"))
    v = Varden(cfg)
    sts = v.run_ml(max_step=1)
    name = output.write_checkpoint_ml(v.geom, sts, 1, v.time, v.dt,
                                      hints=v._ml_hints)
    geom2, sts2, header, hints = output.read_checkpoint_ml(v.sim, name)
    assert geom2.key() == v.geom.key()
    for a, b in zip(sts, sts2):
        for f in ("u", "s", "gp", "p"):
            assert np.array_equal(np.asarray(getattr(a, f)),
                                  np.asarray(getattr(b, f))), f
    assert hints is not None
