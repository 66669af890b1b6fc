"""Composite (multi-level) elliptic solver tests."""
import jax
import numpy as np
import jax.numpy as jnp

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim
from varden_tpu.amr.fill import MLGeom
from varden_tpu.amr.hierarchy import LevelSpec
from varden_tpu.amr import solve as amr_solve


def _geom(n=32, fine_lo=(8, 8), fine_n=(32, 32), bc=15):
    cfg = VardenConfig(dim_in=2, n_cellx=n, n_celly=n, max_levs=2,
                       bcx_lo=bc, bcx_hi=bc, bcy_lo=bc, bcy_hi=bc)
    sim = Sim(cfg)
    specs = [LevelSpec((0, 0), (n, n)), LevelSpec(fine_lo, fine_n)]
    return MLGeom(sim, specs)


def _beta_ones(n, dm=2, dtype=np.float64):
    return tuple(jnp.ones(tuple(n[t] + (1 if t == d else 0)
                                for t in range(dm)))
                 for d in range(dm))


def test_composite_cc_linear_exact():
    """phi = x solves lap(phi)=0 with Dirichlet x-BCs; the composite solve
    (interp ghosts + reflux) must reproduce it exactly on both levels."""
    geom = _geom()
    sim = geom.sim
    n0, n1 = geom.specs[0].n, geom.specs[1].n
    # Dirichlet on x, Neumann on y: solve for velocity comp 0 style BCs
    from varden_tpu.bc import BC_DIR, BC_NEU
    sim.ell_bc[sim.press_comp] = [[BC_DIR, BC_DIR], [BC_NEU, BC_NEU]]
    rhs = [jnp.zeros(n0), jnp.zeros(n1)]
    aco = [jnp.zeros(n0), jnp.zeros(n1)]
    beta = [_beta_ones(n0), _beta_ones(n1)]
    bvals = [[0.0, 1.0], [0.0, 0.0]]

    fn = jax.jit(lambda r0, r1: amr_solve.composite_cc_solve(
        geom, sim.press_comp, [r0, r1], aco, beta, 0.0,
        bvals=bvals, rel_eps=1e-12))
    phis, rn = fn(rhs[0], rhs[1])

    dx0 = 1.0 / 32
    x0 = dx0 * (np.arange(32) + 0.5)
    X0 = np.broadcast_to(x0[:, None], (32, 32))
    dx1 = dx0 / 2
    x1 = dx1 * (np.arange(geom.specs[1].lo[0], geom.specs[1].hi[0]) + 0.5)
    X1 = np.broadcast_to(x1[:, None], geom.specs[1].n)
    assert np.max(np.abs(np.array(phis[0]) - X0)) < 1e-9
    assert np.max(np.abs(np.array(phis[1]) - X1)) < 1e-9


def test_composite_cc_converges_periodic():
    geom = _geom(bc=-1)
    sim = geom.sim
    n0, n1 = geom.specs[0].n, geom.specs[1].n
    dx0 = 1.0 / 32
    x = dx0 * (np.arange(32) + 0.5)
    X, Y = np.meshgrid(x, x, indexing="ij")
    rhs0 = jnp.asarray(np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    rhs0 = rhs0 - jnp.mean(rhs0)
    # fine rhs: same function at fine resolution over the fine box
    dx1 = dx0 / 2
    s1 = geom.specs[1]
    x1 = dx1 * (np.arange(s1.lo[0], s1.hi[0]) + 0.5)
    y1 = dx1 * (np.arange(s1.lo[1], s1.hi[1]) + 0.5)
    X1, Y1 = np.meshgrid(x1, y1, indexing="ij")
    rhs1 = jnp.asarray(np.sin(2 * np.pi * X1) * np.cos(2 * np.pi * Y1))
    aco = [jnp.zeros(n0), jnp.zeros(n1)]
    beta = [_beta_ones(n0), _beta_ones(n1)]

    fn = jax.jit(lambda r0, r1: amr_solve.composite_cc_solve(
        geom, geom.sim.press_comp, [r0, r1], aco, beta, 0.0, rel_eps=1e-10))
    phis, rn = fn(rhs0, rhs1)
    assert float(rn) < 1.1e-10 * float(jnp.max(jnp.abs(rhs0)))
    # covered coarse cells equal the restriction of the fine solution
    from varden_tpu.amr.hierarchy import restrict_cells
    cov = amr_solve.covered_slice_rel(geom, 1)  # child node
    assert np.allclose(np.array(phis[0][cov]),
                       np.array(restrict_cells(phis[1], 2)), atol=1e-12)


def test_composite_nodal_converges():
    """2-level composite nodal solve reaches solver tolerance (interface
    rows carry both coarse and P^T-restricted fine contributions)."""
    geom = _geom(bc=15)
    n0, n1 = geom.specs[0].n, geom.specs[1].n
    sigma = [jnp.ones(n0), jnp.ones(n1)]
    from varden_tpu.solvers import nodal
    from varden_tpu.amr.hierarchy import prolong_cells
    rng = np.random.RandomState(3)
    u0 = jnp.asarray(rng.rand(2, 32, 32) - 0.5)
    up = prolong_cells(u0, 2)
    s1 = geom.specs[1]
    u1 = up[:, s1.lo[0]:s1.hi[0], s1.lo[1]:s1.hi[1]]

    fn = jax.jit(lambda v0, v1: amr_solve.composite_nodal_solve(
        geom, sigma, [v0, v1], rel_eps=1e-10))
    phis, rn = fn(u0, u1)
    assert np.isfinite(np.array(phis[0])).all()
    assert np.isfinite(np.array(phis[1])).all()
    pm0 = tuple(geom.sim.pmask)
    rhs0 = nodal.divu_rhs(u0, geom.dx(0), pm0, 2)
    assert float(rn) < 1.1e-10 * float(jnp.max(jnp.abs(rhs0)))


def test_composite_nodal_3level_converges():
    """3-level nodal composite: middle-level interface rows must converge
    too (the recursive correction folds the child defect down)."""
    geom = _geom_deep(3, bc=15)
    from varden_tpu.solvers import nodal
    from varden_tpu.amr.hierarchy import prolong_cells
    rng = np.random.RandomState(5)
    sigma = [jnp.asarray(0.5 + rng.rand(*s.n)) for s in geom.specs]
    u0 = jnp.asarray(rng.rand(2, 32, 32) - 0.5)
    us = [u0]
    for l in (1, 2):
        up = prolong_cells(us[-1], 2)
        s = geom.specs[l]
        pl_ = geom.specs[l - 1]
        us.append(up[:, s.lo[0] - 2 * pl_.lo[0]:s.hi[0] - 2 * pl_.lo[0],
                     s.lo[1] - 2 * pl_.lo[1]:s.hi[1] - 2 * pl_.lo[1]])

    fn = jax.jit(lambda vs: amr_solve.composite_nodal_solve(
        geom, sigma, vs, rel_eps=1e-10))
    phis, rn = fn(us)
    rhs0 = nodal.divu_rhs(u0, geom.dx(0), tuple(geom.sim.pmask), 2)
    assert float(rn) < 1.1e-10 * float(jnp.max(jnp.abs(rhs0))), float(rn)
    for p in phis:
        assert np.isfinite(np.array(p)).all()


def _geom_deep(nlev, bc=15, n=32):
    cfg = VardenConfig(dim_in=2, n_cellx=n, n_celly=n, max_levs=nlev,
                       bcx_lo=bc, bcx_hi=bc, bcy_lo=bc, bcy_hi=bc)
    sim = Sim(cfg)
    specs = [LevelSpec((0, 0), (n, n)),
             LevelSpec((16, 16), (32, 32)),
             LevelSpec((40, 40), (32, 32)),
             LevelSpec((88, 88), (32, 32))][:nlev]
    return MLGeom(sim, specs)


def _smooth_rhs_levels(geom):
    """sin*cos sampled at each level's cell centers over its box."""
    out = []
    for l, spec in enumerate(geom.specs):
        dx = geom.dx(l)
        xs = [dx[d] * (np.arange(spec.lo[d], spec.hi[d]) + 0.5)
              for d in range(2)]
        X, Y = np.meshgrid(*xs, indexing="ij")
        out.append(jnp.asarray(np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)))
    return out


def _deep_cc_case(nlev, bc):
    """3+/4-level composite cc solve must reach solver tolerance (the
    recursive composite V-cycle carries middle-level flux registers; the
    reference's ml_cc_solve semantics, mac_multigrid.f90:53-62)."""
    geom = _geom_deep(nlev, bc=bc)
    sim = geom.sim
    from varden_tpu.bc import BC_DIR, BC_NEU
    if bc != -1:
        sim.ell_bc[sim.press_comp] = [[BC_DIR, BC_NEU], [BC_NEU, BC_NEU]]
    rhs = _smooth_rhs_levels(geom)
    if bc == -1:
        rhs[0] = rhs[0] - jnp.mean(rhs[0])
    aco = [jnp.zeros(s.n) for s in geom.specs]
    beta = [_beta_ones(s.n) for s in geom.specs]

    fn = jax.jit(lambda rs: amr_solve.composite_cc_solve(
        geom, sim.press_comp, rs, aco, beta, 0.0, rel_eps=1e-10))
    phis, rn = fn(rhs)
    bnorm = float(jnp.max(jnp.abs(rhs[0])))
    assert float(rn) < 1.1e-10 * bnorm, f"nlev={nlev} bc={bc}: rn={float(rn)}"
    for p in phis:
        assert np.isfinite(np.array(p)).all()


def test_composite_cc_3level_dirichlet():
    _deep_cc_case(3, 15)


def test_composite_cc_3level_periodic():
    _deep_cc_case(3, -1)


def test_composite_cc_4level_dirichlet():
    _deep_cc_case(4, 15)
