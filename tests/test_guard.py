"""Solver-health guard + MG robustness (round-3 verdict items 10, ADVICE).

The reference's solvers abort outright on non-convergence (bl_error in
FBoxLib's mg_tower_solve); varden_tpu surfaces the achieved/target ratio in
the step diag and the driver warns (or raises) when a projection exits
above solver_guard x its effective tolerance.
"""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden
from varden_tpu.solvers import mg


def _bubble_cfg(**kw):
    base = dict(dim_in=2, prob_type=1, n_cellx=32, n_celly=32, max_levs=1,
                max_step=1, init_iter=0, grav=-9.8, bcx_lo=15, bcx_hi=15,
                bcy_lo=15, bcy_hi=15, cflfac=0.9, init_shrink=0.1,
                plot_int=-1, chk_int=-1, dtype="float64")
    base.update(kw)
    return VardenConfig(**base)


def test_guard_warns_on_underconverged_exit():
    # solver_guard below the normal exit ratio: every projection "fails"
    v = Varden(_bubble_cfg(solver_guard=1e-12))
    with pytest.warns(UserWarning, match="projection exited"):
        v.run()


def test_guard_raises_when_negative():
    v = Varden(_bubble_cfg(solver_guard=-1e-12))
    with pytest.raises(RuntimeError, match="projection exited"):
        v.run()


def test_guard_quiet_on_converged_run():
    v = Varden(_bubble_cfg(solver_guard=100.0))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        v.run()
    assert float(jnp.max(v.last_diag["mac_ratio"])) < 100.0
    assert float(jnp.max(v.last_diag["hg_ratio"])) < 100.0


def test_anisotropic_bottom_stays_small():
    # ADVICE r3: 256x8 must keep halving its long axis past the short
    # axis's floor, not hand a 2048-cell problem to the dense bottom solve
    ell_bc = [(mg.BC_NEU, mg.BC_NEU), (mg.BC_NEU, mg.BC_NEU)]
    aco = jnp.zeros((256, 8))
    levels = mg.build_hierarchy([256, 8], [1 / 256, 1 / 8], ell_bc, aco,
                                [1.0, 1.0], 0.0)
    bottom = levels[-1].n
    assert int(np.prod(bottom)) <= mg.BOTTOM_SIZE ** 2, bottom
    # near-cubic break level unchanged: 32^2 still bottoms at 8^2
    levels2 = mg.build_hierarchy([32, 32], [1 / 32, 1 / 32], ell_bc,
                                 jnp.zeros((32, 32)), [1.0, 1.0], 0.0)
    assert levels2[-1].n == (8, 8)


def test_anisotropic_solve_converges():
    n = (64, 8)
    ell_bc = [(mg.BC_DIR, mg.BC_DIR), (mg.BC_DIR, mg.BC_DIR)]
    dx = [1.0 / n[0], 1.0 / n[1]]
    x = (jnp.arange(n[0]) + 0.5) * dx[0]
    y = (jnp.arange(n[1]) + 0.5) * dx[1]
    phi_ex = jnp.sin(np.pi * x)[:, None] * jnp.sin(np.pi * y)[None, :]
    lev = mg.make_level(list(n), dx, ell_bc, jnp.zeros(n), (1.0, 1.0), 0.0)
    rhs = mg.cc_apply(lev, phi_ex)
    phi, rn = mg.solve(n, dx, ell_bc, jnp.zeros(n), [1.0, 1.0], rhs,
                       alpha=0.0, rel_eps=1e-10)
    err = float(jnp.max(jnp.abs(phi - phi_ex)))
    assert err < 1e-3, err  # discretization-exact up to truncation


def test_nan_warm_start_falls_through():
    # ADVICE r3: a NaN warm start must not poison the sweep count; the
    # solve should run the MG branch and still converge
    n = (16, 16)
    ell_bc = [(mg.BC_DIR, mg.BC_DIR), (mg.BC_DIR, mg.BC_DIR)]
    dx = [1.0 / 16, 1.0 / 16]
    rhs = jnp.ones(n)
    aco = jnp.ones(n)
    bad = jnp.full(n, jnp.nan)
    phi, rn = mg.solve(n, dx, ell_bc, aco, [1.0, 1.0], rhs, alpha=1.0,
                       phi0=bad, rel_eps=1e-10)
    # NaN input cannot be repaired (residual math keeps it NaN) but the
    # sweep-count clip must yield a defined int, not UB; with a FINITE but
    # huge warm start the solve must fully recover:
    huge = jnp.full(n, 1e30)
    phi2, rn2 = mg.solve(n, dx, ell_bc, aco, [1.0, 1.0], rhs, alpha=1.0,
                         phi0=huge, rel_eps=1e-10)
    assert bool(jnp.isfinite(phi2).all())
    assert float(rn2) <= 1e-8 * float(jnp.max(jnp.abs(rhs))) + 1e-12
