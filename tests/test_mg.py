"""Cell-centered multigrid: manufactured-solution convergence tests."""
import jax
import numpy as np
import jax.numpy as jnp

from varden_tpu.bc import BC_DIR, BC_NEU, BC_PER
from varden_tpu.solvers import mg


def _grids(n, lo=0.0, hi=1.0):
    dx = (hi - lo) / n
    xc = lo + dx * (np.arange(n) + 0.5)
    return dx, xc


def _solve(n, dx, ell_bc, aco, beta, rhs, **kw):
    fn = jax.jit(lambda r: mg.solve(n, dx, ell_bc, aco, beta, r, **kw))
    phi, rn = fn(jnp.asarray(rhs))
    return np.array(phi), float(rn)


def test_poisson_periodic_2d():
    n = 64
    dx, x = _grids(n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    # -lap(phi) = rhs with phi = sin(2 pi x) cos(4 pi y)
    phi_ex = np.sin(2 * np.pi * X) * np.cos(4 * np.pi * Y)
    rhs = (4 * np.pi**2 + 16 * np.pi**2) * phi_ex
    ell_bc = [(BC_PER, BC_PER)] * 2
    aco = jnp.zeros((n, n))
    beta = (jnp.ones((n + 1, n)), jnp.ones((n, n + 1)))
    phi, rn = _solve((n, n), (dx, dx), ell_bc, aco, beta, rhs, rel_eps=1e-11)
    assert rn < 1e-11 * np.max(np.abs(rhs))
    phi -= phi.mean()
    phi_ex -= phi_ex.mean()
    assert np.max(np.abs(phi - phi_ex)) < 5e-3  # discretization error at 64^2


def test_poisson_dirichlet_2d():
    n = 64
    dx, x = _grids(n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    phi_ex = np.sin(np.pi * X) * np.sin(np.pi * Y)  # zero on boundary
    rhs = 2 * np.pi**2 * phi_ex
    ell_bc = [(BC_DIR, BC_DIR)] * 2
    aco = jnp.zeros((n, n))
    beta = (jnp.ones((n + 1, n)), jnp.ones((n, n + 1)))
    phi, rn = _solve((n, n), (dx, dx), ell_bc, aco, beta, rhs, rel_eps=1e-11)
    assert rn < 1e-11 * np.max(np.abs(rhs))
    assert np.max(np.abs(phi - phi_ex)) < 5e-3


def test_helmholtz_neumann_variable_beta_2d():
    # (aco - div beta grad) phi = rhs, manufactured via operator application
    n = 32
    dx, x = _grids(n)
    rng = np.random.RandomState(0)
    X, Y = np.meshgrid(x, x, indexing="ij")
    phi_ex = jnp.asarray(np.cos(np.pi * X) * np.cos(2 * np.pi * Y))
    aco = jnp.asarray(1.0 + 0.5 * rng.rand(n, n))
    bx = jnp.asarray(1.0 + 0.5 * rng.rand(n + 1, n))
    by = jnp.asarray(1.0 + 0.5 * rng.rand(n, n + 1))
    ell_bc = [(BC_NEU, BC_NEU)] * 2
    levels = mg.build_hierarchy([n, n], [dx, dx], ell_bc, aco, [bx, by], 1.0)
    rhs = mg.cc_apply(levels[0], phi_ex)
    phi, rn = _solve((n, n), (dx, dx), ell_bc, aco, (bx, by), rhs,
                     alpha=1.0, rel_eps=1e-12)
    assert np.max(np.abs(phi - np.array(phi_ex))) < 1e-10


def test_inhomogeneous_dirichlet_exact():
    # phi = x satisfies lap(phi)=0 with Dirichlet x-values, Neumann in y.
    n = 32
    dx, x = _grids(n)
    X, _ = np.meshgrid(x, x, indexing="ij")
    ell_bc = [(BC_DIR, BC_DIR), (BC_NEU, BC_NEU)]
    bvals = [[0.0, 1.0], [0.0, 0.0]]
    aco = jnp.zeros((n, n))
    beta = (jnp.ones((n + 1, n)), jnp.ones((n, n + 1)))
    rhs = np.zeros((n, n))
    phi, rn = _solve((n, n), (dx, dx), ell_bc, aco, beta, rhs,
                     bvals=bvals, rel_eps=1e-12)
    # linear solution is exact for the order-2 stencil
    assert np.max(np.abs(phi - X)) < 1e-9


def test_3d_periodic():
    n = 32
    dx, x = _grids(n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    phi_ex = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y) * np.sin(2 * np.pi * Z)
    rhs = 12 * np.pi**2 * phi_ex
    ell_bc = [(BC_PER, BC_PER)] * 3
    aco = jnp.zeros((n,) * 3)
    beta = tuple(jnp.ones(tuple(n + (1 if d == i else 0) for i in range(3)))
                 for d in range(3))
    phi, rn = _solve((n,) * 3, (dx,) * 3, ell_bc, aco, beta, rhs, rel_eps=1e-10)
    assert rn < 1e-10 * np.max(np.abs(rhs))
    phi -= phi.mean()
    pe = phi_ex - phi_ex.mean()
    assert np.max(np.abs(phi - pe)) < 2e-2


def test_bottom_solver_options():
    """The honored mg_bottom_solver codes (FBoxLib: 0 smoothing, 1/3
    BiCGStab, 2 CG) all converge the outer MG to the same tolerance as the
    dense direct default (reference _parameters:55-57; the bottom solve
    only needs bottom_solver_eps=1e-3, mac_multigrid.f90:56)."""
    n = 32
    dx, x = _grids(n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    phi_ex = np.sin(2 * np.pi * X) * np.cos(4 * np.pi * Y)
    rhs = (4 * np.pi**2 + 16 * np.pi**2) * phi_ex
    ell_bc = [(BC_PER, BC_PER)] * 2
    aco = jnp.zeros((n, n))
    beta = (jnp.ones((n + 1, n)), jnp.ones((n, n + 1)))
    ref, _ = _solve((n, n), (dx, dx), ell_bc, aco, beta, rhs, rel_eps=1e-11)
    ref -= ref.mean()
    for method in ("cg", "bicgstab", "smoother"):
        phi, rn = _solve((n, n), (dx, dx), ell_bc, aco, beta, rhs,
                         rel_eps=1e-11, bottom=method)
        assert rn < 1e-11 * np.max(np.abs(rhs)), method
        phi -= phi.mean()
        assert np.max(np.abs(phi - ref)) < 1e-9, method


def test_bottom_solver_dirichlet_batched():
    """CG/BiCGStab bottom solves handle a batched RHS (the batched
    Helmholtz path) and non-singular operators."""
    n = 32
    dx, x = _grids(n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    phi_ex = np.sin(np.pi * X) * np.sin(np.pi * Y)
    rhs0 = 2 * np.pi**2 * phi_ex
    rhs = np.stack([rhs0, 2.0 * rhs0])
    ell_bc = [(BC_DIR, BC_DIR)] * 2
    aco = jnp.ones((n, n))
    beta = (jnp.ones((n + 1, n)), jnp.ones((n, n + 1)))
    ref, _ = _solve((n, n), (dx, dx), ell_bc, aco, beta, rhs,
                    alpha=1.0, rel_eps=1e-11)
    for method in ("cg", "bicgstab"):
        phi, rn = _solve((n, n), (dx, dx), ell_bc, aco, beta, rhs,
                         alpha=1.0, rel_eps=1e-11, bottom=method)
        assert np.max(np.abs(phi - ref)) < 1e-9, method
