"""Nodal (hg) FEM-stencil multigrid tests."""
import jax
import numpy as np
import jax.numpy as jnp

from varden_tpu.solvers import nodal


def test_operator_consistency_periodic_2d():
    # A phi / V  ->  -lap(phi) for smooth periodic phi
    n = 64
    dx = 1.0 / n
    xn = dx * np.arange(n)  # nodes (periodic: n nodes)
    X, Y = np.meshgrid(xn, xn, indexing="ij")
    phi = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y)
    lap = -8 * np.pi**2 * phi
    sigma = jnp.ones((n, n))
    levels = nodal.build_hierarchy([n, n], [dx, dx], [True, True], sigma, None)
    a = np.array(nodal.nd_apply(levels[0], jnp.asarray(phi))) / dx**2
    assert np.max(np.abs(a - (-lap))) < 8 * np.pi**2 * 0.02  # ~2% at 64^2


def test_mg_solve_periodic_2d():
    n = 64
    dx = 1.0 / n
    rng = np.random.RandomState(1)
    sigma = jnp.asarray(1.0 / (1.0 + rng.rand(n, n)))  # variable 1/rho
    xn = dx * np.arange(n)
    X, Y = np.meshgrid(xn, xn, indexing="ij")
    phi_ex = jnp.asarray(np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    levels = nodal.build_hierarchy([n, n], [dx, dx], [True, True], sigma, None)
    rhs = nodal.nd_apply(levels[0], phi_ex)
    fn = jax.jit(lambda r: nodal.solve((n, n), (dx, dx), (True, True), sigma, r,
                                       rel_eps=1e-11))
    phi, rn = fn(rhs)
    assert float(rn) < 1e-11 * float(jnp.max(jnp.abs(rhs)))
    err = np.array(phi - phi_ex)
    err -= err.mean()
    assert np.max(np.abs(err)) < 1e-9


def test_mg_solve_walls_2d():
    # non-periodic (natural/Neumann) on all sides
    n = 32
    dx = 1.0 / n
    sigma = jnp.ones((n, n))
    xn = dx * np.arange(n + 1)
    X, Y = np.meshgrid(xn, xn, indexing="ij")
    phi_ex = jnp.asarray(np.cos(np.pi * X) * np.cos(np.pi * Y))
    levels = nodal.build_hierarchy([n, n], [dx, dx], [False, False], sigma, None)
    rhs = nodal.nd_apply(levels[0], phi_ex)
    rhs = rhs - jnp.mean(rhs)
    fn = jax.jit(lambda r: nodal.solve((n, n), (dx, dx), (False, False), sigma, r,
                                       rel_eps=1e-11))
    phi, rn = fn(rhs)
    assert float(rn) < 1e-10 * float(jnp.max(jnp.abs(rhs)) + 1e-30)
    err = np.array(phi - phi_ex)
    err -= err.mean()
    assert np.max(np.abs(err)) < 1e-8


def test_projection_contracts_divergence_2d():
    """Approximate-projection contract: projecting a velocity field must
    slash the weak divergence; projecting a gradient field recovers it."""
    n = 64
    dx = 1.0 / n
    dm = 2
    pmask = (True, True)
    rng = np.random.RandomState(2)
    xn = dx * np.arange(n)
    X, Y = np.meshgrid(xn, xn, indexing="ij")
    psi = jnp.asarray(np.sin(2 * np.pi * X) * np.sin(4 * np.pi * Y) +
                      0.3 * np.cos(4 * np.pi * X))
    sigma = jnp.ones((n, n))
    u = nodal.cell_grad(psi, (dx, dx), pmask, dm)  # pure gradient field

    b0 = nodal.divu_rhs(u, (dx, dx), pmask, dm)
    fn = jax.jit(lambda r: nodal.solve((n, n), (dx, dx), pmask, sigma, r,
                                       rel_eps=1e-12))
    phi, _ = fn(b0)
    gphi = nodal.cell_grad(phi, (dx, dx), pmask, dm)
    u1 = u - sigma * gphi
    b1 = nodal.divu_rhs(u1, (dx, dx), pmask, dm)
    r0 = float(jnp.max(jnp.abs(b0)))
    r1 = float(jnp.max(jnp.abs(b1)))
    assert r1 < 0.05 * r0, (r0, r1)


def test_mg_solve_3d_periodic():
    n = 16
    dx = 1.0 / n
    sigma = jnp.ones((n, n, n))
    xn = dx * np.arange(n)
    X, Y, Z = np.meshgrid(xn, xn, xn, indexing="ij")
    phi_ex = jnp.asarray(np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y) *
                         np.sin(2 * np.pi * Z))
    pm = (True,) * 3
    levels = nodal.build_hierarchy([n] * 3, [dx] * 3, list(pm), sigma, None)
    rhs = nodal.nd_apply(levels[0], phi_ex)
    fn = jax.jit(lambda r: nodal.solve((n,) * 3, (dx,) * 3, pm, sigma, r,
                                       rel_eps=1e-10))
    phi, rn = fn(rhs)
    err = np.array(phi - phi_ex)
    err -= err.mean()
    assert float(rn) < 1e-9 * float(jnp.max(jnp.abs(rhs)))
    assert np.max(np.abs(err)) < 1e-7


def test_nodal_bottom_solver_options():
    """hg_bottom_solver codes converge the nodal MG like the dense default
    (reference _parameters:56, hg_multigrid.f90:99)."""
    n = 32
    dx = 1.0 / n
    rng = np.random.RandomState(3)
    sigma = jnp.asarray(1.0 / (1.0 + rng.rand(n, n)))
    xn = dx * np.arange(n)
    X, Y = np.meshgrid(xn, xn, indexing="ij")
    phi_ex = jnp.asarray(np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    levels = nodal.build_hierarchy([n, n], [dx, dx], [True, True], sigma, None)
    rhs = nodal.nd_apply(levels[0], phi_ex)
    ref, _ = nodal.solve((n, n), (dx, dx), (True, True), sigma, rhs,
                         rel_eps=1e-11)
    ref = np.asarray(ref) - np.asarray(ref).mean()
    for method in ("cg", "bicgstab", "smoother"):
        phi, rn = nodal.solve((n, n), (dx, dx), (True, True), sigma, rhs,
                              rel_eps=1e-11, bottom=method)
        assert float(rn) < 1e-11 * float(jnp.max(jnp.abs(rhs))), method
        phi = np.asarray(phi) - np.asarray(phi).mean()
        assert np.max(np.abs(phi - ref)) < 1e-9, method
