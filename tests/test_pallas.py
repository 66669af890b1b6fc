"""Pallas kernel correctness (interpret mode, vs the unfused jnp path)."""
import numpy as np
import jax
import jax.numpy as jnp

from varden_tpu.bc import BC_DIR, BC_NEU, BC_PER
from varden_tpu.solvers import mg
from varden_tpu.ops import pallas_kernels as pk


def test_gsrb_fused_matches_unfused_one_color():
    """With stale ghosts and a single tile, the fused red half-sweep matches
    the unfused red half-sweep exactly; black matches up to the within-sweep
    ghost refresh (checked loosely), and both smoothers drive the residual
    down at the same rate on a model problem."""
    n = (8, 8, 16)
    dx = (0.1, 0.11, 0.12)
    rng = np.random.RandomState(0)
    ell_bc = [(BC_NEU, BC_DIR), (BC_PER, BC_PER), (BC_NEU, BC_NEU)]
    beta = tuple(jnp.asarray(0.5 + rng.rand(*[n[t] + (1 if t == d else 0)
                                              for t in range(3)]))
                 for d in range(3))
    aco = jnp.zeros(n)
    level = mg.make_level(n, dx, ell_bc, aco, beta, 0.0)
    rhs = jnp.asarray(rng.rand(*n) - 0.5)
    phi0 = jnp.asarray(rng.rand(*n) - 0.5)
    bv = [[0.0, 0.3], [0.0, 0.0], [0.0, 0.0]]

    inv_diag = 1.0 / level.diag

    # fused sweep (interpret mode so it runs on CPU)
    pad = mg._pad_ghost(phi0, level.ell_bc, bv, 3)
    fused = pk.gsrb_sweep_3d(pad, rhs, inv_diag, beta, dx, interpret=True)

    # unfused reference
    red, black = mg._color_masks(n, phi0.dtype)
    phi = phi0
    r = rhs - mg.cc_apply(level, phi, bv)
    phi = phi + red * r * inv_diag
    # fused black uses stale ghosts; emulate by NOT re-padding: apply with
    # the frozen pad
    pad2 = pad.at[1:-1, 1:-1, 1:-1].set(phi)
    lphi = mg.apply_padded(pad2, aco, beta, 0.0, dx, 3)
    phi_ref = phi + black * (rhs - lphi) * inv_diag

    assert np.max(np.abs(np.array(fused - phi_ref))) < 1e-11

    # and as a smoother both reduce the residual comparably
    def resnorm(p):
        return float(jnp.max(jnp.abs(rhs - mg.cc_apply(level, p, bv))))
    r0 = resnorm(phi0)
    phi_f = phi0
    for _ in range(4):
        padf = mg._pad_ghost(phi_f, level.ell_bc, bv, 3)
        phi_f = pk.gsrb_sweep_3d(padf, rhs, inv_diag, beta, dx,
                                 interpret=True)
    assert resnorm(phi_f) < 0.6 * r0


def test_gsrb_2d_fused_matches_unfused():
    n = (16, 16)
    dx = (0.1, 0.12)
    rng = np.random.RandomState(1)
    ell_bc = [(BC_DIR, BC_NEU), (BC_PER, BC_PER)]
    beta = tuple(jnp.asarray(0.5 + rng.rand(*[n[t] + (1 if t == d else 0)
                                              for t in range(2)]))
                 for d in range(2))
    aco = jnp.zeros(n)
    level = mg.make_level(n, dx, ell_bc, aco, beta, 0.0)
    rhs = jnp.asarray(rng.rand(*n) - 0.5)
    phi0 = jnp.asarray(rng.rand(*n) - 0.5)
    bv = [[0.2, 0.0], [0.0, 0.0]]
    inv_diag = 1.0 / level.diag

    pad = mg._pad_ghost(phi0, level.ell_bc, bv, 2)
    fused = pk.gsrb_sweep_2d(pad, rhs, inv_diag, beta, dx, interpret=True)

    red, black = mg._color_masks(n, phi0.dtype)
    phi = phi0 + red * (rhs - mg.cc_apply(level, phi0, bv)) / level.diag
    pad2 = pad.at[1:-1, 1:-1].set(phi)
    lphi = mg.apply_padded(pad2, aco, beta, 0.0, dx, 2)
    phi_ref = phi + black * (rhs - lphi) / level.diag
    assert np.max(np.abs(np.array(fused - phi_ref))) < 1e-11


def test_gsrb_const_kernel_fixed_point_and_rate():
    """Fused constant-coefficient Helmholtz sweep (interpret mode):
    (a) an exact solution is a fixed point and its emitted residual is ~0
    (validates the in-kernel BC ghost construction + stencil against
    cc_apply bitwise-tightly); (b) as a smoother it contracts the residual
    at the unfused GSRB rate; (c) batched operands agree with per-field
    calls."""
    n = (16, 8, 128)
    dx = (0.1, 0.11, 0.12)
    rng = np.random.RandomState(4)
    ell_bc = [(BC_DIR, BC_NEU), (BC_DIR, BC_DIR), (BC_PER, BC_PER)]
    beta = (0.37, 0.41, 0.29)
    alpha = 1.0
    aco = jnp.asarray(1.0 + rng.rand(*n))
    level = mg.make_level(n, dx, ell_bc, aco, beta, alpha)
    bv = [[0.2, 0.0], [0.1, -0.3], [0.0, 0.0]]
    inv_diag = 1.0 / level.diag
    coef = jnp.stack([jnp.asarray(beta[d] / dx[d] ** 2) for d in range(3)]
                     + [jnp.asarray(alpha)])

    # (a) fixed point + residual emit
    phi_ex = jnp.asarray(rng.rand(*n) - 0.5)
    rhs_ex = mg.cc_apply(level, phi_ex, bv)
    out = pk.gsrb_const_sweep_3d(phi_ex[None], rhs_ex[None], inv_diag, coef,
                                 ell_bc, bv, aco=aco, interpret=True)
    assert out is not None
    assert np.max(np.abs(np.array(out[0] - phi_ex))) < 1e-11
    res = pk.gsrb_const_sweep_3d(phi_ex[None], rhs_ex[None], inv_diag, coef,
                                 ell_bc, bv, aco=aco, emit="residual",
                                 interpret=True)
    assert np.max(np.abs(np.array(res))) < 1e-11

    # (b) contraction rate matches the unfused GSRB within 10%
    rhs = jnp.asarray(rng.rand(*n) - 0.5)
    phi0 = jnp.asarray(rng.rand(*n) - 0.5)

    def resnorm(p):
        return float(jnp.max(jnp.abs(rhs - mg.cc_apply(level, p, bv))))

    p_f = phi0
    for _ in range(3):
        p_f = pk.gsrb_const_sweep_3d(p_f[None], rhs[None], inv_diag, coef,
                                     ell_bc, bv, aco=aco, interpret=True)[0]
    p_u = mg.gsrb(level, phi0, rhs, bv, 3)
    assert resnorm(p_f) < 1.1 * resnorm(p_u)

    # (c) batching == stacked independent calls
    rhs2 = jnp.stack([rhs, rhs_ex])
    phi2 = jnp.stack([phi0, phi_ex])
    both = pk.gsrb_const_sweep_3d(phi2, rhs2, inv_diag, coef, ell_bc, bv,
                                  aco=aco, interpret=True)
    one = pk.gsrb_const_sweep_3d(phi0[None], rhs[None], inv_diag, coef,
                                 ell_bc, bv, aco=aco, interpret=True)
    assert np.max(np.abs(np.array(both[0] - one[0]))) < 1e-12
    assert np.max(np.abs(np.array(both[1] - out[0]))) < 1e-12


def test_gsrb_var_kernel_fixed_point_restrict():
    """Fused variable-beta kernel (interpret mode): exact solutions are
    fixed points of the sweep; emit='residual' matches cc_apply; emit=
    'restrict' returns (avg-down residual, |r|_inf) matching the unfused
    pair; and the sweep contracts at the unfused GSRB rate."""
    n = (16, 8, 128)
    dx = (0.1, 0.11, 0.12)
    rng = np.random.RandomState(7)
    ell_bc = [(BC_NEU, BC_DIR), (BC_DIR, BC_NEU), (BC_PER, BC_PER)]
    beta = tuple(jnp.asarray(0.5 + rng.rand(*[n[t] + (1 if t == d else 0)
                                              for t in range(3)]))
                 for d in range(3))
    aco = jnp.zeros(n)
    level = mg.make_level(n, dx, ell_bc, aco, beta, 0.0)
    bv = [[0.0, 0.3], [0.15, 0.0], [0.0, 0.0]]
    inv_diag = 1.0 / level.diag

    phi_ex = jnp.asarray(rng.rand(*n) - 0.5)
    rhs_ex = mg.cc_apply(level, phi_ex, bv)
    out = pk.gsrb_var_sweep_3d(phi_ex, rhs_ex, inv_diag, beta, dx, ell_bc,
                               bv, interpret=True)
    assert out is not None
    assert np.max(np.abs(np.array(out - phi_ex))) < 1e-11

    res = pk.gsrb_var_sweep_3d(phi_ex, rhs_ex, inv_diag, beta, dx, ell_bc,
                               bv, emit="residual", interpret=True)
    assert np.max(np.abs(np.array(res))) < 1e-11

    rhs = jnp.asarray(rng.rand(*n) - 0.5)
    phi0 = jnp.asarray(rng.rand(*n) - 0.5)
    crs, rmax = pk.gsrb_var_sweep_3d(phi0, rhs, inv_diag, beta, dx, ell_bc,
                                     bv, emit="restrict", interpret=True)
    r_ref = rhs - mg.cc_apply(level, phi0, bv)
    crs_ref = mg._cell_avg_down(r_ref, 3)
    assert np.max(np.abs(np.array(crs - crs_ref))) < 1e-11
    assert abs(float(rmax) - float(jnp.max(jnp.abs(r_ref)))) < 1e-11

    def resnorm(p):
        return float(jnp.max(jnp.abs(rhs - mg.cc_apply(level, p, bv))))

    p_f = phi0
    for _ in range(3):
        p_f = pk.gsrb_var_sweep_3d(p_f, rhs, inv_diag, beta, dx, ell_bc, bv,
                                   interpret=True)
    p_u = mg.gsrb(level, phi0, rhs, bv, 3)
    assert resnorm(p_f) < 1.1 * resnorm(p_u)

    # Helmholtz form (alpha != 0, aco array)
    aco2 = jnp.asarray(1.0 + rng.rand(*n))
    lev2 = mg.make_level(n, dx, ell_bc, aco2, beta, 1.0)
    rhs2 = mg.cc_apply(lev2, phi_ex, bv)
    out2 = pk.gsrb_var_sweep_3d(phi_ex, rhs2, 1.0 / lev2.diag, beta, dx,
                                ell_bc, bv, aco=aco2, alpha=1.0,
                                interpret=True)
    assert np.max(np.abs(np.array(out2 - phi_ex))) < 1e-11


def _nodal_level(n, pmask, seed=2):
    from varden_tpu.solvers import nodal
    rng = np.random.RandomState(seed)
    dx = tuple(0.1 + 0.02 * d for d in range(len(n)))
    sigma = jnp.asarray(0.5 + rng.rand(*n))
    diag = nodal.node_diag(sigma, dx, pmask, len(n))
    return nodal.NodalLevel(tuple(n), dx, tuple(pmask), sigma, diag, None), rng


def test_nodal_pallas_apply_matches_factored():
    """Fused nodal FEM apply (interpret mode) == the factored jnp apply,
    mixed periodic/physical axes including an odd (n+1) first-axis node
    count exercising the pad-and-slice path."""
    from varden_tpu.solvers import nodal
    from varden_tpu.solvers.nodal import _pad_node, _sigma_np

    for pmask in [(True, True, True), (False, False, False),
                  (True, False, True)]:
        n = (8, 8, 8)
        level, rng = _nodal_level(n, pmask)
        ns = nodal.node_shape(n, pmask)
        phi = jnp.asarray(rng.rand(*ns) - 0.5)

        ref = nodal._factored_apply(phi, level.sigma, level.dx, pmask, 3)
        out = pk.nodal_sweep_3d(_pad_node(phi, pmask, 3),
                                _sigma_np(level.sigma, pmask, 3),
                                jnp.zeros_like(phi), jnp.zeros_like(phi),
                                level.dx, emit="apply", interpret=True)
        assert out is not None
        err = np.max(np.abs(np.array(out - ref)))
        assert err < 1e-11, f"pmask={pmask}: {err}"


def test_nodal_pallas_jacobi_matches_unfused():
    from varden_tpu.solvers import nodal
    from varden_tpu.solvers.nodal import _pad_node, _sigma_np

    pmask = (False, True, False)
    n = (8, 8, 8)
    level, rng = _nodal_level(n, pmask, seed=3)
    ns = nodal.node_shape(n, pmask)
    phi = jnp.asarray(rng.rand(*ns) - 0.5)
    rhs = jnp.asarray(rng.rand(*ns) - 0.5)
    omega = 0.85

    inv = 1.0 / level.diag
    ref = phi + omega * (rhs - nodal.nd_apply(level, phi)) * inv

    out = pk.nodal_sweep_3d(_pad_node(phi, pmask, 3),
                            _sigma_np(level.sigma, pmask, 3),
                            rhs, inv, level.dx, omega=omega, emit="jacobi",
                            interpret=True)
    assert np.max(np.abs(np.array(out - ref))) < 1e-11


def test_update_kernel_matches_unfused():
    """Fused update kernel (interpret) == basic.update's jnp path for
    conservative, convective and mixed component sets."""
    from varden_tpu.ops import basic
    rng = np.random.RandomState(12)
    n = (16, 16, 128)
    dm = 3
    for is_cons in ([True, False], [False, False, False], [True, True]):
        nc = len(is_cons)
        sold = jnp.asarray(rng.rand(nc, *n))
        force = jnp.asarray(rng.rand(nc, *n) - 0.5)
        umac = tuple(jnp.asarray(rng.rand(*[n[t] + (1 if t == d else 0)
                                            for t in range(dm)]) - 0.5)
                     for d in range(dm))
        sedge = tuple(jnp.asarray(rng.rand(nc, *[n[t] + (1 if t == d else 0)
                                                 for t in range(dm)]))
                      for d in range(dm))
        flux = tuple(jnp.asarray(rng.rand(nc, *[n[t] + (1 if t == d else 0)
                                                for t in range(dm)]))
                     for d in range(dm))
        dt, dx = 2e-3, (0.1, 0.11, 0.12)
        ref = basic.update(sold, umac, sedge, flux, force, dt, dx, is_cons)
        got = pk.update_3d(sold, umac, sedge, flux, force, dt, dx, is_cons,
                           interpret=True)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-12, (is_cons, err)
