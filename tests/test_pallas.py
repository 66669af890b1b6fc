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
