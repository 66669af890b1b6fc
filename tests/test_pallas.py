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
