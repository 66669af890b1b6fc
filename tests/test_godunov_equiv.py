"""Windowed Godunov fast path vs the full-array debug oracle.

This is the reference's own validation strategy (use_godunov_debug,
_parameters:83; velpred.f90:61-87, mkflux.f90:87-121): the debug variants
compute the same math with simpler indexing and the optimized implementation
must agree. Agreement is to a few f64 ULPs: the formulations are identical
op-for-op, but XLA may fuse/contract the two programs differently."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim
from varden_tpu.ops import godunov, godunov3d, godunov_ref

BCS = {
    "periodic": [-1] * 6,
    "noslip": [15] * 6,
    "mixed": [11, 12, 14, 14, 13, 13],  # inlet/outlet x, slip y, symmetry z
}


def _sim(dm, bc, n=12):
    kw = dict(dim_in=dm, prob_type=1, n_cellx=n, n_celly=n,
              bcx_lo=bc[0], bcx_hi=bc[1], bcy_lo=bc[2], bcy_hi=bc[3],
              grav=-9.8, dtype="float64")
    if dm == 3:
        kw.update(n_cellz=n, bcz_lo=bc[4], bcz_hi=bc[5])
    return Sim(VardenConfig(**kw))


@pytest.mark.parametrize("dm", [2, 3])
@pytest.mark.parametrize("bcname", list(BCS))
def test_velpred_matches_oracle(dm, bcname):
    bc = BCS[bcname]
    sim = _sim(dm, bc)
    n, ng = sim.n_cell, sim.ng
    rng = np.random.RandomState(7)
    shape = (dm,) + tuple(s + 2 * ng for s in n)
    u = jnp.asarray(rng.randn(*shape))
    f = jnp.asarray(rng.randn(*shape) * 0.1)
    adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
    dt = 0.01

    @jax.jit
    def both(u, f):
        args = (u, f, dt, sim.dx, sim.phys_bc, adv_bc_vel, ng, n, 4, False)
        if dm == 2:
            return godunov.velpred_2d(*args), godunov_ref.velpred_2d(*args)
        return godunov3d.velpred_3d(*args), godunov_ref.velpred_3d(*args)

    new, old = both(u, f)
    for a, b in zip(new, old):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-13


@pytest.mark.parametrize("dm", [2, 3])
@pytest.mark.parametrize("bcname", list(BCS))
@pytest.mark.parametrize("is_vel", [False, True])
def test_mkflux_matches_oracle(dm, bcname, is_vel):
    bc = BCS[bcname]
    sim = _sim(dm, bc)
    n, ng = sim.n_cell, sim.ng
    rng = np.random.RandomState(3)
    nc = dm if is_vel else 2
    is_cons = [False] * dm if is_vel else [True, False]
    adv = ([sim.adv_bc[d] for d in range(dm)] if is_vel
           else [sim.adv_bc[sim.scal_comp(i)] for i in range(2)])
    sshape = (nc,) + tuple(s + 2 * ng for s in n)
    s = jnp.asarray(rng.randn(*sshape) + 2.0)
    sf = jnp.asarray(rng.randn(*sshape) * 0.1)
    mrhs = jnp.asarray(rng.randn(*[x + 2 * ng for x in n]) * 0.1)
    umac = tuple(jnp.asarray(
        rng.randn(*[n[t] + (1 if t == d else 0) for t in range(dm)]))
        for d in range(dm))
    dt = 0.01
    use_minion = not is_vel  # covers the minion source branch once

    @jax.jit
    def both(s, sf, mrhs, umac):
        from varden_tpu.advance import embed_faces
        mp = embed_faces(sim, umac, ng)
        args_tail = (sf, mrhs, dt, sim.dx, sim.phys_bc, adv, ng, n,
                     is_vel, is_cons, 4, use_minion)
        if dm == 2:
            a = godunov.mkflux_2d(s, mp[0], mp[1], *args_tail)
            b = godunov_ref.mkflux_2d(s, mp[0], mp[1], *args_tail)
            return a, b
        se, fl = godunov3d.mkflux_3d(s, mp, *args_tail)
        se2, fl2 = godunov_ref.mkflux_3d(s, mp, *args_tail)
        return se + fl, se2 + fl2

    a, b = both(s, sf, mrhs, umac)
    for x, y in zip(a, b):
        assert float(jnp.max(jnp.abs(x - y))) < 1e-13
