"""Frozen f32 checksums of the FUSED Pallas Godunov path (interpret mode).

The CPU golden suite pins the f64 windowed path; these entries pin the f32
fused-kernel numerics so a kernel regression is caught without a TPU CI
(the on-device counterpart is bench.py's VARDEN_CHECK_FUSED artifact)."""
import json
import os
import sys

import numpy as np
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_fused.json")
CASES = {
    "walls": (15, 15, 15),
    "periodic": (-1, -1, -1),
    "mixed": (-1, 15, 12),
}


def _norms(arrs, prefix):
    out = {}
    for i, a in enumerate(arrs):
        a = np.asarray(a, np.float64)
        out[f"{prefix}{i}.l1"] = float(np.mean(np.abs(a)))
        out[f"{prefix}{i}.linf"] = float(np.max(np.abs(a)))
    return out


def _run_case(bc):
    from varden_tpu import problems
    from varden_tpu.advance import embed_faces
    from varden_tpu.config import VardenConfig
    from varden_tpu.ops import pallas_godunov
    from varden_tpu.state import Sim

    n = (24, 40, 16)
    cfg = VardenConfig(dim_in=3, prob_type=1, n_cellx=n[0], n_celly=n[1],
                       n_cellz=n[2], bcx_lo=bc[0], bcx_hi=bc[0],
                       bcy_lo=bc[1], bcy_hi=bc[1], bcz_lo=bc[2],
                       bcz_hi=bc[2], grav=-9.8, dtype="float32")
    sim = Sim(cfg)
    rng = np.random.RandomState(11)
    state = problems.initdata(sim)
    u = state.u + 0.1 * jnp.asarray(rng.rand(*state.u.shape) - 0.5,
                                    sim.dtype)
    force = 0.5 * jnp.asarray(rng.rand(*u.shape) - 0.5, sim.dtype)
    dm, ng = sim.dm, sim.ng
    adv = [sim.adv_bc[d] for d in range(dm)]
    u_pad = sim.fill_vel(u)
    f_pad = sim.fill_extrap(force, ng)
    dt = jnp.asarray(2e-3, sim.dtype)
    macs = pallas_godunov.velpred_3d_fused(
        u_pad, f_pad, dt, sim.dx, sim.phys_bc, adv, ng, n,
        cfg.slope_order, False, interpret=True)
    out = _norms(macs, "velpred.")
    scal_adv = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
    s_pad = sim.fill_scal(state.s)
    mp = embed_faces(sim, macs, ng)
    mrhs = sim.fill_extrap(jnp.zeros(n, sim.dtype), ng)
    sf_pad = sim.fill_extrap(jnp.zeros_like(state.s), ng)
    sedge, sflux = pallas_godunov.mkflux_3d_fused(
        s_pad, mp, sf_pad, mrhs, dt, sim.dx, sim.phys_bc, scal_adv, ng, n,
        False, [True, False], cfg.slope_order, False, interpret=True)
    out.update(_norms(sedge, "mkflux.e"))
    out.update(_norms(sflux, "mkflux.f"))
    return out


def test_fused_f32_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)
    for case, bc in CASES.items():
        got = _run_case(bc)
        for k, v in golden[case].items():
            g = got[k]
            tol = 1e-6 * max(abs(v), 1e-6)  # f32 bit-stability margin
            assert abs(g - v) <= tol, f"{case}:{k} drifted: {v} vs {g}"


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "regen":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    data = {case: _run_case(bc) for case, bc in CASES.items()}
    with open(GOLDEN, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print("wrote", GOLDEN)
