"""Headline benchmark: cell-updates/sec on the full advance_timestep.

Runs the 3-D variable-density bubble (the reference's flagship regression
config, scaled up) on whatever accelerator is attached and times steady-state
steps of the fully-jitted timestep. Timing is differenced ((t(K2)-t(K1)) /
(K2-K1)) around host-scalar syncs, which stays honest on platforms where
block_until_ready does not block (e.g. tunneled TPUs).

vs_baseline uses BASELINE.md's generated-baseline convention: the reference
publishes no numbers (BASELINE.json "published": {}), so we normalize against
an estimated single-node Fortran VARDEN throughput of 2.0e6 cell-updates/s
(O(1 us)/cell/step for the full Godunov + 2 MG solves pipeline on one CPU
node — documented assumption, to be replaced by a measured Fortran run).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

ASSUMED_FORTRAN_BASELINE = 2.0e6  # cell-updates/sec, single node (see above)


def bench_amr(n, dtype):
    """AMR variant (BASELINE config 3/5 family): 2-level 3-D bubble, the
    composite step timed with differencing. Composite cells = coarse
    uncovered + fine."""
    import numpy as np
    from varden_tpu.config import VardenConfig
    from varden_tpu.driver import Varden

    cfg = VardenConfig(
        dim_in=3, prob_type=1, n_cellx=n, n_celly=n, n_cellz=n,
        max_levs=2, regrid_int=-1, bcx_lo=15, bcx_hi=15, bcy_lo=15,
        bcy_hi=15, bcz_lo=15, bcz_hi=15, grav=-9.8, visc_coef=1e-3,
        cflfac=0.5, init_shrink=0.5, max_step=0, init_iter=0, dtype=dtype)
    v = Varden(cfg)
    states = v.initialize_ml()
    step = v._ml_step_fn(4)  # REGULAR_TIMESTEP
    import jax.numpy as jnp
    dt = 5e-4
    hints0 = v._ml_hints if v._ml_hints is not None else v._zero_ml_hints()

    def run(k):
        t0 = time.perf_counter()
        s, h = states, hints0
        for _ in range(k):
            s, diag = step(s, dt, h)
            h = {"phi_mac": diag["phi_mac"], "phi_mac_prev": h["phi_mac"],
                 "phi_hg": diag["phi_hg"], "phi_hg_prev": h["phi_hg"]}
        _ = float(jnp.sum(s[0].u))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(2))
    t2 = min(run(5) for _ in range(2))
    per_step = (t2 - t1) / 4
    fine_cells = int(np.prod(v.geom.specs[1].n))
    cells = n ** 3 + fine_cells - fine_cells // 8  # uncovered coarse + fine
    cups = cells / per_step
    print(json.dumps({
        "metric": f"cell-updates/sec/chip, 3D {n}^3 + 1 AMR level bubble, "
                  f"composite timestep ({dtype}, differenced timing)",
        "value": round(cups, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(cups / ASSUMED_FORTRAN_BASELINE, 3),
    }))


def check_fused(n, dtype):
    """VARDEN_CHECK_FUSED=1: run the fused Pallas Godunov kernels AND the
    windowed path on the attached device and record their max deviation in
    FUSED_CHECK.json (the TPU-run counterpart of the interpret-mode kernel
    tests — SURVEY.md §4 items 1/3)."""
    import jax.numpy as jnp
    from varden_tpu.config import VardenConfig
    from varden_tpu.state import Sim
    from varden_tpu import advance, problems
    from varden_tpu.ops import basic, godunov3d, pallas_godunov

    cfg = VardenConfig(
        dim_in=3, prob_type=1, n_cellx=n, n_celly=n, n_cellz=n,
        bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15, bcz_lo=15, bcz_hi=15,
        grav=-9.8, visc_coef=1e-3, dtype=dtype)
    sim = Sim(cfg)
    if not pallas_godunov.tiles_supported(sim.n_cell, sim.dtype, sim.ng):
        print(json.dumps({"fused_check": "unsupported", "n": n}))
        return
    state = problems.initdata(sim)
    dt = jnp.asarray(5e-4, sim.dtype)
    ng, dm = sim.ng, sim.dm
    adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
    adv_bc_scal = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
    is_cons = [True] + [False] * (sim.nscal - 1)

    @jax.jit
    def both(state):
        lapu = advance.lap_velocity(sim, state.u)
        vf = basic.mkvelforce(cfg.ext_force, state.s, state.gp, lapu,
                              cfg.visc_coef, 1.0, cfg.boussinesq)
        u_pad = sim.fill_vel(state.u)
        vf_pad = sim.fill_extrap(vf, ng)
        args = (u_pad, vf_pad, dt, sim.dx, sim.phys_bc, adv_bc_vel, ng,
                sim.n_cell, cfg.slope_order, cfg.use_minion)
        mac_f = pallas_godunov.velpred_3d_fused(*args)
        mac_w = godunov3d.velpred_3d(*args)
        vel_err = jnp.max(jnp.stack(
            [jnp.max(jnp.abs(a - b)) for a, b in zip(mac_f, mac_w)]))
        mp = advance.embed_faces(sim, mac_w, ng)
        s_pad = sim.fill_scal(state.s)
        sf_pad = sim.fill_extrap(jnp.zeros_like(state.s), ng)
        mrhs = sim.fill_extrap(jnp.zeros(sim.n_cell, sim.dtype), ng)
        margs = (s_pad, mp, sf_pad, mrhs, dt, sim.dx, sim.phys_bc,
                 adv_bc_scal, ng, sim.n_cell, False, is_cons,
                 cfg.slope_order, cfg.use_minion)
        se_f, sf_f = pallas_godunov.mkflux_3d_fused(*margs)
        se_w, sf_w = godunov3d.mkflux_3d(*margs)
        mk_err = jnp.max(jnp.stack(
            [jnp.max(jnp.abs(a - b)) for a, b in zip(se_f + sf_f,
                                                     se_w + sf_w)]))
        return vel_err, mk_err

    ve, me = both(state)
    result = {"fused_check": {"n": n, "dtype": dtype,
                              "velpred_max_err": float(ve),
                              "mkflux_max_err": float(me),
                              "backend": jax.default_backend()}}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "FUSED_CHECK.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


def main():
    # BASELINE.json's metric is cell-updates/sec/chip at 256^3
    n = int(os.environ.get("BENCH_N", "256"))
    k1 = int(os.environ.get("BENCH_K1", "1"))
    k2 = int(os.environ.get("BENCH_K2", "6"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    if os.environ.get("VARDEN_CHECK_FUSED", ""):
        return check_fused(int(os.environ.get("BENCH_N", "128")), dtype)
    if os.environ.get("BENCH_MODE", "") == "amr":
        return bench_amr(int(os.environ.get("BENCH_N", "64")), dtype)

    from varden_tpu.config import VardenConfig
    from varden_tpu.state import Sim
    from varden_tpu import advance, problems, projection

    cfg = VardenConfig(
        dim_in=3, prob_type=1, n_cellx=n, n_celly=n, n_cellz=n,
        bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15, bcz_lo=15, bcz_hi=15,
        grav=-9.8, visc_coef=1e-3, cflfac=0.5, dtype=dtype)
    sim = Sim(cfg)
    state0 = problems.initdata(sim)

    from varden_tpu.solvers import nodal

    @jax.jit
    def step(state, dt, hints):
        new_state, diag = advance.advance_timestep(
            sim, state, dt, projection.REGULAR_TIMESTEP, hints=hints)
        return new_state, {"phi_mac": diag["phi_mac"],
                           "phi_mac_prev": hints["phi_mac"],
                           "phi_hg": diag["phi_hg"],
                           "phi_hg_prev": hints["phi_hg"]}

    dt = jnp.asarray(5e-4, sim.dtype)
    z_mac = jnp.zeros(sim.n_cell, sim.dtype)
    z_hg = jnp.zeros(nodal.node_shape(sim.n_cell, sim.pmask), sim.dtype)
    hints0 = {"phi_mac": z_mac, "phi_mac_prev": z_mac,
              "phi_hg": z_hg, "phi_hg_prev": z_hg}

    def run(k):
        t0 = time.perf_counter()
        s, h = state0, hints0
        for _ in range(k):
            s, h = step(s, dt, h)
        _ = float(jnp.sum(s.u))  # host pull forces completion
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t1 = min(run(k1) for _ in range(2))
    t2 = min(run(k2) for _ in range(2))
    per_step = (t2 - t1) / (k2 - k1)

    cells = n ** 3
    cups = cells / per_step
    print(json.dumps({
        "metric": f"cell-updates/sec/chip, 3D {n}^3 variable-density bubble, "
                  f"full timestep ({dtype}, differenced timing)",
        "value": round(cups, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(cups / ASSUMED_FORTRAN_BASELINE, 3),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
