"""Micro-benchmark of the fused Godunov kernels (velpred + mkflux) at the
headline geometry, for tile/VMEM knob sweeps (VERDICT r3 item 2).

Knobs (env, read at import by pallas_godunov):
  VARDEN_GODUNOV_TY        y tile (default 8)
  VARDEN_GODUNOV_VMEM_MB   tile-model budget (default 38)
  VARDEN_VMEM_LIMIT_MB     Mosaic scoped-vmem ceiling (default 100)
  BENCH_N                  grid (default 256)

Prints one line per kernel: ms/call (differenced over reps) + the plan's tx.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim
from varden_tpu import advance, problems
from varden_tpu.ops import basic, pallas_godunov

n = int(os.environ.get("BENCH_N", "256"))
cfg = VardenConfig(
    dim_in=3, prob_type=1, n_cellx=n, n_celly=n, n_cellz=n,
    bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15, bcz_lo=15, bcz_hi=15,
    grav=-9.8, visc_coef=1e-3, cflfac=0.5, dtype="float32")
sim = Sim(cfg)
state = problems.initdata(sim)
dt = jnp.asarray(5e-4, sim.dtype)
ng, dm = sim.ng, sim.dm
adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
adv_bc_scal = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
is_cons = [True] + [False] * (sim.nscal - 1)

p = pallas_godunov._Plan(sim.n_cell, ng)
ph = pallas_godunov._Plan(sim.n_cell, ng, heavy=True)
print(f"plan: tx={p.tx} (heavy tx={ph.tx}) TY={pallas_godunov.TY} "
      f"vmem_limit={pallas_godunov._VMEM_LIMIT >> 20}MB "
      f"budget={os.environ.get('VARDEN_GODUNOV_VMEM_MB', '38')}MB",
      flush=True)


@jax.jit
def prep(state):
    lapu = advance.lap_velocity(sim, state.u)
    vf = basic.mkvelforce(cfg.ext_force, state.s, state.gp, lapu,
                          cfg.visc_coef, 1.0, cfg.boussinesq)
    u_pad = sim.fill_vel(state.u)
    vf_pad = sim.fill_extrap(vf, ng)
    s_pad = sim.fill_scal(state.s)
    sf_pad = sim.fill_extrap(jnp.zeros_like(state.s), ng)
    mrhs = sim.fill_extrap(jnp.zeros(sim.n_cell, sim.dtype), ng)
    return u_pad, vf_pad, s_pad, sf_pad, mrhs


u_pad, vf_pad, s_pad, sf_pad, mrhs = prep(state)


@jax.jit
def velpred(u_pad, vf_pad, dt):
    return pallas_godunov.velpred_3d_fused(
        u_pad, vf_pad, dt, sim.dx, sim.phys_bc, adv_bc_vel, ng,
        sim.n_cell, cfg.slope_order, cfg.use_minion)


mac = velpred(u_pad, vf_pad, dt)


@jax.jit
def mkflux_s(s_pad, mac, sf_pad, mrhs, dt):
    mp = advance.embed_faces(sim, mac, ng)
    return pallas_godunov.mkflux_3d_fused(
        s_pad, mp, sf_pad, mrhs, dt, sim.dx, sim.phys_bc, adv_bc_scal,
        ng, sim.n_cell, False, is_cons, cfg.slope_order, cfg.use_minion)


@jax.jit
def mkflux_u(u_pad, mac, vf_pad, mrhs, dt):
    mp = advance.embed_faces(sim, mac, ng)
    return pallas_godunov.mkflux_3d_fused(
        u_pad, mp, vf_pad, mrhs, dt, sim.dx, sim.phys_bc, adv_bc_vel,
        ng, sim.n_cell, True, [False] * dm, cfg.slope_order, cfg.use_minion)


def timed(label, fn, *args, reps=(2, 10)):
    out = fn(*args)   # compile
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(reps[0]) for _ in range(2))
    t2 = min(run(reps[1]) for _ in range(2))
    ms = (t2 - t1) / (reps[1] - reps[0]) * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


tv = timed("velpred", velpred, u_pad, vf_pad, dt)
ts = timed("mkflux_scal", mkflux_s, s_pad, mac, sf_pad, mrhs, dt)
tu = timed("mkflux_vel", mkflux_u, u_pad, mac, vf_pad, mrhs, dt)
print(f"TOTAL godunov trio: {tv + ts + tu:.2f} ms", flush=True)
