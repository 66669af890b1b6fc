"""Full per-phase profile of the flagship 256^3 config on the attached TPU.

Mirrors advance_timestep phase by phase, each separately jitted and
host-synced, including the pieces profile_phases omits (explicit lapu,
mkflux_u, viscous solves, warm-started projections)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim
from varden_tpu import advance, problems, projection
from varden_tpu.ops import basic, godunov3d, pallas_godunov
from varden_tpu.solvers import nodal

n = int(os.environ.get("BENCH_N", "256"))
cfg = VardenConfig(
    dim_in=3, prob_type=1, n_cellx=n, n_celly=n, n_cellz=n,
    bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15, bcz_lo=15, bcz_hi=15,
    grav=-9.8, visc_coef=1e-3, cflfac=0.5, dtype="float32")
sim = Sim(cfg)
state = problems.initdata(sim)
dt = jnp.asarray(5e-4, sim.dtype)
ng = sim.ng
dm = sim.dm
adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
adv_bc_scal = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
is_cons = [True] + [False] * (sim.nscal - 1)
fused = pallas_godunov.tiles_supported(sim.n_cell, sim.dtype, ng)
print("fused tiles:", fused)

mac_rhs = jnp.zeros(sim.n_cell, sim.dtype)


@jax.jit
def ph_lapu(state):
    return advance.lap_velocity(sim, state.u)


@jax.jit
def ph_premac(state, lapu, dt):
    vf = basic.mkvelforce(cfg.ext_force, state.s, state.gp, lapu,
                          cfg.visc_coef, 1.0, cfg.boussinesq)
    u_pad = sim.fill_vel(state.u)
    vf_pad = sim.fill_extrap(vf, ng)
    if fused:
        umac = pallas_godunov.velpred_3d_fused(
            u_pad, vf_pad, dt, sim.dx, sim.phys_bc, adv_bc_vel, ng,
            sim.n_cell, cfg.slope_order, cfg.use_minion)
    else:
        umac = godunov3d.velpred_3d(u_pad, vf_pad, dt, sim.dx, sim.phys_bc,
                                    adv_bc_vel, ng, sim.n_cell,
                                    cfg.slope_order, cfg.use_minion)
    return umac, u_pad, vf


@jax.jit
def ph_mac(state, umac, phi0):
    return projection.macproject(sim, umac, state.s[0], mac_rhs, phi0=phi0)


@jax.jit
def ph_scalar(state, umac, dt):
    laps = jnp.zeros_like(state.s)
    sf = basic.mkscalforce(jnp.zeros_like(state.s), laps, cfg.diff_coef, 1.0)
    s_pad = sim.fill_scal(state.s)
    sf_pad = sim.fill_extrap(sf, ng)
    mrhs = sim.fill_extrap(mac_rhs, ng)
    mp = advance.embed_faces(sim, umac, ng)
    if fused:
        sedge, sflux = pallas_godunov.mkflux_3d_fused(
            s_pad, mp, sf_pad, mrhs, dt, sim.dx, sim.phys_bc, adv_bc_scal,
            ng, sim.n_cell, False, is_cons, cfg.slope_order, cfg.use_minion)
    else:
        sedge, sflux = godunov3d.mkflux_3d(
            s_pad, mp, sf_pad, mrhs, dt, sim.dx, sim.phys_bc, adv_bc_scal,
            ng, sim.n_cell, False, is_cons, cfg.slope_order, cfg.use_minion)
    sf2 = basic.mkscalforce(jnp.zeros_like(state.s), laps, cfg.diff_coef, 0.0)
    snew = basic.update(state.s, umac, sedge, sflux, sf2, dt, sim.dx, is_cons)
    return snew, mp


@jax.jit
def ph_mkflux_u(state, u_pad, vf, mp, dt):
    mrhs = sim.fill_extrap(mac_rhs, ng)
    uf_pad = sim.fill_extrap(vf, ng)
    vel_is_cons = [False] * dm
    if fused:
        uedge, uflux = pallas_godunov.mkflux_3d_fused(
            u_pad, mp, uf_pad, mrhs, dt, sim.dx, sim.phys_bc, adv_bc_vel,
            ng, sim.n_cell, True, vel_is_cons, cfg.slope_order,
            cfg.use_minion)
    else:
        uedge, uflux = godunov3d.mkflux_3d(
            u_pad, mp, uf_pad, mrhs, dt, sim.dx, sim.phys_bc, adv_bc_vel,
            ng, sim.n_cell, True, vel_is_cons, cfg.slope_order,
            cfg.use_minion)
    return uedge, uflux


@jax.jit
def ph_velupdate(state, umac, uedge, uflux, snew, lapu, dt):
    rhohalf = basic.make_at_halftime(state.s[0], snew[0])
    s_half = state.s.at[0].set(rhohalf)
    vfh = basic.mkvelforce(cfg.ext_force, s_half, state.gp, lapu,
                           cfg.visc_coef, 0.0, cfg.boussinesq)
    unew = basic.update(state.u, umac, uedge, uflux, vfh, dt, sim.dx,
                        [False] * dm)
    return unew, rhohalf


@jax.jit
def ph_visc(unew, lapu, rhohalf, dt):
    visc_mu = 0.5 * dt * cfg.visc_coef
    return projection.visc_solve(sim, unew, lapu, rhohalf, mac_rhs,
                                 visc_mu, cfg.diffusion_type)


@jax.jit
def ph_hg(state, unew, rhohalf, dt, phi0):
    return projection.hgproject(sim, projection.REGULAR_TIMESTEP, unew,
                                state.u, rhohalf, state.p, state.gp, dt,
                                phi0=phi0)


def _force(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(leaf))


# host<->device roundtrip latency of the tunneled platform: measured and
# subtracted (a naive per-call sync would inflate every phase by lat/n_rep)
_small = jnp.ones((8,), jnp.float32)
_ssum = jax.jit(jnp.sum)
float(_ssum(_small))
_t0 = time.perf_counter()
for _ in range(10):
    float(_ssum(_small))
LAT = (time.perf_counter() - _t0) / 10
print(f"  (roundtrip latency {1e3 * LAT:.1f} ms — subtracted)")


def timeit(name, fn, *args, n_rep=8):
    r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        r = fn(*args)
    _force(r)
    t = (time.perf_counter() - t0 - LAT) / n_rep
    print(f"  {name:24s} {1e3 * t:9.2f} ms")
    return r, t


# ---- ground truth: the fully-jitted step, differenced timing (bench.py
# semantics — the phase timings below must sum to ~this)
from varden_tpu import advance as _adv
from varden_tpu import projection as _proj


# named/structured exactly like bench.py's step so the persistent compile
# cache built by a bench run is HIT here (the remote compile service is
# flaky on programs this size — avoid recompiling what bench already built)
@jax.jit
def step(state, dt, hints):
    new_state, diag = _adv.advance_timestep(
        sim, state, dt, _proj.REGULAR_TIMESTEP, hints=hints)
    return new_state, {"phi_mac": diag["phi_mac"],
                       "phi_mac_prev": hints["phi_mac"],
                       "phi_hg": diag["phi_hg"],
                       "phi_hg_prev": hints["phi_hg"]}


whole_step = step


z_hg0 = jnp.zeros(nodal.node_shape(sim.n_cell, sim.pmask), sim.dtype)
hints0 = {"phi_mac": mac_rhs, "phi_mac_prev": mac_rhs,
          "phi_hg": z_hg0, "phi_hg_prev": z_hg0}


def run_steps(k):
    t0 = time.perf_counter()
    st, h = state, hints0
    for _ in range(k):
        st, h = whole_step(st, dt, h)
    _force(st.u)
    return time.perf_counter() - t0, st, h


run_steps(1)
t1, _, _ = run_steps(1)
t6, state_w, hints_w = run_steps(6)
step_ms = 1e3 * (t6 - t1) / 5
print(f"  {'WHOLE STEP (differenced)':24s} {step_ms:9.2f} ms "
      f"-> {n ** 3 * 1e-3 / step_ms:.1f} Mcells/s")

# realistic warm starts: the extrapolated hints an in-flight step sees
phi_mac_w = 2.0 * hints_w["phi_mac"] - hints_w["phi_mac_prev"]
phi_hg_w = 2.0 * hints_w["phi_hg"] - hints_w["phi_hg_prev"]

# chain the phases once (warm-up compiles + produce inputs)
state = state_w
lapu = ph_lapu(state)
umac, u_pad, vf = ph_premac(state, lapu, dt)
z_hg = jnp.zeros(nodal.node_shape(sim.n_cell, sim.pmask), sim.dtype)
res = ph_mac(state, umac, jnp.zeros(sim.n_cell, sim.dtype))
umac2, phi_mac = res[0], res[3]
snew, mp = ph_scalar(state, umac2, dt)
uedge, uflux = ph_mkflux_u(state, u_pad, vf, mp, dt)
unew, rhohalf = ph_velupdate(state, umac2, uedge, uflux, snew, lapu, dt)
unew2 = ph_visc(unew, lapu, rhohalf, dt)
out = ph_hg(state, unew2, rhohalf, dt, z_hg)
phi_hg = out[3]
_force(out)

total = 0.0
for name, fn, args in [
        ("lapu (explicit visc)", ph_lapu, (state,)),
        ("premac/velpred", ph_premac, (state, lapu, dt)),
        ("MAC proj (cold)", ph_mac, (state, umac, jnp.zeros_like(phi_mac))),
        ("MAC proj (warm)", ph_mac, (state, umac, phi_mac_w)),
        ("scalar mkflux+update", ph_scalar, (state, umac2, dt)),
        ("mkflux_u", ph_mkflux_u, (state, u_pad, vf, mp, dt)),
        ("vel update", ph_velupdate,
         (state, umac2, uedge, uflux, snew, lapu, dt)),
        ("visc solve", ph_visc, (unew, lapu, rhohalf, dt)),
        ("HG proj (cold)", ph_hg, (state, unew2, rhohalf, dt, z_hg)),
        ("HG proj (warm)", ph_hg, (state, unew2, rhohalf, dt, phi_hg_w)),
]:
    _, t = timeit(name, fn, *args)
    if "cold" not in name:
        total += t
print(f"  {'TOTAL (warm)':24s} {1e3 * total:9.2f} ms "
      f"-> {n ** 3 / total / 1e6:.1f} Mcells/s")
