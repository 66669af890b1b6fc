"""Probe the composite MAC solve at the AMR bench geometry (64^3 + 80^3):
outer-cycle counts (cold vs warm-started), per-outer wall cost — VERDICT #3
targeting."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden
from varden_tpu.amr import advance_ml, solve as amr_solve
from varden_tpu.ops import basic

n = int(os.environ.get("BENCH_N", "64"))
cfg = VardenConfig(
    dim_in=3, prob_type=1, n_cellx=n, n_celly=n, n_cellz=n,
    max_levs=2, regrid_int=-1, bcx_lo=15, bcx_hi=15, bcy_lo=15,
    bcy_hi=15, bcz_lo=15, bcz_hi=15, grav=-9.8, visc_coef=1e-3,
    cflfac=0.5, init_shrink=0.5, max_step=0, init_iter=0, dtype="float32")
v = Varden(cfg)
states = v.initialize_ml()
geom = v.geom
sim = v.sim
dm, nlev = geom.dm, geom.nlev
print("tree:", [(geom.depth[i], geom.specs[i].n) for i in range(geom.nlev)])

step = v._ml_step_fn(4)
dt = 5e-4
h0 = v._ml_hints if v._ml_hints is not None else v._zero_ml_hints()
s1, h1, _d1 = step(jax.tree.map(jnp.copy, states), dt,
                   jax.tree.map(jnp.copy, h0))
# s1/h1 are reused below: copy what the (donating) second step consumes
s2, h2, _d2 = step(jax.tree.map(jnp.copy, s1), dt,
                   jax.tree.map(jnp.copy, h1))
jax.block_until_ready(s2[0].u)


def build_mac_problem(states, umac_l):
    rho_l = [st.s[0:1] for st in states]
    from varden_tpu.amr.fill import pad_ml
    beta_l, rhs_l = [], []
    for l in range(nlev):
        rho_pad = pad_ml(geom, rho_l, sim.scal_comp(0), l, 1)
        rho_pad = rho_pad[0] if rho_pad.ndim > dm else rho_pad
        betas = []
        for d in range(dm):
            q = rho_pad
            for t in range(dm):
                if t != d:
                    ax = q.ndim - dm + t
                    sl = [slice(None)] * q.ndim
                    sl[ax] = slice(1, -1)
                    q = q[tuple(sl)]
            lo = [slice(None)] * q.ndim
            hi = [slice(None)] * q.ndim
            axis = q.ndim - dm + d
            lo[axis] = slice(0, -1)
            hi[axis] = slice(1, None)
            betas.append(2.0 / (q[tuple(hi)] + q[tuple(lo)]))
        beta_l.append(tuple(betas))
        rhs_l.append(-basic.mac_div(umac_l[l], geom.dx(l)))
    aco_l = [jnp.zeros(geom.specs[l].n, sim.dtype) for l in range(nlev)]
    return rhs_l, aco_l, beta_l


# representative umac: rerun the step's premac via the profiler helper
from varden_tpu import profiling  # noqa: E402  (reuse its premac logic inline)
from varden_tpu.amr.fill import pad_ml_multi
from varden_tpu.ops import godunov3d, pallas_godunov


@jax.jit
def get_umac(states):
    ng = sim.ng
    adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
    u_l = [st.u for st in states]
    umac_l = []
    for l in range(nlev):
        u_pad = pad_ml_multi(geom, u_l, list(range(dm)), l, ng)
        vf = basic.mkvelforce(cfg.ext_force, states[l].s, states[l].gp,
                              jnp.zeros_like(u_l[l]), cfg.visc_coef, 1.0,
                              cfg.boussinesq)
        vf_pad = pad_ml_multi(geom, [vf if i == l else jnp.zeros_like(u_l[i])
                                     for i in range(nlev)],
                              [sim.extrap_comp] * dm, l, ng)
        nl = geom.specs[l].n
        args = (u_pad, vf_pad, jnp.asarray(dt, sim.dtype), geom.dx(l),
                geom.phys_bc_level(l), adv_bc_vel, ng, nl, cfg.slope_order,
                cfg.use_minion)
        if pallas_godunov.tiles_supported(nl, sim.dtype, ng):
            umac_l.append(pallas_godunov.velpred_3d_fused(*args))
        else:
            umac_l.append(godunov3d.velpred_3d(*args))
    return advance_ml.edge_restrict_mac(geom, umac_l)


umac_l = get_umac(s1)
phi_warm = [jnp.asarray(p) for p in h1["phi_mac"]]

rhs_l, aco_l, beta_l = jax.jit(build_mac_problem)(s1, umac_l)
zeros = [jnp.zeros(geom.specs[l].n, sim.dtype) for l in range(nlev)]


def timed(fn, *args, reps=8):
    r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / reps, r


for label, p0 in (("cold", zeros), ("warm", phi_warm)):
    f = jax.jit(lambda rhs, aco, beta, p0: amr_solve.composite_cc_solve(
        geom, sim.press_comp, rhs, aco, beta, 0.0, phi0_l=p0,
        rel_eps=sim.eps(1.0e-10), return_info=True))
    t, (phis, (rn, iters, ratio)) = timed(f, rhs_l, aco_l, beta_l, p0)
    print(f"MAC {label}: {1e3 * t:.2f} ms  iters={int(iters)} "
          f"rn={float(rn):.3e} ratio={float(ratio):.2f}")

# forced outer counts with eps=0 (measures per-outer marginal cost)
prev = None
for k in (0, 1, 2, 4):
    f = jax.jit(functools.partial(
        lambda rhs, aco, beta, p0, _k: amr_solve.composite_cc_solve(
            geom, sim.press_comp, rhs, aco, beta, 0.0, phi0_l=p0,
            rel_eps=0.0, max_outer=_k, return_info=True), _k=k))
    t, (phis, (rn, iters, ratio)) = timed(f, rhs_l, aco_l, beta_l, phi_warm)
    dmsg = f"  (+{1e3 * (t - prev):.2f} ms/outer)" if prev is not None else ""
    print(f"max_outer={k}: {1e3 * t:.2f} ms  rn={float(rn):.3e}{dmsg}")
    prev = t

# ---- sub-piece timings: where does the ~2 ms/outer go?
from varden_tpu.solvers import mg  # noqa: E402
from varden_tpu.amr.solve import pad_phi  # noqa: E402

comp = sim.press_comp
ell0 = [tuple(sim.ell_bc[comp][d]) for d in range(dm)]
bv = [[0.0, 0.0]] * dm
hiers = [mg.build_hierarchy(list(geom.specs[l].n), list(geom.dx(l)),
                            [ell0, geom.ell_bc_level(1, comp)][l],
                            aco_l[l], list(beta_l[l]), 0.0)
         for l in range(nlev)]
print("hier levels:", [[lv.n for lv in h] for h in hiers])


@jax.jit
def one_vcycle_fine(phi, rhs):
    return mg.v_cycle(hiers[1], phi, rhs, bv)


@jax.jit
def one_vcycle_coarse(phi, rhs):
    return mg.v_cycle(hiers[0], phi, rhs, bv)


@jax.jit
def pads_only(phis):
    return [pad_phi(geom, l, phis, ell0, bv, ng=1) for l in range(nlev)]


@jax.jit
def resid_full(phis):
    pads = [pad_phi(geom, l, phis, ell0, bv, ng=1) for l in range(nlev)]
    res = [rhs_l[l] - mg.apply_padded(pads[l], aco_l[l], beta_l[l],
                                      0.0, geom.dx(l), dm)
           for l in range(nlev)]
    from varden_tpu.amr.solve import _reflux_correct, covered_slice_rel
    from varden_tpu.amr.hierarchy import restrict_cells
    for c in range(nlev - 1, 0, -1):
        p = geom.parent[c]
        res[p] = _reflux_correct(geom, c, res[p], pads[p], pads[c],
                                 beta_l[p], beta_l[c])
        cov = covered_slice_rel(geom, c)
        res[p] = res[p].at[cov].set(restrict_cells(res[c], dm))
    return res


z0 = jnp.zeros(geom.specs[0].n, sim.dtype)
z1 = jnp.zeros(geom.specs[1].n, sim.dtype)
t, _ = timed(one_vcycle_fine, z1, rhs_l[1], reps=20)
print(f"v_cycle fine (80^3, {len(hiers[1])} lv): {1e3 * t:.3f} ms")
t, _ = timed(one_vcycle_coarse, z0, rhs_l[0], reps=20)
print(f"v_cycle coarse (64^3, {len(hiers[0])} lv): {1e3 * t:.3f} ms")
t, _ = timed(pads_only, phi_warm, reps=20)
print(f"pad_phi both levels: {1e3 * t:.3f} ms")
t, _ = timed(resid_full, phi_warm, reps=20)
print(f"composite residuals(): {1e3 * t:.3f} ms")

# ---- in-program differencing: chain K reps inside ONE jit (the separately
# jitted timings above are swamped by ~1.5 ms/dispatch tunnel overhead)
import functools as _ft


def chain(fn, k):
    @jax.jit
    def run(x0, r):
        def body(i, x):
            y = fn(x, r)
            # data-dependence chain so XLA cannot collapse the loop
            return y
        return jax.lax.fori_loop(0, k, body, x0)
    return run


def diff_time(label, fn, x0, r, k1=2, k2=12):
    f1, f2 = chain(fn, k1), chain(fn, k2)
    t1, _ = timed(f1, x0, r, reps=8)
    t2, _ = timed(f2, x0, r, reps=8)
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{label}: {ms:.3f} ms (in-program)", flush=True)


diff_time("v_cycle fine 80^3", lambda x, r: mg.v_cycle(hiers[1], x, r, bv),
          z1, rhs_l[1])
diff_time("v_cycle coarse 64^3", lambda x, r: mg.v_cycle(hiers[0], x, r, bv),
          z0, rhs_l[0])


def pads_step(phis, _r):
    pads = [pad_phi(geom, l, list(phis), ell0, bv, ng=1) for l in range(nlev)]
    crop = [p[tuple([slice(1, -1)] * dm)] for p in pads]
    return tuple(crop)


diff_time("pad_phi both", lambda x, r: pads_step(x, r), tuple(phi_warm), None)


def resid_step(phis, _r):
    res = resid_full_impl(list(phis))
    return tuple(res)


def resid_full_impl(phis):
    pads = [pad_phi(geom, l, phis, ell0, bv, ng=1) for l in range(nlev)]
    res = [rhs_l[l] - mg.apply_padded(pads[l], aco_l[l], beta_l[l],
                                      0.0, geom.dx(l), dm)
           for l in range(nlev)]
    from varden_tpu.amr.solve import _reflux_correct, covered_slice_rel
    from varden_tpu.amr.hierarchy import restrict_cells
    for c in range(nlev - 1, 0, -1):
        p = geom.parent[c]
        res[p] = _reflux_correct(geom, c, res[p], pads[p], pads[c],
                                 beta_l[p], beta_l[c])
        cov = covered_slice_rel(geom, c)
        res[p] = res[p].at[cov].set(restrict_cells(res[c], dm))
    return res


diff_time("composite residuals", resid_step, tuple(phi_warm), None)

# GSRB sweeps alone at each MG level of the fine hierarchy
for li, lv in enumerate(hiers[1]):
    zz = jnp.zeros(lv.n, sim.dtype)
    diff_time(f"gsrb x2 at {lv.n}",
              _ft.partial(lambda lvv, x, r: mg.gsrb(lvv, x, r, bv, 2), lv),
              zz, zz, k1=2, k2=22)

# ---- cycle-strength variants (nv_fine, nv_coarse): outer count vs wall
for nvf, nvc in ((1, 1), (1, 2), (2, 1), (2, 2)):
    f = jax.jit(_ft.partial(
        lambda rhs, aco, beta, p0, _nf, _nc: amr_solve.composite_cc_solve(
            geom, sim.press_comp, rhs, aco, beta, 0.0, phi0_l=p0,
            rel_eps=sim.eps(1.0e-10), return_info=True,
            nv_fine=_nf, nv_coarse=_nc), _nf=nvf, _nc=nvc))
    t, (phis, (rn, iters, ratio)) = timed(f, rhs_l, aco_l, beta_l, zeros)
    print(f"nv=({nvf},{nvc}): {1e3 * t:.2f} ms  iters={int(iters)} "
          f"rn={float(rn):.3e}", flush=True)
