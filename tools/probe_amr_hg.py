"""Probe the composite nodal (HG) solve at the AMR bench geometry:
outer-cycle counts and per-outer cost (VERDICT r3 item 3, HG half)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden
from varden_tpu.amr import solve as amr_solve

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
s1, h1, _diag1 = step(jax.tree.map(jnp.copy, states), dt,
                      jax.tree.map(jnp.copy, h0))
jax.block_until_ready(s1[0].u)

sigma_l = [1.0 / st.s[0] for st in states]
vel_l = [st.u for st in s1]
phi_warm = [jnp.asarray(p) for p in h1["phi_hg"]]
zeros = [jnp.zeros_like(p) for p in phi_warm]


def timed(fn, *args, reps=8):
    r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / reps, r


for label, p0 in (("cold", None), ("warm", phi_warm)):
    f = jax.jit(functools.partial(
        lambda sig, vel, p0: amr_solve.composite_nodal_solve(
            geom, sig, vel, phi0_l=p0, rel_eps=sim.eps(1.0e-10),
            return_info=True), p0=p0))
    t, (phis, (rn, iters, ratio)) = timed(f, sigma_l, vel_l)
    print(f"HG {label}: {1e3 * t:.2f} ms  iters={int(iters)} "
          f"rn={float(rn):.3e} ratio={float(ratio):.2f}", flush=True)

prev = None
for k in (0, 1, 2, 4):
    f = jax.jit(functools.partial(
        lambda sig, vel, _k: amr_solve.composite_nodal_solve(
            geom, sig, vel, rel_eps=0.0, max_outer=_k,
            return_info=True), _k=k))
    t, (phis, (rn, iters, ratio)) = timed(f, sigma_l, vel_l)
    dmsg = f"  (+{1e3 * (t - prev):.2f} ms/outer)" if prev is not None else ""
    print(f"max_outer={k}: {1e3 * t:.2f} ms  rn={float(rn):.3e}{dmsg}",
          flush=True)
    prev = t
