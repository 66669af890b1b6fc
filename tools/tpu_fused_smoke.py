"""Real-TPU smoke: the fused mkflux+update kernel path vs the windowed
path on the attached chip (Mosaic lowering check; interpret-mode tests
cover the math, this covers the real compiler).

Usage: python tools/tpu_fused_smoke.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim
from varden_tpu import advance, problems, projection

cfg = VardenConfig(
    dim_in=3, prob_type=1, n_cellx=N, n_celly=N, n_cellz=N, grav=-9.8,
    visc_coef=1e-3, dtype="float32",
    bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15, bcz_lo=15, bcz_hi=15)
sim = Sim(cfg)
state = problems.initdata(sim)
dt = jnp.asarray(5e-4, sim.dtype)


@jax.jit
def step(state, dt):
    new_state, diag = advance.advance_timestep(
        sim, state, dt, projection.REGULAR_TIMESTEP)
    return new_state, diag["div_after"]

out, div = step(state, dt)
jax.block_until_ready(out.u)
print("fused path ok; div_after =", float(div))

os.environ["VARDEN_NO_PALLAS_GODUNOV"] = "1"
import importlib
from varden_tpu.ops import pallas_godunov
assert not pallas_godunov.tiles_supported(sim.n_cell, sim.dtype, sim.ng)


@jax.jit
def step_ref(state, dt):
    new_state, diag = advance.advance_timestep(
        sim, state, dt, projection.REGULAR_TIMESTEP)
    return new_state, diag["div_after"]

ref, div_r = step_ref(state, dt)
jax.block_until_ready(ref.u)
for name in ("u", "s", "gp", "p"):
    a, b = getattr(out, name), getattr(ref, name)
    err = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(b))) + 1e-30
    print(f"{name}: max|fused-windowed| = {err:.3e}  (scale {scale:.3e})")
    assert err <= 1e-5 * scale, f"{name} mismatch"
print("PASS: fused == windowed on TPU at N =", N)
