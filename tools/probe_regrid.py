"""Break down cfg3 (2-D AMR regrid-every-4) step cost: plain composite
steps vs the regrid path (compute_tree host sync + build_level_data)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden
from varden_tpu.amr import regrid as regrid_mod
from varden_tpu.amr.fill import MLGeom

cfg = VardenConfig(
    dim_in=2, prob_type=1, n_cellx=64, n_celly=64, max_levs=2,
    regrid_int=4, grav=-9.8, visc_coef=1e-3, cflfac=0.9,
    init_shrink=0.1, init_iter=1, max_step=0, dtype="float32",
    bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15)
v = Varden(cfg)
v.bench_async = True
states = v.initialize_ml()
print("levels:", [s.n for s in v.geom.specs])

# warm all shapes through one full regrid episode
for _ in range(9):
    states = v.step_ml(states)
jax.block_until_ready(states[0].u)

# plain steps (no regrid): istep placed mid-cycle
v.istep = 9
t0 = time.perf_counter()
for _ in range(2):
    v.istep = 9  # keep off the regrid cadence
    states = v.step_ml(states)
jax.block_until_ready(states[0].u)
print(f"plain step: {(time.perf_counter() - t0) / 2 * 1e3:.2f} ms")

# regrid components
t0 = time.perf_counter()
specs, parent, depth = regrid_mod.compute_tree(v.sim, v.geom, states)
t_tree = time.perf_counter() - t0
new_geom = MLGeom(v.sim, specs, parent, depth)
t0 = time.perf_counter()
states2 = regrid_mod.build_level_data(v.sim, v.geom, states, new_geom)
jax.block_until_ready(states2[0].u)
t_build = time.perf_counter() - t0
print(f"compute_tree: {t_tree * 1e3:.2f} ms  build_level_data: "
      f"{t_build * 1e3:.2f} ms  same_key={new_geom.key() == v.geom.key()}")

# a full regrid step (istep hits cadence) incl. cold-hint solves after
v.istep = 8
t0 = time.perf_counter()
states = v.step_ml(states)
jax.block_until_ready(states[0].u)
print(f"regrid step: {(time.perf_counter() - t0) * 1e3:.2f} ms")
# the following step runs with warm hints again
t0 = time.perf_counter()
v.istep = 9
states = v.step_ml(states)
jax.block_until_ready(states[0].u)
print(f"post-regrid step: {(time.perf_counter() - t0) * 1e3:.2f} ms")
