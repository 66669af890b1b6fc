"""Phase profile of the AMR bench config (64^3 + 1 level, f32) on the
attached device: whole composite step (differenced) + ML phase splits."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden
from varden_tpu import profiling

n = int(os.environ.get("BENCH_N", "64"))
cfg = VardenConfig(
    dim_in=3, prob_type=1, n_cellx=n, n_celly=n, n_cellz=n,
    max_levs=2, regrid_int=-1, bcx_lo=15, bcx_hi=15, bcy_lo=15,
    bcy_hi=15, bcz_lo=15, bcz_hi=15, grav=-9.8, visc_coef=1e-3,
    cflfac=0.5, init_shrink=0.5, max_step=0, init_iter=0, dtype="float32")
v = Varden(cfg)
states = v.initialize_ml()
print("tree:", [(v.geom.depth[i], v.geom.specs[i].n)
                for i in range(v.geom.nlev)])
step = v._ml_step_fn(4)
dt = 5e-4
hints0 = v._ml_hints if v._ml_hints is not None else v._zero_ml_hints()


def run(k):
    s = jax.tree.map(jnp.copy, states)   # step donates its inputs
    h = jax.tree.map(jnp.copy, hints0)
    t0 = time.perf_counter()
    for _ in range(k):
        s, h, _diag = step(s, dt, h)
    _ = float(jnp.sum(s[0].u))
    return time.perf_counter() - t0


run(1)
t1 = min(run(1) for _ in range(2))
t2 = min(run(5) for _ in range(2))
per_step = (t2 - t1) / 4
import numpy as np
fine = int(np.prod(v.geom.specs[1].n))
cells = n ** 3 + fine - fine // 8
print(f"WHOLE ML STEP: {1e3 * per_step:.2f} ms -> "
      f"{cells / per_step / 1e6:.1f} Mcells/s (composite cells {cells})")

profiling.profile_phases_ml(v.geom, states, jnp.asarray(dt, v.sim.dtype),
                            n_rep=5)
