"""AOT memory probe for the cfg5 (3-D N^3 + 2 AMR levels) composite step.

Builds the same adaptive hierarchy bench.py's cfg5 would (on the CPU
backend — eager dispatch through the TPU tunnel costs ~0.4 s/op), lowers
the jitted ML step for the attached TPU from ShapeDtypeStructs (no device
arrays needed), and prints the compiler's memory analysis WITHOUT running.

Usage:  python tools/memprobe_cfg5.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim, State
from varden_tpu.amr import regrid as regrid_mod
from varden_tpu.solvers import nodal

cfg = VardenConfig(
    dim_in=3, prob_type=1, n_cellx=N, n_celly=N, n_cellz=N, max_levs=3,
    regrid_int=-1, grav=-9.8, visc_coef=1e-3, cflfac=0.5, init_shrink=0.5,
    init_iter=0, max_step=0, dtype="float32",
    bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15, bcz_lo=15, bcz_hi=15)
sim = Sim(cfg)

if os.environ.get("MEMPROBE_FIXED_TREE", ""):
    # skip the ~15-min eager CPU hierarchy init: cfg5's adaptive tree is
    # deterministic (verified by a prior run of this tool)
    from varden_tpu.amr.fill import MLGeom
    from varden_tpu.amr.hierarchy import LevelSpec
    assert N == 256, "fixed tree recorded for N=256 only"
    geom = MLGeom(sim, [
        LevelSpec(lo=(0, 0, 0), n=(256, 256, 256)),
        LevelSpec(lo=(136, 136, 136), n=(240, 240, 240)),
        LevelSpec(lo=(320, 320, 320), n=(384, 384, 384))],
        parent=[-1, 0, 1], depth=[0, 1, 2])
else:
    with jax.default_device(jax.devices("cpu")[0]):
        geom, _states = regrid_mod.initialize_adaptive(sim)
print("tree:", [(geom.depth[i], geom.specs[i].lo, geom.specs[i].n)
                for i in range(geom.nlev)], flush=True)
tot = sum(int(jnp.prod(jnp.asarray(s.n))) for s in geom.specs)
print(f"cells: {tot:,}", flush=True)

from varden_tpu.driver import Varden
v = Varden(cfg)
v.geom = geom
step = v._ml_step_fn(4)

sds = jax.ShapeDtypeStruct
dt_s = sds((), jnp.float32)
states_s = []
pm = [[geom.side_kind(l, d, 0) == "per" for d in range(sim.dm)]
      for l in range(geom.nlev)]
for l in range(geom.nlev):
    n = geom.specs[l].n
    states_s.append(State(
        u=sds((sim.dm,) + n, jnp.float32),
        s=sds((sim.nscal,) + n, jnp.float32),
        gp=sds((sim.dm,) + n, jnp.float32),
        p=sds(nodal.node_shape(n, pm[l]), jnp.float32)))
z_mac = [sds(geom.specs[l].n, jnp.float32) for l in range(geom.nlev)]
z_hg = [sds(nodal.node_shape(geom.specs[l].n, pm[l]), jnp.float32)
        for l in range(geom.nlev)]
hints_s = {"phi_mac": z_mac, "phi_hg": z_hg}
if v._hints_have_prev():  # large hierarchies drop the extrapolation pair
    hints_s["phi_mac_prev"] = z_mac
    hints_s["phi_hg_prev"] = z_hg

lowered = step.lower(states_s, dt_s, hints_s)
print("lowered; compiling ...", flush=True)
compiled = lowered.compile()
ma = compiled.memory_analysis()
GB = 1 << 30
print(f"argument size:  {ma.argument_size_in_bytes / GB:.2f} GiB")
print(f"output size:    {ma.output_size_in_bytes / GB:.2f} GiB")
print(f"temp size:      {ma.temp_size_in_bytes / GB:.2f} GiB")
print(f"alias size:     {ma.alias_size_in_bytes / GB:.2f} GiB")
peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
        + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
print(f"args+out+temp-alias: {peak / GB:.2f} GiB  (chip HBM: 15.75 GiB)")
