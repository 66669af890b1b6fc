"""Plotfile / checkpoint output.

The reference writes BoxLib-format plotfiles and checkpoint dirs
(src/checkpoint.f90:14-145, varden.f90:492-620). Here both are provided:
  * write_plotfile / write_checkpoint — native .npz containers (fast path)
  * the BoxLib-compatible plotfile writer lives in io/boxlib.py (text Header
    + Level_0 FAB data) so outputs can be diffed against the Fortran code.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ..ops import basic
from ..state import Sim, State


def plot_field_names(sim: Sim):
    """reference varden.f90:76-87"""
    dm, nscal = sim.dm, sim.nscal
    names = ["x_vel", "y_vel"] + (["z_vel"] if dm > 2 else [])
    names += ["density"] + (["tracer"] if nscal > 1 else [])
    names += ["magvel", "vort"]
    names += ["gpx", "gpy"] + (["gpz"] if dm > 2 else [])
    return names


def plot_fields(sim: Sim, state: State) -> np.ndarray:
    """(nfields, *n) array of plot variables, matching the reference's
    plotfile component order."""
    u_pad = sim.fill_vel(state.u)
    vort = basic.vorticity(u_pad, sim.dx, sim.ng, sim.n_cell)
    mag = basic.magvel(state.u)
    comps = [state.u[d] for d in range(sim.dm)]
    comps += [state.s[i] for i in range(sim.nscal)]
    comps += [mag, vort]
    comps += [state.gp[d] for d in range(sim.dm)]
    return np.stack([np.asarray(c) for c in comps])


def write_plotfile(sim: Sim, state: State, istep: int, time: float, dt: float,
                   base: str = None):
    from . import boxlib
    name = f"{base or sim.cfg.plot_base_name}{istep:05d}"
    boxlib.write_plotfile(name, sim, plot_fields(sim, state),
                          plot_field_names(sim), time)
    return name


def write_checkpoint(sim: Sim, state: State, istep: int, time: float,
                     dt: float, base: str = None, hints=None):
    """Checkpoint contents mirror reference checkpoint.f90:36-79:
    cell state [u|s|gp] + nodal p + scalar header (+ projection warm-start
    hints so restarts resume bitwise)."""
    name = f"{base or sim.cfg.check_base_name}{istep:05d}"
    os.makedirs(name, exist_ok=True)
    extra = {} if hints is None else {
        "phi_mac": np.asarray(hints["phi_mac"]),
        "phi_hg": np.asarray(hints["phi_hg"])}
    np.savez(os.path.join(name, "state.npz"),
             u=np.asarray(state.u), s=np.asarray(state.s),
             gp=np.asarray(state.gp), p=np.asarray(state.p), **extra)
    header = {"time": time, "dt": dt, "nlevs": 1, "istep": istep,
              "n_cell": list(sim.n_cell), "dim": sim.dm}
    with open(os.path.join(name, "Header.json"), "w") as f:
        json.dump(header, f)
    write_job_info(name, sim)
    return name


def read_checkpoint(sim: Sim, name: str):
    """reference checkpoint_read (checkpoint.f90:85-145) + fill_restart_data."""
    data = np.load(os.path.join(name, "state.npz"))
    with open(os.path.join(name, "Header.json")) as f:
        header = json.load(f)
    dtype = sim.dtype
    state = State(u=jnp.asarray(data["u"], dtype),
                  s=jnp.asarray(data["s"], dtype),
                  gp=jnp.asarray(data["gp"], dtype),
                  p=jnp.asarray(data["p"], dtype))
    hints = None
    if "phi_mac" in data:
        hints = {"phi_mac": jnp.asarray(data["phi_mac"], dtype),
                 "phi_hg": jnp.asarray(data["phi_hg"], dtype)}
    return state, header, hints


def write_plotfile_ml(geom, states, istep: int, time: float,
                      base: str = None):
    """Multi-level BoxLib plotfile (reference varden.f90:492-592)."""
    from . import boxlib
    from ..amr.fill import pad_ml_multi
    from ..ops import basic as _b
    sim = geom.sim
    name = f"{base or sim.cfg.plot_base_name}{istep:05d}"
    u_l = [st.u for st in states]
    level_arrays = []
    for l in range(geom.nlev):
        st = states[l]
        u_pad = pad_ml_multi(geom, u_l, list(range(sim.dm)), l, sim.ng)
        vort = _b.vorticity(u_pad, geom.dx(l), sim.ng, geom.specs[l].n)
        comps = [st.u[d] for d in range(sim.dm)]
        comps += [st.s[i] for i in range(sim.nscal)]
        comps += [_b.magvel(st.u), vort]
        comps += [st.gp[d] for d in range(sim.dm)]
        level_arrays.append(np.stack([np.asarray(c) for c in comps]))
    boxlib.write_plotfile(name, sim, level_arrays[0], plot_field_names(sim),
                          time, level_fields=level_arrays[1:],
                          level_los=[list(geom.specs[l].lo)
                                     for l in range(1, geom.nlev)])
    return name


def write_checkpoint_ml(geom, states, istep: int, time: float, dt: float,
                        base: str = None):
    """Multi-level checkpoint: per-level State + specs in the header
    (reference checkpoint.f90:14-83)."""
    sim = geom.sim
    name = f"{base or sim.cfg.check_base_name}{istep:05d}"
    os.makedirs(name, exist_ok=True)
    for l, st in enumerate(states):
        np.savez(os.path.join(name, f"state_l{l}.npz"),
                 u=np.asarray(st.u), s=np.asarray(st.s),
                 gp=np.asarray(st.gp), p=np.asarray(st.p))
    header = {"time": time, "dt": dt, "nlevs": geom.nlev, "istep": istep,
              "n_cell": list(sim.n_cell), "dim": sim.dm,
              "specs": [[list(s.lo), list(s.n)] for s in geom.specs]}
    with open(os.path.join(name, "Header.json"), "w") as f:
        json.dump(header, f)
    write_job_info(name, sim)
    return name


def read_checkpoint_ml(sim: Sim, name: str):
    from ..amr.fill import MLGeom
    from ..amr.hierarchy import LevelSpec
    with open(os.path.join(name, "Header.json")) as f:
        header = json.load(f)
    specs = [LevelSpec(tuple(lo), tuple(n)) for lo, n in header["specs"]]
    geom = MLGeom(sim, specs)
    states = []
    dtype = sim.dtype
    for l in range(header["nlevs"]):
        data = np.load(os.path.join(name, f"state_l{l}.npz"))
        states.append(State(u=jnp.asarray(data["u"], dtype),
                            s=jnp.asarray(data["s"], dtype),
                            gp=jnp.asarray(data["gp"], dtype),
                            p=jnp.asarray(data["p"], dtype)))
    return geom, states, header


def write_job_info(dirname: str, sim: Sim):
    """Provenance dump (reference write_job_info.f90:54-144)."""
    import dataclasses
    import subprocess
    info = {"params": dataclasses.asdict(sim.cfg)}
    try:
        info["git"] = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        ).stdout.strip()
    except Exception:
        info["git"] = "unknown"
    import jax
    info["devices"] = [str(d) for d in jax.devices()]
    with open(os.path.join(dirname, "job_info"), "w") as f:
        json.dump(info, f, indent=1)
