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
    vort = basic.vorticity(u_pad, sim.dx, sim.ng, sim.n_cell,
                            phys_bc=sim.phys_bc)
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
    fields = plot_fields(sim, state)
    coarsen = 1
    if sim.cfg.coarsen_plot_data:
        # 2x cell-average restriction before writing (reference
        # coarsen_plot_data branch, varden.f90:548-573, nlevs=1 only)
        from ..amr.hierarchy import restrict_cells
        fields = np.asarray(restrict_cells(jnp.asarray(fields), sim.dm))
        coarsen = 2
    boxlib.write_plotfile(name, sim, fields, plot_field_names(sim), time,
                          coarsen=coarsen)
    return name


def _write_chk_header(name, time, dt, nlevs):
    """Reference Header: Fortran namelist + per-level ref ratios
    (checkpoint.f90:66-79)."""
    with open(os.path.join(name, "Header"), "w") as f:
        f.write("&CHKPOINT\n")
        f.write(" time = %.17g\n" % float(time))
        f.write(" dt = %.17g\n" % float(dt))
        f.write(f" nlevs = {nlevs}\n")
        f.write("/\n")
        for _ in range(nlevs - 1):
            f.write(" 2\n")


def _wrap_nodal(p: np.ndarray, pmask):
    """Duplicate the wrap node on periodic axes: our nodal arrays carry n
    nodes there, FBoxLib multifabs carry n+1 (the +1 point per nodalized
    axis); spatial axes are the trailing len(pmask)."""
    dm = len(pmask)
    for d, per in enumerate(pmask):
        ax = p.ndim - dm + d
        if per:
            p = np.concatenate([p, np.take(p, [0], axis=ax)], axis=ax)
    return p


def _unwrap_nodal(p: np.ndarray, pmask, n_cell):
    """Inverse of _wrap_nodal: drop the duplicated wrap node on periodic
    axes when present (reference-written checkpoints always have it)."""
    dm = len(pmask)
    for d, per in enumerate(pmask):
        ax = p.ndim - dm + d
        if per and p.shape[ax] == n_cell[d] + 1:
            p = np.take(p, range(n_cell[d]), axis=ax)
    return p


def _read_chk_header(name):
    import re
    with open(os.path.join(name, "Header")) as f:
        txt = f.read()
    time = float(re.search(r"time\s*=\s*([^\s,]+)", txt).group(1))
    dt = float(re.search(r"dt\s*=\s*([^\s,]+)", txt).group(1))
    nlevs = int(re.search(r"nlevs\s*=\s*(\d+)", txt).group(1))
    return time, dt, nlevs


def _istep_of(name):
    import re
    m = re.search(r"(\d+)$", name.rstrip("/"))
    return int(m.group(1)) if m else 0


def write_checkpoint(sim: Sim, state: State, istep: int, time: float,
                     dt: float, base: str = None, hints=None):
    """BoxLib-layout checkpoint dir (reference checkpoint.f90:14-83):
    Header namelist + State multifab ([u|s|gp], 2*dm+nscal comps) +
    Pressure nodal multifab; projection warm-start hints ride along in
    hints.npz (an extension file the reference doesn't have)."""
    from . import boxlib
    name = f"{base or sim.cfg.check_base_name}{istep:05d}"
    os.makedirs(name, exist_ok=True)
    chk = np.concatenate([np.asarray(state.u), np.asarray(state.s),
                          np.asarray(state.gp)])
    boxlib.write_multifab(os.path.join(name, "State", "Level_0"),
                          np.asarray(chk, np.float64))
    boxlib.write_multifab(os.path.join(name, "Pressure", "Level_0"),
                          _wrap_nodal(np.asarray(state.p, np.float64)[None],
                                      sim.pmask), nodal=True)
    if hints is not None:
        np.savez(os.path.join(name, "hints.npz"),
                 **{k: np.asarray(v) for k, v in hints.items()})
    _write_chk_header(name, time, dt, 1)
    write_job_info(name, sim)
    return name


def read_checkpoint(sim: Sim, name: str):
    """reference checkpoint_read (checkpoint.f90:85-145) + fill_restart_data."""
    from . import boxlib
    time, dt, _nlevs = _read_chk_header(name)
    chk, _lo, _ = boxlib.read_multifab(os.path.join(name, "State", "Level_0"))
    p, _plo, nodal = boxlib.read_multifab(
        os.path.join(name, "Pressure", "Level_0"))
    assert nodal, "Pressure multifab must be nodal"
    p = _unwrap_nodal(p, sim.pmask, chk.shape[1:])
    dm, nscal = sim.dm, sim.nscal
    dtype = sim.dtype
    state = State(u=jnp.asarray(chk[:dm], dtype),
                  s=jnp.asarray(chk[dm:dm + nscal], dtype),
                  gp=jnp.asarray(chk[dm + nscal:2 * dm + nscal], dtype),
                  p=jnp.asarray(p[0], dtype))
    header = {"time": time, "dt": dt, "nlevs": 1, "istep": _istep_of(name),
              "n_cell": list(chk.shape[1:]), "dim": dm}
    hints = None
    hp = os.path.join(name, "hints.npz")
    if os.path.exists(hp):
        data = np.load(hp)
        hints = {k: jnp.asarray(data[k], dtype) for k in data.files}
    return state, header, hints


def write_plotfile_ml(geom, states, istep: int, time: float,
                      base: str = None):
    """Multi-level BoxLib plotfile (reference varden.f90:492-592): one FAB
    per patch, patches grouped by depth into Level_d multifabs."""
    from . import boxlib
    from ..amr.fill import pad_ml_multi
    from ..ops import basic as _b
    sim = geom.sim
    name = f"{base or sim.cfg.plot_base_name}{istep:05d}"
    u_l = [st.u for st in states]
    node_arrays = []
    for l in range(geom.nlev):
        st = states[l]
        u_pad = pad_ml_multi(geom, u_l, list(range(sim.dm)), l, sim.ng)
        vort = _b.vorticity(u_pad, geom.dx(l), sim.ng, geom.specs[l].n,
                            phys_bc=geom.phys_bc_level(l))
        comps = [st.u[d] for d in range(sim.dm)]
        comps += [st.s[i] for i in range(sim.nscal)]
        comps += [_b.magvel(st.u), vort]
        comps += [st.gp[d] for d in range(sim.dm)]
        node_arrays.append(np.stack([np.asarray(c) for c in comps]))
    level_fields = [[(node_arrays[i], list(geom.specs[i].lo))
                     for i in geom.nodes_at(d)]
                    for d in range(1, geom.ndepth)]
    boxlib.write_plotfile(name, sim, node_arrays[0], plot_field_names(sim),
                          time, level_fields=level_fields)
    return name


def write_checkpoint_ml(geom, states, istep: int, time: float, dt: float,
                        base: str = None, hints=None):
    """Multi-level BoxLib-layout checkpoint: State/Pressure ml-multifab
    dirs with one Level_l subdir per level (reference checkpoint.f90:14-83
    via fabio_ml_multifab_write_d). ``hints`` (per-level projection warm
    starts) ride along in hints.npz so a restarted run reproduces the
    original bitwise (the reference's restart regression requires exact
    agreement, Util/regression_testing/VARDEN-tests.ini bubble-restart)."""
    from . import boxlib
    sim = geom.sim
    name = f"{base or sim.cfg.check_base_name}{istep:05d}"
    os.makedirs(name, exist_ok=True)
    for d in range(geom.ndepth):
        nodes = geom.nodes_at(d)
        st_boxes, p_boxes = [], []
        for i in nodes:
            st = states[i]
            lo = list(geom.specs[i].lo)
            chk = np.concatenate([np.asarray(st.u), np.asarray(st.s),
                                  np.asarray(st.gp)])
            st_boxes.append((np.asarray(chk, np.float64), lo))
            # a patch wraps only on axes it fully spans (side_kind 'per')
            pm_l = [geom.side_kind(i, t, 0) == "per" for t in range(sim.dm)]
            p_boxes.append((_wrap_nodal(np.asarray(st.p, np.float64)[None],
                                        pm_l), lo))
        boxlib.write_multifab_boxes(os.path.join(name, "State", f"Level_{d}"),
                                    st_boxes)
        boxlib.write_multifab_boxes(
            os.path.join(name, "Pressure", f"Level_{d}"), p_boxes,
            nodal=True)
    if hints is not None:
        payload = {}
        for l in range(geom.nlev):
            for k in hints:
                payload[f"{k}_{l}"] = np.asarray(hints[k][l])
        np.savez(os.path.join(name, "hints.npz"), **payload)
    _write_chk_header(name, time, dt, geom.ndepth)
    write_job_info(name, sim)
    return name


def read_checkpoint_ml(sim: Sim, name: str):
    """Rebuild the patch tree from the stored per-level boxarrays (the
    reference's fill_restart_data role, restart.f90:15-50): each box at
    depth d parents to the depth-(d-1) box containing it."""
    from . import boxlib
    from ..amr.fill import MLGeom
    from ..amr.hierarchy import LevelSpec
    time, dt, nlevs = _read_chk_header(name)
    dtype = sim.dtype
    dm, nscal = sim.dm, sim.nscal
    specs, parent, depth, states = [], [], [], []
    for d in range(nlevs):
        st_boxes, _ = boxlib.read_multifab_boxes(
            os.path.join(name, "State", f"Level_{d}"))
        p_boxes, nodal = boxlib.read_multifab_boxes(
            os.path.join(name, "Pressure", f"Level_{d}"))
        assert nodal
        for (chk, lo), (p, _plo) in zip(st_boxes, p_boxes):
            nl = chk.shape[1:]
            spec = LevelSpec(tuple(lo), tuple(nl))
            if d == 0:
                par = -1
            else:
                par = next(j for j in range(len(specs))
                           if depth[j] == d - 1 and all(
                               specs[j].lo[t] * 2 <= lo[t] and
                               lo[t] + nl[t] <= specs[j].hi[t] * 2
                               for t in range(dm)))
            dn = [sim.n_cell[t] * 2 ** d for t in range(dm)]
            pm_l = [sim.pmask[t] and lo[t] == 0 and lo[t] + nl[t] == dn[t]
                    for t in range(dm)]
            p = _unwrap_nodal(p, pm_l, nl)
            specs.append(spec)
            parent.append(par)
            depth.append(d)
            states.append(State(u=jnp.asarray(chk[:dm], dtype),
                                s=jnp.asarray(chk[dm:dm + nscal], dtype),
                                gp=jnp.asarray(chk[dm + nscal:], dtype),
                                p=jnp.asarray(p[0], dtype)))
    geom = MLGeom(sim, specs, parent, depth)
    header = {"time": time, "dt": dt, "nlevs": nlevs,
              "istep": _istep_of(name), "n_cell": list(sim.n_cell),
              "dim": dm, "specs": [[list(s.lo), list(s.n)] for s in specs]}
    hints = None
    hp = os.path.join(name, "hints.npz")
    if os.path.exists(hp):
        data = np.load(hp)
        hints = {"phi_mac": [jnp.asarray(data[f"phi_mac_{l}"], dtype)
                             for l in range(geom.nlev)],
                 "phi_hg": [jnp.asarray(data[f"phi_hg_{l}"], dtype)
                            for l in range(geom.nlev)]}
        # prevs (persisted for bitwise-identical warm-start extrapolation
        # after restart; older checkpoints fall back to prev = cur, which
        # disables the extrapolation for one step)
        for k in ("phi_mac", "phi_hg"):
            kp = f"{k}_prev"
            if f"{kp}_0" in data.files:
                hints[kp] = [jnp.asarray(data[f"{kp}_{l}"], dtype)
                             for l in range(geom.nlev)]
            else:
                hints[kp] = list(hints[k])
    return geom, states, header, hints


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
