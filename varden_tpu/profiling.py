"""Profiling / tracing.

TPU-native equivalent of the reference's bl_prof scoped timers and the
per-step phase "Timing summary" (advance_timestep.f90:150-166, main.f90:17-29):

  * ``scoped``/``report`` — host-side named timers with a bl_prof_res-style
    aggregate report (enable with profile=True on the driver, or use directly)
  * ``profile_phases`` — runs the four timestep phases as separately jitted,
    blocking calls and prints the reference's Scalar/Velocity/MAC/HG summary
  * ``trace`` — wraps jax.profiler tracing for TensorBoard-grade timelines
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

_records: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def scoped(name: str, block_on=None):
    """bl_prof_timer equivalent: `with profiling.scoped("macproject"): ...`"""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block_on is not None:
            jax.block_until_ready(block_on)
        _records[name].append(time.perf_counter() - t0)


def reset():
    _records.clear()


def report() -> str:
    """bl_prof_glean-style aggregate (main.f90:27-29)."""
    lines = ["%-28s %8s %12s %12s" % ("REGION", "COUNT", "TOTAL(s)", "MEAN(s)")]
    for name, ts in sorted(_records.items(), key=lambda kv: -sum(kv[1])):
        lines.append("%-28s %8d %12.6f %12.6f"
                     % (name, len(ts), sum(ts), sum(ts) / len(ts)))
    return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/varden_trace"):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_phases(sim, state, dt, n_rep: int = 3):
    """Per-phase wall times of one timestep, each phase separately jitted and
    blocked — the reference's per-step timing summary
    (advance_timestep.f90:150-166). Returns {phase: seconds}."""
    import jax.numpy as jnp
    from . import projection
    from .ops import basic, godunov, godunov3d

    cfg = sim.cfg
    dm, ng, n = sim.dm, sim.ng, sim.n_cell
    adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
    adv_bc_scal = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
    is_cons = [True] + [False] * (sim.nscal - 1)

    @jax.jit
    def premac(state, dt):
        lapu = jnp.zeros_like(state.u)
        vf = basic.mkvelforce(cfg.ext_force, state.s, state.gp, lapu,
                              cfg.visc_coef, 1.0, cfg.boussinesq)
        u_pad = sim.fill_vel(state.u)
        vf_pad = sim.fill_extrap(vf, ng)
        if dm == 2:
            return godunov.velpred_2d(u_pad, vf_pad, dt, sim.dx, sim.phys_bc,
                                      adv_bc_vel, ng, n, cfg.slope_order,
                                      cfg.use_minion)
        from .ops import pallas_godunov
        if pallas_godunov.tiles_supported(n, sim.dtype, ng):
            return pallas_godunov.velpred_3d_fused(
                u_pad, vf_pad, dt, sim.dx, sim.phys_bc, adv_bc_vel, ng, n,
                cfg.slope_order, cfg.use_minion)
        return godunov3d.velpred_3d(u_pad, vf_pad, dt, sim.dx, sim.phys_bc,
                                    adv_bc_vel, ng, n, cfg.slope_order,
                                    cfg.use_minion)

    @jax.jit
    def mac(state, umac):
        return projection.macproject(sim, umac, state.s[0])

    @jax.jit
    def scalar(state, umac, dt):
        from .advance import embed_faces
        laps = jnp.zeros_like(state.s)
        sf = basic.mkscalforce(jnp.zeros_like(state.s), laps, cfg.diff_coef, 1.0)
        s_pad = sim.fill_scal(state.s)
        sf_pad = sim.fill_extrap(sf, ng)
        mrhs = sim.fill_extrap(jnp.zeros(n, sim.dtype), ng)
        mp = embed_faces(sim, umac, ng)
        if dm == 2:
            ex, ey, fx, fy = godunov.mkflux_2d(
                s_pad, mp[0], mp[1], sf_pad, mrhs, dt, sim.dx, sim.phys_bc,
                adv_bc_scal, ng, n, False, is_cons, cfg.slope_order,
                cfg.use_minion)
            sedge, sflux = (ex, ey), (fx, fy)
        else:
            from .ops import pallas_godunov
            if pallas_godunov.tiles_supported(n, sim.dtype, ng):
                sedge, sflux = pallas_godunov.mkflux_3d_fused(
                    s_pad, mp, sf_pad, mrhs, dt, sim.dx, sim.phys_bc,
                    adv_bc_scal, ng, n, False, is_cons, cfg.slope_order,
                    cfg.use_minion)
            else:
                sedge, sflux = godunov3d.mkflux_3d(
                    s_pad, mp, sf_pad, mrhs, dt, sim.dx, sim.phys_bc,
                    adv_bc_scal, ng, n, False, is_cons, cfg.slope_order,
                    cfg.use_minion)
        sf2 = basic.mkscalforce(jnp.zeros_like(state.s), laps, cfg.diff_coef, 0.0)
        return basic.update(state.s, umac, sedge, sflux, sf2, dt, sim.dx, is_cons)

    @jax.jit
    def hg(state, snew, dt):
        rhohalf = basic.make_at_halftime(state.s[0], snew[0])
        return projection.hgproject(sim, projection.REGULAR_TIMESTEP,
                                    state.u, state.u, rhohalf, state.p,
                                    state.gp, dt)

    phases = {}
    umac = premac(state, dt)
    jax.block_until_ready(umac)
    umac2 = mac(state, umac)[0]
    jax.block_until_ready(umac2)
    snew = scalar(state, umac2, dt)
    jax.block_until_ready(snew)
    out = hg(state, snew, dt)
    jax.block_until_ready(out)

    def _force(r):
        # some experimental platforms do not block in block_until_ready;
        # a host scalar pull always does
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf))

    def timeit(fn, *args):
        _force(fn(*args))  # sync before timing
        t0 = time.perf_counter()
        for _ in range(n_rep):
            r = fn(*args)
        _force(r)
        return (time.perf_counter() - t0) / n_rep

    phases["Velocity update (premac)"] = timeit(premac, state, dt)
    phases["MAC Projection"] = timeit(mac, state, umac)
    phases["Scalar update"] = timeit(scalar, state, umac2, dt)
    phases["HG Projection"] = timeit(hg, state, snew, dt)

    print("Timing summary:")
    for k, v in phases.items():
        print(f"  {k}: {v:.6f} seconds")
    return phases


def profile_phases_ml(geom, states, dt, n_rep: int = 3):
    """Per-phase wall times of one MULTI-LEVEL timestep (Godunov predictor
    across all patches, composite MAC projection, scalar advance with flux
    sync, composite nodal projection) — the reference prints the same
    Scalar/Velocity/MAC/HG summary regardless of nlevs
    (advance_timestep.f90:150-166). Returns {phase: seconds}."""
    import jax.numpy as jnp
    from . import projection
    from .amr import advance_ml
    from .amr.fill import pad_ml_multi
    from .ops import basic, godunov, godunov3d, pallas_godunov

    sim = geom.sim
    cfg = sim.cfg
    dm, ng, nlev = geom.dm, sim.ng, geom.nlev
    adv_bc_vel = [sim.adv_bc[d] for d in range(dm)]
    vel_comps = list(range(dm))

    @jax.jit
    def premac(states, dt):
        u_l = [st.u for st in states]
        s_l = [st.s for st in states]
        gp_l = [st.gp for st in states]
        umac_l = []
        for l in range(nlev):
            u_pad = pad_ml_multi(geom, u_l, vel_comps, l, ng)
            vf = basic.mkvelforce(cfg.ext_force, s_l[l], gp_l[l],
                                  jnp.zeros_like(u_l[l]), cfg.visc_coef,
                                  1.0, cfg.boussinesq)
            vf_pad = pad_ml_multi(geom, [vf if i == l else
                                         jnp.zeros_like(u_l[i])
                                         for i in range(nlev)],
                                  [sim.extrap_comp] * dm, l, ng)
            pb = geom.phys_bc_level(l)
            nl = geom.specs[l].n
            if dm == 2:
                umac = godunov.velpred_2d(u_pad, vf_pad, dt, geom.dx(l), pb,
                                          adv_bc_vel, ng, nl,
                                          cfg.slope_order, cfg.use_minion)
            elif pallas_godunov.tiles_supported(nl, sim.dtype, ng):
                umac = pallas_godunov.velpred_3d_fused(
                    u_pad, vf_pad, dt, geom.dx(l), pb, adv_bc_vel, ng, nl,
                    cfg.slope_order, cfg.use_minion)
            else:
                umac = godunov3d.velpred_3d(
                    u_pad, vf_pad, dt, geom.dx(l), pb, adv_bc_vel, ng, nl,
                    cfg.slope_order, cfg.use_minion)
            umac_l.append(umac)
        return advance_ml.edge_restrict_mac(geom, umac_l)

    @jax.jit
    def mac(states, umac_l):
        return advance_ml.macproject_ml(geom, umac_l,
                                        [st.s for st in states])

    @jax.jit
    def hg(states, dt):
        rhohalf_l = [st.s[0] for st in states]
        return advance_ml.hgproject_ml(
            geom, projection.REGULAR_TIMESTEP, [st.u for st in states],
            [st.u for st in states], rhohalf_l, [st.p for st in states],
            [st.gp for st in states], dt)

    umac_l = premac(states, dt)
    jax.block_until_ready(umac_l)
    macd = mac(states, umac_l)
    jax.block_until_ready(macd[0])
    hgd = hg(states, dt)
    jax.block_until_ready(hgd[0])

    def _force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf))

    def timeit(fn, *args):
        _force(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n_rep):
            r = fn(*args)
        _force(r)
        return (time.perf_counter() - t0) / n_rep

    phases = {
        "Velocity update (premac, all levels)": timeit(premac, states, dt),
        "MAC Projection (composite)": timeit(mac, states, umac_l),
        "HG Projection (composite)": timeit(hg, states, dt),
    }
    print(f"Timing summary ({nlev} patches, {geom.ndepth} levels):")
    for k, v in phases.items():
        print(f"  {k}: {v:.6f} seconds")
    return phases
