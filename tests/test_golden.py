"""Frozen golden values (SURVEY.md §4 item 1 stand-in).

No Fortran toolchain exists in this image, so plotfile diffs against the
reference are impossible; instead f64 runs of the five BASELINE-config
families are frozen as field norms. Any numerics change that alters the
solution shows up as a golden drift — the role the reference's stored
benchmark plotfiles play in its regression harness
(Util/regression_testing/VARDEN-tests.ini).

Regenerate after an INTENTIONAL numerics change with:
    JAX_PLATFORMS=cpu python tests/test_golden.py regen
"""
import json
import os

import numpy as np
import pytest

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden

GOLDEN = os.path.join(os.path.dirname(__file__), "golden.json")

CASES = {
    "bubble-2d-ml2": dict(dim_in=2, prob_type=1, n_cellx=32, n_celly=32,
                          max_levs=2, regrid_int=2, max_step=3, init_iter=1,
                          grav=-9.8, visc_coef=1e-3, bcx_lo=15, bcx_hi=15,
                          bcy_lo=15, bcy_hi=15, cflfac=0.9, init_shrink=0.1),
    # a DEEP hierarchy pinned end-to-end (solver-convergence tests alone
    # would miss slow drift that only manifests at depth)
    "bubble-2d-ml4": dict(dim_in=2, prob_type=1, n_cellx=32, n_celly=32,
                          max_levs=4, regrid_int=2, max_step=4, init_iter=1,
                          grav=-9.8, visc_coef=1e-3, bcx_lo=15, bcx_hi=15,
                          bcy_lo=15, bcy_hi=15, cflfac=0.9, init_shrink=0.1),
    "bubble-3d": dict(dim_in=3, prob_type=1, n_cellx=16, n_celly=16,
                      n_cellz=16, max_levs=1, max_step=2, init_iter=1,
                      grav=-9.8, visc_coef=1e-3, bcx_lo=15, bcx_hi=15,
                      bcy_lo=15, bcy_hi=15, bcz_lo=15, bcz_hi=15,
                      cflfac=0.9, init_shrink=0.1),
    "advect-2d": dict(dim_in=2, prob_type=2, n_cellx=32, n_celly=32,
                      max_levs=1, max_step=3, init_iter=1, cflfac=0.5,
                      init_shrink=0.5, bcx_lo=11, bcx_hi=12, bcy_lo=14,
                      bcy_hi=14, u_bc=((1.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
                      rho_bc=((1.0, 0.0), (0.0, 0.0), (0.0, 0.0))),
    "rt-2d": dict(dim_in=2, prob_type=3, n_cellx=32, n_celly=32,
                  max_levs=1, max_step=3, init_iter=1, grav=-9.8,
                  cflfac=0.9, init_shrink=0.1, bcx_lo=-1, bcx_hi=-1,
                  bcy_lo=15, bcy_hi=15),
    "vortex-3d": dict(dim_in=3, prob_type=4, n_cellx=16, n_celly=16,
                      n_cellz=16, max_levs=1, max_step=2, init_iter=1,
                      cflfac=0.5, init_shrink=0.5, bcx_lo=-1, bcx_hi=-1,
                      bcy_lo=-1, bcy_hi=-1, bcz_lo=-1, bcz_hi=-1),
}


def _run_case(name):
    cfg = VardenConfig(**CASES[name])
    v = Varden(cfg)
    sts = v.run()
    levels = sts if isinstance(sts, list) else [sts]
    out = {"time": float(v.time), "dt": float(v.dt)}
    for l, st in enumerate(levels):
        for f in ("u", "s", "gp", "p"):
            a = np.asarray(getattr(st, f), np.float64)
            out[f"l{l}.{f}.l2"] = float(np.sqrt((a * a).mean()))
            out[f"l{l}.{f}.linf"] = float(np.abs(a).max())
            out[f"l{l}.{f}.sum"] = float(a.sum())
    return out


def _load():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    if not os.path.exists(GOLDEN):
        pytest.skip("golden.json not generated yet")
    gold = _load()
    if name not in gold:
        pytest.skip(f"no golden entry for {name}")
    got = _run_case(name)
    for k, v in gold[name].items():
        g = got[k]
        # f64 end-to-end; tolerate op-reordering across XLA versions/hosts
        tol = 1e-9 * max(abs(v), 1e-30)
        if k.endswith(".sum"):
            # sums of near-cancelling fields (e.g. pressure) are pure
            # accumulated roundoff; cross-host XLA reassociation moves them
            # by O(1e-8 * linf), so pin them at 1e-6 * field linf instead
            tol = max(tol, 1e-6 * gold[name].get(k[:-4] + ".linf", 0.0))
        assert abs(g - v) <= tol, \
            f"{name}:{k} drifted: golden {v!r} vs {g!r} (tol {tol:.3e})"


if __name__ == "__main__":
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # match conftest
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        out = {}
        for name in sorted(CASES):
            print(f"running {name} ...")
            out[name] = _run_case(name)
        with open(GOLDEN, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN}")
