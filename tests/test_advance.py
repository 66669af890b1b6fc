"""End-to-end timestep invariants (SURVEY.md §4: physics invariant logging
as asserted tests + example problems as integration tests)."""
import numpy as np
import pytest

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden


def _bubble_cfg(**kw):
    base = dict(dim_in=2, prob_type=1, n_cellx=32, n_celly=32, max_step=3,
                init_iter=1, grav=-9.8, bcx_lo=15, bcx_hi=15, bcy_lo=15,
                bcy_hi=15, cflfac=0.9, init_shrink=0.1)
    base.update(kw)
    return VardenConfig(**base)


def test_bubble2d_inviscid_invariants():
    v = Varden(_bubble_cfg())
    st = v.run()
    rho = np.asarray(st.s[0])
    # density bounds: [1, densfact=2] up to advection over/undershoot
    assert rho.min() > 1.0 - 1e-10
    assert rho.max() < 2.0 + 1e-10
    # div(umac) after MAC projection ~ solver eps (macproject.f90:209-221)
    assert float(v.last_diag["div_after"]) < 1e-9
    # bubble drop is symmetric about the x midplane
    assert np.max(np.abs(rho - rho[::-1, :])) < 1e-10
    # tracer mirrors density for prob_type 1 at t=0 and advects identically
    assert np.isfinite(float(v.last_diag["umax"]))


def test_bubble2d_viscous_runs():
    v = Varden(_bubble_cfg(visc_coef=1e-3, diff_coef=1e-3, max_step=2))
    st = v.run()
    assert np.isfinite(np.asarray(st.u)).all()
    assert float(v.last_diag["div_after"]) < 1e-9
    rho = np.asarray(st.s[0])
    assert rho.min() > 1.0 - 1e-10 and rho.max() < 2.0 + 1e-10


def test_bubble2d_backward_euler():
    v = Varden(_bubble_cfg(visc_coef=1e-3, diffusion_type=2, max_step=2))
    st = v.run()
    assert np.isfinite(np.asarray(st.u)).all()


def test_advect2d_inlet_outlet():
    cfg = VardenConfig(dim_in=2, prob_type=2, n_cellx=32, n_celly=32,
                       max_step=3, init_iter=1, bcx_lo=11, bcx_hi=12,
                       bcy_lo=14, bcy_hi=14, cflfac=0.5, init_shrink=0.5,
                       u_bc=((1.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
                       rho_bc=((1.0, 0.0), (0.0, 0.0), (0.0, 0.0)))
    v = Varden(cfg)
    st = v.run()
    rho = np.asarray(st.s[0])
    assert rho.min() > 1.0 - 1e-8
    assert rho.max() < 2.0 + 1e-8
    assert float(v.last_diag["div_after"]) < 1e-9
    # mean x-velocity should stay near the inflow value
    assert abs(np.asarray(st.u[0]).mean() - 1.0) < 0.2


def test_rt2d_periodic_x():
    cfg = VardenConfig(dim_in=2, prob_type=3, n_cellx=32, n_celly=32,
                       max_step=3, init_iter=1, grav=-9.8, bcx_lo=-1,
                       bcx_hi=-1, bcy_lo=15, bcy_hi=15, cflfac=0.9,
                       init_shrink=0.1)
    v = Varden(cfg)
    st = v.run()
    rho = np.asarray(st.s[0])
    assert rho.min() > 1.0 - 1e-8 and rho.max() < 2.0 + 1e-8
    assert float(v.last_diag["div_after"]) < 1e-9


def test_checkpoint_restart_bitwise(tmp_path, monkeypatch):
    """Reference bubble-restart semantics: run N steps, restart from a mid
    checkpoint, final states agree (VARDEN-tests.ini [bubble-restart])."""
    monkeypatch.chdir(tmp_path)
    cfg = _bubble_cfg(max_step=4, chk_int=2)
    v1 = Varden(cfg)
    st_full = v1.run()

    cfg2 = _bubble_cfg(max_step=4, chk_int=2, restart=2)
    v2 = Varden(cfg2)
    st_re = v2.run()
    for name in ("u", "s", "gp", "p"):
        a, b = np.asarray(getattr(st_full, name)), np.asarray(getattr(st_re, name))
        assert np.array_equal(a, b), f"{name} mismatch after restart"
