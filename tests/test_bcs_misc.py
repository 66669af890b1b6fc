"""Coverage for less-exercised configuration paths: SYMMETRY BCs, boussinesq
forcing, namelist-driven runs of the shipped inputs files."""
import numpy as np
import jax.numpy as jnp

from varden_tpu.config import VardenConfig, load_config
from varden_tpu.driver import Varden


def test_symmetry_bc_runs():
    cfg = VardenConfig(dim_in=2, prob_type=1, n_cellx=32, n_celly=32,
                       max_step=2, init_iter=1, grav=-9.8,
                       bcx_lo=13, bcx_hi=13, bcy_lo=15, bcy_hi=15,
                       cflfac=0.9, init_shrink=0.1)
    v = Varden(cfg)
    st = v.run()
    rho = np.asarray(st.s[0])
    assert np.isfinite(np.asarray(st.u)).all()
    assert rho.min() > 1.0 - 1e-8 and rho.max() < 2.0 + 1e-8
    assert float(v.last_diag["div_after"]) < 1e-9


def test_boussinesq_forcing():
    # boussinesq=1: buoyancy force = tracer * ext_force (mkforce.f90:98-110)
    cfg = VardenConfig(dim_in=2, prob_type=1, n_cellx=32, n_celly=32,
                       max_step=2, init_iter=1, grav=-9.8, boussinesq=1,
                       bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                       cflfac=0.9, init_shrink=0.1)
    v = Varden(cfg)
    st = v.run()
    assert np.isfinite(np.asarray(st.u)).all()
    # with the tracer-weighted force the blob should start sinking
    assert float(jnp.max(jnp.abs(st.u))) > 0.0


def test_inputs_files_parse():
    for name in ("inputs_bubble_2d", "inputs_bubble_3d", "inputs_advect_2d",
                 "inputs_RayleighTaylor_2d", "inputs_vortextube_3d"):
        cfg = load_config(f"inputs/{name}")
        assert cfg.max_step > 0
    cfg = load_config("inputs/inputs_advect_2d")
    assert cfg.bcx_lo == 11 and cfg.bcx_hi == 12
    assert cfg.u_bc[0][0] == 1.0


def test_namelist_run_short():
    cfg = load_config("inputs/inputs_bubble_2d", max_step=1, max_levs=1,
                      n_cellx=32, n_celly=32, plot_int=0, verbose=0)
    v = Varden(cfg)
    st = v.run()
    assert np.isfinite(np.asarray(st.u)).all()
