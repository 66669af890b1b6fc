"""3-D end-to-end coverage (vortex tube + 3-D bubble, small grids)."""
import numpy as np

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden


def test_vortextube_3d():
    cfg = VardenConfig(dim_in=3, prob_type=4, n_cellx=16, n_celly=16,
                       n_cellz=16, max_step=2, init_iter=1,
                       bcx_lo=-1, bcx_hi=-1, bcy_lo=-1, bcy_hi=-1,
                       bcz_lo=-1, bcz_hi=-1, cflfac=0.5, init_shrink=0.5)
    v = Varden(cfg)
    st = v.run()
    assert np.isfinite(np.asarray(st.u)).all()
    assert float(v.last_diag["div_after"]) < 1e-9
    rho = np.asarray(st.s[0])
    assert abs(rho.mean() - 1.0) < 1e-12  # conservative, uniform density


def test_bubble_3d_viscous():
    cfg = VardenConfig(dim_in=3, prob_type=1, n_cellx=16, n_celly=16,
                       n_cellz=16, max_step=2, init_iter=1, grav=-9.8,
                       visc_coef=1e-3, bcx_lo=15, bcx_hi=15, bcy_lo=15,
                       bcy_hi=15, bcz_lo=15, bcz_hi=15, cflfac=0.9,
                       init_shrink=0.1)
    v = Varden(cfg)
    st = v.run()
    rho = np.asarray(st.s[0])
    assert rho.min() > 1.0 - 1e-10
    assert rho.max() < 10.0 + 1e-9  # 3-D densfact = 10 (initdata.f90:220)
    assert float(v.last_diag["div_after"]) < 1e-9
    # x/y symmetry of the drop
    assert np.max(np.abs(rho - rho[::-1, :, :])) < 1e-10
    assert np.max(np.abs(rho - rho.transpose(1, 0, 2))) < 1e-10
