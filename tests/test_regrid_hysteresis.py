"""Regrid retrace bounding: slack + hysteresis keep the compiled-shape
space small (reference analogue: max_grid_size blocking quantization,
initialize.f90:200). An adaptive 2-D run with ~10 regrids must compile
only a few distinct ML steps."""
import pytest

from varden_tpu import projection
from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden


@pytest.mark.slow
def test_adaptive_run_compiles_few_ml_steps(tmp_path):
    cfg = VardenConfig(
        dim_in=2, prob_type=1, n_cellx=64, n_celly=64, max_levs=2,
        regrid_int=2, grav=-9.8, visc_coef=0.0, diff_coef=0.0,
        init_shrink=0.2, init_iter=1, max_step=21, plot_int=-1, chk_int=-1,
        dtype="float64", bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
        grids_file_name=str(tmp_path / "grdlog"))
    v = Varden(cfg)
    v.run()
    regular_geoms = {k[0] for k in v._ml_cache
                     if k[1] == projection.REGULAR_TIMESTEP}
    # ~10 regrids; hysteresis should keep the bubble inside the slack
    assert len(regular_geoms) <= 3, \
        f"{len(regular_geoms)} distinct ML-step geometries compiled"
    assert v._ml_compile_count <= 6


def test_geom_covers_logic():
    from varden_tpu.amr import regrid as rg
    from varden_tpu.amr.fill import MLGeom
    from varden_tpu.amr.hierarchy import LevelSpec, domain_spec
    from varden_tpu.state import Sim
    cfg = VardenConfig(dim_in=2, prob_type=1, n_cellx=64, n_celly=64,
                       max_levs=2, dtype="float64",
                       bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15)
    sim = Sim(cfg)
    cur = MLGeom(sim, [domain_spec((64, 64), 0),
                       LevelSpec((16, 16), (48, 48))], [-1, 0], [0, 1])
    root = domain_spec((64, 64), 0)
    # new patch nested inside the current fine patch, modest size: keep
    assert rg.geom_covers(cur, [root, LevelSpec((24, 24), (32, 32))],
                          [-1, 0], [0, 1], waste=2.5)
    # new patch escapes the current one: rebuild
    assert not rg.geom_covers(cur, [root, LevelSpec((8, 8), (32, 32))],
                              [-1, 0], [0, 1], waste=2.5)
    # current hierarchy far too large for the need: rebuild
    assert not rg.geom_covers(cur, [root, LevelSpec((24, 24), (16, 16))],
                              [-1, 0], [0, 1], waste=2.5)
    # feature vanished: rebuild
    assert not rg.geom_covers(cur, [root], [-1], [0], waste=2.5)
