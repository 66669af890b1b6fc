"""Unit tests: namelist parsing details, BC table semantics, fixed-grids
parser, grids log."""
import numpy as np

from varden_tpu import bc as bc_mod
from varden_tpu.config import VardenConfig, load_config


def test_namelist_fortran_literals():
    text = """
&PROBIN
 dim_in = 2
 grav = -9.8d0
 init_shrink = 0.1
 max_step = 10
 use_minion = .true.
 plot_base_name = "plot"
 u_bc(1,1) = 1.5d0
/
"""
    cfg = load_config(text, is_text=True)
    assert cfg.grav == -9.8
    assert cfg.init_shrink == 0.1
    assert cfg.max_step == 10
    assert cfg.use_minion is True
    assert cfg.plot_base_name == "plot"
    assert cfg.u_bc[0][0] == 1.5


def test_adv_bc_table_semantics():
    """define_bc_tower.f90:158-252 mappings."""
    cfg = VardenConfig(dim_in=2, bcx_lo=14, bcx_hi=15, bcy_lo=11, bcy_hi=12)
    t = bc_mod.adv_bc_table(cfg)
    # SLIP_WALL x-lo: normal vel EXT_DIR, tangential HOEXTRAP
    assert t[0][0][0] == bc_mod.EXT_DIR
    assert t[1][0][0] == bc_mod.HOEXTRAP
    # NO_SLIP x-hi: all velocity EXT_DIR, scalars HOEXTRAP
    assert t[0][0][1] == bc_mod.EXT_DIR and t[1][0][1] == bc_mod.EXT_DIR
    assert t[2][0][1] == bc_mod.HOEXTRAP
    # INLET y-lo: vel + scalars EXT_DIR, pressure FOEXTRAP
    assert t[0][1][0] == bc_mod.EXT_DIR and t[2][1][0] == bc_mod.EXT_DIR
    press = cfg.dm + cfg.nscal
    assert t[press][1][0] == bc_mod.FOEXTRAP
    # OUTLET y-hi: vel/scalars FOEXTRAP, pressure EXT_DIR
    assert t[0][1][1] == bc_mod.FOEXTRAP
    assert t[press][1][1] == bc_mod.EXT_DIR


def test_ell_bc_table_semantics():
    """define_bc_tower.f90:254-340 mappings."""
    cfg = VardenConfig(dim_in=2, bcx_lo=14, bcx_hi=15, bcy_lo=11, bcy_hi=12)
    t = bc_mod.ell_bc_table(cfg)
    press = cfg.dm + cfg.nscal
    # SLIP_WALL: normal vel DIR, tangential NEU, pressure NEU
    assert t[0][0][0] == bc_mod.BC_DIR and t[1][0][0] == bc_mod.BC_NEU
    assert t[press][0][0] == bc_mod.BC_NEU
    # OUTLET: pressure DIR
    assert t[press][1][1] == bc_mod.BC_DIR


def test_fixed_grids_parser(tmp_path):
    from varden_tpu.amr.regrid import parse_fixed_grids
    p = tmp_path / "grids"
    p.write_text("""2
2
((8,8) (23,23) (0,0))
((24,16) (39,31) (0,0))
""")
    levels = parse_fixed_grids(str(p), 2)
    assert len(levels) == 1
    # the two touching boxes merge into ONE isolated patch (gap < MERGE_GAP):
    # their bounding box, even-aligned
    assert len(levels[0]) == 1
    assert levels[0][0].lo == (8, 8)
    assert levels[0][0].hi == (40, 32)
    # far-apart boxes stay separate patches
    p2 = tmp_path / "grids2"
    p2.write_text("""2
2
((8,8) (23,23) (0,0))
((88,88) (119,119) (0,0))
""")
    levels2 = parse_fixed_grids(str(p2), 2)
    assert len(levels2[0]) == 2
    assert levels2[0][0].lo == (8, 8)
    assert levels2[0][1].lo == (88, 88)


def test_write_grids(tmp_path):
    from varden_tpu.amr.regrid import write_grids
    from varden_tpu.amr.fill import MLGeom
    from varden_tpu.amr.hierarchy import LevelSpec
    from varden_tpu.state import Sim
    sim = Sim(VardenConfig(dim_in=2, n_cellx=32, n_celly=32, max_levs=2))
    geom = MLGeom(sim, [LevelSpec((0, 0), (32, 32)),
                        LevelSpec((8, 8), (32, 32))])
    f = tmp_path / "grdlog"
    write_grids(str(f), geom, 3)
    txt = f.read_text()
    assert "step 3" in txt and "level 2" in txt and "(8,8)" in txt


def test_all_shipped_inputs_parse():
    """Every shipped reference-workload inputs file parses into a valid
    config with the reference's values (namelist-compat claim)."""
    import os
    from varden_tpu.config import load_config
    base = os.path.join(os.path.dirname(__file__), "..", "inputs")
    files = sorted(os.listdir(base))
    assert len(files) >= 10
    for f in files:
        cfg = load_config(os.path.join(base, f))
        assert cfg.dim_in in (2, 3), f
    cfg = load_config(os.path.join(base, "inputs_3d-regt"))
    assert (cfg.max_levs, cfg.n_cellx, cfg.visc_coef) == (3, 64, 0.001)
    assert cfg.max_grid_size == 32 and cfg.cluster_min_eff == 0.9
    cfg = load_config(os.path.join(base, "inputs_advect_3d"))
    assert cfg.u_bc[0][0] == 1.0 and cfg.bcx_lo == 11 and cfg.bcx_hi == 12


def test_probin_discovery(tmp_path, monkeypatch):
    """CLI inputs-file lookup priority: $PROBIN > argv > ./inputs_varden
    (reference probin.template:72-105)."""
    import varden_tpu.__main__ as main_mod
    seen = {}

    def fake_load(path, **kw):
        seen["path"] = path
        raise SystemExit(0)  # stop before running the solver

    monkeypatch.setattr("varden_tpu.config.load_config", fake_load)
    f_env = tmp_path / "envfile"
    f_env.write_text("&PROBIN\n dim_in = 2\n/\n")
    f_arg = tmp_path / "argfile"
    f_arg.write_text("&PROBIN\n dim_in = 2\n/\n")
    monkeypatch.chdir(tmp_path)
    (tmp_path / "inputs_varden").write_text("&PROBIN\n dim_in = 2\n/\n")

    # priority 1: $PROBIN wins over argv and default
    monkeypatch.setenv("PROBIN", str(f_env))
    try:
        main_mod.main([str(f_arg)])
    except SystemExit:
        pass
    assert seen["path"] == str(f_env)
    # priority 2: argv file
    monkeypatch.delenv("PROBIN")
    try:
        main_mod.main([str(f_arg)])
    except SystemExit:
        pass
    assert seen["path"] == str(f_arg)
    # priority 3: ./inputs_varden fallback
    try:
        main_mod.main([])
    except SystemExit:
        pass
    assert seen["path"] == "inputs_varden"
