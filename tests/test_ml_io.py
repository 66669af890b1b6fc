"""Multi-level checkpoint/restart + plotfile output through the driver."""
import os

import numpy as np

from varden_tpu.config import VardenConfig
from varden_tpu.driver import Varden


def _cfg(**kw):
    base = dict(dim_in=2, prob_type=1, n_cellx=32, n_celly=32, max_levs=2,
                regrid_int=2, max_step=3, init_iter=1, grav=-9.8,
                bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                cflfac=0.9, init_shrink=0.1)
    base.update(kw)
    return VardenConfig(**base)


def test_ml_checkpoint_restart(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    v1 = Varden(_cfg(chk_int=2))
    sts_full = v1.run()

    v2 = Varden(_cfg(chk_int=2, restart=2))
    sts_re = v2.run()
    assert len(sts_full) == len(sts_re)
    for a, b in zip(sts_full, sts_re):
        for name in ("u", "s", "gp", "p"):
            x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
            # regrid decisions and solver trajectories are deterministic from
            # the restored state; fields should agree to roundoff
            assert np.allclose(x, y, atol=1e-11), name


def test_ml_plotfile(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    v = Varden(_cfg(plot_int=2, max_step=2))
    v.run()
    from varden_tpu.io import boxlib
    names, time, levels = boxlib.read_plotfile("plt00002")
    assert names[0] == "x_vel" and "density" in names and "vort" in names
    assert len(levels) == 2
    for arr in levels:
        assert np.isfinite(arr).all()
