"""Plotfile / checkpoint round trips, including the native C++ FAB path."""
import numpy as np

from varden_tpu.config import VardenConfig
from varden_tpu.state import Sim
from varden_tpu.io import boxlib, native


def test_native_fab_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.rand(3, 8, 12, 16)
    path = str(tmp_path / "Cell_D_00000")
    hdr = "FAB test header\n"
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    assert native.write_fab(path, hdr, data)
    with open(path, "rb") as f:
        line = f.readline()
        off = f.tell()
    assert line.decode() == hdr
    back = native.read_fab(path, off, 3, (8, 12, 16))
    assert np.array_equal(back, data)
    # cross-check against the numpy transposition convention
    with open(path, "rb") as f:
        f.seek(off)
        raw = np.frombuffer(f.read(), np.float64).reshape(3, 16, 12, 8)
    ref = np.stack([raw[c].T for c in range(3)])
    assert np.array_equal(ref, data)


def test_plotfile_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = VardenConfig(dim_in=2, n_cellx=16, n_celly=16)
    sim = Sim(cfg)
    rng = np.random.RandomState(1)
    fields = rng.rand(4, 16, 16)
    names = ["a", "b", "c", "d"]
    boxlib.write_plotfile("plt00000", sim, fields, names, 1.5)
    rnames, rtime, levels = boxlib.read_plotfile("plt00000")
    assert rnames == names
    assert abs(rtime - 1.5) < 1e-15
    assert np.allclose(levels[0], fields)


def test_plotfile_multilevel(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = VardenConfig(dim_in=2, n_cellx=16, n_celly=16, max_levs=2)
    sim = Sim(cfg)
    rng = np.random.RandomState(2)
    f0 = rng.rand(2, 16, 16)
    f1 = rng.rand(2, 16, 8)
    boxlib.write_plotfile("plt00001", sim, f0, ["x", "y"], 0.25,
                          level_fields=[f1], level_los=[[8, 4]])
    names, t, levels = boxlib.read_plotfile("plt00001")
    assert len(levels) == 2
    assert np.allclose(levels[0], f0)
    assert np.allclose(levels[1], f1)


def test_fab_header_is_valid_amrex(tmp_path):
    """The FAB data-file header must match the AMReX/FBoxLib on-disk grammar
    exactly (byte order matching the written bytes, single paren pair around
    the box) so external tools (amrvis/yt) parse it. Known-good line for a
    little-endian float64 (0,0)-(7,7) 2-component FAB."""
    import sys
    from varden_tpu.io import boxlib
    data = np.arange(2 * 8 * 8, dtype=np.float64).reshape(2, 8, 8)
    boxlib.write_multifab(str(tmp_path / "L0"), data)
    with open(tmp_path / "L0" / "Cell_D_00000", "rb") as f:
        hdr = f.readline().decode().rstrip("\n")
    order = "(8 7 6 5 4 3 2 1)" if sys.byteorder == "little" \
        else "(1 2 3 4 5 6 7 8)"
    expect = ("FAB ((8, (64 11 52 0 1 12 0 1023)),(8, " + order + "))"
              "((0,0) (7,7) (0,0)) 2")
    assert hdr == expect


def test_read_multifab_multibox(tmp_path):
    """The reader assembles a reference-layout multi-box multifab (two FABs
    in one data file at different offsets) onto the bounding box."""
    from varden_tpu.io import boxlib
    d = tmp_path / "L0"
    d.mkdir()
    rng = np.random.RandomState(0)
    b1 = rng.rand(2, 4, 6)   # box (0,0)-(3,5)
    b2 = rng.rand(2, 4, 6)   # box (4,2)-(7,7)

    def fab_bytes(data, lo, hi):
        hdr = (f"{boxlib._FAB_HEADER}({boxlib._box_str(lo, hi)}) "
               f"{data.shape[0]}\n")
        arr = np.ascontiguousarray(np.stack([data[c].T
                                             for c in range(data.shape[0])]))
        return hdr.encode() + arr.tobytes()

    blob1 = fab_bytes(b1, [0, 0], [3, 5])
    blob2 = fab_bytes(b2, [4, 2], [7, 7])
    with open(d / "Cell_D_00000", "wb") as f:
        f.write(blob1 + blob2)
    with open(d / "Cell_H", "w") as f:
        f.write("1\n1\n2\n0\n")
        f.write("(2 0\n")
        f.write(f"({boxlib._box_str([0, 0], [3, 5])})\n")
        f.write(f"({boxlib._box_str([4, 2], [7, 7])})\n")
        f.write(")\n2\n")
        f.write("FabOnDisk: Cell_D_00000 0\n")
        f.write(f"FabOnDisk: Cell_D_00000 {len(blob1)}\n")

    arr, lo, nodal = boxlib.read_multifab(str(d))
    assert lo == [0, 0] and not nodal
    assert arr.shape == (2, 8, 8)
    assert np.allclose(arr[:, 0:4, 0:6], b1)
    assert np.allclose(arr[:, 4:8, 2:8], b2)
