"""BoxLib/AMReX-format plotfile writer + reader.

Produces the directory layout the reference emits through fabio
(fabio_ml_multifab_write_d, consumed at varden.f90:568-573): a HyperCLaw-V1.1
text Header plus per-level Cell_H multifab headers and Cell_D FAB data files,
so outputs can be read by amrvis/yt/AMReX tooling and diffed against the
Fortran code's plotfiles.

Data layout note: our arrays are indexed [x, y(, z)] C-order; FAB files store
Fortran order (x fastest), so bytes are written from the transposed view.
"""
from __future__ import annotations

import os
import sys
from typing import List, Sequence

import numpy as np

# IEEE float64 descriptor + byte order of the bytes actually written (native):
# AMReX/FBoxLib emit "(8 7 6 5 4 3 2 1)" on little-endian x86.
_ORDER = ("(8, (8 7 6 5 4 3 2 1))" if sys.byteorder == "little"
          else "(8, (1 2 3 4 5 6 7 8))")
_FAB_HEADER = f"FAB ((8, (64 11 52 0 1 12 0 1023)),{_ORDER})"


def _box_str(lo, hi):
    dm = len(lo)
    t = ",".join("0" for _ in range(dm))
    return "({}) ({}) ({})".format(
        ",".join(str(i) for i in lo), ",".join(str(i) for i in hi), t)


def write_multifab(level_dir: str, data: np.ndarray, lo=None):
    """Write one dense grid as a single-FAB multifab (Cell_H + Cell_D_00000).

    data: (ncomp, *n) float64, cell-centered.
    """
    ncomp = data.shape[0]
    n = data.shape[1:]
    dm = len(n)
    lo = lo or [0] * dm
    hi = [lo[d] + n[d] - 1 for d in range(dm)]
    os.makedirs(level_dir, exist_ok=True)

    fab_path = os.path.join(level_dir, "Cell_D_00000")
    # AMReX FAB header line: "FAB (...)((lo) (hi) (type)) ncomp"
    hdr = f"{_FAB_HEADER}({_box_str(lo, hi)}) {ncomp}\n"
    from . import native
    if not native.write_fab(fab_path, hdr, np.asarray(data, np.float64)):
        with open(fab_path, "wb") as f:
            f.write(hdr.encode())
            # Fortran order, component slowest
            arr = np.ascontiguousarray(
                np.stack([np.asarray(data[c], np.float64).T
                          for c in range(ncomp)]))
            f.write(arr.tobytes())

    mins = [float(np.min(data[c])) for c in range(ncomp)]
    maxs = [float(np.max(data[c])) for c in range(ncomp)]
    with open(os.path.join(level_dir, "Cell_H"), "w") as f:
        f.write("1\n1\n%d\n0\n" % ncomp)
        f.write("(1 0\n(%s)\n)\n" % _box_str(lo, hi))
        f.write("1\n")
        f.write("FabOnDisk: Cell_D_00000 0\n")
        f.write("\n1,%d\n" % ncomp)
        f.write(",".join(f"{v:.16e}" for v in mins) + ",\n")
        f.write("\n1,%d\n" % ncomp)
        f.write(",".join(f"{v:.16e}" for v in maxs) + ",\n")


def write_plotfile(name: str, sim, fields: np.ndarray,
                   field_names: Sequence[str], time: float,
                   level_fields: List[np.ndarray] = None,
                   level_los: List[List[int]] = None, ref_ratio: int = 2):
    """Write a plotfile directory. ``fields``: (ncomp, *n) for level 0;
    optional finer levels via level_fields/level_los (cell index of each
    level's lo corner on its own index space)."""
    dm = sim.dm
    ncomp = fields.shape[0]
    levels = [fields] + list(level_fields or [])
    los = [[0] * dm] + list(level_los or [])
    nlev = len(levels)
    os.makedirs(name, exist_ok=True)

    prob_lo, prob_hi = sim.cfg.prob_lo, sim.cfg.prob_hi
    dx0 = sim.dx

    with open(os.path.join(name, "Header"), "w") as f:
        f.write("HyperCLaw-V1.1\n")
        f.write(f"{ncomp}\n")
        for nm in field_names:
            f.write(nm + "\n")
        f.write(f"{dm}\n")
        f.write(f"{time:.16e}\n")
        f.write(f"{nlev - 1}\n")
        f.write(" ".join(f"{v:.16e}" for v in prob_lo) + " \n")
        f.write(" ".join(f"{v:.16e}" for v in prob_hi) + " \n")
        f.write(" ".join(str(ref_ratio) for _ in range(nlev - 1)) + " \n")
        dom = []
        for lev, arr in enumerate(levels):
            n = arr.shape[1:]
            lo = los[lev]
            hi = [lo[d] + n[d] - 1 for d in range(dm)]
            dom.append("((%s) (%s) (%s))" % (
                ",".join(str(v) for v in lo), ",".join(str(v) for v in hi),
                ",".join("0" for _ in range(dm))))
        f.write(" ".join(dom) + " \n")
        f.write(" ".join("0" for _ in range(nlev)) + " \n")
        for lev in range(nlev):
            dxl = [h / ref_ratio**lev for h in dx0]
            f.write(" ".join(f"{h:.16e}" for h in dxl) + " \n")
        f.write("0\n0\n")
        for lev, arr in enumerate(levels):
            n = arr.shape[1:]
            lo = los[lev]
            dxl = [h / ref_ratio**lev for h in dx0]
            f.write(f"{lev} 1 {time:.16e}\n")
            f.write("0\n")
            for d in range(dm):
                xlo = prob_lo[d] + lo[d] * dxl[d]
                xhi = prob_lo[d] + (lo[d] + n[d]) * dxl[d]
                f.write(f"{xlo:.16e} {xhi:.16e}\n")
            f.write(f"Level_{lev}/Cell\n")

    for lev, arr in enumerate(levels):
        write_multifab(os.path.join(name, f"Level_{lev}"),
                       np.asarray(arr, np.float64), los[lev])


def read_plotfile(name: str):
    """Read back a plotfile written by write_plotfile (and simple
    single-grid-per-level BoxLib plotfiles generally). Returns
    (field_names, time, [level arrays (ncomp, *n)])."""
    with open(os.path.join(name, "Header")) as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 1
    ncomp = int(lines[i]); i += 1
    names = lines[i:i + ncomp]; i += ncomp
    dm = int(lines[i]); i += 1
    time = float(lines[i]); i += 1
    finest = int(lines[i]); i += 1
    nlev = finest + 1
    levels = []
    for lev in range(nlev):
        ld = os.path.join(name, f"Level_{lev}")
        with open(os.path.join(ld, "Cell_H")) as f:
            h = f.read().split("\n")
        nc = int(h[2])
        box_line = h[5]
        lo, hi, _ = [tuple(int(v) for v in part.strip("()").split(","))
                     for part in box_line.strip("()").split(") (")]
        n = tuple(hi[d] - lo[d] + 1 for d in range(dm))
        fab = os.path.join(ld, "Cell_D_00000")
        with open(fab, "rb") as f:
            hdr = f.readline()
            offset = f.tell()
        from . import native
        arr = native.read_fab(fab, offset, nc, n)
        if arr is None:
            with open(fab, "rb") as f:
                f.seek(offset)
                raw = np.frombuffer(f.read(), np.float64,
                                    count=nc * int(np.prod(n)))
            arr = raw.reshape((nc,) + tuple(reversed(n)))
            arr = np.stack([arr[c].T for c in range(nc)])
        levels.append(arr)
    return names, time, levels
