"""Fused Pallas tiles for the 3-D Godunov hot loops.

The north-star kernels (BASELINE.json): the corner-coupled BCG predictor
(reference velpred_3d, src/velpred.f90:1776-2767) and edge-state/flux builder
(mkflux_3d, src/mkflux.f90:1186-2567) as VMEM-resident tile kernels. The
staged math is literally ops/godunov3d.py — the Win pipeline is pure jnp
slicing/arithmetic, so the SAME functions run inside the kernel on a haloed
(TX, TY, TZ) tile, keeping every intermediate (slopes, hat, double-hat
states) in VMEM instead of ~dozens of HBM round-trips between XLA fusions.

Tiling: x and y are tiled (z stays whole per tile, so z boundary
treatment — one-sided slope stencils and face overrides — runs IN-kernel at
static coordinates). Along the tiled x/y axes the kernel computes pure
interior formulas; cells within the x/y margins are recomputed by the plain
windowed path on four thin slabs (full boundary treatment) and spliced.
The two computations agree identically where they overlap (domain-boundary
taint reaches only ~2 cells), verified bitwise in tests and on TPU.

TPU/Mosaic rules shape the plan: output blocks need sublane-dim (y) size
8 and full z; element-window y offsets must be PROVABLY 8-divisible (so y
margins are multiples of 8 and index maps keep the multiply outermost);
the y halo read is padded to a multiple of 8 rows. x, an untiled dim, is
free — its tile shrinks at large n2 to bound the kernel's VMEM stack.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import godunov3d
from .godunov import ABS_EPS, mac_wins

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# a bc code no slope/override branch matches -> pure interior formulas
BC_INT = -999
NO_BC = frozenset()
BC_Z = frozenset({(2, 0), (2, 1)})
SLAB = 4        # boundary slab width (cells) >= override taint depth (~2)
TY = int(os.environ.get("VARDEN_GODUNOV_TY", "8"))  # y tile (sublane multiple)
# scoped-VMEM ceiling handed to Mosaic (v5e has 128 MiB VMEM; the default
# compiler cap is 100 MiB — raising it buys bigger x tiles = less halo
# recompute, at the cost of less double-buffering headroom)
_VMEM_LIMIT = int(os.environ.get("VARDEN_VMEM_LIMIT_MB", "100")) * 1024 * 1024


class _Plan:
    """Static tiling geometry for one (n_cell, ng) problem.

    See the module docstring for the Mosaic constraints that pick these
    numbers."""

    def __init__(self, n_cell, ng, heavy=False, nc=1):
        self.n = tuple(n_cell)
        self.ng = ng
        n0, n1, n2 = n_cell
        # Mosaic's kernel stack scales with tile volume x live stage
        # temporaries; the slab-count coefficients are calibrated from
        # measured fits at 256^3 (velpred fits tx=8 but not 12; the
        # single-component mkflux fits tx=12 but not 16). The same model
        # gates large untiled-z problems instead of a hardcoded n2 switch.
        # heavy (mkflux) live set ~= 8 shared (MAC faces, rhs) + 42 per
        # component (nc > 1: one batched multi-component call).
        yb = -(-(TY + 2 * ng) // 8) * 8
        zb = n2 + 2 * ng
        live_slabs = (8 + 42 * nc) if heavy else 62
        budget_mb = float(os.environ.get("VARDEN_GODUNOV_VMEM_MB", "38"))
        self.tx = 0
        for t in ((24, 16, 12, 8, 4, 2, 1) if heavy
                  else (24, 16, 8, 4, 2, 1)):
            if t > max(n0 - 2 * SLAB, 0):
                continue          # need >= 1 interior tile on small grids
            if live_slabs * (t + 2 * ng) * yb * zb * 4 < budget_mb * 2 ** 20:
                self.tx = t
                break
        if self.tx == 0:      # untiled z axis too large for any VMEM tile
            self.nxt = self.nyt = 0
            self.tz = n2
            return
        self.xl = SLAB
        self.xh = SLAB + (n0 - 2 * SLAB) % self.tx
        self.yl = TY   # must be a TY multiple (index-map divisibility)
        yh0 = 12   # >= 10 so the padded y-halo read stays in bounds
        self.yh = yh0 + (n1 - self.yl - yh0) % TY
        # z is untiled: full axis per tile, BCs handled IN-kernel (static
        # coordinates) — no z slabs (a thin z slab would pad its 8-cell
        # lane dim to 128: ~an entire extra windowed pass)
        self.zl = self.zh = 0
        self.tz = n2
        self.zb = n2 + 2 * ng          # full padded axis in one block
        self.nxt = (n0 - self.xl - self.xh) // self.tx
        self.nyt = (n1 - self.yl - self.yh) // TY
        self.nzt = 1
        self.nxi, self.nyi = self.nxt * self.tx, self.nyt * TY
        self.nzi = self.tz
        self.xb = self.tx + 2 * ng
        self.yb = -(-(TY + 2 * ng) // 8) * 8

    @property
    def ok(self):
        n1 = self.n[1]
        if self.tx == 0 or min(self.nxt, self.nyt, self.tz) < 1:
            return False
        # padded y reads stay in bounds
        if self.yl + (self.nyt - 1) * TY + self.yb > n1 + 2 * self.ng:
            return False
        return True


def tiles_supported(n_cell, dtype, ng: int = 3) -> bool:
    """Fused-kernel path available for this (n_cell, ng)? Gates on the
    actual ghost width and the VMEM tile model (both plan variants must
    fit) so unsupported geometries fall back to the windowed path instead
    of failing Mosaic compilation at runtime."""
    if not HAVE_PALLAS or jax.default_backend() != "tpu":
        return False
    if os.environ.get("VARDEN_NO_PALLAS_GODUNOV"):
        return False
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    if min(n_cell) < 2 * SLAB + 8:
        return False
    return _Plan(n_cell, ng).ok and _Plan(n_cell, ng, heavy=True).ok


def _interior_adv_bc(adv_bc, ncomp):
    """adv_bc with the tiled x/y axes replaced by the interior sentinel;
    z keeps its real codes (one-sided slope stencils apply in-kernel)."""
    return [[(BC_INT, BC_INT), (BC_INT, BC_INT), tuple(adv_bc[c][2])]
            for c in range(ncomp)]


def _slab_adv_bc(adv_bc, axis, side, ncomp):
    """adv_bc for a slab: the artificial cut gets the interior sentinel."""
    out = []
    for c in range(ncomp):
        row = []
        for a in range(3):
            lo, hi = adv_bc[c][a]
            if a == axis:
                if side == 0:
                    hi = BC_INT
                else:
                    lo = BC_INT
            row.append((lo, hi))
        out.append(row)
    return out


def _slab_bc_sides(axis, side):
    keep = {(a, s) for a in range(3) for s in range(2)}
    keep.discard((axis, 1 - side))
    return frozenset(keep)


def _crop_pad(arr, axis, i0, i1, ng):
    """Crop a padded array to interior cells [i0, i1) along spatial ``axis``
    keeping the ghost margins (spatial axes are the last 3)."""
    sl = [slice(None)] * arr.ndim
    sl[arr.ndim - 3 + axis] = slice(i0, i1 + 2 * ng)
    return arr[tuple(sl)]


def _take(arr, ax, sl):
    s = [slice(None)] * arr.ndim
    s[ax] = sl
    return arr[tuple(s)]


def _stitch(km, slabs, plan, face_axis, sp0):
    """Splice kernel-interior + four x/y boundary-slab arrays into the
    full field. ``slabs[(axis, side)]`` spans the full extent of all later-
    stitched axes; ``sp0`` = index of the first spatial axis in the arrays;
    ``face_axis`` = which spatial axis holds faces."""
    p = plan
    ax = [sp0, sp0 + 1, sp0 + 2]
    xs = slice(p.xl, p.n[0] - p.xh)
    out = km

    ylo, yhi = slabs[(1, 0)], slabs[(1, 1)]
    # windowed y slabs span full x (crop to the interior); kernelized ones
    # arrive already x-interior and exact-row sized
    if ylo.shape[ax[0]] != p.nxi:
        ylo = _take(ylo, ax[0], xs)
    if yhi.shape[ax[0]] != p.nxi:
        yhi = _take(yhi, ax[0], xs)
    if face_axis == 1 and ylo.shape[ax[1]] != p.yl:
        ylo = _take(ylo, ax[1], slice(0, p.yl))
    out = jnp.concatenate([ylo, out, yhi], axis=ax[1])

    xlo, xhi = slabs[(0, 0)], slabs[(0, 1)]
    if face_axis == 0:
        xlo = _take(xlo, ax[0], slice(0, p.xl))
    return jnp.concatenate([xlo, out, xhi], axis=ax[0])


def _in_spec(plan, lead=None):
    p = plan
    dims = ([] if lead is None else [pl.Element(lead)]) + [
        pl.Element(p.xb), pl.Element(p.yb), pl.Element(p.zb)]
    # the sublane (y) offset must be PROVABLY 8-divisible: Mosaic's prover
    # accepts (j + c) * 8 but not c*8 + j*8 — hence yl is a multiple of TY
    # and the index map keeps the multiply outermost
    yoff = p.yl // TY
    if lead is None:
        idx = lambda i, j: (p.xl + i * p.tx, (j + yoff) * TY, 0)
    else:
        idx = lambda i, j: (0, p.xl + i * p.tx, (j + yoff) * TY, 0)
    return pl.BlockSpec(tuple(dims), idx, memory_space=pltpu.VMEM)


def _out_spec(plan, lead=None, zfaces=False):
    p = plan
    z = p.tz + (1 if zfaces else 0)
    if lead is None:
        return pl.BlockSpec((p.tx, TY, z), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((lead, p.tx, TY, z), lambda i, j: (0, i, j, 0),
                        memory_space=pltpu.VMEM)


def _out_shape(plan, dtype, lead=None, zfaces=False):
    p = plan
    shape = (p.nxi, p.nyi, p.tz + (1 if zfaces else 0))
    if lead is not None:
        shape = (lead,) + shape
    return jax.ShapeDtypeStruct(shape, dtype)


# ---------------------------------------------------------------------------
# velpred
# ---------------------------------------------------------------------------

def _y_slab_adv_bc(adv_bc, side, ncomp):
    """adv_bc for a KERNELIZED y slab: x interior (x-slabs own those
    boundaries), the outer y side real, the artificial y cut interior,
    z real (in-kernel)."""
    out = []
    for c in range(ncomp):
        yl_, yh_ = adv_bc[c][1]
        ypair = (yl_, BC_INT) if side == 0 else (BC_INT, yh_)
        out.append(((BC_INT, BC_INT), ypair, tuple(adv_bc[c][2])))
    return tuple(out)


def _yslab_take(arr, side, ty, ng, sp0):
    """Trace-level thin slice holding a y slab's rows + halo (offset-0
    blocks sidestep Mosaic's sublane-offset divisibility rules)."""
    n1p = arr.shape[sp0 + 1]
    sl = [slice(None)] * arr.ndim
    sl[sp0 + 1] = (slice(0, ty + 2 * ng) if side == 0
                   else slice(n1p - (ty + 2 * ng), n1p))
    return arr[tuple(sl)]


def _velpred_kernel(u_ref, f_ref, scal_ref, umac_ref, vmac_ref, wmac_ref, *,
                    dx, ng, tx, ty, tz, phys_bc, adv_bc, slope_order,
                    use_minion, bc_sides, yface):
    cut = (slice(None), slice(None), slice(0, ty + 2 * ng), slice(None))
    u = u_ref[cut]
    f = f_ref[cut]
    dt = scal_ref[0]
    eps = scal_ref[1]
    n_cell = (tx, ty, tz)
    macs = godunov3d.velpred_3d(
        u, f, dt, dx, phys_bc, adv_bc, ng, n_cell,
        slope_order, use_minion, bc_sides=bc_sides, eps=eps)
    umac_ref[...] = macs[0][:tx]
    vmac_ref[...] = macs[1][:, :ty + yface]
    wmac_ref[...] = macs[2]


def velpred_3d_fused(u, force, dt, dx, phys_bc, adv_bc_vel, ng, n_cell,
                     slope_order, use_minion, *, interpret=False):
    """Tiled-interior + slab-boundary velpred. Returns interior MAC faces
    exactly as godunov3d.velpred_3d. The y slabs run through the SAME
    fused kernel (thin sliced inputs, real y codes in-kernel); only the x
    slabs (which own the domain corners) use the windowed path."""
    p = _Plan(n_cell, ng)
    if not p.ok:
        return godunov3d.velpred_3d(u, force, dt, dx, phys_bc, adv_bc_vel,
                                    ng, n_cell, slope_order, use_minion)
    n0, n1, n2 = n_cell

    umax = jnp.max(jnp.abs(u[:, ng:ng + n0, ng:ng + n1, ng:ng + n2]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)
    scal = jnp.stack([jnp.asarray(dt, u.dtype), eps.astype(u.dtype)])
    pbc = tuple(tuple(b) for b in phys_bc)
    adv_t = tuple(tuple(tuple(a) for a in row) for row in adv_bc_vel)
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

    def call(u_in, f_in, ty, adv_k, bc_sides, yface, grid2):
        kern = functools.partial(
            _velpred_kernel, dx=tuple(dx), ng=ng, tx=p.tx, ty=ty, tz=p.tz,
            phys_bc=pbc, adv_bc=adv_k, slope_order=slope_order,
            use_minion=use_minion, bc_sides=bc_sides, yface=yface)
        if grid2:            # interior: tile x AND y
            grid = (p.nxt, p.nyt)
            in_specs = [_in_spec(p, 3), _in_spec(p, 3),
                        pl.BlockSpec(memory_space=pltpu.SMEM)]
            out_specs = [_out_spec(p), _out_spec(p),
                         _out_spec(p, zfaces=True)]
            out_shape = [_out_shape(p, u.dtype), _out_shape(p, u.dtype),
                         _out_shape(p, u.dtype, zfaces=True)]
        else:                # y slab: x tiles only, full (sliced) y extent
            grid = (p.nxt,)
            ybs = ty + 2 * ng

            def espec(lead=None):
                dims = ([] if lead is None else [pl.Element(lead)]) + [
                    pl.Element(p.xb), pl.Element(ybs), pl.Element(p.zb)]
                if lead is None:
                    idx = lambda i: (p.xl + i * p.tx, 0, 0)
                else:
                    idx = lambda i: (0, p.xl + i * p.tx, 0, 0)
                return pl.BlockSpec(tuple(dims), idx,
                                    memory_space=pltpu.VMEM)

            in_specs = [espec(3), espec(3),
                        pl.BlockSpec(memory_space=pltpu.SMEM)]

            def ospec(yr, zf=0):
                return pl.BlockSpec((p.tx, yr, p.tz + zf),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)

            out_specs = [ospec(ty), ospec(ty + yface), ospec(ty, 1)]
            out_shape = [
                jax.ShapeDtypeStruct((p.nxi, ty, p.tz), u.dtype),
                jax.ShapeDtypeStruct((p.nxi, ty + yface, p.tz), u.dtype),
                jax.ShapeDtypeStruct((p.nxi, ty, p.tz + 1), u.dtype)]
        return pl.pallas_call(
            kern, grid=grid, out_shape=out_shape, in_specs=in_specs,
            out_specs=out_specs, compiler_params=cp, interpret=interpret,
        )(u_in, f_in, scal)

    km = call(u, force, TY, _interior_adv_bc(adv_t, 3),
              BC_Z, 0, True)
    slabs = {}
    for side, ty in ((0, p.yl), (1, p.yh)):
        u_s = _yslab_take(u, side, ty, ng, 1)
        f_s = _yslab_take(force, side, ty, ng, 1)
        bcs = frozenset({(1, side)} | BC_Z)
        slabs[(1, side)] = call(u_s, f_s, ty,
                                _y_slab_adv_bc(adv_t, side, 3), bcs,
                                1 if side == 1 else 0, False)

    def xslab(side, width):
        i0 = 0 if side == 0 else n_cell[0] - width
        us = _crop_pad(u, 0, i0, i0 + width, ng)
        fs = _crop_pad(force, 0, i0, i0 + width, ng)
        ncs = (width, n_cell[1], n_cell[2])
        return godunov3d.velpred_3d(
            us, fs, dt, dx, phys_bc,
            _slab_adv_bc(adv_bc_vel, 0, side, 3), ng, ncs, slope_order,
            use_minion, bc_sides=_slab_bc_sides(0, side), eps=eps)

    slabs[(0, 0)] = xslab(0, p.xl)
    slabs[(0, 1)] = xslab(1, p.xh)
    return tuple(
        _stitch(km[d], {k: s[d] for k, s in slabs.items()}, p, d, 0)
        for d in range(3))


# ---------------------------------------------------------------------------
# mkflux
# ---------------------------------------------------------------------------

def _mkflux_kernel(s_ref, mx_ref, my_ref, mz_ref, f_ref, rhs_ref, scal_ref,
                   ex_ref, ey_ref, ez_ref, fx_ref, fy_ref, fz_ref, *,
                   dx, ng, tx, ty, tz, phys_bc, adv_bc, is_vel, is_cons,
                   slope_order, use_minion, bc_sides, yface):
    cut = (slice(None), slice(None), slice(0, ty + 2 * ng), slice(None))
    s = s_ref[cut]
    f = f_ref[cut]
    cut3 = cut[1:]
    macs = [mx_ref[cut3], my_ref[cut3], mz_ref[cut3]]
    rhs = rhs_ref[cut3]
    dt = scal_ref[0]
    eps = scal_ref[1]
    n_cell = (tx, ty, tz)
    sedge, sflux = godunov3d.mkflux_3d(
        s, macs, f, rhs, dt, dx, phys_bc, adv_bc, ng,
        n_cell, is_vel, is_cons, slope_order, use_minion, bc_sides=bc_sides,
        eps=eps)
    ex_ref[...] = sedge[0][:, :tx]
    ey_ref[...] = sedge[1][:, :, :ty + yface]
    ez_ref[...] = sedge[2]
    fx_ref[...] = sflux[0][:, :tx]
    fy_ref[...] = sflux[1][:, :, :ty + yface]
    fz_ref[...] = sflux[2]


def mkflux_3d_fused(s, mac_pads, force, mac_rhs, dt, dx, phys_bc, adv_bc,
                    ng, n_cell, is_vel, is_conservative, slope_order,
                    use_minion, *, interpret=False):
    """Tiled-interior + slab-boundary mkflux. Returns (sedge, sflux) exactly
    as godunov3d.mkflux_3d. The y slabs run through the SAME fused kernel;
    the x slabs (domain corners) use the windowed path."""
    nc = s.shape[0]
    # One BATCHED kernel call for all components beats per-component calls
    # when the multi-component stack still fits a reasonable x tile: the
    # shared MAC-face reads and the per-tile fixed cost are paid once
    # (measured at 256^3: see PROGRESS.md round 4). Falls back to
    # per-component calls when the batched plan's tile collapses.
    batch = os.environ.get("VARDEN_MKFLUX_BATCH", "1") != "0"
    pb = _Plan(n_cell, ng, heavy=True, nc=nc) if batch and nc > 1 else None
    if pb is not None and pb.ok and pb.tx >= 8:
        p = pb
        groups = [list(range(nc))]
    else:
        p = _Plan(n_cell, ng, heavy=True)
        groups = [[c] for c in range(nc)]
    if not p.ok:
        return godunov3d.mkflux_3d(s, mac_pads, force, mac_rhs, dt, dx,
                                   phys_bc, adv_bc, ng, n_cell, is_vel,
                                   is_conservative, slope_order, use_minion)
    n0, n1, n2 = n_cell

    macw = mac_wins(mac_pads, ng, n_cell)
    umax = jnp.max(jnp.stack([jnp.max(jnp.abs(m.arr)) for m in macw]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)
    scal = jnp.stack([jnp.asarray(dt, s.dtype), eps.astype(s.dtype)])
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    pbc = tuple(tuple(b) for b in phys_bc)

    def call(ins, grp, ty, adv_k, bc_sides, yface, grid2):
        ncg = len(grp)
        kern = functools.partial(
            _mkflux_kernel, dx=tuple(dx), ng=ng, tx=p.tx, ty=ty, tz=p.tz,
            phys_bc=pbc, adv_bc=adv_k,
            is_vel=is_vel, is_cons=tuple(is_conservative[c] for c in grp),
            slope_order=slope_order, use_minion=use_minion,
            bc_sides=bc_sides, yface=yface)
        if grid2:
            grid = (p.nxt, p.nyt)
            in_specs = [_in_spec(p, ncg), _in_spec(p), _in_spec(p),
                        _in_spec(p), _in_spec(p, ncg), _in_spec(p),
                        pl.BlockSpec(memory_space=pltpu.SMEM)]
            out_specs = [_out_spec(p, ncg), _out_spec(p, ncg),
                         _out_spec(p, ncg, zfaces=True),
                         _out_spec(p, ncg), _out_spec(p, ncg),
                         _out_spec(p, ncg, zfaces=True)]
            out_shape = [_out_shape(p, s.dtype, ncg),
                         _out_shape(p, s.dtype, ncg),
                         _out_shape(p, s.dtype, ncg, zfaces=True),
                         _out_shape(p, s.dtype, ncg),
                         _out_shape(p, s.dtype, ncg),
                         _out_shape(p, s.dtype, ncg, zfaces=True)]
        else:
            grid = (p.nxt,)
            ybs = ty + 2 * ng

            def espec(lead=None):
                dims = ([] if lead is None else [pl.Element(lead)]) + [
                    pl.Element(p.xb), pl.Element(ybs), pl.Element(p.zb)]
                if lead is None:
                    idx = lambda i: (p.xl + i * p.tx, 0, 0)
                else:
                    idx = lambda i: (0, p.xl + i * p.tx, 0, 0)
                return pl.BlockSpec(tuple(dims), idx,
                                    memory_space=pltpu.VMEM)

            in_specs = [espec(ncg), espec(), espec(), espec(), espec(ncg),
                        espec(), pl.BlockSpec(memory_space=pltpu.SMEM)]

            def ospec(yr, zf=0):
                return pl.BlockSpec((ncg, p.tx, yr, p.tz + zf),
                                    lambda i: (0, i, 0, 0),
                                    memory_space=pltpu.VMEM)

            def oshape(yr, zf=0):
                return jax.ShapeDtypeStruct((ncg, p.nxi, yr, p.tz + zf),
                                            s.dtype)

            out_specs = [ospec(ty), ospec(ty + yface), ospec(ty, 1),
                         ospec(ty), ospec(ty + yface), ospec(ty, 1)]
            out_shape = [oshape(ty), oshape(ty + yface), oshape(ty, 1),
                         oshape(ty), oshape(ty + yface), oshape(ty, 1)]
        return pl.pallas_call(
            kern, grid=grid, out_shape=out_shape, in_specs=in_specs,
            out_specs=out_specs, compiler_params=cp, interpret=interpret,
        )(*ins)

    outs_c, slab_c = [], []
    for grp in groups:
        ncg = len(grp)
        adv_g = tuple(tuple(tuple(a) for a in adv_bc[c]) for c in grp)
        ins = (s[grp[0]:grp[-1] + 1], mac_pads[0], mac_pads[1], mac_pads[2],
               force[grp[0]:grp[-1] + 1], mac_rhs, scal)
        outs_c.append(call(ins, grp, TY, _interior_adv_bc(adv_g, ncg), BC_Z,
                           0, True))
        per_side = {}
        for side, ty in ((0, p.yl), (1, p.yh)):
            ins_s = tuple(_yslab_take(a, side, ty, ng, a.ndim - 3)
                          if a.ndim >= 3 else a for a in ins)
            bcs = frozenset({(1, side)} | BC_Z)
            per_side[side] = call(ins_s, grp, ty,
                                  _y_slab_adv_bc(adv_g, side, ncg),
                                  bcs, 1 if side == 1 else 0, False)
        slab_c.append(per_side)
    km_e = [jnp.concatenate([o[i] for o in outs_c]) for i in range(3)]
    km_f = [jnp.concatenate([o[i] for o in outs_c]) for i in range(3, 6)]
    yslab_e = {(1, side): [jnp.concatenate([sc[side][i] for sc in slab_c])
                           for i in range(3)] for side in (0, 1)}
    yslab_f = {(1, side): [jnp.concatenate([sc[side][i] for sc in slab_c])
                           for i in range(3, 6)] for side in (0, 1)}

    def slab(axis, side, width):
        i0 = 0 if side == 0 else n_cell[axis] - width
        ss = _crop_pad(s, axis, i0, i0 + width, ng)
        ms = [_crop_pad(m, axis, i0, i0 + width, ng) for m in mac_pads]
        fs = _crop_pad(force, axis, i0, i0 + width, ng)
        rs = _crop_pad(mac_rhs, axis, i0, i0 + width, ng)
        ncs = tuple(width if a == axis else n_cell[a] for a in range(3))
        return godunov3d.mkflux_3d(
            ss, ms, fs, rs, dt, dx, phys_bc,
            _slab_adv_bc(adv_bc, axis, side, nc), ng, ncs, is_vel,
            is_conservative, slope_order, use_minion,
            bc_sides=_slab_bc_sides(axis, side), eps=eps)

    xslabs = {(0, 0): slab(0, 0, p.xl), (0, 1): slab(0, 1, p.xh)}
    sedge = tuple(
        _stitch(km_e[d],
                {**{k: s_[0][d] for k, s_ in xslabs.items()},
                 (1, 0): yslab_e[(1, 0)][d], (1, 1): yslab_e[(1, 1)][d]},
                p, d, 1)
        for d in range(3))
    sflux = tuple(
        _stitch(km_f[d],
                {**{k: s_[1][d] for k, s_ in xslabs.items()},
                 (1, 0): yslab_f[(1, 0)][d], (1, 1): yslab_f[(1, 1)][d]},
                p, d, 1)
        for d in range(3))
    return sedge, sflux


# ---------------------------------------------------------------------------
# fused mkflux + update
# ---------------------------------------------------------------------------
#
# The conservative/convective update (src/update.f90:186-278) consumes ONLY
# tile-local data the mkflux kernel already holds in VMEM: the three edge
# state/flux face sets, the MAC faces, sold (the interior of the haloed s
# block) and the half-time force. Fusing it into the kernel epilogue turns
# mkflux's SIX n^3-sized face outputs (plus the separate update pass that
# re-read them all) into ONE cell-centered output per component: snew.
# At 256^3 that removes ~2/3 of the Godunov phase's HBM traffic and the
# entire face-array stitch (the 6x ~0.5 GB concatenate temps that OOMed the
# 3-level 256^3 config).

def _update_vals(sold, umac, sedge, sflux, fupd, dt, dx, is_cons):
    """The update math on plain arrays (bitwise the jnp branch of
    basic.update; reference update_3d, src/update.f90:186-278).
    ``fupd`` may be None (statically-zero update force)."""
    dm = len(umac)
    from .basic import _fdiff, _fmean
    ubar = [_fmean(umac[d], d, dm) for d in range(dm)]
    out = []
    for c in range(sold.shape[0]):
        if is_cons[c]:
            adv = sum(_fdiff(sflux[d][c], d, dm) / dx[d] for d in range(dm))
        else:
            adv = sum(ubar[d] * _fdiff(sedge[d][c], d, dm) / dx[d]
                      for d in range(dm))
        val = sold[c] - dt * adv
        if fupd is not None:
            val = val + dt * fupd[c]
        out.append(val)
    return jnp.stack(out)


def _mac_interior(macs, ng, n_cell):
    """Interior MAC faces from the cell-aligned padded arrays."""
    out = []
    for d in range(3):
        sl = tuple(slice(ng, ng + n_cell[t] + (1 if t == d else 0))
                   for t in range(3))
        out.append(macs[d][sl])
    return out


def _mkflux_update_kernel(*refs,
                          dx, ng, tx, ty, tz, phys_bc, adv_bc, is_vel,
                          is_cons, slope_order, use_minion, bc_sides,
                          have_force, have_rhs, have_fupd,
                          flux_idx=(), yface=0):
    """snew per tile; with ``flux_idx`` also emits the conservative fluxes
    (fx/fy/fz out_refs) for the AMR flux registers (ml_edge_restriction_c,
    mkflux.f90:137-146).

    Statically-zero inputs (force / mac_rhs / update force) are SYNTHESIZED
    in VMEM instead of read: this app's mac_rhs is identically zero and with
    diff_coef=0 both scalar forces are too — as HBM inputs they cost real
    buffers (~1.5 GiB across a 256^3 3-level hierarchy) and kernel read
    bandwidth for arrays of zeros."""
    it = iter(refs)
    s_ref = next(it)
    mx_ref, my_ref, mz_ref = next(it), next(it), next(it)
    f_ref = next(it) if have_force else None
    rhs_ref = next(it) if have_rhs else None
    fupd_ref = next(it) if have_fupd else None
    scal_ref = next(it)
    snew_ref = next(it)
    out_refs = tuple(it)
    cut = (slice(None), slice(None), slice(0, ty + 2 * ng), slice(None))
    s = s_ref[cut]
    f = f_ref[cut] if have_force else None
    cut3 = cut[1:]
    macs = [mx_ref[cut3], my_ref[cut3], mz_ref[cut3]]
    rhs = rhs_ref[cut3] if have_rhs else None
    dt = scal_ref[0]
    eps = scal_ref[1]
    n_cell = (tx, ty, tz)
    sedge, sflux = godunov3d.mkflux_3d(
        s, macs, f, rhs, dt, dx, phys_bc, adv_bc, ng,
        n_cell, is_vel, is_cons, slope_order, use_minion, bc_sides=bc_sides,
        eps=eps)
    umac = _mac_interior(macs, ng, n_cell)
    sold = s[(slice(None),) + tuple(slice(ng, ng + n_cell[t])
                                    for t in range(3))]
    fupd = fupd_ref[...] if have_fupd else None
    snew_ref[...] = _update_vals(sold, umac, sedge, sflux, fupd,
                                 dt, dx, is_cons)
    if flux_idx:
        # static per-row selection (an index ARRAY would be captured as a
        # kernel constant, which pallas_call rejects)
        fx_ref, fy_ref, fz_ref = out_refs
        fx_ref[...] = jnp.stack([sflux[0][i] for i in flux_idx])[:, :tx]
        fy_ref[...] = jnp.stack([sflux[1][i]
                                 for i in flux_idx])[:, :, :ty + yface]
        fz_ref[...] = jnp.stack([sflux[2][i] for i in flux_idx])


def mkflux_update_3d_fused(s, mac_pads, force, fupd, mac_rhs, dt, dx,
                           phys_bc, adv_bc, ng, n_cell, is_vel,
                           is_conservative, slope_order, use_minion, *,
                           flux_comps=(), interpret=False):
    """Fused mkflux + conservative/convective update. ``fupd`` is the
    interior (nc, *n) update-time force (visc_fac/diff_fac = 0 variant,
    velocity_advance.f90:86 / scalar_advance.f90:112); returns snew
    (nc, *n_cell) == basic.update(sold, umac, mkflux(...), fupd, ...).

    ``flux_comps``: component indices whose conservative fluxes the AMR
    flux registers need (ml_edge_restriction_c); when non-empty, returns
    (snew, sflux) with sflux[d] of shape (len(flux_comps), faces).

    ``force``, ``fupd`` and ``mac_rhs`` may each be None, meaning
    statically zero: the kernel synthesizes the zeros in VMEM instead of
    reading full-size HBM buffers of zeros (mac_rhs is identically zero in
    this application; the scalar forces are when diff_coef=0)."""
    nc = s.shape[0]
    n0, n1, n2 = n_cell
    dtype = s.dtype
    flux_comps = tuple(flux_comps)
    have_force = force is not None
    have_fupd = fupd is not None
    have_rhs = mac_rhs is not None

    macw = mac_wins(mac_pads, ng, n_cell)
    umax = jnp.max(jnp.stack([jnp.max(jnp.abs(m.arr)) for m in macw]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)

    def fallback():
        sedge, sflux = godunov3d.mkflux_3d(
            s, mac_pads, force, mac_rhs, dt, dx, phys_bc, adv_bc, ng,
            n_cell, is_vel, is_conservative, slope_order, use_minion,
            eps=eps)
        umac = _mac_interior(mac_pads, ng, n_cell)
        sold = s[(slice(None),) + tuple(slice(ng, ng + n_cell[t])
                                        for t in range(3))]
        snew = _update_vals(sold, umac, sedge, sflux, fupd, dt, dx,
                            is_conservative)
        if flux_comps:
            import numpy as _np
            ci = _np.asarray(flux_comps)
            return snew, tuple(sflux[d][ci] for d in range(3))
        return snew

    batch = os.environ.get("VARDEN_MKFLUX_BATCH", "1") != "0"
    pb = _Plan(n_cell, ng, heavy=True, nc=nc) if batch and nc > 1 else None
    if pb is not None and pb.ok and pb.tx >= 8:
        p = pb
        groups = [list(range(nc))]
    else:
        p = _Plan(n_cell, ng, heavy=True)
        groups = [[c] for c in range(nc)]
    if not p.ok:
        return fallback()

    scal = jnp.stack([jnp.asarray(dt, dtype), eps.astype(dtype)])
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    pbc = tuple(tuple(b) for b in phys_bc)
    yoff = p.yl // TY

    def call(ins, grp, ty, adv_k, bc_sides, yface, grid2):
        ncg = len(grp)
        fidx = tuple(i for i, c in enumerate(grp) if c in flux_comps)
        nf = len(fidx)
        kern = functools.partial(
            _mkflux_update_kernel, dx=tuple(dx), ng=ng, tx=p.tx, ty=ty,
            tz=p.tz, phys_bc=pbc, adv_bc=adv_k, is_vel=is_vel,
            is_cons=tuple(is_conservative[c] for c in grp),
            slope_order=slope_order, use_minion=use_minion,
            bc_sides=bc_sides, have_force=have_force, have_rhs=have_rhs,
            have_fupd=have_fupd, flux_idx=fidx, yface=yface)
        tags = [t for t, _ in ins]
        if grid2:
            # interior force block: element-indexed (the x offset SLAB is
            # not a tile multiple), y offset keeps the multiply outermost
            fspec = pl.BlockSpec(
                (pl.Element(ncg), pl.Element(p.tx), pl.Element(TY),
                 pl.Element(p.tz)),
                lambda i, j: (0, p.xl + i * p.tx, (j + yoff) * TY, 0),
                memory_space=pltpu.VMEM)
            grid = (p.nxt, p.nyt)
            spec_by_tag = {"s": _in_spec(p, ncg), "m": _in_spec(p),
                           "f": _in_spec(p, ncg), "r": _in_spec(p),
                           "fu": fspec,
                           "scal": pl.BlockSpec(memory_space=pltpu.SMEM)}
            in_specs = [spec_by_tag[t] for t in tags]
            out_specs = [_out_spec(p, ncg)]
            out_shape = [_out_shape(p, dtype, ncg)]
            if nf:
                out_specs += [_out_spec(p, nf), _out_spec(p, nf),
                              _out_spec(p, nf, zfaces=True)]
                out_shape += [_out_shape(p, dtype, nf),
                              _out_shape(p, dtype, nf),
                              _out_shape(p, dtype, nf, zfaces=True)]
        else:
            grid = (p.nxt,)
            ybs = ty + 2 * ng

            def espec(lead=None):
                dims = ([] if lead is None else [pl.Element(lead)]) + [
                    pl.Element(p.xb), pl.Element(ybs), pl.Element(p.zb)]
                if lead is None:
                    idx = lambda i: (p.xl + i * p.tx, 0, 0)
                else:
                    idx = lambda i: (0, p.xl + i * p.tx, 0, 0)
                return pl.BlockSpec(tuple(dims), idx,
                                    memory_space=pltpu.VMEM)

            fspec = pl.BlockSpec(
                (pl.Element(ncg), pl.Element(p.tx), pl.Element(ty),
                 pl.Element(p.tz)),
                lambda i: (0, p.xl + i * p.tx, 0, 0),
                memory_space=pltpu.VMEM)
            spec_by_tag = {"s": espec(ncg), "m": espec(), "f": espec(ncg),
                           "r": espec(), "fu": fspec,
                           "scal": pl.BlockSpec(memory_space=pltpu.SMEM)}
            in_specs = [spec_by_tag[t] for t in tags]

            def ospec(lead, yr, zf=0):
                return pl.BlockSpec((lead, p.tx, yr, p.tz + zf),
                                    lambda i: (0, i, 0, 0),
                                    memory_space=pltpu.VMEM)

            def oshape(lead, yr, zf=0):
                return jax.ShapeDtypeStruct((lead, p.nxi, yr, p.tz + zf),
                                            dtype)

            out_specs = [ospec(ncg, ty)]
            out_shape = [oshape(ncg, ty)]
            if nf:
                out_specs += [ospec(nf, ty), ospec(nf, ty + yface),
                              ospec(nf, ty, 1)]
                out_shape += [oshape(nf, ty), oshape(nf, ty + yface),
                              oshape(nf, ty, 1)]
        res = pl.pallas_call(
            kern, grid=grid, out_shape=out_shape, in_specs=in_specs,
            out_specs=out_specs, compiler_params=cp, interpret=interpret,
        )(*[a for _, a in ins])
        return res if nf else (res[0],)

    outs_c, slab_c = [], []
    for grp in groups:
        ncg = len(grp)
        adv_g = tuple(tuple(tuple(a) for a in adv_bc[c]) for c in grp)
        gs = slice(grp[0], grp[-1] + 1)
        ins = [("s", s[gs]), ("m", mac_pads[0]), ("m", mac_pads[1]),
               ("m", mac_pads[2])]
        if have_force:
            ins.append(("f", force[gs]))
        if have_rhs:
            ins.append(("r", mac_rhs))
        if have_fupd:
            ins.append(("fu", fupd[gs]))
        ins.append(("scal", scal))
        outs_c.append(call(ins, grp, TY, _interior_adv_bc(adv_g, ncg), BC_Z,
                           0, True))
        per_side = {}
        for side, ty in ((0, p.yl), (1, p.yh)):
            ins_s = []
            for tag, a in ins:
                if tag == "fu":  # fupd: interior-sized, slice rows w/o halo
                    n1_ = a.shape[2]
                    ins_s.append((tag, _take(a, 2, slice(0, ty) if side == 0
                                             else slice(n1_ - ty, n1_))))
                elif tag == "scal":
                    ins_s.append((tag, a))
                else:
                    ins_s.append((tag, _yslab_take(a, side, ty, ng,
                                                   a.ndim - 3)))
            bcs = frozenset({(1, side)} | BC_Z)
            per_side[side] = call(ins_s, grp, ty,
                                  _y_slab_adv_bc(adv_g, side, ncg), bcs,
                                  1 if side == 1 else 0, False)
        slab_c.append(per_side)

    def cat(i):
        # i=0: snew from every group; i>=1: flux outputs exist only for
        # groups containing flux_comps members
        parts = [o[i] for o in outs_c if len(o) > i]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def cat_slab(side, i):
        parts = [sc[side][i] for sc in slab_c if len(sc[side]) > i]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def xslab(side, width):
        i0 = 0 if side == 0 else n0 - width
        ss = _crop_pad(s, 0, i0, i0 + width, ng)
        ms = [_crop_pad(m, 0, i0, i0 + width, ng) for m in mac_pads]
        fs = (_crop_pad(force, 0, i0, i0 + width, ng) if have_force
              else None)
        rs = (_crop_pad(mac_rhs, 0, i0, i0 + width, ng) if have_rhs
              else None)
        ncs = (width, n1, n2)
        sedge, sflux = godunov3d.mkflux_3d(
            ss, ms, fs, rs, dt, dx, phys_bc,
            _slab_adv_bc(adv_bc, 0, side, nc), ng, ncs, is_vel,
            is_conservative, slope_order, use_minion,
            bc_sides=_slab_bc_sides(0, side), eps=eps)
        umac = _mac_interior(ms, ng, ncs)
        sold = ss[(slice(None),) + tuple(slice(ng, ng + ncs[t])
                                         for t in range(3))]
        fu = (_take(fupd, 1, slice(i0, i0 + width)) if have_fupd
              else None)
        snew = _update_vals(sold, umac, sedge, sflux, fu, dt, dx,
                            is_conservative)
        if flux_comps:
            import numpy as _np
            ci = _np.asarray(flux_comps)
            return snew, tuple(sflux[d][ci] for d in range(3))
        return snew, None

    xlo, xhi = xslab(0, p.xl), xslab(1, p.xh)
    slabs = {(0, 0): xlo[0], (0, 1): xhi[0],
             (1, 0): cat_slab(0, 0), (1, 1): cat_slab(1, 0)}
    snew = _stitch(cat(0), slabs, p, -1, 1)
    if not flux_comps:
        return snew
    sflux = tuple(
        _stitch(cat(1 + d),
                {(0, 0): xlo[1][d], (0, 1): xhi[1][d],
                 (1, 0): cat_slab(0, 1 + d), (1, 1): cat_slab(1, 1 + d)},
                p, d, 1)
        for d in range(3))
    return snew, sflux


# ---------------------------------------------------------------------------
# 2-D whole-grid kernels
# ---------------------------------------------------------------------------
#
# 2-D grids fit VMEM whole (a 512^2 padded field is ~1.3MB), so the entire
# staged velpred/mkflux pipeline runs as ONE kernel with every BC in-kernel:
# no tiling, no boundary slabs, no stitching. Every intermediate stays
# VMEM-resident instead of ~40 HBM round trips between XLA fusions.

def _vmem2d_ok(n_cell, ng, nstage):
    n0p = n_cell[0] + 2 * ng
    n1p = -(-(n_cell[1] + 2 * ng) // 128) * 128
    return nstage * (n0p + 7) // 8 * 8 * n1p * 4 < 60 * 1024 * 1024


def tiles2d_supported(n_cell, dtype, ng: int = 3) -> bool:
    if not HAVE_PALLAS or jax.default_backend() != "tpu":
        return False
    if os.environ.get("VARDEN_NO_PALLAS_GODUNOV"):
        return False
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    if min(n_cell) < 8:
        return False
    return _vmem2d_ok(n_cell, ng, 50)


def _velpred2d_kernel(u_ref, f_ref, scal_ref, umac_ref, vmac_ref, *,
                      dx, ng, n_cell, phys_bc, adv_bc, slope_order,
                      use_minion):
    from . import godunov
    umac, vmac = godunov.velpred_2d(
        u_ref[...], f_ref[...], scal_ref[0], dx, phys_bc, adv_bc, ng,
        n_cell, slope_order, use_minion)
    umac_ref[...] = umac
    vmac_ref[...] = vmac


def velpred_2d_fused(u, force, dt, dx, phys_bc, adv_bc_vel, ng, n_cell,
                     slope_order, use_minion, *, interpret=False):
    """Whole-grid fused 2-D velpred; falls back off-TPU / oversize."""
    from . import godunov
    if not interpret and not tiles2d_supported(n_cell, u.dtype, ng):
        return godunov.velpred_2d(u, force, dt, dx, phys_bc, adv_bc_vel,
                                  ng, n_cell, slope_order, use_minion)
    nx, ny = n_cell
    scal = jnp.stack([jnp.asarray(dt, u.dtype)])
    kern = functools.partial(
        _velpred2d_kernel, dx=tuple(dx), ng=ng, n_cell=tuple(n_cell),
        phys_bc=tuple(tuple(b) for b in phys_bc),
        adv_bc=tuple(tuple(tuple(a) for a in row) for row in adv_bc_vel),
        slope_order=slope_order, use_minion=use_minion)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((nx + 1, ny), u.dtype),
                   jax.ShapeDtypeStruct((nx, ny + 1), u.dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(u, force, scal)


def _mkflux2d_kernel(s_ref, mx_ref, my_ref, f_ref, rhs_ref, scal_ref,
                     ex_ref, ey_ref, fx_ref, fy_ref, *,
                     dx, ng, n_cell, phys_bc, adv_bc, is_vel, is_cons,
                     slope_order, use_minion):
    from . import godunov
    ex, ey, fx, fy = godunov.mkflux_2d(
        s_ref[...], mx_ref[...], my_ref[...], f_ref[...], rhs_ref[...],
        scal_ref[0], dx, phys_bc, adv_bc, ng, n_cell, is_vel, is_cons,
        slope_order, use_minion)
    ex_ref[...] = ex
    ey_ref[...] = ey
    fx_ref[...] = fx
    fy_ref[...] = fy


def mkflux_2d_fused(s, umac_pad, vmac_pad, force, mac_rhs, dt, dx, phys_bc,
                    adv_bc, ng, n_cell, is_vel, is_conservative, slope_order,
                    use_minion, *, interpret=False):
    """Whole-grid fused 2-D mkflux; falls back off-TPU / oversize."""
    from . import godunov
    nc = s.shape[0]
    if not interpret and not (tiles2d_supported(n_cell, s.dtype, ng)
                              and _vmem2d_ok(n_cell, ng, 50 * nc)):
        return godunov.mkflux_2d(s, umac_pad, vmac_pad, force, mac_rhs, dt,
                                 dx, phys_bc, adv_bc, ng, n_cell, is_vel,
                                 is_conservative, slope_order, use_minion)
    nx, ny = n_cell
    scal = jnp.stack([jnp.asarray(dt, s.dtype)])
    kern = functools.partial(
        _mkflux2d_kernel, dx=tuple(dx), ng=ng, n_cell=tuple(n_cell),
        phys_bc=tuple(tuple(b) for b in phys_bc),
        adv_bc=tuple(tuple(tuple(a) for a in row) for row in adv_bc),
        is_vel=is_vel, is_cons=tuple(bool(b) for b in is_conservative),
        slope_order=slope_order, use_minion=use_minion)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((nc, nx + 1, ny), s.dtype),
                   jax.ShapeDtypeStruct((nc, nx, ny + 1), s.dtype),
                   jax.ShapeDtypeStruct((nc, nx + 1, ny), s.dtype),
                   jax.ShapeDtypeStruct((nc, nx, ny + 1), s.dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(s, umac_pad, vmac_pad, force, mac_rhs, scal)
