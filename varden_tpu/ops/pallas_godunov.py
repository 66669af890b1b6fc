"""Fused Pallas tiles for the 3-D Godunov hot loops.

The north-star kernels (BASELINE.json): the corner-coupled BCG predictor
(reference velpred_3d, src/velpred.f90:1776-2767) and edge-state/flux builder
(mkflux_3d, src/mkflux.f90:1186-2567) as VMEM-resident tile kernels. The
staged math is literally ops/godunov3d.py — the Win pipeline is pure jnp
slicing/arithmetic, so the SAME functions run inside the kernel on a haloed
(TX, TY, TZ) tile, keeping every intermediate (slopes, hat, double-hat
states) in VMEM instead of ~dozens of HBM round-trips between XLA fusions.

The kernel computes pure INTERIOR formulas on a 3-D tile grid; cells within
SLAB of every domain face are recomputed by the plain windowed path on thin
slabs (full boundary treatment: one-sided slope stencils + face overrides)
and spliced in. The two computations agree identically where they overlap
(domain-boundary taint reaches only ~2 cells; SLAB=4), verified in tests.

TPU block-shape rules (last two dims divisible by (8, 128) or full) shape
the tiling: the y halo block is read padded to a multiple of 8 and the z
tile is sized so the haloed read is one 128-lane block (or the full axis),
with padded output z-blocks compacted after the call.
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
SLAB = 4        # boundary slab width (cells) >= override taint depth (~2)
TX, TY = 8, 8   # x/y tile; TY must divide 8 (output block constraint)


class _Plan:
    """Static tiling geometry for one (n_cell, ng) problem."""

    def __init__(self, n_cell, ng):
        self.n = tuple(n_cell)
        self.ng = ng
        n0, n1, n2 = n_cell
        # margins: lo = SLAB, hi = SLAB + divisibility remainder
        self.xl, self.yl, self.zl = SLAB, SLAB, SLAB
        # z tile: haloed read must be one 128 block (tz <= 122) or full axis
        if n2 + 2 * ng <= 256:
            tz = n2 - 2 * SLAB
            self.zb = n2 + 2 * ng      # full padded axis in one block
            self.z_full = True
        else:
            tz = 122
            self.zb = 128
            self.z_full = False
        self.tz = tz
        self.xh = SLAB + (n0 - 2 * SLAB) % TX
        self.yh = SLAB + (n1 - 2 * SLAB) % TY
        self.zh = SLAB + (n2 - 2 * SLAB) % tz
        self.nxt = (n0 - self.xl - self.xh) // TX
        self.nyt = (n1 - self.yl - self.yh) // TY
        self.nzt = (n2 - self.zl - self.zh) // tz
        self.nxi, self.nyi = self.nxt * TX, self.nyt * TY
        self.nzi = self.nzt * tz
        # input halo blocks: y padded to 8s, x free
        self.xb = TX + 2 * ng
        self.yb = -(-(TY + 2 * ng) // 8) * 8

    @property
    def ok(self):
        n0, n1, n2 = self.n
        if min(self.nxt, self.nyt, self.nzt) < 1:
            return False
        # padded reads stay in bounds (y reads yb rows from lo offset)
        if self.yl + (self.nyt - 1) * TY + self.yb > n1 + 2 * self.ng:
            return False
        if not self.z_full and \
                self.zl + (self.nzt - 1) * self.tz + self.zb > n2 + 2 * self.ng:
            return False
        return True


def tiles_supported(n_cell, dtype) -> bool:
    if not HAVE_PALLAS or jax.default_backend() != "tpu":
        return False
    if os.environ.get("VARDEN_NO_PALLAS_GODUNOV"):
        return False
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    if min(n_cell) < 2 * SLAB + 8:
        return False
    return _Plan(n_cell, 3).ok


def _interior_adv_bc(ncomp):
    return [[(BC_INT, BC_INT)] * 3 for _ in range(ncomp)]


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
    """Splice kernel-interior + six boundary-slab arrays into the full
    field. ``slabs[(axis, side)]`` spans the full extent of all later-
    stitched axes; ``sp0`` = index of the first spatial axis in the arrays;
    ``face_axis`` = which spatial axis holds faces."""
    p = plan
    ax = [sp0, sp0 + 1, sp0 + 2]
    xs = slice(p.xl, p.n[0] - p.xh)
    ys = slice(p.yl, p.n[1] - p.yh)

    zlo, zhi = slabs[(2, 0)], slabs[(2, 1)]
    zlo = _take(_take(zlo, ax[0], xs), ax[1], ys)
    zhi = _take(_take(zhi, ax[0], xs), ax[1], ys)
    if face_axis == 2:
        zlo = _take(zlo, ax[2], slice(0, p.zl))
    out = jnp.concatenate([zlo, km, zhi], axis=ax[2])

    ylo, yhi = slabs[(1, 0)], slabs[(1, 1)]
    ylo = _take(ylo, ax[0], xs)
    yhi = _take(yhi, ax[0], xs)
    if face_axis == 1:
        ylo = _take(ylo, ax[1], slice(0, p.yl))
    out = jnp.concatenate([ylo, out, yhi], axis=ax[1])

    xlo, xhi = slabs[(0, 0)], slabs[(0, 1)]
    if face_axis == 0:
        xlo = _take(xlo, ax[0], slice(0, p.xl))
    return jnp.concatenate([xlo, out, xhi], axis=ax[0])


def _compact_z(arr, plan, zfaces):
    """Undo output z-block padding: keep the first tz (+1 face written as
    tz values each block — faces share with the next block) values of each
    128-block."""
    p = plan
    if p.z_full:
        return arr[..., :p.nzi + (0 if not zfaces else 0)]
    zdim = arr.shape[-1]
    nb = zdim // p.zb
    out = arr.reshape(arr.shape[:-1] + (nb, p.zb))[..., :p.tz]
    return out.reshape(arr.shape[:-1] + (nb * p.tz,))


def _in_spec(plan, lead=None):
    p = plan
    dims = ([] if lead is None else [pl.Element(lead)]) + [
        pl.Element(p.xb), pl.Element(p.yb), pl.Element(p.zb)]
    if p.z_full:
        zoff = lambda k: 0
    else:
        zoff = lambda k: p.zl + k * p.tz

    if lead is None:
        idx = lambda i, j, k: (p.xl + i * TX, p.yl + j * TY, zoff(k))
    else:
        idx = lambda i, j, k: (0, p.xl + i * TX, p.yl + j * TY, zoff(k))
    return pl.BlockSpec(tuple(dims), idx, memory_space=pltpu.VMEM)


def _out_spec(plan, lead=None):
    p = plan
    if lead is None:
        return pl.BlockSpec((TX, TY, p.zb if not p.z_full else p.tz),
                            lambda i, j, k: (i, j, k),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((lead, TX, TY, p.zb if not p.z_full else p.tz),
                        lambda i, j, k: (0, i, j, k),
                        memory_space=pltpu.VMEM)


def _out_shape(plan, dtype, lead=None):
    p = plan
    zdim = p.nzt * (p.zb if not p.z_full else p.tz)
    shape = (p.nxi, p.nyi, zdim)
    if lead is not None:
        shape = (lead,) + shape
    return jax.ShapeDtypeStruct(shape, dtype)


def _pad_z(a, zb):
    """Pad the last axis up to the output z-block size."""
    if a.shape[-1] == zb:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, zb - a.shape[-1])]
    return jnp.pad(a, pad)


# ---------------------------------------------------------------------------
# velpred
# ---------------------------------------------------------------------------

def _velpred_kernel(u_ref, f_ref, scal_ref, umac_ref, vmac_ref, wmac_ref, *,
                    dx, ng, tz, z0, slope_order, use_minion):
    cut = (slice(None), slice(None), slice(0, TY + 2 * ng),
           slice(z0, z0 + tz + 2 * ng))
    u = u_ref[cut]
    f = f_ref[cut]
    dt = scal_ref[0]
    eps = scal_ref[1]
    n_cell = (TX, TY, tz)
    phys_bc = ((BC_INT, BC_INT),) * 3   # unused under bc_sides=NO_BC
    macs = godunov3d.velpred_3d(
        u, f, dt, dx, phys_bc, _interior_adv_bc(3), ng, n_cell,
        slope_order, use_minion, bc_sides=NO_BC, eps=eps)
    zb = umac_ref.shape[-1]
    umac_ref[...] = _pad_z(macs[0][:TX], zb)
    vmac_ref[...] = _pad_z(macs[1][:, :TY], zb)
    wmac_ref[...] = _pad_z(macs[2][:, :, :tz], zb)


def velpred_3d_fused(u, force, dt, dx, phys_bc, adv_bc_vel, ng, n_cell,
                     slope_order, use_minion, *, interpret=False):
    """Tiled-interior + slab-boundary velpred. Returns interior MAC faces
    exactly as godunov3d.velpred_3d."""
    p = _Plan(n_cell, ng)
    n0, n1, n2 = n_cell

    umax = jnp.max(jnp.abs(u[:, ng:ng + n0, ng:ng + n1, ng:ng + n2]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)
    scal = jnp.stack([jnp.asarray(dt, u.dtype), eps.astype(u.dtype)])

    kern = functools.partial(_velpred_kernel, dx=tuple(dx), ng=ng,
                             tz=p.tz, z0=p.zl if p.z_full else 0,
                             slope_order=slope_order,
                             use_minion=use_minion)
    km = pl.pallas_call(
        kern,
        grid=(p.nxt, p.nyt, p.nzt),
        out_shape=[_out_shape(p, u.dtype) for _ in range(3)],
        in_specs=[_in_spec(p, 3), _in_spec(p, 3),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[_out_spec(p) for _ in range(3)],
        interpret=interpret,
    )(u, force, scal)
    km = [_compact_z(a, p, d == 2) for d, a in enumerate(km)]

    def slab(axis, side, width):
        i0 = 0 if side == 0 else n_cell[axis] - width
        us = _crop_pad(u, axis, i0, i0 + width, ng)
        fs = _crop_pad(force, axis, i0, i0 + width, ng)
        ncs = tuple(width if a == axis else n_cell[a] for a in range(3))
        return godunov3d.velpred_3d(
            us, fs, dt, dx, phys_bc,
            _slab_adv_bc(adv_bc_vel, axis, side, 3), ng, ncs, slope_order,
            use_minion, bc_sides=_slab_bc_sides(axis, side), eps=eps)

    widths = {(0, 0): p.xl, (0, 1): p.xh, (1, 0): p.yl, (1, 1): p.yh,
              (2, 0): p.zl, (2, 1): p.zh}
    slabs = {k: slab(k[0], k[1], w) for k, w in widths.items()}
    return tuple(
        _stitch(km[d], {k: s[d] for k, s in slabs.items()}, p, d, 0)
        for d in range(3))


# ---------------------------------------------------------------------------
# mkflux
# ---------------------------------------------------------------------------

def _mkflux_kernel(s_ref, mx_ref, my_ref, mz_ref, f_ref, rhs_ref, scal_ref,
                   ex_ref, ey_ref, ez_ref, fx_ref, fy_ref, fz_ref, *,
                   dx, ng, tz, z0, is_vel, is_cons, slope_order, use_minion):
    cut = (slice(None), slice(None), slice(0, TY + 2 * ng),
           slice(z0, z0 + tz + 2 * ng))
    s = s_ref[cut]
    f = f_ref[cut]
    cut3 = cut[1:]
    macs = [mx_ref[cut3], my_ref[cut3], mz_ref[cut3]]
    rhs = rhs_ref[cut3]
    dt = scal_ref[0]
    eps = scal_ref[1]
    n_cell = (TX, TY, tz)
    phys_bc = ((BC_INT, BC_INT),) * 3
    nc = s.shape[0]
    sedge, sflux = godunov3d.mkflux_3d(
        s, macs, f, rhs, dt, dx, phys_bc, _interior_adv_bc(nc), ng, n_cell,
        is_vel, is_cons, slope_order, use_minion, bc_sides=NO_BC, eps=eps)
    zb = ex_ref.shape[-1]
    ex_ref[...] = _pad_z(sedge[0][:, :TX], zb)
    ey_ref[...] = _pad_z(sedge[1][:, :, :TY], zb)
    ez_ref[...] = _pad_z(sedge[2][:, :, :, :tz], zb)
    fx_ref[...] = _pad_z(sflux[0][:, :TX], zb)
    fy_ref[...] = _pad_z(sflux[1][:, :, :TY], zb)
    fz_ref[...] = _pad_z(sflux[2][:, :, :, :tz], zb)


def mkflux_3d_fused(s, mac_pads, force, mac_rhs, dt, dx, phys_bc, adv_bc,
                    ng, n_cell, is_vel, is_conservative, slope_order,
                    use_minion, *, interpret=False):
    """Tiled-interior + slab-boundary mkflux. Returns (sedge, sflux) exactly
    as godunov3d.mkflux_3d."""
    nc = s.shape[0]
    p = _Plan(n_cell, ng)
    n0, n1, n2 = n_cell

    macw = mac_wins(mac_pads, ng, n_cell)
    umax = jnp.max(jnp.stack([jnp.max(jnp.abs(m.arr)) for m in macw]))
    eps = jnp.where(umax == 0.0, ABS_EPS, ABS_EPS * umax)
    scal = jnp.stack([jnp.asarray(dt, s.dtype), eps.astype(s.dtype)])

    kern = functools.partial(
        _mkflux_kernel, dx=tuple(dx), ng=ng, tz=p.tz,
        z0=p.zl if p.z_full else 0, is_vel=is_vel,
        is_cons=tuple(is_conservative), slope_order=slope_order,
        use_minion=use_minion)
    outs = pl.pallas_call(
        kern,
        grid=(p.nxt, p.nyt, p.nzt),
        out_shape=[_out_shape(p, s.dtype, nc) for _ in range(6)],
        in_specs=[_in_spec(p, nc), _in_spec(p), _in_spec(p), _in_spec(p),
                  _in_spec(p, nc), _in_spec(p),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[_out_spec(p, nc) for _ in range(6)],
        interpret=interpret,
    )(s, mac_pads[0], mac_pads[1], mac_pads[2], force, mac_rhs, scal)
    km_e = [_compact_z(a, p, d == 2) for d, a in enumerate(outs[:3])]
    km_f = [_compact_z(a, p, d == 2) for d, a in enumerate(outs[3:])]

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

    widths = {(0, 0): p.xl, (0, 1): p.xh, (1, 0): p.yl, (1, 1): p.yh,
              (2, 0): p.zl, (2, 1): p.zh}
    slabs = {k: slab(k[0], k[1], w) for k, w in widths.items()}
    sedge = tuple(
        _stitch(km_e[d], {k: s_[0][d] for k, s_ in slabs.items()}, p, d, 1)
        for d in range(3))
    sflux = tuple(
        _stitch(km_f[d], {k: s_[1][d] for k, s_ in slabs.items()}, p, d, 1)
        for d in range(3))
    return sedge, sflux
