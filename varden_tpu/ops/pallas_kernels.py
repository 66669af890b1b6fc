"""Pallas TPU kernels for the multigrid hot loops.

The reference's manycore performance layer is loop tiling + OpenMP
(src_tiled/, SURVEY.md §2a'); its TPU equivalent is Pallas block tiling. The
first kernel here fuses a full red-black Gauss-Seidel sweep (both colors) of
the cell-centered smoother into one VMEM-resident pass: phi/rhs/diag/beta are
read from HBM once per sweep instead of ~2 operator applications' worth of
intermediate traffic.

Tiles carry a 1-cell halo via overlapping input blocks; the black half-sweep
uses red values updated within the tile (tile-boundary neighbors keep their
pre-sweep red values — a tiled hybrid GSRB, an equally valid smoother).
Falls back to the jnp path off-TPU or for unsupported shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _gsrb_kernel_3d(phi_ref, rhs_ref, inv_diag_ref, bx_ref, by_ref, bz_ref,
                    parity_ref, out_ref, *, dxi2):
    """One fused red+black sweep on a (TX+2, TY+2, TZ+2) haloed phi tile.

    b*_ref are face coefficients on the tile: bx (TX+1, TY, TZ) etc.
    parity_ref: SMEM scalar with the global parity of the tile origin.
    """
    phi = phi_ref[...]
    rhs = rhs_ref[...]
    inv_diag = inv_diag_ref[...]
    bx = bx_ref[...]
    by = by_ref[...]
    bz = bz_ref[...]
    tx, ty, tz = rhs.shape

    ix = jax.lax.broadcasted_iota(jnp.int32, (tx, ty, tz), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tx, ty, tz), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (tx, ty, tz), 2)
    par = (ix + iy + iz + parity_ref[0]) % 2
    red = (par == 0).astype(phi.dtype)

    def lphi(p):
        # -div(beta grad p) via flux differences on the haloed tile — exactly
        # the unfused cc_apply for alpha=0 (ghosts realize the BCs)
        c = p[1:-1, 1:-1, 1:-1]
        xm = bx[:-1, :, :] * (c - p[0:-2, 1:-1, 1:-1])
        xp = bx[1:, :, :] * (p[2:, 1:-1, 1:-1] - c)
        ym = by[:, :-1, :] * (c - p[1:-1, 0:-2, 1:-1])
        yp = by[:, 1:, :] * (p[1:-1, 2:, 1:-1] - c)
        zm = bz[:, :, :-1] * (c - p[1:-1, 1:-1, 0:-2])
        zp = bz[:, :, 1:] * (p[1:-1, 1:-1, 2:] - c)
        return -(dxi2[0] * (xp - xm) + dxi2[1] * (yp - ym)
                 + dxi2[2] * (zp - zm))

    # residual-form half sweeps: phi += color * (rhs - L phi) / diag.
    # (Right fixed point even where ghost values lag within the sweep.)
    r = rhs - lphi(phi)
    interior = phi[1:-1, 1:-1, 1:-1]
    new_int = interior + red * r * inv_diag

    # rebuild the haloed tile scatter-free: pad the updated interior and
    # splice the original ghost ring back via a mask
    px, py, pz = phi.shape
    jx = jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 0)
    jy = jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 1)
    jz = jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 2)
    ring = ((jx == 0) | (jx == px - 1) | (jy == 0) | (jy == py - 1)
            | (jz == 0) | (jz == pz - 1)).astype(phi.dtype)
    p2 = jnp.pad(new_int, ((1, 1), (1, 1), (1, 1))) + ring * phi

    r = rhs - lphi(p2)
    out_ref[...] = new_int + (1.0 - red) * r * inv_diag


def gsrb_sweep_3d(phi_pad, rhs, inv_diag, beta, dx, *, interpret=False):
    """One fused red-black sweep. phi_pad: (n+2)^3 with ghosts realized;
    returns the updated interior (n^3).

    The off-diagonal update uses phi's ghosts as-is (the caller re-pads
    between sweeps), matching the unfused gsrb up to tile-boundary ordering.
    """
    n = rhs.shape
    dtype = rhs.dtype
    dxi2 = tuple(1.0 / (h * h) for h in dx)

    # Tile the FIRST axis only; the last two block dims must equal the full
    # array dims (TPU lowering constraint for unaligned windows). VMEM per
    # block ~ (TX+2) * (n1+2) * (n2+2) * 4B * ~7 operands, DOUBLE-BUFFERED
    # by the pipeline -> keep the estimate under ~4MB of the 16MB budget.
    TX = None
    for t in (32, 16, 8, 4, 2, 1):
        if n[0] % t == 0:
            vmem = (t + 2) * (n[1] + 2) * (n[2] + 2) * 4 * 7
            if vmem < 4 * 1024 * 1024:
                TX = t
                break
    if TX is None:
        return None  # caller falls back to the unfused path
    grid = (n[0] // TX,)

    kern = functools.partial(_gsrb_kernel_3d, dxi2=dxi2)

    def espec(bs):
        # element-indexed windows (may overlap along the tiled axis)
        return pl.BlockSpec(tuple(pl.Element(b) for b in bs),
                            lambda i: (i * TX, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(n, dtype),
        grid=grid,
        in_specs=[
            espec((TX + 2, n[1] + 2, n[2] + 2)),
            espec((TX, n[1], n[2])),
            espec((TX, n[1], n[2])),
            espec((TX + 1, n[1], n[2])),
            espec((TX, n[1] + 1, n[2])),
            espec((TX, n[1], n[2] + 1)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TX, n[1], n[2]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phi_pad, rhs, inv_diag, beta[0], beta[1], beta[2],
      jnp.zeros((1,), jnp.int32))
    return out


def _gsrb_kernel_2d(phi_ref, rhs_ref, inv_diag_ref, bx_ref, by_ref,
                    out_ref, *, dxi2):
    """Single-block 2-D fused red+black sweep (whole grid in VMEM)."""
    phi = phi_ref[...]
    rhs = rhs_ref[...]
    inv_diag = inv_diag_ref[...]
    bx = bx_ref[...]
    by = by_ref[...]
    tx, ty = rhs.shape

    ix = jax.lax.broadcasted_iota(jnp.int32, (tx, ty), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tx, ty), 1)
    red = ((ix + iy) % 2 == 0).astype(phi.dtype)

    def lphi(p):
        c = p[1:-1, 1:-1]
        xm = bx[:-1, :] * (c - p[0:-2, 1:-1])
        xp = bx[1:, :] * (p[2:, 1:-1] - c)
        ym = by[:, :-1] * (c - p[1:-1, 0:-2])
        yp = by[:, 1:] * (p[1:-1, 2:] - c)
        return -(dxi2[0] * (xp - xm) + dxi2[1] * (yp - ym))

    r = rhs - lphi(phi)
    interior = phi[1:-1, 1:-1]
    new_int = interior + red * r * inv_diag

    px, py = phi.shape
    jx = jax.lax.broadcasted_iota(jnp.int32, (px, py), 0)
    jy = jax.lax.broadcasted_iota(jnp.int32, (px, py), 1)
    ring = ((jx == 0) | (jx == px - 1) | (jy == 0)
            | (jy == py - 1)).astype(phi.dtype)
    p2 = jnp.pad(new_int, ((1, 1), (1, 1))) + ring * phi

    r = rhs - lphi(p2)
    out_ref[...] = new_int + (1.0 - red) * r * inv_diag


def gsrb_sweep_2d(phi_pad, rhs, inv_diag, beta, dx, *, interpret=False):
    """One fused 2-D red-black sweep; whole arrays as single VMEM blocks."""
    n = rhs.shape
    dxi2 = tuple(1.0 / (h * h) for h in dx)
    kern = functools.partial(_gsrb_kernel_2d, dxi2=dxi2)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(n, rhs.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phi_pad, rhs, inv_diag, beta[0], beta[1])


import os

def gsrb_supported(level) -> bool:
    """Pallas path available for this MG level?"""
    if os.environ.get("VARDEN_NO_PALLAS_GSRB"):
        return False
    if not HAVE_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    if level.alpha != 0.0:
        return False
    if any(s < 8 or s % 2 for s in level.n):
        return False
    if level.dm == 3:
        # tangential plane must fit VMEM with double buffering
        vmem = 3 * (level.n[1] + 2) * (level.n[2] + 2) * 4 * 7
        return vmem < 4 * 1024 * 1024
    # NOTE: the 2-D kernel compiles in interpret mode but hits a Mosaic
    # "offset mismatch on non-concat dimension" on real TPU lowering of the
    # in-kernel pad; keep it off the production path until fixed.
    return False
