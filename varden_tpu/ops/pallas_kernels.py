"""Pallas TPU kernels for the multigrid hot loops.

The reference's manycore performance layer is loop tiling + OpenMP
(src_tiled/, SURVEY.md §2a'); its TPU equivalent is Pallas block tiling. The
kernel here fuses a full red-black Gauss-Seidel sweep (both colors) of the
cell-centered smoother — for the Poisson form (alpha=0: MAC projection) AND
the Helmholtz form (alpha!=0: visc_solve/diff_scalar_solve) — into one
VMEM-resident pass: phi/rhs/diag/beta are read from HBM once per sweep
instead of ~2 operator applications' worth of intermediate traffic.

Tiles carry a 1-cell halo via overlapping input blocks; the black half-sweep
uses red values updated within the tile (tile-boundary neighbors keep their
pre-sweep red values — a tiled hybrid GSRB, an equally valid smoother).
Falls back to the jnp path off-TPU or for unsupported shapes.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _splice_interior_3d(phi, new_int):
    """Rebuild the haloed tile with ``new_int`` as interior and phi's ghost
    ring kept — pure concatenates (the earlier pad+ring-mask form hit a
    Mosaic lowering bug in 2-D)."""
    mid = jnp.concatenate([phi[1:-1, 1:-1, 0:1], new_int,
                           phi[1:-1, 1:-1, -1:]], axis=2)
    mid = jnp.concatenate([phi[1:-1, 0:1, :], mid, phi[1:-1, -1:, :]], axis=1)
    return jnp.concatenate([phi[0:1, :, :], mid, phi[-1:, :, :]], axis=0)


def _splice_interior_2d(phi, new_int):
    mid = jnp.concatenate([phi[1:-1, 0:1], new_int, phi[1:-1, -1:]], axis=1)
    return jnp.concatenate([phi[0:1, :], mid, phi[-1:, :]], axis=0)


def _gsrb_kernel_3d(phi_ref, rhs_ref, inv_diag_ref, bx_ref, by_ref, bz_ref,
                    aco_ref, parity_ref, out_ref, *, dxi2, alpha):
    """One fused red+black sweep on a (TX+2, TY+2, TZ+2) haloed phi tile.

    b*_ref are face coefficients on the tile: bx (TX+1, TY, TZ) etc.
    aco_ref: cell coefficient for the alpha term (alpha=0 passes rhs again,
    unread). parity_ref: SMEM scalar with the global parity of the tile
    origin.
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
        # alpha*aco*p - div(beta grad p) via flux differences on the haloed
        # tile — exactly the unfused cc_apply (ghosts realize the BCs)
        c = p[1:-1, 1:-1, 1:-1]
        xm = bx[:-1, :, :] * (c - p[0:-2, 1:-1, 1:-1])
        xp = bx[1:, :, :] * (p[2:, 1:-1, 1:-1] - c)
        ym = by[:, :-1, :] * (c - p[1:-1, 0:-2, 1:-1])
        yp = by[:, 1:, :] * (p[1:-1, 2:, 1:-1] - c)
        zm = bz[:, :, :-1] * (c - p[1:-1, 1:-1, 0:-2])
        zp = bz[:, :, 1:] * (p[1:-1, 1:-1, 2:] - c)
        out = -(dxi2[0] * (xp - xm) + dxi2[1] * (yp - ym)
                + dxi2[2] * (zp - zm))
        if alpha != 0.0:
            out = out + alpha * aco_ref[...] * c
        return out

    # residual-form half sweeps: phi += color * (rhs - L phi) / diag.
    # (Right fixed point even where ghost values lag within the sweep.)
    r = rhs - lphi(phi)
    interior = phi[1:-1, 1:-1, 1:-1]
    new_int = interior + red * r * inv_diag

    p2 = _splice_interior_3d(phi, new_int)
    r = rhs - lphi(p2)
    out_ref[...] = new_int + (1.0 - red) * r * inv_diag


def gsrb_sweep_3d(phi_pad, rhs, inv_diag, beta, dx, aco=None, alpha=0.0,
                  *, interpret=False):
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
    # block ~ (TX+2) * (n1+2) * (n2+2) * 4B * ~8 operands, DOUBLE-BUFFERED
    # by the pipeline -> keep the estimate under ~4MB of the 16MB budget.
    TX = None
    for t in (32, 16, 8, 4, 2, 1):
        if n[0] % t == 0:
            vmem = (t + 2) * (n[1] + 2) * (n[2] + 2) * 4 * 8
            if vmem < 4 * 1024 * 1024:
                TX = t
                break
    if TX is None:
        return None  # caller falls back to the unfused path
    grid = (n[0] // TX,)

    kern = functools.partial(_gsrb_kernel_3d, dxi2=dxi2, alpha=float(alpha))

    def espec(bs):
        # element-indexed windows (may overlap along the tiled axis)
        return pl.BlockSpec(tuple(pl.Element(b) for b in bs),
                            lambda i: (i * TX, 0, 0),
                            memory_space=pltpu.VMEM)

    if aco is None:
        aco = rhs  # placeholder; unread when alpha == 0
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
            espec((TX, n[1], n[2])),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TX, n[1], n[2]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phi_pad, rhs, inv_diag, beta[0], beta[1], beta[2], aco,
      jnp.zeros((1,), jnp.int32))
    return out


def _gsrb_kernel_2d(phi_ref, rhs_ref, inv_diag_ref, bx_ref, by_ref, aco_ref,
                    out_ref, *, dxi2, alpha):
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
        out = -(dxi2[0] * (xp - xm) + dxi2[1] * (yp - ym))
        if alpha != 0.0:
            out = out + alpha * aco_ref[...] * c
        return out

    r = rhs - lphi(phi)
    interior = phi[1:-1, 1:-1]
    new_int = interior + red * r * inv_diag

    p2 = _splice_interior_2d(phi, new_int)
    r = rhs - lphi(p2)
    out_ref[...] = new_int + (1.0 - red) * r * inv_diag


def gsrb_sweep_2d(phi_pad, rhs, inv_diag, beta, dx, aco=None, alpha=0.0,
                  *, interpret=False):
    """One fused 2-D red-black sweep; whole arrays as single VMEM blocks."""
    n = rhs.shape
    dxi2 = tuple(1.0 / (h * h) for h in dx)
    kern = functools.partial(_gsrb_kernel_2d, dxi2=dxi2, alpha=float(alpha))
    if aco is None:
        aco = rhs  # placeholder; unread when alpha == 0
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(n, rhs.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phi_pad, rhs, inv_diag, beta[0], beta[1], aco)


def gsrb_supported(level) -> bool:
    """Pallas path available for this MG level?"""
    if os.environ.get("VARDEN_NO_PALLAS_GSRB"):
        return False
    if not HAVE_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    if any(s < 8 or s % 2 for s in level.n):
        return False
    if level.dm == 3:
        # tangential plane must fit VMEM with double buffering
        vmem = 3 * (level.n[1] + 2) * (level.n[2] + 2) * 4 * 8
        return vmem < 4 * 1024 * 1024
    # whole 2-D grid (plus halo) must fit one VMEM block
    vmem = (level.n[0] + 2) * (level.n[1] + 2) * 4 * 8
    return vmem < 8 * 1024 * 1024
