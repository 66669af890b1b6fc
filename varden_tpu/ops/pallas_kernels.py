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

# scoped-VMEM ceiling handed to Mosaic (see pallas_godunov._VMEM_LIMIT)
_VMEM_LIMIT = int(os.environ.get("VARDEN_VMEM_LIMIT_MB", "100")) * 1024 * 1024
# the fused update kernel's scoped demand legitimately exceeds 100M at large
# extents; v5e VMEM is 128MiB/core, so give that one call most of it
_VMEM_LIMIT_WIDE = int(os.environ.get("VARDEN_VMEM_LIMIT_WIDE_MB",
                                      "120")) * 1024 * 1024


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


def _gsrb3d_block_bytes(tx, n):
    """f32 VMEM bytes of one grid block's operands (phi haloed tile, rhs,
    inv_diag, aco, out, three face-coefficient tiles), counted with TPU
    tile padding: last dim rounds to 128 lanes, second-to-last to 8
    sublanes."""
    def sz(a, b, c):
        return a * ((b + 7) // 8 * 8) * ((c + 127) // 128 * 128)
    phi = sz(tx + 2, n[1] + 2, n[2] + 2)
    cell = sz(tx, n[1], n[2])          # rhs / inv_diag / aco / out
    bx = sz(tx + 1, n[1], n[2])
    by = sz(tx, n[1] + 1, n[2])
    bz = sz(tx, n[1], n[2] + 1)
    return 4 * (phi + 4 * cell + bx + by + bz)


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
    # block counted per operand, DOUBLE-BUFFERED by the pipeline -> keep
    # under ~6MB of the 16MB budget.
    TX = None
    for t in (32, 16, 8, 4, 2, 1):
        if n[0] % t == 0 and _gsrb3d_block_bytes(t, n) < 8 * 1024 * 1024:
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
    if any(not hasattr(b, "ndim") or b.ndim == 0 for b in level.beta):
        return False  # scalar-coefficient levels use the fused XLA smoother
    if jax.default_backend() != "tpu":
        return False
    if any(s < 8 or s % 2 for s in level.n):
        return False
    if level.dm == 3:
        # a TX=1 block must fit VMEM (with pipeline double buffering)
        return _gsrb3d_block_bytes(1, level.n) < 6 * 1024 * 1024
    # whole 2-D grid (plus halo) must fit one VMEM block
    vmem = (level.n[0] + 2) * (level.n[1] + 2) * 4 * 8
    return vmem < 8 * 1024 * 1024


# ---------------------------------------------------------------------------
# Constant-coefficient Helmholtz smoother (visc_solve / diff_scalar_solve)
# ---------------------------------------------------------------------------
#
# The Helmholtz solves (reference viscsolve.f90:19-145) have SCALAR beta —
# no face-coefficient arrays exist — and at CFL-limited dt they are settled
# by a handful of smoother sweeps (mg.solve's diagonally-dominant fast
# path). The XLA smoother pays ~5x its bandwidth bound per sweep: the
# 1-ghost pad is three sequential full-array concatenates (each a relayout
# to a lane-misaligned 258-wide buffer). This kernel keeps every HBM
# operand UNPADDED (256-lane aligned) and realizes the boundary conditions
# on the VMEM tile: y/z ghosts are built in-kernel from the resident full
# extents, and the x halo comes from a clamped element window plus an
# in-kernel ghost formula at the two domain-edge tiles.

# elliptic BC codes (bc.py:35-37 + mg.BC_GHOST)
_BC_PER, _BC_NEU, _BC_DIR, _BC_GHOST = 0, 1, 2, 3


def _ghost_planes(p, axis, lo_bc, hi_bc, blo, bhi):
    """Boundary ghost planes for a VMEM-resident axis (full extent):
    DIR: quadratic face-value formula; NEU: copy; PER: wrap; GHOST: zero."""
    def take(i0, i1):
        sl = [slice(None)] * p.ndim
        sl[axis] = slice(i0, i1)
        return p[tuple(sl)]

    if lo_bc == _BC_PER:
        lo = take(-1, None)
    elif lo_bc == _BC_NEU:
        lo = take(0, 1)
    elif lo_bc == _BC_GHOST:
        lo = jnp.zeros_like(take(0, 1))
    else:
        lo = (8.0 / 3.0) * blo - 2.0 * take(0, 1) + (1.0 / 3.0) * take(1, 2)
    if hi_bc == _BC_PER:
        hi = take(0, 1)
    elif hi_bc == _BC_NEU:
        hi = take(-1, None)
    elif hi_bc == _BC_GHOST:
        hi = jnp.zeros_like(take(-1, None))
    else:
        hi = (8.0 / 3.0) * bhi - 2.0 * take(-1, None) + (1.0 / 3.0) * take(-2, -1)
    return lo, hi


def _gsrb_const_kernel_3d(coef_ref, phi_ref, rhs_ref, inv_diag_ref, aco_ref,
                          out_ref, *, tx, nblk, ell_bc, bvals, use_alpha,
                          emit):
    """One fused red+black sweep on a (tx, n1, n2) block of a batched
    constant-coefficient Helmholtz problem.

    coef_ref (SMEM, shape (4,)): beta/dx0^2, beta/dx1^2, beta/dx2^2, alpha
    (traced scalars — beta = mu*dt rides on a traced dt).
    phi_ref: element window (1, tx+2, n1, n2) whose x offset is CLAMPED to
    the array bounds; the kernel re-centers via a per-tile shift and
    replaces the missing outermost plane with the boundary ghost formula.
    """
    i = pl.program_id(1)
    n1, n2 = phi_ref.shape[2], phi_ref.shape[3]
    # x window shift: interior rows sit at [s, s+tx); s=1 except at the
    # clamped edge tiles (0 at i==0, 2 at i==nblk-1)
    s = jnp.where(i == 0, 0, jnp.where(i == nblk - 1, 2, 1))
    core = phi_ref[0, pl.ds(s, tx)]
    # neighbor planes (any valid row when unused; the where picks the ghost)
    lo_n = phi_ref[0, pl.ds(jnp.maximum(s - 1, 0), 1)]
    hi_n = phi_ref[0, pl.ds(jnp.minimum(s + tx, tx + 1), 1)]

    bdx0 = coef_ref[0]
    bdx1 = coef_ref[1]
    bdx2 = coef_ref[2]
    alpha = coef_ref[3]
    rhs = rhs_ref[0]
    inv_diag = inv_diag_ref[...]

    def lphi(c):
        """L(c) via shifted-slice neighbor arrays — every temp keeps the
        (tx, n1, n2) lane-aligned layout (a fully padded (n2+2)-wide array
        would round its lane dim up to n2+128)."""
        lo_g, hi_g = _ghost_planes(c, 0, ell_bc[0][0], ell_bc[0][1],
                                   bvals[0][0], bvals[0][1])
        xlo = jnp.where(i == 0, lo_g, lo_n)
        xhi = jnp.where(i == nblk - 1, hi_g, hi_n)
        xm = jnp.concatenate([xlo, c[:-1]], axis=0)
        xp = jnp.concatenate([c[1:], xhi], axis=0)
        ylo, yhi = _ghost_planes(c, 1, ell_bc[1][0], ell_bc[1][1],
                                 bvals[1][0], bvals[1][1])
        ym = jnp.concatenate([ylo, c[:, :-1]], axis=1)
        yp = jnp.concatenate([c[:, 1:], yhi], axis=1)
        zlo, zhi = _ghost_planes(c, 2, ell_bc[2][0], ell_bc[2][1],
                                 bvals[2][0], bvals[2][1])
        zm = jnp.concatenate([zlo, c[:, :, :-1]], axis=2)
        zp = jnp.concatenate([c[:, :, 1:], zhi], axis=2)
        out = -(bdx0 * (xp + xm - 2.0 * c)
                + bdx1 * (yp + ym - 2.0 * c)
                + bdx2 * (zp + zm - 2.0 * c))
        if use_alpha:
            out = out + alpha * aco_ref[...] * c
        return out

    if emit == "residual":
        out_ref[0] = rhs - lphi(core)
        return

    ix = jax.lax.broadcasted_iota(jnp.int32, (tx, n1, n2), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tx, n1, n2), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (tx, n1, n2), 2)
    red = ((ix + iy + iz + i * tx) % 2 == 0).astype(rhs.dtype)

    r = rhs - lphi(core)
    new_int = core + red * r * inv_diag
    r = rhs - lphi(new_int)
    out_ref[0] = new_int + (1.0 - red) * r * inv_diag


def _gsrb_const_block_bytes(tx, n):
    """f32 VMEM bytes for one block: operands (all lane-aligned — the
    kernel never materializes an (n2+2)-wide temp) plus ~6 core-sized
    live stencil temporaries (measured fit: tx=8 at 256^3)."""
    def sz(a, b, c):
        return a * ((b + 7) // 8 * 8) * ((c + 127) // 128 * 128)
    return 4 * (sz(tx + 2, n[1], n[2])            # phi window
                + 4 * sz(tx, n[1], n[2])          # rhs/inv_diag/aco/out
                + 6 * sz(tx, n[1], n[2]))         # kernel stencil temps


def gsrb_const_supported(n, ell_bc, dtype) -> bool:
    """Fused constant-coefficient sweep available? 3-D, f32-on-TPU,
    non-periodic x (the clamped window cannot wrap), tiles fit VMEM."""
    if os.environ.get("VARDEN_NO_PALLAS_GSRB") or not HAVE_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    if len(n) != 3 or dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    if ell_bc[0][0] == _BC_PER or ell_bc[0][1] == _BC_PER:
        return False
    if any(s < 8 or s % 2 for s in n):
        return False
    return _pick_const_tx(n) is not None


def _pick_const_tx(n):
    force = os.environ.get("VARDEN_GSRB_CONST_TX")
    if force:
        t = int(force)
        return t if n[0] % t == 0 and n[0] // t >= 2 else None
    for t in (32, 16, 8, 4, 2):
        if n[0] % t == 0 and n[0] // t >= 2 and \
                _gsrb_const_block_bytes(t, n) < 26 * 1024 * 1024:
            return t
    return None


def gsrb_const_sweep_3d(phi, rhs, inv_diag, coef, ell_bc, bvals,
                        aco=None, *, emit="sweep", interpret=False):
    """One fused red-black sweep of (alpha*aco - beta lap) phi = rhs
    (emit="sweep"), or the raw residual rhs - L(phi) (emit="residual").

    phi/rhs: (B, n0, n1, n2) (a leading batch axis is required — pass
    phi[None] for a single field); inv_diag/aco: (n0, n1, n2) shared across
    the batch; coef: length-4 vector [beta/dx0^2, beta/dx1^2, beta/dx2^2,
    alpha] (traced values fine). Returns updated phi, same shape.
    """
    B = phi.shape[0]
    n = phi.shape[1:]
    tx = _pick_const_tx(n)
    if tx is None:
        return None
    nblk = n[0] // tx
    use_alpha = aco is not None
    if aco is None:
        aco = inv_diag  # placeholder, unread
    kern = functools.partial(
        _gsrb_const_kernel_3d, tx=tx, nblk=nblk,
        ell_bc=tuple(tuple(b) for b in ell_bc),
        bvals=tuple(tuple(float(v) for v in bv) for bv in bvals),
        use_alpha=use_alpha, emit=emit)

    def phi_map(b, i):
        return (b, jnp.clip(i * tx - 1, 0, n[0] - (tx + 2)), 0, 0)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B,) + tuple(n), phi.dtype),
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(tuple(pl.Element(b) for b in (1, tx + 2, n[1], n[2])),
                         phi_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tx, n[1], n[2]), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, n[1], n[2]), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, n[1], n[2]), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tx, n[1], n[2]), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(coef, phi.dtype), phi, rhs, inv_diag, aco)
    return out


# ---------------------------------------------------------------------------
# Variable-coefficient (face-beta) smoother with in-kernel BCs
# ---------------------------------------------------------------------------
#
# The MAC projection operator has face-centered beta = 2/(rho_i + rho_{i-1})
# (reference mk_mac_coeffs, macproject.f90:280-401). Same design as the
# constant-coefficient kernel above: unpadded lane-aligned HBM operands,
# boundary ghosts realized on the VMEM tile, clamped x windows. emit modes:
#   "sweep"    — one fused red+black GSRB sweep
#   "residual" — rhs - L(phi)
#   "restrict" — (2x2x2 cell-average of the residual, per-block |r|_inf)
#                i.e. the V-cycle down-leg after pre-smoothing in ONE pass
#                (the separate residual/restrict passes are what made the
#                V-cycle ~3x its bandwidth bound)


def _gsrb_var_kernel_3d(phi_ref, rhs_ref, inv_diag_ref, aco_ref, bx_ref,
                        by_ref, bz_ref, out_ref, *rest, tx, nblk, ell_bc,
                        bvals, dxi2, alpha, emit):
    i = pl.program_id(1)
    n1, n2 = phi_ref.shape[2], phi_ref.shape[3]
    s = jnp.where(i == 0, 0, jnp.where(i == nblk - 1, 2, 1))
    core = phi_ref[0, pl.ds(s, tx)]
    lo_n = phi_ref[0, pl.ds(jnp.maximum(s - 1, 0), 1)]
    hi_n = phi_ref[0, pl.ds(jnp.minimum(s + tx, tx + 1), 1)]

    rhs = rhs_ref[0]
    bx = bx_ref[...]
    by = by_ref[...]
    bz = bz_ref[...]

    def lphi(c):
        lo_g, hi_g = _ghost_planes(c, 0, ell_bc[0][0], ell_bc[0][1],
                                   bvals[0][0], bvals[0][1])
        xlo = jnp.where(i == 0, lo_g, lo_n)
        xhi = jnp.where(i == nblk - 1, hi_g, hi_n)
        xm = jnp.concatenate([xlo, c[:-1]], axis=0)
        xp = jnp.concatenate([c[1:], xhi], axis=0)
        ylo, yhi = _ghost_planes(c, 1, ell_bc[1][0], ell_bc[1][1],
                                 bvals[1][0], bvals[1][1])
        ym = jnp.concatenate([ylo, c[:, :-1]], axis=1)
        yp = jnp.concatenate([c[:, 1:], yhi], axis=1)
        zlo, zhi = _ghost_planes(c, 2, ell_bc[2][0], ell_bc[2][1],
                                 bvals[2][0], bvals[2][1])
        zm = jnp.concatenate([zlo, c[:, :, :-1]], axis=2)
        zp = jnp.concatenate([c[:, :, 1:], zhi], axis=2)
        out = -(dxi2[0] * (bx[1:] * (xp - c) - bx[:-1] * (c - xm))
                + dxi2[1] * (by[:, 1:] * (yp - c) - by[:, :-1] * (c - ym))
                + dxi2[2] * (bz[:, :, 1:] * (zp - c)
                             - bz[:, :, :-1] * (c - zm)))
        if alpha != 0.0:
            out = out + alpha * aco_ref[...] * c
        return out

    if emit == "residual":
        out_ref[0] = rhs - lphi(core)
        return
    if emit == "restrict":
        r = rhs - lphi(core)
        max_ref = rest[0]
        max_ref[0, i] = jnp.max(jnp.abs(r))
        # 2x2x2 average WITHOUT strided vector slices (Mosaic supports
        # neither 3-D gathers nor stride-2 extracts): the major axis pairs
        # by static row indexing; the sublane/lane axes contract against a
        # pair-averaging matrix on the MXU. Two dot_generals, no transposes:
        # (a,b,c) -contract b-> (a,c,b/2) -contract c-> (a,b/2,c/2).
        r = jnp.concatenate([0.5 * (r[2 * k:2 * k + 1] + r[2 * k + 1:2 * k + 2])
                             for k in range(tx // 2)], axis=0)

        def halve(m):
            row = jax.lax.broadcasted_iota(jnp.int32, (m, m // 2), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (m, m // 2), 1)
            return 0.5 * (row // 2 == col).astype(r.dtype)

        r = jax.lax.dot_general(r, halve(n1), (((1,), (0,)), ((), ())),
                                preferred_element_type=r.dtype,
                                precision=jax.lax.Precision.HIGHEST)
        r = jax.lax.dot_general(r, halve(n2), (((1,), (0,)), ((), ())),
                                preferred_element_type=r.dtype,
                                precision=jax.lax.Precision.HIGHEST)
        out_ref[0] = r
        return

    ix = jax.lax.broadcasted_iota(jnp.int32, (tx, n1, n2), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tx, n1, n2), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (tx, n1, n2), 2)
    red = ((ix + iy + iz + i * tx) % 2 == 0).astype(rhs.dtype)
    inv_diag = inv_diag_ref[...]

    r = rhs - lphi(core)
    new_int = core + red * r * inv_diag
    r = rhs - lphi(new_int)
    out_ref[0] = new_int + (1.0 - red) * r * inv_diag


def _gsrb_var_block_bytes(tx, n):
    def sz(a, b, c):
        return a * ((b + 7) // 8 * 8) * ((c + 127) // 128 * 128)
    return 4 * (sz(tx + 2, n[1], n[2])                 # phi window
                + 4 * sz(tx, n[1], n[2])               # rhs/diag/aco/out
                + sz(tx + 1, n[1], n[2])               # bx
                + sz(tx, n[1] + 1, n[2])               # by
                + sz(tx, n[1], n[2] + 1)               # bz (lane-padded)
                + 6 * sz(tx, n[1], n[2]))              # stencil temps


def _pick_var_tx(n):
    force = os.environ.get("VARDEN_GSRB_VAR_TX")
    if force:
        t = int(force)
        return t if n[0] % t == 0 and n[0] // t >= 2 else None
    for t in (16, 8, 4, 2):
        if n[0] % t == 0 and n[0] // t >= 2 and \
                _gsrb_var_block_bytes(t, n) < 30 * 1024 * 1024:
            return t
    return None


def gsrb_var_supported(n, ell_bc, dtype) -> bool:
    """Fused variable-coefficient sweep available? (3-D, f32-on-TPU,
    non-periodic x, even dims, tiles fit VMEM.)"""
    if os.environ.get("VARDEN_NO_PALLAS_GSRB") or not HAVE_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    if len(n) != 3 or dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    if ell_bc[0][0] == _BC_PER or ell_bc[0][1] == _BC_PER:
        return False
    if any(s < 8 or s % 2 for s in n):
        return False
    return _pick_var_tx(n) is not None


def gsrb_var_sweep_3d(phi, rhs, inv_diag, beta, dx, ell_bc, bvals,
                      aco=None, alpha=0.0, *, emit="sweep", interpret=False):
    """Fused variable-beta GSRB sweep / residual / residual+restrict.

    phi/rhs/inv_diag/aco: (n0, n1, n2) (no batch axis — the MAC/composite
    solves are single-field); beta: 3 face arrays. For emit="restrict"
    returns (coarse_residual (n/2), |r|_inf); else the same-shape result.
    """
    n = phi.shape
    tx = _pick_var_tx(n)
    if tx is None:
        return None
    if emit == "restrict" and (tx % 2 or any(s % 2 for s in n)):
        return None
    nblk = n[0] // tx
    dxi2 = tuple(1.0 / (float(h) * float(h)) for h in dx)
    kern = functools.partial(
        _gsrb_var_kernel_3d, tx=tx, nblk=nblk,
        ell_bc=tuple(tuple(b) for b in ell_bc),
        bvals=tuple(tuple(float(v) for v in bv) for bv in bvals),
        dxi2=dxi2, alpha=float(alpha), emit=emit)
    if aco is None:
        aco = inv_diag  # placeholder, unread when alpha == 0

    def phi_map(b, i):
        return (b, jnp.clip(i * tx - 1, 0, n[0] - (tx + 2)), 0, 0)

    in_specs = [
        pl.BlockSpec(tuple(pl.Element(b) for b in (1, tx + 2, n[1], n[2])),
                     phi_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tx, n[1], n[2]), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tx, n[1], n[2]), lambda b, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tx, n[1], n[2]), lambda b, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(pl.Element(b) for b in (tx + 1, n[1], n[2])),
                     lambda b, i: (i * tx, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tx, n[1] + 1, n[2]), lambda b, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tx, n[1], n[2] + 1), lambda b, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    if emit == "restrict":
        out = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct(
                (1, n[0] // 2, n[1] // 2, n[2] // 2), phi.dtype),
                jax.ShapeDtypeStruct((1, nblk), phi.dtype)],
            grid=(1, nblk),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, tx // 2, n[1] // 2, n[2] // 2),
                             lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nblk), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM)],
            compiler_params=cp,
            interpret=interpret,
        )(phi[None], rhs[None], inv_diag, aco, beta[0], beta[1], beta[2])
        return out[0][0], jnp.max(out[1])
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,) + tuple(n), phi.dtype),
        grid=(1, nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tx, n[1], n[2]), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=cp,
        interpret=interpret,
    )(phi[None], rhs[None], inv_diag, aco, beta[0], beta[1], beta[2])
    return out[0]


# ---------------------------------------------------------------------------
# Conservative/convective update (reference update_3d, src/update.f90:186-278)
# ---------------------------------------------------------------------------
#
# snew = sold - dt*(u·grad s | div flux) + dt*force reads ~16 arrays (three
# face-centered edge/flux fields per component plus the MAC field); the XLA
# form pays for lane-misaligned (n+1)-face temporaries and partial fusion.
# One pass over x-tiles with everything VMEM-resident.


def _update_kernel_3d(scal_ref, sold_ref, f_ref, ux_ref, uy_ref, uz_ref,
                      ex_ref, ey_ref, ez_ref, fx_ref, fy_ref, fz_ref,
                      out_ref, *, dxi, is_cons, nc):
    dt = scal_ref[0]
    outs = []
    ux = ux_ref[...]
    uy = uy_ref[...]
    uz = uz_ref[...]
    for c in range(nc):
        if is_cons[c]:
            adv = (dxi[0] * (fx_ref[c, 1:] - fx_ref[c, :-1])
                   + dxi[1] * (fy_ref[c, :, 1:] - fy_ref[c, :, :-1])
                   + dxi[2] * (fz_ref[c, :, :, 1:] - fz_ref[c, :, :, :-1]))
        else:
            adv = (dxi[0] * 0.5 * (ux[1:] + ux[:-1])
                   * (ex_ref[c, 1:] - ex_ref[c, :-1])
                   + dxi[1] * 0.5 * (uy[:, 1:] + uy[:, :-1])
                   * (ey_ref[c, :, 1:] - ey_ref[c, :, :-1])
                   + dxi[2] * 0.5 * (uz[:, :, 1:] + uz[:, :, :-1])
                   * (ez_ref[c, :, :, 1:] - ez_ref[c, :, :, :-1]))
        outs.append(sold_ref[c] - dt * adv + dt * f_ref[c])
    out_ref[...] = jnp.stack(outs)


def _update_tx(n, nc):
    """Largest x tile whose VMEM block set fits the scoped budget.

    The binding constraint at large extents is LANE PADDING: a z-face
    block's (n2+1) lane extent rounds up to a 128 multiple (385 -> 512),
    so the naive bytes model under-counts by up to 1.33x — this model
    rounds sublane (second-minor) extents to 8 and lane (minor) extents
    to 128 like Mosaic does, and budgets half the 100MB scoped limit for
    the grid pipeline's double buffering."""
    def pad(s):  # (sub, lane) padded plane size
        return -(-s[-2] // 8) * 8 * (-(-s[-1] // 128) * 128)

    def blk_bytes(tx):
        cells = 2 * nc * tx * pad((n[1], n[2]))          # sold, force
        out = nc * tx * pad((n[1], n[2]))
        xf = (tx + 1) * pad((n[1], n[2]))
        yf = tx * pad((n[1] + 1, n[2]))
        zf = tx * pad((n[1], n[2] + 1))
        faces = (xf + yf + zf) * (1 + 2 * nc)            # umac + sedge + flux
        return (cells + out + faces) * 4

    # Measured in-program scoped demand runs up to ~4x this block-set model
    # (e.g. 101.3M at 256^3/nc=2/tx=4, 108.1M at 384^3/nc=2/tx=2 — XLA's
    # stack accounting inside a large step program exceeds the standalone
    # figure), so gate at WIDE_LIMIT/4 and compile with the WIDE ceiling.
    budget = _VMEM_LIMIT_WIDE // 4
    for tx in (8, 4, 2, 1):
        if n[0] % tx == 0 and blk_bytes(tx) <= budget:
            return tx
    return 0


def update_supported(n, dtype, nc=4) -> bool:
    if os.environ.get("VARDEN_NO_PALLAS_UPDATE") or not HAVE_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    if len(n) != 3 or dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    return min(n[1:]) >= 8 and _update_tx(n, nc) > 0


def update_3d(sold, umac, sedge, flux, force, dt, dx, is_cons, *,
              interpret=False):
    """Fused snew update. sold/force: (nc, *n); sedge[d]/flux[d]:
    (nc, faces); umac[d]: (faces)."""
    nc = sold.shape[0]
    n = sold.shape[1:]
    tx = _update_tx(n, nc) if not interpret else (4 if n[0] % 4 == 0 else 2)
    nblk = n[0] // tx
    kern = functools.partial(
        _update_kernel_3d, dxi=tuple(1.0 / float(h) for h in dx),
        is_cons=tuple(bool(b) for b in is_cons), nc=nc)
    scal = jnp.stack([jnp.asarray(dt, sold.dtype)])

    def cell(lead):
        return pl.BlockSpec((lead, tx, n[1], n[2]), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    def xface(lead=None):
        if lead is None:
            return pl.BlockSpec(
                tuple(pl.Element(b) for b in (tx + 1, n[1], n[2])),
                lambda i: (i * tx, 0, 0), memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            tuple(pl.Element(b) for b in (lead, tx + 1, n[1], n[2])),
            lambda i: (0, i * tx, 0, 0), memory_space=pltpu.VMEM)

    def yface(lead=None):
        shape = (tx, n[1] + 1, n[2])
        if lead is None:
            return pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((lead,) + shape, lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    def zface(lead=None):
        shape = (tx, n[1], n[2] + 1)
        if lead is None:
            return pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((lead,) + shape, lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct((nc,) + tuple(n), sold.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  cell(nc), cell(nc),
                  xface(), yface(), zface(),
                  xface(nc), yface(nc), zface(nc),
                  xface(nc), yface(nc), zface(nc)],
        out_specs=cell(nc),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_WIDE),
        interpret=interpret,
    )(scal, sold, force, umac[0], umac[1], umac[2],
      sedge[0], sedge[1], sedge[2], flux[0], flux[1], flux[2])
    return out


# ---------------------------------------------------------------------------
# Nodal (FEM dense-stencil) kernels
# ---------------------------------------------------------------------------

def _nodal_factored_kernel_3d(phi_ref, sig_ref, rhs_ref, inv_diag_ref,
                              out_ref, *, dxs, omega, emit):
    """Fused FACTORED nodal FEM pass on one haloed tile.

    Same interface/semantics as the dense kernel below, but computes
    A phi by the factored algorithm of solvers/nodal._factored_apply —
    each direction's element-stiffness term is rank-1 along its own axis
    tensored with 1-D mass matrices — ~3x fewer FLOPs than the 64-term
    dense stencil, with every intermediate VMEM-resident (the XLA form
    materializes ~15 full node arrays to HBM per apply).

    phi_ref: (TX+2, N1+2, N2+2) nodes, ghosts realized (periodic wrap /
    zero — physical-side sigma is zero so those values are unread).
    sig_ref: (TX+1, N1+1, N2+1) shifted-padded cell sigma, sig[p] =
    sigma_cell[p-1] (zero/wrap outside). Cell index c along an axis maps
    to padded index p = c + 1; node j receives its transpose-scatter
    contributions from cells j-1 and j (pad indices j and j+1).
    """
    phi = phi_ref[...]
    sig = sig_ref[...]
    tx = out_ref.shape[0]
    n1 = out_ref.shape[1]
    n2 = out_ref.shape[2]
    ext = (tx, n1, n2)

    def tslice(arr, axis, start, size):
        sl = [slice(None)] * 3
        sl[axis] = slice(start, start + size)
        return arr[tuple(sl)]

    acc = None
    for d in range(3):
        tangs = [t for t in range(3) if t != d]
        # undivided node difference along d, cell-indexed (ext[d]+1 cells)
        g = tslice(phi, d, 1, ext[d] + 1) - tslice(phi, d, 0, ext[d] + 1)
        # tangential corner gathers: cell c_t takes node c_t + q_t
        # (pad index p_t + q_t), ext[t]+1 cells per tangential axis
        corners = {}
        for q in ((0, 0), (0, 1), (1, 0), (1, 1)):
            v = g
            for qi, t in zip(q, tangs):
                v = tslice(v, t, qi, ext[t] + 1)
            corners[q] = v
        # sequential 1-D mass transform [[2,1],[1,2]] per tangential axis
        for ti in range(2):
            new = {}
            for q in corners:
                flip = tuple(1 - qq if i == ti else qq
                             for i, qq in enumerate(q))
                new[q] = 2.0 * corners[q] + corners[flip]
            corners = new
        scale = 1.0 / dxs[d]
        for t in tangs:
            scale = scale * (dxs[t] / 6.0)
        # sigma scale + tangential scatter (node j_t <- cell j_t - q_t,
        # i.e. pad index 1 - q_t + j_t) + accumulate
        r = None
        for q, v in corners.items():
            w = (scale * sig) * v
            for qi, t in zip(q, tangs):
                w = tslice(w, t, 1 - qi, ext[t])
            r = w if r is None else r + w
        # transpose difference along d: out[j] = r[cell j-1] - r[cell j]
        contrib = tslice(r, d, 0, ext[d]) - tslice(r, d, 1, ext[d])
        acc = contrib if acc is None else acc + contrib

    if emit == "apply":
        out_ref[...] = acc
    elif emit == "residual":
        out_ref[...] = rhs_ref[...] - acc
    else:
        center = phi[1:-1, 1:-1, 1:-1]
        out_ref[...] = center + omega * (rhs_ref[...] - acc) * inv_diag_ref[...]


def _nodal3d_block_bytes(tx, ns):
    """Estimated VMEM bytes for one grid block: operands plus kernel stack
    of the FACTORED kernel (~14 live (tx+1)-extent slabs: g, 4 corners
    through the mass transforms, the scatter accumulator, partial sums —
    calibrated so the VERIFIED configs pass: TX=1 at 257^3 nodes, TX=4 at
    129^3; TX=16 at 257^3 fails Mosaic)."""
    def sz(a, b, c):
        return a * ((b + 7) // 8 * 8) * ((c + 127) // 128 * 128)
    phi = sz(tx + 2, ns[1] + 2, ns[2] + 2)
    sig = sz(tx + 1, ns[1] + 1, ns[2] + 1)
    cell = sz(tx, ns[1], ns[2])        # rhs / inv_diag / out
    stack = 14 * sz(tx + 1, ns[1] + 1, ns[2] + 1)
    return 4 * (phi + sig + 3 * cell + stack)


def nodal_sweep_3d(phi_pad, sig_np, rhs, inv_diag, dxs, omega=0.85,
                   emit="jacobi", *, interpret=False):
    """One fused factored nodal pass. phi_pad: (N+2) node array with
    ghosts; sig_np: (N+1) shifted-padded cell sigma; returns N-node array.

    The first axis is tiled; when the node count is not a TX multiple
    (physical axes have n+1 nodes) the operands are zero-padded high — the
    padded rows compute zeros that are sliced off."""
    ns = rhs.shape
    TX = None
    for t in (16, 8, 4, 2, 1):
        if _nodal3d_block_bytes(t, ns) < 14 * 1024 * 1024:
            TX = t
            break
    if TX is None:
        return None
    n0p = -(-ns[0] // TX) * TX
    if n0p != ns[0]:
        ext = n0p - ns[0]

        def padx(a, tot):
            return jnp.concatenate(
                [a, jnp.zeros((tot - a.shape[0],) + a.shape[1:], a.dtype)], 0)

        phi_pad = padx(phi_pad, n0p + 2)
        sig_np = padx(sig_np, n0p + 1)
        rhs = padx(rhs, n0p)
        inv_diag = padx(inv_diag, n0p)
    grid = (n0p // TX,)
    kern = functools.partial(_nodal_factored_kernel_3d, dxs=tuple(dxs),
                             omega=float(omega), emit=emit)

    def espec(bs, stride):
        return pl.BlockSpec(tuple(pl.Element(b) for b in bs),
                            lambda i: (i * stride, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n0p,) + ns[1:], rhs.dtype),
        grid=grid,
        in_specs=[
            espec((TX + 2, ns[1] + 2, ns[2] + 2), TX),
            espec((TX + 1, ns[1] + 1, ns[2] + 1), TX),
            espec((TX, ns[1], ns[2]), TX),
            espec((TX, ns[1], ns[2]), TX),
        ],
        out_specs=pl.BlockSpec((TX, ns[1], ns[2]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phi_pad, sig_np, rhs, inv_diag)
    return out[:ns[0]] if n0p != ns[0] else out


def nodal_supported(level) -> bool:
    """Pallas nodal path available? (3-D, unmasked, big enough, on TPU).

    Default-on since the kernel switched to the FACTORED in-kernel
    algorithm (the earlier dense 64-term variant was VPU-bound and ~9%
    slower end-to-end than the factored XLA apply; the factored kernel
    keeps its ~3x FLOP advantage AND the VMEM-resident intermediates).
    VARDEN_NO_PALLAS_NODAL=1 opts out."""
    if os.environ.get("VARDEN_NO_PALLAS_NODAL"):
        return False
    if not HAVE_PALLAS or jax.default_backend() != "tpu":
        return False
    if level.dm != 3 or level.mask is not None:
        return False
    ns = tuple(level.n[d] if level.pmask[d] else level.n[d] + 1
               for d in range(3))
    if any(s < 8 for s in ns):
        return False
    return _nodal3d_block_bytes(1, ns) < 14 * 1024 * 1024
