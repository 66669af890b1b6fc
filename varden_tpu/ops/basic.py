"""Cell-update, forcing, dt-estimation and derived-field ops.

TPU-native, dimension-agnostic re-derivations of the reference's small
stencil modules: update (src/update.f90:113-278), mkforce
(src/mkforce.f90:18-404), estdt (src/estdt.f90:15-183), make_at_halftime
(src/make_at_halftime.f90:18-119), makevort (src/makevort.f90:16-120).
All functions take interior-only arrays; spatial axes are the trailing ones.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _fdiff(face_arr, d, dm):
    """hi-face minus lo-face per cell along axis d for a face array whose
    axis d has n_d+1 entries."""
    axis = face_arr.ndim - dm + d
    lo = [slice(None)] * face_arr.ndim
    hi = [slice(None)] * face_arr.ndim
    lo[axis] = slice(0, -1)
    hi[axis] = slice(1, None)
    return face_arr[tuple(hi)] - face_arr[tuple(lo)]


def _fmean(face_arr, d, dm):
    axis = face_arr.ndim - dm + d
    lo = [slice(None)] * face_arr.ndim
    hi = [slice(None)] * face_arr.ndim
    lo[axis] = slice(0, -1)
    hi[axis] = slice(1, None)
    return 0.5 * (face_arr[tuple(hi)] + face_arr[tuple(lo)])


def mac_div(umac: Sequence[jnp.ndarray], dx: Sequence[float]) -> jnp.ndarray:
    """div(umac) on cells from interior MAC faces (macproject divumac,
    src/macproject.f90:228-254)."""
    dm = len(umac)
    return sum(_fdiff(umac[d], d, dm) / dx[d] for d in range(dm))


def update(sold: jnp.ndarray, umac: Sequence[jnp.ndarray],
           sedge: Sequence[jnp.ndarray], flux: Sequence[jnp.ndarray],
           force: jnp.ndarray, dt, dx: Sequence[float],
           is_conservative: Sequence[bool]) -> jnp.ndarray:
    """snew = sold - dt*(u·grad s | div flux) + dt*force
    (reference update_2d/3d, src/update.f90:113-278). sold/force: (nc, *n);
    sedge[d]/flux[d]: (nc, faces); umac[d]: (faces)."""
    dm = len(umac)
    nc = sold.shape[0]
    if dm == 3:
        from . import pallas_kernels as pk
        if pk.update_supported(sold.shape[1:], sold.dtype, nc):
            # fused single-pass kernel; alias operand groups a pure
            # convective/conservative call never reads
            sedge_in = flux if all(is_conservative) else sedge
            flux_in = sedge if not any(is_conservative) else flux
            return pk.update_3d(sold, umac, sedge_in, flux_in, force, dt,
                                dx, is_conservative)
    out = []
    ubar = [_fmean(umac[d], d, dm) for d in range(dm)]
    for c in range(nc):
        if is_conservative[c]:
            adv = sum(_fdiff(flux[d][c], d, dm) / dx[d] for d in range(dm))
        else:
            adv = sum(ubar[d] * _fdiff(sedge[d][c], d, dm) / dx[d]
                      for d in range(dm))
        out.append(sold[c] - dt * adv + dt * force[c])
    return jnp.stack(out)


def mkvelforce(ext_force: Sequence[float], s: jnp.ndarray, gp: jnp.ndarray,
               lapu: jnp.ndarray, visc_coef: float, visc_fac: float,
               boussinesq: int) -> jnp.ndarray:
    """Cell velocity forcing: ext(*tracer if boussinesq) + (visc*lapu - gp)/rho
    (reference mkvelforce_2d/3d, src/mkforce.f90:82-236). Interior only."""
    dm = gp.shape[0]
    rho = s[0]
    ext = jnp.stack([jnp.full_like(rho, f) for f in ext_force])
    if boussinesq == 1:
        ext = s[1] * ext
    return ext + (visc_coef * visc_fac * lapu - gp) / rho


def mkvelforce_half(ext_force: Sequence[float], rho: jnp.ndarray,
                    trac, gp: jnp.ndarray, boussinesq: int) -> jnp.ndarray:
    """mkvelforce at visc_fac = 0 (the half-time force of
    velocity_advance.f90:86): ext(*tracer if boussinesq) - gp/rho with
    rho = rhohalf. Identical to mkvelforce(..., visc_fac=0.0, ...) — the
    lapu term is exactly 0*lapu — but never touches lapu or the stacked
    old-scalar array (donation keeps the old state buffer free)."""
    ext = jnp.stack([jnp.full_like(rho, f) for f in ext_force])
    if boussinesq == 1:
        ext = trac * ext
    return ext - gp / rho


def mkscalforce(ext_force: jnp.ndarray, laps: jnp.ndarray, diff_coef: float,
                diff_fac: float) -> jnp.ndarray:
    """Scalar forcing: ext + diff_fac*diff_coef*laps for tracers; density
    (comp 0) gets none (reference mkscalforce, src/mkforce.f90:291-334)."""
    out = ext_force + diff_coef * diff_fac * laps
    return out.at[0].set(0.0)


def make_at_halftime(rho_old: jnp.ndarray, rho_new: jnp.ndarray) -> jnp.ndarray:
    """(reference make_at_halftime.f90:73-115)"""
    return 0.5 * (rho_old + rho_new)


def estdt(u: jnp.ndarray, rho: jnp.ndarray, gp: jnp.ndarray,
          ext_force: Sequence[float], dx: Sequence[float], dtold,
          cflfac: float, max_dt_growth: float):
    """CFL + forcing dt estimate with MPI_MIN semantics replaced by a global
    reduce (reference estdt, src/estdt.f90:15-183)."""
    dm = u.shape[0]
    eps = 1.0e-8
    big = jnp.asarray(1.0e20, u.dtype)
    dt = big
    for d in range(dm):
        umax = jnp.max(jnp.abs(u[d]))
        dt = jnp.where(umax > eps, jnp.minimum(dt, dx[d] / umax), dt)
        fmax = jnp.max(jnp.abs(gp[d] / rho - ext_force[d]))
        dt = jnp.where(fmax > eps,
                       jnp.minimum(dt, jnp.sqrt(2.0 * dx[d] / fmax)), dt)
    dt = jnp.where(dt == big, jnp.asarray(min(dx), u.dtype), dt)
    dt = dt * cflfac
    dt = jnp.where(dtold > 0.0, jnp.minimum(dt, max_dt_growth * dtold), dt)
    return dt


def vorticity(u_pad: jnp.ndarray, dx: Sequence[float], ng: int,
              n_cell: Sequence[int], phys_bc=None) -> jnp.ndarray:
    """Vorticity magnitude from a ghost-padded velocity (reference
    make_vorticity, src/makevort.f90:16-56).

    With ``phys_bc``, tangential derivatives at INLET / NO_SLIP_WALL (and,
    in 2-D, SLIP_WALL) boundaries use the reference's one-sided stencils:
    2-D  (f_{+1} + 3 f_0 - 4 f_{-1}) / dx      (makevort.f90:107-138)
    3-D  (f_{+1} + 3 f_0 - 4 f_{-1}) / (3 dx)  (makevort.f90:561-607)
    (the differing 2-D/3-D normalizations are the reference's own); without
    it, pure centered differences."""
    dm = u_pad.shape[0]

    def crop_others(f, d):
        for t in range(dm):
            if t == d:
                continue
            ax = f.ndim - dm + t
            sl = [slice(None)] * f.ndim
            sl[ax] = slice(ng, ng + n_cell[t])
            f = f[tuple(sl)]
        return f

    def shifted(f, d, off):
        axis = f.ndim - dm + d
        sl = [slice(None)] * f.ndim
        sl[axis] = slice(ng + off, ng + off + n_cell[d])
        return crop_others(f[tuple(sl)], d)

    from ..config import INLET, NO_SLIP_WALL, SLIP_WALL
    fix_codes = ((INLET, NO_SLIP_WALL, SLIP_WALL) if dm == 2
                 else (INLET, NO_SLIP_WALL))
    onesided_div = dx if dm == 2 else [3.0 * h for h in dx]

    def d_ax(f, d):
        fp, f0, fm = shifted(f, d, 1), shifted(f, d, 0), shifted(f, d, -1)
        cen = (fp - fm) / (2.0 * dx[d])
        if phys_bc is None:
            return cen
        lo_fix = phys_bc[d][0] in fix_codes
        hi_fix = phys_bc[d][1] in fix_codes
        if not (lo_fix or hi_fix):
            return cen
        idx = jax.lax.broadcasted_iota(jnp.int32, cen.shape,
                                       cen.ndim - dm + d)
        out = cen
        if lo_fix:
            lo_val = (fp + 3.0 * f0 - 4.0 * fm) / onesided_div[d]
            out = jnp.where(idx == 0, lo_val, out)
        if hi_fix:
            hi_val = -(fm + 3.0 * f0 - 4.0 * fp) / onesided_div[d]
            out = jnp.where(idx == n_cell[d] - 1, hi_val, out)
        return out

    if dm == 2:
        return d_ax(u_pad[1], 0) - d_ax(u_pad[0], 1)
    wx = d_ax(u_pad[2], 1) - d_ax(u_pad[1], 2)
    wy = d_ax(u_pad[0], 2) - d_ax(u_pad[2], 0)
    wz = d_ax(u_pad[1], 0) - d_ax(u_pad[0], 1)
    return jnp.sqrt(wx**2 + wy**2 + wz**2)


def magvel(u: jnp.ndarray) -> jnp.ndarray:
    """(reference make_magvel, src/makevort.f90:58-91)"""
    return jnp.sqrt(jnp.sum(u * u, axis=0))
