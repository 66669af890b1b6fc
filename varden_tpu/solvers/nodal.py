"""Node-centered variable-coefficient Poisson multigrid (the "hg" solver).

TPU-native equivalent of FBoxLib's ml_nd_solve + ND_DENSE nodal stencil
consumed by the reference's hg_multigrid wrapper (src/hg_multigrid.f90:95-105,
src/hgproject.f90:52): solves the weak-form system

    A(sigma) phi = b(u),   A_ij = sum_cells sigma_c ∫ ∇N_i·∇N_j,
                           b_i  = sum_cells u_c · ∫_c ∇N_i,

with bilinear (2-D) / trilinear (3-D) nodal basis functions and cell-wise
constant sigma = 1/rho — the FEM "dense" stencil. Boundary handling:
  periodic axes wrap (n nodes); Neumann (walls/inflow) is natural (sigma
  zero-extended); Dirichlet (outflow pressure) masks boundary nodes to 0.

Multigrid uses weighted-Jacobi smoothing, P^T restriction / linear-interp
prolongation (for nested FEM spaces P^T A P reproduces the rediscretized
coarse operator), and a dense direct (MXU) bottom solve.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

JACOBI_OMEGA = 0.85
DEFAULT_NU1 = 2
DEFAULT_NU2 = 2
DEFAULT_MAX_CYCLES = 100  # hg_multigrid.f90:66
BOTTOM_SIZE = 8  # levels below 8^dm cost launch latency, not bandwidth;
# the dense MXU bottom solve is exact at any size and ~free at 8^dm


def element_matrix(dx: Sequence[float]) -> np.ndarray:
    """FEM element stiffness for a d-linear element, K[(i...),(j...)] with
    local node multi-indices in {0,1}^dm (numpy, computed at trace time)."""
    dm = len(dx)
    S = [np.array([[1.0, -1.0], [-1.0, 1.0]]) / h for h in dx]
    M = [np.array([[2.0, 1.0], [1.0, 2.0]]) * (h / 6.0) for h in dx]
    K = np.zeros((2,) * dm * 2)
    for d in range(dm):
        term = np.ones(())
        mats = [S[t] if t == d else M[t] for t in range(dm)]
        term = mats[0]
        for m in mats[1:]:
            term = np.multiply.outer(term, m)
        # term currently indexed (i0,j0,i1,j1,...): reorder to (i...,j...)
        perm = [2 * t for t in range(dm)] + [2 * t + 1 for t in range(dm)]
        K += np.transpose(term, perm)
    return K


def _pad_cell(f, pmask, dm, fill=0.0):
    """Pad a cell array with one ghost per axis: wrap if periodic else fill."""
    for d in range(dm):
        axis = f.ndim - dm + d

        def take(i0, i1):
            sl = [slice(None)] * f.ndim
            sl[axis] = slice(i0, i1)
            return f[tuple(sl)]

        if pmask[d]:
            lo, hi = take(-1, None), take(0, 1)
        else:
            shape = list(f.shape)
            shape[axis] = 1
            lo = hi = jnp.full(shape, fill, f.dtype)
            lo = jnp.full(shape, fill, f.dtype)
            hi = jnp.full(shape, fill, f.dtype)
        f = jnp.concatenate([lo, f, hi], axis=axis)
    return f


def _shift_node(phi, offset, pmask, dm):
    """phi[i+offset] on the node lattice: wrap on periodic axes, zero-extend
    on physical axes (coefficients there are exactly zero)."""
    out = phi
    for d in range(dm):
        o = offset[d]
        if o == 0:
            continue
        axis = out.ndim - dm + d
        if pmask[d]:
            out = jnp.roll(out, -o, axis=axis)
        else:
            n = out.shape[axis]
            pad_shape = list(out.shape)
            pad_shape[axis] = 1
            zero = jnp.zeros(pad_shape, out.dtype)
            if o == 1:
                sl = [slice(None)] * out.ndim
                sl[axis] = slice(1, None)
                out = jnp.concatenate([out[tuple(sl)], zero], axis=axis)
            else:
                sl = [slice(None)] * out.ndim
                sl[axis] = slice(0, n - 1)
                out = jnp.concatenate([zero, out[tuple(sl)]], axis=axis)
    return out


def stencil_coeffs(sigma, dx, pmask, dm):
    """27/9-point nodal stencil coefficient arrays from cell-wise sigma.

    Returns {offset: coeff-array-on-nodes}. For each node-offset o and each
    adjacent cell position c in {-1,0}^dm, the cell contributes
    K[-c, o-c] * sigma[cell i+c] when o-c is a valid local node.
    """
    K = element_matrix(dx)
    sp = _pad_cell(sigma, pmask, dm)  # cell k -> padded index k+1
    node_shape = tuple(sigma.shape[sigma.ndim - dm + d] + (0 if pmask[d] else 1)
                       for d in range(dm))
    coeffs = {}
    for o in itertools.product((-1, 0, 1), repeat=dm):
        acc = None
        for c in itertools.product((-1, 0), repeat=dm):
            li = tuple(-cd for cd in c)
            lj = tuple(o[d] - c[d] for d in range(dm))
            if any(l not in (0, 1) for l in lj):
                continue
            w = float(K[li + lj])
            # window of sigma for cells i+c over node range
            sl = [slice(None)] * sp.ndim
            for d in range(dm):
                axis = sp.ndim - dm + d
                start = c[d] + 1
                sl[axis] = slice(start, start + node_shape[d])
            contrib = w * sp[tuple(sl)]
            acc = contrib if acc is None else acc + contrib
        if acc is not None:
            coeffs[o] = acc
    return coeffs


@dataclasses.dataclass(frozen=True)
class NodalLevel:
    n: Tuple[int, ...]            # cells per axis
    dx: Tuple[float, ...]
    pmask: Tuple[bool, ...]
    sigma: jnp.ndarray            # cell coefficient (1/rho)
    diag: jnp.ndarray             # operator diagonal on nodes
    mask: Optional[jnp.ndarray]   # 1 = solve, 0 = Dirichlet(0) node; None = no mask
    # precomputed dense inverse of the bottom operator (bottom level only,
    # see mg.CCLevel.binv): one inversion per hierarchy instead of an
    # LU(N) at every bottom visit inside the V-cycle while_loop
    binv: Optional[jnp.ndarray] = None

    @property
    def dm(self):
        return len(self.n)


def _factored_apply(phi, sigma, dx, pmask, dm):
    """FEM stencil apply in factored form.

    Each direction term of the element stiffness is rank-1 along its own axis
    (S = (1/h) d d^T with d = [-1, 1]) tensored with 1-D mass matrices, so
    A phi = sum_d D_d^T [ sigma * (m_t1 x m_t2)(D_d phi) ]: an undivided
    difference, tangential corner mass-weighting, a sigma scale, scatter, and
    a transpose difference — ~3x less HBM traffic than materializing the
    27-point coefficient arrays, and nothing stored but sigma."""
    import itertools as _it
    out = None
    for d in range(dm):
        tangs = [t for t in range(dm) if t != d]
        # undivided difference along d (cell-indexed on d)
        if pmask[d]:
            g = jnp.roll(phi, -1, axis=d) - phi
        else:
            sl_hi = [slice(None)] * dm
            sl_lo = [slice(None)] * dm
            sl_hi[d] = slice(1, None)
            sl_lo[d] = slice(0, -1)
            g = phi[tuple(sl_hi)] - phi[tuple(sl_lo)]
        # tangential corner gathers (cell-indexed on tangential axes)
        def corner(q):
            v = g
            for qi, t in zip(q, tangs):
                if qi == 0 and not pmask[t]:
                    sl = [slice(None)] * dm
                    sl[t] = slice(0, -1)
                    v = v[tuple(sl)]
                elif qi == 1 and not pmask[t]:
                    sl = [slice(None)] * dm
                    sl[t] = slice(1, None)
                    v = v[tuple(sl)]
                elif qi == 1:
                    v = jnp.roll(v, -1, axis=t)
            return v
        corners = {q: corner(q) for q in _it.product((0, 1), repeat=dm - 1)}
        # sequential mass-matrix transform m = [[2,1],[1,2]] per tangential axis
        for ti in range(dm - 1):
            new = {}
            for q in corners:
                flip = tuple(1 - qq if i == ti else qq
                             for i, qq in enumerate(q))
                new[q] = 2.0 * corners[q] + corners[flip]
            corners = new
        scale = 1.0 / dx[d]
        for t in tangs:
            scale = scale * (dx[t] / 6.0)
        r = None
        for q, w in corners.items():
            w = (scale * sigma) * w
            # scatter: node j receives w from cell j - q along tangential axes
            for qi, t in zip(q, tangs):
                if pmask[t]:
                    if qi == 1:
                        w = jnp.roll(w, 1, axis=t)
                else:
                    pad = [(0, 0)] * dm
                    pad[t] = (qi, 1 - qi)
                    w = jnp.pad(w, pad)
            r = w if r is None else r + w
        # transpose difference along d: node j gets r[j-1] - r[j]
        if pmask[d]:
            contrib = jnp.roll(r, 1, axis=d) - r
        else:
            pad_lo = [(0, 0)] * dm
            pad_lo[d] = (1, 0)
            pad_hi = [(0, 0)] * dm
            pad_hi[d] = (0, 1)
            contrib = jnp.pad(r, pad_lo) - jnp.pad(r, pad_hi)
        out = contrib if out is None else out + contrib
    return out


def _pad_node(phi, pmask, dm):
    """Pad a node array with one ghost per axis: periodic wrap, else zero
    (physical-side coefficients are exactly zero, so the value is unread)."""
    for d in range(dm):
        axis = phi.ndim - dm + d

        def take(i0, i1):
            sl = [slice(None)] * phi.ndim
            sl[axis] = slice(i0, i1)
            return phi[tuple(sl)]

        if pmask[d]:
            lo, hi = take(-1, None), take(0, 1)
        else:
            shape = list(phi.shape)
            shape[axis] = 1
            lo = jnp.zeros(shape, phi.dtype)
            hi = jnp.zeros(shape, phi.dtype)
        phi = jnp.concatenate([lo, phi, hi], axis=axis)
    return phi


def _sigma_np(sigma, pmask, dm):
    """Shifted-padded cell sigma: out[k] = sigma_cell[k-1] over the node
    range (N+1 entries per axis), wrapping on periodic axes, zero outside."""
    for d in range(dm):
        axis = sigma.ndim - dm + d

        def take(i0, i1):
            sl = [slice(None)] * sigma.ndim
            sl[axis] = slice(i0, i1)
            return sigma[tuple(sl)]

        if pmask[d]:
            sigma = jnp.concatenate([take(-1, None), sigma], axis=axis)
        else:
            shape = list(sigma.shape)
            shape[axis] = 1
            z = jnp.zeros(shape, sigma.dtype)
            sigma = jnp.concatenate([z, sigma, z], axis=axis)
    return sigma


def _pallas_nodal(level: "NodalLevel", phi, rhs, omega, emit, sig_np=None):
    """Fused Pallas pass (apply / residual / jacobi); None if unsupported.
    ``sig_np`` lets callers hoist the (sweep-invariant) shifted-padded sigma
    out of smoothing loops."""
    from ..ops import pallas_kernels as pk
    if not pk.nodal_supported(level):
        return None
    phi_pad = _pad_node(phi, level.pmask, level.dm)
    if sig_np is None:
        sig_np = _sigma_np(level.sigma, level.pmask, level.dm)
    if emit == "jacobi":
        diag = level.diag
        inv = jnp.where(diag > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    else:
        rhs = jnp.zeros_like(phi) if rhs is None else rhs
        inv = rhs  # unread in apply/residual mode
    return pk.nodal_sweep_3d(phi_pad, sig_np, rhs, inv, level.dx,
                             omega=omega, emit=emit)


def nd_apply_raw(level: NodalLevel, phi):
    """Operator apply WITHOUT masking phi — used when boundary nodes carry
    inhomogeneous (coarse-interpolated) values in composite solves."""
    return _factored_apply(phi, level.sigma, level.dx, level.pmask, level.dm)


def nd_apply(level: NodalLevel, phi):
    if level.mask is not None:
        phi = phi * level.mask
    out = _pallas_nodal(level, phi, None, 0.0, "apply")
    if out is None:
        out = _factored_apply(phi, level.sigma, level.dx, level.pmask,
                              level.dm)
    if level.mask is not None:
        out = out * level.mask
    return out


def node_diag(sigma, dx, pmask, dm):
    """Operator diagonal: K[l,l] = sum_d (1/h_d) prod_t (h_t/3) is corner-
    independent, so diag = c0 * (sum of sigma over adjacent cells)."""
    c0 = 0.0
    for d in range(dm):
        term = 1.0 / dx[d]
        for t in range(dm):
            if t != d:
                term *= dx[t] / 3.0
        c0 += term
    sp = _pad_cell(sigma, pmask, dm)
    ns = node_shape(tuple(sigma.shape[sigma.ndim - dm + d] for d in range(dm)),
                    pmask)
    acc = None
    import itertools as _it
    for c in _it.product((-1, 0), repeat=dm):
        sl = [slice(None)] * sp.ndim
        for d in range(dm):
            axis = sp.ndim - dm + d
            start = c[d] + 1
            sl[axis] = slice(start, start + ns[d])
        term = sp[tuple(sl)]
        acc = term if acc is None else acc + term
    return c0 * acc


def jacobi(level: NodalLevel, phi, rhs, nsweeps, omega=JACOBI_OMEGA):
    done = 0
    if level.mask is None:
        # fused Pallas weighted-Jacobi (phi/sigma/rhs read once per sweep);
        # the shifted-padded sigma is invariant — build it once per call
        sig_np = _sigma_np(level.sigma, level.pmask, level.dm)
        for _ in range(nsweeps):
            out = _pallas_nodal(level, phi, rhs, omega, "jacobi",
                                sig_np=sig_np)
            if out is None:
                break
            phi = out
            done += 1
    diag = level.diag
    inv = jnp.where(diag > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    for _ in range(nsweeps - done):
        r = rhs - nd_apply(level, phi)
        upd = omega * r * inv
        if level.mask is not None:
            upd = upd * level.mask
        phi = phi + upd
    return phi


def _restrict(r, pmask, dm):
    """P^T full-weighting with per-axis weights (1/2, 1, 1/2)."""
    for d in range(dm):
        axis = r.ndim - dm + d
        rm = _shift_node(r, tuple(-1 if t == d else 0 for t in range(dm)), pmask, dm)
        rp = _shift_node(r, tuple(+1 if t == d else 0 for t in range(dm)), pmask, dm)
        r = r + 0.5 * (rm + rp)
        sl = [slice(None)] * r.ndim
        sl[axis] = slice(0, None, 2)
        r = r[tuple(sl)]
    return r


def _prolong(c, fine_node_shape, pmask, dm):
    """Linear interpolation: even fine nodes = coarse, odd = neighbor avg."""
    for d in range(dm):
        axis = c.ndim - dm + d
        nf = fine_node_shape[d]
        cp = _shift_node(c, tuple(+1 if t == d else 0 for t in range(dm)), pmask, dm)
        mid = 0.5 * (c + cp)
        stacked = jnp.stack([c, mid], axis=axis + 1)
        new_shape = list(c.shape)
        new_shape[axis] = 2 * c.shape[axis]
        out = stacked.reshape(new_shape)
        if not pmask[d]:
            sl = [slice(None)] * out.ndim
            sl[axis] = slice(0, nf)
            out = out[tuple(sl)]
        c = out
    return c


def _coarsen_mask(mask, pmask, dm):
    if mask is None:
        return None
    for d in range(dm):
        axis = mask.ndim - dm + d
        sl = [slice(None)] * mask.ndim
        sl[axis] = slice(0, None, 2)
        mask = mask[tuple(sl)]
    return mask


def _cell_avg(f, dm):
    for d in range(dm):
        axis = f.ndim - dm + d
        a = [slice(None)] * f.ndim
        b = [slice(None)] * f.ndim
        a[axis] = slice(0, None, 2)
        b[axis] = slice(1, None, 2)
        f = 0.5 * (f[tuple(a)] + f[tuple(b)])
    return f


def build_hierarchy(n, dx, pmask, sigma, mask) -> List[NodalLevel]:
    dm = len(n)
    levels = []
    n = list(n)
    dx = list(dx)
    while True:
        diag = node_diag(sigma, dx, pmask, dm)
        levels.append(NodalLevel(tuple(n), tuple(dx), tuple(pmask), sigma,
                                 diag, mask))
        if any(s % 2 != 0 or s <= BOTTOM_SIZE for s in n):
            break
        n = [s // 2 for s in n]
        dx = [2.0 * h for h in dx]
        sigma = _cell_avg(sigma, dm)
        mask = _coarsen_mask(mask, pmask, dm)
    lb = levels[-1]
    N = 1
    for s in node_shape(lb.n, pmask):
        N *= s
    if N <= 4096:
        A = _bottom_dense_A(lb)
        from .mg import dense_inv
        levels[-1] = dataclasses.replace(lb, binv=dense_inv(A))
    return levels


def node_shape(n, pmask):
    return tuple(nd if p else nd + 1 for nd, p in zip(n, pmask))


def bottom_solve(level: NodalLevel, r, method: str = "dense"):
    """Bottom-solver dispatch honoring the reference's hg_bottom_solver
    codes (see mg.BOTTOM_METHODS): dense direct (default), smoothing
    sweeps, or matrix-free CG/BiCGStab at bottom_solver_eps=1e-3."""
    if method == "dense":
        return bottom_dense_solve(level, r)
    if method == "smoother":
        return jacobi(level, jnp.zeros_like(r), r, 10)
    from . import mg as _mg
    spatial = tuple(range(r.ndim - level.dm, r.ndim))

    def apply_fn(x):
        if level.mask is None:
            # rank-1 regularization along the constant null space (the
            # dense path's A + J/N), keeping the operator SPD on the
            # mean-free complement
            return nd_apply(level, x) + jnp.mean(x)
        return nd_apply(level, x) * level.mask

    if level.mask is None:
        r = r - jnp.mean(r)
    else:
        r = r * level.mask
    out = _mg._krylov_bottom(apply_fn, r, spatial, method)
    if level.mask is not None:
        out = out * level.mask
    return out


def _bottom_dense_A(level: NodalLevel):
    """Materialize the (tiny) coarsest nodal operator by a vmapped
    application to the identity: rank-1 regularized (all-periodic, null
    space = constants) or with identity rows on Dirichlet nodes."""
    shape = node_shape(level.n, level.pmask)
    N = 1
    for s in shape:
        N *= s
    dtype = level.diag.dtype
    eye = jnp.eye(N, dtype=dtype)
    cols = jax.vmap(lambda e: nd_apply(level, e.reshape(shape)).ravel())(eye)
    A = cols.T
    if level.mask is None:
        A = A + jnp.full((N, N), 1.0 / N, dtype)
    else:
        A = A + jnp.diag(1.0 - level.mask.ravel())
    return A


def bottom_dense_solve(level: NodalLevel, r):
    """Direct dense bottom solve via a vmapped operator application — one MXU
    solve instead of a sequential Krylov loop (TPU latency). With a
    precomputed inverse on the level (build_hierarchy), one matvec."""
    shape = r.shape
    N = 1
    for s in shape:
        N *= s
    if level.mask is None:
        r = r - jnp.mean(r)
    else:
        r = r * level.mask
    if level.binv is not None:
        out = (level.binv @ r.ravel()).reshape(shape)
    else:
        A = _bottom_dense_A(level)
        from .mg import dense_solve
        out = dense_solve(A, r.ravel()).reshape(shape)
    if level.mask is not None:
        out = out * level.mask
    return out


def v_cycle(levels, phi, rhs, lev=0, nu1=DEFAULT_NU1, nu2=DEFAULT_NU2,
            return_resnorm=False, bottom="dense"):
    """One V-cycle. With return_resnorm, also returns the max-norm of the
    post-pre-smooth fine residual (computed anyway for the restriction) so
    the outer tolerance loop needs no extra operator application."""
    level = levels[lev]
    if lev == len(levels) - 1:
        r = rhs - nd_apply(level, phi)
        out = phi + bottom_solve(level, r, bottom)
        return (out, jnp.max(jnp.abs(r))) if return_resnorm else out
    phi = jacobi(level, phi, rhs, nu1)
    if level.mask is None:
        res = _pallas_nodal(level, phi, rhs, 0.0, "residual")
        if res is None:
            res = rhs - nd_apply(level, phi)
    else:
        res = rhs - nd_apply(level, phi)
    crs_rhs = _restrict(res, level.pmask, level.dm)
    nxt = levels[lev + 1]
    if nxt.mask is not None:
        crs_rhs = crs_rhs * nxt.mask
    corr = jnp.zeros_like(crs_rhs)
    corr = v_cycle(levels, corr, crs_rhs, lev + 1, nu1, nu2, bottom=bottom)
    fine_ns = node_shape(level.n, level.pmask)
    corr_f = _prolong(corr, fine_ns, level.pmask, level.dm)
    if level.mask is not None:
        corr_f = corr_f * level.mask
    phi = phi + corr_f
    phi = jacobi(level, phi, rhs, nu2)
    if return_resnorm:
        return phi, jnp.max(jnp.abs(res))
    return phi


def divu_rhs(u, dx, pmask, dm, inflow_pad=None):
    """Weak-form divergence source b_i = sum_cells u_c · ∫_c ∇N_i.

    ``u``: (dm, *cells) interior velocity. ``inflow_pad``: optional function
    (comp, d, side) -> ghost value for EXT_DIR inflow faces; other physical
    ghosts are zero (walls via create_uvec zeroing, hgproject.f90:424-427).
    """
    comps = []
    for c in range(dm):
        f = u[c]
        for d in range(dm):
            axis = f.ndim - dm + d

            def take(i0, i1):
                sl = [slice(None)] * f.ndim
                sl[axis] = slice(i0, i1)
                return f[tuple(sl)]

            if pmask[d]:
                lo, hi = take(-1, None), take(0, 1)
            else:
                shape = list(f.shape)
                shape[axis] = 1
                lo_val = 0.0 if inflow_pad is None else inflow_pad(c, d, 0)
                hi_val = 0.0 if inflow_pad is None else inflow_pad(c, d, 1)
                lo = jnp.full(shape, lo_val, f.dtype)
                hi = jnp.full(shape, hi_val, f.dtype)
            f = jnp.concatenate([lo, f, hi], axis=axis)
        comps.append(f)

    rhs = None
    vol_fac = [np.prod([dx[t] / 2.0 for t in range(dm) if t != d])
               for d in range(dm)]
    ns = node_shape(tuple(u.shape[-dm:]), pmask)
    for d in range(dm):
        up = comps[d]
        acc = None
        for c in itertools.product((-1, 0), repeat=dm):
            sl = [slice(None)] * up.ndim
            for t in range(dm):
                axis = up.ndim - dm + t
                start = c[t] + 1
                sl[axis] = slice(start, start + ns[t])
            sgn = 1.0 if c[d] == -1 else -1.0
            term = sgn * up[tuple(sl)]
            acc = term if acc is None else acc + term
        term = float(vol_fac[d]) * acc
        rhs = term if rhs is None else rhs + term
    return rhs


def cell_grad(phi, dx, pmask, dm):
    """Average nodal->cell gradient (reference mkgphi, hgproject.f90:517-577).

    Returns (dm, *cells)."""
    grads = []
    for d in range(dm):
        acc = None
        nshape = phi.shape[phi.ndim - dm:]
        for corner in itertools.product((0, 1), repeat=dm):
            out = phi
            for t in range(dm):
                o = corner[t]
                axis = out.ndim - dm + t
                if pmask[t]:
                    if o == 1:
                        out = jnp.roll(out, -1, axis=axis)
                else:
                    sl = [slice(None)] * out.ndim
                    n_cells = nshape[t] - 1
                    sl[axis] = slice(o, o + n_cells)
                    out = out[tuple(sl)]
            sgn = 1.0 if corner[d] == 1 else -1.0
            term = sgn * out
            acc = term if acc is None else acc + term
        grads.append(acc / (2.0 ** (dm - 1) * dx[d]))
    return jnp.stack(grads)


def solve(n, dx, pmask, sigma, rhs, *, mask=None, phi0=None,
          rel_eps=1.0e-11, abs_eps=-1.0, max_cycles=DEFAULT_MAX_CYCLES,
          return_info=False, bottom="dense"):
    """Solve A(sigma) phi = rhs on the node lattice. Returns (phi, resnorm)."""
    dm = len(n)
    singular = mask is None
    L0 = NodalLevel(tuple(n), tuple(dx), tuple(pmask), sigma,
                    node_diag(sigma, dx, pmask, dm), mask)

    if mask is not None:
        rhs = rhs * mask
    if singular:
        rhs = rhs - jnp.mean(rhs)
    if phi0 is None:
        phi0 = jnp.zeros_like(rhs)

    bnorm = jnp.max(jnp.abs(rhs))
    tol = jnp.maximum(rel_eps * bnorm,
                      jnp.asarray(0.0 if abs_eps < 0 else abs_eps, rhs.dtype))

    def resnorm0(phi):
        if mask is None:
            r = _pallas_nodal(L0, phi, rhs, 0.0, "residual")
            if r is not None:
                return jnp.max(jnp.abs(r))
        return jnp.max(jnp.abs(rhs - nd_apply(L0, phi)))

    big = jnp.asarray(jnp.finfo(rhs.dtype).max, rhs.dtype)

    # Nested tolerance loop (see mg.solve): inner V-cycles gated by the free
    # in-cycle monitor, outer loop verifies with one true residual per pass,
    # and the effective tolerance includes the dtype's computable residual
    # floor (~eps * diag * |phi|). Mean normalization of the singular
    # solution is deferred to the end (the regularized bottom solve keeps
    # the drift bounded). All multigrid machinery (hierarchy coarsening,
    # cycles, bottom solve) sits in a lax.cond branch that only executes
    # when the warm start misses tolerance.
    diag_max = jnp.max(jnp.abs(L0.diag))
    eps_mach = jnp.asarray(jnp.finfo(rhs.dtype).eps, rhs.dtype)

    def tol_eff(p):
        floor = 4.0 * eps_mach * diag_max * jnp.max(jnp.abs(p))  # measured f32 floor: ~4 eps diag |phi| (2.0 under-estimated; V-cycles ground against it)
        return jnp.maximum(tol, floor)

    rn0 = resnorm0(phi0)

    def mg_branch(phi):
        levels = build_hierarchy(list(n), list(dx), list(pmask), sigma, mask)

        def resnorm(p):
            return jnp.max(jnp.abs(rhs - nd_apply(levels[0], p)))

        def icond(c):
            _, kk, mon, prev, tl = c
            return jnp.logical_and(
                jnp.logical_and(kk < max_cycles, mon > tl), mon < 0.7 * prev)

        def ibody(c):
            p, kk, mon, _, tl = c
            p, mon2 = v_cycle(levels, p, rhs, return_resnorm=True,
                              bottom=bottom)
            return p, kk + 1, mon2, mon, tl

        def ocond(carry):
            p, k, rn, stalled = carry
            go = jnp.logical_and(k < max_cycles, rn > tol_eff(p))
            return jnp.logical_and(go, jnp.logical_not(stalled))

        def obody(carry):
            p, k, rn, _ = carry
            tl = tol_eff(p)
            p, mon = v_cycle(levels, p, rhs, return_resnorm=True,
                             bottom=bottom)
            p, k, mon, _, _ = jax.lax.while_loop(
                icond, ibody, (p, k + 1, mon, big, tl))
            return p, k, resnorm(p), mon > tl

        phi, iters, rn, _ = jax.lax.while_loop(
            ocond, obody, (phi, jnp.array(0), rn0, jnp.array(False)))
        return phi, rn, iters

    def skip_branch(phi):
        return phi, rn0, jnp.array(0)

    phi, rn, iters = jax.lax.cond(rn0 > tol_eff(phi0), mg_branch, skip_branch,
                                  phi0)
    if singular:
        phi = phi - jnp.mean(phi)
    if return_info:
        # achieved / effective-target ratio (> 1 = under-converged exit)
        tiny = jnp.asarray(jnp.finfo(rhs.dtype).tiny, rhs.dtype)
        ratio = rn / jnp.maximum(tol_eff(phi), tiny)
        return phi, (rn, iters, ratio)
    return phi, rn
