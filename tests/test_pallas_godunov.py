"""Fused Pallas Godunov tiles vs the windowed path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from varden_tpu import problems
from varden_tpu.config import VardenConfig
from varden_tpu.ops import godunov3d, pallas_godunov
from varden_tpu.state import Sim


def _setup(bc, n=(24, 40, 16)):
    cfg = VardenConfig(dim_in=3, prob_type=1, n_cellx=n[0], n_celly=n[1],
                       n_cellz=n[2],
                       bcx_lo=bc[0], bcx_hi=bc[0], bcy_lo=bc[1],
                       bcy_hi=bc[1], bcz_lo=bc[2], bcz_hi=bc[2],
                       grav=-9.8, dtype="float64")
    sim = Sim(cfg)
    rng = np.random.RandomState(7)
    state = problems.initdata(sim)
    u = state.u + 0.1 * jnp.asarray(rng.rand(*state.u.shape) - 0.5)
    force = 0.5 * jnp.asarray(rng.rand(*u.shape) - 0.5)
    return sim, u, force


@pytest.mark.parametrize("bc", [(15, 15, 15), (-1, -1, -1), (-1, 15, 12)])
def test_velpred_fused_matches_windowed(bc):
    sim, u, force = _setup(bc)
    dm, ng, n = sim.dm, sim.ng, sim.n_cell
    adv = [sim.adv_bc[d] for d in range(dm)]
    u_pad = sim.fill_vel(u)
    f_pad = sim.fill_extrap(force, ng)
    dt = 2e-3

    ref = godunov3d.velpred_3d(u_pad, f_pad, dt, sim.dx, sim.phys_bc, adv,
                               ng, n, sim.cfg.slope_order, False)
    out = pallas_godunov.velpred_3d_fused(
        u_pad, f_pad, dt, sim.dx, sim.phys_bc, adv, ng, n,
        sim.cfg.slope_order, False, interpret=True)
    for d in range(3):
        err = float(jnp.max(jnp.abs(out[d] - ref[d])))
        assert err < 1e-13, f"bc={bc} comp {d}: {err}"


@pytest.mark.parametrize("bc,is_vel", [((15, 15, 15), False),
                                       ((-1, 15, 15), True)])
def test_mkflux_fused_matches_windowed(bc, is_vel):
    sim, u, force = _setup(bc)
    dm, ng, n = sim.dm, sim.ng, sim.n_cell
    from varden_tpu.advance import embed_faces
    rng = np.random.RandomState(9)
    umac = tuple(jnp.asarray(rng.rand(*[n[t] + (1 if t == d else 0)
                                        for t in range(3)]) - 0.5)
                 for d in range(3))
    mac_pads = embed_faces(sim, umac, ng)
    dt = 2e-3
    if is_vel:
        s = u
        adv = [sim.adv_bc[d] for d in range(dm)]
        is_cons = [False] * 3
    else:
        state = problems.initdata(sim)
        s = state.s + 0.05 * jnp.asarray(rng.rand(*state.s.shape))
        adv = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
        is_cons = [True] + [False] * (sim.nscal - 1)
    s_pad = sim.fill_vel(s) if is_vel else sim.fill_scal(s)
    f_pad = sim.fill_extrap(force[:s.shape[0]] if is_vel else
                            jnp.zeros_like(s) + 0.1, ng)
    rhs_pad = sim.fill_extrap(jnp.zeros(n, sim.dtype), ng)

    ref_e, ref_f = godunov3d.mkflux_3d(
        s_pad, mac_pads, f_pad, rhs_pad, dt, sim.dx, sim.phys_bc, adv, ng,
        n, is_vel, is_cons, sim.cfg.slope_order, False)
    out_e, out_f = pallas_godunov.mkflux_3d_fused(
        s_pad, mac_pads, f_pad, rhs_pad, dt, sim.dx, sim.phys_bc, adv, ng,
        n, is_vel, is_cons, sim.cfg.slope_order, False, interpret=True)
    for d in range(3):
        ee = float(jnp.max(jnp.abs(out_e[d] - ref_e[d])))
        ef = float(jnp.max(jnp.abs(out_f[d] - ref_f[d])))
        assert ee < 1e-13, f"sedge bc={bc} dir {d}: {ee}"
        assert ef < 1e-13, f"sflux bc={bc} dir {d}: {ef}"


@pytest.mark.parametrize("bc,is_vel", [((15, 15, 15), False),
                                       ((-1, 15, 15), True),
                                       ((-1, -1, -1), False)])
def test_mkflux_update_fused_matches_reference(bc, is_vel):
    """Fused mkflux+update epilogue == windowed mkflux then the jnp update
    (the kernel computes snew from VMEM-resident faces; reference
    update_3d, src/update.f90:186-278)."""
    from varden_tpu.ops import basic
    sim, u, force = _setup(bc)
    dm, ng, n = sim.dm, sim.ng, sim.n_cell
    from varden_tpu.advance import embed_faces
    rng = np.random.RandomState(11)
    umac = tuple(jnp.asarray(rng.rand(*[n[t] + (1 if t == d else 0)
                                        for t in range(3)]) - 0.5)
                 for d in range(3))
    mac_pads = embed_faces(sim, umac, ng)
    dt = 2e-3
    if is_vel:
        s = u
        adv = [sim.adv_bc[d] for d in range(dm)]
        is_cons = [False] * 3
    else:
        state = problems.initdata(sim)
        s = state.s + 0.05 * jnp.asarray(rng.rand(*state.s.shape))
        adv = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
        is_cons = [True] + [False] * (sim.nscal - 1)
    s_pad = sim.fill_vel(s) if is_vel else sim.fill_scal(s)
    f_pad = sim.fill_extrap(force[:s.shape[0]] if is_vel else
                            jnp.zeros_like(s) + 0.1, ng)
    rhs_pad = sim.fill_extrap(jnp.zeros(n, sim.dtype), ng)
    fupd = 0.3 * jnp.asarray(rng.rand(s.shape[0], *n) - 0.5)

    ref_e, ref_f = godunov3d.mkflux_3d(
        s_pad, mac_pads, f_pad, rhs_pad, dt, sim.dx, sim.phys_bc, adv, ng,
        n, is_vel, is_cons, sim.cfg.slope_order, False)
    ref = pallas_godunov._update_vals(
        s, [jnp.asarray(m) for m in umac], ref_e, ref_f, fupd, dt, sim.dx,
        is_cons)
    out = pallas_godunov.mkflux_update_3d_fused(
        s_pad, mac_pads, f_pad, fupd, rhs_pad, dt, sim.dx, sim.phys_bc,
        adv, ng, n, is_vel, is_cons, sim.cfg.slope_order, False,
        interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-12, f"bc={bc} is_vel={is_vel}: {err}"
    # and it equals the production two-pass path (basic.update jnp branch)
    two = basic.update(s, umac, ref_e, ref_f, fupd, dt, sim.dx, is_cons)
    assert float(jnp.max(jnp.abs(out - two))) < 1e-12
    if not is_vel:
        # flux-emitting variant (AMR flux registers): same snew + the
        # conservative component's fluxes
        out2, fl = pallas_godunov.mkflux_update_3d_fused(
            s_pad, mac_pads, f_pad, fupd, rhs_pad, dt, sim.dx, sim.phys_bc,
            adv, ng, n, is_vel, is_cons, sim.cfg.slope_order, False,
            flux_comps=(0,), interpret=True)
        assert float(jnp.max(jnp.abs(out2 - ref))) < 1e-12
        for d in range(3):
            ferr = float(jnp.max(jnp.abs(fl[d] - ref_f[d][0:1])))
            assert ferr < 1e-13, f"flux d={d}: {ferr}"


@pytest.mark.parametrize("bc", [(15, 15), (-1, 14)])
def test_2d_fused_matches_windowed(bc):
    """Whole-grid 2-D kernels == windowed path (same staged math on the
    full arrays, VMEM-resident)."""
    from varden_tpu.ops import godunov
    cfg = VardenConfig(dim_in=2, prob_type=1, n_cellx=24, n_celly=40,
                       bcx_lo=bc[0], bcx_hi=bc[0], bcy_lo=bc[1],
                       bcy_hi=bc[1], grav=-9.8, dtype="float64")
    sim = Sim(cfg)
    rng = np.random.RandomState(5)
    state = problems.initdata(sim)
    u = state.u + 0.1 * jnp.asarray(rng.rand(*state.u.shape) - 0.5)
    force = 0.5 * jnp.asarray(rng.rand(*u.shape) - 0.5)
    ng, n = sim.ng, sim.n_cell
    adv = [sim.adv_bc[d] for d in range(2)]
    u_pad = sim.fill_vel(u)
    f_pad = sim.fill_extrap(force, ng)
    dt = 2e-3
    ref = godunov.velpred_2d(u_pad, f_pad, dt, sim.dx, sim.phys_bc, adv,
                             ng, n, cfg.slope_order, False)
    out = pallas_godunov.velpred_2d_fused(
        u_pad, f_pad, dt, sim.dx, sim.phys_bc, adv, ng, n,
        cfg.slope_order, False, interpret=True)
    for d in range(2):
        assert float(jnp.max(jnp.abs(out[d] - ref[d]))) < 1e-13

    from varden_tpu.advance import embed_faces
    mp = embed_faces(sim, ref, ng)
    s_pad = sim.fill_scal(state.s)
    sf_pad = sim.fill_extrap(jnp.zeros_like(state.s), ng)
    mrhs = sim.fill_extrap(jnp.zeros(n, sim.dtype), ng)
    scal_adv = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
    ref2 = godunov.mkflux_2d(s_pad, mp[0], mp[1], sf_pad, mrhs, dt, sim.dx,
                             sim.phys_bc, scal_adv, ng, n, False,
                             [True, False], cfg.slope_order, False)
    out2 = pallas_godunov.mkflux_2d_fused(
        s_pad, mp[0], mp[1], sf_pad, mrhs, dt, sim.dx, sim.phys_bc,
        scal_adv, ng, n, False, [True, False], cfg.slope_order, False,
        interpret=True)
    for a, b in zip(out2, ref2):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-13


@pytest.mark.parametrize("bc", [(15, 15, 15), (-1, -1, -1)])
def test_mkflux_update_zero_synthesis(bc):
    """None force/fupd/mac_rhs (statically-zero inputs synthesized in
    VMEM) == passing explicit zero arrays. The production advance passes
    None for mac_rhs always and for the scalar forces when diff_coef=0,
    removing ~1.5 GiB of HBM zero buffers at 256^3 + 2 AMR levels."""
    sim, u, force = _setup(bc)
    dm, ng, n = sim.dm, sim.ng, sim.n_cell
    from varden_tpu.advance import embed_faces
    rng = np.random.RandomState(13)
    umac = tuple(jnp.asarray(rng.rand(*[n[t] + (1 if t == d else 0)
                                        for t in range(3)]) - 0.5)
                 for d in range(3))
    mac_pads = embed_faces(sim, umac, ng)
    dt = 2e-3
    state = problems.initdata(sim)
    s = state.s + 0.05 * jnp.asarray(rng.rand(*state.s.shape))
    adv = [sim.adv_bc[sim.scal_comp(i)] for i in range(sim.nscal)]
    is_cons = [True] + [False] * (sim.nscal - 1)
    s_pad = sim.fill_scal(s)
    zf_pad = sim.fill_extrap(jnp.zeros_like(s), ng)
    zrhs_pad = sim.fill_extrap(jnp.zeros(n, sim.dtype), ng)
    zfupd = jnp.zeros((s.shape[0],) + tuple(n), sim.dtype)

    ref = pallas_godunov.mkflux_update_3d_fused(
        s_pad, mac_pads, zf_pad, zfupd, zrhs_pad, dt, sim.dx, sim.phys_bc,
        adv, ng, n, False, is_cons, sim.cfg.slope_order, False,
        interpret=True)
    out = pallas_godunov.mkflux_update_3d_fused(
        s_pad, mac_pads, None, None, None, dt, sim.dx, sim.phys_bc,
        adv, ng, n, False, is_cons, sim.cfg.slope_order, False,
        interpret=True)
    # few-ulp bound, not == 0: skipping the +0 terms changes the op tree,
    # and XLA codegen (FMA contraction; cached executables from another
    # host's machine features) may round the SAME value differently by 1 ulp
    TOL = 5e-15
    assert float(jnp.max(jnp.abs(out - ref))) < TOL
    # flux-emitting variant too (the ML scalar advance path)
    ref2, rfl = pallas_godunov.mkflux_update_3d_fused(
        s_pad, mac_pads, zf_pad, zfupd, zrhs_pad, dt, sim.dx, sim.phys_bc,
        adv, ng, n, False, is_cons, sim.cfg.slope_order, False,
        flux_comps=(0,), interpret=True)
    out2, ofl = pallas_godunov.mkflux_update_3d_fused(
        s_pad, mac_pads, None, None, None, dt, sim.dx, sim.phys_bc,
        adv, ng, n, False, is_cons, sim.cfg.slope_order, False,
        flux_comps=(0,), interpret=True)
    assert float(jnp.max(jnp.abs(out2 - ref2))) < TOL
    for d in range(3):
        assert float(jnp.max(jnp.abs(ofl[d] - rfl[d]))) < TOL
    # mixed: real force, zero rhs/fupd (the velocity-advance pattern)
    f_pad = sim.fill_extrap(0.3 * jnp.asarray(
        rng.rand(*s.shape) - 0.5), ng)
    ref3 = pallas_godunov.mkflux_update_3d_fused(
        s_pad, mac_pads, f_pad, zfupd, zrhs_pad, dt, sim.dx, sim.phys_bc,
        adv, ng, n, False, is_cons, sim.cfg.slope_order, True,
        interpret=True)
    out3 = pallas_godunov.mkflux_update_3d_fused(
        s_pad, mac_pads, f_pad, None, None, dt, sim.dx, sim.phys_bc,
        adv, ng, n, False, is_cons, sim.cfg.slope_order, True,
        interpret=True)
    assert float(jnp.max(jnp.abs(out3 - ref3))) < TOL
