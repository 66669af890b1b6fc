"""Multi-device SPMD correctness: sharded step == unsharded step.

The reference's MPI box decomposition makes rank count invisible to the
numerics (same plotfiles under mpiexec -n 1/2/3 — SURVEY.md §4 item 2). The
TPU-native equivalent: the jitted global-view step under a device mesh must
reproduce the single-device result. Runs on the conftest-provisioned
8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import pytest

from varden_tpu import problems, projection
from varden_tpu.config import VardenConfig
from varden_tpu.parallel import mesh as pmesh
from varden_tpu.state import Sim


def _run_pair(cfg, nsteps=2):
    sim = Sim(cfg)
    state0 = problems.initdata(sim)
    dt = jnp.asarray(5e-3, sim.dtype)

    def step(state, dt):
        new_state, _diag = advance_step(sim, state, dt)
        return new_state

    from varden_tpu import advance

    def advance_step(sim, state, dt):
        return advance.advance_timestep(sim, state, dt,
                                        projection.REGULAR_TIMESTEP)

    # single device
    step1 = jax.jit(step)
    s1 = state0
    for _ in range(nsteps):
        s1 = step1(s1, dt)
    jax.block_until_ready(s1.u)

    # 8-device mesh
    m = pmesh.make_mesh(8)
    s8 = pmesh.shard_state(state0, sim, m)
    step8 = pmesh.sharded_step(sim, m)
    for _ in range(nsteps):
        s8 = step8(s8, dt)
    jax.block_until_ready(s8.u)
    return s1, s8


def _assert_state_close(s1, s8, tol):
    for name in ("u", "s", "gp", "p"):
        a = getattr(s1, name)
        b = getattr(s8, name)
        err = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        assert err <= tol * scale, f"{name}: {err} vs scale {scale}"


def test_sharded_step_matches_2d_bubble():
    cfg = VardenConfig(dim_in=2, prob_type=1, n_cellx=32, n_celly=32,
                       bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                       grav=-9.8, visc_coef=1e-3, dtype="float64")
    s1, s8 = _run_pair(cfg)
    # f64: reductions may reassociate across the partition, nothing more
    _assert_state_close(s1, s8, 1e-12)


def test_sharded_step_matches_3d_periodic():
    cfg = VardenConfig(dim_in=3, prob_type=4, n_cellx=16, n_celly=16,
                       n_cellz=16, bcx_lo=-1, bcx_hi=-1, bcy_lo=-1,
                       bcy_hi=-1, bcz_lo=-1, bcz_hi=-1, dtype="float64")
    s1, s8 = _run_pair(cfg)
    _assert_state_close(s1, s8, 1e-12)


def test_sharded_estdt_matches():
    """Global reductions (the reference's parallel_reduce MPI_MIN,
    estdt.f90:69) under sharding."""
    from varden_tpu import advance
    cfg = VardenConfig(dim_in=2, prob_type=1, n_cellx=32, n_celly=32,
                       bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                       grav=-9.8, dtype="float64")
    sim = Sim(cfg)
    state = problems.initdata(sim)
    dt1 = float(jax.jit(lambda s: advance.estdt(sim, s, 1.0e20))(state))
    m = pmesh.make_mesh(8)
    st8 = pmesh.shard_state(state, sim, m)
    dt8 = float(jax.jit(lambda s: advance.estdt(sim, s, 1.0e20))(st8))
    assert abs(dt1 - dt8) <= 1e-14 * abs(dt1)


def test_driver_mesh_mode_inlet_outlet():
    """First-class --mesh run mode (config mesh=N) on an INLET/OUTLET
    config (prob_type 2): the Dirichlet MAC/Helmholtz paths under sharding
    reproduce the single-device run."""
    base = dict(dim_in=2, prob_type=2, n_cellx=32, n_celly=32,
                bcx_lo=11, bcx_hi=12, bcy_lo=14, bcy_hi=14,
                u_bc=((1.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
                rho_bc=((1.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
                max_step=2, init_iter=1, init_shrink=0.5,
                dtype="float64")
    from varden_tpu.driver import Varden
    v1 = Varden(VardenConfig(**base))
    s1 = v1.run()
    v8 = Varden(VardenConfig(**base, mesh=8))
    assert v8.mesh is not None
    s8 = v8.run()
    _assert_state_close(s1, s8, 1e-12)


def test_driver_mesh_mode_two_level():
    """Sharded 2-level hierarchy: the ML step over per-patch sharded arrays
    matches the unsharded run (the reference's rank-count invariance at
    every level, SURVEY.md §4 item 2)."""
    base = dict(dim_in=2, prob_type=1, n_cellx=32, n_celly=32, max_levs=2,
                regrid_int=-1, max_step=2, init_iter=1, grav=-9.8,
                bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                cflfac=0.9, init_shrink=0.1, dtype="float64")
    from varden_tpu.driver import Varden
    v1 = Varden(VardenConfig(**base))
    st1 = v1.run()
    v8 = Varden(VardenConfig(**base, mesh=8))
    assert v8.mesh is not None
    st8 = v8.run()
    assert v1.geom.key() == v8.geom.key()
    for a, b in zip(st1, st8):
        _assert_state_close(a, b, 1e-12)


def test_mesh_aware_clustering_partitions_fine_patch():
    """Mesh runs must shard FINE patches too: the regridder's mesh-aware
    extent quantization (amr/regrid._nest_into) makes adaptive patch
    extents divide the mesh axes, so _even_cell_spec partitions them
    instead of silently replicating (the reference's max_grid_size
    quantization keeps every level's boxes distributable,
    initialize.f90:200). Asserts on the actual sharding spec."""
    import warnings
    from varden_tpu.driver import Varden
    base = dict(dim_in=2, prob_type=1, n_cellx=32, n_celly=32, max_levs=2,
                regrid_int=-1, max_step=1, init_iter=0, grav=-9.8,
                bcx_lo=15, bcx_hi=15, bcy_lo=15, bcy_hi=15,
                cflfac=0.9, init_shrink=0.1, dtype="float64", mesh=8)
    v8 = Varden(VardenConfig(**base))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no replication warnings allowed
        st8 = v8.run()
    assert len(st8) >= 2, "config must produce a fine patch"
    mesh_axes = dict(zip(v8.mesh.axis_names, v8.mesh.devices.shape))
    for lvl, st in enumerate(st8[1:], start=1):
        spec = st.u.sharding.spec
        sharded = [ax for ax in spec if ax is not None]
        assert sharded, (f"fine patch {lvl} (extent {st.u.shape[1:]}) is "
                         f"fully replicated on mesh {mesh_axes}")
