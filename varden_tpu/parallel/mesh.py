"""Multi-chip sharding: device mesh + state shardings.

TPU-native replacement for the reference's MPI box decomposition (SURVEY.md
§5.7/§5.8): each level is one global dense array sharded spatially over a
device mesh. Code stays global-view jnp under jit; XLA's SPMD partitioner
inserts the halo-exchange collective-permutes for every stencil shift and the
all-reduces for norms/dt — the roles of multifab_fill_boundary and
parallel_reduce. Coarse MG levels drop below the mesh tile size and are
handled by XLA (progressively replicated), mirroring mg_bottom_solver
semantics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import Sim, State


def maybe_init_distributed() -> bool:
    """Multi-host (DCN) entry: the reference's MPI_Init role (main.f90:13,
    FBoxLib boxlib_initialize). Gated on the standard JAX cluster env —
    JAX_COORDINATOR_ADDRESS (+ optional JAX_NUM_PROCESSES / JAX_PROCESS_ID,
    else auto-detected from the cluster environment) — or
    VARDEN_COORDINATOR; a no-op on single-host runs. After initialization
    ``jax.devices()`` is the GLOBAL device list, so make_mesh/pjit span
    hosts and XLA routes inter-host collectives over DCN. Rank-0 file
    output gates on ``is_io_proc()`` (parallel_IOProcessor role).

    Scope note: exercised in single-process form in CI; real multi-host
    DCN runs need a TPU pod slice this image does not have."""
    import os
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("VARDEN_COORDINATOR"))
    if not addr:
        return False
    if jax.process_count() > 1:
        return True  # already initialized
    kwargs = {"coordinator_address": addr}
    num = int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    if num > 0:
        kwargs["num_processes"] = num
        kwargs["process_id"] = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(**kwargs)
    return True


def is_io_proc() -> bool:
    """parallel_IOProcessor() equivalent (rank-0 I/O gating)."""
    return jax.process_index() == 0


def mesh_shape(n: int) -> Tuple[int, int]:
    """The (mx, my) factoring make_mesh uses: as square as possible.
    Exposed separately so the regridder can quantize patch extents to
    mesh-divisible sizes without touching jax.devices()."""
    mx = 1
    for f in range(int(n ** 0.5), 0, -1):
        if n % f == 0:
            mx = f
            break
    return (mx, n // mx)


def make_mesh(n_devices: Optional[int] = None, shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = ("x", "y")) -> Mesh:
    """A 2-D device mesh (mx, my); factors n_devices as square as possible."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        shape = mesh_shape(n)
    return Mesh(np.array(devices[:n]).reshape(shape), axis_names[:len(shape)])


def _axis_sizes(mesh: Mesh):
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def _node_spec(sim: Sim, mesh: Mesh, shape) -> P:
    """Per-axis node sharding: shard an axis only when its node count is a
    multiple of the mesh axis size (JAX requires even shards). Periodic axes
    carry exactly n nodes and shard like cells; wall/inlet axes carry n+1
    and stay replicated along that mesh axis."""
    sizes = _axis_sizes(mesh)
    names = mesh.axis_names
    spec = []
    for d in range(sim.dm):
        nm = names[d] if d < len(names) else None
        if nm is not None and shape[d] % sizes[nm] == 0:
            spec.append(nm)
        else:
            spec.append(None)
    return P(*spec)


def state_shardings(sim: Sim, mesh: Mesh) -> State:
    """NamedShardings for a State pytree: cell fields (leading component
    axis) and the nodal pressure sharded over the first two spatial axes —
    the reference decomposes nodal multifabs over the same boxes as cell
    ones (hgproject.f90's layout is the cell layout). Node axes whose count
    (n+1 on physical axes) does not divide the mesh stay replicated on that
    axis (JAX requires even shards)."""
    from ..solvers.nodal import node_shape
    names = mesh.axis_names
    spatial = [names[i] if i < len(names) else None for i in range(sim.dm)]
    cell = NamedSharding(mesh, P(*([None] + spatial)))
    nshape = node_shape(sim.n_cell, sim.pmask)
    node = NamedSharding(mesh, _node_spec(sim, mesh, nshape))
    return State(u=cell, s=cell, gp=cell, p=node)


def hint_shardings(sim: Sim, mesh: Mesh, hints: dict) -> dict:
    """Shardings for a projection-hints dict: phi_mac* are cell-shaped
    (no component axis), phi_hg* node-shaped (replicated on uneven axes)."""
    names = mesh.axis_names
    spatial = [names[i] if i < len(names) else None for i in range(sim.dm)]
    cell = NamedSharding(mesh, P(*spatial))
    out = {}
    for k, v in hints.items():
        out[k] = NamedSharding(mesh, _node_spec(sim, mesh, v.shape)) \
            if k.startswith("phi_hg") else cell
    return out


def shard_hints(hints: dict, sim: Sim, mesh: Mesh) -> dict:
    sh = hint_shardings(sim, mesh, hints)
    return {k: jax.device_put(v, sh[k]) for k, v in hints.items()}


def shard_state(state: State, sim: Sim, mesh: Mesh) -> State:
    sh = state_shardings(sim, mesh)
    return State(u=jax.device_put(state.u, sh.u),
                 s=jax.device_put(state.s, sh.s),
                 gp=jax.device_put(state.gp, sh.gp),
                 p=jax.device_put(state.p, sh.p))


def _even_cell_spec(sim: Sim, mesh: Mesh, shape, lead: int) -> P:
    """Cell-array sharding with ``lead`` leading (component) axes: a spatial
    axis shards only when its extent divides the mesh axis (fine patches
    with odd extents stay replicated on that axis)."""
    sizes = _axis_sizes(mesh)
    names = mesh.axis_names
    spec = [None] * lead
    for d in range(sim.dm):
        nm = names[d] if d < len(names) else None
        if nm is not None and shape[lead + d] % sizes[nm] == 0:
            spec.append(nm)
        else:
            spec.append(None)
    return P(*spec)


def shard_ml_states(geom, states, mesh: Mesh):
    """device_put every patch's fields with spatial shardings — the
    reference distributes EVERY level's boxes over the same ranks
    (varden.f90:273-300; box layouts are level-agnostic). Warns when a
    patch axis is forced to replicate (extent does not divide the mesh
    axis): that costs memory and scaling, and the regridder's mesh-aware
    quantization (amr/regrid._nest_into) should normally prevent it."""
    import warnings
    sim = geom.sim
    sizes = _axis_sizes(mesh)
    names = mesh.axis_names
    out = []
    for i, st in enumerate(states):
        spec = _even_cell_spec(sim, mesh, st.u.shape, 1)
        for d in range(sim.dm):
            nm = names[d] if d < len(names) else None
            if nm is not None and sizes[nm] > 1 and spec[1 + d] is None:
                warnings.warn(
                    f"patch {i} (extent {st.u.shape[1:]}) replicates on "
                    f"mesh axis '{nm}' (size {sizes[nm]}): axis extent "
                    f"{st.u.shape[1 + d]} is not mesh-divisible")
        cell = NamedSharding(mesh, spec)
        node = NamedSharding(mesh, _node_spec(sim, mesh, st.p.shape))
        out.append(State(u=jax.device_put(st.u, cell),
                         s=jax.device_put(st.s, cell),
                         gp=jax.device_put(st.gp, cell),
                         p=jax.device_put(st.p, node)))
    return out


def shard_ml_hints(geom, hints: dict, mesh: Mesh) -> dict:
    sim = geom.sim
    out = {}
    for k, vs in hints.items():
        nodal = k.startswith("phi_hg")
        row = []
        for v in vs:
            spec = _node_spec(sim, mesh, v.shape) if nodal \
                else _even_cell_spec(sim, mesh, v.shape, 0)
            row.append(jax.device_put(v, NamedSharding(mesh, spec)))
        out[k] = row
    return out


def sharded_step(sim: Sim, mesh: Mesh, proj_type=None):
    """A jitted advance_timestep with sharded in/out states."""
    from .. import advance, projection
    proj_type = projection.REGULAR_TIMESTEP if proj_type is None else proj_type
    sh = state_shardings(sim, mesh)

    def step(state, dt):
        new_state, diag = advance.advance_timestep(sim, state, dt, proj_type)
        return new_state

    return jax.jit(step, out_shardings=sh)
