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


def make_mesh(n_devices: Optional[int] = None, shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = ("x", "y")) -> Mesh:
    """A 2-D device mesh (mx, my); factors n_devices as square as possible."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        mx = 1
        for f in range(int(n ** 0.5), 0, -1):
            if n % f == 0:
                mx = f
                break
        shape = (mx, n // mx)
    return Mesh(np.array(devices[:n]).reshape(shape), axis_names[:len(shape)])


def state_shardings(sim: Sim, mesh: Mesh) -> State:
    """NamedShardings for a State pytree: cell fields sharded over the first
    two spatial axes, the (n+1)-noded pressure replicated (its solves
    coarsen below tile size quickly anyway)."""
    names = mesh.axis_names
    cell_spec = [None] + [names[i] if i < len(names) else None
                          for i in range(sim.dm)]
    cell = NamedSharding(mesh, P(*cell_spec))
    node = NamedSharding(mesh, P())
    return State(u=cell, s=cell, gp=cell, p=node)


def shard_state(state: State, sim: Sim, mesh: Mesh) -> State:
    sh = state_shardings(sim, mesh)
    return State(u=jax.device_put(state.u, sh.u),
                 s=jax.device_put(state.s, sh.s),
                 gp=jax.device_put(state.gp, sh.gp),
                 p=jax.device_put(state.p, sh.p))


def sharded_step(sim: Sim, mesh: Mesh, proj_type=None):
    """A jitted advance_timestep with sharded in/out states."""
    from .. import advance, projection
    proj_type = projection.REGULAR_TIMESTEP if proj_type is None else proj_type
    sh = state_shardings(sim, mesh)

    def step(state, dt):
        new_state, diag = advance.advance_timestep(sim, state, dt, proj_type)
        return new_state

    return jax.jit(step, out_shardings=sh)
