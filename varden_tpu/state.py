"""Simulation context and level state.

The reference's multifab state (make_new_state, src/initialize.f90:344-366):
u (dm comps, ng=3), s (nscal comps, ng=3), gp (dm comps, ng=1) cell-centered,
p node-centered (ng=1). Here ghosts are derived, so ``State`` holds
interior-only arrays; ``Sim`` holds all static metadata (geometry, BC tables)
that parameterizes traced functions.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import bc as bc_mod
from .config import VardenConfig
from .solvers import nodal
from .config import OUTLET


# dtypes of Sims built in this process (for the x64 global-flip warning)
_SIM_DTYPES_SEEN = set()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class State:
    u: jnp.ndarray    # (dm, *n) cell-centered velocity
    s: jnp.ndarray    # (nscal, *n) density + tracers
    gp: jnp.ndarray   # (dm, *n) cell-centered pressure gradient
    p: jnp.ndarray    # node-centered pressure (node_shape)


class Sim:
    """Static per-run context: geometry, BC tables, component maps.

    SIDE EFFECT: constructing a Sim with ``dtype="float64"`` enables
    ``jax_enable_x64`` PROCESS-GLOBALLY (see __init__) — dtype promotion
    changes for all JAX code in the process, including previously created
    f32 sims/arrays. Enable x64 yourself at startup if you mix dtypes."""

    def __init__(self, cfg: VardenConfig):
        cfg.validate()
        if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
            # the reference is dp_t end-to-end (src/bl_types usage); without
            # this, every f64 request silently truncates to f32 at array
            # creation. On backends without f64 (TPU) this turns the silent
            # truncation into a loud compile error instead. NOTE: this flips
            # the PROCESS-GLOBAL x64 flag (see class docstring); warn when a
            # non-f64 Sim was built earlier in this process (its promotion
            # semantics just changed under it) — a pure-f64 process is the
            # normal reference-parity path and stays quiet.
            if any(d != "float64" for d in _SIM_DTYPES_SEEN):
                import warnings
                warnings.warn(
                    "varden_tpu: enabling jax_enable_x64 process-globally "
                    "for a float64 Sim; f32 sims/arrays created earlier in "
                    "this process now promote differently", stacklevel=2)
            jax.config.update("jax_enable_x64", True)
        _SIM_DTYPES_SEEN.add(cfg.dtype)
        self.cfg = cfg
        self.dm = cfg.dm
        self.n_cell = cfg.n_cell
        self.dx = cfg.dx
        self.pmask = cfg.pmask
        self.phys_bc = cfg.phys_bc
        self.adv_bc = bc_mod.adv_bc_table(cfg)
        self.ell_bc = bc_mod.ell_bc_table(cfg)
        self.bvals = bc_mod.bc_values(cfg)
        self.ng = cfg.ng_cell
        self.nscal = cfg.nscal
        self.press_comp = self.dm + self.nscal
        self.extrap_comp = self.dm + self.nscal + 1
        self.dtype = cfg.jnp_dtype
        # bottom-solver selection, honoring the reference's integer codes
        # (mg_bottom_solver/hg_bottom_solver, _parameters:55-57)
        from .solvers.mg import BOTTOM_METHODS
        self.mg_bottom = BOTTOM_METHODS.get(cfg.mg_bottom_solver, "dense")
        self.hg_bottom = BOTTOM_METHODS.get(cfg.hg_bottom_solver, "dense")

    # component-indexed helpers -------------------------------------------
    def eps(self, f64_val: float) -> float:
        """Solver tolerance adapted to the compute dtype: the reference's
        f64 eps schedule (macproject.f90:77-93) or a float32-feasible floor
        on the TPU fast path."""
        if self.dtype == jnp.dtype("float64"):
            return f64_val
        return max(f64_val, 2.0e-5)

    def vel_comp(self, d):
        return d

    def scal_comp(self, i):
        return self.dm + i

    def node_shape(self) -> Tuple[int, ...]:
        return nodal.node_shape(self.n_cell, self.pmask)

    def nodal_mask(self):
        """Dirichlet node mask for the hg solve: 0 on OUTLET boundary nodes."""
        if not any(OUTLET in pair for pair in self.phys_bc):
            return None
        ns = self.node_shape()
        mask = jnp.ones(ns, self.dtype)
        for d in range(self.dm):
            for side in range(2):
                if self.phys_bc[d][side] == OUTLET:
                    sl = [slice(None)] * len(ns)
                    sl[d] = slice(0, 1) if side == 0 else slice(-1, None)
                    mask = mask.at[tuple(sl)].set(0.0)
        return mask

    # ghost fills ----------------------------------------------------------
    def fill_comp(self, f: jnp.ndarray, comp: int, ng: int) -> jnp.ndarray:
        """Pad one variable (by global component index) with ng ghosts."""
        return bc_mod.fill_ghost(f, ng, self.adv_bc[comp],
                                 self.bvals[comp] if comp < len(self.bvals)
                                 else None,
                                 self.pmask, self.dm)

    def fill_vel(self, u: jnp.ndarray, ng: int = None) -> jnp.ndarray:
        ng = self.ng if ng is None else ng
        return jnp.stack([self.fill_comp(u[d], d, ng) for d in range(self.dm)])

    def fill_scal(self, s: jnp.ndarray, ng: int = None) -> jnp.ndarray:
        ng = self.ng if ng is None else ng
        return jnp.stack([self.fill_comp(s[i], self.dm + i, ng)
                          for i in range(s.shape[0])])

    def fill_extrap(self, f: jnp.ndarray, ng: int) -> jnp.ndarray:
        """Generic-extrap fill used for forcing terms (FOEXTRAP at walls)."""
        if f.ndim == self.dm:
            return self.fill_comp(f, self.extrap_comp, ng)
        return jnp.stack([self.fill_comp(f[c], self.extrap_comp, ng)
                          for c in range(f.shape[0])])

    # initial state --------------------------------------------------------
    def zero_state(self) -> State:
        n = self.n_cell
        return State(
            u=jnp.zeros((self.dm,) + n, self.dtype),
            s=jnp.zeros((self.nscal,) + n, self.dtype),
            gp=jnp.zeros((self.dm,) + n, self.dtype),
            p=jnp.zeros(self.node_shape(), self.dtype),
        )
