"""Shift helpers for stencil code on padded arrays.

Conventions: spatial axes are the last ``dm`` axes. ``shift(f, axis, n)``
returns the array whose element i equals f[i+n] (data moved toward lower
indices for n>0), implemented with jnp.roll — values wrapping across the array
edge land only in ghost/garbage cells, which callers never consume.

Performance note (from profiling): rolls lower to slice+concat and DO
materialize; they are acceptable inside large fused stages but the round-2
plan replaces the hot Godunov paths with valid-region slicing.
"""
from __future__ import annotations

import jax.numpy as jnp


def shift(f: jnp.ndarray, axis: int, n: int) -> jnp.ndarray:
    """f_out[..., i, ...] = f[..., i+n, ...] (wrap into unused edge cells)."""
    if n == 0:
        return f
    return jnp.roll(f, -n, axis=axis)
