"""Shift/slice helpers for stencil code on padded arrays.

Conventions: spatial axes are the last ``dm`` axes. ``shift(f, axis, n)``
returns the array whose element i equals f[i+n] (data moved toward lower
indices for n>0), implemented with jnp.roll — values wrapping across the array
edge land only in ghost/garbage cells, which callers never consume.
"""
from __future__ import annotations

import jax.numpy as jnp


def shift(f: jnp.ndarray, axis: int, n: int) -> jnp.ndarray:
    """f_out[..., i, ...] = f[..., i+n, ...] (wrap into unused edge cells)."""
    if n == 0:
        return f
    return jnp.roll(f, -n, axis=axis)


def axslice(f: jnp.ndarray, axis: int, i0, i1=None, step=None) -> jnp.ndarray:
    sl = [slice(None)] * f.ndim
    sl[axis] = slice(i0, i1, step) if i1 is not None or step is not None else slice(i0, i0 + 1 if i0 != -1 else None)
    return f[tuple(sl)]


def set_axslice(f: jnp.ndarray, axis: int, i0, i1, value) -> jnp.ndarray:
    sl = [slice(None)] * f.ndim
    sl[axis] = slice(i0, i1)
    return f.at[tuple(sl)].set(value)


def crop(f: jnp.ndarray, ng: int, dm: int, grow: int = 0) -> jnp.ndarray:
    """Crop a padded array back to interior plus ``grow`` cells per side."""
    if ng == grow:
        return f
    sl = [slice(None)] * (f.ndim - dm) + [slice(ng - grow, -(ng - grow))] * dm
    return f[tuple(sl)]
