"""Windowed fields: zero-copy shifts for stencil pipelines.

The round-1 Godunov implementation expressed every shift as ``jnp.roll``,
which lowers to slice+concat and MATERIALIZES a full-array copy per shift on
TPU — profiling showed those copies rivaling the actual Godunov math
(~13 ms/step of pure data movement at 128^3).

A ``Win`` wraps an array together with the *padded-grid coordinates* it
covers: ``arr[..., k0, k1, ...]`` holds the value at padded coordinate
``lo[d] + kd`` along each of the last ``dm`` spatial axes. With that
bookkeeping a shift is a pure relabeling (adjust ``lo``; zero data movement),
and every binary operation crops both operands to the intersection of their
coordinate ranges with *static* slices — which XLA fuses into the consuming
elementwise loop instead of copying.

A second benefit is exact validity tracking: the coordinate range of a Win is
by construction the region on which its values are well-defined, so the final
``crop`` to the interior faces fails loudly (a Python slice error at trace
time) if the ghost width were ever insufficient — where the roll-based code
would silently wrap garbage.

Math stays identical to the reference's debug-oracle formulation
(src/velpred.f90, src/mkflux.f90): only the data movement changed.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


class Win:
    """A view of a stencil field over padded coordinates.

    ``arr``'s last ``len(lo)`` axes are spatial; spatial axis d covers padded
    coordinates ``[lo[d], lo[d] + arr.shape[-dm+d])``. Leading axes broadcast.
    """

    __slots__ = ("arr", "lo")

    def __init__(self, arr, lo: Sequence[int]):
        self.arr = arr
        self.lo = tuple(int(x) for x in lo)

    # -- geometry -----------------------------------------------------------
    @property
    def dm(self) -> int:
        return len(self.lo)

    @property
    def hi(self) -> Tuple[int, ...]:
        dm = self.dm
        return tuple(self.lo[d] + self.arr.shape[self.arr.ndim - dm + d]
                     for d in range(dm))

    def shift(self, axis: int, n: int) -> "Win":
        """out[coord i] = self[coord i + n] — pure relabeling, no data move."""
        if n == 0:
            return self
        lo = list(self.lo)
        lo[axis] -= n
        return Win(self.arr, lo)

    def crop(self, lo: Sequence[int], hi: Sequence[int]):
        """Materialize the plain array covering coords [lo, hi)."""
        dm = self.dm
        sl = [slice(None)] * self.arr.ndim
        for d in range(dm):
            i0 = lo[d] - self.lo[d]
            i1 = hi[d] - self.lo[d]
            if i0 < 0 or i1 > self.arr.shape[self.arr.ndim - dm + d]:
                raise ValueError(
                    f"crop [{lo},{hi}) outside window [{self.lo},{self.hi})")
            sl[self.arr.ndim - dm + d] = slice(i0, i1)
        return self.arr[tuple(sl)]

    def to(self, lo: Sequence[int], hi: Sequence[int]) -> "Win":
        return Win(self.crop(lo, hi), lo)

    def zeros_like(self) -> "Win":
        return Win(jnp.zeros_like(self.arr), self.lo)

    # -- face plane access (cell-aligned face arrays) ------------------------
    def plane(self, axis: int, coord: int, width: int = 1,
              as_coord: int = None) -> "Win":
        """The size-``width`` slab at padded coordinate ``coord`` (keepdims).

        ``as_coord`` relabels the slab to that coordinate, so planes taken at
        different positions can be combined elementwise."""
        dm = self.dm
        i0 = coord - self.lo[axis]
        if i0 < 0 or i0 + width > self.arr.shape[self.arr.ndim - dm + axis]:
            raise ValueError(f"plane {coord} outside window along {axis}")
        sl = [slice(None)] * self.arr.ndim
        sl[self.arr.ndim - dm + axis] = slice(i0, i0 + width)
        lo = list(self.lo)
        lo[axis] = coord if as_coord is None else as_coord
        return Win(self.arr[tuple(sl)], lo)

    def set_plane(self, axis: int, coord: int, val) -> "Win":
        """Overwrite one coordinate plane with ``val`` (a Win slab or scalar),
        as a fusable select (never a dynamic-update-slice, which would
        materialize a full copy on TPU)."""
        w = self
        if isinstance(val, Win):
            # align val with w on the non-set axes (w may need shrinking)
            lo, hi = list(w.lo), list(w.hi)
            vlo, vhi = val.lo, val.hi
            for d in range(w.dm):
                if d == axis:
                    continue
                lo[d] = max(lo[d], vlo[d])
                hi[d] = min(hi[d], vhi[d])
            w = w.to(lo, hi)
            plo, phi = list(lo), list(hi)
            plo[axis], phi[axis] = val.lo[axis], val.hi[axis]
            v = val.crop(plo, phi)
        else:
            v = val
        dm = w.dm
        size = w.arr.shape[w.arr.ndim - dm + axis]
        shape = [1] * w.arr.ndim
        shape[w.arr.ndim - dm + axis] = size
        ii = (jnp.arange(size) + w.lo[axis]).reshape(shape)
        return Win(jnp.where(ii == coord, v, w.arr), w.lo)

    # -- arithmetic -----------------------------------------------------------
    def __add__(self, o):
        return wmap(jnp.add, self, o)

    def __radd__(self, o):
        return wmap(jnp.add, o, self)

    def __sub__(self, o):
        return wmap(jnp.subtract, self, o)

    def __rsub__(self, o):
        return wmap(jnp.subtract, o, self)

    def __mul__(self, o):
        return wmap(jnp.multiply, self, o)

    def __rmul__(self, o):
        return wmap(jnp.multiply, o, self)

    def __truediv__(self, o):
        return wmap(jnp.divide, self, o)

    def __rtruediv__(self, o):
        return wmap(jnp.divide, o, self)

    def __neg__(self):
        return Win(-self.arr, self.lo)


def _is_win(x) -> bool:
    return isinstance(x, Win)


def wmap(f, *args) -> Win:
    """Apply an elementwise jnp function over Wins/scalars, cropping every Win
    operand to the intersection of their coordinate ranges (static slices)."""
    wins = [a for a in args if _is_win(a)]
    if not wins:
        raise TypeError("wmap needs at least one Win argument")
    dm = wins[0].dm
    lo = [max(w.lo[d] for w in wins) for d in range(dm)]
    hi = [min(w.hi[d] for w in wins) for d in range(dm)]
    for d in range(dm):
        if lo[d] >= hi[d]:
            raise ValueError(f"empty window intersection along axis {d}: "
                             f"{[w.lo for w in wins]} .. {[w.hi for w in wins]}")
    vals = [a.crop(lo, hi) if _is_win(a) else a for a in args]
    return Win(f(*vals), lo)


def where(c, a, b) -> Win:
    return wmap(jnp.where, c, a, b)


def minimum(a, b) -> Win:
    return wmap(jnp.minimum, a, b)


def maximum(a, b) -> Win:
    return wmap(jnp.maximum, a, b)


def full(arr, dm: int) -> Win:
    """Wrap a fully-valid padded array (origin at padded coordinate 0)."""
    return Win(arr, (0,) * dm)
