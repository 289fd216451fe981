"""Named tensor shape/slice/index ops (SURVEY §2.C shape rows).

The reference's tensor math is CLIENT-side (ndarray-style strided
views over Arrow buffers, ella-tensor/src/ops/shape.rs:11-200,
slice.rs:12-77, index.rs:23-34) — it never runs inside DataFusion.
The Spark mapping is the same split: distributed columns come back
through ``Lazy.col`` as a numpy matrix, and these named ops provide
verb-for-verb parity on that driver-side path. Each op documents the
reference method it mirrors; semantics are pinned by numpy-parity
tests mirroring the reference's own test suite (shape.rs:204-239,
slice.rs:82-100, combine.rs:227-249).

Ops that are expressible per-row on a 1-D ``ArrayType`` column accept
a pyspark ``Column`` too and build a JVM expression (reverse / slice /
roll) — no UDF, stays in codegen.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = [
    "t_reshape", "t_flatten", "t_unsqueeze", "t_squeeze", "t_swap_axes",
    "t_t", "t_broadcast_to", "t_broadcast_with", "t_invert_axis",
    "t_roll", "t_slice_axis", "t_collapse_axis", "t_index_axis",
    "t_slice_nd", "t_diag",
]


def t_reshape(a, shape):
    """``Tensor::reshape`` (shape.rs:19-30): size-preserving reshape of
    the standard-layout values."""
    a = np.asarray(a)
    out = np.reshape(np.ascontiguousarray(a), shape)
    if out.size != a.size:  # numpy raises before this; belt + braces
        raise ValueError("reshape must preserve size")
    return out


def t_flatten(a):
    """``Tensor::flatten`` (shape.rs:32-35): 1-D view of all values."""
    return t_reshape(a, (-1,))


def t_unsqueeze(a, axis: int):
    """``Tensor::unsqueeze`` (shape.rs:37-47): insert a size-1 axis."""
    return np.expand_dims(np.asarray(a), axis)


def t_squeeze(a, axis: int):
    """``Tensor::squeeze`` (shape.rs:180-189): drop a size-<=1 axis."""
    a = np.asarray(a)
    if a.shape[axis] > 1:
        raise ValueError(f"axis {axis} has size {a.shape[axis]} > 1")
    return np.squeeze(a, axis=axis)


def t_swap_axes(a, ax1: int, ax2: int):
    """``Tensor::swap_axes`` (shape.rs:49-62)."""
    return np.swapaxes(np.asarray(a), ax1, ax2)


def t_t(a):
    """``Tensor::t`` (shape.rs:193-197): 2-D transpose."""
    return t_swap_axes(a, 0, 1)


def t_broadcast_to(a, shape):
    """``Tensor::broadcast_to`` (shape.rs:74-107): stride-0 broadcast —
    the same trailing-axes rule numpy implements."""
    return np.broadcast_to(np.asarray(a), shape)


def t_broadcast_with(a, b):
    """``Tensor::broadcast_with`` (shape.rs:109-137): co-broadcast two
    tensors to their common shape."""
    return np.broadcast_arrays(np.asarray(a), np.asarray(b))


def t_invert_axis(a, axis: int = 0):
    """``Tensor::invert_axis`` (shape.rs:139-155): reverse one axis.

    On a 1-D array ``Column``: per-row JVM ``reverse`` (axis must
    be 0)."""
    if isinstance(a, Column):
        if axis != 0:
            raise ValueError("Column tensors are 1-D: axis must be 0")
        return F.reverse(a)
    return np.flip(np.asarray(a), axis=axis)


def t_roll(a, axis: int = 0, roll: int = 0):
    """``Tensor::roll`` (shape.rs:157-176): cyclic shift along an axis
    (concat of the two axis slices — numpy's ``np.roll`` contract,
    pinned against the reference's own test matrix shape.rs:212-239).

    On a 1-D array ``Column``: JVM slice+concat, no UDF."""
    if isinstance(a, Column):
        if axis != 0:
            raise ValueError("Column tensors are 1-D: axis must be 0")
        n = F.size(a)
        r = F.pmod(F.lit(roll), n)
        return F.when(n == 0, a).otherwise(
            F.concat(F.slice(a, n - r + 1, r), F.slice(a, F.lit(1), n - r))
        )
    return np.roll(np.asarray(a), roll, axis=axis)


def t_slice_axis(a, axis: int = 0, start=None, stop=None, step=None):
    """``Tensor::slice_axis`` (slice.rs:12-28): range-slice one axis;
    negative bounds count from the end (the reference's ``1..-2``
    spelling is ``start=1, stop=-2``).

    On a 1-D array ``Column`` (axis 0, positive step): JVM ``slice``
    arithmetic over the runtime size."""
    if isinstance(a, Column):
        if axis != 0:
            raise ValueError("Column tensors are 1-D: axis must be 0")
        if step not in (None, 1):
            raise ValueError("Column slice supports step 1 only")
        n = F.size(a)
        lo = (
            F.lit(0)
            if start is None
            else F.lit(start)
            if start >= 0
            else F.greatest(n + start, F.lit(0))
        )
        hi = (
            n
            if stop is None
            else F.least(F.lit(stop), n)
            if stop >= 0
            else F.greatest(n + stop, F.lit(0))
        )
        return F.slice(a, lo + 1, F.greatest(hi - lo, F.lit(0)))
    idx = [slice(None)] * np.asarray(a).ndim
    idx[axis] = slice(start, stop, step)
    return np.asarray(a)[tuple(idx)]


def t_collapse_axis(a, axis: int, index: int):
    """``Tensor::collapse_axis`` (slice.rs:30-38): pick one index along
    an axis, KEEPING the axis at size 1."""
    return np.take(np.asarray(a), [index], axis=axis)


def t_index_axis(a, axis: int, index: int):
    """``Tensor::index_axis`` (index.rs:23-34): pick one index along an
    axis, REMOVING the axis."""
    return np.take(np.asarray(a), index, axis=axis)


def t_slice_nd(a, *specs):
    """``Tensor::slice`` over an ``slice![…]`` spec (slice.rs:40-68):
    ints collapse an axis, ``slice(...)`` objects range-slice it
    (negative steps supported), ``None`` inserts a new axis — exactly
    the reference's AxisSliceSpec::{Index, Slice, NewAxis} triple."""
    idx = tuple(
        np.newaxis if s is None else s
        for s in specs
    )
    return np.asarray(a)[idx]


def t_diag(a):
    """``Tensor::diag`` (slice.rs:70-77): the generalized main diagonal
    — element ``i`` of the result is ``a[i, i, …, i]``; length is the
    smallest dimension (matches the stride-sum construction)."""
    a = np.asarray(a)
    if a.ndim == 0:
        return a.reshape(1)
    m = min(a.shape) if a.ndim > 1 else a.shape[0]
    if a.ndim == 1:
        return a
    ix = (np.arange(m),) * a.ndim
    return a[ix]
