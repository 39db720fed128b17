"""Sort-based application of static gather maps (TPU).

XLA lowers ``x[idx]`` with a dense index vector to a serial TPU gather
at ~8 ns/element (f32; ~19 ns in f64) — for the large static index maps
of this package (factor-path block extraction, skew perm-mode
entry/exit) the gather, not the arithmetic, is the floor.  A gather
whose valid entries are *injective* is a permutation in disguise, and a
static permutation can ride the TPU's vectorized sort network instead:
with ``keys`` the inverse permutation, ``lax.sort_key_val(keys, x)``
yields ``x[perm]`` in its values slot.  O(n log n) lane-parallel work
beats O(n) serial loads from ~32k elements up (tools/perm_bench.py,
v5e: 65k gather 471 us vs sort 33 us; 620k f64: 11.6 ms vs 1.2 ms;
1M f32: 9.0 ms vs 1.5 ms).

The reference implements the corresponding data movement with
Epetra_Import plans (reference src/HYMLS_HierarchicalMap.cpp:144-285);
on TPU the maps are static, so the choice of *algorithm* for the move
is a build-time decision per map: ``HYMLS_PERM_STRATEGY`` = "auto"
(sort on TPU above the size threshold), "sort", or "gather".  Both
strategies move identical values — results are bit-for-bit equal.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

_PERM_SORT_MIN = 32768


def want_sort_perm(m: int, src: int) -> bool:
    """Should the (m out of src) static map use the sort strategy?"""
    mode = os.environ.get("HYMLS_PERM_STRATEGY", "auto")
    if mode == "sort":
        return True
    if mode != "auto":
        return False
    return (jax.default_backend() == "tpu"
            and max(m, src) >= _PERM_SORT_MIN)


def perm_sort_plan(g, src_size: int) -> Optional[np.ndarray]:
    """Re-express the static gather out[i] = src_ext[g[i]] (where
    sentinel g[i] >= src_size reads an appended zero) as one sorted
    permutation.  Returns int32 keys of size P >= max(len(g), src_size)
    such that sort_key_val(keys, pad(x, P))[1][:len(g)] == out, or None
    when g is not injective on its valid entries (overlapping reads
    cannot be a permutation) or P would overflow int32."""
    g = np.asarray(g, np.int64).ravel()
    m = g.size
    valid = g < src_size
    used = g[valid]
    if np.unique(used).size != used.size:
        return None
    n_sent = m - used.size
    P = max(m, src_size + n_sent)
    if P >= 2**31:
        return None
    perm = np.empty(P, np.int64)
    zero_slots = np.arange(src_size, P)
    perm[np.nonzero(valid)[0]] = used
    perm[np.nonzero(~valid)[0]] = zero_slots[:n_sent]
    if P > m:
        unused_src = np.setdiff1d(np.arange(src_size), used)
        perm[m:] = np.concatenate([unused_src, zero_slots[n_sent:]])
    keys = np.empty(P, np.int64)
    keys[perm] = np.arange(P)
    return keys.astype(np.int32)


def apply_sorted_perm(x, keys, m):
    """Apply a perm_sort_plan: pad x to len(keys) with zeros (these
    positions are what sentinel outputs read), sort, take the first m."""
    pad = keys.shape[0] - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    _, s = jax.lax.sort_key_val(keys, x)
    return s[:m]


def want_scatter_perm(m: int, nval: int, src: int, itemsize: int) -> bool:
    """Should the (m out of src, nval valid) static map use the
    compact-sort + scatter strategy?  Measured on v5e
    (tools/extract_bench.py, m=2.36M src=340k dens=0.1): f32 scatter
    1.9 ms vs sort 5.7 ms vs gather 16.9 ms — but f64 scatter LOSES
    (19.8 ms vs sort 6.9: the serialized f64 scatter costs ~80
    ns/element).  So: 4-byte values only, sentinel-heavy maps only
    (scatter cost ~ 8 ns * nval vs sort ~ 2.4 ns * m -> win iff
    3*nval <= m)."""
    mode = os.environ.get("HYMLS_PERM_STRATEGY", "auto")
    if mode == "scatter":
        return True
    if mode != "auto":
        return False
    return (jax.default_backend() == "tpu"
            and itemsize <= 4
            and max(m, src) >= _PERM_SORT_MIN
            and 3 * nval <= m)


def perm_scatter_plan(g, src_size: int):
    """Sentinel-heavy variant of perm_sort_plan: when most of g's slots
    are sentinels (g[i] >= src_size -> 0.0), the sort strategy still
    pays an O(len(g))-sized sort moving ~90% zeros.  Re-express the map
    as (compact sorted permutation at SOURCE size) + (static scatter of
    the valid slots): out = zeros(m).at[pos].set(x[g[pos]]).  Returns
    (ckeys, pos) — ckeys a perm_sort_plan over the valid entries only,
    pos the int32 positions of the valid slots — or None when g is not
    injective on its valid entries.  Profitable when the valid count is
    well under len(g) (plan-build picks the strategy per map)."""
    g = np.asarray(g, np.int64).ravel()
    valid = g < src_size
    pos = np.nonzero(valid)[0]
    used = g[pos]
    if np.unique(used).size != used.size or pos.size >= 2**31:
        return None
    ckeys = perm_sort_plan(used, src_size)
    if ckeys is None:
        return None
    return ckeys, pos.astype(np.int32)


def apply_scatter_perm(x, ckeys, pos, m):
    """Apply a perm_scatter_plan: compact sorted gather of the valid
    values, then one static unique-index scatter into a zero output."""
    vals = apply_sorted_perm(x, ckeys, pos.shape[0])
    return jnp.zeros((m,), x.dtype).at[pos].set(
        vals, mode="drop", unique_indices=True)
