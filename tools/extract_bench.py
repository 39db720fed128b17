#!/usr/bin/env python
"""Micro-bench: strategies for the sentinel-heavy block-extraction map
(factor path) — out[i] = src_ext[g[i]] where ~90% of g are sentinel
(zero) slots, out ~ 2.3M slots, src ~ 340k values.

The sort-permutation strategy (core/permute.py) pays an O(out)-sized
sort even though only ~10% of slots carry values.  Candidates:

  sort      current: one sort_key_val of size P ~ out
  scatter   zeros(m).at[pos].set(src[gv]) — compact gather (sorted at
            src size) + serial scatter of the valid slots only
  gather    plain XLA x[idx] (the 8 ns/element baseline)

Run on the real TPU: python tools/extract_bench.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")

sys.path.insert(0, "/root/repo")
from hymls_tpu.utils.timings import sync  # noqa: E402
from hymls_tpu.core.permute import perm_sort_plan, apply_sorted_perm  # noqa: E402


def delta_time(fn, reps, *args):
    fjit = jax.jit(fn)
    sync(fjit(1, *args))
    t = {}
    for nit in (1, reps + 1):
        t0 = time.perf_counter()
        sync(fjit(nit, *args))
        t[nit] = time.perf_counter() - t0
    return max((t[reps + 1] - t[1]) / reps, 1e-9)


def bench(m, src, density, dtype, reps=50):
    rng = np.random.default_rng(0)
    nval = int(m * density)
    nval = min(nval, src)
    g = np.full(m, src, np.int64)
    pos = np.sort(rng.choice(m, size=nval, replace=False))
    g[pos] = rng.permutation(src)[:nval]
    x = jnp.asarray(rng.standard_normal(src), dtype)

    out = {}

    # plain gather
    gj = jnp.asarray(g, jnp.int32)

    def loop_gather(niter, x):
        def body(i, acc):
            xe = jnp.concatenate([x + 1e-30 * i.astype(x.dtype),
                                  jnp.zeros((1,), x.dtype)])
            return acc + xe[gj]
        return lax.fori_loop(0, niter, body, jnp.zeros(m, x.dtype))

    out["gather_ms"] = delta_time(loop_gather, reps, x) * 1e3

    # sort strategy
    keys = perm_sort_plan(g, src)
    kj = jnp.asarray(keys)

    def loop_sort(niter, x):
        def body(i, acc):
            return acc + apply_sorted_perm(x + 1e-30 * i.astype(x.dtype),
                                           kj, m)
        return lax.fori_loop(0, niter, body, jnp.zeros(m, x.dtype))

    out["sort_ms"] = delta_time(loop_sort, reps, x) * 1e3

    # compact gather (sort at src size) + scatter of valid slots
    gv = g[pos]
    ckeys = perm_sort_plan(gv, src)
    ckj = jnp.asarray(ckeys)
    posj = jnp.asarray(pos, jnp.int32)

    def loop_scatter(niter, x):
        def body(i, acc):
            vals = apply_sorted_perm(x + 1e-30 * i.astype(x.dtype),
                                     ckj, nval)
            return acc + jnp.zeros(m, x.dtype).at[posj].set(
                vals, mode="drop", unique_indices=True)
        return lax.fori_loop(0, niter, body, jnp.zeros(m, x.dtype))

    out["scatter_ms"] = delta_time(loop_scatter, reps, x) * 1e3

    # parity
    xe = np.concatenate([np.asarray(x), [0.0]])
    ref = xe[g]
    a = np.asarray(jax.jit(loop_sort)(1, x))
    b = np.asarray(jax.jit(loop_scatter)(1, x))
    assert np.allclose(a, ref, atol=1e-6), "sort mismatch"
    assert np.allclose(b, ref, atol=1e-6), "scatter mismatch"
    return out


def main():
    for m, src, dens, dt in [
            (2_359_296, 340_000, 0.10, jnp.float32),
            (2_359_296, 340_000, 0.10, jnp.float64),
            (1_183_744, 120_000, 0.10, jnp.float64),
            (2_359_296, 340_000, 0.30, jnp.float64)]:
        r = bench(m, src, dens, dt)
        print(f"m={m} src={src} dens={dens} {jnp.dtype(dt).name}: "
              + "  ".join(f"{k}={v:.3f}" for k, v in r.items()),
              flush=True)


if __name__ == "__main__":
    main()
