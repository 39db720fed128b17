"""Static-permutation microbenchmark: gather vs sort-based apply.

The skew (perm-mode) structured V-cycle applies two static
permutations per level per Krylov iteration (entry/exit maps,
`core/structured.py` SLevel.entry/exit/up) and the coarse stage two
more (src/back).  XLA lowers `x[idx]` with a dense index vector to a
serial TPU gather at ~10 ns/element, which makes the permutation —
not the matmuls — the floor for skew iterations.

A static permutation can instead ride the TPU's vectorized bitonic
sort: with `inv` the inverse permutation, `lax.sort_key_val(inv, x)`
returns `x[idx]` in its values slot.  That is O(n log n) elementwise
work but fully lane-parallel, versus the gather's O(n) serial loads.
This tool measures both (plus the one-hot-matmul variant for small n)
so the crossover is recorded per runtime; `core/structured.py` picks
its permutation strategy from these numbers.

Run on the real TPU:  python tools/perm_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def _sync(x):
    from hymls_tpu.utils.timings import sync
    sync(x)


def _delta_time(fn, x, reps=100):
    """Device-time per application via the fused fori_loop delta
    (cancels dispatch/tunnel latency; see bench.py)."""
    def loop(nit, v):
        return lax.fori_loop(0, nit, lambda i, z: fn(z), v)

    fjit = jax.jit(loop, static_argnums=())
    _sync(fjit(1, x))
    t = {}
    for nit in (1, reps + 1):
        t0 = time.perf_counter()
        _sync(fjit(nit, x))
        t[nit] = time.perf_counter() - t0
    return max((t[reps + 1] - t[1]) / reps, 1e-9)


def bench_n(n, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n).astype(np.int32)
    inv = np.empty(n, np.int32)
    inv[idx] = np.arange(n, dtype=np.int32)

    idx_d = jnp.asarray(idx)
    inv_d = jnp.asarray(inv)
    x = jnp.asarray(rng.standard_normal(n), dtype)

    def gather(v):
        return v[idx_d]

    def sort_perm(v):
        _, out = lax.sort_key_val(inv_d, v)
        return out

    # correctness
    ref = np.asarray(x)[idx]
    np.testing.assert_allclose(np.asarray(jax.jit(gather)(x)), ref)
    np.testing.assert_allclose(np.asarray(jax.jit(sort_perm)(x)), ref)

    tg = _delta_time(gather, x)
    ts = _delta_time(sort_perm, x)
    row = {"n": n, "gather_us": round(tg * 1e6, 2),
           "sort_us": round(ts * 1e6, 2),
           "gather_ns_per_el": round(tg / n * 1e9, 3),
           "speedup_sort": round(tg / ts, 2)}
    return row


def main():
    print("device:", jax.devices()[0])
    for n in (4096, 16384, 65536, 262144, 1048576):
        row = bench_n(n)
        print(row, flush=True)


if __name__ == "__main__":
    main()
