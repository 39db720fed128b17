#!/usr/bin/env python
"""Micro-bench: batched small-matrix inverse strategies on TPU.

The factor path inverts (B, n, n) f32 batches (B ~ 1000-4000, n ~
6-96).  XLA's jnp.linalg.inv lowers to LU + triangular-inverse custom
calls that run column-serial and need lax.map chunking against a
scoped-vmem cap (~30 ms of the stokes128 factor step).  Candidate: a
batched Gauss-Jordan with partial pivoting expressed as pure
elementwise/one-hot ops under lax.fori_loop — no custom calls, no
chunking, VPU-parallel over the whole batch.

Run on TPU: python tools/inv_bench.py [B n reps]
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


def gj_inverse(A):
    """Batched Gauss-Jordan inverse with partial pivoting, pure
    elementwise/broadcast ops (no custom calls, no per-batch dynamic
    indexing: pivot row selection is a one-hot masked reduction)."""
    B, n, _ = A.shape
    dtype = A.dtype
    W = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n))], axis=2)
    iota = jnp.arange(n)
    iota2 = jnp.arange(2 * n)

    def step(k, W):
        selk = (iota2 == k).astype(dtype)                 # (2n,) col pick
        colk = jnp.einsum("bij,j->bi", W, selk)
        # partial pivot: largest |colk| among rows >= k
        cand = jnp.where(iota[None, :] >= k, jnp.abs(colk), -1.0)
        p = jnp.argmax(cand, axis=1)                      # (B,)
        onep = (iota[None, :] == p[:, None]).astype(dtype)   # (B, n)
        onek = (iota[None, :] == k).astype(dtype)            # (B, n)
        rowp = jnp.einsum("bij,bi->bj", W, onep)          # (B, 2n)
        rowk = jnp.einsum("bij,bi->bj", W, onek)
        # swap rows k <-> p
        W = W + onek[:, :, None] * (rowp - rowk)[:, None, :] \
              + onep[:, :, None] * (rowk - rowp)[:, None, :]
        # scale row k by 1/pivot and eliminate the column everywhere else
        piv = jnp.einsum("bj,j->b", rowp, selk)
        piv = jnp.where(piv == 0, jnp.ones_like(piv), piv)
        rowk_s = rowp / piv[:, None]                      # (B, 2n)
        colk2 = jnp.einsum("bij,j->bi", W, selk)
        factor = jnp.where(iota[None, :] == k,
                           jnp.zeros_like(colk2), colk2)  # (B, n)
        W = W - factor[:, :, None] * rowk_s[:, None, :]
        # set row k to the scaled pivot row
        W = W * (1.0 - onek[:, :, None]) + onek[:, :, None] * \
            rowk_s[:, None, :]
        return W

    W = lax.fori_loop(0, n, step, W)
    return W[:, :, n:]


def delta_time(fn, reps, *args):
    fjit = jax.jit(fn)
    sync(fjit(1, *args))
    t = {}
    for nit in (1, reps + 1):
        t0 = time.perf_counter()
        sync(fjit(nit, *args))
        t[nit] = time.perf_counter() - t0
    return max((t[reps + 1] - t[1]) / reps, 1e-9)


def bench(B, n, reps=20):
    from hymls_tpu.core.dense import _batched_inv
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A += n * np.eye(n, dtype=np.float32)[None]     # well-conditioned
    Aj = jnp.asarray(A)

    def loop(inv):
        def f(niter, Aj):
            def body(i, acc):
                return acc + inv(Aj + 1e-30 * i.astype(jnp.float32))
            return lax.fori_loop(0, niter, body, jnp.zeros_like(Aj))
        return f

    t_xla = delta_time(loop(_batched_inv), reps, Aj)
    t_gj = delta_time(loop(gj_inverse), reps, Aj)
    # parity
    X0 = np.asarray(jax.jit(_batched_inv)(Aj), np.float64)
    X1 = np.asarray(jax.jit(gj_inverse)(Aj), np.float64)
    r0 = np.abs(np.eye(n) - np.asarray(A, np.float64) @ X0).max()
    r1 = np.abs(np.eye(n) - np.asarray(A, np.float64) @ X1).max()
    print(f"B={B} n={n}: xla={t_xla*1e3:.3f}ms gj={t_gj*1e3:.3f}ms "
          f"speedup={t_xla/t_gj:.2f}x  resid xla={r0:.2e} gj={r1:.2e}",
          flush=True)


def main():
    if len(sys.argv) > 2:
        bench(int(sys.argv[1]), int(sys.argv[2]),
              int(sys.argv[3]) if len(sys.argv) > 3 else 20)
        return
    for B, n in [(1062, 47), (1984, 6), (28, 96), (4096, 34)]:
        bench(B, n)


if __name__ == "__main__":
    main()
