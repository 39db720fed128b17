#!/usr/bin/env python
"""Measure the TPU while-loop DMA pathology and whether a Pallas body
avoids it (ARCHITECTURE.md 'TPU loop pathology').

Variants of a matvec chain inside one `lax.while_loop` program:
  xla1    : ONE dot subgraph in the body
  xla2    : TWO dot subgraphs in the body (the round-1 pathology shape)
  pallas1 : body = one pallas_call blocked matvec
  pallas2 : body = two chained pallas_call matvecs
  redisp  : body as a standalone jit dispatched N times (async)

Timing is DELTA-based — each variant runs at 10 and 110 iterations and
reports (t110 - t10)/100 — because through the remote-TPU tunnel a
single dispatch carries ~5-25 ms of round-trip latency that would
otherwise swamp the per-iteration cost.

History: on the Nov-2025 libtpu (round 1) xla2 ran ~5.6 ms/iter with a
64 MB working set — factor buffers were re-streamed HBM<->VMEM every
iteration (~30x over bandwidth speed-of-light).  On the Jan-2026
libtpu the same program runs bandwidth-bound (~0.05 ms/iter at 32 MB);
this probe exists to catch regressions of that runtime behavior.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 2048        # matrix dim; 2 matrices x 16 MB = 32 MB working set
ITERS = 100
BLK = 256


def _mats(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    M1 = jnp.asarray(rng.standard_normal((N, N)) / np.sqrt(N), dtype)
    M2 = jnp.asarray(rng.standard_normal((N, N)) / np.sqrt(N), dtype)
    x = jnp.asarray(rng.standard_normal((N, 1)), dtype)
    return M1, M2, x


def _loop(body):
    def run(M1, M2, x, niter):
        def b(carry):
            i, x = carry
            x = body(M1, M2, x)
            x = x / jnp.linalg.norm(x)
            return i + 1, x
        _, x = jax.lax.while_loop(lambda c: c[0] < niter, b, (0, x))
        return x
    return jax.jit(run)


def _mv_kernel(M_ref, x_ref, y_ref):
    y_ref[...] = jnp.dot(M_ref[...], x_ref[...],
                         preferred_element_type=jnp.float32)


def pl_matvec(M, x):
    # x and y are (N, 1) so every ref is >=2D (TPU layout: last dim
    # 128-lane; a 1D f32[2048] operand trips Mosaic/XLA tiling mismatch)
    n = M.shape[0]
    return pl.pallas_call(
        _mv_kernel,
        grid=(n // BLK,),
        in_specs=[pl.BlockSpec((BLK, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, 1), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), M.dtype),
    )(M, x)


def _sync(y):
    """True completion fence: on the remote-TPU tunnel
    jax.block_until_ready resolves at enqueue; only a device_get of
    (a slice of) the result waits for execution."""
    jax.device_get(y.ravel()[:1])


def _time(fn, M1, M2, x):
    """(t(110 iters) - t(10 iters)) / 100 — cancels dispatch latency."""
    _sync(fn(M1, M2, x, 2))          # compile
    t = {}
    for niter in (10, 10 + ITERS):
        _sync(fn(M1, M2, x, niter))  # warm
        t0 = time.perf_counter()
        _sync(fn(M1, M2, x, niter))
        t[niter] = time.perf_counter() - t0
    return (t[10 + ITERS] - t[10]) / ITERS


def main():
    M1, M2, x = _mats()
    res = {}

    res["xla1"] = _time(_loop(lambda a, b, v: a @ v), M1, M2, x)
    res["xla2"] = _time(_loop(lambda a, b, v: b @ (a @ v)), M1, M2, x)
    try:
        res["pallas1"] = _time(_loop(lambda a, b, v: pl_matvec(a, v)),
                               M1, M2, x)
        res["pallas2"] = _time(
            _loop(lambda a, b, v: pl_matvec(b, pl_matvec(a, v))),
            M1, M2, x)
    except Exception as e:
        res["pallas"] = f"failed: {e!r}"

    step = jax.jit(lambda a, b, v: (lambda y: y / jnp.linalg.norm(y))(
        b @ (a @ v)))
    y = step(M1, M2, x)
    _sync(y)
    t0 = time.perf_counter()
    v = x
    for _ in range(ITERS):
        v = step(M1, M2, v)
    _sync(v)
    res["redispatch"] = (time.perf_counter() - t0) / ITERS

    # speed of light: xla2 body reads 2 x N*N*4 bytes per iteration
    sol = 2 * N * N * 4 / 819e9
    print(f"(bandwidth-bound floor for the 2-dot body: {sol*1e3:.3f} ms)")
    for k, v in res.items():
        print(f"{k:12s} {v if isinstance(v, str) else f'{v*1e3:.3f} ms/iter'}")


if __name__ == "__main__":
    main()
