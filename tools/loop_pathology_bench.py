#!/usr/bin/env python
"""Measure the TPU while-loop DMA pathology and whether a Pallas body
avoids it (ARCHITECTURE.md 'TPU loop pathology').

Variants of 100 iterations of a large-matrix matvec chain:
  xla1    : while_loop, ONE dot subgraph in the body
  xla2    : while_loop, TWO dot subgraphs in the body (the pathology)
  pallas1 : while_loop, body = one pallas_call blocked matvec
  pallas2 : while_loop, body = two chained pallas_call matvecs
  redisp  : body as a standalone jit dispatched N times (async)

Prints ms/iteration; xla2/pallas2 is the win a fused-kernel V-cycle
body would get inside the Krylov loop.
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
    x = jnp.asarray(rng.standard_normal(N), dtype)
    return M1, M2, x


def _loop(body):
    def run(M1, M2, x):
        def b(carry):
            i, x = carry
            x = body(M1, M2, x)
            x = x / jnp.linalg.norm(x)
            return i + 1, x
        _, x = jax.lax.while_loop(lambda c: c[0] < ITERS, b, (0, x))
        return x
    return jax.jit(run)


def _mv_kernel(M_ref, x_ref, y_ref):
    y_ref[...] = M_ref[...] @ x_ref[...]


def pl_matvec(M, x):
    n = M.shape[0]
    return pl.pallas_call(
        _mv_kernel,
        grid=(n // BLK,),
        in_specs=[pl.BlockSpec((BLK, n), lambda i: (i, 0)),
                  pl.BlockSpec((n,), lambda i: (0,))],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), M.dtype),
    )(M, x)


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


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
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    v = x
    for _ in range(ITERS):
        v = step(M1, M2, v)
    jax.block_until_ready(v)
    res["redispatch"] = (time.perf_counter() - t0) / ITERS

    for k, v in res.items():
        print(f"{k:12s} {v if isinstance(v, str) else f'{v*1e3:.3f} ms/iter'}")


if __name__ == "__main__":
    main()
