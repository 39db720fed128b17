#!/usr/bin/env python
"""TPU micro-bench: pallas fused DIA SpMV vs the XLA shifted-slice
lowering, on real stencil matrices.  Prints one JSON line per case.

Timing: fused fori_loop delta (niter=1 vs niter=R+1), the same
launch-overhead-free method bench.py uses."""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")

from hymls_tpu.ops.spmv import DiaOperator
from hymls_tpu.ops.pallas_spmv import PallasDiaMatvec
from hymls_tpu.stencils import laplace2d, stokes2d, stokes3d
from hymls_tpu.utils.timings import sync

REPS = 400


def _time_loop(step, x0):
    def loop(niter, y):
        # keep a data dependence so the loop cannot be collapsed
        return lax.fori_loop(0, niter, lambda i, z: step(z) + 1e-30 * i, y)

    fjit = jax.jit(loop)
    sync(fjit(1, x0))
    t = {}
    for nit in (1, REPS + 1):
        t0 = time.perf_counter()
        sync(fjit(nit, x0))
        t[nit] = time.perf_counter() - t0
    return max((t[REPS + 1] - t[1]) / REPS, 1e-9)


def run_case(name, K):
    op = DiaOperator(K.tocsr(), dtype=jnp.float32)
    bands = op.prepare(op.vals)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(op.n), jnp.float32)

    t_xla = _time_loop(lambda x: op.matvec_prepared(bands, x), x0)

    if not PallasDiaMatvec.fits(op.offsets, op.n):
        print(json.dumps({"case": name, "n": op.n, "skipped": "vmem"}))
        return
    pk = PallasDiaMatvec(op.offsets, op.n)
    t_pal = _time_loop(lambda x: pk(bands, x), x0)

    y0 = np.asarray(op.matvec_prepared(bands, x0))
    y1 = np.asarray(pk(bands, x0))
    err = float(np.abs(y1 - y0).max() / max(np.abs(y0).max(), 1e-30))
    print(json.dumps({
        "case": name, "n": op.n, "k": len(op.offsets),
        "xla_us": round(t_xla * 1e6, 2),
        "pallas_us": round(t_pal * 1e6, 2),
        "speedup": round(t_xla / t_pal, 3),
        "max_rel_err": err,
    }), flush=True)


def main():
    cases = {
        "laplace_256sq": lambda: laplace2d(256, 256),
        "stokes_128sq": lambda: stokes2d(128, 128),
        "stokes_32cube": lambda: stokes3d(32, 32, 32),
    }
    names = sys.argv[1:] or list(cases)
    for name in names:
        run_case(name, cases[name]())


if __name__ == "__main__":
    main()
