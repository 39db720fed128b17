#!/usr/bin/env python
"""Benchmark: multilevel preconditioner setup + solve wall-clock.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Problem: 2D Laplace 256^2, 2-level method, solved to f64 accuracy
(relres <= 1e-10, achieved ~1e-12) — the scaled-up version of the
reference's laplace2 integration benchmark.  Runs the TPU-native
production path: factorization and Krylov iterations in f32 (native
MXU/VPU; the TPU emulates f64 in software at ~10-30x cost), wrapped
in an f64 iterative-refinement loop that runs as a single fused XLA
program (no host syncs).  Iteration parity with the reference is
enforced separately each run via one mixed-precision f64-CG solve
(f32 V-cycle inside f64 CG — same iteration count as all-f64):
vs_baseline = target_iters / achieved_iters >= 1.0 means the
reference's laplace2 iteration target (35) is met or beaten.

Measurement note: REPS factorization+solve pairs are dispatched
asynchronously and the device is synced once — per-call device->host
round trips through remote-TPU tunnels would otherwise dominate and
measure the tunnel, not the TPU.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compilation cache: TPU AOT compiles are expensive through
# the remote tunnel; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 10


def main():
    from hymls_tpu.config import Params
    from hymls_tpu.stencils import create_matrix, create_testvector
    from hymls_tpu import Solver
    from hymls_tpu.solvers.mixed import IterativeRefinementSolver

    nx = 256
    params = Params({
        "Problem": {"Equations": "Laplace", "Dimension": 2,
                    "nx": nx, "ny": nx},
        "Solver": {"Krylov Method": "CG", "Initial Vector": "Zero",
                   "Iterative Solver": {"Maximum Iterations": 100,
                                        "Convergence Tolerance": 1e-10}},
        "Preconditioner": {"Separator Length": 4, "Number of Levels": 2},
    })
    K = create_matrix(params)
    tv = create_testvector(params, K)

    rng = np.random.default_rng(0)
    x_ex = rng.standard_normal(K.shape[0])
    b = K @ x_ex

    S = IterativeRefinementSolver(K, params, testvector=tv).compute()
    P = S.precond

    # iteration parity vs the reference's laplace2 target: a mixed
    # f64-CG solve has the same count as the all-f64 method
    S64 = Solver(K, P, params, dtype=jnp.float64)
    _, res64 = S64.apply_inverse(b)
    niter = int(res64.iters)

    # warm-up: compile + first fused IR solve
    x = S.solve(b)
    jax.block_until_ready(x)

    vals64 = S.op64.vals
    vals32 = S.solver.op.vals
    bj = jnp.asarray(b, jnp.float64)
    dplans = P._dplans          # full plans: factorization program
    aplans = P._aplans          # pruned plans: solve program (Krylov
    # loops re-stream every captured buffer per iteration on TPU)
    extra = P._extra_plan

    # timed: REPS x (f32 re-factorization + fused IR solve),
    # asynchronously dispatched, one sync at the end
    t0 = time.perf_counter()
    last = None
    for i in range(REPS):
        scale32 = jnp.asarray(1.0 + 1e-6 * i, jnp.float32)
        factors = P._compute_jit(vals32 * scale32, dplans, extra)
        r = S._fused_jit(vals64 * (1.0 + 1e-6 * i), vals32 * scale32,
                         P.apply_factors_from(factors), aplans, bj)
        last = r.x
    jax.block_until_ready(last)
    elapsed = (time.perf_counter() - t0) / REPS

    xh = np.asarray(jax.device_get(last))
    # the last rep used a slightly perturbed matrix; check against it
    Kp = K.copy()
    Kp.data = Kp.data * (1.0 + 1e-6 * (REPS - 1))
    relres = float(np.linalg.norm(Kp @ xh - b) / np.linalg.norm(b))
    ok = relres <= 1e-9 and niter <= 35

    result = {
        "metric": "laplace2d_256_L2_factor_plus_solve",
        "value": round(elapsed, 5),
        "unit": "seconds",
        "vs_baseline": round(35.0 / max(niter, 1), 3) if ok else 0.0,
        "extra": {
            "reps": REPS,
            "iters_f64_cg": niter,
            "ir_inner_iters": int(jax.device_get(r.iters)),
            "relres": relres,
            "device": str(jax.devices()[0]),
            "path": "f32 factor + fused f32-Krylov/f64-IR",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
