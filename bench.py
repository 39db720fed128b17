#!/usr/bin/env python
"""Benchmark: the BASELINE.json north star — driven-cavity Jacobian
(Re=1000) setup + solve wall-clock at reference iteration/accuracy
targets (cavity.xml: tol 1e-12, <= 250 GMRES iterations, reference
testSuite/cavity.xml:18-26,50-55).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs the TPU-native production path: Cartesian partition engaging the
structured gather-free V-cycle (core/structured.py), factorization and
Krylov iterations in f32 (native MXU/VPU; the TPU emulates f64 in
software at ~10-30x cost), wrapped in an f64 iterative-refinement
outer loop that runs as a single fused XLA program (no host syncs).
Iteration parity with the reference is enforced each run via one
mixed-precision f64-GMRES solve (f32 V-cycle inside f64 GMRES — the
same iteration count as the all-f64 method): vs_baseline =
reference_max_iters / achieved_iters >= 1.0 means the reference's
cavity.xml target is met or beaten.

Measurement note: REPS factorization+solve pairs are dispatched
asynchronously and the device is synced once — per-call device->host
round trips through remote-TPU tunnels would otherwise dominate and
measure the tunnel, not the TPU.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compilation cache: TPU AOT compiles are expensive through
# the remote tunnel; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 10
DATA = "/root/reference/testSuite/data/DrivenCavity/64x64/Re1000"
NX = 64
TARGET_ITERS = 250      # testSuite/cavity.xml "Maximum Iterations"
TOL = 1e-12             # testSuite/cavity.xml "Convergence Tolerance"


def _load_problem():
    """Reference DrivenCavity dataset if present, else the self-
    contained synthetic cavity Jacobian at the same Re."""
    if os.path.isdir(DATA):
        from hymls_tpu.utils.io import read_linear_system
        K, b, x_ex, ns, mass = read_linear_system(DATA)
        return K, np.asarray(b), "reference-data"
    from hymls_tpu.stencils.navier_stokes import cavity_jacobian
    K = cavity_jacobian(NX, NX, re=1000.0).tocsr()
    rng = np.random.default_rng(0)
    b = K @ rng.standard_normal(K.shape[0])
    return K, b, "synthetic"


def main():
    from hymls_tpu.config import Params
    from hymls_tpu.stencils import create_testvector
    from hymls_tpu import Solver
    from hymls_tpu.solvers.mixed import IterativeRefinementSolver

    K, b, source = _load_problem()
    params = Params({
        "Problem": {"Equations": "Stokes-C", "Dimension": 2,
                    "nx": NX, "ny": NX},
        "Solver": {"Krylov Method": "GMRES",
                   "Left or Right Preconditioning": "Right",
                   "Initial Vector": "Zero",
                   "Iterative Solver": {"Maximum Iterations": TARGET_ITERS,
                                        "Convergence Tolerance": TOL}},
        "Preconditioner": {"Partitioner": "Cartesian",
                           "Separator Length": 4, "Number of Levels": 1},
    })
    tv = create_testvector(params, K)

    S = IterativeRefinementSolver(K, params, testvector=tv)
    S.compute()
    P = S.precond

    # iteration parity vs the reference's cavity.xml target: a mixed
    # f64-GMRES solve has the same count as the all-f64 method
    S64 = Solver(K, P, params, dtype=jnp.float64)
    _, res64 = S64.apply_inverse(b)
    niter = int(res64.iters)

    # warm-up: compile + first fused IR solve
    x = S.solve(b)
    jax.block_until_ready(x)

    vals64 = S.op64.vals
    vals32 = S.solver.op.vals
    bj = jnp.asarray(b, jnp.float64)
    newton, dplans, extra, aplans = S.newton_step_fn()

    # warm-up/compile of the single-dispatch Newton-step program
    r = newton(vals64, vals32, dplans, extra, aplans, bj)
    jax.block_until_ready(r.x)

    # timed: REPS x (f32 re-factorization + repack + fused IR solve)
    # — the per-Newton-step cost of a continuation run — one program
    # dispatch per rep, asynchronously chained, one sync at the end
    t0 = time.perf_counter()
    last = None
    for i in range(REPS):
        scale32 = jnp.asarray(1.0 + 1e-6 * i, jnp.float32)
        r = newton(vals64 * (1.0 + 1e-6 * i), vals32 * scale32,
                   dplans, extra, aplans, bj)
        last = r.x
    jax.block_until_ready(last)
    elapsed = (time.perf_counter() - t0) / REPS

    xh = np.asarray(jax.device_get(last))
    # the last rep used a slightly perturbed matrix; check against it
    Kp = K.copy()
    Kp.data = Kp.data * (1.0 + 1e-6 * (REPS - 1))
    relres = float(np.linalg.norm(Kp @ xh - b) / np.linalg.norm(b))
    ok = relres <= 1e-11 and niter <= TARGET_ITERS

    result = {
        "metric": "cavity64_Re1000_factor_plus_solve",
        "value": round(elapsed, 5),
        "unit": "seconds",
        "vs_baseline": round(TARGET_ITERS / max(niter, 1), 3) if ok else 0.0,
        "extra": {
            "reps": REPS,
            "iters_f64_gmres": niter,
            "target_iters": TARGET_ITERS,
            "ir_inner_iters": int(jax.device_get(r.iters)),
            "relres": relres,
            "source": source,
            "device": str(jax.devices()[0]),
            "path": "structured f32 factor + fused f32-Krylov/f64-IR",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
