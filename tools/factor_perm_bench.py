"""A/B the factor-path gather strategy (core/permute.py) on the real
TPU: cavity-64 fused Newton step (f32 refactor + repack + IR solve) and
the bare compute() factor, gather vs sort-permutation.

Run:  python tools/factor_perm_bench.py gather|sort      (one strategy)
      python tools/factor_perm_bench.py                  (both, subprocesses)
"""
import json
import os
import subprocess
import sys
import time


def run_one(strategy):
    os.environ["HYMLS_PERM_STRATEGY"] = strategy
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hymls_tpu.utils.timings import sync
    from hymls_tpu.stencils.navier_stokes import cavity_jacobian
    from hymls_tpu.stencils import create_testvector
    from hymls_tpu.solvers.mixed import IterativeRefinementSolver

    DATA = "/root/reference/testSuite/data/DrivenCavity/64x64/Re1000"
    if os.path.isdir(DATA):
        from hymls_tpu.utils.io import read_linear_system
        K, b, _x, _ns, _m = read_linear_system(DATA)
        K = K.tocsr()
        b = np.asarray(b)
    else:
        K = cavity_jacobian(64, 64, re=1000.0).tocsr()
        b = K @ np.random.default_rng(0).standard_normal(K.shape[0])

    from hymls_tpu.config import Params
    params = Params({
        "Problem": {"Equations": "Stokes-C", "Dimension": 2,
                    "nx": 64, "ny": 64},
        "Solver": {"Krylov Method": "GMRES",
                   "Left or Right Preconditioning": "Right",
                   "Initial Vector": "Zero",
                   "Iterative Solver": {"Maximum Iterations": 250,
                                        "Convergence Tolerance": 1e-12}},
        "Preconditioner": {"Partitioner": "Cartesian",
                           "Separator Length": 4,
                           "Number of Levels": 1},
    })
    S = IterativeRefinementSolver(K, params,
                                  testvector=create_testvector(params, K))
    S.compute()
    x = S.solve(b)
    sync(x)
    P = S.precond
    nsk = sum(1 for d in P._dplans for f in d if f.endswith("_skeys"))

    vals64 = S.op64.vals
    vals32 = S.solver.op.vals
    bj = jnp.asarray(b, jnp.float64)
    newton, dplans, extra, aplans = S.newton_step_fn()
    r = newton(vals64, vals32, dplans, extra, aplans, bj)
    sync(r.x)

    def fused(niter):
        def fbody(i, acc):
            s64 = 1.0 + 1e-6 * i.astype(jnp.float64)
            rr = newton(vals64 * s64, vals32 * s64.astype(jnp.float32),
                        dplans, extra, aplans, bj)
            return acc + rr.x
        return lax.fori_loop(0, niter, fbody, jnp.zeros_like(bj))

    fjit = jax.jit(fused)
    sync(fjit(1))
    reps = 10
    t = {}
    for nit in (1, reps + 1):
        t0 = time.perf_counter()
        sync(fjit(nit))
        t[nit] = time.perf_counter() - t0
    step = (t[reps + 1] - t[1]) / reps

    # bare factor (compute) only, same delta scheme
    compute = P._compute_pure
    dpl, ext = P._dplans, P._extra_plan

    def cfused(niter):
        def fbody(i, acc):
            s = 1.0 + 1e-6 * i.astype(jnp.float64)
            fac = compute(vals64 * s, dpl, ext)
            return acc + fac["levels"][0]["G"].reshape(-1)[:8]
        return lax.fori_loop(0, niter, fbody, jnp.zeros((8,), jnp.float32))

    cjit = jax.jit(cfused)
    sync(cjit(1))
    for nit in (1, reps + 1):
        t0 = time.perf_counter()
        sync(cjit(nit))
        t[f"c{nit}"] = time.perf_counter() - t0
    fstep = (t[f"c{reps + 1}"] - t["c1"]) / reps
    print(json.dumps({"strategy": strategy, "skeys": nsk,
                      "newton_s": round(step, 5),
                      "factor_s": round(fstep, 5)}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
    else:
        for s in ("gather", "sort"):
            subprocess.run([sys.executable, os.path.abspath(__file__), s],
                           check=False)
