"""Fused-loop bench variant: REPS factor+solves inside ONE XLA program."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 10

def main():
    from hymls_tpu.config import Params
    from hymls_tpu.stencils import create_matrix, create_testvector
    from hymls_tpu import Preconditioner, Solver
    from hymls_tpu.solvers import krylov

    dtype = jnp.float64
    nx = 256
    params = Params({
        "Problem": {"Equations": "Laplace", "Dimension": 2, "nx": nx, "ny": nx},
        "Solver": {"Krylov Method": "CG", "Initial Vector": "Zero",
                   "Iterative Solver": {"Maximum Iterations": 100,
                                        "Convergence Tolerance": 1e-10}},
        "Preconditioner": {"Separator Length": 4, "Number of Levels": 2},
    })
    K = create_matrix(params)
    tv = create_testvector(params, K)
    rng = np.random.default_rng(0)
    b = K @ rng.standard_normal(K.shape[0])

    P = Preconditioner(K, params, testvector=tv, dtype=dtype)
    S = Solver(K, P, params, dtype=dtype)
    P.compute()

    compute_pure = P._compute_pure
    dplans, extra = P._dplans, P._extra_plan
    apply_fn = P._apply_pure
    prepare, mvp = S.op.prepare, S.op.matvec_prepared

    def one(vals, b):
        factors = compute_pure(vals, dplans, extra)
        pv = prepare(vals)
        res = krylov.cg(lambda x: mvp(pv, x), b, jnp.zeros_like(b),
                        lambda x: apply_fn(factors, dplans, x),
                        tol=1e-10, maxiter=100)
        return res.x, res.iters

    def bench_fn(vals, b):
        def body(i, carry):
            acc, it = carry
            x, iters = one(vals * (1.0 + 1e-14 * i), b)
            return acc + x, it + iters
        return lax.fori_loop(0, REPS, body, (jnp.zeros_like(b), jnp.array(0)))

    bench_jit = jax.jit(bench_fn)
    vals = jnp.asarray(K.data, dtype=dtype)
    bj = jnp.asarray(b, dtype=dtype)
    from hymls_tpu.utils.timings import sync
    t0 = time.perf_counter()
    out, iters = bench_jit(vals, bj)
    sync(out)
    print(f"# compile+first run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    out, iters = bench_jit(vals, bj)
    sync(out)
    elapsed = (time.perf_counter() - t0) / REPS
    print(json.dumps({"fused_per_rep_s": round(elapsed, 5),
                      "total_iters": int(iters)}))

if __name__ == "__main__":
    main()
