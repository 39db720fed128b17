#!/usr/bin/env python
"""Device-time breakdown of the 32^3 skew L=2 Newton step (the bench's
stokes32cube_skew_L2 case): factor (compute) vs solve (fused IR), to
direct optimization — is the emulated-f64 factor chain or the f32
Krylov loop the bottleneck?

Timing: fori_loop delta where the program fits the remote-compile
tunnel; per-dispatch minus launch overhead otherwise (same methodology
as bench.py)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from hymls_tpu.utils.timings import sync  # noqa: E402

T0 = time.time()


def msg(s):
    print(f"[probe +{time.time() - T0:7.1f}s] {s}", file=sys.stderr,
          flush=True)


def launch_overhead():
    tiny = jax.jit(lambda s: s + 1.0)
    z = jnp.float32(0.0)
    sync(tiny(z))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(tiny(z))
    return (time.perf_counter() - t0) / 10


def time_fn(label, fn, args, reps):
    """fn(scale, *args) -> pytree.  All data passes as jit ARGUMENTS —
    capturing the 2.7 GB plan pytrees as constants makes the program
    serialization exceed the remote-compile tunnel (observed: probe
    wedged for 25+ min lowering factor_only with 2.66 GB captured)."""
    fnjit = jax.jit(fn)
    sync(fnjit(jnp.float64(1.0), *args))
    ovh = launch_overhead()
    t0 = time.perf_counter()
    last = None
    for i in range(reps):
        last = fnjit(jnp.float64(1.0 + 1e-6 * i), *args)
    sync(last)
    dt = (time.perf_counter() - t0) / reps - ovh
    msg(f"{label}: {dt * 1e3:.1f} ms (per-dispatch - {ovh * 1e3:.1f} ms)")
    return dt


def main():
    from hymls_tpu.config import Params
    from hymls_tpu.stencils import create_matrix, create_testvector
    from hymls_tpu.solvers.mixed import IterativeRefinementSolver

    params = Params({
        "Problem": {"Equations": "Stokes-C", "Dimension": 3,
                    "nx": 32, "ny": 32, "nz": 32},
        "Solver": {"Krylov Method": "GMRES",
                   "Left or Right Preconditioning": "Right",
                   "Initial Vector": "Zero",
                   "Iterative Solver": {"Maximum Iterations": 500,
                                        "Convergence Tolerance": 1e-8,
                                        "Num Blocks": 60}},
        "Preconditioner": {"Partitioner": "Skew Cartesian",
                           "Separator Length": 4, "Number of Levels": 2},
    })
    msg("building matrix + plans ...")
    K = create_matrix(params)
    rng = np.random.default_rng(2)
    b = K @ rng.standard_normal(K.shape[0])
    tv = create_testvector(params, K)
    S = IterativeRefinementSolver(K, params, testvector=tv)
    S.compute()
    msg("compute() done")

    P = S.precond
    compute = P._compute_pure
    dplans, extra, aplans = P._dplans, P._extra_plan, P._aplans
    vals64 = S.op64.vals
    vals32 = S.solver.op.vals
    bj = jnp.asarray(b, jnp.float64)
    if S._fused_jit is None:
        S._build_fused()
    fused = S._fused_fn

    reps = 3

    def tree_sum(f):
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.float32)), f)

    # 1. factor only (the f64-assembly chain)
    def factor_only(s, v, dp, ex):
        return tree_sum(compute(v * s, dp, ex))

    t_factor = time_fn("factor (compute chain)", factor_only,
                       (vals64, dplans, extra), reps)

    # 2. repack (apply_factors_from_pure)
    def factor_repack(s, v, dp, ex, ap):
        f = compute(v * s, dp, ex)
        return tree_sum(P.apply_factors_from_pure(f, ap))

    t_repack = time_fn("factor + repack", factor_repack,
                       (vals64, dplans, extra, aplans), reps)

    # 3. solve only (fused IR with fixed factors)
    afac = P.apply_factors

    def solve_only(s, v64, v32, af, ap, b):
        return fused(v64 * s, v32 * s.astype(jnp.float32), af, ap, b).x

    t_solve = time_fn("solve (fused IR, fixed factors)", solve_only,
                      (vals64, vals32, afac, aplans, bj), reps)

    msg(f"TOTAL ~ {(t_repack + t_solve) * 1e3:.1f} ms  "
        f"(factor {t_factor * 1e3:.0f} + repack "
        f"{(t_repack - t_factor) * 1e3:.0f} + solve {t_solve * 1e3:.0f})")


if __name__ == "__main__":
    main()
