"""North-star measurement (BASELINE.md): driven-cavity Jacobian
setup+solve wall-clock on TPU, from the reference datasets
(testSuite/data/DrivenCavity).  Usage:

    python tools/bench_cavity.py [32x32|64x64] [Re0|Re100|Re1000]

Prints one JSON line with symbolic/cold-factor/warm factor+solve
times, inner iteration count and the achieved residual (tol 1e-12,
reference target <= 250 f64-GMRES iterations; the mixed-precision IR
path reaches ~1e-15)."""
import time, json, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/hymls_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from hymls_tpu.config import Params
from hymls_tpu.utils.io import read_linear_system
from hymls_tpu.stencils import create_testvector
from hymls_tpu.solvers.mixed import IterativeRefinementSolver
from hymls_tpu.utils.timings import sync

size, re = (sys.argv[1], sys.argv[2]) if len(sys.argv) > 2 else ("64x64", "Re1000")
dims = [int(v) for v in size.split("x")]
nx, dim = dims[0], len(dims)
data = f"/root/reference/testSuite/data/DrivenCavity/{size}/{re}"
K, b, x_ex, ns, mass = read_linear_system(data)
prob = {"Equations": "Stokes-C", "Dimension": dim, "nx": nx, "ny": nx}
if dim == 3:
    prob["nz"] = nx
params = Params({
    "Problem": prob,
    "Solver": {"Krylov Method": "GMRES",
               "Left or Right Preconditioning": "Right",
               "Iterative Solver": {"Maximum Iterations": 250,
                                    "Convergence Tolerance": 1e-12}},
    "Preconditioner": {"Partitioner": "Cartesian",
                       "Separator Length": 4, "Number of Levels": 1},
})
tv = create_testvector(params, K)

t0 = time.perf_counter()
S = IterativeRefinementSolver(K, params, testvector=tv)
t_sym = time.perf_counter() - t0    # symbolic (host, once per structure)

t0 = time.perf_counter()
S.compute()
sync(S.precond.factors["coarse"]["inv"])
t_fac_cold = time.perf_counter() - t0

x = S.solve(b); sync(x)   # compile+first solve

# warm re-factorization + solve (the per-Newton-step cost)
t0 = time.perf_counter()
S.precond._factors = None
S.compute()
x = S.solve(b)
sync(x)
t_warm = time.perf_counter() - t0

xh = np.asarray(jax.device_get(x))
relres = float(np.linalg.norm(K @ xh - b) / np.linalg.norm(b))
res = S._last_result
print(json.dumps({"case": f"cavity {size} {re}",
                  "symbolic_s": round(t_sym, 2),
                  "factor_cold_s": round(t_fac_cold, 2),
                  "factor_plus_solve_warm_s": round(t_warm, 3),
                  "inner_iters": int(jax.device_get(res.iters)),
                  "relres": relres}))
