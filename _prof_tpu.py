import time
import numpy as np
import jax, jax.numpy as jnp
from hymls_tpu.config import Params
from hymls_tpu.stencils import create_matrix, create_testvector
from hymls_tpu import Preconditioner, Solver

nx = 256
def mk_params(tol):
    return Params({'Problem': {'Equations': 'Laplace', 'Dimension': 2, 'nx': nx, 'ny': nx},
                   'Solver': {'Krylov Method': 'CG', 'Initial Vector': 'Zero',
                              'Iterative Solver': {'Maximum Iterations': 100, 'Convergence Tolerance': tol}},
                   'Preconditioner': {'Separator Length': 4, 'Number of Levels': 2}})
K = create_matrix(mk_params(1e-10))
tv = create_testvector(mk_params(1e-10), K)
rng = np.random.default_rng(0)
x_ex = rng.standard_normal(K.shape[0]); b = K @ x_ex

def timeit(f, n=5):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f())
    return (time.perf_counter() - t0) / n

for dtype, tol in ((jnp.float64, 1e-10), (jnp.float32, 2e-6)):
    params = mk_params(tol)
    P = Preconditioner(K, params, testvector=tv, dtype=dtype)
    S = Solver(K, P, params, dtype=dtype)
    P.compute()
    t_compute = timeit(lambda: P._compute_jit(P._vals0, P._dplans, P._extra_plan), 3)
    bb = jnp.asarray(b, dtype)
    t_apply = timeit(lambda: P._apply_jit(P._factors, P._dplans, bb), 5)
    t_spmv = timeit(lambda: S.op(bb), 10)
    x, res = S.apply_inverse(b)
    relres = float(np.linalg.norm(K @ np.asarray(x, np.float64) - b)/np.linalg.norm(b))
    print(f'{dtype.__name__}: compute={t_compute*1e3:.1f}ms apply={t_apply*1e3:.2f}ms spmv={t_spmv*1e3:.2f}ms iters={int(res.iters)} relres={relres:.2e}')
