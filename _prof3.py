import time
import numpy as np
import jax, jax.numpy as jnp
from hymls_tpu.config import Params
from hymls_tpu.stencils import create_matrix, create_testvector
from hymls_tpu import Preconditioner, Solver
from hymls_tpu.solvers.mixed import IterativeRefinementSolver

nx = 256
params = Params({'Problem': {'Equations': 'Laplace', 'Dimension': 2, 'nx': nx, 'ny': nx},
                 'Solver': {'Krylov Method': 'CG', 'Initial Vector': 'Zero',
                            'Iterative Solver': {'Maximum Iterations': 100, 'Convergence Tolerance': 1e-10}},
                 'Preconditioner': {'Separator Length': 4, 'Number of Levels': 2}})
K = create_matrix(params)
tv = create_testvector(params, K)
b = K @ np.random.default_rng(0).standard_normal(K.shape[0])

# f64 direct
P = Preconditioner(K, params, testvector=tv).compute()
S = Solver(K, P, params)
x, res = S.apply_inverse(b); jax.block_until_ready(x)
t0 = time.perf_counter(); x, res = S.apply_inverse(b); jax.block_until_ready(x)
t64 = time.perf_counter()-t0
r64 = float(np.linalg.norm(K@np.asarray(x)-b)/np.linalg.norm(b))
print(f'f64: {t64*1e3:.0f}ms iters={int(res.iters)} relres={r64:.2e}')

# mixed IR
IRS = IterativeRefinementSolver(K, params, testvector=tv).compute()
x, res = IRS.apply_inverse(b); jax.block_until_ready(x)
t0 = time.perf_counter(); x, res = IRS.apply_inverse(b); jax.block_until_ready(x)
tir = time.perf_counter()-t0
rir = float(np.linalg.norm(K@np.asarray(x)-b)/np.linalg.norm(b))
print(f'IR:  {tir*1e3:.0f}ms iters={int(res.iters)} relres={rir:.2e}')
