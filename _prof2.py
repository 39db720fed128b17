import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from hymls_tpu.config import Params
from hymls_tpu.stencils import create_matrix, create_testvector
from hymls_tpu import Preconditioner, Solver

nx = 256
params = Params({'Problem': {'Equations': 'Laplace', 'Dimension': 2, 'nx': nx, 'ny': nx},
                 'Solver': {'Krylov Method': 'CG', 'Initial Vector': 'Zero',
                            'Iterative Solver': {'Maximum Iterations': 100, 'Convergence Tolerance': 1e-10}},
                 'Preconditioner': {'Separator Length': 4, 'Number of Levels': 2}})
K = create_matrix(params)
tv = create_testvector(params, K)
P = Preconditioner(K, params, testvector=tv).compute()
S = Solver(K, P, params)
b = jnp.asarray(np.random.default_rng(0).standard_normal(K.shape[0]))

apply_fn, factors, dplans = P.apply_inverse_fn()
matvec = S.op.matvec_with
vals = S.op.vals

def loop(f, n=34):
    def body(i, x):
        return f(x) + 1e-30 * i
    return jax.jit(lambda x: lax.fori_loop(0, n, body, x))

tests = {
  'apply x34': loop(lambda x: apply_fn(factors, dplans, x)),
  'spmv x34': loop(lambda x: matvec(vals, x)),
  'dots x34': loop(lambda x: x * (jnp.vdot(x, x) / (1.0 + jnp.vdot(x, x)))),
  'apply+spmv+dots x34': loop(lambda x: (lambda z: z * (jnp.vdot(z, x)/(1+jnp.vdot(z,z))))(apply_fn(factors, dplans, matvec(vals, x)))),
}
for name, f in tests.items():
    f(b)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(f(b))
    print(f'{name}: {(time.perf_counter()-t0)/3*1e3:.1f}ms')

# full CG solve
x, res = S.apply_inverse(b)
t0 = time.perf_counter()
x, res = S.apply_inverse(b)
jax.block_until_ready(x)
print(f'full CG ({int(res.iters)} iters): {(time.perf_counter()-t0)*1e3:.1f}ms')
