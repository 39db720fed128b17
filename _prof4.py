import time
import numpy as np
import jax, jax.numpy as jnp
from hymls_tpu.config import Params
from hymls_tpu.stencils import create_matrix, create_testvector
from hymls_tpu import Preconditioner, Solver
from hymls_tpu.solvers import krylov

nx = 256
params = Params({'Problem': {'Equations': 'Laplace', 'Dimension': 2, 'nx': nx, 'ny': nx},
                 'Solver': {'Krylov Method': 'CG', 'Initial Vector': 'Zero',
                            'Iterative Solver': {'Maximum Iterations': 34, 'Convergence Tolerance': 1e-30}},
                 'Preconditioner': {'Separator Length': 4, 'Number of Levels': 2}})
K = create_matrix(params)
tv = create_testvector(params, K)
P = Preconditioner(K, params, testvector=tv).compute()
S = Solver(K, P, params)
b = jnp.asarray(K @ np.random.default_rng(0).standard_normal(K.shape[0]))
apply_fn, factors, dplans = P.apply_inverse_fn()
pv = S.op.prepare(S.op.vals)

def timed(name, fn, *args):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3): jax.block_until_ready(fn(*args))
    print(f'{name}: {(time.perf_counter()-t0)/3*1e3:.1f}ms')

variants = {}
def mk(use_op, use_prec):
    def solve(pv_, factors_, dplans_, b_):
        op = (lambda x: S.op.matvec_prepared(pv_, x)) if use_op else (lambda x: x)
        prec = (lambda x: apply_fn(factors_, dplans_, x)) if use_prec else None
        return krylov.cg(op, b_, jnp.zeros_like(b_), prec, tol=1e-30, maxiter=34)
    return jax.jit(solve)

timed('cg identity-op no-prec', mk(False, False), pv, factors, dplans, b)
timed('cg spmv no-prec       ', mk(True, False), pv, factors, dplans, b)
timed('cg identity-op + prec ', mk(False, True), pv, factors, dplans, b)
timed('cg full               ', mk(True, True), pv, factors, dplans, b)
