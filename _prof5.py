import time
import numpy as np
import jax, jax.numpy as jnp
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
b_np = K @ np.random.default_rng(0).standard_normal(K.shape[0])

# transfer timing
t0=time.perf_counter(); bd = jax.device_put(b_np); jax.block_until_ready(bd)
print(f'device_put 1.5MB: {(time.perf_counter()-t0)*1e3:.1f}ms')
t0=time.perf_counter(); _ = np.asarray(bd)
print(f'device->host 1.5MB: {(time.perf_counter()-t0)*1e3:.1f}ms')

# solve with numpy b (includes transfer)
x, res = S.apply_inverse(b_np); jax.block_until_ready(x)
t0=time.perf_counter(); x, res = S.apply_inverse(b_np); jax.block_until_ready(x)
print(f'solve (numpy b): {(time.perf_counter()-t0)*1e3:.1f}ms iters={int(res.iters)}')

# solve with device b
x, res = S.apply_inverse(bd); jax.block_until_ready(x)
t0=time.perf_counter(); x, res = S.apply_inverse(bd); jax.block_until_ready(x)
print(f'solve (device b): {(time.perf_counter()-t0)*1e3:.1f}ms iters={int(res.iters)}')

# int(res.iters) forces a scalar transfer; measure without it
t0=time.perf_counter(); x, res = S.apply_inverse(bd); jax.block_until_ready(x)
print(f'solve (device b, 2nd): {(time.perf_counter()-t0)*1e3:.1f}ms')
# compute timing
t0=time.perf_counter(); P.compute(); jax.tree_util.tree_map(lambda a: a.block_until_ready(), P.factors)
print(f'compute: {(time.perf_counter()-t0)*1e3:.1f}ms')
