"""Mixed-precision solves: f32 Krylov + preconditioner inside an f64
iterative-refinement loop.

TPU v5e has no native f64: XLA emulates it in software, which makes
f64 vector reductions ~30x slower than f32.  The TPU-native answer is
classical iterative refinement — all heavy work (factorization,
V-cycles, Krylov iterations, SpMV) runs in fast f32, while residuals
and the solution accumulate in f64.  Each pass contracts the residual
by roughly the inner tolerance (~1e-6), so two to three passes reach
the reference's 1e-10..1e-12 targets.  (SURVEY.md notes this as the
sanctioned mitigation: "mixed f32 factorization + f64 iterative
refinement where targets allow".)
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..config import Params
from ..core.preconditioner import Preconditioner
from ..ops.spmv import make_operator
from .solver import Solver
from .krylov import KrylovResult


class IterativeRefinementSolver:
    """Drop-in alternative to Solver with the same apply_inverse API."""

    def __init__(self, K: sp.csr_matrix, params: Params,
                 testvector: Optional[np.ndarray] = None,
                 inner_tol: float = 5e-7, max_passes: int = 6):
        self.params = params
        it = params.sublist("Solver").sublist("Iterative Solver")
        self.tol = it.get("Convergence Tolerance", 1e-6)
        self.inner_tol = max(inner_tol, self.tol)
        self.max_passes = max_passes

        inner_params = params.copy()
        inner_params.sublist("Solver").sublist("Iterative Solver")[
            "Convergence Tolerance"] = self.inner_tol
        self.precond = Preconditioner(K, inner_params,
                                      testvector=testvector,
                                      dtype=jnp.float32)
        self.solver = Solver(K, self.precond, inner_params,
                             dtype=jnp.float32)
        self.op64 = make_operator(K, dtype=jnp.float64)
        self._num_iter = 0

    def compute(self, K: Optional[sp.csr_matrix] = None):
        self.precond.compute(K)
        if K is not None:
            self.solver.set_matrix(K)
            self.op64.set_values(K.tocsr().data)
        return self

    def set_border(self, V, W=None, C=None):
        self.solver.set_border(V, W, C)
        return self

    def apply_inverse(self, b):
        b64 = jnp.asarray(b, jnp.float64)
        nb = float(jnp.linalg.norm(b64))
        x = jnp.zeros_like(b64)
        total_iters = 0
        relres = 1.0
        converged = False
        for _pass in range(self.max_passes):
            r = b64 - self.op64(x)
            relres = float(jnp.linalg.norm(r)) / nb
            if relres <= self.tol:
                converged = True
                break
            d, res = self.solver.apply_inverse(np.asarray(r, np.float32))
            total_iters += int(res.iters)
            x = x + jnp.asarray(d, jnp.float64)
        self._num_iter = total_iters
        return x, KrylovResult(x=x, iters=jnp.asarray(total_iters),
                               relres=jnp.asarray(relres),
                               converged=jnp.asarray(converged))

    @property
    def num_iter(self):
        return self._num_iter
