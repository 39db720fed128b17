"""Solver facade: Krylov method + preconditioner + variants.

Mirrors the reference's HYMLS::Solver / BaseSolver dispatch
(reference src/HYMLS_Solver.cpp:34-48, HYMLS_BaseSolver.cpp): the
'Solver' sublist selects the Krylov method, preconditioning side and
start vector; bordered/deflated/complex variants are layered on top.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..config import Params
from ..core.preconditioner import Preconditioner
from ..ops.spmv import EllOperator
from . import krylov


class Solver:
    """Iterative solve of K x = b with the multilevel preconditioner."""

    def __init__(self, K: sp.csr_matrix, precond: Preconditioner,
                 params: Params, dtype=jnp.float64):
        self.params = params
        self.precond = precond
        self.dtype = dtype
        self.op = EllOperator(K, dtype=dtype)

        slist = params.sublist("Solver")
        self.method = slist.get("Krylov Method", "GMRES")
        self.start_vec = slist.get("Initial Vector", "Zero")
        self.lor = slist.get("Left or Right Preconditioning", "Left")
        it = slist.sublist("Iterative Solver")
        self.maxiter = it.get("Maximum Iterations", 100)
        self.tol = it.get("Convergence Tolerance", 1e-6)
        self._num_iter = 0
        self._solve_jit = None
        self._rng = np.random.default_rng(42)

    def set_matrix(self, K: sp.csr_matrix):
        """New values, same pattern (Newton-step reuse)."""
        K = K.tocsr()
        K.sum_duplicates()
        K.sort_indices()
        self.op.set_values(K.data)

    def _build_solve(self):
        apply_fn, _ = self.precond.apply_inverse_fn()
        matvec = self.op.matvec_with
        method = self.method
        tol = self.tol
        maxiter = self.maxiter
        left = self.lor == "Left"

        def solve(vals, factors, b, x0):
            def op(x):
                return matvec(vals, x)

            def prec(x):
                return apply_fn(factors, x)

            if method == "CG":
                return krylov.cg(op, b, x0, prec, tol=tol, maxiter=maxiter)
            return krylov.gmres(op, b, x0, prec, tol=tol, maxiter=maxiter,
                                left=left)

        self._solve_jit = jax.jit(solve)

    def apply_inverse(self, b, x0: Optional[np.ndarray] = None):
        """Solve K x = b; returns (x, KrylovResult)."""
        if self._solve_jit is None:
            self._build_solve()
        b = jnp.asarray(b, dtype=self.dtype)
        if x0 is None:
            if self.start_vec == "Random":
                x0 = jnp.asarray(
                    self._rng.standard_normal(b.shape[0]), dtype=self.dtype)
            else:
                x0 = jnp.zeros_like(b)
        factors = self.precond.factors
        res = self._solve_jit(self.op.vals, factors, b, x0)
        self._num_iter = int(res.iters)
        return res.x, res

    @property
    def num_iter(self) -> int:
        return self._num_iter
