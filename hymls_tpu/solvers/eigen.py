"""Eigenvalue computation: Jacobi-Davidson QR with multilevel-
preconditioned correction equations, plus a shift-invert Arnoldi
fallback.

Behavioral equivalent of the reference's eigensolver stack
(reference src/main_eigs.cpp, src/AnasaziPhistSolMgr.hpp — phist
subspacejada — and src/HYMLS_PhistCustomCorrectionSolver.cpp, which
solves the JD correction equations with the HYMLS preconditioner):
generalized eigenpairs of (K, M) nearest a target, with parameters
matching the reference's 'Eigenvalues' sublist ('How Many', 'Which',
'Convergence Tolerance', 'Maximum Subspace Dimension', 'Restart
Dimension', 'Number of Iterations').

The outer subspace loop runs on the host (it is inherently sequential
and tiny); every matvec, preconditioner application and projected
correction solve is a jitted device computation with static shapes —
the locked Schur basis is passed as a zero-padded fixed-width argument
so locking never retriggers compilation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from ..config import Params
from ..core.preconditioner import Preconditioner
from ..ops.spmv import EllOperator
from . import krylov


@dataclass
class EigenResult:
    values: np.ndarray
    vectors: np.ndarray
    iterations: int
    converged: int
    residuals: List[float] = field(default_factory=list)


def shift_invert_eigs(K: sp.csr_matrix, M: Optional[sp.csr_matrix],
                      solver, k: int = 10, target: float = 0.0,
                      tol: float = 1e-8) -> EigenResult:
    """ARPACK shift-invert around `target`, with the inner solves done
    by the multilevel solver (the role Anasazi BKS + HYMLS::Solver play
    in the reference main_eigs non-PHIST path)."""
    n = K.shape[0]

    def opinv(b):
        x, _res = solver.apply_inverse(np.asarray(b, dtype=np.float64))
        return np.asarray(x)

    OPinv = spla.LinearOperator((n, n), matvec=opinv, dtype=np.float64)
    Mop = None if M is None else spla.aslinearoperator(M)
    vals, vecs = spla.eigs(spla.aslinearoperator(K), k=k, M=Mop,
                           sigma=target, OPinv=OPinv, tol=tol)
    order = np.argsort(np.abs(vals - target))
    return EigenResult(values=vals[order], vectors=vecs[:, order],
                       iterations=-1, converged=k)


class JDQR:
    """Jacobi-Davidson QR for (K, M) with preconditioned, projected
    correction equations."""

    def __init__(self, K: sp.csr_matrix, M: Optional[sp.csr_matrix],
                 precond: Preconditioner, params: Params,
                 dtype=jnp.float64):
        self.K = K
        self.M = M
        self.precond = precond
        self.dtype = dtype
        self.opK = EllOperator(K, dtype=dtype)
        self.opM = EllOperator(M, dtype=dtype) if M is not None else None

        eig = params.sublist("Driver").sublist("Eigenvalues")
        self.how_many = eig.get("How Many", 10)
        self.which = eig.get("Which", "SM")
        self.tol = eig.get("Convergence Tolerance", 1e-8)
        self.max_iter = eig.get("Number of Iterations", 100)
        self.max_subspace = eig.get("Maximum Subspace Dimension", 40)
        self.restart_dim = eig.get("Restart Dimension", 20)
        self.inner_iters = eig.get("Correction Iterations", 10)
        self.target = eig.get("Target", 0.0)
        self._corr_jit = None

    # -- device kernels -----------------------------------------------------
    def _build_corr(self, max_lock: int):
        if self.precond._factors is None:
            self.precond.compute()
        apply_fn, _, _ = self.precond.apply_inverse_fn()
        matvecK = self.opK.matvec_with
        matvecM = self.opM.matvec_with if self.opM is not None else None
        inner = self.inner_iters

        def corr(valsK, valsM, factors, dplans, Q, r, theta):
            """Solve (I-QQ')(K - theta M)(I-QQ') t = -r with projected,
            preconditioned GMRES.  Q: (n, max_lock+1) zero-padded basis
            including the current Ritz vector."""
            def proj(x):
                return x - Q @ (Q.T @ x)

            def op(x):
                x = proj(x)
                y = matvecK(valsK, x)
                if matvecM is not None:
                    y = y - theta * matvecM(valsM, x)
                else:
                    y = y - theta * x
                return proj(y)

            def prec(x):
                return proj(apply_fn(factors, dplans, proj(x)))

            res = krylov.gmres(op, -r, jnp.zeros_like(r), prec, tol=1e-3,
                               maxiter=inner)
            return res.x

        self._corr_jit = jax.jit(corr)
        self._max_lock = max_lock

    # -- the outer loop -----------------------------------------------------
    def solve(self, v0: Optional[np.ndarray] = None) -> EigenResult:
        n = self.K.shape[0]
        k_want = self.how_many
        max_lock = k_want + 2
        self._build_corr(max_lock)

        Kx = lambda x: np.asarray(self.opK(jnp.asarray(x, self.dtype)))
        Mx = (lambda x: np.asarray(self.opM(jnp.asarray(x, self.dtype)))) \
            if self.opM is not None else (lambda x: x)

        rng = np.random.default_rng(31)
        v = v0 if v0 is not None else rng.standard_normal(n)
        v = v / np.linalg.norm(v)
        V = v[:, None]
        KV = Kx(v)[:, None]
        MV = Mx(v)[:, None]

        locked_Q: List[np.ndarray] = []
        locked_vals: List[float] = []
        res_hist: List[float] = []

        valsM = self.opM.vals if self.opM is not None else \
            jnp.zeros((0,), dtype=self.dtype)
        factors = self.precond.factors
        dplans = self.precond._dplans

        it = 0
        while it < self.max_iter and len(locked_vals) < k_want:
            it += 1
            H = V.T @ KV
            G = V.T @ MV
            w, Y = sla.eig(H, G)
            # select Ritz value: nearest target / smallest magnitude
            if self.which == "LM":
                order = np.argsort(-np.abs(w))
            else:
                order = np.argsort(np.abs(w - self.target))
            # skip Ritz directions too close to locked values? rely on
            # deflation via projection instead.
            theta = w[order[0]]
            y = Y[:, order[0]]
            if abs(theta.imag) < 1e-12 * (1 + abs(theta.real)):
                theta = theta.real
                y = y.real
            else:
                # real part of the complex Ritz vector (real JDQR
                # handles conjugate pairs through the real Schur form)
                theta = theta.real
                y = y.real
            y = y / np.linalg.norm(y)
            u = V @ y
            u /= np.linalg.norm(u)
            r = Kx(u) - theta * Mx(u)
            # deflate locked directions from the residual
            for q in locked_Q:
                r -= q * (q @ r)
            rn = np.linalg.norm(r)
            res_hist.append(rn)

            if rn < self.tol:
                locked_Q.append(u)
                locked_vals.append(theta)
                # remove u from the search space
                Vp = V - u[:, None] * (u @ V)[None, :]
                Q_, _ = np.linalg.qr(Vp)
                keep = min(V.shape[1] - 1, Q_.shape[1])
                if keep < 1:
                    v = rng.standard_normal(n)
                    for q in locked_Q:
                        v -= q * (q @ v)
                    v /= np.linalg.norm(v)
                    V = v[:, None]
                else:
                    V = Q_[:, :keep]
                KV = np.column_stack([Kx(V[:, j])
                                      for j in range(V.shape[1])])
                MV = np.column_stack([Mx(V[:, j])
                                      for j in range(V.shape[1])])
                continue

            # correction equation, projected against locked + current
            Qfull = np.zeros((n, self._max_lock + 1))
            for j, q in enumerate(locked_Q[:self._max_lock]):
                Qfull[:, j] = q
            Qfull[:, min(len(locked_Q), self._max_lock)] = u
            t = np.array(self._corr_jit(
                self.opK.vals, valsM, factors, dplans,
                jnp.asarray(Qfull, self.dtype), jnp.asarray(r, self.dtype),
                jnp.asarray(theta, self.dtype)))

            # orthogonalize against V and locked, expand
            for q in locked_Q:
                t -= q * (q @ t)
            t -= V @ (V.T @ t)
            t -= V @ (V.T @ t)
            tn = np.linalg.norm(t)
            if tn < 1e-12:
                t = rng.standard_normal(n)
                for q in locked_Q:
                    t -= q * (q @ t)
                t -= V @ (V.T @ t)
                tn = np.linalg.norm(t)
            t /= tn

            if V.shape[1] >= self.max_subspace:
                # restart with the best Ritz vectors
                keep = self.restart_dim
                idx = order[:keep]
                Vr = V @ Y[:, idx].real
                Q_, _ = np.linalg.qr(Vr)
                V = Q_
                KV = np.column_stack([Kx(V[:, j])
                                      for j in range(V.shape[1])])
                MV = np.column_stack([Mx(V[:, j])
                                      for j in range(V.shape[1])])

            V = np.column_stack([V, t])
            KV = np.column_stack([KV, Kx(t)])
            MV = np.column_stack([MV, Mx(t)])

        vals = np.array(locked_vals)
        vecs = np.column_stack(locked_Q) if locked_Q else np.zeros((n, 0))
        return EigenResult(values=vals, vectors=vecs, iterations=it,
                           converged=len(locked_vals),
                           residuals=res_hist)
