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
    correction equations (the role of phist subspacejada +
    PhistCustomCorrectionSolver in the reference main_eigs).

    Requires M nonsingular (or None): the search space is kept
    M-orthonormal, so ker(M) components are uncontrolled and a
    singular mass (e.g. the zero pressure block of a Stokes pencil)
    produces spurious Ritz values.  For such pencils use
    `shift_invert_eigs` (driver: `Use Arnoldi: true`), whose
    shift-invert operator purifies infinite modes automatically."""

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
        # 'Bordered Solver' (reference laplace2_eigs.xml): correction
        # preconditioning through the bordered hierarchy.  Off by
        # default — a nullspace border pins W'x=0, which fights the
        # JD oblique projectors and stalls corrections (observed on
        # the Turing Jacobian); the reference's bordered correction
        # solver borders with the *projection space*, not the
        # nullspace (HYMLS_PhistCustomCorrectionSolver.cpp)
        self.use_bordered = eig.get("Bordered Solver", False)
        self._corr_jit = None
        self._corr_factors = None

    # -- device kernels -----------------------------------------------------
    def _build_corr(self, max_lock: int):
        p = self.precond
        if p._factors is None:
            p.compute()
        apply_fn, _, _ = p.apply_inverse_fn()
        self._corr_factors = None
        if p._border is not None:
            if self.use_bordered:
                # bordered preconditioner: apply [P V; W' C]^{-1} with
                # zero border rhs and keep the x part (reference
                # BorderedSolver convention for the correction
                # preconditioner)
                bord_fn = p._apply_bordered_pure
                mb = p._border[0].shape[1]

                def apply_fn(factors, dplans, x):     # noqa: F811
                    xs, _s = bord_fn(factors, dplans, x,
                                     jnp.zeros((mb,), dtype=x.dtype))
                    return xs
            else:
                # the driver computed P with a nullspace border, whose
                # augmented coarse factor the plain apply cannot
                # consume — refactor once without the border.  The
                # correction preconditioner is plain P^{-1}; nullspace
                # directions are handled by the JD oblique projectors
                # (reference HYMLS_PhistCustomCorrectionSolver.cpp
                # preconditions with the plain hierarchy)
                plain = p._compute_jit(p._vals0, p._dplans,
                                       p._extra_plan)
                self._corr_factors = p.apply_factors_from(plain)
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

        def corr_c(valsK, valsM, factors, dplans, Q, MQ, r, theta):
            """Complex-shifted correction equation for a conjugate
            Ritz pair: same oblique projections with the real pair
            basis {Re u, Im u} in Q, complex arithmetic in the Krylov
            loop, the real preconditioner applied to Re/Im separately
            (the role of the reference's ComplexSolver inside
            HYMLS_PhistCustomCorrectionSolver.cpp)."""
            def proj_r(x):
                return x - Q @ (MQ.T @ x)

            def proj_l(y):
                return y - MQ @ (Q.T @ y)

            def op(x):
                x = proj_r(x)
                xr, xi = jnp.real(x), jnp.imag(x)
                y = matvecK(valsK, xr) + 1j * matvecK(valsK, xi)
                if matvecM is not None:
                    y = y - theta * (matvecM(valsM, xr) +
                                     1j * matvecM(valsM, xi))
                else:
                    y = y - theta * x
                return proj_l(y)

            def prec(x):
                x = proj_l(x)
                pr = apply_fn(factors, dplans, jnp.real(x))
                pi = apply_fn(factors, dplans, jnp.imag(x))
                return proj_r(pr + 1j * pi)

            res = krylov.gmres(op, -r, jnp.zeros_like(r), prec, tol=1e-3,
                               maxiter=inner)
            return res.x

        self._corr_jit = jax.jit(corr)
        self._corr_c_jit = jax.jit(corr_c)
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
        factors = self._corr_factors if self._corr_factors is not None \
            else self.precond.apply_factors
        dplans = self.precond._aplans

        locked_vecs: List[np.ndarray] = []   # eigenvectors (complex
        #                                      for conjugate pairs)

        def refresh(Vp):
            """Re-orthonormalize a candidate basis after purging."""
            Vs, MVs = m_orthonormalize(Vp)
            if not Vs:
                Vs, MVs = m_orthonormalize(rng.standard_normal((n, 1)))
            Vn = np.column_stack(Vs)
            MVn = np.column_stack(MVs)
            KVn = np.column_stack([Kx(Vn[:, j])
                                   for j in range(Vn.shape[1])])
            return Vn, MVn, KVn

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
            wsel = w[order[0]]
            pair = abs(wsel.imag) > 1e-10 * max(1.0, abs(wsel))

            if pair:
                # conjugate Ritz pair: complex Ritz vector, complex
                # residual, complex-shifted correction (reference
                # HYMLS_PhistCustomCorrectionSolver.cpp)
                theta_c = complex(wsel)
                y_c = Y[:, order[0]]
                u_c = V @ y_c
                Mu_c = MV @ y_c
                un = float(np.sqrt(abs(np.vdot(u_c, Mu_c)))) or 1.0
                u_c /= un
                Mu_c /= un
                r = (Kx(u_c.real) + 1j * Kx(u_c.imag)) - theta_c * Mu_c
                # the M-orthonormal real basis of the pair subspace
                pQ, pMQ = m_orthonormalize(
                    np.column_stack([u_c.real, u_c.imag]))
            else:
                theta_c = complex(wsel.real)
                y = Y[:, order[0]].real
                y = y / np.linalg.norm(y)
                u = V @ y
                Mu = MV @ y
                un = float(np.sqrt(abs(u @ Mu))) or 1.0
                u /= un
                Mu /= un
                r = Kx(u) - theta_c.real * Mu
                pQ, pMQ = [u], [Mu]

            # oblique deflation of the locked pairs: r <- (I - MQ Q') r
            for q, mq in zip(locked_Q, locked_MQ):
                r = r - mq * (q @ r)
            rn = float(np.linalg.norm(r))
            res_hist.append(rn)

            if rn < self.tol:
                locked_Q.extend(pQ)
                locked_MQ.extend(pMQ)
                if pair:
                    locked_vals.extend([theta_c, np.conj(theta_c)])
                    locked_vecs.extend([u_c, np.conj(u_c)])
                else:
                    locked_vals.append(theta_c.real)
                    locked_vecs.append(u)
                # purge the locked directions, keep M-orthonormality
                Vp = V
                for q, mq in zip(pQ, pMQ):
                    Vp = Vp - q[:, None] * (mq @ Vp)[None, :]
                keep = max(V.shape[1] - len(pQ), 1)
                V, MV, KV = refresh(Vp)
                V, MV, KV = V[:, :keep], MV[:, :keep], KV[:, :keep]
                continue

            # correction equation, obliquely deflated against locked +
            # the current (pair) Ritz space; fixed width max_lock+2 so
            # real and pair steps share compiled programs
            width = self._max_lock + 2
            Qfull = np.zeros((n, width))
            MQfull = np.zeros((n, width))
            for j, (q, mq) in enumerate(zip(locked_Q[:self._max_lock],
                                            locked_MQ[:self._max_lock])):
                Qfull[:, j] = q
                MQfull[:, j] = mq
            jcur = min(len(locked_Q), self._max_lock)
            for q, mq in zip(pQ, pMQ):
                Qfull[:, jcur] = q
                MQfull[:, jcur] = mq
                jcur += 1
            if pair:
                t_c = np.asarray(self._corr_c_jit(
                    self.opK.vals, valsM, factors, dplans,
                    jnp.asarray(Qfull, self.dtype),
                    jnp.asarray(MQfull, self.dtype),
                    jnp.asarray(r, jnp.complex128),
                    jnp.asarray(theta_c, jnp.complex128)))
                t_cols = np.column_stack([t_c.real, t_c.imag])
            else:
                t = np.asarray(self._corr_jit(
                    self.opK.vals, valsM, factors, dplans,
                    jnp.asarray(Qfull, self.dtype),
                    jnp.asarray(MQfull, self.dtype),
                    jnp.asarray(r, self.dtype),
                    jnp.asarray(theta_c.real, self.dtype)))
                t_cols = t[:, None]

            if V.shape[1] + t_cols.shape[1] > self.max_subspace:
                # restart with the best Ritz vectors
                idx = order[:self.restart_dim]
                V, MV, KV = refresh(V @ Y[:, idx].real)

            # expand with the M-orthonormalized correction direction(s)
            Vs, MVs = m_orthonormalize(t_cols, Vs=list(V.T),
                                       MVs=list(MV.T))
            if not Vs:
                Vs, MVs = m_orthonormalize(
                    rng.standard_normal((n, 1)), Vs=list(V.T),
                    MVs=list(MV.T))
            for vnew in Vs:
                KV = np.column_stack([KV, Kx(vnew)])
            V = np.column_stack([V] + Vs)
            MV = np.column_stack([MV] + MVs)

        anycomplex = any(abs(np.imag(v)) > 0 for v in locked_vals)
        vals = np.array(locked_vals)
        if not anycomplex:
            vals = vals.real
        vecs = np.column_stack(locked_vecs) if locked_vecs \
            else np.zeros((n, 0))
        return EigenResult(values=vals, vectors=vecs, iterations=it,
                           converged=len(locked_vals),
                           residuals=res_hist)
