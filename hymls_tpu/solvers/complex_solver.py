"""Complex solves with a real preconditioner.

Behavioral equivalent of the reference's ComplexSolver /
ComplexVector / ComplexOperator (reference src/HYMLS_ComplexSolver.cpp,
HYMLS_ComplexVector.cpp, HYMLS_ComplexOperator.cpp): systems
(A + i B) z = b — e.g. complex-shifted Jacobians A - sigma M inside
eigenvalue computations — are solved by GMRES in genuine complex
arithmetic, while the multilevel preconditioner (which is real) is
applied separately to the real and imaginary parts.

Instead of the reference's Belos-templated-on-std::complex machinery,
the JAX GMRES here is dtype-generic: complex128 vectors, conjugated
Gram-Schmidt and complex-safe Givens rotations.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..config import Params
from ..core.preconditioner import Preconditioner
from ..ops.spmv import EllOperator
from . import krylov


class ComplexSolver:
    """GMRES for (A + iB) z = b, preconditioned by the real multilevel
    preconditioner of A (applied to Re/Im separately)."""

    def __init__(self, A: sp.csr_matrix, precond: Preconditioner,
                 params: Params, B: Optional[sp.csr_matrix] = None,
                 dtype=jnp.complex128):
        self.params = params
        self.precond = precond
        self.dtype = dtype
        rdtype = jnp.float64 if dtype == jnp.complex128 else jnp.float32
        self.rdtype = rdtype
        self._A = A.tocsr()
        self._B = None if B is None else B.tocsr()
        self.opA = EllOperator(A, dtype=rdtype)
        self.opB = EllOperator(B, dtype=rdtype) if B is not None else None

        slist = params.sublist("Solver")
        it = slist.sublist("Iterative Solver")
        self.maxiter = it.get("Maximum Iterations", 100)
        self.tol = it.get("Convergence Tolerance", 1e-8)
        # 'Distributed Apply': run the complex GMRES in the owner-
        # sharded halo layout (the same plans as the real Solver; A and
        # B each get their own ELL+exchange plan, the real V-cycle is
        # applied to Re/Im separately — reference ComplexSolver runs
        # over distributed Epetra vectors, src/HYMLS_ComplexSolver.hpp)
        self.distributed = slist.get("Distributed Apply", False)
        self._dist = None
        self._solve_jit = None
        self._border = None

    def set_border(self, V, W=None, C=None):
        """Bordered complex solve [A+iB V; W' C][z;s]=[b;0] (reference
        ComplexBorderedSolver; V/W/C real or complex)."""
        self.precond.set_border(np.real(V) if np.iscomplexobj(V) else V,
                                None if W is None else np.real(W),
                                None if C is None else np.real(C))
        V = np.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        W = V if W is None else np.asarray(W)
        if W.ndim == 1:
            W = W[:, None]
        m = V.shape[1]
        C = np.zeros((m, m)) if C is None else np.asarray(C)
        self._border = (jnp.asarray(V, self.dtype),
                        jnp.asarray(W, self.dtype),
                        jnp.asarray(C, self.dtype))
        # the halo apply captures the bordered factors at build time
        self._dist = None
        self._solve_jit = None
        return self

    def _make_dist(self):
        """Owner-sharded halo plans over the active mesh (mirrors
        Solver._make_dist); None + warning when unavailable."""
        import warnings
        from ..parallel.mesh import get_mesh
        from ..parallel.dist import make_distributed_solve
        from ..parallel.halo_vcycle import UnshardableError

        if self._dist is not None:
            return self._dist
        mesh = get_mesh()
        if mesh is None or mesh.size < 2:
            warnings.warn("'Distributed Apply' requested but no device "
                          "mesh is active (parallel.set_mesh); using the "
                          "replicated apply")
            self.distributed = False
            return None
        if self.precond._factors is None:
            self.precond.compute()
        try:
            self._dist = make_distributed_solve(self._A, self.precond,
                                                mesh)
        except UnshardableError as e:
            warnings.warn(f"'Distributed Apply' unavailable ({e}); "
                          "using the replicated apply")
            self.distributed = False
            return None
        return self._dist

    def _build_dist(self, dist):
        """Distributed complex GMRES: complex128 state in the flat
        owner layout (zero padding keeps norms/dots global); A and B
        ride their own ppermute ELL plans on Re/Im, the real V-cycle
        preconditions Re/Im separately.  With a border set, the
        augmented tail rides dist.make_aug exactly as the real
        bordered solve (reference distributed ComplexSolver /
        ComplexBorderedSolver, src/HYMLS_ComplexSolver.hpp:41-46)."""
        tol, maxiter = self.tol, self.maxiter
        cdtype = self.dtype
        prepB_mvB = dist.make_extra_matvec(self._B) \
            if self._B is not None else None

        def cplx_matvec(pvA, pvB, z):
            xr, xi = jnp.real(z), jnp.imag(z)
            yr = dist.matvec(pvA, xr)
            yi = dist.matvec(pvA, xi)
            if prepB_mvB is not None:
                _, mvB = prepB_mvB
                yr = yr - mvB(pvB, xi)
                yi = yi + mvB(pvB, xr)
            return (yr + 1j * yi).astype(cdtype)

        if self._border is not None:
            V, W, C = self._border
            m = V.shape[1]
            aug = dist.make_aug(m)
            bord_sm = dist.app.prec_sm_flat_b
            dpl = dist.dplans
            if bord_sm is None:
                raise RuntimeError(
                    "distributed bordered apply unavailable")

            def solve(valsA, valsB, factors, dplans, b):
                pvA = dist.prepare(valsA)
                pvB = prepB_mvB[0](valsB) if prepB_mvB is not None \
                    else None
                fac_st = dist.stack_factors(factors)
                V_st = (aug.scatter_cols(jnp.real(V)) +
                        1j * aug.scatter_cols(jnp.imag(V))).astype(cdtype)
                W_st = (aug.scatter_cols(jnp.real(W)) +
                        1j * aug.scatter_cols(jnp.imag(W))).astype(cdtype)
                br = aug.scatter_aug(jnp.real(b), jnp.zeros((m,)))
                bi = aug.scatter_aug(jnp.imag(b), jnp.zeros((m,)))
                bz = (br + 1j * bi).astype(cdtype)

                def opz(z):
                    x_fl, s = aug.split(z)
                    y_fl = cplx_matvec(pvA, pvB, x_fl) + V_st @ s
                    # W'x: sharded dot over the flat layout (psum)
                    tau = jnp.conj(W_st).T @ x_fl + C.astype(cdtype) @ s
                    return aug.join(y_fl, tau)

                def prec(z):
                    x_fl, s = aug.split(z)
                    xr, sr = bord_sm(fac_st, dpl, jnp.real(x_fl),
                                     jnp.real(s))
                    xi, si = bord_sm(fac_st, dpl, jnp.imag(x_fl),
                                     jnp.imag(s))
                    return aug.join((xr + 1j * xi).astype(cdtype),
                                    (sr + 1j * si).astype(cdtype))

                res = krylov.gmres(opz, bz, jnp.zeros_like(bz), prec,
                                   tol=tol, maxiter=maxiter, left=False)
                x_fl, s = aug.split(res.x)
                x = (dist.gather(jnp.real(x_fl)) +
                     1j * dist.gather(jnp.imag(x_fl))).astype(cdtype)
                return res._replace(x=jnp.concatenate([x, s]))

            self._solve_jit = jax.jit(solve)
            return

        def solve(valsA, valsB, factors, dplans, b):
            pvA = dist.prepare(valsA)
            pvB = prepB_mvB[0](valsB) if prepB_mvB is not None else None
            fac_st = dist.stack_factors(factors)
            bz = (dist.scatter(jnp.real(b)) +
                  1j * dist.scatter(jnp.imag(b))).astype(cdtype)

            def op(z):
                return cplx_matvec(pvA, pvB, z)

            def prec(z):
                xr = dist.precond(fac_st, dplans, jnp.real(z))
                xi = dist.precond(fac_st, dplans, jnp.imag(z))
                return (xr + 1j * xi).astype(cdtype)

            res = krylov.gmres(op, bz, jnp.zeros_like(bz), prec,
                               tol=tol, maxiter=maxiter, left=False)
            x = (dist.gather(jnp.real(res.x)) +
                 1j * dist.gather(jnp.imag(res.x))).astype(cdtype)
            return res._replace(x=x)

        self._solve_jit = jax.jit(solve)

    def _build(self):
        if self.precond._factors is None:
            self.precond.compute()
        if self.distributed:
            dist = self._make_dist()
            if dist is not None:
                self._build_dist(dist)
                return
        matvecA = self.opA.matvec_with
        matvecB = self.opB.matvec_with if self.opB is not None else None
        tol, maxiter = self.tol, self.maxiter
        cdtype = self.dtype

        if self._border is not None:
            bord_fn = self.precond._apply_bordered_pure
            n = self.opA.n
            V, W, C = self._border
            m = V.shape[1]

            def solve(valsA, valsB, factors, dplans, b):
                bz = jnp.concatenate([b, jnp.zeros((m,), dtype=cdtype)])

                def opz(z):
                    x, s = z[:n], z[n:]
                    xr, xi = jnp.real(x), jnp.imag(x)
                    yr = matvecA(valsA, xr)
                    yi = matvecA(valsA, xi)
                    if matvecB is not None:
                        yr = yr - matvecB(valsB, xi)
                        yi = yi + matvecB(valsB, xr)
                    y = (yr + 1j * yi).astype(cdtype) + V @ s
                    t = W.T.conj() @ x + C @ s
                    return jnp.concatenate([y, t])

                def prec(z):
                    xr, sr = bord_fn(factors, dplans, jnp.real(z[:n]),
                                     jnp.real(z[n:]))
                    xi, si = bord_fn(factors, dplans, jnp.imag(z[:n]),
                                     jnp.imag(z[n:]))
                    return jnp.concatenate([(xr + 1j * xi).astype(cdtype),
                                            (sr + 1j * si).astype(cdtype)])

                return krylov.gmres(opz, bz, jnp.zeros_like(bz), prec,
                                    tol=tol, maxiter=maxiter, left=False)

            self._solve_jit = jax.jit(solve)
            return

        apply_fn, _, _ = self.precond.apply_inverse_fn()

        def solve(valsA, valsB, factors, dplans, b):
            def op(z):
                xr, xi = jnp.real(z), jnp.imag(z)
                yr = matvecA(valsA, xr)
                yi = matvecA(valsA, xi)
                if matvecB is not None:
                    yr = yr - matvecB(valsB, xi)
                    yi = yi + matvecB(valsB, xr)
                return (yr + 1j * yi).astype(cdtype)

            def prec(z):
                xr = apply_fn(factors, dplans, jnp.real(z))
                xi = apply_fn(factors, dplans, jnp.imag(z))
                return (xr + 1j * xi).astype(cdtype)

            return krylov.gmres(op, b, jnp.zeros_like(b), prec, tol=tol,
                                maxiter=maxiter, left=False)

        self._solve_jit = jax.jit(solve)

    def apply_inverse(self, b):
        if self._solve_jit is None:
            self._build()
        b = jnp.asarray(b, dtype=self.dtype)
        valsB = self.opB.vals if self.opB is not None else \
            jnp.zeros((0,), dtype=self.rdtype)
        if self.distributed and self._dist is not None:
            # generic (unrepacked) factors: the distributed program
            # stacks them into the sharded halo layout itself
            factors = self.precond._prune_factors(self.precond.factors)
            res = self._solve_jit(self.opA.vals, valsB, factors,
                                  self._dist.dplans, b)
        else:
            res = self._solve_jit(self.opA.vals, valsB,
                                  self.precond.apply_factors,
                                  self.precond._aplans, b)
        n = self.opA.n
        x = res.x[:n] if self._border is not None else res.x
        return x, res
