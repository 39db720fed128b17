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
        self.opA = EllOperator(A, dtype=rdtype)
        self.opB = EllOperator(B, dtype=rdtype) if B is not None else None

        slist = params.sublist("Solver")
        it = slist.sublist("Iterative Solver")
        self.maxiter = it.get("Maximum Iterations", 100)
        self.tol = it.get("Convergence Tolerance", 1e-8)
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
        self._solve_jit = None
        return self

    def _build(self):
        if self.precond._factors is None:
            self.precond.compute()
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
        res = self._solve_jit(self.opA.vals, valsB, self.precond.apply_factors,
                              self.precond._aplans, b)
        n = self.opA.n
        x = res.x[:n] if self._border is not None else res.x
        return x, res
