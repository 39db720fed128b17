"""Deflated solves: remove slow eigenmodes of the preconditioned
operator from the Krylov iteration.

Behavioral equivalent of the reference's DeflatedSolver
(reference src/HYMLS_DeflatedSolver.cpp): the dominant eigenvectors of
P^{-1} (or P^{-1}M with a mass matrix) span the modes the
preconditioner handles worst; they are computed once per Compute
(Anasazi Block-Krylov-Schur there, ARPACK here — host-side setup), and
every solve then runs the projected system

    (I - VV')A(I - VV') y = (I - VV') b

plus a small dense correction system for the V-components
(reference SetupDeflation lines 87-157 / ApplyInverse 159-245).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import scipy.sparse.linalg as spla

import jax.numpy as jnp


class Deflation:
    """Holds the deflation space and dense correction factors."""

    def __init__(self, V, AV, ATV, R, D):
        self.V = V                 # (n, k) orthonormal deflation space
        self.AV = AV               # K @ V
        self.ATV = ATV             # K' @ V
        self.R = R                 # solve of projected AV ("deflationRhs")
        self.D = D                 # dense correction matrix (k, k)
        self.D_inv = np.linalg.inv(D)

    @property
    def k(self):
        return self.V.shape[1]


def compute_deflation_space(apply_prec: Callable, n: int, num_eigs: int,
                            apply_mass: Optional[Callable] = None,
                            tol: float = 1e-8) -> np.ndarray:
    """Dominant eigenspace of P^{-1} (resp. P^{-1} M) as a real
    orthonormal basis (reference EigsPrec + SVQB normalize)."""

    def mv(x):
        x = np.asarray(x, dtype=np.float64)
        if apply_mass is not None:
            x = np.asarray(apply_mass(x))
        return np.asarray(apply_prec(x))

    op = spla.LinearOperator((n, n), matvec=mv, dtype=np.float64)
    k = min(num_eigs, n - 2)
    vals, vecs = spla.eigs(op, k=k, which="LM", tol=tol)
    # real basis from the (possibly complex) eigenvectors
    cols = []
    for j in range(vecs.shape[1]):
        cols.append(np.real(vecs[:, j]))
        if np.any(np.imag(vecs[:, j]) != 0):
            cols.append(np.imag(vecs[:, j]))
    Vr = np.column_stack(cols)
    Q, _ = np.linalg.qr(Vr)
    return Q[:, :num_eigs]


def setup_deflation(V: np.ndarray, matvec: Callable, matvec_t: Callable,
                    projected_solve: Callable) -> Deflation:
    """Build the correction system (reference SetupDeflation):
      AV = K V;  R = solve((I-VV')AV);  D = V'AV - (K'V)' R."""
    n, k = V.shape
    AV = np.column_stack([np.asarray(matvec(V[:, j])) for j in range(k)])
    # orthogonal part of AV, solved column by column
    PAV = AV - V @ (V.T @ AV)
    R = np.column_stack([np.asarray(projected_solve(PAV[:, j]))
                         for j in range(k)])
    ATV = np.column_stack([np.asarray(matvec_t(V[:, j])) for j in range(k)])
    D = V.T @ AV - ATV.T @ R
    return Deflation(V=V, AV=AV, ATV=ATV, R=R, D=D)


def deflated_apply(defl: Deflation, b: np.ndarray,
                   projected_solve: Callable) -> np.ndarray:
    """One deflated solve (reference DeflatedSolver::ApplyInverse)."""
    V, R = defl.V, defl.R
    tmp = b - V @ (V.T @ b)
    Wb = np.asarray(projected_solve(tmp))
    w = defl.ATV.T @ Wb - V.T @ b
    v = defl.D_inv @ w
    return Wb + R @ v - V @ v
