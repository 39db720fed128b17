"""Sparse matrix-vector products for structured stencil matrices.

TPU-native replacement for Epetra_CrsMatrix::Multiply: the matrix is
converted once (host) to a fixed-width ELL layout — for stencil
operators the width is the stencil size (5/7/9), so the device op is a
dense gather + multiply + reduce over a tiny constant axis, which XLA
fuses into a single pass over HBM.  The value array is shared with the
CSR used by the preconditioner plans, so Newton-step value updates need
no re-indexing.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp


class EllOperator:
    """y = A @ x with A in padded row-major ELL form."""

    def __init__(self, A: sp.csr_matrix, dtype=jnp.float64):
        A = A.tocsr()
        A.sum_duplicates()
        A.sort_indices()
        n = A.shape[0]
        width = int(np.diff(A.indptr).max()) if A.nnz else 1
        cols = np.full((n, width), n, dtype=np.int64)
        vidx = np.full((n, width), A.nnz, dtype=np.int64)
        lens = np.diff(A.indptr)
        # vectorized fill
        rowrep = np.repeat(np.arange(n), lens)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], lens)
        cols[rowrep, offs] = A.indices
        vidx[rowrep, offs] = np.arange(A.nnz)

        self.n = n
        self.nnz = A.nnz
        self.width = width
        self.cols = jnp.asarray(cols, dtype=jnp.int32)
        self.vidx = jnp.asarray(vidx, dtype=jnp.int32)
        self.vals = jnp.asarray(A.data, dtype=dtype)
        self.dtype = dtype

    def set_values(self, vals):
        self.vals = jnp.asarray(vals, dtype=self.dtype)

    def matvec_with(self, vals, x):
        """y = A(vals) @ x — pure function of (vals, x)."""
        vals_ext = jnp.concatenate([vals, jnp.zeros((1,), dtype=vals.dtype)])
        x_ext = jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])
        return jnp.sum(vals_ext[self.vidx] * x_ext[self.cols], axis=1)

    def __call__(self, x):
        return self.matvec_with(self.vals, x)
