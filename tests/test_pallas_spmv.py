"""Pallas fused DIA SpMV vs the XLA shifted-slice lowering.

Interpret mode (CPU backend): the kernel semantics are validated
against DiaOperator on real stencil matrices; the compiled-TPU timing
story lives in tools/pallas_spmv_bench.py / BENCH artifacts."""
import numpy as np
import pytest

import jax.numpy as jnp

from hymls_tpu.ops.spmv import DiaOperator
from hymls_tpu.ops.pallas_spmv import HAVE_PALLAS, PallasDiaMatvec
from hymls_tpu.stencils import laplace2d, stokes2d, laplace3d

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="no pallas")


@pytest.mark.parametrize("make", [
    lambda: laplace2d(24, 24),
    lambda: stokes2d(16, 16),
    lambda: laplace3d(8, 8, 8),
])
def test_matches_dia_operator(make):
    K = make().tocsr()
    op = DiaOperator(K, dtype=jnp.float32)
    pk = PallasDiaMatvec(op.offsets, op.n, block=512, interpret=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(op.n).astype(np.float32)
    bands = op.prepare(op.vals)
    y_ref = np.asarray(op.matvec_prepared(bands, jnp.asarray(x)))
    y_pal = np.asarray(pk(bands, jnp.asarray(x)))
    scale = np.abs(y_ref).max()
    assert np.abs(y_pal - y_ref).max() <= 1e-5 * max(scale, 1.0)


def test_non_tile_aligned_n():
    # n = 577 (prime-ish): exercises the padded final tile and the
    # sentinel zeros beyond n
    n = 577
    offsets = [-25, -1, 0, 1, 25]
    rng = np.random.default_rng(1)
    bands = rng.standard_normal((len(offsets), n)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    pk = PallasDiaMatvec(offsets, n, block=256, interpret=True)
    y = np.asarray(pk(jnp.asarray(bands), jnp.asarray(x)))
    x_pad = np.pad(x, (25, 25))
    y_ref = sum(bands[j] * x_pad[25 + off: 25 + off + n]
                for j, off in enumerate(offsets))
    assert np.abs(y - y_ref).max() <= 1e-5


def test_fits_gate():
    assert PallasDiaMatvec.fits([-1, 0, 1], 10_000)
    assert not PallasDiaMatvec.fits([-1, 0, 1], 10_000_000)
