"""MatrixUtils parity: the seven DropByValue modes + PutDirichlet
(reference src/HYMLS_MatrixUtils.hpp:51-65, HYMLS_CoarseSolver.cpp:141)."""
import numpy as np
import scipy.sparse as sp
import pytest

from hymls_tpu.utils.matrix import drop_by_value, put_dirichlet, DROP_MODES


def _A():
    # diag: [2, 1e-16, 3, 0(absent)]; small off-diags relative + absolute
    rows = [0, 0, 1, 1, 2, 2, 0, 2]
    cols = [0, 1, 1, 0, 2, 3, 3, 0]
    vals = [2.0, 1e-16, 1e-16, 0.5, 3.0, 1e-16, 1.0, 1e-10]
    return sp.csr_matrix((vals, (rows, cols)), shape=(4, 4))


def test_absolute_modes():
    A = _A()
    B = drop_by_value(A, 1e-12, "Absolute")
    d = B.todok()
    assert (0, 1) not in d and (1, 1) not in d
    assert d[0, 0] == 2.0 and d[2, 0] == pytest.approx(1e-10)

    B = drop_by_value(A, 1e-12, "AbsZeroDiag")
    assert B[1, 1] == 0.0 and (1, 1) in B.todok()

    B = drop_by_value(A, 1e-12, "AbsFullDiag")
    dok = B.todok()
    assert (3, 3) in dok and B[3, 3] == 0.0   # row 3 had no diagonal


def test_relative_modes():
    A = _A()
    # relative: |a20|=1e-10 <= tol*max(|a22|,|a00|)=1e-12*3 -> keep
    # (1e-10 > 3e-12); with tol=1e-9 -> dropped
    B = drop_by_value(A, 1e-9, "Relative")
    d = B.todok()
    assert (2, 0) not in d
    assert (1, 1) in d            # Relative never drops the diagonal

    B = drop_by_value(A, 1e-9, "RelDropDiag")
    assert (1, 1) not in B.todok()

    B = drop_by_value(A, 1e-9, "RelZeroDiag")
    d = B.todok()
    assert (1, 1) in d and B[1, 1] == 0.0

    B = drop_by_value(A, 1e-9, "RelFullDiag")
    d = B.todok()
    assert (3, 3) in d and B[3, 3] == 0.0


def test_unknown_mode():
    with pytest.raises(ValueError):
        drop_by_value(_A(), mode="Bogus")
    assert len(DROP_MODES) == 7


def test_put_dirichlet():
    rng = np.random.default_rng(0)
    A = sp.random(8, 8, density=0.4, random_state=0, format="csr")
    A = A + sp.eye(8)
    B = put_dirichlet(A, [2, 5], factor=1.0)
    Bd = B.toarray()
    for g in (2, 5):
        e = np.zeros(8); e[g] = 1.0
        assert np.array_equal(Bd[g], e)
        assert np.array_equal(Bd[:, g], e)
    # untouched block preserved
    keep = [i for i in range(8) if i not in (2, 5)]
    assert np.allclose(Bd[np.ix_(keep, keep)], A.toarray()[np.ix_(keep, keep)])
