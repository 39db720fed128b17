"""Shared device-mesh sweep for the distributed test files.

The reference runs every unit test at 1,2,3,4,5,8 MPI ranks
(testSuite/unit_tests/CMakeLists.txt:36-48).  Here the default (fast)
tier pins the full 8-device mesh; the 2/3/5-device cases — which
exercise non-divisible ceil-block ownership padding — ride the slow
tier (pytest -m slow), mirroring the reference's LONG test split.
"""
import pytest

NDEV_SWEEP = [
    pytest.param(2, marks=pytest.mark.slow),
    pytest.param(3, marks=pytest.mark.slow),
    pytest.param(5, marks=pytest.mark.slow),
    8,
]
