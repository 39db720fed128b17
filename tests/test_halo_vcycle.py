"""Neighbor-halo distributed V-cycle (parallel/halo_vcycle.py):
point-to-point ppermute exchanges only on the level path, bit-identical
to the single-device apply (reference minimal-overlap imports,
src/HYMLS_HierarchicalMap.cpp:197-244)."""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hymls_tpu.config import Params
from hymls_tpu.stencils import create_matrix, create_testvector
from hymls_tpu import Preconditioner
from hymls_tpu.parallel.mesh import make_mesh
from hymls_tpu.parallel.halo_vcycle import make_halo_apply


def _build(nx, levels, eq="Laplace", part="Cartesian", sx=4):
    prob = {"Equations": eq, "Dimension": 2, "nx": nx, "ny": nx}
    params = Params({
        "Problem": prob,
        "Preconditioner": {"Partitioner": part, "Separator Length": sx,
                           "Number of Levels": levels,
                           "Structured Apply": False},
    })
    K = create_matrix(params)
    P = Preconditioner(K, params,
                       testvector=create_testvector(params, K)).compute()
    return K, P


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("nx,levels", [(32, 1), (64, 2), (32, 2)])
def test_halo_vcycle_bitmatches_serial(nx, levels):
    # (32, 2): the coarse level has 4 subdomains on 8 devices — the
    # trailing shards deactivate (the TPU analog of reference rank
    # deactivation, HYMLS_BasePartitioner.cpp:588-683).  That level's
    # per-shard batch is 1 and XLA's batch-1 matmul kernel rounds dot
    # products in a different order than the serial batch-4 kernel, so
    # this case is ULP-equal (<=1e-13), not bit-equal; the routing
    # itself is exact (ndev=2, batch 2, is bit-identical).
    K, P = _build(nx, levels)
    mesh = make_mesh(8)
    app = make_halo_apply(P, mesh).place()
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(K.shape[0]))
    x_serial = np.asarray(P.apply_inverse(b))
    x_halo = np.asarray(app(b))
    if levels == 2 and nx == 32:
        assert np.abs(x_serial - x_halo).max() < 1e-13
    else:
        assert np.array_equal(x_serial, x_halo), \
            f"max diff {np.abs(x_serial - x_halo).max()}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_halo_vcycle_stokes_bitmatches_serial():
    K, P = _build(32, 1, eq="Stokes-C")
    mesh = make_mesh(8)
    app = make_halo_apply(P, mesh).place()
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(K.shape[0]))
    x_serial = np.asarray(P.apply_inverse(b))
    x_halo = np.asarray(app(b))
    assert np.array_equal(x_serial, x_halo), \
        f"max diff {np.abs(x_serial - x_halo).max()}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_halo_vcycle_no_allgather_on_level_path():
    """The only all-gather in the compiled HLO is the one coarse-rhs
    gather — the level path is pure ppermute (collective-permute),
    regardless of the number of levels."""
    K, P = _build(64, 2)
    mesh = make_mesh(8)
    app = make_halo_apply(P, mesh).place()
    b = app.to_local(jnp.zeros(K.shape[0]))
    txt = jax.jit(app._fn.__wrapped__ if hasattr(app._fn, "__wrapped__")
                  else app._fn).lower(
        app.factors, app.dplans, b).compile().as_text()
    n_ag = len(re.findall(r"all-gather", txt))
    n_cp = len(re.findall(r"collective-permute", txt))
    assert n_ag <= 1, f"{n_ag} all-gathers on a 2-level apply"
    assert n_cp >= 2, "expected ppermute neighbor exchanges"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_halo_communication_volume():
    """Per-level exchanged words are O(boundary separators/device),
    far below the all_gather volume (= everything, every level)."""
    from hymls_tpu.parallel.halo_vcycle import build_halo_plans
    K, P = _build(64, 2)
    levels, coarse, meta, bmaps = build_halo_plans(P, 8)
    for lm, d in zip(meta, levels):
        sent = 0
        for pre in ("y2", "nx", "up", "x2"):
            for off in lm.get(f"{pre}_offsets", []):
                sent += d[f"{pre}_send_{off}"].shape[1]
        n_owned = lm["max_onod"]
        assert sent < n_owned, (
            f"level exchange volume {sent} not below owned nodes "
            f"{n_owned}")
