"""Tiled lane-gather SpMV kernel (linalg/pallas_spmv.py) — the TPU-native
replacement for the reference's sparse leaf products
(PardisoSchurSolver.C:84-252 routes leaf solves through PARDISO's CSR
machinery; here the static sparsity is tiled for `tpu.dynamic_gather`).

Runs in Pallas interpret mode on CPU; exactness is against dense einsums.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.linalg.pallas_spmv import (build_tiled, from_tiles,
                                               tiled_spmv, to_tiles)


def _random_ell(rng, N, m, n, K, dtype=np.float64):
    col = np.zeros((N, m, K), np.int32)
    val = np.zeros((N, m, K), dtype)
    for b in range(N):
        for r in range(m):
            k = rng.integers(1, K + 1)
            cols = rng.choice(n, size=k, replace=False)
            col[b, r, :k] = cols
            val[b, r, :k] = rng.standard_normal(k)
    return col, val


def _dense(col, val, n):
    N, m, K = col.shape
    out = np.zeros((N, m, n), val.dtype)
    for b in range(N):
        for r in range(m):
            for k in range(K):
                out[b, r, col[b, r, k]] += val[b, r, k]
    return out


@pytest.mark.parametrize("m,n,c", [(64, 96, 3), (130, 257, 9), (128, 128, 1)])
def test_tiled_spmv_matches_dense(m, n, c):
    rng = np.random.default_rng(m + n)
    N, K = 3, 5
    col, val = _random_ell(rng, N, m, n, K)
    dense = _dense(col, val, n)
    te = build_tiled(col, val, m, n, dtype=np.float64)
    x = rng.standard_normal((N, c, n))
    y = from_tiles(tiled_spmv(te, to_tiles(jnp.asarray(x), te.n_pad)), m, c)
    ref = np.einsum("bmn,bcn->bcm", dense, x)
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-12 * max(
        1.0, np.max(np.abs(ref)))

    # transpose build: y = M' x
    tt = build_tiled(col, val, m, n, transpose=True, dtype=np.float64)
    xt = rng.standard_normal((N, c, m))
    yt = from_tiles(tiled_spmv(tt, to_tiles(jnp.asarray(xt), tt.n_pad)),
                    n, c)
    reft = np.einsum("bmn,bcm->bcn", dense, xt)
    assert np.max(np.abs(np.asarray(yt) - reft)) < 1e-12 * max(
        1.0, np.max(np.abs(reft)))


def test_tiled_duplicate_and_zero_entries():
    """Duplicate (row, col) slots accumulate; zero-valued padding entries
    are dropped at build."""
    col = np.array([[[2, 2, 0], [1, 0, 0]]], np.int32)      # [1, 2, 3]
    val = np.array([[[1.5, 2.5, 0.0], [3.0, 0.0, 0.0]]])
    te = build_tiled(col, val, 2, 4, dtype=np.float64)
    x = jnp.asarray(np.arange(1, 5, dtype=np.float64).reshape(1, 1, 4))
    y = from_tiles(tiled_spmv(te, to_tiles(x, te.n_pad)), 2, 1)
    # row0: (1.5+2.5)*x[2] = 12; row1: 3*x[1] = 6
    assert np.allclose(np.asarray(y)[0, 0], [12.0, 6.0])


def test_sparse_backend_tiled_solve_matches_xla():
    """Full IPM solve through SparseArrowBackend with the Pallas tiled
    leaf (interpret mode) matches the XLA ELL path."""
    from functools import partial

    from pips_ipmpp_tpu.io.synthetic import random_sparse_arrowhead_lp
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.linalg.sparse_backend import (SparseArrowBackend,
                                                      sparse_leaf_tiles)

    slp = random_sparse_arrowhead_lp(5, N=3, n=96, mE=48, mI=48,
                                     nnz_per_row=5, n0=6, m0E=2, m0I=2,
                                     mEl=2, mIl=2)
    opts = Options()
    r_xla = IPMSolver(SparseArrowBackend, opts).solve(slp)
    assert r_xla.status == TerminationStatus.SUCCESSFUL_TERMINATION
    tiles = sparse_leaf_tiles(slp)
    r_til = IPMSolver(SparseArrowBackend, opts,
                      aux=dict(tiles=tiles)).solve(slp)
    assert r_til.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(float(r_til.objective) - float(r_xla.objective)) < 1e-6
    assert r_til.iterations <= r_xla.iterations + 2
