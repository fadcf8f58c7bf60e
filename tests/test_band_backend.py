"""Banded (block-tridiagonal) leaf backend: symbolic plan, factorization
oracle checks, and end-to-end IPM equality with the dense backend.

Reference analog: the sparse leaf factorization with reusable symbolic
analysis (PardisoSchurSolver.C:84-252); here the symbolic stage is RCM
bandwidth reduction and the numeric stage a batched block-tridiagonal
Cholesky (linalg/band_backend.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.io.synthetic import banded_arrowhead_lp
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.linalg.band_backend import (
    BandArrowBackend, block_tridiag_factor, block_tridiag_solve,
    plan_banded)


def _rand_block_tridiag(rng, nb, N, b):
    """Random SPD block-tridiagonal matrix, returned both as panels and
    as the dense [N, nb*b, nb*b] oracle."""
    a = nb * b
    dense = np.zeros((N, a, a))
    Adiag = np.zeros((nb, N, b, b))
    Asub = np.zeros((nb, N, b, b))
    for k in range(nb):
        Q = rng.normal(size=(N, b, b))
        Adiag[k] = Q @ Q.transpose(0, 2, 1) + (b + 4) * np.eye(b)
        dense[:, k * b:(k + 1) * b, k * b:(k + 1) * b] = Adiag[k]
        if k < nb - 1:
            S = rng.normal(size=(N, b, b)) * 0.3
            Asub[k] = S
            dense[:, (k + 1) * b:(k + 2) * b, k * b:(k + 1) * b] = S
            dense[:, k * b:(k + 1) * b, (k + 1) * b:(k + 2) * b] = \
                S.transpose(0, 2, 1)
    return Adiag, Asub, dense


def test_block_tridiag_solve_matches_dense_oracle():
    rng = np.random.default_rng(0)
    nb, N, b, c = 5, 3, 4, 2
    Adiag, Asub, dense = _rand_block_tridiag(rng, nb, N, b)
    rhs = rng.normal(size=(nb, N, b, c))

    Ginv, C, ok = block_tridiag_factor(jnp.asarray(Adiag), jnp.asarray(Asub))
    assert bool(ok)
    x = block_tridiag_solve(Ginv, C, jnp.asarray(rhs))

    # oracle: dense solve per batch entry
    r_flat = rhs.transpose(1, 0, 2, 3).reshape(N, nb * b, c)
    x_flat = np.asarray(x).transpose(1, 0, 2, 3).reshape(N, nb * b, c)
    for i in range(N):
        expect = np.linalg.solve(dense[i], r_flat[i])
        np.testing.assert_allclose(x_flat[i], expect, rtol=1e-9, atol=1e-9)


def test_plan_banded_properties():
    lp = banded_arrowhead_lp(1, N=3, n=64, mE=32, mI=32, window=5)
    plan = plan_banded(lp)
    a = lp.mE + lp.mI
    assert plan.perm.shape == (lp.N, a)
    # perm is a permutation per block, iperm its inverse
    for i in range(lp.N):
        assert sorted(plan.perm[i]) == list(range(a))
        np.testing.assert_array_equal(plan.iperm[i][plan.perm[i]],
                                      np.arange(a))
    # local-support rows => bandwidth far below dense
    assert plan.half_bandwidth < a // 2
    assert plan.panel >= plan.half_bandwidth
    assert plan.n_panels * plan.panel >= a


def test_band_ipm_matches_dense_backend():
    lp = banded_arrowhead_lp(0, N=4, n=96, mE=48, mI=48, window=6,
                             dtype=jnp.float64)
    plan = plan_banded(lp)
    r_dense = IPMSolver(partial(ArrowBackend,
                                factor_dtype=jnp.float64)).solve(lp)
    r_band = IPMSolver(partial(BandArrowBackend, plan=plan,
                               factor_dtype=jnp.float64)).solve(lp)
    assert r_dense.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert r_band.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert r_band.iterations == r_dense.iterations
    np.testing.assert_allclose(float(r_band.objective),
                               float(r_dense.objective), rtol=1e-8)


def test_band_factor_memory_is_linear_in_bandwidth():
    """The stored factors are O(a*b) per block, not O(a^2): the regime
    where the dense explicit inverse cannot exist (VERDICT item 5)."""
    lp = banded_arrowhead_lp(2, N=2, n=128, mE=64, mI=64, window=4,
                             dtype=jnp.float64)
    plan = plan_banded(lp)
    be = BandArrowBackend(lp, plan=plan, factor_dtype=jnp.float64)
    a = lp.mE + lp.mI
    M = jnp.concatenate([lp.B, lp.D], axis=1)
    MEi = M * 0.5
    Fd = jnp.ones((lp.N, a))
    (Ginv, C), Ninv, ok = be._leaf_factor(M, MEi, Fd)
    assert bool(ok)
    band_entries = Ginv.size + C.size
    assert band_entries < lp.N * a * a // 2
    # and the solve against those factors matches a dense solve
    Neq = np.einsum("iak,ibk->iab", np.asarray(MEi), np.asarray(M)) \
        + np.stack([np.diag(np.asarray(Fd)[i]) for i in range(lp.N)])
    t = np.random.default_rng(0).normal(size=(lp.N, a, 3))
    got = be._apply_Ninv_multi((Ginv, C), Ninv, jnp.asarray(t))
    for i in range(lp.N):
        np.testing.assert_allclose(np.asarray(got)[i],
                                   np.linalg.solve(Neq[i], t[i]),
                                   rtol=1e-8, atol=1e-8)


def test_band_backend_distributed_matches_single_device():
    """Banded leaf with a SHARED (block-independent) RCM plan over the
    8-virtual-device mesh, both distribution modes, vs single device."""
    from pips_ipmpp_tpu.parallel.dist_solver import DistributedIPMSolver
    from pips_ipmpp_tpu.parallel.mesh import make_mesh

    lp = banded_arrowhead_lp(4, N=8, n=64, mE=32, mI=32, window=5,
                             dtype=jnp.float64)
    plan = plan_banded(lp, shared=True)
    assert plan.perm.ndim == 1
    ref = IPMSolver(partial(BandArrowBackend, plan=plan,
                            factor_dtype=jnp.float64)).solve(lp)
    assert ref.status == TerminationStatus.SUCCESSFUL_TERMINATION
    for mode in ("gspmd", "shard_map"):
        solver = DistributedIPMSolver(
            make_mesh(8), mode=mode, be_cls=BandArrowBackend,
            backend_kw=dict(plan=plan))
        res = solver.solve(lp)
        assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION, mode
        assert res.iterations == ref.iterations, mode
        np.testing.assert_allclose(float(res.objective),
                                   float(ref.objective), rtol=1e-8,
                                   err_msg=mode)


def test_dense_row_peeling():
    """Planted near-global rows must be peeled into the trailing Schur
    block (multifrontal dense-row treatment) instead of inflating the
    bandwidth, and solves must stay exact."""
    lp = banded_arrowhead_lp(5, N=3, n=128, mE=64, mI=64, window=4,
                             dtype=jnp.float64)
    # plant two dense equality rows per block
    import dataclasses
    B = np.asarray(lp.B).copy()
    rng = np.random.default_rng(0)
    B[:, 10, :] = rng.normal(size=(lp.N, lp.n)) * 0.1
    B[:, 40, :] = rng.normal(size=(lp.N, lp.n)) * 0.1
    lp2 = dataclasses.replace(lp, B=jnp.asarray(B))

    plain = plan_banded(lp, max_dense_frac=0.0)
    peeled = plan_banded(lp2)
    blown = plan_banded(lp2, max_dense_frac=0.0)
    assert peeled.n_dense >= 2
    # peeling restores the narrow bandwidth the dense rows destroyed
    assert blown.half_bandwidth > lp.mE
    assert peeled.half_bandwidth <= plain.half_bandwidth + 2

    # exactness: banded+peeled solve equals the dense oracle
    be = BandArrowBackend(lp2, plan=peeled, factor_dtype=jnp.float64)
    a = lp2.mE + lp2.mI
    M = jnp.concatenate([lp2.B, lp2.D], axis=1)
    Einv = 0.5 + 0.1 * jnp.arange(lp2.n, dtype=jnp.float64)
    MEi = M * Einv[None, None, :]
    Fd = 1.0 + 0.01 * jnp.arange(a, dtype=jnp.float64)[None, :] \
        * jnp.ones((lp2.N, 1))
    L, Ninv, ok = be._leaf_factor(M, MEi, Fd)
    assert bool(ok)
    Neq = np.einsum("iak,ibk->iab", np.asarray(MEi), np.asarray(M)) \
        + np.stack([np.diag(np.asarray(Fd)[i]) for i in range(lp2.N)])
    t = np.random.default_rng(1).normal(size=(lp2.N, a, 3))
    got = np.asarray(be._apply_Ninv_multi(L, Ninv, jnp.asarray(t)))
    for i in range(lp2.N):
        np.testing.assert_allclose(got[i], np.linalg.solve(Neq[i], t[i]),
                                   rtol=1e-8, atol=1e-8)

    # end-to-end: IPM on the planted LP matches the dense backend
    r_dense = IPMSolver(partial(ArrowBackend,
                                factor_dtype=jnp.float64)).solve(lp2)
    r_band = IPMSolver(partial(BandArrowBackend, plan=peeled,
                               factor_dtype=jnp.float64)).solve(lp2)
    assert r_band.status == TerminationStatus.SUCCESSFUL_TERMINATION
    np.testing.assert_allclose(float(r_band.objective),
                               float(r_dense.objective), rtol=1e-7)


def test_band_backends_compose_with_fused_loop():
    """The fully on-device solve loop works with the banded leaf and the
    banded root (static plans close over the jitted program)."""
    from pips_ipmpp_tpu.io.synthetic import klink_arrowhead_lp
    from pips_ipmpp_tpu.linalg.band_root import plan_banded_root

    lp = banded_arrowhead_lp(0, N=4, n=96, mE=48, mI=48, window=6,
                             dtype=jnp.float64)
    plan = plan_banded(lp)
    s = IPMSolver(partial(BandArrowBackend, plan=plan,
                          factor_dtype=jnp.float64))
    host = s.solve(lp)
    fused = s.solve_fused(lp)
    assert fused.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert fused.iterations == host.iterations

    lp2 = klink_arrowhead_lp(1, N=8, links_per_block=2, klink=2,
                             dtype=jnp.float64)
    f2 = IPMSolver(partial(ArrowBackend,
                           band_root_plan=plan_banded_root(lp2),
                           factor_dtype=jnp.float64)).solve_fused(lp2)
    assert f2.status == TerminationStatus.SUCCESSFUL_TERMINATION
