"""Banded root (2-link SC exploitation): planner properties and IPM
equality with the dense two-stage root.

Reference analog: linking-structure exploitation / sparse-SC nnz
machinery (DistributedProblem.hpp:66-77); here the dual Schur complement
is factored block-tridiagonally after window ordering
(linalg/band_root.py)."""
import numpy as np
import jax.numpy as jnp
import pytest
from functools import partial

from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.io.synthetic import klink_arrowhead_lp
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.linalg.band_root import plan_banded_root


def test_plan_banded_root_two_link():
    lp = klink_arrowhead_lp(0, N=8, links_per_block=2, klink=2)
    plan = plan_banded_root(lp)
    nD = lp.m0E + lp.m0I + lp.mEl + lp.mIl
    assert sorted(plan.perm) == list(range(nD))
    np.testing.assert_array_equal(plan.iperm[plan.perm], np.arange(nD))
    # 2-link rows over 8 blocks: each block is touched by at most
    # 2*links_per_block*klink rows => bandwidth stays O(links) not O(N)
    assert plan.half_bandwidth <= 4 * 2 * 2
    assert plan.n_panels * plan.panel >= nD


def test_plan_bandwidth_verifies_against_true_sc_pattern():
    """The planned bandwidth must bound the TRUE dual-SC fill: assemble
    the dense SC with the reference (two-stage) backend and check every
    entry outside the planned band (over the linking part) is zero."""
    lp = klink_arrowhead_lp(3, N=6, links_per_block=2, klink=2,
                            dtype=jnp.float64)
    plan = plan_banded_root(lp)
    be = ArrowBackend(lp, factor_dtype=jnp.float64, explicit_inverse=False)
    from pips_ipmpp_tpu.core.spaces import RVec, XVec
    Dx = XVec(jnp.ones(lp.n0), jnp.ones((lp.N, lp.n)))
    Ominv = RVec(jnp.ones(lp.m0I), jnp.ones((lp.N, lp.mI)),
                 jnp.ones(lp.mIl))
    fac = be.factorize(Dx, Ominv, 1e-8, 1e-8)
    # dense dual SC of the two-stage root: chol2 chol2' = Sdual
    Sd = np.asarray(fac.chol2 @ fac.chol2.T)
    P = plan.perm
    Sp = Sd[np.ix_(P, P)]
    nD = Sp.shape[0]
    r, c = np.meshgrid(np.arange(nD), np.arange(nD), indexing="ij")
    # outside the pure band: |r - c| > half_bandwidth.  x0 coupling has
    # been eliminated INTO Sdual here, which makes it dense — mask the
    # n0-rank contribution by checking the *pre-elimination* -S22 instead
    # is stricter; accept the bandwidth bound on -S22:
    # rebuild S22 via Sdual = -(S22 - S12' S11^{-1} S12):
    T = np.asarray(fac.T)            # [n0, nD]
    chol1 = np.asarray(fac.chol1)
    S11 = chol1 @ chol1.T
    S22 = -(Sd - T.T @ (S11 @ T))
    S22p = S22[np.ix_(P, P)]
    nband = nD - plan.n_dense
    outside = (np.abs(r - c) > plan.half_bandwidth) \
        & (r < nband) & (c < nband)
    assert np.max(np.abs(S22p[outside])) < 1e-10


@pytest.mark.parametrize("n_global", [0, 1])
def test_band_root_ipm_matches_dense_root(n_global):
    lp = klink_arrowhead_lp(1, N=8, links_per_block=2, klink=2,
                            n_global=n_global, dtype=jnp.float64)
    plan = plan_banded_root(lp)
    r_dense = IPMSolver(partial(ArrowBackend,
                                factor_dtype=jnp.float64)).solve(lp)
    r_band = IPMSolver(partial(ArrowBackend, band_root_plan=plan,
                               factor_dtype=jnp.float64)).solve(lp)
    assert r_dense.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert r_band.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert r_band.iterations == r_dense.iterations
    np.testing.assert_allclose(float(r_band.objective),
                               float(r_dense.objective), rtol=1e-8)


def test_band_root_distributed_matches_single_device():
    """Banded root under shard_map over the 8-device mesh: the root stays
    replicated, the banded dual-SC factorization runs identically on every
    device."""
    from pips_ipmpp_tpu.parallel.dist_solver import DistributedIPMSolver
    from pips_ipmpp_tpu.parallel.mesh import make_mesh

    lp = klink_arrowhead_lp(2, N=8, links_per_block=2, klink=2,
                            dtype=jnp.float64)
    plan = plan_banded_root(lp)
    ref = IPMSolver(partial(ArrowBackend, band_root_plan=plan,
                            factor_dtype=jnp.float64)).solve(lp)
    assert ref.status == TerminationStatus.SUCCESSFUL_TERMINATION
    solver = DistributedIPMSolver(make_mesh(8), mode="shard_map",
                                  backend_kw=dict(band_root_plan=plan))
    res = solver.solve(lp)
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert res.iterations == ref.iterations
    np.testing.assert_allclose(float(res.objective), float(ref.objective),
                               rtol=1e-8)


def test_band_root_peels_global_rows():
    """Global (all-block) linking rows must be peeled into the trailing
    dense block instead of inflating the bandwidth to ~nL."""
    lp_local = klink_arrowhead_lp(4, N=16, links_per_block=2, klink=2)
    lp_glob = klink_arrowhead_lp(4, N=16, links_per_block=2, klink=2,
                                 n_global=3)
    p_local = plan_banded_root(lp_local)
    p_glob = plan_banded_root(lp_glob)
    assert p_glob.n_dense >= 3
    assert p_glob.half_bandwidth <= p_local.half_bandwidth + 4
    # without peeling the global rows couple everything
    p_noped = plan_banded_root(lp_glob, max_dense_frac=0.0)
    assert p_noped.half_bandwidth > p_glob.half_bandwidth

    r_dense = IPMSolver(partial(ArrowBackend,
                                factor_dtype=jnp.float64)).solve(lp_glob)
    r_band = IPMSolver(partial(ArrowBackend, band_root_plan=p_glob,
                               factor_dtype=jnp.float64)).solve(lp_glob)
    assert r_band.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert r_band.iterations == r_dense.iterations
    np.testing.assert_allclose(float(r_band.objective),
                               float(r_dense.objective), rtol=1e-8)


def test_band_root_rcm_general_local_pattern():
    """GENERAL (non-chain) local link structure: a RING coupling
    i <-> (i+1) mod N.  The wrap-around row's block window spans the
    whole chain, so window-center ordering would either peel it or pay
    ~nL/2 bandwidth; the RCM ordering of the SC adjacency graph (the
    analog of the reference's symbolic sparse-SC analysis,
    DistributedProblem.hpp:66-77) recovers O(links) bandwidth with no
    dense peel needed."""
    from pips_ipmpp_tpu.io.synthetic import refit_feasible

    N, n = 12, 24
    base = klink_arrowhead_lp(6, N=N, n=n, links_per_block=2, klink=2,
                              dtype=jnp.float64)
    rng = np.random.default_rng(21)
    mEl, mIl = base.mEl, base.mIl
    nL = mEl + mIl
    F = np.zeros((N, mEl, n))
    G = np.zeros((N, mIl, n))
    # row r (2 per block; even r -> eq, odd r -> ineq) touches blocks
    # r//2 and (r//2 + 1) % N — a cycle graph over blocks
    for r in range(nL):
        blk = (r // 2) % N
        strip, local = (F, r // 2) if r % 2 == 0 else (G, r // 2)
        for i in (blk, (blk + 1) % N):
            strip[i, local] = rng.normal(size=n) * 0.2
    lp = refit_feasible(base, F, G, rng, dtype=jnp.float64)

    plan = plan_banded_root(lp)
    # RCM on the cycle graph: bandwidth stays O(rows-per-block), nothing
    # needs the dense peel.  Center ordering alone cannot do better than
    # ~nL/2 for the wrap row (or must peel it).
    assert plan.n_dense == 0
    assert plan.half_bandwidth <= 8, plan.half_bandwidth

    r_dense = IPMSolver(partial(ArrowBackend,
                                factor_dtype=jnp.float64)).solve(lp)
    r_band = IPMSolver(partial(ArrowBackend, band_root_plan=plan,
                               factor_dtype=jnp.float64)).solve(lp)
    assert r_band.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert r_band.iterations == r_dense.iterations
    np.testing.assert_allclose(float(r_band.objective),
                               float(r_dense.objective), rtol=1e-8)
