"""Public interface gather* surface (reference PIPSIPMppInterface.cpp:
193-430) — KKT consistency of every accessor on converged solves, with and
without scaling/presolve, for Dense and Arrowhead problems."""
import numpy as np
import pytest

from pips_ipmpp_tpu.core.options import Options, PresolverType, ScalerType
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp

from tests.fixtures import two_scenario_linking_lp


def _solved(lp, opts=None):
    iface = PIPSIPMppTPUInterface(lp, opts or Options())
    status = iface.run()
    assert status == TerminationStatus.SUCCESSFUL_TERMINATION
    return iface


def _check_kkt_surface(iface, lp, tol=1e-5):
    """Every accessor returns original-space values satisfying the KKT
    conditions of the ORIGINAL problem."""
    x = iface.gatherPrimalSolution()
    y = iface.gatherDualSolutionEq()
    z = iface.gatherDualSolutionIneq()
    assert x.shape == (lp.total_vars(),)
    assert y.shape == (lp.total_eq(),)
    assert z.shape == (lp.total_ineq(),)

    # eq cons values hit the rhs
    ax = iface.gatherEqualityConsValues()
    b = np.concatenate([np.asarray(lp.b0), np.asarray(lp.bN).reshape(-1),
                        np.asarray(lp.bl)])
    assert np.max(np.abs(ax - b)) < tol
    assert np.max(np.abs(iface.gatherPrimalResidsEQ())) < tol

    # ineq cons values within bounds
    cx = iface.gatherInequalityConsValues()
    assert np.max(np.abs(iface.gatherPrimalResidsIneqLow())) < tol
    assert np.max(np.abs(iface.gatherPrimalResidsIneqUp())) < tol

    # slack identities: v = x - xlow, w = xupp - x (masked)
    il, lo, iu, up = iface._orig_var_bounds()
    v = iface.gatherSlacksVarsLow()
    w = iface.gatherSlacksVarsUp()
    assert np.max(np.abs(il * (x - lo - v))) < tol
    assert np.max(np.abs(iu * (up - x - w))) < tol
    rl, rlo, ru, rup = iface._orig_row_bounds()
    t = iface.gatherSlacksInequalityLow()
    u = iface.gatherSlacksInequalityUp()
    assert np.max(np.abs(rl * (cx - rlo - t))) < tol
    assert np.max(np.abs(ru * (rup - cx - u))) < tol

    # dual identities: z = lam - pi; Lagrangian gradient ~ 0
    lam = iface.gatherDualSolutionIneqLow()
    pi = iface.gatherDualSolutionIneqUpp()
    assert np.max(np.abs(rl * lam - np.maximum(z, 0) * rl)) < 1e-3
    assert np.max(np.abs(iface.gatherDualResids())) < 1e-3
    gm = iface.gatherDualSolutionVarBoundsLow()
    ph = iface.gatherDualSolutionVarBoundsUpp()
    assert np.allclose(iface.gatherDualSolutionVarBounds(), gm - ph)
    assert np.all(gm >= -1e-9) and np.all(ph >= -1e-9)
    assert np.all(lam >= -1e-9) and np.all(pi >= -1e-9)

    # complementarity residuals are tiny at optimality
    norms = iface.printComplementarityResiduals()
    for v_ in norms.values():
        assert v_ < 1e-3

    # first/second stage views agree with the flat gather
    np.testing.assert_allclose(iface.getFirstStagePrimalColSolution(),
                               x[:lp.n0])
    np.testing.assert_allclose(iface.getSecondStagePrimalColSolution(1),
                               x[lp.n0 + lp.n: lp.n0 + 2 * lp.n])
    assert iface.getFirstStageObjective() == pytest.approx(
        float(np.dot(np.asarray(lp.c0), x[:lp.n0])))


def test_gather_surface_plain():
    lp = random_arrowhead_lp(11, N=4, n=6, mE=2, mI=3, n0=3, m0E=1, m0I=2,
                             mEl=2, mIl=2)
    iface = _solved(lp, Options(scaler=ScalerType.NONE))
    _check_kkt_surface(iface, lp)


def test_gather_surface_scaled():
    """Scaling round-trips: all accessors report ORIGINAL-space values."""
    lp = random_arrowhead_lp(12, N=4, n=6, mE=2, mI=3, n0=3, m0E=1, m0I=2,
                             mEl=2, mIl=2)
    iface = _solved(lp, Options(scaler=ScalerType.EQUILIBRIUM))
    _check_kkt_surface(iface, lp)


def test_gather_surface_presolved():
    """With presolve the gaps/duals are reconstructed in the original
    space from the postsolved solution."""
    lp, obj = two_scenario_linking_lp()
    iface = _solved(lp, Options(presolve=PresolverType.PRESOLVE))
    assert iface.getObjective() == pytest.approx(obj, abs=1e-5)
    _check_kkt_surface(iface, lp, tol=1e-4)


def test_gather_objective_consistency():
    lp = random_arrowhead_lp(13, N=4, n=6, mE=2, mI=3, n0=3, m0E=1, m0I=2,
                             mEl=2, mIl=2)
    iface = _solved(lp)
    x = iface.gatherPrimalSolution()
    c = np.concatenate([np.asarray(lp.c0), np.asarray(lp.cN).reshape(-1)])
    assert iface.getObjective() == pytest.approx(float(c @ x), rel=1e-10)


def test_facade_banded_options():
    """Options(banded_leaf=True, banded_root=True) picks the structure-
    exploiting backends declaratively (planning happens inside the
    facade)."""
    import jax.numpy as jnp
    from pips_ipmpp_tpu.io.synthetic import banded_arrowhead_lp
    lp = banded_arrowhead_lp(6, N=4, n=64, mE=32, mI=32, window=5,
                             dtype=jnp.float64)
    base = PIPSIPMppTPUInterface(lp, Options())
    assert base.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    iface = PIPSIPMppTPUInterface(
        lp, Options(banded_leaf=True, banded_root=True))
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - base.getObjective()) < 1e-6
    import pytest as _pt
    with _pt.raises(ValueError):
        PIPSIPMppTPUInterface(lp, Options(banded_leaf=True,
                                          hierarchical=True))


def test_allgather_blocksizes():
    """allgatherBlocksizes returns original per-block column/eq-row/
    ineq-row lengths (reference PIPSIPMppInterface.hpp:84, .cpp:432-497):
    cols = [n0, n_1..n_N]; eq = [m0E, mE_1..mE_N, mEl];
    ineq = [m0I, mI_1..mI_N, mIl]."""
    lp = random_arrowhead_lp(7, N=3, n=10, mE=4, mI=3, n0=5,
                             m0E=2, m0I=2, mEl=2, mIl=1)
    iface = PIPSIPMppTPUInterface(lp, Options())
    cols, eq, ineq = iface.allgatherBlocksizes()
    assert cols.dtype == np.uint32
    assert list(cols) == [5, 10, 10, 10]
    assert list(eq) == [2, 4, 4, 4, 2]
    assert list(ineq) == [2, 3, 3, 3, 1]
    # consistency with the totals the gathers use
    assert cols.sum() == lp.total_vars()
    assert eq.sum() == lp.total_eq()
    assert ineq.sum() == lp.total_ineq()

    # bucketed: per-block sizes come from each block's bucket
    from tests.test_bucketed import SIZES, _problem
    from pips_ipmpp_tpu.core.bucketed import make_bucketed_arrowhead_lp
    blocks, first, le, li = _problem(np.random.default_rng(3), SIZES)
    blp = make_bucketed_arrowhead_lp(blocks, first, le, li, quantum=16)
    bi = PIPSIPMppTPUInterface(blp, Options())
    bcols, beq, bineq = bi.allgatherBlocksizes()
    assert len(bcols) == blp.N + 1 and len(beq) == blp.N + 2
    assert bcols.sum() == blp.total_vars()
