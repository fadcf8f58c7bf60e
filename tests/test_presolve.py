"""Presolve/postsolve tests: feature-targeted micro-LPs (the analog of the
reference's GAMSsmall instance families: examples_boundTightening,
examples_parallelRows, singleton instances — SURVEY.md §4) plus end-to-end
objective equality with presolve on/off and postsolve residual validation."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.core.lp import make_arrowhead_lp
from pips_ipmpp_tpu.core.options import Options, PresolverType
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
from pips_ipmpp_tpu.presolve import Presolver
from pips_ipmpp_tpu.presolve.data import PresolveData
from pips_ipmpp_tpu.presolve.postsolve import postsolve_residuals

from tests.fixtures import random_arrowhead_lp, two_scenario_linking_lp


def lp_with_redundancy():
    """2-block LP seeded with singleton rows, a fixed column, parallel
    rows, and slack bounds for strengthening."""
    first = dict(
        c=np.array([1.0, 0.5]),
        A=np.array([[1.0, 0.0]]),          # singleton row: x0_0 = 2
        b=np.array([2.0]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0, 1.0]), xlow=np.array([0.0, 0.0]),
        ixupp=np.array([1.0, 1.0]), xupp=np.array([10.0, 3.0]),
        F0=np.zeros((1, 2)), G0=np.zeros((1, 2)),
    )
    blocks = []
    for i in range(2):
        blocks.append(dict(
            c=np.array([1.0, 2.0, 0.0]),
            A=np.array([[0.0, 1.0], [0.0, 2.0]]),
            # parallel rows: row2 = 2*row1
            B=np.array([[1.0, 1.0, 0.0], [2.0, 2.0, 0.0]]),
            b=np.array([4.0, 8.0]),
            C=np.zeros((1, 2)),
            D=np.array([[1.0, -1.0, 0.0]]),
            iclow=np.array([0.0]), clow=np.array([0.0]),
            icupp=np.array([1.0]), cupp=np.array([3.0]),
            ixlow=np.ones(3), xlow=np.array([0.0, 0.0, 1.5]),
            # third var is fixed by its bounds (column fixation)
            ixupp=np.ones(3), xupp=np.array([5.0, 5.0, 1.5]),
            F=np.array([[1.0, 0.0, 0.0]]),
            G=np.array([[0.0, 1.0, 0.0]]),
        ))
    lp = make_arrowhead_lp(
        blocks, first,
        linking_eq={"b": np.array([3.0])},
        linking_ineq={"iclow": np.array([1.0]), "clow": np.array([0.5]),
                      "icupp": np.array([1.0]), "cupp": np.array([4.0])})
    return lp


def test_passes_fire():
    lp = lp_with_redundancy()
    pres = Presolver()
    res = pres.presolve(lp)
    assert not res.infeasible
    assert res.stats.get("singleton_rows", 0) >= 1
    assert res.stats.get("column_fixation", 0) >= 2   # one per block
    assert res.stats.get("parallel_rows", 0) >= 2


def test_presolve_preserves_objective_and_postsolves():
    lp = lp_with_redundancy()
    base = PIPSIPMppTPUInterface(lp, Options())
    st0 = base.run()
    assert st0 == TerminationStatus.SUCCESSFUL_TERMINATION

    iface = PIPSIPMppTPUInterface(
        lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - base.getObjective()) < 1e-6

    sol = iface._postsolve()
    res = postsolve_residuals(lp, sol)
    for name, v in res.items():
        assert v < 1e-6, f"postsolve residual {name} = {v} ({res})"


@pytest.mark.parametrize("seed", [0, 1])
def test_presolve_on_random_lp(seed):
    lp = random_arrowhead_lp(seed, N=4, n=6, mE=3, mI=4, n0=3, m0E=2,
                             m0I=2, mEl=2, mIl=2)
    base = PIPSIPMppTPUInterface(lp, Options())
    base.run()
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - base.getObjective()) < 1e-5
    sol = iface._postsolve()
    res = postsolve_residuals(lp, sol)
    for name, v in res.items():
        assert v < 1e-5, f"{name}={v}"


def test_presolve_two_scenario_lp():
    lp, opt = two_scenario_linking_lp()
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - opt) < 1e-6


def test_infeasible_empty_row():
    lp = lp_with_redundancy()
    bad = dataclasses.replace(lp,
                              A0=jnp.zeros_like(lp.A0),
                              b0=jnp.ones_like(lp.b0) * 5.0)
    # zero row with b=5 -> infeasible
    pres = Presolver()
    res = pres.presolve(bad)
    assert res.infeasible


def test_infeasible_crossed_bounds_via_singleton():
    """Singleton ineq row forcing x <= -1 conflicts with x >= 0."""
    first = dict(
        c=np.array([1.0]), A=np.zeros((0, 1)), b=np.zeros(0),
        C=np.array([[1.0]]),
        iclow=np.array([0.0]), clow=np.array([0.0]),
        icupp=np.array([1.0]), cupp=np.array([-1.0]),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([0.0]), xupp=np.array([0.0]),
        F0=np.zeros((0, 1)), G0=np.zeros((0, 1)),
    )
    blocks = [dict(
        c=np.array([0.0]), A=np.zeros((1, 1)), B=np.array([[1.0]]),
        b=np.array([0.0]), C=np.zeros((0, 1)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([0.0]), xupp=np.array([0.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]
    lp = make_arrowhead_lp(blocks, first)
    res = Presolver().presolve(lp)
    assert res.infeasible


def test_bound_strengthening_tightens():
    """x + y = 1 with x,y >= 0 implies x,y <= 1."""
    first = dict(
        c=np.array([-1.0, -1.0]),
        A=np.array([[1.0, 1.0]]), b=np.array([1.0]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.ones(2), xlow=np.zeros(2),
        ixupp=np.zeros(2), xupp=np.zeros(2),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)),
    )
    blocks = [dict(
        c=np.array([0.0]), A=np.zeros((1, 2)), B=np.array([[1.0]]),
        b=np.array([0.5]), C=np.zeros((0, 2)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([0.0]), xupp=np.array([0.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]
    lp = make_arrowhead_lp(blocks, first)
    pd = PresolveData.from_lp(lp)
    from pips_ipmpp_tpu.presolve.passes import bound_strengthening
    k = bound_strengthening(pd)
    assert k >= 2
    assert pd.ixupp0[0] > 0 and abs(pd.xupp0[0] - 1.0) < 1e-12
    assert pd.ixupp0[1] > 0 and abs(pd.xupp0[1] - 1.0) < 1e-12


def test_singleton_column():
    """Free column singleton: x2 free, appears only in eq row x1 + 2 x2 = 4.
    min x1 + 3 x2 s.t. that row, 0 <= x1 <= 10, plus an anchor block.
    Substitution: x2 = (4 - x1)/2 -> objective x1 + 3(4-x1)/2 = 6 - x1/2
    -> minimized at x1 = 10, x2 = -3, objective 1."""
    first = dict(
        c=np.array([1.0, 3.0]),
        A=np.array([[1.0, 2.0]]), b=np.array([4.0]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0, 0.0]), xlow=np.array([0.0, 0.0]),
        ixupp=np.array([1.0, 0.0]), xupp=np.array([10.0, 0.0]),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)),
    )
    blocks = [dict(
        c=np.array([0.0]), A=np.zeros((1, 2)), B=np.array([[1.0]]),
        b=np.array([1.0]), C=np.zeros((0, 2)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([2.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]
    lp = make_arrowhead_lp(blocks, first)

    pres = Presolver()
    res = pres.presolve(lp)
    assert res.stats.get("singleton_columns", 0) == 1

    base = PIPSIPMppTPUInterface(lp, Options())
    base.run()
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(base.getObjective() - 1.0) < 1e-6
    assert abs(iface.getObjective() - 1.0) < 1e-6
    sol = iface._postsolve()
    assert abs(sol.x0[0] - 10.0) < 1e-6
    assert abs(sol.x0[1] - (-3.0)) < 1e-6
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-6, f"{name}={v}"


def _anchor_block():
    """Minimal block so make_arrowhead_lp has N >= 1."""
    return [dict(
        c=np.array([0.0]), A=np.zeros((1, 3)), B=np.array([[1.0]]),
        b=np.array([1.0]), C=np.zeros((0, 3)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([2.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]


def test_nearly_parallel_rows_general():
    """Two eq rows identical up to scale except for per-row singletons
    (reference StochPresolverParallelRows.C:788-876):
        x0 + x2 = 3      (singleton x2)
        2 x0 + x1 = 5    (singleton x1)
    Presolve eliminates one via x2 = t x1 + d.  Optimum: x0=2.5, x1=0,
    x2=0.5, obj=3 (c = [1,1,1], x1 in [0,7], x2 in [0,4])."""
    first = dict(
        c=np.array([1.0, 1.0, 1.0]),
        A=np.array([[1.0, 0.0, 1.0], [2.0, 1.0, 0.0]]),
        b=np.array([3.0, 5.0]),
        C=np.zeros((0, 3)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.ones(3), xlow=np.array([0.0, 0.0, 0.0]),
        ixupp=np.ones(3), xupp=np.array([10.0, 7.0, 4.0]),
        F0=np.zeros((0, 3)), G0=np.zeros((0, 3)),
    )
    lp = make_arrowhead_lp(_anchor_block(), first)
    res = Presolver().presolve(lp)
    assert res.stats.get("nearly_parallel_rows", 0) >= 1

    base = PIPSIPMppTPUInterface(lp, Options())
    base.run()
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(base.getObjective() - 3.0) < 1e-6
    assert abs(iface.getObjective() - 3.0) < 1e-6
    sol = iface._postsolve()
    assert abs(sol.x0[0] - 2.5) < 1e-5
    assert abs(sol.x0[1] - 0.0) < 1e-5
    assert abs(sol.x0[2] - 0.5) < 1e-5
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-6, f"{name}={v}"


def test_nearly_parallel_rows_fix():
    """Nearly-parallel pair where only one row has a singleton: the
    combination FIXES the singleton variable.
        x0 + x1 + x2 = 4   (singleton x2)
        2 x0 + 2 x1  = 5
    => x2 = (2*4 - 5)/2 = 1.5; optimum obj = 2.5 + 1.5 = 4."""
    first = dict(
        c=np.array([1.0, 1.0, 1.0]),
        A=np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 0.0]]),
        b=np.array([4.0, 5.0]),
        C=np.zeros((0, 3)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.ones(3), xlow=np.zeros(3),
        ixupp=np.ones(3), xupp=np.array([10.0, 10.0, 4.0]),
        F0=np.zeros((0, 3)), G0=np.zeros((0, 3)),
    )
    lp = make_arrowhead_lp(_anchor_block(), first)
    res = Presolver().presolve(lp)
    assert res.stats.get("nearly_parallel_rows", 0) >= 1

    base = PIPSIPMppTPUInterface(lp, Options())
    base.run()
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(base.getObjective() - 4.0) < 1e-6
    assert abs(iface.getObjective() - 4.0) < 1e-6
    sol = iface._postsolve()
    assert abs(sol.x0[2] - 1.5) < 1e-5
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-6, f"{name}={v}"


def test_redundant_row_removed():
    """Ineq row whose activity bounds can never violate its sides is
    dropped (StochPresolverModelCleanup.h:34-36): x0 + x1 <= 100 with
    x in [0,10]^2."""
    first = dict(
        c=np.array([-1.0, -2.0]),
        A=np.zeros((0, 2)), b=np.zeros(0),
        C=np.array([[1.0, 1.0], [1.0, 2.0]]),
        iclow=np.zeros(2), clow=np.zeros(2),
        icupp=np.array([1.0, 1.0]), cupp=np.array([100.0, 8.0]),
        ixlow=np.ones(2), xlow=np.zeros(2),
        ixupp=np.ones(2), xupp=np.array([10.0, 10.0]),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)),
    )
    blocks = [dict(
        c=np.array([0.0]), A=np.zeros((1, 2)), B=np.array([[1.0]]),
        b=np.array([1.0]), C=np.zeros((0, 2)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([2.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]
    lp = make_arrowhead_lp(blocks, first)
    pd = PresolveData.from_lp(lp)
    from pips_ipmpp_tpu.presolve.passes import redundant_rows
    k = redundant_rows(pd)
    assert k == 1
    assert not pd.rowI_active0[0]      # the <=100 row
    assert pd.rowI_active0[1]          # the binding <=8 row stays

    base = PIPSIPMppTPUInterface(lp, Options())
    base.run()
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - base.getObjective()) < 1e-6
    sol = iface._postsolve()
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-6, f"{name}={v}"


def test_bounded_singleton_column_implied_free():
    """Bounded column singleton whose bounds are implied by its defining
    row (StochPresolverSingletonColumns.C implied-free case): x2 in
    [-10,10] but row x1 + 2 x2 = 4 with x1 in [0,10] implies
    x2 in [-3,2] -> substituted like a free singleton."""
    first = dict(
        c=np.array([1.0, 3.0]),
        A=np.array([[1.0, 2.0]]), b=np.array([4.0]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0, 1.0]), xlow=np.array([0.0, -10.0]),
        ixupp=np.array([1.0, 1.0]), xupp=np.array([10.0, 10.0]),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)),
    )
    blocks = [dict(
        c=np.array([0.0]), A=np.zeros((1, 2)), B=np.array([[1.0]]),
        b=np.array([1.0]), C=np.zeros((0, 2)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([2.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]
    lp = make_arrowhead_lp(blocks, first)
    res = Presolver().presolve(lp)
    assert res.stats.get("singleton_columns", 0) == 1

    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - 1.0) < 1e-6
    sol = iface._postsolve()
    assert abs(sol.x0[0] - 10.0) < 1e-6
    assert abs(sol.x0[1] - (-3.0)) < 1e-6
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-6, f"{name}={v}"


def _anchor_block_n0(n0):
    return [dict(
        c=np.array([0.0]), A=np.zeros((1, n0)), B=np.array([[1.0]]),
        b=np.array([1.0]), C=np.zeros((0, n0)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([2.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]


def test_bounded_singleton_column_with_unbounded_mate_keeps_bound():
    """min x s.t. x+y=5, x in [0,1], y >= 0: the implied range of x is
    (-inf, 5], NOT inside [0,1] — x must not be treated implied-free
    (the infinite implied bound used to blow the tolerance to inf and
    drop the binding bound)."""
    first = dict(
        c=np.array([1.0, 0.0]),
        A=np.array([[1.0, 1.0]]), b=np.array([5.0]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.ones(2), xlow=np.array([0.0, 0.0]),
        ixupp=np.array([1.0, 0.0]), xupp=np.array([1.0, 0.0]),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)))
    lp = make_arrowhead_lp(_anchor_block_n0(2), first)
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - 0.0) < 1e-6
    sol = iface._postsolve()
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-6, f"{name}={v}"


def test_singleton_rows_sharing_variable():
    """Two singleton eq rows on the SAME variable: consistent pair must
    solve; contradictory pair must be detected infeasible (the stale-scope
    sweep used to crash or miss the contradiction)."""
    def lp_with(b2):
        first = dict(
            c=np.array([1.0, 1.0]),
            A=np.array([[2.0, 0.0], [3.0, 0.0], [0.0, 1.0]]),
            b=np.array([4.0, b2, 1.0]),
            C=np.zeros((0, 2)),
            iclow=np.zeros(0), clow=np.zeros(0),
            icupp=np.zeros(0), cupp=np.zeros(0),
            ixlow=np.ones(2), xlow=np.array([-10.0, -10.0]),
            ixupp=np.ones(2), xupp=np.array([10.0, 10.0]),
            F0=np.zeros((0, 2)), G0=np.zeros((0, 2)))
        return make_arrowhead_lp(_anchor_block_n0(2), first)

    ok = PIPSIPMppTPUInterface(lp_with(6.0),
                               Options(presolve=PresolverType.PRESOLVE))
    assert ok.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(ok.getObjective() - 3.0) < 1e-6    # x=2, y=1

    bad = PIPSIPMppTPUInterface(lp_with(9.0),
                                Options(presolve=PresolverType.PRESOLVE))
    assert bad.run() == TerminationStatus.INFEASIBLE


def test_crossed_bounds_infeasible():
    """xupp < xlow from user data must be INFEASIBLE, not fixed to the
    (bound-violating) midpoint."""
    first = dict(
        c=np.array([1.0, 1.0]),
        A=np.array([[1.0, 1.0]]), b=np.array([2.0]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.ones(2), xlow=np.array([5.0, 0.0]),
        ixupp=np.ones(2), xupp=np.array([3.0, 10.0]),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)))
    lp = make_arrowhead_lp(_anchor_block_n0(2), first)
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    assert iface.run() == TerminationStatus.INFEASIBLE


def test_tiny_entry_on_unbounded_variable_not_dropped():
    """A 1e-13 coefficient on a FREE variable carries arbitrarily large
    activity: cleanup must keep it (x = 1e8 solves the row), not drop it
    and misdeclare infeasibility."""
    first = dict(
        c=np.array([0.0, 1.0]),
        A=np.array([[1e-13, 0.0], [0.0, 1.0]]), b=np.array([1e-8, 1.0]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.zeros(2), xlow=np.zeros(2),    # x free
        ixupp=np.zeros(2), xupp=np.zeros(2),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)))
    lp = make_arrowhead_lp(_anchor_block_n0(2), first)
    res = Presolver().presolve(lp)
    assert not res.infeasible


def test_large_magnitude_substitution_cancellation_tolerated():
    """Fixing a variable at O(1e9) shifts another row's rhs by O(1e9);
    when that row later empties, the leftover float-cancellation residual
    must not read as infeasibility."""
    b1 = 1e9 + 1e-7      # 2e = 2*(b1/2): rhs crafted so cancellation ~1e-7
    first = dict(
        c=np.array([1.0, 1.0]),
        # row 0: singleton 2x = 1e9 -> x = 5e8
        # row 1: 2x + y = b1 -> y = b1 - 1e9 (tiny); then singleton again
        A=np.array([[2.0, 0.0], [2.0, 1.0]]),
        b=np.array([1e9, b1]),
        C=np.zeros((0, 2)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.zeros(2), xlow=np.zeros(2),
        ixupp=np.zeros(2), xupp=np.zeros(2),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)))
    lp = make_arrowhead_lp(_anchor_block_n0(2), first)
    res = Presolver().presolve(lp)
    assert not res.infeasible


def test_singleton_column_inequality():
    """Inequality-row singleton columns (reference
    StochPresolverSingletonColumns.C:200-290,
    removeFreeColumnSingletonInequalityRow PresolveData.C:2042): a FREE
    zero-cost singleton absorbs its one-sided row and both vanish; a
    bounded singleton whose objective and coefficient signs align is
    fixed at the loosening bound.

    min -x1 + 2 x3  s.t.  x1 + 2 x2 <= 8 (x2 free, c2=0 -> absorbed),
    x1 + x3 <= 12 (x3 in [1,5], c3=2>0, coeff>0 -> fixed at 1),
    x1 in [0,10].  Optimum: x1=10, x3=1, obj=-8; postsolve x2=(8-10)/2=-1.
    (cupp=12 keeps the row non-redundant so ModelCleanup leaves it.)
    """
    first = dict(
        c=np.array([-1.0, 0.0, 2.0]),
        A=np.zeros((0, 3)), b=np.zeros(0),
        C=np.array([[1.0, 2.0, 0.0], [1.0, 0.0, 1.0]]),
        iclow=np.zeros(2), clow=np.zeros(2),
        icupp=np.ones(2), cupp=np.array([8.0, 12.0]),
        ixlow=np.array([1.0, 0.0, 1.0]), xlow=np.array([0.0, 0.0, 1.0]),
        ixupp=np.array([1.0, 0.0, 1.0]), xupp=np.array([10.0, 0.0, 5.0]),
        F0=np.zeros((0, 3)), G0=np.zeros((0, 3)),
    )
    lp = make_arrowhead_lp(_anchor_block(), first)

    pres = Presolver()
    res = pres.presolve(lp)
    assert res.stats.get("singleton_columns", 0) >= 2   # x2 freed + x3 fixed

    base = PIPSIPMppTPUInterface(lp, Options())
    base.run()
    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(base.getObjective() - (-8.0)) < 1e-6
    assert abs(iface.getObjective() - (-8.0)) < 1e-6
    sol = iface._postsolve()
    assert abs(sol.x0[0] - 10.0) < 1e-6
    assert abs(sol.x0[1] - (-1.0)) < 1e-6    # free singleton reconstructed
    assert abs(sol.x0[2] - 1.0) < 1e-6       # fixed at lower bound
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-6, f"{name}={v}"
