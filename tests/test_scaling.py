"""Scaler tests: solution invariance under scaling (solve scaled, unscale,
compare), range improvement on badly-scaled data, power-of-two exactness."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.core.options import Options, ScalerType
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend, random_dense_lp
from pips_ipmpp_tpu.scale import make_scaler

from tests.fixtures import random_arrowhead_lp

SCALERS = [ScalerType.EQUILIBRIUM, ScalerType.GEOMETRIC_MEAN,
           ScalerType.GEOMETRIC_MEAN_EQUILIBRIUM, ScalerType.CURTIS_REID]


def badly_scale_dense(lp, seed=0):
    """Multiply rows/cols by wild powers of ten."""
    rng = np.random.default_rng(seed)
    rE = 10.0 ** rng.integers(-4, 5, lp.mE)
    rC = 10.0 ** rng.integers(-4, 5, lp.mI)
    # col scaling changes the problem; only row-scale (keeps solution x)
    return dataclasses.replace(
        lp,
        A=lp.A * rE[:, None], b=lp.b * rE,
        C=lp.C * rC[:, None],
        clow=lp.clow * rC, cupp=lp.cupp * rC)


@pytest.mark.parametrize("kind", SCALERS)
def test_dense_scaling_preserves_solution(kind):
    lp = badly_scale_dense(random_dense_lp(jax.random.PRNGKey(0),
                                           n=25, mE=8, mI=12))
    base = IPMSolver(DenseBackend, Options()).solve(lp)
    assert base.status == TerminationStatus.SUCCESSFUL_TERMINATION

    scaler = make_scaler(kind)
    slp = scaler.scale(lp)
    res = IPMSolver(DenseBackend, Options()).solve(slp)
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION
    x = scaler.unscale_x(res.iterate.x)
    obj = float(jnp.vdot(lp.c, x))
    assert abs(obj - base.objective) < 1e-5 * max(1.0, abs(base.objective))
    # dual feasibility of unscaled duals: c - A'y - C'z - gamma + phi ~ 0
    y = scaler.unscale_y(res.iterate.y)
    z = scaler.unscale_z(res.iterate.z)
    gam = scaler.unscale_bound_dual(res.iterate.gamma)
    phi = scaler.unscale_bound_dual(res.iterate.phi)
    rL = lp.c - lp.A.T @ y - lp.C.T @ z - gam + phi
    assert float(jnp.max(jnp.abs(rL))) < 1e-5


@pytest.mark.parametrize("kind", SCALERS)
def test_arrow_scaling_preserves_solution(kind):
    lp = random_arrowhead_lp(3, N=4, n=6, mE=3, mI=4, n0=3, m0E=2, m0I=2,
                             mEl=2, mIl=2)
    base = IPMSolver(ArrowBackend, Options()).solve(lp)

    scaler = make_scaler(kind)
    slp = scaler.scale(lp)
    res = IPMSolver(ArrowBackend, Options()).solve(slp)
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION
    x = scaler.unscale_x(res.iterate.x)
    obj = float(jnp.vdot(lp.c0, x.first) + jnp.vdot(lp.cN, x.blocks))
    assert abs(obj - base.objective) < 1e-5 * max(1.0, abs(base.objective))


def test_factors_are_powers_of_two():
    lp = badly_scale_dense(random_dense_lp(jax.random.PRNGKey(1),
                                           n=20, mE=6, mI=8))
    for kind in SCALERS:
        sc = make_scaler(kind)
        sc.scale(lp)
        for fac in (sc.s, sc.rE, sc.rC):
            for leaf in jax.tree.leaves(fac):
                l2 = np.log2(np.asarray(leaf))
                np.testing.assert_allclose(l2, np.round(l2), atol=0,
                                           err_msg=str(kind))


def test_geometric_improves_range():
    lp = badly_scale_dense(random_dense_lp(jax.random.PRNGKey(2),
                                           n=25, mE=8, mI=12))
    def spread(m):
        a = np.abs(np.asarray(m))
        nz = a[a > 0]
        return nz.max() / nz.min()

    sc = make_scaler(ScalerType.GEOMETRIC_MEAN)
    slp = sc.scale(lp)
    assert spread(slp.A) < spread(lp.A) / 100.0


def test_interface_with_scaler():
    lp = badly_scale_dense(random_dense_lp(jax.random.PRNGKey(4),
                                           n=20, mE=6, mI=8))
    base = PIPSIPMppTPUInterface(lp, Options())
    base.run()
    iface = PIPSIPMppTPUInterface(
        lp, Options(scaler=ScalerType.GEOMETRIC_MEAN))
    st = iface.run()
    assert st == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - base.getObjective()) < 1e-5 * max(
        1.0, abs(base.getObjective()))


def test_min_floor_spans_matrix_parts():
    """An incidentally tiny border coefficient must not drive a row's
    geometric factor: the min-statistic floor derives from the FULL row
    max across matrix parts (border + diagonal), not per part."""
    lp = random_arrowhead_lp(0, N=2, n=6, mE=3, mI=3)
    import dataclasses
    A = np.asarray(lp.A).copy()
    A[0, 0, 0] = 1e-9            # tiny border entry in a ~1-magnitude row
    lp2 = dataclasses.replace(lp, A=jnp.asarray(A))
    g = make_scaler(ScalerType.GEOMETRIC_MEAN)
    s1 = g.scale(lp)
    s2 = g.scale(lp2)
    # the tiny entry is below the full-row floor -> same row factor
    r1 = np.asarray(g.rE.blocks) if hasattr(g, "rE") else None
    b1 = np.asarray(s1.bN)
    b2 = np.asarray(s2.bN)
    np.testing.assert_allclose(b2[0, 0], b1[0, 0], rtol=1e-12)


def test_make_arrowhead_lp_validation():
    """Intake validation: mismatched linking dims and both-sides-free
    inequality rows fail fast with a clear message."""
    import pytest
    from pips_ipmpp_tpu.core.lp import make_arrowhead_lp
    blk = dict(c=np.zeros(2), A=np.zeros((1, 2)), B=np.eye(1, 2),
               b=np.zeros(1), C=np.zeros((1, 2)), D=np.ones((1, 2)),
               iclow=np.ones(1), clow=np.zeros(1),
               icupp=np.zeros(1), cupp=np.zeros(1),
               ixlow=np.ones(2), xlow=np.zeros(2),
               ixupp=np.zeros(2), xupp=np.zeros(2),
               F=np.zeros((0, 2)), G=np.zeros((0, 2)))
    first = dict(c=np.zeros(2), A=np.zeros((1, 2)), b=np.zeros(1),
                 C=np.zeros((0, 2)), iclow=np.zeros(0), clow=np.zeros(0),
                 icupp=np.zeros(0), cupp=np.zeros(0),
                 ixlow=np.ones(2), xlow=np.zeros(2),
                 ixupp=np.zeros(2), xupp=np.zeros(2),
                 F0=np.zeros((0, 2)), G0=np.zeros((0, 2)))
    make_arrowhead_lp([blk], first)   # valid

    with pytest.raises(ValueError, match="linking_eq"):
        make_arrowhead_lp([blk], first, linking_eq={"b": np.ones(3)})

    bad = dict(blk)
    bad["iclow"] = np.zeros(1)        # row with NO side
    with pytest.raises(ValueError, match="neither"):
        make_arrowhead_lp([bad], first)


def test_curtis_reid_stays_bounded_on_singular_system():
    """Fuzz-found: CG on the (semi-definite) Curtis-Reid normal equations
    can drift along the null space, producing 2^±700 factors that made a
    feasible LP read INFEASIBLE.  Factors must stay clamped and the solve
    must succeed."""
    from pips_ipmpp_tpu.core.options import Options
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
    lp = random_arrowhead_lp(575371960, N=4, n=10, mE=4, mI=2, n0=3,
                             m0E=2, m0I=2, mEl=1, mIl=1)
    sc = make_scaler(ScalerType.CURTIS_REID)
    sc.scale(lp)
    for vec in (sc.s, sc.rE, sc.rC):
        for leaf in jax.tree.leaves(vec):
            a = np.asarray(leaf)
            if a.size:
                assert a.max() <= 2.0 ** 31 and a.min() >= 2.0 ** -31
                # exact powers of two (ldexp, not exp2)
                assert np.all(a == np.exp2(np.round(np.log2(a))))
    iface = PIPSIPMppTPUInterface(lp, Options(scaler=ScalerType.CURTIS_REID))
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION


def test_bucketed_scaling_all_modes():
    """Scaling composes with bucketed heterogeneous blocks (round-3
    verdict #4: previously warned and solved UNSCALED).  Every scaler mode
    must produce the same optimal objective as the unscaled bucketed solve
    and the flat (uniform-padded) scaled solve."""
    import numpy as np
    import pytest
    from pips_ipmpp_tpu.core.options import (Options, PresolverType,
                                             ScalerType)
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
    from tests.test_bucketed import SIZES, _problem
    from pips_ipmpp_tpu.core.bucketed import make_bucketed_arrowhead_lp
    from pips_ipmpp_tpu.core.lp import make_arrowhead_lp

    rng = np.random.default_rng(11)
    blocks, first, le, li = _problem(rng, SIZES)
    # spread magnitudes so scaling actually has something to do
    for b in blocks:
        b["B"] = b["B"] * 64.0
        b["b"] = b["b"] * 64.0
    blp = make_bucketed_arrowhead_lp(blocks, first, le, li, quantum=16)
    lp_flat = make_arrowhead_lp(blocks, first, le, li)

    base = PIPSIPMppTPUInterface(blp, Options(max_iterations=80))
    assert base.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    ref = base.getObjective()
    flat = PIPSIPMppTPUInterface(lp_flat, Options(
        max_iterations=80, scaler=ScalerType.GEOMETRIC_MEAN_EQUILIBRIUM))
    assert flat.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert flat.getObjective() == pytest.approx(ref, abs=1e-5, rel=1e-6)

    for mode in (ScalerType.EQUILIBRIUM, ScalerType.GEOMETRIC_MEAN,
                 ScalerType.GEOMETRIC_MEAN_EQUILIBRIUM,
                 ScalerType.CURTIS_REID):
        iface = PIPSIPMppTPUInterface(blp, Options(max_iterations=80,
                                                   scaler=mode))
        st = iface.run()
        assert st == TerminationStatus.SUCCESSFUL_TERMINATION, (mode, st)
        assert iface.getObjective() == pytest.approx(
            ref, abs=1e-5, rel=1e-6), mode
        # gathers keep working on the scaled bucketed path
        x = iface.gatherPrimalSolution()
        assert np.max(np.abs(iface.gatherPrimalResidsEQ())) < 1e-5
        assert iface.gatherDualSolutionEq().size
        assert iface.gatherSlacksVarsLow().shape == x.shape


def test_sparse_ell_scaling():
    """Scaling composes with the ELL sparse path (the facade previously
    would have crashed building the view): equilibrium + geometric match
    the unscaled objective; Curtis-Reid raises a clear error."""
    import pytest
    from functools import partial
    from pips_ipmpp_tpu.core.options import Options, ScalerType
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
    from pips_ipmpp_tpu.io.synthetic import random_sparse_arrowhead_lp
    from pips_ipmpp_tpu.scale import make_scaler

    slp = random_sparse_arrowhead_lp(2, N=4, n=192, mE=96, mI=96,
                                    nnz_per_row=6, n0=8, m0E=3, m0I=3,
                                    mEl=3, mIl=3)
    # keep the ELL path under test: opt out of the default densify budget
    base = PIPSIPMppTPUInterface(slp, Options(sparse_densify_max_mb=0))
    assert base.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    ref = float(base.result.objective)

    for mode in (ScalerType.EQUILIBRIUM, ScalerType.GEOMETRIC_MEAN,
                 ScalerType.GEOMETRIC_MEAN_EQUILIBRIUM):
        iface = PIPSIPMppTPUInterface(
            slp, Options(scaler=mode, sparse_densify_max_mb=0))
        st = iface.run()
        assert st == TerminationStatus.SUCCESSFUL_TERMINATION, (mode, st)
        assert abs(float(iface.result.objective) - ref) < 1e-4, mode

    with pytest.raises(NotImplementedError):
        make_scaler(ScalerType.CURTIS_REID).scale(slp)
