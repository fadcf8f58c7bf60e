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
