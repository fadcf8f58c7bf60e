"""Regularization strategies (reference FriedlanderOrbanRegularization.cpp,
IpoptRegularization.cpp): schedule semantics against the reference's
constants, and end-to-end solves under each strategy in both the host loop
and the fused device loop."""
import jax.numpy as jnp
import pytest
from functools import partial

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm.regularization import (FriedlanderOrban,
                                               GrowthLadder, Ipopt,
                                               make_regularization)
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend

from tests.fixtures import random_arrowhead_lp


def test_ladder_schedule():
    s = GrowthLadder(1e-10, 1e-10, 100.0)
    st = s.init_state(jnp.float64)
    assert s.deltas(st)[0] == pytest.approx(1e-10)
    st = s.new_step(st)                      # sticky
    assert s.deltas(st)[0] == pytest.approx(1e-10)
    st = s.on_failure(st, 1.0, 0)
    assert s.deltas(st)[0] == pytest.approx(1e-8, rel=1e-3)
    assert not bool(s.give_up(st))


def test_ladder_f32_jump_floor():
    """f32 states jump straight to the f32 jump floor (1e-2) on the
    first failure — growth rungs below it never rescue a failed f32
    factorization and each wasted rung costs a full re-factorization turn.
    f64 states keep the exact gentle ladder (its small rungs do rescue
    f64 failures, e.g. structurally singular golden LPs)."""
    s = GrowthLadder(1e-10, 1e-10, 100.0)
    st32 = s.on_failure(s.init_state(jnp.float32), 1e-3, 0)
    assert s.deltas(st32)[0] == pytest.approx(1e-2, rel=1e-3)
    # a second failure climbs by the normal growth factor
    st32b = s.on_failure(st32, 1e-3, 1)
    assert s.deltas(st32b)[0] == pytest.approx(1.0, rel=1e-3)
    st64 = s.on_failure(s.init_state(jnp.float64), 1e-3, 0)
    assert s.deltas(st64)[0] == pytest.approx(1e-8, rel=1e-3)


def test_friedlander_orban_schedule():
    s = FriedlanderOrban()
    st = s.init_state(jnp.float64)
    st = s.new_step(st)
    # first step lands exactly on the initial value (ctor pre-divide,
    # FriedlanderOrbanRegularization.cpp:21)
    assert s.deltas(st) == (pytest.approx(1.0), pytest.approx(1.0))
    st = s.new_step(st)
    assert s.deltas(st)[0] == pytest.approx(0.1)
    st = s.on_failure(st, 1.0, 0)
    assert s.deltas(st)[0] == pytest.approx(10.0)
    # decay floors at the minimum
    for _ in range(30):
        st = s.new_step(st)
    assert s.deltas(st)[0] == pytest.approx(1e-10)
    assert s.deltas(st)[1] == pytest.approx(1e-10)


def test_ipopt_schedule():
    s = Ipopt()
    st = s.init_state(jnp.float64)
    st = s.new_step(st)
    assert s.deltas(st) == (0.0, 0.0)        # no shift until failure
    mu = 1e-2
    st = s.on_failure(st, mu, 0)
    dp, dd = s.deltas(st)
    assert dp == pytest.approx(1e-4)         # first-ever failure
    assert dd == pytest.approx(mu ** 0.25)
    st = s.on_failure(st, mu, 1)
    assert s.deltas(st)[0] == pytest.approx(1e-2)   # x100, never succeeded
    # a successful step records the shift; the next failure restarts at /3
    st = s.new_step(st)
    assert s.deltas(st) == (0.0, 0.0)
    st = s.on_failure(st, mu, 0)
    assert s.deltas(st)[0] == pytest.approx(1e-2 / 3.0)
    st = s.on_failure(st, mu, 1)
    assert s.deltas(st)[0] == pytest.approx(8e-2 / 3.0)   # x8 after success


def test_make_regularization_dispatch():
    assert isinstance(make_regularization(Options()), GrowthLadder)
    assert isinstance(
        make_regularization(Options(regularization_strategy="ipopt")), Ipopt)
    with pytest.raises(ValueError):
        make_regularization(Options(regularization_strategy="nope"))


@pytest.mark.parametrize("strategy",
                         ["ladder", "friedlander_orban", "ipopt"])
def test_solves_under_each_strategy(strategy):
    lp = random_arrowhead_lp(11, N=4, n=8, mE=3, mI=3, n0=4, m0E=2, m0I=2,
                             mEl=4, mIl=4)
    opts = Options(refinement_steps=2,
                   regularization_strategy=strategy)
    s = IPMSolver(partial(ArrowBackend), opts)
    res = s.solve(lp)
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION, strategy
    fused = s.solve_fused(lp)
    assert fused.status == TerminationStatus.SUCCESSFUL_TERMINATION, strategy
    assert fused.objective == pytest.approx(res.objective, rel=1e-6,
                                            abs=1e-6)
