"""Fused on-device solve loop must match the host-driven loop."""
import jax
import pytest

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend, random_dense_lp

from tests.fixtures import random_arrowhead_lp, two_scenario_linking_lp


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_host_loop_arrow(seed):
    lp = random_arrowhead_lp(seed, N=4)
    solver = IPMSolver(ArrowBackend, Options())
    host = solver.solve(lp)
    fused = solver.solve_fused(lp)
    assert fused.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(fused.objective - host.objective) < 1e-8
    # both loops count completed IPM STEPS (retry/terminal turns do not
    # count) — must agree exactly
    assert fused.iterations == host.iterations
    assert len(fused.history) == fused.iterations
    assert fused.history[0].mu > fused.history[-1].mu


def test_fused_dense():
    lp = random_dense_lp(jax.random.PRNGKey(3), n=25, mE=8, mI=12)
    solver = IPMSolver(DenseBackend, Options())
    host = solver.solve(lp)
    fused = solver.solve_fused(lp)
    assert fused.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(fused.objective - host.objective) < 1e-8


def test_fused_two_scenario():
    lp, opt = two_scenario_linking_lp()
    fused = IPMSolver(ArrowBackend, Options()).solve_fused(lp)
    assert fused.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(fused.objective - opt) < 1e-6


def test_fused_max_iterations():
    lp = random_arrowhead_lp(2, N=3)
    fused = IPMSolver(ArrowBackend, Options(max_iterations=2)).solve_fused(lp)
    assert fused.status == TerminationStatus.MAX_ITS_EXCEEDED
    assert fused.iterations == 2
