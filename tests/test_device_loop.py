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


def test_solve_fused_batch_matches_singles():
    """solve_fused_batch_async vmaps B whole solves into one device
    program; per-instance objectives and iteration counts must be
    IDENTICAL to the one-at-a-time fused solves (the throughput lever
    for streams of scenario LPs)."""
    import dataclasses

    import jax

    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp

    lp = random_arrowhead_lp(5, N=4, n=24, mE=10, mI=12, n0=6, m0E=3,
                             m0I=3, mEl=3, mIl=3)
    lps = [dataclasses.replace(lp, c0=lp.c0 * (1 + 1e-4 * i),
                               cN=lp.cN * (1 + 1e-4 * i))
           for i in range(3)]
    sv = IPMSolver(ArrowBackend, Options())
    singles = [sv.solve_fused(l) for l in lps]
    _, info = sv.solve_fused_batch_async(lps)
    objs = jax.device_get(info["objective"])
    sts = jax.device_get(info["status"])
    its = jax.device_get(info["iterations"])
    for i, s in enumerate(singles):
        assert int(sts[i]) == 1
        assert abs(float(objs[i]) - s.objective) < 1e-8
        assert int(its[i]) == s.iterations


def test_fused_linear_residual_updates_match_exact():
    """residual_update_every=k carries residuals between exact
    evaluations (primal rows scale by 1-alpha_p, dual rows by
    1-alpha_d — exact identities of recover_step).  In f64 the carried
    path must reproduce the exact path's solution and iteration count."""
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp

    for seed in (0, 3):
        lp = random_arrowhead_lp(seed, N=4, n=24, mE=10, mI=12, n0=6,
                                 m0E=3, m0I=3, mEl=3, mIl=3)
        exact = IPMSolver(ArrowBackend, Options()).solve_fused(lp)
        carried = IPMSolver(ArrowBackend, Options(
            residual_update_every=4)).solve_fused(lp)
        assert carried.status == TerminationStatus.SUCCESSFUL_TERMINATION
        assert abs(float(carried.objective) - float(exact.objective)) < 1e-7
        assert abs(carried.iterations - exact.iterations) <= 1
