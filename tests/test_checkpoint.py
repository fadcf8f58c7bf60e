"""Checkpoint/resume tests: interrupted solves resume exactly and reach
the same solution (a capability the reference lacks — SURVEY.md §5)."""
import jax
import numpy as np

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm.checkpoint import load_checkpoint, save_checkpoint
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend, random_dense_lp

from tests.fixtures import random_arrowhead_lp


def test_checkpoint_roundtrip_arrow(tmp_path):
    lp = random_arrowhead_lp(0, N=3)
    solver = IPMSolver(ArrowBackend, Options(max_iterations=5))
    res = solver.solve(lp)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, res.iterate, 5, 1e-9, 1e-9, extra={"note": "t"})
    it2, k, dp, dd, extra = load_checkpoint(p)
    assert k == 5 and dp == 1e-9 and extra["note"] == "t"
    for a, b in zip(jax.tree.leaves(res.iterate), jax.tree.leaves(it2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_reaches_same_solution(tmp_path):
    lp = random_arrowhead_lp(1, N=4)
    full = IPMSolver(ArrowBackend, Options()).solve(lp)
    assert full.status == TerminationStatus.SUCCESSFUL_TERMINATION

    p = str(tmp_path / "ck.npz")
    # run only 6 iterations, checkpointing every 2
    partial_solver = IPMSolver(ArrowBackend, Options(max_iterations=6))
    partial_solver.solve(lp, checkpoint_path=p, checkpoint_every=2)

    resumed = IPMSolver(ArrowBackend, Options()).solve(
        lp, checkpoint_path=p, resume=True)
    assert resumed.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(resumed.objective - full.objective) < 1e-6
    # resumed run starts at iteration 6, so total count is comparable
    assert resumed.iterations >= 6


def test_checkpoint_dense(tmp_path):
    lp = random_dense_lp(jax.random.PRNGKey(2), n=15, mE=5, mI=8)
    solver = IPMSolver(DenseBackend, Options(max_iterations=4))
    res = solver.solve(lp)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, res.iterate, 4, 1e-10, 1e-10)
    it2, k, _, _, _ = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(res.iterate.x),
                                  np.asarray(it2.x))


def test_monitor():
    from pips_ipmpp_tpu.utils.monitor import ResourceMonitor, Statistics
    mon = ResourceMonitor()
    with mon.phase("factorize"):
        pass
    with mon.phase("factorize"):
        pass
    with mon.phase("solve"):
        pass
    rep = mon.report()
    assert rep["factorize"]["count"] == 2
    assert rep["solve"]["count"] == 1
    assert "factorize" in mon.pretty()

    st = Statistics()
    st.record(0, 1.0, 1e-2, 1e-3, 1e-2, 0.9, 0.8, 1)
    st.record(1, 0.9, 1e-4, 1e-5, 1e-4, 0.99, 0.95, 0)
    s = st.summary()
    assert s["iterations"] == 2 and s["final_mu"] == 1e-4
