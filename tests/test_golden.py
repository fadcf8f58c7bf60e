"""Golden instance-table regression tests — the analog of the reference's
gamssmall_instance_data.txt driven ScenarioTests (Test/IntegrationTests/
t_pips.cpp: objective to tolerance AND iteration count <= 1.1x recorded).

Any change that shifts objectives beyond 1e-6 or inflates iteration counts
past the budget fails here — recalibrate the table deliberately, never
casually."""
import jax.numpy as jnp
import pytest

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.io.synthetic import (random_arrowhead_lp,
                                         random_hier_arrowhead_lp)
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend

from tests.fixtures import two_scenario_linking_lp

# (name, recorded objective, recorded iterations) — f64 defaults
GOLDEN = [
    # re-recorded 2026-08-17 after the exact blocking-pair step lengths
    # (reference mehrotra_step_length :746-816) — iteration counts dropped
    ("arrow_s0_N4", -8.064058531303, 9),
    ("arrow_s1_N4", -10.253453643778, 9),
    ("arrow_s3_N8", -31.125663017398, 9),
    ("hier_s0_N8g2", -16.282995798323, 9),
    ("two_scenario", 7.000000015965, 6),
]

OBJ_TOL = 1e-6
ITER_BUDGET = 1.2   # reference uses 1.1x; small instances are jumpier


def _instance(name):
    if name == "arrow_s0_N4":
        return random_arrowhead_lp(0, N=4)
    if name == "arrow_s1_N4":
        return random_arrowhead_lp(1, N=4)
    if name == "arrow_s3_N8":
        return random_arrowhead_lp(3, N=8, n=8, mE=4, mI=4, n0=4, m0E=2,
                                   m0I=2, mEl=3, mIl=3)
    if name == "hier_s0_N8g2":
        return random_hier_arrowhead_lp(0, N=8, n_groups=2)
    if name == "two_scenario":
        return two_scenario_linking_lp()[0]
    raise KeyError(name)


@pytest.mark.parametrize("name,obj,iters", GOLDEN)
def test_golden_instance(name, obj, iters):
    lp = _instance(name)
    r = IPMSolver(ArrowBackend, Options()).solve(lp)
    assert r.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(r.objective - obj) < OBJ_TOL * max(1.0, abs(obj)), \
        f"{name}: objective {r.objective} vs recorded {obj}"
    assert r.iterations <= int(iters * ITER_BUDGET) + 1, \
        f"{name}: iterations {r.iterations} vs recorded {iters}"
