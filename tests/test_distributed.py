"""Distributed solves on the 8-virtual-device CPU mesh: GSPMD and shard_map
modes must both match the single-device arrowhead solve — the simulated
multi-host capability the reference only has under real MPI (SURVEY.md §4)."""
import jax
import numpy as np
import pytest

from pips_ipmpp_tpu.core.lp import pad_num_blocks
from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.parallel.dist_solver import DistributedIPMSolver
from pips_ipmpp_tpu.parallel.mesh import make_mesh, shard_arrowhead_lp

from tests.fixtures import random_arrowhead_lp


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.fixture(scope="module")
def lp16():
    return random_arrowhead_lp(11, N=16, n=6, mE=3, mI=4, n0=3, m0E=2,
                               m0I=2, mEl=2, mIl=2)


@pytest.fixture(scope="module")
def ref_result(lp16):
    return IPMSolver(ArrowBackend, Options()).solve(lp16)


@pytest.mark.parametrize("mode", ["gspmd", "shard_map"])
def test_distributed_matches_single_device(mesh8, lp16, ref_result, mode):
    result = DistributedIPMSolver(mesh8, Options(), mode=mode).solve(lp16)
    assert result.status == TerminationStatus.SUCCESSFUL_TERMINATION, \
        f"{mode}: mu={result.mu} resid={result.residual_norm}"
    assert abs(result.objective - ref_result.objective) < 1e-6 * max(
        1.0, abs(ref_result.objective))
    # same iteration count as single-device (identical math)
    assert abs(result.iterations - ref_result.iterations) <= 2


def test_sharding_is_applied(mesh8, lp16):
    sharded = shard_arrowhead_lp(lp16, mesh8)
    shard_shapes = [s.data.shape for s in sharded.B.addressable_shards]
    assert len(shard_shapes) == 8
    assert all(s == (2, lp16.mE, lp16.n) for s in shard_shapes)
    # replicated first-stage
    assert all(s.data.shape == lp16.A0.shape
               for s in sharded.A0.addressable_shards)


def test_pad_num_blocks_preserves_solution(mesh8):
    """N=5 blocks padded with 3 dummies to fill 8 devices — identical
    optimum (dummy blocks are inert, like the reference's kStochDummy)."""
    lp5 = random_arrowhead_lp(12, N=5, n=5, mE=2, mI=3, n0=2, m0E=1,
                              m0I=1, mEl=1, mIl=1)
    ref = IPMSolver(ArrowBackend, Options()).solve(lp5)
    lp8 = pad_num_blocks(lp5, 8)
    padded_single = IPMSolver(ArrowBackend, Options()).solve(lp8)
    assert abs(padded_single.objective - ref.objective) < 1e-6

    dist = DistributedIPMSolver(mesh8, Options(), mode="shard_map").solve(lp8)
    assert dist.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(dist.objective - ref.objective) < 1e-6
