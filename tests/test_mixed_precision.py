"""Mixed precision: f32 factorization + f64 residuals/adaptive refinement
must converge to full f64 tolerances (the production TPU configuration —
SURVEY.md §7 'fp64 vs fp32' risk item)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.interface import resolve_factor_dtype
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend, random_dense_lp

from tests.fixtures import random_arrowhead_lp


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_arrow_f32_factor_converges(seed):
    lp = random_arrowhead_lp(seed, N=4, n=8, mE=4, mI=5, n0=4, m0E=2,
                             m0I=2, mEl=2, mIl=2)
    opts = Options(refinement_steps=6)
    ref = IPMSolver(partial(ArrowBackend, factor_dtype=jnp.float64),
                    opts).solve(lp)
    mixed = IPMSolver(partial(ArrowBackend, factor_dtype=jnp.float32),
                      opts).solve(lp)
    assert ref.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert mixed.status == TerminationStatus.SUCCESSFUL_TERMINATION, \
        f"mixed: mu={mixed.mu} resid={mixed.residual_norm}"
    assert abs(mixed.objective - ref.objective) < 1e-5 * max(
        1.0, abs(ref.objective))
    # mixed precision should not cost many extra IPM iterations
    assert mixed.iterations <= ref.iterations + 5


def test_dense_f32_factor_converges():
    lp = random_dense_lp(jax.random.PRNGKey(5), n=30, mE=10, mI=15)
    opts = Options(refinement_steps=6)
    ref = IPMSolver(partial(DenseBackend, factor_dtype=jnp.float64),
                    opts).solve(lp)
    mixed = IPMSolver(partial(DenseBackend, factor_dtype=jnp.float32),
                      opts).solve(lp)
    assert mixed.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(mixed.objective - ref.objective) < 1e-5


def test_resolve_factor_dtype():
    assert resolve_factor_dtype(Options(factor_dtype="float32")) == jnp.float32
    assert resolve_factor_dtype(Options(factor_dtype="float64")) == jnp.float64
    # auto on CPU tests with x64 -> f64
    assert resolve_factor_dtype(Options()) == jnp.float64
