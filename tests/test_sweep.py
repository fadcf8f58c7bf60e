"""Tests for the blocked symmetric sweep inverse kernel (pallas_sweep.py).

The kernel is EXPERIMENTAL and opt-in only: unpivoted Gauss-Jordan is
unstable on IPM-conditioned matrices (see test_sweep_unstable_on_ipm_
conditioning and test_sweep_kernel_defaults_off, which pin that down).

Runs in Pallas interpret mode on the CPU test mesh; the same code lowers
to Mosaic on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.linalg.pallas_sweep import sweep_inverse


def _spd(rng, B, a, dtype=jnp.float64):
    M = rng.standard_normal((B, a, a))
    A = M @ np.swapaxes(M, 1, 2) / a + 2.0 * np.eye(a)
    return jnp.asarray(A, dtype)


def test_spd_inverse_matches_numpy():
    rng = np.random.default_rng(0)
    A = _spd(rng, 4, 64)
    Ainv, d = sweep_inverse(A, interpret=True)
    I = jnp.eye(64, dtype=A.dtype)
    err = jnp.max(jnp.abs(jnp.einsum("iab,ibc->iac", Ainv, A) - I))
    assert float(err) < 1e-10
    assert bool(jnp.all(d > 0))


def test_quasidefinite_inertia_and_inverse():
    rng = np.random.default_rng(1)
    n, m = 24, 40
    E = np.diag(rng.uniform(0.5, 2.0, n))
    F = np.diag(rng.uniform(0.5, 2.0, m))
    M = rng.standard_normal((m, n))
    K = np.block([[E, M.T], [M, -F]])
    Ki, d = sweep_inverse(jnp.asarray(K)[None], interpret=True)
    err = np.max(np.abs(np.asarray(Ki)[0] @ K - np.eye(n + m)))
    assert err < 1e-9
    d = np.asarray(d)[0]
    # quasidefinite inertia recovered from the 2x2-block pivots
    assert np.all(d[:n] > 0) and np.all(d[n:] < 0)


@pytest.mark.parametrize("a", [5, 16, 37, 48])
def test_padding_sizes(a):
    rng = np.random.default_rng(a)
    A = _spd(rng, 2, a)
    Ainv, d = sweep_inverse(A, interpret=True)
    err = jnp.max(jnp.abs(
        jnp.einsum("iab,ibc->iac", Ainv, A) - jnp.eye(a, dtype=A.dtype)))
    assert float(err) < 1e-9
    assert d.shape == (2, a)


def test_matches_ldl_kernel_inverse():
    from pips_ipmpp_tpu.linalg.pallas_ldl import batched_inverse
    rng = np.random.default_rng(2)
    A = _spd(rng, 3, 48)
    Ai_sweep, _ = sweep_inverse(A, interpret=True)
    Ai_ldl = batched_inverse(A, interpret=True)
    # pallas_ldl pins its matmuls to f32 accumulation, so agreement is
    # f32-grade even on the f64 interpret path
    assert float(jnp.max(jnp.abs(Ai_sweep - Ai_ldl))) < 1e-6


def test_backend_sweep_solves_lp():
    """End-to-end: f32 + sweep kernel converges on a two-scenario LP and
    matches the f64 oracle objective."""
    from functools import partial

    from pips_ipmpp_tpu.core.options import Options
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from tests.fixtures import two_scenario_linking_lp

    lp, obj_star = two_scenario_linking_lp(jnp.float32)
    solver = IPMSolver(partial(ArrowBackend, factor_dtype=jnp.float32,
                               sweep_kernel=True),
                       Options(refinement_steps=2))
    res = solver.solve(lp)
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(float(res.objective) - obj_star) < 1e-3 * (1.0 + abs(obj_star))


def test_sweep_kernel_defaults_off():
    """Regression (round-2 BENCH/MULTICHIP failure): the sweep kernel must
    never be the default factor path — it turned the flagship solve
    INFEASIBLE/NaN because unpivoted Gauss-Jordan collapses on the
    ill-conditioned systems the IPM generates as mu -> 0."""
    from __graft_entry__ import _make_lp
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend

    lp = _make_lp(jnp.float32, N=4, n=8, mE=4, mI=4, n0=4, m0E=2, m0I=2,
                  mEl=2, mIl=2)
    be = ArrowBackend(lp, factor_dtype=jnp.float32)
    assert not be.sweep_kernel


def test_sweep_unstable_on_ipm_conditioning():
    """Documents WHY the sweep kernel is opt-in: at diagonal spread
    1e-6..1e6 (routine for barrier terms late in the IPM) the explicit
    inverse is garbage (O(1) relative error even in f64; in f32 the
    pivots can even stay positive while the error reaches 1e14, so the
    leaf_ok health checks cannot reliably rescue it)."""
    rng = np.random.default_rng(7)
    a = 24
    D = 10.0 ** rng.uniform(-6, 6, size=(2, a))
    Q = np.linalg.qr(rng.standard_normal((2, a, a)))[0]
    A = jnp.asarray(np.einsum("bij,bj,bkj->bik", Q, D, Q), jnp.float64)
    Ainv, _ = sweep_inverse(A, interpret=True)
    ref = np.linalg.inv(np.asarray(A))
    err = np.max(np.abs(np.asarray(Ainv) - ref)) / (1 + np.max(np.abs(ref)))
    assert err > 1e-2  # the inverse is unusable on SPD input
