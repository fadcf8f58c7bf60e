"""Numerical-troubles machinery (reference InteriorPointMethod.cpp:528-669):
probing-factor damping, small-complementarity-pair correctors, and the
iteration-adaptive outer-BiCGStab tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm import formulation as F
from pips_ipmpp_tpu.ipm.mehrotra import _bicg_tol
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend


def test_adaptive_bicg_tolerance_schedule():
    """Reference set_BiCGStab_tolerance (:655-669): 1e-8 early, 1e-9 mid,
    1e-10 late."""
    opts = Options(dynamic_bicg_tol=True)
    assert float(_bicg_tol(opts, jnp.asarray(0))) == pytest.approx(1e-8)
    assert float(_bicg_tol(opts, jnp.asarray(3))) == pytest.approx(1e-8)
    assert float(_bicg_tol(opts, jnp.asarray(5))) == pytest.approx(1e-9)
    assert float(_bicg_tol(opts, jnp.asarray(20))) == pytest.approx(1e-10)
    off = Options(dynamic_bicg_tol=False)
    assert _bicg_tol(off, jnp.asarray(0)) == pytest.approx(1e-10)
    assert _bicg_tol(opts, None) == pytest.approx(1e-10)


def test_small_pair_projection_lifts_upper_bound():
    """comp_rhs_gondzio with beta_max=inf only pushes pairs BELOW the box
    (the small-corrector projection, compute_gondzio_corrector :446-457
    with rmax = infinity)."""
    lp = random_arrowhead_lp(0, N=4)
    be = ArrowBackend(lp)
    it = F.initial_iterate(be, 10.0)
    zero_d = jax.tree.map(jnp.zeros_like, it)
    sigma_mu = jnp.asarray(1.0)

    normal = F.comp_rhs_gondzio(be, it, zero_d, 0.0, 0.0, sigma_mu,
                                0.1, 10.0)
    small = F.comp_rhs_gondzio(be, it, zero_d, 0.0, 0.0, sigma_mu,
                               0.1, jnp.inf)
    # with rmax=inf no pair generates a positive (push-down) violation
    for leaf in jax.tree.leaves(small):
        assert float(jnp.max(leaf)) <= 1e-12
    # the two projections differ where products exceed the upper bound
    prods = it.v.first * it.gamma.first   # pushed to shift^2 = 100 > 10
    assert float(jnp.max(prods)) > 10.0
    diff = jax.tree.map(lambda a, b: jnp.max(jnp.abs(a - b)), normal, small)
    assert max(float(x) for x in jax.tree.leaves(diff)) > 1.0


def _ill_conditioned_lp(seed=0):
    """Arrowhead LP with badly scaled rows (1e5 spread) — drives small
    steps and stresses the late-IPM factorizations."""
    lp = random_arrowhead_lp(seed, N=8, n=8, mE=4, mI=4, n0=4, m0E=2,
                             m0I=2, mEl=2, mIl=2)
    scale = jnp.asarray(np.geomspace(1.0, 1e5, lp.mE))
    import dataclasses
    kw = {f.name: getattr(lp, f.name) for f in dataclasses.fields(lp)}
    kw["B"] = lp.B * scale[None, :, None]
    kw["A"] = lp.A * scale[None, :, None]
    kw["bN"] = lp.bN * scale[None, :]
    from pips_ipmpp_tpu.core.lp import ArrowheadLP
    return ArrowheadLP(**kw)


def test_probing_caps_residual_and_mu_growth():
    """With probing always on (trigger=2 > any alpha), no accepted step may
    grow mu or the residual norm by more than ~10x (reference
    compute_step_factor_probing :590-627) — and the solve still converges."""
    lp = _ill_conditioned_lp(3)
    opts = Options(probing=True, probing_trigger=2.0, record_history=True)
    r = IPMSolver(ArrowBackend, opts).solve(lp)
    assert r.status == TerminationStatus.SUCCESSFUL_TERMINATION
    mus = [h.mu for h in r.history]
    resids = [h.residual_norm for h in r.history]
    for a, b in zip(mus, mus[1:]):
        assert b <= 10.5 * a + 1e-12
    for a, b in zip(resids, resids[1:]):
        assert b <= 10.5 * a + 1e-9


def test_small_pair_correctors_convergence():
    """Small-pair correctors enabled from iteration 0 with a high alpha
    threshold (so they trigger whenever a corrector is rejected): solver
    matches the plain-corrector objective."""
    lp = _ill_conditioned_lp(5)
    base = IPMSolver(ArrowBackend, Options(
        small_pair_correctors=False)).solve(lp)
    aggressive = IPMSolver(ArrowBackend, Options(
        small_pair_correctors=True, first_iter_small_correctors=0,
        max_alpha_small_correctors=0.999,
        max_additional_correctors=2)).solve(lp)
    assert base.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert aggressive.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(base.objective - aggressive.objective) < 1e-6 * max(
        1.0, abs(base.objective))


def test_probing_off_unchanged_objective():
    lp = random_arrowhead_lp(1, N=4)
    on = IPMSolver(ArrowBackend, Options(probing=True)).solve(lp)
    off = IPMSolver(ArrowBackend, Options(probing=False)).solve(lp)
    assert on.status == off.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(on.objective - off.objective) < 1e-8 * max(
        1.0, abs(on.objective))
