"""SCsparsifier + preconditioned iterative root (reference SCsparsifier.h
:18-58, precondSC / sLinsysRootAug.C:930):
1. the dominance drop rule matches a numpy oracle,
2. the block-Jacobi preconditioner applies the exact panel inverse,
3. the threshold ladder moves like the reference's,
4. end-to-end: a linking-dominated LP solved with the iterative root
   matches the direct-root objective,
5. the IPM numerical-troubles hook relaxes the sparsifier.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.linalg.sc_precond import (DIAG_DOM_BOUNDS, SCsparsifier,
                                              block_jacobi_apply,
                                              block_jacobi_factors,
                                              sparsified_panels)

from tests.fixtures import random_arrowhead_lp


def _random_spd(rng, n, decay=0.05):
    """Diag-dominant SPD with a spread of off-diagonal magnitudes."""
    A = rng.normal(size=(n, n)) * decay
    A = A @ A.T
    A += np.diag(np.abs(rng.normal(size=n)) + n * decay ** 2 + 1.0)
    return A


def test_drop_rule_matches_oracle():
    rng = np.random.default_rng(0)
    n, pb = 24, 8
    S = _random_spd(rng, n)
    t = 0.01
    panels, dropped = sparsified_panels(jnp.asarray(S), pb, t)
    panels = np.asarray(panels)
    for k in range(n // pb):
        blk = S[k * pb:(k + 1) * pb, k * pb:(k + 1) * pb]
        d = np.abs(np.diag(blk))
        keep = (np.abs(blk) >= t * d[:, None]) | (np.abs(blk) >= t * d[None, :])
        np.fill_diagonal(keep, True)
        np.testing.assert_allclose(panels[k], np.where(keep, blk, 0.0),
                                   atol=0.0)
    assert 0.0 <= float(dropped) <= 1.0


def test_padding_tail_is_identity():
    rng = np.random.default_rng(1)
    S = jnp.asarray(_random_spd(rng, 10))
    panels, _ = sparsified_panels(S, 8, 1e-3)
    assert panels.shape == (2, 8, 8)
    # tail beyond nD is the identity: its Cholesky is well-defined
    Pchol, _ = block_jacobi_factors(S, 8, 1e-3)
    assert bool(jnp.all(jnp.isfinite(Pchol)))


def test_block_jacobi_apply_oracle():
    rng = np.random.default_rng(2)
    n, pb = 20, 8
    S = _random_spd(rng, n)
    r = rng.normal(size=n)
    # bound 0 keeps every entry -> the preconditioner is the exact
    # block-diagonal solve
    Pchol, _ = block_jacobi_factors(jnp.asarray(S), pb, 0.0)
    u = np.asarray(block_jacobi_apply(Pchol, jnp.asarray(r)))
    expect = np.zeros(n)
    for k in range((n + pb - 1) // pb):
        lo, hi = k * pb, min((k + 1) * pb, n)
        expect[lo:hi] = np.linalg.solve(S[lo:hi, lo:hi], r[lo:hi])
    np.testing.assert_allclose(u, expect, rtol=1e-10, atol=1e-12)


def test_ladder_semantics():
    sp = SCsparsifier()
    assert sp.diag_dom_bound == DIAG_DOM_BOUNDS[0]
    assert not sp.increase_diag_dom_bound()        # already most aggressive
    assert sp.decrease_diag_dom_bound()
    assert sp.diag_dom_bound == DIAG_DOM_BOUNDS[1]
    for _ in range(10):
        sp.decrease_diag_dom_bound()
    assert sp.diag_dom_bound == DIAG_DOM_BOUNDS[-1]
    assert not sp.decrease_diag_dom_bound()        # bottom of the ladder
    assert sp.increase_diag_dom_bound()
    assert sp.diag_dom_bound == DIAG_DOM_BOUNDS[-2]


@pytest.mark.parametrize("panel", [16, 64])
def test_iterative_root_matches_direct(panel):
    # linking-dominated: nD = m0E+m0I+mEl+mIl = 76 >> n0
    lp = random_arrowhead_lp(3, N=6, n=10, mE=4, mI=4, n0=6, m0E=3, m0I=3,
                             mEl=35, mIl=35)
    opts = Options(refinement_steps=2)
    direct = IPMSolver(partial(ArrowBackend), opts).solve(lp)
    assert direct.status == TerminationStatus.SUCCESSFUL_TERMINATION
    it = IPMSolver(partial(ArrowBackend, iterative_root=panel,
                           it_root_tol=1e-12, it_root_maxiter=300),
                   opts).solve(lp)
    assert it.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert it.objective == pytest.approx(direct.objective, rel=1e-6, abs=1e-6)
    # iteration count must not blow up vs the direct root
    assert it.iterations <= direct.iterations + 5


def test_iterative_root_fused_device_loop():
    lp = random_arrowhead_lp(4, N=4, n=8, mE=3, mI=3, n0=4, m0E=2, m0I=2,
                             mEl=12, mIl=12)
    opts = Options(refinement_steps=2, max_gondzio_correctors=1)
    s = IPMSolver(partial(ArrowBackend, iterative_root=16,
                          it_root_tol=1e-12), opts)
    res = s.solve_fused(lp)
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION
    direct = IPMSolver(partial(ArrowBackend), opts).solve(lp)
    assert res.objective == pytest.approx(direct.objective, rel=1e-6,
                                          abs=1e-6)


def test_troubles_hook_relaxes_sparsifier():
    """The hook contract: on an exhausted regularization ladder the solver
    consults the hook once, re-jits with the returned ctor, and continues
    (reference InteriorPointMethod.cpp:629-637 relaxing SCsparsifier)."""
    lp = random_arrowhead_lp(5, N=4, n=8, mE=3, mI=3, n0=4, m0E=2, m0I=2,
                             mEl=8, mIl=8)
    sp = SCsparsifier()
    calls = []

    def hook():
        if not sp.decrease_diag_dom_bound():
            return None
        calls.append(sp.diag_dom_bound)
        return partial(ArrowBackend, iterative_root=16,
                       sc_diag_dom_bound=sp.diag_dom_bound)

    opts = Options(refinement_steps=2, max_regularization_retries=0)
    s = IPMSolver(partial(ArrowBackend, iterative_root=16,
                          sc_diag_dom_bound=sp.diag_dom_bound),
                  opts, troubles_hook=hook)
    res = s.solve(lp)
    # healthy LP: the hook is never needed, but the solve must succeed with
    # the hook installed
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION

    # now force a failure: a hook that fixes a broken backend proves the
    # re-jit path works end to end
    class Broken(ArrowBackend):
        def factorization_ok(self, fac):
            return jnp.asarray(False)

    fixed = []

    def fixing_hook():
        fixed.append(True)
        return partial(ArrowBackend, iterative_root=16)

    s2 = IPMSolver(partial(Broken, iterative_root=16), opts,
                   troubles_hook=fixing_hook)
    res2 = s2.solve(lp)
    assert fixed, "hook was not consulted on factorization failure"
    assert res2.status == TerminationStatus.SUCCESSFUL_TERMINATION
