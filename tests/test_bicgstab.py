"""Outer BiCGStab (OUTER_SOLVE=2 analog): solve accuracy vs the Newton
oracle and end-to-end IPM equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm import formulation as F
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend

from tests.fixtures import random_arrowhead_lp
from tests.helpers import interior_iterate, max_newton_error, newton_residuals


@pytest.mark.parametrize("seed", [0, 1])
def test_bicgstab_solve_matches_oracle(seed):
    lp = random_arrowhead_lp(seed, N=3, n=5, mE=2, mI=3, n0=2, m0E=1,
                             m0I=2, mEl=2, mIl=1)
    be = ArrowBackend(lp)
    it = interior_iterate(be, jax.random.PRNGKey(seed + 3))
    res = F.compute_residuals(be, it)
    Dx, Ominv = F.kkt_diagonals(be, it)
    fac = be.factorize(Dx, Ominv, 0.0, 0.0)
    comp = F.comp_rhs_affine(be, it)
    rhs = F.assemble_reduced_rhs(be, it, res, comp, Ominv)

    dx, dy, dz, stats = be.solve_reduced_bicgstab(fac, rhs, max_iters=10,
                                                  tol=1e-12)
    d = F.recover_step(be, it, res, comp, Ominv, rhs, dx, dy, dz)
    errs = max_newton_error(newton_residuals(be, it, d, res, comp))
    for name, err in errs.items():
        assert err < 1e-8, f"{name}: {err} (stats={stats})"
    assert bool(stats["converged"])
    # with an exact preconditioner the initial direct solve already
    # converges -> 0 or very few BiCGStab iterations
    assert int(stats["iterations"]) <= 2


def test_bicgstab_fixes_inexact_preconditioner():
    """Make the preconditioner deliberately wrong (factorize with huge
    regularization) — BiCGStab must still converge to the true solution of
    the regularized-with-huge-deltas system... instead we check it reduces
    the residual of the system it is given."""
    lp = random_arrowhead_lp(5, N=3)
    be = ArrowBackend(lp)
    it = interior_iterate(be, jax.random.PRNGKey(9))
    res = F.compute_residuals(be, it)
    Dx, Ominv = F.kkt_diagonals(be, it)
    fac = be.factorize(Dx, Ominv, 0.0, 0.0)
    # f32 factors -> direct solve is inexact in f64 terms
    be32 = ArrowBackend(lp, factor_dtype=jnp.float32)
    fac32 = be32.factorize(Dx, Ominv, 0.0, 0.0)
    comp = F.comp_rhs_affine(be, it)
    rhs = F.assemble_reduced_rhs(be, it, res, comp, Ominv)
    dx, dy, dz, stats = be32.solve_reduced_bicgstab(
        fac32, rhs, max_iters=20, tol=1e-11)
    d = F.recover_step(be, it, res, comp, Ominv, rhs, dx, dy, dz)
    errs = max_newton_error(newton_residuals(be, it, d, res, comp))
    assert max(errs.values()) < 1e-7, (errs, stats)
    assert int(stats["iterations"]) >= 1   # had to actually iterate


@pytest.mark.parametrize("seed", [0, 1])
def test_ipm_with_outer_bicgstab(seed):
    lp = random_arrowhead_lp(seed, N=4)
    ref = IPMSolver(ArrowBackend, Options()).solve(lp)
    bic = IPMSolver(ArrowBackend, Options(outer_bicgstab=True)).solve(lp)
    assert bic.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(bic.objective - ref.objective) < 1e-6


def test_preconditioned_cg():
    """Standalone PCG on an SPD system (array pytree contract)."""
    from pips_ipmpp_tpu.linalg.arrow_backend import preconditioned_cg
    rng = np.random.default_rng(0)
    A_ = rng.normal(size=(40, 40))
    K = jnp.asarray(A_ @ A_.T + 40 * np.eye(40))
    b = jnp.asarray(rng.normal(size=40))
    diag_inv = 1.0 / jnp.diag(K)
    u, stats = preconditioned_cg(
        b, lambda v: diag_inv * v, lambda v: K @ v,
        lambda a, c: jnp.vdot(a, c), max_iters=200, tol=1e-12)
    assert bool(stats["converged"]), stats
    np.testing.assert_allclose(np.asarray(K @ u), np.asarray(b), atol=1e-8)
