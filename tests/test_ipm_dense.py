"""End-to-end dense IPM vs scipy.optimize.linprog golden objectives —
the analog of the reference's instance-table regression tests
(Test/IntegrationTests/t_pips.cpp: objective to 1e-4, iterations bounded)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from pips_ipmpp_tpu.core.options import Options, StepMode
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.ipm.solver import IPMSolver
from pips_ipmpp_tpu.linalg.dense_backend import DenseBackend, random_dense_lp


def scipy_solve(lp):
    """Reference objective via scipy HiGHS."""
    n = lp.n
    c = np.asarray(lp.c)
    A = np.asarray(lp.A)
    b = np.asarray(lp.b)
    C = np.asarray(lp.C)
    A_ub, b_ub = [], []
    for i in range(lp.mI):
        if float(lp.icupp[i]):
            A_ub.append(C[i]); b_ub.append(float(lp.cupp[i]))
        if float(lp.iclow[i]):
            A_ub.append(-C[i]); b_ub.append(-float(lp.clow[i]))
    bounds = []
    for j in range(n):
        lo = float(lp.xlow[j]) if float(lp.ixlow[j]) else None
        hi = float(lp.xupp[j]) if float(lp.ixupp[j]) else None
        bounds.append((lo, hi))
    res = linprog(c, A_ub=np.array(A_ub) if A_ub else None,
                  b_ub=np.array(b_ub) if b_ub else None,
                  A_eq=A if lp.mE else None, b_eq=b if lp.mE else None,
                  bounds=bounds, method="highs")
    return res


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("mode", [StepMode.PRIMAL, StepMode.PRIMAL_DUAL])
def test_random_lp_matches_scipy(seed, mode):
    key = jax.random.PRNGKey(seed)
    lp = random_dense_lp(key, n=30, mE=10, mI=15)
    ref = scipy_solve(lp)
    assert ref.status == 0, "fixture must be solvable"

    opts = Options(step_mode=mode)
    solver = IPMSolver(DenseBackend, opts)
    result = solver.solve(lp)

    assert result.status == TerminationStatus.SUCCESSFUL_TERMINATION, \
        f"status={result.status} mu={result.mu} resid={result.residual_norm}"
    assert abs(result.objective - ref.fun) < 1e-4 * max(1.0, abs(ref.fun)), \
        f"objective {result.objective} vs scipy {ref.fun}"
    assert result.iterations <= 60


def test_tiny_hand_lp():
    """min -x1 - 2 x2 s.t. x1 + x2 = 1.5, 0 <= x1 <= 1, 0 <= x2 <= 1.
    Optimum at (0.5, 1): objective -2.5."""
    f = lambda v: jnp.asarray(v, jnp.float64)
    from pips_ipmpp_tpu.core.lp import DenseLP
    lp = DenseLP(
        c=f([-1.0, -2.0]),
        A=f([[1.0, 1.0]]), b=f([1.5]),
        C=f(np.zeros((0, 2))), iclow=f([]), clow=f([]),
        icupp=f([]), cupp=f([]),
        ixlow=f([1, 1]), xlow=f([0, 0]), ixupp=f([1, 1]), xupp=f([1, 1]),
    )
    solver = IPMSolver(DenseBackend, Options())
    result = solver.solve(lp)
    assert result.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(result.objective - (-2.5)) < 1e-6


def test_free_variable_lp():
    """Free variables exercise the delta_p-regularized path.
    min x0 (free) s.t. x0 + x1 = 3, x0 - x1 = 1 -> x0=2, x1=1, obj 2."""
    f = lambda v: jnp.asarray(v, jnp.float64)
    from pips_ipmpp_tpu.core.lp import DenseLP
    lp = DenseLP(
        c=f([1.0, 0.0]),
        A=f([[1.0, 1.0], [1.0, -1.0]]), b=f([3.0, 1.0]),
        C=f(np.zeros((0, 2))), iclow=f([]), clow=f([]),
        icupp=f([]), cupp=f([]),
        ixlow=f([0, 0]), xlow=f([0, 0]), ixupp=f([0, 0]), xupp=f([0, 0]),
    )
    solver = IPMSolver(DenseBackend, Options(primal_regularization=1e-8))
    result = solver.solve(lp)
    assert result.status == TerminationStatus.SUCCESSFUL_TERMINATION
    x = np.asarray(result.iterate.x)
    np.testing.assert_allclose(x, [2.0, 1.0], atol=1e-5)


def test_inequality_only_lp():
    """min -x1-x2 s.t. x1+2x2 <= 4, 4x1+2x2 <= 12, -x1+x2 <= 1, x>=0.
    Optimum (8/3, 2/3), objective -10/3."""
    f = lambda v: jnp.asarray(v, jnp.float64)
    from pips_ipmpp_tpu.core.lp import DenseLP
    lp = DenseLP(
        c=f([-1.0, -1.0]),
        A=f(np.zeros((0, 2))), b=f([]),
        C=f([[1.0, 2.0], [4.0, 2.0], [-1.0, 1.0]]),
        iclow=f([0, 0, 0]), clow=f([0, 0, 0]),
        icupp=f([1, 1, 1]), cupp=f([4.0, 12.0, 1.0]),
        ixlow=f([1, 1]), xlow=f([0, 0]), ixupp=f([0, 0]), xupp=f([0, 0]),
    )
    solver = IPMSolver(DenseBackend, Options())
    result = solver.solve(lp)
    assert result.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(result.objective - (-10.0 / 3.0)) < 1e-6


def test_centering_retry_path():
    """Force the numerical-troubles branch (threshold > 2 triggers it every
    iteration) — the pure-centering retry must still converge."""
    key = jax.random.PRNGKey(6)
    lp = random_dense_lp(key, n=20, mE=6, mI=8)
    ref = IPMSolver(DenseBackend, Options()).solve(lp)
    forced = IPMSolver(DenseBackend, Options(
        small_step_threshold=2.1, max_iterations=200)).solve(lp)
    # every step is damped-centering: progress is slower but must not break
    assert forced.status in (TerminationStatus.SUCCESSFUL_TERMINATION,
                             TerminationStatus.MAX_ITS_EXCEEDED,
                             TerminationStatus.UNKNOWN)
    # with the default threshold the path is rarely taken; same solution
    norm = IPMSolver(DenseBackend, Options()).solve(lp)
    assert abs(norm.objective - ref.objective) < 1e-8
