"""Pallas TPU kernel tests (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pips_ipmpp_tpu.linalg.pallas_chol import batched_cholesky


@pytest.mark.parametrize("m", [64, 128, 256])
def test_pallas_cholesky_matches_xla(m):
    rng = np.random.default_rng(m)
    A = rng.normal(size=(3, m, m)).astype(np.float32)
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                    + m * np.eye(m, dtype=np.float32))
    L = batched_cholesky(K, interpret=True)
    Lref = jnp.linalg.cholesky(K)
    rel = float(jnp.max(jnp.abs(L - Lref)) / jnp.max(jnp.abs(Lref)))
    assert rel < 1e-5
    # strictly lower-triangular output
    assert float(jnp.max(jnp.abs(jnp.triu(L[0], k=1)))) == 0.0


def test_backend_with_pallas_chol_interpret(monkeypatch):
    """ArrowBackend(pallas_chol=True) path: swap in the interpreted kernel
    so the CPU suite covers the wiring."""
    import pips_ipmpp_tpu.linalg.pallas_chol as pc
    from functools import partial
    orig = pc.batched_cholesky
    monkeypatch.setattr(pc, "batched_cholesky",
                        partial(orig, interpret=True))
    from pips_ipmpp_tpu.core.options import Options
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.core.options import ScalerType
    from pips_ipmpp_tpu.scale import make_scaler

    # uniform sizes with mE+mI = 64 to satisfy the kernel width constraint
    lp = random_arrowhead_lp(0, N=2, n=48, mE=32, mI=32, n0=4, m0E=2,
                             m0I=2, mEl=2, mIl=2, dtype=jnp.float32)
    # ldl_kernel=False: the fused LDL kernel otherwise takes priority over
    # the pallas_chol branch on the f32 path (arrow_backend.py:327)
    solver = IPMSolver(partial(ArrowBackend, factor_dtype=jnp.float32,
                               pallas_chol=True, ldl_kernel=False),
                       Options())
    # reference objective from the robust f64 solve of the same LP
    ref = IPMSolver(ArrowBackend, Options()).solve(lp.astype(jnp.float64))
    # f32 factorization needs equilibrated data (this LP's raw mu0 ~ 1e6)
    res = solver.solve(make_scaler(ScalerType.EQUILIBRIUM).scale(lp))
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(res.objective - ref.objective) < 1e-3


def test_factored_inverse_mode_matches_explicit():
    """factored_inverse keeps (X, 1/d) and applies Neq^{-1} as two batched
    matmuls; must produce the same solve as the materialized Ninv path
    (CPU: kernel runs interpreted)."""
    from functools import partial
    from pips_ipmpp_tpu.core.options import Options, ScalerType
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.scale import make_scaler

    lp = random_arrowhead_lp(0, N=2, n=48, mE=32, mI=32, n0=4, m0E=2,
                             m0I=2, mEl=2, mIl=2, dtype=jnp.float32)
    lp = make_scaler(ScalerType.EQUILIBRIUM).scale(lp)
    r_exp = IPMSolver(partial(ArrowBackend, factor_dtype=jnp.float32,
                              ldl_kernel=True)).solve(lp)
    r_fac = IPMSolver(partial(ArrowBackend, factor_dtype=jnp.float32,
                              ldl_kernel=True,
                              factored_inverse=True)).solve(lp)
    assert r_exp.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert r_fac.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(r_fac.objective - r_exp.objective) < 1e-4
