"""Headline benchmark: full IPM solve to optimality on a
production-shaped arrowhead LP (one chip), fused on-device loop.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is IPM iterations/second of a CONVERGED solve — each iteration =
batched factorization of all block KKTs (condensed Cholesky at true-f32
matmul precision) + Schur assembly + root factorization + predictor,
corrector and Gondzio solves + adaptive refinement — with the entire outer
loop on device (lax.while_loop). The reference publishes no absolute
numbers (BASELINE.md), so vs_baseline compares against the first recorded
value of this bench (BENCH_NOMINAL.json); 1.0 until then.
"""
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# production shape: 64 scenario blocks, 256 vars / 128+128 rows each,
# 64 first-stage vars, 32+32 linking rows
SHAPE = dict(N=64, n=256, mE=128, mI=128, n0=64, m0E=32, m0I=32,
             mEl=32, mIl=32)


def main():
    from pips_ipmpp_tpu.core.options import Options, ScalerType
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from pips_ipmpp_tpu.scale import make_scaler

    dtype = jnp.float32   # production TPU precision (true-f32 matmuls are
    # forced by the solver; converges to the reference tolerances)
    lp = random_arrowhead_lp(0, dtype=dtype, **SHAPE)
    lp = make_scaler(ScalerType.EQUILIBRIUM).scale(lp)
    opts = Options(refinement_steps=4, max_gondzio_correctors=2)
    solver = IPMSolver(partial(ArrowBackend, factor_dtype=dtype), opts)

    res = solver.solve_fused(lp)          # compile + first solve
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION, res.status

    t0 = time.perf_counter()
    res = solver.solve_fused(lp)
    dt = time.perf_counter() - t0
    assert res.status == TerminationStatus.SUCCESSFUL_TERMINATION

    value = res.iterations / dt
    nominal_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_NOMINAL.json")
    vs_baseline = 1.0
    if os.path.exists(nominal_path):
        try:
            nominal = json.load(open(nominal_path))["value"]
            vs_baseline = value / nominal
        except Exception:
            pass

    print(json.dumps({
        "metric": "ipm_iterations_per_s_64blk_256v",
        "value": round(value, 3),
        "unit": "iter/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
