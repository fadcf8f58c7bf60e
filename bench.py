"""Headline benchmark: steady-state IPM iteration throughput on a
production-shaped arrowhead LP (one chip).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is IPM iterations/second — each iteration = batched factorization
of all block KKTs (condensed Cholesky) + Schur assembly/reduction + root
factorization + predictor, corrector and Gondzio solves.  The reference
publishes no absolute numbers (BASELINE.md), so vs_baseline is reported
against the first recorded value of this bench (stored in BENCH_NOMINAL.json
once measured); 1.0 until then.
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
WARMUP = 2
ITERS = 10


def main():
    from pips_ipmpp_tpu.core.options import Options
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.ipm.mehrotra import ipm_step
    from pips_ipmpp_tpu.ipm.solver import _init_fn
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend

    dtype = jnp.float32  # hot path precision on TPU (f64 residual path is
    # exercised in tests; the factorization benchmark runs at MXU precision)
    lp = random_arrowhead_lp(0, dtype=dtype, **SHAPE)
    opts = Options(max_gondzio_correctors=2, refinement_steps=1)
    ctor = partial(ArrowBackend, factor_dtype=dtype)
    it, _ = _init_fn(ctor, opts, lp)

    @jax.jit
    def step(lp, it):
        be = ArrowBackend(lp, factor_dtype=dtype)
        new_it, stats = ipm_step(be, it, 1e-6, 1e-6, opts)
        return new_it, stats.mu

    for _ in range(WARMUP):
        it2, mu = step(lp, it)
        jax.block_until_ready(it2)

    t0 = time.perf_counter()
    cur = it
    for _ in range(ITERS):
        cur, mu = step(lp, cur)
    jax.block_until_ready(cur)
    dt = (time.perf_counter() - t0) / ITERS

    value = 1.0 / dt
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
