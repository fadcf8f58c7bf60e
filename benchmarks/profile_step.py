"""Decompose per-iteration time on the bench shape with ON-DEVICE loops.

The axon tunnel adds ~28 ms fixed roundtrip latency per dispatch, so
phase timing must amortize: run each phase K times inside lax.fori_loop
(data-dependent so XLA cannot hoist), time K=K1 vs K=K2, and report the
slope.  Also reports measured FLOP/s + MFU for the factorize path.

Run on the real chip:  python benchmarks/profile_step.py
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pips_ipmpp_tpu.core.options import Options, ScalerType
from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
from pips_ipmpp_tpu.ipm import formulation as F
from pips_ipmpp_tpu.ipm.mehrotra import ipm_step
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
from pips_ipmpp_tpu.scale import make_scaler

SHAPE = dict(N=64, n=256, mE=128, mI=128, n0=64, m0E=32, m0I=32,
             mEl=32, mIl=32)
K1, K2 = 4, 16


def slope(fn, it):
    """Seconds per inner call, via two loop lengths."""
    f1 = jax.jit(partial(fn, K1))
    f2 = jax.jit(partial(fn, K2))
    jax.device_get(f1(it)); jax.device_get(f2(it))   # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); jax.device_get(f1(it))
        t1 = time.perf_counter(); jax.device_get(f2(it))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (K2 - K1))
    ts.sort()
    return ts[1]


def main():
    dtype = jnp.float32
    lp = random_arrowhead_lp(0, dtype=dtype, **SHAPE)
    lp = make_scaler(ScalerType.EQUILIBRIUM).scale(lp)
    opts = Options(refinement_steps=4, max_gondzio_correctors=2)
    jax.config.update("jax_default_matmul_precision", "highest")

    be = ArrowBackend(lp, factor_dtype=dtype)
    it0 = F.initial_iterate(be, 100.0)

    def perturb(it, i):
        return jax.tree.map(lambda v: v * (1.0 + 1e-6 * i), it)

    def loop(k, body, it):
        def b(i, carry):
            out = body(perturb(it, carry[1] * 1e-3 + i))
            return (carry[0] + jnp.sum(jax.tree.leaves(out)[0][..., :1]),
                    carry[1])
        acc, _ = jax.lax.fori_loop(0, k, b, (jnp.zeros((), dtype), 0.0))
        return acc

    def ph_kkt(k, it):
        return loop(k, lambda i: F.kkt_diagonals(be, i)[0].blocks, it)

    def ph_resid(k, it):
        return loop(k, lambda i: F.compute_residuals(be, i).rL.blocks, it)

    def ph_fact(k, it):
        def body(i):
            Dx, Om = F.kkt_diagonals(be, i)
            return be.factorize(Dx, Om, 1e-8, 1e-8).Ninv
        return loop(k, body, it)

    def ph_fact_solve(k, it, nsolve=1, refine=opts.refinement_steps):
        def body(i):
            res = F.compute_residuals(be, i)
            Dx, Om = F.kkt_diagonals(be, i)
            fac = be.factorize(Dx, Om, 1e-8, 1e-8)
            comp = F.comp_rhs_affine(be, i)
            rhs = F.assemble_reduced_rhs(be, i, res, comp, Om)
            out = None
            for s in range(nsolve):
                dx, dy, dz = be.solve_reduced(fac, rhs, refine)
                rhs = F.ReducedRhs(
                    rhat_x=jax.tree.map(lambda a, b: a + 1e-9 * b,
                                        rhs.rhat_x, dx),
                    rA=rhs.rA, rhat_z=rhs.rhat_z, rbar_z=rhs.rbar_z)
                out = dx
            return out.blocks
        return loop(k, body, it)

    def ph_step(k, it):
        def body(i):
            new_it, _ = ipm_step(be, i, 1e-8, 1e-8, opts, iteration=5)
            return new_it.x.blocks
        return loop(k, body, it)

    only = set(sys.argv[1:])
    results = {}
    for name, fn in [
        ("kkt_diagonals", ph_kkt),
        ("residuals", ph_resid),
        ("factorize", ph_fact),
        ("fact+1solve", partial(ph_fact_solve, nsolve=1)),
        ("fact+1solve_ref0", partial(ph_fact_solve, nsolve=1, refine=0)),
        ("full_ipm_step", ph_step),
    ]:
        if only and name not in only:
            continue
        t = slope(fn, it0)
        results[name] = t
        print(json.dumps({"phase": name, "ms": round(t * 1e3, 3)}))

    N, n, mE, mI = SHAPE["N"], SHAPE["n"], SHAPE["mE"], SHAPE["mI"]
    a = mE + mI
    nS = SHAPE["n0"] + SHAPE["mEl"] + SHAPE["mIl"]
    flops = N * (2 * a * a * n + a ** 3 / 3 + 3 * a ** 3
                 + 2 * a * n * nS + 2 * a * a * nS + 2 * a * n * nS
                 + 2 * a * nS * (SHAPE["n0"] + 2 * SHAPE["mEl"]))
    if "factorize" in results:
        t_fact = results["factorize"]
        tf = flops / t_fact / 1e12
        print(json.dumps({"phase": "factorize_flops",
                          "gflop": round(flops / 1e9, 2),
                          "tflops": round(tf, 2),
                          "mfu_vs_65tf_f32hi": round(tf / 65.0, 3)}))


if __name__ == "__main__":
    main()
