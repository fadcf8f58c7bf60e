"""A/B harness for leaf-factorization variants on the flagship shape.

Sweeps: matmul precision for the non-kernel path (highest = 6-pass vs
high = 3-pass; the Pallas LDL kernel is pinned to HIGHEST internally),
factored_inverse (skip the Ninv GEMM), and the LDL elimination panel
width.  Prints one JSON line per variant with convergence + sustained
iterations/s — run on the real chip to pick the production config.

    python benchmarks/leaf_ab.py                 # default sweep
    python benchmarks/leaf_ab.py --quick         # precision A/B only
"""
import argparse
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = dict(N=64, n=256, mE=128, mI=128, n0=64, m0E=32, m0I=32,
             mEl=32, mIl=32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--stream", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pips_ipmpp_tpu.core.options import Options, ScalerType
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from pips_ipmpp_tpu.scale import make_scaler

    dtype = jnp.float32
    opts = Options(refinement_steps=0, max_gondzio_correctors=1)
    lp = make_scaler(ScalerType.EQUILIBRIUM).scale(
        random_arrowhead_lp(0, dtype=dtype, **SHAPE))
    lps = [dataclasses.replace(lp, c0=lp.c0 * (1 + 1e-5 * i),
                               cN=lp.cN * (1 + 1e-5 * i))
           for i in range(args.stream)]

    variants = [
        dict(tag="baseline", precision="highest", factored=False, panel=0),
        dict(tag="prec_high", precision="high", factored=False, panel=0),
    ]
    if not args.quick:
        variants += [
            dict(tag="factored_inv", precision="highest", factored=True,
                 panel=0),
            dict(tag="panel32", precision="highest", factored=False,
                 panel=32),
            dict(tag="panel8", precision="highest", factored=False,
                 panel=8),
            dict(tag="high+factored", precision="high", factored=True,
                 panel=0),
        ]

    for v in variants:
        os.environ["PIPS_LDL_PANEL"] = str(v["panel"])
        solver = IPMSolver(partial(ArrowBackend, factor_dtype=dtype,
                                   factored_inverse=v["factored"]), opts)
        # IPMSolver.__init__ forces 'highest'; override AFTER construction
        jax.config.update("jax_default_matmul_precision", v["precision"])
        out = {"variant": v["tag"], **{k: v[k] for k in
                                       ("precision", "factored", "panel")}}
        try:
            res = solver.solve_fused(lps[0])     # compile + converge check
            out["status"] = int(res.status)
            out["iterations"] = int(res.iterations)
            if res.status != TerminationStatus.SUCCESSFUL_TERMINATION:
                out["note"] = "DID NOT CONVERGE"
                print(json.dumps(out), flush=True)
                continue
            t0 = time.perf_counter()
            outs = [solver.solve_fused_async(l) for l in lps]
            its = jax.device_get([o[1]["iterations"] for o in outs])
            sts = jax.device_get([o[1]["status"] for o in outs])
            dt = time.perf_counter() - t0
            out["all_converged"] = bool(all(int(s) == 1 for s in sts))
            out["sustained_iter_s"] = round(float(sum(its)) / dt, 1)
        except Exception as e:
            out["error"] = str(e)[:200]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
