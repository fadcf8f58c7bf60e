"""Solve-path micro-profiling on the bench shape (one chip, TPU).

The factorize phase is known (~1.05 ms, 13.8% MFU); this measures where the
remaining per-iteration time goes: _solve_core passes, refinement, and the
residual evaluations around them.
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = dict(N=64, n=256, mE=128, mI=128, n0=64, m0E=32, m0I=32,
             mEl=32, mIl=32)


def timeit(fn, args_list, warm=2):
    for a in args_list[:warm]:
        jax.device_get(fn(*a))
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[warm:]]
    jax.device_get(outs)
    return (time.perf_counter() - t0) / max(len(args_list) - warm, 1)


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from pips_ipmpp_tpu.core.spaces import RVec, XVec
    from pips_ipmpp_tpu.ipm.formulation import ReducedRhs

    dtype = jnp.float32
    lp = random_arrowhead_lp(0, dtype=dtype, **SHAPE)
    be = ArrowBackend(lp, factor_dtype=dtype)

    key = jax.random.PRNGKey(0)

    def rand_diag(key):
        k = jax.random.split(key, 8)
        Dx = XVec(1.0 + jax.random.uniform(k[0], (lp.n0,), dtype),
                  1.0 + jax.random.uniform(k[1], (lp.N, lp.n), dtype))
        Ominv = RVec(1.0 + jax.random.uniform(k[2], (lp.m0I,), dtype),
                     1.0 + jax.random.uniform(k[3], (lp.N, lp.mI), dtype),
                     1.0 + jax.random.uniform(k[4], (lp.mIl,), dtype))
        return Dx, Ominv

    def rand_rhs(key):
        k = jax.random.split(key, 8)
        rx = XVec(jax.random.normal(k[0], (lp.n0,), dtype),
                  jax.random.normal(k[1], (lp.N, lp.n), dtype))
        rA = RVec(jax.random.normal(k[2], (lp.m0E,), dtype),
                  jax.random.normal(k[3], (lp.N, lp.mE), dtype),
                  jax.random.normal(k[4], (lp.mEl,), dtype))
        rz = RVec(jax.random.normal(k[5], (lp.m0I,), dtype),
                  jax.random.normal(k[6], (lp.N, lp.mI), dtype),
                  jax.random.normal(k[7], (lp.mIl,), dtype))
        return ReducedRhs(rhat_x=rx, rA=rA, rhat_z=rz, rbar_z=rz)

    keys = jax.random.split(key, 12)
    rhss = [rand_rhs(k) for k in keys]

    t0 = time.perf_counter()
    fac = jax.jit(lambda Dx, Om: be.factorize(Dx, Om, 1e-8, 1e-8))(
        *rand_diag(keys[0]))
    jax.device_get(jax.tree.leaves(fac)[0])
    print(f"[compile factorize {time.perf_counter()-t0:.1f}s]", flush=True)

    def core(rhs):
        return be._solve_core(
            fac,
            -rhs.rhat_x.first,
            jnp.concatenate([-rhs.rA.first, -rhs.rhat_z.first,
                             -rhs.rA.link, -rhs.rhat_z.link]),
            -rhs.rhat_x.blocks,
            jnp.concatenate([-rhs.rA.blocks, -rhs.rhat_z.blocks], axis=1))

    t0 = time.perf_counter()
    core_j = jax.jit(core)
    dt = timeit(core_j, [(r,) for r in rhss])
    print(f"_solve_core (1 pass):   {dt*1e3:8.3f} ms  "
          f"[compile {time.perf_counter()-t0:.1f}s]", flush=True)

    def aug(rhs):
        st = core(rhs)
        return be._aug_residual(
            fac,
            -rhs.rhat_x.first,
            jnp.concatenate([-rhs.rA.first, -rhs.rhat_z.first,
                             -rhs.rA.link, -rhs.rhat_z.link]),
            -rhs.rhat_x.blocks,
            jnp.concatenate([-rhs.rA.blocks, -rhs.rhat_z.blocks], axis=1),
            *st)

    t0 = time.perf_counter()
    aug_j = jax.jit(aug)
    dt = timeit(aug_j, [(r,) for r in rhss])
    print(f"core + aug_residual:    {dt*1e3:8.3f} ms  "
          f"[compile {time.perf_counter()-t0:.1f}s]", flush=True)

    for rs in (0, 4):
        t0 = time.perf_counter()
        slv = jax.jit(partial(be.solve_reduced, fac, refinement_steps=rs))
        dt = timeit(slv, [(r,) for r in rhss])
        print(f"solve_reduced (ref={rs}): {dt*1e3:8.3f} ms  "
              f"[compile {time.perf_counter()-t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
