"""On-device breakdown of one IPM iteration at the bench shape (axon-safe:
everything inside lax.scan with perturbed inputs, single transfer)."""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = dict(N=64, n=256, mE=128, mI=128, n0=64, m0E=32, m0I=32,
             mEl=32, mIl=32)
STEPS = 50


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from pips_ipmpp_tpu.core.options import Options
    from pips_ipmpp_tpu.core.spaces import RVec, XVec
    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.ipm import formulation as F
    from pips_ipmpp_tpu.ipm.mehrotra import ipm_step
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend

    dtype = jnp.float32
    lp = random_arrowhead_lp(0, dtype=dtype, **SHAPE)
    opts = Options(refinement_steps=4, max_gondzio_correctors=2)

    def timed(name, op, *args):
        def fn(*a):
            def body(carry, i):
                r = op(carry, i, *a)
                return r, None
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype),
                                  jnp.arange(STEPS, dtype=dtype))
            return out
        j = jax.jit(fn)
        jax.device_get(j(*args))
        t0 = time.perf_counter()
        jax.device_get(j(*args))
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name:34s} {dt * 1e3:9.3f} ms")

    be = ArrowBackend(lp, factor_dtype=dtype)
    it0 = F.initial_iterate(be, jnp.asarray(100.0, dtype))

    def mk_diags(i):
        Dx = XVec(1.0 + 0.01 * i + jnp.ones((lp.n0,), dtype),
                  1.0 + 0.01 * i + jnp.ones((lp.N, lp.n), dtype))
        Ominv = RVec(1.0 + 0.01 * i + jnp.ones((lp.m0I,), dtype),
                     1.0 + 0.01 * i + jnp.ones((lp.N, lp.mI), dtype),
                     1.0 + 0.01 * i + jnp.ones((lp.mIl,), dtype))
        return Dx, Ominv

    def op_fact(carry, i):
        Dx, Ominv = mk_diags(i + carry)
        fac = be.factorize(Dx, Ominv, 1e-8, 1e-8)
        return carry + jnp.sum(fac.Ninv[:, :2, :2]) + jnp.sum(fac.Sinv[:2, :2])
    timed("factorize (full)", op_fact)

    Dx, Ominv = mk_diags(jnp.zeros((), dtype))
    fac0 = be.factorize(Dx, Ominv, 1e-8, 1e-8)

    from pips_ipmpp_tpu.ipm.formulation import ReducedRhs

    def mk_rhs(i):
        z = 0.01 * i
        return ReducedRhs(
            rhat_x=XVec(z + jnp.ones((lp.n0,), dtype),
                        z + jnp.ones((lp.N, lp.n), dtype)),
            rA=RVec(z + jnp.ones((lp.m0E,), dtype),
                    z + jnp.ones((lp.N, lp.mE), dtype),
                    z + jnp.ones((lp.mEl,), dtype)),
            rhat_z=RVec(z + jnp.ones((lp.m0I,), dtype),
                        z + jnp.ones((lp.N, lp.mI), dtype),
                        z + jnp.ones((lp.mIl,), dtype)),
            rbar_z=RVec(z + jnp.ones((lp.m0I,), dtype),
                        z + jnp.ones((lp.N, lp.mI), dtype),
                        z + jnp.ones((lp.mIl,), dtype)))

    for nref in (0, 1, 4):
        def op_solve(carry, i, nref=nref):
            rhs = mk_rhs(i + carry)
            dx, dy, dz = be.solve_reduced(fac0, rhs, nref)
            return carry + jnp.sum(dx.first[:2])
        timed(f"solve_reduced (ref={nref})", op_solve)

    def op_resid(carry, i):
        it = jax.tree.map(lambda v: v + 0.001 * i * 0 + carry * 0, it0)
        res = F.compute_residuals(be, it)
        return carry + jnp.sum(res.rA.first[:2])
    timed("compute_residuals", op_resid)

    def op_step(carry, i):
        it = jax.tree.map(
            lambda v: v + (0.0 * i + carry * 0).astype(v.dtype), it0)
        new_it, stats = ipm_step(be, it, 1e-8 + 0.0 * i, 1e-8, opts)
        return carry + stats.mu * 1e-30 + jnp.sum(new_it.x.first[:2]) * 1e-20
    timed("full ipm_step", op_step)


if __name__ == "__main__":
    main()
