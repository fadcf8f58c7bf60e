"""Per-phase cost via on-device repetition (robust to dispatch latency).

Each phase is repeated REPS times inside a lax.fori_loop with an
input perturbation that depends on the loop index (prevents CSE), and the
whole loop is timed; per-rep cost = total / REPS.  This mirrors how the
phases run inside the fused solve loop (ipm/device_loop.py) — no host
round-trips between steps.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = dict(N=64, n=256, mE=128, mI=128, n0=64, m0E=32, m0I=32,
             mEl=32, mIl=32)
REPS = 30


def loop_time(make_body, carry0, label):
    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, REPS, make_body, c0)

    t0 = time.perf_counter()
    out = run(carry0)
    jax.device_get(jax.tree.leaves(out)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run(carry0)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:30s} {dt*1e3:8.3f} ms/rep  [compile {compile_s:.0f}s]",
          flush=True)
    return dt


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
    k = jax.random.split(key, 16)
    Dx = XVec(1.0 + jax.random.uniform(k[0], (lp.n0,), dtype),
              1.0 + jax.random.uniform(k[1], (lp.N, lp.n), dtype))
    Ominv = RVec(1.0 + jax.random.uniform(k[2], (lp.m0I,), dtype),
                 1.0 + jax.random.uniform(k[3], (lp.N, lp.mI), dtype),
                 1.0 + jax.random.uniform(k[4], (lp.mIl,), dtype))
    rx = XVec(jax.random.normal(k[5], (lp.n0,), dtype),
              jax.random.normal(k[6], (lp.N, lp.n), dtype))
    rA = RVec(jax.random.normal(k[7], (lp.m0E,), dtype),
              jax.random.normal(k[8], (lp.N, lp.mE), dtype),
              jax.random.normal(k[9], (lp.mEl,), dtype))
    rz = RVec(jax.random.normal(k[10], (lp.m0I,), dtype),
              jax.random.normal(k[11], (lp.N, lp.mI), dtype),
              jax.random.normal(k[12], (lp.mIl,), dtype))
    rhs = ReducedRhs(rhat_x=rx, rA=rA, rhat_z=rz, rbar_z=rz)

    fac = jax.jit(lambda a, b: be.factorize(a, b, 1e-8, 1e-8))(Dx, Ominv)
    jax.device_get(jax.tree.leaves(fac)[0])

    # ---- factorize ----
    def fact_body(i, carry):
        s, _ = carry
        Dx2 = jax.tree.map(lambda v: v + 1e-6 * (i + 1), Dx)
        f = be.factorize(Dx2, Ominv, 1e-8, 1e-8)
        return (s + jnp.sum(f.Ninv[0, 0, :8]), f.ok)

    loop_time(fact_body, (jnp.zeros((), dtype), jnp.asarray(True)),
              "factorize")

    # ---- one _solve_core pass ----
    p0 = -rhs.rhat_x.first
    q0 = jnp.concatenate([-rhs.rA.first, -rhs.rhat_z.first,
                          -rhs.rA.link, -rhs.rhat_z.link])
    rho_x = -rhs.rhat_x.blocks
    rho_m = jnp.concatenate([-rhs.rA.blocks, -rhs.rhat_z.blocks], axis=1)

    def core_body(i, carry):
        s = carry
        out = be._solve_core(fac, p0 + 1e-6 * s, q0, rho_x, rho_m)
        return s + out[0][0]

    loop_time(core_body, jnp.zeros((), dtype), "_solve_core")

    # ---- aug residual alone ----
    st = be._solve_core(fac, p0, q0, rho_x, rho_m)
    st = jax.tree.map(jax.jit(lambda x: x), st)
    jax.device_get(st[0])

    def aug_body(i, carry):
        s = carry
        e = be._aug_residual(fac, p0 + 1e-6 * s, q0, rho_x, rho_m, *st)
        return s + e[0][0]

    loop_time(aug_body, jnp.zeros((), dtype), "_aug_residual")

    # ---- solve_reduced ref in {0, 2, 4} ----
    for rs in (0, 2, 4):
        def sr_body(i, carry, rs=rs):
            s = carry
            r2 = ReducedRhs(
                rhat_x=XVec(rhs.rhat_x.first + 1e-6 * s, rhs.rhat_x.blocks),
                rA=rhs.rA, rhat_z=rhs.rhat_z, rbar_z=rhs.rbar_z)
            dx, dy, dz = be.solve_reduced(fac, r2, rs)
            return s + dx.first[0]

        loop_time(sr_body, jnp.zeros((), dtype), f"solve_reduced(ref={rs})")

    # ---- step bounds (fraction-to-boundary reductions) ----
    from pips_ipmpp_tpu.ipm import formulation as F
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.core.options import Options

    it0 = jax.jit(lambda: F.initial_iterate(be, 10.0))()
    jax.device_get(it0.x.first)
    d0 = jax.jit(lambda: jax.tree.map(
        lambda v: -0.001 * jnp.ones_like(v), it0))()
    jax.device_get(d0.x.first)

    def sb_body(i, carry):
        s = carry
        it2 = jax.tree.map(lambda v: v + 1e-9 * s, it0)
        a, b = F.step_bounds_pd(be, it2, d0)
        return s + a

    loop_time(sb_body, jnp.zeros((), dtype), "step_bounds_pd")

    def res_body(i, carry):
        s = carry
        it2 = jax.tree.map(lambda v: v + 1e-9 * s, it0)
        r = F.compute_residuals(be, it2)
        return s + r.rL.first[0]

    loop_time(res_body, jnp.zeros((), dtype), "compute_residuals")


if __name__ == "__main__":
    main()
