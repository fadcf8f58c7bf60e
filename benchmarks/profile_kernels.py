"""Kernel-level timing of the fused-iteration hot ops (on-device repetition).

Times, each in an on-device fori_loop (REPS reps, index-dependent input):
  - leaf LDL kernel [64, 256, 256]
  - root LDL kernel [1, 192, 192]   (the ldl_kernel root path, G=1)
  - Ninv einsum  X' D^-1 X  [64, 256, 256]
  - Neq assembly einsum
  - full factorize
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 50


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
    print(f"{label:34s} {dt*1e3:8.3f} ms/rep  [compile {compile_s:.0f}s]",
          flush=True)
    return dt


def spd_batch(key, B, a, dtype):
    M = jax.random.normal(key, (B, a, a), dtype)
    return jnp.einsum("iab,icb->iac", M, M) / a + 2.0 * jnp.eye(a, dtype=dtype)


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from pips_ipmpp_tpu.linalg.pallas_ldl import ldl_inverse_factors

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    A64 = spd_batch(key, 64, 256, dtype)
    A1 = spd_batch(key, 1, 192, dtype)

    def leaf_body(i, carry):
        s = carry
        X, d = ldl_inverse_factors(A64 + 1e-6 * s * jnp.eye(256, dtype=dtype))
        return s + X[0, -1, 0] + d[0, 0]

    loop_time(leaf_body, jnp.zeros((), dtype), "leaf ldl kernel [64,256,256]")

    def root_body(i, carry):
        s = carry
        X, d = ldl_inverse_factors(A1 + 1e-6 * s * jnp.eye(192, dtype=dtype))
        return s + X[0, -1, 0] + d[0, 0]

    loop_time(root_body, jnp.zeros((), dtype), "root ldl kernel [1,192,192]")

    X0, d0 = ldl_inverse_factors(A64)
    X0 = jax.block_until_ready(X0)

    def ninv_body(i, carry):
        s = carry
        N = jnp.einsum("ica,ic,icb->iab", X0 + 1e-9 * s, 1.0 / d0, X0,
                       precision=jax.lax.Precision.HIGHEST)
        return s + N[0, 0, 0]

    loop_time(ninv_body, jnp.zeros((), dtype), "Ninv einsum [64,256,256]")

    # XLA cholesky+triangular_solve inverse for comparison
    def xla_body(i, carry):
        s = carry
        Ai = A64 + 1e-6 * s * jnp.eye(256, dtype=dtype)
        L = jnp.linalg.cholesky(Ai)
        eye = jnp.broadcast_to(jnp.eye(256, dtype=dtype), (64, 256, 256))
        u = jax.lax.linalg.triangular_solve(L, eye, left_side=True,
                                            lower=True)
        Ninv = jax.lax.linalg.triangular_solve(L, u, left_side=True,
                                               lower=True, transpose_a=True)
        return s + Ninv[0, 0, 0]

    loop_time(xla_body, jnp.zeros((), dtype), "XLA chol+2tri [64,256,256]")

    # XLA root two-level for comparison: chol(64)+chol(128)+inverses
    S = spd_batch(key, 1, 64, dtype)[0]
    Sd = spd_batch(key, 1, 128, dtype)[0]

    def xroot_body(i, carry):
        s = carry
        c1 = jnp.linalg.cholesky(S + 1e-6 * s * jnp.eye(64, dtype=dtype))
        c2 = jnp.linalg.cholesky(Sd + 1e-6 * s * jnp.eye(128, dtype=dtype))
        e1 = jax.scipy.linalg.solve_triangular(c1, jnp.eye(64, dtype=dtype),
                                               lower=True)
        e2 = jax.scipy.linalg.solve_triangular(c2, jnp.eye(128, dtype=dtype),
                                               lower=True)
        i1 = e1.T @ e1
        i2 = e2.T @ e2
        return s + i1[0, 0] + i2[0, 0]

    loop_time(xroot_body, jnp.zeros((), dtype), "XLA root chol 64+128 inv")

    from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from pips_ipmpp_tpu.core.spaces import RVec, XVec

    SHAPE = dict(N=64, n=256, mE=128, mI=128, n0=64, m0E=32, m0I=32,
                 mEl=32, mIl=32)
    lp = random_arrowhead_lp(0, dtype=dtype, **SHAPE)
    be = ArrowBackend(lp, factor_dtype=dtype)
    k = jax.random.split(key, 6)
    Dx = XVec(1.0 + jax.random.uniform(k[0], (lp.n0,), dtype),
              1.0 + jax.random.uniform(k[1], (lp.N, lp.n), dtype))
    Ominv = RVec(1.0 + jax.random.uniform(k[2], (lp.m0I,), dtype),
                 1.0 + jax.random.uniform(k[3], (lp.N, lp.mI), dtype),
                 1.0 + jax.random.uniform(k[4], (lp.mIl,), dtype))

    def fact_body(i, carry):
        s, _ = carry
        Dx2 = jax.tree.map(lambda v: v + 1e-6 * (i + 1), Dx)
        f = be.factorize(Dx2, Ominv, 1e-8, 1e-8)
        return (s + jnp.sum(f.Ninv[0, 0, :8]), f.ok)

    loop_time(fact_body, (jnp.zeros((), dtype), jnp.asarray(True)),
              "factorize (full)")


if __name__ == "__main__":
    main()
