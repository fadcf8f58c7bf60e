"""A/B: sweep kernel vs LDL kernel (+ Ninv einsum) on the hot shapes."""
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
    print(f"{label:38s} {dt*1e3:8.3f} ms/rep  [compile {compile_s:.0f}s]",
          flush=True)
    return dt


def spd_batch(key, B, a, dtype):
    M = jax.random.normal(key, (B, a, a), dtype)
    return jnp.einsum("iab,icb->iac", M, M) / a + 2.0 * jnp.eye(a, dtype=dtype)


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from pips_ipmpp_tpu.linalg.pallas_sweep import sweep_inverse
    from pips_ipmpp_tpu.linalg.pallas_ldl import ldl_inverse_factors

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    A64 = spd_batch(key, 64, 256, dtype)
    A1 = spd_batch(key, 1, 192, dtype)

    # correctness spot check on TPU
    Ai, d = sweep_inverse(A64)
    I = jnp.eye(256, dtype=dtype)
    err = float(jnp.max(jnp.abs(jnp.einsum("iab,ibc->iac", Ai, A64) - I)))
    print(f"sweep [64,256,256] inverse err {err:.2e}", flush=True)

    def sweep_leaf(i, carry):
        s = carry
        Ainv, d = sweep_inverse(A64 + 1e-6 * s * jnp.eye(256, dtype=dtype))
        return s + Ainv[0, -1, 0] + d[0, 0]

    loop_time(sweep_leaf, jnp.zeros((), dtype), "sweep kernel [64,256,256]")

    def sweep_root(i, carry):
        s = carry
        Ainv, d = sweep_inverse(A1 + 1e-6 * s * jnp.eye(192, dtype=dtype))
        return s + Ainv[0, -1, 0] + d[0, 0]

    loop_time(sweep_root, jnp.zeros((), dtype), "sweep kernel [1,192,192]")

    def ldl_full(i, carry):
        s = carry
        X, d = ldl_inverse_factors(A64 + 1e-6 * s * jnp.eye(256, dtype=dtype))
        N = jnp.einsum("ica,ic,icb->iab", X, 1.0 / d, X,
                       precision=jax.lax.Precision.HIGHEST)
        return s + N[0, -1, 0]

    loop_time(ldl_full, jnp.zeros((), dtype), "ldl kernel + Ninv einsum")


if __name__ == "__main__":
    main()
