"""On-device microbench of the factorize-path ops (axon-safe).

Each op runs inside a lax.scan with an on-device perturbed input per step,
so host->device transfer happens once and per-step cost is the pure op
cost.  Prints ms/op for the bench shape [N=64, a=256] f32.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, n, a, nS = 64, 256, 256, 128
STEPS = 200


def timed(name, make_fn, *args):
    fn = jax.jit(make_fn)
    out = fn(*args)
    jax.device_get(out)          # compile + run once
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:34s} {dt * 1e3:9.3f} ms/op")
    return dt


def scan_op(op):
    """Run op STEPS times with a perturbed input each step."""
    def fn(X, *rest):
        def body(carry, i):
            Xi = X + (i * 1e-6)
            r = op(Xi, *rest)
            return carry + jax.tree.map(
                lambda v: jnp.sum(v * v), jax.tree.flatten(r)[0][0]), None
        s, _ = jax.lax.scan(body, jnp.zeros((), X.dtype),
                            jnp.arange(STEPS, dtype=X.dtype))
        return s
    return fn


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (N, a, n), jnp.float32)
    Einv = 1.0 + jax.random.uniform(jax.random.PRNGKey(1), (N, n), jnp.float32)
    R = jax.random.normal(jax.random.PRNGKey(2), (N, a, nS), jnp.float32)

    spd = jnp.einsum("iak,ibk->iab", M, M) + 300.0 * jnp.broadcast_to(
        jnp.eye(a, dtype=jnp.float32), (N, a, a))
    eye = jnp.broadcast_to(jnp.eye(a, dtype=jnp.float32), (N, a, a))

    timed("neq formation (einsum)", scan_op(
        lambda Mi: jnp.einsum("iak,ibk->iab", Mi * Einv[:, None, :], Mi)), M)

    timed("batched cholesky", scan_op(jnp.linalg.cholesky), spd)

    L = jnp.linalg.cholesky(spd)

    def chol_inv(Li):
        u = jax.lax.linalg.triangular_solve(Li, eye, left_side=True,
                                            lower=True)
        return jax.lax.linalg.triangular_solve(Li, u, left_side=True,
                                               lower=True, transpose_a=True)
    timed("tri-solve inverse (256 rhs)", scan_op(chol_inv), L)

    Ninv = chol_inv(L)
    timed("matmul [64,256,256]^2", scan_op(
        lambda X: jnp.einsum("iab,ibc->iac", X, Ninv)), spd)

    timed("border solve via Ninv (128 rhs)", scan_op(
        lambda X: jnp.einsum("iab,ibS->iaS", X, R)), Ninv)

    # full current-path factorize-equivalent compute
    def fact(Mi):
        Neq = jnp.einsum("iak,ibk->iab", Mi * Einv[:, None, :], Mi) \
            + 300.0 * eye
        Li = jnp.linalg.cholesky(Neq)
        Ninvi = chol_inv(Li)
        Um = jnp.einsum("iab,ibS->iaS", Ninvi, R)
        return jnp.einsum("iaS,iaT->ST", R, Um)
    timed("leaf factorize chain", scan_op(fact), M)

    # root ops at root shape
    S = jax.random.normal(jax.random.PRNGKey(3), (224, 224), jnp.float32)
    S = S @ S.T + 224 * jnp.eye(224, dtype=jnp.float32)
    timed("root cholesky 224 (unbatched)", scan_op(jnp.linalg.cholesky), S)


if __name__ == "__main__":
    main()
