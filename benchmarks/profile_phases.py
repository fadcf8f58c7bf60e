"""Micro-profiling of IPM phase costs on the bench shape (one chip).

Times, with distinct inputs and forced materialization (device_get):
  - factorize (leaf condensation + border solves + SC + root)
  - one _solve_core pass (L/D/Lt sweep)
  - solve_reduced with refinement_steps in {0, 1, 4}
  - one full IPM iteration worth of solves
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
    outs = []
    for a in args_list[warm:]:
        outs.append(fn(*a))
    jax.device_get(outs[-1])
    for o in outs[:-1]:
        jax.device_get(o)
    dt = (time.perf_counter() - t0) / max(len(args_list) - warm, 1)
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

    def rand_diag(key, scale=1.0):
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
    diags = [rand_diag(k) for k in keys]
    rhss = [rand_rhs(k) for k in keys]

    fact = jax.jit(lambda Dx, Om: be.factorize(Dx, Om, 1e-8, 1e-8))
    dt = timeit(fact, diags)
    print(f"factorize:              {dt*1e3:8.3f} ms")

    fac = fact(*diags[0])
    jax.device_get(jax.tree.leaves(fac)[0])

    core = jax.jit(lambda rhs: be._solve_core(
        fac,
        -rhs.rhat_x.first,
        jnp.concatenate([-rhs.rA.first, -rhs.rhat_z.first,
                         -rhs.rA.link, -rhs.rhat_z.link]),
        -rhs.rhat_x.blocks,
        jnp.concatenate([-rhs.rA.blocks, -rhs.rhat_z.blocks], axis=1)))
    dt = timeit(core, [(r,) for r in rhss])
    print(f"_solve_core (1 pass):   {dt*1e3:8.3f} ms")

    for rs in (0, 1, 4):
        slv = jax.jit(partial(be.solve_reduced, fac, refinement_steps=rs))
        dt = timeit(slv, [(r,) for r in rhss])
        print(f"solve_reduced (ref={rs}): {dt*1e3:8.3f} ms")

    # breakdown inside factorize: Neq formation, cholesky, Ninv, border, SC
    def neq_only(Dx, Om):
        Einv = 1.0 / (Dx.blocks + 1e-8)
        Omv = 1.0 / Om.blocks
        M = jnp.concatenate([lp.B, lp.D], axis=1)
        Fd = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(1e-8, Einv.dtype), (lp.N, lp.mE)),
            Omv + 1e-8], axis=1)
        MEi = M * Einv[:, None, :]
        return (jnp.einsum("iak,ibk->iab", MEi, M)
                + jax.vmap(jnp.diag)(Fd))
    neq_j = jax.jit(neq_only)
    dt = timeit(neq_j, diags)
    print(f"  Neq formation:        {dt*1e3:8.3f} ms")

    Neqs = [neq_j(*d) for d in diags]
    jax.device_get(Neqs[-1])
    chol_j = jax.jit(jnp.linalg.cholesky)
    dt = timeit(chol_j, [(n,) for n in Neqs])
    print(f"  batched cholesky:     {dt*1e3:8.3f} ms")

    Ls = [chol_j(n) for n in Neqs]
    jax.device_get(Ls[-1])
    from pips_ipmpp_tpu.linalg.arrow_backend import _bchol_solve
    eye = jnp.broadcast_to(jnp.eye(256, dtype=dtype), (64, 256, 256))
    inv_j = jax.jit(lambda L: _bchol_solve(L, eye))
    dt = timeit(inv_j, [(l,) for l in Ls])
    print(f"  explicit inverse:     {dt*1e3:8.3f} ms")

    # small root cholesky cost
    S = jnp.eye(224, dtype=dtype) * 3.0 + 0.01 * jax.random.normal(
        key, (224, 224), dtype)
    S = S @ S.T
    Ss = [S + i * 1e-6 * jnp.eye(224, dtype=dtype) for i in range(12)]
    dt = timeit(chol_j, [(s,) for s in Ss])
    print(f"  root cholesky 224:    {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
