r"""Pallas TPU kernel: batched blocked Cholesky factorization.

The per-iteration hot op of the framework is the batched factorization of
all block normal-equations matrices (the role PARDISO's numerical
factorization plays per rank in the reference).  This kernel factors one
[m, m] SPD matrix per grid program entirely in VMEM:

  right-looking blocked algorithm, panel width P:
    - within-panel column loop (VPU): pivot sqrt, column scale, rank-1
      update restricted to the panel,
    - trailing update (MXU): S[:, rest] -= Lp @ Lp[rest, :]^T  — one
      [m, P] x [P, rest] matmul per panel.

Numerics match jnp.linalg.cholesky to f32 roundoff. Usable as a drop-in
via `batched_cholesky(K)`; selected in ArrowBackend with pallas_chol=True.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PANEL = 64


def _chol_kernel(k_ref, l_ref, scratch):
    m = k_ref.shape[-1]
    P = min(PANEL, m)
    n_panels = m // P
    assert n_panels * P == m

    scratch[...] = k_ref[0]
    rowids = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)    # [m, 1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)  # [1, P]

    for p in range(n_panels):          # static
        base = p * P
        panel0 = scratch[:, base:base + P]                     # [m, P]
        # static one-hot selecting the panel's diagonal-block rows
        Epanel = (rowids == (base + col_iota)).astype(panel0.dtype)

        # Mosaic forbids dynamic lane slicing and 1-D vector relayouts, so
        # the column loop is fully 2-D and mask-vectorized.
        def col_step(j, panel):
            c = base + j
            onehot = (col_iota == j).astype(panel.dtype)       # [1, P]
            colj = jnp.sum(panel * onehot, axis=1,
                           keepdims=True)                      # [m, 1]
            isdiag = (rowids == c)
            d = jnp.sum(jnp.where(isdiag, colj, 0.0))
            pivot = jax.lax.rsqrt(d)
            below = (rowids > c)
            newcol = jnp.where(isdiag, 1.0 / pivot,
                               jnp.where(below, colj * pivot, colj))
            panel = jnp.where(onehot > 0, newcol, panel)
            # rank-1 update of remaining panel columns (local idx > j)
            colv = jnp.where(below, newcol, 0.0)               # [m, 1]
            rowv = jnp.sum(newcol * Epanel, axis=0,
                           keepdims=True)                      # [1, P]
            upd = (col_iota > j).astype(panel.dtype)
            return panel - colv * (rowv * upd)

        # static unroll: Mosaic schedules/pipelines unrolled column steps
        # far better than a fori_loop (each traced loop step costs ~us of
        # sequential overhead x 256 columns)
        panel = panel0
        for j in range(P):
            panel = col_step(j, panel)
        scratch[:, base:base + P] = panel

        # trailing update on the MXU
        if base + P < m:
            lower_mask = (rowids > (base + col_iota)).astype(scratch.dtype)
            Lp = scratch[:, base:base + P] * lower_mask        # [m, P]
            rest = scratch[:, base + P:]
            # rest -= Lp @ Lp[base+P:, :]^T  (contract lane dims; no
            # explicit transpose)
            rest = rest - jax.lax.dot_general(
                Lp, Lp[base + P:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scratch[:, base + P:] = rest

    # write the lower triangle (zero upper)
    all_rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    all_cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    l_ref[0] = jnp.where(all_rows >= all_cols, scratch[...], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_cholesky(K: jax.Array, interpret: bool = False) -> jax.Array:
    """Cholesky of a batch of SPD matrices [N, m, m] (f32, m % 64 == 0 or
    m <= 64 a power of two)."""
    N, m, _ = K.shape
    kernel = pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((N, m, m), K.dtype),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if False else
                               pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, m), K.dtype)],
        interpret=interpret,
    )
    return kernel(K)
