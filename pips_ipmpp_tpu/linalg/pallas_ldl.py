r"""Fused batched LDL^T factorization + triangular inverse (Pallas TPU).

The per-iteration hot kernel of the IPM: every block's condensed KKT
`Neq_i` (SPD) and the root quasidefinite matrix S must be factorized and
explicitly inverted each iteration (the role of PARDISO's factor+Schur
per block in the reference, PardisoProjectSchurSolver.C:239-252, and the
dense root solvers, DeSymIndefSolver.C:28-126).

XLA's batched `cholesky` + `triangular_solve` are latency-bound on TPU:
they dispatch one op per column / per solve (measured ~4.3 ms for
[64, 256, 256] f32 on v5e).  This kernel performs the entire symmetric
elimination for a GROUP of blocks inside one VMEM-resident Pallas
program, the batch dimension vectorized across VPU sublanes:

  phase 1: blocked right-looking LDL^T — per 32-column panel, a
           `fori_loop` of rank-1 eliminations restricted to the panel
           strip, then ONE MXU rank-32 trailing update.  Sign-agnostic
           (no sqrt) -> valid for quasidefinite matrices, so one kernel
           serves both the SPD leaf systems and the indefinite root.
  phase 2: blocked unit-lower triangular inversion X = L^{-1}: per panel,
           a `fori_loop` inverts the 32x32 diagonal block, then ONE MXU
           update propagates it to the rows below.
  output : X and the pivot vector d;  A^{-1} = X^T diag(1/d) X is one
           batched MXU einsum for the caller.

The elimination exploits symmetry: M stays symmetric during phase 1, so
column c is read from M[:, :, c] via a one-hot lane reduction and row c
via a static-size dynamic sublane slice — no transposes anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PANEL = 32


def _bmm(x, y, transpose_y=False):
    """Batched matmul [G,m,k]@[G,k,n] on the MXU."""
    dn = (((2,), (2 if transpose_y else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(x, y, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)


def _ldl_kernel(a_ref, x_ref, d_ref, l_ref, *, a: int, panel: int):
    g = a_ref.shape[0]
    n_panels = a // panel

    # x_ref doubles as the working (trailing) matrix during phase 1; it is
    # re-initialized to I for phase 2 once L and d are extracted.
    x_ref[...] = a_ref[...]

    # ---- phase 1: blocked symmetric elimination into l_ref / d_ref ----
    # strip ops run on [G, rem, panel] slices; all panel indices static.
    for k in range(n_panels):
        r0 = k * panel
        r1 = r0 + panel
        rem = a - r0

        # local iotas for the in-panel masks
        lane = jax.lax.broadcasted_iota(jnp.int32, (g, rem, panel), 2)
        sub = jax.lax.broadcasted_iota(jnp.int32, (g, rem, panel), 1)

        # in-panel elimination with a fori_loop.  L columns and pivots are
        # accumulated in loop-carried values via lane masks (Mosaic cannot
        # store at dynamic lane offsets) and written back once per panel.
        # Only rows/lanes > j of the strip change per step; stale
        # above-diagonal entries are masked out.
        def body(j, carry):
            strip, lpan, dpan = carry
            onehot = (lane == j).astype(strip.dtype)
            col = jnp.sum(strip * onehot, axis=2, keepdims=True)  # [G,rem,1]
            subhot = (sub[:, :, :1] == j).astype(strip.dtype)
            piv = jnp.sum(col * subhot, axis=1, keepdims=True)    # [G,1,1]
            inv_p = 1.0 / piv
            rowj = jnp.sum(strip * subhot, axis=1, keepdims=True)  # [G,1,p]
            upd_mask = ((sub > j) & (lane > j)).astype(strip.dtype)
            strip = strip - (col * inv_p) * rowj * upd_mask
            lcol = jnp.where(sub[:, :, :1] > j, col * inv_p, 0.0)
            lcol = jnp.where(sub[:, :, :1] == j, jnp.ones_like(lcol), lcol)
            lpan = jnp.where(lane == j, lcol, lpan)
            dpan = jnp.where(lane[:, :1, :] == j, piv, dpan)
            return strip, lpan, dpan

        strip0 = x_ref[:, r0:, r0:r1]
        _, lpan, dpan = jax.lax.fori_loop(
            0, panel, body,
            (strip0, jnp.zeros_like(strip0), strip0[:, :1, :] * 0.0))
        l_ref[:, r0:, r0:r1] = lpan
        d_ref[:, r0:r1] = dpan[:, 0, :]

        # rank-`panel` trailing update via MXU:
        #   M[r1:, r1:] -= L[r1:, r0:r1] diag(d) L[r1:, r0:r1]^T
        if r1 < a:
            lb = l_ref[:, r1:, r0:r1]                       # [G, rem-p, p]
            dpan = d_ref[:, r0:r1][:, None, :]              # [G, 1, p]
            x_ref[:, r1:, r1:] = x_ref[:, r1:, r1:] - _bmm(
                lb * dpan, lb, transpose_y=True)

    # ---- phase 2: X = L^{-1} (unit lower) ----
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, a, a), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, a, a), 2)
    x_ref[...] = jnp.where(rows == cols, 1.0, 0.0).astype(x_ref.dtype)
    for k in range(n_panels):
        r0 = k * panel
        r1 = r0 + panel
        # invert the unit-lower diagonal block with a fori_loop
        lsub = jax.lax.broadcasted_iota(jnp.int32, (g, panel, panel), 1)

        lkk = l_ref[:, r0:r1, r0:r1]                        # [G,p,p]
        llane = jax.lax.broadcasted_iota(jnp.int32, lkk.shape, 2)

        def inv_body(j, xkk):
            lcol = jnp.sum(lkk * (llane == j), axis=2, keepdims=True)
            lcol = jnp.where(lsub[:, :, :1] > j, lcol, 0.0)  # [G,p,1]
            xrow = jnp.sum(xkk * (lsub[:, :, :1] == j), axis=1,
                           keepdims=True)                   # [G,1,p]
            return xkk - lcol * xrow

        eye = jnp.where(
            lsub == jax.lax.broadcasted_iota(jnp.int32, (g, panel, panel), 2),
            1.0, 0.0).astype(x_ref.dtype)
        xkk = jax.lax.fori_loop(0, panel, inv_body, eye)
        x_ref[:, r0:r1, :r1] = jnp.concatenate(
            [_bmm(xkk, x_ref[:, r0:r1, :r0]), xkk], axis=2) \
            if r0 > 0 else xkk
        # propagate to rows below:  X[r1:, :r1] -= L[r1:, r0:r1] X[r0:r1, :r1]
        if r1 < a:
            x_ref[:, r1:, :r1] = x_ref[:, r1:, :r1] - _bmm(
                l_ref[:, r1:, r0:r1], x_ref[:, r0:r1, :r1])


def _pick_group(batch: int, a: int) -> int:
    """Largest divisor of `batch` keeping the VMEM buffers comfortable."""
    budget = 24 * 1024 * 1024
    g = max(1, budget // (4 * a * a * 4))
    g = min(g, batch)
    while batch % g:
        g -= 1
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ldl_call(A, interpret=False):
    B, a, _ = A.shape
    g = _pick_group(B, a)
    grid = B // g
    kern = functools.partial(_ldl_kernel, a=a, panel=min(PANEL, a))
    X, d = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((g, a, a), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((g, a, a), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((g, a), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, a, a), A.dtype),
                   jax.ShapeDtypeStruct((B, a), A.dtype)],
        scratch_shapes=[pltpu.VMEM((g, a, a), A.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(A)
    return X, d


def ldl_inverse_factors(A: jax.Array, interpret=None):
    """Batched LDL^T of A [B, a, a] -> (X, d) with A^{-1} = X^T D^{-1} X.

    X is L^{-1} (unit lower triangular), d the pivot vector [B, a]
    (negative entries are fine: quasidefinite support).  `interpret`
    defaults to the Pallas interpreter on non-TPU backends so CPU tests
    run unchanged.  Dimensions not divisible by the panel size are padded
    with an identity tail (exact: the padded inverse is block-diagonal).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, a, _ = A.shape
    pad = 0 if a <= PANEL else (-a) % PANEL
    if pad:
        eye = jnp.broadcast_to(jnp.eye(pad, dtype=A.dtype), (B, pad, pad))
        Ap = jnp.zeros((B, a + pad, a + pad), A.dtype)
        Ap = Ap.at[:, :a, :a].set(A)
        Ap = Ap.at[:, a:, a:].set(eye)
        X, d = _ldl_call(Ap, interpret=interpret)
        return X[:, :a, :a], d[:, :a]
    return _ldl_call(A, interpret=interpret)


def batched_inverse(A: jax.Array, interpret=None) -> jax.Array:
    """Explicit inverse of a batch of symmetric quasidefinite matrices."""
    X, d = ldl_inverse_factors(A, interpret)
    return jnp.einsum("ica,ic,icb->iab", X, 1.0 / d, X,
                      precision=jax.lax.Precision.HIGHEST)


def inverse_ok(X: jax.Array, d: jax.Array,
               n_pos: int | None = None) -> jax.Array:
    """Factorization health check: finite factors, nonzero pivots, and —
    when `n_pos` is given — the quasidefinite inertia (first n_pos pivots
    positive, rest negative), the role of the reference's inertia test
    (factorize_with_correct_inertia, LinearSystem.C:296-325)."""
    ok = (jnp.all(jnp.isfinite(X)) & jnp.all(jnp.isfinite(d))
          & jnp.all(jnp.abs(d) > 0.0))
    if n_pos is not None:
        ok = ok & jnp.all(d[:, :n_pos] > 0.0) & jnp.all(d[:, n_pos:] < 0.0)
    else:
        ok = ok & jnp.all(d > 0.0)
    return ok
