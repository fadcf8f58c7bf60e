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
program, the batch dimension vectorized across VPU sublanes, with the
sequential (per-column) work confined to tiny [G, 32, 32] diagonal
blocks and everything panel-sized running on the MXU:

  phase 1 (per 32-column panel):
    - ONE fused fori_loop computing the LDL^T of the 32x32 diagonal block
      AND its unit-lower inverse Xkk = Lkk^{-1} in the same column sweep
      (sign-agnostic, no sqrt -> quasidefinite support: one kernel serves
      both the SPD leaf systems and the indefinite root)
    - MXU panel solve      L21 = A21 Xkk^T diag(1/d)
    - MXU trailing update  A22 -= (L21 d) L21^T
  phase 2 (per panel):  blocked forward substitution for X = L^{-1},
    one MXU row-panel update each, reusing the stored Xkk blocks.

Output: X (= L^{-1}, unit lower) and the pivot vector d; the caller gets
A^{-1} = X^T diag(1/d) X with one batched MXU einsum.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PANEL = 16


def _bmm(x, y, transpose_y=False):
    """Batched matmul [G,m,k]@[G,k,n] (or @y^T) on the MXU."""
    dn = (((2,), (2 if transpose_y else 1,)), ((0,), (0,)))
    # Precision pinned so the kernel lowers regardless of the global
    # jax_default_matmul_precision (Mosaic cannot lower 3-pass HIGH).
    return jax.lax.dot_general(x, y, dimension_numbers=dn,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _small_ldl_inv(akk, p):
    """Fused LDL^T + unit-lower inverse of a [G,p,p] symmetric block.

    Returns (Xkk = Lkk^{-1}, d).  One column sweep does both the symmetric
    elimination AND the forward substitution for the inverse: row j of Xkk
    is final when step j runs (steps only touch rows > j), so the L column
    produced at step j can be applied to Xkk immediately — Lkk itself is
    never materialized.

    The working block stays SYMMETRIC on its trailing part (the rank-1
    update colm*rowm is symmetric there and never touches eliminated
    rows/columns), so the pivot row is just the transpose of the pivot
    column: one masked [G,p,p] reduction extracts both, masking happens
    on thin [G,p,1]/[G,1,p] slices, and each step runs two full-block
    fused multiply-subtracts — ~half the full-block ops of the naive
    masked formulation.
    """
    g = akk.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, p, p), 2)
    sub_p1 = jax.lax.broadcasted_iota(jnp.int32, (g, p, 1), 1)
    lane_1p = jax.lax.broadcasted_iota(jnp.int32, (g, 1, p), 2)
    eye = jnp.where(sub_p1 == lane_1p, 1.0, 0.0).astype(akk.dtype)

    def body(j, carry):
        m, xkk, d = carry
        onehot = (lane == j).astype(m.dtype)
        col = jnp.sum(m * onehot, axis=2, keepdims=True)        # [G,p,1]
        piv = jnp.sum(jnp.where(sub_p1 == j, col, 0.0), axis=1,
                      keepdims=True)                            # [G,1,1]
        colraw = jnp.where(sub_p1 > j, col, 0.0)
        colm = colraw / piv                                     # L column
        rowm = jnp.swapaxes(colraw, 1, 2)                       # = row j (sym)
        subhot = (sub_p1 == j).astype(m.dtype)
        xrow = jnp.sum(xkk * subhot, axis=1, keepdims=True)     # [G,1,p]
        m = m - colm * rowm
        xkk = xkk - colm * xrow
        d = jnp.where(lane_1p[:, 0, :] == j, piv[:, :, 0], d)   # [G,p]
        return m, xkk, d

    _, xkk, d = jax.lax.fori_loop(
        0, p, body, (akk, eye, jnp.zeros((g, p), akk.dtype)))
    return xkk, d


def _small_ldl_inv_lanes(akk, p):
    """Lane-major variant of `_small_ldl_inv`: operates on [p, p, G] blocks
    (batch G on the LANES, columns on sublanes) instead of [G, p, p].

    With the (8, 128) f32 vreg tiling, a [G, 16, 16] step touches vregs at
    16/128 lane occupancy; [16, 16, G>=64] runs the same masked updates at
    >=50% occupancy — ~4x less VPU work per sequential step of the
    elimination, which is the latency-critical chain of the whole kernel.
    The trailing working block stays symmetric, so the pivot row/column
    are extracted with two masked reductions (axis 0 / axis 1) and no
    transposes appear inside the loop.
    """
    g = akk.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (p, p, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, p, g), 1)
    row_p1 = jax.lax.broadcasted_iota(jnp.int32, (p, 1, g), 0)
    col_1p = jax.lax.broadcasted_iota(jnp.int32, (1, p, g), 1)
    eye = jnp.where(row == col, 1.0, 0.0).astype(akk.dtype)

    def body(j, carry):
        m, xkk, d = carry
        cj = jnp.sum(m * (col == j).astype(m.dtype), axis=1,
                     keepdims=True)                            # [p,1,G]
        rj = jnp.sum(m * (row == j).astype(m.dtype), axis=0,
                     keepdims=True)                            # [1,p,G]
        piv = jnp.sum(jnp.where(row_p1 == j, cj, 0.0), axis=0,
                      keepdims=True)                           # [1,1,G]
        colm = jnp.where(row_p1 > j, cj, 0.0) / piv            # L column
        rowm = jnp.where(col_1p > j, rj, 0.0)                  # pivot row
        xrow = jnp.sum(xkk * (row == j).astype(m.dtype), axis=0,
                       keepdims=True)                          # [1,p,G]
        m = m - colm * rowm
        xkk = xkk - colm * xrow
        d = jnp.where(row_p1[:, 0, :] == j, piv[0], d)         # [p,G]
        return m, xkk, d

    _, xkk, d = jax.lax.fori_loop(
        0, p, body, (akk, eye, jnp.zeros((p, g), akk.dtype)))
    return xkk, d


def _ldl_kernel(a_ref, x_ref, d_ref, l_ref, xkk_ref, *, a: int, panel: int,
                lane_major: bool = False):
    n_panels = a // panel

    # x_ref doubles as the working (trailing) matrix during phase 1; it is
    # re-initialized for phase 2 once L and d are extracted.
    x_ref[...] = a_ref[...]

    # ---- phase 1: blocked symmetric elimination into l_ref / d_ref ----
    for k in range(n_panels):
        r0 = k * panel
        r1 = r0 + panel
        if lane_major:
            akk_lm = jnp.transpose(x_ref[:, r0:r1, r0:r1], (1, 2, 0))
            xkk_lm, d_lm = _small_ldl_inv_lanes(akk_lm, panel)
            xkk = jnp.transpose(xkk_lm, (2, 0, 1))
            dpan = jnp.transpose(d_lm, (1, 0))
        else:
            xkk, dpan = _small_ldl_inv(x_ref[:, r0:r1, r0:r1], panel)
        xkk_ref[:, :, r0:r1] = xkk
        d_ref[:, 0, r0:r1] = dpan
        if r1 < a:
            # panel solve: L21 = A21 Xkk^T diag(1/d)   (all MXU)
            a21 = x_ref[:, r1:, r0:r1]                   # [G, rem-p, p]
            l21 = _bmm(a21, xkk, transpose_y=True) / dpan[:, None, :]
            l_ref[:, r1:, r0:r1] = l21
            # trailing update: A22 -= (L21 d) L21^T
            x_ref[:, r1:, r1:] = x_ref[:, r1:, r1:] - _bmm(
                l21 * dpan[:, None, :], l21, transpose_y=True)

    # ---- phase 2: X = L^{-1} (unit lower), blocked forward subst ----
    g = x_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, a, a), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, a, a), 2)
    x_ref[...] = jnp.where(rows == cols, 1.0, 0.0).astype(x_ref.dtype)
    for k in range(n_panels):
        r0 = k * panel
        r1 = r0 + panel
        xkk = xkk_ref[:, :, r0:r1]
        if r0 > 0:
            x_ref[:, r0:r1, :r1] = jnp.concatenate(
                [_bmm(xkk, x_ref[:, r0:r1, :r0]), xkk], axis=2)
        else:
            x_ref[:, r0:r1, :r1] = xkk
        # propagate to rows below: X[r1:, :r1] -= L[r1:, r0:r1] X[r0:r1, :r1]
        if r1 < a:
            x_ref[:, r1:, :r1] = x_ref[:, r1:, :r1] - _bmm(
                l_ref[:, r1:, r0:r1], x_ref[:, r0:r1, :r1])


def _pick_group(batch: int, a: int, panel: int) -> int:
    """Largest divisor of `batch` whose total VMEM footprint fits.

    Resident buffers per grid step: input window + output window (each
    DOUBLE-buffered when grid > 1), the [G,a,a] L scratch, the
    [G,panel,a] xkk scratch, and small d buffers — ~9x the [G,a,a]
    window size pipelined (~5x at grid == 1) plus the panel scratch.
    Budget 100MB of the 128MB VMEM."""
    budget = 100 * 1024 * 1024
    blk = a * a * 4
    pblk = panel * a * 4
    best = 1
    for g in range(batch, 0, -1):
        if batch % g:
            continue
        est = (5 if g == batch else 9) * g * blk + g * pblk
        if est <= budget:
            return g
        best = g
    return best


@functools.partial(jax.jit,
                   static_argnames=("interpret", "panel", "lane_major"))
def _ldl_call(A, interpret=False, panel=None, lane_major=False):
    B, a, _ = A.shape
    panel = min(panel or PANEL, a)
    g = _pick_group(B, a, panel)
    grid = B // g
    kern = functools.partial(_ldl_kernel, a=a, panel=panel,
                             lane_major=lane_major)
    # d rides in a [., 8, a] buffer (row 0): a rank-2 (g, a) block would
    # put g on the sublane axis, and Mosaic requires the last two block
    # dims divisible by (8, 128) — at large `a` the VMEM budget forces
    # g < 8 (e.g. g=2 at a=1024), which is legal for the rank-3 blocks
    # (only the LAST TWO dims are constrained) but not for (g, a)
    X, d = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((g, a, a), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((g, a, a), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((g, 8, a), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, a, a), A.dtype),
                   jax.ShapeDtypeStruct((B, 8, a), A.dtype)],
        scratch_shapes=[pltpu.VMEM((g, a, a), A.dtype),
                        pltpu.VMEM((g, panel, a), A.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(A)
    return X, d[:, 0, :]


def ldl_inverse_factors(A: jax.Array, interpret=None, panel=None,
                        lane_major=None):
    """Batched LDL^T of A [B, a, a] -> (X, d) with A^{-1} = X^T D^{-1} X.

    X is L^{-1} (unit lower triangular), d the pivot vector [B, a]
    (negative entries are fine: quasidefinite support).  `interpret`
    defaults to the Pallas interpreter on non-TPU backends so CPU tests
    run unchanged.  Dimensions not divisible by the panel size are padded
    with an identity tail (exact: the padded inverse is block-diagonal).
    `panel` overrides the elimination panel width (default PANEL=16;
    also settable via env PIPS_LDL_PANEL) — larger panels shorten the
    sequential panel chain at the cost of a longer in-panel loop.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if panel is None:
        panel = int(os.environ.get("PIPS_LDL_PANEL", "0")) or None
    if panel is None:
        # panel width by problem size (v5e f32 measurements): wide panels
        # shorten the sequential panel chain and fatten the MXU panel
        # solve / trailing update — [64,1024,1024]: 16 -> 4.6 TFLOP/s,
        # 128 -> 11.0 (72% of this chip's batched-matmul rate);
        # [64,256,256] in-loop factorize: 16 -> 7.1 ms, 32 -> 1.7 ms;
        # at a <= 128 the in-panel VPU steps dominate and 16 wins
        a_dim = A.shape[-1]
        panel = 128 if a_dim >= 512 else (32 if a_dim >= 256 else None)
    if lane_major is None:
        lane_major = bool(int(os.environ.get("PIPS_LDL_LANES", "0")))
    pw = panel or PANEL
    B, a, _ = A.shape
    # Mosaic requires the last two dims of GRID-SPLIT window blocks to be
    # divisible by (8, 128); a whole-batch (grid == 1) block is legal at
    # any 8-multiple.  So pad `a` to a 128-multiple (identity tail,
    # exact) only when the VMEM budget forces a grid split; the
    # interpreter (CPU tests) keeps the cheaper panel alignment.
    a_pw = a if a <= pw else a + ((-a) % pw)
    fits_whole = (5 * B * a_pw * a_pw + B * pw * a_pw) * 4 \
        <= 100 * 1024 * 1024
    align = pw if (interpret or fits_whole) else max(pw, 128)
    pad = 0 if a <= pw else (-a) % align
    if not interpret and a + pad < 128:
        # sub-128-lane windows have faulted Mosaic at runtime inside
        # fused loops (observed: the ns=32 sparse root inside solve_fused
        # crashed the TPU worker); pad tiny matrices to one full lane
        # tile — extra FLOPs are microscopic at this size
        pad = 128 - a
    if pad:
        eye = jnp.broadcast_to(jnp.eye(pad, dtype=A.dtype), (B, pad, pad))
        Ap = jnp.zeros((B, a + pad, a + pad), A.dtype)
        Ap = Ap.at[:, :a, :a].set(A)
        Ap = Ap.at[:, a:, a:].set(eye)
        X, d = _ldl_call(Ap, interpret=interpret, panel=panel,
                         lane_major=lane_major)
        return X[:, :a, :a], d[:, :a]
    return _ldl_call(A, interpret=interpret, panel=panel,
                     lane_major=lane_major)


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
