r"""Fused batched symmetric inverse via the blocked SWEEP operator (Pallas).

Alternative to `pallas_ldl.ldl_inverse_factors` + the external
`X^T D^{-1} X` einsum: ONE kernel that turns a batch of symmetric
quasidefinite matrices into their explicit inverses in place (the role of
PARDISO's factor+solve per block in the reference,
PardisoProjectSchurSolver.C:239-252, under the explicit-inverse design of
`ArrowBackend`).

**EXPERIMENTAL — numerically unsuitable for the IPM path, kept for
reference.** Unpivoted Gauss-Jordan has no backward-stability guarantee;
on matrices with IPM-like diagonal spread (cond ~1e12, routine as mu -> 0)
the measured inverse error is O(1) even in f64, whereas unpivoted LDL on
the quasidefinite KKT system is Cholesky-stable (Vanderbei).  Do NOT
enable by default; `ArrowBackend(sweep_kernel=True)` is opt-in for
well-conditioned workloads only.

Why it would beat the LDL kernel on TPU: the sequential pivot chain is the
cost (per-step vector-op issue overhead dominates; the MXU work is tiny),
and the sweep formulation attacks it three ways —

  * 2x2 block pivots: half the sequential steps of scalar-pivot LDL.
    Quasidefinite matrices keep every principal 2x2 pivot block
    invertible (PD / ND / crossing block with det = ac - b^2 < 0), so the
    closed-form 2x2 inverse is always safe — no pivoting search.
  * no phase 2: the sweep produces A^{-1} directly — the blocked forward
    substitution for L^{-1} disappears.
  * no external einsum: the caller gets A^{-1}, not factors, so the
    [B,a,a] x [B,a,a] `X^T D^{-1} X` GEMM disappears too.

Per panel K (width p, static Python loop -> fully unrolled, static
slices):

    B   = inv(m[K,K])                (2x2-pivot small sweep, p/2 steps)
    W   = m[:,K] B                   (MXU)
    m  -= W m[:,K]^T                 (MXU rank-p update of the FULL matrix)
    m[K,:] = W^T,  m[:,K] = W,  m[K,K] = -B

After all panels m = -A^{-1} (standard SWEEP convention); the kernel
returns +A^{-1} and the per-column LDL pivots d (from the 2x2 blocks:
d_{2j} = a, d_{2j+1} = det/a) for the same inertia/health checks as the
LDL kernel (`pallas_ldl.inverse_ok`).
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
    dn = (((2,), (2 if transpose_y else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(x, y, dimension_numbers=dn,
                               preferred_element_type=x.dtype,
                               precision=jax.lax.Precision.HIGHEST)


def _small_sweep_inv(P, p):
    """Inverse + LDL pivots of a [G,p,p] symmetric quasidefinite block.

    2x2 pivot steps (p/2 sequential iterations).  Returns (B = P^{-1},
    d [G,p]).  The working block stays symmetric throughout, so pivot
    rows are transposes of pivot columns."""
    g = P.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, 1, p), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (g, p, 1), 1)
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (g, p), 1)

    def body(j, carry):
        m, d = carry
        j0 = 2 * j
        j1 = j0 + 1
        oh0 = (lane == j0).astype(m.dtype)                  # [G,1,p]
        oh1 = (lane == j1).astype(m.dtype)
        col0 = jnp.sum(m * oh0, axis=2, keepdims=True)      # [G,p,1]
        col1 = jnp.sum(m * oh1, axis=2, keepdims=True)
        sub0 = sub == j0                                    # [G,p,1]
        sub1 = sub == j1
        a = jnp.sum(jnp.where(sub0, col0, 0.0), axis=1, keepdims=True)
        b = jnp.sum(jnp.where(sub1, col0, 0.0), axis=1, keepdims=True)
        c = jnp.sum(jnp.where(sub1, col1, 0.0), axis=1, keepdims=True)
        idet = 1.0 / (a * c - b * b)                        # [G,1,1]
        e00 = c * idet
        e01 = -b * idet
        e11 = a * idet
        W0 = col0 * e00 + col1 * e01                        # [G,p,1]
        W1 = col0 * e01 + col1 * e11
        row0 = jnp.swapaxes(col0, 1, 2)                     # [G,1,p]
        row1 = jnp.swapaxes(col1, 1, 2)
        # full update zeroes the swept rows/cols and the pivot block
        m = m - W0 * row0 - W1 * row1
        # write back: cols <- W (pivot rows already hold -B via Wc),
        # rows <- W^T excluding the pivot columns (avoid double add)
        Wc0 = jnp.where(sub0, -e00, jnp.where(sub1, -e01, W0))
        Wc1 = jnp.where(sub0, -e01, jnp.where(sub1, -e11, W1))
        Wr0 = jnp.where((lane == j0) | (lane == j1), 0.0,
                        jnp.swapaxes(W0, 1, 2))
        Wr1 = jnp.where((lane == j0) | (lane == j1), 0.0,
                        jnp.swapaxes(W1, 1, 2))
        m = (m + Wc0 * oh0 + Wc1 * oh1
             + jnp.where(sub0, Wr0, 0.0) + jnp.where(sub1, Wr1, 0.0))
        a2 = a[:, :, 0]
        safe_a = jnp.where(a2 == 0.0, 1.0, a2)
        d = jnp.where(lane_d == j0, a2, d)
        d = jnp.where(lane_d == j1,
                      (a * c - b * b)[:, :, 0] / safe_a, d)
        return m, d

    m, d = jax.lax.fori_loop(0, p // 2, body,
                             (P, jnp.zeros((g, p), P.dtype)))
    return -m, d


def _sweep_kernel(a_ref, x_ref, d_ref, *, a: int, panel: int):
    n_panels = a // panel
    x_ref[...] = a_ref[...]
    for k in range(n_panels):
        r0 = k * panel
        r1 = r0 + panel
        B, dpan = _small_sweep_inv(x_ref[:, r0:r1, r0:r1], panel)
        d_ref[:, r0:r1] = dpan
        colk = x_ref[:, :, r0:r1]                       # [G,a,p]
        W = _bmm(colk, B)                               # [G,a,p]
        x_ref[...] = x_ref[...] - _bmm(W, colk, transpose_y=True)
        x_ref[:, r0:r1, :] = jnp.swapaxes(W, 1, 2)
        x_ref[:, :, r0:r1] = W
        x_ref[:, r0:r1, r0:r1] = -B
    x_ref[...] = -x_ref[...]


def _pick_group(batch: int, a: int) -> int:
    """Largest divisor of `batch` that fits VMEM: input + output windows
    (double-buffered when grid > 1) — no scratch buffers in this kernel."""
    budget = 100 * 1024 * 1024
    blk = a * a * 4
    for g in range(batch, 0, -1):
        if batch % g:
            continue
        est = (3 if g == batch else 5) * g * blk
        if est <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "panel"))
def _sweep_call(A, interpret=False, panel=None):
    B, a, _ = A.shape
    panel = min(panel or PANEL, a)
    g = _pick_group(B, a)
    grid = B // g
    kern = functools.partial(_sweep_kernel, a=a, panel=panel)
    Ainv, d = pl.pallas_call(
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(A)
    return Ainv, d


def sweep_inverse(A: jax.Array, interpret=None, panel=None):
    """Batched explicit inverse of symmetric quasidefinite A [B, a, a].

    Returns (A^{-1} [B,a,a], d [B,a]) where d are the scalar LDL pivots
    (per 2x2 block: a and det/a) — feed to `pallas_ldl.inverse_ok` for
    the same inertia checks as the LDL-kernel path.  `interpret` defaults
    to the Pallas interpreter off-TPU; sizes not divisible by the panel
    are identity-padded (exact: the padded inverse is block-diagonal)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if panel is None:
        panel = int(os.environ.get("PIPS_SWEEP_PANEL", "0")) or None
    pw = panel or PANEL
    B, a, _ = A.shape
    pad = (-a) % pw
    if pad:
        Ap = jnp.zeros((B, a + pad, a + pad), A.dtype)
        Ap = Ap.at[:, :a, :a].set(A)
        Ap = Ap.at[:, a:, a:].set(
            jnp.broadcast_to(jnp.eye(pad, dtype=A.dtype), (B, pad, pad)))
        Ainv, d = _sweep_call(Ap, interpret=interpret, panel=panel)
        return Ainv[:, :a, :a], d[:, :a]
    return _sweep_call(A, interpret=interpret, panel=panel)
