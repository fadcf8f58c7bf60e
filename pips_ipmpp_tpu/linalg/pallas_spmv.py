"""Tiled sparse matvec on TPU: within-tile lane gathers at VPU speed.

The reference's sparse leaf engine is PARDISO's supernodal LDL^T over CSR
blocks (PardisoSchurSolver.C:84-252, SparseStorage.C).  A TPU has no
scalar-speculation machinery to chase CSR pointers; its one fast
irregular-data primitive is `tpu.dynamic_gather` — a per-lane gather
WITHIN a 128-lane vector register, vectorized across sublanes.  This
module builds the sparse matvec out of exactly that primitive:

- The matrix is cut into 128x128 tiles (static, host-side).  Entries of
  tile (rt, ct) are stacked into "passes": pass p holds, for each of the
  128 output lanes (rows), at most one (source-lane, weight) pair —
  the p-th nonzero of that row inside the tile.
- Vectors are carried TRANSPOSED and tiled: x_tiles [N, n/128, c, 128]
  (c right-hand sides on sublanes, 128 columns on lanes).
- One pass = one `jnp.take_along_axis(x_tile, idx, axis=1)` (the Mosaic
  dynamic-gather, ~1 element/lane/cycle) + one FMA on [c, 128].

Cost: ceil-ish(nnz_tile / 128) passes per tile; measured ~4-5 ns per
nonzero at [8 blocks, 2048x2048, 10 nnz/row, 24 rhs] vs ~35 ns/nnz for
XLA's gather on the same shapes (the 259 s round-4 sparse TTO bottleneck).

Padding entries carry weight 0 and in-tile index 0, so no masking is
needed anywhere; padded lanes/rows of the vector tiles stay exactly zero
through the whole CG loop.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@dataclass(frozen=True)
class TiledEll:
    """Static tiled sparsity: idx/w [N, mt, P, 128] (P = ct*maxp padded
    to a multiple of 8).  Registered as a pytree so it can ride through
    jit; idx/w are the only array leaves."""
    idx: jax.Array
    w: jax.Array
    m: int
    n: int
    maxp: int

    @property
    def N(self) -> int:
        return self.idx.shape[0]

    @property
    def mt(self) -> int:
        return self.idx.shape[1]

    @property
    def ct(self) -> int:
        return -(-self.n // 128)

    @property
    def m_pad(self) -> int:
        return self.mt * 128

    @property
    def n_pad(self) -> int:
        return self.ct * 128


jax.tree_util.register_pytree_node(
    TiledEll,
    lambda t: ((t.idx, t.w), (t.m, t.n, t.maxp)),
    lambda aux, ch: TiledEll(ch[0], ch[1], *aux))


def build_tiled(col, val, m: int, n: int, transpose: bool = False,
                dtype=np.float32) -> TiledEll:
    """Host-side: batched ELL (col/val [N, m, K], padded entries val==0)
    -> TiledEll for y = M @ x (or y = M' @ x when transpose=True).

    Note zero-valued entries are dropped (padding is val==0 by
    construction, core/sparse.py ell_from_*)."""
    col = np.asarray(col)
    val = np.asarray(val)
    N, rows, K = col.shape
    assert rows == m, (rows, m)
    out_rows, in_cols = (n, m) if transpose else (m, n)
    mt, ct = -(-out_rows // 128), -(-in_cols // 128)
    per_block = []
    maxp = 1
    base_r = np.repeat(np.arange(rows, dtype=np.int64), K)
    for b in range(N):
        c = col[b].ravel().astype(np.int64)
        v = val[b].ravel()
        keep = v != 0.0
        r, c, v = base_r[keep], c[keep], v[keep]
        if transpose:
            r, c = c, r
        rt, ctile = r // 128, c // 128
        r_loc, c_loc = r % 128, c % 128
        key = (rt * ct + ctile) * 128 + r_loc
        order = np.argsort(key, kind="stable")
        ks = key[order]
        slot = np.arange(len(ks)) - np.searchsorted(ks, ks, side="left")
        per_block.append((rt[order], ctile[order], r_loc[order],
                          c_loc[order], v[order], slot))
        if len(ks):
            maxp = max(maxp, int(slot.max()) + 1)
    P = ct * maxp
    P_pad = -(-P // 8) * 8
    idx = np.zeros((N, mt, P_pad, 128), np.int32)
    w = np.zeros((N, mt, P_pad, 128), dtype)
    for b, (rt, ctile, r_loc, c_loc, v, slot) in enumerate(per_block):
        idx[b, rt, ctile * maxp + slot, r_loc] = c_loc
        w[b, rt, ctile * maxp + slot, r_loc] = v
    return TiledEll(jnp.asarray(idx), jnp.asarray(w), out_rows, in_cols,
                    maxp)


def to_tiles(x, n_pad: int):
    """[N, c, n] -> [N, n_pad/128, c_pad, 128] (zero-padded; c is padded
    to a multiple of 8 for the (8,128) tile rule)."""
    N, c, n = x.shape
    c_pad = -(-c // 8) * 8
    xp = jnp.pad(x, ((0, 0), (0, c_pad - c), (0, n_pad - n)))
    return jnp.swapaxes(xp.reshape(N, c_pad, n_pad // 128, 128), 1, 2)


def from_tiles(y, m: int, c: int | None = None):
    """[N, mt, c_pad, 128] -> [N, c, m]."""
    N, mt, c_pad, _ = y.shape
    out = jnp.swapaxes(y, 1, 2).reshape(N, c_pad, mt * 128)[:, :, :m]
    return out if c is None else out[:, :c]


def _pick_group(mt: int, P_pad: int, c: int, ct: int, dtype) -> int:
    """Row-tiles per grid step: keep the streamed idx/w blocks plus the
    resident table under a VMEM budget."""
    esize = jnp.dtype(dtype).itemsize
    table = ct * c * 128 * esize
    budget = 10 * 1024 * 1024 - table
    per_rt = P_pad * 128 * (4 + esize) + c * 128 * esize
    g = max(1, min(mt, int(budget // max(per_rt, 1))))
    while mt % g:
        g -= 1
    return g


def tiled_spmv(te: TiledEll, x_tiles, interpret: bool | None = None):
    """y_tiles [N, mt, c, 128] = M @ x for x_tiles [N, ct, c, 128]."""
    if interpret is None:
        interpret = not _on_tpu()
    N, ct_in, c, _ = x_tiles.shape
    assert ct_in == te.ct, (ct_in, te.ct)
    mt, maxp, P_pad = te.mt, te.maxp, te.idx.shape[2]
    ct = te.ct
    dtype = x_tiles.dtype
    g = _pick_group(mt, P_pad, c, ct, dtype)

    def kern(idx_ref, w_ref, x_ref, y_ref):
        # the ct loop is a lax.fori (compiled body size O(maxp), not
        # O(ct*maxp): at 8192-class shapes a fully unrolled ct=64 x
        # maxp=5 body made Mosaic compiles take tens of minutes)
        for rr in range(g):
            def ct_body(t, acc):
                xt = x_ref[0, t]
                for p in range(maxp):
                    row = t * maxp + p
                    ii = jnp.broadcast_to(
                        idx_ref[0, rr, row, :].reshape(1, 128), (c, 128))
                    gath = jnp.take_along_axis(xt, ii, axis=1)
                    acc = acc + w_ref[0, rr, row, :].reshape(1, 128) * gath
                return acc
            y_ref[0, rr] = jax.lax.fori_loop(
                0, ct, ct_body, jnp.zeros((c, 128), dtype))

    return pl.pallas_call(
        kern,
        grid=(N, mt // g),
        in_specs=[
            pl.BlockSpec((1, g, P_pad, 128), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, P_pad, 128), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, c, 128), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, c, 128), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, mt, c, 128), dtype),
        interpret=interpret,
    )(te.idx, te.w.astype(dtype), x_tiles)
