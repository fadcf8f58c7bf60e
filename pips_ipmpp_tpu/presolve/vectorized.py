"""Vectorized row-scope machinery for the presolve passes.

The reference presolves millions of rows through C++ loops over dynamic CSR
(PresolveData.C); the round-1 passes here iterated Python tuples per row —
O(rows) interpreter work per round.  This module replaces the row scans
with batched numpy over the padded block arrays: every scope (first-stage
rows, all block rows batched [N, m, k], linking rows) is processed with a
handful of array ops, and only the (few) rows/columns that actually reduce
are touched individually through the event-logging PresolveData API.

Scopes (matching the reference's per-node processing,
StochPresolverBase.C::updatePointersForCurrentNode):
  - "first": eq rows A0 [m0E, n0] / ineq C0 — columns are first-stage only
  - "block": eq rows [A|B] [N, mE, n0+n] / ineq [C|D] — batched over blocks
  - "link":  eq rows [F0 | F_1 .. F_N] [mEl, n0+N*n] / ineq [G0 | G..]
"""
from __future__ import annotations

import numpy as np

from pips_ipmpp_tpu.presolve.data import FIRST, LINK, PresolveData


def var_bound_arrays(pd: PresolveData):
    """(lo0, up0, loN, upN) in +-inf form."""
    lo0 = np.where(pd.ixlow0 > 0, pd.xlow0, -np.inf)
    up0 = np.where(pd.ixupp0 > 0, pd.xupp0, np.inf)
    loN = np.where(pd.ixlowN > 0, pd.xlowN, -np.inf)
    upN = np.where(pd.ixuppN > 0, pd.xuppN, np.inf)
    return lo0, up0, loN, upN


class Scope:
    """One vectorized row scope: coefficient matrix K over flat columns,
    with maps back to (var_blk, j) and (row_blk, r)."""

    def __init__(self, kind: str, K: np.ndarray, active: np.ndarray,
                 lo: np.ndarray, up: np.ndarray):
        self.kind = kind          # "first" | "block" | "link"
        self.K = K                # [m, k] or [N, m, k]
        self.active = active      # [m] or [N, m] bool
        self.lo = lo              # [k] or [N, k] column lower bounds
        self.up = up

    # ---- flat column index -> (var_blk, j) ----
    def col_id(self, i_blk, flat_j, n0, n):
        if self.kind == "first":
            return FIRST, int(flat_j)
        if self.kind == "block":
            return ((FIRST, int(flat_j)) if flat_j < n0
                    else (int(i_blk), int(flat_j - n0)))
        # link: [n0 | N*n]
        if flat_j < n0:
            return FIRST, int(flat_j)
        off = flat_j - n0
        return int(off // n), int(off % n)


def eq_scopes(pd: PresolveData):
    lo0, up0, loN, upN = var_bound_arrays(pd)
    N = pd.N
    out = []
    if pd.A0.shape[0]:
        out.append((Scope("first", pd.A0, pd.rowE_active0, lo0, up0),
                    pd.b0, pd.b0))
    if pd.B.shape[0] and pd.B.shape[1]:
        K = np.concatenate([pd.A, pd.B], axis=2)          # [N, mE, n0+n]
        lo = np.concatenate([np.broadcast_to(lo0, (N, lo0.size)), loN], 1)
        up = np.concatenate([np.broadcast_to(up0, (N, up0.size)), upN], 1)
        out.append((Scope("block", K, pd.rowE_activeN, lo, up),
                    pd.bN, pd.bN))
    if pd.F0.shape[0]:
        K = np.concatenate(
            [pd.F0, np.swapaxes(pd.F, 0, 1).reshape(pd.F0.shape[0], -1)], 1)
        lo = np.concatenate([lo0, loN.reshape(-1)])
        up = np.concatenate([up0, upN.reshape(-1)])
        out.append((Scope("link", K, pd.rowE_activel, lo, up),
                    pd.bl, pd.bl))
    return out


def ineq_scopes(pd: PresolveData):
    lo0, up0, loN, upN = var_bound_arrays(pd)
    N = pd.N
    out = []

    def rb(il, lo_r, iu, up_r):
        return (np.where(il > 0, lo_r, -np.inf),
                np.where(iu > 0, up_r, np.inf))

    if pd.C0.shape[0]:
        lo_r, up_r = rb(pd.iclow0, pd.clow0, pd.icupp0, pd.cupp0)
        out.append((Scope("first", pd.C0, pd.rowI_active0, lo0, up0),
                    lo_r, up_r))
    if pd.D.shape[0] and pd.D.shape[1]:
        K = np.concatenate([pd.C, pd.D], axis=2)
        lo = np.concatenate([np.broadcast_to(lo0, (N, lo0.size)), loN], 1)
        up = np.concatenate([np.broadcast_to(up0, (N, up0.size)), upN], 1)
        lo_r, up_r = rb(pd.iclowN, pd.clowN, pd.icuppN, pd.cuppN)
        out.append((Scope("block", K, pd.rowI_activeN, lo, up), lo_r, up_r))
    if pd.G0.shape[0]:
        K = np.concatenate(
            [pd.G0, np.swapaxes(pd.G, 0, 1).reshape(pd.G0.shape[0], -1)], 1)
        lo = np.concatenate([lo0, loN.reshape(-1)])
        up = np.concatenate([up0, upN.reshape(-1)])
        lo_r, up_r = rb(pd.iclowl, pd.clowl, pd.icuppl, pd.cuppl)
        out.append((Scope("link", K, pd.rowI_activel, lo, up), lo_r, up_r))
    return out


def activity(scope: Scope):
    """Row activity bounds, inf-aware (reference PresolveData activity
    tracking, PresolveData.C:1520+).

    Returns dict with mins/maxs [., m, k] per-entry contributions,
    finite sums, inf counts, and min_act/max_act [., m]."""
    K, lo, up = scope.K, scope.lo, scope.up
    if K.ndim == 3:
        lo = lo[:, None, :]
        up = up[:, None, :]
    with np.errstate(invalid="ignore"):
        mins = np.where(K > 0, K * lo, np.where(K < 0, K * up, 0.0))
        maxs = np.where(K > 0, K * up, np.where(K < 0, K * lo, 0.0))
    neg_inf = np.sum(np.isneginf(mins), axis=-1)
    pos_inf = np.sum(np.isposinf(maxs), axis=-1)
    fin_min = np.sum(np.where(np.isfinite(mins), mins, 0.0), axis=-1)
    fin_max = np.sum(np.where(np.isfinite(maxs), maxs, 0.0), axis=-1)
    min_act = np.where(neg_inf > 0, -np.inf, fin_min)
    max_act = np.where(pos_inf > 0, np.inf, fin_max)
    return dict(mins=mins, maxs=maxs, neg_inf=neg_inf, pos_inf=pos_inf,
                fin_min=fin_min, fin_max=fin_max,
                min_act=min_act, max_act=max_act,
                nnz=np.count_nonzero(K, axis=-1))


def implied_col_bounds(scope: Scope, act: dict, lo_r, up_r):
    """Per-entry implied variable bounds from each row (vectorized form of
    the round-1 per-row loop; reference StochPresolverBoundStrengthening).

    Returns (cand_lo, cand_up) with +-inf where no implication; only
    entries of rows with nnz >= 2 and active rows carry candidates."""
    K = scope.K
    mins, maxs = act["mins"], act["maxs"]
    fin_min, fin_max = act["fin_min"], act["fin_max"]
    neg_inf, pos_inf = act["neg_inf"], act["pos_inf"]

    inf_lo_others = neg_inf[..., None] - np.isneginf(mins)
    inf_hi_others = pos_inf[..., None] - np.isposinf(maxs)
    min_others = np.where(
        inf_lo_others > 0, -np.inf,
        fin_min[..., None] - np.where(np.isfinite(mins), mins, 0.0))
    max_others = np.where(
        inf_hi_others > 0, np.inf,
        fin_max[..., None] - np.where(np.isfinite(maxs), maxs, 0.0))

    lo_r = np.asarray(lo_r)[..., None]
    up_r = np.asarray(up_r)[..., None]
    with np.errstate(invalid="ignore"):
        hi = up_r - min_others          # a x_j <= hi
        lo2 = lo_r - max_others         # a x_j >= lo2
        cand_up = np.where(K > 0, hi / np.where(K != 0, K, 1.0),
                           np.where(K < 0, lo2 / np.where(K != 0, K, 1.0),
                                    np.inf))
        cand_lo = np.where(K > 0, lo2 / np.where(K != 0, K, 1.0),
                           np.where(K < 0, hi / np.where(K != 0, K, 1.0),
                                    -np.inf))
    usable = ((K != 0) & (act["nnz"] >= 2)[..., None]
              & scope.active[..., None])
    cand_up = np.where(usable & np.isfinite(cand_up), cand_up, np.inf)
    cand_lo = np.where(usable & np.isfinite(cand_lo), cand_lo, -np.inf)
    cand_up = np.where(np.isnan(cand_up), np.inf, cand_up)
    cand_lo = np.where(np.isnan(cand_lo), -np.inf, cand_lo)
    return cand_lo, cand_up
