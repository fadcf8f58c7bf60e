"""Postsolve: reverse replay of presolve events to reconstruct the
original-space primal/dual solution (reference StochPostsolver.C:
`postsolve()` replays `ReductionType` notifications in reverse,
StochPostsolver.h:95-107).

Because presolve deactivates rather than compacts (see presolve.data), all
indices are original indices: the presolved solution arrays are already
index-aligned with the original problem; replay only needs to (1) write
fixed variables back, (2) reconstruct duals of removed rows, (3) transfer
multipliers from presolve-introduced variable bounds back to their
originating rows, and (4) recompute bound duals from reduced costs.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pips_ipmpp_tpu.core.lp import ArrowheadLP
from pips_ipmpp_tpu.presolve.data import FIRST, LINK

POSTSOLVE_TOLERANCE = 1e-6


@dataclass
class Solution:
    """Original-space solution in numpy (x0/xN etc. index-identical)."""
    x0: np.ndarray
    xN: np.ndarray
    y0: np.ndarray
    yN: np.ndarray
    yl: np.ndarray
    z0: np.ndarray
    zN: np.ndarray
    zl: np.ndarray
    gamma0: np.ndarray = None
    gammaN: np.ndarray = None
    phi0: np.ndarray = None
    phiN: np.ndarray = None

    def x(self, blk):
        return self.x0 if blk == FIRST else self.xN[blk]

    def ydual(self, blk):
        if blk == FIRST:
            return self.y0
        if blk == LINK:
            return self.yl
        return self.yN[blk]

    def zdual(self, blk):
        if blk == FIRST:
            return self.z0
        if blk == LINK:
            return self.zl
        return self.zN[blk]


# ---- numpy matvecs over the original arrowhead arrays ----

def np_ATy_col(lp, sol: Solution, blk, j):
    """(A'y + C'z) entry for variable (blk, j) against ORIGINAL matrices."""
    if blk == FIRST:
        val = (lp.A0[:, j] @ sol.y0 + lp.C0[:, j] @ sol.z0
               + lp.F0[:, j] @ sol.yl + lp.G0[:, j] @ sol.zl)
        val += sum(lp.A[i][:, j] @ sol.yN[i] + lp.C[i][:, j] @ sol.zN[i]
                   for i in range(lp.N))
        return val
    return (lp.B[blk][:, j] @ sol.yN[blk] + lp.D[blk][:, j] @ sol.zN[blk]
            + lp.F[blk][:, j] @ sol.yl + lp.G[blk][:, j] @ sol.zl)


def np_c(lp, blk, j):
    return lp.c0[j] if blk == FIRST else lp.cN[blk, j]


def np_row_activity_ineq(lp, sol: Solution, blk, r):
    if blk == FIRST:
        return lp.C0[r] @ sol.x0
    if blk == LINK:
        return lp.G0[r] @ sol.x0 + sum(
            lp.G[i][r] @ sol.xN[i] for i in range(lp.N))
    return lp.C[blk][r] @ sol.x0 + lp.D[blk][r] @ sol.xN[blk]


class Postsolver:
    """Replays the event log in reverse over the original problem."""

    def __init__(self, original_lp: ArrowheadLP):
        # numpy copies of the ORIGINAL (pre-presolve) problem
        import dataclasses as dc
        self.lp = type("LPnp", (), {})()
        for f in dc.fields(original_lp):
            setattr(self.lp, f.name,
                    np.array(getattr(original_lp, f.name), dtype=np.float64))
        self.lp.N = original_lp.N

    def postsolve(self, events, sol: Solution) -> Solution:
        lp = self.lp
        for ev in reversed(events):
            k = ev.kind
            d = ev.data
            if k == "FIXED_COLUMN":
                blk, j, val = d["blk"], d["j"], d["val"]
                sol.x(blk)[j] = val
                if d.get("reason") == "singleton_eq_row":
                    rb, r, a = d["row_blk"], d["row_idx"], d["row_coef"]
                    # y_r from the fixed variable's stationarity in the
                    # problem state at removal time (stored active column)
                    acc = 0.0
                    for (cb, cr, ca) in d["eq_col"]:
                        if not (cb == rb and cr == r):
                            acc += ca * sol.ydual(cb)[cr]
                    for (cb, cr, ca) in d["iq_col"]:
                        acc += ca * sol.zdual(cb)[cr]
                    sol.ydual(rb)[r] = (d["c"] - acc) / a
            elif k == "NEARLY_PARALLEL_SUB":
                # rows: row_s: rest.x + a2 x2 = b_s; row_o = kf*row_s on
                # the shared support plus its own singleton a1 x1.
                # Presolve substituted x2 = t x1 + d and dropped row_s
                # (StochPresolverParallelRows.C:788-876).  Reverse:
                #   x2 = t x1 + d   (t = 0: x2 restored by FIXED_COLUMN)
                #   y_s = c2/a2 (x2 appears only in row_s originally)
                #   y_o -= y_s/kf  (shared-support stationarity)
                vb2, j2, a2 = d["vb2"], d["j2"], d["a2"]
                if d["t"] != 0.0:
                    x1 = sol.x(d["vb1"])[d["j1"]]
                    sol.x(vb2)[j2] = d["t"] * x1 + d["d"]
                y_s = d["c2"] / a2
                rs, ro = d["row_s"], d["row_o"]
                sol.ydual(rs[0])[rs[1]] = y_s
                sol.ydual(ro[0])[ro[1]] -= y_s / d["k"]
            elif k == "SINGLETON_COLUMN":
                vb, j, a = d["vb"], d["j"], d["a"]
                acc = 0.0
                for (kb, kk, ak) in d["row_coeffs"]:
                    if kb == vb and kk == j:
                        continue
                    acc += ak * sol.x(kb)[kk]
                sol.x(vb)[j] = (d["b"] - acc) / a
                sol.ydual(d["row_blk"])[d["row_idx"]] = d["c"] / a
            elif k == "REMOVED_INEQ_ROW" and d["reason"] == "singleton_row":
                blk, r = d["blk"], d["r"]
                vb, j, a = d["var_blk"], d["j"], d["coef"]
                old_lo, old_up = d["old_var_bounds"]
                xj = sol.x(vb)[j]
                red = np_c(lp, vb, j) - np_ATy_col(lp, sol, vb, j)
                at_orig_lo = np.isfinite(old_lo) and xj <= old_lo + 1e-7
                at_orig_up = np.isfinite(old_up) and xj >= old_up - 1e-7
                if abs(red) > 1e-9 and not (at_orig_lo or at_orig_up):
                    # multiplier belongs to the removed row
                    sol.zdual(blk)[r] = red / a
            elif k == "REMOVED_INEQ_ROW" and d["reason"] == "parallel_row":
                blk, r = d["blk"], d["r"]
                kb, kr, fac = d["kept_blk"], d["kept_r"], d["factor"]
                zk = sol.zdual(kb)[kr]
                if abs(zk) < 1e-12:
                    continue
                # does the kept row's ORIGINAL bound support this sign?
                row = d["row"]  # candidate's original bounds
                act_k = np_row_activity_ineq(lp, sol, kb, kr)
                krow = self._orig_ineq_bounds(kb, kr)
                ok_kept = ((zk > 0 and krow[0] > 0
                            and abs(act_k - krow[1]) < 1e-6)
                           or (zk < 0 and krow[2] > 0
                               and abs(act_k - krow[3]) < 1e-6))
                if not ok_kept:
                    # move it to the candidate row (scaled)
                    sol.zdual(blk)[r] = zk / fac
                    sol.zdual(kb)[kr] = 0.0
            # REMOVED_EQ_ROW / TIGHTENED_BOUNDS / other REMOVED_INEQ_ROW:
            # duals stay zero; bounds restored implicitly (original lp)

        # final: bound duals from reduced costs
        self._recompute_bound_duals(sol)
        return sol

    def _orig_ineq_bounds(self, blk, r):
        lp = self.lp
        if blk == FIRST:
            return (lp.iclow0[r], lp.clow0[r], lp.icupp0[r], lp.cupp0[r])
        if blk == LINK:
            return (lp.iclowl[r], lp.clowl[r], lp.icuppl[r], lp.cuppl[r])
        return (lp.iclowN[blk, r], lp.clowN[blk, r],
                lp.icuppN[blk, r], lp.cuppN[blk, r])

    def _recompute_bound_duals(self, sol: Solution):
        lp = self.lp
        red0 = lp.c0 - self._ATy_full(sol, FIRST)
        sol.gamma0 = np.where(lp.ixlow0 > 0, np.maximum(red0, 0.0), 0.0)
        sol.phi0 = np.where(lp.ixupp0 > 0, np.maximum(-red0, 0.0), 0.0)
        gN, pN = [], []
        for i in range(lp.N):
            redi = lp.cN[i] - self._ATy_full(sol, i)
            gN.append(np.where(lp.ixlowN[i] > 0, np.maximum(redi, 0.0), 0.0))
            pN.append(np.where(lp.ixuppN[i] > 0, np.maximum(-redi, 0.0), 0.0))
        sol.gammaN = np.stack(gN) if gN else np.zeros_like(lp.cN)
        sol.phiN = np.stack(pN) if pN else np.zeros_like(lp.cN)

    def _ATy_full(self, sol: Solution, blk):
        lp = self.lp
        if blk == FIRST:
            val = (lp.A0.T @ sol.y0 + lp.C0.T @ sol.z0
                   + lp.F0.T @ sol.yl + lp.G0.T @ sol.zl)
            for i in range(lp.N):
                val = val + lp.A[i].T @ sol.yN[i] + lp.C[i].T @ sol.zN[i]
            return val
        return (lp.B[blk].T @ sol.yN[blk] + lp.D[blk].T @ sol.zN[blk]
                + lp.F[blk].T @ sol.yl + lp.G[blk].T @ sol.zl)


def postsolve_residuals(lp: ArrowheadLP, sol: Solution) -> dict:
    """Stationarity/feasibility/complementarity of the reconstructed
    original-space solution (checked against POSTSOLVE_TOLERANCE, like the
    reference's postsolve validation)."""
    import dataclasses as dc
    lpn = type("LPnp", (), {})()
    for f in dc.fields(lp):
        setattr(lpn, f.name, np.array(getattr(lp, f.name), np.float64))
    lpn.N = lp.N

    out = {}
    # primal feasibility
    eq0 = lpn.A0 @ sol.x0 - lpn.b0
    eqN = [lpn.A[i] @ sol.x0 + lpn.B[i] @ sol.xN[i] - lpn.bN[i]
           for i in range(lpn.N)]
    eql = lpn.F0 @ sol.x0 + sum(
        lpn.F[i] @ sol.xN[i] for i in range(lpn.N)) - lpn.bl
    out["eq"] = max([_mx(eq0)] + [_mx(e) for e in eqN] + [_mx(eql)])

    def ineq_violation(act, il, lo, iu, up):
        v = np.zeros_like(act)
        v = np.maximum(v, np.where(il > 0, lo - act, 0.0))
        v = np.maximum(v, np.where(iu > 0, act - up, 0.0))
        return _mx(v)

    act0 = lpn.C0 @ sol.x0
    out["ineq"] = ineq_violation(act0, lpn.iclow0, lpn.clow0,
                                 lpn.icupp0, lpn.cupp0)
    for i in range(lpn.N):
        acti = lpn.C[i] @ sol.x0 + lpn.D[i] @ sol.xN[i]
        out["ineq"] = max(out["ineq"], ineq_violation(
            acti, lpn.iclowN[i], lpn.clowN[i], lpn.icuppN[i], lpn.cuppN[i]))
    actl = lpn.G0 @ sol.x0 + sum(
        lpn.G[i] @ sol.xN[i] for i in range(lpn.N))
    out["ineq"] = max(out["ineq"], ineq_violation(
        actl, lpn.iclowl, lpn.clowl, lpn.icuppl, lpn.cuppl))

    def bound_violation(x, il, lo, iu, up):
        v = np.maximum(np.maximum(np.where(il > 0, lo - x, 0.0),
                                  np.where(iu > 0, x - up, 0.0)), 0.0)
        return _mx(v)

    out["bounds"] = bound_violation(sol.x0, lpn.ixlow0, lpn.xlow0,
                                    lpn.ixupp0, lpn.xupp0)
    for i in range(lpn.N):
        out["bounds"] = max(out["bounds"], bound_violation(
            sol.xN[i], lpn.ixlowN[i], lpn.xlowN[i],
            lpn.ixuppN[i], lpn.xuppN[i]))

    # dual stationarity: c - A'y - C'z - gamma + phi = 0
    r0 = (lpn.c0 - lpn.A0.T @ sol.y0 - lpn.C0.T @ sol.z0
          - lpn.F0.T @ sol.yl - lpn.G0.T @ sol.zl
          - sum(lpn.A[i].T @ sol.yN[i] + lpn.C[i].T @ sol.zN[i]
                for i in range(lpn.N))
          - sol.gamma0 + sol.phi0)
    out["stat"] = _mx(r0)
    for i in range(lpn.N):
        ri = (lpn.cN[i] - lpn.B[i].T @ sol.yN[i] - lpn.D[i].T @ sol.zN[i]
              - lpn.F[i].T @ sol.yl - lpn.G[i].T @ sol.zl
              - sol.gammaN[i] + sol.phiN[i])
        out["stat"] = max(out["stat"], _mx(ri))
    return out


def _mx(v):
    return float(np.max(np.abs(v))) if np.size(v) else 0.0
