"""Presolve passes, run in the reference's registration order
(StochPresolver.C:36-50): ModelCleanup -> SingletonRows -> ColumnFixation ->
ParallelRows -> BoundStrengthening.  Host-side numpy (control-heavy, off the
IPM hot path — the same position presolve occupies in the reference).

Each pass returns the number of reductions applied.
"""
from __future__ import annotations

import numpy as np

from pips_ipmpp_tpu.presolve.data import FIRST, LINK, PresolveData

TINY_ABS = 1e-12
TINY_REL = 1e-10
FEASTOL = 1e-9


# ----------------------------------------------------------------------
# row iteration helpers: yield (blk, r, coeffs: list[(var_blk, j, a)],
#                               rhs-ish data)
# ----------------------------------------------------------------------

def _eq_rows(pd: PresolveData):
    for r in np.nonzero(pd.rowE_active0)[0]:
        coeffs = [(FIRST, int(j), pd.A0[r, j])
                  for j in np.nonzero(pd.A0[r])[0]]
        yield FIRST, int(r), coeffs, float(pd.b0[r])
    for i in range(pd.N):
        for r in np.nonzero(pd.rowE_activeN[i])[0]:
            coeffs = ([(FIRST, int(j), pd.A[i][r, j])
                       for j in np.nonzero(pd.A[i][r])[0]]
                      + [(i, int(j), pd.B[i][r, j])
                         for j in np.nonzero(pd.B[i][r])[0]])
            yield i, int(r), coeffs, float(pd.bN[i, r])
    for r in np.nonzero(pd.rowE_activel)[0]:
        coeffs = [(FIRST, int(j), pd.F0[r, j])
                  for j in np.nonzero(pd.F0[r])[0]]
        for i in range(pd.N):
            coeffs += [(i, int(j), pd.F[i][r, j])
                       for j in np.nonzero(pd.F[i][r])[0]]
        yield LINK, int(r), coeffs, float(pd.bl[r])


def _ineq_rows(pd: PresolveData):
    def bnds(il, lo, iu, up):
        return (float(il), float(lo), float(iu), float(up))

    for r in np.nonzero(pd.rowI_active0)[0]:
        coeffs = [(FIRST, int(j), pd.C0[r, j])
                  for j in np.nonzero(pd.C0[r])[0]]
        yield FIRST, int(r), coeffs, bnds(pd.iclow0[r], pd.clow0[r],
                                          pd.icupp0[r], pd.cupp0[r])
    for i in range(pd.N):
        for r in np.nonzero(pd.rowI_activeN[i])[0]:
            coeffs = ([(FIRST, int(j), pd.C[i][r, j])
                       for j in np.nonzero(pd.C[i][r])[0]]
                      + [(i, int(j), pd.D[i][r, j])
                         for j in np.nonzero(pd.D[i][r])[0]])
            yield i, int(r), coeffs, bnds(pd.iclowN[i, r], pd.clowN[i, r],
                                          pd.icuppN[i, r], pd.cuppN[i, r])
    for r in np.nonzero(pd.rowI_activel)[0]:
        coeffs = [(FIRST, int(j), pd.G0[r, j])
                  for j in np.nonzero(pd.G0[r])[0]]
        for i in range(pd.N):
            coeffs += [(i, int(j), pd.G[i][r, j])
                       for j in np.nonzero(pd.G[i][r])[0]]
        yield LINK, int(r), coeffs, bnds(pd.iclowl[r], pd.clowl[r],
                                         pd.icuppl[r], pd.cuppl[r])


def _var_bounds(pd, vb, j):
    _, ixl, xl, ixu, xu, _ = pd.var_arrays(vb)
    lo = xl[j] if ixl[j] > 0 else -np.inf
    up = xu[j] if ixu[j] > 0 else np.inf
    return lo, up


# ======================================================================
# Pass 1: model cleanup (reference StochPresolverModelCleanup)
# ======================================================================

def model_cleanup(pd: PresolveData) -> int:
    n = 0
    # drop tiny matrix entries (relative to row max)
    for M in (pd.A0, pd.C0, pd.F0, pd.G0):
        n += _drop_tiny(M)
    for M in (pd.A, pd.B, pd.C, pd.D, pd.F, pd.G):
        for i in range(M.shape[0]):
            n += _drop_tiny(M[i])

    # empty rows
    for blk, r, coeffs, b in list(_eq_rows(pd)):
        if not coeffs:
            if abs(b) > FEASTOL:
                pd.infeasible = True
                return n
            pd.remove_eq_row(blk, r, "empty_row")
            n += 1
    for blk, r, coeffs, (il, lo, iu, up) in list(_ineq_rows(pd)):
        if not coeffs:
            if (il > 0 and lo > FEASTOL) or (iu > 0 and up < -FEASTOL):
                pd.infeasible = True
                return n
            pd.remove_ineq_row(blk, r, "empty_row")
            n += 1
    return n


def _drop_tiny(M) -> int:
    if M.size == 0:
        return 0
    from pips_ipmpp_tpu import native
    if M.dtype == np.float64 and M.flags.c_contiguous:
        return native.drop_tiny_entries(M, TINY_ABS, TINY_REL)
    rowmax = np.max(np.abs(M), axis=-1, keepdims=True)
    mask = (np.abs(M) > 0) & ((np.abs(M) < TINY_ABS)
                              | (np.abs(M) < TINY_REL * rowmax))
    M[mask] = 0.0
    return int(mask.sum())


# ======================================================================
# Pass 2: singleton rows (reference StochPresolverSingletonRows)
# ======================================================================

def singleton_rows(pd: PresolveData) -> int:
    n = 0
    changed = True
    while changed and not pd.infeasible:
        changed = False
        for blk, r, coeffs, b in list(_eq_rows(pd)):
            if len(coeffs) != 1:
                continue
            vb, j, a = coeffs[0]
            val = b / a
            lo, up = _var_bounds(pd, vb, j)
            if val < lo - FEASTOL or val > up + FEASTOL:
                pd.infeasible = True
                return n
            pd.remove_eq_row(blk, r, "singleton_row")
            pd.fix_variable(vb, j, val, reason="singleton_eq_row")
            # annotate the FIXED_COLUMN event with its defining row
            pd.events[-1].data.update(row_blk=blk, row_idx=r, row_coef=a)
            n += 1
            changed = True
        for blk, r, coeffs, (il, lo_r, iu, up_r) in list(_ineq_rows(pd)):
            if len(coeffs) != 1:
                continue
            vb, j, a = coeffs[0]
            if a > 0:
                nl = lo_r / a if il > 0 else None
                nu = up_r / a if iu > 0 else None
            else:
                nl = up_r / a if iu > 0 else None
                nu = lo_r / a if il > 0 else None
            old_lo, old_up = _var_bounds(pd, vb, j)
            pd.remove_ineq_row(blk, r, "singleton_row", var_blk=vb, j=j,
                               coef=a, old_var_bounds=(old_lo, old_up))
            pd.tighten_bounds(vb, j, nl, nu, reason="singleton_ineq_row")
            n += 1
            changed = True
            if pd.infeasible:
                return n
    return n


# ======================================================================
# Pass 3: column fixation (reference StochPresolverColumnFixation)
# ======================================================================

def column_fixation(pd: PresolveData, tol: float = 1e-11) -> int:
    n = 0
    for vb in [FIRST] + list(range(pd.N)):
        c, ixl, xl, ixu, xu, active = pd.var_arrays(vb)
        for j in np.nonzero(active)[0]:
            if ixl[j] > 0 and ixu[j] > 0 and xu[j] - xl[j] < tol:
                pd.fix_variable(vb, int(j), 0.5 * (xl[j] + xu[j]),
                                reason="column_fixation")
                n += 1
    return n


# ======================================================================
# Pass 4: parallel rows (reference StochPresolverParallelRows; exact only)
# ======================================================================

def parallel_rows(pd: PresolveData, tol: float = 1e-12) -> int:
    """Detect proportional rows within the same scope (block-diag rows of
    the same block; first-stage rows; linking rows) and drop duplicates."""
    n = 0
    n += _parallel_eq_scope(pd, list(_eq_rows(pd)), tol)
    n += _parallel_ineq_scope(pd, list(_ineq_rows(pd)), tol)
    return n


def _find_parallel(rows, tol):
    """Detect proportional rows among (blk, r, coeffs, data) items using the
    native C++ detector (pips_ipmpp_tpu.native.detect_parallel_rows) over a
    dense matrix on the union of touched columns; returns a list of
    (kept_item, dup_item, factor) with row_dup = factor * row_kept."""
    import numpy as np

    from pips_ipmpp_tpu import native

    items = [it for it in rows if it[2]]
    if len(items) < 2:
        return []
    cols = {}
    for (_b, _r, coeffs, _d) in items:
        for (vb, j, _a) in coeffs:
            cols.setdefault((vb, j), len(cols))
    M = np.zeros((len(items), len(cols)))
    for i, (_b, _r, coeffs, _d) in enumerate(items):
        for (vb, j, a) in coeffs:
            M[i, cols[(vb, j)]] = a
    kept, dup, fct = native.detect_parallel_rows(M, tol)
    return [(items[int(k)], items[int(d)], float(f))
            for k, d, f in zip(kept, dup, fct)]


def _parallel_eq_scope(pd, rows, tol) -> int:
    n = 0
    for kept, cand, k in _find_parallel(rows, tol):
        if abs(cand[3] - k * kept[3]) > FEASTOL * max(1, abs(cand[3])):
            pd.infeasible = True
            return n
        pd.remove_eq_row(cand[0], cand[1], "parallel_row",
                         kept_blk=kept[0], kept_r=kept[1], factor=k)
        n += 1
    return n


def _parallel_ineq_scope(pd, rows, tol) -> int:
    n = 0
    for kept, cand, k in _find_parallel(rows, tol):
        il_c, lo_c, iu_c, up_c = cand[3]
        if k > 0:
            nl = lo_c / k if il_c > 0 else None
            nu = up_c / k if iu_c > 0 else None
        else:
            nl = up_c / k if iu_c > 0 else None
            nu = lo_c / k if il_c > 0 else None
        _merge_ineq_bounds(pd, kept[0], kept[1], nl, nu)
        pd.remove_ineq_row(cand[0], cand[1], "parallel_row",
                           kept_blk=kept[0], kept_r=kept[1], factor=k)
        n += 1
        if pd.infeasible:
            return n
    return n


def _merge_ineq_bounds(pd, blk, r, nl, nu):
    if blk == FIRST:
        il, lo, iu, up = pd.iclow0, pd.clow0, pd.icupp0, pd.cupp0
        idx = r
    elif blk == LINK:
        il, lo, iu, up = pd.iclowl, pd.clowl, pd.icuppl, pd.cuppl
        idx = r
    else:
        il, lo, iu, up = (pd.iclowN[blk], pd.clowN[blk],
                          pd.icuppN[blk], pd.cuppN[blk])
        idx = r
    if nl is not None and (il[idx] == 0 or nl > lo[idx]):
        il[idx] = 1.0
        lo[idx] = nl
    if nu is not None and (iu[idx] == 0 or nu < up[idx]):
        iu[idx] = 1.0
        up[idx] = nu
    if il[idx] > 0 and iu[idx] > 0 and lo[idx] > up[idx] + FEASTOL:
        pd.infeasible = True


# ======================================================================
# Pass 5: bound strengthening (reference StochPresolverBoundStrengthening)
# ======================================================================

def bound_strengthening(pd: PresolveData, max_tighten: float = 1e8) -> int:
    """Activity-based implied bounds from eq and two-sided ineq rows."""
    n = 0
    for rows, is_eq in ((list(_eq_rows(pd)), True),
                        (list(_ineq_rows(pd)), False)):
        for item in rows:
            if is_eq:
                blk, r, coeffs, b = item
                lo_r = up_r = b
            else:
                blk, r, coeffs, (il, lo_r, iu, up_r) = item
                lo_r = lo_r if il > 0 else -np.inf
                up_r = up_r if iu > 0 else np.inf
            if len(coeffs) < 2:
                continue
            # row activity bounds
            mins, maxs = [], []
            for vb, j, a in coeffs:
                lo, up = _var_bounds(pd, vb, j)
                mins.append(a * lo if a > 0 else a * up)
                maxs.append(a * up if a > 0 else a * lo)
            mins = np.asarray(mins)
            maxs = np.asarray(maxs)
            n_min_inf = int(np.sum(np.isneginf(mins)))
            n_max_inf = int(np.sum(np.isposinf(maxs)))
            fin_min = float(np.sum(mins[np.isfinite(mins)]))
            fin_max = float(np.sum(maxs[np.isfinite(maxs)]))
            for idx, (vb, j, a) in enumerate(coeffs):
                # activity sums excluding idx, inf-aware
                inf_lo = n_min_inf - (1 if np.isneginf(mins[idx]) else 0)
                inf_hi = n_max_inf - (1 if np.isposinf(maxs[idx]) else 0)
                min_others = (-np.inf if inf_lo else
                              fin_min - (mins[idx]
                                         if np.isfinite(mins[idx]) else 0.0))
                max_others = (np.inf if inf_hi else
                              fin_max - (maxs[idx]
                                         if np.isfinite(maxs[idx]) else 0.0))
                # a*x_j <= up_r - min_others ; a*x_j >= lo_r - max_others
                hi = up_r - min_others
                lo2 = lo_r - max_others
                if a > 0:
                    nu = hi / a if np.isfinite(hi) else None
                    nl = lo2 / a if np.isfinite(lo2) else None
                else:
                    nl = hi / a if np.isfinite(hi) else None
                    nu = lo2 / a if np.isfinite(lo2) else None
                cur_lo, cur_up = _var_bounds(pd, vb, j)
                if nl is not None and (abs(nl) > max_tighten
                                       or nl < cur_lo + 1e-7):
                    nl = None
                if nu is not None and (abs(nu) > max_tighten
                                       or nu > cur_up - 1e-7):
                    nu = None
                if nl is not None or nu is not None:
                    if pd.tighten_bounds(vb, j, nl, nu,
                                         reason="bound_strengthening"):
                        n += 1
                    if pd.infeasible:
                        return n
    return n


# ======================================================================
# Pass 6: singleton columns (reference StochPresolverSingletonColumns;
# free column singletons in equality rows)
# ======================================================================

def singleton_columns(pd: PresolveData) -> int:
    """A FREE variable appearing in exactly one equality row can absorb the
    row: substitute x_j = (b_r - rest)/a_j, fold c_j into the objective and
    the row-mates' costs, and remove both the column and the row.  The row
    dual is determined at postsolve: y_r = c_j / a_j."""
    n = 0
    # count active-column occurrences per variable across eq AND ineq rows
    for vb in [FIRST] + list(range(pd.N)):
        c, ixl, xl, ixu, xu, active = pd.var_arrays(vb)
        for j in np.nonzero(active)[0]:
            j = int(j)
            if ixl[j] > 0 or ixu[j] > 0:
                continue                      # only FREE variables
            iq = pd.ineq_column(vb, j)
            if iq:
                continue
            eq = pd.eq_column(vb, j)
            if len(eq) != 1:
                continue
            rb, r, a = eq[0]
            # the defining row's full coefficient list
            row_coeffs = _eq_row_coeffs(pd, rb, r)
            b_r = _eq_rhs(pd, rb, r)
            cj = float(c[j])
            # fold objective: c_j x_j = c_j/a (b_r - sum_{k != j} a_k x_k)
            pd.objective_offset += cj * b_r / a
            for (kb, k, ak) in row_coeffs:
                if kb == vb and k == j:
                    continue
                ck, *_rest = pd.var_arrays(kb)
                ck[k] -= cj * ak / a
            pd.emit("SINGLETON_COLUMN", vb=vb, j=j, a=a, c=cj,
                    row_blk=rb, row_idx=r, row_coeffs=row_coeffs, b=b_r)
            pd.remove_eq_row(rb, r, "singleton_column")
            # deactivate the variable (inert box, zero everywhere)
            pd._zero_column(vb, j)
            c[j] = 0.0
            ixl[j] = 1.0
            xl[j] = -1.0
            ixu[j] = 1.0
            xu[j] = 1.0
            active[j] = False
            n += 1
    return n


def _eq_row_coeffs(pd, blk, r):
    if blk == FIRST:
        return [(FIRST, int(j), float(pd.A0[r, j]))
                for j in np.nonzero(pd.A0[r])[0]]
    if blk == LINK:
        out = [(FIRST, int(j), float(pd.F0[r, j]))
               for j in np.nonzero(pd.F0[r])[0]]
        for i in range(pd.N):
            out += [(i, int(j), float(pd.F[i][r, j]))
                    for j in np.nonzero(pd.F[i][r])[0]]
        return out
    out = [(FIRST, int(j), float(pd.A[blk][r, j]))
           for j in np.nonzero(pd.A[blk][r])[0]]
    out += [(blk, int(j), float(pd.B[blk][r, j]))
            for j in np.nonzero(pd.B[blk][r])[0]]
    return out


def _eq_rhs(pd, blk, r):
    if blk == FIRST:
        return float(pd.b0[r])
    if blk == LINK:
        return float(pd.bl[r])
    return float(pd.bN[blk, r])
