"""MPS-format reader producing a DenseLP (the serial path; reference
Core/Readers/MpsReader.C).  Supports free-format MPS: NAME, ROWS (N/E/L/G),
COLUMNS, RHS, RANGES, BOUNDS (LO/UP/FX/FR/MI/PL/BV/LI/UI), OBJSENSE,
ENDATA.  Default variable bounds: x >= 0."""
from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from pips_ipmpp_tpu.core.lp import DenseLP


def read_mps(path: str, dtype=jnp.float64) -> DenseLP:
    obj_row = None
    rows = OrderedDict()      # name -> type in {E, L, G}
    cols = OrderedDict()      # name -> {row: val}
    obj = {}
    rhs = {}
    ranges = {}
    bounds = {}               # col -> dict(lo=, up=, ...)
    maximize = False

    section = None
    with open(path) as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("*"):
                continue
            if not line[0].isspace():
                parts = line.split()
                section = parts[0].upper()
                if section == "OBJSENSE" and len(parts) > 1:
                    maximize = parts[1].upper() in ("MAX", "MAXIMIZE")
                continue
            parts = line.split()
            if section == "OBJSENSE":
                maximize = parts[0].upper() in ("MAX", "MAXIMIZE")
            elif section == "ROWS":
                typ, name = parts[0].upper(), parts[1]
                if typ == "N":
                    if obj_row is None:
                        obj_row = name
                else:
                    rows[name] = typ
            elif section == "COLUMNS":
                if len(parts) >= 3 and parts[1].upper() == "'MARKER'":
                    continue  # integer markers ignored (LP relaxation)
                col = parts[0]
                cols.setdefault(col, {})
                for k in range(1, len(parts) - 1, 2):
                    rname, val = parts[k], float(parts[k + 1])
                    if rname == obj_row:
                        obj[col] = obj.get(col, 0.0) + val
                    elif rname in rows:
                        cols[col][rname] = cols[col].get(rname, 0.0) + val
            elif section == "RHS":
                start = 1 if len(parts) % 2 == 1 else 0
                for k in range(start, len(parts) - 1, 2):
                    if parts[k] in rows or parts[k] == obj_row:
                        rhs[parts[k]] = float(parts[k + 1])
            elif section == "RANGES":
                start = 1 if len(parts) % 2 == 1 else 0
                for k in range(start, len(parts) - 1, 2):
                    if parts[k] in rows:
                        ranges[parts[k]] = float(parts[k + 1])
            elif section == "BOUNDS":
                typ = parts[0].upper()
                col = parts[2]
                val = float(parts[3]) if len(parts) > 3 else 0.0
                b = bounds.setdefault(col, {})
                if typ in ("LO", "LI"):
                    b["lo"] = val
                elif typ in ("UP", "UI"):
                    b["up"] = val
                    if val < 0 and "lo" not in b:
                        b["lo"] = -np.inf
                elif typ == "FX":
                    b["lo"] = b["up"] = val
                elif typ == "FR":
                    b["lo"] = -np.inf
                elif typ == "MI":
                    b["lo"] = -np.inf
                elif typ == "PL":
                    b["up"] = np.inf
                elif typ == "BV":
                    b["lo"], b["up"] = 0.0, 1.0
            elif section == "ENDATA":
                break

    col_names = list(cols.keys())
    col_idx = {cn: j for j, cn in enumerate(col_names)}
    n = len(col_names)

    eq_rows = [r for r, t in rows.items() if t == "E" and r not in ranges]
    iq_rows = [r for r, t in rows.items() if t != "E" or r in ranges]

    mE, mI = len(eq_rows), len(iq_rows)
    A = np.zeros((mE, n))
    C = np.zeros((mI, n))
    b = np.zeros(mE)
    iclow = np.zeros(mI)
    clow = np.zeros(mI)
    icupp = np.zeros(mI)
    cupp = np.zeros(mI)

    eq_idx = {r: i for i, r in enumerate(eq_rows)}
    iq_idx = {r: i for i, r in enumerate(iq_rows)}
    for cn, entries in cols.items():
        j = col_idx[cn]
        for rn, val in entries.items():
            if rn in eq_idx:
                A[eq_idx[rn], j] = val
            else:
                C[iq_idx[rn], j] = val
    for r in eq_rows:
        b[eq_idx[r]] = rhs.get(r, 0.0)
    for r in iq_rows:
        i = iq_idx[r]
        t = rows[r]
        rv = rhs.get(r, 0.0)
        rng = ranges.get(r)
        if t == "L":
            icupp[i], cupp[i] = 1.0, rv
            if rng is not None:
                iclow[i], clow[i] = 1.0, rv - abs(rng)
        elif t == "G":
            iclow[i], clow[i] = 1.0, rv
            if rng is not None:
                icupp[i], cupp[i] = 1.0, rv + abs(rng)
        else:  # ranged E row
            if rng is None:
                rng = 0.0
            lo, up = ((rv, rv + rng) if rng >= 0 else (rv + rng, rv))
            iclow[i], clow[i] = 1.0, lo
            icupp[i], cupp[i] = 1.0, up

    ixlow = np.ones(n)
    xlow = np.zeros(n)
    ixupp = np.zeros(n)
    xupp = np.zeros(n)
    for cn, bset in bounds.items():
        if cn not in col_idx:
            continue
        j = col_idx[cn]
        lo = bset.get("lo", 0.0)
        up = bset.get("up", np.inf)
        if np.isfinite(lo):
            ixlow[j], xlow[j] = 1.0, lo
        else:
            ixlow[j], xlow[j] = 0.0, 0.0
        if np.isfinite(up):
            ixupp[j], xupp[j] = 1.0, up

    c = np.array([obj.get(cn, 0.0) for cn in col_names])
    if maximize:
        c = -c

    f = lambda v: jnp.asarray(v, dtype)
    return DenseLP(c=f(c), A=f(A), b=f(b), C=f(C),
                   iclow=f(iclow), clow=f(clow), icupp=f(icupp), cupp=f(cupp),
                   ixlow=f(ixlow), xlow=f(xlow), ixupp=f(ixupp), xupp=f(xupp))
