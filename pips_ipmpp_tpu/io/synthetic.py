"""Synthetic arrowhead LP generators (benchmarks, driver entry, tests).

Feasible-by-construction random instances shaped like the reference's
multi-scenario energy-system LPs (SURVEY.md §0): N scenario blocks coupled
through first-stage variables and linking rows.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pips_ipmpp_tpu.core.lp import ArrowheadLP, make_arrowhead_lp


def random_arrowhead_lp(seed, N=4, n=6, mE=3, mI=4, n0=3, m0E=2, m0I=2,
                        mEl=2, mIl=2, dtype=jnp.float64,
                        heterogeneous=False) -> ArrowheadLP:
    """Feasible-by-construction random arrowhead LP: pick interior x*, build
    rhs/bounds around it. All variables bounded (lower always, upper 70%)."""
    rng = np.random.default_rng(seed)

    x0s = rng.normal(size=n0) * 0.5

    def bounds_for(xs, nloc):
        ixlow = np.ones(nloc)
        xlow = xs - 0.5 - rng.random(nloc)
        ixupp = (rng.random(nloc) < 0.7).astype(float)
        xupp = np.where(ixupp > 0, xs + 0.5 + rng.random(nloc), 0.0)
        return ixlow, xlow, ixupp, xupp

    def ineq_bounds(Cx, m):
        iclow = (rng.random(m) < 0.7).astype(float)
        icupp = np.where(iclow > 0, (rng.random(m) < 0.5).astype(float), 1.0)
        clow = np.where(iclow > 0, Cx - 0.3 - rng.random(m), 0.0)
        cupp = np.where(icupp > 0, Cx + 0.3 + rng.random(m), 0.0)
        return iclow, clow, icupp, cupp

    blocks = []
    xis = []
    for i in range(N):
        ni = n - (i % 2) if heterogeneous else n
        mEi = max(1, mE - (i % 2)) if heterogeneous else mE
        mIi = max(1, mI - (i % 3)) if heterogeneous else mI
        xi = rng.normal(size=ni) * 0.5
        xis.append(xi)
        A = rng.normal(size=(mEi, n0)) * 0.3
        B = rng.normal(size=(mEi, ni)) + np.eye(mEi, ni)
        b = A @ x0s + B @ xi
        C = rng.normal(size=(mIi, n0)) * 0.3
        D = rng.normal(size=(mIi, ni))
        Cx = C @ x0s + D @ xi
        iclow, clow, icupp, cupp = ineq_bounds(Cx, mIi)
        ixlow, xlow, ixupp, xupp = bounds_for(xi, ni)
        F = rng.normal(size=(mEl, ni)) * 0.2
        G = rng.normal(size=(mIl, ni)) * 0.2
        blocks.append(dict(c=rng.normal(size=ni), A=A, B=B, b=b, C=C, D=D,
                           iclow=iclow, clow=clow, icupp=icupp, cupp=cupp,
                           ixlow=ixlow, xlow=xlow, ixupp=ixupp, xupp=xupp,
                           F=F, G=G))

    A0 = rng.normal(size=(m0E, n0)) + np.eye(m0E, n0)
    b0 = A0 @ x0s
    C0 = rng.normal(size=(m0I, n0))
    iclow0, clow0, icupp0, cupp0 = ineq_bounds(C0 @ x0s, m0I)
    ixlow0, xlow0, ixupp0, xupp0 = bounds_for(x0s, n0)
    F0 = rng.normal(size=(mEl, n0)) * 0.2
    G0 = rng.normal(size=(mIl, n0)) * 0.2
    first = dict(c=rng.normal(size=n0), A=A0, b=b0, C=C0,
                 iclow=iclow0, clow=clow0, icupp=icupp0, cupp=cupp0,
                 ixlow=ixlow0, xlow=xlow0, ixupp=ixupp0, xupp=xupp0,
                 F0=F0, G0=G0)

    bl = F0 @ x0s + sum(blk["F"] @ xi for blk, xi in zip(blocks, xis))
    Gx = G0 @ x0s + sum(blk["G"] @ xi for blk, xi in zip(blocks, xis))
    iclowl, clowl, icuppl, cuppl = ineq_bounds(Gx, mIl)

    return make_arrowhead_lp(
        blocks, first, linking_eq={"b": bl},
        linking_ineq={"iclow": iclowl, "clow": clowl,
                      "icupp": icuppl, "cupp": cuppl},
        dtype=dtype)
