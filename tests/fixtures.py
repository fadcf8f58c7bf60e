"""Problem fixtures: random feasible arrowhead LPs + the hand-coded
two-scenario linking LP (the analog of the reference's callback example,
Drivers/CallbackExample/callbackTest.cpp — ours is an independent LP)."""
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


def two_scenario_linking_lp(dtype=jnp.float64) -> tuple[ArrowheadLP, float]:
    """Hand-coded 2-block LP with linking columns AND linking rows; optimum
    known analytically. Returns (lp, optimal_objective).

    min  x0 + sum_i (yi1 + 2 yi2)
    s.t. x0 + yi1 + yi2 = 4          (i = 1, 2; block eq)
         yi1 - yi2 <= 2              (block ineq)
         y11 + y21 + x0 = 5          (linking eq row)
         1 <= y12 + y22 <= 6         (linking ineq row)
         0 <= x0 <= 3, 0 <= yij <= 5

    Block eqs give yi1 + yi2 = 4 - x0 each; the linking eq gives
    y11 + y21 = 5 - x0, hence y12 + y22 = (8 - 2 x0) - (5 - x0) = 3 - x0,
    and the linking ineq needs 3 - x0 >= 1, i.e. x0 <= 2.  Objective
    = x0 + (5 - x0) + 2 (3 - x0) = 11 - 2 x0, minimized at x0 = 2 with
    value 7 (e.g. y = (1.5, 0.5) in both blocks).
    """
    first = dict(
        c=np.array([1.0]), A=np.zeros((0, 1)), b=np.zeros(0),
        C=np.zeros((0, 1)),
        iclow=np.zeros(0), clow=np.zeros(0),
        icupp=np.zeros(0), cupp=np.zeros(0),
        ixlow=np.array([1.0]), xlow=np.array([0.0]),
        ixupp=np.array([1.0]), xupp=np.array([3.0]),
        F0=np.array([[1.0]]), G0=np.array([[0.0]]),
    )
    blocks = []
    for _ in range(2):
        blocks.append(dict(
            c=np.array([1.0, 2.0]),
            A=np.array([[1.0]]), B=np.array([[1.0, 1.0]]), b=np.array([4.0]),
            C=np.array([[0.0]]), D=np.array([[1.0, -1.0]]),
            iclow=np.array([0.0]), clow=np.array([0.0]),
            icupp=np.array([1.0]), cupp=np.array([2.0]),
            ixlow=np.ones(2), xlow=np.zeros(2),
            ixupp=np.ones(2), xupp=np.full(2, 5.0),
            F=np.array([[1.0, 0.0]]), G=np.array([[0.0, 1.0]]),
        ))
    lp = make_arrowhead_lp(
        blocks, first, linking_eq={"b": np.array([5.0])},
        linking_ineq={"iclow": np.array([1.0]), "clow": np.array([1.0]),
                      "icupp": np.array([1.0]), "cupp": np.array([6.0])},
        dtype=dtype)
    return lp, 7.0
