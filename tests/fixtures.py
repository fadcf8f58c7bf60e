"""Problem fixtures: random feasible arrowhead LPs + the hand-coded
two-scenario linking LP (the analog of the reference's callback example,
Drivers/CallbackExample/callbackTest.cpp — ours is an independent LP)."""
import jax
import jax.numpy as jnp
import numpy as np

from pips_ipmpp_tpu.core.lp import ArrowheadLP, make_arrowhead_lp
from pips_ipmpp_tpu.io.synthetic import random_arrowhead_lp  # noqa: F401  (re-export)


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
