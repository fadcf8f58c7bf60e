"""Automatic structure detection (core/dissect.py): an unstructured
sparse LP is reblocked onto the arrowhead path and must solve to the
same objective as the flat dense path (the dissection is an exact
permutation reformulation).  TPU-native replacement for the supernodal
sparse leaf factorization (reference PardisoSchurSolver.C:84-252) —
separator elimination lifted to the problem level."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from pips_ipmpp_tpu.core.dissect import auto_structure, structure_report
from pips_ipmpp_tpu.core.lp import DenseLP
from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface


def banded_sparse_lp(seed, n=240, band=6, m_frac=0.6):
    """Feasible banded LP: eq rows couple a few nearby columns (band
    structure so RCM chunking gives a small separator), box bounds,
    a strip of inequality rows."""
    rng = np.random.default_rng(seed)
    mE = int(n * m_frac * 0.5)
    mI = int(n * m_frac * 0.25)
    xstar = rng.uniform(0.5, 1.5, n)

    A = np.zeros((mE, n))
    for r in range(mE):
        j0 = rng.integers(0, n - band)
        idx = j0 + rng.permutation(band)[:3]
        A[r, idx] = rng.normal(size=3)
    b = A @ xstar

    C = np.zeros((mI, n))
    for r in range(mI):
        j0 = rng.integers(0, n - band)
        idx = j0 + rng.permutation(band)[:3]
        C[r, idx] = rng.normal(size=3)
    act = C @ xstar
    f = lambda v: np.asarray(v, np.float64)
    return DenseLP(
        c=f(rng.normal(size=n)),
        A=f(A), b=f(b), C=f(C),
        iclow=f(np.ones(mI)), clow=f(act - rng.uniform(0.5, 1.0, mI)),
        icupp=f(np.ones(mI)), cupp=f(act + rng.uniform(0.5, 1.0, mI)),
        ixlow=f(np.ones(n)), xlow=f(np.zeros(n)),
        ixupp=f(np.ones(n)), xupp=f(np.full(n, 4.0)))


@pytest.mark.parametrize("seed,k", [(0, 4), (1, 8), (2, 6)])
def test_dissected_matches_dense(seed, k):
    lp = banded_sparse_lp(seed)
    iface_d = PIPSIPMppTPUInterface(lp, Options(print_level=0))
    assert iface_d.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    obj_dense = float(iface_d.getObjective())

    alp, dmap = auto_structure(lp, num_blocks=k)
    iface_a = PIPSIPMppTPUInterface(alp, Options(print_level=0))
    assert iface_a.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert float(iface_a.getObjective()) == pytest.approx(
        obj_dense, rel=1e-5, abs=1e-4)

    # recovered primal is feasible for the ORIGINAL flat problem
    xflat = np.asarray(iface_a.gatherPrimalSolution())
    x = dmap.recover_x(xflat[:alp.n0],
                       xflat[alp.n0:].reshape(alp.N, alp.n))
    assert np.max(np.abs(np.asarray(lp.A) @ x - np.asarray(lp.b))) < 1e-6
    assert float(np.asarray(lp.c) @ x) == pytest.approx(obj_dense, rel=1e-5, abs=1e-4)


def test_dissection_is_actually_blocked():
    """Structural payoff: leaf storage must be far below the dense KKT
    and the separator/linking small relative to n."""
    lp = banded_sparse_lp(3, n=480, band=5)
    alp, dmap = auto_structure(lp, num_blocks=8)
    rep = structure_report(dmap, alp)
    assert rep["num_blocks"] == 8
    assert rep["arrow_leaf_entries"] < 0.25 * rep["dense_kkt_entries"]
    assert rep["first_vars"] + rep["linking_eq"] + rep["linking_ineq"] \
        < 0.35 * 480


def test_every_row_and_column_is_placed():
    lp = banded_sparse_lp(4, n=120, band=4)
    alp, dmap = auto_structure(lp, num_blocks=4)
    assert all(p is not None for p in dmap.col_place)
    assert all(p is not None for p in dmap.eq_place)
    assert all(p is not None for p in dmap.ineq_place)
