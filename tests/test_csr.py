"""CSR sparse storage (core/csr.py): static + dynamic row-capacity
variants — the counterpart of the reference's SparseStorage.C /
SparseStorageDynamic.C — and the densify-free sparse intake
(InputTree.build_sparse -> make_sparse_arrowhead_lp)."""
import numpy as np
import pytest

from pips_ipmpp_tpu.core.csr import CsrMatrix, DynamicCsr


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def rand_sparse(rng, m, n, density=0.25):
    M = rng.normal(size=(m, n)) * (rng.random((m, n)) < density)
    return M


def test_csr_roundtrips(rng):
    M = rand_sparse(rng, 11, 17)
    A = CsrMatrix.from_dense(M)
    assert np.allclose(A.to_dense(), M)
    r, c, v = A.to_triplets()
    B = CsrMatrix.from_triplets(r, c, v, (11, 17))
    assert np.allclose(B.to_dense(), M)
    # fortran 1-based round trip (reference shiftRows_* conversions)
    k1, j1, v1 = A.to_fortran()
    C = CsrMatrix.from_fortran(k1, j1, v1, (11, 17))
    assert np.allclose(C.to_dense(), M)


def test_csr_duplicates_sum():
    A = CsrMatrix.from_triplets([0, 0, 1], [2, 2, 0], [1.0, 2.5, 4.0],
                                (2, 3))
    assert A.nnz == 2
    assert A.to_dense()[0, 2] == 3.5


def test_csr_products_and_scaling(rng):
    M = rand_sparse(rng, 9, 13)
    A = CsrMatrix.from_dense(M)
    x = rng.normal(size=13)
    y = rng.normal(size=9)
    assert np.allclose(A.matvec(x), M @ x)
    assert np.allclose(A.trans_matvec(y), M.T @ y)
    assert np.allclose(A.transpose().to_dense(), M.T)
    sr = rng.random(9) + 0.5
    sc = rng.random(13) + 0.5
    A.scale_rows(sr)
    A.scale_cols(sc)
    assert np.allclose(A.to_dense(), sr[:, None] * M * sc[None, :])


def test_csr_diag_and_norms(rng):
    M = rand_sparse(rng, 8, 8, density=0.5)
    A = CsrMatrix.from_dense(M)
    assert np.allclose(A.get_diagonal(), np.diag(M))
    assert np.allclose(A.row_abs_max(), np.abs(M).max(axis=1))
    assert np.allclose(A.col_abs_max(), np.abs(M).max(axis=0))


def test_csr_to_ell_bridge(rng):
    M = rand_sparse(rng, 6, 10)
    A = CsrMatrix.from_dense(M)
    val, col = A.to_ell()
    dense = np.zeros((6, 10))
    for r_ in range(6):
        for k in range(val.shape[1]):
            dense[r_, col[r_, k]] += val[r_, k]
    assert np.allclose(dense, M)
    with pytest.raises(ValueError):
        A.to_ell(K=0)


def test_csr_validates_ranges():
    with pytest.raises(ValueError):
        CsrMatrix.from_triplets([0], [5], [1.0], (2, 3))
    with pytest.raises(ValueError):
        CsrMatrix.from_triplets([4], [0], [1.0], (2, 3))


# ---------------------------------------------------------------------
# DynamicCsr (SparseStorageDynamic): presolve-style mutation
# ---------------------------------------------------------------------

def test_dynamic_remove_set_roundtrip(rng):
    M = rand_sparse(rng, 7, 9)
    d = DynamicCsr(CsrMatrix.from_dense(M))
    assert np.allclose(d.to_dense(), M)
    # remove an existing entry
    r0 = int(np.nonzero((M != 0).sum(axis=1))[0][0])
    c0 = int(np.nonzero(M[r0])[0][0])
    v = d.remove_entry(r0, c0)
    assert v == pytest.approx(M[r0, c0])
    M2 = M.copy()
    M2[r0, c0] = 0.0
    assert np.allclose(d.to_dense(), M2)
    # removing an absent entry is a no-op returning 0
    assert d.remove_entry(r0, c0) == 0.0
    # overwrite + insert
    d.set_entry(r0, c0, 2.5)
    d.set_entry(r0, c0, 3.5)
    M2[r0, c0] = 3.5
    assert np.allclose(d.to_dense(), M2)
    assert d.get(r0, c0) == 3.5


def test_dynamic_row_growth():
    A = CsrMatrix.from_dense(np.zeros((3, 50)))
    d = DynamicCsr(A, spare=1)
    # overflow row 1 far past its capacity -> triggers _grow_row
    for c in range(40):
        d.set_entry(1, c, float(c + 1))
    dense = d.to_dense()
    assert np.allclose(dense[1, :40], np.arange(1, 41))
    assert d.nnz == 40
    assert np.allclose(dense[0], 0) and np.allclose(dense[2], 0)


def test_dynamic_clear_row_and_compress(rng):
    M = rand_sparse(rng, 5, 6)
    d = DynamicCsr(CsrMatrix.from_dense(M))
    d.clear_row(2)
    M[2] = 0.0
    out = d.compress()
    assert np.allclose(out.to_dense(), M)
    # compressed CSR has sorted, duplicate-free rows
    for r_ in range(5):
        cols = out.indices[out.indptr[r_]:out.indptr[r_ + 1]]
        assert np.all(np.diff(cols) > 0) or cols.size <= 1


# ---------------------------------------------------------------------
# Densify-free sparse intake: CSR callbacks -> SparseArrowheadLP
# ---------------------------------------------------------------------

def _tree_from_lp(lp_np, sparse_blocks=True):
    """Build an InputTree over a dense numpy arrowhead description where
    the B/D callbacks return CSR triplets (the reference FMAT format)."""
    from pips_ipmpp_tpu.io.callbacks import BlockCallbacks, InputTree

    def csr3(M):
        A = CsrMatrix.from_dense(M)
        k, j, v = A.indptr, A.indices, A.data
        return (k, j, v)

    def child(i, blk):
        return BlockCallbacks(
            id=i,
            n_vars=lambda _i: blk["B"].shape[1],
            n_eq=lambda _i: blk["B"].shape[0],
            n_ineq=lambda _i: blk["D"].shape[0],
            vec_c=lambda _i: blk["c"],
            mat_A=lambda _i: blk["A"],
            mat_B=(lambda _i: csr3(blk["B"])) if sparse_blocks
            else (lambda _i: blk["B"]),
            vec_b=lambda _i: blk["b"],
            mat_C=lambda _i: blk["C"],
            mat_D=(lambda _i: csr3(blk["D"])) if sparse_blocks
            else (lambda _i: blk["D"]),
            vec_clow=lambda _i: blk["clow"],
            vec_iclow=lambda _i: blk["iclow"],
            vec_cupp=lambda _i: blk["cupp"],
            vec_icupp=lambda _i: blk["icupp"],
            vec_xlow=lambda _i: blk["xlow"],
            vec_ixlow=lambda _i: blk["ixlow"],
            vec_xupp=lambda _i: blk["xupp"],
            vec_ixupp=lambda _i: blk["ixupp"],
            mat_F=lambda _i: blk["F"],
            mat_G=lambda _i: blk["G"],
        )

    fs = lp_np["first"]
    root = BlockCallbacks(
        id=0,
        n_vars=lambda _i: len(fs["c"]),
        n_eq=lambda _i: fs["A"].shape[0],
        n_ineq=lambda _i: fs["C"].shape[0],
        vec_c=lambda _i: fs["c"],
        mat_A=None,
        mat_B=lambda _i: fs["A"],
        vec_b=lambda _i: fs["b"],
        mat_C=None,
        mat_D=lambda _i: fs["C"],
        vec_clow=lambda _i: fs["clow"],
        vec_iclow=lambda _i: fs["iclow"],
        vec_cupp=lambda _i: fs["cupp"],
        vec_icupp=lambda _i: fs["icupp"],
        vec_xlow=lambda _i: fs["xlow"],
        vec_ixlow=lambda _i: fs["ixlow"],
        vec_xupp=lambda _i: fs["xupp"],
        vec_ixupp=lambda _i: fs["ixupp"],
        mat_F=lambda _i: fs["F0"],
        mat_G=lambda _i: fs["G0"],
    )
    le = lp_np["linking_eq"]
    li = lp_np["linking_ineq"]
    return InputTree(
        root=root,
        children=[child(i + 1, blk)
                  for i, blk in enumerate(lp_np["blocks"])],
        n_linking_eq=fs["F0"].shape[0],
        n_linking_ineq=fs["G0"].shape[0],
        vec_bl=lambda: le["b"],
        vec_dllow=lambda: li["clow"],
        vec_idllow=lambda: li["iclow"],
        vec_dlupp=lambda: li["cupp"],
        vec_idlupp=lambda: li["icupp"],
    )


def _random_problem(rng, N=3, n=14, mE=6, mI=5, n0=4, m0E=2, m0I=2,
                    mEl=2, mIl=2, hetero=False):
    def bounds(k):
        return dict(iclow=np.ones(k), clow=-rng.random(k) - 1.0,
                    icupp=np.ones(k), cupp=rng.random(k) + 1.0)

    def blk(i):
        ni = n - (2 * i if hetero else 0)
        mEi = mE - (i if hetero else 0)
        mIi = mI
        b = dict(
            c=rng.normal(size=ni),
            A=rand_sparse(rng, mEi, n0, 0.4),
            B=rand_sparse(rng, mEi, ni, 0.3) + np.eye(mEi, ni),
            b=rng.normal(size=mEi) * 0.1,
            C=rand_sparse(rng, mIi, n0, 0.4),
            D=rand_sparse(rng, mIi, ni, 0.3),
            F=rand_sparse(rng, mEl, ni, 0.3),
            G=rand_sparse(rng, mIl, ni, 0.3),
            ixlow=np.ones(ni), xlow=-np.ones(ni) * 5,
            ixupp=np.ones(ni), xupp=np.ones(ni) * 5,
        )
        b.update(bounds(mIi))
        return b

    first = dict(
        c=rng.normal(size=n0),
        A=rand_sparse(rng, m0E, n0, 0.5) + np.eye(m0E, n0),
        b=rng.normal(size=m0E) * 0.1,
        C=rand_sparse(rng, m0I, n0, 0.5),
        F0=rand_sparse(rng, mEl, n0, 0.5),
        G0=rand_sparse(rng, mIl, n0, 0.5),
        ixlow=np.ones(n0), xlow=-np.ones(n0) * 5,
        ixupp=np.ones(n0), xupp=np.ones(n0) * 5,
    )
    first.update(bounds(m0I))
    le = {"b": rng.normal(size=mEl) * 0.1}
    li = bounds(mIl)
    return dict(blocks=[blk(i) for i in range(N)], first=first,
                linking_eq=le, linking_ineq={k: li[k] for k in
                                             ("iclow", "clow", "icupp",
                                              "cupp")})


def test_build_sparse_matches_dense_build(rng):
    from pips_ipmpp_tpu.core.sparse import ell_to_dense

    prob = _random_problem(rng)
    tree_s = _tree_from_lp(prob, sparse_blocks=True)
    tree_d = _tree_from_lp(prob, sparse_blocks=False)
    lp_d = tree_d.build()
    lp_s = tree_s.build_sparse()
    assert np.allclose(ell_to_dense(lp_s.B, lp_s.n), lp_d.B)
    assert np.allclose(ell_to_dense(lp_s.D, lp_s.n), lp_d.D)
    assert np.allclose(ell_to_dense(lp_s.Bt, lp_s.mE),
                       np.swapaxes(np.asarray(lp_d.B), 1, 2))
    assert np.allclose(lp_s.A, lp_d.A)
    assert np.allclose(lp_s.F, lp_d.F)
    assert np.allclose(lp_s.bN, lp_d.bN)


def test_build_sparse_heterogeneous_blocks_solve(rng):
    """Heterogeneous blocks round-trip the padding and the sparse path
    solves to the same objective as the dense path."""
    from functools import partial

    from pips_ipmpp_tpu.core.options import Options
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.ipm.solver import IPMSolver
    from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend
    from pips_ipmpp_tpu.linalg.sparse_backend import SparseArrowBackend

    prob = _random_problem(rng, hetero=True)
    lp_d = _tree_from_lp(prob, sparse_blocks=False).build()
    lp_s = _tree_from_lp(prob, sparse_blocks=True).build_sparse()

    opts = Options(max_iterations=80)
    rd = IPMSolver(ArrowBackend, opts).solve(lp_d)
    rs = IPMSolver(partial(SparseArrowBackend), opts).solve(lp_s)
    assert rd.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert rs.status == TerminationStatus.SUCCESSFUL_TERMINATION
    assert rs.objective == pytest.approx(rd.objective, abs=1e-5, rel=1e-5)
