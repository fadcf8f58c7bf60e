"""I/O tests: block-file roundtrip, callback-tree construction, MPS reader,
and the CLI driver end-to-end (the analog of the reference's reader tests
t_gmspips_reader.cpp and shell output checks pipsipmMultiTests.sh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pips_ipmpp_tpu.core.options import Options
from pips_ipmpp_tpu.core.status import TerminationStatus
from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
from pips_ipmpp_tpu.io.blockfile import read_blocks, write_blocks
from pips_ipmpp_tpu.io.callbacks import BlockCallbacks, InputTree, csr_to_dense
from pips_ipmpp_tpu.io.mps import read_mps

from tests.fixtures import random_arrowhead_lp, two_scenario_linking_lp


def test_blockfile_roundtrip(tmp_path):
    lp = random_arrowhead_lp(0, N=3)
    stem = str(tmp_path / "prob")
    write_blocks(lp, stem)
    lp2 = read_blocks(stem)
    for a, b in zip(jax.tree.leaves(lp), jax.tree.leaves(lp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blockfile_partial_read(tmp_path):
    lp = random_arrowhead_lp(1, N=4)
    stem = str(tmp_path / "prob")
    write_blocks(lp, stem)
    lp2 = read_blocks(stem, n_blocks=3)   # N+1 convention: 2 blocks
    assert lp2.N == 2


def test_csr_to_dense():
    # [[1, 0, 2], [0, 3, 0]]
    d = csr_to_dense(2, 3, [0, 2, 3], [0, 2, 1], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(d, [[1, 0, 2], [0, 3, 0]])


def test_callback_tree_matches_direct():
    """Build the two-scenario linking LP via callbacks (the
    DistributedInputTree flow) and check it matches direct construction."""
    lp_ref, opt = two_scenario_linking_lp()

    def const(v):
        return lambda _id: np.asarray(v, float)

    root = BlockCallbacks(
        id=0, n_vars=lambda i: 1, n_eq=lambda i: 0, n_ineq=lambda i: 0,
        vec_c=const([1.0]),
        mat_A=None, mat_B=const(np.zeros((0, 1))), vec_b=const([]),
        mat_C=None, mat_D=const(np.zeros((0, 1))),
        vec_clow=const([]), vec_iclow=const([]),
        vec_cupp=const([]), vec_icupp=const([]),
        vec_xlow=const([0.0]), vec_ixlow=const([1.0]),
        vec_xupp=const([3.0]), vec_ixupp=const([1.0]),
        mat_F=const([[1.0]]), mat_G=const([[0.0]]),
    )
    children = []
    for i in (1, 2):
        children.append(BlockCallbacks(
            id=i, n_vars=lambda i: 2, n_eq=lambda i: 1, n_ineq=lambda i: 1,
            vec_c=const([1.0, 2.0]),
            mat_A=const([[1.0]]),
            # CSR form for B to exercise the triplet path: [[1, 1]]
            mat_B=lambda _id: ([0, 2], [0, 1], [1.0, 1.0]),
            vec_b=const([4.0]),
            mat_C=const([[0.0]]), mat_D=const([[1.0, -1.0]]),
            vec_clow=const([0.0]), vec_iclow=const([0.0]),
            vec_cupp=const([2.0]), vec_icupp=const([1.0]),
            vec_xlow=const([0.0, 0.0]), vec_ixlow=const([1.0, 1.0]),
            vec_xupp=const([5.0, 5.0]), vec_ixupp=const([1.0, 1.0]),
            mat_F=const([[1.0, 0.0]]), mat_G=const([[0.0, 1.0]]),
        ))
    tree = InputTree(root=root, children=children,
                     n_linking_eq=1, n_linking_ineq=1,
                     vec_bl=lambda: np.array([5.0]),
                     vec_dllow=lambda: np.array([1.0]),
                     vec_idllow=lambda: np.array([1.0]),
                     vec_dlupp=lambda: np.array([6.0]),
                     vec_idlupp=lambda: np.array([1.0]))
    lp = tree.build()
    for a, b in zip(jax.tree.leaves(lp), jax.tree.leaves(lp_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    iface = PIPSIPMppTPUInterface(lp, Options())
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - opt) < 1e-6


MPS_SAMPLE = """
NAME          TESTLP
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1        COST         1.0   LIM1         1.0
    X1        LIM2         1.0
    X2        COST         2.0   LIM1         1.0
    X2        MYEQN       -1.0
    X3        COST        -1.0   LIM2         1.0
    X3        MYEQN        1.0
RHS
    RHS       LIM1         4.0   LIM2         1.0
    RHS       MYEQN        7.0
BOUNDS
 UP BND       X1           4.0
 LO BND       X2          -1.0
ENDATA
"""


def test_mps_reader(tmp_path):
    """Classic MPS example: min x1+2x2-x3, x1+x2<=4, x1+x3>=1, x3-x2=7,
    0<=x1<=4, x2>=-1, x3>=0.  Optimum: x2=-1, x3=6, x1=0 -> obj=-8."""
    p = tmp_path / "test.mps"
    p.write_text(MPS_SAMPLE)
    lp = read_mps(str(p))
    assert lp.n == 3 and lp.mE == 1 and lp.mI == 2

    iface = PIPSIPMppTPUInterface(lp, Options())
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - (-8.0)) < 1e-6
    x = iface.gatherPrimalSolution()
    np.testing.assert_allclose(x, [0.0, -1.0, 6.0], atol=1e-6)


def test_mps_vs_scipy(tmp_path):
    from scipy.optimize import linprog
    p = tmp_path / "t.mps"
    p.write_text(MPS_SAMPLE)
    lp = read_mps(str(p))
    res = linprog(np.asarray(lp.c),
                  A_ub=np.vstack([np.asarray(lp.C)[0:1],
                                  -np.asarray(lp.C)[1:2]]),
                  b_ub=[4.0, -1.0],
                  A_eq=np.asarray(lp.A), b_eq=np.asarray(lp.b),
                  bounds=[(0, 4), (-1, None), (0, None)], method="highs")
    assert abs(res.fun - (-8.0)) < 1e-9


def test_cli_end_to_end(tmp_path, capsys):
    from pips_ipmpp_tpu.cli import main
    lp, opt = two_scenario_linking_lp()
    stem = str(tmp_path / "prob")
    write_blocks(lp, stem)
    rc = main(["3", stem, "scaleGeo", "stepLp", "presolve", "printsol"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "optimal objective: 7" in out
    sol = np.load(f"{stem}_solution.npz")
    assert abs(float(sol["objective"]) - opt) < 1e-6


def test_cli_check_blocks(tmp_path, capsys):
    from pips_ipmpp_tpu.cli import main
    lp, _ = two_scenario_linking_lp()
    stem = str(tmp_path / "chk")
    write_blocks(lp, stem)
    rc = main(["--check", stem])
    out = capsys.readouterr().out
    assert rc == 0 and "OK:" in out

    # corrupt: crossed bounds in block 1
    import numpy as np
    f = dict(np.load(f"{stem}_block1.npz"))
    f["xlow"] = f["xupp"] + 1.0
    np.savez(f"{stem}_block1.npz", **f)
    rc = main(["--check", stem])
    out = capsys.readouterr().out
    assert rc == 1 and "xlow > xupp" in out


# ---- MPS reader depth (reference MpsReader.C parity features) ----

def _fixed_line(f2, f3="", f4="", f5="", f6=""):
    """Lay fields at the fixed-format column positions (2:2-3, 5-12,
    15-22, 25-36, 40-47, 50-61; 1-based)."""
    out = [" "] * 61
    for start, txt in ((4, f2), (14, f3), (24, f4), (39, f5), (49, f6)):
        out[start:start + len(txt)] = txt
    return "".join(out).rstrip()


MPS_FIXED_SAMPLE = "\n".join([
    "NAME          FIXEDT",
    "ROWS",
    " N  COST",
    " N  FREEROW",
    " L  ROW ONE",
    " E  ROW TWO",
    "COLUMNS",
    _fixed_line("X ONE", "COST", "1.0", "ROW ONE", "1.0"),
    _fixed_line("X ONE", "ROW TWO", "1.0"),
    _fixed_line("X ONE", "FREEROW", "9.0"),
    _fixed_line("X2", "COST", "2.0D0", "ROW TWO", "1.0"),
    "RHS",
    _fixed_line("RHS", "ROW ONE", "4.0", "ROW TWO", "3.0"),
    _fixed_line("RHS", "COST", "-5.0"),
    "BOUNDS",
    " UP BND       X ONE         4.0",
    "ENDATA",
]) + "\n"


def test_mps_fixed_format_with_spaces_in_names(tmp_path):
    """Fixed-format parse: names with embedded blanks, Fortran D exponent,
    a second N row treated as a free row, and an RHS entry on the
    objective row exposed as the (negated) objective constant."""
    from pips_ipmpp_tpu.io.mps import read_mps_with_info
    p = tmp_path / "fixed.mps"
    p.write_text(MPS_FIXED_SAMPLE)
    lp, info = read_mps_with_info(str(p), format="fixed")
    assert info.col_names == ["X ONE", "X2"]
    assert info.row_names == ["ROW TWO", "ROW ONE"]   # eq rows first
    assert info.free_rows == ["FREEROW"]
    assert info.objective_constant == 5.0             # -(-5.0)
    np.testing.assert_allclose(np.asarray(lp.c), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(lp.A), [[1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(lp.b), [3.0])
    np.testing.assert_allclose(np.asarray(lp.C), [[1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(lp.cupp), [4.0])
    # solve: min x1+2*x2 st x1+x2=3, x1<=4 (row), 0<=x1<=4 -> x1=3,x2=0
    iface = PIPSIPMppTPUInterface(lp, Options())
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs((iface.getObjective() + info.objective_constant) - 8.0) < 1e-6


def test_mps_bounds_without_set_name(tmp_path):
    """BOUNDS lines may omit the bound-set name (3-token value lines)."""
    txt = MPS_SAMPLE.replace(" UP BND       X1           4.0",
                             " UP X1 4.0").replace(
        " LO BND       X2          -1.0", " LO X2 -1.0")
    p = tmp_path / "nobnd.mps"
    p.write_text(txt)
    lp = read_mps(str(p))
    iface = PIPSIPMppTPUInterface(lp, Options())
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - (-8.0)) < 1e-6


def test_mps_ranges_on_objective_row_warns(tmp_path):
    import warnings as _w
    txt = MPS_SAMPLE.replace("BOUNDS", "RANGES\n    RNG       COST"
                             "         1.0\nBOUNDS")
    p = tmp_path / "rng.mps"
    p.write_text(txt)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        lp = read_mps(str(p))
    assert any("invalid" in str(r.message) for r in rec)
    iface = PIPSIPMppTPUInterface(lp, Options())
    assert iface.run() == TerminationStatus.SUCCESSFUL_TERMINATION
    assert abs(iface.getObjective() - (-8.0)) < 1e-6


def test_opt_file_reference_names(tmp_path):
    """A PIPS-IPM++ user's .opt file (reference option names,
    PIPSIPMppOptions.C) must configure the equivalent options here."""
    from pips_ipmpp_tpu.core.options import (Options, PresolverType,
                                             ScalerType)
    p = tmp_path / "ref.opt"
    p.write_text("\n".join([
        "GONDZIO_MAX_CORRECTORS 5 int",
        "OUTER_SOLVE 2 int",
        "PRESOLVE 1 int",
        "PRESOLVE_MAX_ROUNDS 3 int",
        "SCALER 3 int",
        "HIERARCHICAL_APPROACH_N_LAYERS 2 int",
        "SC_COMPUTE_BLOCKWISE true bool",
        "UNKNOWN_REFERENCE_OPTION 7 int",
    ]) + "\n")
    o = Options.from_opt_file(str(p))
    assert o.max_gondzio_correctors == 5
    assert o.outer_bicgstab is True
    assert o.presolve == PresolverType.PRESOLVE
    assert o.presolve_max_rounds == 3
    assert o.scaler == ScalerType.GEOMETRIC_MEAN_EQUILIBRIUM
    assert o.hierarchical_layers == 2
    assert o.sc_blockwise > 0
