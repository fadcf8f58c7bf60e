"""Randomized solve campaign: random arrowhead LPs x random option
combinations, objective validated against a scipy (HiGHS) oracle on the
flattened LP.

Catches option-interaction bugs the structured test suite misses (every
option combination here is a supported configuration).  Prints one line
per case; nonzero exit if any case fails.

    python tools/fuzz_solve.py --cases 50 --seed 0
"""
import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    import jax.numpy as jnp
    from scipy.optimize import linprog

    from pips_ipmpp_tpu.core.options import (Options, PresolverType,
                                             ScalerType, StepMode)
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface
    from pips_ipmpp_tpu.io.synthetic import (banded_arrowhead_lp,
                                             klink_arrowhead_lp,
                                             random_arrowhead_lp)

    rng = np.random.default_rng(args.seed)
    failures = 0

    def oracle(lp):
        d = lp.to_dense()
        c = np.asarray(d.c)
        A = np.asarray(d.A)
        b = np.asarray(d.b)
        C = np.asarray(d.C)
        il, lo = np.asarray(d.iclow), np.asarray(d.clow)
        iu, up = np.asarray(d.icupp), np.asarray(d.cupp)
        A_ub, b_ub = [], []
        for r in range(C.shape[0]):
            if iu[r] > 0:
                A_ub.append(C[r])
                b_ub.append(up[r])
            if il[r] > 0:
                A_ub.append(-C[r])
                b_ub.append(-lo[r])
        bounds = []
        xl = np.where(np.asarray(d.ixlow) > 0, np.asarray(d.xlow), -np.inf)
        xu = np.where(np.asarray(d.ixupp) > 0, np.asarray(d.xupp), np.inf)
        for j in range(len(c)):
            bounds.append((None if np.isinf(xl[j]) else xl[j],
                           None if np.isinf(xu[j]) else xu[j]))
        res = linprog(c, A_ub=np.array(A_ub) if A_ub else None,
                      b_ub=np.array(b_ub) if b_ub else None,
                      A_eq=A if A.size else None, b_eq=b if b.size else None,
                      bounds=bounds, method="highs")
        return res

    for case in range(args.cases):
        seed = int(rng.integers(0, 2**31))
        gen = rng.choice(["random", "banded", "klink"])
        kw = {}
        if gen == "random":
            lp = random_arrowhead_lp(
                seed, N=int(rng.choice([2, 4, 8])),
                n=int(rng.integers(4, 12)), mE=int(rng.integers(2, 6)),
                mI=int(rng.integers(2, 6)), n0=int(rng.integers(2, 5)),
                m0E=2, m0I=2, mEl=int(rng.integers(0, 4)),
                mIl=int(rng.integers(1, 4)),
                heterogeneous=bool(rng.integers(0, 2)))
        elif gen == "banded":
            lp = banded_arrowhead_lp(
                seed, N=int(rng.choice([2, 4])), n=32, mE=16, mI=16,
                window=int(rng.integers(3, 7)))
            if rng.integers(0, 2):
                kw["banded_leaf"] = True
        else:
            lp = klink_arrowhead_lp(
                seed, N=int(rng.choice([4, 8])),
                links_per_block=int(rng.integers(1, 3)), klink=2,
                n_global=int(rng.integers(0, 2)))
            if rng.integers(0, 2):
                kw["banded_root"] = True

        kw["scaler"] = ScalerType(int(rng.integers(0, 5)))
        kw["presolve"] = PresolverType(int(rng.integers(0, 2)))
        kw["step_mode"] = StepMode(int(rng.integers(0, 2)))
        kw["max_gondzio_correctors"] = int(rng.integers(0, 4))
        kw["regularization_strategy"] = str(rng.choice(
            ["ladder", "friedlander_orban", "ipopt"]))
        if rng.integers(0, 4) == 0:
            kw["outer_bicgstab"] = True
        if rng.integers(0, 4) == 0 and "banded_leaf" not in kw \
                and "banded_root" not in kw:
            kw["hierarchical"] = True
        if rng.integers(0, 4) == 0:
            kw["sc_blockwise"] = 4
        if rng.integers(0, 4) == 0:
            kw["refinement_steps"] = 0

        tag = (f"case {case}: gen={gen} seed={seed} "
               + " ".join(f"{k}={v}" for k, v in kw.items()
                          if k in ("scaler", "presolve", "step_mode",
                                   "banded_leaf", "banded_root",
                                   "hierarchical", "outer_bicgstab",
                                   "regularization_strategy")))
        try:
            ref = oracle(lp)
            iface = PIPSIPMppTPUInterface(lp, Options(**kw))
            st = iface.run()
            if ref.status == 0:
                ok = (st == TerminationStatus.SUCCESSFUL_TERMINATION
                      and abs(iface.getObjective() - ref.fun)
                      <= 1e-4 * max(1.0, abs(ref.fun)))
                detail = (f"obj {iface.getObjective():.8g} vs oracle "
                          f"{ref.fun:.8g}" if st ==
                          TerminationStatus.SUCCESSFUL_TERMINATION
                          else f"status {st.name}")
            elif ref.status == 2:   # oracle says infeasible
                ok = st in (TerminationStatus.INFEASIBLE,
                            TerminationStatus.UNKNOWN,
                            TerminationStatus.MAX_ITS_EXCEEDED)
                detail = f"oracle infeasible, status {st.name}"
            else:
                print(f"SKIP {tag} (oracle status {ref.status})")
                continue
            print(("PASS " if ok else "FAIL ") + tag + " | " + detail,
                  flush=True)
            if not ok:
                failures += 1
        except Exception:
            print(f"CRASH {tag}", flush=True)
            traceback.print_exc()
            failures += 1

    print(f"\n{failures} failures / {args.cases} cases")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
