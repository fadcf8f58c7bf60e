"""Command-line driver mirroring the reference's gmspips CLI
(Drivers/gams/gmspips/gmspips.cpp:12-58; README.md:84-95):

    python -m pips_ipmpp_tpu.cli <N+1> <stem> [scaleGeo|scale|scaleEqui|
        scaleCurtisReid] [stepLp] [presolve] [printsol] [hierarchical]

reads `<stem>_block*.npz` files (the GDX replacement), solves, and
optionally writes `<stem>_solution.npz`.  Also accepts `--mps FILE` for the
serial MPS path (reference MpsReader)."""
from __future__ import annotations

import sys
import time

import jax


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    jax.config.update("jax_enable_x64", True)

    from pips_ipmpp_tpu.core.options import (Options, PresolverType,
                                             ScalerType, StepMode)
    from pips_ipmpp_tpu.core.status import TerminationStatus
    from pips_ipmpp_tpu.interface import PIPSIPMppTPUInterface

    opts = Options(print_level=10)
    if argv[0] == "--mps":
        from pips_ipmpp_tpu.io.mps import read_mps
        lp = read_mps(argv[1])
        flags = argv[2:]
        stem = argv[1].rsplit(".", 1)[0]
    else:
        from pips_ipmpp_tpu.io.blockfile import read_blocks
        n_blocks = int(argv[0])
        stem = argv[1]
        flags = argv[2:]
        try:
            lp = read_blocks(stem, n_blocks)
        except FileNotFoundError as e:
            print(f"error: block file not found: {e.filename or e}",
                  file=sys.stderr)
            return 2

    printsol = False
    hierarchical = False
    for flag in flags:
        f = flag.lower()
        if f == "scalegeo":
            opts = opts.replace(scaler=ScalerType.GEOMETRIC_MEAN_EQUILIBRIUM)
        elif f == "scale":
            opts = opts.replace(scaler=ScalerType.GEOMETRIC_MEAN)
        elif f == "scaleequi":
            opts = opts.replace(scaler=ScalerType.EQUILIBRIUM)
        elif f == "scalecurtisreid":
            opts = opts.replace(scaler=ScalerType.CURTIS_REID)
        elif f == "steplp":
            opts = opts.replace(step_mode=StepMode.PRIMAL_DUAL)
        elif f == "presolve":
            opts = opts.replace(presolve=PresolverType.PRESOLVE)
        elif f == "printsol":
            printsol = True
        elif f == "hierarchical":
            hierarchical = True
            opts = opts.replace(hierarchical=True)
        elif f.endswith(".opt"):
            opts = Options.from_opt_file(flag, base=opts)
        else:
            print(f"warning: unknown flag {flag!r} ignored")

    t0 = time.time()
    iface = PIPSIPMppTPUInterface(lp, opts)
    status = iface.run()
    dt = time.time() - t0

    if status == TerminationStatus.SUCCESSFUL_TERMINATION:
        print(f"optimal objective: {iface.getObjective():.10g}")
        print(f"solve time: {dt:.2f}s, iterations: {iface.n_iterations}")
    else:
        print(f"termination: {status.name} after "
              f"{iface.n_iterations if iface.result else 0} iterations "
              f"({dt:.2f}s)")

    if printsol and status == TerminationStatus.SUCCESSFUL_TERMINATION:
        from pips_ipmpp_tpu.io.blockfile import write_solution
        write_solution(stem, iface.gatherPrimalSolution(),
                       iface.gatherDualSolutionEq(),
                       iface.gatherDualSolutionIneq(),
                       iface.getObjective())
        print(f"solution written to {stem}_solution.npz")

    return 0 if status == TerminationStatus.SUCCESSFUL_TERMINATION else 1


if __name__ == "__main__":
    sys.exit(main())
