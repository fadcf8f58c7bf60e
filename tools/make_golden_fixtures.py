"""Convert the reference's GAMSsmall golden instances into npz block-file
fixtures under tests/data/gamssmall/.

The instances and their recorded objectives/iteration counts come from
the reference's own regression table
(Test/IntegrationTests/gamssmall_instance_data.txt:4-42); the .gms files
are tiny hand-written LP tables (Drivers/gams/simple/GAMSsmall/).  This
script needs /root/reference available; the resulting fixtures are
committed so the test suite has no reference-tree dependency.

Usage:  python tools/make_golden_fixtures.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pips_ipmpp_tpu.io.blockfile import write_blocks  # noqa: E402
from pips_ipmpp_tpu.io.gams import read_gms  # noqa: E402

REF = "/root/reference/PIPS-IPM/Drivers/gams/simple/GAMSsmall"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "gamssmall")

# (relative .gms path, gmspips file count N+1, recorded objective,
#  recorded iterations) from gamssmall_instance_data.txt
INSTANCES = [
    ("examples_boundTightening/exampleAC_boundStrength.gms", 3, 17.0, 8),
    ("examples_hierarchical_approach/hier_approach_2blocks_2by2.gms", 4, 10.0, 4),
    ("examples_hierarchical_approach/hier_approach_4blocks_2by2.gms", 5, 14.0, 4),
    ("examples_hierarchical_approach/hier_approach_4blocks_2by3.gms", 5, 20.0, 15),
    ("examples_hierarchical_approach/hier_approach_8blocks_2by3.gms", 9, 32.0, 12),
    ("examples_nearlyParallelRows/nearlyParallelEqualityAndInequalityRows_B0A2.gms", 4, -21.6, 8),
    ("examples_nearlyParallelRows/nearlyParallelEqualityRowsBothSingletons_B0A2.gms", 4, 17.9, 9),
    ("examples_nearlyParallelRows/nearlyParallelEqualityRowsOneRowNoSingleton_B0A2.gms", 4, 17.5, 7),
    ("examples_nearlyParallelRows/nearlyParallelInequalityRows_B0A2.gms", 4, -72.7, 12),
    ("examples_parallelRows/parallelEqualityAndInequalityRow_B0A2.gms", 4, -12.0, 4),
    ("examples_parallelRows/parallelEqualityRows_B0A2.gms", 4, -12.0, 4),
    ("examples_parallelRows/parallelInequalityRows_B0A2.gms", 4, -12.0, 5),
    ("examples_singletonEqualityColumn/singletonEqualityColumn_A2.gms", 4, -12.0, 4),
    ("examples_singletonEqualityColumn/singletonEqualityColumn_B0B1A2.gms", 4, -12.0, 4),
    ("examples_singletonEqualityColumn/singletonEqualityColumn_B0Bl0.gms", 4, -14.0, 5),
    ("examples_singletonEqualityColumn/singletonEqualityColumn_B0.gms", 4, -12.0, 5),
    ("examples_singletonEqualityColumn/singletonEqualityColumn_B1.gms", 4, -12.0, 5),
    ("examples_singletonEqualityColumn/singletonEqualityColumn_multiple_noLink.gms", 4, -9.0, 4),
    ("examples_singletonEqualityColumn/singletonEqualityColumn_multiple_resulting_noLink.gms", 4, -12.0, 4),
    ("examples_singletonInequalityColumn/singletonInequalityColumn_B0B2A1.gms", 4, -62.0, 9),
    ("examples_singletonInequalityColumn/singletonInequalityColumn_B0Bl0.gms", 4, -52.0, 14),
    ("examples_singletonInequalityColumn/singletonInequalityColumn_B0.gms", 4, -32.0, 7),
    ("examples_singletonInequalityColumn/singletonInequalityColumn_B1.gms", 4, -32.0, 7),
    ("examples_singletonRow/exampleAC_singletonRow2.gms", 3, 16.0, 5),
    ("examples_singletonRow/exampleAC_singletonRow3_singletonLinkingRow.gms", 3, 18.0, 7),
    ("examples_singletonRow/example_breakSingletonRows.gms", 4, -12.0, 8),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = []
    for rel, nb, obj, iters in INSTANCES:
        name = os.path.splitext(os.path.basename(rel))[0]
        lp = read_gms(os.path.join(REF, rel), nb)
        write_blocks(lp, os.path.join(OUT, name))
        manifest.append({"name": name, "n_files": nb, "objective": obj,
                         "iterations": iters, "source": rel})
        print(f"wrote {name} (N={lp.N}, n0={lp.n0}, n={lp.n})")
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"{len(manifest)} fixtures -> {OUT}")


if __name__ == "__main__":
    main()
