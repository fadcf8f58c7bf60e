"""Produce the actual-vs-reference iteration parity table (PARITY.md) by
solving every golden GAMSsmall instance and comparing iteration counts to
the reference's recorded values (gamssmall_instance_data.txt)."""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pips_ipmpp_tpu.core.options import Options  # noqa: E402
from pips_ipmpp_tpu.core.status import TerminationStatus  # noqa: E402
from pips_ipmpp_tpu.io.blockfile import read_blocks  # noqa: E402
from pips_ipmpp_tpu.ipm.solver import IPMSolver  # noqa: E402
from pips_ipmpp_tpu.linalg.arrow_backend import ArrowBackend  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data", "gamssmall")

with open(os.path.join(DATA, "manifest.json")) as f:
    manifest = json.load(f)

rows = []
for entry in manifest:
    lp = read_blocks(os.path.join(DATA, entry["name"]),
                     n_blocks=entry["n_files"])
    r = IPMSolver(ArrowBackend, Options()).solve(lp)
    ok = r.status == TerminationStatus.SUCCESSFUL_TERMINATION
    obj_err = abs(float(r.objective) - entry["objective"])
    rows.append((entry["name"], entry["iterations"], r.iterations,
                 ok, obj_err))

print("| instance | ref iters | ours | within 1.1x ref | obj err |")
print("|---|---|---|---|---|")
n_within = 0
for name, ref_it, ours, ok, err in rows:
    budget = int(ref_it * 1.1)
    within = ours <= budget
    n_within += within
    print(f"| {name} | {ref_it} | {ours} | "
          f"{'yes' if within else f'NO (budget {budget})'} | {err:.1e} |")
print(f"\n{n_within}/{len(rows)} within the reference's own 1.1x budget "
      f"(t_pips.cpp:118-119); "
      f"{sum(1 for r in rows if r[2] < r[1])}/{len(rows)} need FEWER "
      "iterations than the reference recorded.")
