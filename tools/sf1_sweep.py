"""Paired sf0.1 / sf1 scale sweep -> BENCH_SF1.json.

Runs the named queries through bench.py twice (SPARK_GRAFT_SF_DIR =
/root/testdata/sf0.1, then testdata_sf1/ — the 10x fixture from
tools/make_sf1.py) and merges per-query wall times + 10x scale
factors into BENCH_SF1.json, preserving rows from earlier sweeps that
were not re-run. The artifact is the empirical backing for the
"would this survive 100x" plan story: a query whose wall grows ~10x
at 10x data is data-bound (fine); superlinear growth or a flat-but-
huge constant flags a hidden driver-side or per-tick cost.

Usage: python tools/sf1_sweep.py [--note TEXT] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "BENCH_SF1.json")


def run_bench(sf_dir: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *names],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    # Key-tag the contract line instead of trusting stdout position:
    # bench.py prints a detail object then the driver-contract summary
    # ({"metric", "queries", ...}); any extra JSON-looking log line
    # used to silently shift lines[1] to the wrong object (ADVICE r9).
    # Take the LAST line that parses and carries the contract keys.
    summary = None
    for ln in out.stdout.splitlines():
        if not ln.startswith("{"):
            continue
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "metric" in obj and "queries" in obj:
            summary = obj
    if summary is None:
        raise SystemExit(
            f"bench at {sf_dir} printed no contract line "
            "({'metric', 'queries'}):\n" + out.stdout[-2000:]
        )
    if summary.get("n_errors"):
        raise SystemExit(f"bench errors at {sf_dir}: {summary}")
    return summary["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--note", action="append", default=[])
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default=os.path.join(REPO, "testdata_sf1"))
    args = ap.parse_args()

    t01 = run_bench(args.sf01, args.names)
    t1 = run_bench(args.sf1, args.names)

    art = (
        json.load(open(ARTIFACT))
        if os.path.exists(ARTIFACT)
        else {"queries": {}, "findings": []}
    )
    for n in args.names:
        art["queries"][n] = {
            "sf1_sec": round(t1[n], 3),
            "sf01_sec": round(t01[n], 3),
            "scale_factor_10x": round(t1[n] / max(t01[n], 1e-9), 2),
        }
    art["metric"] = "sf1_spot_sweep_wall_sec"
    art["value"] = round(sum(q["sf1_sec"] for q in art["queries"].values()), 3)
    art["unit"] = "sec"
    art["sf"] = 1.0
    art["n_queries"] = len(art["queries"])
    art["n_errors"] = 0
    art.setdefault(
        "fixture",
        "testdata_sf1/ = events/documents/embeddings replicated 10x "
        "from sf0.1 with shifted primary keys (tools/make_sf1.py); "
        "TPC-H tables symlinked at sf0.1 (unused by these queries)",
    )
    art["findings"] = art.get("findings", []) + args.note
    json.dump(art, open(ARTIFACT, "w"), indent=1)
    print(json.dumps({n: art["queries"][n] for n in args.names}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
