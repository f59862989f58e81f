"""Paired sf0.1 / sf1 scale sweep -> BENCH_SF1.json.

Runs the named queries through bench.py twice (SPARK_GRAFT_SF_DIR =
/root/testdata/sf0.1, then testdata_sf1/ — the 10x fixture from
tools/make_sf1.py) and merges per-query wall times + 10x scale
factors into BENCH_SF1.json, preserving rows from earlier sweeps that
were not re-run. The artifact is the empirical backing for the
"would this survive 100x" plan story: a query whose wall grows ~10x
at 10x data is data-bound (fine); superlinear growth or a flat-but-
huge constant flags a hidden driver-side or per-tick cost.

For ALL-PAIRS OUTPUT-CONTRACT queries (fuzzy_title_pairs — wall is
dominated by materializing the true pair set, which grows ~k^2 with
duplicate-group size on the replicated fixture), pass them via
``--pairs``: the sweep then ALSO counts the query's output rows at
both scales and records sec-per-1k-rows plus an output-normalized
scale factor, so the artifact separates engine scaling from output
mass instead of letting a pair dump masquerade as a scaling number
(VERDICT r11 "what's wrong" #1).

Usage: python tools/sf1_sweep.py [--note TEXT] [--pairs NAME]...
       name [name ...]
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
    # errors come back as NAMED rows, not a crash: a query that
    # REFUSES BY DESIGN at one scale (image_dhash_near_dup's
    # max_band_bucket guard fires on the duplicate-dense sf1
    # fixture) must appear in the artifact as a refusal, and a
    # genuine breakage must not lose the rest of the sweep
    # (pre-r13 this raised and the whole sweep died on the named
    # guard refusal).
    return summary["queries"], summary.get("errors", {})


def count_rows(sf_dir: str, names: list[str]) -> dict[str, int]:
    """Count each named query's output rows at sf_dir in a fresh
    subprocess session (bench times walls; this measures the OUTPUT
    mass an all-pairs contract materializes)."""
    prog = (
        "import json, sys; sys.path.insert(0, %r); "
        "from funding_monitoring_spark.session import get_spark; "
        "from funding_monitoring_spark import registry; "
        "spark = get_spark(); qs = registry.queries(); "
        "print(json.dumps({n: qs[n](spark, %r).count() for n in %r}))"
    ) % (REPO, sf_dir, names)
    out = subprocess.run(
        [sys.executable, "-c", prog],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    for ln in reversed(out.stdout.splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)
    raise SystemExit(f"row count at {sf_dir} printed no JSON:\n"
                     + out.stdout[-2000:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--note", action="append", default=[])
    ap.add_argument(
        "--pairs", action="append", default=[],
        help="all-pairs output-contract queries: also record output "
             "rows + sec-per-1k-rows + an output-normalized factor",
    )
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default=os.path.join(REPO, "testdata_sf1"))
    args = ap.parse_args()

    names = list(dict.fromkeys(args.names + args.pairs))
    args.names = names
    t01, e01 = run_bench(args.sf01, names)
    t1, e1 = run_bench(args.sf1, names)
    rows01 = count_rows(args.sf01, args.pairs) if args.pairs else {}
    rows1 = count_rows(args.sf1, args.pairs) if args.pairs else {}

    art = (
        json.load(open(ARTIFACT))
        if os.path.exists(ARTIFACT)
        else {"queries": {}, "findings": []}
    )
    n_refusals = 0
    for n in args.names:
        if n in e01 or n in e1:
            # one- or two-sided refusal/error: a named row, never a
            # silent drop (and never a fake timing)
            n_refusals += 1
            row = {}
            if n in t01:
                row["sf01_sec"] = round(t01[n], 3)
            if n in t1:
                row["sf1_sec"] = round(t1[n], 3)
            if n in e01:
                row["sf01_error"] = e01[n][:300]
            if n in e1:
                row["sf1_error"] = e1[n][:300]
            art["queries"][n] = row
            continue
        art["queries"][n] = {
            "sf1_sec": round(t1[n], 3),
            "sf01_sec": round(t01[n], 3),
            "scale_factor_10x": round(t1[n] / max(t01[n], 1e-9), 2),
        }
        if n in args.pairs:
            r01, r1 = rows01[n], rows1[n]
            per01 = 1000.0 * t01[n] / max(r01, 1)
            per1 = 1000.0 * t1[n] / max(r1, 1)
            art["queries"][n].update(
                {
                    "sf01_rows": r01,
                    "sf1_rows": r1,
                    "sf01_sec_per_1k_rows": round(per01, 3),
                    "sf1_sec_per_1k_rows": round(per1, 3),
                    "output_growth_10x": round(r1 / max(r01, 1), 1),
                    "scale_factor_10x_output_normalized": round(
                        per1 / max(per01, 1e-9), 4
                    ),
                    "note": (
                        "all-pairs OUTPUT contract: raw wall tracks "
                        "the true pair mass the fixture creates "
                        f"({r01} -> {r1} pairs at 10x data); wall "
                        "growth below output growth = sublinear in "
                        "its true output; sec-per-1k-rows is the "
                        "engine-side unit cost (the sf0.1 figure is "
                        "fixed-cost dominated at tiny output)"
                    ),
                }
            )
    art["metric"] = "sf1_spot_sweep_wall_sec"
    art["value"] = round(
        sum(
            q["sf1_sec"]
            for q in art["queries"].values()
            if "sf1_sec" in q
        ),
        3,
    )
    art["unit"] = "sec"
    art["sf"] = 1.0
    art["n_queries"] = len(art["queries"])
    art["n_errors"] = sum(
        1
        for q in art["queries"].values()
        if "sf01_error" in q or "sf1_error" in q
    )
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
