"""Supplementary driver-format correctness artifact.

The external grading driver differentially checks only the FIRST 50
entries of __spark_entry__.queries() per round (registry._PRIORITY
decides which). This tool runs the SAME Spark-vs-DuckDB compare, in
the same row format, over the queries OUTSIDE the round's window (or
an explicit name list / --all), and writes CORRECTNESS_LOCAL_r{N}.json
next to the driver's artifact — so every registered query carries a
driver-format row every round, not just pytest evidence.

Usage:
    python tools/local_correctness.py --round 4            # overflow only
    python tools/local_correctness.py --round 4 --all      # all queries
    python tools/local_correctness.py --round 4 --names a,b
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df):
    """The driver's canonical form — single definition lives in
    tests/conftest.py (raw-column sort BEFORE stringification, so
    complex cells fail here exactly as they fail in the external
    driver; round 5's two red rows were masked by a local normalize
    that stringified list cells first)."""
    from tests.conftest import normalize as _n

    return _n(df)


def value_hash(norm) -> str:
    h = hashlib.sha256()
    h.update("|".join(norm.columns).encode())
    for row in norm.itertuples(index=False, name=None):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--names", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50,
                    help="driver window size to exclude (ignored with "
                    "--all/--names)")
    args = ap.parse_args()

    import duckdb

    from funding_monitoring_spark import registry
    from funding_monitoring_spark.session import get_spark

    qs = registry.queries()
    oracles = registry.oracle_sql()
    if args.names:
        names = args.names.split(",")
    elif args.all:
        names = list(qs)
    else:
        names = list(qs)[args.window:]

    spark = get_spark(app_name="local_correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{args.sf_dir}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            got = normalize(qs[name](spark, args.sf_dir).toPandas())
            rec["spark_rows"] = len(got)
            if name in oracles:
                want = normalize(con.sql(oracles[name]).df())
                rec["oracle_rows"] = len(want)
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = list(got.columns) == list(
                    want.columns
                )
                rec["hash_match"] = value_hash(got) == value_hash(want)
            else:  # rows-only check, like the driver's weaker form
                rec["rows_match"] = rec["schema_match"] = True
                rec["hash_match"] = None
        except Exception as ex:  # noqa: BLE001 — recorded, not raised
            rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
        finally:
            from funding_monitoring_spark.operators.cachescope import (
                release_scoped_caches,
            )

            release_scoped_caches()
        ok = (
            rec["err"] is None
            and rec["rows_match"]
            and rec["schema_match"]
            and rec["hash_match"] is not False
        )
        n_fail += 0 if ok else 1
        results[name] = rec
        print(
            f"{'OK  ' if ok else 'FAIL'} {name} "
            f"({rec['spark_rows']} rows, {time.time() - t0:.1f}s)",
            flush=True,
        )

    out_path = os.path.join(REPO, f"CORRECTNESS_LOCAL_r{args.round}.json")
    # merge into the round's existing artifact: a --names refresh of a
    # few queries must not clobber the full overflow pass. Rows whose
    # query no longer exists in the registry are PRUNED on merge — a
    # renamed/deleted query must not keep a stale green row alive.
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            merged = {
                k: v
                for k, v in json.load(fh).items()
                if k in qs
            }
    merged.update(results)
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=2)
    print(
        f"wrote {out_path}: {len(results) - n_fail}/{len(results)} ok "
        f"this run, {len(merged)} total rows"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
