"""Generated verification-window plan — no hand-written arithmetic.

The driver checks only the FIRST 50 registry entries externally each
round, so registry._PRIORITY rotates which queries lead. The standing
rotation rule (registry.py docstring, precommitted since r4):

  1. never-external queries first (PRIOR-round post-freeze
     registrations — they have a local row from an earlier round but
     no external row), in registration order;
  2. then every other query ordered by the round of its MOST RECENT
     external row (oldest first), ties broken by registration order;
  3. take the first 50.

Queries registered in the CURRENT round (no external row AND no local
row in any artifact <= max_round) are post-freeze registrations: they
ship with a local row this round and queue for the NEXT window, so
the tool excludes them — the committed window stays frozen while the
round adds queries.

This tool computes that plan from the driver's CORRECTNESS_r*.json
artifacts and the live registry, so the window list and its cohort
arithmetic are generated, never hand-counted (VERDICT r9 next-item #9 —
two rounds in a row contained a hand-arithmetic slip).

Per-round exceptions (e.g. "similarity rows lead their cohort because
similarity.py changed") are applied as documented swaps INSIDE a
cohort; the tool prints cohort boundaries so any such swap stays
within-cohort and auditable.

Usage: python tools/window_plan.py  (from the repo root)
Prints one JSON object: the 50-entry window plus cohort breakdown.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def compute_plan(max_round: int | None = None) -> dict:
    """Compute the window plan from artifacts up to and including
    `max_round` (default: all). Pinning max_round lets a test assert
    the committed _PRIORITY against the exact artifact set it was
    generated from, even after the driver writes the next round's
    artifact."""
    sys.path.insert(0, REPO)
    from funding_monitoring_spark import registry

    registry._load_all()
    reg_order = list(registry._QUERIES)  # dict preserves registration order
    reg_index = {q: i for i, q in enumerate(reg_order)}

    def _rounds(pattern: str) -> list[str]:
        paths = sorted(
            glob.glob(os.path.join(REPO, pattern)),
            key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
        )
        return [
            p
            for p in paths
            if max_round is None
            or int(re.search(r"_r(\d+)", p).group(1)) <= max_round
        ]

    last_external: dict[str, int] = {}
    paths = _rounds("CORRECTNESS_r*.json")
    for path in paths:
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for q in json.load(open(path)):
            last_external[q] = rnd

    # a query with SOME artifact row (local or external) <= max_round
    # existed before this round's freeze; one with none is a
    # current-round post-freeze registration and queues for next round
    known: set[str] = set(last_external)
    for path in _rounds("CORRECTNESS_LOCAL_r*.json"):
        known.update(json.load(open(path)))

    never = [
        q for q in reg_order if q not in last_external and q in known
    ]
    aged = sorted(
        (q for q in reg_order if q in last_external),
        key=lambda q: (last_external[q], reg_index[q]),
    )
    ordered = never + aged
    window = ordered[:WINDOW]

    cohorts: dict[str, list[str]] = {"never_external": never}
    for q in window[len(never):]:
        cohorts.setdefault(f"last_r{last_external[q]}", []).append(q)

    next_round = 1 + max(
        (int(re.search(r"_r(\d+)", p).group(1)) for p in paths), default=0
    )
    return {
        "for_round": next_round,
        "window": window,
        "cohort_sizes": {k: len(v) for k, v in cohorts.items()},
        "cohorts": cohorts,
        "overflow": len(ordered) - WINDOW,
        "queued_post_freeze": [q for q in reg_order if q not in known],
    }


def main() -> int:
    print(json.dumps(compute_plan()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
