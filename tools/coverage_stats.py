"""Generated cumulative external-coverage stats.

Unions the driver's CORRECTNESS_r*.json artifacts and reports, per
round, how many registry queries have EVER had a green external row
(rows/schema/hash all matching, no err). This is the single source of
the "cumulative external coverage" number — registry.py points here
instead of hand-writing the count (VERDICT r8 next-item #8).

Usage: python tools/coverage_stats.py  (from the repo root)
Prints one JSON line:
  {"registry": N, "rounds": {"r1": {"window": n, "green": n,
   "cumulative": n}, ...}, "never_external": [...]}
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: dict) -> bool:
    """A row is green only if err is absent AND every match key is
    present and literally True — a partial or malformed artifact row
    must not inflate the coverage number (ADVICE r9)."""
    if row.get("err") is not None:
        return False
    for key in ("rows_match", "schema_match", "hash_match"):
        if row.get(key) is not True:
            return False
    return True


def main() -> int:
    sys.path.insert(0, REPO)
    from funding_monitoring_spark import registry

    registry._load_all()
    names = list(registry._QUERIES)

    ever: set[str] = set()
    rounds: dict[str, dict] = {}
    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    for path in paths:
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        data = json.load(open(path))
        green = {q for q, row in data.items() if _green(row)}
        ever |= green
        rounds[f"r{rnd}"] = {
            "window": len(data),
            "green": len(green),
            "red": len(data) - len(green),
            "cumulative": len(ever & set(names)),
        }
    out = {
        "registry": len(names),
        "rounds": rounds,
        "never_external": [q for q in names if q not in ever],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
