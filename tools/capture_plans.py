"""Capture `.explain("formatted")` for named queries into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence for
optimization rounds (the judge checks plan claims against these).

    python tools/capture_plans.py --tag r13 --suffix before q1 q2 ...

Uses the same session factory as bench.py; plans are built (not
executed), so this is cheap and safe to run alongside other work.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funding_monitoring_spark import registry  # noqa: E402
from funding_monitoring_spark.operators.cachescope import (  # noqa: E402
    release_scoped_caches,
)
from funding_monitoring_spark.plans.inspect import plan_string  # noqa: E402
from funding_monitoring_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="fm_spark_capture_plans")
    qs = registry.queries()
    for name in args.names:
        df = qs[name](spark, SF_DIR)
        text = plan_string(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        release_scoped_caches()
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
