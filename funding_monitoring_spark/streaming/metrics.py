"""Process-local per-tick timing collector for foreachBatch sinks.

foreachBatch callbacks run in the driver's Python process, so a plain
module-global list is enough to attribute a streaming query's wall
time to its phases: the micro-batch's own work (merge/write, snapshot
recompute) versus the engine's trigger + checkpoint-commit machinery
(the remainder). Disabled by default — bench.py flips ``ENABLED`` to
emit the per-tick breakdown the round-3 review asked for; correctness
runs never touch this.
"""

from __future__ import annotations

ENABLED = False

#: one dict per micro-batch: {store, batch_id, <phase>_sec, ...}
BATCH_TIMINGS: list[dict] = []


def record(**kw) -> None:
    if ENABLED:
        BATCH_TIMINGS.append(kw)


def drain() -> list[dict]:
    out = list(BATCH_TIMINGS)
    BATCH_TIMINGS.clear()
    return out
