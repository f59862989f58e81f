"""Registered query for the full main-DAG orchestration parity run
(pipeline/main_dag.py; reference dags/kucoin_main_dag.py:59-64).

The oracle is the COMPOSITION of the per-table oracles: the three
fan-out SQL twins (suites/pipeline_parity.py), a funding CTE that
replays the PK-upsert as a plain dedup over the futures-restricted
scan (the merge's fixed point), and the flagship stats oracle
(pipeline/funding_stats.funding_stats_oracle_sql) re-rooted on that
funding store — all reduced to the same per-stage
(stage, n_rows, checksum) summary the Spark run emits.
"""

from __future__ import annotations

from funding_monitoring_spark.pipeline.funding_stats import (
    funding_stats_oracle_sql,
)
from funding_monitoring_spark.pipeline.main_dag import (
    CHECK_ROUND,
    main_dag_summary,
)
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.suites.pipeline_parity import (
    FUTURES_SNAPSHOT_SQL,
    LENDING_PIPELINE_SQL,
    SPOT_PAIRS_SNAPSHOT_SQL,
)

#: the stats stage recomputes over the funding STORE (not raw events):
#: re-root the flagship oracle's rates CTE on the funding CTE below,
#: anchoring "now" at the store's own max funding_time — exactly what
#: funding_stats_from_rates does on the Spark side.
_STATS_RATES_CTE = """
    SELECT f.symbol, f.funding_time, f.funding_rate, f.event_id,
           (SELECT MAX(funding_time) FROM funding) AS anchor
    FROM funding f
"""

MAIN_DAG_SQL = f"""
WITH futures AS ({FUTURES_SNAPSHOT_SQL}),
spot AS ({SPOT_PAIRS_SNAPSHOT_SQL}),
lending AS ({LENDING_PIPELINE_SQL}),
fut_symbols AS (
    SELECT DISTINCT regexp_replace(symbol, '-TM$', '') AS symbol
    FROM futures
),
all_rates AS (
    SELECT CAST(user_id AS VARCHAR) || '-' || event_type AS symbol,
           ts AS funding_time, value AS funding_rate, event_id
    FROM events
),
funding AS (  -- the upsert's fixed point: per-PK max-revision winner
    SELECT symbol, funding_time, funding_rate, event_id FROM (
        SELECT r.*, ROW_NUMBER() OVER (
                   PARTITION BY r.symbol, r.funding_time
                   ORDER BY r.event_id DESC) AS rn
        FROM all_rates r
        WHERE r.symbol IN (SELECT symbol FROM fut_symbols)
    ) WHERE rn = 1
)
SELECT 'create_tables' AS stage, CAST(10 AS BIGINT) AS n_rows,
       CAST(NULL AS DOUBLE) AS checksum
UNION ALL
SELECT 'update_active_futures', COUNT(*),
       ROUND(SUM(tick_size), {CHECK_ROUND}) FROM futures
UNION ALL
SELECT 'update_active_spot_pairs', COUNT(*),
       ROUND(SUM(spot_unit_volume24h), {CHECK_ROUND}) FROM spot
UNION ALL
SELECT 'append_new_lending_data', COUNT(*),
       ROUND(SUM(annualized_interest_rate), {CHECK_ROUND}) FROM lending
UNION ALL
SELECT 'update_funding_data', COUNT(*),
       ROUND(SUM(funding_rate), {CHECK_ROUND}) FROM funding
UNION ALL
SELECT 'update_funding_stats', COUNT(*),
       ROUND(SUM(funding_8h), {CHECK_ROUND})
FROM ({funding_stats_oracle_sql(rates_cte=_STATS_RATES_CTE)}) s
"""


@query("main_dag_parity", MAIN_DAG_SQL)
def q_main_dag_parity(spark, sf_dir):
    """One driver program reproducing the reference's full 6-task
    dependency graph (DDL root → 3-wide fan-out → funding upsert →
    stats snapshot), materializing every intermediate table store and
    returning the per-stage summary (kucoin_main_dag.py:59-64)."""
    return main_dag_summary(spark, sf_dir)
