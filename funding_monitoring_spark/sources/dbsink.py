"""Relational upsert sink over DB-API — the JDBC-transport seam.

The reference's K1/K2 sink is a Postgres ``INSERT ... ON CONFLICT
(pk) DO UPDATE SET col = EXCLUDED.col`` executed per batch
(scripts/funding_rates_etl.py:100-111). The engine reproduces the
MERGE SEMANTICS storage-agnostically (operators/upsert.py, the
parquet-store writers); this module supplies the relational TRANSPORT
for a deployment that really writes a database: per-partition DB-API
connections streaming ``executemany`` upserts — the same distribution
shape as Spark's built-in JDBC writer (one connection per partition,
rows never collected to the driver).

The connection factory is injectable and must be picklable (it ships
to executors). The sandbox has no Postgres, but stdlib sqlite3 speaks
the identical ``ON CONFLICT ... DO UPDATE SET ... excluded.*`` dialect
(SQLite ≥ 3.24), so the sink is tested END-TO-END against a real
database file (tests/test_sinks_registry.py) — swapping in psycopg2
for production changes only the factory.

Ordering note: ON CONFLICT applies upserts in ARRIVAL order — exactly
the reference's last-arrival-wins. For the engine's stronger
order-aware contract (max order_cols wins regardless of arrival),
dedupe each batch first (operators/upsert.dedupe_batch) the same way
streaming/sinks.upsert_writer does before its merge.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

from pyspark.sql import DataFrame

#: returns a live DB-API connection; must be picklable (top-level
#: function / functools.partial over plain args)
ConnectionFactory = Callable[[], Any]


def upsert_statement(
    table: str, cols: Sequence[str], key_cols: Sequence[str]
) -> str:
    """The reference's upsert statement, parameterized: INSERT ... ON
    CONFLICT(keys) DO UPDATE SET non-keys = excluded.non-keys.
    Identifiers are validated (no quoting games) because they come
    from DataFrame schemas, not user input."""
    for ident in (table, *cols, *key_cols):
        if not ident.replace("_", "").isalnum():
            raise ValueError(f"unsafe SQL identifier: {ident!r}")
    missing = [k for k in key_cols if k not in cols]
    if missing:
        raise ValueError(
            f"key_cols {missing} not present in cols — the ON CONFLICT "
            "target must be a subset of the inserted columns"
        )
    updates = ", ".join(
        f"{c} = excluded.{c}" for c in cols if c not in key_cols
    )
    if not updates:
        raise ValueError("upsert needs at least one non-key column")
    return (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"VALUES ({', '.join('?' * len(cols))}) "
        f"ON CONFLICT ({', '.join(key_cols)}) DO UPDATE SET {updates}"
    )


def upsert_via_dbapi(
    df: DataFrame,
    table: str,
    key_cols: Sequence[str],
    connect: ConnectionFactory,
    batch_size: int = 500,
) -> None:
    """Distributed relational upsert: each partition opens ONE
    connection, streams its rows through ``executemany`` in
    ``batch_size`` chunks, and commits once — rows never pass through
    the driver. A partition failure rolls back its own transaction;
    Spark's task retry re-runs it, and the upsert statement is
    idempotent per row, so retries are safe (the reference's
    retries + PK-upsert contract)."""
    cols = list(df.columns)
    sql = upsert_statement(table, cols, list(key_cols))

    def write_partition(rows: Iterable[Any]) -> None:
        conn = connect()
        try:
            cur = conn.cursor()
            buf: list[tuple] = []
            for row in rows:
                buf.append(tuple(row))
                if len(buf) >= batch_size:
                    cur.executemany(sql, buf)
                    buf.clear()
            if buf:
                cur.executemany(sql, buf)
            conn.commit()
        except BaseException:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(write_partition)
