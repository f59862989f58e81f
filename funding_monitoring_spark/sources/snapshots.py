"""Manifest-based snapshot store: versioned commits, time-travel
reads, rollback, and snapshot expiry over plain parquet.

The reference's stores are mutable Postgres tables — an UPDATE is
destructive and "what did the table look like yesterday?" is
unanswerable (funding_rates_etl.py upserts in place). At 100 TB the
lakehouse answer is a TABLE FORMAT: data files are immutable, a tiny
JSON manifest enumerates the files visible at each version, and a
commit is one atomic metadata operation. This module is that design
reduced to its load-bearing core (the same skeleton as Iceberg/Delta,
storage-agnostic):

- ``store/data/<commit>/part-*.parquet`` — immutable data files; an
  append never rewrites bytes, so every historical snapshot is
  ZERO-COPY (versions share files).
- ``store/_manifests/v{N}.json`` — the file list (+ optional per-file
  column min/max stats) visible at version N. Readers plan from the
  manifest, never from a directory listing — on an object store the
  recursive LIST a plain parquet read needs is the scaling wall this
  removes.
- Commit = claim ``v{N+1}.json`` via hard-link of a fully-written
  temp file (``os.link`` fails atomically if the name exists) →
  optimistic concurrency: two racing writers get consecutive
  versions, neither sees a torn manifest, and a crash strands only an
  unreferenced temp file.
- ``rollback_snapshot`` never deletes history: it commits a NEW
  version whose file list equals the target's (roll-forward undo).
- ``expire_snapshots`` is the vacuum: drop manifests older than the
  retained window, then delete data files no retained version
  references. Readers of retained versions are never broken.

Per-file min/max stats (``stats_cols``) give manifest-level FILE
SKIPPING: a range predicate prunes files before Spark ever lists
them — the second pruning lever after directory partitioning, and
the one that works for NON-partition columns when the data is
range-clustered (write with ``repartitionByRange`` on the stats
column). Skipping returns a superset; the row-level predicate is
re-applied in the scan, so a stats bug can cost speed, never
correctness.

Per-file BLOOM filters (``bloom_cols``) are the EQUALITY-predicate
companion: min/max is useless for point lookups over hash-clustered
data (every file's range spans the domain), but a small per-file
bit array over the column's hashed values lets ``equals=`` prune
every file whose bloom provably excludes the key. Bits are set with
the repo's deterministic LCG (operators/sampling.key_hash), the
probe recomputes the same positions driver-side, and the same
superset-plus-row-filter contract applies: a false positive costs a
file read, never a wrong row. Cluster the write on the bloom column
(``repartition(n, col)``) so each file holds few distinct keys and
the filters stay sparse.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

#: per-file bloom sizing: 1024 bits / 4 hashes -> ~2% false-positive
#: rate at ~150 distinct keys per file (manifest cost: 256 hex chars
#: per file per column)
BLOOM_BITS = 1024
BLOOM_K = 4


def _manifest_dir(store: str) -> str:
    return os.path.join(store, _MANIFEST_DIR)


def _manifest_path(store: str, version: int) -> str:
    return os.path.join(_manifest_dir(store), f"v{version:09d}.json")


def list_versions(store: str) -> list[int]:
    """Committed snapshot versions, ascending. Metadata-only."""
    mdir = _manifest_dir(store)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def latest_version(store: str) -> int | None:
    vs = list_versions(store)
    return vs[-1] if vs else None


def _read_manifest(store: str, version: int) -> dict:
    with open(_manifest_path(store, version)) as fh:
        return json.load(fh)


def _claim_version(store: str, build_manifest) -> int:
    """Atomically commit the next version and return its number.
    ``build_manifest(parent_version)`` constructs the manifest dict
    for a commit whose parent is ``parent_version`` (None for the
    first commit). The manifest is FULLY written to a temp file
    first; ``os.link`` then either publishes it under the version
    name or raises FileExistsError (another writer won) — readers can
    never observe a partial manifest.

    The builder is re-invoked with the NEW latest version on every
    retry: an append's merged file list must include the racing
    winner's just-committed files, or the loser's snapshot silently
    drops committed rows. (Re-reading the parent manifest inside the
    retry loop is what makes 'two racing writers get consecutive
    versions' a correctness statement, not just a numbering one.)"""
    mdir = _manifest_dir(store)
    os.makedirs(mdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=mdir, prefix=".__commit_")
    try:
        while True:
            parent = latest_version(store)
            version = (parent or 0) + 1
            manifest = build_manifest(parent)
            manifest["version"] = version
            with os.fdopen(os.dup(fd), "w") as fh:
                fh.seek(0)
                fh.truncate()
                json.dump(manifest, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, _manifest_path(store, version))
                return version
            except FileExistsError:
                continue  # another writer won — rebuild from new parent
    finally:
        os.close(fd)
        os.unlink(tmp)


def _rel_files(store: str, commit_dir: str) -> list[dict]:
    """File entries for a just-written commit: path, size, and the
    ROW COUNT straight from the parquet footer (pyarrow metadata
    read — no data scan; footers are how real table formats get
    their stats for free). Row counts make COUNT(*) at any version a
    metadata-only operation (snapshot_row_count)."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(commit_dir):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            out.append(
                {
                    "path": os.path.relpath(p, store),
                    "bytes": os.path.getsize(p),
                    "rows": pq.ParquetFile(p).metadata.num_rows,
                }
            )
    return out


def _file_stats(
    spark: SparkSession, paths: list[str], stats_cols: list[str]
) -> dict[str, dict]:
    """{abs file path -> {col: [min, max]}} via one grouped scan over
    the just-written files (columns pruned to stats_cols)."""
    df = spark.read.parquet(*paths).select(*stats_cols)
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .collect()
    )
    from urllib.parse import unquote, urlparse

    out: dict[str, dict] = {}
    for r in rows:
        fp = r["__file"]
        if fp.startswith("file:"):
            # input_file_name returns a URI (file:///abs/path,
            # percent-encoded) — normalize to a plain abs path so it
            # keys against os.path.join(store, rel)
            fp = unquote(urlparse(fp).path)
        out[fp] = {
            c: [r[f"__min_{c}"], r[f"__max_{c}"]] for c in stats_cols
        }
    return out


_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _py_xxhash64(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 (public reference algorithm), seed 42 to
    match Spark's ``F.xxhash64`` on a string column's UTF-8 bytes —
    the driver-side probe mirror for STRING bloom keys (equality
    tested against Spark in tests/test_snapshots.py). Returns
    Spark's SIGNED bigint."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (v + lane * _XXP2) & _M64
                v = (_rotl64(v, 31) * _XXP1) & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = ((h * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((lane * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((_rotl64(h, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h ^= (lane * _XXP1) & _M64
        h = ((_rotl64(h, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h  # Spark bigint


def _py_key_hash(v: int, seed: int) -> int:
    """Driver-side mirror of operators/sampling.key_hash — the same
    LCG, so a probe computes exactly the bit positions the build
    set. Python's %% matches Spark's pmod for negative keys."""
    from funding_monitoring_spark.operators.sampling import (
        SAMPLE_INC,
        SAMPLE_MOD,
        SAMPLE_MUL,
        SAMPLE_SEED_PRIME,
    )

    bounded = (int(v) + seed * SAMPLE_SEED_PRIME) % SAMPLE_MOD
    return (bounded * SAMPLE_MUL + SAMPLE_INC) % SAMPLE_MOD


def _bloom_positions(value, bits: int = BLOOM_BITS) -> list[int]:
    """Bit positions for a probe value. STRING keys are fingerprinted
    with XXH64 first — the exact mirror of the build side's
    ``xxhash64(col)`` — then fed through the same LCG as integral
    keys, so string point lookups skip files too."""
    v = (
        _py_xxhash64(value.encode("utf-8"))
        if isinstance(value, str)
        else int(value)
    )
    return [_py_key_hash(v, seed=j) % bits for j in range(BLOOM_K)]


def _file_blooms(
    spark: SparkSession,
    paths: list[str],
    bloom_cols: list[str],
    bits: int = BLOOM_BITS,
) -> dict[str, dict[str, str]]:
    """{abs file path -> {col: hex bitstring}} via one grouped scan
    over the just-written files. Integral columns hash through the
    repo's bigint LCG directly; STRING columns are fingerprinted
    with ``xxhash64`` first (probe mirror: _py_xxhash64), so
    dedup-fingerprint / entity-key lookups skip files too."""
    from pyspark.sql.types import StringType

    from funding_monitoring_spark.operators.sampling import key_hash

    df = spark.read.parquet(*paths).select(*bloom_cols)
    aggs = []
    for c in bloom_cols:
        key = (
            F.xxhash64(F.col(c))
            if isinstance(df.schema[c].dataType, StringType)
            else F.col(c)
        )
        for j in range(BLOOM_K):
            aggs.append(
                F.collect_set(
                    F.pmod(key_hash(key, seed=j), F.lit(bits))
                ).alias(f"__b_{c}_{j}")
            )
    rows = (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .collect()
    )
    from urllib.parse import unquote, urlparse

    out: dict[str, dict[str, str]] = {}
    for r in rows:
        fp = r["__file"]
        if fp.startswith("file:"):
            fp = unquote(urlparse(fp).path)
        blooms = {}
        for c in bloom_cols:
            mask = 0
            for j in range(BLOOM_K):
                for p in r[f"__b_{c}_{j}"]:
                    mask |= 1 << int(p)
            blooms[c] = f"{mask:0{bits // 4}x}"
        out[fp] = blooms
    return out


def _bloom_may_contain(hex_mask: str, value) -> bool:
    mask = int(hex_mask, 16)
    bits = len(hex_mask) * 4
    return all(
        mask >> p & 1 for p in _bloom_positions(value, bits)
    )


def commit_snapshot(
    df: DataFrame,
    store: str,
    mode: str = "append",
    n_files: int | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    extra_meta: dict | None = None,
) -> int:
    """Write ``df`` as immutable data files and commit the next
    snapshot version; returns the version number.

    mode="append": the new version sees the parent's files PLUS the
    new ones (no byte is rewritten — the parent snapshot stays
    readable, zero-copy). mode="overwrite": the new version sees only
    the new files; the old data files remain on disk for time travel
    until ``expire_snapshots`` reclaims them.

    ``n_files`` repartitions before the write (deterministic file
    count); the caller may instead pre-arrange df (e.g.
    ``repartitionByRange`` on a stats column for tight min/max).
    ``stats_cols`` records per-file min/max in the manifest for
    manifest-level file skipping at read time; ``bloom_cols`` records
    per-file bloom filters (integral columns) for EQUALITY-predicate
    skipping (``snapshot_files(equals=...)``). ``extra_meta`` is
    stored verbatim in the manifest (e.g. a streaming sink's
    batch_id for replay idempotence).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    token = uuid.uuid4().hex[:12]
    commit_dir = os.path.join(store, _DATA_DIR, token)
    out = df.repartition(n_files) if n_files else df
    out.write.parquet(commit_dir)
    new_files = _rel_files(store, commit_dir)
    if stats_cols and new_files:
        stats = _file_stats(
            spark,
            [os.path.join(store, f["path"]) for f in new_files],
            stats_cols,
        )
        for f in new_files:
            f["stats"] = stats.get(
                os.path.abspath(os.path.join(store, f["path"])), {}
            )
    if bloom_cols and new_files:
        blooms = _file_blooms(
            spark,
            [os.path.join(store, f["path"]) for f in new_files],
            bloom_cols,
        )
        for f in new_files:
            f["bloom"] = blooms.get(
                os.path.abspath(os.path.join(store, f["path"])), {}
            )
    def build(parent: int | None) -> dict:
        files = list(new_files)
        if mode == "append" and parent is not None:
            files = _read_manifest(store, parent)["files"] + files
        manifest = {"operation": mode, "parent": parent, "files": files}
        if extra_meta:
            manifest["meta"] = extra_meta
        return manifest

    return _claim_version(store, build)


def snapshot_files(
    store: str,
    version: int | None = None,
    between: tuple[str, object, object]
    | list[tuple[str, object, object]]
    | None = None,
    equals: tuple[str, object]
    | list[tuple[str, object]]
    | None = None,
) -> list[str]:
    """Absolute data-file paths visible at ``version`` (default
    latest). ``between=(col, lo, hi)`` — or a LIST of such triples,
    ANDed — prunes via manifest min/max stats: files whose [min, max]
    cannot intersect [lo, hi] on ANY conjunct are skipped; files
    without stats for a conjunct's column are conservatively kept for
    that conjunct (skipping may over-include, never under-include).
    Multiple conjuncts are how z-order-clustered stats pay off: a
    rectangle predicate prunes on both dimensions at once.
    ``equals=(col, value)`` — or a list, ANDed — prunes via per-file
    bloom filters (``commit_snapshot(bloom_cols=...)``): a file is
    skipped when any of the value's hash bits is unset in its bloom;
    files without a bloom for the column are conservatively kept."""
    if version is None:
        version = latest_version(store)
        if version is None:
            raise ValueError(f"no snapshots committed at {store}")
    m = _read_manifest(store, version)
    files = m["files"]
    if between is not None:
        conjuncts = (
            [between] if isinstance(between, tuple) else list(between)
        )
        for col, lo, hi in conjuncts:
            kept = []
            for f in files:
                s = f.get("stats", {}).get(col)
                if s is None or s[0] is None or s[1] is None:
                    kept.append(f)
                elif not (s[1] < lo or s[0] > hi):
                    kept.append(f)
            files = kept
    if equals is not None:
        eq_conjuncts = (
            [equals] if isinstance(equals, tuple) else list(equals)
        )
        for col, value in eq_conjuncts:
            kept = []
            for f in files:
                b = f.get("bloom", {}).get(col)
                if b is None or _bloom_may_contain(b, value):
                    kept.append(f)
            files = kept
    return [os.path.join(store, f["path"]) for f in files]


def read_snapshot(
    spark: SparkSession,
    store: str,
    version: int | None = None,
    between: tuple[str, object, object]
    | list[tuple[str, object, object]]
    | None = None,
    equals: tuple[str, object]
    | list[tuple[str, object]]
    | None = None,
) -> DataFrame:
    """Time-travel read: the store exactly as of ``version`` (default
    latest). Plans from the manifest's explicit file list — no
    directory listing. With ``between`` (one (col, lo, hi) triple or
    a list, ANDed) and/or ``equals`` ((col, value) or a list),
    manifest stats / per-file blooms skip non-matching files AND the
    row-level predicates are applied, so results are exact regardless
    of how coarse the stats are or how many bloom false positives
    slip through."""
    files = snapshot_files(store, version, between, equals)
    if not files:
        if between is not None or equals is not None:
            all_files = snapshot_files(store, version)
            if all_files:
                # Pruning (stats/bloom) correctly eliminated every
                # file — the expected outcome of a point lookup for a
                # key absent from the store. Return an empty frame
                # with the store schema, not an error.
                return (
                    spark.read.parquet(*all_files)
                    .filter(F.lit(False))
                    .limit(0)
                )
        raise ValueError(
            f"snapshot v{version} of {store} has no data files"
        )
    df = spark.read.parquet(*files)
    if between is not None:
        conjuncts = (
            [between] if isinstance(between, tuple) else list(between)
        )
        for col, lo, hi in conjuncts:
            df = df.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
    if equals is not None:
        eq_conjuncts = (
            [equals] if isinstance(equals, tuple) else list(equals)
        )
        for col, value in eq_conjuncts:
            df = df.filter(F.col(col) == F.lit(value))
    return df


def read_snapshot_changes(
    spark: SparkSession,
    store: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental consumption: the rows ADDED between ``from_version``
    (exclusive) and ``to_version`` (inclusive, default latest) — i.e.
    the files in ``to``'s manifest absent from ``from``'s. A consumer
    that remembers its last processed version reprocesses nothing: at
    100 TB this is the difference between a daily pipeline that scans
    the day's appends and one that scans the table. Raises if any
    intervening commit is not an append (an overwrite/rollback
    invalidates file-set subtraction — the consumer must re-read the
    snapshot; same contract as Iceberg's incremental scan)."""
    if to_version is None:
        to_version = latest_version(store)
        if to_version is None:
            raise ValueError(f"no snapshots committed at {store}")
    if from_version > to_version:
        raise ValueError(
            f"from_version {from_version} > to_version {to_version}"
        )
    for v in list_versions(store):
        if from_version < v <= to_version:
            op = _read_manifest(store, v)["operation"]
            if op != "append":
                raise ValueError(
                    f"v{v} is {op!r}, not append: file-set diff is "
                    "not the row delta — re-read the snapshot"
                )
    old = {f["path"] for f in _read_manifest(store, from_version)["files"]}
    new = [
        os.path.join(store, f["path"])
        for f in _read_manifest(store, to_version)["files"]
        if f["path"] not in old
    ]
    if not new:
        raise ValueError(
            f"no files added between v{from_version} and v{to_version}"
        )
    return spark.read.parquet(*new)


def snapshot_row_count(store: str, version: int | None = None) -> int:
    """COUNT(*) as of ``version`` WITHOUT touching a data file: the
    sum of the manifest's per-file footer row counts. At 100 TB this
    is the difference between answering a count from a few KB of
    JSON and scanning the table; files committed before row counts
    were recorded raise loudly rather than undercount."""
    if version is None:
        version = latest_version(store)
        if version is None:
            raise ValueError(f"no snapshots committed at {store}")
    total = 0
    for f in _read_manifest(store, version)["files"]:
        if "rows" not in f:
            raise ValueError(
                f"manifest v{version} file {f['path']} predates row "
                "counts — re-commit or count by scanning"
            )
        total += f["rows"]
    return total


def last_committed_batch(store: str) -> int | None:
    """Highest streaming batch_id any manifest records (None if no
    commit carries one). Manifests are tiny JSONs; the scan is
    metadata-only."""
    best = None
    for v in list_versions(store):
        bid = _read_manifest(store, v).get("meta", {}).get("batch_id")
        if bid is not None and (best is None or bid > best):
            best = bid
    return best


def snapshot_commit_writer(
    store: str,
    mode: str = "append",
    n_files: int | None = None,
    stats_cols: list[str] | None = None,
):
    """foreachBatch sink: one snapshot version per micro-batch,
    EFFECTIVELY-ONCE under Structured Streaming's at-least-once batch
    redelivery — each commit records its batch_id in the manifest, and
    a redelivered batch (batch_id <= the highest already committed) is
    skipped instead of double-committed. That makes the versioned
    store a transaction log of the stream: downstream consumers read
    incrementally with ``read_snapshot_changes`` keyed on the versions
    they have processed (the streaming-ingest half of the table-format
    story). Empty batches commit nothing — versions map 1:1 to ticks
    that carried data."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(store)
        if last is not None and batch_id <= last:
            return
        if batch_df.isEmpty():
            return
        commit_snapshot(
            batch_df,
            store,
            mode=mode,
            n_files=n_files,
            stats_cols=stats_cols,
            extra_meta={"batch_id": batch_id},
        )

    return write


def snapshot_log(store: str) -> list[dict]:
    """Commit history, ascending: [{version, operation, parent,
    n_files, bytes}]. Metadata-only."""
    out = []
    for v in list_versions(store):
        m = _read_manifest(store, v)
        out.append(
            {
                "version": v,
                "operation": m["operation"],
                "parent": m["parent"],
                "n_files": len(m["files"]),
                "bytes": sum(f["bytes"] for f in m["files"]),
            }
        )
    return out


def rollback_snapshot(store: str, to_version: int) -> int:
    """Undo by ROLLING FORWARD: commit a new version whose file list
    equals ``to_version``'s. History is preserved (the bad version
    stays inspectable); nothing is deleted, so concurrent readers of
    any version are unaffected."""
    m = _read_manifest(store, to_version)
    return _claim_version(
        store,
        lambda parent: {
            "operation": "rollback",
            "parent": parent,
            "rolled_back_to": to_version,
            "files": m["files"],
        },
    )


def optimize_snapshot(
    spark: SparkSession,
    store: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    stats_cols: list[str] | None = None,
) -> int:
    """OPTIMIZE ZORDER for the snapshot store: rewrite the LATEST
    version z-order-clustered on (x_col, y_col) and commit it as a
    new overwrite version with per-file min/max stats on both
    columns — each output file covers a small Morton rectangle, so
    manifest-level skipping (snapshot_files(between=...)) prunes on
    EITHER dimension. Content-identical (the rewrite only re-arranges
    rows across files); prior versions stay time-travelable until
    expire_snapshots reclaims them — the same transactional OPTIMIZE
    a lakehouse table format provides. One range exchange; returns
    the new version."""
    from funding_monitoring_spark.operators.zorder import z_value

    df = read_snapshot(spark, store)
    if "__z" in df.columns:
        raise ValueError("optimize_snapshot reserves the column '__z'")
    arranged = (
        df.withColumn("__z", z_value(F.col(x_col), F.col(y_col)))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    return commit_snapshot(
        arranged,
        store,
        mode="overwrite",
        stats_cols=stats_cols or [x_col, y_col],
    )


def expire_snapshots(store: str, keep_last: int = 1) -> dict:
    """Vacuum: drop all but the newest ``keep_last`` manifests, then
    delete data files no RETAINED manifest references. The retained
    versions stay byte-identical readable; the reclaimed bytes are
    exactly the time-travel history given up. Returns
    {manifests_removed, files_removed, bytes_removed}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(store)
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    referenced = set()
    for v in keep:
        for f in _read_manifest(store, v)["files"]:
            referenced.add(f["path"])
    files_removed = 0
    bytes_removed = 0
    for v in drop:
        for f in _read_manifest(store, v)["files"]:
            if f["path"] in referenced:
                continue
            p = os.path.join(store, f["path"])
            if os.path.exists(p):
                bytes_removed += os.path.getsize(p)
                os.unlink(p)
                files_removed += 1
            referenced.add(f["path"])  # count each path once
    for v in drop:
        os.unlink(_manifest_path(store, v))
    # sweep now-empty commit dirs (cosmetic; correctness lives in the
    # manifests)
    data_root = os.path.join(store, _DATA_DIR)
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if os.path.isdir(full) and not any(
                files for _r, _d, files in os.walk(full)
            ):
                shutil.rmtree(full)
    return {
        "manifests_removed": len(drop),
        "files_removed": files_removed,
        "bytes_removed": bytes_removed,
    }
