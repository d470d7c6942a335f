"""Engine-native sinks: partitioned parquet for the data plane.

The reference's data plane is directory-per-day CSV behind Drill
(docs/DATA_SOURCES.md:7-19). The 100 TB posture is a one-time conversion to
columnar parquet partitioned by (event_date[, entity bucket]) so every
windowed read becomes partition pruning instead of path construction —
these helpers are that conversion plus the general partitioned writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from funnel_report_etl_pipeline__spark.sources.datespec import DateWindow
from funnel_report_etl_pipeline__spark.sources.readers import read_funnel_csv


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Partitioned parquet writer.

    ``target_file_rows`` caps rows per output file (maxRecordsPerFile) so a
    skewed partition still produces splittable, row-group-sized files —
    the property the local testdata lacks (PLANS.md caveats)."""
    w = df.write.mode(mode)
    if target_file_rows:
        w = w.option("maxRecordsPerFile", target_file_rows)
    w.partitionBy(*partition_cols).parquet(path)


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Format-parameterized columnar writer: ``parquet`` (default) or
    ``orc`` — both are splittable, compressed, predicate-pushdown-capable
    columnar formats with native Spark readers, so a deployment standardized
    on ORC (Hive-era warehouses) gets the identical write surface.
    Interop note: the testdata convention and the oracle gate stay on
    parquet (DuckDB reads it natively); ORC round-trip + pushdown parity is
    pinned in tests/test_sinks.py."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    w = df.write.mode(mode).format(fmt)
    if target_file_rows:
        w = w.option("maxRecordsPerFile", target_file_rows)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)


def read_columnar(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Reader twin of ``write_columnar`` — one call site for both formats
    so pipelines swap storage formats without touching their plans."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    return spark.read.format(fmt).load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table — the shuffle-free-join
    layout. Two fact tables bucketed on the same key with the same bucket
    count join WITHOUT an exchange (verified by plan assertion in
    tests/test_bucketing.py); at 100 TB that deletes the two largest
    shuffles in the workload. Sorting within buckets additionally removes
    the sort for sort-merge joins."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def materialize_daily_rollup(
    spark: SparkSession,
    events: DataFrame,
    out_path: str,
    ts_col: str = "ts",
    refresh_tail_days: int = 1,
) -> DataFrame:
    """Incremental day-grain rollup materialization (the hypertable-rollup
    pattern): compute only the day partitions missing from ``out_path`` —
    plus the newest ``refresh_tail_days`` of the available days, which are
    ALWAYS recomputed because the most recent partition may have been
    materialized mid-day (an existing partition is no proof of a closed
    day). Dynamic partition overwrite makes the tail refresh idempotent.

    Returns the full materialized rollup (pruned reads thereafter)."""
    day = F.date_format(ts_col, "yyyy-MM-dd")

    def _read_existing() -> DataFrame:
        # dynamic overwrite replaces files under the path: drop Spark's
        # cached file listing first or reads hit deleted part-files.
        # partition-type inference reads the day partition back as DATE;
        # normalize to the ISO string the writer used so set-difference
        # (and the returned schema) are stable
        spark.catalog.refreshByPath(out_path)
        return spark.read.parquet(out_path).withColumn(
            "day", F.col("day").cast("string")
        )

    from pyspark.errors import AnalysisException

    try:
        existing = {r.day for r in _read_existing().select("day").distinct().collect()}
    except AnalysisException as e:
        # ONLY path-not-found means "first run, nothing materialized yet".
        # Any other analysis error (corrupt store, permission denied, bad
        # schema) must propagate — silently treating it as first-run would
        # recompute and overwrite the whole rollup, masking the fault.
        if (e.getErrorClass() or "") != "PATH_NOT_FOUND":
            raise
        existing = set()

    available = sorted(r.day for r in events.select(day.alias("day")).distinct().collect())
    tail = set(available[-refresh_tail_days:]) if refresh_tail_days > 0 else set()
    missing = sorted((set(available) - existing) | tail)
    if missing:
        rollup = (
            events.withColumn("day", day)
            .filter(F.col("day").isin(missing))
            .groupBy("day", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.count_distinct("user_id").alias("n_users"),
                F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias(
                    "total_value"
                ),
            )
        )
        (
            rollup.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(out_path)
        )
    elif not existing:
        # first run with zero input: nothing was ever written — return an
        # empty frame with the rollup contract instead of reading a
        # nonexistent path
        return spark.createDataFrame(
            [],
            "day string, event_type string, n_events long, n_users long, total_value double",
        )
    return _read_existing()


DOCUMENT_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = DOCUMENT_JSONL_SCHEMA,
) -> DataFrame:
    """JSONL document ingestion — the wire format crawl dumps and
    training-data releases actually arrive in (one JSON object per line).
    The schema is EXPLICIT: schema inference would scan the corpus twice
    and silently widen types per shard; corrupt lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of killing a 100 TB
    ingest, and the caller decides whether to count or quarantine them.
    JSON text is a row format — convert to parquet (``write_training_shards``
    or ``write_partitioned``) before analytical reads. Note Spark disallows
    queries referencing ONLY ``_corrupt_record`` on a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — persist or
    convert first, then audit the quarantine column."""
    # StructType.add MUTATES the receiver (and returns it) — copy the field
    # list instead, or the shared module-level schema grows a duplicate
    # _corrupt_record on the second call
    fields = [f for f in schema.fields if f.name != "_corrupt_record"]
    full = T.StructType(fields + [T.StructField("_corrupt_record", T.StringType())])
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.json(paths)


def write_training_shards(
    df: DataFrame,
    out_path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> DataFrame:
    """Training-data export: content-addressed sharding + manifest.

    Every row goes to shard md5(id) % n_shards — the deterministic
    assignment ``shard_shuffle`` uses, so the same corpus shards
    identically on any engine/cluster/partitioning — written as one
    parquet directory per shard (`shard=K/`), one file per shard
    (each shard repartitioned to 1 — shard count, not file count, is the
    parallelism knob here). Returns the MANIFEST: per-shard row counts
    and an order-independent content checksum (BIGINT sum of the 32-bit
    md5 prefix of each id), the artifact a training job verifies before
    touching the data. The manifest is recomputed FROM THE WRITTEN FILES,
    not from the input lineage — it attests what landed on disk."""
    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    shard = (key % n_shards).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out_path)
    )
    spark = df.sparkSession
    spark.catalog.refreshByPath(out_path)
    from pyspark.errors import AnalysisException

    try:
        written = spark.read.parquet(out_path)
    except AnalysisException as e:
        # an EMPTY input writes only _SUCCESS (no partition dirs, no
        # schema to infer) — a zero-survivor day is a legitimate daily-
        # job outcome and must yield an empty manifest, not a crash
        if "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        return spark.createDataFrame(
            [], "shard int, n_rows long, content_checksum long"
        )
    wkey = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        written.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(wkey).alias("content_checksum"),
        )
        .orderBy("shard")
    )


def _shards_manifest(spark: SparkSession, out_path: str, id_col: str) -> DataFrame:
    """Manifest recomputed FROM THE WRITTEN FILES (what landed on disk,
    not what the input lineage promised)."""
    from pyspark.errors import AnalysisException

    spark.catalog.refreshByPath(out_path)
    try:
        written = spark.read.parquet(out_path)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        # zero-survivor export: only _SUCCESS on disk — empty manifest
        return spark.createDataFrame(
            [], "shard int, n_rows long, content_checksum long"
        )
    wkey = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        written.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(wkey).alias("content_checksum"),
        )
        .orderBy("shard")
    )


def ensure_training_shards(
    df: DataFrame,
    out_path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    change_token: str | None = None,
) -> DataFrame:
    """Idempotent shard export: the daily-job form of
    ``write_training_shards``. Two skip strategies:

    * ``change_token`` given — the caller supplies an O(files) change
      indicator (e.g. a hash of the INPUT's file listing:
      ``listing_token``). The skip decision compares tokens only: a
      repeated run never executes the input lineage at all, which is
      what makes the no-change day cheap at 100 TB (the 10× probe
      measured the content-signature path still paying the full
      pipeline compute just to decide to skip). The token OWNS change
      detection: if the caller passes a stale token for changed data,
      stale shards are served — by design.
    * ``change_token`` None — the input's content signature (row count +
      order-independent BIGINT sum of 32-bit md5(id) prefixes, the same
      checksum the manifest carries) is computed from the lineage and
      compared; correct without caller cooperation, but costs one pass
      over the input per run.

    On a match the write is SKIPPED entirely and the manifest is
    recomputed from the existing files (pinned by file-mtime tests). A
    mismatch rewrites shards + meta — atomically-enough for a
    single-writer daily job (concurrent writers need a lock or a
    run-id-suffixed directory swap, out of scope here)."""
    spark = df.sparkSession
    meta_path = out_path.rstrip("/") + "_meta.parquet"

    def _saved_meta() -> dict | None:
        try:
            rows = spark.read.parquet(meta_path).collect()
            return rows[0].asDict() if rows else None
        except Exception:  # noqa: BLE001 — missing/garbled meta = first run
            return None

    m = _saved_meta()
    if change_token is not None:
        if (
            m is not None
            and m.get("token") == change_token
            and int(m["n_shards"]) == n_shards
        ):
            return _shards_manifest(spark, out_path, id_col)
        n_in, sig_in = -1, -1  # lineage never executed on this path
    else:
        key = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        row = df.agg(
            F.count("*").alias("n"), F.coalesce(F.sum(key), F.lit(0)).alias("sig")
        ).collect()[0]
        n_in, sig_in = int(row["n"]), int(row["sig"])
        if (
            m is not None
            and m.get("token", "") == ""
            and int(m["n_rows"]) == n_in
            and int(m["sig"]) == sig_in
            and int(m["n_shards"]) == n_shards
        ):
            return _shards_manifest(spark, out_path, id_col)
    manifest = write_training_shards(df, out_path, n_shards=n_shards, id_col=id_col)
    spark.createDataFrame(
        [(n_in, sig_in, n_shards, change_token or "")],
        "n_rows long, sig long, n_shards long, token string",
    ).coalesce(1).write.mode("overwrite").parquet(meta_path)
    return manifest


def listing_token(path: str) -> str:
    """O(files) change indicator for a parquet directory: md5 over the
    sorted (relative-path, size, mtime_ns) listing. The 100 TB analogue
    is the object-store listing (ETags / generation numbers) — the point
    is that deciding "did yesterday's input change?" reads METADATA, not
    data. Missing path hashes to a distinct constant so first runs and
    deleted inputs never collide with a real listing."""
    import hashlib
    import os as _os

    h = hashlib.md5()
    if not _os.path.exists(path):
        h.update(b"<missing>")
        return h.hexdigest()
    if _os.path.isfile(path):  # single-file parquet (the testdata shape)
        st = _os.stat(path)
        h.update(f"{_os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}\n".encode())
        return h.hexdigest()
    for dirpath, dirnames, filenames in sorted(_os.walk(path)):
        dirnames.sort()
        for fname in sorted(filenames):
            if fname.startswith((".", "_")):
                continue  # checksums/_SUCCESS churn without data change
            p = _os.path.join(dirpath, fname)
            st = _os.stat(p)
            rel = _os.path.relpath(p, path)
            h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def convert_landing_zone(
    spark: SparkSession,
    base: str,
    dataset: str,
    window: DateWindow,
    schema: T.StructType,
    out_path: str,
    target_file_rows: int | None = None,
) -> DataFrame:
    """One-time CSV landing zone → date-partitioned parquet conversion.

    ONE multi-path scan (never a per-day loop — that is the reference's
    N+1 anti-pattern); the typed ``event_date`` partition column is derived
    from each row's source path via ``input_file_name()``. After this,
    every reader is a pruned columnar scan and the per-day CSV path logic
    is dead."""
    df = read_funnel_csv(spark, base, dataset, window, schema)
    stamped = df.withColumn(
        "event_date",
        F.to_date(
            F.regexp_extract(F.input_file_name(), r"(\d{2}_\d{2}_\d{4})", 1),
            "dd_MM_yyyy",
        ),
    )
    write_partitioned(stamped, out_path, ["event_date"], target_file_rows=target_file_rows)
    return spark.read.parquet(out_path)


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory into
    ceil(total_bytes / target) evenly-sized files. The chronic landing-zone
    disease at scale — streaming jobs and per-day ingests leave thousands
    of KB-sized files whose per-file open/footer/task overhead dominates
    scans and whose row groups are too small for effective predicate
    pushdown. Sizing comes from the actual file listing (driver-side
    metadata, not data); the rewrite is one scan + one round-robin
    repartition. Returns the target file count.

    Local filesystem paths only: the os.walk sizing would silently sum
    zero bytes on hdfs:// or s3a:// URIs and collapse everything into one
    file, so non-local schemes fail loudly (on a cluster, size via the
    Hadoop FileSystem API instead)."""
    import os as _os

    if "://" in in_path and not in_path.startswith("file://"):
        raise ValueError(
            f"compact_small_files sizes input via os.walk and only supports "
            f"local paths; got {in_path!r} — list sizes with the Hadoop "
            f"FileSystem API for remote URIs"
        )
    # os.walk cannot traverse a file:// URI (it would yield nothing and the
    # zero total collapses everything into one file — the exact failure the
    # scheme guard exists to prevent), so strip the scheme for the listing
    walk_path = in_path.removeprefix("file://") if in_path.startswith("file://") else in_path
    total = sum(
        _os.path.getsize(_os.path.join(r, f))
        for r, _, fs in _os.walk(walk_path)
        for f in fs
        if f.endswith(".parquet") or f.startswith("part-")
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(in_path)
    df.repartition(n_files).write.mode(mode).parquet(out_path)
    return n_files


# ---------------------------------------------------------------------------
# Versioned table: manifest-committed snapshots with time travel
# ---------------------------------------------------------------------------


def write_versioned(
    df: DataFrame, table_dir: str, id_col: str, extra: dict[str, int] | None = None
) -> int:
    """Append a new immutable SNAPSHOT version of ``df`` to a versioned
    table (the minimal Delta/Iceberg-style commit protocol over plain
    parquet, no table-format library):

    1. data lands in a temp dir, then ``os.rename``s to ``v=N/``;
    2. ONLY THEN is the commit manifest row written
       (``_versions/N.parquet``: version, n_rows, order-independent id
       checksum).

    Readers enumerate MANIFESTS, never data directories, so a crash
    between the two steps leaves an invisible orphan rather than a
    half-table, and a version is readable exactly when its commit row
    exists. A colliding UNCOMMITTED orphan at the allocated version (the
    leftover of exactly such a crash) is removed and replaced — that is
    what makes a replaying writer (streaming foreachBatch after a crash)
    self-healing. ``extra`` columns (int-valued, e.g. the source stream's
    batch_id) are stamped into the commit row, turning the manifest into
    an exactly-once ledger. Returns the new version number.
    Single-writer protocol (concurrent writers racing to the same N need
    a lock/CAS — the same scope note as the index installer)."""
    import os
    import shutil

    spark = df.sparkSession
    os.makedirs(os.path.join(table_dir, "_versions"), exist_ok=True)
    existing = table_versions(spark, table_dir)
    n = (max(existing) + 1) if existing else 1
    tmp = os.path.join(table_dir, f".v{n}.tmp.{os.getpid()}")
    df.write.mode("overwrite").parquet(tmp)
    target = os.path.join(table_dir, f"v={n}")
    if os.path.exists(target):  # n is NOT committed (else it wouldn't be allocated)
        shutil.rmtree(target)  # crash orphan: invisible by protocol, safe to drop
    os.rename(tmp, target)
    spark.catalog.refreshByPath(os.path.join(table_dir, f"v={n}"))
    written = spark.read.parquet(os.path.join(table_dir, f"v={n}"))
    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    row = written.agg(
        F.count("*").alias("n"), F.coalesce(F.sum(key), F.lit(0)).alias("sig")
    ).collect()[0]
    extra = extra or {}
    schema = "version long, n_rows long, content_checksum long" + "".join(
        f", {k} long" for k in extra
    )
    spark.createDataFrame(
        [(n, int(row["n"]), int(row["sig"]), *(int(v) for v in extra.values()))],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(table_dir, "_versions", f"{n}.parquet")
    )
    return n


def table_versions(spark: SparkSession, table_dir: str) -> list[int]:
    """Committed versions (manifest rows present), ascending."""
    import os

    vdir = os.path.join(table_dir, "_versions")
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in os.listdir(vdir):
        # a manifest is a Spark parquet DIRECTORY; it counts as committed
        # only once its _SUCCESS marker exists (written last), so a crash
        # mid-manifest-write is as invisible as a crash mid-data-write
        if (
            name.endswith(".parquet")
            and name[:-8].isdigit()
            and os.path.exists(os.path.join(vdir, name, "_SUCCESS"))
        ):
            out.append(int(name[:-8]))
    return sorted(out)


def read_versioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time travel: read snapshot ``version`` (default: latest COMMITTED).
    Raises if the requested version has no commit manifest — an orphan
    data directory from a crashed write is not a readable version."""
    import os

    committed = table_versions(spark, table_dir)
    if not committed:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = committed[-1] if version is None else version
    if v not in committed:
        raise FileNotFoundError(f"version {v} is not committed in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def version_manifest(spark: SparkSession, table_dir: str) -> DataFrame:
    """The commit log as a DataFrame (version, n_rows, content_checksum) —
    what an auditor or an incremental consumer reads to decide what
    changed between snapshots."""
    import os

    vs = table_versions(spark, table_dir)
    if not vs:
        return spark.createDataFrame(
            [], "version long, n_rows long, content_checksum long"
        )
    paths = [os.path.join(table_dir, "_versions", f"{v}.parquet") for v in vs]
    return spark.read.parquet(*paths)


def rollback_versioned(spark: SparkSession, table_dir: str, to_version: int) -> list[int]:
    """Drop every version ABOVE ``to_version`` (manifest first, then the
    now-orphaned data — the reverse of commit order, so a crash mid-
    rollback degrades to invisible orphans, never a manifest pointing at
    deleted data). Returns the removed versions."""
    import os
    import shutil

    removed = [v for v in table_versions(spark, table_dir) if v > to_version]
    for v in removed:
        shutil.rmtree(os.path.join(table_dir, "_versions", f"{v}.parquet"))
        shutil.rmtree(os.path.join(table_dir, f"v={v}"), ignore_errors=True)
    return removed
