"""Versioned table (sources/sinks.py): the manifest-committed snapshot
protocol's semantics — time travel, rollback, crash-orphan invisibility,
immutability of old versions — pinned on real testdata."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.sources.sinks import (
    read_versioned,
    rollback_versioned,
    table_versions,
    version_manifest,
    write_versioned,
)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")


def test_time_travel_reads_each_committed_snapshot(spark, tmp_path):
    docs = _docs(spark)
    t = str(tmp_path / "tbl")
    assert write_versioned(docs.filter("doc_id < 10"), t, "doc_id") == 1
    assert write_versioned(docs.filter("doc_id < 20"), t, "doc_id") == 2
    assert write_versioned(docs.filter("doc_id < 15"), t, "doc_id") == 3
    assert table_versions(spark, t) == [1, 2, 3]
    assert read_versioned(spark, t, 1).count() == 10
    assert read_versioned(spark, t, 2).count() == 20
    # latest = highest committed, even though it SHRANK (snapshots, not appends)
    assert read_versioned(spark, t).count() == 15
    m = {r["version"]: r for r in version_manifest(spark, t).collect()}
    assert [m[v]["n_rows"] for v in (1, 2, 3)] == [10, 20, 15]


def test_old_versions_are_immutable_under_new_writes(spark, tmp_path):
    docs = _docs(spark)
    t = str(tmp_path / "tbl")
    write_versioned(docs.filter("doc_id < 10"), t, "doc_id")
    before = {tuple(r) for r in read_versioned(spark, t, 1).collect()}
    write_versioned(docs.filter("doc_id >= 100"), t, "doc_id")
    assert {tuple(r) for r in read_versioned(spark, t, 1).collect()} == before


def test_rollback_drops_manifest_and_data_above_target(spark, tmp_path):
    docs = _docs(spark)
    t = str(tmp_path / "tbl")
    for hi in (10, 20, 30):
        write_versioned(docs.filter(f"doc_id < {hi}"), t, "doc_id")
    assert rollback_versioned(spark, t, 1) == [2, 3]
    assert table_versions(spark, t) == [1]
    assert read_versioned(spark, t).count() == 10
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, t, 2)
    assert not os.path.exists(os.path.join(t, "v=2"))
    # the log moves forward again from the rollback point
    assert write_versioned(docs.filter("doc_id < 5"), t, "doc_id") == 2


def test_uncommitted_orphan_is_invisible(spark, tmp_path):
    """Simulate a crash between data rename and manifest write: the data
    directory exists but no commit row — readers must not see it."""
    docs = _docs(spark)
    t = str(tmp_path / "tbl")
    write_versioned(docs.filter("doc_id < 10"), t, "doc_id")
    # orphan: data for v=2 present, manifest absent
    docs.filter("doc_id < 3").write.mode("overwrite").parquet(os.path.join(t, "v=2"))
    assert table_versions(spark, t) == [1]
    assert read_versioned(spark, t).count() == 10  # latest is still v1
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, t, 2)
    # the next writer allocates max(committed)+1 = 2, detects the
    # UNCOMMITTED orphan at that slot (invisible by protocol, safe to
    # drop) and replaces it — the self-heal that lets a crashed
    # streaming writer replay its batch cleanly
    assert write_versioned(docs.filter("doc_id < 7"), t, "doc_id") == 2
    assert read_versioned(spark, t, 2).count() == 7


def test_manifest_checksum_is_content_addressed(spark, tmp_path):
    """Same rows → same checksum regardless of partitioning/order; a
    different row set → different checksum."""
    docs = _docs(spark)
    t1, t2, t3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    write_versioned(docs.filter("doc_id < 50"), t1, "doc_id")
    write_versioned(
        docs.filter("doc_id < 50").repartition(7).orderBy(F.desc("doc_id")), t2, "doc_id"
    )
    write_versioned(docs.filter("doc_id < 49"), t3, "doc_id")
    c1 = version_manifest(spark, t1).collect()[0]["content_checksum"]
    c2 = version_manifest(spark, t2).collect()[0]["content_checksum"]
    c3 = version_manifest(spark, t3).collect()[0]["content_checksum"]
    assert c1 == c2 != c3


def test_stream_versioned_ingest_commits_one_snapshot_per_batch(spark, tmp_path):
    """Streaming ingestion into a versioned table: three file-batches →
    three committed snapshot versions whose manifest carries the source
    batch id; the final snapshot equals the full drained input; every
    intermediate snapshot remains time-travel-readable."""
    from funnel_report_etl_pipeline__spark.streaming.funnel_stream import (
        write_stream_versioned,
    )

    src = str(tmp_path / "src")
    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    from datetime import datetime, timedelta

    t0 = datetime(2026, 1, 1, 10, 0, 0)
    batches = [
        [(1, 1, "view", t0, 1.0), (2, 1, "view", t0 + timedelta(minutes=1), 1.0)],
        [(3, 2, "view", t0 + timedelta(hours=1), 1.0)],
        [(4, 3, "view", t0 + timedelta(hours=2), 1.0), (5, 3, "view", t0 + timedelta(hours=3), 1.0)],
    ]
    for b in batches:  # sequential appends → one file per micro-batch
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    table = str(tmp_path / "tbl")
    # one file per micro-batch, so each append becomes one snapshot commit
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = write_stream_versioned(
        stream, table, str(tmp_path / "ckpt"), id_col="event_id"
    )
    q.awaitTermination()
    m = version_manifest(spark, table).orderBy("version").collect()
    assert [r["version"] for r in m] == [1, 2, 3]
    assert [r["n_rows"] for r in m] == [2, 3, 5]  # monotone snapshot ledger
    assert sorted(r["batch_id"] for r in m) == [0, 1, 2]
    assert read_versioned(spark, table, 2).count() == 3  # time travel mid-ingest
    got = {r["event_id"] for r in read_versioned(spark, table).collect()}
    assert got == {1, 2, 3, 4, 5}


def test_stream_versioned_ingest_is_exactly_once_across_restart(spark, tmp_path):
    """Drain, then restart the SAME checkpoint over the same source plus
    one new file: only the new batch commits a new version — replayed
    ids appear in no additional snapshot (the manifest ledger is the
    idempotence key)."""
    from datetime import datetime

    from funnel_report_etl_pipeline__spark.streaming import read_event_stream
    from funnel_report_etl_pipeline__spark.streaming.funnel_stream import (
        write_stream_versioned,
    )

    src = str(tmp_path / "src")
    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    t0 = datetime(2026, 1, 1, 10, 0, 0)
    spark.createDataFrame([(1, 1, "view", t0, 1.0)], schema).coalesce(1).write.mode("append").parquet(src)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    write_stream_versioned(
        read_event_stream(spark, src), table, ckpt, id_col="event_id"
    ).awaitTermination()
    assert [r["n_rows"] for r in version_manifest(spark, table).collect()] == [1]
    # second drain with nothing new: NO new version
    write_stream_versioned(
        read_event_stream(spark, src), table, ckpt, id_col="event_id"
    ).awaitTermination()
    assert len(table_versions(spark, table)) == 1
    # one new file arrives → exactly one more version
    spark.createDataFrame([(2, 2, "view", t0, 1.0)], schema).coalesce(1).write.mode("append").parquet(src)
    write_stream_versioned(
        read_event_stream(spark, src), table, ckpt, id_col="event_id"
    ).awaitTermination()
    m = version_manifest(spark, table).orderBy("version").collect()
    assert [r["n_rows"] for r in m] == [1, 2]
    assert read_versioned(spark, table).count() == 2
