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
    # the next commit is version 2 and REPLACES the orphan atomically?
    # No — the writer allocates max(committed)+1 = 2; its rename would
    # collide with the orphan. Assert the failure is loud, not silent
    # corruption (single-writer protocol: operators clean orphans first).
    with pytest.raises(OSError):
        write_versioned(docs.filter("doc_id < 7"), t, "doc_id")


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
