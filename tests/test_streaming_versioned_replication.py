"""Exactly-once versioned-table replication (round 12): readStream over
the SOURCE commit log, each commit replayed onto a replica keyed by the
source-version ledger — crash replays skipped, restart resumes, replica
history mirrors the source version for version."""

from __future__ import annotations

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.sources.sinks import (
    append_versioned,
    delete_versioned,
    merge_versioned,
    read_versioned,
    table_versions,
    version_manifest,
    write_versioned,
)
from funnel_report_etl_pipeline__spark.streaming.funnel_stream import (
    apply_replicated_commit,
    replicate_versioned_table,
)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")


def _build_source(spark, t):
    docs = _docs(spark)
    write_versioned(docs.filter("doc_id < 20"), t, id_col="doc_id")
    append_versioned(docs.filter("doc_id >= 20 AND doc_id < 30"), t, id_col="doc_id")
    delete_versioned(
        spark, t,
        spark.createDataFrame([(i,) for i in range(0, 30, 4)], "doc_id long"),
        id_col="doc_id",
    )
    merge_versioned(
        spark, t,
        docs.filter("doc_id IN (2, 6, 40, 41)").withColumn("text", F.lit("MERGED")),
        id_col="doc_id",
    )
    return docs


def _contents(spark, t, v):
    return sorted(
        (r["doc_id"], r["text"])
        for r in read_versioned(spark, t, v).collect()
    )


def test_replication_reconstructs_exact_copy_and_skips_replays(spark, tmp_path):
    src, rep, ckpt = str(tmp_path / "src"), str(tmp_path / "rep"), str(tmp_path / "ck")
    _build_source(spark, src)

    q = replicate_versioned_table(spark, src, rep, ckpt, "doc_id", "repl_t1")
    q.awaitTermination()

    assert table_versions(spark, rep) == [1, 2, 3, 4]
    # version-for-version content parity, full payload grain (the merge's
    # rewritten payloads and the tombstone's deletions both replicated)
    for v in (1, 2, 3, 4):
        assert _contents(spark, rep, v) == _contents(spark, src, v), f"v{v}"
    # bookkeeping parity: the replica's manifest stats equal the source's
    # and its ledger carries the source version (exactly-once key)
    sm = {r["version"]: r for r in version_manifest(spark, src).collect()}
    rm = {r["version"]: r for r in version_manifest(spark, rep).collect()}
    for v in (1, 2, 3, 4):
        assert rm[v]["n_rows"] == sm[v]["n_rows"]
        assert rm[v]["content_checksum"] == sm[v]["content_checksum"]
        assert rm[v]["batch_id"] == v
    # the replayed kinds are the O(changes) operations, not snapshots
    assert [rm[v]["kind"] for v in (1, 2, 3, 4)] == [
        "snapshot", "delta", "tombstone", "merge",
    ]

    # forced crash-replay of the LAST commit (what the stream does after
    # a crash between apply and checkpoint): ledger recognizes it
    last = max(version_manifest(spark, src).collect(), key=lambda r: r["version"])
    assert apply_replicated_commit(spark, src, rep, last, "doc_id") is False
    assert table_versions(spark, rep) == [1, 2, 3, 4]  # no duplicate
    assert _contents(spark, rep, 4) == _contents(spark, src, 4)


def test_replication_resumes_from_checkpoint(spark, tmp_path):
    src, rep, ckpt = str(tmp_path / "src"), str(tmp_path / "rep"), str(tmp_path / "ck")
    docs = _build_source(spark, src)

    q = replicate_versioned_table(spark, src, rep, ckpt, "doc_id", "repl_t2a")
    q.awaitTermination()
    assert table_versions(spark, rep) == [1, 2, 3, 4]

    # source moves on while the replicator is down
    append_versioned(
        docs.filter("doc_id >= 50 AND doc_id < 55"), src, id_col="doc_id"
    )
    q = replicate_versioned_table(spark, src, rep, ckpt, "doc_id", "repl_t2b")
    q.awaitTermination()
    assert table_versions(spark, rep) == [1, 2, 3, 4, 5]
    assert _contents(spark, rep, 5) == _contents(spark, src, 5)
    rm = {r["version"]: r for r in version_manifest(spark, rep).collect()}
    assert rm[5]["kind"] == "delta" and rm[5]["batch_id"] == 5
