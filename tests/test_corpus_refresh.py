"""The composed incremental corpus-refresh pipeline
(plans/pipeline_r10.py::corpus_refresh_pipeline_q): pipeline-LEVEL
idempotence — every stage is verified standalone, but the daily job is
their composition, and its contract is that re-running an unchanged day
writes NOTHING and returns the identical manifest (round-9 verdict ask
#5's done-criteria)."""

from __future__ import annotations

import os

from .conftest import SF_SMALL


def _mtimes(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


def test_second_run_writes_nothing_and_manifests_match(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_REFRESH_DIR", str(tmp_path))
    from funnel_report_etl_pipeline__spark.plans.pipeline_r10 import (
        corpus_refresh_pipeline_q,
    )

    m1 = {tuple(r) for r in corpus_refresh_pipeline_q(spark, SF_SMALL).collect()}
    root = os.path.join(str(tmp_path), os.path.basename(SF_SMALL))
    before = _mtimes(root)
    assert before, "first run wrote no shard files"
    m2 = {tuple(r) for r in corpus_refresh_pipeline_q(spark, SF_SMALL).collect()}
    assert _mtimes(root) == before, "second run rewrote an unchanged day"
    assert m1 == m2 and m1, "manifests differ across idempotent runs"


def test_manifest_attests_exactly_the_sampled_survivors(spark, tmp_path, monkeypatch):
    """The shard files on disk contain exactly the pipeline's survivors:
    total manifest rows == the dedup→curation→sample lineage's count,
    and every doc in the files passes the incremental-dedup gate (its
    text hash is NOT in the snapshot)."""
    monkeypatch.setenv("SPARK_GRAFT_REFRESH_DIR", str(tmp_path))
    from pyspark.sql import functions as F

    from funnel_report_etl_pipeline__spark.plans.pipeline_r10 import (
        _REFRESH_N_PER_SOURCE,
        corpus_refresh_pipeline_q,
    )

    manifest = corpus_refresh_pipeline_q(spark, SF_SMALL).collect()
    total = sum(r["n_rows"] for r in manifest)
    out = os.path.join(str(tmp_path), os.path.basename(SF_SMALL), "shards")
    written = spark.read.parquet(out)
    assert written.count() == total
    # per-source cap holds on the bytes that landed
    per_source = written.groupBy("source").count().collect()
    assert all(r["count"] <= _REFRESH_N_PER_SOURCE for r in per_source)
    # no written doc's text is in the snapshot (incremental gate held)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    snap = docs.filter(F.col("doc_id") % 3 == 0).select(F.md5("text").alias("h")).distinct()
    leaked = (
        written.select(F.md5("text").alias("h")).join(snap, "h", "left_semi").count()
    )
    assert leaked == 0


def test_changed_day_triggers_rewrite(spark, tmp_path, monkeypatch):
    """A different input (new crawl content) mismatches the saved
    signature and rewrites the shards — idempotence must not become
    staleness."""
    monkeypatch.setenv("SPARK_GRAFT_REFRESH_DIR", str(tmp_path))
    from pyspark.sql import functions as F

    from funnel_report_etl_pipeline__spark.sources.sinks import (
        ensure_training_shards,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "shards")
    m1 = {tuple(r) for r in ensure_training_shards(docs.filter(F.col("doc_id") < 100), out, n_shards=4).collect()}
    m2 = {tuple(r) for r in ensure_training_shards(docs.filter(F.col("doc_id") < 200), out, n_shards=4).collect()}
    assert m1 != m2
    assert sum(r[1] for r in m2) > sum(r[1] for r in m1)


def test_zero_survivor_day_yields_empty_manifest_not_crash(spark, tmp_path):
    """A day where every new doc dedups away is a legitimate outcome: the
    export must return an EMPTY manifest (and stay idempotent), not die
    on schema inference over a directory holding only _SUCCESS — the
    10x probe found exactly this crash when replicated texts all hit
    the snapshot's hash set."""
    from funnel_report_etl_pipeline__spark.sources.sinks import (
        ensure_training_shards,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    empty = docs.filter("doc_id < 0")
    out = str(tmp_path / "shards")
    m1 = ensure_training_shards(empty, out, n_shards=4)
    assert m1.collect() == []
    assert [f.name for f in m1.schema.fields] == ["shard", "n_rows", "content_checksum"]
    # second run: signature (0, 0) matches the saved meta -> pure read,
    # still empty, still no crash
    m2 = ensure_training_shards(empty, out, n_shards=4)
    assert m2.collect() == []


def test_token_skip_never_executes_the_lineage(spark, tmp_path):
    """With change_token given, the repeated run's skip decision reads
    metadata only: a poisoned lineage (assert_true that would fail any
    job that runs it) must NOT be triggered on the skip path — while a
    NEW token re-executes and rewrites."""
    from pyspark.sql import functions as F

    from funnel_report_etl_pipeline__spark.sources.sinks import (
        ensure_training_shards,
    )

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source", "text")
        .filter("doc_id < 50")
    )
    out = str(tmp_path / "shards")
    m1 = {tuple(r) for r in ensure_training_shards(docs, out, n_shards=4, change_token="day1").collect()}
    poisoned = docs.select(
        F.when(
            F.assert_true(F.lit(False), F.lit("lineage executed on skip path")).isNull(),
            F.col("doc_id"),
        ).alias("doc_id"),
        "source",
        "text",
    )
    # same token -> pure metadata skip; the poisoned plan never runs
    m2 = {tuple(r) for r in ensure_training_shards(poisoned, out, n_shards=4, change_token="day1").collect()}
    assert m2 == m1
    # new token -> the lineage DOES run (and here, loudly fails)
    import pytest as _pytest

    with _pytest.raises(Exception, match="lineage executed"):
        ensure_training_shards(poisoned, out, n_shards=4, change_token="day2").collect()


def test_listing_token_tracks_file_changes(tmp_path):
    from funnel_report_etl_pipeline__spark.sources.sinks import listing_token

    t_missing = listing_token(str(tmp_path / "nope"))
    d = tmp_path / "data"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"xx")
    t1 = listing_token(str(d))
    assert t1 != t_missing
    # hidden/underscore files (checksums, _SUCCESS) don't churn the token
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".a.parquet.crc").write_bytes(b"y")
    assert listing_token(str(d)) == t1
    # a data change does
    (d / "a.parquet").write_bytes(b"xxyy")
    assert listing_token(str(d)) != t1
