"""Incremental MinHash-LSH index pins (operators/dedup_index.py).

The exactness contract: the maintained store (buckets + pairs, mask
applied at serve) is BIT-IDENTICAL to a fresh full build over the live
corpus — per-document-pure signatures (max_gram_freq=None) make that a
zero-tolerance threshold, like the ANN family's hash-anchored quantizer.
Every rebuild rail is exercised: payload update in the span, re-add of a
masked id, partially-deleted duplicate id, dead fraction past the
trigger, and parameter changes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.operators.dedup import (
    minhash_dedup_pairs,
)
from funnel_report_etl_pipeline__spark.operators.dedup_index import (
    build_minhash_index,
    ensure_minhash_index_versioned,
    minhash_pairs_prebuilt,
)
from funnel_report_etl_pipeline__spark.sources.sinks import (
    append_versioned,
    delete_versioned,
    merge_versioned,
    write_versioned,
)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def _batch_pairs(live):
    return _pairs(minhash_dedup_pairs(live, max_gram_freq=None))


def test_lifecycle_labels_and_pair_parity(spark, tmp_path):
    """rebuilt -> incremental -> masked -> current, with the served pair
    set exactly equal to the batch pipeline over the live corpus at
    every step."""
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs.filter("doc_id % 3 != 2"), t, id_col="doc_id")
    assert ensure_minhash_index_versioned(spark, t, ix)["maintenance"] == "rebuilt"
    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(
        docs.filter("doc_id % 3 != 2")
    )
    append_versioned(docs.filter("doc_id % 3 = 2"), t, id_col="doc_id")
    assert (
        ensure_minhash_index_versioned(spark, t, ix)["maintenance"]
        == "incremental"
    )
    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(docs)
    delete_versioned(
        spark, t, docs.filter("doc_id % 10 = 0").select("doc_id"), id_col="doc_id"
    )
    assert ensure_minhash_index_versioned(spark, t, ix)["maintenance"] == "masked"
    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(
        docs.filter("doc_id % 10 != 0")
    )
    assert ensure_minhash_index_versioned(spark, t, ix)["maintenance"] == "current"


def test_churn_span_applies_both_halves(spark, tmp_path):
    """A span mixing disjoint inserts and deletes (the daily
    ingest-plus-takedown) maintains in ONE pass labeled 'churn' and
    still matches the batch pipeline exactly."""
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs.filter("doc_id % 4 < 2"), t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    append_versioned(docs.filter("doc_id % 4 = 2"), t, id_col="doc_id")
    delete_versioned(
        spark, t,
        docs.filter("doc_id % 4 = 1 and doc_id % 3 = 0").select("doc_id"),
        id_col="doc_id",
    )
    m = ensure_minhash_index_versioned(spark, t, ix)
    assert m["maintenance"] == "churn"
    live = docs.filter("doc_id % 4 < 3 and not (doc_id % 4 = 1 and doc_id % 3 = 0)")
    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(live)


def test_maintained_buckets_bit_identical_to_fresh_build(spark, tmp_path):
    """The maintained bucket store equals a fresh full build's on the
    same corpus — the zero-tolerance exactness threshold per-doc-pure
    signatures buy (module docstring)."""
    docs = _docs(spark)
    t, ix, fresh = str(tmp_path / "tbl"), str(tmp_path / "idx"), str(tmp_path / "fresh")
    write_versioned(docs.filter("doc_id % 2 = 0"), t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    append_versioned(docs.filter("doc_id % 2 = 1"), t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    build_minhash_index(docs, fresh)
    got = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(ix, "buckets.parquet")).collect()
    }
    want = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(fresh, "buckets.parquet")).collect()
    }
    assert got == want


def test_update_in_span_rebuilds(spark, tmp_path):
    """A payload rewrite (merge) makes signatures stale — the span must
    rebuild, and the rebuilt index matches batch over the new corpus."""
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs, t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    merge_versioned(
        spark, t,
        docs.filter("doc_id % 5 = 0").withColumn(
            "text", F.concat(F.col("text"), F.lit(" extra tail tokens"))
        ),
        id_col="doc_id",
    )
    m = ensure_minhash_index_versioned(spark, t, ix)
    assert m["maintenance"] == "rebuilt"
    from funnel_report_etl_pipeline__spark.sources.sinks import read_versioned

    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(
        read_versioned(spark, t)
    )


def test_readded_masked_id_rebuilds(spark, tmp_path):
    """Re-adding a masked id cannot be patched in place (its stale
    bucket/pair rows are immutable parquet) — rebuild, and the mask
    disappears with the fresh directory."""
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs, t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    delete_versioned(
        spark, t, docs.filter("doc_id % 7 = 0").select("doc_id"), id_col="doc_id"
    )
    assert ensure_minhash_index_versioned(spark, t, ix)["maintenance"] == "masked"
    append_versioned(
        docs.filter("doc_id % 14 = 0").withColumn("text", F.lit("back again")),
        t, id_col="doc_id",
    )
    m = ensure_minhash_index_versioned(spark, t, ix)
    assert m["maintenance"] == "rebuilt"
    assert not os.path.exists(os.path.join(ix, "deleted.parquet"))
    from funnel_report_etl_pipeline__spark.sources.sinks import read_versioned

    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(
        read_versioned(spark, t)
    )


def test_partially_deleted_duplicate_id_rebuilds(spark, tmp_path):
    """A table holding duplicate-id rows where a span nets away only
    SOME of one id's rows keeps the id live — masking it would hide a
    live document, so the fully-gone guard must force a rebuild.
    (delete_versioned removes ALL rows of an id and a collapsing merge
    surfaces as 'update'; the reachable partial-net-delete is a
    snapshot RECOMMIT dropping one duplicate copy, served through its
    commit-time CDC as a net 'delete' for a still-live id.)"""
    docs = _docs(spark).filter("doc_id % 2 = 0")
    dup = docs.filter("doc_id % 6 = 0")  # committed twice at v1
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs.unionByName(dup), t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    write_versioned(docs, t, id_col="doc_id")  # recommit: one copy each
    m = ensure_minhash_index_versioned(spark, t, ix)
    assert m["maintenance"] == "rebuilt"
    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(docs)


def test_merge_update_span_rebuilds_even_with_unchanged_payload(spark, tmp_path):
    """A merge in the span surfaces as PHYSICAL 'update' rows (Delta
    semantics) even when the payload bytes are identical — the
    maintenance rebuilds rather than risking stale signatures."""
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs, t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    merge_versioned(spark, t, docs.filter("doc_id % 9 = 0"), id_col="doc_id")
    m = ensure_minhash_index_versioned(spark, t, ix)
    assert m["maintenance"] == "rebuilt"


def test_dead_fraction_triggers_rebuild(spark, tmp_path):
    """Mask growth past max_dead_fraction rebuilds (the compaction-
    policy trigger shape) and the fresh index drops the mask."""
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs, t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    delete_versioned(
        spark, t, docs.filter("doc_id % 3 != 0").select("doc_id"), id_col="doc_id"
    )
    m = ensure_minhash_index_versioned(spark, t, ix, max_dead_fraction=0.5)
    assert m["maintenance"] == "rebuilt"
    assert not os.path.exists(os.path.join(ix, "deleted.parquet"))
    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(
        docs.filter("doc_id % 3 = 0")
    )


def test_param_change_rebuilds(spark, tmp_path):
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs, t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    m = ensure_minhash_index_versioned(spark, t, ix, bands=4, rows_per_band=8)
    assert m["maintenance"] == "rebuilt"
    assert int(m["bands"]) == 4


def test_crash_idempotent_append(spark, tmp_path):
    """A replayed incremental maintenance (same span re-applied after a
    crash between the bucket append and the meta write) must not
    duplicate bucket or pair rows."""
    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs.filter("doc_id % 3 = 0"), t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    append_versioned(docs.filter("doc_id % 3 != 0"), t, id_col="doc_id")
    meta_before = spark.read.parquet(os.path.join(ix, "meta.parquet")).collect()
    ensure_minhash_index_versioned(spark, t, ix)
    # simulate the crash: restore the PRE-maintenance meta so the same
    # span replays
    spark.createDataFrame(meta_before).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(ix, "meta.parquet"))
    spark.catalog.refreshByPath(os.path.join(ix, "meta.parquet"))
    m = ensure_minhash_index_versioned(spark, t, ix)
    assert m["maintenance"] == "incremental"
    bkts = spark.read.parquet(os.path.join(ix, "buckets.parquet"))
    assert bkts.count() == bkts.distinct().count()
    prs = spark.read.parquet(os.path.join(ix, "pairs.parquet"))
    assert prs.count() == prs.select("id_a", "id_b").distinct().count()
    assert _pairs(minhash_pairs_prebuilt(spark, ix)) == _batch_pairs(docs)


def test_invalid_banding_raises(spark, tmp_path):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="exceeds"):
        build_minhash_index(docs, str(tmp_path / "x"), bands=16, rows_per_band=4)


def test_compaction_span_restamps_without_rebuild(spark, tmp_path):
    """A compaction (empty CDC) between maintenances changes nothing —
    restamp the ledger, 'current', artifact files untouched."""
    from funnel_report_etl_pipeline__spark.sources.sinks import (
        compact_versioned,
    )

    docs = _docs(spark)
    t, ix = str(tmp_path / "tbl"), str(tmp_path / "idx")
    write_versioned(docs.filter("doc_id % 2 = 0"), t, id_col="doc_id")
    append_versioned(docs.filter("doc_id % 2 = 1"), t, id_col="doc_id")
    ensure_minhash_index_versioned(spark, t, ix)
    compact_versioned(spark, t, "doc_id")
    m = ensure_minhash_index_versioned(spark, t, ix)
    assert m["maintenance"] == "current"
    assert int(m["indexed_version"]) == 3
