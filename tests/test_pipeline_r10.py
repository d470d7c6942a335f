"""Round-10 batch: planted-fixture behavior tests (oracle parity is
covered by driver_sim / CORRECTNESS; these pin the semantics on inputs
where the right answer is computable by hand). The persistent-index
round-trip and the refresh pipeline's idempotence live in
tests/test_ann_index.py / tests/test_corpus_refresh.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.plans.registry import load_all

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def specs():
    return load_all()


def _write_sf(spark, tmp_path_factory, name: str, frames: dict):
    d = tmp_path_factory.mktemp(name)
    for t, df in frames.items():
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_oov_rate_planted_vocab_boundary(spark, specs, tmp_path_factory):
    """Vocab = top-16 by (count desc, token asc). Plant 17 tokens where
    exactly one ('zz', the rarest) falls outside, and sources that use
    it at known rates."""
    common = [f"tok{i:02d}" for i in range(16)]  # each appears >= 3x
    rows = []
    did = 0
    for rep in range(3):
        did += 1
        rows.append((did, " ".join(common), "en", "clean", 1))
    # dirty source: 4 common + one rare 'zz' per doc; zz's corpus count
    # (2) stays below every common token's (>= 3), so it is the ONLY
    # out-of-vocab token -> oov = 1/5 per doc
    for rep in range(2):
        did += 1
        rows.append((did, " ".join(common[:4] + ["zz"]), "en", "dirty", 1))
    sf = _write_sf(spark, tmp_path_factory, "oov", {"documents": _docs(spark, rows)})
    out = {r["source"]: r for r in specs["oov_rate_by_source"].fn(spark, sf).collect()}
    assert out["clean"]["n_oov"] == 0 and out["clean"]["oov_ppm"] == 0
    assert out["dirty"]["n_tokens"] == 10 and out["dirty"]["n_oov"] == 2
    assert out["dirty"]["oov_ppm"] == 200_000


def test_oov_vocab_tie_break_is_token_asc(spark, specs, tmp_path_factory):
    """All tokens tie on count → the vocab keeps the 16 alphabetically
    smallest, so the excluded ones are deterministic."""
    toks = [f"t{i:02d}" for i in range(18)]  # t00..t17, one each per doc
    rows = [(1, " ".join(toks), "en", "s", 1)]
    sf = _write_sf(spark, tmp_path_factory, "oovtie", {"documents": _docs(spark, rows)})
    out = specs["oov_rate_by_source"].fn(spark, sf).collect()[0]
    # t16, t17 are out-of-vocab
    assert out["n_tokens"] == 18 and out["n_oov"] == 2


def test_ann_recall_audit_full_probe_is_perfect(spark):
    """Probing ALL cells makes IVF exhaustive — recall must be k/k for
    every query. This pins the audit's arithmetic (a recall metric that
    can't reach 1.0 under exhaustive search would be measuring itself,
    not the index)."""
    from funnel_report_etl_pipeline__spark.operators.similarity import (
        cosine_topk_brute,
        cosine_topk_ivf_medoid,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r["qid"], r["cid"])
        for r in cosine_topk_brute(emb, q, k=5).select("qid", "cid").collect()
    }
    allprobe = {
        (r["qid"], r["cid"])
        for r in cosine_topk_ivf_medoid(emb, q, k=5, n_cells=16, n_probe=16)
        .select("qid", "cid")
        .collect()
    }
    assert allprobe == brute


def test_ann_recall_audit_registered_query_bounds(spark, specs):
    """On real testdata the 2-probe audit reports n_hits in [0, k] with
    k == 5 for every query, and at least SOME recall overall (a
    zero-everywhere audit would be a zero-signal oracle)."""
    out = specs["ann_recall_audit"].fn(spark, SF_SMALL).collect()
    assert len(out) == 5 or len(out) == 10  # |{vec_id < 10}| at this SF
    assert all(r["k"] == 5 and 0 <= r["n_hits"] <= 5 for r in out)
    assert sum(r["n_hits"] for r in out) > 0


def test_bloom_incremental_dedup_equals_exact_and_prunes(spark, specs):
    """The two-path split (definitely-new bypass + candidate anti-join)
    returns exactly the plain anti-join's survivors, and the bloom
    actually prunes: the candidate set is a small fraction of the crawl
    (at 128 KiB / m=2^20 over ~170 snapshot hashes the FP rate is ~0,
    so candidates ≈ true dupes)."""
    from pyspark.sql import functions as F

    from funnel_report_etl_pipeline__spark.plans.pipeline_r8 import (
        bloom_mask,
        bloom_member_cond,
    )

    exact = {r["doc_id"] for r in specs["incremental_dedup"].fn(spark, SF_SMALL).collect()}
    bloom = {r["doc_id"] for r in specs["incremental_dedup_bloom"].fn(spark, SF_SMALL).collect()}
    assert bloom == exact and bloom
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    seen = docs.filter(F.col("doc_id") % 3 == 0).select(F.md5("text").alias("__h")).distinct()
    new = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", F.md5("text").alias("__h"))
    n_new = new.count()
    candidates = (
        new.crossJoin(F.broadcast(bloom_mask(seen, "__h")))
        .filter(bloom_member_cond("__h"))
        .count()
    )
    true_dupes = n_new - len(exact)
    assert true_dupes <= candidates < n_new / 2, (true_dupes, candidates, n_new)
