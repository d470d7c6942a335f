"""Persistent ANN index lifecycle (operators/ann_index.py): build →
save → load → serve must be lossless (results bit-identical to the
fresh-build operators), and the ensure_* entry points must be
idempotent — the second run of a daily job reads the artifact instead
of rewriting it (round-9 verdict ask #3's done-criteria)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.operators.ann_index import (
    build_ivf_medoid_index,
    build_pq_index,
    corpus_signature,
    cosine_topk_ivf_prebuilt,
    ensure_ivf_medoid_index,
    ensure_pq_index,
    pq_topk_prebuilt,
)
from funnel_report_etl_pipeline__spark.operators.similarity import (
    cosine_topk_ivf_medoid,
    pq_topk,
)

from .conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _mtimes(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


def test_ivf_loaded_index_serves_identical_results(spark, tmp_path):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf")
    meta = build_ivf_medoid_index(emb, idx, n_cells=16)
    assert meta["family"] == "ivf_medoid" and int(meta["n_vectors"]) == emb.count()
    fresh = {tuple(r) for r in cosine_topk_ivf_medoid(emb, queries, k=5, n_cells=16, n_probe=2).collect()}
    served = {tuple(r) for r in cosine_topk_ivf_prebuilt(emb, queries, idx, k=5, n_probe=2).collect()}
    assert served == fresh and served  # bit-identical, non-empty


def test_pq_loaded_index_serves_identical_results(spark, tmp_path):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = str(tmp_path / "pq")
    build_pq_index(emb, idx, n_segments=8, seg_dim=8, n_codes=16)
    fresh = {tuple(r) for r in pq_topk(emb, queries, k=5).collect()}
    served = {tuple(r) for r in pq_topk_prebuilt(queries, idx, k=5).collect()}
    assert served == fresh and served


def test_ensure_skips_rebuild_when_signature_matches(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    ensure_ivf_medoid_index(emb, idx, n_cells=16)
    before = _mtimes(idx)
    assert before, "index files missing after build"
    meta2 = ensure_ivf_medoid_index(emb, idx, n_cells=16)
    assert _mtimes(idx) == before, "second ensure rewrote an unchanged index"
    assert int(meta2["n_vectors"]) == emb.count()


def test_ensure_rebuilds_on_corpus_change(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    ensure_ivf_medoid_index(emb, idx, n_cells=16)
    grown = emb.filter(F.col("vec_id") % 7 != 0)  # a changed corpus
    meta = ensure_ivf_medoid_index(grown, idx, n_cells=16)
    assert int(meta["n_vectors"]) == grown.count() != emb.count()
    # the rebuilt index serves the NEW corpus's answers
    q = grown.filter(F.col("vec_id") < 10)
    fresh = {tuple(r) for r in cosine_topk_ivf_medoid(grown, q, k=5, n_cells=16, n_probe=2).collect()}
    served = {tuple(r) for r in cosine_topk_ivf_prebuilt(grown, q, idx, k=5, n_probe=2).collect()}
    assert served == fresh


def test_pq_ensure_idempotent_and_param_sensitive(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "pq")
    ensure_pq_index(emb, idx, n_segments=8, seg_dim=8, n_codes=16)
    before = _mtimes(idx)
    ensure_pq_index(emb, idx, n_segments=8, seg_dim=8, n_codes=16)
    assert _mtimes(idx) == before
    # different params -> rebuild (meta reflects the new codebook size)
    meta = ensure_pq_index(emb, idx, n_segments=8, seg_dim=8, n_codes=8)
    assert int(meta["n_codes"]) == 8


def test_corpus_signature_is_order_independent(spark):
    emb = _emb(spark)
    a = corpus_signature(emb, "vec_id")
    b = corpus_signature(emb.orderBy(F.col("vec_id").desc()), "vec_id")
    c = corpus_signature(emb.repartition(7), "vec_id")
    assert a == b == c


def test_ivfpq_all_cells_probe_equals_full_adc(spark, tmp_path):
    """Probing every IVF cell makes the composed IVF-PQ serve score the
    SAME candidate set as the full-ADC scan — results must be
    bit-identical to pq_topk_prebuilt (which is itself pinned identical
    to the fresh pq_topk above)."""
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        build_ivf_medoid_index,
        build_pq_index,
        ivfpq_topk_prebuilt,
        pq_topk_prebuilt,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ivf = str(tmp_path / "ivf")
    pq = str(tmp_path / "pq")
    build_ivf_medoid_index(emb, ivf, n_cells=16)
    build_pq_index(emb, pq, n_segments=8, seg_dim=8, n_codes=16)
    # pq_topk keeps self-pairs (a corpus query matches itself at its own
    # quantization error); the composed serve excludes them — so the
    # expected set is the full scan with self-pairs dropped and ranks
    # recomputed
    full6 = pq_topk_prebuilt(queries, pq, k=6).collect()
    expected = set()
    per_q: dict[int, list] = {}
    for r in sorted(full6, key=lambda r: (r["qid"], r["rnk"])):
        if r["qid"] != r["cid"]:
            per_q.setdefault(r["qid"], []).append(r)
    for qid, rows in per_q.items():
        for i, r in enumerate(rows[:5], start=1):
            expected.add((qid, r["cid"], r["adc_dist"], i))
    composed = {
        tuple(r)
        for r in ivfpq_topk_prebuilt(queries, ivf, pq, k=5, n_probe=16).collect()
    }
    assert composed == expected and composed


def test_ivfpq_two_probe_results_are_subset_scored_identically(spark, tmp_path):
    """At n_probe=2 the composed serve ranks a SUBSET of the full-ADC
    candidates: every returned (qid, cid, adc_dist) must carry exactly
    the full scan's distance for that pair (the cell restriction prunes
    candidates, never changes scores)."""
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        build_ivf_medoid_index,
        build_pq_index,
        ivfpq_topk_prebuilt,
        pq_topk_prebuilt,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ivf = str(tmp_path / "ivf")
    pq = str(tmp_path / "pq")
    build_ivf_medoid_index(emb, ivf, n_cells=16)
    build_pq_index(emb, pq, n_segments=8, seg_dim=8, n_codes=16)
    full = {
        (r["qid"], r["cid"]): r["adc_dist"]
        for r in pq_topk_prebuilt(queries, pq, k=10_000).collect()
    }
    out = ivfpq_topk_prebuilt(queries, ivf, pq, k=5, n_probe=2).collect()
    assert out
    for r in out:
        assert full[(r["qid"], r["cid"])] == r["adc_dist"]


def test_concurrent_identical_build_is_discarded_not_installed(spark, tmp_path):
    """The round-10 gate race: two shards ensure_* the same fresh index
    concurrently. Builds now land in a temp dir and install by atomic
    rename — a loser whose winner is CURRENT discards its build, leaving
    the served directory untouched (no half-written in-place write)."""
    import os

    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        _install_index,
        build_ivf_medoid_index,
        ensure_ivf_medoid_index,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    ensure_ivf_medoid_index(emb, idx, n_cells=16)
    before = _mtimes(idx)
    # a "concurrent" builder finished its own tmp build just after us
    tmp = idx + ".build.fake"
    build_ivf_medoid_index(emb, tmp, n_cells=16)
    meta = _install_index(spark, tmp, idx, is_current=lambda m: True)
    assert int(meta["n_cells"]) == 16
    assert not os.path.exists(tmp), "loser's tmp build not cleaned up"
    assert _mtimes(idx) == before, "winner's installed index was touched"


def test_stale_index_swapped_atomically(spark, tmp_path):
    import os

    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        _install_index,
        build_ivf_medoid_index,
    )
    from pyspark.sql import functions as F

    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_medoid_index(emb.filter(F.col("vec_id") < 50), idx, n_cells=8)  # stale
    tmp = idx + ".build.new"
    build_ivf_medoid_index(emb, tmp, n_cells=16)
    meta = _install_index(spark, tmp, idx, is_current=lambda m: False)
    assert int(meta["n_cells"]) == 16 and int(meta["n_vectors"]) == emb.count()
    assert not os.path.exists(tmp)
    assert not os.path.exists(idx + f".old.{os.getpid()}")


def test_ivfpq_rerank_all_probe_large_m_equals_brute(spark, tmp_path):
    """With every cell probed and m covering the whole corpus, the
    rerank stage sees ALL non-self candidates — the final top-5 must be
    exactly the brute-force cosine top-5 (quantization fully confined
    to a shortlist that happens to be everything)."""
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        build_ivf_medoid_index,
        build_pq_index,
        ivfpq_rerank_topk_prebuilt,
    )
    from funnel_report_etl_pipeline__spark.operators.similarity import (
        cosine_topk_brute,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ivf = str(tmp_path / "ivf")
    pq = str(tmp_path / "pq")
    build_ivf_medoid_index(emb, ivf, n_cells=16)
    build_pq_index(emb, pq, n_segments=8, seg_dim=8, n_codes=16)
    brute = {tuple(r) for r in cosine_topk_brute(emb, queries, k=5).collect()}
    rer = {
        tuple(r)
        for r in ivfpq_rerank_topk_prebuilt(
            emb, queries, ivf, pq, k=5, m=10_000, n_probe=16
        ).collect()
    }
    assert rer == brute and rer


def test_ivfpq_rerank_scores_are_exact_cosines(spark, tmp_path):
    """At production settings (m=20, n_probe=2) every returned cosine
    must equal the exact pairwise cosine — the re-rank stage reports
    true similarities, never ADC approximations."""
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        build_ivf_medoid_index,
        build_pq_index,
        ivfpq_rerank_topk_prebuilt,
    )
    from funnel_report_etl_pipeline__spark.operators.similarity import (
        cosine_topk_brute,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ivf = str(tmp_path / "ivf")
    pq = str(tmp_path / "pq")
    build_ivf_medoid_index(emb, ivf, n_cells=16)
    build_pq_index(emb, pq, n_segments=8, seg_dim=8, n_codes=16)
    exact = {
        (r["qid"], r["cid"]): r["cosine"]
        for r in cosine_topk_brute(emb, queries, k=10_000).collect()
    }
    out = ivfpq_rerank_topk_prebuilt(emb, queries, ivf, pq, k=5, m=20, n_probe=2).collect()
    assert out
    for r in out:
        assert exact[(r["qid"], r["cid"])] == r["cosine"]
