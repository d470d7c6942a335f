"""Behavioral invariants for the round-5 pipeline extensions (oracle
parity itself is covered query-by-query in test_registry_parity /
driver_sim)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.plans.registry import load_all

from .conftest import SF_MED, SF_SMALL

SPECS = load_all()


def test_quality_classifier_features_bounded(spark):
    rows = SPECS["quality_classifier"].fn(spark, SF_MED).collect()
    assert len(rows) == 500
    n_keep = 0
    for r in rows:
        assert 0.0 <= r.stop_rate <= 1.0
        assert 0.0 < r.uniq_rate <= 1.0
        assert r.mean_wlen > 0
        # keep is exactly the sign of the logit (same expression)
        assert r.keep == (r.quality_logit > 0.0)
        n_keep += int(r.keep)
    # the fixed weights must actually split the corpus, not rubber-stamp it
    assert 0 < n_keep < 500


def test_priority_dedup_prefers_trusted_source(spark):
    """On a corpus with planted cross-source duplicates, the winner of
    every duplicate group is the copy with the lowest source rank."""
    docs = spark.createDataFrame(
        [
            (1, "same text here", "src5"),
            (2, "same text here", "src2"),  # winner: lowest rank
            (3, "same text here", "src12"),
            (4, "unique text", "src9"),
        ],
        "doc_id long, text string, lang string",
    ).withColumnRenamed("lang", "source")
    import tempfile

    tmp = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    out = {r.doc_id: r for r in SPECS["priority_source_dedup"].fn(spark, tmp).collect()}
    assert set(out) == {2, 4}
    assert out[2].n_copies == 3 and out[2].source == "src2"
    assert out[4].n_copies == 1


def test_priority_dedup_total_coverage(spark):
    """Winners' copy counts add back up to the corpus size."""
    rows = SPECS["priority_source_dedup"].fn(spark, SF_MED).collect()
    assert sum(r.n_copies for r in rows) == 500


def test_dup_ngram_coverage_detects_planted_duplicate(spark):
    """A doc duplicated verbatim has dup_ratio 1.0; a doc sharing no
    8-gram has dup_ratio 0.0."""
    words = [f"w{i}" for i in range(40)]
    a = " ".join(words)
    b = " ".join(f"x{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, b)], "doc_id long, text string"
    )
    import tempfile

    tmp = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    out = {r.doc_id: r for r in SPECS["dup_ngram_coverage"].fn(spark, tmp).collect()}
    assert out[1].dup_ratio == 1.0 and out[2].dup_ratio == 1.0
    assert out[3].dup_ratio == 0.0
    assert out[1].n_grams == 40 - 7


def test_dsir_importance_favors_target_lookalikes(spark):
    """src0 documents (the target itself) must on average score higher
    than the rest of the corpus — the defining property of an importance
    weight."""
    rows = SPECS["dsir_importance"].fn(spark, SF_MED).collect()
    assert len(rows) == 500
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    tgt = [r.importance for r in rows if src[r.doc_id] == "src0"]
    rest = [r.importance for r in rows if src[r.doc_id] != "src0"]
    assert tgt and rest
    for r in rows:
        assert 0.0 <= r.importance <= 1.0
        assert r.sum_target <= r.sum_corpus
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_mixture_epochs_flattens_toward_uniform(spark):
    rows = SPECS["mixture_epochs"].fn(spark, SF_MED).collect()
    assert len(rows) == 20  # one per source
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert math.isclose(r.natural_share, r.n_tokens / total)
        assert math.isclose(r.temp_weight, math.sqrt(r.natural_share))
        assert math.isclose(r.epochs, r.temp_weight / r.natural_share)
    # temperature flattening: below-average sources get epochs > above-avg
    small = min(rows, key=lambda r: r.n_tokens)
    big = max(rows, key=lambda r: r.n_tokens)
    assert small.epochs > big.epochs


def test_tfidf_topterms_shape_and_idf(spark):
    rows = SPECS["tfidf_topterms"].fn(spark, SF_MED).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) == 20
    for src, terms in by_src.items():
        assert len(terms) == 5
        assert sorted(r.rnk for r in terms) == [1, 2, 3, 4, 5]
        ordered = sorted(terms, key=lambda r: r.rnk)
        for hi, lo in zip(ordered, ordered[1:]):
            assert (hi.score_micro, ) >= (lo.score_micro, )
        for r in terms:
            # score = tf * round(ln(n_src/df) * 1e6) with n_src = 20
            assert r.score_micro == r.tf * round(math.log(20 / r.df) * 1e6)


def test_tfidf_no_python_in_plan(spark):
    plan = (
        SPECS["tfidf_topterms"].fn(spark, SF_MED)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_source_drift_l1_exact_on_planted_corpus(spark):
    """Two identically-distributed sources have drift 0; a divergent one
    matches the hand-computed L1 distance."""
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "a b", "src1"),
            (2, "a b", "src2"),
            (3, "c c", "src3"),
        ],
        "doc_id long, text string, source string",
    )
    tmp = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    out = {r.source: r for r in SPECS["source_drift_l1"].fn(spark, tmp).collect()}
    # corpus: a=2/6 b=2/6 c=2/6. src1 = {a:1/2, b:1/2}:
    # |1/2-1/3|*2 + 1/3 = 1/3 + 1/3 = 2/3
    assert abs(out["src1"].l1_drift - 2 / 3) < 1e-12
    assert abs(out["src2"].l1_drift - 2 / 3) < 1e-12
    # src3 = {c:1}: |1-1/3| + 2/3 = 4/3
    assert abs(out["src3"].l1_drift - 4 / 3) < 1e-12
    for r in out.values():
        assert 0.0 <= r.l1_drift <= 2.0
        assert r.drift_num <= 2 * r.drift_den


def test_source_drift_l1_bounds_on_testdata(spark):
    rows = SPECS["source_drift_l1"].fn(spark, SF_MED).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r.l1_drift < 2.0


def test_per_source_holdout_fixed_size_and_stable(spark):
    a = SPECS["per_source_holdout"].fn(spark, SF_MED).collect()
    b = SPECS["per_source_holdout"].fn(spark, SF_MED).collect()
    assert {(r.doc_id, r.rnk) for r in a} == {(r.doc_id, r.rnk) for r in b}
    by_src: dict[str, int] = {}
    for r in a:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert set(by_src.values()) == {5} and len(by_src) == 20


def test_column_stats_profile(spark):
    rows = {r.col: r for r in SPECS["column_stats_orders"].fn(spark, SF_MED).collect()}
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority",
    }
    n = rows["o_orderkey"].n_rows
    for r in rows.values():
        assert r.n_rows == n
        assert r.n_non_null <= r.n_rows
        assert 1 <= r.n_distinct <= r.n_non_null
    assert rows["o_orderkey"].n_distinct == n  # primary key
    assert rows["o_orderkey"].min_num is not None and rows["o_orderkey"].min_str is None
    assert rows["o_orderstatus"].min_str is not None and rows["o_orderstatus"].min_num is None


def test_last_touch_attribution_conserves_purchases(spark):
    rows = SPECS["last_touch_attribution"].fn(spark, SF_MED).collect()
    ev = spark.read.parquet(f"{SF_MED}/events.parquet")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_purchases
    # organic bucket (no prior view) may exist but must not dominate
    organic = [r for r in rows if r.campaign is None]
    assert len(organic) <= 1
    if organic:
        assert organic[0].n_purchases < n_purchases / 2


def test_last_touch_attribution_planted(spark):
    """Purchase credits the most recent PRIOR view; later views never."""
    import tempfile
    from datetime import datetime

    t0 = datetime(2026, 3, 1, 12, 0, 0)

    def ts(m):
        return t0.replace(minute=m)

    ev = spark.createDataFrame(
        [
            (1, ts(0), 7, "view", 0.0, '{"k": 11}'),
            (2, ts(5), 7, "view", 0.0, '{"k": 22}'),   # last touch
            (3, ts(10), 7, "purchase", 50.0, "{}"),
            (4, ts(15), 7, "view", 0.0, '{"k": 33}'),  # after purchase: no credit
            (5, ts(20), 8, "purchase", 10.0, "{}"),    # organic
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    tmp = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {r.campaign: r for r in SPECS["last_touch_attribution"].fn(spark, tmp).collect()}
    assert out[22].n_purchases == 1 and out[22].total_value == 50.0
    assert out[None].n_purchases == 1 and out[None].total_value == 10.0
    assert 11 not in out and 33 not in out


def test_length_outliers_are_extreme(spark):
    rows = SPECS["length_outliers"].fn(spark, SF_MED).collect()
    assert rows, "threshold should select some docs on testdata"
    for r in rows:
        assert abs(r.n_tokens - r.med) > 2.0 * r.mad
        assert r.mad > 0


def test_transition_matrix_conserves_events(spark):
    rows = SPECS["event_transition_matrix"].fn(spark, SF_MED).collect()
    ev = spark.read.parquet(f"{SF_MED}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes exactly one transition
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    assert len(rows) <= 25  # |types|^2


def test_weekly_wow_change_consistent(spark):
    rows = sorted(
        SPECS["weekly_revenue_wow"].fn(spark, SF_MED).collect(),
        key=lambda r: r.week_start,
    )
    assert rows[0].wow_change is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_revenue == prev.revenue
        assert abs(cur.wow_change - (cur.revenue - prev.revenue) / prev.revenue) < 1e-12


def test_median_order_gap_positive_and_bounded(spark):
    rows = SPECS["median_order_gap"].fn(spark, SF_MED).collect()
    assert rows
    o = spark.read.parquet(f"{SF_MED}/orders.parquet")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert r.median_gap_us >= 0
        assert abs(r.median_gap_days - r.median_gap_us / 86400000000.0) < 1e-9


def test_bm25_ranks_term_rich_short_docs_first(spark):
    """BM25 invariants: scores positive and non-increasing by rank, and
    a planted doc saturated with query terms outranks one with a single
    occurrence buried in filler."""
    import tempfile

    filler = " ".join(f"f{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, "table spark window table spark window"),  # dense, short
            (2, f"table {filler}"),                        # one hit, long
            (3, filler),                                   # no hits
        ],
        "doc_id long, text string",
    )
    tmp = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    rows = sorted(
        SPECS["bm25_search"].fn(spark, tmp).collect(), key=lambda r: r.rnk
    )
    assert [r.doc_id for r in rows] == [1, 2]  # doc 3 filtered out
    assert rows[0].score > rows[1].score > 0


def test_bm25_on_testdata_shape(spark):
    rows = sorted(
        SPECS["bm25_search"].fn(spark, SF_MED).collect(), key=lambda r: r.rnk
    )
    assert len(rows) == 20
    assert [r.rnk for r in rows] == list(range(1, 21))
    for hi, lo in zip(rows, rows[1:]):
        assert hi.score >= lo.score


def test_top_session_paths_shape(spark):
    rows = sorted(
        SPECS["top_session_paths"].fn(spark, SF_MED).collect(), key=lambda r: r.rnk
    )
    assert 1 <= len(rows) <= 10
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    types = {"signup", "view", "purchase", "click", "error"}
    for hi, lo in zip(rows, rows[1:]):
        assert hi.n_sessions >= lo.n_sessions
    for r in rows:
        assert all(seg in types for seg in r.path.split(">"))
        assert 1 <= len(r.path.split(">")) <= 3


def test_rrf_fusion_rewards_dual_presence(spark):
    rows = SPECS["rrf_hybrid_fusion"].fn(spark, SF_MED).collect()
    assert len(rows) == 20
    for r in rows:
        lex = 1.0 / (60.0 + (r.lex_rank if r.lex_rank is not None else 1000))
        sem = 1.0 / (60.0 + (r.sem_rank if r.sem_rank is not None else 1000))
        assert abs(r.rrf_score - (lex + sem)) < 1e-15
    # a doc ranked by BOTH rankers must beat a doc of similar single-ranker
    # standing that the other ranker missed entirely
    both = [r for r in rows if r.lex_rank is not None and r.sem_rank is not None]
    only = [r for r in rows if r.lex_rank is None or r.sem_rank is None]
    if both and only:
        assert max(r.rrf_score for r in both) > max(r.rrf_score for r in only)


def test_train_val_test_split_partitions_corpus(spark):
    rows = SPECS["train_val_test_split"].fn(spark, SF_MED).collect()
    assert len(rows) == 500
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + 1
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] >= 450  # ~98% of 500, binomial slack
    # stability: identical assignment on rerun
    again = {r.doc_id: r.split for r in
             SPECS["train_val_test_split"].fn(spark, SF_MED).collect()}
    assert all(again[r.doc_id] == r.split for r in rows)
    # growth-stability: the split of doc_id=1 is a pure function of its id,
    # so a 1-doc corpus assigns it identically
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "x", "s")], "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    solo = SPECS["train_val_test_split"].fn(spark, tmp).collect()[0]
    full = {r.doc_id: r.split for r in rows}
    assert solo.split == full[1]
