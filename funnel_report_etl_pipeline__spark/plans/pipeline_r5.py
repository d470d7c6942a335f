"""Round-5 extensions.

LLM-pipeline: model-based quality filtering, cross-source priority
dedup, ExactSubstr-style duplicated-span coverage, DSIR-style importance
weighting, mixture/epoch planning, TF-IDF term profiling, per-source
distribution drift, fixed-size eval holdouts, robust (MAD) length
outliers, ANALYZE-style table profiling.

Event/commerce analytics: last-touch attribution (as-of + JSON), RFM
quartile segmentation, daily bounce rate over gap sessions, event-flow
transition matrix, week-over-week revenue trend, repeat-order gap
medians.

Registered AFTER the driver's 50-entry window (tag ``pipeline-ext``);
every query carries a full DuckDB value-hash oracle and is verified by
tools/driver_sim.py + pytest, same as the round-4 batch.

Cross-engine determinism notes (same rules as pipeline_ext):

* ratios are ONE division of two exact integers;
* the only transcendental (tf-idf's ln) is rounded to integer
  micro-units in BOTH engines before any ranking — the nearest distinct
  ln value sits 0.015 micro-units from a rounding boundary (verified for
  every reachable df), so a 1-ulp libm-vs-JVM difference cannot flip it;
* linear-model arithmetic is a fixed parenthesized expression over
  per-row doubles (no float SUM aggregation), identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.operators.text import STOPWORDS
from funnel_report_etl_pipeline__spark.plans.registry import register
from funnel_report_etl_pipeline__spark.sources.readers import catalog_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog_table(spark, sf_dir, name)


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

# fixed linear-model weights (a stand-in for a trained fasttext/logreg
# quality classifier's final layer): bias, stopword-rate, unique-token
# rate, mean word length. Chosen so the testdata splits non-trivially.
_QC_BIAS, _QC_W_STOP, _QC_W_UNIQ, _QC_W_WLEN = -2.0, 4.0, 2.5, -0.05


@register(
    "quality_classifier",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks,
             length(replace(text, ' ', '')) AS n_letters
      FROM documents
    ), f AS (
      SELECT doc_id, source,
             len(toks) AS n_tokens,
             CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS stop_rate,
             CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS uniq_rate,
             CAST(n_letters AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_wlen
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           stop_rate, uniq_rate, mean_wlen,
           {_QC_BIAS} + {_QC_W_STOP} * stop_rate + {_QC_W_UNIQ} * uniq_rate
             + {_QC_W_WLEN} * mean_wlen AS quality_logit,
           ({_QC_BIAS} + {_QC_W_STOP} * stop_rate + {_QC_W_UNIQ} * uniq_rate
             + {_QC_W_WLEN} * mean_wlen) > 0.0 AS keep
    FROM f
    """,
    tags=("pipeline-ext", "text", "quality"),
    bench=False,
)
def quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: a fixed-weight linear classifier over
    cheap lexical features (stopword rate, unique-token rate, mean word
    length) — the Spark-side shape of the fasttext/logreg quality scorers
    used by CCNet/C4-style curation (the learned weights are a config
    input; the engine contributes the feature extraction + scoring plan).
    Everything is per-row JVM arithmetic inside whole-stage codegen: no
    shuffle at all, no UDF, and the feature→logit expression is a fixed
    parenthesized tree so the double result is bit-identical across
    engines and partitionings. At 100 TB this is a pure map-side pass —
    the cheapest possible corpus operation, which is why quality scoring
    is the FIRST stage of the curation funnel (drop early, drop cheap)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    f = (
        docs.select(
            "doc_id",
            "source",
            F.size(toks).alias("n_tokens"),
            F.size(F.filter(toks, lambda x: F.array_contains(stops, x))).alias("n_stop"),
            F.size(F.array_distinct(toks)).alias("n_uniq"),
            F.length(F.regexp_replace(F.col("text"), " ", "")).alias("n_letters"),
        )
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")).alias(
                "stop_rate"
            ),
            (F.col("n_uniq").cast("double") / F.col("n_tokens").cast("double")).alias(
                "uniq_rate"
            ),
            (F.col("n_letters").cast("double") / F.col("n_tokens").cast("double")).alias(
                "mean_wlen"
            ),
        )
    )
    logit = (
        F.lit(_QC_BIAS)
        + F.lit(_QC_W_STOP) * F.col("stop_rate")
        + F.lit(_QC_W_UNIQ) * F.col("uniq_rate")
        + F.lit(_QC_W_WLEN) * F.col("mean_wlen")
    )
    return f.select(
        "doc_id", "source", "n_tokens", "stop_rate", "uniq_rate", "mean_wlen",
        logit.alias("quality_logit"),
        (logit > F.lit(0.0)).alias("keep"),
    )


@register(
    "priority_source_dedup",
    oracle="""
    SELECT doc_id, source, n_copies FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY md5(text)
               ORDER BY CAST(substr(source, 4) AS INTEGER), doc_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies
      FROM documents
    ) t WHERE rn = 1
    """,
    tags=("pipeline-ext", "dedup"),
)
def priority_source_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source priority dedup: when the same text appears in several
    sources, keep the copy from the most-trusted source (curated wiki
    beats crawl beats scrape — here the numeric suffix of ``source`` is
    the trust rank) instead of exact_dedup's arbitrary lowest-id winner.
    This is how production corpora (The Pile, Dolma) resolve
    cross-registry duplicates without losing the curated copy. Plan: one
    shuffle keyed on md5(text) — the text column itself is projected away
    before the exchange, so only (128-bit key, id, priority) crosses the
    wire; winner + copy count come from one window over that key."""
    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.col("text"))
    prio = F.substring(F.col("source"), 4, 10).cast("int")
    slim = docs.select("doc_id", "source", key.alias("__k"), prio.alias("__p"))
    w = Window.partitionBy("__k")
    return (
        slim.withColumn("rn", F.row_number().over(w.orderBy("__p", "doc_id")))
        .withColumn("n_copies", F.count("*").over(w).cast("long"))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_copies")
    )


@register(
    "dup_ngram_coverage",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS h
      FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 6)) AS i) s
      WHERE len(toks) >= 8
    ),
    df AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY h)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_positions,
           CAST(SUM(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
    FROM g JOIN df USING (h)
    GROUP BY g.doc_id
    """,
    tags=("pipeline-ext", "dedup", "text"),
    bench=True,
)
def dup_ngram_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span coverage (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the fraction of 8-gram positions whose gram also occurs in
    ANOTHER document. The suffix-array formulation the paper uses is a
    global sort over the corpus; the Spark-first shape is gram-hash
    aggregation — every 8-gram position becomes an md5 key (16 bytes on
    the wire, never the gram text), document frequency is one groupBy,
    and per-doc coverage is one re-agg on doc_id. Exact integer counts;
    one final division. Physical shape: a SINGLE lineage — (doc, h)
    occurrence counts, then document frequency as a count-over-h window,
    then the doc re-agg. The naive df-table + join formulation recomputes
    the explode+md5 branch twice and re-shuffles the raw gram stream;
    this shape scans once and moves only the (doc, h, occ) frame through
    its uniform-hash-key shuffles (measured 2× faster at sf0.1). Gram
    construction is the codegen'd posexplode + window-lead shape shared
    with the minhash path (`operators/dedup.py::gram_rows`) — the HOF
    transform-over-slice formulation it replaces is CodegenFallback AND
    O(len²) per doc (slice copies per position; round-6 A/B: 2.2× slower
    end-to-end at sf0.1). At 100 TB the per-gram partitions stay
    balanced (md5 keys), and a stop-gram cap (df > threshold) could
    bound the window partitions the same way the winnowing fingerprint
    cap does."""
    from funnel_report_etl_pipeline__spark.operators.dedup import gram_rows

    docs = _t(spark, sf_dir, "documents")
    grams = gram_rows(docs, ngram=8, distinct=False).select(
        F.col("id").alias("doc_id"), F.md5(F.col("gram")).alias("h")
    )
    per = grams.groupBy("doc_id", "h").agg(F.count("*").alias("occ"))
    n_docs = F.count("*").over(Window.partitionBy("h"))
    return (
        per.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") > 1, F.col("occ")).otherwise(0))
            .cast("long")
            .alias("n_dup_positions"),
        )
        .withColumn(
            "dup_ratio",
            F.col("n_dup_positions").cast("double") / F.col("n_grams").cast("double"),
        )
    )


@register(
    "dsir_importance",
    oracle="""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    bg AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 4))
                  AS INTEGER) % 1024 AS b
      FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) s
      WHERE len(toks) >= 2
    ),
    corpus_c AS (SELECT b, COUNT(*) AS c_n FROM bg GROUP BY b),
    target_c AS (SELECT b, COUNT(*) AS t_n FROM bg WHERE source = 'src0'
                 GROUP BY b)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(COALESCE(target_c.t_n, 0)) AS BIGINT) AS sum_target,
           CAST(SUM(corpus_c.c_n) AS BIGINT) AS sum_corpus,
           CAST(SUM(COALESCE(target_c.t_n, 0)) AS DOUBLE)
             / CAST(SUM(corpus_c.c_n) AS DOUBLE) AS importance
    FROM bg
    JOIN corpus_c USING (b)
    LEFT JOIN target_c USING (b)
    GROUP BY bg.doc_id
    """,
    tags=("pipeline-ext", "sampling", "quality"),
)
def dsir_importance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much its hashed-bigram profile looks like a trusted
    target distribution (here: source 'src0' stands in for the curated
    target corpus). Bigrams hash into 1024 buckets; per doc, importance =
    Σ target-bucket-count / Σ corpus-bucket-count over its bigram
    occurrences — the count-ratio variant of DSIR's log-likelihood ratio,
    chosen because it stays in exact integer arithmetic (one final
    division). Plan: the two bucket-count tables are ≤1024 rows —
    broadcast to the gram stream, so the only real shuffle is the per-doc
    re-agg; at 100 TB the n-gram feature hash is the classic
    fixed-dimension sketch that makes importance reweighting feasible
    without a vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bg = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))))
            .alias("i", "w1"),
            toks.alias("__toks"),
        )
        .withColumn("w2", F.col("__toks")[F.col("i") + 1])
        .select(
            "doc_id",
            "source",
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(" ", "w1", "w2")), 1, 4), 16, 10
                ).cast("int")
                % 1024
            ).alias("b"),
        )
    )
    corpus_c = bg.groupBy("b").agg(F.count("*").alias("c_n"))
    target_c = (
        bg.filter(F.col("source") == "src0").groupBy("b").agg(F.count("*").alias("t_n"))
    )
    return (
        bg.join(F.broadcast(corpus_c), "b")
        .join(F.broadcast(target_c), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("t_n"), F.lit(0))).cast("long").alias("sum_target"),
            F.sum("c_n").cast("long").alias("sum_corpus"),
        )
        .withColumn(
            "importance",
            F.col("sum_target").cast("double") / F.col("sum_corpus").cast("double"),
        )
    )


@register(
    "mixture_epochs",
    oracle="""
    WITH n AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (SELECT SUM(n_tokens) AS total FROM n)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(tot.total AS DOUBLE) AS natural_share,
           sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot.total AS DOUBLE))
             AS temp_weight,
           sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot.total AS DOUBLE))
             / (CAST(n_tokens AS DOUBLE) / CAST(tot.total AS DOUBLE)) AS epochs
    FROM n, tot
    """,
    tags=("pipeline-ext", "sampling", "mixture"),
)
def mixture_epochs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture epoch planner: per source, the repeat factor
    ("epochs") that turns the natural token distribution into the
    α = 0.5 temperature-flattened mixture — the planning table behind
    `temperature_source_sample` (which applies rates to rows; this emits
    the plan itself, the artifact a training job consumes to set per-source
    sampling weights, à la GPT-3/PaLM mixture tables). epochs_s =
    w_s / share_s with w_s = sqrt(share_s), i.e. rare sources are repeated
    (epochs > 1), dominant sources are subsampled (epochs < 1). Every
    share is one division of exact integer token counts; sqrt is IEEE
    correctly-rounded — no float summation anywhere, so the doubles are
    bit-identical across engines. Plan: one groupBy(source) over a
    2-column scan + a 1-row broadcast total."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"),
    )
    tot = n.agg(F.sum("n_tokens").alias("total"))
    share = F.col("n_tokens").cast("double") / F.col("total").cast("double")
    return n.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("natural_share"),
        F.sqrt(share).alias("temp_weight"),
        (F.sqrt(share) / share).alias("epochs"),
    )


@register(
    "tfidf_topterms",
    oracle="""
    WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT source, term, COUNT(*) AS tf FROM t GROUP BY source, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    ns AS (SELECT COUNT(DISTINCT source) AS n_src FROM tf),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, dfreq.df,
             tf.tf * CAST(ROUND(ln(CAST(ns.n_src AS DOUBLE)
                                   / CAST(dfreq.df AS DOUBLE)) * 1000000.0)
                          AS BIGINT) AS score_micro
      FROM tf JOIN dfreq USING (term), ns
    )
    SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score_micro, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY score_micro DESC, term) AS rnk
      FROM scored
    ) r WHERE rnk <= 5
    """,
    tags=("pipeline-ext", "text"),
)
def tfidf_topterms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TF-IDF term profile: the top-5 most characteristic
    terms of each source — the standard corpus-inspection op for spotting
    a source gone bad (boilerplate floods, spam vocabularies) before it
    trains. idf = ln(n_sources/df) is the one transcendental in the whole
    registry; it is rounded to integer MICRO-units in both engines before
    the tf multiply and the ranking, and every reachable ln value sits
    ≥ 0.015 micro-units from a rounding boundary (module docstring), so
    JVM-vs-libm last-ulp differences cannot flip anything. Plan: two
    grouped counts (term-grain), a broadcast 1-row n_src, and a
    WindowGroupLimit top-5 per source — rank pruning happens below the
    final shuffle."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    # df and n_src re-aggregate the (source, term) table — one row per
    # source-term pair, so COUNT(*) per term IS the source-document
    # frequency — and the corpus-sized gram stream materializes once
    tf = t.groupBy("source", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ns = tf.agg(F.count_distinct("source").alias("n_src"))
    idf_micro = F.round(
        F.log(F.col("n_src").cast("double") / F.col("df").cast("double"))
        * F.lit(1000000.0)
    ).cast("long")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            (F.col("tf") * idf_micro).alias("score_micro"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score_micro").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


@register(
    "source_drift_l1",
    oracle="""
    WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
               FROM documents),
    st AS (SELECT source, term, COUNT(*) AS c_st FROM t GROUP BY source, term),
    ct AS (SELECT term, COUNT(*) AS c_t FROM t GROUP BY term),
    ns AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY source),
    tot AS (SELECT SUM(c_t) AS n FROM ct),
    present AS (
      SELECT st.source,
             SUM(abs(st.c_st * tot.n - ct.c_t * ns.n_s)) AS present_abs,
             SUM(ct.c_t) AS present_ct
      FROM st JOIN ct USING (term) JOIN ns USING (source), tot
      GROUP BY st.source
    )
    SELECT p.source, CAST(ns.n_s AS BIGINT) AS n_tokens,
           CAST(p.present_abs + (tot.n - p.present_ct) * ns.n_s AS BIGINT)
             AS drift_num,
           CAST(tot.n AS BIGINT) * CAST(ns.n_s AS BIGINT) AS drift_den,
           CAST(p.present_abs + (tot.n - p.present_ct) * ns.n_s AS DOUBLE)
             / (CAST(tot.n AS DOUBLE) * CAST(ns.n_s AS DOUBLE)) AS l1_drift
    FROM present p JOIN ns USING (source), tot
    """,
    tags=("pipeline-ext", "text", "quality"),
)
def source_drift_l1_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift monitor: the L1 (total-variation x 2)
    distance between each source's unigram distribution and the corpus
    distribution — the quantity a production pipeline alerts on when one
    crawl source suddenly floods with boilerplate or spam vocabulary.
    Computed EXACTLY in integers by clearing denominators:
    Σ_t |p_s(t) − p(t)| = ( Σ_{t∈s} |c_st·N − c_t·N_s|
                            + (N − Σ_{t∈s} c_t)·N_s ) / (N·N_s),
    where the second term closes the sum over terms ABSENT from the
    source without materializing the source × vocabulary outer join —
    the algebra that keeps this term-grain, not (term × source)-grain, at
    100 TB. One gram shuffle feeds both count tables; everything after is
    source-grain (broadcast-sized)."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("term"))
    # every other count is a re-aggregation of the (source, term) table,
    # so the corpus-sized gram stream is materialized exactly ONCE; the
    # branch-per-count formulation re-explodes the full corpus for the
    # term table (~0.2 s cheaper locally where scans are free, but a
    # second 100 TB scan+explode at scale)
    st = t.groupBy("source", "term").agg(F.count("*").alias("c_st"))
    ct = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    ns = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    tot = ct.agg(F.sum("c_t").alias("n"))
    present = (
        st.join(ct, "term")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(F.abs(F.col("c_st") * F.col("n") - F.col("c_t") * F.col("n_s")))
            .alias("present_abs"),
            F.sum("c_t").alias("present_ct"),
        )
    )
    num = F.col("present_abs") + (F.col("n") - F.col("present_ct")) * F.col("n_s")
    return (
        present.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            num.cast("long").alias("drift_num"),
            (F.col("n").cast("long") * F.col("n_s").cast("long")).alias("drift_den"),
            (
                num.cast("double")
                / (F.col("n").cast("double") * F.col("n_s").cast("double"))
            ).alias("l1_drift"),
        )
    )


@register(
    "per_source_holdout",
    oracle="""
    SELECT doc_id, source, rnk FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
      FROM documents
    ) t WHERE rnk <= 5
    """,
    tags=("pipeline-ext", "sampling"),
)
def per_source_holdout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-source eval holdout: exactly K=5 documents per
    source, selected by md5(doc_id) order — the deterministic,
    partition-independent analogue of per-group reservoir sampling. Every
    engine, cluster size, and rerun picks the SAME K docs (the property an
    eval split must have), and adding new docs to a source only swaps
    members when a new doc hashes below the current K-th — bounded eval
    churn on corpus growth. Plan: one shuffle on source with
    WindowGroupLimit pushing the top-K below the exchange, so only ~K
    rows per source survive to the final filter."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


@register(
    "column_stats_orders",
    oracle="""
    SELECT 'o_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_non_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           MIN(o_totalprice), MAX(o_totalprice), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT), CAST(COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
    tags=("pipeline-ext", "profiling"),
)
def column_stats_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style exact column profile of a table — row counts, null
    counts, exact NDV, min/max per column — the statistics a catalog
    (or a human auditing a 100 TB delivery) wants per ingest. One pass
    per column group over a column-pruned scan; numeric and string
    min/max are typed separately (casting numerics to strings is NOT
    engine-portable: JVM and DuckDB render doubles differently). At real
    scale the exact NDVs become `approx_count_distinct` and all columns
    share ONE scan via grouping-set-style aggregation; here each branch's
    scan is column-pruned and the union is 5 one-row frames."""
    o = _t(spark, sf_dir, "orders")

    def num(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.min(col).cast("double").alias("min_num"),
            F.max(col).cast("double").alias("max_num"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str"),
        )

    def txt(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.min(col).alias("min_str"),
            F.max(col).alias("max_str"),
        )

    parts = [
        num("o_orderkey"),
        num("o_custkey"),
        num("o_totalprice"),
        txt("o_orderstatus"),
        txt("o_orderpriority"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "last_touch_attribution",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM (
        SELECT user_id, ts, props,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) d WHERE rn = 1
    ),
    p AS (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT k AS campaign,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(22,4))) AS DOUBLE) AS total_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    GROUP BY k
    """,
    tags=("pipeline-ext", "attribution", "asof"),
)
def last_touch_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch campaign attribution: every purchase is credited to the
    most recent prior view's campaign (``props.k``), then revenue rolls up
    per campaign — the composition of the as-of join, JSON extraction, and
    exact-decimal revenue sums into marketing's canonical report. Views
    sharing a (user, ts) are pre-deduped to the highest event_id so the
    as-of winner is deterministic in both engines (DuckDB's ASOF JOIN and
    the engine's union+window asof_join otherwise tie-break arbitrarily).
    Purchases with no prior view credit campaign NULL (organic). Plan: the
    as-of join is ONE shuffle on user_id over the union frame — never a
    per-row range probe; the campaign rollup is grouped on ≤100 keys."""
    from funnel_report_etl_pipeline__spark.functions.core import dsum
    from funnel_report_etl_pipeline__spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    v = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(p, v, on=["user_id"], right_cols=["k"])
    return joined.groupBy(F.col("asof_k").alias("campaign")).agg(
        F.count("*").alias("n_purchases"),
        dsum("value").alias("total_value"),
    )


@register(
    "length_outliers",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT lang, quantile_cont(n_tokens, 0.5) AS med FROM t GROUP BY lang
    ),
    d AS (
      SELECT t.doc_id, t.lang, t.n_tokens, s.med,
             abs(CAST(t.n_tokens AS DOUBLE) - s.med) AS adev
      FROM t JOIN s USING (lang)
    ),
    m AS (SELECT lang, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_tokens, d.med, m.mad
    FROM d JOIN m USING (lang)
    WHERE d.adev > 2.0 * m.mad AND m.mad > 0.0
    """,
    tags=("pipeline-ext", "quality", "robust-stats"),
)
def length_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length-outlier detection: documents whose token
    count sits more than 2 MADs (median absolute deviations) from their
    language's median — the robust-statistics gate that survives the
    heavy-tailed length distributions where mean±kσ is itself dragged by
    the outliers it should catch. Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the (1−g)·lo + g·hi interpolation, so median
    and MAD are engine-identical doubles; the deviation comparison is
    per-row arithmetic. Plan: two lang-grain aggregations (broadcast-sized
    results joined back), one corpus scan per stage — no window over the
    corpus, no Python."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    s = t.groupBy("lang").agg(F.percentile("n_tokens", F.lit(0.5)).alias("med"))
    d = t.join(F.broadcast(s), "lang").withColumn(
        "adev", F.abs(F.col("n_tokens").cast("double") - F.col("med"))
    )
    m = d.groupBy("lang").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return (
        d.join(F.broadcast(m), "lang")
        .filter((F.col("adev") > 2.0 * F.col("mad")) & (F.col("mad") > 0.0))
        .select("doc_id", "lang", "n_tokens", "med", "mad")
    )


@register(
    "user_rfm_segments",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MAX(ts) AS last_purchase,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(22,4))) AS DOUBLE) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id, last_purchase, frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY last_purchase, user_id) AS BIGINT) AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary, user_id) AS BIGINT) AS m_quartile
    FROM u
    """,
    tags=("pipeline-ext", "analytics"),
)
def user_rfm_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation — the
    classic customer-value grid, as one grouped pass plus three NTILE
    windows. Every ordering carries user_id as the tie-break so quartile
    boundaries are deterministic across engines and partitionings (bare
    NTILE over a tied metric is not). Monetary sums are exact decimal.
    Scale note: NTILE over the full user set is a single-partition window
    — fine at user-grain (one row per purchasing user), and the quartile
    boundaries could equally come from `percentile_approx` + a broadcast
    join at 10^9 users; the windowed form is the exact-oracle variant."""
    from funnel_report_etl_pipeline__spark.functions.core import dsum

    ev = _t(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_purchase"),
            F.count("*").alias("frequency"),
            dsum("value").alias("monetary"),
        )
    )
    return u.select(
        "user_id",
        "last_purchase",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("last_purchase", "user_id"))
        .cast("long")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy("frequency", "user_id"))
        .cast("long")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy("monetary", "user_id"))
        .cast("long")
        .alias("m_quartile"),
    )


@register(
    "bounce_rate_daily",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - COALESCE(epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)), -4000000000000000000)
               > 1800 * 1000000 THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sess AS (
      SELECT user_id, sess_key, MIN(ts) AS session_start,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM (
        SELECT user_id, ts,
               MAX(CASE WHEN is_start = 1 THEN ts END) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_key
        FROM e
      ) g GROUP BY user_id, sess_key
    )
    SELECT strftime(date_trunc('day', session_start), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
    FROM sess
    GROUP BY 1
    """,
    tags=("pipeline-ext", "analytics", "session"),
)
def bounce_rate_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: gap-based sessionization (30-minute inactivity
    boundary, same construction as the `sessionize` query) rolled up to
    the fraction of single-event sessions per day — the engagement-health
    metric every funnel report sits next to. Session keys are the running
    MAX of boundary timestamps per user (one user-partitioned window, no
    corpus-wide window); the daily rollup is an integer ratio. Day is
    emitted as an ISO string (DATE-typed columns are not portable through
    the gate's pandas compare)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    is_start = (
        F.unix_micros("ts") - F.coalesce(prev_us, F.lit(-(4 * 10**18)))
        > 1800 * 1_000_000
    ).cast("int")
    # (ts, event_id) ordering on the running-max too: with ts ties the
    # session assignment would otherwise be partition-order dependent
    # (same tie-break as top_session_paths; round-5 advice item)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess_key = F.max(F.when(F.col("is_start") == 1, F.col("ts"))).over(run)
    sess = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("is_start", is_start)
        .withColumn("sess_key", sess_key)
        .groupBy("user_id", "sess_key")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return (
        sess.groupBy(
            F.date_format(F.date_trunc("day", "session_start"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(bounce).cast("long").alias("n_bounces"),
        )
        .withColumn(
            "bounce_rate",
            F.col("n_bounces").cast("double") / F.col("n_sessions").cast("double"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("pipeline-ext", "analytics", "funnel"),
)
def event_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-flow transition matrix: counts of consecutive
    (previous event → next event) pairs per user — the Markov-chain /
    Sankey-diagram view of product flow that sits beside the ordered
    funnel (which transitions dominate, where users loop, where they
    bail). One user-partitioned LAG window (the per-user event timeline is
    the natural partition, bounded by events-per-user) and one tiny
    (|types|² ≤ 25-row) aggregation. Ties on ts are broken by event_id so
    the sequence — and therefore the matrix — is engine-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


@register(
    "weekly_revenue_wow",
    oracle="""
    WITH w AS (
      SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(22,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT week_start, n_orders, revenue,
           LAG(revenue) OVER (ORDER BY week_start) AS prev_revenue,
           CASE WHEN LAG(revenue) OVER (ORDER BY week_start) IS NULL THEN NULL
                ELSE (revenue - LAG(revenue) OVER (ORDER BY week_start))
                     / LAG(revenue) OVER (ORDER BY week_start) END AS wow_change
    FROM w
    """,
    tags=("pipeline-ext", "analytics", "timeseries"),
)
def weekly_revenue_wow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue trend: weekly order counts + exact-decimal
    revenue, then the WoW relative change via LAG over the (small) weekly
    frame. Spark's `date_trunc('week', ...)` and DuckDB's both truncate to
    Monday, and the week key is emitted as an ISO string for gate
    portability. The window runs over week-grain rows (≤ a few thousand
    for decades of data) — a driver-sized frame AFTER the heavy
    aggregation, which is the correct place for a global-order window."""
    o = _t(spark, sf_dir, "orders")
    from funnel_report_etl_pipeline__spark.functions.core import dsum

    wk = (
        o.groupBy(
            F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias(
                "week_start"
            )
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("week_start")
    prev = F.lag("revenue").over(w)
    return wk.select(
        "week_start",
        "n_orders",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise((F.col("revenue") - prev) / prev)
        .alias("wow_change"),
    )


@register(
    "median_order_gap",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS gap_us
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             quantile_cont(gap_us, 0.5) AS median_gap_us
      FROM g WHERE gap_us IS NOT NULL GROUP BY o_custkey
    )
    SELECT o_custkey, n_gaps, median_gap_us,
           median_gap_us / 86400000000.0 AS median_gap_days
    FROM per_cust
    """,
    tags=("pipeline-ext", "analytics", "timeseries"),
)
def median_order_gap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase latency: per customer, the median gap between
    consecutive orders — the number a retention model calibrates against
    (and the denominator of "is this customer overdue"). Consecutive gaps
    via a customer-partitioned LAG (ties broken by orderkey), exact
    median via `percentile` ≙ `quantile_cont` on integer microseconds,
    days derived by one literal division. Customers with a single order
    drop out (no gap) — they belong to acquisition, not repeat, metrics."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        (
            F.unix_micros("o_orderdate")
            - F.unix_micros(F.lag("o_orderdate").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        g.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_gaps"),
            F.percentile("gap_us", F.lit(0.5)).alias("median_gap_us"),
        )
        .withColumn("median_gap_days", F.col("median_gap_us") / F.lit(86400000000.0))
    )


@register(
    "dup_span_removal",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, i AS p, md5(array_to_string(toks[i:i+7], ' ')) AS h
      FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 6)) AS i) s
      WHERE len(toks) >= 8
    ),
    gmin AS (SELECT h, MIN(doc_id) AS min_id FROM g GROUP BY h),
    starts AS (
      SELECT g.doc_id, g.p, 0 AS kind, CAST(NULL AS VARCHAR) AS tok
      FROM g JOIN gmin USING (h) WHERE g.doc_id > gmin.min_id
    ),
    tokens AS (
      SELECT doc_id, i AS p, 1 AS kind, toks[i] AS tok
      FROM t, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) s
    ),
    ev AS (SELECT * FROM starts UNION ALL SELECT * FROM tokens),
    m AS (
      SELECT doc_id, p, kind, tok,
             MAX(CASE WHEN kind = 0 THEN p END) OVER (
               PARTITION BY doc_id ORDER BY p, kind
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
      FROM ev
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN lf IS NULL OR lf <= p - 8 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN lf IS NULL OR lf <= p - 8 THEN tok END,
                               ' ' ORDER BY p), '') AS text_clean
    FROM m WHERE kind = 1 GROUP BY doc_id
    """,
    tags=("pipeline-ext", "dedup"),
    bench=True,  # the heaviest sub-document dedup shape (gram + token streams)
)
def dup_span_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span removal (see operators/dedup.py::dup_span_dedup):
    tokens covered by an 8-gram that occurred in an earlier document are
    deleted and the survivors reassembled — the exact-substring dedup of
    Lee et al. 2022, reformulated from a suffix array (a global sort) to
    gram-hash min-id aggregation + a per-document running-max coverage
    window. Companion to `dup_ngram_coverage` (which scores the same
    duplication this operator removes) and strictly stronger than
    `chunk_dedup` (alignment-independent)."""
    from funnel_report_etl_pipeline__spark.operators.dedup import dup_span_dedup

    return dup_span_dedup(_t(spark, sf_dir, "documents"))


def _pq_oracle(n_segments: int = 8, seg_dim: int = 8, n_codes: int = 16, k: int = 5) -> str:
    def dist(vcol: str) -> str:
        # fixed left-associated 8-term sum of self-multiplied diffs —
        # identical evaluation order to the Spark expression tree
        terms = [
            f"(({vcol}[s*{seg_dim}+{j}]-av[s*{seg_dim}+{j}])"
            f"*({vcol}[s*{seg_dim}+{j}]-av[s*{seg_dim}+{j}]))"
            for j in range(1, seg_dim + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out}+{t})"
        return out

    piv = ", ".join(
        f"SUM(CASE WHEN s={s} THEN dist END) AS d{s}" for s in range(n_segments)
    )
    ssum = "d0"
    for s in range(1, n_segments):
        ssum = f"({ssum}+d{s})"
    return f"""
    WITH c AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    a AS (
      SELECT code, av FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                 - 1 AS code,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS av
        FROM embeddings
      ) t WHERE code < {n_codes}
    ),
    seg AS (SELECT unnest(range(0, {n_segments})) AS s),
    enc AS (
      SELECT cid, s, code FROM (
        SELECT c.cid, seg.s, a.code,
               ROW_NUMBER() OVER (PARTITION BY c.cid, seg.s
                                  ORDER BY {dist('v')}, a.code) AS rn
        FROM c, a, seg
      ) e WHERE rn = 1
    ),
    adc AS (
      SELECT q.qid, seg.s, a.code, {dist('qv')} AS dist
      FROM q, a, seg
    ),
    piv AS (
      SELECT adc.qid, enc.cid, {piv}
      FROM enc JOIN adc USING (s, code)
      GROUP BY adc.qid, enc.cid
    )
    SELECT qid, cid, adc_dist, rnk FROM (
      SELECT qid, cid, {ssum} AS adc_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY {ssum}, cid) AS BIGINT) AS rnk
      FROM piv
    ) r WHERE rnk <= {k}
    """


@register(
    "similarity_ann_pq",
    oracle=_pq_oracle(),
    tags=("pipeline-ext", "similarity", "ann"),
)
def similarity_ann_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN over the embeddings table (see
    operators/similarity.py::pq_topk): 8 segments × 16 hash-anchored
    codewords, asymmetric-distance top-5 per query (every 100th vector).
    Completes the ANN family (brute / hyperplane-LSH / IVF / PQ) — PQ is
    the memory-bound regime's answer (codes are n_segments bytes per
    vector). Deterministic codebooks make even the quantized distances
    value-hash-verifiable against DuckDB."""
    from funnel_report_etl_pipeline__spark.operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return pq_topk(emb, queries, k=5)


_BM25_TERMS = ("table", "spark", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle(k: int = 20) -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    idf_cols = ",\n             ".join(
        f"CAST(ROUND(ln((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT)"
        f" AS idf{i}" for i in range(len(_BM25_TERMS))
    )
    score_terms = [
        f"(CAST(idf{i} AS DOUBLE) * ((CAST(tf{i} AS DOUBLE) * {_BM25_K1 + 1})"
        f" / (CAST(tf{i} AS DOUBLE) + {_BM25_K1} * ((1.0 - {_BM25_B})"
        f" + {_BM25_B} * (CAST(dl AS DOUBLE) / avgdl)))))"
        for i in range(len(_BM25_TERMS))
    ]
    ssum = score_terms[0]
    for t in score_terms[1:]:
        ssum = f"({ssum}+{t})"
    df_aggs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), f AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM t
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             {df_aggs}
      FROM f
    ), idf AS (
      SELECT n_docs, avgdl,
             {idf_cols}
      FROM stats
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS dl, score, rnk FROM (
      SELECT f.doc_id, f.dl, {ssum} AS score,
             CAST(ROW_NUMBER() OVER (ORDER BY {ssum} DESC, f.doc_id) AS BIGINT)
               AS rnk
      FROM f, idf
      WHERE (tf0 + tf1) + tf2 > 0
    ) r WHERE rnk <= {k}
    """


@register(
    "bm25_search",
    oracle=_bm25_oracle(),
    tags=("pipeline-ext", "text", "retrieval"),
)
def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson–Spärck Jones, k1=1.2, b=0.75):
    top-20 documents for a fixed 3-term query — the lexical half of the
    hybrid (BM25 + ANN) retrieval stack used to mine training data and
    power dedup-aware search. Exact integer tf/df/dl; idf is the
    ln-to-integer-micro-units pattern (every reachable df for corpora up
    to 50 k docs sits ≥ 1.4e-5 micro-units from a rounding boundary —
    five orders of magnitude above a 1-ulp libm/JVM divergence); the
    per-term saturation ratio and 3-term sum are fixed-order double
    expressions. Plan: ONE corpus scan computes per-doc (dl, tf_t) —
    term filters are map-side array ops — then a 1-row broadcast carries
    (N, avgdl, df_t, idf_t) back; ranking is a TakeOrdered top-20, no
    corpus-wide sort. At 100 TB, arbitrary (not fixed) queries use the
    same frame joined against a broadcast query-term table."""
    scored = bm25_scored_frame(spark, sf_dir)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 20)
    )


def bm25_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BM25 scoring frame: (doc_id, dl, score) for every document
    matching ≥1 query term — consumed by `bm25_search` (exact window
    rank) and `bm25_search_topk` (TakeOrdered partial top-k, the plan
    shape that survives an unbounded corpus)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    def tf_of(term: str):
        # factory, NOT a default-arg lambda: a 2-param HOF lambda would
        # receive the array INDEX as its second argument (SKILL.md gotcha)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    f = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf_of(t).alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = f.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    for i in range(len(_BM25_TERMS)):
        stats = stats.withColumn(
            f"idf{i}",
            F.round(
                F.log(
                    (
                        F.col("n_docs").cast("double")
                        - F.col(f"df{i}").cast("double")
                        + 0.5
                    )
                    / (F.col(f"df{i}").cast("double") + 0.5)
                    + 1.0
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    k1, b = _BM25_K1, _BM25_B
    joined = f.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(_BM25_TERMS)):
        tf = F.col(f"tf{i}").cast("double")
        ratio = (tf * F.lit(k1 + 1)) / (
            tf
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
        term = F.col(f"idf{i}").cast("double") * ratio
        score = term if score is None else score + term
    return (
        joined.filter((F.col("tf0") + F.col("tf1")) + F.col("tf2") > 0)
        .select("doc_id", F.col("dl").cast("long").alias("dl"), score.alias("score"))
    )


@register(
    "top_session_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - COALESCE(epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)), -4000000000000000000)
               > 1800 * 1000000 THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    g AS (
      SELECT user_id, ts, event_id, event_type,
             MAX(CASE WHEN is_start = 1 THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_key
      FROM e
    ),
    r AS (
      SELECT user_id, sess_key, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sess_key
                                ORDER BY ts, event_id) AS rn
      FROM g
    ),
    paths AS (
      SELECT user_id, sess_key,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id, sess_key
    )
    SELECT path, n_sessions, rnk FROM (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS BIGINT)
               AS rnk
      FROM paths GROUP BY path
    ) t WHERE rnk <= 10
    """,
    tags=("pipeline-ext", "analytics", "session"),
)
def top_session_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session entry paths: the 10 most common first-3-event
    sequences per session (30-min gap sessions, same construction as
    `bounce_rate_daily`) — the path-analysis / Sankey-entry view that
    tells a product team HOW sessions start, beside the funnel's
    how-far-do-they-get. Everything rides user-partitioned windows until
    the path strings (≤ |types|³ distinct) aggregate; the top-10 is a
    TakeOrdered, not a global sort. Ordering is (ts, event_id)-tied
    everywhere so paths are engine-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    is_start = (
        F.unix_micros("ts") - F.coalesce(prev_us, F.lit(-(4 * 10**18)))
        > 1800 * 1_000_000
    ).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess_key = F.max(F.when(F.col("is_start") == 1, F.col("ts"))).over(run)
    sw = Window.partitionBy("user_id", "sess_key").orderBy("ts", "event_id")
    paths = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("is_start", is_start)
        .withColumn("sess_key", sess_key)
        .withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id", "sess_key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    wr = Window.orderBy(F.col("n_sessions").desc(), "path")
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 10)
    )


@register(
    "rrf_hybrid_fusion",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (
      SELECT doc_id,
             len(list_filter(toks, x -> x = 'table')) AS tf
      FROM t
    ),
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS BIGINT)
               AS lex_rank
      FROM f WHERE tf > 0
    ),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id AS doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY
               list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE) * qv[i])) DESC,
               vec_id) AS BIGINT) AS sem_rank
      FROM embeddings, q WHERE vec_id <> 0
    )
    SELECT doc_id, lex_rank, sem_rank,
           ((1.0 / (60.0 + CAST(COALESCE(lex_rank, 1000) AS DOUBLE)))
            + (1.0 / (60.0 + CAST(COALESCE(sem_rank, 1000) AS DOUBLE))))
             AS rrf_score,
           rnk
    FROM (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.lex_rank, sem.sem_rank,
             CAST(ROW_NUMBER() OVER (ORDER BY
               ((1.0 / (60.0 + CAST(COALESCE(lex_rank, 1000) AS DOUBLE)))
                + (1.0 / (60.0 + CAST(COALESCE(sem_rank, 1000) AS DOUBLE)))) DESC,
               COALESCE(lex.doc_id, sem.doc_id)) AS BIGINT) AS rnk
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ) r WHERE rnk <= 20
    """,
    tags=("pipeline-ext", "retrieval", "similarity"),
)
def rrf_hybrid_fusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of a lexical and a
    semantic ranking — the standard hybrid-retrieval combiner (used
    everywhere from enterprise search to training-data mining) that needs
    only RANKS, never comparable scores: rrf = Σ 1/(60 + rank), absent
    rankings imputed rank 1000. Lexical side ranks documents by term
    frequency of 'table'; semantic side ranks embeddings by dot product
    with query vector 0 (testdata aligns doc_id ≙ vec_id). Ranks come
    from integer sort keys (tf; dot products compared, not hash-compared
    — the RANK is what crosses into the score), the fused score is a
    fixed-order two-term sum of exact divisions, and every window is
    fully tie-broken. Both ranked lists are top-heavy small after their
    own pruning; fusion is a full-outer join on id + one TakeOrdered."""
    lex_scored, sem_scored = rrf_scored_lists(spark, sf_dir)
    lex = lex_scored.withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.col("tf").desc(), "doc_id")).cast("long"),
    ).select("doc_id", "lex_rank")
    sem = sem_scored.withColumn(
        "sem_rank",
        F.row_number()
        .over(Window.orderBy(F.col("__dot").desc(), "doc_id"))
        .cast("long"),
    ).select("doc_id", "sem_rank")
    return rrf_fuse(lex, sem)


def rrf_scored_lists(spark: SparkSession, sf_dir: str):
    """Shared RRF inputs: the lexical (doc_id, tf) and semantic
    (doc_id, __dot) scored frames — consumed by `rrf_hybrid_fusion`
    (exact full-corpus ranks) and `rrf_fusion_topk` (TakeOrdered
    list-capped ranks, the plan that survives an unbounded corpus)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    toks = F.split(F.col("text"), " ")
    lex_scored = docs.select(
        "doc_id", F.size(F.filter(toks, lambda x: x == F.lit("table"))).alias("tf")
    ).filter(F.col("tf") > 0)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            F.col("qv"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sem_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), dot.alias("__dot"))
    )
    return lex_scored, sem_scored


def rrf_fuse(lex: DataFrame, sem: DataFrame, k: int = 20) -> DataFrame:
    """Fuse two (doc_id, *_rank) lists: rrf = Σ 1/(60 + rank), absent
    rankings imputed rank 1000; top-k on (score DESC, doc_id)."""
    fused = lex.join(sem, "doc_id", "full_outer")
    score = (
        F.lit(1.0) / (F.lit(60.0) + F.coalesce(F.col("lex_rank"), F.lit(1000)).cast("double"))
    ) + (
        F.lit(1.0) / (F.lit(60.0) + F.coalesce(F.col("sem_rank"), F.lit(1000)).cast("double"))
    )
    wr = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.select("doc_id", "lex_rank", "sem_rank", score.alias("rrf_score"))
        .withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= k)
    )


@register(
    "train_val_test_split",
    oracle="""
    SELECT doc_id, source, split FROM (
      SELECT doc_id, source,
             CASE WHEN frac < 0.98 THEN 'train'
                  WHEN frac < 0.99 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967296.0 AS frac
        FROM documents
      ) f
    ) s
    """,
    tags=("pipeline-ext", "sampling"),
)
def train_val_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-way train/val/test assignment (98/1/1) by md5
    fraction — the split every training pipeline needs, with the
    properties `df.randomSplit` lacks: stable across runs, engines,
    cluster sizes, and corpus growth (a doc's split NEVER changes when
    other docs arrive, so eval sets stay uncontaminated across crawl
    snapshots — the same content-addressing argument as `hash_sample`,
    extended to a partition of the corpus). Pure map-side expression;
    split-grain counts are one tiny follow-up groupBy."""
    d = _t(spark, sf_dir, "documents")
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    split = (
        F.when(frac < 0.98, "train").when(frac < 0.99, "val").otherwise("test")
    )
    return d.select("doc_id", "source", split.alias("split"))
