"""Round-9 queries: (a) sketch-percentile twins for the last exact-
percentile plans, completing the registry's 100 TB percentile story, and
(b) the multimodal deepening — media dedup (exact sha256 + perceptual-
bucket canonicalization through the Arrow fingerprint pass) and the
modality token-budget mixture readout (`media_dedup`,
`modality_mixture_stats`; operators/multimodal.py carries the stubs).

`equidepth_price_histogram` and `winsorized_revenue_mean` compute exact
percentiles with Spark's `percentile` aggregate, which buffers the whole
value multiset per group — fine at gate scale, an executor-memory
scale-killer over a 100 TB fact with a handful of groups (their 10×
probes showed the cost: 2.6-2.7× wall for 10× facts, the worst ratios in
the round-8 batch). These `*_approx` twins follow the
`user_rfm_segments_approx` precedent (pipeline_r7.py): percentile
boundaries come from ONE mergeable `approx_percentile`
(Greenwald–Khanna) sketch pass — partials combine map-side, executor
memory bounded by the sketch at any corpus size — then a 1-row (or
per-group-row) broadcast applies the identical downstream chain
(bucket-assignment comparisons / winsorizing clamp: selection, not
arithmetic, so bit-deterministic).

Cross-engine exactness contract (same as the RFM precedent): both
engines use the DISCRETE quantile ("smallest value whose CDF ≥ p" —
Spark `approx_percentile`'s documented contract, DuckDB's
`quantile_disc`), and at gate scale n ≪ accuracy=10^6 so the GK sketch
never compresses and its output IS the exact discrete quantile. The
oracle computes the exact discrete quantile, so a green hash row proves
the sketch path bins/clamps identically. A plan-embedded `assert_true`
fails the job with an explicit message past the exactness regime instead
of letting the gate surface an opaque hash mismatch.

Reference parity note: the reference (report_engine.py / run_reports.py)
has no percentile operators at all — these extend the beyond-reference
surface under the same Spark-first determinism rules as the rest of
plans/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.functions.core import (
    dsum,
    sketch_regime_guard,
)
from funnel_report_etl_pipeline__spark.functions.hints import maybe_broadcast
from funnel_report_etl_pipeline__spark.plans.registry import register

_SKETCH_ACCURACY = 1_000_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _regime_guard(spark: SparkSession, name: str, n_col: str):
    return sketch_regime_guard(spark, name, n_col, _SKETCH_ACCURACY)


# ---------------------------------------------------------------------------
# Equi-depth histogram, sketch-boundary variant
# ---------------------------------------------------------------------------

_OCTILES = (0.125, 0.250, 0.375, 0.500, 0.625, 0.750, 0.875)


@register(
    "equidepth_price_histogram_approx",
    oracle="""
    WITH b AS (
      SELECT quantile_disc(o_totalprice, 0.125) AS b1,
             quantile_disc(o_totalprice, 0.250) AS b2,
             quantile_disc(o_totalprice, 0.375) AS b3,
             quantile_disc(o_totalprice, 0.500) AS b4,
             quantile_disc(o_totalprice, 0.625) AS b5,
             quantile_disc(o_totalprice, 0.750) AS b6,
             quantile_disc(o_totalprice, 0.875) AS b7
      FROM orders
    )
    SELECT CAST(CASE WHEN o_totalprice <= b1 THEN 0
                     WHEN o_totalprice <= b2 THEN 1
                     WHEN o_totalprice <= b3 THEN 2
                     WHEN o_totalprice <= b4 THEN 3
                     WHEN o_totalprice <= b5 THEN 4
                     WHEN o_totalprice <= b6 THEN 5
                     WHEN o_totalprice <= b7 THEN 6
                     ELSE 7 END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders CROSS JOIN b
    GROUP BY 1 ORDER BY bucket
    """,
    tags=("pipeline-r9", "stats", "dataops", "approx"),
    bench=True,
)
def equidepth_price_histogram_approx_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`equidepth_price_histogram`'s 100 TB path: the 7 octile boundaries
    come from one `approx_percentile` (GK) sketch aggregate instead of
    the exact `percentile` (which buffers every order price in one
    task). The sketch's partials are mergeable and bounded, so pass 1 is
    an ordinary map-side-combined aggregate at any fact size; pass 2 is
    the exact twin's binning chain over the broadcast 1-row boundary
    frame, unchanged. Boundaries are DISCRETE (actual data values) where
    the exact twin interpolates — bucket counts may differ from the
    exact twin at boundary ties, which is the documented CBO-histogram
    trade (engines build equi-depth stats from sketches for exactly this
    reason). Per-bucket counts and [lo, hi] bounds stay exact."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    qs = ", ".join(str(q) for q in _OCTILES)
    b = o.agg(
        F.expr(
            f"approx_percentile(o_totalprice, array({qs}), {_SKETCH_ACCURACY})"
        ).alias("__bs"),
        F.count("*").cast("long").alias("__n"),
    )
    guard = _regime_guard(spark, "equidepth_price_histogram_approx", "__n")
    price = F.col("o_totalprice")
    bucket = F.when(price <= F.col("__bs")[0], 0)
    for i in range(1, 7):
        bucket = bucket.when(price <= F.col("__bs")[i], i)
    bucket = bucket.otherwise(7).cast("long")
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(F.when(guard.isNull(), bucket).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min(price).cast("double").alias("lo"),
            F.max(price).cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Winsorized mean, sketch-clamp variant
# ---------------------------------------------------------------------------


@register(
    "winsorized_revenue_mean_approx",
    oracle="""
    WITH oc AS (
      SELECT c_mktsegment AS segment, o_totalprice AS price
      FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    b AS (
      SELECT segment,
             quantile_disc(price, 0.05) AS p05,
             quantile_disc(price, 0.95) AS p95
      FROM oc GROUP BY segment
    )
    SELECT oc.segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(LEAST(GREATEST(price, p05), p95)
                         AS DECIMAL(22,4))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS winsorized_mean,
           CAST(SUM(CAST(price AS DECIMAL(22,4))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS raw_mean
    FROM oc JOIN b ON b.segment = oc.segment
    GROUP BY oc.segment ORDER BY oc.segment
    """,
    tags=("pipeline-r9", "stats", "robust", "approx"),
    bench=True,
)
def winsorized_revenue_mean_approx_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`winsorized_revenue_mean`'s 100 TB path: per-segment [p05, p95]
    clamp bounds from one grouped `approx_percentile` (GK) sketch
    aggregate — bounded executor memory per group at any fact size,
    where the exact twin's `percentile` buffers each segment's whole
    price multiset (5 segments over a 100 TB fact = the round-8
    verdict's flagged scale-killer). The clamp bounds are DISCRETE
    quantiles (actual order prices) rather than the exact twin's
    interpolated values — a winsorized mean clips to observed order
    values, the standard trimmed-estimator formulation. Downstream is
    identical: LEAST/GREATEST clamp (selection — bit-exact), decimal sum,
    one closing division."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    oc = orders.join(
        maybe_broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").alias("price"),
    )
    b = oc.groupBy("segment").agg(
        F.expr(
            f"approx_percentile(price, array(0.05, 0.95), {_SKETCH_ACCURACY})"
        ).alias("__ps"),
        F.count("*").cast("long").alias("__n_seg"),
    )
    guard = _regime_guard(spark, "winsorized_revenue_mean_approx", "__n_seg")
    clamped = F.least(
        F.greatest(F.col("price"), F.col("__ps")[0]), F.col("__ps")[1]
    )
    return (
        oc.join(maybe_broadcast(b), "segment")
        .groupBy(F.when(guard.isNull(), F.col("segment")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (dsum(clamped) / F.count(F.lit(1)).cast("double")).alias(
                "winsorized_mean"
            ),
            (dsum("price") / F.count(F.lit(1)).cast("double")).alias("raw_mean"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Session bounce report, sketch-dwell variant
# ---------------------------------------------------------------------------


@register(
    "session_bounce_stats_approx",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    per AS (
      SELECT user_id, session_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             date_trunc('day', MIN(ts)) AS day,
             CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
               AS duration_us
      FROM sess GROUP BY user_id, session_id
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS bounce_rate,
           quantile_disc(duration_us, 0.50) / 1000000.0 AS p50_duration_s,
           quantile_disc(duration_us, 0.90) / 1000000.0 AS p90_duration_s
    FROM per GROUP BY day ORDER BY day
    """,
    tags=("pipeline-r9", "events", "analytics", "approx"),
    bench=True,
)
def session_bounce_stats_approx_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`session_bounce_stats`' 100 TB dwell-time path: identical session
    assembly (one user-grain window shuffle) and bounce counting, but
    the per-day dwell percentiles come from `approx_percentile` (GK)
    instead of the exact `percentile` that buffers every session
    duration of a day in one task — at 100 TB a single day's sessions
    are corpus-sized, the same flagged regime as the winsorized/
    equi-depth pair. Durations are exact µs BIGINTs, so the discrete
    sketch quantile is an observed duration (DuckDB `quantile_disc`
    twin); the /1e6 seconds conversion is one IEEE op on both
    engines."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 30 * 60 * 1_000_000)
    ).cast("bigint")
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.date_trunc("day", F.min("ts")).alias("day"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "duration_us"
        ),
    )
    guard = _regime_guard(spark, "session_bounce_stats_approx", "n_sessions")
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("long")
    agg = per.groupBy("day").agg(
        F.count("*").cast("long").alias("n_sessions"),
        bounce.alias("n_bounce"),
        (bounce.cast("double") / F.count("*").cast("double")).alias("bounce_rate"),
        (
            F.expr(
                f"approx_percentile(duration_us, 0.50, {_SKETCH_ACCURACY})"
            ).cast("double")
            / F.lit(1_000_000.0)
        ).alias("p50_duration_s"),
        (
            F.expr(
                f"approx_percentile(duration_us, 0.90, {_SKETCH_ACCURACY})"
            ).cast("double")
            / F.lit(1_000_000.0)
        ).alias("p90_duration_s"),
    )
    return agg.select(
        F.when(guard.isNull(), F.col("day")).alias("day"),
        "n_sessions",
        "n_bounce",
        "bounce_rate",
        "p50_duration_s",
        "p90_duration_s",
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Media dedup: exact sha256 + perceptual-bucket canonicalization
# ---------------------------------------------------------------------------


@register(
    "media_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             sha256(substr(text, 1, 32)) AS sha256,
             16 + CAST(('0x' || substr(sha256(substr(text, 1, 32)), 1, 2))
                       AS INT) % 64 AS w,
             16 + CAST(('0x' || substr(sha256(substr(text, 1, 32)), 3, 2))
                       AS INT) % 64 AS h
      FROM documents
    ),
    p AS (
      SELECT doc_id, sha256,
             substr(sha256(CAST(w AS VARCHAR) || 'x' || CAST(h AS VARCHAR)),
                    1, 8) AS phash
      FROM m
    )
    SELECT doc_id, sha256, phash,
           MIN(doc_id) OVER (PARTITION BY sha256) AS exact_canon,
           CAST(doc_id > MIN(doc_id) OVER (PARTITION BY sha256) AS BIGINT)
             AS is_exact_dup,
           MIN(doc_id) OVER (PARTITION BY phash) AS near_canon,
           CAST(doc_id > MIN(doc_id) OVER (PARTITION BY phash) AS BIGINT)
             AS is_near_dup
    FROM p
    """,
    tags=("pipeline-r9", "multimodal", "dedup"),
    bench=True,
)
def media_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-asset deduplication over an opaque binary column: ONE
    Arrow-batched fingerprint pass (`media_fingerprints` — sha256 of the
    bytes + a perceptual-hash stub over the stub-decoded geometry), then
    two hash-grain canonicalizations: exact identity (same bytes → same
    sha256; the planted thumbnail collisions give real signal — 24 dup
    assets at sf0.01) and perceptual bucket (stub pHash; assets whose
    decoded dimensions coincide share a candidate bucket). Each asset
    gets its cluster's MIN doc_id as canonical — min-over-hash-partition
    windows, never a pairwise join, so bucket size never produces a
    quadratic frame. The payload is the leading 32 bytes (the thumbnail
    stand-in for this text-shimmed corpus — `attach_binary_payload`
    pattern). At 100 TB: one Python hop (Arrow, per-batch yield), two
    hash-grain exchanges; perceptual buckets cap at the 64×64 stub
    geometry grid, and a real pHash's wider space only shrinks them."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.substring("text", 1, 32), "UTF-8").alias("payload")
    )
    from funnel_report_etl_pipeline__spark.operators.multimodal import (
        media_fingerprints,
    )

    fp = media_fingerprints(d, "payload", "doc_id")
    ws = Window.partitionBy("sha256")
    wp = Window.partitionBy("phash")
    exact_canon = F.min("doc_id").over(ws)
    near_canon = F.min("doc_id").over(wp)
    return fp.select(
        "doc_id",
        "sha256",
        "phash",
        exact_canon.alias("exact_canon"),
        (F.col("doc_id") > exact_canon).cast("long").alias("is_exact_dup"),
        near_canon.alias("near_canon"),
        (F.col("doc_id") > near_canon).cast("long").alias("is_near_dup"),
    )


# ---------------------------------------------------------------------------
# Modality mixture: per-media-type corpus/token-budget accounting
# ---------------------------------------------------------------------------


@register(
    "modality_mixture_stats",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             CAST(('0x' || substr(sha256(text), 5, 2)) AS INT) % 10 AS mcode
      FROM documents
    ),
    typed AS (
      SELECT *,
             CASE WHEN mcode <= 5 THEN 'text'
                  WHEN mcode <= 7 THEN 'image'
                  WHEN mcode = 8 THEN 'audio'
                  ELSE 'video' END AS media_type,
             CASE WHEN mcode <= 5 THEN CAST((n_bytes + 3) // 4 AS BIGINT)
                  WHEN mcode <= 7 THEN 256
                  WHEN mcode = 8 THEN CAST(n_bytes // 32 AS BIGINT)
                  ELSE 1024 END AS est_tokens
      FROM m
    ),
    g AS (
      SELECT media_type,
             CAST(COUNT(*) AS BIGINT) AS n_assets,
             CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
             CAST(SUM(est_tokens) AS BIGINT) AS total_tokens
      FROM typed GROUP BY media_type
    )
    SELECT media_type, n_assets, total_bytes, total_tokens,
           CAST(total_bytes AS DOUBLE)
             / CAST(SUM(total_bytes) OVER () AS DOUBLE) AS byte_share,
           CAST(total_tokens AS DOUBLE)
             / CAST(SUM(total_tokens) OVER () AS DOUBLE) AS token_share
    FROM g ORDER BY media_type
    """,
    tags=("pipeline-r9", "multimodal", "mixture"),
    bench=True,
)
def modality_mixture_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture-planning readout for a multimodal corpus: per media
    type, asset counts, raw byte footprint, and the estimated TOKEN
    budget each modality contributes to a training run (text ≈ bytes/4
    BPE heuristic; image = 256 patch tokens; audio ≈ bytes/32 codec
    frames; video = 4 sampled frames × 256) — the numbers a data-mixing
    plan is written in. Modality is assigned from the typed-metadata
    stub (a sha-derived code on this text-shimmed corpus; a real ingest
    carries media_type in MEDIA_META_SCHEMA). One Arrow fingerprint/meta
    pass, one ≤4-group aggregate, shares computed by an unpartitioned
    window over the 4-row aggregate — every cross-row sum is integer, so
    the two closing divisions are the only IEEE ops. At 100 TB: one
    Python hop + one 4-group map-side-combined shuffle."""
    from funnel_report_etl_pipeline__spark.operators.multimodal import (
        attach_binary_payload,
        binary_meta,
    )

    docs = attach_binary_payload(_t(spark, sf_dir, "documents"))

    meta = binary_meta(docs, "payload", "doc_id")
    mcode = (
        F.conv(F.substring("sha256", 5, 2), 16, 10).cast("int") % 10
    ).alias("mcode")
    typed = meta.select("doc_id", "n_bytes", mcode).select(
        "doc_id",
        "n_bytes",
        F.when(F.col("mcode") <= 5, "text")
        .when(F.col("mcode") <= 7, "image")
        .when(F.col("mcode") == 8, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.when(F.col("mcode") <= 5, F.expr("(n_bytes + 3) div 4"))
        .when(F.col("mcode") <= 7, F.lit(256).cast("long"))
        .when(F.col("mcode") == 8, F.expr("n_bytes div 32"))
        .otherwise(F.lit(1024).cast("long"))
        .alias("est_tokens"),
    )
    g = typed.groupBy("media_type").agg(
        F.count("*").cast("long").alias("n_assets"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("est_tokens").cast("long").alias("total_tokens"),
    )
    wall = Window.partitionBy()
    return g.select(
        "media_type",
        "n_assets",
        "total_bytes",
        "total_tokens",
        (
            F.col("total_bytes").cast("double")
            / F.sum("total_bytes").over(wall).cast("double")
        ).alias("byte_share"),
        (
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(wall).cast("double")
        ).alias("token_share"),
    ).orderBy("media_type")
