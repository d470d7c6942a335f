"""Text-analysis operators for training-data pipelines.

Quality scoring, token counting, language-ID, and document fingerprinting
over the `documents` table — every expression is a built-in Spark SQL
function (JVM, codegen), and each has an exact DuckDB-SQL twin registered
in plans/pipeline_ops.py so the driver hash-verifies them.

None of these exist in the reference (a funnel ETL); they are the
LLM-data-pipeline extensions the brief requires as first-class operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from funnel_report_etl_pipeline__spark.operators.dedup import normalize_text

__all__ = [
    "text_stats",
    "token_count_regex",
    "lang_id",
    "doc_fingerprint",
    "rolling_fingerprints",
    "repetition_stats",
    "redact_pii",
]

# tiny multilingual stopword sets for the marker heuristic; deterministic
# and cheap — a real deployment would swap in fastText-style profiles via
# the same column contract
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "los", "y", "que"),
    "fr": ("le", "la", "les", "et", "que"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# word / number / single non-space symbol — the BPE-ish pre-tokenizer split
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# distinctive character trigrams per language (with their surrounding
# spaces where the function-word boundary is the signal) — the classic
# char-n-gram-profile approach in miniature
LANG_CHAR_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "de": (" de", "der", "ich", "sch", "und"),
    "en": (" th", "the", "ing", " an", "and"),
    "es": (" el", " la", "ión", "que", " qu"),
    "fr": (" le", " la", "eux", "ais", " qu"),
    "zh": ("de5", "le5", "shi", "i4 ", "ai4"),
}


def _argmax_lang(scores: dict[str, F.Column]) -> F.Column:
    """Deterministic argmax over per-language score columns: higher score
    wins; ties resolve to the lexicographically FIRST language. Shared by
    both lang-ID variants so their tiebreak can never diverge."""
    best = None
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        cand = F.struct(s.alias("s"), F.lit(lang).alias("l"))
        best = cand if best is None else F.when(s >= best["s"], cand).otherwise(best)
    return best["l"]


def quality_keep_expr(text_col: str = "text") -> F.Column:
    """The Gopher/C4-style keep predicate as a standalone expression, so
    consumers (curation) can filter scan-side without a stats join."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    stop_ratio = n_stop.cast("double") / F.size(F.array_distinct(toks))
    return (n_tokens >= 10) & (n_tokens <= 1000) & (stop_ratio > 0)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: char/token counts, mean token length,
    stopword ratio, alpha ratio, and a boolean keep-flag in the fashion of
    Gopher/C4 quality rules. Single scan, no shuffle."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    # bigint counts: parity with DuckDB's 64-bit len()/length(), and the
    # right width for 100 TB corpora anyway
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])))
    n_alpha = F.length(F.regexp_replace(text, "[^a-z]", ""))
    stop_ratio = (n_stop.cast("double") / F.size(F.array_distinct(toks)))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars.cast("double") / n_tokens).alias("chars_per_token"),
        stop_ratio.alias("stopword_ratio"),
        (n_alpha.cast("double") / n_chars).alias("alpha_ratio"),
        quality_keep_expr(text_col).alias("quality_keep"),
    )


def token_count_regex(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token count under a BPE-ish pre-tokenizer regex (words | numbers |
    single symbols) plus the plain whitespace count."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.split(text, "\\s+")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).cast("long").alias("n_bpe_tokens"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language-ID: score each language by how many of its
    marker words occur; argmax with lexicographic tiebreak so the result is
    total-order deterministic. Emits per-language scores for inspection."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))).cast("long")
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
        _argmax_lang(scores).alias("pred_lang"),
    )


def lang_id_char_ngrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Char-n-gram-profile language ID: score each language by how many of
    its distinctive character trigrams occur in the text (substring
    presence, scan-side `contains` — no tokenization). Same deterministic
    lexicographic-first argmax as the word-marker variant."""
    text = F.lower(F.col(text_col))
    scores = {
        lang: sum(
            (F.when(text.contains(g), 1).otherwise(0) for g in grams), F.lit(0)
        ).cast("long")
        for lang, grams in sorted(LANG_CHAR_TRIGRAMS.items())
    }
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_CHAR_TRIGRAMS)],
        _argmax_lang(scores).alias("pred_lang"),
    )


def rolling_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 16
) -> DataFrame:
    """Rolling-window document fingerprint (winnowing-style): hash every
    k-char window of the text, keep the minimum — documents sharing any
    long-enough passage share their minimum with high probability, making
    this a cheap containment-detection key (the MOSS/winnowing idea with a
    single global window).

    Uses md5 (identical across engines) rather than murmur3 so the result
    is oracle-verifiable; the min is taken over exploded positions with a
    grouped min-aggregate — codegen, map-side partials, same shape as the
    MinHash signature pass. Docs shorter than k get the whole-text hash.
    """
    text = F.col(text_col)
    pos = df.select(
        F.col(id_col).alias("id"),
        text.alias("__t"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text) - k + 1, F.lit(1)))
        ).alias("__p"),
    )
    win_hash = F.md5(F.col("__t").substr(F.col("__p"), F.lit(k)))
    return (
        pos.select("id", win_hash.alias("__h"))
        .groupBy("id")
        .agg(F.min("__h").alias("fp_rolling"))
    )


def winnow_fingerprint_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    window: int = 8,
) -> DataFrame:
    """Distinct (id, __fp) winnowing fingerprint rows (SIGMOD'03): hash
    every k-char window, keep the MINIMUM hash of every ``window``
    consecutive positions. Any shared run of k+window-1 chars between two
    documents yields at least one shared fingerprint — the selection the
    set-summary and containment-pair operators both consume.

    Scale shape: positions explode once (chars × 1 row); the per-position
    window-min partitions BY DOCUMENT ordered by position (bounded state:
    ``window`` longs), then a distinct on (id, fp) that reuses the same
    partitioning. Text never shuffles — only (id, pos-hash) longs."""
    text = F.col(text_col)
    pos = df.select(
        F.col(id_col).alias("id"),
        text.alias("__t"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text) - k + 1, F.lit(1)))
        ).alias("__p"),
    )
    # 32-bit integer hash of the k-gram: first 8 md5 hex digits (engine-exact)
    h = (
        F.conv(F.substring(F.md5(F.col("__t").substr(F.col("__p"), F.lit(k))), 1, 8), 16, 10)
        .cast("long")
    )
    w = (
        Window.partitionBy("id")
        .orderBy("__p")
        .rowsBetween(0, window - 1)
    )
    return (
        pos.select("id", h.alias("__h"), F.col("__p"))
        .withColumn("__fp", F.min("__h").over(w))
        .select("id", "__fp")
        .distinct()
    )


def winnow_fingerprint_set(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    window: int = 8,
) -> DataFrame:
    """Per-document summary of the winnowing selection: (id_col, n_fps,
    fp_min, fp_checksum) — count, minimum, and exact BIGINT sum of the
    distinct fingerprints, order-independent integers hash-comparable
    across engines."""
    fps = winnow_fingerprint_rows(df, text_col, id_col, k, window)
    return fps.groupBy("id").agg(
        F.count("*").alias("n_fps"),
        F.min("__fp").alias("fp_min"),
        F.sum("__fp").alias("fp_checksum"),
    ).select(
        F.col("id").alias(id_col), "n_fps", "fp_min", "fp_checksum"
    )


def winnow_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    window: int = 8,
    min_shared: int = 2,
    max_fp_freq: int = 100,
) -> DataFrame:
    """Containment-candidate pairs via shared winnowing fingerprints: two
    documents sharing ≥ ``min_shared`` selected fingerprints very likely
    share passages of ≥ k+window-1 chars — the MOSS pairing step, and the
    passage-level sibling of the MinHash near-dup join (MinHash finds
    globally-similar documents; this finds documents CONTAINING common
    passages even when globally dissimilar).

    Returns (id_a, id_b, n_shared_fps), id_a < id_b.

    ``max_fp_freq`` drops fingerprints selected by more than that many
    documents before the join (stop-fingerprints — boilerplate shared
    corpus-wide carries no pairing signal and would contribute freq² join
    rows each, exactly the gram-frequency-cap argument from the Jaccard
    verifier). Cost is Σ df² over surviving fingerprints — bucket-join
    shaped, never corpus²."""
    fps = winnow_fingerprint_rows(df, text_col, id_col, k, window)
    freq = fps.groupBy("__fp").agg(F.count("*").alias("__df"))
    fps = fps.join(
        freq.filter(F.col("__df") <= max_fp_freq).select("__fp"), "__fp"
    )
    a = fps.withColumnRenamed("id", "id_a")
    b = fps.withColumnRenamed("id", "id_b")
    return (
        a.join(b, "__fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    * ``top_2gram_frac`` — occurrences of the most frequent word 2-gram /
      total 2-gram occurrences (the "top n-gram fraction" rule);
    * ``dup_3gram_frac`` — fraction of 3-gram occurrences that belong to a
      gram appearing more than once (the "duplicate n-gram fraction" rule);
    * ``rep_keep`` — the Gopher-ish keep predicate (top2 ≤ 0.20,
      dup3 ≤ 0.18; thresholds from the Gopher paper's table, applied to
      token counts rather than characters).

    Shape: NON-distinct gram rows (every occurrence counts) → per-(doc,
    gram) count → per-doc max/sum. Two grouped aggregates, both with
    map-side partials; only (id, gram, count) rows reach a shuffle — never
    the text. Docs too short to have any 2-gram (or 3-gram) get 0.0 for
    that fraction (no repetition evidence → not filtered).
    """
    from funnel_report_etl_pipeline__spark.operators.dedup import gram_rows

    def frac(ngram: int, dup_only: bool) -> DataFrame:
        g = gram_rows(df, id_col, text_col, ngram, distinct=False)
        counts = g.groupBy("id", "gram").agg(F.count("*").alias("c"))
        top = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) if dup_only else F.max("c")
        return counts.groupBy("id").agg(
            (top.cast("double") / F.sum("c")).alias(f"__f{ngram}")
        )

    spine = df.select(F.col(id_col).alias("id"))
    return (
        spine.join(frac(2, dup_only=False), "id", "left")
        .join(frac(3, dup_only=True), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("__f2", F.lit(0.0)).alias("top_2gram_frac"),
            F.coalesce("__f3", F.lit(0.0)).alias("dup_3gram_frac"),
            (
                (F.coalesce("__f2", F.lit(0.0)) <= 0.20)
                & (F.coalesce("__f3", F.lit(0.0)) <= 0.18)
            ).alias("rep_keep"),
        )
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable content fingerprints of the normalized text: md5 (dedup key),
    sha256 (content address), and a 64-bit integer fingerprint (the first
    15 hex digits of the md5) for compact joins."""
    norm = normalize_text(F.col(text_col))
    md5 = F.md5(norm)
    return df.select(
        F.col(id_col),
        md5.alias("fp_md5"),
        F.sha2(norm, 256).alias("fp_sha256"),
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint").alias("fp_int64"),
    )


# (label, pattern, replacement) — redaction order matters: emails first so
# their domain dots can't be half-eaten by the IP pattern. Patterns stay in
# the RE2-compatible subset (char classes, \b, bounded repeats) so the same
# strings run verbatim in Spark (java.util.regex) and DuckDB (RE2) — no
# lookarounds, which RE2 lacks.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9]{1,3}(?:-[0-9]{3,4}){2,3}", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """PII redaction for training corpora: replace emails / IPv4 addresses /
    phone numbers with typed placeholder tokens and report per-type match
    counts. Returns (id_col, *keep_cols, n_email, n_ipv4, n_phone,
    redacted) — ``keep_cols`` carries metadata (lang, source, ...) through
    the redaction so downstream mixture-balancing keeps its labels.

    Pure regexp_replace/regexp_count chains — map-side, codegen'd, zero
    shuffle: the shape that runs at scan speed over 100 TB. Counts are
    computed on the ORIGINAL text (before any replacement) so the types
    can't consume each other's matches."""
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{label}")
        for label, pat, _ in PII_PATTERNS
    ]
    redacted = text
    for _, pat, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, token)
    keep = [F.col(c) for c in keep_cols]
    return df.select(F.col(id_col), *keep, *counts, redacted.alias("redacted"))


def novelty_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram: int = 5
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    word n-grams whose FIRST corpus occurrence (lowest id) is this
    document. Repeated boilerplate scores near 0, fresh prose near 1 — a
    standard curation signal for ranking near-duplicate-heavy crawl data
    before the harder MinHash pass (reference has no text ops; this is
    part of the brief's training-data surface).

    Returns (id_col, n_grams, n_novel, novelty) for every document with at
    least one n-gram.

    Scale shape: two gram-keyed hash aggregations (min-id and the per-doc
    count), both with map-side partial aggregation — a viral gram shared by
    k documents contributes one partial row per map task, never a k-row
    group — then a doc-cardinality left join of two tiny per-doc frames.
    Nothing joins at gram grain. The division is a single IEEE-754 op on
    two exact integers, so the score is bit-identical on any engine.
    """
    from funnel_report_etl_pipeline__spark.operators.dedup import gram_rows

    grams = gram_rows(df, id_col=id_col, text_col=text_col, ngram=ngram)
    totals = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    first = grams.groupBy("gram").agg(F.min("id").alias("first_id"))
    novel = first.groupBy("first_id").agg(F.count(F.lit(1)).alias("n_novel"))
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0).cast("bigint"))
    return (
        totals.join(novel, totals["id"] == novel["first_id"], "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams"),
            n_novel.alias("n_novel"),
            (n_novel.cast("double") / F.col("n_grams").cast("double")).alias("novelty"),
        )
    )
