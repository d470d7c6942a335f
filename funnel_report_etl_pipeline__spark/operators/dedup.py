"""Deduplication operators for large-scale text corpora.

Four families, all built from JVM-side expressions (no Python in the data
path) so they hold at 100 TB:

* **exact** — hash the (optionally normalized) text, keep first doc per
  hash. One shuffle on the hash.
* **MinHash + LSH** — shingle → k seeded min-hashes → band buckets →
  bucket-join for candidates → exact Jaccard verify. Never all-pairs: the
  only join is on (band_idx, band_hash), whose groups are near-duplicate
  clusters, not the corpus cross product.
* **SimHash** — 64-bit token-vote fingerprint, banded into 4×16-bit chunks
  for candidate generation (Hamming ≤ 3 within any chunk-equal pair).
* **n-gram Jaccard** — exact similarity join on shared n-grams; quadratic
  only within a blocking key, used as the verifier and as a small-corpus
  baseline.

The reference has no dedup (it is a funnel ETL); these are the
training-data-pipeline extensions required alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "word_ngrams",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_verify",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_candidate_pairs",
]


def normalize_text(col: F.Column) -> F.Column:
    """Lowercase, strip non-alphanumerics, collapse runs of spaces — the
    canonical form for exact near-dup hashing."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def word_ngrams(tokens: F.Column, n: int) -> F.Column:
    """Distinct word n-grams from a token array (JVM higher-order funcs).
    Fewer than n tokens → empty array (guarded: sequence(0,-1) would
    produce a DESCENDING sequence, not an empty one)."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = False
) -> DataFrame:
    """Keep the lowest-id row per (md5 of text). row_number over the hash
    partition — one shuffle on the 128-bit hash, no skew (hash keys are
    uniform; a pathological mega-duplicate group is bounded by its own
    cluster size, and only (id, hash) pairs shuffle, never the text)."""
    text = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    h = F.md5(text)
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    ngram: int = 3,
) -> DataFrame:
    """(id, shingles, sig) — sig[i] = min over shingles of hash(shingle, i).

    The seeded hash is Spark's murmur3 over (shingle, seed) — deterministic
    across runs and cluster sizes. Computed per-row with higher-order
    functions: zero shuffles to build signatures.
    """
    toks = F.split(F.col(text_col), " ")
    shingles = word_ngrams(toks, ngram)

    # NOTE: the closure must be built by a factory, not `lambda s, i=i`:
    # PySpark counts lambda parameters to decide what to pass, and a 2-arg
    # lambda receives (element, array_index) — the index Column would
    # silently replace the captured seed.
    def _seeded_min(seed: int) -> F.Column:
        return F.array_min(
            F.transform(F.col("shingles"), lambda s: F.hash(s, F.lit(seed)))
        )

    sig = F.array(*[_seeded_min(i) for i in range(num_perm)])
    return (
        df.select(F.col(id_col).alias("id"), shingles.alias("shingles"))
        .filter(F.size("shingles") > 0)
        .withColumn("sig", sig)
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 8, rows: int = 4) -> DataFrame:
    """Banding: split the signature into `bands` chunks of `rows`; docs
    sharing any (band_idx, band_hash) are candidates. The join key is the
    band bucket — at 100 TB this is the only join, and each bucket holds a
    near-dup cluster (skewed mega-clusters are handled by AQE skew-join)."""
    band = F.posexplode(
        F.array(
            *[
                F.hash(*[F.element_at("sig", b * rows + r + 1) for r in range(rows)])
                for b in range(bands)
            ]
        )
    )
    buckets = sigs.select("id", band.alias("band_idx", "band_hash"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sigs: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard on the candidates' shingle sets; filters LSH false
    positives. Joins shingle arrays to id pairs (broadcast-able when the
    candidate set is small relative to the corpus)."""
    sh = sigs.select("id", "shingles")
    j = (
        pairs.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.col("jaccard").cast("double").alias("jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    ngram: int = 3,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact-Jaccard verify. Returns (id_a, id_b, jaccard) pairs ≥ threshold."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, ngram)
    cands = lsh_candidate_pairs(sigs, bands, rows)
    return jaccard_verify(cands, sigs, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash: each distinct token votes ±1 on each bit of its
    64-bit hash; the sign of the vote sum sets the fingerprint bit.
    Pure array expressions per row — no explode, no shuffle."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    # bit 63 is the sign bit of a signed long: 1<<63 overflows int64, so
    # the mask for it is its two's-complement value. Factory (not a
    # default-arg lambda) so the captured mask is not clobbered by the
    # extra Column PySpark passes to multi-arg HOF lambdas.
    def _mask(b: int) -> int:
        return (1 << b) if b < 63 else -(1 << 63)

    def _vote(b: int) -> F.Column:
        mask = F.lit(_mask(b))
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    fp = None
    for b in range(64):
        bit = F.when(_vote(b) > 0, F.lit(_mask(b))).otherwise(F.lit(0))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return df.select(F.col(id_col).alias("id"), fp.alias("simhash"))


def simhash_candidate_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_hamming. Blocking: split the
    64-bit fingerprint into 4 × 16-bit chunks — any pair within distance 3
    must agree on ≥1 chunk (pigeonhole), so the join is on chunk equality,
    never all-pairs. Verify with bit_count(xor)."""
    chunks = F.posexplode(
        F.array(
            *[
                F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ]
        )
    )
    blocked = fps.select("id", "simhash", chunks.alias("chunk_idx", "chunk"))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
