"""Round-8 operators: planted-fixture behavior tests (oracle parity is
covered by driver_sim / CORRECTNESS; these pin the semantics on inputs
where the right answer is computable by hand)."""

from __future__ import annotations

import math
from datetime import datetime

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


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


# --- Q17 shape --------------------------------------------------------------


def test_small_quantity_revenue_planted(spark, specs, tmp_path_factory):
    # part 1 (Brand#13): quantities 10, 10, 100 -> avg 40, threshold 8:
    # NO line qualifies. part 2 (Brand#13): quantities 1, 99 -> avg 50,
    # threshold 10: the qty-1 line (price 70) qualifies. part 3 (other
    # brand, qty 0.5 below any threshold) must be excluded by the brand
    # filter entirely.
    ship = datetime(1996, 1, 1)
    part = spark.createDataFrame(
        [(1, "a", "Brand#13", "PROMO", 1, 1.0),
         (2, "b", "Brand#13", "PROMO", 1, 1.0),
         (3, "c", "Brand#9", "PROMO", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    li = _li(spark, [
        (1, 1, 1, 1, 10.0, 11.0, 0.0, 0.0, "N", "O", ship),
        (2, 1, 1, 1, 10.0, 12.0, 0.0, 0.0, "N", "O", ship),
        (3, 1, 1, 1, 100.0, 13.0, 0.0, 0.0, "N", "O", ship),
        (4, 2, 1, 1, 1.0, 70.0, 0.0, 0.0, "N", "O", ship),
        (5, 2, 1, 1, 99.0, 14.0, 0.0, 0.0, "N", "O", ship),
        (6, 3, 1, 1, 0.5, 999.0, 0.0, 0.0, "N", "O", ship),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q17", {"lineitem": li, "part": part})
    rows = specs["small_quantity_revenue"].fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].n_lines == 1
    assert abs(rows[0].avg_yearly - 70.0 / 7.0) < 1e-9


# --- Q15 shape --------------------------------------------------------------


def test_top_supplier_keeps_every_max_tie(spark, specs, tmp_path_factory):
    # suppliers 1 and 2 tie at 100.0 revenue inside the quarter; supplier 3
    # leads OUTSIDE the quarter window and must not count
    inq = datetime(1997, 2, 1)
    outq = datetime(1997, 6, 1)
    sup = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    li = _li(spark, [
        (1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", inq),
        (2, 1, 2, 1, 1.0, 40.0, 0.0, 0.0, "N", "O", inq),
        (3, 1, 2, 1, 1.0, 60.0, 0.0, 0.0, "N", "O", inq),
        (4, 1, 3, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", outq),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q15", {"lineitem": li, "supplier": sup})
    rows = specs["top_supplier_revenue"].fn(spark, sf).collect()
    assert [(r.s_suppkey, r.total_revenue) for r in rows] == [(1, 100.0), (2, 100.0)]


# --- Q19 shape --------------------------------------------------------------


def test_disjunctive_brand_revenue_clause_isolation(spark, specs, tmp_path_factory):
    # one qualifying line per clause; one line matching Brand#1's part
    # predicate but the WRONG clause's quantity band must not count
    ship = datetime(1996, 1, 1)
    part = spark.createDataFrame(
        [(1, "a", "Brand#1", "T", 10, 1.0),
         (2, "b", "Brand#2", "T", 15, 1.0),
         (3, "c", "Brand#3", "T", 20, 1.0),
         (4, "d", "Brand#1", "T", 40, 1.0)],  # size out of every band
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    li = _li(spark, [
        (1, 1, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", ship),    # clause 1 ok
        (2, 1, 1, 1, 20.0, 100.0, 0.0, 0.0, "N", "O", ship),  # qty outside c1
        (3, 2, 1, 1, 15.0, 20.0, 0.5, 0.0, "N", "O", ship),   # clause 2 ok
        (4, 3, 1, 1, 30.0, 40.0, 0.0, 0.0, "N", "O", ship),   # clause 3 ok
        (5, 4, 1, 1, 5.0, 1000.0, 0.0, 0.0, "N", "O", ship),  # size excluded
    ])
    sf = _write_sf(spark, tmp_path_factory, "q19", {"lineitem": li, "part": part})
    rows = specs["disjunctive_brand_revenue"].fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].n_lines == 3
    assert abs(rows[0].revenue - (10.0 + 10.0 + 40.0)) < 1e-9


# --- Q21 shape --------------------------------------------------------------


def test_sole_return_supplier_chain(spark, specs, tmp_path_factory):
    # order 10 (F): s1 returned, s2 shipped clean -> s1 counts.
    # order 11 (F): s1 AND s2 both returned -> NOT EXISTS kills both.
    # order 12 (F): only s1 on the order -> EXISTS kills it.
    # order 13 (O): would qualify but is not finalized -> excluded.
    ship = datetime(1996, 1, 1)
    sup = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    li = _li(spark, [
        (10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "R", "F", ship),
        (10, 1, 2, 2, 1.0, 1.0, 0.0, 0.0, "N", "F", ship),
        (11, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "R", "F", ship),
        (11, 1, 2, 2, 1.0, 1.0, 0.0, 0.0, "R", "F", ship),
        (12, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "R", "F", ship),
        (13, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "R", "F", ship),
        (13, 1, 2, 2, 1.0, 1.0, 0.0, 0.0, "N", "F", ship),
    ])
    orders = _orders(spark, [
        (10, 1, "F", 0.0, ship, "1"),
        (11, 1, "F", 0.0, ship, "1"),
        (12, 1, "F", 0.0, ship, "1"),
        (13, 1, "O", 0.0, ship, "1"),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q21", {
        "lineitem": li, "orders": orders, "supplier": sup,
    })
    rows = specs["sole_return_supplier"].fn(spark, sf).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("s1", 1)]


# --- embedding drift --------------------------------------------------------


def test_embedding_drift_cohesion_bounds_and_separation(spark, specs, tmp_path_factory):
    # label 0: two identical vectors -> centroid == vector, cohesion 1.0.
    # label 1: two orthogonal-ish vectors -> cohesion = cos(v, (v1+v2)/2)
    # = 1/sqrt(2) for unit orthogonal pair.
    dim = 64
    a = [1.0] + [0.0] * (dim - 1)
    b = [0.0, 1.0] + [0.0] * (dim - 2)
    emb = spark.createDataFrame(
        [(0, a, 0), (1, a, 0), (2, a, 1), (3, b, 1)],
        "vec_id long, embedding array<float>, label long",
    )
    sf = _write_sf(spark, tmp_path_factory, "drift", {"embeddings": emb})
    out = {r.label: r for r in specs["embedding_drift_by_label"].fn(spark, sf).collect()}
    assert out[0].n_vecs == 2 and out[1].n_vecs == 2
    assert abs(out[0].avg_cohesion - 1.0) < 1e-6
    assert abs(out[1].avg_cohesion - 1.0 / math.sqrt(2.0)) < 1e-6
    # the scattered label must score strictly lower — the drift signal
    assert out[1].avg_cohesion < out[0].avg_cohesion - 0.2


def test_embedding_drift_runs_on_real_testdata(spark, specs):
    rows = specs["embedding_drift_by_label"].fn(spark, SF_SMALL).collect()
    assert len(rows) >= 2
    assert all(-1.0 <= r.avg_cohesion <= 1.0 for r in rows)
    assert all(r.n_vecs > 0 for r in rows)


# --- minhash band skew ------------------------------------------------------


def test_minhash_band_skew_counts_planted_duplicates(spark, specs, tmp_path_factory):
    # two exact-duplicate docs share EVERY band bucket; two unrelated docs
    # share none. Per band: >=1 multi bucket of size exactly 2, and the
    # candidate-pair count from the dup pair is exactly 1 per band.
    text_dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, text_dup, "en", "web", len(text_dup)),
            (1, text_dup, "en", "web", len(text_dup)),
            (2, "completely different content about spark partitions and shuffles here", "en", "web", 70),
            (3, "yet another unrelated string of words for the audit fixture case", "en", "web", 64),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "skew", {"documents": docs})
    rows = {r.band_idx: r for r in specs["minhash_band_skew"].fn(spark, sf).collect()}
    assert sorted(rows) == list(range(8))
    for r in rows.values():
        assert r.max_bucket == 2  # the dup pair, and nothing larger
        assert r.multi_buckets >= 1
        assert r.candidate_pairs >= 1
        assert r.docs_in_multi >= 2
        # buckets partition docs: 4 docs -> between 3 (dup merged) and 4
        assert 3 <= r.n_buckets + (r.docs_in_multi - r.multi_buckets) <= 4


def test_minhash_band_skew_conserves_docs_on_real_data(spark, specs):
    rows = specs["minhash_band_skew"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 8
    docs_with_grams = None
    for r in rows:
        # every doc lands in exactly one bucket per band, so per band:
        # singleton docs + docs in multi-buckets = corpus (with >=3-token
        # text); the total is identical across bands
        total = (r.n_buckets - r.multi_buckets) + r.docs_in_multi
        docs_with_grams = docs_with_grams or total
        assert total == docs_with_grams
        # candidate pairs must never be quadratic in the corpus here
        assert r.candidate_pairs <= r.docs_in_multi * 3


# --- Q4 shape ---------------------------------------------------------------


def test_order_priority_return_check_semi_semantics(spark, specs, tmp_path_factory):
    # order 1: two returned lines -> still counts ONCE (semi, not inner).
    # order 2: no returned line -> excluded. order 3: returned but outside
    # the quarter -> excluded.
    inq = datetime(1997, 2, 1)
    outq = datetime(1997, 6, 1)
    li = _li(spark, [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "R", "F", inq),
        (1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "R", "F", inq),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "F", inq),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "R", "F", outq),
    ])
    orders = _orders(spark, [
        (1, 1, "F", 0.0, inq, "1-URGENT"),
        (2, 1, "F", 0.0, inq, "1-URGENT"),
        (3, 1, "F", 0.0, outq, "2-HIGH"),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q4", {"lineitem": li, "orders": orders})
    rows = specs["order_priority_return_check"].fn(spark, sf).collect()
    assert [(r.o_orderpriority, r.order_count) for r in rows] == [("1-URGENT", 1)]


def test_sole_return_agg_twin_equals_chain_form(spark, specs):
    """The aggregate form must return byte-identical rows to the
    EXISTS/NOT-EXISTS chain form on real testdata — same oracle SQL
    registers both, so this is the local replica of that equivalence."""
    key = lambda r: (r.s_name, r.numwait)
    a = sorted(map(key, specs["sole_return_supplier"].fn(spark, SF_SMALL).collect()))
    b = sorted(map(key, specs["sole_return_supplier_agg"].fn(spark, SF_SMALL).collect()))
    assert a == b and a


# --- chunking ---------------------------------------------------------------


def test_chunk_documents_overlap_and_tail(spark, specs, tmp_path_factory):
    # 80 tokens, window 32 / stride 24 -> starts 0,24,48,72 with
    # n_tokens 32,32,32,8; consecutive chunks share exactly 8 tokens
    toks = [f"w{i}" for i in range(80)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks), "en", "web", 80)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "chunks", {"documents": docs})
    rows = sorted(
        specs["chunk_documents"].fn(spark, sf).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in rows] == [
        (0, 0, 32), (1, 24, 32), (2, 48, 32), (3, 72, 8),
    ]
    c0, c1 = rows[0].chunk_text.split(" "), rows[1].chunk_text.split(" ")
    assert c0[24:] == c1[:8]  # the 8-token overlap
    assert c0 == toks[:32] and rows[3].chunk_text.split(" ") == toks[72:]


def test_chunk_documents_covers_every_token(spark, specs):
    # conservation on real testdata: distinct (doc, token position)
    # coverage equals total token count, and chunking is map-side only
    out = specs["chunk_documents"].fn(spark, SF_SMALL)
    covered = (
        out.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start_tok"), F.col("start_tok") + F.col("n_tokens") - 1)
            ).alias("pos"),
        )
        .distinct()
        .count()
    )
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    total = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert covered == total


# --- Q2 shape ---------------------------------------------------------------


def _geo(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "FRANCE", 0), (1, "CHINA", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    return region, nation


def test_min_cost_supplier_ties_and_region_exclusion(
    spark, specs, tmp_path_factory
):
    # part 1 (PROMO): s1 lines at unit 10 and 30, s2 at unit 10 -> s1/s2
    # tie at the min and BOTH must survive; s3 offers unit 1 but sits in
    # ASIA so it must not define (or win) the minimum. part 2 is not
    # PROMO and must vanish entirely.
    region, nation = _geo(spark)
    sup = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "a", "B", "PROMO", 1, 1.0), (2, "b", "B", "LARGE", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    ship = datetime(1996, 1, 1)
    li = _li(spark, [
        (1, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", ship),  # s1 unit 10
        (2, 1, 1, 1, 2.0, 60.0, 0.0, 0.0, "N", "O", ship),    # s1 unit 30
        (3, 1, 2, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", ship),    # s2 unit 10
        (4, 1, 3, 1, 10.0, 10.0, 0.0, 0.0, "N", "O", ship),   # s3 unit 1 (ASIA)
        (5, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),     # non-PROMO part
    ])
    sf = _write_sf(spark, tmp_path_factory, "q2", {
        "region": region, "nation": nation, "supplier": sup,
        "part": part, "lineitem": li,
    })
    rows = sorted(
        specs["min_cost_supplier"].fn(spark, sf).collect(),
        key=lambda r: r.s_name,
    )
    assert [(r.p_partkey, r.s_name, r.n_name, r.unit_cost) for r in rows] == [
        (1, "s1", "FRANCE", 10.0), (1, "s2", "FRANCE", 10.0),
    ]


# --- Q11 shape --------------------------------------------------------------


def test_important_nation_value_share_threshold(spark, specs, tmp_path_factory):
    # nation A carries 96% of total value, nation B 4%: only A clears the
    # 4.75% bar, and its reported value must be the exact decimal sum.
    region, nation = _geo(spark)
    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    sup = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    ship = datetime(1996, 1, 1)
    li = _li(spark, [
        (1, 1, 1, 1, 1.0, 96.0, 0.0, 0.0, "N", "O", ship),
        (2, 1, 2, 1, 1.0, 4.0, 0.0, 0.0, "N", "O", ship),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q11", {
        "nation": nation, "supplier": sup, "lineitem": li,
    })
    rows = specs["important_nation_value"].fn(spark, sf).collect()
    assert [(r.n_name, r.nation_value) for r in rows] == [("A", 96.0)]


# --- Q16 shape --------------------------------------------------------------


def test_supplier_part_variety_denylist_and_boundary(
    spark, specs, tmp_path_factory
):
    # supplier 2 (acctbal 1000) is denylisted; supplier 3 sits EXACTLY at
    # the 1800 boundary and must survive (< is strict). Brand#1's part
    # disappears entirely. Distinct count must not double-count s1's two
    # lines.
    sup = spark.createDataFrame(
        [(1, "s1", 0, 2000.0), (2, "s2", 0, 1000.0), (3, "s3", 0, 1800.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "a", "Brand#2", "T", 1, 1.0), (2, "b", "Brand#1", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    ship = datetime(1996, 1, 1)
    li = _li(spark, [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),  # s1 again
        (3, 1, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),  # denylisted
        (4, 1, 3, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),  # boundary: kept
        (5, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),  # Brand#1: gone
    ])
    sf = _write_sf(spark, tmp_path_factory, "q16", {
        "supplier": sup, "part": part, "lineitem": li,
    })
    rows = specs["supplier_part_variety"].fn(spark, sf).collect()
    assert [(r.p_brand, r.p_type, r.supplier_cnt, r.n_lines) for r in rows] == [
        ("Brand#2", "T", 2, 3)
    ]


# --- Q20 shape --------------------------------------------------------------


def test_excess_shipment_suppliers_dominance_boundary(
    spark, specs, tmp_path_factory
):
    # part 1 ('large bolt', 1996 total 10): s1 ships 9 (90% -> passes),
    # s2 ships 1 (fails). part 2 ('small bolt'): s3 dominates but the
    # name filter excludes the part. part 3 ('large rod', total 10): s5
    # ships EXACTLY 8 -> 8*5 > 10*4 is false, the 80% boundary is strict.
    # s4's 1997 shipment of part 1 sits outside the date window.
    sup = spark.createDataFrame(
        [(i, f"s{i}", 0, 0.0) for i in range(1, 6)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "large bolt", "B", "T", 1, 1.0),
         (2, "small bolt", "B", "T", 1, 1.0),
         (3, "large rod", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    in96 = datetime(1996, 6, 1)
    in97 = datetime(1997, 6, 1)
    li = _li(spark, [
        (1, 1, 1, 1, 9.0, 1.0, 0.0, 0.0, "N", "O", in96),
        (2, 1, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", in96),
        (3, 2, 3, 1, 100.0, 1.0, 0.0, 0.0, "N", "O", in96),
        (4, 3, 5, 1, 8.0, 1.0, 0.0, 0.0, "N", "O", in96),
        (5, 3, 4, 1, 2.0, 1.0, 0.0, 0.0, "N", "O", in96),
        (6, 1, 4, 1, 100.0, 1.0, 0.0, 0.0, "N", "O", in97),  # outside window
    ])
    sf = _write_sf(spark, tmp_path_factory, "q20", {
        "supplier": sup, "part": part, "lineitem": li,
    })
    rows = specs["excess_shipment_suppliers"].fn(spark, sf).collect()
    assert [(r.s_suppkey, r.s_name) for r in rows] == [(1, "s1")]


# --- MinHash calibration ------------------------------------------------------


def test_minhash_jaccard_calibration_planted_exact_dup(
    spark, specs, tmp_path_factory
):
    # docs 1 and 2 are identical -> every band collides, all 32
    # permutations agree, exact Jaccard is 1; doc 3 shares no gram, so no
    # candidate pair involves it. The calibration table must be the single
    # perfectly-calibrated bucket.
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", "en", "s", 30),
         (2, "alpha beta gamma delta epsilon", "en", "s", 30),
         (3, "one two three four five six", "en", "s", 27)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "mhcal", {"documents": docs})
    rows = specs["minhash_jaccard_calibration"].fn(spark, sf).collect()
    # 5 tokens -> 3 distinct trigram shingles per doc
    assert [
        (r.agree_cnt, r.est_jaccard, r.n_pairs, r.sum_inter, r.sum_union,
         r.micro_jaccard)
        for r in rows
    ] == [(32, 1.0, 1, 3, 3, 1.0)]


def test_minhash_calibration_invariants_on_real_data(spark, specs):
    rows = specs["minhash_jaccard_calibration"].fn(spark, SF_SMALL).collect()
    assert rows, "no candidate pairs at sf0.001 — zero-signal calibration"
    for r in rows:
        assert 4 <= r.agree_cnt <= 32  # candidates share >= one 4-row band
        assert r.sum_inter <= r.sum_union
        assert 0.0 < r.micro_jaccard <= 1.0
        assert abs(r.est_jaccard - r.agree_cnt / 32.0) < 1e-12


# --- k-anonymity profile -----------------------------------------------------


def test_k_anonymity_profile_planted_histogram(spark, specs, tmp_path_factory):
    # QI = (segment, nation, floor(acctbal/2000)): customers 1-3 share one
    # QI tuple (sizes 3), customers 4-5 share another (size 2), customer 6
    # is unique — and 7 differs from 6 ONLY by crossing the 2000 balance
    # band (1999.99 vs 2000.0), so banding must separate them.
    cust = spark.createDataFrame(
        [(1, "a", 0, 100.0, "AUTO"), (2, "b", 0, 150.0, "AUTO"),
         (3, "c", 0, 1999.99, "AUTO"), (4, "d", 1, 2500.0, "AUTO"),
         (5, "e", 1, 3999.0, "AUTO"), (6, "f", 2, 2000.0, "HOUSE"),
         (7, "g", 2, 1999.99, "HOUSE")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    sf = _write_sf(spark, tmp_path_factory, "kanon", {"customer": cust})
    rows = sorted(
        specs["k_anonymity_profile"].fn(spark, sf).collect(),
        key=lambda r: r.group_size,
    )
    assert [(r.group_size, r.n_groups, r.n_individuals) for r in rows] == [
        (1, 2, 2), (2, 1, 2), (3, 1, 3),
    ]


# --- Q6 + Q12 shapes --------------------------------------------------------


def test_forecast_revenue_change_planted(spark, specs, tmp_path_factory):
    # Only line 1 passes all three predicates (1996 ship year, discount
    # 0.05-0.07 band, qty < 24): revenue = 1000 * 0.06 = 60. Line 2 fails
    # the discount band (0.04), line 3 the quantity cap (24 is NOT < 24),
    # line 4 the ship year, line 5 the band's upper edge (0.08).
    def l(ok, qty, price, disc, year):
        return (ok, 1, 1, 1, qty, price, disc, 0.0, "N", "O",
                datetime(year, 6, 15))

    li = _li(spark, [
        l(1, 10.0, 1000.0, 0.06, 1996),
        l(2, 10.0, 1000.0, 0.04, 1996),
        l(3, 24.0, 1000.0, 0.06, 1996),
        l(4, 10.0, 1000.0, 0.06, 1997),
        l(5, 10.0, 1000.0, 0.08, 1996),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q6", {"lineitem": li})
    rows = specs["forecast_revenue_change"].fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].n_lines == 1
    assert abs(rows[0].revenue - 60.0) < 1e-9


def test_shipping_class_priority_planted(spark, specs, tmp_path_factory):
    # Class A: one URGENT line + one LOW line -> (1, 1). Class R: two
    # lines of one HIGH order -> (2, 0) (line grain, not order grain).
    # Class N excluded by the IN-list; the 1997 'A' line by the date
    # range — either leaking would disturb class A's counts.
    def l(ok, flag, year):
        return (ok, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, flag, "O",
                datetime(year, 3, 1))

    li = _li(spark, [
        l(1, "A", 1998), l(2, "A", 1998), l(3, "R", 1998),
        l(3, "R", 1998), l(1, "N", 1998), l(1, "A", 1997),
    ])
    orders = _orders(spark, [
        (1, 1, "O", 0.0, datetime(1998, 1, 1), "1-URGENT"),
        (2, 1, "O", 0.0, datetime(1998, 1, 1), "5-LOW"),
        (3, 1, "O", 0.0, datetime(1998, 1, 1), "2-HIGH"),
    ])
    sf = _write_sf(
        spark, tmp_path_factory, "q12", {"lineitem": li, "orders": orders}
    )
    rows = sorted(
        specs["shipping_class_priority"].fn(spark, sf).collect(),
        key=lambda r: r.ship_class,
    )
    assert [(r.ship_class, r.high_line_count, r.low_line_count)
            for r in rows] == [("A", 1, 1), ("R", 2, 0)]


def test_l_diversity_profile_planted_homogeneity(spark, specs, tmp_path_factory):
    # QI group 1 = customers 1-2: orders carry ONLY 'URGENT' -> l=1 (the
    # homogeneity leak the audit exists to surface). QI group 2 =
    # customers 3-4: priorities {URGENT, LOW} -> l=2. Customer 5 has no
    # orders and must drop out entirely; repeated same-priority orders
    # (customer 1 has two URGENT) must not inflate l or n_individuals.
    cust = spark.createDataFrame(
        [(1, "a", 0, 100.0, "AUTO"), (2, "b", 0, 150.0, "AUTO"),
         (3, "c", 1, 100.0, "AUTO"), (4, "d", 1, 150.0, "AUTO"),
         (5, "e", 2, 100.0, "HOUSE")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 1, "1-URGENT"), (12, 2, "1-URGENT"),
         (13, 3, "1-URGENT"), (14, 4, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    sf = _write_sf(
        spark, tmp_path_factory, "ldiv", {"customer": cust, "orders": orders}
    )
    rows = sorted(
        specs["l_diversity_profile"].fn(spark, sf).collect(),
        key=lambda r: r.l_diversity,
    )
    assert [(r.l_diversity, r.n_groups, r.n_individuals) for r in rows] == [
        (1, 1, 2), (2, 1, 2),
    ]


# --- bloom runtime-filter prune --------------------------------------------


def _bloom_fixture(spark, tmp_path_factory):
    dt = datetime(2024, 3, 1)
    orders = _orders(
        spark,
        [
            (k, 100 + k, "O", 1000.0, dt,
             "1-URGENT" if k % 3 == 0 else "5-LOW")
            for k in range(1, 13)
        ],
    )
    li = _li(
        spark,
        [
            (k, 1, 1, j, 5.0, 100.0 * k, 0.1, 0.0, "A" if j == 1 else "R",
             "O", dt)
            for k in range(1, 13)
            for j in (1, 2)
        ],
    )
    return _write_sf(spark, tmp_path_factory, "bloomfx", {
        "orders": orders, "lineitem": li,
    })


def test_bloom_prefilter_join_matches_plain_join(spark, specs, tmp_path_factory):
    """The registered bloom-pruned plan must equal the plain exact join —
    false positives are invisible (killed by the downstream join), false
    negatives would LOSE rows and are the failure this test plants for."""
    sf = _bloom_fixture(spark, tmp_path_factory)
    got = {
        r["l_returnflag"]: (r["n_lines"], r["revenue"])
        for r in specs["bloom_prefilter_join"].fn(spark, sf).collect()
    }
    # urgent orderkeys are 3,6,9,12 → 4 orders × 1 line per flag;
    # revenue = sum(100k * 0.9) over k in {3,6,9,12} = 2700.0 per flag
    assert got == {"A": (4, 2700.0), "R": (4, 2700.0)}


def test_bloom_prune_no_false_negatives_and_bites(spark, specs, tmp_path_factory):
    from funnel_report_etl_pipeline__spark.plans.pipeline_r8 import (
        bloom_mask,
        bloom_member_cond,
    )

    sf = _bloom_fixture(spark, tmp_path_factory)
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    mask = bloom_mask(urgent, "o_orderkey")
    kept = {
        r["l_orderkey"]
        for r in li.crossJoin(F.broadcast(mask))
        .filter(bloom_member_cond("l_orderkey"))
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    truth = {r["o_orderkey"] for r in urgent.collect()}
    assert truth <= kept, "bloom dropped a genuinely matching key"
    # at 4 keys against a 2^20-bit mask the FP odds are ~(12/2^20*3)^3 per
    # probe set — the prune must visibly bite on the 12-key fact
    assert len(kept) < 12


def test_bloom_mask_size_is_m_bounded_not_key_bounded(spark):
    from funnel_report_etl_pipeline__spark.plans.pipeline_r8 import (
        BLOOM_M,
        bloom_mask,
    )

    keys = spark.range(0, 5000).withColumnRenamed("id", "k")
    row = bloom_mask(keys, "k").collect()[0]
    assert len(row["__mask"]) == BLOOM_M // 64  # 16384 words, 128 KiB


# --- weighted reservoir (priority) sampling --------------------------------


def test_weighted_reservoir_sample_matches_python_priorities(
    spark, specs, tmp_path_factory
):
    """Priority = md5_52bit(doc_id)/len(text) must reproduce the Python
    float computation exactly (52-bit u is an exact double; one IEEE
    division) — and the plan must stay a TakeOrderedAndProject, not a
    global sort or corpus-grain window."""
    import hashlib

    texts = {i: "x" * (10 * i + 3) for i in range(1, 11)}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    sf = _write_sf(spark, tmp_path_factory, "wrsfx", {"documents": docs})
    rows = specs["weighted_reservoir_sample"].fn(spark, sf).collect()

    def prio(i):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        return u / len(texts[i])

    expect = sorted(texts, key=lambda i: (prio(i), i))
    assert [r["doc_id"] for r in rows] == expect
    assert [r["rnk"] for r in rows] == list(range(1, 11))
    assert all(r["priority"] == prio(r["doc_id"]) for r in rows)
    assert all(r["weight"] == len(texts[r["doc_id"]]) for r in rows)

    plan = (
        specs["weighted_reservoir_sample"]
        .fn(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# --- round-8 extension batch ------------------------------------------------


def test_t_closeness_planted_bands(spark, specs, tmp_path_factory):
    # Three QI groups (nation 0/1/2, same segment + balance band), two
    # priorities. Global mix: 7 URGENT, 5 HIGH (q = 7/12, 5/12).
    #   G1 sees 4xURGENT only        -> t = 5/12  (~0.4167, band 8)
    #      (exercises the absent-value mass path: HIGH never occurs in G1)
    #   G2 sees 2xURGENT + 2xHIGH    -> t = 1/12  (~0.0833, band 1)
    #   G3 sees 1xURGENT + 3xHIGH    -> t = 1/3   (~0.3333, band 6)
    cust = spark.createDataFrame(
        [(k, f"c{k}", (k - 1) // 2, 100.0, "AUTO") for k in range(1, 7)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    d = datetime(2024, 1, 1)
    rows, ok = [], 0

    def o(cust_key, prio):
        nonlocal ok
        ok += 1
        return (ok, cust_key, "F", 10.0, d, prio)

    U, H = "1-URGENT", "2-HIGH"
    for prio in (U, U):
        rows += [o(1, prio), o(2, prio)]          # G1: 4x URGENT
    rows += [o(3, U), o(4, U), o(3, H), o(4, H)]  # G2: 2 + 2
    rows += [o(5, U), o(5, H), o(6, H), o(6, H)]  # G3: 1 + 3
    orders = _orders(spark, rows)
    sf = _write_sf(spark, tmp_path_factory, "tclose",
                   {"customer": cust, "orders": orders})
    got = sorted(
        specs["t_closeness_profile"].fn(spark, sf).collect(),
        key=lambda r: r.t_band,
    )
    assert [(r.t_band, r.n_groups, r.n_individuals) for r in got] == [
        (1, 1, 2), (6, 1, 2), (8, 1, 2),
    ]


def test_cms_calibration_exact_when_sparse(spark, specs, tmp_path_factory):
    # 5 probe keys in an 8192-bucket sketch: no shared buckets, so the
    # min-over-rows estimate must equal the exact count (overcount 0) —
    # the sketch's est >= exact guarantee collapses to equality.
    d = datetime(2024, 1, 1)
    rows = []
    for pk in range(5):
        for i in range(pk + 1):  # partkey k occurs k+1 times
            rows.append((100 * pk + i, pk, 1, 1, 1.0, 10.0, 0.0, 0.0,
                         "N", "O", d))
    li = _li(spark, rows)
    sf = _write_sf(spark, tmp_path_factory, "cms", {"lineitem": li})
    got = specs["cms_frequency_calibration"].fn(spark, sf).collect()
    assert [(r.probe_key, r.exact_count, r.est_count, r.overcount)
            for r in got] == [(pk, pk + 1, pk + 1, 0) for pk in range(5)]


def test_cms_calibration_overcount_nonnegative_on_real_data(spark, specs):
    # the one-sided error guarantee: a count-min estimate NEVER undercounts
    got = specs["cms_frequency_calibration"].fn(spark, SF_SMALL).collect()
    assert len(got) == 20
    assert all(r.overcount >= 0 for r in got)
    assert all(r.est_count >= r.exact_count for r in got)


def test_conversion_lift_ztest_planted(spark, specs, tmp_path_factory):
    # 4 weekend events (1 purchase) vs 4 weekday events (2 purchases):
    # rates 0.25 / 0.5, pooled 3/8 — z follows the same expression tree
    # the query builds, so the comparison is essentially exact.
    sat, mon = datetime(2024, 1, 6), datetime(2024, 1, 8)
    rows = [
        (1, sat, 1, "purchase", 1.0, ""), (2, sat, 1, "view", 1.0, ""),
        (3, sat, 2, "view", 1.0, ""), (4, sat, 2, "click", 1.0, ""),
        (5, mon, 3, "purchase", 1.0, ""), (6, mon, 3, "purchase", 1.0, ""),
        (7, mon, 4, "view", 1.0, ""), (8, mon, 4, "click", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = _write_sf(spark, tmp_path_factory, "ztest", {"events": ev})
    r = specs["conversion_lift_ztest"].fn(spark, sf).collect()[0]
    assert (r.n_weekend, r.x_weekend, r.n_weekday, r.x_weekday) == (4, 1, 4, 2)
    assert abs(r.rate_weekend - 0.25) < 1e-15
    assert abs(r.rate_weekday - 0.5) < 1e-15
    pooled = 3.0 / 8.0
    z = (0.25 - 0.5) / math.sqrt(
        (pooled * (1.0 - pooled)) * ((1.0 / 4.0) + (1.0 / 4.0))
    )
    assert abs(r.z_score - z) < 1e-12
    assert r.z_score < 0  # weekends convert WORSE in the planted data


def test_zipf_slope_two_point_power_law(spark, specs, tmp_path_factory):
    # two token types with freqs 8 and 2 at ranks 1 and 2: the OLS line
    # through two points is exact — slope = (ln2 - ln8) / (ln2 - ln1) = -2,
    # intercept = ln(freq at rank 1) = ln 8 (micro-rounding costs < 1e-4).
    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 8 + ["b"] * 2), "en", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "zipf", {"documents": docs})
    r = specs["zipf_token_slope"].fn(spark, sf).collect()[0]
    assert r.n_terms == 2
    assert abs(r.zipf_slope - (-2.0)) < 1e-4
    assert abs(r.intercept_ln - math.log(8.0)) < 1e-4


def test_zipf_slope_near_uniform_vocab_on_real_data(spark, specs):
    # the synthetic corpus draws 31 near-uniform token types: the fitted
    # slope must sit just below zero (a real corpus lands near -1)
    r = specs["zipf_token_slope"].fn(spark, SF_SMALL).collect()[0]
    assert r.n_terms == 31
    assert -0.5 < r.zipf_slope < 0.0


def test_jaccard_prefix_filter_planted_pairs(spark, specs, tmp_path_factory):
    # doc1 = 12 distinct tokens (10 distinct 3-grams); doc2 differs only in
    # the last token (shares 9/10 grams -> J = 9/11 ~ 0.818 >= 0.8);
    # doc4 is an exact copy of doc1 (J = 1.0 with both); doc3 is unrelated.
    # A 10-token variant (doc5, shares 7/8 with nothing) stays below: its
    # best jaccard vs doc1 is 8/(10+8-8) = 0.8 only if all grams shared.
    toks = [f"t{i}" for i in range(12)]
    d1 = " ".join(toks)
    d2 = " ".join(toks[:11] + ["ZZ"])
    d3 = " ".join(f"u{i}" for i in range(12))
    d4 = d1
    docs = spark.createDataFrame(
        [(1, d1, "en", "s0", 1), (2, d2, "en", "s0", 1),
         (3, d3, "en", "s0", 1), (4, d4, "en", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "ppjoin", {"documents": docs})
    got = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in specs["jaccard_prefix_filter_pairs"].fn(spark, sf).collect()
    )
    assert got == [
        (1, 2, round(9 / 11, 6)), (1, 4, 1.0), (2, 4, round(9 / 11, 6)),
    ]


def test_jaccard_prefix_filter_equals_exact_twin(spark, specs):
    # the prefix filter must be LOSSLESS: identical result set (same
    # expression tree -> bit-identical jaccard doubles) as the full
    # inverted-index join on real testdata
    exact = sorted(
        map(tuple, specs["ngram_jaccard_pairs"].fn(spark, SF_SMALL).collect())
    )
    pref = sorted(
        map(tuple,
            specs["jaccard_prefix_filter_pairs"].fn(spark, SF_SMALL).collect())
    )
    assert pref == exact
    assert len(exact) > 0  # non-trivial: the fixture has near-dup pairs


def test_degree_assortativity_star_is_minus_one(spark, specs, tmp_path_factory):
    # co-order edges (1,2),(1,3),(1,4) — a perfect star: every edge joins
    # the hub (degree 3) to a leaf (degree 1), the textbook r = -1 graph.
    d = datetime(2024, 1, 1)
    rows = []
    for ok, parts in [(1, (1, 2)), (2, (1, 3)), (3, (1, 4))]:
        for i, pk in enumerate(parts):
            rows.append((ok, pk, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O", d))
    li = _li(spark, rows)
    sf = _write_sf(spark, tmp_path_factory, "assort", {"lineitem": li})
    r = specs["degree_assortativity"].fn(spark, sf).collect()[0]
    assert (r.n_edges, r.n_nodes) == (3, 4)
    assert abs(r.assortativity - (-1.0)) < 1e-15


def test_weighted_sample_per_source_rank_order(spark, specs, tmp_path_factory):
    # two sources, three docs each with distinct lengths: ranks must follow
    # priority = md5_52bit(doc_id) / len(text) independently per source
    import hashlib

    texts = {1: "x" * 10, 2: "y" * 200, 3: "z" * 50,
             4: "p" * 25, 5: "q" * 100, 6: "r" * 400}
    docs = spark.createDataFrame(
        [(k, t, "en", "sA" if k <= 3 else "sB", len(t))
         for k, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "wsps", {"documents": docs})
    got = specs["weighted_sample_per_source"].fn(spark, sf).collect()

    def prio(k):
        u = int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
        return u / len(texts[k])

    for src, members in (("sA", [1, 2, 3]), ("sB", [4, 5, 6])):
        want = sorted(members, key=lambda k: (prio(k), k))
        rows = sorted((r for r in got if r.source == src), key=lambda r: r.rnk)
        assert [r.doc_id for r in rows] == want
        assert [r.rnk for r in rows] == [1, 2, 3]
        for r in rows:
            assert abs(r.priority - prio(r.doc_id)) < 1e-9


def test_weighted_sample_per_source_constant_frame(spark, specs):
    # every source contributes exactly 8 rows at gate scale
    got = specs["weighted_sample_per_source"].fn(spark, SF_SMALL).collect()
    from collections import Counter
    per = Counter(r.source for r in got)
    assert len(per) == 20 and set(per.values()) == {8}


def test_bpe_merges_on_textbook_corpus(spark, specs, tmp_path_factory):
    # Sennrich's classic: "low low lower lowest". Pair counts round 1:
    # (l,o)=4, (o,w)=4, (w,e)=2, rest 1 — tie broken lexicographically
    # to (l,o). Then (l~o,w)=4, (l~o~w,e)=2, and the final round's
    # all-count-1 tie resolves to (l~o~w~e, r).
    docs = spark.createDataFrame(
        [(1, "low low lower lowest", "en", "s0", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "bpe", {"documents": docs})
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
           for r in specs["bpe_merge_induction"].fn(spark, sf).collect()]
    assert got == [
        (1, "l", "o", 4),
        (2, "l~o", "w", 4),
        (3, "l~o~w", "e", 2),
        (4, "l~o~w~e", "r", 1),
    ]


def test_bpe_chain_run_merges_pairwise_and_stops(spark, specs, tmp_path_factory):
    # "aaaa" -> stream "a a a a": round 1 merges BOTH disjoint pairs (the
    # doubled replace catches the second one) with count 3; round 2 merges
    # the two "a~a" symbols; then no pairs remain and the loop stops early
    # with 2 rows — matching the oracle's empty-CTE degradation.
    docs = spark.createDataFrame(
        [(1, "aaaa", "en", "s0", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "bpechain", {"documents": docs})
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
           for r in specs["bpe_merge_induction"].fn(spark, sf).collect()]
    assert got == [(1, "a", "a", 3), (2, "a~a", "a~a", 1)]


def test_k_core_peel_cascades_on_planted_graph(spark, tmp_path_factory):
    # Triangle {1,2,3} plus a tail 3-4-5 (orders are co-order cliques:
    # 100={1,2,3}, 101={3,4}, 102={4,5}). At k=2 the peel must CASCADE:
    # round 1 drops 5 (deg 1), which lowers 4 to deg 1, so round 2 drops
    # 4; the triangle survives at degree 2 each. A single degree filter
    # would wrongly keep node 4.
    from funnel_report_etl_pipeline__spark.plans.pipeline_r8 import _k_core_peel
    ship = datetime(1996, 1, 1)
    li = _li(spark, [
        (100, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (100, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (100, 3, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (101, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (101, 4, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (102, 4, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (102, 5, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
    ])
    sf = _write_sf(spark, tmp_path_factory, "kcore", {"lineitem": li})
    got = sorted(
        (r.part_id, r.core_degree)
        for r in _k_core_peel(spark, sf, k=2, rounds=8).collect()
    )
    assert got == [(1, 2), (2, 2), (3, 2)]
    # k=3 peels everything (no node has 3 neighbours after the cascade)
    assert _k_core_peel(spark, sf, k=3, rounds=8).count() == 0


def test_k_core_registered_fixpoint_reached(spark, specs):
    # The registered query's early exit fires only when a round is an
    # identity; pinning that one EXTRA round changes nothing at sf0.001
    # proves the gate-scale output is the true fixpoint, not a
    # truncated partial peel.
    from funnel_report_etl_pipeline__spark.plans import pipeline_r8 as r8
    sf = "/root/testdata/sf0.001"
    base = {(r.part_id, r.core_degree)
            for r in r8._k_core_peel(spark, sf, r8.KCORE_K, r8.KCORE_ROUNDS).collect()}
    extra = {(r.part_id, r.core_degree)
             for r in r8._k_core_peel(spark, sf, r8.KCORE_K, r8.KCORE_ROUNDS + 1).collect()}
    assert base == extra


def test_bpe_token_stats_on_textbook_corpus(spark, specs, tmp_path_factory):
    # Same Sennrich corpus as the merge-table test. After the 4 merges
    # (l+o, l~o+w, l~o~w+e, l~o~w~e+r): "low" -> 1 token (x2 freq),
    # "lower" -> 1, "lowest" -> 3 ("l~o~w~e s t"), so total_tokens = 6
    # over total_chars 3+3+5+6 = 17; the surviving symbol vocabulary is
    # {l~o~w, l~o~w~e~r, l~o~w~e, s, t} = 5.
    docs = spark.createDataFrame(
        [(1, "low low lower lowest", "en", "s0", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _write_sf(spark, tmp_path_factory, "bpestats", {"documents": docs})
    r = specs["bpe_token_stats"].fn(spark, sf).collect()[0]
    assert (r.total_words, r.total_chars, r.total_tokens, r.vocab_size) == (
        4, 17, 6, 5,
    )
    assert r.chars_per_token == 17 / 6
