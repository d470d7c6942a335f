"""Round-7 operators: planted-fixture behavior tests (oracle parity is
covered by driver_sim / CORRECTNESS; these pin the semantics on inputs
where the right answer is computable by hand)."""

from __future__ import annotations

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


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_rfm_approx_quartiles_planted(spark, specs, tmp_path_factory):
    # 8 users, one purchase each, monetary 10..80 (untied): the discrete
    # quartile thresholds are 20/40/60 ("smallest value with CDF >= p"),
    # so buckets split 2/2/2/2 by construction. Frequency is all-tied at
    # 1 -> every user lands in f_quartile 1 (value-based buckets put ties
    # together; NTILE would split them — the documented difference).
    rows = [
        (i, datetime(2024, 1, 1 + i, 12, 0), i, "purchase", 10.0 * (i + 1))
        for i in range(8)
    ]
    sf = _write_sf(spark, tmp_path_factory, "rfm", {"events": _ev(spark, rows)})
    out = {r.user_id: r for r in specs["user_rfm_segments_approx"].fn(spark, sf).collect()}
    assert len(out) == 8
    assert [out[i].m_quartile for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # recency rises with user_id here, so r mirrors m
    assert [out[i].r_quartile for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    assert all(out[i].f_quartile == 1 for i in range(8))
    assert out[3].monetary == 40.0 and out[3].frequency == 1


def test_bm25_topk_equals_exact_window_variant(spark, specs):
    """The TakeOrdered variant must return byte-identical rankings to the
    window-rank variant on real testdata — same scoring frame, same
    (score DESC, doc_id) total order, different physical plan."""
    a = specs["bm25_search"].fn(spark, SF_SMALL).collect()
    b = specs["bm25_search_topk"].fn(spark, SF_SMALL).collect()
    key = lambda r: (r.rnk, r.doc_id, r.dl, r.score)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert len(b) == 20


def _dims(spark):
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0), (3, "NATION_3", 1), (5, "NATION_5", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(0, "AFRICA"), (1, "AMERICA")], "r_regionkey long, r_name string"
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 3, 0.0), (2, "s2", 5, 0.0), (3, "s3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    customer = spark.createDataFrame(
        [(1, "c1", 3, 0.0, "BUILDING"), (2, "c2", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    part = spark.createDataFrame(
        [(1, "red widget", "B", "PROMO", 1, 100.0),
         (2, "blue bolt", "B", "LARGE", 1, 50.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    return nation, region, supplier, customer, part


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


def test_nation_market_share_planted(spark, specs, tmp_path_factory):
    # AMERICA customer (cust 1); two PROMO lineitems in 1995: NATION_3
    # supplier sells 100, NATION_5 supplier sells 300 -> share 0.25.
    # A non-PROMO line and an AFRICA-customer order must not count.
    nation, region, supplier, customer, part = _dims(spark)
    ship = datetime(1995, 6, 1)
    li = _li(spark, [
        (10, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ship),
        (10, 1, 2, 2, 1.0, 300.0, 0.0, 0.0, "N", "O", ship),
        (10, 2, 1, 3, 1.0, 999.0, 0.0, 0.0, "N", "O", ship),  # not PROMO
        (11, 1, 1, 1, 1.0, 500.0, 0.0, 0.0, "N", "O", ship),  # AFRICA cust
    ])
    orders = _orders(spark, [
        (10, 1, "O", 0.0, datetime(1995, 3, 1), "1-URGENT"),
        (11, 2, "O", 0.0, datetime(1995, 4, 1), "1-URGENT"),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q8", {
        "lineitem": li, "orders": orders, "part": part, "customer": customer,
        "nation": nation, "region": region, "supplier": supplier,
    })
    rows = specs["nation_market_share"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.o_year == 1995
    assert abs(r.mkt_share - 0.25) < 1e-12
    assert r.total_volume == 400.0


def test_product_type_profit_planted(spark, specs, tmp_path_factory):
    # one 'red' part: profit = 200*(1-0.1) - 100*2*0.1 = 160.0; the
    # non-matching part name contributes nothing
    nation, region, supplier, customer, part = _dims(spark)
    ship = datetime(1995, 6, 1)
    li = _li(spark, [
        (10, 1, 1, 1, 2.0, 200.0, 0.1, 0.0, "N", "O", ship),
        (10, 2, 1, 2, 1.0, 999.0, 0.0, 0.0, "N", "O", ship),  # name mismatch
    ])
    orders = _orders(spark, [(10, 1, "O", 0.0, datetime(1995, 3, 1), "1-URGENT")])
    sf = _write_sf(spark, tmp_path_factory, "q9", {
        "lineitem": li, "orders": orders, "part": part,
        "nation": nation, "supplier": supplier,
    })
    rows = specs["product_type_profit"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.supp_nation == "NATION_3" and r.o_year == 1995
    assert abs(r.profit - 160.0) < 1e-9


def test_rfm_approx_matches_independent_threshold_bucketing(spark, specs):
    """The approx variant's contract is value-threshold bucketing at the
    DISCRETE quantiles — verify it against an independent Python
    computation of those thresholds on real testdata. (The earlier
    version compared against the NTILE variant on untied metrics, but
    NTILE rank-split and threshold bucketing legitimately diverge at
    quartile-boundary ranks whenever n ≡ 2 (mod 4) — NTILE's bucket 2
    ends at rank n/2+1 while the ceil(0.5·n) threshold cutoff is n/2 —
    so that assertion only held by luck of the fixture's user count.)"""
    import math

    rows = specs["user_rfm_segments_approx"].fn(spark, SF_SMALL).collect()
    assert rows
    vals = sorted(r.monetary for r in rows)
    n = len(vals)
    # discrete quantile: smallest value whose CDF >= p
    th = [vals[math.ceil(q * n) - 1] for q in (0.25, 0.5, 0.75)]
    for r in rows:
        expect = 1 + sum(r.monetary > t for t in th)
        assert r.m_quartile == expect, (r.user_id, r.monetary, th)
    # and the NTILE variant may only differ at threshold-tied or
    # boundary-rank users; on untied interior points the two agree
    exact = {
        r.user_id: r.m_quartile
        for r in specs["user_rfm_segments"].fn(spark, SF_SMALL).collect()
    }
    assert set(exact) == {r.user_id for r in rows}
    # NTILE's bucket-k cutoff differs from ceil(q·n) by at most one rank
    # (exactly the n ≡ 2 (mod 4) median case), so excluding ceil(q·n)±1
    # removes every legitimately-divergent rank
    boundary_ranks = {
        rk
        for q in (0.25, 0.5, 0.75)
        for rk in (math.ceil(q * n) - 1, math.ceil(q * n), math.ceil(q * n) + 1)
    }
    rank_of = {v: i + 1 for i, v in enumerate(vals)}
    diff = {
        u.user_id
        for u in rows
        if exact[u.user_id] != u.m_quartile
        and rank_of[u.monetary] not in boundary_ranks
        and u.monetary not in th
    }
    assert not diff, f"interior monetary buckets diverge for {sorted(diff)[:5]}"


# --- TPC-H breadth batch (Q7/Q10/Q13/Q14/Q18/Q22 shapes) ---------------------


def test_volume_shipping_bidirectional(spark, specs, tmp_path_factory):
    # NATION_1 supplier -> NATION_2 customer (100) and the reverse (40);
    # an unrelated NATION_0 pair must not appear
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 1), (2, "NATION_2", 2)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 1, 0.0), (2, "s2", 2, 0.0), (3, "s3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    customer = spark.createDataFrame(
        [(1, "c1", 2, 0.0, "B"), (2, "c2", 1, 0.0, "B"), (3, "c3", 0, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    ship = datetime(1996, 6, 1)
    li = _li(spark, [
        (10, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ship),  # n1 -> n2
        (11, 1, 2, 1, 1.0, 40.0, 0.0, 0.0, "N", "O", ship),   # n2 -> n1
        (12, 1, 3, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", ship),  # n0 -> n2
    ])
    orders = _orders(spark, [
        (10, 1, "O", 0.0, datetime(1996, 1, 1), "1"),
        (11, 2, "O", 0.0, datetime(1996, 1, 1), "1"),
        (12, 1, "O", 0.0, datetime(1996, 1, 1), "1"),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q7", {
        "lineitem": li, "orders": orders, "customer": customer,
        "supplier": supplier, "nation": nation,
    })
    rows = {(r.supp_nation, r.cust_nation): r for r in
            specs["volume_shipping"].fn(spark, sf).collect()}
    assert set(rows) == {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert rows[("NATION_1", "NATION_2")].revenue == 100.0
    assert rows[("NATION_2", "NATION_1")].revenue == 40.0
    assert rows[("NATION_1", "NATION_2")].l_year == 1996


def test_returned_item_report_filters_and_ranks(spark, specs, tmp_path_factory):
    nation, region, supplier, customer, part = _dims(spark)
    in_q = datetime(1997, 2, 1)
    out_q = datetime(1997, 6, 1)
    li = _li(spark, [
        (10, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "R", "O", in_q),
        (10, 1, 1, 2, 1.0, 50.0, 0.0, 0.0, "N", "O", in_q),   # not returned
        (11, 1, 1, 1, 1.0, 70.0, 0.0, 0.0, "R", "O", out_q),  # outside quarter
        (12, 1, 1, 1, 1.0, 30.0, 0.5, 0.0, "R", "O", in_q),   # cust 2: 15.0
    ])
    orders = _orders(spark, [
        (10, 1, "O", 0.0, in_q, "1"),
        (11, 1, "O", 0.0, out_q, "1"),
        (12, 2, "O", 0.0, in_q, "1"),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q10", {
        "lineitem": li, "orders": orders, "customer": customer, "nation": nation,
    })
    rows = specs["returned_item_report"].fn(spark, sf).collect()
    assert [(r.c_custkey, r.revenue) for r in rows] == [(1, 100.0), (2, 15.0)]
    assert rows[0].n_name == "NATION_3"


def test_customer_order_distribution_counts_zero_bucket(spark, specs, tmp_path_factory):
    customer = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "B") for i in (1, 2, 3)],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = _orders(spark, [
        (10, 1, "O", 0.0, datetime(1996, 1, 1), "1"),
        (11, 1, "O", 0.0, datetime(1996, 1, 1), "1"),
        (12, 2, "O", 0.0, datetime(1996, 1, 1), "1"),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q13", {
        "customer": customer, "orders": orders,
    })
    d = {r.c_count: r.custdist for r in
         specs["customer_order_distribution"].fn(spark, sf).collect()}
    # cust 3 has NO orders and must land in the 0 bucket (LEFT join +
    # COUNT(o_orderkey))
    assert d == {0: 1, 1: 1, 2: 1}


def test_promo_revenue_pct_planted(spark, specs, tmp_path_factory):
    nation, region, supplier, customer, part = _dims(spark)  # part 1 = PROMO
    in_m = datetime(1997, 5, 10)
    li = _li(spark, [
        (10, 1, 1, 1, 1.0, 30.0, 0.0, 0.0, "N", "O", in_m),          # promo 30
        (10, 2, 1, 2, 1.0, 90.0, 0.0, 0.0, "N", "O", in_m),          # other 90
        (10, 1, 1, 3, 1.0, 999.0, 0.0, 0.0, "N", "O", datetime(1997, 7, 1)),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q14", {"lineitem": li, "part": part})
    r = specs["promo_revenue_pct"].fn(spark, sf).collect()[0]
    assert r.n_lines == 2
    assert abs(r.promo_pct - 25.0) < 1e-12


def test_large_volume_orders_threshold(spark, specs, tmp_path_factory):
    nation, region, supplier, customer, part = _dims(spark)
    ship = datetime(1996, 6, 1)
    li = _li(spark, [
        (10, 1, 1, 1, 150.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (10, 1, 1, 2, 60.0, 1.0, 0.0, 0.0, "N", "O", ship),   # order 10: 210 > 200
        (11, 1, 1, 1, 199.0, 1.0, 0.0, 0.0, "N", "O", ship),  # order 11: under
    ])
    orders = _orders(spark, [
        (10, 1, "O", 500.0, datetime(1996, 1, 1), "1"),
        (11, 1, "O", 300.0, datetime(1996, 1, 1), "1"),
    ])
    sf = _write_sf(spark, tmp_path_factory, "q18", {
        "lineitem": li, "orders": orders, "customer": customer,
    })
    rows = specs["large_volume_orders"].fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].o_orderkey == 10 and rows[0].sum_qty == 210.0
    assert rows[0].c_custkey == 1 and rows[0].o_totalprice == 500.0


def test_lapsed_highvalue_customers_anti_join(spark, specs, tmp_path_factory):
    # positive balances: 100, 300 (avg 200); cust 2 (300) is above-average
    # but ordered in 2001 -> excluded; cust 4 (250, never ordered recently)
    # is the one survivor; negative-balance cust never qualifies
    customer = spark.createDataFrame(
        [(1, "c1", 7, 100.0, "B"), (2, "c2", 7, 300.0, "B"),
         (3, "c3", 7, -50.0, "B"), (4, "c4", 8, 250.0, "B")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = _orders(spark, [
        (10, 2, "O", 0.0, datetime(2001, 3, 1), "1"),   # recent -> excludes 2
        (11, 4, "O", 0.0, datetime(1999, 3, 1), "1"),   # old -> keeps 4
    ])
    sf = _write_sf(spark, tmp_path_factory, "q22", {
        "customer": customer, "orders": orders,
    })
    rows = specs["lapsed_highvalue_customers"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.c_nationkey == 8 and r.numcust == 1 and r.totacctbal == 250.0


def test_rrf_topk_agreement_with_exact_variant(spark, specs):
    """Capped RRF's guarantee (and its honest limit): a doc whose list
    ranks are all <= 100 or absent scores IDENTICALLY in both variants —
    and since capping can only LOWER other docs' scores (rank 101..999
    becomes the imputed 1000), such a doc can only move UP. So every
    exact-top-20 doc with no rank in (100, 1000) must appear in the
    capped top-20 with the same score. Docs WITH a tail rank legitimately
    differ — at sf0.001 the semantic list ranks all 499 embeddings, so
    exact-variant sem ranks run past 100 and strict equality is
    unobtainable by construction (the first capped/exact divergence on
    this data is rank 5)."""
    a = specs["rrf_hybrid_fusion"].fn(spark, SF_SMALL).collect()
    b = specs["rrf_fusion_topk"].fn(spark, SF_SMALL).collect()
    assert len(a) == 20 and len(b) == 20
    b_by_doc = {r.doc_id: r for r in b}
    stable = [
        r for r in a
        if (r.lex_rank is None or r.lex_rank <= 100)
        and (r.sem_rank is None or r.sem_rank <= 100)
    ]
    assert stable, "no rank-stable docs in the exact top-20 — fixture too weak"
    for r in stable:
        assert r.doc_id in b_by_doc, f"doc {r.doc_id} fell out of the capped top-20"
        rb = b_by_doc[r.doc_id]
        assert rb.rrf_score == r.rrf_score
        assert rb.rnk <= r.rnk  # capping only demotes OTHER docs
