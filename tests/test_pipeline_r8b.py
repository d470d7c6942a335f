"""Round-8 close batch #2: planted-fixture behavior tests (oracle parity
is covered by driver_sim / CORRECTNESS; these pin the semantics on inputs
where the right answer is computable by hand)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from funnel_report_etl_pipeline__spark.plans.registry import load_all


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


def _part(spark, rows):
    return spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


SHIP = datetime(1996, 1, 1)


def test_ols_recovers_planted_line(spark, specs, tmp_path_factory):
    # brand A: y = 2x exactly -> slope 2, intercept 0
    # brand B: y = 2x + 1 exactly -> slope 2, intercept 1
    li = _li(
        spark,
        [
            (1, 1, 1, 1, 1.0, 2.0, 0.0, 0.0, "N", "O", SHIP),
            (1, 1, 1, 2, 2.0, 4.0, 0.0, 0.0, "N", "O", SHIP),
            (1, 1, 1, 3, 3.0, 6.0, 0.0, 0.0, "N", "O", SHIP),
            (2, 2, 1, 1, 1.0, 3.0, 0.0, 0.0, "N", "O", SHIP),
            (2, 2, 1, 2, 2.0, 5.0, 0.0, 0.0, "N", "O", SHIP),
        ],
    )
    part = _part(
        spark,
        [(1, "pa", "A", "T", 1, 1.0), (2, "pb", "B", "T", 1, 1.0)],
    )
    sf = _write_sf(spark, tmp_path_factory, "ols", {"lineitem": li, "part": part})
    rows = {
        r["brand"]: r
        for r in specs["ols_brand_price_quantity"].fn(spark, sf).collect()
    }
    assert rows["A"]["slope"] == pytest.approx(2.0) and rows["A"][
        "intercept"
    ] == pytest.approx(0.0)
    assert rows["B"]["slope"] == pytest.approx(2.0) and rows["B"][
        "intercept"
    ] == pytest.approx(1.0)
    assert rows["A"]["n_lines"] == 3 and rows["B"]["n_lines"] == 2


def test_chi_square_terms_hand_computed(spark, specs, tmp_path_factory):
    # 2x2 table with counts 30/10/10/30: N=80, all marginals 40,
    # expected 20 everywhere, term = (obs-20)^2/20 = 5 for every cell.
    rows = []
    ln = 0
    for flag, status, n in [("A", "F", 30), ("A", "O", 10), ("R", "F", 10), ("R", "O", 30)]:
        for _ in range(n):
            ln += 1
            rows.append((1, 1, 1, ln, 1.0, 1.0, 0.0, 0.0, flag, status, SHIP))
    sf = _write_sf(
        spark, tmp_path_factory, "chi2", {"lineitem": _li(spark, rows)}
    )
    out = specs["chi_square_flag_status"].fn(spark, sf).collect()
    assert len(out) == 4
    for r in out:
        assert r["expected"] == pytest.approx(20.0)
        assert r["chi2_term"] == pytest.approx(5.0)
    total = sum(r["chi2_term"] for r in out)
    assert total == pytest.approx(20.0)


def test_markov_transitions_probabilities(spark, specs, tmp_path_factory):
    # user 1: A,B,A,B -> A->B twice, B->A once; user 2: C,C -> C->C once.
    t = lambda i: datetime(2024, 1, 1, 0, i)  # noqa: E731
    ev = _ev(
        spark,
        [
            (1, t(0), 1, "A", 0.0, "{}"),
            (2, t(1), 1, "B", 0.0, "{}"),
            (3, t(2), 1, "A", 0.0, "{}"),
            (4, t(3), 1, "B", 0.0, "{}"),
            (5, t(0), 2, "C", 0.0, "{}"),
            (6, t(1), 2, "C", 0.0, "{}"),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "markov", {"events": ev})
    out = {
        (r["src"], r["dst"]): r
        for r in specs["markov_event_transitions"].fn(spark, sf).collect()
    }
    assert out[("A", "B")]["n_trans"] == 2
    assert out[("A", "B")]["prob"] == pytest.approx(1.0)
    assert out[("B", "A")]["n_trans"] == 1
    assert out[("C", "C")]["prob"] == pytest.approx(1.0)
    # last event of each user emits no transition; cross-user pairs never form
    assert ("B", "C") not in out and ("C", "A") not in out


def test_assoc_rules_support_confidence_lift(spark, specs, tmp_path_factory):
    # orders: {X,Y}, {X,Y}, {X}, {Y,Z} -> N=4, n_X=3, n_Y=3, n_Z=1, n_XY=2
    li = _li(
        spark,
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (2, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (4, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (4, 3, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            # duplicate line of the same (order, brand): DISTINCT must fold it
            (1, 1, 1, 3, 9.0, 9.0, 0.0, 0.0, "N", "O", SHIP),
        ],
    )
    part = _part(
        spark,
        [(1, "px", "X", "T", 1, 1.0), (2, "py", "Y", "T", 1, 1.0), (3, "pz", "Z", "T", 1, 1.0)],
    )
    sf = _write_sf(spark, tmp_path_factory, "assoc", {"lineitem": li, "part": part})
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in specs["assoc_rules_brand"].fn(spark, sf).collect()
    }
    xy = out[("X", "Y")]
    assert xy["n_both"] == 2
    assert xy["support"] == pytest.approx(0.5)
    assert xy["confidence"] == pytest.approx(2 / 3)
    assert xy["lift"] == pytest.approx((2 * 4) / (3 * 3))
    yz = out[("Y", "Z")]
    assert yz["confidence"] == pytest.approx(1 / 3)
    assert yz["lift"] == pytest.approx((1 * 4) / (3 * 1))
    # rules are directed: both orientations present with their own confidence
    assert out[("Z", "Y")]["confidence"] == pytest.approx(1.0)


def test_priority_islands_runs_and_bounds(spark, specs, tmp_path_factory):
    # customer 1: P1,P1,P2,P1 -> 3 islands; same-date tie broken by orderkey
    d = lambda i: datetime(2024, 1, i)  # noqa: E731
    orders = _orders(
        spark,
        [
            (1, 1, "O", 10.0, d(1), "P1"),
            (2, 1, "O", 10.0, d(2), "P1"),
            (3, 1, "O", 10.0, d(3), "P2"),
            (4, 1, "O", 10.0, d(4), "P1"),
            (5, 2, "O", 10.0, d(1), "P9"),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "scd2", {"orders": orders})
    out = specs["priority_change_intervals"].fn(spark, sf).collect()
    c1 = [r for r in out if r["o_custkey"] == 1]
    assert [r["island"] for r in c1] == [1, 2, 3]
    assert [r["priority"] for r in c1] == ["P1", "P2", "P1"]
    assert c1[0]["n_orders"] == 2
    assert c1[0]["valid_from"] == d(1) and c1[0]["valid_to"] == d(2)
    assert c1[1]["valid_from"] == d(3) and c1[1]["valid_to"] == d(3)
    # single-order customer: exactly one island covering one day
    c2 = [r for r in out if r["o_custkey"] == 2]
    assert len(c2) == 1 and c2[0]["n_orders"] == 1


def test_ewma_flat_series_then_spike(spark, specs, tmp_path_factory):
    # 8 flat days at 100, then a 200 spike: flat days have ewma=100,
    # ratio=1; the spike day's ewma = 0.5*200 + 0.5*100 = 150 (weights sum
    # to exactly 1), ratio = 4/3 > 1.25 -> anomalous.
    d = lambda i: datetime(2024, 1, i)  # noqa: E731
    rows = [(i, 1, "O", 100.0, d(i), "P") for i in range(1, 9)]
    rows.append((9, 1, "O", 200.0, d(9), "P"))
    sf = _write_sf(
        spark, tmp_path_factory, "ewma", {"orders": _orders(spark, rows)}
    )
    out = specs["ewma_revenue_anomaly"].fn(spark, sf).collect()
    # rn >= 7 -> days 7, 8, 9 only
    assert [r["day"] for r in out] == [d(7), d(8), d(9)]
    assert out[0]["ewma"] == pytest.approx(100.0) and out[0]["anomalous"] == 0
    assert out[1]["ratio"] == pytest.approx(1.0)
    assert out[2]["ewma"] == pytest.approx(150.0)
    assert out[2]["ratio"] == pytest.approx(200.0 / 150.0)
    assert out[2]["anomalous"] == 1


def test_contamination_flags_shared_grams_only(spark, specs, tmp_path_factory):
    # benchmark (src0): "a b c d e" -> 4-grams {abcd, bcde}
    # train doc 10: "a b c d x" -> grams {abcd, bcdx}: 1 of 2 contaminated
    # train doc 11: "p q r s t" -> no overlap: excluded from the report
    docs = _docs(
        spark,
        [
            (1, "a b c d e", "en", "src0", 9),
            (10, "a b c d x", "en", "src1", 9),
            (11, "p q r s t", "en", "src2", 9),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "contam", {"documents": docs})
    out = specs["benchmark_contamination"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 10
    assert r["n_grams"] == 2 and r["n_contaminated"] == 1
    assert r["contamination_ratio"] == pytest.approx(0.5)


def test_ewma_weights_sum_to_one():
    # the unrolled kernel must be a true weighted average: exact binary
    # fractions summing to exactly 1.0 (no normalization divide needed)
    w = [0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.015625]
    assert math.fsum(w) == 1.0 and sum(w) == 1.0


def test_modularity_hand_computed_graph(spark, specs, tmp_path_factory):
    # co-order edges: {1,2} (twice -> distinct folds), {3,4}, {1,3}
    # brands: parts 1,2 -> A; 3,4 -> B. m=3, intra_A=1, intra_B=1,
    # degrees 1:2, 2:1, 3:2, 4:1 -> D_A=3, D_B=3,
    # term = 1/3 - (3/6)^2 = 1/12 for both communities.
    li = _li(
        spark,
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (2, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (3, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (3, 4, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (4, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
            (4, 3, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP),
        ],
    )
    part = _part(
        spark,
        [(1, "p1", "A", "T", 1, 1.0), (2, "p2", "A", "T", 1, 1.0),
         (3, "p3", "B", "T", 1, 1.0), (4, "p4", "B", "T", 1, 1.0)],
    )
    sf = _write_sf(spark, tmp_path_factory, "mod", {"lineitem": li, "part": part})
    out = {r["community"]: r for r in specs["community_modularity"].fn(spark, sf).collect()}
    for c in ("A", "B"):
        assert out[c]["n_nodes"] == 2
        assert out[c]["intra_edges"] == 1
        assert out[c]["degree_sum"] == 3
        assert out[c]["modularity_term"] == pytest.approx(1 / 3 - 0.25)
    # global Q for this split
    assert sum(r["modularity_term"] for r in out.values()) == pytest.approx(1 / 6)


def test_event_path_topk_prefixes(spark, specs, tmp_path_factory):
    t = lambda i: datetime(2024, 1, 1, 0, i)  # noqa: E731
    rows = []
    eid = 0
    for uid, seq in [(1, "ABCD"), (2, "AB"), (3, "ABC")]:
        for i, et in enumerate(seq):
            eid += 1
            rows.append((eid, t(i), uid, et, 0.0, "{}"))
    sf = _write_sf(spark, tmp_path_factory, "paths", {"events": _ev(spark, rows)})
    out = specs["event_path_topk"].fn(spark, sf).collect()
    # only the first 3 events count: user 1's D is ignored
    assert out[0]["path"] == "A>B>C" and out[0]["n_users"] == 2
    assert out[1]["path"] == "A>B" and out[1]["n_users"] == 1


def test_gini_impurity_uniform_and_pure(spark, specs, tmp_path_factory):
    d = datetime(2024, 1, 1)
    cust = spark.createDataFrame(
        [(1, "c1", 1, 0.0, "S1"), (2, "c2", 1, 0.0, "S2")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = _orders(
        spark,
        [
            (1, 1, "O", 1.0, d, "P1"), (2, 1, "O", 1.0, d, "P1"),
            (3, 1, "O", 1.0, d, "P2"), (4, 1, "O", 1.0, d, "P2"),
            (5, 2, "O", 1.0, d, "P1"), (6, 2, "O", 1.0, d, "P1"),
        ],
    )
    sf = _write_sf(
        spark, tmp_path_factory, "gini", {"orders": orders, "customer": cust}
    )
    out = {r["segment"]: r for r in specs["gini_impurity_segments"].fn(spark, sf).collect()}
    # S1: 2+2 split -> 1 - (4+4)/16 = 0.5 ; S2: pure -> 0
    assert out["S1"]["gini"] == pytest.approx(0.5)
    assert out["S2"]["gini"] == pytest.approx(0.0)
    assert out["S1"]["n_orders"] == 4 and out["S2"]["n_orders"] == 2


def test_session_bounce_stats_hand_computed(spark, specs, tmp_path_factory):
    # user 1: events at +0m and +10m (one 2-event session, dwell 600s),
    # then +120m (a bounce). user 2: single event (a bounce). All on day 1.
    t = lambda m: datetime(2024, 1, 1, 8, 0, 0) + __import__("datetime").timedelta(minutes=m)  # noqa: E731
    ev = _ev(
        spark,
        [
            (1, t(0), 1, "A", 0.0, "{}"),
            (2, t(10), 1, "B", 0.0, "{}"),
            (3, t(120), 1, "C", 0.0, "{}"),
            (4, t(5), 2, "A", 0.0, "{}"),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "bounce", {"events": ev})
    out = specs["session_bounce_stats"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sessions"] == 3 and r["n_bounce"] == 2
    assert r["bounce_rate"] == pytest.approx(2 / 3)
    # durations: 600s, 0s, 0s -> p50 = 0, p90 interpolates toward 600
    assert r["p50_duration_s"] == pytest.approx(0.0)
    assert r["p90_duration_s"] == pytest.approx(480.0)


def test_lang_id_confusion_diagonal_and_miss(spark, specs, tmp_path_factory):
    # doc 1: clear English; doc 2: clear German; doc 3: labeled 'es' but
    # written with English markers -> lands in the (es, en) off-diagonal.
    docs = _docs(
        spark,
        [
            (1, "the cat and the dog of it", "en", "s", 25),
            (2, "der hund und die katze nicht", "de", "s", 28),
            (3, "the dog and a cat", "es", "s", 17),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "conf", {"documents": docs})
    out = {
        (r["gold_lang"], r["pred_lang"]): r
        for r in specs["lang_id_confusion"].fn(spark, sf).collect()
    }
    assert out[("en", "en")]["n_docs"] == 1
    assert out[("de", "de")]["n_docs"] == 1
    assert out[("es", "en")]["n_docs"] == 1
    # row-normalized share: every gold row here has exactly one cell
    for r in out.values():
        assert r["gold_share"] == pytest.approx(1.0)


def test_two_hop_reach_planted_star_chain(spark, specs, tmp_path_factory):
    # graph: star 1-{2,3,4} plus chain 4-5, 5-6.  Degrees: 1:3, 4:2, 5:2,
    # 2:1, 3:1, 6:1 -> seeds (top-5 by degree desc, id asc) = 1,4,5,2,3.
    # seed 1: N1={2,3,4}, N2={5} (via 4; 2,3 lead back to 1 only).
    # seed 4: N1={1,5}, N2={2,3,6}.
    def order(ok, parts_):
        return [
            (ok, p, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", SHIP)
            for i, p in enumerate(parts_)
        ]

    rows = (
        order(1, [1, 2]) + order(2, [1, 3]) + order(3, [1, 4])
        + order(4, [4, 5]) + order(5, [5, 6])
    )
    sf = _write_sf(
        spark, tmp_path_factory, "twohop", {"lineitem": _li(spark, rows)}
    )
    out = {r["seed"]: r for r in specs["two_hop_reach"].fn(spark, sf).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["degree"] == 3 and out[1]["n_1hop"] == 3 and out[1]["n_2hop"] == 1
    assert out[4]["degree"] == 2 and out[4]["n_1hop"] == 2 and out[4]["n_2hop"] == 3
    # leaf seed 2: one neighbor (the hub); 2-hop = hub's other neighbors {3,4}
    assert out[2]["n_1hop"] == 1 and out[2]["n_2hop"] == 2


def test_table_profile_counts_nulls_distincts(spark, specs, tmp_path_factory):
    d = datetime(2024, 1, 1)
    orders = _orders(
        spark,
        [
            (1, 7, "O", 10.0, d, "P1"),
            (2, 7, "O", 20.0, d, "P1"),
            (3, None, "F", 20.0, d, "P2"),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "profile", {"orders": orders})
    out = {r["column_name"]: r for r in specs["table_profile_orders"].fn(spark, sf).collect()}
    assert set(out) == {
        "o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice",
    }
    ck = out["o_custkey"]
    assert ck["n_rows"] == 3 and ck["n_null"] == 1 and ck["n_distinct"] == 1
    assert ck["min_num"] == 7.0 and ck["max_num"] == 7.0
    tp = out["o_totalprice"]
    assert tp["n_distinct"] == 2 and tp["min_num"] == 10.0 and tp["max_num"] == 20.0
    # string columns carry NULL bounds
    assert out["o_orderstatus"]["min_num"] is None
    # timestamp bounds are epoch-µs doubles
    assert out["o_orderdate"]["min_num"] == d.timestamp() * 1e6


def test_weekday_seasonality_monday_vs_sunday(spark, specs, tmp_path_factory):
    mon, sun = datetime(2024, 1, 1), datetime(2024, 1, 7)  # Mon=0, Sun=6
    orders = _orders(
        spark,
        [(1, 1, "O", 100.0, mon, "P"), (2, 1, "O", 300.0, sun, "P")],
    )
    sf = _write_sf(spark, tmp_path_factory, "season", {"orders": orders})
    out = {r["weekday"]: r for r in specs["weekday_seasonality"].fn(spark, sf).collect()}
    assert set(out) == {0, 6}
    # overall 200/day; Monday 100/day -> 0.5, Sunday 300/day -> 1.5
    assert out[0]["seasonality_index"] == pytest.approx(0.5)
    assert out[6]["seasonality_index"] == pytest.approx(1.5)
    assert out[0]["n_days"] == 1 and out[6]["rev"] == pytest.approx(300.0)


def test_winsorized_mean_clips_the_whale(spark, specs, tmp_path_factory):
    d = datetime(2024, 1, 1)
    cust = spark.createDataFrame(
        [(1, "c1", 1, 0.0, "S1")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    # prices [10,10,10,10,110]: p95 over sorted values interpolates to
    # 10 + 0.8*(110-10) = 90 -> winsorized mean (4*10 + 90)/5 = 26
    orders = _orders(
        spark,
        [(i, 1, "O", p, d, "P") for i, p in enumerate([10.0, 10.0, 10.0, 10.0, 110.0], 1)],
    )
    sf = _write_sf(spark, tmp_path_factory, "winsor", {"orders": orders, "customer": cust})
    out = specs["winsorized_revenue_mean"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["raw_mean"] == pytest.approx(30.0)
    assert r["winsorized_mean"] == pytest.approx(26.0)
    assert r["winsorized_mean"] < r["raw_mean"]


def test_cumulative_unique_users_first_seen(spark, specs, tmp_path_factory):
    d = lambda i, h=0: datetime(2024, 1, i, h)  # noqa: E731
    # day1: users 1,2 appear; day2: user 1 returns (NOT new) + user 3 new;
    # day3: all return, nobody new.
    ev = _ev(
        spark,
        [
            (1, d(1), 1, "A", 0.0, "{}"),
            (2, d(1, 5), 2, "A", 0.0, "{}"),
            (3, d(2), 1, "B", 0.0, "{}"),
            (4, d(2, 3), 3, "A", 0.0, "{}"),
            (5, d(3), 1, "C", 0.0, "{}"),
            (6, d(3, 1), 2, "C", 0.0, "{}"),
            (7, d(3, 2), 3, "C", 0.0, "{}"),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "cumuu", {"events": ev})
    out = specs["cumulative_unique_users"].fn(spark, sf).collect()
    # day 3 emits no row (no first appearances), and the cumulative count
    # on day 2 already equals the full distinct-user total
    assert [(r["day"], r["n_new_users"], r["cumulative_users"]) for r in out] == [
        (d(1), 2, 2),
        (d(2), 1, 3),
    ]


def test_equidepth_histogram_balanced_buckets(spark, specs, tmp_path_factory):
    d = datetime(2024, 1, 1)
    # prices 1..16: octile boundaries split into 8 buckets of exactly 2
    orders = _orders(
        spark,
        [(i, 1, "O", float(i), d, "P") for i in range(1, 17)],
    )
    sf = _write_sf(spark, tmp_path_factory, "eqdepth", {"orders": orders})
    out = specs["equidepth_price_histogram"].fn(spark, sf).collect()
    assert [r["bucket"] for r in out] == list(range(8))
    assert all(r["n_orders"] == 2 for r in out)
    assert out[0]["lo"] == 1.0 and out[7]["hi"] == 16.0
    # buckets tile the domain without overlap
    for a, b in zip(out, out[1:]):
        assert a["hi"] < b["lo"]


def test_window_dist_funcs_hand_ranks(spark, specs, tmp_path_factory):
    cust = spark.createDataFrame(
        [(1, "a", 0, 10.0, "S"), (2, "b", 0, 20.0, "S"),
         (3, "c", 0, 30.0, "S"), (4, "d", 1, 5.0, "S")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    sf = _write_sf(spark, tmp_path_factory, "distfn", {"customer": cust})
    out = {r["c_custkey"]: r for r in specs["window_dist_funcs"].fn(spark, sf).collect()}
    # nation 0, order by balance: ranks 0, 0.5, 1; cume 1/3, 2/3, 1
    assert out[1]["pct_rank"] == pytest.approx(0.0)
    assert out[2]["pct_rank"] == pytest.approx(0.5)
    assert out[3]["pct_rank"] == pytest.approx(1.0)
    assert out[2]["cume"] == pytest.approx(2 / 3)
    # nth_value(2) over the unbounded frame is visible from EVERY row
    assert all(out[k]["second_custkey"] == 2 for k in (1, 2, 3))
    # single-row partition: percent_rank 0 (n-1=0 convention), no 2nd value
    assert out[4]["pct_rank"] == pytest.approx(0.0)
    assert out[4]["second_custkey"] is None


def test_grouping_sets_mixed_margins(spark, specs, tmp_path_factory):
    d = datetime(2024, 1, 1)
    orders = _orders(
        spark,
        [
            (1, 1, "O", 10.0, d, "P1"), (2, 1, "O", 20.0, d, "P1"),
            (3, 1, "F", 40.0, d, "P2"),
        ],
    )
    sf = _write_sf(spark, tmp_path_factory, "gsets", {"orders": orders})
    rows = specs["grouping_sets_mixed"].fn(spark, sf).collect()
    detail = {(r["o_orderpriority"], r["o_orderstatus"]): r for r in rows
              if r["g_priority"] == 0 and r["g_status"] == 0}
    assert detail[("P1", "O")]["n_orders"] == 2
    assert detail[("P1", "O")]["revenue"] == pytest.approx(30.0)
    margins = {r["o_orderstatus"]: r for r in rows
               if r["g_priority"] == 1 and r["g_status"] == 0}
    assert margins["O"]["n_orders"] == 2 and margins["F"]["revenue"] == pytest.approx(40.0)
    total = [r for r in rows if r["g_priority"] == 1 and r["g_status"] == 1]
    assert len(total) == 1 and total[0]["n_orders"] == 3
    assert total[0]["revenue"] == pytest.approx(70.0)
    # exactly the three requested sets — no cube blowup
    assert len(rows) == len(detail) + len(margins) + 1
