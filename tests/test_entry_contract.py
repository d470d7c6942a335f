"""Driver-contract smoke: __spark_entry__ exactly as the driver consumes it."""

from __future__ import annotations

import importlib.util

from .conftest import REPO


def _load():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.schema.fieldNames()  # stable, non-empty schema


def test_queries_and_oracles_consistent():
    mod = _load()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)
    # oracle coverage must stay high: only genuinely non-SQL ops may omit
    assert len(os_) / len(qs) >= 0.85
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in os_.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_driver_window_composition_pinned():
    """The external gate verifies queries() in iteration order but caps the
    number of entries it checks (50 in round 2) — so window composition is
    part of the scoreboard contract.  Pin it exactly: a future registration
    must never silently displace a gated query (round-4 review ask)."""
    from funnel_report_etl_pipeline__spark.plans.registry import (
        DRIVER_WINDOW,
        _WINDOW,
        load_all,
    )

    mod = _load()
    window = list(mod.queries())[:DRIVER_WINDOW]
    assert window == list(_WINDOW), "driver window drifted from curated _WINDOW"
    assert len(_WINDOW) == DRIVER_WINDOW == 50
    assert window[-1] == "event_funnel_users"
    specs = load_all()
    parity = [n for n, s in specs.items() if s.fn.__module__.endswith(".parity")]
    # parity must come first (driver smoke-checks the reference surface first)
    assert window[: len(parity)] == parity
    # every checked row must be value-hash verified: rows-only (no-oracle)
    # variants sit past the window, and each must still be REGISTERED so the
    # driver's weaker rows-only check and pytest cover them
    oracles = mod.oracle_sql()
    assert all(n in oracles for n in window), "no-oracle query inside the window"
    # round-7 rotation: the 22 queries that had never held a FULL external
    # row (approx_distinct_users/approx_percentiles ran rows-only in round 2,
    # before their oracles existed) plus the 4 round-7 additions sit INSIDE
    # the window — after CORRECTNESS_r07 every registered query will have
    # held at least one external value-hash row
    rotated_in_r7 = {
        "similarity_ann_ivf", "dedup_minhash_fast", "bigram_lm_support",
        "balanced_source_sample", "length_buckets", "price_histogram",
        "winnow_containment_pairs", "boilerplate_passages",
        "approx_distinct_users", "approx_percentiles", "length_outliers",
        "kmeans_lloyd_clusters", "ks_drift_value", "shipping_priority_topk",
        "kmeans_balanced_sample", "hard_negative_mining",
        "referential_integrity_audit", "partition_freshness_audit",
        "cross_source_duplication", "kmeans_cluster_purity",
        "local_supplier_volume", "revenue_anomaly_days",
        # new in round 7
        "user_rfm_segments_approx", "bm25_search_topk",
        "nation_market_share", "product_type_profit",
    }
    assert rotated_in_r7 <= set(window)
    # every query OUTSIDE the window must already hold an external green
    # row in a committed CORRECTNESS artifact (rounds 2-6) — the rotation's
    # whole point; checked against the recorded history, not hand-lists.
    # Exemption: queries REGISTERED this round land past the full window
    # by design and earn their first external row in a future rotation
    # (they are driver_sim + pytest verified meanwhile).
    new_this_round = {
        "volume_shipping", "returned_item_report",
        "customer_order_distribution", "promo_revenue_pct",
        "large_volume_orders", "lapsed_highvalue_customers",
        "rrf_fusion_topk",
    }
    import json
    from pathlib import Path

    verified = set()
    for p in Path(".").glob("CORRECTNESS_r0*.json"):
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match"):
                verified.add(name)
    outside = set(mod.queries()) - set(window)
    assert outside <= verified | new_this_round, sorted(
        outside - verified - new_this_round
    )
