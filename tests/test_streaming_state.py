"""Sustained streaming-state evidence: state-store row counts PLATEAU at
the watermark-implied bound instead of growing with stream history.

The batch-parity and restart tests (test_streaming.py) prove semantics;
these prove the state-size story the operators' docstrings claim — the
property that decides whether the stream survives a month of uptime at
production rates. Each test replays many days of input one micro-batch
per day (maxFilesPerTrigger=1) and asserts, from the progress telemetry's
`stateOperators[].numRowsTotal`, that late-stream state is bounded by the
per-day key arrival rate, not by total history."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pytest

from funnel_report_etl_pipeline__spark.streaming.funnel_stream import (
    EVENT_STREAM_SCHEMA,
    dedup_stream,
    funnel_depth_stream,
)

T0 = datetime(2026, 2, 1, 8, 0, 0)
N_DAYS = 10
KEYS_PER_DAY = 200


def _write_days(spark, path: str, distinct_users: bool) -> int:
    """One parquet file per day; event_ids (and optionally user_ids) are
    fresh each day, each day also redelivers 20% of its own ids. Returns
    the number of UNIQUE event ids written."""
    n_unique = 0
    for day in range(N_DAYS):
        base = day * 1_000_000
        rows = []
        for i in range(KEYS_PER_DAY):
            uid = (base + i) if distinct_users else (i % 50)
            etype = ("signup", "view", "purchase")[i % 3]
            rows.append(
                (base + i, uid, etype, T0 + timedelta(days=day, seconds=i), 1.0)
            )
        n_unique += KEYS_PER_DAY
        # in-day redeliveries: same event_id, same ts (at-least-once feed)
        rows += rows[: KEYS_PER_DAY // 5]
        df = spark.createDataFrame(rows, EVENT_STREAM_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(path)
        time.sleep(0.05)  # distinct mtimes -> deterministic file order
    return n_unique


def _drain(stream, name: str, mode: str):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    return progress


def _state_rows(progress) -> list[int]:
    return [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators") and p["numInputRows"] > 0
    ]


def test_dedup_stream_state_plateaus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup_state"))
    n_unique = _write_days(spark, path, distinct_users=True)

    src = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    progress = _drain(dedup_stream(src, watermark="1 hour"), "dedup_state_t", "append")
    out = spark.table("dedup_state_t")

    # exactly-once output: every unique id once, all redeliveries dropped
    assert out.count() == n_unique
    totals = _state_rows(progress)
    assert len(totals) >= N_DAYS - 1
    # watermark (1h) evicts each day's keys as the next day's batch
    # arrives: settled state must hold ~1 day of keys (+ the 20%
    # redelivery margin), never the 12-day history
    settled = totals[3:]
    # watermark advance lags one batch, so two days of keys co-reside at
    # the measurement point (2x is the exact steady state); 3x leaves room
    # for an occasional mtime tie merging two files into one micro-batch
    assert max(settled) <= 3 * KEYS_PER_DAY, (
        f"dedup state grew with history: {totals} "
        f"(bound = 3x{KEYS_PER_DAY}, total unique = {n_unique})"
    )
    assert n_unique > 3 * max(settled)  # the bound is meaningfully below history


def test_funnel_depth_state_evicts_inactive_users(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("depth_state"))
    _write_days(spark, path, distinct_users=True)  # fresh users every day

    src = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    progress = _drain(
        funnel_depth_stream(src, watermark="1 hour"), "depth_state_t", "update"
    )

    totals = _state_rows(progress)
    assert len(totals) >= N_DAYS - 1
    # 24h TTL past the watermark, days are 24h apart: a user's state
    # survives its own day + the next, so the plateau is <= 2 days of
    # users (+1 day margin for timeout-fires-on-next-batch), never the
    # 12-day user history
    settled = totals[4:]
    assert max(settled) <= 3 * KEYS_PER_DAY, (
        f"depth state grew with history: {totals}"
    )
    # and state genuinely plateaus rather than ramping: the last batches
    # are no bigger than the mid-stream ones
    assert totals[-1] <= max(settled)


@pytest.mark.scale
def test_dedup_stream_state_plateaus_30_days(spark, tmp_path_factory):
    """Month-of-uptime version: 30 days x 1000 keys/day."""
    path = str(tmp_path_factory.mktemp("dedup_state_30"))
    for day in range(30):
        base = day * 1_000_000
        rows = [
            (
                base + i,
                base + i,
                "view",
                T0 + timedelta(days=day, seconds=i % 3600),
                1.0,
            )
            for i in range(1000)
        ]
        spark.createDataFrame(rows, EVENT_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(0.05)

    src = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    progress = _drain(
        dedup_stream(src, watermark="1 hour"), "dedup_state30_t", "append"
    )
    assert spark.table("dedup_state30_t").count() == 30_000
    totals = _state_rows(progress)
    settled = totals[3:]
    assert max(settled) <= 3_000, f"state not bounded: max={max(settled)}"
