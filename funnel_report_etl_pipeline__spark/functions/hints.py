"""Size-gated join hints.

A hard ``F.broadcast(df)`` is an order, not a suggestion: Catalyst builds a
BroadcastExchange regardless of the frame's actual size, so a hint placed on
a table that *grows with the corpus* (customers, suppliers, parts in a real
deployment — even though TPC-H convention treats them as dimensions) turns
into a job-killing 8 GB+ broadcast at 100×. ``maybe_broadcast`` keeps the
gate-scale plan (the hint fires, the fact side never shuffles) while
degrading gracefully: past a size threshold it returns the frame un-hinted
and AQE picks the join strategy from *runtime* statistics.

The gate reads the optimizer's own cost-model estimate
(``optimizedPlan().stats().sizeInBytes`` — the exact number the planner
compares against ``spark.sql.autoBroadcastJoinThreshold``), so no job runs
and no data is scanned to make the decision; it is a driver-side plan walk.
For a bare parquet scan the estimate is the file footprint; for a filtered
scan it includes Catalyst's selectivity estimate. Frames whose size is
*architecturally* bounded (1-row aggregates, the 25-row nation table, a
top-k output) keep their hard ``F.broadcast`` — the helper is for hints
whose safety depends on deployment-scale assumptions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default gate: 64 MiB *estimated* logical size — recalibrated from
# 256 MiB by the round-9 dim-growth probe. The optimizer's sizeInBytes
# reflects columnar-COMPRESSED scan bytes, but a broadcast materializes a
# row-format hashed relation whose memory runs ~5-20× that estimate (plus
# one copy per executor): at 2048× dim growth, frames estimating 180 MB
# pruned (30-41M rows) slipped a 256 MiB gate and then either built a
# 23-38 s broadcast or died outright with "Not enough memory to build and
# broadcast". 64 MiB ≈ ≤1 GB worst-case in-memory — the ceiling a
# real executor tolerates — and matches the session
# autoBroadcastJoinThreshold, so the hint's role stays "pin the good plan
# against stat drift", never "force a broadcast Catalyst would refuse".
# Every gate-scale dimension (sf0.1 customer ≈ 1 MiB) still passes.
# Override per session with spark.funnel.broadcastGateBytes.
DEFAULT_GATE_BYTES = 64 << 20

_CONF_KEY = "spark.funnel.broadcastGateBytes"


def estimated_size_bytes(df: DataFrame) -> int | None:
    """The optimizer's sizeInBytes estimate for ``df``, or None when the
    plan-stats walk is unavailable (e.g. Spark Connect has no _jdf)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def maybe_broadcast(df: DataFrame, gate_bytes: int | None = None) -> DataFrame:
    """Hint ``broadcast(df)`` only while the optimizer's size estimate
    stays under the gate; PAST the gate, hint ``shuffle_hash`` instead of
    returning the frame bare.

    Why the degrade side is a shuffle-hash hint and not "let AQE choose":
    the round-9 dim-growth probe (tools/dim_growth_probe.py, customer/part
    replicated 2048× to 30-41M rows / 350-440 MB file estimate) showed
    that with the hint merely ABSENT, Catalyst/AQE still picked broadcast
    from its own column-pruned compressed-size estimates — completing one
    query 14× slow behind a 30M-row broadcast build and failing another
    outright ("Not enough memory to build and broadcast") on the driver.
    The planner's estimate (pruned file bytes) systematically undercounts
    the in-memory hashed-relation size of a high-row-count dim, so once
    OUR estimate says the frame is past broadcast scale, the join must be
    pinned to the distributed-build strategy: shuffle_hash keeps the
    hash-join plan (no sort) with a per-partition build — scale-safe at
    any dim size. Unknown estimate ⇒ same treatment (fail safe: worst
    case is an unnecessary shuffle, never an oversized broadcast)."""
    if gate_bytes is None:
        try:
            gate_bytes = int(df.sparkSession.conf.get(_CONF_KEY, str(DEFAULT_GATE_BYTES)))
        except Exception:
            gate_bytes = DEFAULT_GATE_BYTES
    est = estimated_size_bytes(df)
    if est is None or est > gate_bytes:
        return df.hint("shuffle_hash")
    return F.broadcast(df)
