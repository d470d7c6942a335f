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


# Logical-plan node classes whose size estimates derive directly from
# file/scan statistics (possibly scaled by a filter-selectivity factor,
# which only shrinks them). Any node OUTSIDE this set — Join (child-size
# multiplication), Aggregate/Window (group-count guesses), Expand/Generate
# (row multiplication) — makes the estimate untrustworthy, so the walk is
# an ALLOWLIST that fails closed: an unknown node type degrades to the
# bare-frame path, never to a pinned shuffle on a possibly-tiny frame.
_SIZE_FAITHFUL_NODES = frozenset({
    "LogicalRelation",       # DSv1 file scan (parquet/csv): stats = file bytes
    "DataSourceV2Relation",  # DSv2 scan
    "DataSourceV2ScanRelation",
    "HiveTableRelation",
    "LocalRelation",         # literal rows: exact size
    "OneRowRelation",
    "Range",                 # exact row count
    "Project",               # column pruning scales size faithfully
    "Filter",                # selectivity estimate only shrinks
    "SubqueryAlias",
    "ResolvedHint",
    "LocalLimit",
    "GlobalLimit",
})


def _estimate_trustworthy(df: DataFrame) -> bool:
    """True when the frame is a scan/filter/project chain, whose size
    estimate reflects actual file bytes. A Join/Aggregate in the plan
    makes the estimate garbage-HIGH: Catalyst multiplies child sizes, so
    a 150-row customer⋈nation frame estimated at 2.87 GB at sf0.001
    (round-9 finding on local_supplier_volume) would trip any gate and
    pin a needless shuffle on a tiny frame.

    Classified by walking the optimized plan's node CLASSES (round-9
    advice: the previous rendered-text substring match could misfire on
    relation/column/path names containing "Join"/"Aggregate", and missed
    row-multiplying nodes like Expand/Generate entirely)."""
    try:
        stack = [df._jdf.queryExecution().optimizedPlan()]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() not in _SIZE_FAITHFUL_NODES:
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return True
    except Exception:
        return False


def maybe_broadcast(df: DataFrame, gate_bytes: int | None = None) -> DataFrame:
    """Size-gated join hint with estimate-quality awareness:

    * estimate under the gate → ``broadcast`` hint (pin the gate-scale
      plan against stat drift);
    * estimate over the gate AND trustworthy (scan/filter/project chain,
      where sizeInBytes is real file bytes) → ``merge`` hint (sort-merge
      join). The round-9 dim-growth probe (tools/dim_growth_probe.py:
      customer/part at 2048×, 30-41M rows) showed that with the hint
      merely ABSENT, AQE still picked broadcast from runtime
      compressed-shuffle sizes — one query 14× slow behind a 30M-row
      broadcast build, another dead with "Not enough memory to build and
      broadcast" — because compressed bytes undercount hashed-relation
      memory ~5-20× on high-row-count frames. The hint's job is to
      FORBID broadcast once the frame is provably large; among the
      non-broadcast strategies, sort-merge is the only one whose
      per-partition memory is bounded by the sorter's spill threshold —
      round 9 pinned ``shuffle_hash`` here, but a ShuffledHashJoin's
      build-side hash map cannot spill, so a skewed join key or a dim
      past the probed 2048× growth could OOM a single executor: the
      exact failure class the gate exists to prevent (round-9 advice).
    * estimate over the gate but NOT trustworthy (Join/Aggregate in the
      plan — Catalyst multiplies child sizes, inflating a 150-row frame
      to gigabytes) → return the frame BARE and let AQE decide from
      runtime stats, which are accurate for the genuinely-small derived
      frames this path sees (bounded keysets, per-group bounds).

    Unknown estimate ⇒ bare (fail safe either way: worst case is a
    shuffle join, never an oversized broadcast forced by a hint)."""
    if gate_bytes is None:
        try:
            gate_bytes = int(df.sparkSession.conf.get(_CONF_KEY, str(DEFAULT_GATE_BYTES)))
        except Exception:
            gate_bytes = DEFAULT_GATE_BYTES
    est = estimated_size_bytes(df)
    if est is not None and est <= gate_bytes:
        return F.broadcast(df)
    if est is not None and _estimate_trustworthy(df):
        return df.hint("merge")
    return df


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive parallelism guard for heavy per-row compute over a
    small-file scan (round 14, guide §2.5 "input skew — one huge
    unsplittable file"): when the frame's PLANNED partition count is
    below the session's defaultParallelism — a single-file local scan
    plans 1 task, so vectorized-expression work (md5 chains, 64-dim
    cosine trees) serializes on one core no matter how many exist —
    hash-repartition it by ``keys`` (round-robin when no keys) up to
    defaultParallelism. On a real cluster a corpus-sized scan already
    plans >= parallelism partitions and this returns the frame
    UNCHANGED — no exchange is added at scale, and the partition count
    derives from the session, never a local[32] constant. The partition
    probe is a driver-side plan walk (no job)."""
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — Connect / exotic plans: no probe
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if 0 < nparts < par:
        return (
            df.repartition(par, *[F.col(k) for k in keys])
            if keys
            else df.repartition(par)
        )
    return df
