"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join.

Not in the GeoTrellis reference (its temporal surface is SpaceTimeKey
slicing, covered by ``spatial.spacetime_join``); these are the two
temporal primitives a training-data pipeline needs on event streams —
"latest state as of each observation" and "observations inside each
window" — expressed as single-shuffle DataFrame plans, never a
theta-join.

Scale notes (100 TB):
- ``asof_join`` is ONE shuffle (hash-partition by key) + a sorted
  window per key — the same plan a sort-merge join would use, with no
  range explosion.  Skewed keys are bounded by per-user event counts,
  not by time range.
- ``interval_join`` buckets both sides to fixed-width epoch buckets so
  the candidate generator is an EQUI-join (broadcast- or
  shuffle-hash-joinable, AQE-skew-splittable); the inequality refine
  runs JVM-side on the joined rows.  A naive ``ts BETWEEN`` theta-join
  is a BroadcastNestedLoopJoin — O(n·m) — which this avoids by
  construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("snap_id", "snap_value"),
) -> DataFrame:
    """As-of join: for every left row, attach the right row with the
    greatest ``right.ts <= left.ts`` for the same ``on`` key (equal
    timestamps match; left rows with no prior right row keep NULLs —
    DuckDB ``ASOF LEFT JOIN`` semantics).

    ``right`` must be unique per (``on``, ``ts``) — dedupe upstream
    (e.g. ``max_by``) or matches are ambiguous.

    Plan: union both sides with a side marker, ONE window
    (partitionBy key, orderBy ts with right-before-left on ties),
    ``last(ignorenulls)`` carries the right columns forward, filter
    back to left rows.  One shuffle total; no per-row Python.
    """
    lmarked = left.withColumn("_side", F.lit(1))
    # the right columns travel as ONE struct so the forward fill is
    # row-atomic: filling each column independently would stitch
    # values from DIFFERENT right rows whenever a right column holds a
    # genuine NULL (the fill cannot tell it from a left-row placeholder)
    rmarked = right.select(
        on, ts, F.struct(*right_cols).alias("_rrow")
    ).withColumn("_side", F.lit(0))
    u = lmarked.unionByName(rmarked, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_rrow", F.last("_rrow", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(c, F.col(f"_rrow.{c}"))
    return out.drop("_side", "_rrow")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "t_start",
    end: str = "t_end",
    bucket_s: int = 2700,
) -> DataFrame:
    """Interval join: all ``points`` rows with ``start <= ts < end``
    for a same-key interval.  Intervals must be no wider than
    ``bucket_s`` seconds beyond bucket granularity concerns — any
    width works, but candidate fan-out per interval is
    ``ceil(width / bucket_s) + 1`` buckets, so pick ``bucket_s`` near
    the typical interval width.

    Plan: both sides bucket ``ts`` to ``floor(epoch / bucket_s)``;
    intervals EXPLODE to every bucket they overlap (``sequence`` —
    bounded by interval width), points keep their single bucket; the
    candidate generator is an equi-join on (key, bucket) — each point
    matches an interval in at most ONE bucket (its own), so no dedup
    is needed — and the ``BETWEEN`` refine runs JVM-side.
    """
    ep = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    # floor, not truncate-toward-zero: pre-1970 epochs would otherwise
    # collapse (-bucket_s, 0) and [0, bucket_s) into one double bucket
    bkt = lambda c: F.floor(ep(c) / bucket_s)  # noqa: E731
    # string aliases (not DataFrame column refs): both sides often
    # derive from the same source table, which trips Spark's
    # ambiguous-self-join lineage check on df["col"] references
    iv = intervals.withColumn(
        "_bkt", F.explode(F.sequence(bkt(start), bkt(end)))
    ).alias("_iv")
    pts = points.withColumn("_bkt", bkt(ts)).alias("_pt")
    joined = pts.join(
        iv,
        on=[
            F.col("_pt._bkt") == F.col("_iv._bkt"),
            F.col(f"_pt.{on}") == F.col(f"_iv.{on}"),
        ],
        how="inner",
    ).where(
        (F.col(f"_pt.{ts}") >= F.col(f"_iv.{start}"))
        & (F.col(f"_pt.{ts}") < F.col(f"_iv.{end}"))
    )
    keep = [F.col(f"_pt.{c}") for c in points.columns] + [
        F.col(f"_iv.{c}") for c in intervals.columns if c != on
    ]
    return joined.select(*keep)


def resample_ffill(
    df: DataFrame,
    on: str,
    ts: str = "ts",
    val_col: str = "val",
    ord_col: str = "ord",
    step_s: int = 86400,
) -> DataFrame:
    """Resample an irregular per-key series onto a fixed ``step_s``
    grid with forward fill: one output row per (key, bucket) from the
    key's first to last observation; ``val`` = the last observation
    at-or-before the bucket's end (ties within a bucket resolved by
    max ``ord_col``). Buckets before the first observation cannot
    occur (grid starts at it); gaps carry the previous value forward.

    Plan: per-key min/max -> ``sequence``-EXPLODE the bucket grid
    (bounded by span/step, not by data volume), left-join the
    per-bucket last observation (one aggregation), window forward-fill
    per key. Two shuffles total (agg + window share the key
    partitioning), no python.
    """
    ep = F.col(ts).cast("timestamp").cast("long")
    # floor (matches the DuckDB oracle's explicit floor) — cast-long
    # truncation would shift every pre-1970 bucket one late
    bkt = F.floor(ep / step_s)
    obs = (
        df.select(on, bkt.alias("bucket"), F.col(val_col), F.col(ord_col))
        .groupBy(on, "bucket")
        .agg(F.expr(f"max_by({val_col}, {ord_col})").alias("_v"))
    )
    grid = (
        df.select(on, bkt.alias("b"))
        .groupBy(on)
        .agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
        .select(on, F.explode(F.sequence("b0", "b1")).alias("bucket"))
    )
    w = (
        Window.partitionBy(on)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [on, "bucket"], "left")
        .withColumn(val_col, F.last("_v", ignorenulls=True).over(w))
        .drop("_v")
    )
