"""Structured-Streaming ingest (engine extension; the reference has NO
streaming — SURVEY.md §2.TS marks this parity-plus).

Pattern: ``readStream`` over an images source -> watermarked
micro-batches -> the SAME batch tiling kernels via ``foreachBatch``
(each micro-batch is cut+merged and appended Iceberg-shaped; merge
across batches happens at read time per first-wins ordinals, or via a
periodic compaction run of merge_tiles over the appended pieces).

The sandbox has no Kafka; tests use the ``rate`` source to synthesize
image rows per micro-batch — the plumbing (schema, watermark,
foreachBatch, checkpointLocation) is identical on a real bus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import synth
from ..operators import tiling
from ..sources import iceberg_shape as ice


def rate_images_stream(spark: SparkSession, rows_per_sec: int = 50) -> DataFrame:
    """Streaming images: rate source ordinals -> deterministic synth
    rows (same generator as batch, so results are oracle-checkable)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_sec
    ).load()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [synth.make_row(int(v)) for v in pdf["value"]]
            out = pd.DataFrame(
                rows, columns=[f.name for f in synth.IMAGES_SCHEMA.fields]
            )
            out["ts"] = pdf["timestamp"].to_numpy()
            yield out

    # StructType.add mutates in place — build a fresh copy so repeated
    # calls don't accumulate duplicate ts fields on IMAGES_SCHEMA
    from pyspark.sql.types import StructType, StructField, TimestampType

    schema = StructType(
        list(synth.IMAGES_SCHEMA.fields) + [StructField("ts", TimestampType())]
    )
    return rate.mapInPandas(gen, schema)


def start_tiling_stream(
    images_stream: DataFrame,
    warehouse: str,
    checkpoint_dir: str,
    zoom: int = 6,
    trigger_sec: int = 5,
    watermark: str = "30 seconds",
):
    """Tile each micro-batch with the batch kernels; append
    Iceberg-shaped. Late rows beyond the watermark are still tiled
    (tiling is per-row, not windowed); the watermark bounds state for
    any downstream windowed aggregation."""
    stamped = images_stream.withWatermark("ts", watermark)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tiles = tiling.tile_images(
            batch_df.drop("ts"), zoom, 256, salt_buckets=4,
            layer=f"stream-b{batch_id}",
        )
        ice.write_tiles(tiles, warehouse, mode="append")

    return (
        stamped.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_sec} seconds")
        .start()
    )


def windowed_tile_counts(
    images_stream: DataFrame, zoom: int = 6, window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming windowed aggregation example: tiles-touched per time
    window (uses the deterministic anchor math as JVM-side exprs)."""
    from ..functions import exprs

    n = (1 << zoom)
    keyed = images_stream.withWatermark("ts", watermark).selectExpr(
        "ts",
        f"cast(substring(image_id, 4) as bigint) as ord",
    ).selectExpr(
        "ts",
        f"{exprs.key_col_sql(exprs.lon_sql('ord'), zoom)} as key_col",
        f"{exprs.key_row_sql(exprs.lat_sql('ord'), zoom)} as key_row",
    )
    return keyed.groupBy(
        F.window("ts", window), "key_col", "key_row"
    ).agg(F.count("*").alias("n_images"))


def stateful_cell_tracker(
    images_stream: DataFrame, zoom: int = 6, watermark: str = "30 seconds",
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the brief's pattern for operators Spark's windowed aggs can't
    express): per layout cell, maintain a running (n_images, min_ord,
    max_ord) state across micro-batches and emit the updated row each
    trigger; idle cells time out and emit a final tombstone row
    (done=true). The state is a pure function of the data keys, so a
    restart from checkpoint resumes it exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from ..functions import exprs

    keyed = images_stream.withWatermark("ts", watermark).selectExpr(
        "ts",
        "cast(substring(image_id, 4) as bigint) as ord",
    ).selectExpr(
        "ord",
        f"{exprs.key_col_sql(exprs.lon_sql('ord'), zoom)} as key_col",
        f"{exprs.key_row_sql(exprs.lat_sql('ord'), zoom)} as key_row",
    )

    out_schema = (
        "key_col long, key_row long, n_images long, min_ord long, "
        "max_ord long, done boolean"
    )
    state_schema = "n long, mn long, mx long"

    def track(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        kc, kr = int(key[0]), int(key[1])
        if state.hasTimedOut:
            n, mn, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [{"key_col": kc, "key_row": kr, "n_images": n,
                  "min_ord": mn, "max_ord": mx, "done": True}]
            )
            return
        n, mn, mx = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            o = pdf["ord"].to_numpy()
            n += len(o)
            mn = int(o.min()) if mn is None else min(mn, int(o.min()))
            mx = int(o.max()) if mx is None else max(mx, int(o.max()))
        state.update((n, mn, mx))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{"key_col": kc, "key_row": kr, "n_images": n,
              "min_ord": mn, "max_ord": mx, "done": False}]
        )

    return keyed.groupBy("key_col", "key_row").applyInPandasWithState(
        track, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def asof_enrich_stream(
    events_stream: DataFrame,
    dim: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("snap_id", "snap_value"),
    watermark: str = "30 seconds",
):
    """Streaming as-of enrichment: every event picks up the latest
    dimension snapshot with ``dim.ts <= event.ts`` for its key —
    Spark has no built-in streaming as-of join, so each micro-batch
    runs the batch ``temporal.asof_join`` (single-shuffle union+window)
    against the static dimension inside ``foreachBatch``. Per-batch
    results equal the batch join because as-of is row-local given the
    full dimension: each LEFT row's match depends only on its own key
    and timestamp, never on other left rows, so batching the left side
    arbitrarily cannot change any match (proven by the e2e test).

    Output lands at ``out_dir/batch_id=<id>`` with OVERWRITE — batch_id
    keys the write, so a foreachBatch replay after a failure/restart
    (at-least-once semantics) rewrites its own directory instead of
    appending duplicates; read ``out_dir`` as one partitioned table."""
    from ..operators.temporal import asof_join

    dim = dim.localCheckpoint()  # pin: re-read per batch otherwise

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        asof_join(batch_df, dim, on, ts, right_cols).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/batch_id={int(batch_id)}")

    return (
        events_stream.withWatermark(ts, watermark)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stateful_asof_stream(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str = "key",
    ts: str = "ts",
    watermark: str = "30 seconds",
):
    """STREAM-STREAM as-of join via ``applyInPandasWithState`` — the
    temporal-table join Spark lacks (Flink's ``FOR SYSTEM_TIME AS OF``
    role): per key, state holds the latest right row seen; each left
    row emits with the right row whose ``ts`` most recently preceded
    it.

    Contract (the same one Flink's processing-order temporal join
    documents): per key, rows must arrive in event-time order ACROSS
    the two streams (right snapshots published before the left events
    that should see them). Under that contract the result equals the
    batch ``temporal.asof_join`` exactly — e2e-tested; out-of-order
    arrivals match against the latest right seen SO FAR (best-effort,
    like any processing-order temporal join; for exactness under
    bounded disorder use ``watermark_asof_stream``). State per key is ONE
    (ts, snap_id, snap_value) triple — bounded regardless of stream
    length.

    Inputs: left (key, ts, event_id), right (key, ts, snap_id,
    snap_value). Output: left columns + snap_id/snap_value (NULL
    before the first snapshot)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    tagged = left_stream.selectExpr(
        f"{on} as key", f"{ts} as ts", "event_id",
        "cast(null as long) as snap_id",
        "cast(null as double) as snap_value",
        "1 as side",
    ).unionByName(
        right_stream.selectExpr(
            f"{on} as key", f"{ts} as ts",
            "cast(null as long) as event_id",
            "snap_id", "snap_value", "0 as side",
        )
    ).withWatermark("ts", watermark)

    out_schema = (
        "key long, ts timestamp, event_id long, snap_id long, "
        "snap_value double"
    )
    state_schema = "rts timestamp, rid long, rval double"

    def join_fn(key, pdfs, state):
        if state.exists:
            rts, rid, rval = state.get
        else:
            rts = rid = rval = None
        outs = []
        # materialize ALL Arrow chunks first: a key's micro-batch can
        # span chunks, and sorting per chunk would replay rows in
        # shuffle order ACROSS chunks (a left could miss a right that
        # lands in a later chunk with an earlier ts). One concat + one
        # sort; state per key stays one triple.
        chunks = list(pdfs)
        if not chunks:  # timeout-less invocations always carry data,
            return      # but guard the empty-iterator edge anyway
        pdf = pd.concat(chunks, ignore_index=True)
        # event-time order within the batch; rights before lefts on
        # equal timestamps (asof_join's tie rule)
        pdf = pdf.sort_values(["ts", "side"], kind="mergesort")
        for r in pdf.itertuples(index=False):
            if r.side == 0:
                rts, rid, rval = r.ts, int(r.snap_id), float(r.snap_value)
            else:
                outs.append(
                    (key[0], r.ts, int(r.event_id), rid, rval)
                )
        state.update((rts, rid, rval))
        if outs:
            yield pd.DataFrame(
                outs,
                columns=["key", "ts", "event_id", "snap_id", "snap_value"],
            )

    return tagged.groupBy("key").applyInPandasWithState(
        join_fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def watermark_asof_stream(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str = "key",
    ts: str = "ts",
    watermark: str = "30 seconds",
):
    """Stream-stream as-of join under BOUNDED DISORDER — the
    watermark-correct upgrade of ``stateful_asof_stream`` (which
    requires per-key event-time-ordered arrival): rows may arrive in
    ANY order within the watermark, and the emitted rows still equal
    the batch ``temporal.asof_join`` exactly.

    Mechanism (the Flink watermark-temporal-join pattern, via
    ``applyInPandasWithState`` + event-time timeout):

    - per key, state BUFFERS pending left events and right snapshots
      (epoch-micros arrays — bounded by the rows inside the watermark
      horizon) plus one compacted "floor" right (the latest snapshot
      older than everything already finalized).
    - a left event is emitted only once the watermark passes its
      timestamp — at that point no earlier right can still arrive, so
      "latest right with rts <= lts" (rights win ties, asof_join's
      rule) is final.
    - rights older than the watermark compact to the single floor
      triple; an event-time timeout (set to the earliest pending
      left) flushes keys even in batches where they receive no data.

    Late rows beyond the watermark are dropped by Spark before the
    state function sees them — the standard contract. Emission lags
    arrival by up to the watermark delay (the price of exactness).

    Inputs/output match ``stateful_asof_stream``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    tagged = left_stream.selectExpr(
        f"{on} as key", f"{ts} as ts", "event_id",
        "cast(null as long) as snap_id",
        "cast(null as double) as snap_value",
        "1 as side",
    ).unionByName(
        right_stream.selectExpr(
            f"{on} as key", f"{ts} as ts",
            "cast(null as long) as event_id",
            "snap_id", "snap_value", "0 as side",
        )
    ).withWatermark("ts", watermark)

    out_schema = (
        "key long, ts timestamp, event_id long, snap_id long, "
        "snap_value double"
    )
    state_schema = (
        "lts array<long>, lid array<long>, "
        "rts array<long>, rid array<long>, rval array<double>, "
        "fts long, fid long, fval double"
    )

    def join_fn(key, pdfs, state):
        if state.exists:
            lts, lid, rts, rid, rval, fts, fid, fval = state.get
            lts, lid = list(lts), list(lid)
            rts, rid, rval = list(rts), list(rid), list(rval)
        else:
            lts, lid, rts, rid, rval = [], [], [], [], []
            fts = fid = fval = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = (pdf["ts"].astype("datetime64[ns]").astype("int64")
                  // 1000)
            for t_us, side, eid, sid, sval in zip(
                us, pdf["side"], pdf["event_id"], pdf["snap_id"],
                pdf["snap_value"],
            ):
                if side == 0:
                    rts.append(int(t_us))
                    rid.append(int(sid))
                    rval.append(float(sval))
                else:
                    lts.append(int(t_us))
                    lid.append(int(eid))

        wm_us = state.getCurrentWatermarkMs() * 1000
        outs = []
        if lts:
            import bisect

            # finalize lefts STRICTLY below the watermark, oldest
            # first. Spark's late filter drops only rows strictly
            # below the watermark, so a right with rts == wm can still
            # arrive — and rights win ties (rts <= lts), so a left at
            # exactly wm is not final yet.
            rs = sorted(zip(rts, rid, rval))
            rkeys = [r[0] for r in rs]
            order = sorted(range(len(lts)), key=lambda i: (lts[i], lid[i]))
            keep_l = []
            for i in order:
                if lts[i] >= wm_us:
                    keep_l.append(i)
                    continue
                # latest right with rts <= lts: one bisect over the
                # sorted buffer (buffered rights are never older than
                # the floor — they arrived at or after a watermark the
                # floor was folded strictly below)
                bt, bi, bv = fts, fid, fval
                j = bisect.bisect_right(rkeys, lts[i]) - 1
                # (rts, rid) tuple compare: on a timestamp tie between
                # the buffer and the floor, the larger snap_id wins —
                # the batch asof_join's max_by(_, event_id) tie rule
                if j >= 0 and (bt is None or (rs[j][0], rs[j][1]) > (bt, bi)):
                    bt, bi, bv = rs[j]
                outs.append((key[0], lts[i], lid[i], bi, bv))
            lts, lid = [lts[i] for i in keep_l], [lid[i] for i in keep_l]
        # compact rights: everything STRICTLY below the watermark can
        # never beat the latest such snapshot for any still-pending
        # left (pending lefts have lts >= wm) — fold into the floor
        keep_r = []
        for j in range(len(rts)):
            if rts[j] < wm_us:
                # deterministic fold: (rts, rid) tuple max, not
                # arrival-order overwrite — two right snapshots sharing
                # one timestamp would otherwise yield different snap_id
                # depending on whether they match from the buffer
                # (sorted + bisect -> max rid) or after compaction
                if fts is None or (rts[j], rid[j]) > (fts, fid):
                    fts, fid, fval = rts[j], rid[j], rval[j]
            else:
                keep_r.append(j)
        rts = [rts[j] for j in keep_r]
        rid = [rid[j] for j in keep_r]
        rval = [rval[j] for j in keep_r]

        state.update((lts, lid, rts, rid, rval, fts, fid, fval))
        if lts:
            # flush pending lefts when the watermark passes the
            # earliest one, even if this key gets no more data
            state.setTimeoutTimestamp(min(lts) // 1000 + 1)
        if outs:
            df = pd.DataFrame(
                outs,
                columns=["key", "ts", "event_id", "snap_id", "snap_value"],
            )
            df["ts"] = pd.to_datetime(df["ts"], unit="us")
            yield df

    return tagged.groupBy("key").applyInPandasWithState(
        join_fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )
