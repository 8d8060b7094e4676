"""Structured-Streaming ingest smoke: rate-source images ->
foreachBatch tiling -> Iceberg-shaped appends (parity-plus; the
reference has no streaming)."""

import time

import pytest

from geotrellis_spark.streaming import ingest_stream


def test_streaming_tiling(spark, tmp_path):
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    stream = ingest_stream.rate_images_stream(spark, rows_per_sec=40)
    q = ingest_stream.start_tiling_stream(
        stream, wh, ckpt, zoom=4, trigger_sec=3
    )
    try:
        # poll the snapshot table — it is written LAST per micro-batch,
        # so its presence means at least one batch fully committed
        deadline = time.time() + 120
        committed = False
        while time.time() < deadline and not committed:
            time.sleep(5)
            try:
                committed = (
                    spark.read.parquet(f"{wh}/_meta/snapshots").count() >= 1
                )
            except Exception:
                continue
    finally:
        q.stop()
    assert committed, "no micro-batch fully committed within 120s"
    tiles = spark.read.parquet(f"{wh}/tiles")
    assert tiles.count() > 0
    row = tiles.limit(1).collect()[0]
    assert row["zoom"] == 4 and row["fmt"] in ("raw16", "png")


def test_streaming_windowed_counts_plan(spark):
    """The windowed agg builds a valid streaming plan (watermark +
    window) — checked by starting with a memory sink for one trigger."""
    for old in spark.streams.active:  # isolate from prior test's query
        old.stop()
    stream = ingest_stream.rate_images_stream(spark, rows_per_sec=50)
    counts = ingest_stream.windowed_tile_counts(stream, zoom=4)
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(processingTime="3 seconds")
        .start()
    )
    try:
        time.sleep(15)
        assert q.isActive or q.exception() is None
    finally:
        q.stop()
    # append mode only emits closed windows; plan validity is the
    # assertion — rows may or may not have flushed within the wait
    assert spark.table("win_counts").columns == ["window", "key_col", "key_row", "n_images"]


def test_stateful_cell_tracker(spark):
    """applyInPandasWithState custom operator: running per-cell counts
    accumulate ACROSS micro-batches (state survives triggers)."""
    for old in spark.streams.active:
        old.stop()
    stream = ingest_stream.rate_images_stream(spark, rows_per_sec=60)
    tracked = ingest_stream.stateful_cell_tracker(stream, zoom=4)
    q = (
        tracked.writeStream.format("memory")
        .queryName("cell_state")
        .outputMode("append")
        .trigger(processingTime="3 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        ok = False
        while time.time() < deadline and not ok:
            time.sleep(5)
            rows = spark.table("cell_state").collect()
            # a cell emitted more than once must show a non-decreasing
            # running count (state carried across batches)
            by_cell = {}
            for r in rows:
                by_cell.setdefault((r["key_col"], r["key_row"]), []).append(
                    r["n_images"]
                )
            multi = [v for v in by_cell.values() if len(v) >= 2]
            ok = bool(multi) and all(
                all(a <= b for a, b in zip(v, v[1:])) for v in multi
            )
    finally:
        q.stop()
    assert ok, "no cell accumulated state across micro-batches within 90s"


def test_streaming_watermarked_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a keyed stream: duplicate
    image ids arriving within the watermark window are emitted once
    (the streaming twin of exact dedup — state is bounded by the
    watermark, which is what makes it viable on an unbounded stream)."""
    import pyspark.sql.functions as F

    for old in spark.streams.active:
        old.stop()
    stream = ingest_stream.rate_images_stream(spark, rows_per_sec=50)
    # duplicate every row under the same dedup key (img_id // 2)
    dup = stream.withColumn(
        "dedup_key", F.expr("cast(substring(image_id, 4, 15) as bigint) div 2")
    )
    deduped = (
        dup.withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["dedup_key"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = dups = 0
        while time.time() < deadline:
            time.sleep(4)
            rows = spark.sql(
                "select dedup_key, count(*) c from dedup_stream group by 1"
            ).collect()
            n = len(rows)
            dups = sum(1 for r in rows if r["c"] > 1)
            if n >= 5:
                break
    finally:
        q.stop()
    assert n >= 5, f"only {n} deduped keys arrived"
    assert dups == 0, "watermarked dedup emitted a key twice"


def test_streaming_static_enrichment_join(spark):
    """Stream-static broadcast enrichment: the streaming image rows
    join a static dimension (per-id class lookup) inside the stream —
    the lookup-table pattern a training-data stream uses for labels."""
    import pyspark.sql.functions as F

    for old in spark.streams.active:
        old.stop()
    dim = spark.range(10).selectExpr(
        "id as clsk", "concat('class_', id) as label"
    )
    stream = ingest_stream.rate_images_stream(spark, rows_per_sec=50)
    enriched = stream.withColumn(
        "clsk", F.expr("cast(substring(image_id, 4, 15) as bigint) % 10")
    ).join(F.broadcast(dim), "clsk")
    q = (
        enriched.select("image_id", "label")
        .writeStream.format("memory")
        .queryName("enriched_stream")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline and n < 20:
            time.sleep(4)
            n = spark.sql("select count(*) c from enriched_stream").collect()[0]["c"]
    finally:
        q.stop()
    assert n >= 20
    rows = spark.sql(
        "select image_id, label from enriched_stream limit 50"
    ).collect()
    for r in rows:
        expect = int(r["image_id"][3:]) % 10
        assert r["label"] == f"class_{expect}"


def test_streaming_curation_equals_batch(spark, tmp_path):
    """e2e (round-4 verdict item 7): stream the documents table in 3
    micro-batches (file source, maxFilesPerTrigger=1, one row
    duplicated across batches to exercise the watermarked dedup);
    the curated snapshot after the stream drains must EQUAL the batch
    curation job run once over the same union of rows."""
    import pandas as pd
    from geotrellis_spark.operators.curation import curate
    from geotrellis_spark.streaming.curate_stream import curate_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    parts = [pdf.iloc[0::3], pdf.iloc[1::3], pdf.iloc[2::3]]
    # duplicate one full row from batch 0 into batch 1
    parts[1] = pd.concat([parts[1], parts[0].iloc[[0]]])

    src = tmp_path / "src"
    src.mkdir()
    for i, p in enumerate(parts):
        p.to_parquet(src / f"batch_{i}.parquet", index=False)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .selectExpr(
            "*",
            "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,doc_id) as ts",
        )
    )
    q = curate_stream(
        stream,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        per_stratum=20,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.read.parquet(str(tmp_path / "out" / "docs"))
        .select("doc_id").toPandas()["doc_id"].sort_values().tolist()
    )
    want_df, _ = curate(spark, docs, per_stratum=20)
    want = (
        want_df.select("doc_id").toPandas()["doc_id"].sort_values().tolist()
    )
    assert got == want and len(got) > 0
    # metrics were recorded for at least the final recuration
    import glob
    assert glob.glob(str(tmp_path / "out" / "_metrics" / "batch_*.json"))


def test_streaming_curation_tail_fold_recurate(spark, tmp_path):
    """recurate_every > 1 leaves tail batches out of the snapshot until
    the next cadence hit; an explicit recurate() after the stream stops
    folds them, restoring snapshot == batch-job over ALL staged rows."""
    import pandas as pd
    from geotrellis_spark.operators.curation import curate
    from geotrellis_spark.streaming.curate_stream import (
        curate_stream, recurate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        pdf.iloc[i::3].to_parquet(src / f"b{i}.parquet", index=False)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .selectExpr(
            "*",
            "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,doc_id) as ts",
        )
    )
    out = tmp_path / "out"
    q = curate_stream(
        stream, out_dir=str(out), checkpoint_dir=str(tmp_path / "ckpt"),
        per_stratum=20, recurate_every=5,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # only batch_id 0 recurated: snapshot is stale vs the full corpus
    stale = set(
        spark.read.parquet(str(out / "docs")).toPandas()["doc_id"]
    )
    want_df, _ = curate(spark, docs, per_stratum=20)
    want = set(want_df.toPandas()["doc_id"])
    assert stale != want  # proves the cadence really skipped batches
    recurate(spark, str(out), per_stratum=20)
    got = set(spark.read.parquet(str(out / "docs")).toPandas()["doc_id"])
    assert got == want


def test_minhash_missing_signatures_raises(spark):
    """A signature store missing docs must fail loudly, not silently
    skip near-dup detection for them."""
    import pytest
    from geotrellis_spark.operators import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    partial = dedup.minhash_signatures(docs.limit(30))
    with pytest.raises(ValueError, match="missing"):
        dedup.minhash_candidates(docs, signatures=partial).collect()


def test_streaming_asof_enrichment_equals_batch(spark, tmp_path):
    """Streaming as-of enrichment: events streamed in 3 micro-batches,
    each batch as-of joined against a static snapshot dimension; the
    appended union must EQUAL the batch asof_join over all events
    (as-of is row-local given the full dimension)."""
    import datetime as dt
    import pandas as pd
    from geotrellis_spark.operators.temporal import asof_join
    from geotrellis_spark.streaming.ingest_stream import asof_enrich_stream

    t0 = dt.datetime(2026, 1, 1)
    dim = spark.createDataFrame(
        [(k, t0 + dt.timedelta(minutes=m), m * 10 + k, float(m))
         for k in (1, 2) for m in (0, 30, 60)],
        "key long, ts timestamp, snap_id long, snap_value double",
    )
    ev = pd.DataFrame({
        "event_id": range(60),
        "key": [1 + (i % 2) for i in range(60)],
        "ts": pd.to_datetime(
            [t0 + dt.timedelta(minutes=i * 2 - 5) for i in range(60)]
        ).astype("datetime64[us]"),
    })
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        ev.iloc[i::3].to_parquet(src / f"b{i}.parquet", index=False)
    stream = (
        spark.readStream.schema("event_id long, key long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = tmp_path / "enriched"
    q = asof_enrich_stream(
        stream, dim, str(out), str(tmp_path / "ckpt"), on="key",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.read.parquet(str(out)).drop("batch_id")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    events = spark.createDataFrame(ev)
    want = (
        asof_join(events, dim, "key").toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
    # sanity: pre-dimension events carry NULLs, later ones snapshots
    assert got["snap_id"].isna().any() and got["snap_id"].notna().any()


def test_streaming_curation_pair_store_equals_batch(spark, tmp_path):
    """Incremental pair maintenance: with pair_store=True each batch
    joins only its new docs against touched buckets and appends the
    new pairs; the snapshot after 3 micro-batches must still equal the
    batch curation job exactly (pairs filter to exact-dedup survivors;
    components are cap-invariant)."""
    from geotrellis_spark.operators.curation import curate
    from geotrellis_spark.streaming.curate_stream import curate_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        pdf.iloc[i::3].to_parquet(src / f"b{i}.parquet", index=False)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .selectExpr(
            "*",
            "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,doc_id) as ts",
        )
    )
    out = tmp_path / "out"
    q = curate_stream(
        stream, out_dir=str(out), checkpoint_dir=str(tmp_path / "ckpt"),
        per_stratum=20, pair_store=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        spark.read.parquet(str(out / "docs")).toPandas()["doc_id"]
    )
    want_df, _ = curate(spark, docs, per_stratum=20)
    want = sorted(want_df.toPandas()["doc_id"])
    assert got == want and got
    # the pair store holds normalized pairs covering the corpus graph
    pairs = spark.read.parquet(str(out / "staging_pairs"))
    r = pairs.selectExpr("min(doc_a < doc_b) as ok").collect()[0]
    assert r["ok"] and pairs.count() > 0


def test_stateful_asof_stream_equals_batch(spark, tmp_path):
    """Stream-stream as-of via applyInPandasWithState: with per-key
    event-time-ordered arrival (the temporal-join contract), the
    emitted rows equal the batch asof_join exactly — including events
    before the first snapshot (NULLs) and the rights-win-ties rule."""
    import datetime as dt
    import pandas as pd
    from geotrellis_spark.operators.temporal import asof_join
    from geotrellis_spark.streaming.ingest_stream import stateful_asof_stream

    for old in spark.streams.active:
        old.stop()
    t0 = dt.datetime(2026, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rights = pd.DataFrame({
        "key": [1, 2, 1, 2, 1],
        "ts": pd.to_datetime([ts(10), ts(10), ts(40), ts(40), ts(70)]
                             ).astype("datetime64[us]"),
        "snap_id": [110, 210, 140, 240, 170],
        "snap_value": [1.0, 2.0, 1.4, 2.4, 1.7],
    })
    lefts = pd.DataFrame({
        "key": [1 + (i % 2) for i in range(40)],
        "ts": pd.to_datetime([ts(i * 2) for i in range(40)]
                             ).astype("datetime64[us]"),
        "event_id": list(range(40)),
    })
    # one file per stream: in-order within each; state machine orders
    # rights-before-lefts on equal ts
    (tmp_path / "L").mkdir(); (tmp_path / "R").mkdir()
    lefts.to_parquet(tmp_path / "L" / "l.parquet", index=False)
    rights.to_parquet(tmp_path / "R" / "r.parquet", index=False)
    ls = spark.readStream.schema(
        "key long, ts timestamp, event_id long").parquet(str(tmp_path / "L"))
    rs = spark.readStream.schema(
        "key long, ts timestamp, snap_id long, snap_value double"
    ).parquet(str(tmp_path / "R"))
    joined = stateful_asof_stream(ls, rs)
    q = (
        joined.writeStream.format("memory").queryName("asof_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["event_id"], r["snap_id"], r["snap_value"])
        for r in spark.table("asof_state").collect()
    }
    want = {
        (r["event_id"], r["snap_id"], r["snap_value"])
        for r in asof_join(
            spark.createDataFrame(lefts), spark.createDataFrame(rights), "key"
        ).collect()
    }
    assert got == want and len(got) == 40


def test_watermark_asof_stream_out_of_order(spark, tmp_path):
    """watermark_asof_stream: rows arrive SHUFFLED (within and across
    micro-batches, both streams) inside the watermark — emitted rows
    still equal the batch asof_join exactly. Lefts are held until the
    watermark passes them; an event-time timeout flushes keys in
    batches where they get no data."""
    import datetime as dt
    import random

    import pandas as pd

    from geotrellis_spark.operators.temporal import asof_join
    from geotrellis_spark.streaming.ingest_stream import watermark_asof_stream

    for old in spark.streams.active:
        old.stop()
    t0 = dt.datetime(2026, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rights = pd.DataFrame({
        "key": [1, 2, 1, 2, 1, 2],
        "ts": pd.to_datetime([ts(10), ts(12), ts(40), ts(38), ts(70),
                              ts(66)]).astype("datetime64[us]"),
        "snap_id": [110, 210, 140, 240, 170, 270],
        "snap_value": [1.0, 2.0, 1.4, 2.4, 1.7, 2.6],
    })
    lefts = pd.DataFrame({
        "key": [1 + (i % 2) for i in range(40)],
        "ts": pd.to_datetime([ts(i * 2) for i in range(40)]
                             ).astype("datetime64[us]"),
        "event_id": list(range(40)),
    })
    rng = random.Random(5)
    lshuf = lefts.sample(frac=1.0, random_state=7).reset_index(drop=True)
    rshuf = rights.sample(frac=1.0, random_state=9).reset_index(drop=True)
    (tmp_path / "L").mkdir(); (tmp_path / "R").mkdir()
    # two shuffled files per stream (multi-batch via maxFilesPerTrigger)
    lshuf.iloc[:20].to_parquet(tmp_path / "L" / "l1.parquet", index=False)
    lshuf.iloc[20:].to_parquet(tmp_path / "L" / "l2.parquet", index=False)
    rshuf.iloc[:3].to_parquet(tmp_path / "R" / "r1.parquet", index=False)
    rshuf.iloc[3:].to_parquet(tmp_path / "R" / "r2.parquet", index=False)

    ls = spark.readStream.schema(
        "key long, ts timestamp, event_id long"
    ).option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "L"))
    rs = spark.readStream.schema(
        "key long, ts timestamp, snap_id long, snap_value double"
    ).option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "R"))
    joined = watermark_asof_stream(ls, rs, watermark="2 hours")
    q = (
        joined.writeStream.format("memory").queryName("asof_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        q.processAllAvailable()
        # far-future sentinel rights advance the watermark past all
        # data; the SECOND one triggers the batch in which the (now
        # expired) event-time timeouts flush every pending key
        for n, hours in (("s1", 10), ("s2", 20)):
            pd.DataFrame({
                "key": [1],
                "ts": pd.to_datetime([t0 + dt.timedelta(hours=hours)]
                                     ).astype("datetime64[us]"),
                "snap_id": [999], "snap_value": [9.9],
            }).to_parquet(tmp_path / "R" / f"{n}.parquet", index=False)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["event_id"], r["snap_id"], r["snap_value"])
        for r in spark.table("asof_wm").collect()
    }
    want = {
        (r["event_id"], r["snap_id"], r["snap_value"])
        for r in asof_join(
            spark.createDataFrame(lefts), spark.createDataFrame(rights),
            "key",
        ).collect()
    }
    assert got == want and len(got) == 40


def test_watermark_asof_stream_right_ts_tie_deterministic(spark, tmp_path):
    """Two right snapshots sharing one timestamp must yield the SAME
    snap_id (the max — the batch max_by tie rule) whether a left
    matches them from the sorted buffer or from the compacted floor.
    The floor fold previously used arrival-order overwrite, so a
    smaller snap_id arriving later silently won the tie on the
    compaction path only. Arrival order here puts the larger id FIRST
    so the old behavior would emit 110 for the floor-path left."""
    import datetime as dt

    import pandas as pd

    from geotrellis_spark.streaming.ingest_stream import (
        watermark_asof_stream,
    )

    for old in spark.streams.active:
        old.stop()
    t0 = dt.datetime(2026, 1, 1)

    def ts(minutes):
        return pd.to_datetime(
            [t0 + dt.timedelta(minutes=minutes)]
        ).astype("datetime64[us]")

    (tmp_path / "L").mkdir(); (tmp_path / "R").mkdir()

    ls = spark.readStream.schema(
        "key long, ts timestamp, event_id long"
    ).option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "L"))
    rs = spark.readStream.schema(
        "key long, ts timestamp, snap_id long, snap_value double"
    ).option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "R"))
    joined = watermark_asof_stream(ls, rs, watermark="2 hours")
    q = (
        joined.writeStream.format("memory").queryName("asof_tie")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        # tied rights at 10min FIRST (watermark still 0 — the 9h left
        # would advance it past them and Spark would drop them as
        # late): LARGER id arrives before the smaller one, so the old
        # arrival-order floor fold would keep 110
        for n, (m, sid, sval) in enumerate(
            [(10, 111, 1.11), (10, 110, 1.10)]
        ):
            pd.DataFrame({
                "key": [1], "ts": ts(m),
                "snap_id": [sid], "snap_value": [sval],
            }).to_parquet(tmp_path / "R" / f"r{n}.parquet", index=False)
            q.processAllAvailable()
        # lefts: ts=20min finalizes while the tied rights are still in
        # the BUFFER; ts=9h finalizes after they fold into the FLOOR
        pd.DataFrame({
            "key": [1, 1],
            "ts": pd.to_datetime(
                [t0 + dt.timedelta(minutes=20), t0 + dt.timedelta(hours=9)]
            ).astype("datetime64[us]"),
            "event_id": [1, 2],
        }).to_parquet(tmp_path / "L" / "l1.parquet", index=False)
        q.processAllAvailable()
        # sentinels walk the watermark forward: 10h (wm 7h from the
        # left batch finalizes left 1 from the buffer and compacts the
        # tied rights), 13h -> wm 8-11h, 25h (finalizes left 2 from
        # the floor and flushes)
        for n, m in enumerate([600, 780, 1500]):
            pd.DataFrame({
                "key": [1], "ts": ts(m),
                "snap_id": [999], "snap_value": [9.9],
            }).to_parquet(tmp_path / "R" / f"s{n}.parquet", index=False)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["event_id"], r["snap_id"])
        for r in spark.table("asof_tie").collect()
    }
    # both paths pick the max snap_id of the tied pair
    assert got == {(1, 111), (2, 111)}


def test_streaming_capped_pair_store_equals_batch(spark, tmp_path):
    """CAPPED pair store (max_bucket): pair sets are NOT monotone — a
    late-arriving small-id doc displaces a bucket representative, so
    the stream must REPLACE the touched partitions, not append. After
    streaming a corpus with a bucket-overflow batch (20 identical
    boilerplate docs >> cap=4) whose smallest id arrives LAST, the
    stored pair set equals batch minhash_candidates(max_bucket=4)
    exactly, and the curated snapshot equals the batch job."""
    import pandas as pd

    from geotrellis_spark.operators import dedup
    from geotrellis_spark.operators.curation import curate
    from geotrellis_spark.streaming.curate_stream import curate_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    # 25 words, 7 stopwords: PASSES the quality gate (n_words >= 20,
    # stop*10 >= words) so the hot docs reach the band store
    hot_text = (
        "the same exact boilerplate paragraph is repeated verbatim in "
        "each and every one of these documents so that it will "
        "overflow a single lsh bucket"
    )
    tmpl = base.iloc[0]
    hot = pd.DataFrame([
        {**{c: tmpl[c] for c in base.columns},
         "doc_id": i, "text": hot_text}
        for i in [9999] + list(range(10001, 10020))
    ])[list(base.columns)]
    all_docs = pd.concat([base, hot], ignore_index=True)

    src = tmp_path / "src"
    src.mkdir()
    # batches: base third + some hot each; the smallest hot id (9999,
    # the final representative) arrives in the LAST batch
    b0 = pd.concat([base.iloc[0::3], hot.iloc[1:8]])
    b1 = pd.concat([base.iloc[1::3], hot.iloc[8:20]])
    b2 = pd.concat([base.iloc[2::3], hot.iloc[0:1]])  # 9999 last
    for i, b in enumerate((b0, b1, b2)):
        b.to_parquet(src / f"b{i}.parquet", index=False)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .selectExpr(
            "*",
            # bounded event times: the raw hot ids (9999+) as seconds
            # would advance the dedup watermark hours past the base
            # docs and drop later batches as late
            "timestamp'2026-01-01'"
            " + make_interval(0,0,0,0,0,0,pmod(doc_id, 1000)) as ts",
        )
    )
    out = tmp_path / "out"
    q = curate_stream(
        stream, out_dir=str(out), checkpoint_dir=str(tmp_path / "ckpt"),
        per_stratum=20, pair_store=True, max_bucket=4,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_df = spark.createDataFrame(all_docs, schema=docs.schema)
    # the store is built over quality-gated docs (see curate_stream);
    # the batch twin is the capped enumeration over the same gated set
    from geotrellis_spark.operators.text import quality_score

    gated = all_df.join(
        quality_score(all_df).where("is_quality").select("doc_id"),
        "doc_id",
    )
    want_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(gated, max_bucket=4).collect()
    }
    got_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(str(out / "staging_pairs"))
        .select("doc_a", "doc_b").distinct().collect()
    }
    assert got_pairs == want_pairs and got_pairs
    # the displaced representative is real: 9999 pairs as doc_a with
    # every other hot doc (cap tails pair with the bucket MINIMUM)
    assert {(9999, i) for i in range(10001, 10020)} <= got_pairs
    # and the curated snapshot still equals the batch job (components
    # are cap-invariant)
    got = sorted(
        spark.read.parquet(str(out / "docs")).toPandas()["doc_id"]
    )
    want_df, _ = curate(spark, all_df, per_stratum=20)
    want = sorted(want_df.toPandas()["doc_id"])
    assert got == want and got


def test_streaming_curation_with_decontamination(spark, tmp_path):
    """curate_stream(bench=...): the streamed snapshot equals the
    batch curate(bench=...) job — decontamination included in every
    recuration."""
    from geotrellis_spark.operators.curation import curate
    from geotrellis_spark.streaming.curate_stream import curate_stream

    import pyspark.sql.functions as F

    from geotrellis_spark.operators.text import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # benchmark = copies of QUALITY-GATED corpus docs (short synthetic
    # texts: only quality docs can be flagged, and only near-copies
    # clear the selective threshold below)
    qdocs = docs.join(
        quality_score(docs).where("is_quality").select("doc_id"), "doc_id"
    )
    bench_src = {r["doc_id"] for r in qdocs.select("doc_id").collect()
                 if r["doc_id"] % 3 == 0}
    bench = qdocs.where(F.col("doc_id").isin(list(bench_src))).selectExpr(
        "doc_id + 1000000 as doc_id", "text"
    )
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        pdf.iloc[i::2].to_parquet(src / f"b{i}.parquet", index=False)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .selectExpr(
            "*",
            "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,doc_id) as ts",
        )
    )
    out = tmp_path / "out"
    q = curate_stream(
        stream, out_dir=str(out), checkpoint_dir=str(tmp_path / "ckpt"),
        per_stratum=20, bench=bench, min_shared=75,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        spark.read.parquet(str(out / "docs")).toPandas()["doc_id"]
    )
    want_df, stats = curate(
        spark, docs, per_stratum=20, bench=bench, min_shared=75
    )
    want = sorted(want_df.toPandas()["doc_id"])
    assert got == want and got
    # selective: the stage dropped SOME but not all quality docs
    assert 0 < stats["decontaminate.kept"] < stats["quality.kept"]
    assert not (set(got) & bench_src)  # leaked docs gone


def test_streaming_capped_pair_store_with_decontamination(spark, tmp_path):
    """bench= x pair_store=True x max_bucket: contaminated docs are
    excluded from the band store per batch (a later-dropped bucket
    representative would strand its capped tail pairs), the stored
    pair set equals the batch capped enumeration over the
    quality-gated AND decontaminated corpus, and the snapshot equals
    the batch curate(bench=...) job."""
    from geotrellis_spark.operators import dedup
    from geotrellis_spark.operators.curation import curate
    from geotrellis_spark.operators.text import quality_score
    from geotrellis_spark.streaming.curate_stream import curate_stream

    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # bench = copies of a slice of the QUALITY-GATED docs: their
    # exact/near duplicates get flagged at the selective threshold;
    # other members of the same LSH buckets stay clean — flags can
    # split buckets, the exact hazard this test pins down
    qdocs = docs.join(
        quality_score(docs).where("is_quality").select("doc_id"), "doc_id"
    )
    bench_src = {r["doc_id"] for r in qdocs.select("doc_id").collect()
                 if r["doc_id"] % 3 == 0}
    bench = qdocs.where(F.col("doc_id").isin(list(bench_src))).selectExpr(
        "doc_id + 1000000 as doc_id", "text"
    )
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        pdf.iloc[i::3].to_parquet(src / f"b{i}.parquet", index=False)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .selectExpr(
            "*",
            "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,doc_id) as ts",
        )
    )
    out = tmp_path / "out"
    q = curate_stream(
        stream, out_dir=str(out), checkpoint_dir=str(tmp_path / "ckpt"),
        per_stratum=20, pair_store=True, max_bucket=4, bench=bench,
        min_shared=75,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    flagged = dedup.contamination(
        docs.join(
            quality_score(docs).where("is_quality").select("doc_id"),
            "doc_id",
        ),
        bench,
        min_shared=75,
    ).select("doc_id").distinct()
    eligible = docs.join(
        quality_score(docs).where("is_quality").select("doc_id"), "doc_id"
    ).join(flagged, "doc_id", "left_anti")
    assert flagged.count() > 0  # the stage is actually exercised
    want_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(eligible, max_bucket=4).collect()
    }
    got_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(str(out / "staging_pairs"))
        .select("doc_a", "doc_b").distinct().collect()
    }
    assert got_pairs == want_pairs and got_pairs

    got = sorted(
        spark.read.parquet(str(out / "docs")).toPandas()["doc_id"]
    )
    want_df, _ = curate(
        spark, docs, per_stratum=20, bench=bench, min_shared=75
    )
    want = sorted(want_df.toPandas()["doc_id"])
    assert got == want and got
