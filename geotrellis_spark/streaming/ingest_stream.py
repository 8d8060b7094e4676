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
