"""One scaling-evidence run: the two north-rule jobs (image tiling,
PIP join) at a given parallelism. Fresh JVM per invocation (called by
bench/scaling.py). Prints one JSON line with throughputs."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geotrellis_spark.session import get_spark  # noqa: E402
from geotrellis_spark.operators import spatial, tiling  # noqa: E402
from geotrellis_spark.plans import driver_queries as dq  # noqa: E402
from geotrellis_spark import synth  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    n_images = int(sys.argv[2])
    sf_dir = sys.argv[3]
    n_points_arg = int(sys.argv[4]) if len(sys.argv) > 4 else 16_000_000
    spark = get_spark(f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus)

    # warm-up (discarded): prime ALL python workers (numpy/pandas import
    # per worker is seconds — an unwarmed local[32] pays a 32-way import
    # storm inside the timed region), parquet footers, AND the codegen/
    # JIT paths of both measured query shapes — the first execution of
    # a plan inside a fresh JVM is up to 2.7x slower purely from C2
    # compilation, which would bias every single-shot level run.
    synth.synth_images(spark, 64 * 4, partitions=64).count()
    dq._events_pts(spark, sf_dir).count()
    tiling.tile_images(
        synth.synth_images(spark, 512, partitions=max(32, cpus)), 8, 256,
        fmt="png",
    ).count()
    from geotrellis_spark.functions import exprs

    polys = dq._grid_polys(spark)
    warm_pts = spark.range(0, 500_000, numPartitions=max(64, cpus)).selectExpr(
        "id as event_id",
        f"{exprs.lon_sql('id')} as lon",
        f"{exprs.lat_sql('id * 7 + 1')} as lat",
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    spatial.pip_join(warm_pts, polys, zoom=5).count()

    # tiling: same input regardless of parallelism (deterministic
    # synth); fmt='png' = the production configuration (compressed
    # tile payloads through the sink). Image rows are ~35-130KB ->
    # 128-row Arrow batches (session default).
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    images = synth.synth_images(spark, n_images, partitions=max(32, cpus))
    # best-of-3 per leg: successive runs in one JVM alternate fast/slow
    # (async cleanup of the previous run's blocks/buffers collides with
    # the next run); sampling both phases removes the oscillation bias
    t_tile = None
    for _ in range(3):
        # GC barrier per rep: the previous rep's byte[] churn otherwise
        # rides into this rep's timed window (same effect as bench.py)
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        t0 = time.time()
        n_tiles = tiling.tile_images(images, 8, 256, fmt="png").count()
        dt = time.time() - t0
        t_tile = dt if t_tile is None else min(t_tile, dt)

    # PIP join: 16M deterministic points (the sf0.1 events table alone is
    # too small to measure scaling — fixed overheads dominate).
    # Payload-aware Arrow batching: 128-row batches suit ~100KB image
    # rows; small-row UDFs run 4x faster at 4096 (see bench.py).
    # GC barrier first: the tiling leg's byte[] churn otherwise degrades
    # this job's Arrow path up to 3x (same effect measured in bench.py).
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    n_points = n_points_arg
    pts = spark.range(0, n_points, numPartitions=max(64, cpus)).selectExpr(
        "id as event_id",
        f"{exprs.lon_sql('id')} as lon",
        f"{exprs.lat_sql('id * 7 + 1')} as lat",
    )
    t_pip = None
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        t0 = time.time()
        n_joined = spatial.pip_join(pts, polys, zoom=5).count()
        dt = time.time() - t0
        t_pip = dt if t_pip is None else min(t_pip, dt)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_images": n_images,
                "n_tiles": n_tiles,
                "tile_sec": round(t_tile, 3),
                "tiles_per_sec": round(n_tiles / t_tile, 2),
                "n_joined": n_joined,
                "pip_sec": round(t_pip, 3),
                "pip_rows_per_sec": round(n_joined / t_pip, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
