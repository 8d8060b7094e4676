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
    spark = get_spark(f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus)

    # warm-up (discarded): prime ALL python workers (numpy/pandas import
    # per worker is seconds — an unwarmed local[32] pays a 32-way import
    # storm inside the timed region) + parquet footers
    synth.synth_images(spark, 64 * 4, partitions=64).count()
    dq._events_pts(spark, sf_dir).count()

    # tiling: same input regardless of parallelism (deterministic
    # synth); fmt='png' = the production configuration (compressed
    # tile payloads through the sink)
    images = synth.synth_images(spark, n_images, partitions=max(32, cpus))
    t0 = time.time()
    n_tiles = tiling.tile_images(images, 8, 256, fmt="png").count()
    t_tile = time.time() - t0

    # PIP join: 2M deterministic points (the sf0.1 events table alone is
    # too small to measure scaling — fixed overheads dominate).
    # Payload-aware Arrow batching: 128-row batches suit ~100KB image
    # rows; small-row UDFs run 4x faster at 4096 (see bench.py).
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    from geotrellis_spark.functions import exprs

    n_points = 2_000_000
    pts = spark.range(0, n_points, numPartitions=max(64, cpus)).selectExpr(
        "id as event_id",
        f"{exprs.lon_sql('id')} as lon",
        f"{exprs.lat_sql('id * 7 + 1')} as lat",
    )
    polys = dq._grid_polys(spark)
    t0 = time.time()
    n_joined = spatial.pip_join(pts, polys, zoom=5).count()
    t_pip = time.time() - t0

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
