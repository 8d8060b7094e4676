"""Stage-by-stage profiling of the tiling pipeline at one parallelism
level (fresh JVM). Usage: python bench/profile_stages.py <cpus> <n_images>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geotrellis_spark.session import get_spark  # noqa: E402
from geotrellis_spark import synth  # noqa: E402
from geotrellis_spark.operators import tiling  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    n = int(sys.argv[2])
    spark = get_spark(f"profile-{cpus}", cores=cpus, shuffle_partitions=cpus)
    synth.synth_images(spark, 100, partitions=4).count()  # warm workers

    out = {"cpus": cpus, "n_images": n}

    t0 = time.time()
    images = synth.synth_images(spark, n, partitions=max(32, cpus))
    out["synth_only"] = round(time.time() - t0 + 0, 3)  # lazy; timed below

    t0 = time.time()
    n_img = images.count()
    out["synth_count"] = round(time.time() - t0, 3)

    t0 = time.time()
    pieces = tiling.cut_images(images, 8, 256, salt_buckets=8)
    n_pieces = pieces.count()
    out["synth_plus_cut"] = round(time.time() - t0, 3)
    out["n_pieces"] = n_pieces

    t0 = time.time()
    n_tiles2 = tiling.merge_tiles(pieces, 8, 256, two_phase=True).count()
    out["full_two_phase"] = round(time.time() - t0, 3)
    out["n_tiles"] = n_tiles2

    t0 = time.time()
    n_tiles1 = tiling.merge_tiles(pieces, 8, 256, two_phase=False).count()
    out["full_one_phase"] = round(time.time() - t0, 3)
    assert n_tiles1 == n_tiles2

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
