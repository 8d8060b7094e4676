"""SparkSession builder tuned for the engine.

Scale notes (100 TB design, local[32] testing):
- AQE on: runtime coalescing + skew-join splitting backs up our explicit
  salting of hot cells.
- Arrow enabled: every per-tile kernel crosses to Python as Arrow
  batches (vectorized pandas UDFs), never per-row pickling.
- shuffle.partitions defaults to cores locally; on a real cluster set
  it ~2-3x total executor cores (or rely on AQE coalescing from a
  higher initial number).
- Session timezone pinned to UTC: Spark timestamps are session-TZ,
  DuckDB's are UTC-naive — pinning makes oracle comparisons exact.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "geotrellis_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # make the package importable in executor python workers regardless
    # of the caller's cwd (local-mode analog of spark-submit --py-files)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
        )
    # one BLAS thread per python worker: N workers x M BLAS threads
    # oversubscribes the box and *reduces* throughput as cores grow
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # glibc malloc mmap()s every large (>=128KB) block and munmap()s it
    # on free; at high worker counts the resulting TLB-shootdown IPIs
    # put the box at 60-85% SYSTEM time and throughput *drops* with
    # cores. Keep big blocks on the heap and never trim, so Arrow/numpy
    # buffers are reused in user space. (Measured on local[32]: tiling
    # 86s -> with this, scales instead of inverting.)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_ARENA_MAX", "2")
    # pyarrow's bundled jemalloc mmap/munmaps its way around the glibc
    # tunables above — route Arrow buffers through the system allocator
    # so the same heap-reuse applies to them
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    driver_mem = (extra_conf or {}).get(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    )
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r6): lowering spark.sql.files.openCostInBytes to split
        # small files finer was A/B'd and REJECTED: these single-file
        # tables hold 1-2 parquet row groups, and parquet cannot split
        # below row-group granularity — the extra splits come back
        # EMPTY (one split owns the row-group midpoint and reads
        # everything), so the conf manufactures fake parallelism and
        # defeats the row-group-aware repartition guard that actually
        # fixes scan starvation (plans/driver_queries._t).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image rows are ~35-130KB: 4096-row Arrow batches would be
        # 100MB+ per concurrent task -> GC thrash at high parallelism.
        # ~128 rows x 32 tasks stays in the hundreds of MB.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "128"),
        )
        .config("spark.driver.memory", driver_mem)
        # MaxDirectMemorySize defaults to the heap size; 32 concurrent
        # Arrow stream readers exhaust it on large-binary columns and
        # netty falls into System.gc() retry loops — measured 6x
        # slowdown at local[32] (22.7s -> 6.1s on a 4GB binary-ingest
        # repro). Pin the heap too so G1 doesn't breathe under byte[]
        # churn. A modest heap beats a huge one here: full GCs stay
        # short and the page-zeroing surface stays small.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:MaxDirectMemorySize="
            + os.environ.get("SPARK_GRAFT_DIRECT_MEM", "24g"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session(spark: SparkSession) -> SparkSession:
    """Runtime confs the engine relies on, applied to a session we did
    not create (e.g. the verify driver's)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
