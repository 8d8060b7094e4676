"""Per-partition checkpoint / lineage / metrics (north-rule
resumability): a killed run resumes without recomputing completed work.

Re-expression of the reference's AttributeStore catalog role
(``store/.../AttributeStore.scala``, upstream 3.x layout — SURVEY.md
§0) extended with the north rule's job-progress tables:

- ``checkpoints(job_id, stage, part_key, status, rows_out, wall_sec,
  finished_at)`` — one row per completed unit of work (a key-range
  bucket of the stage's output). Resume = anti-join the work list
  against completed part_keys: only missing buckets recompute.
- ``lineage(job_id, stage, input_snapshot, code_hash, params_json)`` —
  what produced each stage (code hash = sha256 of the operator source).
- ``metrics(job_id, stage, name, value)`` — per-stage counters
  (rows, seconds, partition-size histogram for skew evidence).

Storage is plain Parquet tables under a base dir (Iceberg-shaped: the
same writes become Iceberg ``MERGE``/appends on a cluster with the
runtime jar — see sources/iceberg_shape.py).

Design for scale: the checkpoint unit is a *bucket of the output key
space* (e.g. ``cell_id % n_buckets``), not a Spark partition id —
bucket membership is a pure function of the data, so resume is
correct under any re-partitioning or executor count.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _table_path(base: str, name: str) -> str:
    return os.path.join(base, name)


def _append(spark: SparkSession, base: str, name: str, rows: list, schema: str):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
        _table_path(base, name)
    )


def _read(spark: SparkSession, base: str, name: str) -> DataFrame | None:
    path = _table_path(base, name)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def code_hash(fn: Callable) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    return hashlib.sha256(src.encode()).hexdigest()[:16]


def write_lineage(
    spark: SparkSession, base: str, job_id: str, stage: str,
    input_snapshot: str, fn: Callable, params: dict,
) -> None:
    _append(
        spark, base, "lineage",
        [(job_id, stage, input_snapshot, code_hash(fn), json.dumps(params, sort_keys=True))],
        "job_id string, stage string, input_snapshot string, code_hash string, params_json string",
    )


def write_metric(
    spark: SparkSession, base: str, job_id: str, stage: str, name: str, value: float
) -> None:
    _append(
        spark, base, "metrics",
        [(job_id, stage, name, float(value))],
        "job_id string, stage string, name string, value double",
    )


def completed_buckets(
    spark: SparkSession, base: str, job_id: str, stage: str
) -> set[int]:
    cp = _read(spark, base, "checkpoints")
    if cp is None:
        return set()
    rows = (
        cp.where((F.col("job_id") == job_id) & (F.col("stage") == stage)
                 & (F.col("status") == "done"))
        .select("part_key")
        .collect()
    )
    return {r["part_key"] for r in rows}


def checkpointed_stage(
    df_builder: Callable[[], DataFrame],
    *,
    spark: SparkSession,
    base: str,
    job_id: str,
    stage: str,
    bucket_col: str,
    n_buckets: int,
    output_path: str,
    input_snapshot: str = "",
    params: dict | None = None,
) -> DataFrame:
    """Run a stage bucket-by-bucket with per-bucket checkpoints.

    The stage's output DataFrame is partitioned by
    ``pmod(hash-free bucket_col, n_buckets)``; each missing bucket is
    computed and appended to ``output_path`` (dir-partitioned by
    ``part=``), then checkpointed. A killed run re-invokes this with
    the same job_id and only the missing buckets run. Returns the full
    stage output (read back from parquet — deterministic).
    """
    params = params or {}
    done = completed_buckets(spark, base, job_id, stage)
    todo = [b for b in range(n_buckets) if b not in done]
    write_lineage(spark, base, job_id, stage, input_snapshot, df_builder, params)
    if todo:
        # Resume atomicity: the data append commits BEFORE the 'done'
        # markers, so a kill in that window leaves committed rows for
        # buckets with no marker. Recomputing those buckets would then
        # APPEND duplicates. Purge any unmarked part= dirs first (works
        # on any Hadoop-compatible FS, not just local disk).
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for b in todo:
            p = jvm.org.apache.hadoop.fs.Path(f"{output_path}/part={b}")
            fs = p.getFileSystem(hconf)
            if fs.exists(p):
                fs.delete(p, True)
        df = df_builder().withColumn(
            "part", F.pmod(F.col(bucket_col), F.lit(n_buckets)).cast("int")
        )
        if len(todo) < n_buckets:
            df = df.where(F.col("part").isin(todo))
        t0 = time.time()
        df.write.mode("append").partitionBy("part").parquet(output_path)
        wall = time.time() - t0
        out = spark.read.parquet(output_path)
        per_part = {
            r["part"]: r["n"]
            for r in out.groupBy("part").agg(F.count("*").alias("n")).collect()
        }
        now = time.strftime("%Y-%m-%dT%H:%M:%S")
        _append(
            spark, base, "checkpoints",
            [
                (job_id, stage, int(b), "done", int(per_part.get(b, 0)),
                 float(wall / max(len(todo), 1)), now)
                for b in todo
            ],
            "job_id string, stage string, part_key int, status string, "
            "rows_out bigint, wall_sec double, finished_at string",
        )
        write_metric(spark, base, job_id, stage, "rows_out",
                     sum(per_part.get(b, 0) for b in todo))
        write_metric(spark, base, job_id, stage, "wall_sec", wall)
        write_metric(spark, base, job_id, stage, "buckets_run", len(todo))
        # skew evidence: largest bucket / mean bucket
        if per_part:
            vals = list(per_part.values())
            write_metric(spark, base, job_id, stage, "bucket_rows_max", max(vals))
            write_metric(spark, base, job_id, stage, "bucket_rows_mean",
                         sum(vals) / len(vals))
    else:
        write_metric(spark, base, job_id, stage, "buckets_run", 0)
    return spark.read.parquet(output_path)
