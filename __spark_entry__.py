"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``geotrellis_spark`` — a PySpark-native spatial-join + tiling
engine with GeoTrellis's capabilities (SURVEY.md §2), Spark-first.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geotrellis_spark.plans.driver_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: derive deterministic
    lon/lat for events, assign zoom-8 slippy keys + Z-order cell ids
    (vectorized pandas UDF), aggregate per cell, attach cell extents
    (MapKeyTransform inverse)."""
    from pyspark.sql import functions as F

    from geotrellis_spark.functions import exprs
    from geotrellis_spark.plans.driver_queries import q_cell_agg

    sf_dir = "/root/testdata/sf0.001"
    agg = q_cell_agg(spark, sf_dir)
    return agg.selectExpr(
        "cell_id",
        "n_events",
        "sum_cents",
        "min_value",
        "max_value",
    ).orderBy(F.col("n_events").desc(), F.col("cell_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline operators)."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """Exact DuckDB twins for EVERY query in the registry (no
    rows-only entries): the image-pipeline
    entries compare tile-cover/pyramid key math directly and verify
    binary payloads as match-vs-independent-golden booleans; Hilbert is
    the xy2d rotation unrolled to SQL CASE steps."""
    return {
        name: sql_fn()
        for name, (_fn, sql_fn) in QUERIES.items()
        if sql_fn is not None
    }
