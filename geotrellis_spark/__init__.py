"""geotrellis_spark — a PySpark-native spatial-join + tiling engine.

Brand-new engine (NOT a port) with the query and data-processing
capabilities of GeoTrellis (reference: echeipesh/geotrellis), built
Spark-first: DataFrames + Catalyst for planning/pruning, vectorized
pandas/Arrow UDFs (numpy kernels) for per-tile work, Z-order/Hilbert
int64 cell IDs for spatial partitioning and min-max pruning.
"""

__version__ = "0.1.0"
