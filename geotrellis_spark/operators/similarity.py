"""Embedding similarity search: brute-force cosine top-k (baseline) and
hyperplane-LSH bucketing (the scale path).

Not in the GeoTrellis reference; first-class engine additions for
training-data pipelines. The dot products run as JVM higher-order
functions (``aggregate``/``zip_with`` — sequential left fold, so the
float result is deterministic and matches DuckDB's sequential
``list_dot_product``).

Scale notes: brute-force is O(n·q) — correct baseline, broadcast the
(small) query side. The LSH variant buckets vectors by sign-bits
against deterministic pseudo-random hyperplanes; at scale, top-k runs
inside buckets (candidate generation) instead of the full cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.exprs import LAT_MULT, LON_MULT, M32

DIM = 64
N_PLANES = 4


def _spread(df: DataFrame) -> DataFrame:
    """Small-input parallelism guard (guide §2.5 input skew / §6 split
    sizing): an embedding table of a few MB arrives as 1-2 parquet
    splits, and every downstream narrow op — including the corpus x
    queries / corpus x centroids cross joins that dominate the ANN
    family — inherits that 1-2-task ceiling (measured: ann_topk ran
    ~50x under the box's core count). Round-robin repartition up to the
    session's default parallelism; a no-op whenever the scan already
    has that many splits (the 100 TB case), so this never SHRINKS
    parallelism at scale and stays parameterised by the session's core
    count rather than a constant."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def _dot_sql(a: str, b: str) -> str:
    # NOTE (r6): an unrolled 64-term sum was A/B'd against this HOF
    # fold and is 4-5x SLOWER: the generated projection method exceeds
    # HotSpot's huge-method JIT limit and runs as interpreted bytecode,
    # while the fold's internal loop stays tight. The fold is kept; the
    # heavy cross-join scorers avoid per-pair self-dots via per-row
    # norm precompute instead (guide §1.2: fix the algorithm, then the
    # per-task work).
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_dot_sql(a, b))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (queries selected by
    predicate, self excluded). Output: (q_id, vec_id, rank) — ranks
    only, so cross-engine float comparison never touches the hash."""
    # norms precomputed ONCE per row on each side (n + q sqrt-folds,
    # not 2 per pair — guide §2.3 "don't compute things you throw
    # away"): sqrt on the identical fold value, then the identical
    # (nv * nq) product, so every pair's cos double is bit-unchanged.
    q = emb.where(query_pred).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_n", F.sqrt(_dot("q_vec", "q_vec")))
    base = _spread(emb).select(id_col, vec_col).withColumn(
        "v_n", F.sqrt(_dot(vec_col, vec_col))
    )
    pairs = base.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("q_id"))
    scored = pairs.withColumn(
        "cos", _dot(vec_col, "q_vec") / (F.col("v_n") * F.col("q_n"))
    )
    win = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, "rank")
    )


def cosine_topk_sql(k: int = 5, query_pred: str = "vec_id % 100 = 0",
                    source_sql: str = "embeddings") -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec FROM {source_sql}
      WHERE {query_pred}
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.q_vec::DOUBLE[]) /
             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
              sqrt(list_dot_product(q.q_vec::DOUBLE[], q.q_vec::DOUBLE[]))) AS cos
      FROM {source_sql} e, q WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, rank FROM (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC)
               AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _plane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j: components in
    [-0.5, 0.5) from the integer-hash formula (exact in both engines:
    pure integer mod then one exact division by 2^32)."""
    return [
        ((j * DIM + i + 1) * LON_MULT % M32) / M32 - 0.5 for i in range(DIM)
    ]


def _plane_lit_spark(j: int) -> str:
    """Plane j as a Spark SQL array<double> literal."""
    lit = ", ".join(f"cast({c!r} as double)" for c in _plane(j))
    return f"array({lit})"


def _bucket_sql_spark(vec_col: str, n_planes: int) -> str:
    """Spark SQL expression for the hyperplane-LSH bucket id (bit j =
    sign of dot with plane j) — the ONE definition every Spark-side
    operator shares; drifting copies would silently break bucket
    parity between operators and with the DuckDB twins."""
    bits = []
    for j in range(n_planes):
        bits.append(
            f"(CASE WHEN {_dot_sql(vec_col, _plane_lit_spark(j))} > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return f"cast({' + '.join(bits)} as bigint)"


def _bucket_sql_duck(n_planes: int, vec_col: str = "embedding") -> str:
    """DuckDB twin of _bucket_sql_spark (identical plane constants and
    sign rule)."""
    bits = []
    for j in range(n_planes):
        lit = "[" + ", ".join(repr(c) for c in _plane(j)) + "]::DOUBLE[]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_col}::DOUBLE[], {lit}) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return f"CAST({' + '.join(bits)} AS BIGINT)"



def lsh_buckets(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Hyperplane-LSH bucket id per vector: bit j = sign of dot with
    plane j. Output: (vec_id, bucket). At 100 TB this is the shuffle
    key that turns ANN into per-bucket local top-k."""
    return _spread(emb).select(id_col, vec_col).selectExpr(
        id_col, f"{_bucket_sql_spark(vec_col, n_planes)} as bucket"
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    broadcast_queries: bool = True,
) -> DataFrame:
    """LSH-bucketed ANN top-k — the 100 TB similarity path: candidate
    pairs are SAME-BUCKET vectors only, produced by an equi-join on the
    bucket id (hash-partitionable; no cross join of the full table).
    Exact cosine + window top-k inside each query's candidate set.
    Recall < 1 by construction (ANN); raise ``n_planes`` probes/lower
    bucket count to trade candidates for recall. Output:
    (q_id, vec_id, rank) over the bucketed candidates — deterministic,
    so the DuckDB twin is exact."""
    bucket = F.expr(_bucket_sql_spark(vec_col, n_planes))
    # per-row norm precompute: same fold + sqrt as before, computed
    # once per side instead of once per candidate pair
    withb = _spread(emb).select(id_col, vec_col).withColumn("bucket", bucket).withColumn(
        "v_n", F.sqrt(_dot(vec_col, vec_col))
    )
    q = withb.where(query_pred).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        "bucket", F.col("v_n").alias("q_n"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    pairs = withb.join(q, "bucket").where(F.col(id_col) != F.col("q_id"))
    scored = pairs.withColumn(
        "cos", _dot(vec_col, "q_vec") / (F.col("v_n") * F.col("q_n"))
    )
    win = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, "rank")
    )


def lsh_topk_sql(
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    source_sql: str = "embeddings",
    n_planes: int = N_PLANES,
) -> str:
    bucket = _bucket_sql_duck(n_planes)
    return f"""
    WITH withb AS (
      SELECT vec_id, embedding, {bucket} AS bucket FROM {source_sql}
    ),
    q AS (
      SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM withb
      WHERE {query_pred}
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.q_vec::DOUBLE[]) /
             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
              sqrt(list_dot_product(q.q_vec::DOUBLE[], q.q_vec::DOUBLE[]))) AS cos
      FROM withb e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, rank FROM (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC)
               AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def multiprobe_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    probes: int = 1,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Multi-probe LSH ANN top-k: each query searches its own bucket
    PLUS every bucket at Hamming distance <= ``probes`` bit flips
    (probes=1: the n_planes single-flip neighbors). Recall becomes a
    QUERY-TIME knob — no re-bucketing rescan to tune it, which is the
    piece plain LSH lacks at 100 TB (re-hashing the corpus to change
    recall is a full pass; flipping probe bits is free). Candidate
    volume grows by ~(1 + n_planes * probes) x bucket size; the plan is
    still a broadcast equi-join on the bucket id, no cross join.
    Output: (q_id, vec_id, rank) — deterministic, exact DuckDB twin."""
    if probes not in (0, 1):
        raise ValueError("probes in {0, 1} supported (flip-1 multi-probe)")
    bucket = F.expr(_bucket_sql_spark(vec_col, n_planes))
    withb = _spread(emb).select(id_col, vec_col).withColumn("bucket", bucket).withColumn(
        "v_n", F.sqrt(_dot(vec_col, vec_col))
    )
    probe_terms = ["bucket"] + [
        f"bucket ^ {1 << j}" for j in range(n_planes if probes else 0)
    ]
    q = withb.where(query_pred).selectExpr(
        f"{id_col} as q_id",
        f"{vec_col} as q_vec",
        "v_n as q_n",
        f"explode(array({', '.join(probe_terms)})) as bucket",
    )
    if broadcast_queries:
        q = F.broadcast(q)
    pairs = withb.join(q, "bucket").where(F.col(id_col) != F.col("q_id"))
    scored = pairs.withColumn(
        "cos", _dot(vec_col, "q_vec") / (F.col("v_n") * F.col("q_n"))
    )
    win = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, "rank")
    )


def multiprobe_topk_sql(
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    source_sql: str = "embeddings",
    n_planes: int = N_PLANES,
    probes: int = 1,
) -> str:
    bucket = _bucket_sql_duck(n_planes)
    probe_terms = ["bucket"] + [
        f"xor(bucket, {1 << j})" for j in range(n_planes if probes else 0)
    ]
    return f"""
    WITH withb AS (
      SELECT vec_id, embedding, {bucket} AS bucket FROM {source_sql}
    ),
    q AS (
      SELECT vec_id AS q_id, embedding AS q_vec,
             unnest([{', '.join(probe_terms)}]) AS bucket
      FROM withb WHERE {query_pred}
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.q_vec::DOUBLE[]) /
             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
              sqrt(list_dot_product(q.q_vec::DOUBLE[], q.q_vec::DOUBLE[]))) AS cos
      FROM withb e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, rank FROM (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC)
               AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold_milli: int = 250,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection — the fifth dedup mode
    (exact / minhash / simhash / jaccard / COSINE): candidate pairs are
    same-LSH-bucket vectors only (equi-join on the bucket id — never the
    O(n^2) cross join), kept when cosine > threshold. The threshold is
    an integer milli-cosine so the predicate compares identically in
    both engines (cos * 1000 floor > threshold would also work; direct
    double compare is fine because both engines compute the identical
    sequential fold). Returns (vec_a, vec_b, cos_milli), vec_a < vec_b."""
    bucket = F.expr(_bucket_sql_spark(vec_col, n_planes))
    withb = _spread(emb).select(id_col, vec_col).withColumn("bucket", bucket).withColumn(
        "v_n", F.sqrt(_dot(vec_col, vec_col))
    )
    a = withb.alias("a")
    b = withb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    cos = (
        _dot(f"a.{vec_col}", f"b.{vec_col}")
        / (F.col("a.v_n") * F.col("b.v_n"))
    )
    return pairs.select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        F.floor(cos * 1000).cast("bigint").alias("cos_milli"),
    ).where(F.col("cos_milli") >= threshold_milli)


def cosine_neardup_sql(
    threshold_milli: int = 250,
    source_sql: str = "embeddings",
    n_planes: int = N_PLANES,
) -> str:
    bucket = _bucket_sql_duck(n_planes)
    return f"""
    WITH withb AS (
      SELECT vec_id, embedding, {bucket} AS bucket FROM {source_sql}
    )
    SELECT vec_a, vec_b, cos_milli FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(floor(
               list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
               * 1000) AS BIGINT) AS cos_milli
      FROM withb a JOIN withb b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cos_milli >= {threshold_milli}
    """


def lsh_buckets_sql(source_sql: str = "embeddings", n_planes: int = N_PLANES) -> str:
    return f"""
    SELECT vec_id, {_bucket_sql_duck(n_planes)} AS bucket
    FROM {source_sql}
    """


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 61,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the coarse-quantizer scale path
    alongside LSH: every vector is assigned to its nearest centroid
    (one inverted list per centroid), a query probes only its
    ``nprobe`` nearest centroids' lists, and exact cosine top-k runs
    inside the probed lists.

    Centroids here are the deterministic ``id % stride = 0`` sample so
    the DuckDB twin is exact; at 100 TB the drop-in upgrade is
    sampled-kmeans centroids (a few passes over a 1% sample — the
    assignment/probe plan below is unchanged, it only reads a better
    centroid table). The plan: centroid table is tiny -> BROADCAST to
    both the assignment join and the probe join; the candidate
    generator is an equi-join on ``cent_id`` (never a full cross
    join); recall is the ``nprobe`` query-time knob. A vector lives in
    exactly ONE list, so (query, candidate) pairs are unique by
    construction — no dedup shuffle. Output: (q_id, vec_id, rank)."""
    if dim is None:
        row = emb.select(vec_col).head()
        dim = len(row[0]) if row is not None else DIM
    # per-row norms once per side (not per corpus x centroid pair)
    cents_df = emb.where(f"{id_col} % {stride} = 0").select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("c_n", F.sqrt(_dot("c_vec", "c_vec")))
    cents = F.broadcast(cents_df)
    base = _spread(emb).select(id_col, vec_col).withColumn(
        "v_n", F.sqrt(_dot(vec_col, vec_col))
    )
    # nearest-centroid argmax (ccos desc, cent_id asc) as one
    # Arrow/numpy pass — the cosine twin of _nearest_assign_arrow
    assign = _nearest_cos_assign_arrow(base, cents_df, id_col, vec_col, dim)
    # probe ranking only needs the QUERY rows: filtering before the
    # centroid cross scores q x k pairs instead of n x k (the window
    # partitions by the vector id, so ranks are unchanged), and the
    # corpus x centroid pass runs once, not twice
    probes = F.broadcast(
        base.where(query_pred)
        .crossJoin(cents)
        .withColumn(
            "ccos", _dot(vec_col, "c_vec") / (F.col("v_n") * F.col("c_n"))
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("ccos").desc(), F.col("cent_id").asc()
                )
            ),
        )
        .where(f"crank <= {nprobe}")
        .select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
            F.col("v_n").alias("q_n"), "cent_id",
        )
    )
    pairs = assign.join(probes, "cent_id").where(F.col(id_col) != F.col("q_id"))
    scored = pairs.withColumn(
        "cos", _dot(vec_col, "q_vec") / (F.col("v_n") * F.col("q_n"))
    )
    win = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, "rank")
    )


def ivf_topk_sql(
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    source_sql: str = "embeddings",
    stride: int = 61,
    nprobe: int = 2,
) -> str:
    cos = (
        "list_dot_product({a}.embedding::DOUBLE[], {b}::DOUBLE[]) / "
        "(sqrt(list_dot_product({a}.embedding::DOUBLE[], {a}.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
    )
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS c_vec FROM {source_sql}
      WHERE vec_id % {stride} = 0
    ),
    scored_c AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             {cos.format(a='e', b='c.c_vec')} AS ccos
      FROM {source_sql} e, cents c
    ),
    ranked AS (
      SELECT vec_id, embedding, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY ccos DESC, cent_id ASC) AS crank
      FROM scored_c
    ),
    assign AS (
      SELECT vec_id, embedding, cent_id FROM ranked WHERE crank = 1
    ),
    probes AS (
      SELECT vec_id AS q_id, embedding AS q_vec, cent_id FROM ranked
      WHERE {query_pred} AND crank <= {nprobe}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id,
             {cos.format(a='a', b='p.q_vec')} AS cos
      FROM assign a JOIN probes p
        ON a.cent_id = p.cent_id AND a.vec_id <> p.q_id
    )
    SELECT q_id, vec_id, rank FROM (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC)
               AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _d2_sql(a: str, b: str) -> str:
    """Squared L2 distance via the dot-product expansion — the only
    form both engines compute with IDENTICAL float op sequences:
    d2 = <a,a> - 2<a,b> + <b,b> (each dot a sequential left fold)."""
    return (
        f"({_dot_sql(a, a)} - 2.0 * {_dot_sql(a, b)} + {_dot_sql(b, b)})"
    )


_MILLI = "transform({v}, x -> cast(floor(cast(x as double) * 1000.0 + 0.5) as double))"


def _fold_dot_np(A, B):
    """Row-wise dot of two (n, dim) float64 matrices in EXACT left-fold
    order: acc starts at 0.0 and adds the per-element products in index
    order, so every scalar accumulator replays the identical IEEE op
    sequence as ``_dot_sql``'s aggregate/zip_with fold (and DuckDB's
    list_dot_product)."""
    import numpy as np

    acc = np.zeros(A.shape[0], dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i] * B[:, i]
    return acc


def _score_d2_np(qm, qq, C, cc):
    """(n, dim) corpus block x (k, dim) centroid matrix -> (n, k) d2
    with the exact op sequence of the JVM/DuckDB expression
    ``(qq - 2.0 * fold_dot(qv, cv)) + cc``: the dot accumulates
    products in index order (left fold), then per-scalar (qq - 2*dot)
    + cc. Bit-identical to the crossJoin + _dot_sql projection it
    replaces."""
    import numpy as np

    acc = np.zeros((qm.shape[0], C.shape[0]), dtype=np.float64)
    for i in range(qm.shape[1]):
        acc += qm[:, i:i + 1] * C[None, :, i]
    return (qq[:, None] - 2.0 * acc) + cc[None, :]


def _cent_matrix(cents: DataFrame):
    """Collect the k-row centroid table to driver numpy arrays sorted
    by cent_id. Same driver residency as the F.broadcast(cents) it
    replaces (k rows — the known stride-proportional-k caveat is
    unchanged); this is the MLlib-KMeans shape: centroids broadcast
    out, per-cluster sums aggregated back."""
    import numpy as np

    rows = cents.orderBy("cent_id").collect()
    ids = np.array([int(r["cent_id"]) for r in rows], dtype=np.int64)
    C = np.array([list(r["cv"]) for r in rows], dtype=np.float64)
    cc = np.array([float(r["cc"]) for r in rows], dtype=np.float64)
    return ids, C, cc


def _batch_mat(batch, name: str, dim: int):
    """(rows, dim) float64 matrix from an Arrow list column (offset-
    aware flatten; zero-copy when the batch allows)."""
    col = batch.column(batch.schema.get_field_index(name))
    return (
        col.flatten()
        .to_numpy(zero_copy_only=False)
        .astype("float64", copy=False)
        .reshape(-1, dim)
    )


def _nearest_assign_arrow(
    q: DataFrame, cents: DataFrame, id_col: str, dim: int
) -> DataFrame:
    """Nearest-centroid assignment (argmin by d2 asc, cent_id asc) as
    ONE Arrow-batched numpy pass over the corpus — replaces the
    crossJoin(broadcast(cents)) + interpreted-fold d2 + max_by
    hash-agg with identical results: _score_d2_np replays the exact
    per-element fold/op sequence, and argmin's first-minimum over the
    cent_id-sorted matrix IS the (d2, cent_id) tie rule. ``q`` must
    carry (id_col, qv milli-array, qq self-dot); output adds cent_id
    and passes qv/qq through untouched (same Arrow buffers)."""
    spark = q.sparkSession
    ids, C, cc = _cent_matrix(cents)
    bc = spark.sparkContext.broadcast((ids, C, cc))

    def assign_fn(batches, _bc=bc, _d=dim):
        import pyarrow as pa

        ids_, C_, cc_ = _bc.value
        for b in batches:
            if b.num_rows == 0:
                continue
            qm = _batch_mat(b, "qv", _d)
            qq = b.column(
                b.schema.get_field_index("qq")
            ).to_numpy(zero_copy_only=False)
            best = _score_d2_np(qm, qq, C_, cc_).argmin(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index(id_col)),
                    b.column(b.schema.get_field_index("qv")),
                    b.column(b.schema.get_field_index("qq")),
                    pa.array(ids_[best], type=pa.int64()),
                ],
                [id_col, "qv", "qq", "cent_id"],
            )

    return q.select(id_col, "qv", "qq").mapInArrow(
        assign_fn, f"{id_col} long, qv array<double>, qq double, cent_id long"
    )


def _nearest_cos_assign_arrow(
    base: DataFrame, cents: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Cosine twin of ``_nearest_assign_arrow``: nearest centroid by
    (ccos desc, cent_id asc) where ccos = fold_dot(v, c) / (v_n * c_n)
    — identical op sequence to the JVM expression it replaces (fold
    dot, then the division by the precomputed-norm product), with
    argmax's first-maximum over the cent_id-sorted matrix as the tie
    rule. ``base`` must carry (id_col, vec_col, v_n); ``cents``
    (cent_id, c_vec, c_n). Output: (id_col, vec_col, v_n, cent_id),
    vector buffers passed through."""
    import numpy as np

    spark = base.sparkSession
    rows = cents.orderBy("cent_id").collect()
    ids = np.array([int(r["cent_id"]) for r in rows], dtype=np.int64)
    Cm = np.array([list(r["c_vec"]) for r in rows], dtype=np.float64)
    cn = np.array([float(r["c_n"]) for r in rows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((ids, Cm, cn))
    id_t = base.schema[id_col].dataType.simpleString()
    vec_t = base.schema[vec_col].dataType.simpleString()

    def assign_fn(batches, _bc=bc, _d=dim):
        import numpy as _np
        import pyarrow as pa

        ids_, Cm_, cn_ = _bc.value
        for b in batches:
            if b.num_rows == 0:
                continue
            vm = _batch_mat(b, vec_col, _d)
            vn = b.column(
                b.schema.get_field_index("v_n")
            ).to_numpy(zero_copy_only=False)
            acc = _np.zeros((vm.shape[0], Cm_.shape[0]), dtype=_np.float64)
            for i in range(_d):
                acc += vm[:, i:i + 1] * Cm_[None, :, i]
            ccos = acc / (vn[:, None] * cn_[None, :])
            best = ccos.argmax(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index(id_col)),
                    b.column(b.schema.get_field_index(vec_col)),
                    b.column(b.schema.get_field_index("v_n")),
                    pa.array(ids_[best], type=pa.int64()),
                ],
                [id_col, vec_col, "v_n", "cent_id"],
            )

    return base.select(id_col, vec_col, "v_n").mapInArrow(
        assign_fn,
        f"{id_col} {id_t}, {vec_col} {vec_t}, v_n double, cent_id long",
    )


def kmeans_milli(
    emb: DataFrame,
    stride: int = 61,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd k-means over milli-quantized embeddings —
    the 'sampled kmeans centroids' upgrade the IVF docstring promises,
    with bit-exact cross-engine semantics:

    - vectors quantize to exact integers (floor(x*1000 + 0.5), held in
      doubles), so per-cluster SUMS are order-independent exact (every
      partial is an integer < 2^53) — a distributed float mean is
      normally not reproducible; an integer mean is.
    - round-1+ centroids are rational doubles sum/count; distances use
      the dot-expansion d2 = <a,a> - 2<a,b> + <b,b>, sequential folds
      in both engines, ties broken by cent_id.
    - empty clusters keep their previous centroid (LEFT JOIN +
      coalesce), so k never shrinks mid-run.

    Init = the deterministic ``id % stride = 0`` sample. Each
    iteration: ONE broadcast cross of corpus x centroids (k tiny), one
    window argmin, one (cent, dim) two-phase aggregation. Returns
    (cent_id, cv: array<double> in milli space).
    """
    # the per-dimension mean aggregation below needs the (uniform)
    # vector length at plan time; oracle-facing callers pass dim=DIM,
    # ad-hoc callers pay one LIMIT-1 lookup (ANSI qv[i] errors on an
    # out-of-range index instead of yielding NULL, so guessing is not
    # an option)
    if dim is None:
        row = emb.select(vec_col).head()
        dim = len(row[0]) if row is not None else DIM
    # norms precomputed ONCE per vector/centroid as columns: the pair
    # loop then folds one dot product instead of three. d2 VALUES are
    # identical (same per-vector fold), so oracle ordering is unchanged.
    q = _spread(emb).select(
        id_col, F.expr(_MILLI.format(v=vec_col)).alias("qv")
    ).withColumn("qq", F.expr(_dot_sql("qv", "qv")))
    cents = q.where(f"{id_col} % {stride} = 0").select(
        F.col(id_col).alias("cent_id"),
        F.col("qv").alias("cv"),
        F.col("qq").alias("cc"),
    )
    # Lloyd iterations in the MLlib-KMeans shape (guide §4.2 "hand
    # whole batches to vectorized native libraries"): centroids
    # broadcast OUT as a k-row matrix, the corpus x centroid scoring +
    # per-cluster (count, sum-vector) partials run as ONE Arrow-batched
    # numpy pass per iteration, and only tasks x k partial rows come
    # back for the k-row centroid update — replacing the per-iteration
    # 6.5M-row interpreted-fold cross join + two hash-aggs +
    # localCheckpoint. Bit-exactness: _score_d2_np replays the exact
    # fold/op sequence of the JVM expression; per-cluster sums are
    # exact integers (order-free); the per-dimension s/n division and
    # the cc self-fold repeat the identical IEEE ops. Driver residency
    # stays k rows + tasks x k partials — the same class as the k-row
    # broadcast it replaces (the stride-proportional-k caveat from
    # VERDICT r5 is unchanged; it is the algorithm's published init).
    import numpy as np

    spark = emb.sparkSession
    ids, C, cc = _cent_matrix(cents)
    q2 = q.select("qv", "qq")
    part_schema = "_ci long, _n long, " + ", ".join(
        f"_s{i} double" for i in range(dim)
    )
    for _ in range(iters):
        bc = spark.sparkContext.broadcast((C, cc))

        def partials(batches, _bc=bc, _k=len(ids), _d=dim):
            import numpy as _np
            import pyarrow as pa

            C_, cc_ = _bc.value
            cnt = _np.zeros(_k, dtype=_np.int64)
            sums = _np.zeros((_k, _d), dtype=_np.float64)
            for b in batches:
                if b.num_rows == 0:
                    continue
                qm = _batch_mat(b, "qv", _d)
                qq = b.column(
                    b.schema.get_field_index("qq")
                ).to_numpy(zero_copy_only=False)
                best = _score_d2_np(qm, qq, C_, cc_).argmin(axis=1)
                _np.add.at(sums, best, qm)
                cnt += _np.bincount(best, minlength=_k)
            nz = _np.nonzero(cnt)[0]
            arrays = [
                pa.array(nz.astype("int64")),
                pa.array(cnt[nz]),
            ] + [pa.array(sums[nz, i]) for i in range(_d)]
            yield pa.RecordBatch.from_arrays(
                arrays, ["_ci", "_n"] + [f"_s{i}" for i in range(_d)]
            )

        pdf = q2.mapInArrow(partials, part_schema).toPandas()
        cnt = np.zeros(len(ids), dtype=np.int64)
        sums = np.zeros((len(ids), dim), dtype=np.float64)
        ci = pdf["_ci"].to_numpy(dtype=np.int64)
        np.add.at(cnt, ci, pdf["_n"].to_numpy(dtype=np.int64))
        np.add.at(
            sums, ci,
            pdf[[f"_s{i}" for i in range(dim)]].to_numpy(dtype=np.float64),
        )
        upd = cnt > 0  # empty clusters keep their previous centroid
        C = C.copy()
        C[upd] = sums[upd] / cnt[upd, None]
        cc = _fold_dot_np(C, C)
    out = [
        (int(ids[j]), [float(x) for x in C[j]], float(cc[j]))
        for j in range(len(ids))
    ]
    return spark.createDataFrame(
        out, "cent_id long, cv array<double>, cc double"
    )


def ivf_kmeans_topk(
    emb: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 61,
    iters: int = 2,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """IVF ANN top-k over Lloyd-refined centroids (L2 in milli space):
    the production-shape IVF — kmeans_milli learns the coarse
    quantizer, then the same broadcast-assign / probe / inverted-list
    equi-join plan as ``ivf_topk``. Output (q_id, vec_id, rank).
    ``dim`` is the uniform vector length (kmeans_milli's per-dimension
    mean aggregation needs it at plan time; None = one-row lookup)."""
    if dim is None:
        row = emb.select(vec_col).head()
        dim = len(row[0]) if row is not None else DIM
    cents = kmeans_milli(emb, stride, iters, id_col, vec_col, dim=dim)
    q = _spread(emb).select(
        id_col, F.expr(_MILLI.format(v=vec_col)).alias("qv")
    ).withColumn("qq", F.expr(_dot_sql("qv", "qv")))
    d2 = F.col("qq") - 2.0 * F.expr(_dot_sql("qv", "cv")) + F.col("cc")
    # nearest-centroid assignment as one Arrow/numpy pass (bit-exact
    # fold replay — see _nearest_assign_arrow): no n x k cross join,
    # no window, no checkpoint of scored rows
    assign = _nearest_assign_arrow(q, cents, id_col, dim)
    # probe ranking only needs the QUERY rows (the rank window
    # partitions by the vector id, so filtering first scores q x k
    # pairs instead of n x k with identical ranks) — this also removes
    # the second corpus x centroid pass the checkpoint used to pin
    probes = F.broadcast(
        q.where(query_pred)
        .crossJoin(F.broadcast(cents))
        .withColumn("d2", d2)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("d2").asc(), F.col("cent_id").asc()
                )
            ),
        )
        .where(f"rk <= {nprobe}")
        .select(
            F.col(id_col).alias("q_id"),
            F.col("qv").alias("pv"),
            F.col("qq").alias("pp"),
            "cent_id",
        )
    )
    pairs = assign.join(probes, "cent_id").where(F.col(id_col) != F.col("q_id"))
    fin = pairs.withColumn(
        "fd2",
        F.col("qq") - 2.0 * F.expr(_dot_sql("qv", "pv")) + F.col("pp"),
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("fd2").asc(), F.col(id_col).asc())
    return (
        fin.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, "rank")
    )


def _duck_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def _duck_d2(a: str, b: str) -> str:
    return (
        f"({_duck_dot(a, a)} - 2.0 * {_duck_dot(a, b)} + {_duck_dot(b, b)})"
    )


def _lloyd_fr_ctes(
    source_sql: str = "embeddings",
    stride: int = 61,
    iters: int = 2,
    dim: int = DIM,
) -> list[str]:
    """DuckDB CTE list for kmeans_milli's Lloyd iterations, unrolled,
    ending with ``fr`` — every vector scored against the final
    centroids with rank ``rk`` (d2 asc, cent_id asc). Shared by the
    ivf_kmeans and semdedup oracles."""
    ctes = [
        f"""q AS (
      SELECT vec_id,
             list_transform({source_sql}.embedding,
                            x -> floor(x::DOUBLE * 1000.0 + 0.5)) AS qv
      FROM {source_sql}
    )""",
        f"""c0 AS (
      SELECT vec_id AS cent_id, qv AS cv FROM q WHERE vec_id % {stride} = 0
    )""",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(f"""s{i} AS (
      SELECT q.vec_id, q.qv, c.cent_id, {_duck_d2('q.qv', 'c.cv')} AS d2
      FROM q, {prev} c
    )""")
        ctes.append(f"""a{i} AS (
      SELECT vec_id, qv, cent_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cent_id) AS rk
        FROM s{i}
      ) WHERE rk = 1
    )""")
        ctes.append(f"""m{i} AS (
      SELECT cent_id, i, sum(qv[i + 1]) / count(*) AS m
      FROM a{i}, range({dim}) t(i) GROUP BY cent_id, i
    )""")
        ctes.append(f"""n{i} AS (
      SELECT cent_id, list(m ORDER BY i) AS cv2 FROM m{i} GROUP BY cent_id
    )""")
        ctes.append(f"""c{i} AS (
      SELECT {prev}.cent_id, coalesce(n{i}.cv2, {prev}.cv) AS cv
      FROM {prev} LEFT JOIN n{i} USING (cent_id)
    )""")
        prev = f"c{i}"
    ctes.append(f"""fs AS (
      SELECT q.vec_id, q.qv, c.cent_id, {_duck_d2('q.qv', 'c.cv')} AS d2
      FROM q, {prev} c
    )""")
    ctes.append("""fr AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, cent_id) AS rk
      FROM fs
    )""")
    return ctes


def ivf_kmeans_topk_sql(
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    source_sql: str = "embeddings",
    stride: int = 61,
    iters: int = 2,
    nprobe: int = 2,
    dim: int = DIM,
) -> str:
    """DuckDB twin of kmeans_milli + ivf_kmeans_topk with the Lloyd
    iterations unrolled as CTE pairs."""
    ctes = _lloyd_fr_ctes(source_sql, stride, iters, dim)
    ctes.append("""asg AS (
      SELECT vec_id, qv, cent_id FROM fr WHERE rk = 1
    )""")
    ctes.append(f"""probes AS (
      SELECT vec_id AS q_id, qv AS pv, cent_id FROM fr
      WHERE {query_pred} AND rk <= {nprobe}
    )""")
    ctes.append(f"""cand AS (
      SELECT p.q_id, a.vec_id, {_duck_d2('a.qv', 'p.pv')} AS fd2
      FROM asg a JOIN probes p
        ON a.cent_id = p.cent_id AND a.vec_id <> p.q_id
    )""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT q_id, vec_id, rank FROM (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id ORDER BY fd2, vec_id) AS rank
      FROM cand
    ) WHERE rank <= {k}
    """
    )


def ann_recall(
    emb: DataFrame,
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN path vs exact brute-force
    cosine, per query — the quality metric a production ANN deployment
    monitors, as a first-class (and oracle-checkable) query: both
    top-k sets are deterministic, so recall is an exact integer.
    Output: (q_id, hits, recall_milli)."""
    exact = cosine_topk(emb, k, query_pred, id_col, vec_col)
    approx = lsh_topk(emb, k, query_pred, id_col, vec_col)
    hits = (
        exact.join(approx.select("q_id", id_col), ["q_id", id_col])
        .groupBy("q_id")
        .agg(F.count("*").alias("hits"))
    )
    base = exact.select("q_id").distinct()
    return base.join(hits, "q_id", "left").selectExpr(
        "q_id",
        "cast(coalesce(hits, 0) as bigint) as hits",
        f"cast(coalesce(hits, 0) * 1000 div {k} as bigint) as recall_milli",
    )


def ann_recall_sql(
    k: int = 5,
    query_pred: str = "vec_id % 100 = 0",
    source_sql: str = "embeddings",
) -> str:
    return f"""
    WITH exact_tk AS (
      SELECT * FROM ({cosine_topk_sql(k, query_pred, source_sql)})
    ),
    approx_tk AS (
      SELECT * FROM ({lsh_topk_sql(k, query_pred, source_sql)})
    ),
    hits AS (
      SELECT e.q_id, count(*) AS hits
      FROM exact_tk e JOIN approx_tk a
        ON e.q_id = a.q_id AND e.vec_id = a.vec_id
      GROUP BY 1
    )
    SELECT b.q_id,
           CAST(coalesce(hits, 0) AS BIGINT) AS hits,
           CAST(coalesce(hits, 0) * 1000 // {k} AS BIGINT) AS recall_milli
    FROM (SELECT DISTINCT q_id FROM exact_tk) b LEFT JOIN hits USING (q_id)
    """


# -------------------------------------------------- persisted IVF index

def ivf_build_index(
    emb: DataFrame,
    base: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 61,
    kmeans_rounds: int = 0,
) -> None:
    """Build and PERSIST an IVF index — the build-once/query-many
    deployment shape: centroids to ``base/centroids`` (k rows) and
    vector assignments to ``base/assignments`` HIVE-PARTITIONED BY
    cent_id, so a query's probes read only its nprobe partitions
    (partition pruning does the inverted-list seek; at 100 TB this is
    the difference between scanning the corpus per query batch and
    scanning nprobe lists). ``kmeans_rounds`` > 0 refines the stride
    seed centroids with the bit-exact milli-integer Lloyd iterations
    (``kmeans_milli``)."""
    if kmeans_rounds > 0:
        cents = kmeans_milli(
            emb, stride=stride, iters=kmeans_rounds,
            id_col=id_col, vec_col=vec_col,
        ).select("cent_id", F.col("cv").alias("c_vec"))
    else:
        cents = emb.where(f"{id_col} % {stride} = 0").select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("c_vec")
        )
    cents = cents.localCheckpoint()
    cents.write.mode("overwrite").parquet(f"{base}/centroids")
    assign = ivf_assignments(emb, cents, id_col, vec_col)
    assign.write.mode("overwrite").partitionBy("cent_id").parquet(
        f"{base}/assignments"
    )


def ivf_assignments(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (id, vec, cent_id) for every vector.

    Argmax as a hash-aggregate, not a row_number window: the window
    sort-shuffles all n x k scored rows; max_by partial-aggregates
    map-side and never sorts. Tie-break matches a
    (ccos desc, cent_id asc) ordering — struct comparison is
    lexicographic and -cent_id flips asc into the max."""
    bcents = F.broadcast(
        cents.withColumn("c_n", F.sqrt(_dot("c_vec", "c_vec")))
    )
    scored = _spread(emb).select(id_col, vec_col).withColumn(
        "v_n", F.sqrt(_dot(vec_col, vec_col))
    ).crossJoin(bcents).withColumn(
        "ccos", _dot(vec_col, "c_vec") / (F.col("v_n") * F.col("c_n"))
    )
    # group by id ONLY (grouping by the array column would fall back
    # to SortAggregate — arrays aren't hash-aggregatable); the vector
    # rides inside the max_by payload struct instead
    return scored.groupBy(id_col).agg(
        F.expr(
            f"max_by(struct(cent_id, {vec_col}), struct(ccos, -cent_id))"
        ).alias("_m")
    ).select(id_col, f"_m.{vec_col}", "_m.cent_id")


def ivf_query_index(
    spark,
    base: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: nearest ``nprobe`` centroids per
    query (broadcast k-row table), then a cent_id equi-join against
    the partitioned assignment store — `.explain` shows PartitionFilters
    on cent_id, i.e. only the probed inverted lists are scanned.
    Matches ``ivf_topk`` exactly for the same centroid table."""
    cents = F.broadcast(
        spark.read.parquet(f"{base}/centroids").withColumn(
            "c_n", F.sqrt(_dot("c_vec", "c_vec"))
        )
    )
    # per-row norm precompute (same pattern as ivf_assignments /
    # cosine_topk): sqrt of the self-fold once per query row, carried
    # through both the probe cross and the final rerank — each pair
    # then pays ONE dot fold instead of three; the cos doubles are
    # bit-identical (same fold into sqrt, same operand order)
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_n", F.sqrt(_dot("q_vec", "q_vec")))
    qscored = q.crossJoin(cents).withColumn(
        "ccos",
        _dot("q_vec", "c_vec") / (F.col("q_n") * F.col("c_n")),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id").asc()
    )
    probes = (
        qscored.withColumn("crank", F.row_number().over(w))
        .where(f"crank <= {nprobe}")
        .select("q_id", "q_vec", "q_n", "cent_id")
        # pin: probes feed BOTH the probe-id collect and the final
        # join; without this the query x centroid pass runs twice
        # (same lazy-pin convention as kmeans_milli)
        .localCheckpoint()
    )
    # driver-side probe list -> IN-list partition filter on the scan:
    # the probed cent_ids are tiny (n_queries x nprobe), and inlining
    # them into the read is what turns partition pruning ON for the
    # assignment store
    probe_ids = [int(r["cent_id"]) for r in
                 probes.select("cent_id").distinct().collect()]
    assign = spark.read.parquet(f"{base}/assignments").where(
        F.col("cent_id").isin(probe_ids)
    ).withColumn("v_n", F.sqrt(_dot(vec_col, vec_col)))
    pairs = assign.join(F.broadcast(probes), "cent_id").where(
        F.col(id_col) != F.col("q_id")
    )
    scored = pairs.withColumn(
        "cos",
        _dot(vec_col, "q_vec") / (F.col("v_n") * F.col("q_n")),
    )
    win = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("q_id", id_col, "rank")
    )


# ----------------------------------------------------------- SemDeDup

def semdedup(
    emb: DataFrame,
    threshold_milli: int = 950,
    stride: int = 61,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023
    arXiv:2303.09540): k-means clusters the embedding space, pairwise
    cosine runs ONLY within each cluster, pairs >= ``threshold_milli``
    form semantic-duplicate groups, and each group keeps its minimum
    id. Returns one row per vector:
    (vec_id, cent_id, rep, keep) — ``rep`` is the kept representative
    of the vector's duplicate group (itself when unique).

    This is the scale answer to embedding near-dup at 100 TB: the
    quadratic pair space shrinks from O(n^2) to sum of cluster^2,
    and cluster size tracks ``stride`` by construction (k = n/stride
    centroids). The cluster pass reuses ``kmeans_milli`` (bit-exact
    deterministic Lloyd) so the whole op is oracle-checkable.

    100 TB shape: broadcast k-row centroid table -> one map-side
    ``max_by`` hash-agg argmin (no window, no sort — the
    ivf_build_index pattern), one equi-join on cent_id for pairs
    (bounded by cluster size; ``max_cluster`` caps degenerate
    clusters via rank-1 representative pairing like the band-LSH
    caps), then per-cluster components in ONE grouped pass — pairs
    cannot span clusters, so no distributed label loop is needed.
    No driver state.
    """
    if dim is None:
        row = emb.select(vec_col).head()
        dim = len(row[0]) if row is not None else DIM
    cents = kmeans_milli(emb, stride, iters, id_col, vec_col, dim=dim)
    # qq (self-dot) once per vector; the Arrow assignment pass replays
    # the exact (qq - 2*dot) + cc fold/op sequence of _d2_sql.
    # qn = sqrt(qq): the pair stage's per-side norm, computed once
    # per vector instead of once per within-cluster pair
    q = _spread(emb).select(
        id_col, F.expr(_MILLI.format(v=vec_col)).alias("qv")
    ).withColumn("qq", F.expr(_dot_sql("qv", "qv")))
    assign = _nearest_assign_arrow(q, cents, id_col, dim).select(
        id_col, "cent_id", "qv", F.sqrt("qq").alias("qn")
    )
    # pin the within-cluster pair join's parallelism: the assignment
    # table is bytes-small, so AQE coalesces the cent_id shuffle to 1-2
    # partitions by input size — but the self-join amplifies ~cluster-
    # size x, so pair scoring ran nearly single-threaded. The keyed
    # repartition is exempt from coalescing and reused by the join
    # (same fix as dedup.minhash_candidates' banded self-join).
    assign = assign.repartition(
        int(emb.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        "cent_id",
    )

    a = assign.selectExpr(
        "cent_id", f"{id_col} as vec_a", "qv as qa", "qn as na"
    )
    b = assign.selectExpr(
        "cent_id", f"{id_col} as vec_b", "qv as qb", "qn as nb"
    )
    tail = None
    if max_cluster is not None:
        w = Window.partitionBy("cent_id").orderBy(F.col(id_col).asc())
        ranked = assign.withColumn("_rk", F.row_number().over(w))
        rep = ranked.where("_rk = 1").selectExpr(
            "cent_id", f"{id_col} as vec_a", "qv as qa", "qn as na"
        )
        tail = (
            ranked.where(F.col("_rk") > max_cluster)
            .selectExpr("cent_id", f"{id_col} as vec_b", "qv as qb", "qn as nb")
            .join(rep, "cent_id")
        )
        head = ranked.where(F.col("_rk") <= max_cluster)
        a = head.selectExpr("cent_id", f"{id_col} as vec_a", "qv as qa", "qn as na")
        b = head.selectExpr("cent_id", f"{id_col} as vec_b", "qv as qb", "qn as nb")
    cand = a.join(b, "cent_id").where("vec_a < vec_b")
    if tail is not None:
        cand = cand.unionByName(tail.where("vec_a < vec_b"))
    # identical float sequence to the DuckDB twin: sequential-fold
    # dots, cos first, then * 1000, then floor
    cos = _dot("qa", "qb") / (F.col("na") * F.col("nb"))
    pairs = cand.select(
        "cent_id", "vec_a", "vec_b",
        F.floor(cos * 1000).cast("bigint").alias("cos_milli"),
    ).where(F.col("cos_milli") >= threshold_milli)

    # components WITHOUT the distributed label loop: semdedup's pairs
    # exist only WITHIN a cluster (the cent_id equi-join above is the
    # operator's defining bound), so no component can span clusters —
    # a per-cluster union-find over the tiny above-threshold pair set
    # replaces the O(log diameter) rounds of ``dedup_clusters`` (each
    # round a full shuffle + job) with ONE grouped Arrow pass. Work
    # per group is linear in that cluster's pairs, strictly dominated
    # by the pair enumeration that produced them, so this adds no new
    # scale hazard; labels are the same exact integers (min reachable
    # id — union-by-min-root below), bit-identical to the recursive-
    # closure oracle. The general cross-bucket graphs (minhash/
    # simhash/phash) keep ``dedup_clusters``.
    def _uf(pdf):
        import numpy as _np
        import pandas as _pd

        va = pdf["vec_a"].to_numpy(dtype=_np.int64)
        vb = pdf["vec_b"].to_numpy(dtype=_np.int64)
        ids = _np.unique(_np.concatenate([va, vb]))
        idx = {int(v): i for i, v in enumerate(ids)}
        parent = _np.arange(len(ids))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for x, y in zip(va, vb):
            rx, ry = find(idx[int(x)]), find(idx[int(y)])
            if rx != ry:
                # ids are sorted, so the smaller root index IS the
                # smaller id: attaching the larger root under the
                # smaller keeps every root at its component's min id
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        roots = _np.array([find(i) for i in range(len(ids))])
        return _pd.DataFrame({id_col: ids, "cluster": ids[roots]})

    clus = pairs.groupBy("cent_id").applyInPandas(
        _uf, f"{id_col} long, cluster long"
    )
    return (
        assign.join(clus, id_col, "left")
        .selectExpr(
            id_col,
            "cast(cent_id as bigint) as cent_id",
            f"cast(coalesce(cluster, {id_col}) as bigint) as rep",
            f"coalesce(cluster, {id_col}) = {id_col} as keep",
        )
    )


def semdedup_sql(
    threshold_milli: int = 950,
    source_sql: str = "embeddings",
    stride: int = 61,
    iters: int = 2,
    dim: int = DIM,
) -> str:
    """DuckDB twin: Lloyd CTEs -> final assignment -> within-cluster
    cosine pairs -> recursive-CTE components -> per-vector verdict."""
    from .dedup import closure_sql

    ctes = _lloyd_fr_ctes(source_sql, stride, iters, dim)
    ctes.append("""asg AS (
      SELECT vec_id, qv, cent_id FROM fr WHERE rk = 1
    )""")
    pairs_sql = f"""
      SELECT vec_a, vec_b FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(floor(({_duck_dot('a.qv', 'b.qv')}
                 / (sqrt({_duck_dot('a.qv', 'a.qv')})
                    * sqrt({_duck_dot('b.qv', 'b.qv')}))) * 1000)
                 AS BIGINT) AS cos_milli
        FROM asg a JOIN asg b
          ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      ) WHERE cos_milli >= {threshold_milli}
    """
    final = """
    SELECT asg.vec_id,
           CAST(asg.cent_id AS BIGINT) AS cent_id,
           CAST(coalesce(c.cluster, asg.vec_id) AS BIGINT) AS rep,
           coalesce(c.cluster, asg.vec_id) = asg.vec_id AS keep
    FROM asg LEFT JOIN clus c ON asg.vec_id = c.doc_id
    """
    # closure expects pairs named (doc_a, doc_b)
    pairs_sql = pairs_sql.replace("vec_a", "doc_a").replace(
        "vec_b", "doc_b"
    )
    return closure_sql(
        pairs_sql, extra_ctes=",\n".join(ctes), final_sql=final
    )


# ------------------------------------------- random projection (JL)

def rp_project(
    emb: DataFrame,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection of the embedding column
    onto ``out_dim`` deterministic pseudo-random hyperplanes (the same
    integer-hash plane family the LSH bucketer uses) — the standard
    dimensionality-reduction pre-filter: distances are approximately
    preserved, so a coarse top-k/near-dup pass can run over out_dim
    components instead of DIM, with the exact kernel refining the
    shortlist. Output long-form (vec_id, j, v_milli) with the
    component exact-floored to milli units, so the projection itself
    is oracle-checkable.

    100 TB shape: pure narrow map — out_dim sequential-fold dot
    products per row inside one codegen stage, zero exchanges; the
    posexplode is a bounded in-row unnest."""
    arr = "array(" + ", ".join(
        f"cast(floor({_dot_sql(vec_col, _plane_lit_spark(j))} * 1000.0)"
        " as bigint)"
        for j in range(out_dim)
    ) + ")"
    return _spread(emb).select(
        F.col(id_col), F.expr(arr).alias("_p")
    ).select(
        id_col,
        F.posexplode("_p").alias("j", "v_milli"),
    ).selectExpr(id_col, "cast(j as bigint) as j", "v_milli")


def rp_project_sql(
    out_dim: int = 8, source_sql: str = "embeddings"
) -> str:
    legs = []
    for j in range(out_dim):
        lit = "[" + ", ".join(repr(c) for c in _plane(j)) + "]::DOUBLE[]"
        legs.append(
            f"SELECT vec_id, CAST({j} AS BIGINT) AS j, "
            f"CAST(floor(list_dot_product(embedding::DOUBLE[], {lit})"
            f" * 1000.0) AS BIGINT) AS v_milli FROM {source_sql}"
        )
    return " UNION ALL ".join(legs)
