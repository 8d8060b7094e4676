"""Deterministic sampling for training-data pipelines: stratified
top-N per stratum and fractional hash sampling.

Spark's ``df.sample`` is seed-dependent on partitioning (a repartition
changes the sample) — useless for reproducible dataset curation. Both
operators here key the decision on a salted multiplicative integer
hash of the ROW ID, so the sample is a pure function of the data:
re-runs, repartitions, and other engines (the DuckDB oracles) produce
the identical sample.

Scale notes: stratified_sample is one window per stratum (hash order)
— a single shuffle on the strata columns; skewed strata are one
partition each, acceptable because only the top-N survive (use
hash_sample first to pre-thin monster strata). hash_sample is a pure
codegen filter — zero shuffles, pushed to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MULT = 2654435761  # 2^32 * golden-ratio conjugate (Fibonacci hashing)
M32 = 4294967296
M31 = 2147483647  # 2^31 - 1: pre-reduction keeps the product in int64


def _hash_sql(id_expr: str, salt: int) -> str:
    """Salted multiplicative hash -> [0, 2^32); identical arithmetic in
    Spark SQL and DuckDB (pure bigint ops). The id reduces mod 2^31-1
    BEFORE the multiply: the product then tops out at ~5.7e18 < 2^63-1,
    so no id value can overflow (Spark would wrap silently, DuckDB
    would error — silently-divergent engines, the worst failure). The
    +M31 before the second mod normalizes NEGATIVE ids (both engines'
    % returns sign-of-dividend; a negative hash would make every
    negative-id row pass any hash_sample cut)."""
    return (
        f"((((({id_expr}) % {M31} + {M31} + {salt}) % {M31}) * {MULT})"
        f" % {M32})"
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...],
    n_per: int,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Keep the ``n_per`` rows with smallest salted hash per stratum.
    Adds ``smp_rank`` (1..n_per within the stratum, hash order)."""
    h = F.expr(_hash_sql(id_col, salt))
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("smp_rank", F.row_number().over(w))
        .where(F.col("smp_rank") <= n_per)
    )


def hash_sample(
    df: DataFrame, fraction: float, id_col: str, salt: int = 0
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose salted hash
    falls below fraction * 2^32. Pure filter — no shuffle, no state."""
    cut = int(fraction * M32)
    return df.where(F.expr(_hash_sql(id_col, salt)) < cut)


def stratified_sample_sql(
    strata_cols: tuple[str, ...],
    n_per: int,
    id_col: str,
    salt: int = 0,
    source_sql: str = "documents",
    select_cols: str = "*",
) -> str:
    strata = ", ".join(strata_cols)
    h = _hash_sql(id_col, salt)
    return f"""
    SELECT {select_cols}, smp_rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {strata} ORDER BY {h} ASC, {id_col} ASC
      ) AS smp_rank
      FROM {source_sql}
    ) WHERE smp_rank <= {n_per}
    """


def hash_sample_sql(
    fraction: float, id_col: str, salt: int = 0,
    source_sql: str = "documents", select_cols: str = "*",
) -> str:
    cut = int(fraction * M32)
    return (
        f"SELECT {select_cols} FROM {source_sql} "
        f"WHERE {_hash_sql(id_col, salt)} < {cut}"
    )


def mix_sample(
    df: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Token-budget data mixing — the dataset-composition stage of a
    pretraining pipeline (the static mixture-weights setting of
    DoReMi, Xie et al. 2023): each source contributes docs, in
    deterministic salted-hash order, until that source's TOKEN budget
    is reached. A doc is kept iff it STARTS inside its source's budget
    (cum - tokens < budget), so every listed source lands within one
    doc of its target and the sample is a pure function of the data —
    rerun-, repartition-, and engine-stable. Sources absent from
    ``budgets`` contribute nothing (budget 0).

    Output: (doc_id, source, n_tokens, cum_tokens).

    100 TB shape: one narrow projection (token count is a codegen
    split+size), one window per source — a single shuffle on the
    source key; the running sum is streaming within each partition.
    Per-source ordering is the same cost stratified_sample already
    pays; monster sources pre-thin with hash_sample. No Python, no
    driver state.
    """
    budget_case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN {int(b)}"
        for s, b in sorted(budgets.items())
    ) + " ELSE 0 END"
    h = F.expr(_hash_sql(id_col, salt))
    w = (
        Window.partitionBy(source_col)
        .orderBy(h.asc(), F.col(id_col).asc())
    )
    toks = df.select(
        id_col, source_col,
        F.expr(f"size(split({text_col}, ' '))").alias("n_tokens"),
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("_budget", F.expr(budget_case))
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget"))
        .selectExpr(
            id_col, source_col,
            "cast(n_tokens as bigint) as n_tokens",
            "cast(cum_tokens as bigint) as cum_tokens",
        )
    )


def domain_cap(
    df: DataFrame,
    max_share_milli: int,
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Corpus-relative domain balancing (the RefinedWeb/Dolma-style
    "no domain may dominate" rule): each domain keeps docs in
    deterministic salted-hash order until it holds ``max_share_milli``
    per-mille of the CORPUS-TOTAL tokens; the rest drop. Unlike
    ``mix_sample`` (absolute per-source budgets fixed up front), the
    cap is RELATIVE — it reflows automatically as the corpus grows, so
    the same stage works at sf0.001 and at 100 TB without retuning.

    A doc is kept iff it STARTS inside the cap (cum - tokens < cap),
    mirroring mix_sample's within-one-doc guarantee. All integer
    arithmetic (milli * total div 1000) — engine-exact.

    Output: (doc_id, domain, n_tokens, cum_tokens, cap_tokens).

    100 TB shape: one codegen token-count projection, ONE scalar
    hash-agg for the corpus total (broadcast back as a 1-row cross
    join — no second pass over the data), one window per domain
    (single shuffle on the domain key, streaming running sum). Monster
    domains are one partition each; pre-thin with hash_sample if a
    single domain's row count breaks a task.
    """
    toks = df.select(
        F.col(id_col), F.col(domain_col),
        F.expr(f"size(split({text_col}, ' '))")
        .cast("long").alias("n_tokens"),
    )
    total = toks.agg(F.sum("n_tokens").alias("_total"))
    h = F.expr(_hash_sql(id_col, salt))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(h.asc(), F.col(id_col).asc())
    )
    return (
        toks.crossJoin(F.broadcast(total))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "cap_tokens",
            F.expr(f"({int(max_share_milli)} * _total) div 1000"),
        )
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("cap_tokens"))
        .selectExpr(
            id_col, domain_col,
            "n_tokens",
            "cast(cum_tokens as bigint) as cum_tokens",
            "cap_tokens",
        )
    )


def token_shards(
    df: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
    num_parts: int | None = None,
) -> DataFrame:
    """Token-balanced training-shard assignment over the deterministic
    epoch order — the output stage of a pretraining data pipeline:
    docs are globally ordered by salted hash (a reshuffle per epoch =
    a new salt), the GLOBAL running token total is computed, and each
    doc lands in shard ``(cum - n_tokens) div target_tokens`` — shard
    boundaries fall on token counts, so every shard holds ~target
    tokens regardless of document-length skew.

    The global running sum is the point: Spark's own
    ``Window.orderBy`` without a partition key collapses to ONE task —
    the textbook 100 TB scale-killer. This implements the two-phase
    distributed scan instead: range-partition on the hash order, local
    per-partition running sums, then a bounded per-PARTITION total
    collect (``num_parts`` rows — 32 locally, a few thousand on a real
    cluster, never row-scaled) broadcast back as start offsets. The
    ranged frame is localCheckpoint-pinned: the offsets are only valid
    for the exact partitioning they were measured on (range boundaries
    are sampled, so an un-pinned re-evaluation could re-draw them
    between the two phases).

    Output: (id, n_tokens, cum_tokens, shard) where cum_tokens is the
    INCLUSIVE global prefix sum in (hash, id) order — engine-exact vs
    a plain ``sum() OVER (ORDER BY hash, id)``.
    """
    import pandas as pd
    from pyspark import TaskContext

    if int(target_tokens) <= 0:
        raise ValueError(
            f"target_tokens must be positive, got {target_tokens}"
        )
    if num_parts is None:
        num_parts = df.sparkSession.sparkContext.defaultParallelism
    toks = df.selectExpr(
        f"{id_col}",
        f"cast(size(split({text_col}, ' ')) as long) as n_tokens",
        f"cast({_hash_sql(id_col, salt)} as long) as _h",
    )
    ranged = toks.repartitionByRange(
        num_parts, F.col("_h"), F.col(id_col)
    ).sortWithinPartitions("_h", id_col).localCheckpoint()

    partials = {
        r["pid"]: r["tot"]
        for r in ranged.groupBy(
            F.spark_partition_id().alias("pid")
        ).agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets = {}
    run = 0
    for pid in range(ranged.rdd.getNumPartitions()):
        offsets[pid] = run
        run += int(partials.get(pid, 0))

    target = int(target_tokens)

    def scan(batches):
        pid = TaskContext.get().partitionId()
        cum = offsets.get(pid, 0)
        for pdf in batches:
            n = pdf["n_tokens"].to_numpy("int64")
            local = n.cumsum() + cum
            cum = int(local[-1]) if len(local) else cum
            yield pd.DataFrame({
                "id": pdf[id_col],
                "n_tokens": n,
                "cum_tokens": local,
                "shard": (local - n) // target,
            })

    id_type = dict(df.dtypes)[id_col]
    return ranged.mapInPandas(
        scan,
        f"id {id_type}, n_tokens long, cum_tokens long, shard long",
    ).withColumnRenamed("id", id_col)


def token_shards_sql(
    target_tokens: int,
    id_col: str = "doc_id",
    salt: int = 0,
    source_sql: str = "documents",
) -> str:
    """DuckDB twin of :func:`token_shards` — the plain (single-node)
    global cumulative window the distributed scan must equal."""
    h = _hash_sql(id_col, salt)
    return f"""
    SELECT {id_col}, n_tokens,
           CAST(cum AS BIGINT) AS cum_tokens,
           CAST((cum - n_tokens) // {int(target_tokens)} AS BIGINT)
             AS shard
    FROM (
      SELECT {id_col}, n_tokens,
             sum(n_tokens) OVER (ORDER BY {h}, {id_col}) AS cum
      FROM (
        SELECT {id_col},
               CAST(length(string_split(text, ' ')) AS BIGINT)
                 AS n_tokens
        FROM {source_sql}
      )
    )
    """


def write_token_shards(
    df: DataFrame,
    path: str,
    target_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
    num_parts: int | None = None,
) -> DataFrame:
    """Materialize the training shards: token_shards assignment joined
    back to the full rows, written hive-partitioned by ``shard`` with
    rows in epoch order inside every shard file (``sortWithinPartitions``
    must LEAD with the partition column — the dynamic-partition writer
    re-sorts by it otherwise and would scramble the epoch order).
    A trainer streams shard directories in shard order and rows in file
    order and sees exactly the deterministic epoch permutation.
    Returns the assignment frame for inspection."""
    plan = token_shards(
        df, target_tokens, id_col=id_col, text_col=text_col,
        salt=salt, num_parts=num_parts,
    )
    out = df.join(plan.select(id_col, "cum_tokens", "shard"), id_col)
    (
        out.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "cum_tokens")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return plan


def domain_cap_sql(
    max_share_milli: int,
    id_col: str = "doc_id",
    domain_col: str = "source",
    salt: int = 0,
    source_sql: str = "documents",
) -> str:
    """DuckDB twin of :func:`domain_cap` (``//`` floors like Spark's
    ``div`` truncates — identical on the non-negative values here)."""
    h = _hash_sql(id_col, salt)
    return f"""
    SELECT {id_col}, {domain_col}, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(({int(max_share_milli)} * _total) // 1000 AS BIGINT)
             AS cap_tokens
    FROM (
      SELECT {id_col}, {domain_col}, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY {domain_col} ORDER BY {h} ASC, {id_col} ASC
             ) AS cum_tokens,
             sum(n_tokens) OVER () AS _total
      FROM (
        SELECT {id_col}, {domain_col},
               CAST(length(string_split(text, ' ')) AS BIGINT)
                 AS n_tokens
        FROM {source_sql}
      )
    )
    WHERE cum_tokens - n_tokens
          < ({int(max_share_milli)} * _total) // 1000
    """


def mix_sample_sql(
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 0,
    source_sql: str = "documents",
) -> str:
    budget_case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN {int(b)}"
        for s, b in sorted(budgets.items())
    ) + " ELSE 0 END"
    h = _hash_sql(id_col, salt)
    return f"""
    SELECT {id_col}, {source_col},
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM (
      SELECT {id_col}, {source_col}, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY {source_col} ORDER BY {h} ASC, {id_col} ASC
             ) AS cum_tokens
      FROM (
        SELECT {id_col}, {source_col},
               length(string_split(text, ' ')) AS n_tokens
        FROM {source_sql}
      )
    )
    WHERE cum_tokens - n_tokens < ({budget_case})
    """
