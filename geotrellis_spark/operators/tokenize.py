"""Distributed BPE tokenization: pair statistics, merge-rule training,
and vocabulary-compressed encoding.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") is the canonical subword tokenizer
of LLM pipelines. The distributed decomposition used here is the
standard one:

- the corpus compresses to a (word, freq) VOCABULARY table first —
  one hash-agg; every later pass touches vocab rows, not corpus rows
  (the vocabulary is orders of magnitude smaller than 100 TB of text);
- each training round is one weighted pair-count hash-agg over the
  vocabulary plus a 1-row driver fetch of the argmax pair (the merge
  rule IS global algorithm state, exactly like a k-means centroid);
- merge application is a sequential left fold over each word's symbol
  array (``aggregate`` higher-order function — greedy left-to-right,
  the reference semantics), still vocabulary-sized;
- encoding broadcasts the learned merge ranks and tokenizes the
  DISTINCT words once in an Arrow-batched pandas UDF, then equi-joins
  the result back onto the corpus word stream.

``bpe_pair_stats`` (one round, no iteration) is SQL-expressible and
has an exact DuckDB twin — the registered oracle query for this
module. The iterative trainer/encoder are pytest-verified against a
from-scratch pure-Python reference implementation of the published
algorithm.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

EOW = "</w>"  # end-of-word marker (Sennrich-style)


def _word_freq(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(word, freq) vocabulary table — the corpus-compression step."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where("word <> ''")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


_SYMS = (
    "transform(sequence(1, length(word)), i -> "
    "if(i = length(word), substring(word, i, 1) || '{eow}', "
    "substring(word, i, 1)))"
).format(eow=EOW)

# Adjacent-pair unnest. Spark's sequence(1, 0) is DESCENDING [1, 0]
# (not empty like DuckDB's generate_series), so a single-symbol word
# must be guarded to produce zero pairs, not an index error.
_PAIRS = (
    "explode(if(size(syms) < 2, "
    "cast(array() as array<struct<a: string, b: string>>), "
    "transform(sequence(1, size(syms) - 1), i -> "
    "struct(element_at(syms, i) as a, element_at(syms, i + 1) as b))"
    ")) as p"
)


def bpe_pair_stats(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Round-1 BPE pair statistics: the top-``k`` adjacent character
    pairs by corpus-weighted frequency (the first merge the trainer
    would pick is rank 1). Output: (a, b, cnt, rank) with the
    deterministic (cnt desc, a asc, b asc) order.

    100 TB shape: corpus -> (word,freq) hash-agg, then every pass is
    vocabulary-sized — a bounded in-row pair explode + one hash-agg +
    TakeOrderedAndProject top-k. The pair domain is charset^2, tiny.
    """
    wf = _word_freq(docs, id_col, text_col)
    pairs = wf.selectExpr(
        "freq", f"{_SYMS} as syms"
    ).selectExpr(
        "freq",
        _PAIRS,
    )
    agg = pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt"))
    order = [F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()]
    topk = agg.orderBy(*order).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(*order)  # k rows only — post-limit
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("a", "b", F.col("cnt").cast("long").alias("cnt"), "rank")


def bpe_pair_stats_sql(
    source_sql: str = "documents", k: int = 20
) -> str:
    return f"""
    WITH wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM {source_sql}
      ) WHERE word <> '' GROUP BY 1
    ),
    syms AS (
      SELECT freq,
             list_transform(generate_series(1, length(word)), i ->
               CASE WHEN i = length(word)
                    THEN substring(word, i, 1) || '{EOW}'
                    ELSE substring(word, i, 1) END) AS s
      FROM wf
    ),
    pairs AS (
      SELECT freq, s[i] AS a, s[i + 1] AS b
      FROM syms, LATERAL unnest(generate_series(1, len(s) - 1)) t(i)
    ),
    agg AS (SELECT a, b, sum(freq) AS cnt FROM pairs GROUP BY 1, 2)
    SELECT a, b, CAST(cnt AS BIGINT) AS cnt, rank FROM (
      SELECT a, b, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC)
                  AS BIGINT) AS rank
      FROM agg
    ) WHERE rank <= {k}
    """


def _sq(s: str) -> str:
    """Escape a symbol for embedding in a Spark SQL string literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(col: str, a: str, b: str) -> str:
    """Greedy left-to-right application of merge (a,b) -> a||b over a
    symbol array, as a sequential ``aggregate`` fold: if the
    accumulator's last symbol is ``a`` and the current is ``b``,
    replace the last with the merged symbol, else append. After a
    merge the merged symbol becomes the new tail, so overlapping
    occurrences ('aaa' under ('a','a')) resolve left-first — the
    reference algorithm's semantics."""
    qa, qb = _sq(a), _sq(b)
    qab = _sq(a + b)
    return (
        f"aggregate({col}, cast(array() as array<string>), (acc, s) -> "
        f"if(size(acc) > 0 AND element_at(acc, -1) = '{qa}' "
        f"AND s = '{qb}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{qab}')), "
        f"concat(acc, array(s))))"
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_freq: int = 2,
    checkpoint_every: int = 8,
):
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns
    (merges, vocab): ``merges`` is a list of (rank, a, b) tuples in
    application order (driver-side — n_merges rows of algorithm state,
    the same bounded-collect contract as k-means centroids), ``vocab``
    the final (word, freq, syms) DataFrame.

    Each round: one vocabulary-sized pair-count hash-agg, one 1-row
    TakeOrdered fetch, one narrow fold-map applying the merge.
    ``checkpoint_every`` pins lineage so round i+1 does not replay
    rounds 1..i. Stops early when no pair reaches ``min_freq``.
    """
    vocab = _word_freq(docs, id_col, text_col).selectExpr(
        "word", "freq", f"{_SYMS} as syms"
    ).localCheckpoint()
    merges: list[tuple[int, str, str]] = []
    for r in range(1, n_merges + 1):
        best = (
            vocab.selectExpr("freq", _PAIRS)
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((r, a, b))
        vocab = vocab.selectExpr(
            "word", "freq", _merge_expr("syms", a, b) + " as syms"
        )
        if r % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab.localCheckpoint()


def _encode_word(word: str, ranks: dict) -> list:
    """Reference BPE encode of one word against learned merge ranks:
    repeatedly merge the present pair with the LOWEST rank until no
    learned pair remains. (Used inside the Arrow-batched UDF — pure
    function, no Spark objects.)"""
    syms = [
        (c + EOW if i == len(word) - 1 else c)
        for i, c in enumerate(word)
    ]
    while len(syms) > 1:
        ranked = [
            (ranks.get((syms[i], syms[i + 1])), i)
            for i in range(len(syms) - 1)
        ]
        ranked = [(rk, i) for rk, i in ranked if rk is not None]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i: i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with learned merges; per-doc output
    (doc_id, n_words, n_tokens, n_chars). The pandas UDF tokenizes
    only the DISTINCT words (vocabulary-compressed — the 100 TB
    shape: the vocab is millions of rows where the corpus is
    trillions of tokens), and the per-word token count equi-joins
    back onto the corpus word stream; the heavy path stays JVM-side.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {(a, b): r for r, a, b in merges}

    @pandas_udf("int")
    def n_tok(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(_encode_word(w, ranks)))

    words = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where("word <> ''")
    vocab = words.select("word").distinct().withColumn(
        "n_tok", n_tok(F.col("word"))
    )
    return (
        words.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
    )
