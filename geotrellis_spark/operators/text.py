"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Not in the GeoTrellis reference; first-class engine additions. All
JVM-side expressions (split/filter lambdas, regexp counts, exact
integer arithmetic) with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
    "es": ("el", "y", "los"),
}
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

TOKEN_RE = "[a-z0-9]+"

FP_BASE = 31
FP_MOD = 1_000_000_007
FP_LEN = 32  # prefix length (min doc length in fixtures is ~48)


def _count_word(text_col: str, word: str) -> str:
    """SQL (valid in Spark AND DuckDB): occurrences of a word among
    space-separated tokens, via a list lambda."""
    return f"size(filter(split({text_col}, ' '), x -> x = '{word}'))"


def _count_word_duck(text_col: str, word: str) -> str:
    return f"length(list_filter(string_split({text_col}, ' '), x -> x = '{word}'))"


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language scores + argmax prediction (deterministic
    tiebreak: en > de > fr > es > unknown)."""
    score_cols = []
    out = docs
    for lang, words in LANG_MARKERS.items():
        expr = " + ".join(_count_word(text_col, w) for w in words)
        out = out.withColumn(f"score_{lang}", F.expr(f"cast({expr} as bigint)"))
        score_cols.append(f"score_{lang}")
    langs = list(LANG_MARKERS)
    best = "CASE "
    for lang in langs:
        # earlier-listed languages win ties (en > de > fr > es): beat
        # every EARLIER language strictly, LATER ones non-strictly
        conds = [
            f"score_{lang} > score_{o}"
            for o in langs
            if langs.index(o) < langs.index(lang)
        ] + [
            f"score_{lang} >= score_{o}"
            for o in langs
            if langs.index(o) > langs.index(lang)
        ]
        conds.append(f"score_{lang} > 0")
        best += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    best += "ELSE 'unknown' END"
    return out.selectExpr(id_col, *score_cols, f"{best} as pred_lang")


def lang_id_sql(source_sql: str = "documents") -> str:
    score_sel = []
    for lang, words in LANG_MARKERS.items():
        expr = " + ".join(_count_word_duck("text", w) for w in words)
        score_sel.append(f"CAST({expr} AS BIGINT) AS score_{lang}")
    langs = list(LANG_MARKERS)
    best = "CASE "
    for lang in langs:
        conds = [
            f"score_{lang} > score_{o}"
            for o in langs
            if langs.index(o) < langs.index(lang)
        ] + [
            f"score_{lang} >= score_{o}"
            for o in langs
            if langs.index(o) > langs.index(lang)
        ]
        conds.append(f"score_{lang} > 0")
        best += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    best += "ELSE 'unknown' END"
    return f"""
    WITH scored AS (SELECT doc_id, {', '.join(score_sel)} FROM {source_sql})
    SELECT doc_id, {', '.join(f'score_{lang}' for lang in langs)},
           {best} AS pred_lang
    FROM scored
    """


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / word / stopword-ratio quality features + boolean gate.
    All-exact arithmetic (int counts; one final exact int division)."""
    stop_expr = " + ".join(_count_word(text_col, w) for w in STOPWORDS)
    return docs.selectExpr(
        id_col,
        f"length({text_col}) as n_chars_m",
        f"size(split({text_col}, ' ')) as n_words",
        f"cast({stop_expr} as bigint) as n_stop",
    ).selectExpr(
        id_col,
        "n_chars_m",
        "n_words",
        "n_stop",
        # avg word length x1000, exact integer math
        "cast((n_chars_m - n_words + 1) * 1000 / n_words as bigint) as awl_millis",
        "(n_words >= 20 AND n_stop * 10 >= n_words) as is_quality",
    )


def quality_score_sql(source_sql: str = "documents") -> str:
    stop_expr = " + ".join(_count_word_duck("text", w) for w in STOPWORDS)
    return f"""
    WITH base AS (
      SELECT doc_id, length(text) AS n_chars_m,
             length(string_split(text, ' ')) AS n_words,
             CAST({stop_expr} AS BIGINT) AS n_stop
      FROM {source_sql}
    )
    SELECT doc_id, n_chars_m, n_words, n_stop,
           CAST(floor((n_chars_m - n_words + 1) * 1000.0 / n_words) AS BIGINT)
             AS awl_millis,
           (n_words >= 20 AND n_stop * 10 >= n_words) AS is_quality
    FROM base
    """


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Regex token count (BPE-ish word/number pieces) + char count."""
    return docs.selectExpr(
        id_col,
        f"cast(regexp_count({text_col}, '{TOKEN_RE}') as bigint) as n_tokens",
        f"cast(length({text_col}) as bigint) as n_chars_m",
    )


def token_count_sql(source_sql: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_m
    FROM {source_sql}
    """


def _fp_terms(dialect_ascii: str, text_col: str) -> str:
    terms = []
    p = 1
    for i in range(1, FP_LEN + 1):
        terms.append(
            f"cast({dialect_ascii}(substr({text_col}, {i}, 1)) as bigint) * {p}"
        )
        p = (p * FP_BASE) % FP_MOD
    return "(" + " + ".join(terms) + f") % {FP_MOD}"


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Polynomial rolling hash of the first FP_LEN chars
    (Karp-Rabin style): sum ascii(c_i) * B^(i-1) mod P. Exact integer
    math, identical in both dialects."""
    return docs.selectExpr(
        id_col, f"cast({_fp_terms('ascii', text_col)} as bigint) as fp"
    )


def fingerprint_sql(source_sql: str = "documents") -> str:
    return f"""
    SELECT doc_id, CAST({_fp_terms('ascii', 'text')} AS BIGINT) AS fp
    FROM {source_sql}
    """


def tfidf_topk(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document with EXACT integer scoring:
    score_milli = (tf * 1000 * N) div df — all bigint arithmetic, so
    ranking is reproducible in any engine (float idf = log(N/df) would
    differ in the last bit across libm implementations; the monotone
    rational surrogate ranks identically for fixed tf). Overflow
    envelope: tf * 1000 * N must stay below 2^63 — safe to N ~= 9e15 /
    tf ~= 1e3, or N ~= 9e12 at tf ~= 1e6; Spark would wrap silently
    while DuckDB errors, so the scale factor is deliberately milli.

    ASCII-fold first (non-letters -> space) so tokenization never
    depends on engine-specific unicode case rules. Plan: explode ->
    (doc, term) count -> term doc-frequency join (term dimension is
    small -> broadcast) -> window top-k per doc. Two aggregations +
    one window, no python."""
    toks = docs.select(
        id_col,
        F.explode(
            F.split(
                F.lower(F.regexp_replace(F.col(text_col), "[^A-Za-z]+", " ")),
                " ",
            )
        ).alias("term"),
    ).where("term <> ''")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n")).alias("_n")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_milli",
            F.expr("(tf * 1000 * n) div df").cast("long"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score_milli").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("trank", F.row_number().over(w))
        .where(F.col("trank") <= k)
        .select(id_col, "term", "score_milli", "trank")
    )


def tfidf_topk_sql(k: int = 3, source_sql: str = "documents") -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(
               lower(regexp_replace(text, '[^A-Za-z]+', ' ', 'g')), ' ')) AS term
      FROM {source_sql}
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term <> '' GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM {source_sql}),
    scored AS (
      SELECT tf.doc_id, tf.term,
             (tf.tf * 1000 * n.n) // dfreq.df AS score_milli
      FROM tf JOIN dfreq USING (term), n
    )
    SELECT doc_id, term, score_milli, trank FROM (
      SELECT doc_id, term, score_milli,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_milli DESC, term ASC) AS trank
      FROM scored
    ) WHERE trank <= {k}
    """


def chunk_docs(
    docs: DataFrame, size: int = 200, overlap: int = 50,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping character chunks (the
    RAG/pretraining chunking primitive): chunk i covers
    [i*(size-overlap), i*(size-overlap)+size). Narrow explode — chunk
    count per doc is ceil((len-overlap)/(size-overlap)) — no shuffle
    at all. Output: (id, chunk_id, chunk_start, chunk_text)."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    return docs.selectExpr(
        id_col,
        f"""explode(sequence(0,
            cast((greatest(length({text_col}) - {overlap}, 1) + {step} - 1)
                 / {step} as int) - 1)) as chunk_id""",
        text_col,
    ).selectExpr(
        id_col,
        "chunk_id",
        f"cast(chunk_id * {step} as bigint) as chunk_start",
        f"substring({text_col}, chunk_id * {step} + 1, {size}) as chunk_text",
    )


def chunk_docs_sql(
    size: int = 200, overlap: int = 50, source_sql: str = "documents"
) -> str:
    step = size - overlap
    return f"""
    SELECT doc_id, chunk_id,
           CAST(chunk_id * {step} AS BIGINT) AS chunk_start,
           substr(text, chunk_id * {step} + 1, {size}) AS chunk_text
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST((greatest(length(text) - {overlap}, 1) + {step} - 1)
                    // {step} AS INT) - 1)) AS chunk_id
      FROM {source_sql}
    )
    """


def pack_concat(
    docs: DataFrame, budget: int = 2048, strata_col: str = "lang",
    id_col: str = "doc_id", len_col: str = "n_chars",
) -> DataFrame:
    """Concatenate-and-chop sequence packing (the standard LLM
    training-data packing): within each stratum, documents concatenate
    in ``id`` order and the stream is chopped every ``budget`` units;
    each doc reports the bin its first unit lands in and its offset
    there. Pure window prefix-sum per stratum — one shuffle on the
    stratum key; the stratum (not the corpus) bounds the sequential
    region, which is what keeps a global concat order scalable.
    Output: (strata, id, bin, bin_offset)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum(len_col).over(w), F.lit(0)).cast("long")
    return docs.select(
        strata_col, id_col,
        (pre / budget).cast("long").alias("bin"),
        (pre % budget).alias("bin_offset"),
    )


def pack_concat_sql(
    budget: int = 2048, strata_col: str = "lang",
    source_sql: str = "documents",
) -> str:
    return f"""
    SELECT {strata_col}, doc_id,
           CAST(floor(pre / {budget}.0) AS BIGINT) AS bin,
           CAST(pre % {budget} AS BIGINT) AS bin_offset
    FROM (
      SELECT {strata_col}, doc_id,
             coalesce(sum(n_chars) OVER (
               PARTITION BY {strata_col} ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS pre
      FROM {source_sql}
    )
    """


BM25_K1_MILLI = 1200
BM25_B_MILLI = 750


def _term_list_sql(terms: tuple[str, ...]) -> str:
    """SQL IN-list for query terms: lowercased (tokens are lowercased,
    so an uppercase query term would silently match nothing) and with
    single quotes doubled (no injection/parse break)."""
    return ", ".join(
        "'" + t.lower().replace("'", "''") + "'" for t in terms
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = ("data", "join"),
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 document ranking for a fixed term query, EXACT integer
    arithmetic end-to-end (k1=1.2, b=0.75 as milli constants; idf is
    the monotone rational surrogate w = ((n-df+1)*100) div df instead
    of the libm log). Per-doc length normalization uses
    L_milli = (dl*1000*n) div dl_sum (= 1000*dl/avgdl, exact).

    contribution per (doc, query term) =
      (w * tf * (k1m+1000)) div (tf*1000 + (k1m*(1000-bm+
                                  (bm*L_milli) div 1000)) div 1000)
    Overflow envelope: w <= 100*n; w*tf*(k1m+1000) must stay < 2^63 —
    safe to n ~= 1e9 at tf ~= 4e4. Plan: tokenize explode -> per-doc
    tf for the |Q| query terms only (narrow filter BEFORE the agg) ->
    broadcast joins of the tiny df/n/dl_sum aggregates -> window
    top-k. Output: (doc_id, score_i, brank)."""
    toks = docs.select(
        id_col,
        F.explode(
            F.split(
                F.lower(F.regexp_replace(F.col(text_col), "[^A-Za-z]+", " ")),
                " ",
            )
        ).alias("term"),
    ).where("term <> ''")
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    totals = F.broadcast(
        dl.agg(
            F.count("*").alias("n"), F.sum("dl").alias("dl_sum")
        )
    )
    q_list = _term_list_sql(query_terms)
    qtf = (
        toks.where(f"term in ({q_list})")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = F.broadcast(
        qtf.groupBy("term").agg(F.count("*").alias("df"))
    )
    k1m, bm = BM25_K1_MILLI, BM25_B_MILLI
    scored = (
        qtf.join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(totals)
        .selectExpr(
            id_col,
            "term",
            f"""(
              (((n - df + 1) * 100) div df) * tf * {k1m + 1000}
            ) div (
              tf * 1000 + ({k1m} * (1000 - {bm} +
                ({bm} * ((dl * 1000 * n) div dl_sum)) div 1000)) div 1000
            ) as contrib""",
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("contrib").cast("long").alias("score_i")
    )
    # global top-k via orderBy+limit (TakeOrderedAndProject: per-
    # partition partial top-k, NO single-partition window over all
    # matching docs); the rank window then runs on only k rows
    from pyspark.sql.window import Window

    order = [F.col("score_i").desc(), F.col(id_col).asc()]
    topk = per_doc.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn(
        "brank", F.row_number().over(w).cast("long")
    ).select(id_col, "score_i", "brank")


def bm25_topk_sql(
    query_terms: tuple[str, ...] = ("data", "join"),
    k: int = 10,
    source_sql: str = "documents",
) -> str:
    k1m, bm = BM25_K1_MILLI, BM25_B_MILLI
    q_list = _term_list_sql(query_terms)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(
               lower(regexp_replace(text, '[^A-Za-z]+', ' ', 'g')), ' ')) AS term
      FROM {source_sql}
    ),
    tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    totals AS (SELECT count(*) AS n, sum(dl) AS dl_sum FROM dl),
    qtf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ({q_list}) GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM qtf GROUP BY 1),
    scored AS (
      SELECT qtf.doc_id,
             ((((n - df + 1) * 100) // df) * tf * {k1m + 1000})
             // (tf * 1000 + ({k1m} * (1000 - {bm} +
                  ({bm} * ((dl.dl * 1000 * n) // dl_sum)) // 1000)) // 1000)
               AS contrib
      FROM qtf JOIN dfreq USING (term) JOIN dl USING (doc_id), totals
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_i
      FROM scored GROUP BY 1
    )
    SELECT doc_id, score_i, brank FROM (
      SELECT doc_id, score_i,
             CAST(row_number() OVER (ORDER BY score_i DESC, doc_id ASC)
                  AS BIGINT) AS brank
      FROM per_doc
    ) WHERE brank <= {k}
    """


def rep_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, top_milli: int = 200, dup_milli: int = 300,
) -> DataFrame:
    """Intra-document repetition filter — the Gopher-rules repetition
    family (Rae et al. 2021, "Scaling Language Models", Table A1)
    re-expressed as exact integer fractions over word ``n``-gram
    OCCURRENCES:

    - ``dup_word_milli``: repeated-word fraction
      ``(n_words - n_distinct_words) / n_words`` (narrow:
      ``array_distinct``, no shuffle).
    - ``top_gram_milli``: char fraction of the most frequent n-gram's
      occurrences (ties broken toward more chars — ``max(struct(cnt,
      chars))`` is lexicographic in BOTH engines).
    - ``dup_gram_milli``: char fraction of all occurrences of n-grams
      appearing >= 2 times in the doc.

    Char fractions are over total n-gram-occurrence chars (not raw doc
    chars): overlapping occurrences make Gopher's span-union
    denominator non-relational, and the occurrence base preserves the
    signal ordering while staying exact-integer in both engines.
    Complements dup_spans (CROSS-doc boilerplate): a doc repeating its
    own sentence flags here and not there.

    Docs shorter than ``n`` words have no n-gram: gram metrics 0,
    never flagged by the gram gates.

    100 TB shape: one narrow word-stats pass, one bounded in-row gram
    explode, hash-aggs over the heavy streams — (doc, gram), then
    (doc, cnt) — and one doc_id equi-join back onto the narrow stats.
    The struct-max tie-break (struct agg buffers fall back to
    SortAggregate in Spark) runs only over the (doc, cnt)-compressed
    stream: at most one row per distinct occurrence count per doc. No
    windows, no Python, nothing quadratic in doc length."""
    words = docs.selectExpr(
        id_col, f"split({text_col}, ' ') as _w"
    ).selectExpr(
        id_col,
        "size(_w) as n_words",
        "size(array_distinct(_w)) as n_distinct",
        "_w",
    )
    grams = words.selectExpr(
        id_col,
        # sequence(1, 0) DESCENDS in Spark — short docs need an
        # explicit empty gram list, not a greatest() floor
        f"explode(transform(if(size(_w) >= {n},"
        f" sequence(1, size(_w) - {n - 1}), array()),"
        f" p -> array_join(slice(_w, p, {n}), ' '))) as g",
    )
    gd = grams.groupBy(id_col, "g").agg(
        F.count("*").alias("cnt")
    ).selectExpr(id_col, "cnt", "cast(length(g) as bigint) as glen")
    # two-level per-doc agg: the heavy gd stream sees only scalar
    # hash-aggs; the struct-max tie-break (struct agg buffers force
    # SortAggregate in Spark) is confined to the (doc, cnt)-compressed
    # stream — at most one row per distinct occurrence count per doc
    by_cnt = gd.groupBy(id_col, "cnt").agg(
        F.expr("sum(cnt * glen)").alias("tot_c"),
        F.expr("max(cnt * glen)").alias("bc"),
    )
    per_doc = by_cnt.groupBy(id_col).agg(
        F.expr("sum(tot_c)").alias("tot_chars"),
        F.expr("max(named_struct('cnt', cnt, 'chars', bc)).chars").alias(
            "top_chars"),
        F.expr("sum(if(cnt >= 2, tot_c, 0))").alias("dup_chars"),
    )
    return (
        words.drop("_w")
        .join(per_doc, id_col, "left")
        .selectExpr(
            id_col,
            "cast(n_words as bigint) as n_words",
            "cast(cast(n_words - n_distinct as bigint) * 1000 / n_words"
            " as bigint) as dup_word_milli",
            "cast(coalesce(top_chars * 1000 / tot_chars, 0) as bigint)"
            " as top_gram_milli",
            "cast(coalesce(dup_chars * 1000 / tot_chars, 0) as bigint)"
            " as dup_gram_milli",
            f"coalesce(top_chars * 1000 >= {top_milli} * tot_chars"
            f" OR dup_chars * 1000 >= {dup_milli} * tot_chars, false)"
            " as flagged",
        )
    )


def rep_filter_sql(
    source_sql: str = "documents", n: int = 3,
    top_milli: int = 200, dup_milli: int = 300,
) -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS _w FROM {source_sql}
    ),
    ws AS (
      SELECT doc_id, length(_w) AS n_words,
             length(list_distinct(_w)) AS n_distinct
      FROM words
    ),
    grams AS (
      SELECT doc_id,
             array_to_string(_w[p:p + {n - 1}], ' ') AS g
      FROM (
        SELECT doc_id, _w,
               unnest(generate_series(
                 1, greatest(length(_w) - {n - 1}, 0))) AS p
        FROM words
      )
    ),
    gd AS (
      SELECT doc_id, g, count(*) AS cnt, length(g) AS glen
      FROM grams GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id,
             sum(cnt * glen) AS tot_chars,
             (max(struct_pack(cnt := cnt, chars := cnt * glen))).chars
               AS top_chars,
             sum(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END)
               AS dup_chars
      FROM gd GROUP BY 1
    )
    SELECT ws.doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(floor((n_words - n_distinct) * 1000.0 / n_words)
                AS BIGINT) AS dup_word_milli,
           CAST(coalesce(floor(top_chars * 1000.0 / tot_chars), 0)
                AS BIGINT) AS top_gram_milli,
           CAST(coalesce(floor(dup_chars * 1000.0 / tot_chars), 0)
                AS BIGINT) AS dup_gram_milli,
           coalesce(top_chars * 1000 >= {top_milli} * tot_chars
                    OR dup_chars * 1000 >= {dup_milli} * tot_chars,
                    false) AS flagged
    FROM ws LEFT JOIN per_doc USING (doc_id)
    """


def unigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    low_milli: int = 4000, high_milli: int = 14000,
) -> DataFrame:
    """Corpus-adaptive unigram language-model quality scoring — the
    CCNet-style perplexity filter (Wenzek et al. 2020) relaxed to
    EXACT integer arithmetic: the "LM" is the corpus's own unigram
    distribution, and a word's surprisal is whole bits,
    ``bits(w) = floor(log2(n_total div c_w))`` computed as
    ``length(bin(n_total div c_w)) - 1`` — identical in Spark and
    DuckDB (the HLL rank trick), so no float ever enters the result.

    Per doc: total occurrences, summed bits, mean bits x1000 (exact
    integer division), and a flag for docs OUTSIDE
    [low_milli, high_milli] — low mean surprisal = high-probability
    boilerplate, high = rare-token soup / gibberish; both tails are
    what a perplexity gate drops.

    100 TB shape: per-(doc, word) counts first (map-side combine
    absorbs the Zipf head inside each doc), then ONE equi-join on the
    word against the vocabulary-sized frequency table — the hot-key
    skew of stopwords is AQE skew-join territory, and the 1-row
    corpus total rides a broadcast cross join (the bm25 totals
    pattern). Two hash-aggs + one join; no windows, no Python."""
    words = docs.selectExpr(
        id_col, f"explode(split({text_col}, ' ')) as w"
    )
    dw = words.groupBy(id_col, "w").agg(F.count("*").alias("cnt"))
    wf = dw.groupBy("w").agg(F.sum("cnt").alias("c"))
    tot = wf.agg(F.sum("c").alias("n_tot"))
    wfb = wf.crossJoin(F.broadcast(tot)).selectExpr(
        "w",
        "cast(length(bin(n_tot div c)) - 1 as bigint) as bits",
    )
    return (
        dw.join(wfb, "w")
        .groupBy(id_col)
        .agg(
            F.expr("sum(cnt)").alias("n_words"),
            F.expr("sum(cnt * bits)").alias("sum_bits"),
        )
        .selectExpr(
            id_col,
            "cast(n_words as bigint) as n_words",
            "cast(sum_bits as bigint) as sum_bits",
            "cast(sum_bits * 1000 / n_words as bigint) as mean_bits_milli",
            f"(sum_bits * 1000 < {low_milli} * n_words"
            f" OR sum_bits * 1000 > {high_milli} * n_words) as flagged",
        )
    )


def unigram_surprisal_sql(
    source_sql: str = "documents",
    low_milli: int = 4000, high_milli: int = 14000,
) -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM {source_sql}
    ),
    dw AS (SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY 1, 2),
    wf AS (SELECT w, sum(cnt) AS c FROM dw GROUP BY 1),
    tot AS (SELECT sum(c) AS n_tot FROM wf),
    wfb AS (
      SELECT w, CAST(length(bin(n_tot // c)) - 1 AS BIGINT) AS bits
      FROM wf, tot
    ),
    agg AS (
      SELECT doc_id, sum(cnt) AS n_words, sum(cnt * bits) AS sum_bits
      FROM dw JOIN wfb USING (w) GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(sum_bits AS BIGINT) AS sum_bits,
           CAST(floor(sum_bits * 1000.0 / n_words) AS BIGINT)
             AS mean_bits_milli,
           (sum_bits * 1000 < {low_milli} * n_words
            OR sum_bits * 1000 > {high_milli} * n_words) AS flagged
    FROM agg
    """


# PII categories in application order: earlier redactions cannot
# create later matches (all replacements are angle-bracket tokens with
# no digits). Patterns are the RE2 ∩ java.util.regex dialect subset —
# explicit [0-9] classes, ASCII \b boundaries, no backrefs — so Spark
# and DuckDB agree byte-for-byte.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("cc", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CC>"),
    ("phone", r"\b[0-9]{3}[- ][0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
)


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """PII redaction — the pre-training scrub stage: emails, SSNs,
    credit-card and phone shapes, IPv4 addresses replaced by typed
    tokens, with exact per-category match counts. Counts are taken on
    the PROGRESSIVELY redacted text (sequential semantics: a string
    claimed by an earlier category can't double-count in a later one
    — an SSN inside an email username is the email's).

    100 TB shape: pure narrow per-row regex chain, fully map-side,
    zero shuffles; the whole operator fuses into one WholeStageCodegen
    span over the scan."""
    out = docs.select(F.col(id_col), F.col(text_col).alias("_red"))
    counts = []
    for name, pat, tok in PII_PATTERNS:
        out = out.select(
            id_col,
            F.regexp_count(F.col("_red"), F.lit(pat)).alias(f"n_{name}"),
            F.regexp_replace(F.col("_red"), pat, tok).alias("_red"),
            *[F.col(c) for c in counts],
        )
        counts.append(f"n_{name}")
    return out.select(
        id_col,
        *[F.col(f"n_{n}").cast("bigint").alias(f"n_{n}")
          for n, _, _ in PII_PATTERNS],
        F.col("_red").alias("redacted"),
        (sum(F.col(f"n_{n}") for n, _, _ in PII_PATTERNS) > 0
         ).alias("has_pii"),
    )


def pii_scrub_sql(source_sql: str = "documents") -> str:
    # DuckDB literal strings don't process backslashes; RE2 needs the
    # global 'g' flag (replace-first is the default, unlike Spark).
    # Chained subqueries so each count sees the prior redaction.
    sql = f"SELECT doc_id, text AS _red FROM {source_sql}"
    for name, pat, tok in PII_PATTERNS:
        sql = f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(_red, '{pat}')) AS BIGINT)
             AS n_{name},
           regexp_replace(_red, '{pat}', '{tok}', 'g') AS _red,
           * EXCLUDE (doc_id, _red)
    FROM ({sql})"""
    names = ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS)
    total = " + ".join(f"n_{n}" for n, _, _ in PII_PATTERNS)
    return f"""
    SELECT doc_id, {names}, _red AS redacted, ({total}) > 0 AS has_pii
    FROM ({sql})
    """
