"""4-stage training-data curation core (shared by the batch
``jobs/curate.py`` entrypoint and the streaming ``foreachBatch``
wrapper in ``streaming/curate_stream.py``).

documents -> quality gate -> exact dedup -> near-dup cluster collapse
-> stratified sample, with per-stage metrics. Stage order matters and
IS the product: the cheap codegen filter runs first and cuts
everything after; every global stage is deterministic and
repartition-invariant, so the same input multiset always yields the
same curated output — which is what lets the streaming snapshot be
compared 1:1 against the batch job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..checkpoint import write_metric
from . import dedup, sampling, text


def curate(spark, docs, per_stratum: int, salt: int = 42,
           metrics=None, signatures=None, pairs=None,
           bench=None, min_shared: int = 25,
           contaminated=None) -> "tuple":
    """Run the 4-stage curation over a documents DataFrame. Returns
    (curated_df, stats dict). ``metrics``: optional (base, job_id)
    tuple to persist per-stage counts. ``signatures``: optional
    precomputed minhash signature rows (doc_id, mh0..mh7) — the
    streaming path stores these per arriving doc so recuration skips
    re-shingling the corpus text; the pair/cluster result is identical
    because signatures are a pure function of each doc's text.
    ``pairs``: optional precomputed candidate-pair rows (doc_a, doc_b)
    over ANY superset of the corpus (the incrementally-maintained pair
    store): they are filtered to pairs whose BOTH endpoints survive
    the exact-dedup stage — bucket membership is per-doc deterministic,
    so the filtered set has exactly the batch enumeration's connected
    components (caps only ever truncate pairs, never components), and
    the curated output is identical.

    ``bench``: optional benchmark/eval documents DataFrame — adds a
    DECONTAMINATION stage after the quality gate: docs sharing >=
    ``min_shared`` distinct shingles with any benchmark doc are
    dropped as train/eval leakage (``dedup.contamination`` — the
    benchmark shingle set broadcasts, the corpus never shuffles).
    ``contaminated``: optional PRECOMPUTED flagged doc_ids (the
    streaming path's contamination store — flags are a pure per-doc
    function of (text, static bench), so the stream computes them
    once per arriving doc and recuration skips re-shingling the
    corpus); when given, ``bench`` is not re-evaluated."""
    stats = {"input": docs.count()}

    def metric(stage, name, value):
        stats[f"{stage}.{name}"] = value
        if metrics:
            write_metric(spark, metrics[0], metrics[1], stage, name, value)

    # 1. quality gate (pure codegen filter)
    q = text.quality_score(docs).where("is_quality").select("doc_id")
    gated = docs.join(q, "doc_id")
    gated = gated.localCheckpoint()  # reused by three stages below
    metric("quality", "kept", gated.count())

    # 1.5 (optional): train/eval decontamination — leakage drops here,
    # BEFORE dedup, so a contaminated doc can't become the kept
    # representative of an otherwise-clean duplicate cluster
    if bench is not None or contaminated is not None:
        if contaminated is not None:
            flagged = contaminated.select("doc_id").distinct()
        else:
            flagged = dedup.contamination(
                gated, bench, min_shared=min_shared
            ).select("doc_id").distinct()
        gated = gated.join(flagged, "doc_id", "left_anti").localCheckpoint()
        metric("decontaminate", "kept", gated.count())

    # 2. exact dedup: keep each md5 group's min doc id
    keep_exact = (
        dedup.exact_dedup(gated).select(F.col("min_doc").alias("doc_id"))
    )
    exact = gated.join(keep_exact, "doc_id").localCheckpoint()
    metric("exact_dedup", "kept", exact.count())

    # 3. near-dup collapse: production (capped) candidate pairs ->
    # connected components -> drop everything but cluster minima
    if pairs is not None:
        ids = exact.select("doc_id")
        pairs = pairs.join(
            ids.withColumnRenamed("doc_id", "doc_a"), "doc_a"
        ).join(ids.withColumnRenamed("doc_id", "doc_b"), "doc_b")
    else:
        pairs = dedup.minhash_dedup(exact, signatures=signatures)
    clusters = dedup.dedup_clusters(pairs)
    drop = clusters.where("doc_id <> cluster").select("doc_id")
    neardup = exact.join(drop, "doc_id", "left_anti").localCheckpoint()
    metric("neardup", "kept", neardup.count())

    # 4. deterministic stratified sample per (lang, source)
    curated = sampling.stratified_sample(
        neardup, ("lang", "source"), per_stratum, "doc_id", salt=salt
    )
    metric("sample", "kept", curated.count())
    return curated, stats
