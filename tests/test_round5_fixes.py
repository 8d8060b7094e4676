"""Round-5 verdict items: capped band-LSH (simhash/phash hot-bucket
valve), 64-bit simhash, group_percentiles domain bound."""

import numpy as np
import pytest


def test_phash_cap_preserves_clusters_on_hot_bucket(spark):
    """Degenerate hot-bucket fixture: 40 images whose phash is
    IDENTICAL (one band bucket holds all 40 — the flat/dark-image
    case the cap exists for), plus a disjoint pair. With max_bucket
    far below the bucket size, the pair LIST truncates (linear, not
    quadratic) but connected CLUSTERS are identical to the uncapped
    enumeration."""
    from geotrellis_spark.operators import dedup

    rows = [(i, 0x1234_5678_9ABC_0000 + 0) for i in range(40)]
    rows += [(100, 0x7FFF_0000_1111_2222), (101, 0x7FFF_0000_1111_2223)]
    imgs = spark.createDataFrame(rows, "image_id long, phash long")

    full = dedup.phash_neardup(imgs, max_hamming=6)
    capped = dedup.phash_neardup(imgs, max_hamming=6, max_bucket=4)

    n_full = full.count()
    n_capped = capped.count()
    assert n_full == 40 * 39 // 2 + 1          # clique + the pair
    assert n_capped < n_full                   # truncated...
    assert n_capped == 4 * 3 // 2 + (40 - 4) + 1  # kept-clique + tails

    cf = {(r["doc_id"], r["cluster"]) for r in dedup.dedup_clusters(
        full.selectExpr("img_a as doc_a", "img_b as doc_b")).collect()}
    cc = {(r["doc_id"], r["cluster"]) for r in dedup.dedup_clusters(
        capped.selectExpr("img_a as doc_a", "img_b as doc_b")).collect()}
    assert cf == cc                            # ...but clusters equal


def test_simhash_cap_preserves_clusters_on_boilerplate(spark):
    """Text twin: 30 identical boilerplate docs (identical 64-bit
    fingerprint -> one hot bucket) — capped pair set preserves the
    single cluster."""
    from geotrellis_spark.operators import dedup

    docs = spark.range(30).selectExpr(
        "id as doc_id",
        "'the same exact boilerplate sentence repeated verbatim' as text",
    )
    full = dedup.simhash_neardup(docs)
    capped = dedup.simhash_neardup(docs, max_bucket=3)
    assert full.count() == 30 * 29 // 2
    assert capped.count() == 3 * 2 // 2 + 27
    cf = {(r["doc_id"], r["cluster"])
          for r in dedup.dedup_clusters(full).collect()}
    cc = {(r["doc_id"], r["cluster"])
          for r in dedup.dedup_clusters(capped).collect()}
    assert cf == cc


def test_simhash_64bit_band_domain(spark):
    """The widened fingerprint actually uses high bits: random-ish
    docs produce fingerprints outside int16 range, and band values
    spread over the 16-bit domain (the r4 16-bit fingerprint had 16
    values per band)."""
    from geotrellis_spark.operators import dedup

    docs = spark.range(50).selectExpr(
        "id as doc_id",
        "concat('alpha', id, ' beta', id * 7, ' gamma', id * 13, "
        "' delta', id * 29) as text",
    )
    fps = [r["simhash"] for r in dedup.simhash(docs).collect()]
    assert any(abs(v) > (1 << 32) for v in fps)
    assert len(set(fps)) == 50
    # negative fingerprints (bit 63 set) must appear and band-extract
    # cleanly via shiftright + mask
    assert any(v < 0 for v in fps)


def test_crossmodal_capped_default_equals_uncapped_at_small_scale(spark):
    """crossmodal_dedup now defaults max_bucket=256: at a scale where
    no bucket overflows the result is bit-identical to the exact
    enumeration (the oracle path)."""
    from geotrellis_spark.operators import dedup

    imgs = spark.range(60).selectExpr(
        "concat('img', id) as image_id",
        "concat('caption text number ', cast(id as string), "
        "' with some shared words') as caption",
        "cast(id * 1099511627776 as long) as phash",
    )
    capped = {(r["doc_id"], r["cluster"])
              for r in dedup.crossmodal_dedup(imgs).collect()}
    uncapped = {(r["doc_id"], r["cluster"])
                for r in dedup.crossmodal_dedup(
                    imgs, max_bucket=None).collect()}
    assert capped == uncapped


def test_group_percentiles_grid_bounds_domain(spark):
    """High-cardinality continuous fixture: 20k distinct doubles in
    one group. grid_cents bounds the window's distinct-value domain
    (here to <= 101 buckets) and the gridded percentile is within one
    grid step of the exact one; ungridded stays exact
    percentile_disc."""
    from pyspark.sql import functions as F

    from geotrellis_spark.operators import olap

    n = 20_000
    ev = spark.range(n).selectExpr(
        "'t' as event_type",
        # non-uniform continuous-ish values in [0, 1000)
        "cast(pmod(id * 7919, 99991) as double) / 100.0 as value",
    )
    exact = olap.group_percentiles(ev).collect()[0]
    gridded = olap.group_percentiles(ev, grid_cents=1000).collect()[0]
    # bucket count under the grid obeys the documented bound
    n_buckets = (
        ev.selectExpr(
            f"(({olap.CENTS}) div 1000) * 1000 as c"
        ).distinct().count()
    )
    assert n_buckets <= 101
    for p in (50, 95, 99):
        e, g = exact[f"p{p}_cents"], gridded[f"p{p}_cents"]
        assert g % 1000 == 0
        assert g <= e < g + 1000  # floor-onto-grid: within one step
    # spark == duckdb for the GRIDDED variant too
    import duckdb

    pdf = ev.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(
        olap.group_percentiles_sql(grid_cents=1000)
    ).fetchone()
    got = olap.group_percentiles(ev, grid_cents=1000).collect()[0]
    assert (got["n"], got["p50_cents"], got["p95_cents"],
            got["p99_cents"]) == (want[1], want[2], want[3], want[4])


def test_cap_cluster_invariance_random_corpora(spark):
    """Property over random duplicate-heavy corpora: for every cap
    level, minhash_candidates' capped pair set yields EXACTLY the
    connected components of the uncapped enumeration (caps truncate
    pairs, never components). Random texts with planted duplicate
    groups of varying size, several caps."""
    import random

    from geotrellis_spark.operators import dedup

    rng = random.Random(17)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    rows = []
    doc_id = 0
    for g in range(12):
        base = " ".join(rng.choices(words, k=rng.randint(8, 20)))
        for _ in range(rng.randint(1, 9)):  # duplicate group size
            rows.append((doc_id, base))
            doc_id += 1
    rng.shuffle(rows)
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = dedup.minhash_candidates(docs)
    want = {(r["doc_id"], r["cluster"])
            for r in dedup.dedup_clusters(full).collect()}
    for cap in (1, 2, 5):
        capped = dedup.minhash_candidates(docs, max_bucket=cap)
        got = {(r["doc_id"], r["cluster"])
               for r in dedup.dedup_clusters(capped).collect()}
        assert got == want, cap
        assert capped.count() <= full.count()


def test_jpeg_decode_rejects_malformed():
    """Negative decode paths: 16-bit quant tables, progressive SOF,
    multi-scan color, and truncated streams fail loudly instead of
    returning garbage."""
    import struct

    import numpy as np
    import pytest

    from geotrellis_spark.core import jpeg as J

    img = np.full((16, 16), 128, np.uint8)
    data = bytearray(J.jpeg_encode_gray(img))

    # 16-bit DQT (Pq=1)
    bad = bytearray(data)
    pos = 2
    while bad[pos + 1] != 0xDB:
        (ln,) = struct.unpack_from(">H", bad, pos + 2)
        pos += 2 + ln
    bad[pos + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit"):
        J.jpeg_decode(bytes(bad))

    # progressive SOF2
    bad = bytearray(data)
    pos = 2
    while bad[pos + 1] != 0xC0:
        (ln,) = struct.unpack_from(">H", bad, pos + 2)
        pos += 2 + ln
    bad[pos + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF0"):
        J.jpeg_decode(bytes(bad))

    # truncated before SOS
    with pytest.raises(ValueError):
        J.jpeg_decode(bytes(data[:20]))

    # multi-scan color: SOS listing fewer components than SOF0
    px = np.zeros((16, 16, 3), np.uint8)
    cdata = bytearray(J.jpeg_encode_rgb(px))
    pos = 2
    while cdata[pos + 1] != 0xDA:
        (ln,) = struct.unpack_from(">H", cdata, pos + 2)
        pos += 2 + ln
    # rewrite SOS header to a single-component scan (ns=1)
    (ln,) = struct.unpack_from(">H", cdata, pos + 2)
    new_sos = struct.pack(">HH", 0xFFDA, 8) + bytes([1, 1, 0x00, 0, 0x3F, 0])
    cdata[pos : pos + 2 + ln] = new_sos
    with pytest.raises(ValueError, match="multi-scan"):
        J.jpeg_decode(bytes(cdata))


def test_contamination_broadcast_plan_and_semantics(spark):
    """Decontamination: the benchmark side broadcasts (BHJ in the
    physical plan — the corpus never shuffles before the join), exact
    duplicates of a bench doc are flagged with the full shingle
    count, and unrelated docs are not flagged."""
    import contextlib
    import io

    from geotrellis_spark.operators import dedup

    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated words about weather and xylophones"),
        ],
        "doc_id long, text string",
    )
    out = dedup.contamination(docs, bench, min_shared=3)
    rows = {(r["doc_id"], r["bench_id"]): r["n_shared"]
            for r in out.collect()}
    assert set(rows) == {(1, 1000)}
    # doc 1 is an exact copy: every distinct shingle is shared
    n_sh = dedup.shingle_hashes(bench).distinct().count()
    assert rows[(1, 1000)] == n_sh

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    physical = buf.getvalue().split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in physical, physical


def test_curate_decontamination_stage(spark):
    """curate(bench=...) drops quality-passing docs that leak a
    benchmark doc's content, BEFORE dedup — so a contaminated doc can
    never survive as a cluster representative. Clean docs curate as
    without the stage."""
    from pyspark.sql import functions as F

    from geotrellis_spark.operators.curation import curate
    from geotrellis_spark.operators.text import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # bench = copies of QUALITY docs: only quality docs can be flagged,
    # and at the selective threshold only their near-copies are
    qdocs = docs.join(
        quality_score(docs).where("is_quality").select("doc_id"), "doc_id"
    )
    bench_src = {r["doc_id"] for r in qdocs.select("doc_id").collect()
                 if r["doc_id"] % 3 == 0}
    bench = qdocs.where(F.col("doc_id").isin(list(bench_src))).selectExpr(
        "doc_id + 1000000 as doc_id", "text"
    )
    # threshold 75: the synthetic sf0.001 texts are SHORT (~90
    # distinct shingles) and share 20-70 shingles incidentally — 75
    # flags near-copies only (the sf0.01 oracle query keeps the
    # looser default; thresholds are corpus-dependent by design)
    with_b, stats_b = curate(
        spark, docs, per_stratum=20, bench=bench, min_shared=75
    )
    plain, stats_p = curate(spark, docs, per_stratum=20)
    kept_b = {r["doc_id"] for r in with_b.select("doc_id").collect()}
    kept_p = {r["doc_id"] for r in plain.select("doc_id").collect()}
    # the benchmark set copies every 50th doc's text: those docs (and
    # their exact/near duplicates) must be gone from the curated set
    assert 0 < stats_b["decontaminate.kept"] < stats_b["quality.kept"]
    leaked = kept_b & bench_src
    assert not leaked
    # every FLAGGED doc is absent (dropping a cluster's min doc can
    # legitimately promote a different survivor, so the kept set is
    # NOT a subset of the undecontaminated run — only flagged docs
    # are guaranteed gone)
    from geotrellis_spark.operators import dedup

    flagged = {
        r["doc_id"]
        for r in dedup.contamination(qdocs, bench, min_shared=75)
        .select("doc_id").distinct().collect()
    }
    assert flagged and not (kept_b & flagged)
    assert kept_p  # sanity: the undecontaminated run keeps docs


def test_dup_spans_detects_cross_doc_boilerplate(spark):
    """Hand-built corpus: docs 1/2 share a verbatim 10-word legal
    footer (cross-doc boilerplate), doc 3 is unique, doc 4 repeats
    ITS OWN sentence (intra-doc repetition is NOT cross-doc dup),
    doc 5 is a verbatim copy of doc 3's text. Expected fractions are
    computed by hand from the w=8 span positions."""
    from geotrellis_spark.operators import dedup

    footer = "all rights reserved subject to the terms of this agreement"
    u3 = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, "alpha beta gamma delta " + footer),
        (2, "epsilon zeta eta theta iota " + footer),
        (3, u3),
        (4, ("one two three four five six seven eight "
             "one two three four five six seven eight")),
        (5, u3),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.dup_spans(docs, w=8, flag_milli=500).collect()}

    # doc1: 14 words -> 7 spans; spans fully inside the 10-word
    # footer start at word pos 5..7 of the footer region = positions
    # where all 8 words are footer words: footer occupies words 5-14,
    # spans at pos 5,6,7 -> 3 dup spans (same spans appear in doc2).
    assert out[1]["n_spans"] == 7 and out[1]["n_dup_spans"] == 3
    # doc2: 15 words -> 8 spans; footer at words 6-15 -> pos 6,7,8.
    assert out[2]["n_spans"] == 8 and out[2]["n_dup_spans"] == 3
    # docs 3 and 5 are verbatim copies: every span duplicated.
    for d in (3, 5):
        assert out[d]["n_spans"] == out[d]["n_dup_spans"] == 6
        assert out[d]["dup_milli"] == 1000 and out[d]["flagged"]
    # doc4: self-repetition only -> every span occurs in ONE doc.
    assert out[4]["n_spans"] == 9 and out[4]["n_dup_spans"] == 0
    assert not out[4]["flagged"]
    # short-doc path: a doc under w words is one whole-text span
    tiny = spark.createDataFrame(
        [(10, "too short"), (11, "too short")], "doc_id long, text string")
    t = {r["doc_id"]: r for r in dedup.dup_spans(tiny, w=8).collect()}
    assert t[10]["n_spans"] == 1 and t[10]["n_dup_spans"] == 1


def test_rep_filter_gopher_repetition_signals(spark):
    """Hand-built corpus for the intra-doc repetition family: doc 1
    repeats one 4-word sentence 3x (self-repetition -> dup-3-gram
    fraction 1000, flagged), doc 2 is non-repetitive (not flagged),
    doc 3 is shorter than n words (gram metrics 0, never flagged)."""
    from geotrellis_spark.operators import text

    rows = [
        (1, "one two three four one two three four one two three four"),
        (2, "the quick brown fox jumps over the lazy dog today ok fine"),
        (3, "a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.rep_filter(docs).collect()}

    # doc1: 12 words, 4 distinct -> dup_word = 8000/12 = 666.
    # 10 3-gram occurrences; every gram string occurs >= 2 times
    # (the period-4 cycle makes each of the 4 distinct grams recur)
    # -> dup_gram_milli == 1000; the top gram "one two three" occurs
    # 3x of 10 occurrences, chars 3*13=39 of total 124 -> 314?
    # total chars: grams are len 13,12,14,13 repeating; computed 315.
    assert out[1]["dup_word_milli"] == 666
    assert out[1]["dup_gram_milli"] == 1000
    assert out[1]["top_gram_milli"] == 315
    assert out[1]["flagged"]
    # doc2: 12 words, 11 distinct ("the" twice) -> 83; no repeated
    # 3-gram -> dup 0; top gram = any cnt-1 gram, ~1/10 of chars.
    assert out[2]["dup_word_milli"] == 83
    assert out[2]["dup_gram_milli"] == 0
    assert not out[2]["flagged"]
    # doc3: < n words -> gram metrics zero, unflagged.
    assert out[3]["n_words"] == 2
    assert out[3]["top_gram_milli"] == 0
    assert out[3]["dup_gram_milli"] == 0
    assert not out[3]["flagged"]


def test_unigram_surprisal_exact_bits(spark):
    """Hand-computable corpus: word counts a=4, b=2, c=1, d=1 over
    n_tot=8 occurrences -> bits = floor(log2(8 div c_w)): a->1, b->2,
    c,d->3. Whole-bit surprisal, no float anywhere."""
    from geotrellis_spark.operators import text

    rows = [(1, "a a b c"), (2, "a a b d")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.unigram_surprisal(docs, low_milli=0,
                                  high_milli=10**6).collect()}
    # doc1: a(1)+a(1)+b(2)+c(3) = 7 bits over 4 words -> 1750 milli
    assert out[1]["n_words"] == 4 and out[1]["sum_bits"] == 7
    assert out[1]["mean_bits_milli"] == 1750
    # doc2 identical by symmetry (d also count 1)
    assert out[2]["sum_bits"] == 7 and not out[2]["flagged"]
    # tails flag: low boilerplate and high rare-token docs
    out2 = {r["doc_id"]: r for r in
            text.unigram_surprisal(docs, low_milli=1800,
                                   high_milli=2000).collect()}
    assert out2[1]["flagged"] and out2[2]["flagged"]


def test_pii_scrub_sequential_claims(spark):
    """Sequential-claim semantics: an SSN-shaped string inside an
    email username is the email's (earlier category), counts are on
    progressively redacted text, and clean docs pass untouched."""
    from geotrellis_spark.operators import text

    rows = [
        (1, "edge user123-45-6789@x.com then 999-88-7777"),
        (2, "card 4111 1111-1111 1111 phone 212-555-0199 ip 10.0.0.255"),
        (3, "nothing sensitive"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.pii_scrub(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ssn"] == 1
    assert out[1]["redacted"] == "edge <EMAIL> then <SSN>"
    assert out[2]["n_cc"] == 1 and out[2]["n_phone"] == 1
    assert out[2]["n_ip"] == 1
    assert out[2]["redacted"] == "card <CC> phone <PHONE> ip <IP>"
    assert not out[3]["has_pii"]
    assert out[3]["redacted"] == "nothing sensitive"
