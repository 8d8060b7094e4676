"""BPE tokenization: the distributed trainer/encoder must reproduce a
from-scratch pure-Python reference implementation of the published
algorithm (Sennrich et al. 2016) — merge-for-merge and token-for-token
— and the pair-stats oracle query must match its DuckDB twin (the
driver gate re-proves that at sf0.01)."""

from __future__ import annotations

import collections

import pandas as pd

from geotrellis_spark.operators import tokenize
from geotrellis_spark.operators.tokenize import EOW


# ---------------------------------------- pure-Python reference BPE

def _ref_word_syms(word):
    return [
        c + EOW if i == len(word) - 1 else c
        for i, c in enumerate(word)
    ]


def _ref_pair_counts(vocab):
    counts = collections.Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            counts[(syms[i], syms[i + 1])] += freq
    return counts


def _ref_apply(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_train(texts, n_merges, min_freq=2):
    wf = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    vocab = [(_ref_word_syms(w), f) for w, f in wf.items()]
    merges = []
    for r in range(1, n_merges + 1):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        # deterministic tie-break: count desc, then (a, b) asc
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_freq:
            break
        merges.append((r, a, b))
        vocab = [(_ref_apply(s, a, b), f) for s, f in vocab]
    return merges


def test_bpe_train_matches_reference(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _ref_train(texts, 25)
    got, vocab = tokenize.bpe_train(docs, n_merges=25)
    assert got == want and len(got) == 25
    # the trained vocabulary's symbol multiset must equal the
    # reference's after the same merges
    wf = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    ref_vocab = {w: _ref_word_syms(w) for w in wf}
    for _, a, b in want:
        ref_vocab = {w: _ref_apply(s, a, b) for w, s in ref_vocab.items()}
    got_vocab = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got_vocab == ref_vocab


def test_bpe_encode_matches_reference(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    merges = _ref_train(list(texts.values()), 30)
    ranks = {(a, b): r for r, a, b in merges}
    out = {
        r["doc_id"]: r
        for r in tokenize.bpe_encode(docs, merges).collect()
    }
    assert set(out) == set(texts)
    for did, text in texts.items():
        words = [w for w in text.split(" ") if w]
        n_tok = sum(
            len(tokenize._encode_word(w, ranks)) for w in words
        )
        assert out[did]["n_words"] == len(words)
        assert out[did]["n_tokens"] == n_tok
        assert out[did]["n_chars"] == sum(len(w) for w in words)
        # merges compress: tokens <= chars, >= words
        assert len(words) <= n_tok <= sum(len(w) for w in words)


def test_bpe_encode_greedy_rank_order():
    """_encode_word applies the LOWEST-rank present pair first — the
    reference encoder's priority rule — and greedy-left on rank
    ties within a word."""
    ranks = {("a", "b"): 1, ("ab", "c" + EOW): 2, ("b", "c" + EOW): 3}
    assert tokenize._encode_word("abc", ranks) == ["abc" + EOW]
    # without the (ab, c) rule the b-c merge applies after a-b fails
    ranks2 = {("b", "c" + EOW): 1}
    assert tokenize._encode_word("abc", ranks2) == ["a", "bc" + EOW]


def test_bpe_merge_overlap_left_first(spark):
    """'aaa' under merge (a,a): greedy left-to-right gives [aa, a] —
    the fold must not re-merge across an already-merged tail."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["aaaa aaaa aaaa"]})
    )
    merges, vocab = tokenize.bpe_train(docs, n_merges=1, min_freq=1)
    [(_, a, b)] = merges
    # first merge must be (a, a) — the only repeated pair
    assert (a, b) == ("a", "a")
    syms = vocab.collect()[0]["syms"]
    assert list(syms) == ["aa", "a", "a" + EOW]


def test_rp_project_preserves_relative_structure(spark):
    """rp_project: deterministic, exchange-free, and projections of
    IDENTICAL vectors are identical while projections of orthogonal
    vectors differ (JL sanity, not a distance-bound proof)."""
    from geotrellis_spark.operators import similarity

    v1 = [1.0] + [0.0] * 63
    v2 = [0.0] * 32 + [1.0] + [0.0] * 31
    emb = spark.createDataFrame(
        [(1, v1), (2, v1), (3, v2)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.rp_project(emb, out_dim=6).toPandas()
    assert len(out) == 18
    p = {
        i: out[out.vec_id == i].sort_values("j")["v_milli"].tolist()
        for i in (1, 2, 3)
    }
    assert p[1] == p[2]
    assert p[1] != p[3]
    # plan: narrow map only — no Exchange
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        similarity.rp_project(emb, out_dim=6).explain("formatted")
    assert "Exchange" not in buf.getvalue()
