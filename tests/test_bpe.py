"""Distributed BPE vs a scalar Python reference implementation."""

from __future__ import annotations

from collections import Counter

from mandoline_hbase_spark.operators import bpe


def _py_bpe_fit(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[w] += 1
    toks = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in vocab.items():
            tw = toks[w]
            for i in range(len(tw) - 1):
                pairs[(tw[i], tw[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        for w in toks:
            tw, out, i = toks[w], [], 0
            while i < len(tw):
                if out and out[-1] == a and tw[i] == b:
                    out[-1] = a + b
                else:
                    out.append(tw[i])
                i += 1
            toks[w] = out
    return merges


def _py_encode_count(text, merges):
    n = 0
    for w in text.split():
        tw = list(w)
        for a, b in merges:
            out = []
            for t in tw:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            tw = out
        n += len(tw)
    return n


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide low",
    "",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )


def test_bpe_fit_matches_python_reference(spark):
    got = bpe.bpe_fit(_docs(spark), n_merges=8)
    want = _py_bpe_fit(TEXTS, 8)
    assert got == want


def test_bpe_token_counts_match_python(spark):
    merges = _py_bpe_fit(TEXTS, 6)
    out = {r.doc_id: r.n_bpe_tokens for r in
           bpe.bpe_token_counts(_docs(spark), merges).collect()}
    for i, t in enumerate(TEXTS):
        assert out[i] == _py_encode_count(t, merges), (i, t)


def test_bpe_overlapping_merge_is_left_greedy(spark):
    df = spark.createDataFrame([(1, "aaa aaaa")], "doc_id bigint, text string")
    out = bpe.bpe_token_counts(df, [("a", "a")]).collect()[0]
    # "aaa" -> [aa, a] (2), "aaaa" -> [aa, aa] (2)
    assert out.n_bpe_tokens == 4


def test_bpe_fit_stops_when_no_repeats(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id bigint, text string")
    assert bpe.bpe_fit(df, n_merges=5) == []


def test_verified_counts_vocab_grain_edges(spark):
    """r10: bpe_verified_counts encodes at vocabulary grain; the
    per-doc values (incl. empty / whitespace-only / NULL text and
    repeated words) must match a scalar reference of the pre-r10
    per-occurrence fold."""

    def enc(word, merges):
        toks = list(word)
        for a, b in merges:
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks = out
        return toks

    merges = [("a", "b"), ("ab", "c"), ("d", "d")]
    rows = [
        (1, "abc abc dd abc"),   # repeated words
        (2, "   "),              # whitespace-only -> (0, true, true)
        (3, ""),                 # empty -> (0, true, true)
        (4, None),               # NULL text -> (null, true, null)
        (5, "xyz ddabc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars"], r["roundtrip_ok"], r["token_count_bounded"])
        for r in bpe.bpe_verified_counts(df, merges).collect()
    }
    for doc_id, text in rows:
        if text is None:
            assert got[doc_id] == (None, True, None), got[doc_id]
            continue
        words = [w for w in text.split() if w]
        n_chars = sum(len(w) for w in words)
        n_tok = sum(len(enc(w, merges)) for w in words)
        rt = all("".join(enc(w, merges)) == w for w in words)
        bounded = (n_tok >= len(words)) and (n_tok <= n_chars)
        assert got[doc_id] == (n_chars, rt, bounded), (doc_id, got[doc_id])
