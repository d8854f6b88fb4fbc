"""Property test: remove_duplicated_spans vs a brute-force Python model
on tiny random corpora (small alphabet forces cross-doc collisions)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

N = 3  # window length under test

_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8),
    min_size=1,
    max_size=5,
)


def _model(docs: list[list[str]], n: int) -> list[tuple[int, int, str]]:
    """Brute-force reference: windows duplicated across >=2 docs, covered
    tokens dropped, survivors joined in order."""
    from collections import defaultdict

    where = defaultdict(set)
    for d, toks in enumerate(docs):
        for i in range(len(toks) - n + 1):
            where[tuple(toks[i : i + n])].add(d)
    dup = {g for g, ds in where.items() if len(ds) >= 2}
    out = []
    for d, toks in enumerate(docs):
        covered = set()
        for i in range(len(toks) - n + 1):
            if tuple(toks[i : i + n]) in dup:
                covered.update(range(i, i + n))
        kept = [t for k, t in enumerate(toks) if k not in covered]
        out.append((d, len(kept), " ".join(kept)))
    return out


@pytest.mark.usefixtures("spark")
class TestSpanRemovalProperty:
    @settings(max_examples=12, deadline=None)
    @given(corpus=_corpus)
    def test_matches_bruteforce(self, spark, corpus):
        from mandoline_hbase_spark.operators import dedup

        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
            "doc_id bigint, text string",
        )
        got = sorted(
            (r.doc_id, r.n_kept_tokens, r.cleaned_text)
            for r in dedup.remove_duplicated_spans(df, n=N).collect()
        )
        assert got == sorted(_model(corpus, N))
