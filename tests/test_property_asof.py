"""Property tests: asof_join vs pandas merge_asof on random inputs, and the
winnowing substring-match guarantee."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

BASE = dt.datetime(2024, 1, 1)

# small random time series: (key, second-offset) pairs
_left = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 120)),
    min_size=1,
    max_size=8,
)
_right = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 120), st.floats(0, 100)),
    min_size=0,
    max_size=8,
)


@pytest.mark.usefixtures("spark")
class TestAsofProperty:
    @settings(max_examples=15, deadline=None)
    @given(left=_left, right=_right)
    def test_matches_pandas_merge_asof(self, spark, left, right):
        from mandoline_hbase_spark.operators.joins import asof_join

        lpdf = pd.DataFrame(
            {
                "key": [k for k, _ in left],
                "ts": [BASE + dt.timedelta(seconds=s) for _, s in left],
            }
        ).assign(row_id=range(len(left)))
        rpdf = pd.DataFrame(
            {
                "key": [k for k, _, _ in right],
                "ts": [BASE + dt.timedelta(seconds=s) for _, s, _ in right],
                "px": [v for _, _, v in right],
            }
        )
        # pandas merge_asof is the reference implementation; it requires
        # global sort and breaks ts ties arbitrarily, so dedup right keys
        rpdf = (
            rpdf.sort_values(["key", "ts"]).drop_duplicates(["key", "ts"], keep="last")
        )
        if len(rpdf) == 0:
            expected = pd.Series(
                [float("nan")] * len(lpdf), index=lpdf["row_id"], name="px"
            )
        else:
            expected = pd.merge_asof(
                lpdf.sort_values("ts"),
                rpdf.sort_values("ts"),
                on="ts",
                by="key",
                direction="backward",
            ).set_index("row_id")["px"]

        ldf = spark.createDataFrame(lpdf, "key string, ts timestamp, row_id long")
        rdf = spark.createDataFrame(rpdf, "key string, ts timestamp, px double")
        got = {
            r.row_id: r.px
            for r in asof_join(ldf, rdf, on="ts", by="key", right_cols=["px"]).collect()
        }
        for row_id, exp in expected.items():
            g = got[row_id]
            if pd.isna(exp):
                assert g is None
            else:
                assert g == exp


def test_winnowing_guarantee(spark):
    """Any shared substring of length >= k + window - 1 must yield at least
    one shared fingerprint (the winnowing theorem), and disjoint texts
    share nothing."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.operators.text import (
        winnowing_similarity,
        with_winnowing_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"  # len 43 >= 8+4-1
    docs = spark.createDataFrame(
        [
            (1, f"AAAA {shared} BBBB"),
            (2, f"XXXXXXX {shared} YYYYYYY"),
            (3, "completely different content with zero overlap whatsoever!"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    sims = {
        (r.id_a, r.id_b): r.fp_jaccard
        for r in winnowing_similarity(docs, pairs).collect()
    }
    assert sims[(1, 2)] > 0.0  # shared substring -> shared fingerprints
    assert sims[(1, 3)] == 0.0
    sizes = {
        r.doc_id: r.n
        for r in with_winnowing_fingerprints(docs)
        .select("doc_id", F.size("winnow_fps").alias("n"))
        .collect()
    }
    assert all(n > 0 for n in sizes.values())
