"""Property tests: int8 quantization and L2 normalization invariants on
random vectors."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

_vec = st.lists(
    st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False, width=32),
    min_size=1,
    max_size=16,
)


class TestQuantizeProperty:
    @settings(max_examples=10, deadline=None)
    @given(vecs=st.lists(_vec, min_size=1, max_size=4))
    def test_dequantize_error_bounded_and_codes_in_range(self, spark, vecs):
        from mandoline_hbase_spark.operators.similarity import quantize_int8

        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        out = {r.vec_id: r for r in quantize_int8(df).collect()}
        for i, v in enumerate(vecs):
            r = out[i]
            v64 = [float(f32) for f32 in _to_f32(v)]
            absmax = max(abs(x) for x in v64)
            if absmax == 0.0:
                assert r.q_scale == 0.0 and all(q == 0 for q in r.q_vec)
                continue
            # codes stay in int8 range; dequantized error <= half a step
            assert all(-127 <= q <= 127 for q in r.q_vec)
            scale = absmax / 127.0
            for q, x in zip(r.q_vec, v64):
                assert abs(q * scale - x) <= scale / 2 + 1e-9 * absmax

    @settings(max_examples=10, deadline=None)
    @given(vecs=st.lists(_vec, min_size=1, max_size=4))
    def test_l2_normalize_unit_norm(self, spark, vecs):
        from mandoline_hbase_spark.operators.similarity import l2_normalize

        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        out = {r.vec_id: r for r in l2_normalize(df).collect()}
        for i, v in enumerate(vecs):
            r = out[i]
            if r.l2_norm == 0.0:
                assert all(u == 0.0 for u in r.unit_vec)
            else:
                norm = math.sqrt(sum(u * u for u in r.unit_vec))
                assert abs(norm - 1.0) < 1e-9


def _to_f32(v):
    import numpy as np

    return np.asarray(v, dtype=np.float32)
