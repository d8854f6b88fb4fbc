"""Public column-function surface.

Reusable Column-level building blocks re-exported from the operator
modules — everything here is a pure JVM-side expression (whole-stage
codegen, no Python in the hot path), usable directly in ``select`` /
``withColumn`` pipelines without pulling in the full operator API.
"""

from mandoline_hbase_spark.codec import coordinate_to_id
from mandoline_hbase_spark.operators.similarity import cosine_sim
from mandoline_hbase_spark.operators.text import (
    BPE_ISH_PATTERN,
    CJK_PATTERN,
    LANG_PATTERNS,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    n_tokens,
)

__all__ = [
    "BPE_ISH_PATTERN",
    "CJK_PATTERN",
    "LANG_PATTERNS",
    "PII_EMAIL",
    "PII_IPV4",
    "PII_PHONE",
    "coordinate_to_id",
    "cosine_sim",
    "n_tokens",
]
