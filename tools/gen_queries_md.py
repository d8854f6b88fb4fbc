"""Regenerate QUERIES.md from the live catalog.

Usage: python tools/gen_queries_md.py   (writes /root/repo/QUERIES.md)

One row per registered query in registration order, description
truncated to 220 characters (the hand-written format this replaces).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# Query catalog reference

All {n} queries the engine registers ({oracle_note}), generated from `mandoline_hbase_spark/queries/catalog.py::QUERIES`. Each entry is a `(spark_fn, oracle_sql)` pair exposed through `__spark_entry__.py`; run one with:

```python
from mandoline_hbase_spark.queries.catalog import QUERIES
QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.01").show()
```

| query | module | description | tags |
|---|---|---|---|
"""


def one_line(s: str, limit: int = 220) -> str:
    flat = " ".join((s or "").split()).replace("|", r"\|")
    return flat if len(flat) <= limit else flat[:limit] + "..."


def main() -> None:
    from mandoline_hbase_spark.queries.catalog import QUERIES

    n = len(QUERIES)
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)
    oracle_note = (
        f"all {n_oracle} DuckDB-oracle-checked"
        if n_oracle == n
        else f"{n_oracle} DuckDB-oracle-checked"
    )
    rows = []
    for name, q in QUERIES.items():
        module = q.fn.__module__.rsplit(".", 1)[-1]
        rows.append(
            f"| `{name}` | {module} | {one_line(q.description)} | {', '.join(q.tags)} |"
        )
    out = HEADER.format(n=n, oracle_note=oracle_note) + "\n".join(rows) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {n} queries ({n_oracle} oracle-backed)")


if __name__ == "__main__":
    main()
