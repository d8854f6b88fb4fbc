"""Driver-faithful correctness sweep: every oracle-backed catalog query
on Spark vs its DuckDB oracle over the same parquet.

Usage (ALWAYS from a neutral cwd — /tmp — so operator closures that
would only resolve from the repo cwd are caught, see the verify skill):

    cd /tmp && python /root/repo/tools/sweep.py [sf_dir] [name ...]

Defaults to /root/testdata/sf0.01 and the full catalog; pass query
names to sweep a subset. Prints one MATCH/MISMATCH/ERR line per query
and exits non-zero if anything is not MATCH.

``--driver-prefix N`` is the rotation DRY-RUN (VERDICT r7 #8): print
exactly the first N names the driver will hash-verify next round (the
head of ``__spark_entry__.queries()``, i.e. ``driver_queries()`` order
computed from the committed CORRECTNESS files), one per line, and exit
— no Spark session. Pre-green the prefix with::

    cd /tmp && python /root/repo/tools/sweep.py \\
        $(python /root/repo/tools/sweep.py --driver-prefix 50)
"""

from __future__ import annotations

import importlib.util
import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _load_entry(repo: str):
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    if args and args[0] == "--driver-prefix":
        if len(args) != 2 or not args[1].isdigit() or int(args[1]) < 1:
            print("usage: sweep.py --driver-prefix N", file=sys.stderr)
            return 2
        names = list(_load_entry(repo).queries())[: int(args[1])]
        print("\n".join(names))
        return 0
    if args and os.path.isdir(args[0]):
        # any first arg that IS a directory is the sf_dir (bare relative
        # names like `sf0.01` from inside /root/testdata included)
        sf_dir, only = args[0], set(args[1:])
    elif args and (os.sep in args[0] or args[0].startswith(".")):
        # path-shaped but NOT a directory: a typo'd sf_dir must fail
        # loudly — silently reclassifying it as a "query name" would
        # produce a zero-query sweep that exits 0 (a false green)
        print(f"error: sf_dir {args[0]!r} is not a directory", file=sys.stderr)
        return 2
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)

    mod = _load_entry(repo)

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # an unknown name would silently sweep nothing and exit 0
        print(f"error: unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
            if name not in osql:
                print(name, "rows-only", len(spdf), flush=True)
                continue
            ddf = con.execute(osql[name]).df()
            a = sorted(
                map(repr, spdf[sorted(spdf.columns)].itertuples(index=False, name=None))
            )
            b = sorted(
                map(repr, ddf[sorted(ddf.columns)].itertuples(index=False, name=None))
            )
            ok = a == b
            bad += not ok
            print(name, "MATCH" if ok else "MISMATCH", flush=True)
        except Exception as ex:  # noqa: BLE001 - sweep must survive one bad query
            bad += 1
            print(name, "ERR", repr(ex)[:200], flush=True)
    print("SWEEP DONE bad =", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
