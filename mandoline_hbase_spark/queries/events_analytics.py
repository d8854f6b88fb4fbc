"""Event-stream analytics in batch: sessionization, distinct counting.

The batch twin of streaming/ingest.py: the same sessionization semantics
expressed as gaps-and-islands windows (oracle-checkable in ANSI SQL),
plus the exact/approx distinct-count pair — approx_count_distinct (HLL)
is the 100 TB path (constant memory per group), the exact variant is the
correctness baseline the oracle verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mandoline_hbase_spark.queries.catalog import register
from mandoline_hbase_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# sessionize_events — gaps-and-islands sessionization (batch).
# Two windows over one (user_id) shuffle: lag to mark session starts,
# running sum to number sessions. Identical result to the streaming
# session_window operator at the same gap.
# --------------------------------------------------------------------------
@register(
    "sessionize_events",
    oracle="""
        WITH marks AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 10 MINUTES
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_no
            FROM marks
        )
        SELECT user_id,
               session_no::BIGINT AS session_no,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM numbered
        GROUP BY user_id, session_no
        ORDER BY user_id, session_no
    """,
    description="Gaps-and-islands sessionization (10-minute inactivity gap)",
    tags=("events", "window", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond precision: cast-to-long truncates to seconds, which would
    # disagree with the oracle's exact interval comparison on sub-second gaps
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    marked = events.withColumn(
        "new_sess", F.when(gap > 600 * 1_000_000, 1).otherwise(0)
    )
    numbered = marked.withColumn(
        "session_no", F.sum("new_sess").over(run).cast("bigint")
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


# --------------------------------------------------------------------------
# distinct_users_by_type — exact distinct (the correctness baseline).
# --------------------------------------------------------------------------
@register(
    "distinct_users_by_type",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Exact distinct users per event type",
    tags=("events", "aggregate", "distinct"),
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# approx_distinct_users — the scale path: HyperLogLog++ sketch, constant
# memory per group, one pass, no distinct-expand shuffle. No SQL oracle
# (sketch internals are engine-specific); the exact twin above is the
# accuracy reference, and the test asserts relative error < 5%.
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# funnel_signup_to_purchase — sequence funnel: users converting after their
# first signup. Two aggregations + one join, all on the user_id shuffle.
# --------------------------------------------------------------------------
@register(
    "funnel_signup_to_purchase",
    oracle="""
        WITH first_signup AS (
            SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id
        ),
        converted AS (
            SELECT DISTINCT f.user_id
            FROM first_signup f
            JOIN events e ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.ts > f.signup_ts
        )
        SELECT (SELECT count(*) FROM first_signup)::BIGINT AS n_signup_users,
               (SELECT count(*) FROM converted)::BIGINT AS n_converted,
               round((SELECT count(*) FROM converted)
                     / (SELECT count(*) FROM first_signup)::DOUBLE, 4) AS conv_rate
    """,
    description="Funnel: signup -> later purchase conversion rate",
    tags=("events", "funnel", "join"),
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    converted = (
        first_signup.join(
            events.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("p_ts")
            ),
            "user_id",
        )
        .filter(F.col("p_ts") > F.col("signup_ts"))
        .select("user_id")
        .distinct()
    )
    totals = first_signup.agg(F.count(F.lit(1)).alias("n_signup_users")).crossJoin(
        converted.agg(F.count(F.lit(1)).alias("n_converted"))
    )
    return totals.select(
        "n_signup_users",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_signup_users"), 4).alias("conv_rate"),
    )


# --------------------------------------------------------------------------
# retention_cohorts — daily cohort retention triangle: users active N days
# after their first event. distinct-per-(cohort, offset); one shuffle each.
# --------------------------------------------------------------------------
@register(
    "retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, min(ts::DATE) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT cohort_day::TIMESTAMP AS cohort_day,
               date_diff('day', cohort_day, e.ts::DATE)::INT AS day_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN firsts USING (user_id)
        WHERE date_diff('day', cohort_day, e.ts::DATE) BETWEEN 0 AND 7
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    description="Daily cohort retention (day 0-7 active users)",
    tags=("events", "retention", "aggregate"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    offset = F.datediff(F.to_date("ts"), F.col("cohort_day"))
    return (
        events.join(firsts, "user_id")
        .withColumn("day_offset", offset.cast("int"))
        .filter(F.col("day_offset").between(0, 7))
        # DATE surfaces as datetime.date via Arrow but pandas Timestamp from
        # DuckDB; cast to timestamp so both engines hash identically
        .groupBy(F.col("cohort_day").cast("timestamp").alias("cohort_day"), F.col("day_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "approx_distinct_users",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id)::BIGINT AS n_users_exact,
               true AS approx_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Approximate distinct users per event type (HLL++)",
    tags=("events", "aggregate", "approx", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The HLL++ estimate itself is engine-specific, so the hashable
    # output is the exact count (computable by any SQL engine) plus the
    # IN-PLAN claim that the sketch landed within 5% (rsd=0.02, 2.5
    # sigma) — a driver hash-match independently verifies both.
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
            F.countDistinct("user_id").cast("bigint").alias("n_users_exact"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("_approx") - F.col("n_users_exact"))
                <= 0.05 * F.col("n_users_exact")
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# hll_union_distinct_users — mergeable-sketch distinct counting: one HLL
# sketch per (event_type) group, then a SKETCH UNION to the global
# distinct estimate without re-touching the data. This is the 100 TB
# pattern: per-partition/per-day sketches persist as bytes and any
# rollup is a cheap union — the raw values never shuffle twice. No SQL
# oracle (sketch binary is engine-specific); accuracy pinned vs exact
# in tests/test_scale_ops.py.
# --------------------------------------------------------------------------
@register(
    "hll_union_distinct_users",
    oracle="""
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users_exact,
               true AS sketch_within_5pct
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '__all__', count(DISTINCT user_id)::BIGINT, true FROM events
        ORDER BY event_type
    """,
    description="Per-type HLL sketches + sketch-union rollup to global distinct",
    tags=("events", "aggregate", "approx", "sketch", "mergeable"),
)
def hll_union_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sketch binaries are engine-specific; the hashable output is the
    # exact per-type and global distinct counts plus the IN-PLAN claim
    # that each sketch estimate (including the UNION rollup — the
    # mergeability contract) landed within 5% of exact.
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.countDistinct("user_id").cast("bigint").alias("n_users_exact"),
    )
    ok = lambda est, exact: F.abs(est - exact) <= 0.05 * exact  # noqa: E731
    per_type_counts = per_type.select(
        "event_type",
        "n_users_exact",
        ok(F.hll_sketch_estimate("sk"), F.col("n_users_exact")).alias(
            "sketch_within_5pct"
        ),
    )
    overall_exact = events.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users_exact")
    )
    overall = (
        per_type.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"))
        .crossJoin(overall_exact)
        .select(
            F.lit("__all__").alias("event_type"),
            "n_users_exact",
            ok(F.col("_est"), F.col("n_users_exact")).alias("sketch_within_5pct"),
        )
    )
    return per_type_counts.unionByName(overall).orderBy("event_type")


# --------------------------------------------------------------------------
# kmv_user_overlap_by_type — KMV (theta-style) sketch set algebra: the
# distinct-USER OVERLAP between every pair of event types, from one
# corpus pass. HLL union answers |A ∪ B| only; the KMV estimator also
# gives |A ∩ B| and Jaccard — the "how many users did both" question —
# with the pair join running in sketch space (one ≤k-hash row per
# group), never over raw users. No SQL oracle (xxhash64 sketch space is
# engine-specific); accuracy pinned vs exact in tests/test_kmv.py.
# --------------------------------------------------------------------------
@register(
    "kmv_user_overlap_by_type",
    oracle="""
        WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (SELECT event_type, count(*) AS n FROM tu GROUP BY event_type),
        inter AS (
            SELECT x.event_type AS group_a, y.event_type AS group_b,
                   count(*) AS exact_intersection
            FROM tu x JOIN tu y
              ON x.user_id = y.user_id AND x.event_type < y.event_type
            GROUP BY 1, 2
        )
        SELECT sa.event_type AS group_a, sb.event_type AS group_b,
               coalesce(i.exact_intersection, 0)::BIGINT AS exact_intersection,
               (sa.n + sb.n - coalesce(i.exact_intersection, 0))::BIGINT AS exact_union,
               true AS kmv_within_bounds
        FROM sizes sa
        JOIN sizes sb ON sa.event_type < sb.event_type
        LEFT JOIN inter i
          ON i.group_a = sa.event_type AND i.group_b = sb.event_type
        ORDER BY group_a, group_b
    """,
    description="KMV sketch pairwise distinct-user overlap across event types",
    tags=("events", "aggregate", "approx", "sketch", "mergeable"),
)
def kmv_user_overlap_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The xxhash64 sketch space is engine-specific; the hashable output
    # is the EXACT pairwise overlap (the verification twin, computed
    # in-plan from the same scan) plus the claim that the KMV estimates
    # landed within bounds (k=256 -> rse ~6.3%; 20% covers the
    # intersection estimator's wider error on small overlaps).
    from mandoline_hbase_spark.operators import kmv

    events = load_table(spark, sf_dir, "events")
    est = kmv.distinct_overlap(events, "event_type", "user_id", k=256)
    tu = events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        tu.alias("x")
        .join(tu.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("group_a"),
            F.col("y.event_type").alias("group_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    exact = (
        sizes.alias("sa")
        .join(sizes.alias("sb"), F.col("sa.event_type") < F.col("sb.event_type"))
        .select(
            F.col("sa.event_type").alias("group_a"),
            F.col("sb.event_type").alias("group_b"),
            F.col("sa.n").alias("_na"),
            F.col("sb.n").alias("_nb"),
        )
        .join(inter, ["group_a", "group_b"], "left")
        .withColumn(
            "exact_intersection",
            F.coalesce(F.col("exact_intersection"), F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "exact_union",
            (F.col("_na") + F.col("_nb") - F.col("exact_intersection")).cast("bigint"),
        )
    )
    tol = lambda est_c, ex_c: F.abs(est_c - ex_c) <= 0.2 * ex_c + 2.0  # noqa: E731
    return (
        exact.join(est, ["group_a", "group_b"])
        .select(
            "group_a",
            "group_b",
            "exact_intersection",
            "exact_union",
            (
                tol(F.col("est_distinct_a"), F.col("_na"))
                & tol(F.col("est_distinct_b"), F.col("_nb"))
                & tol(F.col("est_intersection"), F.col("exact_intersection"))
            ).alias("kmv_within_bounds"),
        )
        .orderBy("group_a", "group_b")
    )


# --------------------------------------------------------------------------
# theta_user_set_algebra — the production (Apache Datasketches) twin of
# kmv_user_overlap_by_type: per-type THETA sketches, then JVM-side
# union / intersection / difference estimates between the click and
# purchase user sets plus the all-types union. Sketch binaries are
# mergeable — at 100 TB they persist per partition/day and any set
# question is answered from sketches without re-touching raw data.
# No SQL oracle (sketch binary is engine-specific); accuracy pinned vs
# exact in tests/test_kmv.py::test_theta_matches_exact_within_bounds.
# --------------------------------------------------------------------------
@register(
    "theta_user_set_algebra",
    oracle="""
        SELECT 'click_vs_purchase' AS pair,
               count(DISTINCT user_id) FILTER (
                   WHERE event_type IN ('click', 'purchase'))::BIGINT AS exact_union,
               (count(DISTINCT user_id) FILTER (WHERE event_type = 'click')
                + count(DISTINCT user_id) FILTER (WHERE event_type = 'purchase')
                - count(DISTINCT user_id) FILTER (
                      WHERE event_type IN ('click', 'purchase')))::BIGINT
                   AS exact_intersection,
               (count(DISTINCT user_id) FILTER (
                   WHERE event_type IN ('click', 'purchase'))
                - count(DISTINCT user_id) FILTER (WHERE event_type = 'purchase')
               )::BIGINT AS exact_click_only,
               count(DISTINCT user_id)::BIGINT AS exact_all_users,
               true AS theta_within_5pct
        FROM events
    """,
    description="Theta sketches: click/purchase user union, intersection, difference",
    tags=("events", "aggregate", "approx", "sketch", "mergeable"),
)
def theta_user_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # ONE conditional-aggregation pass builds all three sketches AND the
    # exact twins (the null branch of the CASE is skipped by the
    # aggregate) — no join in the plan at all; the set algebra runs on
    # three sketch values, and the hashable output is the exact counts
    # plus the in-plan claim that every estimate landed within 5%.
    is_cp = F.col("event_type").isin("click", "purchase")
    sk = events.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("sk_click"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_purchase"),
        F.theta_sketch_agg("user_id").alias("sk_all"),
        F.count_distinct(F.when(is_cp, F.col("user_id"))).cast("bigint").alias(
            "exact_union"
        ),
        F.count_distinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).cast("bigint").alias("_ex_click"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).cast("bigint").alias("_ex_purchase"),
        F.count_distinct("user_id").cast("bigint").alias("exact_all_users"),
    )
    ok = lambda est, ex: F.abs(est - ex) <= 0.05 * ex + 1.0  # noqa: E731
    est_union = F.theta_sketch_estimate(F.theta_union("sk_click", "sk_purchase"))
    est_inter = F.theta_sketch_estimate(
        F.theta_intersection("sk_click", "sk_purchase")
    )
    est_diff = F.theta_sketch_estimate(F.theta_difference("sk_click", "sk_purchase"))
    est_all = F.theta_sketch_estimate("sk_all")
    return sk.select(
        F.lit("click_vs_purchase").alias("pair"),
        "exact_union",
        (F.col("_ex_click") + F.col("_ex_purchase") - F.col("exact_union")).alias(
            "exact_intersection"
        ),
        (F.col("exact_union") - F.col("_ex_purchase")).alias("exact_click_only"),
        "exact_all_users",
        (
            ok(est_union, F.col("exact_union"))
            & ok(
                est_inter,
                F.col("_ex_click") + F.col("_ex_purchase") - F.col("exact_union"),
            )
            & ok(est_diff, F.col("exact_union") - F.col("_ex_purchase"))
            & ok(est_all, F.col("exact_all_users"))
        ).alias("theta_within_5pct"),
    )


# --------------------------------------------------------------------------
# kll_value_quantiles — mergeable quantile sketches (Apache Datasketches
# KLL): one sketch per event type over `value`, per-type p50/p90/p99,
# plus the GLOBAL quantiles from a sketch MERGE — the raw values are
# never re-aggregated. The persistable twin of percentile_approx (GK):
# at 100 TB, per-day/per-partition KLL binaries stored once answer any
# later quantile rollup as a cheap merge. No SQL oracle (sketch binary);
# accuracy pinned vs exact quantiles in tests/test_kmv.py.
# --------------------------------------------------------------------------
@register(
    "kll_value_quantiles",
    oracle="""
        SELECT event_type, count(*)::BIGINT AS n_rows,
               true AS p50_rank_ok, true AS p90_rank_ok, true AS p99_rank_ok
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '__all__', count(*)::BIGINT, true, true, true FROM events
        ORDER BY event_type
    """,
    description="Per-type KLL quantile sketches + sketch-merge global p50/p90/p99",
    tags=("events", "aggregate", "approx", "sketch", "mergeable", "percentile"),
)
def kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The KLL binary and its quantile values are engine-specific, but the
    # sketch's CONTRACT is a rank-error bound: the returned quantile's
    # true rank must sit within eps of the target rank. That claim is
    # computed in-plan (count of values <= estimate, one extra
    # conditional aggregate per target) and hashed alongside the exact
    # row counts — including for the sketch-MERGE global row, pinning
    # mergeability, the 100 TB property. eps = 3% covers KLL k=400
    # (~1.65% single sketch) plus merge widening.
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value", F.lit(400)).alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )

    def _qs(sk):
        return [
            F.kll_sketch_get_quantile_double(sk, F.lit(q)).alias(f"_q{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]

    per_type_q = per_type.select("event_type", "n_rows", *_qs(F.col("sk")))
    # kll_sketch_merge_double is a two-sketch scalar fn; fold the per-type
    # sketch list into one global sketch (k types -> k-1 merges, in-plan).
    merged = F.aggregate(
        F.slice(F.col("sks"), 2, 1_000_000),
        F.element_at(F.col("sks"), 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    overall = per_type.agg(
        F.collect_list("sk").alias("sks"), F.sum("n_rows").cast("bigint").alias("n_rows")
    ).select(F.lit("__all__").alias("event_type"), "n_rows", *_qs(merged))
    est = per_type_q.unionByName(overall)

    tagged = events.select(
        "event_type", "value"
    ).unionByName(
        events.select(F.lit("__all__").alias("event_type"), "value")
    )
    ranks = (
        tagged.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                (
                    F.sum(
                        F.when(F.col("value") <= F.col(f"_q{p}"), 1).otherwise(0)
                    )
                    / F.count(F.lit(1))
                ).alias(f"_rank{p}")
                for p in (50, 90, 99)
            ]
        )
    )
    eps = 0.03
    return (
        est.join(ranks, "event_type")
        .select(
            "event_type",
            "n_rows",
            *[
                (F.abs(F.col(f"_rank{p}") - F.lit(p / 100.0)) <= eps).alias(
                    f"p{p}_rank_ok"
                )
                for p in (50, 90, 99)
            ],
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# variant_props_stats — Spark 4 VARIANT for semi-structured props: parse
# the JSON once into the binary variant encoding, then typed field
# extraction (variant_get) at column speed. At 100 TB this is the
# schema-on-read path for ragged event payloads: parse cost is paid once
# per row (or once at ingest if stored as VARIANT), every downstream
# field access is binary-offset, not string re-parsing; shredding can
# push extraction into the scan. Oracle: DuckDB json_extract on the same
# strings.
# --------------------------------------------------------------------------
@register(
    "variant_props_stats",
    oracle="""
        SELECT event_type,
               CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
               CAST(min(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS min_k,
               CAST(max(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS max_k,
               round(avg(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description=(
        "VARIANT semi-structured path: parse_json(props) -> typed "
        "variant_get field extraction -> per-type stats over the payload"
    ),
    tags=("events", "variant", "semi-structured", "scalar"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_transition_matrix",
    oracle="""
        WITH pairs AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        cnt AS (
            SELECT event_type, next_type, COUNT(*)::BIGINT AS n_transitions
            FROM pairs WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        )
        SELECT event_type, next_type, n_transitions,
               SUM(n_transitions) OVER (PARTITION BY event_type)::BIGINT AS total_from,
               ((n_transitions * 1000000) //
                   SUM(n_transitions) OVER (PARTITION BY event_type))::BIGINT
                   AS p_units
        FROM cnt
    """,
    description=(
        "First-order next-event transition matrix (user-journey Markov "
        "chain): per user-ordered stream, count (event_type -> "
        "next_type) transitions and emit P(next|current) as exact "
        "integer micro-units (floor(1e6 * n / total) via integer "
        "division - no float probability ever computed, so the matrix "
        "hash-verifies). One lead() window + one aggregate; the "
        "per-source normalization is a partition window over the "
        "TYPE-GRAIN counts (|types|^2 rows), never the raw stream."
    ),
    tags=("events", "window", "markov", "sequence"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    cnt = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    wt = Window.partitionBy("event_type")
    return cnt.select(
        "event_type",
        "next_type",
        "n_transitions",
        F.sum("n_transitions").over(wt).cast("long").alias("total_from"),
        F.expr(
            "CAST((n_transitions * 1000000) DIV SUM(n_transitions) "
            "OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("p_units"),
    )


@register(
    "events_outliers_mad",
    oracle="""
        WITH med AS (
            SELECT event_type, median(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, median(adev) AS mad FROM dev
            GROUP BY event_type
        )
        SELECT d.event_type,
               COUNT(*)::BIGINT AS n,
               round(any_value(d.med), 6) AS med,
               round(any_value(m.mad), 6) AS mad,
               SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)::BIGINT
                   AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type
    """,
    description=(
        "Robust outlier detection (median absolute deviation): per "
        "event_type, exact interpolated median and MAD of value, and "
        "the count of events beyond 3 MADs - the monitoring gate "
        "z-scores get wrong on heavy-tailed data (median/MAD have a "
        "50% breakdown point; mean/stddev break at one bad row). Two "
        "grouped exact-percentile aggregations + one conditional "
        "count; group grain is |event types|, so the joins broadcast."
    ),
    tags=("events", "quality", "outliers", "robust"),
)
def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("int"))
            .cast("long")
            .alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# funnel_latency_quantiles — time-to-convert distribution.
# --------------------------------------------------------------------------
@register(
    "funnel_latency_quantiles",
    oracle="""
        WITH first_signup AS (
            SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id
        ),
        conv AS (
            SELECT f.user_id,
                   (min(epoch_us(e.ts)) - min(epoch_us(f.signup_ts)))
                       / 1000000.0 AS delta_s
            FROM first_signup f
            JOIN events e ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.ts > f.signup_ts
            GROUP BY f.user_id
        )
        SELECT count(*)::BIGINT AS n_converted,
               round(quantile_cont(delta_s, 0.5), 2) AS p50_s,
               round(quantile_cont(delta_s, 0.9), 2) AS p90_s,
               round(avg(delta_s), 2) AS mean_s
        FROM conv
    """,
    description=(
        "Funnel latency: seconds from first signup to first subsequent "
        "purchase per converting user, summarized as exact p50/p90/mean "
        "— the time-to-convert readout that pairs with the funnel's "
        "conversion rate (microsecond-exact deltas, one division)"
    ),
    tags=("events", "funnel", "latency", "percentile"),
)
def funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            (
                (
                    F.min(F.unix_micros(F.col("ts")))
                    - F.min(F.unix_micros(F.col("signup_ts")))
                )
                / F.lit(1000000.0)
            ).alias("delta_s")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(delta_s, 0.5)"), 2).alias("p50_s"),
        F.round(F.expr("percentile(delta_s, 0.9)"), 2).alias("p90_s"),
        F.round(F.avg("delta_s"), 2).alias("mean_s"),
    )
