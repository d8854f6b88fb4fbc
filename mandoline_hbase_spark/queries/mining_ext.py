"""Pattern-mining / record-linkage / LM-smoothing catalog queries.

Each query pairs an operator from :mod:`operators.mining` with a
value-level DuckDB oracle over the same parquet. Float expressions are
written in ONE fixed shape on both sides (same literals, same
association order) so the doubles are bit-identical before rounding;
the EWMA oracle runs the SAME sequential fold (``list_reduce`` /
``F.aggregate``) rather than a rewritten closed form.

Reference parity note: no analog in the reference backend (hbase.clj);
these are the SURVEY.md §2.2 pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mandoline_hbase_spark.operators import mining
from mandoline_hbase_spark.queries.catalog import register
from mandoline_hbase_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# basket_association_rules — a-priori over order baskets
# --------------------------------------------------------------------------
@register(
    "basket_association_rules",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem
        ),
        tot AS (SELECT count(DISTINCT b) AS n_baskets FROM items),
        ic AS (SELECT item, count(*) AS item_count FROM items GROUP BY item),
        freq AS (SELECT item, item_count FROM ic WHERE item_count >= 20),
        fi AS (SELECT i.b, i.item FROM items i JOIN freq USING (item)),
        pc AS (
            SELECT a.item AS item_a, b2.item AS item_b,
                   count(*) AS pair_count
            FROM fi a JOIN fi b2 ON a.b = b2.b AND a.item < b2.item
            GROUP BY 1, 2
            HAVING count(*) >= 3
        ),
        rules AS (
            SELECT item_a AS antecedent, item_b AS consequent, pair_count
            FROM pc
            UNION ALL
            SELECT item_b, item_a, pair_count FROM pc
        )
        SELECT r.antecedent, r.consequent,
               r.pair_count::BIGINT AS pair_count,
               round(r.pair_count / t.n_baskets, 6) AS support,
               round(r.pair_count / fa.item_count, 6) AS confidence,
               round((r.pair_count * t.n_baskets)
                     / (fa.item_count * fc.item_count), 4) AS lift
        FROM rules r
        JOIN freq fa ON fa.item = r.antecedent
        JOIN freq fc ON fc.item = r.consequent
        CROSS JOIN tot t
        ORDER BY antecedent, consequent
    """,
    description=(
        "Market-basket association rules over order baskets with "
        "a-priori frequent-item pruning (support/confidence/lift)"
    ),
    tags=("mining", "rules", "apriori"),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return mining.association_rules(
        lineitem,
        "l_orderkey",
        "l_partkey",
        min_item_count=20,
        min_pair_count=3,
    )


# --------------------------------------------------------------------------
# text_chi2_terms — feature selection for the source classifier
# --------------------------------------------------------------------------
@register(
    "text_chi2_terms",
    oracle=r"""
        WITH tok AS (
            SELECT DISTINCT doc_id, label, term FROM (
                SELECT doc_id, source AS label,
                       unnest(regexp_split_to_array(lower(trim(text)),
                                                    '\s+')) AS term
                FROM documents
            ) WHERE term <> ''
        ),
        tl AS (SELECT term, label, count(*) AS a FROM tok GROUP BY 1, 2),
        t AS (SELECT term, count(*) AS df_t FROM tok GROUP BY 1),
        lab AS (SELECT source AS label, count(*) AS df_l
                FROM documents GROUP BY 1),
        tot AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            -- degenerate-margin guard mirrors operators/mining.py: a
            -- zero denominator (term in every doc / label = whole
            -- corpus) scores 0, never inf/NaN
            SELECT tl.label, tl.term,
                   tl.a::BIGINT AS df_in_label,
                   (t.df_t - tl.a)::BIGINT AS df_elsewhere,
                   CASE WHEN (t.df_t::DOUBLE
                              * (tot.n_docs - t.df_t)::DOUBLE
                              * lab.df_l::DOUBLE
                              * (tot.n_docs - lab.df_l)::DOUBLE) > 0
                   THEN
                   (tot.n_docs::DOUBLE
                    * (tl.a * (tot.n_docs - t.df_t - (lab.df_l - tl.a))
                       - (t.df_t - tl.a) * (lab.df_l - tl.a))::DOUBLE
                    * (tl.a * (tot.n_docs - t.df_t - (lab.df_l - tl.a))
                       - (t.df_t - tl.a) * (lab.df_l - tl.a))::DOUBLE)
                   / (t.df_t::DOUBLE
                      * (tot.n_docs - t.df_t)::DOUBLE
                      * lab.df_l::DOUBLE
                      * (tot.n_docs - lab.df_l)::DOUBLE)
                   ELSE 0.0 END AS chi2_raw
            FROM tl JOIN t USING (term) JOIN lab USING (label)
            CROSS JOIN tot
        )
        SELECT label, rank::INT AS rank, term, df_in_label, df_elsewhere,
               round(chi2_raw, 4) AS chi2
        FROM (
            SELECT *, row_number() OVER (PARTITION BY label
                                         ORDER BY chi2_raw DESC, term) AS rank
            FROM scored
        )
        WHERE rank <= 15
        ORDER BY label, rank
    """,
    description=(
        "Top-15 chi-square discriminative terms per source (doc-frequency "
        "contingency; the classic quality/domain-classifier feature score)"
    ),
    tags=("mining", "text", "chi2", "feature-selection"),
)
def text_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mining.chi2_terms(docs, "source", top_k=15)


# --------------------------------------------------------------------------
# text_kneser_ney_bigrams — interpolated KN smoothing
# --------------------------------------------------------------------------
@register(
    "text_kneser_ney_bigrams",
    oracle=r"""
        WITH t AS (
            SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS w
            FROM documents
        ),
        big AS (
            SELECT bg.w1 AS w1, bg.w2 AS w2 FROM (
                SELECT unnest(list_transform(
                    range(len(w) - 1),
                    i -> struct_pack(w1 := w[i+1], w2 := w[i+2])
                )) AS bg
                FROM t WHERE len(w) >= 2
            )
        ),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n_cont
               FROM c12 GROUP BY 1),
        nb AS (SELECT w2, count(*) AS n_hist FROM c12 GROUP BY 1),
        ty AS (SELECT count(*) AS n_types FROM c12)
        SELECT c12.w1, c12.w2, c12.c12::BIGINT AS c12,
               round(greatest(c12.c12 - 0.75, 0.0) / c1.c1
                     + (0.75 * c1.n_cont / c1.c1)
                       * (nb.n_hist / ty.n_types), 6) AS p_kn
        FROM c12 JOIN c1 USING (w1) JOIN nb USING (w2) CROSS JOIN ty
        ORDER BY c12 DESC, w1, w2
        LIMIT 200
    """,
    description=(
        "Interpolated Kneser-Ney bigram probabilities (D=0.75) for the "
        "top-200 bigrams — absolute-discount LM smoothing with the "
        "continuation-count unigram"
    ),
    tags=("mining", "text", "lm", "kneser-ney"),
)
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mining.kneser_ney_bigrams(docs, discount=0.75, top_k=200)


# --------------------------------------------------------------------------
# er_blocked_matches — blocked entity resolution, planted-twin recall
# --------------------------------------------------------------------------
@register(
    "er_blocked_matches",
    oracle="""
        WITH base AS (
            SELECT c_custkey::BIGINT AS id, c_name AS name,
                   c_nationkey::BIGINT AS nation, c_mktsegment AS segment,
                   c_acctbal::DOUBLE AS bal
            FROM customer
        ),
        off AS (
            SELECT CAST(round(power(10, length(CAST(max(id) AS VARCHAR))),
                              0) AS BIGINT) AS off
            FROM base
        ),
        twins AS (
            SELECT id + o.off AS id,
                   substr(name, 1, 4) || substr(name, 6) AS name,
                   nation, segment, bal
            FROM base, off o
        ),
        people AS (
            SELECT * FROM base UNION ALL SELECT * FROM twins
        ),
        -- brute force within the nation only: a strict SUPERSET of the
        -- (nation, segment) blocks, so any blocked match the Spark side
        -- could miss would show up here as a mismatch
        cand AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   a.name AS name_a, b.name AS name_b,
                   a.segment AS seg_a, b.segment AS seg_b,
                   a.bal AS bal_a, b.bal AS bal_b
            FROM people a JOIN people b
              ON a.nation = b.nation AND a.id < b.id
        )
        SELECT id_a, id_b,
               levenshtein(name_a, name_b)::INT AS name_dist,
               round(abs(bal_a - bal_b), 4) AS bal_diff,
               CASE WHEN id_b - id_a = o.off THEN 1 ELSE 0 END AS is_planted
        FROM cand, off o
        WHERE seg_a = seg_b
          AND levenshtein(name_a, name_b) <= 2
          AND abs(bal_a - bal_b) <= 0.5
        ORDER BY id_a, id_b
    """,
    description=(
        "Blocked entity resolution on customers ((nation, segment) block "
        "is part of the match predicate => blocking provably complete) "
        "with planted perturbed twins; oracle = nation-grouped brute force"
    ),
    tags=("mining", "er", "record-linkage", "planted"),
)
def er_blocked_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return mining.blocked_er_matches(customer)


# --------------------------------------------------------------------------
# ts_ewma_value — EWMA as the identical ordered fold on both sides
# --------------------------------------------------------------------------
@register(
    "ts_ewma_value",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   list(value ORDER BY ts, event_id) AS vals,
                   count(*) AS n
            FROM events GROUP BY user_id
        )
        SELECT user_id, n::BIGINT AS n_events,
               round(list_reduce(vals, (s, x) -> 0.2 * x + 0.8 * s),
                     4) AS ewma_value
        FROM s
        ORDER BY user_id
    """,
    description=(
        "Per-user final EWMA (alpha=0.2) of event values as an ordered "
        "sequential fold — bit-identical across engines, no exploding "
        "(1-a)^-i window rewrite"
    ),
    tags=("mining", "timeseries", "ewma"),
)
def ts_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return mining.ewma_per_key(events, alpha=0.2)


# --------------------------------------------------------------------------
# er_entity_clusters — golden-record entity ids over the match graph
# --------------------------------------------------------------------------
@register(
    "er_entity_clusters",
    oracle="""
        WITH RECURSIVE base AS (
            SELECT c_custkey::BIGINT AS id, c_name AS name,
                   c_nationkey::BIGINT AS nation, c_mktsegment AS segment,
                   c_acctbal::DOUBLE AS bal
            FROM customer
        ),
        off AS (
            SELECT CAST(round(power(10, length(CAST(max(id) AS VARCHAR))),
                              0) AS BIGINT) AS off
            FROM base
        ),
        twins AS (
            SELECT id + o.off AS id,
                   substr(name, 1, 4) || substr(name, 6) AS name,
                   nation, segment, bal
            FROM base, off o
        ),
        people AS (
            SELECT * FROM base UNION ALL SELECT * FROM twins
        ),
        matches AS (
            SELECT a.id AS src, b.id AS dst
            FROM people a JOIN people b
              ON a.nation = b.nation AND a.segment = b.segment
             AND a.id < b.id
            WHERE levenshtein(a.name, b.name) <= 2
              AND abs(a.bal - b.bal) <= 0.5
        ),
        edges AS (
            SELECT src, dst FROM matches UNION SELECT dst, src FROM matches
        ),
        reach(node, lab) AS (
            SELECT id, id FROM people
            UNION
            SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS id, min(lab) AS entity_id,
               node = min(lab) AS is_canonical
        FROM reach GROUP BY node
        ORDER BY id
    """,
    description=(
        "Golden-record entity ids: blocked-ER matches as edges, "
        "distributed hash-min connected components assign every person "
        "the minimum id of their component (singletons keep their own); "
        "oracle = recursive-CTE transitive closure over the brute-force "
        "match graph, the dedup_cluster_assign idiom applied to ER"
    ),
    tags=("mining", "er", "record-linkage", "cluster", "iterative"),
)
def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return mining.er_entity_clusters(customer)
