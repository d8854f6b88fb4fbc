"""Curation extensions: semantic dedup, n-gram heavy hitters, data mixing.

North-star LLM-pipeline additions (the reference has no analytics
surface at all — SURVEY.md §2.2): SemDeDup-style cluster-bounded
embedding dedup, corpus n-gram mining, and deterministic token-budget
source mixing. Every query is oracle-checked; parity notes follow the
discipline documented in llmops.py (identical IEEE operation sequences,
identical rounding, BIGINT casts on integer outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import sampling, semdedup, text
from mandoline_hbase_spark.queries.catalog import register
from mandoline_hbase_spark.sources.tables import load_table

# Shared DuckDB fragment: nearest-centroid assignment over the 8
# lowest-id vectors, ties to the smallest centroid id — mirrors
# operators.semdedup.assign_clusters (sequential-sum cosine; the
# existing sim_* oracles establish that list_cosine_similarity and the
# left-fold Spark formulation agree at double precision).
_DUCK_ASSIGN = """
    WITH cents AS (
        SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
        FROM embeddings WHERE vec_id < 8
    ),
    sims AS (
        SELECT e.vec_id, c.centroid_id,
               list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
        FROM embeddings e, cents c
    ),
    assign AS (
        SELECT vec_id, centroid_id AS cluster_id, sim FROM (
            SELECT vec_id, centroid_id, sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, centroid_id ASC) AS rn
            FROM sims
        ) WHERE rn = 1
    )
"""


@register(
    "dedup_semantic_assign",
    oracle=_DUCK_ASSIGN
    + """
    SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           round(sim, 6) AS centroid_sim
    FROM assign
    """,
    description=(
        "SemDeDup stage 1 — nearest-centroid cluster assignment as a "
        "map-only pass: centroids inlined as broadcast literals, argmax "
        "via array_max over (sim, -id) structs. ZERO shuffles, pure "
        "whole-stage codegen."
    ),
    tags=("llm", "dedup", "semantic", "embeddings"),
)
def dedup_semantic_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = semdedup.deterministic_centroids(emb, k=8)
    return semdedup.assign_clusters(emb, cents).select(
        "vec_id", "cluster_id", F.round("centroid_sim", 6).alias("centroid_sim")
    )


@register(
    "dedup_semantic_prune",
    oracle=_DUCK_ASSIGN
    + """,
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assign a
        JOIN assign b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                     eb.embedding::DOUBLE[]) >= 0.4
    )
    SELECT v.vec_id, CAST(v.cluster_id AS BIGINT) AS cluster_id,
           v.vec_id NOT IN (SELECT id_b FROM pairs) AS is_kept
    FROM assign v
    """,
    description=(
        "SemDeDup stage 2 — within-cluster cosine>=0.4 pairs, drop the "
        "larger id of each pair. The self-join is keyed on cluster_id "
        "(the ONLY shuffle), so pair work is bounded by the largest "
        "cluster, never the corpus: raise k until clusters fit an "
        "executor."
    ),
    tags=("llm", "dedup", "semantic", "embeddings"),
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup.semantic_dedup(emb, k=8, threshold=0.4)


@register(
    "text_top_bigrams",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           t -> length(t) > 0) AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id, unnest(
            CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                                     i -> array_to_string(t[i:i+1], ' '))
                 ELSE [] END) AS gram
        FROM toks
    ),
    per_doc AS (
        SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS tf
        FROM g GROUP BY doc_id, gram
    ),
    totals AS (
        SELECT gram, CAST(sum(tf) AS BIGINT) AS total_tf,
               CAST(count(*) AS BIGINT) AS doc_freq
        FROM per_doc GROUP BY gram
    )
    SELECT * FROM (
        SELECT CAST(row_number() OVER (ORDER BY total_tf DESC, gram ASC) AS BIGINT) AS rank,
               gram, total_tf, doc_freq
        FROM totals
    ) WHERE rank <= 25
    """,
    description=(
        "Heavy hitters: corpus top-25 word bigrams. Two-stage aggregate "
        "(per-doc partial combine before the gram-grain shuffle) + "
        "TakeOrderedAndProject top-k — the exact baseline a count-min / "
        "SpaceSaving sketch approximates at wider key spaces."
    ),
    tags=("llm", "text", "ngrams", "heavy-hitters"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.top_ngrams(docs, n=2, k=25)


@register(
    "mix_sources_token_budget",
    oracle=r"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
               END AS BIGINT) AS n_tok,
               CAST(doc_id % 4 AS BIGINT) AS bucket,
               substr(md5(doc_id::VARCHAR || ':mix42'), 1, 8) AS h
        FROM documents
    ),
    runs AS (
        SELECT doc_id, source, bucket, n_tok,
               CAST(sum(n_tok) OVER (
                   PARTITION BY source, bucket ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tok
        FROM scored
    )
    SELECT doc_id, source, bucket, n_tok, cum_tok
    FROM runs WHERE cum_tok <= 200
    """,
    description=(
        "Deterministic data mixing: fill an 800-token budget per source "
        "in salted-hash order, split over 4 id-sliced buckets (200 "
        "each) so the running sum parallelizes source x bucket instead "
        "of serializing each source through one task."
    ),
    tags=("llm", "mixing", "sampling", "window"),
)
def mix_sources_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.mix_to_token_budget(docs, tokens_per_source=800, n_buckets=4)
