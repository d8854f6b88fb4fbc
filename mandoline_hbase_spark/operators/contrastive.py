"""Contrastive training-pair generation over an embedding corpus.

Builds (anchor, positive, negative) triplets for contrastive/embedding
training from a corpus alone:

- **positives** — near-duplicate pairs (cosine >= threshold), the
  standard self-supervised positive signal;
- **negatives** — a deterministic pseudo-random corpus document drawn
  from the anchor's HASH BUCKET, excluding the anchor itself and any of
  its positives. Bucketing bounds the candidate join (per-task work =
  bucket size, one shuffle on the bucket key) the same way in-batch
  negatives bound it during training, and the salted-md5 ranking makes
  the draw reproducible across re-runs and partitionings (same property
  as operators/sampling.py).

Every step is hash/row-expressible in ANSI SQL, so the whole triplet
table is oracle-checkable — no RNG anywhere.

The reference has no similarity surface (SURVEY.md §2.2); this extends
the north-star LLM-pipeline family (the training-data side of the
similarity operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import similarity


def _bucket(id_col, n_buckets: int, salt: str):
    """Deterministic bucket from the salted id hash (SQL-parity form)."""
    hex8 = F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 8
    )
    return F.pmod(F.conv(hex8, 16, 10).cast("bigint"), F.lit(n_buckets))


def contrastive_triplets(
    emb: DataFrame,
    threshold: float = 0.4,
    n_buckets: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "neg42",
    positives: DataFrame | None = None,
) -> DataFrame:
    """One triplet per near-dup pair: ``(anchor_id, positive_id, negative_id)``.

    The negative is the bucket-mate with the smallest salted pair hash
    that is neither the anchor nor one of the anchor's positives — a
    uniform draw from the anchor's bucket, deterministic by
    construction. Anchors whose bucket offers no eligible candidate
    (possible only in tiny corpora) are dropped.

    ``positives``: optional precomputed pair table ``(id_a, id_b)``.
    Default is the exact-cosine pair join (the oracle-checkable
    baseline, quadratic); at scale pass the LSH/SemDeDup candidate
    pairs (``dedup.minhash_near_duplicates`` /
    ``semdedup.semantic_near_dup_pairs_matmul``) so the positive stage
    stays bucket-bounded too.
    """
    if positives is None:
        # the quadratic baseline path — small-data by contract, so the
        # broadcast build side is in bounds (scale callers pass candidate
        # `positives` and never reach this)
        positives = similarity.near_duplicate_pairs(
            emb, threshold, id_col, vec_col, broadcast_corpus=True
        )
    pos = positives.select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("positive_id")
    )
    # both orientations of the positive relation, for exclusion
    pos_sym = pos.unionByName(
        pos.select(
            F.col("positive_id").alias("anchor_id"),
            F.col("anchor_id").alias("positive_id"),
        )
    ).select(F.col("anchor_id").alias("x"), F.col("positive_id").alias("y"))

    cands = emb.select(
        F.col(id_col).alias("cand_id"),
        _bucket(F.col(id_col), n_buckets, salt).alias("bucket"),
    )
    anchored = pos.withColumn("bucket", _bucket(F.col("anchor_id"), n_buckets, salt))
    joined = (
        anchored.join(cands, "bucket")
        .filter(
            (F.col("cand_id") != F.col("anchor_id"))
            & (F.col("cand_id") != F.col("positive_id"))
        )
        .join(
            pos_sym,
            (F.col("anchor_id") == F.col("x")) & (F.col("cand_id") == F.col("y")),
            "left_anti",
        )
    )
    pair_key = F.md5(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit(":"),
            F.col("cand_id").cast("string"),
            F.lit(":" + salt),
        )
    )
    # argmin as a hash aggregate, not a rank window: min_by over the
    # (pair_key, cand_id) struct selects exactly the row a
    # row_number()=1 window ordered by (pair_key asc, cand_id asc)
    # would keep — struct comparison is lexicographic on the same
    # fields, cand_id is unique within a (anchor, positive) group, and
    # md5 strings order identically under both operators (binary UTF8
    # compare). The aggregate form partial-combines map-side, so the
    # (anchor, positive)-grain exchange carries one candidate per group
    # per map task instead of the whole |pairs| x bucket-size candidate
    # explosion that the window had to shuffle AND sort.
    return joined.groupBy("anchor_id", "positive_id").agg(
        F.min_by(
            F.col("cand_id"), F.struct(pair_key.alias("pk"), F.col("cand_id").alias("c"))
        ).alias("negative_id")
    )
