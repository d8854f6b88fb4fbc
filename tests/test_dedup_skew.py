"""Hot-bucket guard for LSH band self-joins (banded_candidate_pairs).

A degenerate band value — boilerplate-heavy corpora where thousands of
documents share a MinHash band — makes an unguarded band self-join
quadratic in the hottest bucket. The guard degrades buckets over
``max_bucket_size`` to STAR candidates around the bucket's min id:
candidate volume is O(n) per hot bucket, connectivity (what clustering
and keep-one dedup consume) is preserved, and buckets at or under the
cap emit the exact unguarded pair set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mandoline_hbase_spark.operators import dedup


def _stacked(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, band bigint, bh bigint")


def test_normal_buckets_pair_set_unchanged(spark):
    # two small buckets: all pairs, independent of the guard
    rows = [(i, 0, 100) for i in range(4)] + [(i, 1, 200) for i in (10, 11, 12)]
    out = dedup.banded_candidate_pairs(_stacked(spark, rows), "doc_id", max_bucket_size=512)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    expect = {(a, b) for a in range(4) for b in range(4) if a < b} | {
        (10, 11), (10, 12), (11, 12)
    }
    assert got == expect


def test_pair_filter_engages_only_on_all_cold_bucket_sets(spark):
    """Code-review r8: positional bounds are only valid on a pair's
    FIRST-shared-key row, and a hot bucket may have star-diverted that
    row — so pair_filter must apply on all-cold corpora and be IGNORED
    the moment any bucket is hot (the guard's documented hub-relative
    trade must not silently widen)."""

    def reject_all(A, B):
        return F.lit(False)

    cold = [(i, 0, 100) for i in range(4)]
    got = {
        (r.id_a, r.id_b)
        for r in dedup.banded_candidate_pairs(
            _stacked(spark, cold), "doc_id", max_bucket_size=512,
            payload=(), pair_filter=reject_all,
        ).collect()
    }
    assert got == set()  # all-cold: the filter really ran

    hot = cold + [(i, 1, 200) for i in range(40)]  # bucket 1 goes hot
    stats = {}
    got = {
        (r.id_a, r.id_b)
        for r in dedup.banded_candidate_pairs(
            _stacked(spark, hot), "doc_id", max_bucket_size=10,
            payload=(), pair_filter=reject_all, stats=stats,
        ).collect()
    }
    assert stats["n_hot"] == 1
    # the reject-everything filter was ignored: cold bucket emits its
    # full pair set, the hot one its star rows
    expect = {(a, b) for a in range(4) for b in range(4) if a < b} | {
        (0, i) for i in range(1, 40)
    }
    assert got == expect


def test_hot_bucket_degrades_to_star(spark):
    n = 50
    rows = [(i, 0, 7) for i in range(n)]
    out = dedup.banded_candidate_pairs(_stacked(spark, rows), "doc_id", max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # star around the min id: n-1 pairs, not n*(n-1)/2
    assert got == {(0, i) for i in range(1, n)}


def test_mixed_buckets_guard_only_the_hot_one(spark):
    hot = [(i, 0, 7) for i in range(40)]
    cold = [(i, 1, 9) for i in (100, 101, 102)]
    out = dedup.banded_candidate_pairs(
        _stacked(spark, hot + cold), "doc_id", max_bucket_size=10
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(0, i) for i in range(1, 40)} | {(100, 101), (100, 102), (101, 102)}


def test_candidate_volume_linear_in_hot_bucket(spark):
    """The degenerate corpus completes with O(n) candidates — the property
    that keeps one boilerplate band value from creating a quadratic task."""
    n = 2000
    rows = [(i, b, 7) for i in range(n) for b in (0,)]
    out = dedup.banded_candidate_pairs(_stacked(spark, rows), "doc_id", max_bucket_size=64)
    assert out.count() == n - 1


def test_degenerate_corpus_clusters_correctly(spark):
    """End-to-end: a corpus where one boilerplate text dominates. All
    copies must land in ONE cluster via the star path, and the distinct
    pair (distinct doc) survives untouched."""
    docs = [(i, "the same boilerplate header repeated verbatim in every page") for i in range(200)]
    docs.append((999, "a completely different document about differential geometry"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    clusters = dedup.near_duplicate_clusters(df, threshold=0.7)
    rows = {r.doc_id: r.cluster_id for r in clusters.collect()}
    assert rows[999] == 999
    assert {rows[i] for i in range(200)} == {0}


def test_simhash_hot_bucket_star(spark):
    """SimHash banding with identical codes: hot key buckets degrade the
    same way; verified output keeps hamming<=max pairs through the hub."""
    docs = [(i, "identical text identical text identical text") for i in range(80)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    pairs = dedup.simhash_near_duplicates(df, max_hamming=3, max_bucket_size=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every doc hashes to the same code -> every band bucket is hot ->
    # star pairs only, all verified at hamming 0
    assert got == {(0, i) for i in range(1, 80)}


def test_minhash_pairs_unchanged_when_under_cap(spark):
    """Guard off-path check: with the cap above every bucket size, the
    verified near-dup pair set equals the unguarded output."""
    base = "spark engines shuffle data between executors for wide operations"
    docs = [
        (1, base),
        (2, base + " quickly"),
        (3, "completely unrelated text about pottery and glazes and kilns"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    guarded = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_near_duplicates(df, threshold=0.5, max_bucket_size=512).collect()
    }
    assert guarded == {(1, 2)}


def test_window_fallback_path_emits_identical_pairs(spark):
    """hot_broadcast_max=0 forces the fully distributed sizing-window
    fallback (the pathological many-hot-buckets regime); its pair set
    must equal the broadcast-split path's."""
    hot = [(i, 0, 7) for i in range(40)]
    cold = [(i, 1, 9) for i in (100, 101, 102)]
    st = _stacked(spark, hot + cold)
    via_bcast = {
        (r.id_a, r.id_b)
        for r in dedup.banded_candidate_pairs(st, "doc_id", max_bucket_size=10).collect()
    }
    via_window = {
        (r.id_a, r.id_b)
        for r in dedup.banded_candidate_pairs(
            st, "doc_id", max_bucket_size=10, hot_broadcast_max=0
        ).collect()
    }
    assert via_window == via_bcast
    assert via_window == {(0, i) for i in range(1, 40)} | {(100, 101), (100, 102), (101, 102)}


def test_prefix_filter_equals_exact_all_pairs(spark):
    """Prefix filtering is EXACT: its output must equal brute-force
    all-pairs Jaccard thresholding on the fixture corpus."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.prefix_filter_near_duplicates(docs, threshold=0.7).collect()
    }
    sh = dedup.with_shingle_set(docs)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.7)
    )
    expected = {(r["id_a"], r["id_b"], r["jaccard"]) for r in brute.collect()}
    assert got == expected
    assert expected, "fixture must contain at least one true near-dup pair"


def test_prefix_filter_candidates_subquadratic(spark):
    """The rare-first prefix keeps candidate volume far below n^2/2."""
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.operators import dedup
    from mandoline_hbase_spark.operators.skew import spread_to_parallelism

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    feats = dedup.with_shingle_set(spread_to_parallelism(docs, "doc_id"))
    exploded = feats.select(
        F.col("doc_id"), F.size("sh").alias("_n"), F.explode("sh").alias("shingle")
    )
    dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("shingle").asc())
    prefix = (
        exploded.join(dfreq, "shingle")
        .withColumn("_pos", F.row_number().over(w))
        .filter(F.col("_pos") <= F.col("_n") - F.floor(F.lit(0.7) * F.col("_n")) + F.lit(1))
        .select("doc_id", "shingle")
    )
    cands = dedup.banded_candidate_pairs(prefix, "doc_id", keys=("shingle",))
    assert cands.count() < (n * (n - 1) // 2) * 0.25


def test_prefix_filter_property_random_corpora(spark):
    """Property: prefix filtering equals brute-force all-pairs Jaccard
    thresholding on random corpora — the 100%-recall claim, randomized."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from mandoline_hbase_spark.operators import dedup

    vocab = ["aa", "bb", "cc", "dd"]
    doc = st.lists(st.sampled_from(vocab), min_size=3, max_size=10).map(" ".join)
    corpora = st.lists(doc, min_size=2, max_size=7)

    @settings(max_examples=8, deadline=None)
    @given(texts=corpora, thr=st.sampled_from([0.5, 0.7]))
    def check(texts, thr):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
               dedup.prefix_filter_near_duplicates(df, threshold=thr).collect()}
        sh = dedup.with_shingle_set(df)
        a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
        brute = (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn(
                "jaccard",
                F.round(
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")),
                    4,
                ),
            )
            .filter(F.col("jaccard") >= thr)
        )
        expected = {(r["id_a"], r["id_b"], r["jaccard"]) for r in brute.collect()}
        assert got == expected

    check()


def test_n_hot_signal_fires_on_forced_hot_corpus(spark):
    """The guard's activation is machine-visible: stats['n_hot'] counts
    degraded buckets, so EXACT-contract narrowing is observable at
    runtime rather than only documented."""
    hot = [(i, 0, 7) for i in range(40)]  # one bucket over the cap
    cold = [(i, 1, 9) for i in (100, 101, 102)]
    stats: dict = {}
    out = dedup.banded_candidate_pairs(
        _stacked(spark, hot + cold), "doc_id", max_bucket_size=10, stats=stats
    )
    out.count()
    assert stats["n_hot"] == 1

    # healthy corpus: the signal is zero and the pair set is the exact one
    stats2: dict = {}
    dedup.banded_candidate_pairs(
        _stacked(spark, cold), "doc_id", max_bucket_size=10, stats=stats2
    ).count()
    assert stats2["n_hot"] == 0


def test_n_hot_propagates_through_prefix_filter(spark):
    """prefix_filter_near_duplicates surfaces the same signal: zero on a
    healthy corpus, positive when a tiny cap forces degradation."""
    docs = [
        (i, f"unique{i} document number {i} talks about topic{i} only")
        for i in range(6)
    ] + [(100 + i, "shared boilerplate text repeated across many documents here") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    healthy: dict = {}
    dedup.prefix_filter_near_duplicates(df, threshold=0.7, stats=healthy).count()
    assert healthy["n_hot"] == 0
    forced: dict = {}
    dedup.prefix_filter_near_duplicates(
        df, threshold=0.7, max_bucket_size=2, stats=forced
    ).count()
    assert forced["n_hot"] >= 1


def test_containment_prefix_equals_brute_force(spark):
    """The asymmetric prefix scale path must equal the cross-join form
    UNCONDITIONALLY (provable coverage, not LSH probability)."""
    from mandoline_hbase_spark.operators import dedup
    from mandoline_hbase_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    brute = sorted(map(tuple, dedup.containment_pairs(docs, threshold=0.8).collect()))
    fast = sorted(
        map(tuple, dedup.containment_prefix_pairs(docs, threshold=0.8).collect())
    )
    assert brute == fast and brute  # non-trivial on the fixture


def test_containment_prefix_planted_embedding(spark):
    """A short doc quoted inside a much longer one: containment ~1 while
    Jaccard is low - the pair the asymmetric path exists to find."""
    from mandoline_hbase_spark.operators import dedup

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated content here now")],
        "doc_id bigint, text string",
    )
    out = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_prefix_pairs(docs, threshold=0.8).collect()
    }
    assert (1, 2) in out and out[(1, 2)] >= 0.99
    assert (2, 1) not in out  # the long doc is NOT contained in the short


def test_containment_prefix_hot_guard_observable(spark):
    """Capping postings per shingle degrades recall hub-relatively and
    reports the number of capped shingles via stats."""
    from mandoline_hbase_spark.operators import dedup

    base = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(i, base) for i in range(1, 7)], "doc_id bigint, text string"
    )
    stats: dict = {}
    out = dedup.containment_prefix_pairs(
        docs, threshold=0.8, max_postings_per_shingle=3, stats=stats
    ).collect()
    assert stats["n_hot"] > 0  # every shingle appears in 6 > 3 docs
    got = {(r.id_a, r.id_b) for r in out}
    # postings keep ids 1..3 per shingle: pairs among {1,2,3} survive in
    # both directions, and higher ids still reach 1..3 as the A side
    assert {(1, 2), (2, 1), (4, 1), (5, 1), (6, 1)} <= got
    unguarded = {
        (r.id_a, r.id_b)
        for r in dedup.containment_prefix_pairs(docs, threshold=0.8).collect()
    }
    assert len(unguarded) == 30  # all ordered pairs of 6 identical docs
    assert got < unguarded  # guard is a strict, observable narrowing


def test_minhash_signature_producers_self_consistent(spark):
    """Round 10 (VERDICT r9 #1): the Arrow scale producer
    (``minhash_signatures``) and the JVM one-pass form
    (``doc_shingle_features``) are documented as DIFFERENT hash
    families — each must be deterministic and self-consistent
    (identical docs -> identical sigs; distinct docs -> distinct sigs;
    empty/short docs still sign), and no code path may compare values
    across the two (consumers are pinned split in the docstring)."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
            (3, ""),  # empty -> [""] token
            (4, "one two"),  # shorter than shingle_n -> one clamped window
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id bigint, text string",
    )
    for producer in (
        lambda d: dedup.minhash_signatures(d, num_hashes=16),
        lambda d: dedup.doc_shingle_features(d, num_hashes=16).select("doc_id", "sig"),
    ):
        a = {r.doc_id: list(r.sig) for r in producer(df).collect()}
        b = {r.doc_id: list(r.sig) for r in producer(df).collect()}
        assert a == b  # deterministic across runs
        assert len(a) == 5
        assert all(len(v) == 16 for v in a.values())
        assert a[1] == a[5] and a[1] != a[2]  # same text <-> same sig
        assert a[3] != a[4]  # empty and short docs sign, distinctly


def test_arrow_kernel_tokenization_parity_with_jvm(spark):
    """The Arrow kernels (minhash_signatures, with_shingle_hash_set)
    must tokenize EXACTLY like tokens_col (Java trim + ASCII-only \\s):
    the J_hash >= J_string merge argument needs the hashed keys and the
    string-shingle verify to see the same token stream. Pin parity on
    adversarial whitespace: unicode NBSP (a Java \\s non-match), tabs,
    control chars, all-whitespace and empty texts."""
    df = spark.createDataFrame(
        [
            (1, "plain three token doc"),
            (2, "nbsp stays one token here ok"),
            (3, "tabs\tand\nnewlines   collapse fine ok"),
            (4, "   "),
            (5, ""),
            (6, " ideographic em-space edges stay tokens"),
            (7, "ctrl\x01char kept inside token ok"),
        ],
        "doc_id bigint, text string",
    )
    jvm_sizes = {
        r.doc_id: r.n
        for r in dedup.with_shingle_set(df, 3)
        .select("doc_id", F.size("sh").alias("n"))
        .collect()
    }
    arrow_sizes = {
        r.doc_id: r.n
        for r in dedup.with_shingle_hash_set(df, 3)
        .select("doc_id", F.size("shh").alias("n"))
        .collect()
    }
    # distinct string shingles and distinct hashed keys count the same
    # positions (hash collisions within a 20-shingle doc: ~2^-60)
    assert arrow_sizes == jvm_sizes, (arrow_sizes, jvm_sizes)
    # and the signature producer sees the same stream: same-token-stream
    # docs (modulo whitespace runs) must produce IDENTICAL signatures
    df2 = spark.createDataFrame(
        [(1, "a b c d"), (2, "  a\tb\nc   d "), (3, "a b c d")],
        "doc_id bigint, text string",
    )
    sigs = {r.doc_id: list(r.sig) for r in dedup.minhash_signatures(df2, 16).collect()}
    assert sigs[1] == sigs[2]  # whitespace-run/trim variants: same tokens
    assert sigs[1] != sigs[3]  # NBSP glues tokens -> different stream


def test_unbounded_cap_short_circuit_matches_guarded_path(spark):
    """r11 session 2: max_bucket_size >= 2^31-1 declares the guard OFF
    (the oracle-anchor configs), so the hot-bucket sizing job is
    skipped outright — the pair set must still equal the guarded
    path's, stats must certify n_hot == 0, and pair_filter must still
    engage (an unbounded cap means every bucket is cold by
    construction, exactly the all-cold condition the filter needs)."""
    rows = [(i, 0, 100) for i in range(6)] + [(i, 1, 200) for i in (10, 11, 12)]
    st = _stacked(spark, rows)
    stats = {}
    fast = {
        (r.id_a, r.id_b)
        for r in dedup.banded_candidate_pairs(
            st, "doc_id", max_bucket_size=2**31 - 1, stats=stats
        ).collect()
    }
    slow = {
        (r.id_a, r.id_b)
        for r in dedup.banded_candidate_pairs(
            st, "doc_id", max_bucket_size=512
        ).collect()
    }
    assert fast == slow
    assert stats["n_hot"] == 0

    def reject_all(A, B):
        return F.lit(False)

    filtered = dedup.banded_candidate_pairs(
        st, "doc_id", max_bucket_size=2**31 - 1,
        payload=(), pair_filter=reject_all,
    )
    assert filtered.count() == 0  # the filter really ran on the fast path
