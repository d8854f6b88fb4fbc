"""Governance operators: column masking / pseudonymization views.

Fine-grained access control on a lake engine reduces to *views* that
mask, pseudonymize, or drop columns and filter rows before the data
leaves the scan (Lakeguard-style policy enforcement, PAPERS.md). All
transforms are deterministic column expressions, so policies compose
with Catalyst: filters still push down, masked columns still prune, and
the view costs nothing beyond the expressions themselves.

Pseudonymization uses salted SHA-256 — deterministic (joins across
tables on the pseudonym still work) but unlinkable to the raw id
without the salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pseudonymize(col: str | Column, salt: str) -> Column:
    """Salted SHA-256 pseudonym of a column (cast to string first)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(salt), c.cast("string")), 256)


def mask_tail(col: str | Column, keep: int = 2, mask_char: str = "*") -> Column:
    """Keep the first ``keep`` characters, mask the rest to fixed '***'
    plus length (format-revealing masks leak less than they seem, so the
    mask is fixed-width: ``ab***``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.substring(c.cast("string"), 1, keep), F.lit(mask_char * 3))


def masked_view(
    df: DataFrame,
    pseudonym_cols: dict[str, str] | None = None,
    mask_cols: tuple[str, ...] = (),
    drop_cols: tuple[str, ...] = (),
    row_filter: Column | None = None,
) -> DataFrame:
    """Build a policy view: pseudonymize ``pseudonym_cols`` (col -> salt),
    mask ``mask_cols`` to prefix+***, drop ``drop_cols``, and apply
    ``row_filter`` BEFORE any projection so it can push to the scan.
    """
    out = df
    if row_filter is not None:
        out = out.filter(row_filter)
    for c, salt in (pseudonym_cols or {}).items():
        out = out.withColumn(c, pseudonymize(c, salt))
    for c in mask_cols:
        out = out.withColumn(c, mask_tail(c))
    if drop_cols:
        out = out.drop(*drop_cols)
    return out


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_distinct: int = 3,
) -> DataFrame:
    """Per-equivalence-class re-identification risk report: group on the
    quasi-identifier columns and flag classes violating k-anonymity
    (fewer than ``k`` rows — an attacker joining on the quasi-identifiers
    narrows a target to <k candidates) and l-diversity (fewer than
    ``l_distinct`` distinct sensitive values — even a k-sized class
    leaks when everyone shares the sensitive attribute; Machanavajjhala
    et al. 2007).

    The release gate a governed lake needs BEFORE a masked view ships:
    ``masked_view`` enforces column policy, this measures whether the
    surviving quasi-identifiers still re-identify. One aggregation: the
    exact distinct is the standard two-level (quasi, sensitive)-grain
    combine, so the shuffle is bounded by class-count x sensitive
    cardinality, never raw rows twice.

    Output: one row per equivalence class —
    ``(*quasi_cols, n_rows, n_sensitive, k_anonymous, l_diverse)``.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "n_rows",
            "n_sensitive",
            (F.col("n_rows") >= int(k)).alias("k_anonymous"),
            (F.col("n_sensitive") >= int(l_distinct)).alias("l_diverse"),
        )
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    *,
    epsilon: float = 1.0,
    salt: str = "dp-release",
) -> DataFrame:
    """Seeded-Laplace differentially-private count release.

    Per equivalence class, ``count + Laplace(1/epsilon)`` — the standard
    eps-DP counting mechanism — with the noise DERANDOMIZED: two
    uniforms are derived from md5 over the class key + salt, and
    ``ln(u1/u2)`` (difference of two exponentials) is exactly
    Laplace(1)-distributed across classes. Derandomization is the
    reproducible-release trade: the same table + salt always publishes
    the same numbers (auditable, replayable at 100 TB), at the cost
    that the salt must be secret and NEVER reused for a second release
    of the same classes (reuse degrades the privacy guarantee exactly
    like publishing twice at half the budget).

    Mechanically: u = (hex32(md5(key)) + 0.5) / 2^32 lies strictly in
    (0,1); noise = ln(u1/u2)/epsilon. Everything is a map-side
    expression after one count shuffle — class-grain, corpus-linear.
    """
    # NULL class keys still get noise: concat_ws would silently SKIP a
    # NULL column (so `(NULL, 'x')` and `('x',)` could collide, and a
    # `||`-style oracle would propagate NULL into md5 and emit a NULL
    # release). A bare sentinel string is NOT enough — a real value
    # equal to the sentinel would draw the same noise as the NULL class
    # (correlated noise across releases weakens the DP argument, ADVICE
    # r9 #5) — so each column is ESCAPED: backslash then the '|'
    # separator are backslash-escaped inside the value, every non-null
    # value is prefixed 'v', and the single unprefixed token 'n' is
    # reserved for NULL. The mapping column-tuple -> key string is then
    # injective; oracles mirror the same escaping.
    def _keyed(c: str) -> Column:
        esc = F.replace(
            F.replace(F.col(c).cast("string"), F.lit("\\"), F.lit("\\\\")),
            F.lit("|"),
            F.lit("\\|"),
        )
        return F.coalesce(F.concat(F.lit("v"), esc), F.lit("n"))

    key = F.concat_ws("|", *[_keyed(c) for c in group_cols])
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )

    def _uniform(tag: str) -> Column:
        h = F.substring(F.md5(F.concat(key, F.lit(f":{salt}:{tag}"))), 1, 8)
        return (F.conv(h, 16, 10).cast("bigint") + F.lit(0.5)) / F.lit(
            4294967296.0
        )

    noise = F.ln(_uniform("u1") / _uniform("u2")) / F.lit(float(epsilon))
    return counts.select(
        *group_cols,
        F.round(F.col("n_true") + noise, 4).alias("noisy_count"),
        F.lit(float(epsilon)).alias("epsilon"),
    ).orderBy(*group_cols)
