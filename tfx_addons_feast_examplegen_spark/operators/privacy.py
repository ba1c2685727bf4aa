"""Privacy / data-governance operators: k-anonymity, DP noisy counts.

Training-data pipelines release corpus statistics (data cards, mixture
reports) and ship quasi-identifier columns; these operators cover the
two standard governance primitives over them:

- :func:`k_anonymity_audit` — per-equivalence-class size audit (Sweeney
  2002) with optional l-diversity (Machanavajjhala et al. 2007) of a
  sensitive attribute.
- :func:`suppress_small_groups` — generalization-by-suppression: null
  the quasi-identifiers of rows whose equivalence class is below ``k``.
- :func:`dp_noisy_counts` — differentially-private group counts via the
  Laplace mechanism (Dwork et al. 2006), with DETERMINISTIC noise drawn
  from a hash-derived uniform so the release replays exactly across
  engines and retries (the same fingerprint-noise trick as the DSIR
  Gumbel sampler in :mod:`.dsir`).

Reference parity: the reference (BACtaki/tfx-addons-feast-examplegen)
delegates all statistics to its warehouse and ships no privacy surface;
these are north-star extensions for the corpus-governance side of a
large-scale pipeline.

Scale notes: every operator here is ONE map-side-combinable hash
aggregate over the grouping keys (plus, for suppression, a broadcast
join of the tiny under-k group frame back onto the rows). Nothing
shuffles row-level data except that broadcast-pruned join; no windows,
no UDFs — noise is a closed-form expression over md5, portable to any
ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity_audit",
    "suppress_small_groups",
    "dp_noisy_counts",
]

# 52 random mantissa bits (13 hex chars of md5) -> uniform on (0, 1).
# The +0.5 offset keeps u strictly inside the open interval so
# ln(1 - 2|u - 1/2|) is finite for every input.
_UNIFORM_DENOM = float(1 << 52)


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """Per-equivalence-class k-anonymity (and optional l-diversity) audit.

    Groups rows by the quasi-identifier columns and reports, per
    equivalence class: its size ``n``, ``is_k_anonymous`` (n >= k), and
    — when ``sensitive_col`` is given — ``l_diversity`` (count of
    DISTINCT sensitive values in the class) plus ``is_l_diverse``
    (l_diversity >= l, default l = k). A released table is k-anonymous
    iff every class passes; the caller filters or aggregates as needed.

    One hash aggregate; ``count(DISTINCT x)`` expands to the standard
    two-phase distinct aggregate — both phases partial-aggregate
    map-side, so the shuffle carries one row per (class, distinct
    sensitive value), never the data.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    aggs = [
        F.count(F.lit(1)).alias("n"),
    ]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("l_diversity"))
    out = df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)
    out = out.withColumn("is_k_anonymous", F.col("n") >= F.lit(k))
    if sensitive_col is not None:
        l_eff = k if l is None else l
        if l_eff < 1:
            raise ValueError(f"l must be >= 1: {l_eff}")
        out = out.withColumn(
            "is_l_diverse", F.col("l_diversity") >= F.lit(l_eff)
        )
    return out


def suppress_small_groups(
    df: DataFrame,
    qi_cols: list[str],
    *,
    k: int = 5,
) -> DataFrame:
    """Null the quasi-identifiers of rows in equivalence classes < ``k``.

    The minimal generalization step: rows whose QI combination occurs
    fewer than ``k`` times get every QI column replaced with NULL (full
    suppression), making the released table k-anonymous over the
    remaining (non-NULL) classes. Row count and non-QI columns are
    untouched.

    Plan: the under-k class frame comes from the same one-pass count
    aggregate as the audit — it is small by construction (each class
    has < k rows; the frame is bounded by n/1, in practice tiny) and is
    BROADCAST left-joined back; a match flips the QI columns to NULL.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    small = (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") < k)
        .select(
            *[F.col(c).alias(f"__qi_{c}") for c in qi_cols],
            F.lit(True).alias("__suppress"),
        )
    )
    cond = F.lit(True)
    for c in qi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__qi_{c}"))
    qi = set(qi_cols)
    sel = [
        F.when(F.col("__suppress").isNull(), F.col(c)).alias(c)
        if c in qi
        else F.col(c)
        for c in df.columns
    ]
    return df.join(F.broadcast(small), cond, "left").select(*sel)


def _laplace_noise(group_cols: list[str], *, scale: float, salt: str) -> Column:
    """Deterministic Laplace(0, scale) noise keyed by the group values.

    Inverse-CDF over a hash-derived uniform: with u ~ U(0,1),
    ``-scale * sign(u - 1/2) * ln(1 - 2|u - 1/2|)`` is Laplace(0,
    scale). u comes from the first 13 hex chars (52 bits) of
    ``md5(group key || salt)`` — a fresh salt is a fresh draw, the same
    salt replays exactly (idempotent re-runs, external verification).
    The md5 arithmetic and ln are ANSI-portable.
    """
    # unit-separated so ("ab","c") and ("a","bc") never collide
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in group_cols], F.lit(salt)
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(_UNIFORM_DENOM)
    centered = u - F.lit(0.5)
    return (
        -F.lit(scale)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    *,
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Differentially-private group counts (Laplace mechanism).

    Releases ``count(*)`` per group with Laplace(0, 1/epsilon) noise —
    epsilon-DP for count queries under add/remove-one adjacency
    PROVIDED each individual contributes at most one row (the caller's
    contract; pre-aggregate or cap contributions otherwise). The noise
    is a deterministic function of (group key, salt): re-running the
    release reproduces it bit-for-bit, and an external engine can
    replay the exact draw — the property a verifiable data-card release
    needs. True one-shot privacy accounting treats the salt as the
    release id: one salt, one epsilon spend; re-releasing under a new
    salt is a NEW draw and composes additively.

    SALT SECRECY IS THE GUARANTEE. Because the noise is a pure
    function of (group key, salt), anyone who knows the salt can
    recompute the noise and subtract it, recovering the exact counts —
    the epsilon-DP claim holds only as COMPUTATIONAL DP over the salt:
    the salt must be a secret, uniformly random, single-use value
    (generated per release, stored like a key, never committed to a
    repo or reused across releases). A public, guessable, or reused
    salt yields NO privacy — the release degrades to exact counts with
    reversible decoration. The registry/oracle entry hardcodes a salt
    only because it demonstrates replay determinism, not privacy.

    Output: group columns + ``noisy_count`` (rounded to 4 decimals; the
    raw count is deliberately NOT in the output — including it would
    defeat the release).

    One map-side-combinable aggregate; the noise expression is a pure
    scalar chain over the group key, evaluated post-aggregation on one
    row per group.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    noise = _laplace_noise(group_cols, scale=1.0 / epsilon, salt=salt)
    return (
        df.groupBy(*[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            *group_cols,
            F.round(F.col("__n") + noise, 4).alias("noisy_count"),
        )
    )


def pseudonymize_key(col: Column | str, *, salt: str, bits: int = 60) -> Column:
    """Deterministic keyed surrogate for an identifier column.

    ``md5(salt || key)`` folded to ``bits`` (default 60 — the repo's
    portable-hash width): the same (key, salt) always maps to the same
    surrogate, so REFERENTIAL INTEGRITY survives across every table
    pseudonymized with the same salt, while reversing requires the
    salt (keep it out of the released data). Collisions are
    ~n²/2^bits — vanishing for identifier cardinalities, and
    deterministic if they ever occur.

    This is tokenization-style pseudonymization (GDPR Art. 4(5) — the
    data remains personal data WITH the salt; release the salt and
    it's just a rename), not anonymization: combine with
    :func:`suppress_small_groups` / :func:`dp_noisy_counts` for the
    released aggregates.
    """
    c = F.col(col) if isinstance(col, str) else col
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in [1, 60]: {bits}")
    hexed = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 15)
    full = F.conv(hexed, 16, 10).cast("bigint")
    return (full % F.lit(1 << bits)).alias("pseudo_key")


def pseudonymize_tables(
    tables: dict[str, tuple[DataFrame, str]],
    *,
    salt: str,
    bits: int = 60,
    out_col: str | None = None,
) -> dict[str, DataFrame]:
    """Consistently pseudonymize one identifier across many tables.

    ``tables`` maps a name to (frame, key column); every frame gets its
    key column REPLACED by the keyed surrogate (same salt ⇒ same
    mapping ⇒ joins between the released tables still line up; the
    registry entry proves it with an FK-integrity audit before/after).
    Pure projection — no shuffle, no UDF; the surrogate computes inside
    whole-stage codegen during whatever scan reads the table.
    """
    out = {}
    for name, (df, key_col) in tables.items():
        surrogate = pseudonymize_key(key_col, salt=salt, bits=bits)
        target = out_col or key_col
        cols = [
            surrogate.alias(target) if c == key_col else F.col(c)
            for c in df.columns
        ]
        out[name] = df.select(*cols)
    return out
