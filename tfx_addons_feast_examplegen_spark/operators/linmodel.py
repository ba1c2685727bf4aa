"""Distributed linear-model training by gradient descent — the
iterative-optimizer shape (quality/filter scorer fitting) at corpus
scale, engine-portable to the bit.

A curation pipeline that scores documents with a linear probe
(:func:`..similarity.linear_score` is the inference side) needs the
TRAINING side too: fit ``w`` minimizing ``mean((w . x - y)^2)`` over a
corpus that does not fit anywhere. Batch gradient descent is the
canonical distributed shape: each round is ONE map-side-combinable
aggregate (``d`` sums), the driver holds ``O(d)`` scalars, and the
updated weights re-enter the next round's plan as literals — no
broadcast join, no per-row Python, no state larger than the model.

Exact-integer portability (the repo's integer-portable idiom, cf.
``text.bigram_logprob``): features and target must be INTEGERS
(integerize to cents/micros first — the caller owns the fixed-point
choice), and weights are carried as integer numerators over a fixed
``scale`` denominator. The per-row residual numerator

    rnum = sum_j w_num_j * x_j - y * scale        (exact integer)

makes each gradient sum ``sum(x_j * rnum)`` an exact integer
(accumulated in ``decimal(38,0)`` so 100 TB sums cannot silently wrap —
overflow raises), and the weight update

    w_num_j <- floor(w_num_j - lr * (g_j / n) + 0.5)

is a short, fully-parenthesized double sequence (int->double conversion,
one divide, one multiply, one subtract, floor-half-up) that any IEEE-754
engine replays bit-for-bit. An external SQL engine unrolling the same
rounds as CTEs lands on the SAME integer weights every round — the
oracle contract.

Scale shape per round: one scan, one ``d``-column partial aggregate,
one 1-row reduce, ``O(d)`` driver scalars. Total: ``rounds`` scans (the
input should be cached/checkpointed by the caller for multi-round runs
over expensive upstreams). Final MSE is one more aggregate with the
final weights as literals.

Reference scope: the reference delegates all execution to BigQuery and
has no training surface (feast_component/executor.py:87-163); part of
the SURVEY.md §2.9 scale extension inventory.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
MAX_FEATURES = 64


def linreg_train_gd(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    *,
    rounds: int = 3,
    lr: float = 5e-4,
    scale: int = 10**9,
    fit_intercept: bool = True,
) -> DataFrame:
    """Fit ``y ~ w . x`` by ``rounds`` of batch gradient descent and
    return a ONE-ROW DataFrame: per feature ``wnum_<col>`` (the exact
    integer weight numerator) and ``w_<col>`` (``wnum/scale``), plus
    ``mse`` (mean squared residual of the FINAL weights) and
    ``n_rows``.

    Features and target must be integer-typed (fixed-point encode
    first); ``fit_intercept`` adds an implicit all-ones feature named
    ``intercept``. NULLs in any used column raise LOUD in-plan (a NULL
    silently shrinking the gradient is the classic quiet-bias bug).
    ``lr`` must keep ``lr * largest eigenvalue of X'X/n < 2`` for
    convergence — divergence is the caller's hyperparameter problem,
    but the integer weights stay exact either way.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1: {rounds}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if lr <= 0.0:
        raise ValueError(f"lr must be > 0: {lr}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1: {scale}")
    n_feat = len(feature_cols) + (1 if fit_intercept else 0)
    if n_feat > MAX_FEATURES:
        raise ValueError(
            f"{n_feat} features exceed MAX_FEATURES={MAX_FEATURES}: the "
            "codegen'd gradient expression is O(d^2) terms — reduce "
            "dimensionality or raise the cap deliberately"
        )
    dtypes = dict(df.dtypes)
    for c in [*feature_cols, target_col]:
        t = dtypes.get(c)
        if t is None:
            raise ValueError(f"column {c!r} not in {df.columns}")
        if t not in _INT_TYPES:
            raise ValueError(
                f"{c!r} must be integer-typed for exact-integer GD "
                f"(fixed-point encode first): {c}:{t}"
            )

    names = (["intercept"] if fit_intercept else []) + list(feature_cols)

    def feat_exprs():
        xs = []
        if fit_intercept:
            xs.append(F.lit(1).cast("bigint"))
        for c in feature_cols:
            xs.append(F.col(c).cast("bigint"))
        return xs

    # LOUD NULL contract on the columns the gradient consumes
    null_any = None
    for c in [*feature_cols, target_col]:
        t = F.col(c).isNull()
        null_any = t if null_any is None else (null_any | t)
    y_checked = F.when(
        null_any,
        F.raise_error(
            F.format_string(
                "linreg_train_gd: NULL in a training column "
                "(features=%s target=%s must be non-NULL)",
                F.lit(",".join(feature_cols)),
                F.lit(target_col),
            )
        ).cast("bigint"),
    ).otherwise(F.col(target_col).cast("bigint"))

    n_total = df.count()
    if n_total == 0:
        raise ValueError("linreg_train_gd: empty input")

    w = [0] * n_feat  # integer numerators over `scale`
    for _ in range(rounds):
        xs = feat_exprs()
        rnum = (-y_checked) * F.lit(scale).cast("bigint")
        for wj, xj in zip(w, xs):
            rnum = rnum + F.lit(wj).cast("bigint") * xj
        # exact-integer gradient sums; decimal(38,0) so corpus-scale
        # sums raise on overflow instead of wrapping
        aggs = [
            F.sum((xj.cast("decimal(38,0)") * rnum).cast("decimal(38,0)"))
            .alias(f"g{j}")
            for j, xj in enumerate(xs)
        ]
        grads = df.agg(*aggs).collect()[0]
        # the portable double sequence: int->double, /n, *lr, subtract,
        # floor-half-up — mirrored verbatim by the SQL oracle
        w = [
            int(math.floor(wj - lr * (float(grads[f"g{j}"]) / n_total) + 0.5))
            for j, wj in enumerate(w)
        ]

    # final MSE + emit: one more aggregate with the final weights as
    # literals; mse = float(sum(rnum^2)) / (float(n) * scale^2)
    xs = feat_exprs()
    rnum = (-y_checked) * F.lit(scale).cast("bigint")
    for wj, xj in zip(w, xs):
        rnum = rnum + F.lit(wj).cast("bigint") * xj
    rdec = rnum.cast("decimal(38,0)")
    out = df.agg(
        F.sum((rdec * rdec).cast("decimal(38,0)")).alias("__ss"),
        F.count(F.lit(1)).alias("__n"),
    )
    denom = F.col("__n").cast("double") * F.lit(float(scale) * float(scale))
    cols = []
    for name, wj in zip(names, w):
        cols.append(F.lit(wj).cast("bigint").alias(f"wnum_{name}"))
        cols.append(
            (F.lit(wj).cast("double") / F.lit(float(scale))).alias(f"w_{name}")
        )
    return out.select(
        *cols,
        (F.col("__ss").cast("double") / denom).alias("mse"),
        F.col("__n").cast("bigint").alias("n_rows"),
    )
