"""linreg_train_gd: exact replay vs a pure-Python GD model, contracts.

The operator's claim is bit-exact engine portability: integer
features/weights and a short fixed double sequence per update. So the
test model is an INDEPENDENT pure-Python implementation of the same
spec — any drift in the aggregate, the update order, or the rounding
shows up as integer weight mismatch, not a tolerance blur.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.linmodel import (
    linreg_train_gd,
)


def _model(rows, d, rounds, lr, scale):
    """Pure-Python replay: rows = [(x_1..x_d, y)] with implicit x0=1."""
    n = len(rows)
    w = [0] * (d + 1)
    for _ in range(rounds):
        grads = [0] * (d + 1)
        for r in rows:
            xs = (1,) + tuple(r[:-1])
            y = r[-1]
            rnum = sum(wj * xj for wj, xj in zip(w, xs)) - y * scale
            for j, xj in enumerate(xs):
                grads[j] += xj * rnum
        w = [
            int(math.floor(wj - lr * (float(g) / n) + 0.5))
            for wj, g in zip(w, grads)
        ]
    ss = 0
    for r in rows:
        xs = (1,) + tuple(r[:-1])
        rnum = sum(wj * xj for wj, xj in zip(w, xs)) - r[-1] * scale
        ss += rnum * rnum
    return w, float(ss) / (float(n) * float(scale) * float(scale))


def test_weights_match_python_model_bit_exact(spark):
    rng = random.Random(5)
    # y ~ 3*x1 - 2*x2 + 40 + noise, integer features
    rows = []
    for _ in range(400):
        x1 = rng.randrange(0, 30)
        x2 = rng.randrange(0, 20)
        y = 3 * x1 - 2 * x2 + 40 + rng.randrange(-5, 6)
        rows.append((x1, x2, y))
    df = spark.createDataFrame(rows, "x1 int, x2 int, y int")
    got = linreg_train_gd(
        df, ["x1", "x2"], "y", rounds=4, lr=1e-3, scale=10**9
    ).collect()[0]
    w, mse = _model(rows, 2, 4, 1e-3, 10**9)
    assert [
        got["wnum_intercept"], got["wnum_x1"], got["wnum_x2"]
    ] == w
    assert got["mse"] == mse
    assert got["n_rows"] == 400
    # and the fit actually moved: w_x1 heads toward the generator's +3
    # (w_x2 starts POSITIVE in early GD — E[x2*y] > 0 before the
    # intercept is learned — so only the dominant direction is pinned)
    assert got["w_x1"] > 0


def test_more_rounds_do_not_increase_mse(spark):
    rng = random.Random(9)
    rows = [
        (x, 5 * x + 7 + rng.randrange(-2, 3))
        for x in (rng.randrange(0, 40) for _ in range(300))
    ]
    df = spark.createDataFrame(rows, "x int, y int")
    mses = [
        linreg_train_gd(df, ["x"], "y", rounds=r, lr=5e-4)
        .collect()[0]["mse"]
        for r in (1, 3, 6)
    ]
    assert mses[0] >= mses[1] >= mses[2]


def test_contracts_raise(spark):
    from pyspark.errors import PySparkException

    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError, match="rounds"):
        linreg_train_gd(df, ["x"], "y", rounds=0)
    with pytest.raises(ValueError, match="non-empty"):
        linreg_train_gd(df, [], "y")
    with pytest.raises(ValueError, match="lr"):
        linreg_train_gd(df, ["x"], "y", lr=0.0)
    with pytest.raises(ValueError, match="not in"):
        linreg_train_gd(df, ["zz"], "y")
    fdf = spark.createDataFrame([(1.5, 2)], "x double, y int")
    with pytest.raises(ValueError, match="integer-typed"):
        linreg_train_gd(fdf, ["x"], "y")
    with pytest.raises(ValueError, match="MAX_FEATURES"):
        linreg_train_gd(df, ["x"] * 70, "y")
    empty = spark.createDataFrame([], "x int, y int")
    with pytest.raises(ValueError, match="empty input"):
        linreg_train_gd(empty, ["x"], "y")
    nulls = spark.createDataFrame([(1, 2), (None, 3)], "x int, y int")
    with pytest.raises(PySparkException, match="NULL in a training column"):
        linreg_train_gd(nulls, ["x"], "y").collect()
