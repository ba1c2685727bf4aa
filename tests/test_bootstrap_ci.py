"""Poisson-bootstrap CI: reference match, resample-drop path, validation."""

from __future__ import annotations

import hashlib
import math

import pytest

from tfx_addons_feast_examplegen_spark.operators.stats import (
    _POISSON1_CDF,
    bootstrap_metric_ci,
)


def _weight(key: str, rep: int, salt: str) -> int:
    u = (
        int(
            hashlib.md5(f"{key}\x1f{rep}\x1f{salt}".encode()).hexdigest()[:13],
            16,
        )
        + 0.5
    ) / 2**52
    for k, c in enumerate(_POISSON1_CDF):
        if u < c:
            return k
    return len(_POISSON1_CDF)


def _ref(rows, B, level, salt):
    groups: dict = {}
    for i, g, v in rows:
        groups.setdefault(g, []).append((i, v))
    out = {}
    for g, vals in groups.items():
        ms = []
        for rep in range(B):
            s = sum(_weight(str(i), rep, salt) * v for i, v in vals)
            n = sum(_weight(str(i), rep, salt) for i, v in vals)
            if n > 0:
                ms.append(s / n)
        ms.sort()
        nr = len(ms)
        lo = round(ms[max(math.ceil((1 - level) / 2 * nr), 1) - 1], 4)
        hi = round(ms[max(math.ceil((1 + level) / 2 * nr), 1) - 1], 4)
        point = round(sum(v for _, v in vals) / len(vals), 4)
        out[g] = (point, lo, hi, nr)
    return out


def test_matches_reference(spark):
    rows = [(i, "A" if i % 2 == 0 else "B", (i * 37) % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    got = {
        r.g: (r.point, r.ci_lo, r.ci_hi, r.n_replicates)
        for r in bootstrap_metric_ci(
            df, "v", "id", group_cols=["g"], replicates=50, level=0.9,
            salt="t",
        ).collect()
    }
    assert got == _ref(rows, 50, 0.9, "t")


def test_interval_brackets_point_on_real_data(spark):
    rows = [(i, "g", 100 + (i * 13) % 50) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    r = bootstrap_metric_ci(
        df, "v", "id", group_cols=["g"], replicates=100
    ).collect()[0]
    assert r.ci_lo <= r.point <= r.ci_hi
    assert r.n_replicates == 100


def test_singleton_group_drops_empty_resamples(spark):
    # one row: each replicate keeps it with prob 1 - e^-1 ~ 0.63; the
    # empty ones must vanish from the percentile basis, and every
    # surviving replicate mean equals the value itself
    df = spark.createDataFrame([(1, "g", 42)], ["id", "g", "v"])
    r = bootstrap_metric_ci(
        df, "v", "id", group_cols=["g"], replicates=100, salt="s"
    ).collect()[0]
    assert 0 < r.n_replicates < 100
    assert r.ci_lo == r.ci_hi == r.point == 42.0


def test_ungrouped_mode(spark):
    rows = [(i, i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = bootstrap_metric_ci(df, "v", "id", replicates=40).collect()
    assert len(out) == 1
    assert out[0].ci_lo <= out[0].point <= out[0].ci_hi
    assert list(out[0].asDict()) == ["point", "ci_lo", "ci_hi", "n_replicates"]


def test_validation(spark):
    df = spark.createDataFrame([(1, 1)], ["id", "v"])
    with pytest.raises(ValueError, match="replicates"):
        bootstrap_metric_ci(df, "v", "id", replicates=1)
    with pytest.raises(ValueError, match="level"):
        bootstrap_metric_ci(df, "v", "id", level=1.0)
