"""Semantic dedup (SemDeDup-style): hand-built vectors pin down the
exact suppression semantics — triangular earlier-order suppression,
centroid-sim ASC ordering, id tie-breaks, cluster-blindness — the
float-robust driver entry can't exercise on random fixture vectors."""

import math

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.semdedup import (
    semantic_dedup,
)


def _run(spark, rows, *, threshold, centroids, **kw):
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = semantic_dedup(
        df, threshold=threshold, centroids=centroids, **kw
    )
    return {r["vec_id"]: r for r in out.collect()}


def test_triangular_suppression_not_kept_only(spark):
    # Chain on the unit circle: angles 40, 20, 0 degrees vs centroid
    # [1,0]: sim(40,20)=sim(20,0)=cos20 >= t, sim(40,0)=cos40 < t.
    # Order by centroid_sim ASC: 40 first, then 20, then 0. The paper's
    # triangular rule suppresses 0 via the ALREADY-SUPPRESSED 20 — a
    # keep-only rule would keep it. This pins the implemented variant.
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    t = math.cos(math.radians(25))  # ~0.906
    got = _run(
        spark,
        [(0, v(0)), (1, v(20)), (2, v(40))],
        threshold=t,
        centroids=[[1.0, 0.0]],
    )
    assert {i: r["kept"] for i, r in got.items()} == {
        2: True,   # farthest from centroid — first in order, kept
        1: False,  # suppressed by 2 (cos20 >= t)
        0: False,  # suppressed by the suppressed 1 (triangular rule)
    }
    assert all(r["cluster"] == 0 for r in got.values())
    assert got[2]["centroid_sim"] == pytest.approx(math.cos(math.radians(40)))


def test_id_tiebreak_and_scaled_copies(spark):
    # Identical vectors tie on centroid_sim -> lowest id survives;
    # a positively scaled copy has cosine 1.0 and the same
    # centroid_sim, so it joins the same tie group.
    base = [0.6, 0.8]
    got = _run(
        spark,
        [(7, base), (3, base), (9, [x * 2 for x in base])],
        threshold=0.95,
        centroids=[[1.0, 0.0]],
    )
    assert {i: r["kept"] for i, r in got.items()} == {
        3: True, 7: False, 9: False
    }


def test_cluster_blindness_across_cells(spark):
    # A near-dup pair split across clusters is NOT suppressed — the
    # paper's within-cluster-only trade-off, stated and pinned. Two
    # orthogonal centroids; v near [1,0], its near-copy nudged past the
    # 45-degree boundary toward [0,1].
    got = _run(
        spark,
        [(1, [1.0, 0.2]), (2, [0.2, 1.0])],  # cos(v1,v2) ~ 0.38 — far
        threshold=0.3,
        centroids=[[1.0, 0.0], [0.0, 1.0]],
    )
    assert got[1]["cluster"] != got[2]["cluster"]
    assert got[1]["kept"] and got[2]["kept"]


def test_zero_vector_total_order(spark):
    # zero vectors get centroid_sim 0.0 (not NULL/NaN) and cosine 0 to
    # everything — always kept, never a suppressor
    got = _run(
        spark,
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        threshold=0.9,
        centroids=[[1.0, 0.0]],
    )
    assert got[1]["kept"] is True
    assert got[1]["centroid_sim"] == 0.0
    assert got[2]["kept"] is True and got[3]["kept"] is False


def test_cap_machinery_and_validation(spark):
    rows = [(i, [1.0, 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        semantic_dedup(
            df, threshold=0.9, centroids=[[1.0, 0.0]],
            max_cluster=5, on_over_cap="error",
        ).collect()
    # drop mode: the over-cap cluster produces no pairs -> all kept
    dropped = semantic_dedup(
        df, threshold=0.9, centroids=[[1.0, 0.0]],
        max_cluster=5, on_over_cap="drop",
    )
    assert all(r["kept"] for r in dropped.collect())
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, threshold=1.5, centroids=[[1.0, 0.0]])
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, threshold=0.0, centroids=[[1.0, 0.0]])
    with pytest.raises(ValueError, match="n_clusters"):
        semantic_dedup(df, threshold=0.9, n_clusters=0)


def test_idempotent_with_fixed_centroids(spark):
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(i, v(3 * i)) for i in range(20)]
    cents = [[1.0, 0.0]]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    first = semantic_dedup(df, threshold=0.99, centroids=cents)
    kept = first.where("kept").select("vec_id", "embedding")
    second = semantic_dedup(kept, threshold=0.99, centroids=cents)
    assert second.where(~F.col("kept")).count() == 0


def test_trained_quantizer_path(spark):
    # end-to-end with real spherical k-means training (no explicit
    # centroids): planted exact copies are suppressed regardless of
    # which cell the group lands in
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        v = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, v))
    rows += [(100 + i, list(rows[i][1])) for i in range(5)]  # copies
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, threshold=0.999, n_clusters=4, seed=7, refine_iters=2
        ).collect()
    }
    for i in range(5):
        assert out[i] is True and out[100 + i] is False
    assert sum(1 for k in out.values() if not k) == 5


# ---------------------------------------------------------------------
# Indexed (two-stage) assignment


def test_indexed_assignment_equals_exact_when_fully_probed(spark):
    import random

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_indexed,
        ivf_centroids,
    )

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    cents = ivf_centroids(df, n_cells=16, seed=5, refine_iters=1)
    exact = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(df, cents, n_probe=1).collect()
    }
    # fully probed (n_probe_super = n_super) must equal the flat scan
    full = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_indexed(
            df, cents, n_super=4, n_probe_super=4, n_probe=1
        ).collect()
    }
    assert full == exact
    # partial probing: a pure function of the vector (replay-stable),
    # mostly agreeing with exact on this easy fixture
    part = ivf_assign_indexed(df, cents, n_super=4, n_probe_super=2)
    a = {r["vec_id"]: r["cell"] for r in part.collect()}
    b = {r["vec_id"]: r["cell"] for r in part.collect()}
    assert a == b
    agree = sum(1 for i in exact if a[i] == exact[i])
    assert agree >= 150  # approximation, not garbage


def test_indexed_assignment_validation_and_copies_coassign(spark):
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_assign_indexed,
    )

    base = [0.1, 0.9, -0.3, 0.4]
    df = spark.createDataFrame(
        [(1, base), (2, list(base)), (3, [x * 2 for x in base])],
        "vec_id: long, embedding: array<float>",
    )
    cents = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]
    got = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_indexed(
            df, cents, n_super=2, n_probe_super=1
        ).collect()
    }
    assert got[1] == got[2] == got[3]
    # over-probing clamps to n_super (== the exact argmax), it does
    # not raise — a tiny quantizer must accept the default probe count
    over = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_indexed(
            df, cents, n_super=2, n_probe_super=3
        ).collect()
    }
    exact = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_indexed(
            df, cents, n_super=2, n_probe_super=2
        ).collect()
    }
    assert over == exact
    with _pytest.raises(ValueError, match="n_probe_super"):
        ivf_assign_indexed(df, cents, n_super=2, n_probe_super=0)


def test_semdedup_with_indexed_assignment_keeps_exact_recall(spark):
    import random

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    rows += [(200 + i, list(rows[i][1])) for i in range(8)]  # copies
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df,
            threshold=0.999,
            n_clusters=16,
            seed=9,
            refine_iters=1,
            assign_via_index=True,
        ).collect()
    }
    for i in range(8):
        assert out[i] is True and out[200 + i] is False
    assert sum(1 for k in out.values() if not k) == 8


# ---------------------------------------------------------------------
# Indexed (approximate-Lloyd) training


def test_indexed_training_equals_flat_when_fully_probed(spark):
    # n_probe_super=None probes every super-cell, so each Lloyd
    # iteration assigns identically to the flat scan and the trained
    # centroids must be byte-equal to ivf_centroids' (same init, same
    # mean update).
    import random

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_centroids,
        ivf_centroids_indexed,
    )

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    flat = ivf_centroids(df, n_cells=25, seed=9, refine_iters=2)
    exact = ivf_centroids_indexed(
        df, n_cells=25, seed=9, refine_iters=2, n_probe_super=None
    )
    assert flat == exact


def test_indexed_training_partial_probe_properties(spark):
    # partial probing: centroids stay unit-norm, count is preserved,
    # and a semdedup run through the approximate quantizer (indexed
    # assignment too) still suppresses every planted copy — the
    # suppression contract depends on deterministic co-assignment, not
    # on Lloyd exactness.
    import random

    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_centroids_indexed,
    )

    rng = random.Random(4)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(300)
    ]
    rows += [(1000 + i, list(rows[i][1])) for i in range(6)]  # copies
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    cents = ivf_centroids_indexed(
        df, n_cells=16, seed=5, refine_iters=2, n_probe_super=2
    )
    assert len(cents) == 16
    assert all(abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9 for c in cents)
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, threshold=0.999, n_clusters=16, centroids=cents,
            assign_via_index=2, max_cluster=10_000,
        ).collect()
    }
    assert sum(1 for k in out.values() if not k) == 6
    for i in range(6):
        assert out[i] is True and out[1000 + i] is False


def test_auto_rule_routes_by_measured_cell_wall(spark, monkeypatch):
    # The "auto" default resolves against ASSIGN_INDEX_AUTO_CELLS on
    # the TRAINED centroid count: above the wall it must route through
    # ivf_assign_indexed, at/below it the exact flat scan.
    from tfx_addons_feast_examplegen_spark.operators import (
        semdedup as semdedup_mod,
    )
    from tfx_addons_feast_examplegen_spark.operators import (
        similarity as similarity_mod,
    )

    calls = []
    real_flat = similarity_mod.ivf_assign
    real_idx = similarity_mod.ivf_assign_indexed

    def spy_flat(*a, **kw):
        calls.append("flat")
        return real_flat(*a, **kw)

    def spy_idx(*a, **kw):
        calls.append("indexed")
        return real_idx(*a, **kw)

    # semdedup binds ivf_assign at import time; the indexed form is a
    # function-local import, so patch both binding sites.
    monkeypatch.setattr(semdedup_mod, "ivf_assign", spy_flat)
    monkeypatch.setattr(similarity_mod, "ivf_assign_indexed", spy_idx)

    base = [0.6, 0.8, 0.0, 0.0]
    rows = [(1, base), (2, list(base)), (3, [0.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    cents = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]

    # 4 cells <= wall (1024): auto stays on the exact flat scan
    semdedup_mod.semantic_dedup(df, threshold=0.99, centroids=cents).collect()
    assert calls == ["flat"]

    # drop the wall below the cell count: auto must route indexed
    calls.clear()
    monkeypatch.setattr(semdedup_mod, "ASSIGN_INDEX_AUTO_CELLS", 2)
    out = semdedup_mod.semantic_dedup(
        df, threshold=0.99, centroids=cents
    )
    got = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert calls == ["indexed"]
    # duplicate co-clustering preserved under the indexed route: the
    # copy pair still lands in one cell and the later id is suppressed
    assert got == {1: True, 2: False, 3: True}

    # explicit pins override auto in both directions
    calls.clear()
    semdedup_mod.semantic_dedup(
        df, threshold=0.99, centroids=cents, assign_via_index=False
    ).collect()
    assert calls == ["flat"]
    calls.clear()
    monkeypatch.setattr(semdedup_mod, "ASSIGN_INDEX_AUTO_CELLS", 1024)
    semdedup_mod.semantic_dedup(
        df, threshold=0.99, centroids=cents, assign_via_index=True
    ).collect()
    assert calls == ["indexed"]

    # any other string is a loud error, not a silent flat fallback
    import pytest as _pytest

    with _pytest.raises(ValueError, match="assign_via_index"):
        semdedup_mod.semantic_dedup(
            df, threshold=0.99, centroids=cents, assign_via_index="flat"
        )


def test_short_corpus_trains_fewer_cells_with_refinement(spark):
    # corpus shorter than n_cells: the trained quantizer is the smaller
    # cell set, and refine_iters > 0 must not blow up on cells that
    # never existed (both trainers share the clamp).
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_centroids,
        ivf_centroids_indexed,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.6, 0.8])],
        "vec_id: long, embedding: array<float>",
    )
    flat = ivf_centroids(df, n_cells=16, seed=5, refine_iters=2)
    idx = ivf_centroids_indexed(
        df, n_cells=16, seed=5, refine_iters=2, n_probe_super=None
    )
    assert len(flat) == 3 and flat == idx
    # and semantic_dedup end-to-end on the tiny corpus still works
    out = semantic_dedup(df, threshold=0.999, n_clusters=16, seed=5)
    assert {r["vec_id"]: r["kept"] for r in out.collect()} == {
        1: True, 2: True, 3: True
    }


def test_ivf_topk_auto_rule(spark, monkeypatch):
    # ivf_topk shares semantic_dedup's measured-auto rule: big n_cells
    # routes training AND assignment through the index, small stays
    # flat, pins override, bad strings fail loud.
    import pytest as _pytest

    from tfx_addons_feast_examplegen_spark.operators import (
        similarity as sim,
    )

    calls = []
    for name in ("ivf_assign", "ivf_assign_indexed", "ivf_centroids",
                 "ivf_centroids_indexed"):
        real = getattr(sim, name)

        def spy(*a, _real=real, _name=name, **kw):
            calls.append(_name)
            return _real(*a, **kw)

        monkeypatch.setattr(sim, name, spy)

    import random

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")

    sim.ivf_topk(df, query_filter="vec_id < 3", n_cells=8, k=2).collect()
    assert "ivf_centroids" in calls and "ivf_assign" in calls
    assert "ivf_assign_indexed" not in calls

    calls.clear()
    monkeypatch.setattr(sim, "ASSIGN_INDEX_AUTO_CELLS", 4)
    sim.ivf_topk(df, query_filter="vec_id < 3", n_cells=8, k=2).collect()
    assert "ivf_centroids_indexed" in calls and "ivf_assign_indexed" in calls
    assert "ivf_assign" not in calls

    calls.clear()
    sim.ivf_topk(
        df, query_filter="vec_id < 3", n_cells=8, k=2,
        assign_via_index=False,
    ).collect()
    assert "ivf_assign" in calls and "ivf_assign_indexed" not in calls

    with _pytest.raises(ValueError, match="assign_via_index"):
        sim.ivf_topk(
            df, query_filter="vec_id < 3", n_cells=8, k=2,
            assign_via_index="indexed",
        )

    # Clamped-corpus auto re-resolution (ADVICE r12): a 60-row corpus
    # with a 200-cell REQUEST trains only 60 centroids; the trainer is
    # picked on the request (> wall -> indexed), but assignment must
    # re-resolve on the TRAINED count (60 <= wall -> exact flat scan),
    # matching how semantic_dedup resolves on len(cents).
    calls.clear()
    monkeypatch.setattr(sim, "ASSIGN_INDEX_AUTO_CELLS", 100)
    sim.ivf_topk(df, query_filter="vec_id < 3", n_cells=200, k=2).collect()
    assert "ivf_centroids_indexed" in calls
    assert "ivf_assign" in calls and "ivf_assign_indexed" not in calls
