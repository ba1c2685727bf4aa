"""Streaming semantic ingest gate: duplicate-never-missed guarantee,
zero-vector semantics, validation, and auto routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.semdedup import (
    semantic_cell_index,
    semantic_gate_stream,
)


CENTS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def _frames(spark):
    corpus = spark.createDataFrame(
        [(1, [0.9, 0.1, 0.0]), (2, [0.0, 1.0, 0.2]), (3, [0.1, 0.0, 1.0])],
        "vec_id: long, embedding: array<float>",
    )
    return corpus, semantic_cell_index(corpus, CENTS)


def test_exact_and_scaled_duplicates_never_missed(spark):
    # co-assignment is a pure function of direction: an exact copy and
    # a positively scaled copy of an indexed vector MUST match at any
    # n_probe >= 1 — the gate's pigeonhole-style guarantee.
    corpus, index = _frames(spark)
    arriving = spark.createDataFrame(
        [
            (10, [0.9, 0.1, 0.0]),            # exact copy of 1
            (11, [0.0, 2.0, 0.4]),            # 2x scaled copy of 2
            (12, [-0.9, -0.1, 0.0]),          # NEGATED: different direction
        ],
        "vec_id: long, embedding: array<float>",
    )
    got = {
        (r["vec_id"], r["corpus_id"]): r["cos"]
        for r in semantic_gate_stream(
            arriving, index, CENTS, threshold=0.999, n_probe=1
        ).collect()
    }
    assert got[(10, 1)] == pytest.approx(1.0)
    assert got[(11, 2)] == pytest.approx(1.0)
    assert not any(k[0] == 12 for k in got)


def test_zero_vector_matches_nothing_and_threshold_filters(spark):
    corpus, index = _frames(spark)
    arriving = spark.createDataFrame(
        [(20, [0.0, 0.0, 0.0]), (21, [0.8, 0.6, 0.0])],
        "vec_id: long, embedding: array<float>",
    )
    rows = semantic_gate_stream(
        arriving, index, CENTS, threshold=0.999, n_probe=3
    ).collect()
    # zero vector: no row; 21 is within ~26 degrees of corpus 1 but far
    # below the 0.999 threshold even when probed
    assert rows == []
    loose = semantic_gate_stream(
        arriving, index, CENTS, threshold=0.5, n_probe=3
    ).collect()
    assert {r["vec_id"] for r in loose} == {21}


def test_validation_and_auto_routing(spark, monkeypatch):
    corpus, index = _frames(spark)
    with pytest.raises(ValueError, match="threshold"):
        semantic_gate_stream(corpus, index, CENTS, threshold=0.0)
    with pytest.raises(ValueError, match="n_probe"):
        semantic_gate_stream(corpus, index, CENTS, threshold=0.9, n_probe=0)
    with pytest.raises(ValueError, match="assign_via_index"):
        semantic_gate_stream(
            corpus, index, CENTS, threshold=0.9, assign_via_index="flat"
        )

    # auto routes indexed past the wall on BOTH the index build and
    # the probe side (spy at the similarity seam)
    from tfx_addons_feast_examplegen_spark.operators import (
        semdedup as sd,
    )
    from tfx_addons_feast_examplegen_spark.operators import (
        similarity as sim,
    )

    calls = []
    real_flat, real_idx = sim.ivf_assign, sim.ivf_assign_indexed
    monkeypatch.setattr(
        sd, "ivf_assign",
        lambda *a, **kw: calls.append("flat") or real_flat(*a, **kw),
    )
    monkeypatch.setattr(
        sim, "ivf_assign_indexed",
        lambda *a, **kw: calls.append("indexed") or real_idx(*a, **kw),
    )
    monkeypatch.setattr(sd, "ASSIGN_INDEX_AUTO_CELLS", 2)
    idx2 = semantic_cell_index(corpus, CENTS)
    semantic_gate_stream(
        corpus, idx2, CENTS, threshold=0.999, n_probe=1
    ).collect()
    assert calls and all(c == "indexed" for c in calls)


def test_build_probe_routing_must_match(spark, monkeypatch):
    # The never-missed guarantee requires build and probe to resolve
    # assignment identically (flat vs indexed can place the same vector
    # in different cells). The index records its resolved route in the
    # cell column metadata; the probe validates it.
    corpus, index = _frames(spark)  # 3 cells <= wall -> built flat
    assert index.schema["cell"].metadata == {"assign_via_index": False}
    # the hot-cell cap's anti-join must not strip the routing metadata
    capped = semantic_cell_index(corpus, CENTS, max_cell=10)
    assert capped.schema["cell"].metadata == {"assign_via_index": False}

    from tfx_addons_feast_examplegen_spark.operators import semdedup as sd

    # wall lowered AFTER the build: probe's auto now resolves indexed
    monkeypatch.setattr(sd, "ASSIGN_INDEX_AUTO_CELLS", 2)
    with pytest.raises(ValueError, match="co-assignment"):
        semantic_gate_stream(corpus, index, CENTS, threshold=0.9)
    with pytest.raises(ValueError, match="pin assign_via_index"):
        semantic_gate_stream(
            corpus, index, CENTS, threshold=0.9, assign_via_index=True
        )
    # pinning the probe to the build's recorded route is accepted
    semantic_gate_stream(
        corpus, index, CENTS, threshold=0.9, assign_via_index=False
    ).collect()


def test_routing_metadata_parquet_roundtrip_and_bare_index(
    spark, tmp_path, monkeypatch
):
    corpus, index = _frames(spark)
    p = str(tmp_path / "idx")
    index.write.parquet(p)
    back = spark.read.parquet(p)
    # field metadata persists through the standing-index parquet cycle
    assert back.schema["cell"].metadata.get("assign_via_index") is False

    from tfx_addons_feast_examplegen_spark.operators import semdedup as sd

    monkeypatch.setattr(sd, "ASSIGN_INDEX_AUTO_CELLS", 2)
    with pytest.raises(ValueError, match="assign_via_index=False"):
        semantic_gate_stream(corpus, back, CENTS, threshold=0.9)
    # a hand-built index without the metadata is accepted — the
    # constraint then holds by documentation, like centroids sharing
    bare = back.select(
        "corpus_id", "corpus_vec", (F.col("cell") + F.lit(0)).alias("cell")
    )
    assert bare.schema["cell"].metadata.get("assign_via_index") is None
    semantic_gate_stream(corpus, bare, CENTS, threshold=0.9).collect()


def test_shard_merge_index_equals_one_shot(spark, sf_dir):
    # The 100 TB lifecycle: per-shard index builds with SHARED
    # centroids, merge-appended into the standing index, must equal the
    # one-shot whole-corpus build row-for-row — both as index content
    # and through the gate (the dedup_incremental_indexed composition
    # property, embedding edition).
    from tfx_addons_feast_examplegen_spark.operators.similarity import (
        ivf_centroids,
    )
    from tfx_addons_feast_examplegen_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    corpus = emb.where(F.col("vec_id") < 300)
    cents = ivf_centroids(corpus, n_cells=8, seed=42, refine_iters=1)
    one_shot = semantic_cell_index(corpus, cents)
    shard_a = semantic_cell_index(
        corpus.where(F.col("vec_id") % 2 == 0), cents
    )
    shard_b = semantic_cell_index(
        corpus.where(F.col("vec_id") % 2 == 1), cents
    )
    merged = shard_a.unionByName(shard_b)
    assert merged.schema["cell"].metadata == {"assign_via_index": False}

    def _idx_rows(df):
        return sorted((r["corpus_id"], r["cell"]) for r in df.collect())

    assert _idx_rows(merged) == _idx_rows(one_shot)

    arriving = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 360))

    def _gate_rows(idx):
        return sorted(
            tuple(r)
            for r in semantic_gate_stream(
                arriving, idx, cents, threshold=0.3, n_probe=2
            ).collect()
        )

    got = _gate_rows(merged)
    assert got == _gate_rows(one_shot)
    assert len(got) > 0  # the equivalence is not vacuous


def test_gate_runs_as_a_real_stream(spark, tmp_path):
    # the plan must be Structured-Streaming-legal (no aggregation on
    # the stream side) and produce the same matches as the batch run
    from tfx_addons_feast_examplegen_spark.streaming.events import (
        run_to_completion,
    )

    corpus, index = _frames(spark)
    arriving = spark.createDataFrame(
        [(10, [0.9, 0.1, 0.0]), (11, [0.0, 1.0, 0.2]), (12, [0.5, -0.5, 0.1])],
        "vec_id: long, embedding: array<float>",
    )
    src = str(tmp_path / "src")
    arriving.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_to_completion(
        semantic_gate_stream(stream, index, CENTS, threshold=0.999, n_probe=2),
        query_name="semgate_test",
    )
    batch = semantic_gate_stream(
        arriving, index, CENTS, threshold=0.999, n_probe=2
    )
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in batch.collect()
    } == {(10, 1, 1.0), (11, 2, 1.0)}


def test_hot_cell_cap_machinery(spark):
    # k-means offers no cell-size guarantee: a degenerate cell must be
    # cappable at index BUILD time (the stream side cannot probe
    # occupancy), with the same drop/error/observe contract as
    # simhash_band_index.
    from pyspark.sql import Observation

    # all corpus vectors share one direction -> one hot cell of 5
    corpus = spark.createDataFrame(
        [(i, [1.0, float(i) / 100, 0.0]) for i in range(5)]
        + [(99, [0.0, 0.0, 1.0])],
        "vec_id: long, embedding: array<float>",
    )
    obs = Observation()
    idx = semantic_cell_index(
        corpus, CENTS, max_cell=3, observation=obs, on_over_cap="drop"
    )
    kept = idx.collect()
    assert {r["corpus_id"] for r in kept} == {99}  # hot cell pruned
    assert obs.get["dropped_cells"] == 1
    assert obs.get["max_cell_size"] == 5

    # the gate sees only the surviving cells
    arriving = spark.createDataFrame(
        [(10, [1.0, 0.01, 0.0]), (11, [0.0, 0.0, 1.0])],
        "vec_id: long, embedding: array<float>",
    )
    got = {
        r["vec_id"]
        for r in semantic_gate_stream(
            arriving, idx, CENTS, threshold=0.999, n_probe=3
        ).collect()
    }
    assert got == {11}

    import pytest as _pytest

    with _pytest.raises(Exception, match="cell over cap"):
        semantic_cell_index(
            corpus, CENTS, max_cell=3, on_over_cap="error"
        ).collect()
    with _pytest.raises(ValueError, match="on_over_cap"):
        semantic_cell_index(corpus, CENTS, max_cell=3, on_over_cap="warn")
    # max_cell=None: uncapped plan, all rows present
    assert semantic_cell_index(corpus, CENTS).count() == 6
