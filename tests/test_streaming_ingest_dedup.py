"""Standing-ingest composition: streamed batches deduplicated against a
materialized MinHash index via foreachBatch — the end-to-end shape of a
continuous corpus pipeline (new data arrives as a stream; each
micro-batch pays only batch-side signing plus the band probe against the
stored corpus artifacts)."""

from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.dedup import (
    minhash_lsh_join,
    minhash_lsh_join_indexed,
    write_minhash_index,
)
from tfx_addons_feast_examplegen_spark.session import register_tables


def test_streamed_batches_dedup_against_index(spark, sf_dir, tmp_path):
    docs = register_tables(spark, sf_dir)["documents"]
    batch_docs = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    index_path = str(tmp_path / "minhash_index")
    write_minhash_index(
        corpus, index_path, "doc_id", "text", target_files=4
    )

    # ground truth: the one-shot cross-corpus join over the same split
    expected = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_join(
            batch_docs, corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert expected  # fixture plants cross-partition near-dups

    # stream the batch docs as JSONL micro-batches -> foreachBatch probes
    # the stored index and appends matches to a parquet sink
    src = str(tmp_path / "incoming")
    batch_docs.select("doc_id", "text").coalesce(2).write.mode(
        "overwrite"
    ).json(src)
    out_dir = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .json(src)
    )

    def _probe(batch_df, batch_id):
        matches = minhash_lsh_join_indexed(
            batch_df, index_path, "doc_id", "text", threshold=0.5
        )
        matches.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(r.doc_a, r.doc_b) for r in spark.read.parquet(out_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# Streaming near-dup gate (row-wise SimHash + stream-static band join)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

from tfx_addons_feast_examplegen_spark.operators.dedup import (  # noqa: E402
    neardup_gate_stream,
    simhash,
    simhash_band_index,
    simhash_rowwise_expr,
)


def test_rowwise_simhash_equals_agg_simhash(spark, sf_dir):
    from tfx_addons_feast_examplegen_spark.session import register_tables

    docs = register_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text"
    )
    agg = simhash(docs, "doc_id", "text", portable=True)
    row = docs.select(
        "doc_id", simhash_rowwise_expr("text").alias("r")
    )
    diff = agg.join(row, "doc_id").where(F.col("simhash") != F.col("r"))
    assert diff.count() == 0
    assert row.count() == agg.count()


def test_neardup_gate_stream_matches_bruteforce(spark, tmp_path):
    # tiny corpus with planted near-dups straddling the corpus/stream
    # split; the gate's output through a REAL streaming replay must
    # equal the brute-force Hamming pair matrix
    import itertools

    from tfx_addons_feast_examplegen_spark.streaming.events import (
        run_to_completion,
    )

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = []
    for i in range(40):
        toks = [words[(i * 3 + k) % 7] for k in range(5)]
        if i >= 20 and i % 4 == 0:  # stream docs copying corpus doc i-20
            toks = [words[((i - 20) * 3 + k) % 7] for k in range(5)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    corpus = docs.where(F.col("doc_id") < 20)
    new = docs.where(F.col("doc_id") >= 20)
    src = str(tmp_path / "stream_src")
    new.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    gated = neardup_gate_stream(
        stream,
        simhash_band_index(corpus, "doc_id", "text"),
        id_col="doc_id",
        text_col="text",
    )
    got = {
        (r["doc_id"], r["corpus_id"], r["hamming"])
        for r in run_to_completion(gated, query_name="gate_test").collect()
    }
    sh = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, "doc_id", "text", portable=True).collect()
    }
    exp = {
        (b, a, bin(sh[a] ^ sh[b]).count("1"))
        for a, b in itertools.product(range(20), range(20, 40))
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    assert got == exp
    assert any(h == 0 for _, _, h in exp), "fixture must plant exact copies"


def test_neardup_gate_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    idx = simhash_band_index(df, "doc_id", "text")
    with pytest.raises(ValueError, match="max_hamming"):
        neardup_gate_stream(
            df, idx, id_col="doc_id", text_col="text", max_hamming=4
        )
    with pytest.raises(ValueError, match="on_over_cap"):
        simhash_band_index(
            df, "doc_id", "text", max_band=8, on_over_cap="warn"
        )


def _boilerplate_corpus(spark):
    """30 identical boilerplate docs (one hot band value per band slot,
    occupancy 30) + 5 distinct docs whose bands stay under any cap >= 1."""
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = [(i, "cookie notice accept terms") for i in range(30)]
    rows += [
        (100 + i, " ".join(words[(i * 3 + k) % 7] for k in range(5)))
        for i in range(5)
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_band_index_cap_drops_hot_bands_and_fills_observation(spark):
    from pyspark.sql import Observation

    docs = _boilerplate_corpus(spark)
    obs = Observation("band_index")
    idx = simhash_band_index(
        docs, "doc_id", "text", max_band=8, observation=obs
    )
    rows = idx.collect()
    # observation filled eagerly at build time, before any action on idx
    assert obs.get["dropped_bands"] == 4  # all 4 bands of the hot hash
    assert obs.get["max_band_size"] == 30
    # every boilerplate band row pruned; distinct docs keep all 4 bands
    ids = {r["corpus_id"] for r in rows}
    assert ids == {100, 101, 102, 103, 104}
    assert len(rows) == 20
    # the gate over the capped index cannot fan out on the hot band: a
    # streamed boilerplate copy matches nothing, a distinct-doc copy
    # still matches its corpus original
    doc_100_text = "alpha beta gamma delta eps"  # _boilerplate_corpus i=0
    probe = spark.createDataFrame(
        [(200, "cookie notice accept terms"), (201, doc_100_text)],
        "doc_id: long, text: string",
    )
    got = (
        neardup_gate_stream(probe, idx, id_col="doc_id", text_col="text")
        .select("doc_id", "corpus_id")
        .distinct()
        .collect()
    )
    assert {(r["doc_id"], r["corpus_id"]) for r in got} == {(201, 100)}


def test_band_index_cap_error_mode_fails_on_hot_band(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = _boilerplate_corpus(spark)
    idx = simhash_band_index(
        docs, "doc_id", "text", max_band=8, on_over_cap="error"
    )
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException), match="band over cap"
    ):
        idx.collect()
    # under-cap corpora pass untouched in error mode
    clean = docs.where(F.col("doc_id") >= 100)
    ok = simhash_band_index(
        clean, "doc_id", "text", max_band=8, on_over_cap="error"
    )
    assert ok.count() == 20
