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
