"""Standing-retrieval composition: streamed query batches probe a
materialized ANN index via foreachBatch — the serving shape of a
vector-retrieval pipeline (the corpus is signed/banded once; each query
micro-batch pays only its own signing plus the band probe + shortlist
vector fetch)."""

from pyspark.sql import functions as F

from tfx_addons_feast_examplegen_spark.operators.similarity import (
    lsh_topk,
    lsh_topk_indexed,
    write_ann_index,
)
from tfx_addons_feast_examplegen_spark.session import register_tables


def test_streamed_query_batches_probe_ann_index(spark, sf_dir, tmp_path):
    emb = register_tables(spark, sf_dir)["embeddings"]
    index_path = str(tmp_path / "ann_index")
    write_ann_index(emb, index_path, target_files=4)

    # ground truth: the one-shot in-memory path over the same queries
    expected = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in lsh_topk(emb, query_filter="vec_id < 12", k=5).collect()
    }
    assert expected

    src = str(tmp_path / "incoming_queries")
    emb.filter("vec_id < 12").select("vec_id", "embedding").coalesce(
        3
    ).write.mode("overwrite").parquet(src)
    out_dir = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )

    def _probe(batch_df, batch_id):
        res = lsh_topk_indexed(batch_df, index_path, k=5)
        res.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == expected
