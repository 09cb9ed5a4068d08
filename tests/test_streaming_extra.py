"""foreachBatch sink: the production API for arbitrary per-micro-batch
sinks (upserts, multi-table writes) — each batch arrives as a BATCH
DataFrame with an epoch id for idempotent retry handling."""

from __future__ import annotations


def test_foreach_batch_sink(spark, tmp_path):
    import uuid

    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    # availableNow bounded stream over the events parquet
    ev = load_table(spark, sf, "events")
    schema = ev.schema
    src_dir = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out_dir = str(tmp_path / "out")
    seen = []

    def sink(batch_df, epoch_id):
        # idempotent pattern: write per-epoch directory (re-run of the
        # same epoch overwrites, never duplicates)
        seen.append(epoch_id)
        (batch_df.groupBy("event_type").agg(F.count("*").alias("n"))
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / f"ck-{uuid.uuid4()}"))
         .start())
    q.awaitTermination(120)
    assert seen, "no batch processed"
    got = spark.read.parquet(f"{out_dir}/epoch=*")
    total = got.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()
