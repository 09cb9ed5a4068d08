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


def test_stream_partitions_knob_sets_and_restores(spark, monkeypatch):
    """The streaming state-partition context manager pins
    spark.sql.shuffle.partitions for the run and restores the batch
    value afterwards (including on error), honoring the env override."""
    from mapreduce_server_development_spark.plans.streaming_queries import (
        _stream_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with _stream_partitions(spark):
        assert spark.conf.get(key) == "8"
    assert spark.conf.get(key) == before

    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "17")
    with _stream_partitions(spark):
        assert spark.conf.get(key) == "17"
    assert spark.conf.get(key) == before

    try:
        with _stream_partitions(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before


def test_rocksdb_state_store_env_gate(monkeypatch):
    """SPARK_GRAFT_STATE_STORE=rocksdb selects the built-in RocksDB
    provider with changelog checkpointing; default stays on the
    (A/B-measured faster at fixture scale) HDFS-backed provider. The
    RocksDB class and its JNI jar ship with pyspark, so the flip is
    config-only — asserted end-to-end by the oracle runs; here assert
    the env gate itself."""
    from mapreduce_server_development_spark.session import state_store_confs

    monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
    assert state_store_confs() == {}

    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
    confs = state_store_confs()
    assert (
        confs["spark.sql.streaming.stateStore.providerClass"]
        == "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    assert (
        confs[
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ]
        == "true"
    )


def test_stream_metrics_progress_rows(spark):
    """q_stream_metrics yields >= 1 per-batch progress row with the
    documented stable schema; the data batch reports its input rows and
    a populated state operator (the watermarked agg keeps state)."""
    from mapreduce_server_development_spark.plans.registry import QUERIES

    df = QUERIES["q_stream_metrics"](spark, "/root/testdata/sf0.001")
    assert df.schema.simpleString() == (
        "struct<batch_id:bigint,num_input_rows:bigint,"
        "trigger_duration_ms:bigint,state_rows_total:bigint,"
        "state_rows_updated:bigint,watermark:string>"
    )
    rows = df.collect()
    assert rows, "listener captured no progress events"
    data_batches = [r for r in rows if r.num_input_rows > 0]
    assert data_batches, "no batch reported input rows"
    assert any(r.state_rows_total > 0 for r in rows), "state never populated"
    assert all(r.trigger_duration_ms >= 0 for r in rows)
