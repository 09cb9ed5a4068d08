"""Round-trip tests for csv/json sources and the text source."""

from __future__ import annotations


def test_csv_roundtrip(spark, tmp_path):
    from mapreduce_server_development_spark.sources import read_csv, write_csv

    df = spark.createDataFrame([(1, "a"), (2, "b,с")], ["k", "v"])
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(spark, path, schema="k int, v string")
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b,с")]


def test_csv_infer_schema(spark, tmp_path):
    from mapreduce_server_development_spark.sources import read_csv, write_csv

    df = spark.createDataFrame([(1, 2.5)], ["k", "x"])
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(spark, path)
    assert dict(back.dtypes) == {"k": "int", "x": "double"}


def test_json_roundtrip_and_permissive(spark, tmp_path):
    from mapreduce_server_development_spark.sources import read_json, write_json

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    path = str(tmp_path / "json")
    write_json(df, path)
    back = read_json(spark, path, schema="k long, v string")
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]

    # Malformed rows are captured, not fatal (reference permissive-parse
    # semantic, SURVEY §1.3).
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "data.json").write_text('{"k": 1, "v": "ok"}\nnot json at all\n')
    got = read_json(
        spark, str(bad), schema="k long, v string, _corrupt_record string"
    ).collect()
    assert len(got) == 2
    assert sum(1 for r in got if r["_corrupt_record"] is not None) == 1


def test_read_text_dir(spark, tmp_path):
    from mapreduce_server_development_spark.sources import read_text_dir

    (tmp_path / "f1.txt").write_text("one\ntwo\n")
    (tmp_path / "f2.txt").write_text("three\n")
    df = read_text_dir(spark, str(tmp_path))
    assert sorted(r.value for r in df.collect()) == ["one", "three", "two"]


def test_compact_parquet(spark, tmp_path):
    """Compaction merges a many-small-files directory, preserves rows,
    and hits the planned file count."""
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.sources.compact import (
        compact_parquet,
        dir_bytes,
        plan_num_files,
    )

    src = str(tmp_path / "frag")
    # 40 tiny files.
    spark.range(0, 20_000).withColumn("v", F.col("id") * 2).repartition(40).write.parquet(src)
    n_before = len([p for p in __import__("pathlib").Path(src).glob("part-*")])
    assert n_before == 40

    out = str(tmp_path / "compact")
    df = compact_parquet(spark, src, out, target_mb=1024)
    assert plan_num_files(dir_bytes(src), 1024) == 1
    n_after = len([p for p in __import__("pathlib").Path(out).glob("part-*") if not p.name.endswith(".crc")])
    assert n_after == 1
    assert df.count() == 20_000
    assert df.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(20_000))


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (directory-level pruning), not a data filter over every file."""
    from mapreduce_server_development_spark.sources.partitioned import (
        read_day,
        write_partitioned_by_day,
    )
    from mapreduce_server_development_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_day")
    write_partitioned_by_day(ev, path)

    one_day = read_day(spark, path, "2024-01-07")
    plan = one_day._sc._jvm.PythonSQLUtils.explainString(
        one_day._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters")[1].splitlines()[0]

    # Row parity with a plain timestamp-range filter over the raw table.
    from pyspark.sql import functions as F

    expect = ev.filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-07").count()
    assert one_day.count() == expect > 0


def test_merge_schema_evolution(spark, tmp_path):
    """Schema evolution: files written with a newer, wider schema read
    back unioned under mergeSchema, old files null-filling new columns."""
    path = str(tmp_path / "evolving")
    spark.range(0, 10).selectExpr("id", "id * 2 AS v").write.parquet(path + "/batch=1")
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS v", "'new' AS extra"
    ).write.parquet(path + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "v", "extra", "batch"}
    assert df.count() == 20
    assert df.filter("extra IS NULL").count() == 10


def test_orc_roundtrip(spark, tmp_path):
    from mapreduce_server_development_spark.sources import read_orc, write_orc

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_orc_predicate_pushdown(spark, tmp_path):
    """ORC scans must keep the same pushdown properties as parquet."""
    from mapreduce_server_development_spark.sources import read_orc, write_orc

    df = spark.range(1000).withColumnRenamed("id", "k")
    path = str(tmp_path / "orc")
    write_orc(df, path)
    q = read_orc(spark, path).filter("k > 990")
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,990)]" in plan
    assert q.count() == 9


def test_dynamic_partition_pruning(spark, tmp_path):
    """A join against a FILTERED dim must prune fact partitions at
    RUNTIME (DPP): the fact scan's PartitionFilters gains a
    dynamicpruning subquery fed by the dim side — at 100 TB this is
    the difference between scanning 3 years and scanning the joined
    days only."""
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.sources.partitioned import (
        write_partitioned_by_day,
    )

    ev = spark.range(2000).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704600000) + F.col("id") * 900).alias("ts"),
    )
    path = str(tmp_path / "fact")
    write_partitioned_by_day(ev, path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("2024-01-07", "keep"), ("2024-01-08", "keep"), ("2024-02-01", "drop")],
        ["day", "tag"],
    )
    q = fact.join(F.broadcast(dim.filter("tag = 'keep'")), "day")
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower()


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Incremental backfill: rewriting ONE day must leave every other
    partition byte-identical (partitionOverwriteMode=dynamic) — full
    overwrite of a 3-year table to fix one day is not a 100 TB option."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("2024-01-07", 1), ("2024-01-07", 2), ("2024-01-08", 3)], ["day", "v"]
    )
    base.write.partitionBy("day").parquet(path)
    fix = spark.createDataFrame([("2024-01-07", 99)], ["day", "v"])
    (fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(path))
    # partition columns are type-inferred on read: day comes back as a date
    got = sorted((str(r.day), r.v) for r in spark.read.parquet(path).collect())
    assert got == [("2024-01-07", 99), ("2024-01-08", 3)]


def test_gzip_text_read(spark, tmp_path):
    """Compressed text inputs decompress transparently in the text
    scan (Hadoop codec layer) — the common shape of raw web-corpus
    drops at scale. Note gzip files are not splittable: one task per
    file, so 100 TB ingestion wants many files (or zstd/bzip2)."""
    import gzip

    d = tmp_path / "in"
    d.mkdir()
    with gzip.open(d / "part1.txt.gz", "wt", encoding="utf-8") as f:
        f.write("alpha\nbeta\n")
    with gzip.open(d / "part2.txt.gz", "wt", encoding="utf-8") as f:
        f.write("gamma\n")
    got = sorted(r["value"] for r in spark.read.text(str(d)).collect())
    assert got == ["alpha", "beta", "gamma"]


def test_xml_roundtrip_rowtag(spark, tmp_path):
    """XML source (Spark 4 built-in): rowTag extraction with attribute
    and nested-element columns."""
    from mapreduce_server_development_spark.sources.files import read_xml

    f = tmp_path / "books.xml"
    f.write_text(
        "<catalog>"
        '<book id="1"><title>Spark</title><price>10.5</price></book>'
        '<book id="2"><title>Duck</title><price>7.25</price></book>'
        "</catalog>"
    )
    df = read_xml(spark, str(f), row_tag="book")
    rows = {r["_id"]: (r["title"], float(r["price"])) for r in df.collect()}
    assert rows == {1: ("Spark", 10.5), 2: ("Duck", 7.25)}


def test_binary_file_ingestion(spark, tmp_path):
    """binaryFile source: one row per file, exact bytes in ``content``,
    glob pruning at the listing — the multimodal ingestion front door."""
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.sources.files import read_binary_files

    (tmp_path / "a.img").write_bytes(b"IMG1:4x4:\x00\xffpayload")
    (tmp_path / "b.img").write_bytes(b"IMG1:2x2:x")
    (tmp_path / "skip.txt").write_text("not media")
    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[1]: bytes(r["content"]) for r in df.collect()}
    assert rows == {
        "a.img": b"IMG1:4x4:\x00\xffpayload",
        "b.img": b"IMG1:2x2:x",
    }
    # length column matches the bytes without reading content again
    lens = {r["path"].rsplit("/", 1)[1]: r["length"] for r in
            df.select("path", "length").collect()}
    assert lens == {"a.img": 18, "b.img": 10}


def test_write_zordered_files_have_disjoint_z_ranges(spark, tmp_path):
    """repartitionByRange on the z-value must yield parquet files whose
    z ranges are pairwise disjoint — the property parquet min/max
    pruning needs to skip whole files for 2-D predicates."""
    from pyspark.sql import functions as F

    from mapreduce_server_development_spark.sources.tables import load_table
    from mapreduce_server_development_spark.sources.zorder import (
        morton_zvalue,
        write_zordered,
    )
    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        "user_id",
        (F.expr("unix_timestamp(ts) div 60") - F.lit(28401120)).alias("m"),
    )
    out = str(tmp_path / "zordered")
    write_zordered(ev, out, "user_id", "m", num_files=4)

    back = spark.read.parquet(out)
    ranges = (
        back.withColumn("z", morton_zvalue(F.col("user_id"), F.col("m"), 16))
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(ranges) >= 2
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, spans
    # Round-trip integrity: no rows lost in the re-layout.
    assert back.count() == ev.count()
