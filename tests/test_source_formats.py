"""Source/sink format breadth: the engine reads parquet natively; ORC,
JSON-lines, and CSV round-trips must preserve values with declared schemas
(no inference in the contract, SURVEY.md §1.3)."""

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.sources.readers import (
    load_table,
    read_sales_csv,
)


def _summary(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")).alias("cents"),
    ).collect()[0]


def test_orc_roundtrip(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem")
    out = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == li.schema
    assert _summary(back) == _summary(li)


def test_jsonl_roundtrip(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem").drop("l_shipdate")  # ts formats vary in JSON
    out = str(tmp_path / "li_json")
    li.write.mode("overwrite").json(out)
    back = spark.read.schema(li.schema).json(out)  # declared schema, no inference
    assert _summary(back) == _summary(li)


def test_csv_roundtrip_declared_schema(spark, tmp_path):
    rows = [
        (1, 101, 3, 60.0, "2024-01-01", "in_store"),
        (2, 102, 1, 25.5, "2024-01-02", "in_store"),
    ]
    src = spark.createDataFrame(
        rows,
        "sale_id long, product_id long, quantity long, sale_amount double, "
        "sale_date string, source string",
    ).withColumn("sale_date", F.col("sale_date").cast("date"))
    out = str(tmp_path / "sales_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = read_sales_csv(spark, out)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())


def test_table_exists_probe(spark, tmp_path):
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import table_exists

    assert not table_exists(spark, "no_such_table")
    assert table_exists(spark, "", path="/root/testdata/sf0.001/lineitem.parquet")
    assert not table_exists(spark, "", path=str(tmp_path / "missing"))
    spark.createDataFrame([(1,)], "x long").createOrReplaceTempView("probe_view")
    assert table_exists(spark, "probe_view")


def test_python_datasource_retail_seed(spark):
    # Spark 4 Python DataSource API: the reference's seed bootstrap as a
    # registered connector — one InputPartition per channel, read planned
    # as a 2-split scan; feeding it through the retail pipeline must
    # reproduce the committed golden aggregate.
    from etl_pipeline_for_retail_sales_data_spark.plans.retail import transform_sales
    from etl_pipeline_for_retail_sales_data_spark.schemas import SALES_SCHEMA
    from etl_pipeline_for_retail_sales_data_spark.sources.retail_seed import register

    register(spark)
    df = spark.read.format("retail_seed").load()
    assert df.schema == SALES_SCHEMA
    assert df.count() == 30
    assert df.rdd.getNumPartitions() == 2

    online = spark.read.format("retail_seed").option("channel", "online").load()
    assert online.count() == 15

    # one load() per filtered branch: branches of a SHARED load would
    # push conflicting filters into one reader (guarded by the connector)
    on = spark.read.format("retail_seed").load()
    ins = spark.read.format("retail_seed").load()
    out = transform_sales(on.filter(on.source == "online"), ins.filter(ins.source == "in_store"))
    rows = [(r.product_id, r.total_quantity, float(r.total_sale_amount)) for r in out.collect()]
    assert rows == [
        (101, 13, 300.0),
        (102, 9, 225.0),
        (103, 7, 180.0),
        (104, 7, 165.0),
        (105, 3, 78.0),
        (106, 6, 135.0),
    ]


def test_python_datasource_streaming_daily_batches(spark):
    # streaming form of the connector: one micro-batch per seed day via
    # SimpleDataSourceStreamReader offsets; both days drain under
    # processAllAvailable and the union equals the batch read.
    import uuid

    from etl_pipeline_for_retail_sales_data_spark.sources.retail_seed import register

    register(spark)
    name = f"seed_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("retail_seed")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table(name)
    assert streamed.count() == 30
    assert {str(r.sale_date) for r in streamed.collect()} == {"2025-04-02", "2025-04-03"}
    batch = spark.read.format("retail_seed").load()
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_python_datasource_reader_pushdown(spark):
    # pushFilters: EqualTo(source) prunes to ONE input partition before
    # any row is generated; GreaterThan(product_id) filters inside the
    # connector; results stay correct either way.
    from etl_pipeline_for_retail_sales_data_spark.sources.retail_seed import register

    register(spark)
    online = spark.read.format("retail_seed").load().filter(F.col("source") == "online")
    assert online.count() == 15
    assert online.rdd.getNumPartitions() == 1  # partition pruned in the connector
    high = spark.read.format("retail_seed").load().filter(
        (F.col("source") == "in_store") & (F.col("product_id") > 104)
    )
    assert {r.product_id for r in high.collect()} == {105, 106}


def test_python_datasource_jsonl_writer_commit_protocol(spark, sf_smoke, tmp_path):
    # distributed write via the Python DataSourceWriter: staged temp files
    # become visible only at commit(), with a _SUCCESS manifest; overwrite
    # replaces previous committed files.
    import json as _json
    import os

    from etl_pipeline_for_retail_sales_data_spark.sources.jsonl_writer import register_writer
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    register_writer(spark)
    out = str(tmp_path / "orders_jsonl")
    o = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    o.write.format("jsonl_dir").mode("append").option("path", out).save()

    manifest = _json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == o.count()
    assert not [n for n in os.listdir(out) if n.startswith("_tmp-")]

    back = spark.read.json(out)
    assert back.count() == o.count()
    a = sorted((r.o_orderkey, r.o_orderstatus, r.o_totalprice) for r in back.collect())
    b = sorted(map(tuple, o.collect()))
    assert a == b

    # overwrite replaces, not accumulates (reference L3 semantics)
    o.limit(10).write.format("jsonl_dir").mode("overwrite").option("path", out).save()
    assert spark.read.json(out).count() == 10


def test_python_datasource_arrow_writer_roundtrip(spark, sf_smoke, tmp_path):
    # Arrow-native writer: executors stream RecordBatches into parquet
    # parts; commit publishes them atomically; Spark reads the result
    # back identically to the source frame.
    import json as _json
    import os

    from etl_pipeline_for_retail_sales_data_spark.sources.arrow_writer import (
        register_arrow_writer,
    )
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    register_arrow_writer(spark)
    out = str(tmp_path / "li_parquet")
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.write.format("parquet_dir").mode("append").option("path", out).save()

    manifest = _json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == li.count()
    assert not [n for n in os.listdir(out) if n.startswith("_tmp-")]

    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))


def test_jsonl_writer_abort_cleans_staged_files(tmp_path):
    # unit-level: abort() removes every staged temp file so a failed job
    # publishes nothing.
    from pyspark.sql import Row

    from etl_pipeline_for_retail_sales_data_spark.sources.jsonl_writer import JsonlDirWriter

    out = str(tmp_path / "aborted")
    w = JsonlDirWriter({"path": out}, overwrite=False)
    msg = w.write(iter([Row(a=1), Row(a=2)]))
    assert msg.n_rows == 2 and msg.temp_path.startswith(out)
    import os

    assert os.path.exists(msg.temp_path)
    w.abort([msg, None])
    assert not os.path.exists(msg.temp_path)
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_python_datasource_stream_writer_exactly_once(spark, tmp_path):
    # streaming WRITE path of the Python DataSource: retail_seed stream →
    # jsonl_dir stream sink; every batch lands atomically with a
    # _batch-<id> manifest and the total equals the batch read.
    import json
    import os

    from etl_pipeline_for_retail_sales_data_spark.sources.jsonl_writer import register_writer
    from etl_pipeline_for_retail_sales_data_spark.sources.retail_seed import register

    register(spark)
    register_writer(spark)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("retail_seed")
        .load()
        .writeStream.format("jsonl_dir")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    manifests = sorted(n for n in os.listdir(out) if n.startswith("_batch-"))
    assert manifests, "no batch manifests written"
    total = 0
    for m in manifests:
        meta = json.load(open(os.path.join(out, m)))
        for fname in meta["files"]:
            assert os.path.exists(os.path.join(out, fname))
        total += meta["rows"]
    assert total == 30  # both seed days drained
    assert not [n for n in os.listdir(out) if n.startswith("_tmp-")]
    n_lines = sum(
        sum(1 for _ in open(os.path.join(out, n)))
        for n in os.listdir(out)
        if n.endswith(".jsonl")
    )
    assert n_lines == 30


def test_stream_writer_replayed_batch_is_idempotent(tmp_path):
    # Structured Streaming re-runs the last uncommitted batch after a
    # restart; a batch whose manifest already exists must discard the
    # replayed staged files instead of double-committing.
    import json
    import os

    from etl_pipeline_for_retail_sales_data_spark.sources.jsonl_writer import (
        JsonlDirStreamWriter,
    )

    class Row:
        def __init__(self, **kw):
            self._d = kw

        def asDict(self):
            return self._d

    out = str(tmp_path / "replay_out")
    w = JsonlDirStreamWriter({"path": out})

    class Ctx:  # write() runs on executors; fake the TaskContext locally
        @staticmethod
        def partitionId():
            return 0

    import pyspark

    orig = pyspark.TaskContext.get
    pyspark.TaskContext.get = staticmethod(lambda: Ctx())
    try:
        m1 = w.write(iter([Row(a=1), Row(a=2)]))
        w.commit([m1], batchId=7)
        m2 = w.write(iter([Row(a=1), Row(a=2)]))  # replay of batch 7
        w.commit([m2], batchId=7)
    finally:
        pyspark.TaskContext.get = orig

    jsonl = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert len(jsonl) == 1  # no duplicate visible output
    meta = json.load(open(os.path.join(out, "_batch-7")))
    assert meta["rows"] == 2
    assert not [n for n in os.listdir(out) if n.startswith("_tmp-")]


def test_avro_roundtrip_or_documented_absence(spark, tmp_path):
    """Avro needs the spark-avro package jar, which this container does
    not ship (NOTES.md environment limits). If a future environment adds
    it, this test starts exercising the round trip instead of skipping —
    the gap stays visible in the suite either way (the JDBC/Derby
    pattern)."""
    import pytest

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    path = str(tmp_path / "avro_rt")
    try:
        df.write.format("avro").save(path)
    except Exception as e:
        pytest.skip(f"spark-avro not available in this container: {type(e).__name__}")
    back = spark.read.format("avro").load(path)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]
