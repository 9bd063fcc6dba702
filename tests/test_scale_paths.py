"""Scale-path storage features: partition pruning and bucketed (shuffle-free)
joins — the physical layouts a 100 TB deployment would rely on."""

import pytest

pytestmark = pytest.mark.slow  # heavy sweep: excluded from the fast lane (pytest -m "not slow")

import contextlib
import io

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_partition_pruning(spark, sf_smoke, tmp_path):
    """A scan of date/key-partitioned parquet with an equality filter must
    prune at the partition level (PartitionFilters on the scan), reading
    only matching directories."""
    out = str(tmp_path / "li_by_flag")
    li = load_table(spark, sf_smoke, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)

    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    txt = formatted(back)
    assert "PartitionFilters" in txt, txt
    assert "l_returnflag" in txt.split("PartitionFilters", 1)[1].splitlines()[0]
    # pruned scan returns exactly the R rows
    assert back.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_bucketed_join_avoids_shuffle(spark, sf_smoke, tmp_path):
    """Two tables bucketed on the join key into the same bucket count must
    sort-merge join with NO exchange on either side — the co-location
    contract that makes repeated fact-fact joins affordable at 100 TB."""
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .saveAsTable("b_lineitem")
    )
    # at this tiny SF Catalyst would broadcast instead; force the
    # sort-merge path the bucketing exists for (at 100 TB neither fact
    # side is broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        txt = formatted(j)
        assert "SortMergeJoin" in txt, txt
        assert "Exchange" not in txt, txt
        assert j.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_dynamic_partition_overwrite(spark, sf_smoke, tmp_path):
    """Dynamic partition overwrite: rewriting ONE partition's data must
    leave sibling partitions untouched (idempotent daily re-runs at scale
    never truncate the whole table)."""
    out = str(tmp_path / "li_dpo")
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    before = spark.read.parquet(out).count()
    r_rows = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    n_r = r_rows.count()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # rewrite only the R partition with half its rows
        half = r_rows.filter(F.col("l_orderkey") % 2 == 0)
        n_half = half.count()
        half.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
        after = spark.read.parquet(out)
        assert after.filter(F.col("l_returnflag") == "R").count() == n_half
        assert after.count() == before - n_r + n_half  # siblings intact
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_merge_parquet_upserts(spark, tmp_path):
    from etl_pipeline_for_retail_sales_data_spark.sinks import merge_parquet

    out = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    merge_parquet(spark, base, out, ["id"])
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    merge_parquet(spark, updates, out, ["id"])
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(out).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_kmeans_inertia_decreases(spark, sf_smoke):
    from etl_pipeline_for_retail_sales_data_spark.operators.clustering import (
        kmeans_assign,
        kmeans_inertia,
    )
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    i1 = kmeans_inertia(kmeans_assign(emb, k=5, iters=1))
    i3 = kmeans_inertia(kmeans_assign(emb, k=5, iters=3))
    assert i3 <= i1 + 1e-9, (i1, i3)
    out = kmeans_assign(emb, k=5, iters=2)
    assert out.select("cluster").distinct().count() <= 5
    assert out.count() == emb.count()


def test_repartition_by_range_sorted_output(spark, sf_smoke, tmp_path):
    """Range repartitioning: sorted, non-overlapping partitions — the
    layout for sorted parquet output and range-pruned readers. The plan
    must show RangePartitioning, and partition files must hold disjoint
    key ranges."""
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_extendedprice")
    rp = li.repartitionByRange(4, "l_orderkey").sortWithinPartitions("l_orderkey")
    assert "rangepartitioning" in rp._jdf.queryExecution().executedPlan().toString().lower()
    out = str(tmp_path / "ranged")
    rp.write.mode("overwrite").parquet(out)
    import glob as _glob

    ranges = []
    for f in sorted(_glob.glob(out + "/part-*.parquet")):
        pdf = spark.read.parquet(f).agg(
            F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
        ).collect()[0]
        if pdf.lo is not None:
            ranges.append((pdf.lo, pdf.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, ranges  # disjoint, ordered ranges


def test_permissive_corrupt_record_handling(spark, tmp_path):
    """Malformed JSON rows must not kill a 100 TB job: PERMISSIVE mode
    parks them in _corrupt_record for quarantine instead of failing."""
    p = tmp_path / "events.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\nnot json at all\n{"a": bad}\n')
    df = spark.read.schema("a long, b string, _corrupt_record string").option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(str(p))
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.a for r in good} == {1, 2}
    assert len(bad) == 2  # quarantined, not fatal


def test_foreachbatch_incremental_merge(spark, sf_smoke, tmp_path):
    """End-to-end incremental streaming ETL: micro-batches upsert an
    hourly aggregate table via foreachBatch + merge_parquet; the final
    table equals the one-shot batch aggregate (exactly-once semantics per
    batch against an idempotent keyed sink)."""
    from etl_pipeline_for_retail_sales_data_spark.sinks import merge_parquet
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_events
    from etl_pipeline_for_retail_sales_data_spark.streaming.windows import (
        events_stream,
    )

    out = str(tmp_path / "hourly_agg")
    stream = events_stream(spark, sf_smoke)
    agg = stream.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n_events"))

    def upsert(batch_df, batch_id):
        merge_parquet(batch_df.sparkSession, batch_df, out, ["hour", "event_type"])

    q = agg.writeStream.outputMode("complete").foreachBatch(upsert).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.hour, r.event_type): r.n_events for r in spark.read.parquet(out).collect()}
    expect = {
        (r.hour, r.event_type): r.n_events
        for r in load_events(spark, sf_smoke)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert got == expect


def test_daily_pipeline_idempotent_partitions(spark, tmp_path):
    """The reference's daily schedule as engine code: each run replaces
    only its own date partition; re-running a day replaces rather than
    accumulates; other days stay untouched."""
    import datetime

    from etl_pipeline_for_retail_sales_data_spark.plans.daily import run_daily
    from etl_pipeline_for_retail_sales_data_spark.schemas import SALES_SCHEMA

    d1, d2 = datetime.date(2025, 4, 2), datetime.date(2025, 4, 3)
    rows = [
        (1, 101, 3, 60.0, d1, "online"),
        (2, 101, 2, 40.0, d1, "in_store"),
        (3, 102, 1, 25.0, d2, "online"),
        (4, 101, -1, 10.0, d2, "online"),  # cleaned out
    ]
    sales = spark.createDataFrame(rows, SALES_SCHEMA)
    out = str(tmp_path / "daily_summary")

    run_daily(spark, sales, "2025-04-02", out)
    run_daily(spark, sales, "2025-04-03", out)
    got = {
        (str(r.sale_date), r.product_id): (r.total_quantity, r.total_sale_amount)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("2025-04-02", 101): (5, 100.0),
        ("2025-04-03", 102): (1, 25.0),
    }

    # re-run day 2 with revised data: replaces day 2, day 1 untouched
    revised = spark.createDataFrame(
        [(3, 102, 4, 100.0, d2, "online")] + rows[:2], SALES_SCHEMA
    )
    run_daily(spark, revised, "2025-04-03", out)
    got = {
        (str(r.sale_date), r.product_id): (r.total_quantity, r.total_sale_amount)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("2025-04-02", 101): (5, 100.0),
        ("2025-04-03", 102): (4, 100.0),
    }


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE skew handling on a genuinely skewed join: one key holds ~90%
    of the fact rows. With forced sort-merge and low skew thresholds, the
    executed plan must mark the join as skew=true and still return exact
    results."""
    import random

    rng = random.Random(7)
    fact_rows = [(0 if rng.random() < 0.9 else rng.randint(1, 50), i) for i in range(200_000)]
    fact = spark.createDataFrame(fact_rows, "k long, id long").repartition(32)
    dim = spark.createDataFrame([(i, f"n{i}") for i in range(51)], "k long, name string")

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = fact.join(dim, "k")
        # execute THIS DataFrame (count() would plan its own tree and
        # leave j's adaptive plan unfinalized)
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_injection(spark, sf_smoke):
    """Runtime row-level filtering: a selective build side of a shuffle
    join injects a bloom filter (might_contain) onto the probe side, so
    probe rows drop BEFORE the exchange — at 100 TB this is the difference
    between shuffling the whole fact table and shuffling the matching
    slice. (Thresholds lowered to trigger at test scale.)"""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, sf_smoke, "orders").filter(F.col("o_totalprice") > 400000)
        li = load_table(spark, sf_smoke, "lineitem")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        txt = formatted(j)
        assert "might_contain" in txt.lower(), txt[:3000]
        # results identical to the unfiltered-plan join
        n = j.count()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        assert n == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")


def test_daily_pipeline_observation_metrics(spark):
    """observe() collects cleaning telemetry during the action itself —
    no second pass over the day's data."""
    import datetime

    from pyspark.sql import Observation

    from etl_pipeline_for_retail_sales_data_spark.plans.daily import daily_summary
    from etl_pipeline_for_retail_sales_data_spark.schemas import SALES_SCHEMA

    d = datetime.date(2025, 4, 2)
    rows = [
        (1, 101, 3, 60.0, d, "online"),
        (2, 101, -1, 10.0, d, "online"),  # cleaned out
        (3, 102, 2, 40.0, d, "in_store"),
    ]
    sales = spark.createDataFrame(rows, SALES_SCHEMA)
    obs = Observation("dq")
    out = daily_summary(sales, "2025-04-02", observation=obs)
    assert out.count() == 2
    assert obs.get["rows_clean"] == 2
    assert abs(obs.get["amount_clean"] - 100.0) < 1e-9


def test_catalog_ctas_and_insert(spark, sf_smoke, tmp_path):
    """Catalog DML surface: CREATE TABLE AS SELECT, INSERT INTO append,
    and catalog metadata (tableExists / listColumns) round-trip."""
    spark.sql("DROP TABLE IF EXISTS ctas_demo")
    li = load_table(spark, sf_smoke, "lineitem")
    li.limit(100).createOrReplaceTempView("li_src")
    spark.sql(
        f"CREATE TABLE ctas_demo USING parquet LOCATION '{tmp_path}/ctas' "
        "AS SELECT l_orderkey, l_quantity FROM li_src"
    )
    assert spark.catalog.tableExists("ctas_demo")
    n0 = spark.table("ctas_demo").count()
    assert n0 == 100
    spark.sql("INSERT INTO ctas_demo SELECT l_orderkey, l_quantity FROM li_src LIMIT 10")
    assert spark.table("ctas_demo").count() == n0 + 10
    cols = [c.name for c in spark.catalog.listColumns("ctas_demo")]
    assert cols == ["l_orderkey", "l_quantity"]
    spark.sql("DROP TABLE ctas_demo")
