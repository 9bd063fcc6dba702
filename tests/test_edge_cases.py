"""Empty/degenerate-input behavior of the core operators — the edges a
production pipeline hits on quiet days, new partitions, and cold starts."""

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators import dedup as D
from etl_pipeline_for_retail_sales_data_spark.operators.temporal_joins import (
    asof_join_backward,
)
from etl_pipeline_for_retail_sales_data_spark.operators.windows import (
    locf,
    sessionize,
    topk_per_group,
)


def test_asof_with_empty_right(spark):
    left = spark.createDataFrame([(1, "a", 10)], "id long, k string, t long")
    right = spark.createDataFrame([], "k string, rt long, v double")
    out = asof_join_backward(left, right, ["k"], "t", "rt", ["v"]).collect()
    assert len(out) == 1 and out[0].v is None


def test_asof_with_empty_left(spark):
    left = spark.createDataFrame([], "id long, k string, t long")
    right = spark.createDataFrame([("a", 1, 2.0)], "k string, rt long, v double")
    assert asof_join_backward(left, right, ["k"], "t", "rt", ["v"]).count() == 0


def test_dedup_family_on_empty_docs(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert D.doc_dedup_exact(docs).count() == 0
    assert D.ngram_jaccard_pairs(docs, threshold=0.0).count() == 0
    assert D.minhash_candidates(docs).count() == 0
    assert D.simhash_candidates(docs).count() == 0


def test_shingles_below_n_tokens(spark):
    # 1- and 2-token docs produce no 3-gram shingles, not errors
    docs = spark.createDataFrame([(1, "one"), (2, "two words")], "doc_id long, text string")
    assert D.doc_shingles(docs, n=3).count() == 0


def test_windows_on_empty(spark):
    df = spark.createDataFrame([], "g long, v long, id long, t long")
    assert topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], k=3).count() == 0
    assert locf(df, ["g"], ["t"], "v").count() == 0
    ts = spark.createDataFrame([], "user_id long, ts timestamp, event_id long")
    assert sessionize(ts, "user_id", "ts", 1800, tiebreak_col="event_id").count() == 0


def test_single_row_group(spark):
    # degenerate single-row group: rank/lag behave, sessions count 1
    ts = spark.createDataFrame(
        [(1, 100, 7)], "user_id long, sec long, event_id long"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    out = sessionize(ts, "user_id", "ts", 1800, tiebreak_col="event_id").collect()
    assert out[0].session_id == 1


def test_hll_estimate_within_tolerance(spark, sf_smoke):
    # The query now carries its own bounded-error contract (exact count
    # + within-bound booleans, oracle-checked); pin the exact count and
    # the booleans here against an independent aggregation.
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    rows = {r.l_returnflag: r for r in QUERIES["hll_distinct_estimate"](spark, sf_smoke).collect()}
    li = load_table(spark, sf_smoke, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("n")).collect()
    }
    assert set(rows) == set(exact)
    for flag, n in exact.items():
        assert rows[flag].exact_parts == n
        assert rows[flag].hll_within_5pct and rows[flag].hpp_within_10pct
