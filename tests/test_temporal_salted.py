"""Unit tests for the as-of join (union-merge implementation) and the
salted skew join — edge semantics that the oracle queries don't isolate."""

import datetime

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators.joins import salted_join
from etl_pipeline_for_retail_sales_data_spark.operators.temporal_joins import (
    asof_join_backward,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:30:00")),
            (2, "a", _ts("2024-01-01 01:00:00")),  # exactly at tick t2
            (3, "a", _ts("2024-01-01 02:15:00")),
            (4, "b", _ts("2024-01-01 00:10:00")),  # before any b tick
        ],
        "id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 10.0),
            ("a", _ts("2024-01-01 01:00:00"), 20.0),
            ("b", _ts("2024-01-01 01:00:00"), 99.0),
        ],
        "key string, tick_ts timestamp, px double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r.id: (r.px, r["__matched_ts"])
        for r in asof_join_backward(left, right, ["key"], "ts", "tick_ts", ["px"]).collect()
    }
    assert out[1] == (10.0, _ts("2024-01-01 00:00:00"))
    assert out[2] == (20.0, _ts("2024-01-01 01:00:00"))  # equal ts matches
    assert out[3] == (20.0, _ts("2024-01-01 01:00:00"))
    assert out[4] == (None, None)  # no prior tick → left semantics


def test_asof_backward_exclusive(spark):
    left, right = _frames(spark)
    out = {
        r.id: r.px
        for r in asof_join_backward(
            left, right, ["key"], "ts", "tick_ts", ["px"], inclusive=False
        ).collect()
    }
    assert out[2] == 10.0  # strictly-before: the 01:00 tick is NOT visible


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(100)], "k long, id long, v double"
    )
    dim = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, name string")
    plain = {(r.id, r.name) for r in fact.join(dim, "k").collect()}
    salted = {
        (r.id, r.name)
        for r in salted_join(fact, dim, "k", n_salts=4, salt_source="id").collect()
    }
    assert salted == plain


def test_salted_join_left_outer_preserves_unmatched(spark):
    fact = spark.createDataFrame([(0, 1), (9, 2)], "k long, id long")
    dim = spark.createDataFrame([(0, "x")], "k long, name string")
    out = {r.id: r.name for r in salted_join(fact, dim, "k", 4, "id", how="left").collect()}
    assert out == {1: "x", 2: None}


def test_frame_sample_bounds(spark, sf_smoke):
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    rows = QUERIES["multimodal_frame_sample"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r.frame_idx < r.n_frames
    # every doc samples at most 4 frames and always frame 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for idxs in by_doc.values():
        assert len(idxs) <= 4 and min(idxs) == 0


def test_feature_extraction_deterministic_and_normalized(spark, sf_smoke):
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    a = {r.doc_id: r.features for r in QUERIES["multimodal_features"](spark, sf_smoke).collect()}
    b = {r.doc_id: r.features for r in QUERIES["multimodal_features"](spark, sf_smoke).collect()}
    assert a == b, "feature extraction is nondeterministic"
    for feats in a.values():
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-9  # L1-normalized histogram


def test_apply_in_pandas_zscore_equals_window(spark, sf_smoke):
    """Grouped-map applyInPandas must agree with the JVM window z-score
    to the round6 grid (the grouped map computes the integer-variance
    exact form and rounds to 1e-6 for oracle parity; values are exact
    cents, so the two formulations differ only by float accumulation
    order + the rounding grid)."""
    from pyspark.sql import Window

    from etl_pipeline_for_retail_sales_data_spark.operators.pandas_ops import zscore_per_user
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_events

    ev = load_events(spark, sf_smoke)
    got = {r.event_id: r.zscore for r in zscore_per_user(ev).collect()}
    w = Window.partitionBy("user_id")
    native = ev.select(
        "event_id",
        ((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)).alias("z"),
    )
    expect = {r.event_id: r.z for r in native.collect()}
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6, k


def test_map_in_arrow_byte_lengths(spark, sf_smoke):
    from etl_pipeline_for_retail_sales_data_spark.operators.multimodal import attach_binary
    from etl_pipeline_for_retail_sales_data_spark.operators.pandas_ops import (
        byte_lengths_arrow,
    )
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table

    media = attach_binary(load_table(spark, sf_smoke, "documents"))
    got = {r.doc_id: r.payload_len_arrow for r in byte_lengths_arrow(media).collect()}
    expect = {r.doc_id: r.payload_len for r in media.collect()}
    assert got == expect


def test_salted_join_rejects_outer_modes(spark):
    import pytest as _pytest

    fact = spark.createDataFrame([(0, 1)], "k long, id long")
    dim = spark.createDataFrame([(0, "x")], "k long, name string")
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError, match="fact-side"):
            salted_join(fact, dim, "k", 4, "id", how=how)


def test_asof_rejects_value_col_collision(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, "a", 10, 5.0)], "id long, k string, t long, px double")
    right = spark.createDataFrame([("a", 1, 2.0)], "k string, rt long, px double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join_backward(left, right, ["k"], "t", "rt", ["px"])


def test_merge_parquet_rejects_remote_scheme(spark):
    import pytest as _pytest

    from etl_pipeline_for_retail_sales_data_spark.sinks import merge_parquet

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError, match="local-FS"):
        merge_parquet(spark, df, "s3://bucket/table", ["id"])


def test_apply_in_arrow_profile_equals_jvm_agg(spark, sf_smoke):
    from pyspark.sql import functions as F

    from etl_pipeline_for_retail_sales_data_spark.operators.pandas_ops import (
        user_value_profile_arrow,
    )
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_events

    ev = load_events(spark, sf_smoke)
    got = {r.user_id: (r.n_events, r.total_value, r.max_value)
           for r in user_value_profile_arrow(ev).collect()}
    want = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6
        assert got[k][2] == want[k][2]
