"""Semantic tests for blocked_name_pairs, cusum_changepoint, and
target_encode_loo — hand-built inputs where the right answer is known
(oracle matches prove cross-engine agreement only)."""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators.drift import cusum_changepoint
from etl_pipeline_for_retail_sales_data_spark.operators.features import target_encode_loo
from etl_pipeline_for_retail_sales_data_spark.operators.linkage import blocked_name_pairs


def test_linkage_finds_near_names_within_block(spark):
    rows = [
        (1, "acme corp"), (2, "acme corp"), (3, "acmee corp"),  # dist 1
        (4, "zenith corp"),                                      # dist 4+ from acme
        (5, "acme ltd"),                                         # other block
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    blk = F.split_part(F.col("name"), F.lit(" "), F.lit(2))
    out = blocked_name_pairs(df, "name", blk, max_dist=2).collect()
    pairs = {(r["name_a"], r["name_b"]): r for r in out}
    assert ("acme corp", "acmee corp") in pairs
    r = pairs[("acme corp", "acmee corp")]
    assert r["dist"] == 1 and r["n_a"] == 2 and r["n_b"] == 1
    # zenith is in the corp block but beyond max_dist; ltd-block has one name
    assert len(pairs) == 1


def test_linkage_max_block_drops_hot_blocks(spark):
    rows = [(i, f"name{i} hub") for i in range(10)] + [(100, "a x"), (101, "b x")]
    df = spark.createDataFrame(rows, "id long, name string")
    blk = F.split_part(F.col("name"), F.lit(" "), F.lit(2))
    capped = blocked_name_pairs(df, "name", blk, max_dist=9, max_block=5).collect()
    # the 10-name "hub" block is dropped; the 2-name "x" block survives
    assert {r["blk"] for r in capped} == {"x"}


def test_cusum_locates_planted_level_shift(spark):
    # 20 days at 100.00, then 20 days at 500.00: CUSUM extremum at the
    # last low day, and the series steps UP after it
    rows = []
    d0 = datetime.date(2024, 1, 1)
    for i in range(40):
        v = 100.0 if i < 20 else 500.0
        rows.append((d0 + datetime.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "d date, v double")
    out = cusum_changepoint(
        df, F.col("d"), F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    ).collect()[0]
    assert out["changepoint"] == datetime.date(2024, 1, 20)
    assert out["direction"] == "up"
    assert out["n_periods"] == 40
    # |CUSUM| at the extremum: 20 days * |100 - 300| = 4000.00
    assert out["cusum_scaled"] == pytest.approx(4000.0)


def test_cusum_downward_shift(spark):
    rows = []
    d0 = datetime.date(2024, 1, 1)
    for i in range(10):
        v = 900.0 if i < 5 else 100.0
        rows.append((d0 + datetime.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "d date, v double")
    out = cusum_changepoint(
        df, F.col("d"), F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    ).collect()[0]
    assert out["direction"] == "down"
    assert out["changepoint"] == datetime.date(2024, 1, 5)


def test_target_encode_loo_hand_values(spark):
    # category A: targets 1.00, 2.00, 3.00 -> LOO for the 1.00 row = 2.50
    # category B singleton: falls back to global LOO = (1+2+3)/4... minus own
    rows = [(1, "A", 1.0), (2, "A", 2.0), (3, "A", 3.0), (4, "B", 9.0)]
    df = spark.createDataFrame(rows, "k long, cat string, v double")
    out = {
        r["k"]: r
        for r in target_encode_loo(
            df,
            F.col("cat"),
            F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long"),
            keys=["k"],
        ).collect()
    }
    assert out[1]["encoded"] == pytest.approx(2.5)
    assert out[2]["encoded"] == pytest.approx(2.0)
    assert out[3]["encoded"] == pytest.approx(1.5)
    assert out[1]["from_category"]
    # singleton B: global LOO = (100+200+300+900-900)/(4-1) cents = 2.0
    assert not out[4]["from_category"]
    assert out[4]["encoded"] == pytest.approx(2.0)


def test_target_encode_no_self_leakage(spark):
    # two rows per category with different targets: each row's encoding
    # equals the OTHER row's value exactly
    rows = [(1, "A", 10.0), (2, "A", 30.0)]
    df = spark.createDataFrame(rows, "k long, cat string, v double")
    out = {
        r["k"]: r["encoded"]
        for r in target_encode_loo(
            df,
            F.col("cat"),
            F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long"),
            keys=["k"],
        ).collect()
    }
    assert out[1] == pytest.approx(30.0)
    assert out[2] == pytest.approx(10.0)


def test_touch_attribution_credits_correct_channels(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.windows import (
        touch_attribution,
    )

    # u1: view -> click -> purchase(10): first=view last=click
    # u2: purchase(5) with no preceding touch: none/none
    # u3: click -> purchase(2) -> view -> purchase(3): click/click then view/view
    rows = [
        (1, 1, "view", 0.0), (2, 1, "click", 0.0), (3, 1, "purchase", 10.0),
        (4, 2, "purchase", 5.0),
        (5, 3, "click", 0.0), (6, 3, "purchase", 2.0),
        (7, 3, "view", 0.0), (8, 3, "purchase", 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, value double")
    df = df.withColumn("ts", F.col("event_id").cast("timestamp"))
    out = touch_attribution(
        df,
        user="user_id",
        order_cols=["ts", "event_id"],
        is_conversion=F.col("event_type") == "purchase",
        is_touch=F.col("event_type").isin("view", "click"),
        channel=F.col("event_type"),
        value_cents=F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
    ).collect()
    m = {(r["first_touch"], r["last_touch"]): r for r in out}
    assert m[("view", "click")]["attributed_revenue"] == pytest.approx(10.0)
    assert m[("none", "none")]["n_conversions"] == 1
    assert m[("click", "click")]["attributed_revenue"] == pytest.approx(2.0)
    # u3's second purchase: first touch is still the click, last is the view
    assert m[("click", "view")]["attributed_revenue"] == pytest.approx(3.0)
    assert len(m) == 4


def test_domain_upsample_copy_counts(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.selection import (
        domain_upsample,
    )

    rows = [(i, "x", "hi") for i in range(200)] + [(1000 + i, "y", "lo") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = domain_upsample(df, {"hi": 2.5, "lo": 0.5}, domain_col="text")
    per = {r["text"]: r["n"] for r in out.groupBy("text").agg(F.count("*").alias("n")).collect()}
    # hi: 2x base + ~half get a 3rd copy; lo: ~half survive once
    assert 400 <= per["hi"] <= 600 and abs(per["hi"] - 500) < 60
    assert abs(per["lo"] - 100) < 40
    # deterministic: second run identical
    per2 = {r["text"]: r["n"] for r in domain_upsample(df, {"hi": 2.5, "lo": 0.5}, domain_col="text").groupBy("text").agg(F.count("*").alias("n")).collect()}
    assert per == per2
    # copy indices are dense 1..n_copies per doc
    c = out.filter(F.col("doc_id") == 0).select("copy").collect()
    assert sorted(r["copy"] for r in c) == list(range(1, len(c) + 1))


def test_benford_conforming_sample_passes(spark):
    """A geometric (log-uniform) series follows Benford; a constant-digit
    series does not. Run the registry query's logic via the oracle twin
    on hand-built frames to pin the statistic's semantics."""
    import math

    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    # build a parquet orders table in a temp sf_dir with log-uniform prices
    import tempfile, os
    d = tempfile.mkdtemp()
    n = 9000
    vals = [(10 ** (3 + (i * 2.0 / n)),) for i in range(n)]  # log-uniform 1e3..1e5
    spark.createDataFrame(vals, "o_totalprice double").write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    out = QUERIES["benford_price_audit"](spark, d).collect()[0]
    assert not out["deviates"], f"log-uniform sample flagged: chisq={out['chisq']}"

    d2 = tempfile.mkdtemp()
    spark.createDataFrame(
        [(5000.0 + i,) for i in range(3000)], "o_totalprice double"
    ).write.mode("overwrite").parquet(os.path.join(d2, "orders.parquet"))
    out2 = QUERIES["benford_price_audit"](spark, d2).collect()[0]
    assert out2["deviates"] and out2["chisq"] > out["chisq"]


def test_conversion_latency_hand_values(spark):
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES
    import datetime, os, tempfile

    t0 = datetime.datetime(2024, 1, 1)
    s = lambda sec: t0 + datetime.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # u1: view@0, purchase@10, purchase@5? (before view excluded)
        (1, s(0), 1, "view", 0.0, "{}"),
        (2, s(10), 1, "purchase", 1.0, "{}"),
        (3, s(999), 1, "purchase", 1.0, "{}"),  # later purchase ignored (min)
        # u2: purchase BEFORE any view: not converted
        (4, s(5), 2, "purchase", 1.0, "{}"),
        (5, s(9), 2, "view", 0.0, "{}"),
        # u3: view only: not converted
        (6, s(1), 3, "view", 0.0, "{}"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = QUERIES["conversion_latency"](spark, d).collect()[0]
    assert out["n_converted"] == 1
    assert out["p50_us"] == 10_000_000


def test_phash_identical_payloads_collide_at_zero(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.multimodal import (
        perceptual_hash_pairs,
    )

    rows = [
        (1, "aaaabbbbccccdddd" * 4),
        (2, "aaaabbbbccccdddd" * 4),   # identical -> hamming 0
        (3, "zzzzyyyyxxxxwwww" * 4),   # different char mass
        (4, None),                      # null payload dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = perceptual_hash_pairs(df).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs.get((1, 2)) == 0
    assert all(a != 4 and b != 4 for a, b in pairs)


def test_phash_max_band_bounds_fanout(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.multimodal import (
        perceptual_hash_pairs,
    )

    # 50 identical docs: uncapped lists all C(50,2) pairs; cap 10 kills
    # the hot bands entirely
    rows = [(i, "same payload bytes everywhere") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert perceptual_hash_pairs(df).count() == 50 * 49 // 2
    assert perceptual_hash_pairs(df, max_band=10).count() == 0


def test_cusum_shift_invariance(spark):
    """Adding a constant to every period's value leaves deviations from
    the mean — hence the statistic, location, and direction — unchanged."""
    import datetime

    d0 = datetime.date(2024, 1, 1)
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [(d0 + datetime.timedelta(days=i), float(v)) for i, v in enumerate(vals)]
    rows_shifted = [(d, v + 1000.0) for d, v in rows]
    mk = lambda r: spark.createDataFrame(r, "d date, v double")  # noqa: E731
    cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    a = cusum_changepoint(mk(rows), F.col("d"), cents).collect()[0]
    b = cusum_changepoint(mk(rows_shifted), F.col("d"), cents).collect()[0]
    assert a["changepoint"] == b["changepoint"]
    assert a["cusum_scaled"] == b["cusum_scaled"]
    assert a["direction"] == b["direction"]


def test_target_encode_reconstruction(spark):
    """Every row's encoding equals the independently recomputed
    (Σ_g − x_i)/(n_g − 1) on randomized data — pins the formula against
    a plain-Python reference, not just the hand-picked cases."""
    import random

    rng = random.Random(7)
    rows = [(i, f"C{i % 5}", rng.randrange(1, 10_000) / 100) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, cat string, v double")
    cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")
    enc = target_encode_loo(df, F.col("cat"), cents, keys=["k"]).collect()
    vals = {r[0]: int(round(r[2] * 100)) for r in rows}  # k -> cents
    by_cat = {}
    for k, c, _ in rows:
        by_cat.setdefault(c, []).append(vals[k])
    for r in enc:
        c = r["category"]
        sg, ng = sum(by_cat[c]), len(by_cat[c])
        expect = round((sg - vals[r["k"]]) / (ng - 1) / 100, 6)
        assert abs(r["encoded"] - expect) < 1e-6, (r, expect)


def test_linkage_symmetric_under_input_order(spark):
    """Pair list is a pure function of the name SET — row order and
    duplication of records must not change the pairs, only the counts."""
    rows = [(i, n) for i, n in enumerate(["ab x", "ac x", "ad x"])]
    df1 = spark.createDataFrame(rows, "id long, name string")
    df2 = spark.createDataFrame(rows[::-1] + rows, "id long, name string")
    blk = F.split_part(F.col("name"), F.lit(" "), F.lit(2))
    p1 = {(r["name_a"], r["name_b"], r["dist"]) for r in blocked_name_pairs(df1, "name", blk).collect()}
    p2 = {(r["name_a"], r["name_b"], r["dist"]) for r in blocked_name_pairs(df2, "name", blk).collect()}
    assert p1 == p2 and len(p1) == 3


def test_phash_empty_payloads_excluded(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.multimodal import (
        perceptual_hash_pairs,
    )

    rows = [(1, ""), (2, ""), (3, "real content here"), (4, "real content here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in perceptual_hash_pairs(df).collect()}
    # empty payloads must not pair with anything (sequence(1,0) is
    # descending in Spark and would otherwise fabricate a signature)
    assert pairs == {(3, 4)}


def test_corr_matrix_exact_known_correlations(spark, tmp_path):
    import os

    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    # qty i, price = 2*i (corr +1), discount = -3*i (corr -1)
    rows = [(float(i), i * 2.0 / 100, -3.0 * i / 10000) for i in range(1, 101)]
    d = str(tmp_path / "sfx")
    spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, l_discount double"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    out = QUERIES["corr_matrix_exact"](spark, d).collect()[0]
    assert out["corr_qty_price"] == 1.0
    assert out["corr_qty_disc"] == -1.0
    assert out["corr_price_disc"] == -1.0
    assert out["n_rows"] == 100
