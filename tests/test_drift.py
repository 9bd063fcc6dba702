"""Chi-square distribution drift (operators/drift.py)."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators.drift import chisq_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "p int, cat string")


def _result(spark, rows):
    out = chisq_drift(_df(spark, rows), F.col("p"), F.col("cat"))
    return {r["period"]: r for r in out.collect()}


def test_identical_distribution_zero_chisq(spark):
    rows = [(1, c) for c in "aabb"] + [(2, c) for c in "aabb"]
    res = _result(spark, rows)
    assert res[2]["chisq"] == 0.0
    assert res[2]["df"] == 1
    assert not res[2]["drift"]


def test_known_statistic_hand_computed(spark):
    # prev: a=2, b=2 (total 4); cur: a=6, b=2 (total 8)
    # expected: a=4, b=4 → X² = (6-4)²/4 + (2-4)²/4 = 1 + 1 = 2
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "b")] + \
           [(2, "a")] * 6 + [(2, "b")] * 2
    res = _result(spark, rows)
    assert res[2]["chisq"] == pytest.approx(2.0)
    assert res[2]["n_current"] == 8
    assert not res[2]["drift"]  # crit(df=1) = 3.841


def test_strong_shift_flags_drift(spark):
    # prev: a=50, b=50; cur: a=95, b=5 → X² = (95-50)²/50 + (5-50)²/50 = 81
    rows = [(1, "a")] * 50 + [(1, "b")] * 50 + [(2, "a")] * 95 + [(2, "b")] * 5
    res = _result(spark, rows)
    assert res[2]["chisq"] == pytest.approx(81.0)
    assert res[2]["drift"]


def test_category_absent_in_previous_period_excluded(spark):
    # 'c' appears only in period 2: no expected count → excluded, df
    # computed from the categories actually tested
    rows = [(1, "a")] * 4 + [(1, "b")] * 4 + \
           [(2, "a")] * 4 + [(2, "b")] * 4 + [(2, "c")] * 2
    res = _result(spark, rows)
    assert res[2]["df"] == 1  # only a, b tested
    assert res[2]["n_current"] == 8  # c's rows not counted in the test


def test_chain_of_periods_each_vs_predecessor(spark):
    rows = [(1, "a")] * 4 + [(2, "a")] * 4 + [(3, "a")] * 4
    res = _result(spark, rows)
    assert set(res) == {2, 3}  # period 1 has no predecessor
    assert res[2]["chisq"] == 0.0 and res[3]["chisq"] == 0.0


def test_single_period_empty_result(spark):
    assert not _result(spark, [(1, "a"), (1, "b")])


# ---------------------------------------------------------------------------
# KS two-sample drift
# ---------------------------------------------------------------------------

from etl_pipeline_for_retail_sales_data_spark.operators.drift import ks_drift  # noqa: E402


def _ks(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    df = spark.createDataFrame(rows, "s string, v double")
    return ks_drift(df, F.col("s"), F.col("v")).collect()[0]


def test_ks_identical_samples_zero(spark):
    r = _ks(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    assert r["d_scaled"] == 0 and r["ks"] == 0.0 and not r["drift"]


def test_ks_known_statistic(spark):
    # a = {1,2}, b = {3,4}: ECDFs fully separated → D = 1 → d_scaled = n_a*n_b
    r = _ks(spark, [1, 2], [3, 4])
    assert r["d_scaled"] == 4 and r["ks"] == 1.0
    # D=1 with n=m=2: D² = 16 > 1.844·4·2·2 = 29.5? No → not significant
    assert not r["drift"]


def test_ks_hand_computed_partial_overlap(spark):
    # a = {1,3}, b = {2,4}: at v=1 |1·2−0·2|=2; v=2 |1·2−1·2|=0;
    # v=3 |2·2−1·2|=2; v=4 0 → D_scaled = 2, KS = 0.5
    r = _ks(spark, [1, 3], [2, 4])
    assert r["d_scaled"] == 2 and r["ks"] == 0.5


def test_ks_large_separation_flags_drift(spark):
    r = _ks(spark, range(100), range(200, 300))
    assert r["ks"] == 1.0 and r["drift"]


def test_ks_shifted_large_sample_drifts_small_does_not(spark):
    small = _ks(spark, [1, 2, 3, 4, 5], [2, 3, 4, 5, 6])
    assert not small["drift"]
    big = _ks(spark, range(1000), [v + 200 for v in range(1000)])
    assert big["drift"]


def test_ks_ties_handled_at_distinct_values(spark):
    # heavy ties: a = 6×{1}, b = 3×{1} + 3×{2} → at v=1: |6·6−3·6|=18
    r = _ks(spark, [1] * 6, [1, 1, 1, 2, 2, 2])
    assert r["n_a"] == 6 and r["n_b"] == 6
    assert r["d_scaled"] == 18 and r["ks"] == 0.5


def test_ks_accepts_temporal_columns_and_rejects_strings(spark):
    """ADVICE r10: the bucketed ECDF must keep taking any orderable
    column the pre-bucketing plan took — dates and timestamps key
    through their monotone numeric image; strings raise a typed error
    up front instead of failing inside an ANSI cast."""
    import datetime as dt

    rows = [("a", dt.date(2024, 1, d)) for d in range(1, 9)] + [
        ("b", dt.date(2024, 1, d + 4)) for d in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "s string, v date")
    r = ks_drift(df, F.col("s"), F.col("v")).collect()[0]
    # shift by 4 of 8: D = 4/8 → d_scaled = 0.5·8·8 = 32
    assert r["n_a"] == 8 and r["n_b"] == 8 and r["d_scaled"] == 32

    ts = df.select("s", F.col("v").cast("timestamp").alias("v"))
    r2 = ks_drift(ts, F.col("s"), F.col("v")).collect()[0]
    assert r2["d_scaled"] == 32  # same order → same exact statistic

    with pytest.raises(TypeError, match="monotone numeric image"):
        ks_drift(df.select("s", F.lit("x").alias("v")), F.col("s"), F.col("v"))


def test_ks_matches_scipy_when_available(spark):
    try:
        from scipy.stats import ks_2samp
    except ImportError:
        pytest.skip("scipy not in container")
    import random

    rng = random.Random(7)
    a = [rng.gauss(0, 1) for _ in range(80)]
    b = [rng.gauss(0.5, 1.2) for _ in range(60)]
    r = _ks(spark, a, b)
    expect = ks_2samp(a, b).statistic
    assert r["ks"] == pytest.approx(expect, abs=2e-6)


# ---------------------------------------------------------------------------
# EWMA closed form (registry query) vs naive recursion
# ---------------------------------------------------------------------------


def test_ewma_closed_form_equals_naive_recursion(spark, sf_smoke):
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    out = QUERIES["ewma_monthly_revenue"](spark, sf_smoke).orderBy("month_index").collect()
    assert len(out) > 10
    s = None
    for r in out:
        s = r["revenue"] if s is None else (r["revenue"] + s) / 2
        assert r["ewma"] == pytest.approx(s, abs=0.011)  # both rounded to cents


def test_psi_binned_detects_planted_shift(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.drift import psi_binned
    from pyspark.sql import functions as F

    ref = spark.createDataFrame([(i % 1000,) for i in range(5000)], "c long")
    same = spark.createDataFrame([((i * 7) % 1000,) for i in range(5000)], "c long")
    shifted = spark.createDataFrame([(500 + i % 1000,) for i in range(5000)], "c long")
    ok = psi_binned(ref, same, F.col("c")).collect()[0]
    bad = psi_binned(ref, shifted, F.col("c")).collect()[0]
    assert not ok["drift"] and ok["psi"] < 0.05
    assert bad["drift"] and bad["psi"] > ok["psi"]
    assert ok["n_bins_used"] == 10 and ok["n_ref"] == 5000


def test_psi_binned_empty_current_degrades(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.drift import psi_binned
    from pyspark.sql import functions as F

    ref = spark.createDataFrame([(i,) for i in range(100)], "c long")
    cur = ref.filter(F.col("c") < 0)
    out = psi_binned(ref, cur, F.col("c")).collect()[0]
    assert out["n_cur"] == 0 and out["psi"] is not None


def test_psi_binned_matches_python_reference(spark):
    """Pin the binned-PSI formula against an independent plain-Python
    implementation on randomized integer data (an oracle MATCH only
    proves both engines run the same formula — NOTES.md lesson)."""
    import math
    import random

    from etl_pipeline_for_retail_sales_data_spark.operators.drift import psi_binned
    from pyspark.sql import functions as F

    rng = random.Random(42)
    ref_vals = [rng.randrange(0, 500) for _ in range(800)]
    cur_vals = [rng.randrange(100, 900) for _ in range(600)]

    def py_psi(ref, cur, n_bins=10):
        srt = sorted(ref)
        # percentile_disc: smallest value with cume_dist >= q
        edges = [srt[math.ceil(i / n_bins * len(srt)) - 1] for i in range(1, n_bins)]
        def bin_of(x):
            return sum(x > e for e in edges)
        rb = [0] * n_bins
        cb = [0] * n_bins
        for x in ref:
            rb[bin_of(x)] += 1
        for x in cur:
            cb[bin_of(x)] += 1
        nr, nc = len(ref), len(cur)
        total_u = 0
        for b in range(n_bins):
            p_cur = (cb[b] + 1) / (nc + n_bins)
            p_ref = (rb[b] + 1) / (nr + n_bins)
            ratio = ((cb[b] + 1) * (nr + n_bins)) / ((rb[b] + 1) * (nc + n_bins))
            total_u += math.floor((p_cur - p_ref) * math.log(ratio) * 1e6 + 0.5)
        return math.floor(total_u / 100 + 0.5) / 1e4

    ref_df = spark.createDataFrame([(v,) for v in ref_vals], "c long")
    cur_df = spark.createDataFrame([(v,) for v in cur_vals], "c long")
    out = psi_binned(ref_df, cur_df, F.col("c")).collect()[0]
    assert out["psi"] == pytest.approx(py_psi(ref_vals, cur_vals), abs=1e-9)
    assert out["n_ref"] == 800 and out["n_cur"] == 600


def test_acf_detects_planted_period(spark):
    """ACF of a clean period-4 integer series peaks at lag 4 (value ~1)
    and matches a direct numpy computation at every lag."""
    import datetime

    import numpy as np

    from etl_pipeline_for_retail_sales_data_spark.operators.windows import acf

    base = datetime.date(2024, 1, 1)
    vals = [100, 250, 400, 150] * 16  # 64 days, exact period 4
    rows = [(base + datetime.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "d date, x long")
    got = {r.lag: r.acf for r in acf(df, "d", F.col("x"), max_lag=8).collect()}
    c = np.array(vals, dtype=float) - np.mean(vals)
    den = float(np.dot(c, c))
    for lag in range(1, 9):
        expect = float(np.dot(c[lag:], c[:-lag])) / den
        assert abs(got[lag] - expect) < 2e-6, (lag, got[lag], expect)
    # biased estimator: perfect period gives (n-lag)/n, so 60/64 and 56/64
    assert got[4] > 0.9 and got[8] > 0.85
    assert got[1] < got[4] and got[3] < got[4]


def test_acf_sums_duplicate_timestamps_per_bucket(spark):
    """Multiple rows on the same day aggregate into one bucket before the
    fold — the series length is the number of distinct days."""
    import datetime

    from etl_pipeline_for_retail_sales_data_spark.operators.windows import acf

    base = datetime.date(2024, 1, 1)
    rows = []
    for i in range(10):
        rows += [
            (base + datetime.timedelta(days=i), 50 + i),
            (base + datetime.timedelta(days=i), 50 - i),
        ]
    df = spark.createDataFrame(rows, "d date, x long")
    # constant per-day sums (100) → zero variance → undefined ACF → no rows
    assert acf(df, "d", F.col("x"), max_lag=3).count() == 0
    rows.append((base + datetime.timedelta(days=9), 7))  # break the constancy
    df2 = spark.createDataFrame(rows, "d date, x long")
    out = acf(df2, "d", F.col("x"), max_lag=3).collect()
    assert all(r.n_days == 10 for r in out) and len(out) == 3


def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from etl_pipeline_for_retail_sales_data_spark.operators.drift import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [(i, 100.0 + (i % 7)) for i in range(400)], "k long, v double"
    )
    out = poisson_bootstrap_ci(
        df, key=F.col("k"), value_cents=F.floor(F.col("v") * 100 + F.lit(0.5))
    ).collect()[0]
    assert out["n_rows"] == 400 and out["n_replicates"] == 32
    # the CI must bracket the full-sample mean and be tight for a
    # low-variance sample (values within [100, 106])
    assert out["boot_lo"] <= out["mean_value"] <= out["boot_hi"]
    assert 100.0 <= out["boot_lo"] <= out["boot_hi"] <= 106.0
    assert out["boot_hi"] - out["boot_lo"] < 1.0
    # deterministic: identical on rerun
    again = poisson_bootstrap_ci(
        df, key=F.col("k"), value_cents=F.floor(F.col("v") * 100 + F.lit(0.5))
    ).collect()[0]
    assert again == out


def test_poisson_bootstrap_empty_input_degrades(spark):
    from pyspark.sql import functions as F

    from etl_pipeline_for_retail_sales_data_spark.operators.drift import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame([], "k long, v double")
    out = poisson_bootstrap_ci(
        df, key=F.col("k"), value_cents=F.floor(F.col("v") * 100 + F.lit(0.5))
    ).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 0 and out[0]["mean_value"] == 0.0


def test_bootstrap_uplift_detects_planted_effect(spark):
    import os
    import tempfile

    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    # 400 users, planted effect: variant 1 converts 60%, variant 0 only 10%
    rows = []
    eid = 0
    for uid in range(400):
        # residue independent of the parity split: variant 1 converts 60%,
        # variant 0 converts 10%
        conv = ((uid // 2) % 10) < (6 if uid % 2 == 1 else 1)
        rows.append((eid, "2024-01-01 00:00:00", uid, "view", 1.0, "{}")); eid += 1
        if conv:
            rows.append((eid, "2024-01-01 01:00:00", uid, "purchase", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["bootstrap_uplift_events"](spark, d).collect()[0]
    assert out["n_users"] == 400
    assert abs(out["rate_control"] - 0.1) < 0.001
    assert abs(out["rate_treatment"] - 0.6) < 0.001
    # the CI must bracket the planted uplift and exclude zero
    assert out["boot_lo"] <= out["uplift"] <= out["boot_hi"]
    assert out["significant"] and out["boot_lo"] > 0
