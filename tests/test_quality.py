"""Declarative data-quality suite (operators/quality.py)."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators import quality as Q


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        # id, amount, status, code, parent_id
        (1, 10.0, "OK", "A1", 100),
        (2, -5.0, "OK", "B2", 100),      # negative amount
        (3, None, "BAD", "C3", 200),     # null amount, bad status
        (3, 7.0, "OK", "zz", 999),       # dup id, bad code, orphan parent
        (None, 3.0, "OK", "D4", None),   # null id (null parent: not an FK violation)
    ]
    return spark.createDataFrame(
        rows, "id long, amount double, status string, code string, parent_id long"
    )


@pytest.fixture(scope="module")
def parents(spark):
    return spark.createDataFrame([(100,), (200,)], "pid long")


def _report(df, checks):
    return {r["check"]: (r["n_violations"], r["passed"]) for r in Q.run_checks(df, checks).collect()}


def test_row_local_checks(messy):
    rep = _report(
        messy,
        [
            Q.not_null("id"),
            Q.not_null("amount"),
            Q.non_negative("amount"),
            Q.accepted_values("status", "OK", "PENDING"),
            Q.matches_regex("code", "^[A-Z][0-9]$"),
            Q.in_range("amount", 0.0, 100.0),
            Q.satisfies("amount_under_20", F.coalesce(F.col("amount"), F.lit(0.0)) < 20),
        ],
    )
    assert rep["not_null(id)"] == (1, False)
    assert rep["not_null(amount)"] == (1, False)
    assert rep["non_negative(amount)"] == (1, False)
    assert rep["accepted_values(status)"] == (1, False)
    assert rep["matches_regex(code)"] == (1, False)   # only 'zz' (nulls skipped)
    assert rep["in_range(amount,0.0,100.0)"] == (1, False)  # -5; null skipped
    assert rep["satisfies(amount_under_20)"] == (0, True)


def test_unique_counts_all_rows_in_dup_groups(messy):
    rep = _report(messy, [Q.unique("id")])
    # id=3 appears twice → both rows count as violations
    assert rep["unique(id)"] == (2, False)
    rep2 = _report(messy, [Q.unique("id", "code")])
    assert rep2["unique(id,code)"] == (0, True)


def test_foreign_key_orphans_and_null_exemption(messy, parents):
    rep = _report(messy, [Q.foreign_key("parent_id", parents, "pid")])
    # 999 is an orphan; NULL parent is exempt (use not_null to forbid)
    assert rep["foreign_key(parent_id)"] == (1, False)


def test_clean_table_passes_everything(spark, parents):
    clean = spark.createDataFrame(
        [(1, 5.0, "OK", "A1", 100), (2, 6.0, "OK", "B2", 200)],
        "id long, amount double, status string, code string, parent_id long",
    )
    out = Q.run_checks(
        clean,
        [
            Q.not_null("id"),
            Q.non_negative("amount"),
            Q.unique("id"),
            Q.foreign_key("parent_id", parents, "pid"),
        ],
    ).collect()
    assert len(out) == 4 and all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_empty_table_all_pass(spark, parents):
    empty = spark.createDataFrame([], "id long, amount double, parent_id long")
    out = Q.run_checks(
        empty,
        [Q.not_null("id"), Q.unique("id"), Q.foreign_key("parent_id", parents, "pid")],
    ).collect()
    assert len(out) == 3 and all(r["n_violations"] == 0 and r["passed"] for r in out)


def test_no_checks_empty_report(messy):
    assert Q.run_checks(messy, []).count() == 0


def test_assert_checks_raises_with_failures_listed(messy):
    with pytest.raises(ValueError, match=r"not_null\(id\): 1 violations"):
        Q.assert_checks(messy, [Q.not_null("id"), Q.non_negative("amount")])
    Q.assert_checks(messy, [Q.not_null("status")])  # clean → no raise


def test_row_local_suite_is_single_scan(messy):
    """All row-local checks fuse into one aggregation pass: the physical
    plan scans the input exactly once."""
    rep = Q.run_checks(
        messy, [Q.not_null("id"), Q.non_negative("amount"), Q.not_null("status")]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") == 1


def test_check_name_quote_escaping(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = Q.run_checks(df, [Q.satisfies("it's positive", F.col("id") > 0)]).collect()
    assert out[0]["check"] == "satisfies(it's positive)"
    assert out[0]["passed"]


# ---------------------------------------------------------------------------
# Metric checks (dataset-level)
# ---------------------------------------------------------------------------


def test_metric_checks_pass_and_fail(messy):
    rep = _report(
        messy,
        [
            Q.row_count_at_least(3),
            Q.row_count_at_least(100),
            Q.completeness_at_least("amount", 0.5),
            Q.completeness_at_least("amount", 0.99),  # 4/5 non-null -> fail
            Q.mean_in_range("amount", -100.0, 100.0),
            Q.distinct_count_between("status", 1, 2),
        ],
    )
    assert rep["row_count_at_least(3)"] == (0, True)
    assert rep["row_count_at_least(100)"] == (1, False)
    assert rep["completeness_at_least(amount,0.5)"] == (0, True)
    assert rep["completeness_at_least(amount,0.99)"] == (1, False)
    assert rep["mean_in_range(amount,-100.0,100.0)"] == (0, True)
    assert rep["distinct_count_between(status,1,2)"] == (0, True)


def test_metric_and_row_local_share_one_scan(messy):
    rep_df = Q.run_checks(
        messy,
        [Q.not_null("id"), Q.mean_in_range("amount", -100.0, 100.0),
         Q.row_count_at_least(1)],
    )
    plan = rep_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") == 1
    assert rep_df.count() == 3


def test_metric_checks_on_empty_table(spark):
    empty = spark.createDataFrame([], "id long, amount double")
    rep = _report(
        empty,
        [Q.row_count_at_least(1), Q.mean_in_range("amount", 0.0, 1.0),
         Q.completeness_at_least("amount", 0.9)],
    )
    assert rep["row_count_at_least(1)"] == (1, False)  # empty fails the floor
    # no rows -> no evidence of a bad mean/completeness: pass
    assert rep["mean_in_range(amount,0.0,1.0)"] == (0, True)
    assert rep["completeness_at_least(amount,0.9)"] == (0, True)


def test_k_anonymity_flags_small_and_uniform_groups(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.quality import k_anonymity
    rows = (
        [(i, "A", "X", 100.0 + i) for i in range(6)]      # big, diverse
        + [(10 + i, "B", "X", 50.0) for i in range(5)]    # big, UNIFORM sensitive
        + [(20, "C", "Y", 70.0), (21, "C", "Y", 71.0)]    # small, diverse
    )
    df = spark.createDataFrame(rows, "id long, qi1 string, qi2 string, s double")
    out = {(r["qi1"], r["qi2"]): r for r in k_anonymity(df, ["qi1", "qi2"], "s").collect()}
    a, b, c = out[("A", "X")], out[("B", "X")], out[("C", "Y")]
    assert a["k_anonymous"] and a["l_diverse"]
    assert b["k_anonymous"] and not b["l_diverse"]   # all share one balance
    assert not c["k_anonymous"] and c["l_diverse"]   # only 2 rows in group
    assert a["group_size"] == 6 and a["n_sensitive_values"] == 6


def test_unicode_nfc_composes_and_counts(spark):
    from etl_pipeline_for_retail_sales_data_spark.operators.text import (
        unicode_nfc_report,
    )

    docs = spark.createDataFrame(
        [(0, "plain ascii"), (1, "plain ascii"), (2, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unicode_nfc_report(docs).collect()}
    # every suffix is decomposed, so normalization always composes it
    for r in out.values():
        assert r["changed"]
        assert r["n_chars_nfc"] < r["n_chars_raw"]
    # doc 0 (even): 'cafe' + combining acute composes to 5 chars ('café'),
    # one codepoint shorter; doc 1 (odd): ring + diaeresis both compose
    assert out[0]["n_chars_raw"] - out[0]["n_chars_nfc"] == 1
    assert out[1]["n_chars_raw"] - out[1]["n_chars_nfc"] == 2
    # null text degrades to just the suffix
    assert out[2]["n_chars_raw"] == len(" cafe") + 1
    # identical inputs hash identically and differ across parities
    import hashlib
    import unicodedata

    expect = hashlib.md5(
        unicodedata.normalize("NFC", "plain ascii café").encode()
    ).hexdigest()
    assert out[0]["nfc_md5"] == expect
