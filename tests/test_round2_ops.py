"""Round-2 operators: content-defined chunking, forward as-of join with
tolerance, bucketed co-located join operator, agg-based top-k."""

import contextlib
import io

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.operators.joins import bucketed_join_tables
from etl_pipeline_for_retail_sales_data_spark.operators.temporal_joins import (
    asof_join_forward,
)
from etl_pipeline_for_retail_sales_data_spark.operators.text import cdc_chunks
from etl_pipeline_for_retail_sales_data_spark.sources.readers import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_chunks_robust_to_early_edit(spark):
    """The defining CDC property (vs fixed-stride windows): inserting text
    near the START of a document changes only the chunks it touches —
    the digests of every later chunk survive, because boundaries are
    content-decided, not offset-decided."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon "
        "phi chi psi omega one two three four five six "
        "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
    )
    edited = "INSERTED words at the front " + base
    out = cdc_chunks(_docs(spark, [(1, base), (2, edited)])).collect()
    d1 = {r.digest for r in out if r.doc_id == 1}
    d2 = {r.digest for r in out if r.doc_id == 2}
    shared = d1 & d2
    # every original chunk except the (edited) first one survives verbatim
    assert len(shared) >= len(d1) - 1, (len(shared), len(d1))


def test_cdc_chunks_cover_document_exactly(spark):
    """Chunks partition the token stream: token counts sum to the doc's
    token count and chunk ids are strictly increasing from 0."""
    text = "w" + " w".join(str(i) for i in range(200))
    n_toks = len(text.split())
    rows = sorted(cdc_chunks(_docs(spark, [(7, text)])).collect(), key=lambda r: r.chunk_id)
    assert sum(r.n_tokens for r in rows) == n_toks
    assert [r.chunk_id for r in rows] == sorted(r.chunk_id for r in rows)
    assert all(r.n_tokens > 0 for r in rows)


def test_asof_forward_basic_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00"), (2, "a", "2024-01-01 11:30:00"),
         (3, "a", "2024-01-01 23:00:00"), (4, "b", "2024-01-01 10:00:00")],
        "id long, k string, ts_s string",
    ).select("id", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:30:00", 5.0), ("a", "2024-01-01 12:00:00", 7.0)],
        "k string, rts_s string, v double",
    ).select("k", F.col("rts_s").cast("timestamp").alias("rts"), "v")

    out = {
        r.id: (r.v, r["__matched_ts"])
        for r in asof_join_forward(
            left, right, ["k"], "ts", "rts", ["v"], tolerance_sec=3600
        ).collect()
    }
    assert out[1][0] == 5.0          # next tick 30 min ahead, within tolerance
    assert out[2][0] == 7.0          # next tick 30 min ahead
    assert out[3] == (None, None)    # no tick after 23:00 at all
    assert out[4] == (None, None)    # key 'b' has no ticks

    # without tolerance the same matches appear; id 3 still has none
    out2 = {
        r.id: r.v
        for r in asof_join_forward(left, right, ["k"], "ts", "rts", ["v"]).collect()
    }
    assert out2[1] == 5.0 and out2[2] == 7.0 and out2[3] is None


def test_asof_forward_inclusive_boundary(spark):
    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:30:00")], "id long, k string, ts_s string"
    ).select("id", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:30:00", 5.0)], "k string, rts_s string, v double"
    ).select("k", F.col("rts_s").cast("timestamp").alias("rts"), "v")
    inc = asof_join_forward(left, right, ["k"], "ts", "rts", ["v"], inclusive=True).collect()
    exc = asof_join_forward(left, right, ["k"], "ts", "rts", ["v"], inclusive=False).collect()
    assert inc[0].v == 5.0
    assert exc[0].v is None


def test_bucketed_join_tables_no_exchange(spark, sf_smoke):
    """The operator's whole point: the join over the two bucketed tables
    plans with NO Exchange on either side (broadcast disabled so the
    sort-merge bucketed path — the 100 TB shape — is what's planned)."""
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_orderstatus")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join_tables(
            spark, li, orders, "l_orderkey", "o_orderkey", table_prefix="bkt_test"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(mode="formatted")
        txt = buf.getvalue()
        assert "SortMergeJoin" in txt, txt
        assert "Exchange" not in txt, txt
        n1 = j.count()  # before the rerun overwrites the files j points at
        # rerun is idempotent (stale location + catalog entry cleared)
        j2 = bucketed_join_tables(
            spark, li, orders, "l_orderkey", "o_orderkey", table_prefix="bkt_test"
        )
        assert j2.count() == n1 > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_same_key_name(spark, sf_smoke):
    """Both sides sharing the join-key NAME must work: the join condition
    is qualified per table, so F.col ambiguity can't arise."""
    li = load_table(spark, sf_smoke, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = load_table(spark, sf_smoke, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    j = bucketed_join_tables(spark, li, orders, "k", "k", table_prefix="bkt_same")
    assert j.count() > 0
