"""Live JDBC round trip (reference S1 extract + L2 load,
scripts/extraction.py:98-144 / scripts/loading.py:134-172).

The container ships no PostgreSQL/MySQL server or driver jar, but Spark
bundles Apache Derby (its Hive-metastore backend), whose EMBEDDED JDBC
driver needs no server — so the engine's read_jdbc / write_jdbc_replace
code paths get a real in-process exercise: create-or-replace write with
truncate semantics, read back, replace again, read again. Anything
driver-specific beyond the JDBC contract (dialects, upsert SQL) is out of
scope here and documented in NOTES.md.
"""

import pytest

from etl_pipeline_for_retail_sales_data_spark import sinks
from etl_pipeline_for_retail_sales_data_spark.sources.readers import read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture
def derby_url(tmp_path):
    try:  # pragma: no cover - depends on bundled jars
        from py4j.java_gateway import java_import  # noqa: F401
    except ImportError:
        pytest.skip("py4j unavailable")
    return f"jdbc:derby:{tmp_path}/rt_db;create=true"


def test_jdbc_write_read_replace_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(101, 13, 300.0), (102, 7, 210.0), (103, 2, 40.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_replace(
        df, derby_url, "sales_summary", driver=DRIVER
    )
    back = read_jdbc(spark, derby_url, "sales_summary", driver=DRIVER)
    assert sorted(tuple(r) for r in back.collect()) == [
        (101, 13, 300.0),
        (102, 7, 210.0),
        (103, 2, 40.0),
    ]

    # L3 replace-not-accumulate: second write truncates then loads
    sinks.write_jdbc_replace(
        df.limit(1), derby_url, "sales_summary", driver=DRIVER
    )
    assert read_jdbc(spark, derby_url, "sales_summary", driver=DRIVER).count() == 1


def test_jdbc_predicate_pushdown_into_scan(spark, derby_url):
    """read_jdbc is a real JDBC relation, so Catalyst pushes filters into
    the remote query (PushedFilters in the scan) instead of pulling the
    table and filtering in Spark."""
    df = spark.createDataFrame(
        [(i, i * 2, float(i)) for i in range(1, 21)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_replace(df, derby_url, "pushdown_t", driver=DRIVER)
    scan = read_jdbc(spark, derby_url, "pushdown_t", driver=DRIVER).filter(
        "product_id > 15"
    )
    assert scan.count() == 5
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "product_id" in plan.lower()


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    """The scale path of reference S1: partitionColumn/numPartitions
    turns the JDBC scan into N concurrent range queries. Assert the scan
    really plans N partitions, every partition carries rows (the range
    split is live, not one fat partition plus empties), and the parallel
    read returns exactly the single-connection read's rows — including
    ids OUTSIDE [lowerBound, upperBound], which the unbounded first/last
    strides must still fetch."""
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import (
        read_jdbc_partitioned,
    )

    df = spark.createDataFrame(
        [(i, i % 17, float(i) * 1.5) for i in range(1, 401)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_replace(df, derby_url, "par_t", driver=DRIVER)

    serial = read_jdbc(spark, derby_url, "par_t", driver=DRIVER)
    # deliberately stale bounds (50..350 instead of 1..400): rows outside
    # must still arrive via the unbounded edge strides
    par = read_jdbc_partitioned(
        spark, derby_url, "par_t", "product_id", 50, 350, 4, driver=DRIVER
    )
    assert par.rdd.getNumPartitions() == 4
    per_part = par.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert len(per_part) == 4 and all(n > 0 for n in per_part), per_part
    assert sorted(tuple(r) for r in par.collect()) == sorted(
        tuple(r) for r in serial.collect()
    )

    # pushdown composes with partitioning: the filter reaches each range query
    filtered = par.filter("product_id > 390")
    assert filtered.count() == 10
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


def _rows(spark, url, table):
    return sorted(
        tuple(r) for r in read_jdbc(spark, url, table, driver=DRIVER).collect()
    )


def test_jdbc_upsert_update_and_insert_without_truncate(spark, derby_url):
    """The reference's INSERT ... ON DUPLICATE KEY UPDATE
    (scripts/loading.py:24-32) as a live MERGE INTO: existing keys are
    updated in place, new keys inserted, untouched keys SURVIVE — no
    truncate anywhere in the path."""
    base = spark.createDataFrame(
        [(101, 13, 300.0), (102, 7, 210.0), (103, 2, 40.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    # first call creates the table with a real PRIMARY KEY and loads it
    sinks.write_jdbc_upsert(
        spark, base, derby_url, "upsert_t", ["product_id"], driver=DRIVER
    )
    assert _rows(spark, derby_url, "upsert_t") == [
        (101, 13, 300.0),
        (102, 7, 210.0),
        (103, 2, 40.0),
    ]

    # delta: 102 changes, 104 is new, 101/103 are NOT in the delta
    delta = spark.createDataFrame(
        [(102, 99, 999.5), (104, 1, 10.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_upsert(
        spark, delta, derby_url, "upsert_t", ["product_id"], driver=DRIVER
    )
    assert _rows(spark, derby_url, "upsert_t") == [
        (101, 13, 300.0),  # survived (replace semantics would have killed it)
        (102, 99, 999.5),  # updated
        (103, 2, 40.0),  # survived
        (104, 1, 10.0),  # inserted
    ]
    # the stage scratch table was dropped inside the transaction
    stage_gone = read_jdbc(
        spark, derby_url, "(SELECT COUNT(*) c FROM SYS.SYSTABLES "
        "WHERE UPPER(TABLENAME) = 'UPSERT_T__STAGE') probe", driver=DRIVER,
    ).collect()[0][0]
    assert stage_gone == 0

    # idempotency: replaying the same delta is a no-op
    sinks.write_jdbc_upsert(
        spark, delta, derby_url, "upsert_t", ["product_id"], driver=DRIVER
    )
    assert len(_rows(spark, derby_url, "upsert_t")) == 4


def test_jdbc_upsert_primary_key_enforced(spark, derby_url):
    """First upsert call creates the target with a DB-enforced PRIMARY
    KEY (reference CREATE_TABLE_SQL, loading.py:16-21) — a raw duplicate
    insert bypassing the MERGE must be rejected by the database."""
    df = spark.createDataFrame(
        [(1, 5, 50.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_upsert(
        spark, df, derby_url, "pk_t", ["product_id"], driver=DRIVER
    )
    conn = sinks._jdbc_connect(spark, derby_url, DRIVER)
    try:
        stmt = conn.createStatement()
        with pytest.raises(Exception, match="(?i)duplicate|unique|constraint"):
            stmt.executeUpdate(
                'INSERT INTO pk_t ("product_id", "total_quantity", '
                '"total_sale_amount") VALUES (1, 9, 9.0)'
            )
        stmt.close()
    finally:
        conn.close()


def test_jdbc_upsert_rollback_on_failure(spark, derby_url):
    """Transactional failure handling mirroring the reference
    (loading.py:159-168): a MERGE that trips a constraint rolls back and
    the target is byte-identical to before the failed call."""
    base = spark.createDataFrame(
        [(1, 5, 50.0), (2, 6, 60.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_upsert(
        spark, base, derby_url, "rb_t", ["product_id"], driver=DRIVER
    )
    before = _rows(spark, derby_url, "rb_t")

    # corrupt the target under the engine's feet: add a CHECK the next
    # delta violates — the MERGE fails mid-transaction → rollback
    conn = sinks._jdbc_connect(spark, derby_url, DRIVER)
    try:
        stmt = conn.createStatement()
        stmt.executeUpdate(
            'ALTER TABLE rb_t ADD CONSTRAINT qty_nonneg CHECK ("total_quantity" >= 0)'
        )
        stmt.close()
    finally:
        conn.close()
    bad = spark.createDataFrame(
        [(2, -99, 2.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    with pytest.raises(Exception):
        sinks.write_jdbc_upsert(
            spark, bad, derby_url, "rb_t", ["product_id"], driver=DRIVER
        )
    assert _rows(spark, derby_url, "rb_t") == before
    # the failed call left no stage table behind (best-effort cleanup on
    # the rollback path — the transactional DROP was itself rolled back)
    stale = read_jdbc(
        spark, derby_url, "(SELECT COUNT(*) c FROM SYS.SYSTABLES "
        "WHERE UPPER(TABLENAME) = 'RB_T__STAGE') probe", driver=DRIVER,
    ).collect()[0][0]
    assert stale == 0
    # retry after the failure: a good delta applies cleanly with no
    # stale stage rows leaking in
    good = spark.createDataFrame(
        [(2, 42, 2.5)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_upsert(
        spark, good, derby_url, "rb_t", ["product_id"], driver=DRIVER
    )
    assert _rows(spark, derby_url, "rb_t") == [(1, 5, 50.0), (2, 42, 2.5)]

    # NULL keys are rejected before any DB work
    nullkey = spark.createDataFrame(
        [(None, 1, 1.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    with pytest.raises(ValueError, match="NULL in key"):
        sinks.write_jdbc_upsert(
            spark, nullkey, derby_url, "rb_t", ["product_id"], driver=DRIVER
        )


def test_jdbc_partitioned_validates_args(spark, derby_url):
    from etl_pipeline_for_retail_sales_data_spark.sources.readers import (
        read_jdbc_partitioned,
    )

    with pytest.raises(ValueError, match="num_partitions"):
        read_jdbc_partitioned(spark, derby_url, "t", "id", 0, 10, 0, driver=DRIVER)
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc_partitioned(spark, derby_url, "t", "id", 10, 10, 2, driver=DRIVER)


def test_jdbc_upsert_string_key_and_values(spark, derby_url):
    """String keys/values must MERGE on Derby: Spark's dialect stages
    StringType as CLOB by default, and Derby rejects VARCHAR-vs-CLOB
    comparisons in MERGE ON / UPDATE SET — the stage write passes
    createTableColumnTypes so string columns stage as VARCHAR."""
    base = spark.createDataFrame(
        [("sku-1", "widget", 3), ("sku-2", "gadget", 5)],
        "sku string, name string, qty bigint",
    )
    sinks.write_jdbc_upsert(spark, base, derby_url, "str_t", ["sku"], driver=DRIVER)
    delta = spark.createDataFrame(
        [("sku-2", "gizmo", 7), ("sku-3", "doodad", 1)],
        "sku string, name string, qty bigint",
    )
    sinks.write_jdbc_upsert(spark, delta, derby_url, "str_t", ["sku"], driver=DRIVER)
    assert _rows(spark, derby_url, "str_t") == [
        ("sku-1", "widget", 3),
        ("sku-2", "gizmo", 7),
        ("sku-3", "doodad", 1),
    ]


def test_jdbc_upsert_in_batch_duplicate_keys_collapse(spark, derby_url):
    """The reference's sequential executemany let the last cursor row win
    on an in-batch duplicate key; an unordered DataFrame has no "last",
    so the upsert collapses duplicates to one row per key before staging
    (ANSI MERGE would otherwise reject the source)."""
    dup = spark.createDataFrame(
        [(9, 1, 1.0), (9, 2, 2.0)],
        "product_id bigint, total_quantity bigint, total_sale_amount double",
    )
    sinks.write_jdbc_upsert(spark, dup, derby_url, "dup_t", ["product_id"], driver=DRIVER)
    rows = _rows(spark, derby_url, "dup_t")
    assert len(rows) == 1 and rows[0][0] == 9
    assert rows[0][1:] in {(1, 1.0), (2, 2.0)}


def test_upsert_statement_mysql_dialect():
    """MySQL (the reference's target DB, scripts/loading.py:11,24-32) has
    no ANSI MERGE: jdbc:mysql URLs must build the reference's exact
    INSERT ... ON DUPLICATE KEY UPDATE shape, set-based from the stage,
    with backtick quoting. Pinned as an expected-SQL unit test — no live
    MySQL ships in this sandbox."""
    sql = sinks._upsert_statement(
        "jdbc:mysql://host/db", "sales", "sales__stage",
        ["product_id", "total_quantity", "total_sale_amount"], ["product_id"],
    )
    assert sql == (
        "INSERT INTO sales (`product_id`, `total_quantity`, `total_sale_amount`) "
        "SELECT `product_id`, `total_quantity`, `total_sale_amount` FROM sales__stage "
        "ON DUPLICATE KEY UPDATE `total_quantity` = VALUES(`total_quantity`), "
        "`total_sale_amount` = VALUES(`total_sale_amount`)"
    )
    # all-key table: MySQL requires a SET clause; it degrades to a no-op
    sql2 = sinks._upsert_statement("jdbc:mysql://h/d", "t", "t__stage", ["k"], ["k"])
    assert sql2.endswith("ON DUPLICATE KEY UPDATE `k` = `k`")
    # ANSI path unchanged for everyone else
    ansi = sinks._upsert_statement(
        "jdbc:derby:/tmp/x", "t", "t__stage", ["k", "v"], ["k"]
    )
    assert ansi.startswith('MERGE INTO t t USING t__stage s ON t."k" = s."k"')
    assert 'WHEN MATCHED THEN UPDATE SET "v" = s."v"' in ansi
    assert 'WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")' in ansi

def test_mysql_ddl_and_stage_overrides():
    """MySQL cannot take the Derby-shaped VARCHAR(32672) anywhere: target
    DDL maps strings to TEXT (VARCHAR(255) for PRIMARY KEY columns, which
    MySQL requires to be length-bounded), and the stage write passes NO
    createTableColumnTypes override — Spark's native MySQL mapping (TEXT)
    both fits the row limit and compares fine in ON DUPLICATE KEY
    UPDATE. Derby keeps the VARCHAR override (CLOB is not comparable in
    MERGE)."""
    from pyspark.sql.types import StructType, StructField, StringType, LongType

    mysql = "jdbc:mysql://host/db"
    assert sinks._sql_type("string", mysql, is_key=True) == "VARCHAR(255)"
    assert sinks._sql_type("string", mysql, is_key=False) == "TEXT"
    assert sinks._sql_type("string", "jdbc:derby:/tmp/x") == "VARCHAR(32672)"
    assert sinks._sql_type("bigint", mysql) == "BIGINT"
    assert sinks._sql_type("decimal(12,2)", mysql) == "DECIMAL(12,2)"

    schema = StructType(
        [StructField("sku", StringType()), StructField("qty", LongType())]
    )
    assert sinks._stage_column_overrides("jdbc:mysql://h/d", schema) == ""
    assert (
        sinks._stage_column_overrides("jdbc:derby:/tmp/x", schema)
        == "sku VARCHAR(32672)"
    )


def test_table_exists_escapes_like_wildcards(spark, derby_url):
    """DatabaseMetaData.getTables treats '_' and '%' as LIKE wildcards:
    an unescaped probe for rb_t would false-positive against a table
    named RBXT, skip the CREATE, and fail the MERGE against a mismatched
    schema. Derby supports NO metadata escape string (and backslash-
    escaping breaks literal matches too), so the probe post-filters the
    result set by exact TABLE_NAME equality instead."""
    conn = sinks._jdbc_connect(spark, derby_url, DRIVER)
    try:
        stmt = conn.createStatement()
        stmt.executeUpdate("CREATE TABLE rbxt (k INTEGER PRIMARY KEY)")
        stmt.close()
        # 'rb_t' must NOT match RBXT despite '_' being a LIKE wildcard
        assert sinks._table_exists(conn, "rb_t") is False
        # the real table is still found (both case foldings)
        assert sinks._table_exists(conn, "rbxt") is True
        assert sinks._table_exists(conn, "RBXT") is True
    finally:
        conn.close()
