"""DuckDB differential oracle — mirrors the driver's t2 comparison:
row-count + schema + order-insensitive value comparison between a Spark
query result and its ANSI-SQL oracle run by DuckDB on the same parquet.
"""

from __future__ import annotations

import math
from decimal import Decimal

import numpy as np

import duckdb

from etl_pipeline_for_retail_sales_data_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    # Type-tag floats/decimals: the driver hashes STRINGIFIED values, so
    # int64 99111 vs float64 99111.0 ("99111" vs "99111.0") is a driver
    # mismatch even though Python == says equal. Tagging reproduces that
    # strictness locally (caught live: DuckDB SUM(BIGINT) -> HUGEINT ->
    # pandas float64 while Spark sum(long) stays int64).
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return ("f", "NaN")
        # kill -0.0 and representation noise far below any rounded output
        return ("f", round(float(v), 9) + 0.0)
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    # total order tolerant of None / mixed types (grouping-set nulls)
    return tuple((v is None, str(v)) for v in row)


def _norm_rows(rows, columns):
    # order-insensitive: sort columns by name, then sort rows
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    con = duck_connection(sf_dir)
    duck_pdf = con.sql(sql).df()
    con.close()

    s_cols = list(spark_pdf.columns)
    d_cols = list(duck_pdf.columns)
    assert sorted(s_cols) == sorted(d_cols), f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(spark_pdf) == len(duck_pdf), f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}"

    s_rows = _norm_rows(spark_pdf.itertuples(index=False, name=None), s_cols)
    d_rows = _norm_rows(duck_pdf.itertuples(index=False, name=None), d_cols)
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
