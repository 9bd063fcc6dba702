"""Every registered query must run cleanly over EMPTY tables.

At 100 TB, empty inputs are routine (an empty daily partition, a filter
that matches nothing, a cold-start state dir) — operators must degrade to
empty results, not executor crashes. This sweep materializes a 0-row
mirror of every testdata table (schemas preserved) and runs the ENTIRE
query registry against it. Found real bugs when introduced: pagerank's
empty-graph early return leaked internal column names into three
queries, and the stream-stream join built an untyped NULL cutoff.
"""

import pytest

from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"{sf_smoke}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def test_every_query_survives_empty_tables(spark, empty_sf):
    failures = []
    for name, fn in sorted(QUERIES.items()):
        try:
            fn(spark, empty_sf).collect()
        except Exception as e:  # noqa: BLE001 - we report them all at once
            failures.append(f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")
    assert not failures, "queries crashed on empty inputs:\n" + "\n".join(failures)
