"""Degenerate-input robustness sweeps: every registered query must run
cleanly over EMPTY tables and over NULL-INJECTED tables.

At 100 TB both are routine — an empty daily partition, a filter that
matches nothing, a cold-start state dir, and dirty rows with null
text/embedding/measure cells — and operators must degrade to empty or
reduced results, never executor crashes. Each sweep found real bugs when
introduced: pagerank's empty-graph early return leaked internal column
names into three queries, the stream-stream join built an untyped NULL
cutoff, and eleven Arrow kernels died on None text/embedding/payload
(None.lower(), np.stack over None, int64 cast of NaN). The null policy
they now share: null content rows are DROPPED at the operator boundary
(a null document/embedding has nothing to hash or score — consistent
with the engine's F1 dropna semantics); scalar UDFs are null-in/null-out
like their JVM twins.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy sweep: excluded from the fast lane (pytest -m "not slow")

from pyspark.sql import functions as F

from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# value columns eligible for null injection (keys stay intact)
NULLABLE = {
    "documents": ["text", "lang"],
    "embeddings": ["embedding", "label"],
    "events": ["value", "event_type", "props"],
    "lineitem": ["l_discount", "l_returnflag", "l_shipdate"],
    "orders": ["o_totalprice", "o_orderdate", "o_orderstatus"],
    "customer": ["c_acctbal"],
    "part": ["p_brand"],
}


# Sharded (round 5): the registry-wide sweep as ONE test meant a single
# flake cost the whole ~150s pass and reruns couldn't target the broken
# family. Round-robin slices of the sorted name list are deterministic,
# keep every shard a mix of families, and keep each shard well under the
# 120s budget; the module-scoped fixtures still build the input layout
# only once.
N_SHARDS = 4
SHARDS = list(range(N_SHARDS))


def _shard_names(i):
    return sorted(QUERIES)[i::N_SHARDS]


def _sweep(spark, sf_dir, names):
    failures = []
    for name in names:
        try:
            QUERIES[name](spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001 - we report them all at once
            failures.append(f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")
    return failures


@pytest.fixture(scope="module")
def empty_sf(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"{sf_smoke}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.fixture(scope="module")
def nulled_sf(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nulled_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"{sf_smoke}/{t}.parquet")
        for c in NULLABLE.get(t, []):
            if c in df.columns:
                df = df.withColumn(
                    c,
                    F.when(F.abs(F.hash(df.columns[0])) % 10 == 0, None).otherwise(
                        F.col(c)
                    ),
                )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("shard", SHARDS)
def test_every_query_survives_empty_tables(spark, empty_sf, shard):
    failures = _sweep(spark, empty_sf, _shard_names(shard))
    assert not failures, "queries crashed on empty inputs:\n" + "\n".join(failures)


@pytest.mark.parametrize("shard", SHARDS)
def test_every_query_survives_null_injection(spark, nulled_sf, shard):
    failures = _sweep(spark, nulled_sf, _shard_names(shard))
    assert not failures, "queries crashed on null-injected inputs:\n" + "\n".join(failures)
