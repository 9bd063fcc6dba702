"""Cache-lifetime hygiene sweep: NO registry query may leak persisted
blocks into the session.

The contract (etl_pipeline_for_retail_sales_data_spark/cachectl.py): after a query runs to
completion — plan built, result collected — ``getPersistentRDDs()`` is
empty. Operators share expensive frames through repartition exchanges
(ReuseExchange), scope internal caches with try/finally, and finalize
iterative fixpoints to RELIABLE (disk) checkpoints, so a long-lived
production session never accumulates dead cached frames until storage-
pool LRU eviction starts thrashing — the 100 TB failure mode this sweep
exists to prevent.

Sharded so the slow lane can parallelize; each shard covers a
deterministic slice of the full registry.
"""

import hashlib

import pytest

from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

pytestmark = pytest.mark.slow  # full-registry sweep: slow lane only

N_SHARDS = 8


def _persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _shard_of(name: str) -> int:
    return int(hashlib.md5(name.encode()).hexdigest(), 16) % N_SHARDS


@pytest.mark.parametrize("shard", range(N_SHARDS))
def test_no_query_leaks_persisted_rdds(spark, sf_smoke, shard):
    spark.catalog.clearCache()
    assert _persisted(spark) == 0, "another test leaked into this sweep"
    leaks = []
    for name in sorted(QUERIES):
        if _shard_of(name) != shard:
            continue
        QUERIES[name](spark, sf_smoke).collect()
        n = _persisted(spark)
        if n:
            leaks.append(f"{name}: {n} persisted RDDs after collect")
            spark.catalog.clearCache()  # isolate the next query's count
    assert not leaks, "\n".join(leaks)
