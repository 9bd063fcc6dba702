"""Join strategies (SURVEY.md §2.5 — the reference has ZERO joins; this is
the extension tier, built entirely on Catalyst's join machinery).

Scale doctrine for 100 TB:
- Dimension tables (region/nation/part/supplier/customer at typical star
  ratios) are broadcast — no shuffle of the fact side at all.
- Fact-to-fact (orders ⋈ lineitem) is sort-merge on the key; with AQE on,
  skewed keys are split at runtime (skewJoin), so no manual salting in the
  default path.
- Helpers take/return DataFrames and stay lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Broadcast-hash join for a small dimension side. At 100 TB the fact
    side never moves; each executor streams its parquet splits past an
    in-memory hash table of the dim."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def fact_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact-to-fact join: leave strategy choice to Catalyst/AQE (sort-merge
    with runtime skew splitting). Co-location via bucketing is the manual
    escape hatch when the same key is joined repeatedly."""
    return left.join(right, on=on, how=how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-beating equi-join: the fact side deterministically spreads each
    join key over ``n_salts`` sub-keys (salt = hash of ``salt_source``, a
    unique-ish fact column, mod n); the dim side replicates each row to all
    n salts. A hot key's rows then land on n partitions instead of one.
    Semantically identical to ``fact.join(dim, key, how)`` for fact-side
    join types (inner/left/semi/anti) — asserted in tests. Right/full
    outer are rejected: the replicated dim side would emit one unmatched
    row PER SALT, multiplying rows the plain join never produces. Prefer
    AQE skew-join for sort-merge cases; explicit salting is for when the
    skew is known up front or the join must stay hash-based."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-side join types {sorted(allowed)}, got {how!r}: "
            "the replicated dim side breaks right/full outer semantics"
        )
    salt_expr = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    f = fact.withColumn("__salt", salt_expr.cast("int"))
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return f.join(d, on=[key, "__salt"], how=how).drop("__salt")


def runtime_filter_join(fact: DataFrame, build: DataFrame, key: str, how: str = "inner") -> DataFrame:
    """Runtime-filter (semi-join pruned) equi-join: the build side's
    distinct key set is broadcast as a semi-join filter onto the fact scan
    BEFORE the real join, so fact rows that can never match are dropped at
    the scan instead of being shuffled. This is the hand-rolled form of
    Catalyst's InjectRuntimeFilter / DPP: at 100 TB, a selective dimension
    predicate (say 2% of parts) means 98% of the fact table never enters
    the join exchange. Semantically identical to ``fact.join(build, key,
    how)`` for inner/semi joins (asserted in tests + by the driver oracle,
    which runs the plain join).

    The distinct-key frame must be broadcastable (it is exactly the case
    where the build side is selective); when it is not, skip the filter —
    the plain join's shuffle was unavoidable anyway."""
    keys = build.select(key).distinct()
    pruned = fact.join(F.broadcast(keys), key, "left_semi")
    return pruned.join(build, on=key, how=how)


def bucketed_join_tables(
    spark,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
    table_prefix: str = "bkt",
) -> DataFrame:
    """Co-located (bucketed) join: both sides are written ONCE as
    bucketed+sorted tables on their join key, after which every join
    between them is shuffle-free — the SortMergeJoin reads pre-hashed,
    pre-sorted buckets directly (no Exchange on either side; asserted in
    tests via the physical plan). This is THE layout lever for a 100 TB
    fact-to-fact join that runs repeatedly: pay the shuffle once at write
    time, never again at read time. (Spark bucketing = Hive-style hash
    bucketing; spark.sql.sources.bucketing.enabled is on by default.)

    The demo writes managed tables into spark-warehouse; at production
    scale the same two writers target partitioned+bucketed external
    tables.

    DESTRUCTIVE on its own table names: the two managed tables
    ``{table_prefix}_l`` / ``{table_prefix}_r`` are dropped and their
    warehouse directories cleared before each write — callers MUST
    namespace ``table_prefix`` per dataset/scale (two sessions sharing a
    warehouse and a prefix would clobber each other's layout)."""
    import shutil
    from urllib.parse import urlparse

    lt, rt = f"{table_prefix}_l", f"{table_prefix}_r"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for df, key, name in ((left, left_key, lt), (right, right_key, rt)):
        # the warehouse DIRECTORY outlives the in-memory catalog: a fresh
        # session doesn't know the table, so overwrite can't drop it —
        # clear both the catalog entry and the stale location first
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    # qualify each key against ITS table — F.col(name) == F.col(name)
    # is ambiguous when both sides share the key name
    ltab, rtab = spark.table(lt), spark.table(rt)
    return ltab.join(rtab, ltab[left_key] == rtab[right_key])
