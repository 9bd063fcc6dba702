"""Count-min sketch over DataFrames, built from portable hash arithmetic.

Spark ships a ``count_min_sketch`` aggregate but returns an opaque JVM
binary (no cross-engine oracle possible). This implementation keeps the
same structure — ``depth`` independent hash rows x ``width`` buckets, point
estimate = min over rows of the landed bucket's count — as plain
group-bys over md5-derived buckets, so DuckDB can replay the identical
math and every cell is inspectable.

Scale shape: building the sketch is ONE map-side-combinable hash
aggregation whose result has at most depth*width rows regardless of input
size (the whole point of the sketch); estimating K probe keys joins a
K*depth-row frame against that tiny cell table — both sides broadcastable.
The classic guarantee holds: estimates never undercount (asserted in
tests), overcount by at most eps*N with probability 1-delta for
width=ceil(e/eps), depth=ceil(ln(1/delta)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_bucket(key: Column, seed: int, width: int) -> Column:
    """Row ``seed``'s bucket for a key: first 6 md5 hex digits → int mod
    width. Identical to the engine-portable hash used by dataset_split /
    minhash (md5 is the only hash both Spark and DuckDB expose)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % width


def cm_bucket_sql(key_expr: str, seed: int, width: int) -> str:
    """Oracle twin of :func:`cm_bucket`."""
    return (
        f"CAST(('0x' || substring(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 6)) "
        f"AS BIGINT) % {width}"
    )


def cm_sketch_cells(df: DataFrame, key: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Materialize the sketch as (depth, bucket, n) cells — one hash agg,
    ≤ depth*width output rows. Each input row increments one bucket per
    depth row; doing it as an exploded (depth x rows) agg keeps everything
    in whole-stage codegen (no per-row Python)."""
    d = df.select(
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("depth"),
        F.col(key).alias("__k"),
    )
    buckets = [
        F.when(F.col("depth") == j, cm_bucket(F.col("__k"), j, width)) for j in range(depth)
    ]
    return (
        d.withColumn("bucket", F.coalesce(*buckets))
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("n"))
    )


def cm_estimate(cells: DataFrame, probes: DataFrame, key: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Point-estimate counts for ``probes[key]``: min over depth rows of the
    landed cell's count. probes x depth is tiny; the join against the
    bounded cell table broadcasts."""
    p = probes.select(
        F.col(key),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("depth"),
    )
    buckets = [
        F.when(F.col("depth") == j, cm_bucket(F.col(key), j, width)) for j in range(depth)
    ]
    p = p.withColumn("bucket", F.coalesce(*buckets))
    return (
        p.join(F.broadcast(cells), ["depth", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_n"))
    )
