"""Data-layout operators: multi-dimensional clustering keys (Z-order).

The reference's only layout decision is "one CSV file, overwritten"
(`scripts/loading.py:124-132`); at 100 TB layout IS the query optimizer's
raw material. Z-ordering sorts a table by the bit-interleaving of several
bounded dimension keys so that parquet row-group min/max statistics stay
narrow on EVERY interleaved dimension at once — a scan filtered on any of
them prunes most row groups, which a single-column sort can only offer for
its leading column (same idea as Delta Lake ``OPTIMIZE ZORDER BY`` /
ClickHouse mortonEncode; implemented here as plain column expressions, no
engine extension needed).

All bit arithmetic is integer shift/mask, reproducible verbatim in any SQL
dialect — the DuckDB oracles generate the identical expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 6  # 2 dims x 6 bits -> 12-bit z-value; widen per-dim as needed


def interleave_bits(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton/Z-value of two non-negative ints already clamped to
    ``bits`` bits: bit i of x lands at position 2i, bit i of y at 2i+1.
    Pure shift/AND/OR — whole-stage codegen, no UDF."""
    return interleave_bits_n([x, y], bits)


def interleave_bits_n(cols: list[Column], bits: int = BITS) -> Column:
    """N-dimensional Morton/Z-value: bit i of dimension d lands at position
    i*len(cols) + d. len(cols)*bits must stay ≤ 63 (signed long). Same
    pure shift/mask arithmetic as the 2-dim form — a 3- or 4-dim
    clustering key costs nothing extra at plan time."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(cols):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d))
    return z


def interleave_bits_sql(x: str, y: str, bits: int = BITS) -> str:
    """Oracle-side twin of :func:`interleave_bits` (valid DuckDB + ANSI-ish
    SQL using >> << & | operators)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def clamp(c: Column, lo: int, hi: int) -> Column:
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def zorder_layout(df: DataFrame, z: Column, n_files: int = 16) -> DataFrame:
    """Cluster a table for writing: range-partition on the z-value (so each
    output file owns a contiguous z-range → tight min/max on both encoded
    dims), then sort within partitions (so row groups inside a file are
    tight too). ``df.write.parquet`` on the result gives the pruning-ready
    layout; at 100 TB n_files scales with the target file size, the plan
    shape (one range exchange + local sort) does not change."""
    return df.withColumn("__z", z).repartitionByRange(n_files, "__z").sortWithinPartitions("__z").drop("__z")


def shard_assignment(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    prefix_len: int = 2,
) -> DataFrame:
    """Deterministic global shuffle → contiguous training-shard
    assignment: every row gets a global position in md5(id) order and a
    shard id, the "shuffle the corpus once, then shard it" step that
    precedes tokenizer/packing in an LLM data pipeline. md5 order is
    content-independent, seedless, and partition-independent, so a rerun
    (or an incremental rebuild on the same ids) reproduces the byte-same
    shards.

    Scale shape — a distributed two-phase rank, NOT a global
    single-partition window: md5's first ``prefix_len`` hex chars split
    the corpus into 16^prefix_len lexicographically ORDERED buckets
    (md5 ⇒ uniformly sized); per-bucket counts (tiny frame) produce
    exclusive prefix offsets via a window over bucket rows only; the
    per-row rank is a row_number window PARTITIONED by bucket. At 100 TB
    raise prefix_len to 4 (65 536 buckets) — the plan shape (one count
    agg, one broadcast join, one partitioned window) is unchanged.
    global_pos = bucket_offset + within_bucket_rank, and
    shard = global_pos · n_shards div total (balanced contiguous ranges,
    pure int64).

    Output: (id_col, global_pos, shard_id)."""
    from pyspark.sql import Window

    base = df.select(F.col(id_col).alias("__id")).withColumn(
        "__k", F.md5(F.col("__id").cast("string"))
    ).withColumn("__b", F.substring("__k", 1, prefix_len))
    counts = base.groupBy("__b").agg(F.count("*").alias("__c"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__c").over(wb), F.lit(0)).alias("__off")
    )
    total = counts.agg(F.sum("__c").alias("__total"))
    ww = Window.partitionBy("__b").orderBy("__k", "__id")
    ranked = (
        base.withColumn("__rn", F.row_number().over(ww) - 1)
        .join(F.broadcast(offsets), "__b")
        .crossJoin(F.broadcast(total))
    )
    pos = F.col("__off") + F.col("__rn")
    return ranked.select(
        F.col("__id").alias(id_col),
        pos.cast("long").alias("global_pos"),
        F.expr(f"CAST((__off + __rn) * {int(n_shards)} DIV __total AS BIGINT)").alias(
            "shard_id"
        ),
    )
