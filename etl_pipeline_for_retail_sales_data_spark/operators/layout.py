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
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
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
