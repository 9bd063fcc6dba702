"""Temporal join operators the reference lacks entirely (it has zero joins,
reference scripts/transformation.py:166 — SURVEY.md §2.5): as-of join and
interval/range join, both built scale-first.

As-of join (each left row matches the latest right row at-or-before its
timestamp, per key) is NOT expressible as an equi-join, and the naive
formulation — inequality join + argmax — is a cross join per key. The
scalable shape used here is the union-merge pattern:

    union(left tagged 0, right tagged 1)
      → window over (key) ordered by (ts, tag desc)
      → last(right_value, ignorenulls) carries the most recent right row
      → keep left rows

One shuffle on the key, streaming window evaluation, no join node at all.
This is how kdb/Flink-style as-of semantics map onto a hash-partitioned
engine: co-partition both sides by key, merge-sort within partition.

Interval/range join: when the interval side is small (promo calendars,
maintenance windows — typically thousands of rows), broadcast it and let
the BETWEEN predicate run as a broadcast nested-loop join; each fact
partition streams past the tiny interval table, which is the optimal plan
(a shuffle-based interval join would move 100 TB to co-locate against a
kilobyte). For big×big interval joins, bucketize time and equi-join on the
bucket + refine — implemented query-side as `range_join_bucketized`
(queries_registry.py), oracle-checked against the plain BETWEEN join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the value columns of the latest right row
    with right.ts <= left.ts (strictly < if ``inclusive=False``), matching
    on ``key_cols``. Left rows with no prior right row keep nulls (left
    as-of semantics; filter on matched ts for inner).

    Output: all left columns + ``value_cols`` + ``__matched_ts``.

    Contract: right rows must be unique per (key, ts) — with duplicate
    ticks at the same instant the carried value is whichever sorts last,
    which is not defined. Dedup the right side first if the source can
    emit duplicates. ``value_cols`` may not collide with left column
    names (the output would carry two ambiguous columns) — rename on the
    right side first.
    """
    lcols = left.columns
    collisions = set(value_cols) & set(lcols)
    if collisions:
        raise ValueError(
            f"value_cols {sorted(collisions)} collide with left columns; "
            "alias the right-side value columns before the as-of join"
        )
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_r"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key_cols],
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_ts"),
    ).select(*l_tagged.columns)  # align column order for unionByName

    merged = l_tagged.unionByName(r_tagged)
    # At equal ts a right row must sort before (inclusive) or after
    # (exclusive) the left rows so last() sees / doesn't see it.
    tag_order = F.col("__is_r").desc() if inclusive else F.col("__is_r").asc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *lcols,
        F.col("__is_r"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__matched_ts"),
    )
    return carried.filter(F.col("__is_r") == 0).drop("__is_r")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For each left row, attach the value columns of the EARLIEST right
    row with right.ts >= left.ts (strictly > if ``inclusive=False``) —
    the forward mirror of :func:`asof_join_backward`, same union-merge
    shape (one shuffle on the key, no join node): the window frame flips
    to [current row, unbounded following] and ``first(ignorenulls)``
    picks the next right row instead of the last prior one.

    ``tolerance_sec`` bounds the lookahead: a match further than the
    tolerance is nulled out (kdb ``aj`` tolerance / pandas merge_asof
    ``tolerance=``). The comparison is integer epoch seconds — exact.

    Same contract as backward: right unique per (key, ts); value_cols
    must not collide with left columns.
    """
    lcols = left.columns
    collisions = set(value_cols) & set(lcols)
    if collisions:
        raise ValueError(
            f"value_cols {sorted(collisions)} collide with left columns; "
            "alias the right-side value columns before the as-of join"
        )
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_r"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key_cols],
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_ts"),
    ).select(*l_tagged.columns)

    merged = l_tagged.unionByName(r_tagged)
    # At equal ts a right row must sort after the left rows (inclusive —
    # inside the [current, following] frame) or before them (exclusive —
    # outside it).
    tag_order = F.col("__is_r").asc() if inclusive else F.col("__is_r").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), tag_order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = merged.select(
        *lcols,
        F.col("__ts"),
        F.col("__is_r"),
        *[F.first(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.first("__r_ts", ignorenulls=True).over(w).alias("__matched_ts"),
    )
    out = carried.filter(F.col("__is_r") == 0).drop("__is_r")
    if tolerance_sec is not None:
        within = (
            F.col("__matched_ts").cast("long") - F.col("__ts").cast("long")
        ) <= F.lit(tolerance_sec)
        out = out.select(
            *lcols,
            *[F.when(within, F.col(c)).alias(c) for c in value_cols],
            F.when(within, F.col("__matched_ts")).alias("__matched_ts"),
        )
    else:
        out = out.drop("__ts")
    return out


def range_join_broadcast(
    fact: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to the (small, broadcast) intervals containing their
    timestamp: start <= ts <= end. Plans as BroadcastNestedLoopJoin — the
    right plan when the interval side is tiny relative to the fact side."""
    cond = (F.col(fact_ts) >= F.col(start_col)) & (F.col(fact_ts) <= F.col(end_col))
    return fact.join(F.broadcast(intervals), on=cond, how=how)
