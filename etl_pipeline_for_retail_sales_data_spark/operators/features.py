"""Feature-engineering operators (ML preprocessing at warehouse scale).

Extension tier (the reference — /root/reference/scripts/transformation.py
— engineers no features): leakage-safe target encoding, the standard
high-cardinality-categorical preprocessing step for tabular ML.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    category: Column,
    target_cents: Column,
    keys: list[str],
) -> DataFrame:
    """Leave-one-out target encoding: each row's categorical feature is
    replaced by the mean of the TARGET over all OTHER rows of the same
    category — enc_i = (Σ_g − x_i) / (n_g − 1). Excluding the row's own
    target is what makes the encoding leakage-safe for training (plain
    mean encoding lets each row see its own label).

    Exact-rational form: target in integer cents, so Σ_g and n_g are
    exact int64 and the encoding is a division of exact integers (plus a
    deterministic cents→units scaling), rounded to 1e-6 — bit-stable
    across engines and partitionings. Singleton
    categories (n_g = 1) have no "other rows"; they fall back to the
    GLOBAL leave-one-out mean (Σ − x_i)/(n − 1), the standard smoothing
    for unseen/rare levels (n = 1 total row returns null — nothing to
    encode against).

    Scale shape: one groupBy over the category (the encoding table,
    O(categories) rows, broadcast back), one global aggregate scalar —
    the per-row arithmetic never shuffles the fact table. ``keys``
    names the row-identifying passthrough columns.
    """
    base = df.select(
        *keys, category.alias("cat"), target_cents.cast("long").alias("x")
    )
    enc = base.groupBy("cat").agg(
        F.sum("x").alias("sg"), F.count("*").alias("ng")
    )
    tot = base.agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    joined = base.join(F.broadcast(enc), "cat").crossJoin(F.broadcast(tot))
    loo = (F.col("sg") - F.col("x")).cast("double") / (F.col("ng") - 1)
    glob = (F.col("s") - F.col("x")).cast("double") / (F.col("n") - 1)
    chosen = F.when(F.col("ng") > 1, loo).otherwise(
        F.when(F.col("n") > 1, glob)
    )
    return joined.select(
        *keys,
        F.col("cat").alias("category"),
        # cents → display units: a second division — not exact, but IEEE
        # division is deterministic, so both engines see the same double
        r6(chosen / 100).alias("encoded"),
        (F.col("ng") > 1).alias("from_category"),
    )
