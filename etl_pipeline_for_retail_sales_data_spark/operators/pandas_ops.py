"""Grouped-map and Arrow-native operators — the remaining two shapes of
the sanctioned Python boundary (alongside scalar @pandas_udf, mapInPandas,
and applyInPandasWithState used elsewhere):

- applyInPandas: one pandas DataFrame per GROUP (the whole group
  materializes in one worker — correct tool when the algorithm genuinely
  needs the full group, e.g. per-entity model fitting; NOT for aggregations
  a window/groupBy can express JVM-side).
- mapInArrow: per-partition pyarrow RecordBatch iterator — skips the
  pandas conversion entirely; the fastest path for pure-numpy/arrow work.

Both are Arrow-batched; neither is ever row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def zscore_per_user(events: DataFrame) -> DataFrame:
    """Per-user z-score of event values via applyInPandas (grouped map) —
    exists to pin the grouped-map plumbing, not because windows couldn't
    do it (agreement with the JVM window formulation is asserted in
    tests).

    ORACLE-EXACT by the integer-variance construction (same trick as
    value_anomaly_count): values are exact cents, so the per-group sums
    S = Σx and Q = Σx² are exact integers under ANY accumulation order,
    and   z = (n·x − S) / sqrt(n · (nQ − S²) / (n − 1))
    needs only int→double conversion, one multiply, one divide, one sqrt
    and one divide — each correctly-rounded IEEE, so the double is
    bit-identical in any engine. Degenerate groups (n < 2 or zero
    variance) emit z = 0. Output z is round6-ed for the value hash."""
    import numpy as np

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(cents)
        s = int(cents.sum())
        q = int((cents * cents).sum())
        var_num = n * q - s * s  # exact ints throughout
        if n < 2 or var_num <= 0:
            z = np.zeros(n, dtype=np.float64)
        else:
            num = (n * cents - s).astype(np.float64)
            var_term = (np.float64(n) * np.float64(var_num)) / np.float64(n - 1)
            z = num / np.sqrt(var_term)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "zscore": np.floor(z * 1e6 + 0.5) / 1e6,
            }
        )

    return events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        zscore, ZSCORE_SCHEMA
    )


def byte_lengths_arrow(media: DataFrame) -> DataFrame:
    """Payload byte lengths via mapInArrow: pyarrow compute on the raw
    RecordBatch, no pandas materialization. The template for numpy/arrow
    kernels over binary columns."""
    import pyarrow.compute as pc

    def lengths(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.binary_length(batch.column("payload"))],
                ["doc_id", "payload_len_arrow"],
            )

    return media.select("doc_id", "payload").mapInArrow(
        lengths, "doc_id long, payload_len_arrow int"
    )


def user_value_profile_arrow(events: DataFrame) -> DataFrame:
    """Per-user value profile via groupBy().applyInArrow — the zero-copy
    grouped-map shape (Spark 4): each group arrives as ONE pyarrow Table,
    compute kernels run without a pandas conversion, and the result Table
    ships straight back over Arrow IPC. Same shuffle as any grouped map
    (one exchange on the group key); prefer this over applyInPandas when
    the group fits in memory and the logic is expressible in pyarrow
    compute — it skips the pandas materialization entirely. Equality with
    the JVM aggregate is pinned in tests."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def profile(table: pa.Table) -> pa.Table:
        v = table["value"]
        return pa.table(
            {
                "user_id": [table["user_id"][0].as_py()],
                "n_events": [table.num_rows],
                "total_value": [pc.sum(v).as_py()],
                "max_value": [pc.max(v).as_py()],
            }
        )

    return events.groupBy("user_id").applyInArrow(
        profile, schema="user_id long, n_events long, total_value double, max_value double"
    )


COGROUP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_clicks", T.LongType()),
        T.StructField("n_purchases", T.LongType()),
        T.StructField("click_cents", T.LongType()),
        T.StructField("purchase_cents", T.LongType()),
    ]
)


def cogroup_click_purchase(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Cogrouped applyInPandas — the LAST Python-boundary shape (two
    DataFrames co-partitioned on the key, each group's slice of BOTH
    sides delivered to one pandas function). The right tool when per-key
    logic needs both inputs at once (custom per-entity reconciliation,
    model scoring against per-key reference data) and neither a join nor
    a union-window expresses it.

    Scale shape: one shuffle per side on the key (exactly a join's cost);
    the per-key pandas frames are small by construction. Output here is
    deterministic integer math (counts + exact cents), so the query layer
    can oracle-check the full cogroup plumbing."""

    def merge(c: pd.DataFrame, p: pd.DataFrame) -> pd.DataFrame:
        uid = c["user_id"].iloc[0] if len(c) else p["user_id"].iloc[0]
        return pd.DataFrame(
            {
                "user_id": [int(uid)],
                "n_clicks": [len(c)],
                "n_purchases": [len(p)],
                "click_cents": [int(c["cents"].sum()) if len(c) else 0],
                "purchase_cents": [int(p["cents"].sum()) if len(p) else 0],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(merge, COGROUP_SCHEMA)
    )
