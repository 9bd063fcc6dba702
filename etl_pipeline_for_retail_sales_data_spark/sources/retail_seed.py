"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): the
reference's bootstrap seed generator as a first-class Spark connector.

The reference seeds its Postgres source table with 15 rows per channel —
10 valid (5 per day) and 5 deliberately invalid for cleaning tests
(reference scripts/extraction.py:38-57; in-store twin
data/input/in_store_sales.csv:2-16). Here that bootstrap is a registered
``spark.read.format("retail_seed")`` source instead of engine-side DDL:
one InputPartition per channel, so the read is planned like any
multi-split scan (each partition deserializes independently on an
executor — the same contract a real connector at scale follows).

Usage::

    register(spark)
    df = spark.read.format("retail_seed").load()          # both channels
    df = spark.read.format("retail_seed").option("channel", "online").load()
    stream = spark.readStream.format("retail_seed").load()   # one micro-batch per day
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import SALES_SCHEMA

D1 = datetime.date(2025, 4, 2)
D2 = datetime.date(2025, 4, 3)

# (sale_id, product_id, quantity, sale_amount, sale_date, source) — values
# mirror reference scripts/extraction.py:38-57 / in_store_sales.csv:2-16:
# rows 11-15 of each channel are the dirty rows (zero/negative/null
# quantity or amount) that the cleaning stage must drop.
SEED_ROWS: dict[str, list[tuple]] = {
    "online": [
        (1, 101, 3, 60.00, D1, "online"),
        (2, 102, 2, 45.00, D1, "online"),
        (3, 103, 1, 30.00, D1, "online"),
        (4, 104, 2, 40.00, D1, "online"),
        (5, 105, 1, 22.50, D1, "online"),
        (6, 101, 4, 120.00, D2, "online"),
        (7, 102, 2, 55.00, D2, "online"),
        (8, 103, 3, 75.00, D2, "online"),
        (9, 105, 1, 20.00, D2, "online"),
        (10, 106, 2, 55.00, D2, "online"),
        (11, 101, 0, 10.00, D2, "online"),
        (12, 102, -1, 20.00, D2, "online"),
        (13, 103, 2, -5.00, D2, "online"),
        (14, 104, None, 30.00, D2, "online"),
        (15, 105, 2, None, D2, "online"),
    ],
    "in_store": [
        (1, 101, 2, 40.00, D1, "in_store"),
        (2, 102, 1, 25.00, D1, "in_store"),
        (3, 103, 3, 75.00, D1, "in_store"),
        (4, 101, 1, 20.00, D1, "in_store"),
        (5, 102, 2, 50.00, D1, "in_store"),
        (6, 104, 5, 125.00, D2, "in_store"),
        (7, 105, 1, 35.50, D2, "in_store"),
        (8, 101, 3, 60.00, D2, "in_store"),
        (9, 102, 2, 50.00, D2, "in_store"),
        (10, 106, 4, 80.00, D2, "in_store"),
        (11, 103, 0, 30.00, D2, "in_store"),
        (12, 104, -1, 25.00, D2, "in_store"),
        (13, 105, None, 45.00, D2, "in_store"),
        (14, 106, 2, -15.00, D2, "in_store"),
        (15, 101, 3, None, D2, "in_store"),
    ],
}


class ChannelPartition(InputPartition):
    def __init__(self, channel: str):
        self.channel = channel


class RetailSeedReader(DataSourceReader):
    def __init__(self, options):
        self.channel = options.get("channel")
        self.min_product: int | None = None
        self._pushed = False

    def pushFilters(self, filters):
        """Connector-side pushdown (the Python-DataSource analog of
        parquet PushedFilters): EqualTo(source) prunes a whole partition
        before any row is produced; GreaterThan(product_id) filters
        inside read(). Everything else is returned as unsupported and
        Spark re-applies it above the scan.

        Guard: two differently-filtered branches derived from ONE
        ``load()`` share this reader instance, and Spark pushes each
        branch's filters into it in turn — last write would silently win
        for BOTH branches (observed: a union of online/in_store branches
        double-counting one channel). Absorbing state twice is therefore
        an error; use a separate ``load()`` per branch."""
        from pyspark.sql.datasource import EqualTo, GreaterThan

        if self._pushed:
            raise RuntimeError(
                "retail_seed reader received pushFilters twice — branches of a "
                "shared load() would overwrite each other's pushed filters; "
                "call spark.read.format('retail_seed').load() once per branch"
            )
        self._pushed = True
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("source",) and f.value in SEED_ROWS:
                self.channel = f.value
            elif isinstance(f, GreaterThan) and f.attribute == ("product_id",):
                self.min_product = f.value
            else:
                yield f

    def partitions(self):
        channels = [self.channel] if self.channel else sorted(SEED_ROWS)
        return [ChannelPartition(c) for c in channels]

    def read(self, partition: ChannelPartition):
        for r in SEED_ROWS[partition.channel]:
            if self.min_product is None or r[1] > self.min_product:
                yield r


class RetailSeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: one micro-batch per sale day (the reference's
    daily-schedule seam, SURVEY.md §1.1 — each Airflow run day becomes an
    offset range). Offsets are replayable dicts, so checkpoint recovery
    re-reads a day deterministically via readBetweenOffsets."""

    DAYS = (D1, D2)

    def __init__(self, options):
        self.channel = options.get("channel")

    def initialOffset(self) -> dict:
        return {"day_idx": 0}

    def _rows_for(self, day_idx: int):
        day = self.DAYS[day_idx]
        for c in [self.channel] if self.channel else sorted(SEED_ROWS):
            for r in SEED_ROWS[c]:
                if r[4] == day:
                    yield r

    def read(self, start: dict):
        # rows must be a picklable sequence (the runner caches the batch
        # for possible replay), not a generator
        i = start["day_idx"]
        if i >= len(self.DAYS):
            return iter([]), start
        return iter(list(self._rows_for(i))), {"day_idx": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            r for i in range(start["day_idx"], end["day_idx"]) for r in self._rows_for(i)
        ]


class RetailSeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "retail_seed"

    def schema(self):
        return SALES_SCHEMA

    def reader(self, schema) -> RetailSeedReader:
        return RetailSeedReader(self.options)

    def simpleStreamReader(self, schema) -> RetailSeedStreamReader:
        return RetailSeedStreamReader(self.options)


def register(spark) -> None:
    # connector-side pushdown is opt-in for Python sources
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(RetailSeedDataSource)
