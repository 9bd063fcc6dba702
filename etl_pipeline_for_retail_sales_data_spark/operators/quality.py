"""Declarative data-quality constraint suite (Deequ-style).

Large-scale ingestion needs machine-checkable contracts on every batch
before it reaches training or reporting: null guards, domains, ranges,
key uniqueness, referential integrity. This module is the engine's
answer to that layer (the idea popularized by AWS Deequ / Great
Expectations / dbt tests): a suite of declarative checks compiled into
as few Spark jobs as possible, producing one violations row per check.

Execution shape, designed for 100 TB batches:
- Every ROW-LOCAL check (not-null, range, domain, regex, custom
  predicate) compiles to one conditional-sum aggregate; the whole set
  fuses into a SINGLE one-pass agg over the table — one scan, partial
  aggregation map-side, a 1-row result. Adding a 20th row-local check
  adds zero scans.
- uniqueness(cols) is one groupBy on the key (the shuffle is inherent:
  uniqueness is a global property) counting rows in over-represented
  groups.
- foreign_key(col → parent) is one left-anti join against the parent's
  distinct keys — broadcast when the parent is a dimension.

The report schema is (check, kind, n_violations, passed) — small,
unionable across tables, and trivially oracle-expressible: the driver
hash-checks the full suite against a DuckDB UNION ALL of the same
predicates (queries_registry.quality_suite_lineitem).

Reference parity note: the reference pipeline's validation layer is
hand-rolled per-column if-raise (scripts/extraction.py:86-93,
scripts/loading.py:58-73 — empty-frame and negative-value guards, also
implemented verbatim in operators/cleaning.py). This module is the
generalized, declarative form of that layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative constraint. ``violates`` (row-local kinds only) is
    the boolean column marking a VIOLATING row."""

    name: str
    kind: str
    violates: Column | None = None
    cols: tuple[str, ...] = ()
    parent: DataFrame | None = field(default=None, compare=False)
    parent_col: str = ""


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "not_null", F.col(col).isNull(), (col,))


def in_range(col: str, lo, hi) -> Check:
    """Closed interval; NULL is not a range violation (pair with
    not_null to forbid nulls)."""
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})",
        "in_range",
        c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)),
        (col,),
    )


def non_negative(col: str) -> Check:
    c = F.col(col)
    return Check(f"non_negative({col})", "non_negative", c.isNotNull() & (c < 0), (col,))


def accepted_values(col: str, *values) -> Check:
    c = F.col(col)
    return Check(
        f"accepted_values({col})",
        "accepted_values",
        c.isNotNull() & ~c.isin(list(values)),
        (col,),
    )


def matches_regex(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(
        f"matches_regex({col})",
        "matches_regex",
        c.isNotNull() & ~c.rlike(pattern),
        (col,),
    )


def satisfies(name: str, predicate: Column) -> Check:
    """Custom row-local constraint: ``predicate`` must hold on every row."""
    return Check(f"satisfies({name})", "satisfies", ~predicate)


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", None, tuple(cols))


@dataclass(frozen=True)
class MetricCheck:
    """Dataset-level metric constraint: ``violated`` is a boolean
    AGGREGATE expression (true ⇒ the dataset fails the check). Fused
    into the same single pass as the row-local checks — a metric check
    reports 0 or 1 violations."""

    name: str
    kind: str
    violated: Column


def completeness_at_least(col: str, ratio: float) -> MetricCheck:
    """At least ``ratio`` of rows have a non-null value (Deequ's
    completeness): tolerant counterpart of not_null for feeds where some
    missingness is expected but a collapse signals breakage."""
    c = F.sum(F.col(col).isNotNull().cast("long"))
    return MetricCheck(
        f"completeness_at_least({col},{ratio})",
        "completeness",
        c < F.lit(ratio) * F.count(F.lit(1)),
    )


def mean_in_range(col: str, lo: float, hi: float) -> MetricCheck:
    m = F.avg(F.col(col))
    return MetricCheck(
        f"mean_in_range({col},{lo},{hi})", "mean_in_range", ~m.between(lo, hi)
    )


def distinct_count_between(col: str, lo: int, hi: int) -> MetricCheck:
    d = F.countDistinct(F.col(col))
    return MetricCheck(
        f"distinct_count_between({col},{lo},{hi})",
        "distinct_count",
        ~d.between(lo, hi),
    )


def row_count_at_least(n: int) -> MetricCheck:
    """The reference's empty-extract guard, generalized
    (scripts/extraction.py:86-93 raises on an empty frame)."""
    return MetricCheck(
        f"row_count_at_least({n})", "row_count", F.count(F.lit(1)) < F.lit(n)
    )


def foreign_key(col: str, parent: DataFrame, parent_col: str) -> Check:
    return Check(
        f"foreign_key({col})", "foreign_key", None, (col,), parent, parent_col
    )


_REPORT_SCHEMA = "check string, kind string, n_violations long, passed boolean"


def run_checks(df: DataFrame, checks: list[Check | MetricCheck]) -> DataFrame:
    """Evaluate the suite; returns (check, kind, n_violations, passed),
    one row per check. Row-local AND metric checks share ONE aggregation
    pass; each unique/foreign_key check adds exactly one keyed job."""
    spark = df.sparkSession
    row_local = [c for c in checks if isinstance(c, Check) and c.violates is not None]
    metric = [c for c in checks if isinstance(c, MetricCheck)]
    reports: list[DataFrame] = []

    if row_local or metric:
        aggs = [
            F.sum(c.violates.cast("long")).alias(f"v{i}")
            for i, c in enumerate(row_local)
        ] + [
            c.violated.cast("long").alias(f"m{i}") for i, c in enumerate(metric)
        ]
        one = df.agg(*aggs)
        # melt the 1-row aggregate into report rows (stack is JVM-side)
        pairs = ", ".join(
            [
                f"'{c.name.replace(chr(39), chr(39)*2)}', '{c.kind}', coalesce(v{i}, 0L)"
                for i, c in enumerate(row_local)
            ]
            + [
                f"'{c.name.replace(chr(39), chr(39)*2)}', '{c.kind}', coalesce(m{i}, 0L)"
                for i, c in enumerate(metric)
            ]
        )
        melted = one.selectExpr(
            f"stack({len(row_local) + len(metric)}, {pairs}) as (check, kind, n_violations)"
        )
        reports.append(melted)

    for c in checks:
        if c.kind == "unique":
            over = (
                df.groupBy(*[F.col(x) for x in c.cols])
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("n_violations"))
            )
            reports.append(
                over.select(
                    F.lit(c.name).alias("check"),
                    F.lit(c.kind).alias("kind"),
                    F.col("n_violations").cast("long"),
                )
            )
        elif c.kind == "foreign_key":
            child_col = c.cols[0]
            orphans = (
                df.filter(F.col(child_col).isNotNull())
                .join(
                    F.broadcast(
                        c.parent.select(
                            F.col(c.parent_col).alias(child_col)
                        ).distinct()
                    ),
                    child_col,
                    "left_anti",
                )
                .agg(F.count("*").alias("n_violations"))
            )
            reports.append(
                orphans.select(
                    F.lit(c.name).alias("check"),
                    F.lit(c.kind).alias("kind"),
                    F.col("n_violations").cast("long"),
                )
            )

    if not reports:
        return spark.createDataFrame([], _REPORT_SCHEMA)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)


def assert_checks(df: DataFrame, checks: list[Check]) -> None:
    """Gate form: raise ValueError listing every failed check (the
    fail-the-batch posture the reference's validation layer takes)."""
    failed = [r for r in run_checks(df, checks).collect() if not r["passed"]]
    if failed:
        detail = "; ".join(f"{r['check']}: {r['n_violations']} violations" for r in failed)
        raise ValueError(f"Data quality checks failed: {detail}")


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity compliance report over quasi-identifier
    combinations — the privacy-side member of the governance family
    (the quality suite checks values; this checks RE-IDENTIFIABILITY):
    a row is k-anonymous iff its quasi-identifier combination is shared
    by >= k rows, and l-diverse iff that group carries >= l distinct
    sensitive values (Sweeney 2002; Machanavajjhala 2007). Groups
    failing either bound are the ones a release must generalize or
    suppress.

    Output: one row per QI combination — group size, distinct sensitive
    count, and the two compliance booleans. ONE hash aggregate over the
    table (count + count_distinct in the same pass); O(QI combinations)
    output. At 100 TB the QI-combination frame is the thing to bound —
    high-cardinality quasi-identifiers (e.g. exact timestamps) must be
    generalized BEFORE this check or every group has size 1 by
    construction (that result is the finding, not a failure mode).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("long").alias("group_size"),
            F.count_distinct(F.col(sensitive_col)).cast("long").alias(
                "n_sensitive_values"
            ),
        )
        .select(
            *quasi_cols,
            "group_size",
            "n_sensitive_values",
            (F.col("group_size") >= k).alias("k_anonymous"),
            (F.col("n_sensitive_values") >= l_div).alias("l_diverse"),
        )
    )
