"""Fresh-process drive of the driver contract (verify skill recipe).

Runs entry() at sf0.001, then every queries() entry at sf0.01 compared
against its oracle_sql() via DuckDB. MUST run with cwd=/root/repo.

`--sweeps` runs the degenerate-input robustness sweeps instead of the
oracle drive: every registered query over EMPTY tables and over
NULL-INJECTED tables (same fixtures as tests/test_empty_inputs.py, built
from sf0.001). Added round 5 after qdigest_quantiles shipped with an
empty-corpus crash the oracle drive could not see — the pre-commit gate
now covers the edge cases, not just value parity. Targeted:
`--sweeps name1 name2 ...` sweeps only those queries.
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


SF_SMOKE = "/root/testdata/sf0.001"

# value columns eligible for null injection (keys stay intact) — mirrors
# tests/test_empty_inputs.py NULLABLE
NULLABLE = {
    "documents": ["text", "lang"],
    "embeddings": ["embedding", "label"],
    "events": ["value", "event_type", "props"],
    "lineitem": ["l_discount", "l_returnflag", "l_shipdate"],
    "orders": ["o_totalprice", "o_orderdate", "o_orderstatus"],
    "customer": ["c_acctbal"],
    "part": ["p_brand"],
}


def run_sweeps(only):
    """Empty-table + null-injection sweep over every registry query.

    A query passes a sweep iff it collects without raising — results may
    legitimately be empty or reduced. Exit 1 on any failure.
    """
    import tempfile

    from pyspark.sql import functions as F

    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES

    spark = (
        SparkSession.builder.appName("verify-sweeps")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="drive_sweeps_")
    empty_sf = f"{base}/empty"
    nulled_sf = f"{base}/nulled"
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{empty_sf}/{t}.parquet")
        nd = df
        for c in NULLABLE.get(t, []):
            if c in nd.columns:
                nd = nd.withColumn(
                    c,
                    F.when(
                        F.abs(F.hash(nd.columns[0])) % 10 == 0, None
                    ).otherwise(F.col(c)),
                )
        nd.write.mode("overwrite").parquet(f"{nulled_sf}/{t}.parquet")

    names = [n for n in sorted(QUERIES) if not only or n in only]
    failures = []
    for label, sf in [("empty", empty_sf), ("nulled", nulled_sf)]:
        for name in names:
            try:
                QUERIES[name](spark, sf).collect()
            except Exception as e:  # noqa: BLE001 - report all at once
                msg = str(e).splitlines()[0][:140] if str(e) else ""
                failures.append(f"{label}/{name}: {type(e).__name__}: {msg}")
                print(f"SWEEP FAIL {label}/{name}: {type(e).__name__}: {msg}", flush=True)
        print(f"sweep '{label}' done: {len(names)} queries", flush=True)
    print(f"SWEEPS SUMMARY queries={len(names)} failures={len(failures)}", flush=True)
    sys.exit(1 if failures else 0)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--sweeps":
        run_sweeps(sys.argv[2:])
        return

    import __spark_entry__ as em

    spark = (
        SparkSession.builder.appName("verify")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = em.entry(spark).count()
    assert n > 0, "entry() returned 0 rows"
    print(f"entry OK: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    queries = em.queries()
    oracles = em.oracle_sql()
    only = sys.argv[1:]
    n_match = n_mismatch = n_rowsonly = n_err = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF)
            srows = sdf.collect()
            scols = [f.lower() for f in sdf.columns]
            if name not in oracles:
                print(f"{name}: ROWS_ONLY ({len(srows)} rows)", flush=True)
                n_rowsonly += 1
                continue
            res = con.execute(oracles[name])
            ocols = [d[0].lower() for d in res.description]
            orows = res.fetchall()
            if sorted(scols) != sorted(ocols):
                print(f"{name}: MISMATCH cols spark={sorted(scols)} oracle={sorted(ocols)}", flush=True)
                n_mismatch += 1
                continue
            if len(srows) != len(orows):
                print(f"{name}: MISMATCH rowcount spark={len(srows)} oracle={len(orows)}", flush=True)
                n_mismatch += 1
                continue
            s_norm = norm_rows(scols, [tuple(r) for r in srows])
            o_norm = norm_rows(ocols, orows)
            if s_norm != o_norm:
                bad = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:3]
                print(f"{name}: MISMATCH values e.g. {bad}", flush=True)
                n_mismatch += 1
            else:
                print(f"{name}: MATCH ({len(srows)} rows)", flush=True)
                n_match += 1
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}", flush=True)
            n_err += 1
    print(
        f"SUMMARY match={n_match} rows_only={n_rowsonly} "
        f"mismatch={n_mismatch} error={n_err}",
        flush=True,
    )
    sys.exit(1 if (n_mismatch or n_err) else 0)


if __name__ == "__main__":
    main()
