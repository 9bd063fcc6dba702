"""Fresh-process drive of the driver contract (verify skill recipe).

Runs entry() at sf0.001, then every queries() entry at sf0.01 compared
against its oracle_sql() via DuckDB. MUST run with cwd=/root/repo.
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


def main():
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
