#!/usr/bin/env python
"""Substage profile of source_overlap_matrix's x16 scaling ratio (r7
verdict #3): replicate documents x1/x16 with scale_probe's token-tagged
replicator, then time the query's three substages separately in a fresh
process per multiple —

  1. fingerprint pass only (winnowing selection, map-only md5),
  2. + per-source distinct (the one corpus-sized shuffle),
  3. the full query (pair join + containment matrix).

Prints one JSON line per multiple. Usage: python tools/profile_overlap.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mult(d: str) -> None:
    from pyspark.sql import functions as F

    from etl_pipeline_for_retail_sales_data_spark.operators import dedup as D
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES
    from etl_pipeline_for_retail_sales_data_spark.session import get_spark

    spark = get_spark("overlap-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    docs.count()  # warm the scan

    def best_of3(fn):
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    # 1. fingerprint selection only — agg over fp so column pruning
    # cannot skip the md5/array work a bare count() would
    fp_only = lambda: D.winnowing_fingerprints(docs).agg(
        F.max("fp"), F.count("*")
    ).collect()
    # 2. + the per-fp source-set aggregate (the query's one corpus-sized
    # shuffle; r8 shape — source rides the fingerprint pass)
    def fp_distinct():
        (
            D.winnowing_fingerprints(docs, carry_cols=("source",))
            .groupBy("fp")
            .agg(F.array_sort(F.collect_set("source")).alias("ss"))
            .agg(F.max("fp"), F.count("*"))
            .collect()
        )
    full = lambda: QUERIES["source_overlap_matrix"](spark, d).count()

    out = {
        "fingerprints": best_of3(fp_only),
        "fp_distinct": best_of3(fp_distinct),
        "full_query": best_of3(full),
    }
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    from tools.scale_probe import replicate

    from etl_pipeline_for_retail_sales_data_spark.session import get_spark

    spark = get_spark("overlap-profile-replicate")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for mult in (1, 16):
            dirs[mult] = os.path.join(tmp, f"x{mult}")
            replicate(spark, dirs[mult], mult)
        spark.stop()
        for mult, d in dirs.items():
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run-mult", d],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                check=True,
            ).stdout
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            print(f"x{mult}: {line[7:]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run-mult":
        run_mult(sys.argv[2])
    else:
        main()
