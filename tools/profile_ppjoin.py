#!/usr/bin/env python
"""Substage profile of ppjoin_jaccard's x16 scaling ratio: replicate
documents x1/x16 (token-tagged, scale_probe's replicator), then time the
pipeline's cumulative substages in a fresh process per multiple —

  1. shingle+df+rank: Arrow shingling, document-frequency window, per-doc
     rarity rank, prefix selection (count over the prefix frame),
  2. + candidates: prefix self-equi-join + size/positional filters +
     the pair aggregate with the first-match bound,
  3. the full query (verify join + exact Jaccard).

Prints one JSON line per multiple. Usage: python tools/profile_ppjoin.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mult(d: str) -> None:
    from etl_pipeline_for_retail_sales_data_spark.operators.dedup import (
        _ppjoin_candidates,
    )
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES
    from etl_pipeline_for_retail_sales_data_spark.session import get_spark

    spark = get_spark("ppjoin-profile")
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

    def prefix_only():
        # same plan as the candidate generator up to (and including) the
        # prefix selection; count forces the df window + rank
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from etl_pipeline_for_retail_sales_data_spark.operators.dedup import (
            doc_shingles_arrow,
        )

        t_micro = 500_000
        sh = (
            doc_shingles_arrow(docs, "text", 3, with_size=True)
            .repartition("shingle")
            .withColumn("__df", F.count("*").over(Window.partitionBy("shingle")))
            .repartition("doc_id")
        )
        ranked = sh.withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("__df", "shingle")),
        )
        ceil_tn = F.floor(
            (F.lit(t_micro) * F.col("n_sh") + F.lit(999_999)) / F.lit(1_000_000)
        )
        ranked.filter(F.col("pos") <= F.col("n_sh") - ceil_tn + 1).count()

    def candidates_only():
        cand, _sh = _ppjoin_candidates(docs, "text", 3, 0.5, positional=True)
        cand.count()

    out = {
        "prefix_rank": best_of3(prefix_only),
        "candidates": best_of3(candidates_only),
        "full_query": best_of3(
            lambda: QUERIES["ppjoin_jaccard"](spark, d).count()
        ),
    }
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    from tools.scale_probe import replicate

    from etl_pipeline_for_retail_sales_data_spark.session import get_spark

    spark = get_spark("ppjoin-profile-replicate")
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
