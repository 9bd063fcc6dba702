#!/usr/bin/env python
"""Optimization-round profiler: for the named registry queries, capture
the formatted physical plan to plans/r11/<query>_<tag>.txt and time the
computation with the noop sink (guide §1.4 — no output cost, every
column materialized), reporting per-query min/median over reps plus
plan-shape stats (Exchange count, join strategies, Python eval nodes)
and the number of Spark jobs the query launches (eager probes +
iterative fixpoints show up here; a plain one-action query counts 1).

Usage: python tools/opt_profile.py [--tag before] [--reps 3] [--sf DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES  # noqa: E402
from etl_pipeline_for_retail_sales_data_spark.session import get_spark  # noqa: E402

PLAN_NODES = re.compile(
    r"\b(Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition|"
    r"BroadcastExchange|SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct|BatchEvalPython|ArrowEvalPython|"
    r"MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas|Window\b|Sort\b|"
    r"TakeOrderedAndProject|HashAggregate|ObjectHashAggregate|SortAggregate|Generate)"
)


def plan_stats(txt: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for m in PLAN_NODES.finditer(txt):
        k = m.group(1).strip()
        counts[k] = counts.get(k, 0) + 1
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plandir", default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = args.plandir or os.path.join(root, "plans", "r11")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # warmup: JVM, scan caches, python worker pool (mirrors bench.py)
    QUERIES["sales_summary"](spark, args.sf).count()

    def _noop(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    spark.range(64).repartition(32).mapInPandas(_noop, "id long").count()

    results = {}
    for name in args.queries:
        if name not in QUERIES:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        sc.setJobDescription(f"opt-profile:{name}")
        # plan capture (fresh frame; construction may run eager probes)
        df = QUERIES[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan_txt = buf.getvalue()
        with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan_txt)
        ts, jobs_per_rep = [], []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            ids0 = sc.statusTracker().getJobIdsForGroup()
            t0 = time.perf_counter()
            d = QUERIES[name](spark, args.sf)
            d.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            ids1 = sc.statusTracker().getJobIdsForGroup()
            jobs_per_rep.append(len(set(ids1 or []) - set(ids0 or [])))
            del j0
        sc.setJobDescription(None)
        results[name] = {
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "jobs": jobs_per_rep[-1],
            "plan": plan_stats(plan_txt),
        }
        print(f"{name}: min={results[name]['min']}s median={results[name]['median']}s "
              f"jobs={results[name]['jobs']} plan={results[name]['plan']}", flush=True)
    print(json.dumps({"tag": args.tag, "sf": args.sf, "results": results}))


if __name__ == "__main__":
    main()
