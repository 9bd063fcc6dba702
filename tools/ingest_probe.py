#!/usr/bin/env python
"""Stateful-loop scaling probe (r8 verdict #2): measure PER-BATCH ingest
cost for the five incremental legs (exact fingerprints, MinHash text
LSH, hyperplane embedding LSH, Bloom bits, fixed-centroid semantic
verify) as the persistent STATE grows — constant batch (5k docs / 2k vectors) against state built from
x1 / x4 / x16 that batch volume.

What the curve is allowed to show, precisely: the classification join
never SHUFFLES the state (the state table is bucketed on the join key;
the plan is asserted Exchange-free on the state side in
tests/test_incremental_corpus.py), but it still SCANS it — a bucketed
equi-join reads the whole state side (Spark has no bucket pruning from
the probe side's keys). So the flat component is the batch's own work
(signature pass + its shuffle into n_buckets) and the growing component
is a columnar parquet scan of ~50 B/doc (exact), ~36 B·bands/doc
(neardup), ~n_tables rows/vec (embdup) — and for the BLOOM leg nothing
at all: the state is capped at m_bits rows however large the corpus, so
its curve must be flat outright. Near-flat slopes (scan-only growth,
orders of magnitude below re-shuffling or re-scanning the corpus) are
the 100 TB claim this probe pins with numbers.

Each state multiple runs in its own fresh process (same methodology as
tools/scale_probe.py — a shared JVM accumulates heap/metaspace drift
that late measurements would absorb). States are built with compaction
applied (steady-state shape), then the SAME-sized novel batch is timed
min-of-3 with distinct ids/texts per rep (each rep appends ~5k rows to
an 80k-row state at x16 — ≤7% drift across reps, absorbed by min-of-3).

Usage: python tools/ingest_probe.py   (writes the INGEST section into
SCALING.md between the INGEST-PROBE markers; the main body is owned by
tools/scale_probe.py, which preserves the section)."""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BATCH_DOCS = 5_000
BATCH_VECS = 2_000
MULTS = (1, 4, 16)
WORDS = 12  # tokens per synthetic doc: enough for 3-gram shingles
DIM = 64  # matches queries_registry._lsh_tables

SECTION_BEGIN = "<!-- INGEST-PROBE BEGIN -->"
SECTION_END = "<!-- INGEST-PROBE END -->"


def synth_docs(spark, n: int, tag: str, id_offset: int = 0):
    """n documents with globally-unique ids and texts (md5-derived
    tokens keyed by tag+id): no accidental duplicates within or across
    batches, so the funnel composition is constant at every multiple."""
    words = [
        F.md5(F.concat(F.lit(f"{tag}:{j}:"), F.col("id").cast("string")))
        for j in range(WORDS)
    ]
    return spark.range(n).select(
        (F.col("id") + F.lit(id_offset)).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )


def synth_dup_vecs(spark, n: int, tag: str, id_offset: int = 0, copies: int = 4):
    """n vectors where each DISTINCT vector appears ``copies`` times
    (components keyed by id // copies): the duplicate-heavy history that
    separates the semantic leg's state modes — "all" stores n rows,
    "keepers" stores ~n/copies."""
    comps = [
        (
            F.pmod(
                F.xxhash64(F.lit(f"{tag}:{j}"), (F.col("id") / copies).cast("long")),
                F.lit(2001),
            ).cast("double")
            / 1000.0
            - 1.0
        )
        for j in range(DIM)
    ]
    return spark.range(n).select(
        (F.col("id") + F.lit(id_offset)).alias("vec_id"),
        F.array(*comps).alias("embedding"),
    )


def synth_dup_docs(spark, n: int, tag: str, id_offset: int = 0, copies: int = 4):
    """n documents where each DISTINCT text appears ``copies`` times
    (tokens keyed by id // copies): the duplicate-heavy history that
    separates the keyed legs' state modes (r10 verdict #3) — "all"
    stores every doc's band keys, "keepers" only the accepted ~n/copies
    docs'."""
    words = [
        F.md5(
            F.concat(
                F.lit(f"{tag}:{j}:"), (F.col("id") / copies).cast("long").cast("string")
            )
        )
        for j in range(WORDS)
    ]
    return spark.range(n).select(
        (F.col("id") + F.lit(id_offset)).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )


def synth_vecs(spark, n: int, tag: str, id_offset: int = 0):
    """n unit-free random-ish vectors derived from xxhash64 (deterministic,
    no RNG): distinct vectors bucket near-uniformly across hyperplanes."""
    comps = [
        (
            F.pmod(
                F.xxhash64(F.lit(f"{tag}:{j}"), F.col("id")), F.lit(2001)
            ).cast("double")
            / 1000.0
            - 1.0
        )
        for j in range(DIM)
    ]
    return spark.range(n).select(
        (F.col("id") + F.lit(id_offset)).alias("vec_id"),
        F.array(*comps).alias("embedding"),
    )


def run_mult(mult: int) -> None:
    from etl_pipeline_for_retail_sales_data_spark.plans import incremental_corpus as IC
    from etl_pipeline_for_retail_sales_data_spark.queries_registry import (
        _lsh_tables,
        _sem_centroids,
    )
    from etl_pipeline_for_retail_sales_data_spark.session import get_spark

    spark = get_spark("ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tables = _lsh_tables()
    # 64 centroids so the semantic cells stay SemDeDup-shaped (~√n):
    # candidate volume per batch is |batch-cell| x |state-cell|
    cents = _sem_centroids(k=64)
    times = {}
    with tempfile.TemporaryDirectory() as tmp:
        # ---- build states at this multiple, compacted (steady state)
        hist_docs = synth_docs(spark, BATCH_DOCS * mult, "hist")
        hist_vecs = synth_vecs(spark, BATCH_VECS * mult, "hist")
        dirs = {
            leg: os.path.join(tmp, leg)
            for leg in ("exact", "neardup", "embdup", "bloom", "semantic")
        }
        IC.ingest_batch(spark, hist_docs, dirs["exact"])
        IC.compact_fingerprints(spark, dirs["exact"])
        IC.ingest_batch_neardup(spark, hist_docs, dirs["neardup"])
        IC.compact_neardup_state(spark, dirs["neardup"])
        IC.ingest_batch_embdup(spark, hist_vecs, dirs["embdup"], tables)
        IC.compact_embdup_state(spark, dirs["embdup"])
        IC.ingest_batch_bloom(spark, hist_docs, dirs["bloom"], m_bits=1 << 20, k=4)
        IC.compact_bloom_state(spark, dirs["bloom"])
        IC.ingest_batch_semantic(spark, hist_vecs, dirs["semantic"], cents)
        IC.compact_semantic_state(spark, dirs["semantic"])
        # r9 verdict #3 A/B: the SAME duplicate-heavy history (every
        # distinct vector x4) under both state modes — "keepers" state
        # is ~4x smaller, so the verify join's growing component drops
        hist_dup = synth_dup_vecs(spark, BATCH_VECS * mult, "hist")
        dirs["sem_dup_all"] = os.path.join(tmp, "sem_dup_all")
        dirs["sem_dup_keep"] = os.path.join(tmp, "sem_dup_keep")
        IC.ingest_batch_semantic(spark, hist_dup, dirs["sem_dup_all"], cents)
        IC.compact_semantic_state(spark, dirs["sem_dup_all"])
        IC.ingest_batch_semantic(
            spark, hist_dup, dirs["sem_dup_keep"], cents, state_mode="keepers"
        )
        IC.compact_semantic_state(spark, dirs["sem_dup_keep"])
        # r10 verdict #3: the SAME duplicate-heavy history under both
        # state modes for the KEYED legs — keepers-state holds ~1/4 the
        # key rows, so the history join's scan follows the deduped corpus
        hist_dup_docs = synth_dup_docs(spark, BATCH_DOCS * mult, "hist")
        for name, mode in (("nd_dup_all", "all"), ("nd_dup_keep", "keepers")):
            dirs[name] = os.path.join(tmp, name)
            IC.ingest_batch_neardup(spark, hist_dup_docs, dirs[name], state_mode=mode)
            IC.compact_neardup_state(spark, dirs[name])
        for name, mode in (("emb_dup_all", "all"), ("emb_dup_keep", "keepers")):
            dirs[name] = os.path.join(tmp, name)
            IC.ingest_batch_embdup(
                spark, hist_dup, dirs[name], tables, state_mode=mode
            )
            IC.compact_embdup_state(spark, dirs[name])

        # ---- time a constant novel batch per leg, min of 3 fresh batches
        def timed(fn) -> float:
            best = None
            for rep in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(rep)
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            return round(best, 3)

        off = 100_000_000  # probe ids never collide with state ids
        times["exact"] = timed(
            lambda r: IC.ingest_batch(
                spark, synth_docs(spark, BATCH_DOCS, f"p{r}", off * (r + 1)),
                dirs["exact"],
            )
        )
        times["neardup"] = timed(
            lambda r: IC.ingest_batch_neardup(
                spark, synth_docs(spark, BATCH_DOCS, f"p{r}", off * (r + 1)),
                dirs["neardup"],
            )
        )
        times["embdup"] = timed(
            lambda r: IC.ingest_batch_embdup(
                spark, synth_vecs(spark, BATCH_VECS, f"p{r}", off * (r + 1)),
                dirs["embdup"],
            )
        )
        times["bloom"] = timed(
            lambda r: IC.ingest_batch_bloom(
                spark, synth_docs(spark, BATCH_DOCS, f"p{r}", off * (r + 1)),
                dirs["bloom"],
            )
        )
        times["semantic"] = timed(
            lambda r: IC.ingest_batch_semantic(
                spark, synth_vecs(spark, BATCH_VECS, f"p{r}", off * (r + 1)),
                dirs["semantic"],
            )
        )
        times["sem_dup_all"] = timed(
            lambda r: IC.ingest_batch_semantic(
                spark, synth_dup_vecs(spark, BATCH_VECS, f"p{r}", off * (r + 1)),
                dirs["sem_dup_all"],
            )
        )
        times["sem_dup_keep"] = timed(
            lambda r: IC.ingest_batch_semantic(
                spark, synth_dup_vecs(spark, BATCH_VECS, f"p{r}", off * (r + 1)),
                dirs["sem_dup_keep"],
            )
        )
        times["nd_dup_all"] = timed(
            lambda r: IC.ingest_batch_neardup(
                spark, synth_dup_docs(spark, BATCH_DOCS, f"p{r}", off * (r + 1)),
                dirs["nd_dup_all"],
            )
        )
        times["nd_dup_keep"] = timed(
            lambda r: IC.ingest_batch_neardup(
                spark, synth_dup_docs(spark, BATCH_DOCS, f"p{r}", off * (r + 1)),
                dirs["nd_dup_keep"],
            )
        )
        times["emb_dup_all"] = timed(
            lambda r: IC.ingest_batch_embdup(
                spark, synth_dup_vecs(spark, BATCH_VECS, f"p{r}", off * (r + 1)),
                dirs["emb_dup_all"],
            )
        )
        times["emb_dup_keep"] = timed(
            lambda r: IC.ingest_batch_embdup(
                spark, synth_dup_vecs(spark, BATCH_VECS, f"p{r}", off * (r + 1)),
                dirs["emb_dup_keep"],
            )
        )
        # r11: the mergeable-sketch leg — per-group KMV state is BOUNDED
        # (k rows per group however much history), so its size column
        # must be CONSTANT across multiples and its time column flat
        # except the batch's own distinct-projection work
        dirs["sketch"] = os.path.join(tmp, "sketch")
        hist_src = hist_docs.withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
        )
        IC.ingest_batch_sketch(spark, hist_src, dirs["sketch"])
        times["sketch"] = timed(
            lambda r: IC.ingest_batch_sketch(
                spark,
                synth_docs(spark, BATCH_DOCS, f"p{r}", off * (r + 1)).withColumn(
                    "source",
                    F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")),
                ),
                dirs["sketch"],
            )
        )
        # r10 verdict #8: centroid-migration cost vs member count — one
        # recentroid_state pass per multiple (rewrites every member row
        # under new centroids), so the migration window can be sized
        # like maintenance
        new_cents = _sem_centroids(k=48)
        t0 = time.perf_counter()
        IC.recentroid_state(spark, dirs["semantic"], new_cents)
        times["recentroid"] = round(time.perf_counter() - t0, 3)
        # r9 verdict #7: the nightly maintenance pass rewrites every
        # leg's full state — one wall-clock number per multiple so the
        # runbook can size the window (sum over the five standard legs)
        t0 = time.perf_counter()
        for leg in ("exact", "neardup", "embdup", "bloom", "semantic"):
            IC.maintain_state(spark, dirs[leg])
        times["maintenance"] = round(time.perf_counter() - t0, 3)
        # state row counts for the table (scan-size context)
        sizes = {
            "exact": spark.read.parquet(dirs["exact"] + "/fingerprints").count(),
            "neardup": spark.read.parquet(dirs["neardup"] + "/neardup_bands").count(),
            "embdup": spark.read.parquet(dirs["embdup"] + "/embdup_buckets").count(),
            "bloom": spark.read.parquet(dirs["bloom"] + "/bloom_bits").count(),
            "semantic": spark.read.parquet(
                dirs["semantic"] + "/semantic_members"
            ).count(),
            "sem_dup_all": spark.read.parquet(
                dirs["sem_dup_all"] + "/semantic_members"
            ).count(),
            "sem_dup_keep": spark.read.parquet(
                dirs["sem_dup_keep"] + "/semantic_members"
            ).count(),
            "nd_dup_all": spark.read.parquet(
                dirs["nd_dup_all"] + "/neardup_bands"
            ).count(),
            "nd_dup_keep": spark.read.parquet(
                dirs["nd_dup_keep"] + "/neardup_bands"
            ).count(),
            "emb_dup_all": spark.read.parquet(
                dirs["emb_dup_all"] + "/embdup_buckets"
            ).count(),
            "emb_dup_keep": spark.read.parquet(
                dirs["emb_dup_keep"] + "/embdup_buckets"
            ).count(),
            "sketch": spark.read.parquet(dirs["sketch"] + "/kmv_sketch").count(),
        }
        sizes["maintenance"] = sum(
            sizes[k] for k in ("exact", "neardup", "embdup", "bloom", "semantic")
        )
        sizes["recentroid"] = sizes["semantic"]
    print("RESULT " + json.dumps({"times": times, "sizes": sizes}), flush=True)
    spark.stop()


def main() -> None:
    results = {}
    for mult in MULTS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-mult", str(mult)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            check=True,
        ).stdout
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[mult] = json.loads(line[len("RESULT "):])
        print(mult, results[mult], flush=True)

    lines = [
        SECTION_BEGIN,
        "",
        "## Stateful ingest: per-batch cost vs state size",
        "",
        "Constant batch (5k docs / 2k vectors) ingested against compacted",
        "state built from x1/x4/x16 that volume; min of 3 fresh batches,",
        "one fresh process per multiple (`tools/ingest_probe.py`). The",
        "classification join never shuffles the state (bucketed, plan-",
        "asserted) but does SCAN it — the slope is a columnar scan of the",
        "compact key table (~50 B/doc exact, 4 rows/doc neardup bands,",
        "4 rows/vec embdup, 1 row/vec + unit vector semantic, ≤m_bits",
        "rows bloom), never a re-shuffle or a corpus rescan. The bloom",
        "leg's state is CAPPED at m_bits rows, so its curve is flat by",
        "construction. The semantic leg (64 centroid cells here) also",
        "pays its verify join's candidate growth: |batch-cell| x",
        "|state-cell| rounded-cosine scores — linear in state for a",
        "constant batch, the SemDeDup cost model.",
        "",
        "| Leg | state x1 rows | x16 rows | batch @x1 (s) | @x4 (s) | @x16 (s) | x16/x1 |",
        "|---|---|---|---|---|---|---|",
    ]
    lines[-2:] = [
        "",
        "`sem_dup_all` / `sem_dup_keep`: the same duplicate-heavy history",
        "(every distinct vector x4) under the two semantic state modes —",
        "keepers-state holds ~1/4 the rows at every multiple, so the",
        "verify join's growing component drops with it (r9 verdict #3).",
        "`nd_dup_*` / `emb_dup_*` (r10 verdict #3): the same A/B for the",
        "KEYED legs — x4-duplicated texts/vectors under state_mode all vs",
        "keepers; the keepers state holds ~1/4 the key rows (neardup:",
        "exactly 1/4), so the history join's scan follows the DEDUPED",
        "corpus. emb_dup_keep collapses much further (24 rows at every",
        "multiple): with 4-bit buckets there are only 16 per table, so",
        "exists-semantics reject almost every vector as a bucket",
        "collision and the keeper set saturates at one per occupied",
        "bucket — the honest illustration of how aggressively keeper",
        "mode narrows when the key function is coarse. `recentroid` is",
        "one centroid-migration pass (recentroid_state, 64 -> 48 cells)",
        "per multiple: it rewrites every semantic member row, so it",
        "scales with member count — the number that sizes the migration",
        "window (r10 verdict #8).",
        "`sketch` (r11): the mergeable KMV leg — state is BOUNDED at",
        "k rows per group (here 20 sources x 128 = 2560 rows at EVERY",
        "multiple, the constant-size column), so its per-batch time is",
        "the batch's own distinct projection plus a groups*k-row merge,",
        "flat in history by construction.",
        "`maintenance` is one full nightly pass (recover + compact all",
        "five legs + log roll + epoch prune) per multiple: it REWRITES",
        "every leg's state, so it grows with total state rows — the",
        "number that sizes the maintenance window (r9 verdict #7).",
        "Honesty note on the semantic rows: at this probe's scale the",
        "semantic legs sit on a fixed per-batch floor (~10 s of assignment +",
        "verify-join job overhead), so their TIME columns are noise-dominated",
        "— the state-row columns carry the scale signal (sem_dup_keep stores",
        "1/4 the rows of sem_dup_all at every multiple, and the verify join's",
        "candidate volume |batch-cell|x|state-cell| scales with exactly those",
        "rows). The maintenance row's growth IS visible (it rewrites every",
        "state row).",
        "",
        lines[-2],
        lines[-1],
    ]
    for leg in (
        "exact", "neardup", "embdup", "bloom", "semantic",
        "sem_dup_all", "sem_dup_keep",
        "nd_dup_all", "nd_dup_keep", "emb_dup_all", "emb_dup_keep",
        "sketch", "maintenance", "recentroid",
    ):
        t = [results[m]["times"][leg] for m in MULTS]
        s1 = results[1]["sizes"][leg]
        s16 = results[16]["sizes"][leg]
        lines.append(
            f"| {leg} | {s1} | {s16} | {t[0]} | {t[1]} | {t[2]} | "
            f"{round(t[2] / t[0], 2)}x |"
        )
    lines += ["", SECTION_END]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.md")
    body = open(path).read() if os.path.exists(path) else ""
    section = "\n".join(lines)
    if SECTION_BEGIN in body:
        pre = body.split(SECTION_BEGIN)[0].rstrip()
        post = body.split(SECTION_END, 1)[1].lstrip("\n") if SECTION_END in body else ""
        body = pre + "\n\n" + section + ("\n\n" + post if post else "\n")
    else:
        body = body.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(body)
    print("SCALING.md ingest section written")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run-mult":
        run_mult(int(sys.argv[2]))
    else:
        main()
