#!/usr/bin/env python
"""Regenerate the plan showcase: formatted physical plans for
representative queries at sf0.001 — the artifact reviewers read to check
plan shapes without running Spark. Split per family (r11: PLANS.md had
grown past 8k lines): PLANS.md is the INDEX (family → file → query →
what to look for); the plans themselves live in plans_md/<family>.md.
Usage: python tools/dump_plans.py"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_for_retail_sales_data_spark.queries_registry import QUERIES  # noqa: E402
from etl_pipeline_for_retail_sales_data_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

# family -> [(query, what-to-look-for)]
SHOWCASE = {
    "relational": [
        ("sales_summary", "flagship: single scan, pushdown, two-phase agg, one exchange"),
        ("q3_shipping_priority", "broadcast dim + sort-merge fact join"),
        ("q6_revenue_forecast", "full predicate pushdown, scan-only pipeline"),
        ("q8_market_share", "widest join tree: five broadcast dims, ONE shuffled fact-fact join"),
        ("runtime_filter_revenue", "semi-join runtime filter prunes the fact scan BEFORE the join"),
        ("bucketed_colocated_join", (
            "bucketed tables: no shuffle to co-locate the join (tiny SF plans a "
            "broadcast; with broadcast off, SortMergeJoin with zero Exchange — "
            "pinned in test_bucketed_join_tables_no_exchange)"
        )),
        ("zorder_parts", "Z-order key: pure shift/mask integer math, whole-stage codegen"),
    ],
    "windows-topk": [
        ("top3_lines_per_brand", "window top-k, single shuffle on the partition key"),
        ("top100_orders", "global top-k: TakeOrderedAndProject, no full sort"),
        ("topk_agg_brand", "top-k inside one hash aggregate: no window shuffle"),
    ],
    "temporal": [
        ("asof_event_ticks", "as-of join as window-over-union: NO join node"),
        ("asof_forward_tolerance", "forward as-of + tolerance: window-over-union, NO join node"),
        ("range_join_promos", "tiny interval side: broadcast nested loop by design"),
        ("session_window_stats", "native session_window aggregate, one shuffle on the user key"),
        ("event_transitions", (
            "Markov transitions: one shuffle on user_id feeds the lead() "
            "window; normalization windows over the 25-cell pair frame only"
        )),
        ("touch_attribution_events", (
            "attribution: one window pass per user (IGNORE NULLS preceding-touch "
            "lookups) — no event-to-event self-join"
        )),
        ("cusum_revenue_changepoint", (
            "CUSUM: window cumsum runs on the O(periods) aggregate, never the "
            "fact table; (n, S) scalars broadcast"
        )),
    ],
    "dedup-similarity": [
        ("minhash_candidates", "LSH banding: explode + one self-equi-join, no cartesian"),
        ("ngram_jaccard_salted", (
            "salted-skew exact Jaccard: cold shingles on the plain inverted-index "
            "equi-join; hot shingles on (shingle, salt) with the right side "
            "replicated — per-reduce-key fan-out d²/n_salts, union re-aggregated "
            "once; no cartesian anywhere"
        )),
        ("ppjoin_jaccard", (
            "prefix-filtered exact similarity join: only the first "
            "|x|-ceil(t|x|)+1 rarest tokens are indexed, so the self-join runs "
            "on a fraction of the postings and stop-phrase shingles drop out of "
            "long docs' prefixes — skew handled with zero recall loss"
        )),
        ("canonical_dedup_pipeline_capped", (
            "df-capped candidate policy: the window count that enforces "
            "max_df inherits the shingle repartition (no extra exchange); "
            "per-key join fan-out bounded at max_df² by construction — "
            "compare the exact-salted pipeline's hot-key replication"
        )),
        ("source_overlap_matrix", (
            "cross-source fingerprint matrix (r8): source rides the winnowing "
            "projection (no doc_id join) and pairs explode in-row from ONE "
            "groupBy(fp) source-set aggregate — no corpus self-join; the only "
            "joins are broadcasts of the per-source size frame"
        )),
        ("record_linkage_parts", (
            "blocked entity resolution: self equi-join on the blocking key over "
            "the DISTINCT-name frame (vocabulary-sized), no cross join"
        )),
        ("triangle_coparts", (
            "degree-oriented triangle census: equi-joins only (wedge + closing "
            "edge), no cross join; orientation bounds per-node fan-out at "
            "O(sqrt(m)) however skewed the hubs"
        )),
        ("knn_bruteforce", "Arrow-scored knn: per-batch local top-k, tiny final window shuffle"),
    ],
    "selection-scoring": [
        ("lm_perplexity_filter", (
            "bigram-LM scoring: the MODEL (O(vocab) bigram aggregate) is the "
            "persisted frame; the corpus-sized shingle stream is deliberately "
            "NOT cached (shingled once to train, once to score — caching the "
            "corpus would invert the scale posture); percentile cut broadcast"
        )),
        ("dsir_selection", (
            "DSIR: 1024-bucket weight table is the whole model, broadcast to "
            "the scoring join; token frame persisted for its three consumers"
        )),
        ("hashed_classifier_score", (
            "feature-hashing classifier gate: ONE map-only JVM projection — the "
            "token fold is an interpreted HOF expression, never Python; zero "
            "Exchange, zero Join (pinned in test_hashed_classifier_is_map_only)"
        )),
        ("maxmatch_segmentation", (
            "greedy subword segmentation on the DISTINCT-word table: broadcast "
            "top-K vocabulary, per-word jump table + bounded JVM array fold "
            "(recursion-free, never Python), one token equi-join back to documents"
        )),
        ("quality_suite_lineitem", (
            "constraint suite: every row-local check fused into ONE scan "
            "(single partial_agg), uniqueness one keyed shuffle, FKs broadcast "
            "anti-joins"
        )),
        ("cdc_chunks", "content-defined chunking: pure array ops until the final fan-out"),
    ],
    "sketches-stats": [
        ("cm_heavy_hitters", "count-min sketch: bounded-cell agg + broadcast estimate join"),
        ("incremental_kmv_funnel", (
            "mergeable-sketch day composition (r11): the day×element "
            "range join broadcasts the 3-row day frame; cumulative "
            "distinct + the k-min rank run on (day, source)-partitioned "
            "windows — state after day D == k-min over days ≤ D, the "
            "algebra the stateful leg's replay safety rests on"
        )),
        ("kmv_overlap_matrix", (
            "theta-sketch overlap (r11): the corpus is scanned ONCE into "
            "<=k-row per-source sketches; all pair algebra (union rank, theta "
            "cut, intersection count) runs on |sources|·k sketch rows — the "
            "exact_inter truth join is the only corpus-sized pair join and "
            "exists purely to display estimate quality"
        )),
        ("zipf_law_fit", (
            "r11 rank rewrite: NO row_number anywhere — ranks are ENUMERATED "
            "per frequency class from chunked sequence() Generates (hash-"
            "repartitioned descriptors spread a giant hapax class); bucket "
            "offsets ride a bounded driver probe, so ONE corpus lineage, one "
            "bucket-PARTITIONED window, no ordered-only window at all"
        )),
        ("heaps_law_fit", (
            "r11 single-tokenize: exactly ONE regexp_extract_all in the plan; "
            "per-doc offsets = broadcast driver-probed bucket offsets + a "
            "bucket-PARTITIONED running sum; no ordered-only window remains "
            "and the former corpus join-back by doc_id is gone"
        )),
    ],
    "multimodal": [
        ("multimodal_decode_real", (
            "real-codec decode: two Arrow mapInPandas stages (encode → parse) "
            "back-to-back in one pipeline, zero shuffles — payloads stay on "
            "executors end to end"
        )),
        ("multimodal_h264_roundtrip", (
            "coded-video roundtrip (r11): the full H.264 I_PCM encode → MP4 "
            "sample tables → byte-exact decode is ONE Arrow stage, zero "
            "shuffles — frame pixels never leave their executor"
        )),
        ("audio_fingerprint_candidates", (
            "audio constellation dedup (r11): ONE lm_hash repartition reused "
            "by the posting-cap window AND both join sides (single Arrow "
            "signature pass — ReusedExchange in the final plan), then the "
            "inverted-index equi-join + per-pair offset aggregation"
        )),
        ("multimodal_dedup_components", (
            "cross-modal capstone (r11): image pHash edges ∪ audio landmark "
            "edges → min-label components; both candidate stages are "
            "inverted-index equi-joins, the loop iterates only over "
            "edge-incident nodes, every shuffle keys on node id"
        )),
    ],
}


def main() -> None:
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(root, "plans_md")
    os.makedirs(plans_dir, exist_ok=True)
    index = [
        "# PLANS — physical-plan showcase (index)",
        "",
        "Auto-generated by `tools/dump_plans.py` (sf0.001, AQE on; initial plans",
        "before runtime re-optimization). Plans live per family under",
        "`plans_md/`; what to look for is annotated per query; the assertions",
        "live in `tests/test_plans.py` and the registry-wide rules in",
        "`tests/test_plan_lint.py`.",
        "",
    ]
    for family, entries in SHOWCASE.items():
        fname = f"plans_md/{family}.md"
        index.append(f"## {family} ([{fname}]({fname}))")
        index.append("")
        out = [f"# PLANS — {family}", "",
               "Auto-generated by `tools/dump_plans.py`; see PLANS.md for the index.",
               ""]
        for name, why in entries:
            index.append(f"- `{name}` — {why}")
            df = QUERIES[name](spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            out.append(f"## {name}")
            out.append(f"*{why}*")
            out.append("")
            out.append("```")
            out.append(buf.getvalue().strip())
            out.append("```")
            out.append("")
        index.append("")
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(out))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(index))
    print(f"PLANS.md + {len(SHOWCASE)} family files written")


if __name__ == "__main__":
    main()