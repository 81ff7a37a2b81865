"""Generate PLANS.md: the formatted physical plan of each
representative query with the scale property it demonstrates — the
`.explain("formatted")` evidence behind SCALE.md's claims, in one
reviewable artifact (tests/test_plans.py asserts these properties on
every run; this file is for human review).

Reproduce: python3 scripts/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

# (query, the property the plan proves, what to look for)
SHOWCASE = [
    ("tpch_q6_forecast_revenue",
     "predicate pushdown + column pruning",
     "PushedFilters on l_shipdate/l_quantity/l_discount; ReadSchema has "
     "only the 4 referenced columns of lineitem's 11"),
    ("tpch_q5_local_supplier_volume",
     "broadcast dimension joins",
     "every dim join is BroadcastHashJoin (no shuffle of "
     "nation/region/customer/supplier); no cartesian"),
    ("ref_q1_top_host",
     "hash-aggregable windowed arg-max",
     "two-phase HashAggregate over packed BIGINT; no SortAggregate, "
     "no window function over the counts relation"),
    ("a1_requests_per_host",
     "map-side combine",
     "partial_count below the Exchange — the shuffle carries one row "
     "per key, not per event"),
    ("sort_limit_top_orders",
     "global top-k without a full sort",
     "TakeOrderedAndProject (per-partition top-k + driver merge)"),
    ("dedup_lsh_verified_pairs",
     "sub-quadratic two-stage dedup with a gated broadcast",
     "the persisted candidate pairs broadcast onto the shingle index "
     "(count-gated; sort-merge above the limit); no unblocked token "
     "self-join, no cartesian"),
    ("sim_knn_ivf",
     "broadcast codebook + hash-agg cell assignment",
     "BroadcastNestedLoopJoin against the tiny codebook; HashAggregate "
     "arg-max over packed BIGINT; no per-corpus-row window sort"),
    ("pipeline_llm_data_prep",
     "one declarative plan over narrow rows",
     "the text column never appears in any Exchange input schema; "
     "persisted post-gate features feed both dedup subtrees"),
    ("clf_parse_roundtrip",
     "single-pass regex parse + pushdown-barriered validity filter",
     "one regexp_replace + one split in the whole plan (no RLIKE); "
     "the non-deterministic _p projection pins the validity filter "
     "above the parse and above the spread Exchange, so the regex "
     "runs exactly once per row on spread partitions (r13)"),
    ("skew_salted_distinct_count",
     "skew-resistant exact distinct",
     "two-stage salted partial aggregation — disjoint hash slices, "
     "balanced partitions"),
    ("dedup_near_dup_clusters",
     "iterative graph op with constant plan depth",
     "the final label relation reads a localCheckpoint scan (lineage "
     "truncated per round) — no nested per-iteration subplans"),
    ("ts_pattern_search",
     "bounded-memory bucketed time-series scoring + exact top-k",
     "ONE Window exec over the bucket-level relation (offset base + "
     "overlap share a sort); one Arrow crossing (mapInPandas) for the "
     "scoring kernel; TakeOrderedAndProject at the top — no full-"
     "series aggregation buffer anywhere"),
    ("range_join_concurrent_events",
     "keyless band join without a nested loop",
     "the bin equi-join plans as a hash/sort-merge join with the "
     "exact band predicate as a post-join Filter — no "
     "BroadcastNestedLoopJoin, no CartesianProduct (the direct "
     "predicate form produces one; tests/test_asof_range.py proves "
     "both sides)"),
    ("hypertable_rollup_events",
     "multi-resolution rollup in one pass",
     "a single Expand feeding two-phase HashAggregate — one scan "
     "produces hour, day, and total grains; no per-grain re-scan"),
    ("pipeline_decontaminate",
     "fixed-size held-out side broadcast; corpus never shuffles on "
     "the n-gram",
     "the 13-gram join is BroadcastHashJoin (no SortMergeJoin of the "
     "exploded corpus); per-doc totals ride the explode, final "
     "hash-agg groups only post-join survivors"),
    ("dedup_exact_substring",
     "distributed ExactSubstr: gram-keyed equi-joins only; token "
     "arrays never ride the gram shuffle",
     "no cartesian/BNLJ anywhere; the positioned-gram build sits in "
     "a Project, never inlined into a pushed Filter; the rebuild "
     "join is keyed on doc_id with integer position payloads"),
    ("text_dsir_weights",
     "fixed-size fitted model broadcast; corpus never shuffles on "
     "the feature",
     "the K-row weight relation joins as BroadcastHashJoin after the "
     "gram explode; the two distribution estimates are two-phase "
     "HashAggregates keyed on the bucket (<= K rows cross the wire "
     "per task); per-doc scoring partials combine map-side; no "
     "SortAggregate, no cartesian"),
    ("dedup_semantic_prune",
     "cluster-blocked SemDeDup: broadcast codebook + packed arg-max "
     "+ one Arrow crossing per cluster",
     "BroadcastNestedLoopJoin against the tiny codebook only; "
     "HashAggregate max over ONE packed BIGINT (no SortAggregate, no "
     "per-vector window); a single ArrowEvalPython/FlatMapGroupsInPandas "
     "stage for the per-cluster Gram kernel; the corpus shuffles once, "
     "keyed by cell"),
    ("text_bm25_topk",
     "inverted-index scoring with a query-side broadcast",
     "the corpus-sized postings relation never re-shuffles for "
     "scoring: per-term (df, D, T) metadata is attached to the query "
     "relation and broadcasts onto the postings (BroadcastHashJoin); "
     "the dl window is partitioned by doc_id and rides the postings "
     "aggregate's own exchange; ranking is the two-phase "
     "HashAggregate top-k — no row_number, no unpartitioned window, "
     "no Python"),
    ("text_html_extract",
     "HTML -> text extraction as a pure codegen projection",
     "one WholeStageCodegen span over the scan: the whole wrap + "
     "script/style/comment/tag strip + entity unescape + whitespace "
     "normalization chain is regexp_replace/replace Column "
     "expressions — zero Exchange, no Python, scan-bound at any "
     "corpus size"),
    ("dedup_incremental_snapshot",
     "incremental dedup with NO pair join anywhere",
     "only hash equi-joins: increment vs the fingerprint index on "
     "text_hash, increment bands vs the band index and vs their own "
     "per-bucket minima — the within-batch near-dup source is a "
     "groupBy(bucket).min joined back, never a band self-join, so "
     "no bucket cap is needed and no N^2 candidate blowup exists; "
     "history text appears in no scan"),
    ("text_ngram_logprob",
     "model-sized ln, corpus-sized integer sums",
     "the only log() expressions sit in the vocabulary-sized LM/"
     "prefix/OOV model subtrees; the corpus-side scoring join "
     "aggregates long micro-nats with partial_sum below the "
     "Exchange (map-side combine), one rounded division at the top"),
    ("video_neardup_pairs",
     "video bytes reduce to per-frame BIGINT hashes before any join",
     "one MapInPandas crossing (demux + JPEG decode + DCT pHash + run "
     "construction in a single kernel); the pairing subtree joins only "
     "the (doc_id, fp) landmark relation — hash equi-join behind the "
     "hot-fp anti-join cap, no cartesian, no payload column in any "
     "Exchange"),
    ("mm_dedup_front_door",
     "codegen modality router; each modality's bytes cross into its "
     "own kernel only",
     "the routing projection is pure Column prefix checks inside the "
     "scan stage (no BatchEvalPython/ArrowEvalPython at the router); "
     "four filtered subtrees, each with its own single Arrow crossing "
     "or md5 projection; the unioned verdict relation carries only "
     "(doc_a, doc_b, modality, evidence)"),
    ("pipeline_decontaminate_fuzzy",
     "benchmark side broadcasts at BOTH stages (band gate + verify); "
     "the corpus never shuffles on the n-gram",
     "the eval-side banded relation and shingle inverted index enter "
     "BroadcastExchange; the train side's only wide exchanges are its "
     "own signature groupBy and the per-pair aggregates over the "
     "candidate-gated survivor set; no cartesian"),
    ("mm_image_decontaminate",
     "corpus images never shuffle: banded corpus hashes probe a "
     "broadcast benchmark band set",
     "ONE BroadcastHashJoin on (band_idx, band_val) with the "
     "bit_count Hamming verify folded into the join condition; no "
     "Exchange on the corpus side above the scan+Generate; no "
     "cartesian/BNLJ"),
]


def main() -> None:
    from flink_exercise_spark import registry
    from flink_exercise_spark.plans.inspect import formatted_plan
    from flink_exercise_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.specs()
    out = [
        "# PLANS — physical-plan evidence (generated by "
        "scripts/dump_plans.py)\n\n",
        "Formatted plans at sf0.01 for the queries that demonstrate "
        "each scale property; tests/test_plans.py asserts these "
        "properties mechanically on every run.\n",
    ]
    for name, prop, look in SHOWCASE:
        df = specs[name].fn(spark, SF)
        plan = formatted_plan(df)
        # keep the operator tree + the scan/exchange details, drop the
        # long column lists of intermediate Projects for readability
        head, _, detail = plan.partition("\n\n")
        keep = [s for s in detail.split("\n\n")
                if re.match(r"\(\d+\) (Scan|Exchange|HashAggregate|"
                            r"SortAggregate|BroadcastHashJoin|"
                            r"BroadcastNestedLoopJoin|SortMergeJoin|"
                            r"TakeOrderedAndProject|Filter)", s)]
        out.append(f"\n## {name}\n\n**Property:** {prop}.\n\n"
                   f"**Look for:** {look}.\n\n```\n{head}\n```\n")
        if keep:
            out.append("\nKey operators:\n\n```\n" + "\n\n".join(keep[:8])
                       + "\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.writelines(out)
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
