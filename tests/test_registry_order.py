"""The driver verifies a bounded prefix of the registry order; these
tests pin the ordering contract so a refactor can't silently push a
high-value query out of the verification window."""

from __future__ import annotations

from flink_exercise_spark import registry

WINDOW = 50  # the driver's observed verification-window size (round 1)


def _names():
    return list(registry.specs())


def test_oracled_before_rows_only():
    specs = registry.specs()
    names = _names()
    seen_rows_only = False
    for n in names:
        if specs[n].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracled {n} after a rows-only entry"


def test_demoted_showcases_sort_last_within_oracled():
    specs = registry.specs()
    oracled = [n for n in _names() if specs[n].oracle is not None]
    demoted = [n for n in oracled if specs[n].priority > 0]
    # Round-14 rotation (executes VERDICT r13 ask #7): the 40 entries
    # demoted in r13 return to the driver window (their freshest
    # driver pass is r12 — one more round out would break the 2-round
    # bound). Forty entries green in r13 (CORRECTNESS_r13: 50/50) take
    # the rotation slots. The window keeps the three reference
    # queries, the five streaming parity entries plus
    # stream_neardup_ingest, and video_neardup_pairs /
    # mm_dedup_front_door for consecutive passes (same keep set as
    # r13; stream_interval_join_attribution returns after its
    # one-round seat loan). Every demoted entry holds an r13 driver
    # pass (enforced below) and an independent non-DuckDB pin, noted
    # at its register() site — the r14 wave was pre-paid in r13
    # (COVERAGE.md mid-round note; pins for the two newest entries
    # landed in bc3b18b).
    assert set(demoted) == {
        # test_rotation_pins.py pins
        "events_type_stats",
        "a1_running_counts_analytic",
        "events_json_props",
        "t4_sliding_window_counts",
        "hypertable_rollup_events",
        "sim_knn_ivf",
        "sim_embedding_near_dup_pairs",
        "dedup_semantic_prune",
        "sim_label_centroid_norms",
        "skew_salted_distinct_count",
        "text_stats",
        "text_language_id",
        "dedup_lsh_verified_pairs",
        "dedup_near_dup_clusters",
        "dedup_cluster_keep_best",
        "dedup_simhash_near_pairs",
        "pipeline_llm_data_prep",
        "pipeline_decontaminate_fuzzy",
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q6_forecast_revenue",
        "tpch_q14_promo_revenue",
        "join_semi_anti_customers",
        "intersect_except_custkeys",
        "ts_pattern_search",
        "text_vocab_topk",
        "text_token_rarity",
        # own-file fixture-reference pins (cited at the register site)
        "text_chunk_overlap",
        "range_join_concurrent_events",
        "pipeline_temperature_mix",
        "pipeline_pack_chunks",
        "text_dsir_weights",
        "doc_quantiles_by_source",
        "retrieval_hybrid_rrf",
        "text_bm25_topk",
        "dedup_incremental_snapshot",
        "text_ngram_logprob",
        "text_lm_cross_score",
        "mm_image_decontaminate",
    }
    assert sorted(oracled[-len(demoted):]) == sorted(demoted)  # contiguous tail


def test_priority0_count_fits_observed_window():
    """The ~50-slot window is an OBSERVATION of the driver, not a
    constant — re-confirm it against the latest CORRECTNESS artifact
    every round (r4 advisor ask) instead of trusting round 1's
    measurement: the number of priority-0 oracled entries must never
    exceed the number of entries the driver actually verified."""
    import glob
    import json

    import pytest

    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        pytest.skip("no driver correctness artifact yet")
    observed = len(json.load(open(files[-1])))
    specs = registry.specs()
    n_p0 = sum(
        1 for s in specs.values() if s.oracle is not None and s.priority == 0
    )
    assert n_p0 <= observed, (
        f"{n_p0} priority-0 oracled entries but the driver last "
        f"verified only {observed} — some would silently miss their "
        f"driver pass; demote the excess or confirm a larger window"
    )


def test_demoted_entries_hold_recent_driver_pass():
    """The rotation freshness contract, mechanized: every entry
    currently demoted (priority>0) must hold a hash-green driver pass
    in one of the LAST TWO CORRECTNESS artifacts — a demotion parks an
    already-verified query for one round, never an unverified one."""
    import glob
    import json

    import pytest

    files = sorted(glob.glob("CORRECTNESS_r*.json"))[-2:]
    if not files:
        pytest.skip("no driver correctness artifact yet")
    green: set[str] = set()
    for f in files:
        green |= {
            k
            for k, v in json.load(open(f)).items()
            if v.get("hash_match")
        }
    specs = registry.specs()
    demoted = {
        n for n, s in specs.items() if s.oracle is not None and s.priority > 0
    }
    missing = demoted - green
    assert not missing, (
        f"demoted without a recent driver pass: {sorted(missing)}"
    )


def test_high_value_queries_inside_window():
    """Streaming parity, every dedup/similarity/text operator, and the
    reference queries must all sit inside the driver's window."""
    specs = registry.specs()
    names = _names()
    window = set(names[:WINDOW])
    must_verify = [
        n for n in names
        if specs[n].oracle is not None and specs[n].priority == 0
    ]
    missing = [n for n in must_verify if n not in window]
    assert not missing, f"priority-0 oracled queries outside window: {missing}"
