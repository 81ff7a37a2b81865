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
    # Round-13 rotation (executes VERDICT r12 ask #1): the 38 entries
    # demoted in r12 return to the driver window (their freshest
    # driver pass is r11 — one more round out would break the 2-round
    # bound). Forty entries green in r12 (CORRECTNESS_r12: 50/50) take
    # the rotation slots — the 38 returners' seats plus two more so
    # the new fuzzy-decontamination (pipeline_decontaminate_fuzzy) and
    # image-decontamination (mm_image_decontaminate) entries collect
    # their FIRST hash-checked passes inside the window. The window
    # keeps the three reference queries, five of the six streaming
    # parity entries plus stream_neardup_ingest, and the two r12
    # first-pass entries (video_neardup_pairs, mm_dedup_front_door)
    # for second consecutive passes; stream_interval_join_attribution
    # takes a one-round demotion (r12-green, own-file stream==batch
    # parity pin) to free the seat those second passes need. Every
    # demoted entry holds an r12 driver pass (enforced below) and an
    # independent non-DuckDB pin, noted at its register() site.
    assert set(demoted) == {
        # test_rotation_pins.py pins
        "ref_q1_top_host_str",
        "ref_q2_cumulative_distinct",
        "a1_requests_per_host",
        "a2_count_events",
        "a3_first_event_per_host",
        "a6_top3_hosts_per_window",
        "t4_session_windows",
        "sim_knn_brute_force",
        "sim_knn_lsh_bucketed",
        "text_fingerprints",
        "dedup_exact_map",
        "dedup_minhash_signatures",
        "dedup_minhash_band_pairs",
        "dedup_jaccard_pairs",
        "dedup_line_boilerplate",
        "dedup_exact_substring",
        "asof_purchase_attribution",
        "mm_binary_metadata",
        "mm_decode_features",
        "mm_frame_sample",
        "mm_audio_energy",
        "mm_resize_thumbs",
        "pipeline_hash_split",
        "join_outer_order_counts",
        "cube_orders_status_priority",
        "grouping_sets_lineitem",
        "sort_limit_top_orders",
        "union_orders_and_purchases",
        "scalar_functions_showcase",
        # own-file fixture-reference pins (cited at the register site)
        "clf_parse_roundtrip",
        "clf_golden_log",
        "text_html_extract",
        "text_bigram_lift",
        "events_heavy_hitters",
        "events_funnel_steps",
        "text_lm_backoff_trigram",
        "pipeline_decontaminate",
        "mm_image_phash_pairs",
        "audio_neardup_pairs",
        "stream_interval_join_attribution",
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
