"""Audio spectral fingerprinting: exact peak-bin pins on pure-sine
fixtures (a sine at f Hz peaks at round(f * window / rate)),
amplitude invariance (the dedup property), landmark hashing, and the
fingerprint-join near-dup pairs — including the too-common-fp cap and
the no-cartesian plan contract."""

from __future__ import annotations

import io
import math
import wave

import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.audio import (
    FP_WINDOWS,
    audio_neardup_pairs,
    audio_spectral_fingerprint,
    fingerprints_of,
    peak_bins,
)

RATE = 8000
WIN = 1024


def _wav(samples):
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(RATE)
    w.writeframes(
        b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
    )
    w.close()
    return buf.getvalue()


def _sine(freq, n, amp=8000.0, phase=0.0):
    return [
        amp * math.sin(2 * math.pi * freq * t / RATE + phase)
        for t in range(n)
    ]


def _bin_of(freq):
    """A WIN-sample rectangular window at RATE puts a pure sine's
    energy peak at the nearest rfft bin: round(freq * WIN / RATE)."""
    return round(freq * WIN / RATE)


def test_peak_bins_pure_sines_exact():
    # bin-centered frequencies (k * RATE / WIN) leak nothing: the
    # peak bin is exact by construction, not approximately
    for k in (3, 17, 100, 400):
        freq = k * RATE / WIN
        assert peak_bins(_wav(_sine(freq, WIN))) == [k], k
    # a non-centered frequency still peaks at the nearest bin
    assert peak_bins(_wav(_sine(333.0, WIN))) == [_bin_of(333.0)]


def test_peak_bins_per_window_and_padding():
    # two windows at different pitches -> two different peaks; a
    # ragged tail window zero-pads and keeps its own pitch
    f1, f2 = 10 * RATE / WIN, 40 * RATE / WIN
    samples = _sine(f1, WIN) + _sine(f2, WIN) + _sine(f1, WIN // 2)
    assert peak_bins(_wav(samples)) == [10, 40, 10]


def test_peak_bins_amplitude_invariant():
    """The dedup property: re-leveling a recording must not move any
    peak bin (|X_k|^2 scales uniformly)."""
    f1, f2 = 10 * RATE / WIN, 40 * RATE / WIN
    samples = _sine(f1, WIN) + _sine(f2, WIN)
    loud = _wav(samples)
    quiet = _wav([s / 4 for s in samples])
    assert peak_bins(loud) == peak_bins(quiet)


def test_peak_bins_dc_excluded():
    # constant (DC-only) signal: bin 0 is excluded, so the peak falls
    # to the first AC bin by the first-max rule — never bin 0
    assert peak_bins(_wav([1000.0] * WIN)) == [1]


def test_fingerprints_of_runs_and_short_clip():
    bins = [3, 7, 7, 9, 12]
    fps = fingerprints_of(bins, n=4)
    assert len(fps) == 2  # windows 0..3 and 1..4
    assert fps[0] != fps[1]
    # a clip shorter than the run length still fingerprints ONCE
    assert len(fingerprints_of([3, 7], n=4)) == 1
    # deterministic: same bins -> same hashes
    assert fps == fingerprints_of(bins, n=4)


def _audio_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    """A: a 6-window melody; A' (doc 1): the same melody at quarter
    volume (a re-leveled duplicate); B (doc 2): a different melody;
    C (doc 3): shares only ONE 4-window run with A (below the
    2-shared-fp default)."""
    mel_a = [5, 9, 14, 22, 30, 41]
    mel_b = [6, 11, 17, 23, 31, 43]
    mel_c = [5, 9, 14, 22, 50, 60]

    def render(mel, amp=8000.0):
        out = []
        for k in mel:
            out += _sine(k * RATE / WIN, WIN, amp=amp)
        return _wav(out)

    return _audio_df(
        spark,
        [render(mel_a), render(mel_a, amp=2000.0), render(mel_b),
         render(mel_c)],
    )


def test_fingerprint_relation_via_spark(spark, corpus):
    fps = audio_spectral_fingerprint(corpus)
    rows = fps.collect()
    # 6 windows -> 3 runs of 4 per doc
    assert len(rows) == 4 * 3
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["start_window"]] = r["fp"]
    assert by_doc[0] == by_doc[1]  # re-leveled copy: identical landmarks
    assert set(by_doc[0].values()) != set(by_doc[2].values())
    # C shares exactly the first run (windows 0..3 = 5,9,14,22)
    assert len(set(by_doc[0].values()) & set(by_doc[3].values())) == 1


def test_neardup_pairs_end_to_end(spark, corpus):
    fps = audio_spectral_fingerprint(corpus)
    pairs = audio_neardup_pairs(fps).collect()
    assert [(r["doc_a"], r["doc_b"], r["n_shared"]) for r in pairs] == [
        (0, 1, 3)
    ]
    # min_shared=1 admits the single-run overlap with C
    got = {
        (r["doc_a"], r["doc_b"])
        for r in audio_neardup_pairs(fps, min_shared=1).collect()
    }
    assert got == {(0, 1), (0, 3), (1, 3)}


def test_neardup_fp_cap_drops_hot_fingerprints(spark):
    """A fingerprint shared by more docs than the cap is dropped BEFORE
    the join — hot-key fan-out is structurally impossible."""
    rows = [(d, 0, "hot") for d in range(5)] + [
        (0, 1, "rare"),
        (1, 1, "rare"),
    ]
    fps = audio_neardup_pairs(
        spark.createDataFrame(
            rows, "doc_id long, start_window int, fp string"
        ),
        min_shared=1,
        fp_cap=4,
    )
    assert [(r["doc_a"], r["doc_b"], r["n_shared"]) for r in fps.collect()] == [
        (0, 1, 1)
    ]


def test_non_wav_payload_hits_the_seam(spark):
    df = _audio_df(spark, [b"not audio at all, just text bytes ...."])
    with pytest.raises(Exception, match="WAV payload"):
        audio_spectral_fingerprint(df).collect()


def test_plan_no_cartesian(spark, corpus):
    plan = (
        audio_neardup_pairs(audio_spectral_fingerprint(corpus))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fingerprints_stream_equals_batch(spark, corpus, tmp_path):
    """The fingerprint kernel is a stateless mapInPandas projection,
    so it runs unchanged on a streaming relation (the HTML-extraction
    front-door convention): fingerprints from a file stream must equal
    the batch operator's row for row."""
    from flink_exercise_spark.streaming.jobs import run_to_memory

    path = str(tmp_path / "audio_parquet")
    corpus.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(
        "doc_id long, payload binary"
    ).parquet(path)
    run_to_memory(
        audio_spectral_fingerprint(stream), "audio_fps_stream", "append"
    )
    got = sorted(
        tuple(r) for r in spark.table("audio_fps_stream").collect()
    )
    want = sorted(
        tuple(r) for r in audio_spectral_fingerprint(corpus).collect()
    )
    assert got == want and len(got) > 0


# --- registered query: hand-derived melody corpus (r11) ----------------------


def test_melody_peak_bins_are_the_melody():
    """Each synthesized clip's per-window peak bins ARE its melody —
    the analytic fact (a bin-centered sine puts all energy in its
    bin) that makes the registered VALUES oracle hand-computable.
    Amplitude does not matter (docs 0 and 1 share a melody at 12000
    vs 3600)."""
    from flink_exercise_spark.operators.audio import (
        MELODIES,
        melody_wav_bytes,
        peak_bins,
    )

    for doc_id, (bins, amp) in MELODIES.items():
        assert peak_bins(melody_wav_bytes(bins, amp)) == list(bins), doc_id


def test_registered_query_matches_hand_derivation(spark):
    """The registered audio_neardup_pairs output equals (a) the frozen
    VALUES constants and (b) a pure-python set derivation over the
    melody table — fingerprint runs are literal 4-note subsequences,
    so the expected pairs fall out of set intersections."""
    from flink_exercise_spark import registry
    from flink_exercise_spark.operators.audio import (
        FP_WINDOWS,
        MELODIES,
    )

    def runs(bins):
        if len(bins) <= FP_WINDOWS:
            return {tuple(bins)}
        return {
            tuple(bins[i : i + FP_WINDOWS])
            for i in range(len(bins) - FP_WINDOWS + 1)
        }

    want = []
    ids = sorted(MELODIES)
    for i in ids:
        for j in ids:
            if i < j:
                shared = len(runs(MELODIES[i][0]) & runs(MELODIES[j][0]))
                if shared >= 2:
                    want.append((i, j, shared))
    got = sorted(
        tuple(r)
        for r in registry.specs()["audio_neardup_pairs"]
        .fn(spark, "unused")
        .collect()
    )
    assert got == sorted(want)
    assert got == [(0, 1, 3), (2, 3, 2)]
