"""Differential fuzzing of the two newest custom kernels against
brute-force references — sampling the spaces their fixed tests can't
enumerate.

- range_join_counts vs an O(n^2) python scan: random clustered /
  uniform / boundary-heavy timestamp sets, random band widths. The
  bin rewrite's correctness hinges on two claims (a band window can
  touch at most the 3 probed bins; every qualifying pair meets in
  exactly one bin) that must hold for EVERY band/offset combination.
- pattern_search_bucketed vs the full-series pattern_search: random
  per-key series (short/long, timestamp ties, constant runs) under
  random bucket sizes, including the degenerate extremes — one event
  per bucket and one bucket per key — where the overlap machinery is
  all that produces any result.
"""

from __future__ import annotations

import datetime as dt
import itertools
import random

import pytest

from flink_exercise_spark.operators.asof import range_join_counts
from flink_exercise_spark.operators.timeseries import (
    pattern_search,
    pattern_search_bucketed,
)

N_CASES = 8


def _ts(base: dt.datetime, secs: float) -> dt.datetime:
    return base + dt.timedelta(microseconds=int(round(secs * 1e6)))


def test_range_join_fuzz_vs_quadratic(spark):
    rng = random.Random(20260813)
    base = dt.datetime(2024, 3, 1)
    for case in range(N_CASES):
        band = rng.choice([1, 7, 60, 3600])
        n = rng.randint(2, 120)
        mode = rng.choice(["uniform", "clustered", "boundary"])
        if mode == "uniform":
            secs = [rng.uniform(0, n * band * 2) for _ in range(n)]
        elif mode == "clustered":
            centers = [rng.uniform(0, n * band) for _ in range(max(1, n // 8))]
            secs = [
                rng.choice(centers) + rng.uniform(-band, band)
                for _ in range(n)
            ]
        else:  # exact multiples of the band — every pair on a boundary
            secs = [band * rng.randint(0, n // 2) for _ in range(n)]
        rows = [
            (i, _ts(base, s), 1, "view", 0.0, "{}")
            for i, s in enumerate(secs)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        got = {
            r["event_id"]: r["n_concurrent"]
            for r in range_join_counts(ev, band_secs=band).collect()
        }
        us = {i: int(round(s * 1e6)) for i, s in enumerate(secs)}
        want = {i: 0 for i in us}
        for a, b in itertools.combinations(us, 2):
            if abs(us[a] - us[b]) <= band * 1_000_000:
                want[a] += 1
                want[b] += 1
        assert got == want, f"case {case}: band={band} mode={mode}"


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps each operator's fixture reference and rotation pin (the range-join
# quadratic fuzz stays default: it is part of that entry's pin story)
@pytest.mark.slow
def test_bucketed_pattern_search_fuzz_vs_full_series(spark):
    rng = random.Random(20260814)
    base = dt.datetime(2024, 3, 1)
    for case in range(N_CASES):
        bucket_secs = rng.choice([1, 60, 3600, 86400, 10**9])
        # 10**9 -> one bucket per key; 1 -> ~one event per bucket when
        # gaps exceed a second (overlap machinery does all the work).
        rows = []
        for uid in range(rng.randint(1, 4)):
            n = rng.randint(1, 40)
            t = rng.uniform(0, 3600)
            for i in range(n):
                t += rng.choice([0.0, 0.5, 2.0, 90.0, 4000.0])  # incl. ties
                rows.append(
                    (
                        uid * 1000 + i,
                        _ts(base, t),
                        uid,
                        "view",
                        round(rng.choice([0.0, 1.0, rng.uniform(-5, 5)]), 3),
                        "{}",
                    )
                )
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        a = sorted(map(tuple, pattern_search(ev, k=10**6).collect()))
        b = sorted(
            map(
                tuple,
                pattern_search_bucketed(
                    ev, k=10**6, bucket_secs=bucket_secs
                ).collect(),
            )
        )
        assert a == b, f"case {case}: bucket_secs={bucket_secs}"


def _py_substring_dedup(rows, k):
    """Pure-python reference of dedup.substring_dedup (keep-first):
    dict-based gram index, no engines involved."""
    toks = {
        d: (t.strip().split() if t is not None else None) for d, t in rows
    }
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, t in sorted(toks.items()):
        if t is None or len(t) < k:
            continue
        for p in range(1, len(t) - k + 2):          # 1-based
            g = " ".join(t[p - 1 : p - 1 + k])
            occ.setdefault(g, []).append((d, p))
    out = {}
    covered: dict[int, set[int]] = {}
    for g, occs in occ.items():
        if len(occs) < 2:
            continue
        canon = min(occs)                            # (doc, pos) order
        for d, p in occs:
            if (d, p) == canon:
                continue
            covered.setdefault(d, set()).update(range(p, p + k))
    for d, t in toks.items():
        if t is None:
            out[d] = (None, 0, 0, 0)
            continue
        cov = covered.get(d, set())
        kept = [t[j - 1] for j in range(1, len(t) + 1) if j not in cov]
        out[d] = (" ".join(kept), len(t), len(kept), len(t) - len(kept))
    return out


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps each operator's fixture reference and rotation pin (the range-join
# quadratic fuzz stays default: it is part of that entry's pin story)
@pytest.mark.slow
def test_substring_dedup_fuzz_vs_python(spark):
    """Random small-vocabulary corpora (to force gram collisions),
    random k, duplicated runs planted and emergent — the keep-first
    canonical rule must match a dict-based reference exactly,
    including within-doc repeats and overlapping duplicated runs."""
    from flink_exercise_spark.operators.dedup import substring_dedup

    rng = random.Random(20260814)
    for case in range(N_CASES):
        k = rng.choice([2, 3, 5])
        vocab = [f"w{i}" for i in range(rng.choice([3, 8, 20]))]
        n_docs = rng.randint(2, 14)
        rows = []
        for d in range(n_docs):
            n_tok = rng.randint(0, 30)
            words = [rng.choice(vocab) for _ in range(n_tok)]
            rows.append((d, " ".join(words) if n_tok else ""))
        if case % 3 == 0:
            rows.append((n_docs, None))
        exp = _py_substring_dedup(rows, k)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["text"],
                r["n_tokens"],
                r["n_tokens_kept"],
                r["n_tokens_dropped"],
            )
            for r in substring_dedup(df, k=k).collect()
        }
        # Empty-string docs: split('') -> [''] on the engine side, so
        # n_tokens is 1 for an empty text; mirror that in the reference
        # comparison by recomputing those docs the engine way.
        for d, (t, *_rest) in list(exp.items()):
            raw = dict(rows)[d]
            if raw == "":
                exp[d] = ("", 1, 1, 0)
        assert got == exp, f"case {case} (k={k}): {got} != {exp}"


def _py_decontaminate(rows, n):
    """Pure-python reference of pipeline.decontaminate: hashlib split
    buckets, dict n-gram sets — no engines involved."""
    import hashlib

    def bucket(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100

    def grams(t):
        toks = t.strip().split() if t is not None else []
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    ev = set()
    for d, t in rows:
        if bucket(d) >= 90:
            ev |= grams(t)
    out = {}
    for d, t in rows:
        b = bucket(d)
        if b >= 90:
            continue
        g = grams(t)
        hits = len(g & ev)
        if hits:
            out[d] = (
                "train" if b < 80 else "val",
                len(g),
                hits,
                round(hits / len(g), 4),
            )
    return out


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps each operator's fixture reference and rotation pin (the range-join
# quadratic fuzz stays default: it is part of that entry's pin story)
@pytest.mark.slow
def test_decontaminate_fuzz_vs_python(spark):
    """Random small-vocabulary corpora against a dict-based reference:
    split assignment, distinct-gram counting, and the hits/contamination
    arithmetic must match for every doc, across random n."""
    from flink_exercise_spark.operators.pipeline import decontaminate

    rng = random.Random(20260815)
    for case in range(N_CASES):
        n = rng.choice([2, 3, 4])
        vocab = [f"w{i}" for i in range(rng.choice([4, 10]))]
        rows = []
        for d in range(rng.randint(10, 40)):
            n_tok = rng.randint(0, 12)
            rows.append(
                (d, " ".join(rng.choice(vocab) for _ in range(n_tok))
                 if n_tok else ("" if case % 2 else None))
            )
        exp = _py_decontaminate(rows, n)
        got = {
            r["doc_id"]: (
                r["split"],
                r["n_shingles"],
                r["n_eval_hits"],
                r["contamination"],
            )
            for r in decontaminate(
                spark.createDataFrame(rows, "doc_id long, text string"),
                n=n,
            ).collect()
        }
        assert got == exp, f"case {case} (n={n}): {got} != {exp}"


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps each operator's fixture reference and rotation pin (the range-join
# quadratic fuzz stays default: it is part of that entry's pin story)
@pytest.mark.slow
def test_token_rarity_fuzz_vs_python(spark):
    """Random corpora vs a dict-based reference: corpus frequency,
    scalar total, and the per-doc mean inverse frequency (rounded as
    the engine rounds) must match exactly."""
    from flink_exercise_spark.operators.tokenizer import token_rarity

    rng = random.Random(20260816)
    for case in range(N_CASES):
        vocab = [f"w{i}" for i in range(rng.choice([2, 5, 12]))]
        rows = []
        for d in range(rng.randint(3, 25)):
            n_tok = rng.randint(0, 15)
            rows.append(
                (d, " ".join(rng.choice(vocab) for _ in range(n_tok))
                 if n_tok else ("" if d % 2 else None))
            )
        freq: dict[str, int] = {}
        docs_toks = {}
        for d, t in rows:
            toks = t.strip().split() if t else []
            docs_toks[d] = toks
            for tok in toks:
                freq[tok] = freq.get(tok, 0) + 1
        total = sum(freq.values())
        # The statistic is integer-exact by design (integer floor
        # division summed exactly, ONE final float division), so the
        # comparison is EXACT — the reason the registered form uses
        # sum(N div c) and not a float mean, whose summation order
        # differs between engines. HALF_UP mirrors both engines'
        # round(); python's built-in round is banker's.
        from decimal import ROUND_HALF_UP, Decimal

        def _r4(x):
            return float(Decimal(x).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP))

        exp = {
            d: (len(toks),
                _r4(sum(total // freq[t] for t in toks) / len(toks)))
            for d, toks in docs_toks.items() if toks
        }
        got = {
            r["doc_id"]: (r["n_tokens"], r["rarity"])
            for r in token_rarity(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }
        assert got == exp, f"case {case}: {got} != {exp}"
