"""Image perceptual-hash dedup: pure-python (no-numpy) third
implementation of the full hash over the fixture rasters, codec-path
agreement for every supported container, the frozen VALUES oracle's
margin guard, banding recall/cap semantics, and plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.image_dedup import (
    BAND_CAP,
    HASH_SIZE,
    IMG_SIZE,
    N_BANDS,
    bmp_encode_gray,
    image_phash,
    image_phash_pairs,
    luma_plane_any,
    phash64,
    phash_fixture_corpus,
    phash_fixture_rasters,
    phash_margin,
    png_encode_gray,
)

_LW = (0.299, 0.587, 0.114)


# --- independent reference: math-module loops, no numpy ---------------------


def _ref_luma(raster):
    """Gray raster -> luma via the SAME weighted expression the BMP
    path evaluates (r=g=b=v), so the reference tracks the package's
    float arithmetic instead of assuming the weights sum to 1.0."""
    return [
        [_LW[0] * v + _LW[1] * v + _LW[2] * v for v in row]
        for row in raster
    ]


def _ref_box_resize(a, oh, ow):
    h, w = len(a), len(a[0])
    out = []
    for oy in range(oh):
        y0, y1 = (oy * h) // oh, ((oy + 1) * h) // oh
        y1 = max(y1, y0 + 1)
        row = []
        for ox in range(ow):
            x0, x1 = (ox * w) // ow, ((ox + 1) * w) // ow
            x1 = max(x1, x0 + 1)
            s = 0.0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    s += a[y][x]
            row.append(s / ((y1 - y0) * (x1 - x0)))
        out.append(row)
    return out


def _ref_phash(raster):
    small = _ref_box_resize(_ref_luma(raster), IMG_SIZE, IMG_SIZE)
    n = IMG_SIZE
    d = [
        [
            (math.sqrt(2.0 / n))
            * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / (2 * n))
            for x in range(n)
        ]
        for u in range(n)
    ]
    low = []
    for u in range(HASH_SIZE):
        for v in range(HASH_SIZE):
            c = 0.0
            for y in range(n):
                ry = sum(d[v][x] * small[y][x] for x in range(n))
                c += d[u][y] * ry
            low.append(c)
    s = sorted(low)
    med = (s[31] + s[32]) / 2.0
    val = 0
    for c in low:
        val = (val << 1) | (1 if c > med else 0)
    return val - (1 << 64) if val >= (1 << 63) else val


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_matches_pure_python_reference(spark):
    """Every fixture image's 64-bit hash, decoded through the REAL
    codecs and hashed by the numpy kernel, equals the math-module
    reference computed straight from the raster — codec round-trip,
    resize, DCT, median and packing all pinned at once."""
    got = {
        r["doc_id"]: r["phash"]
        for r in image_phash(phash_fixture_corpus(spark)).collect()
    }
    want = {d: _ref_phash(r) for d, r in phash_fixture_rasters().items()}
    assert got == want


def test_fixture_margins_guard_frozen_oracle():
    """The frozen VALUES oracle is only safe if no bit sits on a
    median tie: every fixture image's closest coefficient-to-median
    gap must be orders above cross-implementation float drift."""
    for d, r in phash_fixture_rasters().items():
        pay = png_encode_gray(r) if d == 3 else bmp_encode_gray(r)
        assert phash_margin(luma_plane_any(pay)) > 0.02, d


def test_registered_query_matches_frozen_values(spark):
    from flink_exercise_spark import registry

    got = sorted(
        tuple(r)
        for r in registry.specs()["mm_image_phash_pairs"]
        .fn(spark, "unused")
        .collect()
    )
    # the same pairs re-derived by the reference implementation
    hashes = {d: _ref_phash(r) for d, r in phash_fixture_rasters().items()}
    want = []
    for a in sorted(hashes):
        for b in sorted(hashes):
            if a < b:
                bands_a = {
                    (i, (hashes[a] >> (8 * i)) & 0xFF)
                    for i in range(N_BANDS)
                }
                bands_b = {
                    (i, (hashes[b] >> (8 * i)) & 0xFF)
                    for i in range(N_BANDS)
                }
                h = _ham(hashes[a], hashes[b])
                if bands_a & bands_b and h <= N_BANDS - 1:
                    want.append((a, b, h))
    assert got == sorted(want)
    assert got == [(0, 1, 0), (2, 3, 0), (4, 5, 2), (6, 7, 0)]


# --- luma plane per codec ----------------------------------------------------


def test_luma_plane_bmp_orientation_and_values():
    raster = [[10, 20, 30], [40, 50, 60]]  # asymmetric: pins the flip
    luma = luma_plane_any(bmp_encode_gray(raster))
    assert luma.shape == (2, 3)
    for y in range(2):
        for x in range(3):
            v = raster[y][x]
            assert luma[y][x] == _LW[0] * v + _LW[1] * v + _LW[2] * v


def test_luma_plane_png_gray_exact():
    raster = [[0, 128, 255], [7, 200, 33]]
    luma = luma_plane_any(png_encode_gray(raster))
    assert luma.tolist() == [[0.0, 128.0, 255.0], [7.0, 200.0, 33.0]]


def test_luma_plane_png_equals_bmp_for_same_raster():
    """The doc-3 re-encode case: two containers, one raster, hashes
    identical (the luma planes differ only by the BT.601-weights
    float sum, orders below any bit margin)."""
    raster = phash_fixture_rasters()[2]
    assert phash64(luma_plane_any(png_encode_gray(raster))) == phash64(
        luma_plane_any(bmp_encode_gray(raster))
    )


def test_luma_plane_png_palette():
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    # 3x2 palette image: entries black / white / mid-red
    plte = bytes((0, 0, 0)) + bytes((255, 255, 255)) + bytes((200, 0, 0))
    idx_rows = [[0, 1, 2], [2, 1, 0]]
    raw = b"".join(b"\x00" + bytes(r) for r in idx_rows)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    luma = luma_plane_any(payload)
    lw = [0.0, _LW[0] * 255 + _LW[1] * 255 + _LW[2] * 255, _LW[0] * 200]
    assert luma.tolist() == [
        [lw[0], lw[1], lw[2]],
        [lw[2], lw[1], lw[0]],
    ]


def test_luma_plane_gif_palette():
    from tests.test_multimodal import _encode_gif

    payload = _encode_gif(
        3, 2, [(0, 0, 0), (255, 255, 255)], [0, 1, 0, 1, 0, 1]
    )
    luma = luma_plane_any(payload)
    white = _LW[0] * 255 + _LW[1] * 255 + _LW[2] * 255
    assert luma.tolist() == [[0.0, white, 0.0], [white, 0.0, white]]


def test_luma_plane_jpeg_two_blocks():
    """16x8 two-block DC-only JPEG: dequantized DCs 16 and 32 give
    flat blocks at 130 and 132 — the luma plane carries the real
    decoded pixels block by block."""
    from tests.test_multimodal import _dc_block, make_gray_jpeg

    payload = make_gray_jpeg(
        [_dc_block(1), _dc_block(2)], 16, 8, [16] * 64
    )
    luma = luma_plane_any(payload)
    assert luma.shape == (8, 16)
    assert set(luma[:, :8].flatten().tolist()) == {130.0}
    assert set(luma[:, 8:].flatten().tolist()) == {132.0}


def test_luma_plane_non_image_seam():
    with pytest.raises(NotImplementedError, match="BMP/PNG/GIF/JPEG"):
        luma_plane_any(b"not an image at all")


# --- pairing semantics -------------------------------------------------------


def _hash_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, phash long")


def test_pigeonhole_recall_at_seven_bits(spark):
    """Hamming 7 with the differing bits spread over seven bands must
    still pair (the eighth band is intact); hamming 8 spread over all
    eight bands has no shared band — and is beyond max_distance
    anyway (the documented recall boundary)."""
    seven = 0
    for b in range(7):
        seven |= 1 << (8 * b)
    eight = seven | (1 << 56)
    got = sorted(
        tuple(r)
        for r in image_phash_pairs(
            _hash_df(spark, [(1, 0), (2, seven), (3, eight)])
        ).collect()
    )
    assert (1, 2, 7) in got
    assert not any(a == 1 and b == 3 for a, b, _ in got)


def test_hot_band_cap_cuts_degenerate_buckets(spark):
    rows = [(i, 0) for i in range(6)]  # six identical hashes
    none = image_phash_pairs(
        _hash_df(spark, rows), band_cap=3
    ).collect()
    assert none == []  # every band is hot: all cut
    allp = image_phash_pairs(
        _hash_df(spark, rows), band_cap=BAND_CAP
    ).collect()
    assert len(allp) == 15 and all(r["hamming"] == 0 for r in allp)


def test_max_distance_guard():
    with pytest.raises(ValueError, match="pigeonhole"):
        image_phash_pairs(None, max_distance=N_BANDS)


def test_pairs_plan_no_cartesian(spark):
    plan = (
        image_phash_pairs(_hash_df(spark, [(1, 0), (2, 1)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_phash_stream_equals_batch(spark, tmp_path):
    """image_phash is a stateless kernel (the
    audio_spectral_fingerprint convention): hashes from a file stream
    must equal the batch operator's row for row."""
    from flink_exercise_spark.streaming.jobs import run_to_memory

    corpus = phash_fixture_corpus(spark)
    path = str(tmp_path / "img_parquet")
    corpus.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(
        "doc_id long, payload binary"
    ).parquet(path)
    run_to_memory(image_phash(stream), "image_phash_stream", "append")
    got = sorted(
        tuple(r) for r in spark.table("image_phash_stream").collect()
    )
    want = sorted(tuple(r) for r in image_phash(corpus).collect())
    assert got == want and len(got) == 10


def test_luma_plane_png_16bit_gray():
    """16-bit big-endian gray: the x257 twin of an 8-bit raster must
    decode to (almost exactly) the same luma plane — the depth-rescale
    path of luma_plane_any."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    rows = [[0, 128, 255], [7, 200, 33]]
    raw = b"".join(
        b"\x00" + b"".join(struct.pack(">H", v * 257) for v in r)
        for r in rows
    )
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    luma = luma_plane_any(payload)
    for y in range(2):
        for x in range(3):
            assert abs(luma[y][x] - rows[y][x]) < 1e-9, (y, x)


# --- benchmark-image decontamination (r13) -----------------------------------


def test_decontaminate_registered_query_matches_frozen_values(spark):
    """The registered mm_image_decontaminate result, re-derived by the
    pure-python reference: hash every corpus raster AND both benchmark
    rasters independently, band both sides, keep corpus docs sharing a
    band with a benchmark image within 7 Hamming bits."""
    from flink_exercise_spark import registry
    from flink_exercise_spark.operators.image_dedup import (
        phash_fixture_rasters,
    )

    got = sorted(
        tuple(r)
        for r in registry.specs()["mm_image_decontaminate"]
        .fn(spark, "unused")
        .collect()
    )
    rasters = phash_fixture_rasters()
    corpus = {d: _ref_phash(r) for d, r in rasters.items()}
    bench = {100: _ref_phash(rasters[0]), 101: _ref_phash(rasters[6])}
    want = []
    for d, hc in sorted(corpus.items()):
        for b, hb in sorted(bench.items()):
            bands_c = {(i, (hc >> (8 * i)) & 0xFF) for i in range(N_BANDS)}
            bands_b = {(i, (hb >> (8 * i)) & 0xFF) for i in range(N_BANDS)}
            h = _ham(hc, hb)
            if bands_c & bands_b and h <= N_BANDS - 1:
                want.append((d, b, h))
    assert got == sorted(want)
    # the frozen VALUES oracle, literally: brightness (1), contrast
    # (7) and container re-encode (6 vs PNG benchmark) leaks flagged;
    # the six unrelated corpus images untouched
    assert got == [(0, 100, 0), (1, 100, 0), (6, 101, 0), (7, 101, 0)]


def test_decontaminate_images_plan_is_broadcast_no_cartesian(spark):
    """The corpus side must never shuffle and the benchmark side must
    broadcast: the physical plan is a BroadcastHashJoin with zero
    cartesian/nested-loop operators and zero Exchange on the corpus
    band relation (scan -> generate -> join)."""
    from flink_exercise_spark.operators.image_dedup import (
        decontam_benchmark_corpus,
        decontaminate_images,
        image_phash,
        phash_fixture_corpus,
    )

    flags = decontaminate_images(
        image_phash(phash_fixture_corpus(spark)),
        image_phash(decontam_benchmark_corpus(spark)),
    )
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_images_rejects_unpigeonholeable_distance(spark):
    import pytest

    from flink_exercise_spark.operators.image_dedup import (
        decontaminate_images,
    )

    hashes = spark.createDataFrame(
        [(0, 0)], "doc_id long, phash long"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        decontaminate_images(hashes, hashes, max_distance=N_BANDS)
