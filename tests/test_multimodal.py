"""Multimodal plumbing tests: binary column round-trips, Arrow batch
shapes (1->1, 1->N fan-out, binary->binary), and kernel determinism —
the Spark-side contract that stays identical when the stub codecs are
swapped for real ones."""

from __future__ import annotations

import hashlib

import pytest

from flink_exercise_spark.operators.multimodal import (
    FRAME_STRIDE,
    VIDEO_DECODER,
    attach_binary_payload,
    binary_metadata,
    decode_features,
    frame_sample,
    resize_images,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(i, f"doc number {i} " + "x" * (10 * i)) for i in range(6)]
    return attach_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string")
    )


def test_metadata_matches_python(payloads):
    got = {r["doc_id"]: r for r in binary_metadata(payloads).collect()}
    raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    for i, p in raw.items():
        assert got[i]["n_bytes"] == len(p)
        assert got[i]["content_hash"] == hashlib.md5(p).hexdigest()


def test_metadata_binary_safe(spark):
    """md5 runs over the raw BINARY payload: a non-UTF-8 byte sequence
    (invalid as a string, the real-decoder domain) must hash to its
    exact python md5 — a bytes->string cast would corrupt it."""
    blob = bytes([0xFF, 0xFE, 0x00, 0x80, 0xC3, 0x28])  # invalid UTF-8
    df = spark.createDataFrame([(1, blob)], "doc_id long, payload binary")
    row = binary_metadata(df).collect()[0]
    assert row["n_bytes"] == len(blob)
    assert row["content_hash"] == hashlib.md5(blob).hexdigest()


def test_decode_features_deterministic(payloads):
    a = sorted(decode_features(payloads).collect())
    b = sorted(decode_features(payloads).collect())
    assert a == b
    for r in a:
        assert 64 <= r["width"] <= 255 and 64 <= r["height"] <= 255
        assert 0.0 <= r["mean_luma"] <= 1.0


def test_frame_sample_fanout_count(payloads):
    """Row multiplication must equal the prober's arithmetic exactly:
    one output row per sampled frame per doc."""
    raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    expected = {
        i: len(range(0, VIDEO_DECODER.probe(p), FRAME_STRIDE))
        for i, p in raw.items()
    }
    rows = frame_sample(payloads).collect()
    got: dict[int, int] = {}
    for r in rows:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
        assert r["frame_idx"] % FRAME_STRIDE == 0
        assert r["ts_ms"] == r["frame_idx"] * 1000 // VIDEO_DECODER.fps
    assert got == expected
    # per-frame hashes are content-addressed: distinct across frames
    one_doc = [r for r in rows if r["doc_id"] == 5]
    assert len({r["frame_hash"] for r in one_doc}) == len(one_doc)


def test_resize_binary_roundtrip(payloads):
    """binary in -> binary out; long edge scaled to <= 64 preserving
    which side is longer."""
    feats = {r["doc_id"]: r for r in decode_features(payloads).collect()}
    rows = {r["doc_id"]: r for r in resize_images(payloads).collect()}
    raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    for i, r in rows.items():
        assert max(r["width"], r["height"]) <= 64
        assert r["width"] >= 1 and r["height"] >= 1
        orig = feats[i]
        assert (orig["width"] >= orig["height"]) == (
            r["width"] >= r["height"]
        ) or r["width"] == r["height"]
        assert bytes(r["thumb"]) == hashlib.md5(raw[i]).digest()
        assert r["thumb_bytes"] == 16


def test_audio_window_energy_fanout(spark):
    """Audio modality plumbing: every doc fans out to its probed
    window count, timestamps are exact integer math on the probed
    rate, energies land in [0, 1]."""
    import hashlib

    from flink_exercise_spark.operators.multimodal import (
        AUDIO_DECODER,
        attach_binary_payload,
        audio_window_energy,
    )
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    out = audio_window_energy(attach_binary_payload(docs)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        rate, n_windows = AUDIO_DECODER.probe(texts[doc_id].encode())
        assert len(rows) == n_windows
        for r in rows:
            assert r["sample_rate"] == rate
            assert r["ts_ms"] == r["window_idx"] * 1024 * 1000 // rate
            assert 0.0 <= r["energy"] <= 1.0


def test_registered_decode_queries_drop_empty_payloads(spark, tmp_path):
    """The stub codecs raise on empty payloads (the real-decoder seam);
    the registered decode queries must therefore EXCLUDE empty docs —
    and their oracles carry the matching WHERE clause — so the engine
    never crashes where the oracle would emit a row (ADVICE r5)."""
    import os

    import pandas as pd

    from flink_exercise_spark import registry
    from tests.conftest import SF_SMOKE

    src = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    doctored = pd.concat(
        [src.head(5), src.head(1).assign(doc_id=10_000_001, text="")],
        ignore_index=True,
    )
    sf = str(tmp_path)
    doctored.to_parquet(os.path.join(sf, "documents.parquet"))
    for name in ("mm_decode_features", "mm_frame_sample",
                 "mm_audio_energy", "mm_resize_thumbs"):
        out = registry.specs()[name].fn(spark, sf)
        ids = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert 10_000_001 not in ids, f"{name} emitted the empty doc"
        assert ids == set(src.head(5)["doc_id"]), name


# ---------------------------------------------------------------------------
# Real-decoder seams (r7): checked-in genuine media files through the
# full Spark mapInPandas path
# ---------------------------------------------------------------------------

_DATA = "flink_exercise_spark/data"


def _media_df(spark, path):
    payload = open(path, "rb").read()
    return spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    )


def test_bmp_real_decode_via_spark(spark):
    """sample.bmp: 4x2 24-bit, top row white / bottom row black ->
    mean luma exactly 0.5 — real pixel math, not the md5 stub."""
    from flink_exercise_spark.operators.multimodal import decode_features

    out = decode_features(_media_df(spark, f"{_DATA}/sample.bmp")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["format"] == "bmp"
    assert (r["width"], r["height"]) == (4, 2)
    assert r["mean_luma"] == pytest.approx(0.5, abs=1e-6)


def test_wav_real_decode_via_spark(spark):
    """sample.wav: 2048-sample square wave at amplitude 16384, mono
    16-bit PCM 8000 Hz -> exactly two 1024-sample windows with RMS
    16384/32768 = 0.5 — real sample math via the stdlib wave module."""
    from flink_exercise_spark.operators.multimodal import (
        audio_window_energy,
    )

    out = sorted(
        audio_window_energy(
            _media_df(spark, f"{_DATA}/sample.wav")
        ).collect(),
        key=lambda r: r["window_idx"],
    )
    assert [(r["window_idx"], r["ts_ms"], r["sample_rate"]) for r in out] \
        == [(0, 0, 8000), (1, 128, 8000)]
    for r in out:
        assert r["energy"] == pytest.approx(0.5, abs=1e-6)


def test_container_sniffs_reject_text_and_cross_formats(spark):
    """The dispatch contract the oracles rely on: no UTF-8 text
    payload (including one starting with 'BM'/'RIFF') can satisfy the
    strict sniffs, and each real file only matches its own codec."""
    from flink_exercise_spark.operators.multimodal import (
        _looks_bmp,
        _looks_wav,
    )

    bmp = open(f"{_DATA}/sample.bmp", "rb").read()
    wav = open(f"{_DATA}/sample.wav", "rb").read()
    assert _looks_bmp(bmp) and not _looks_wav(bmp)
    assert _looks_wav(wav) and not _looks_bmp(wav)
    for text in ("BM" + "x" * 100, "RIFFxxxxWAVE" + "y" * 100, "plain"):
        p = text.encode()
        assert not _looks_bmp(p) and not _looks_wav(p)


def test_unsupported_real_formats_raise(spark):
    """The narrowed seams still fail loudly outside their domain."""
    from flink_exercise_spark.operators.multimodal import (
        BMP_DECODER,
        WAV_DECODER,
    )

    bmp = bytearray(open(f"{_DATA}/sample.bmp", "rb").read())
    bmp[28:30] = (8).to_bytes(2, "little")  # 8-bit palette BMP
    with pytest.raises(NotImplementedError, match="24-bit"):
        BMP_DECODER.decode(bytes(bmp))
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 8)
    with pytest.raises(NotImplementedError, match="mono"):
        WAV_DECODER.probe(buf.getvalue())


def test_bmp_degenerate_dims_raise_not_crash():
    """width=0 / height=0 headers pass the sniff but must hit the
    documented seam (NotImplementedError), not ZeroDivisionError;
    negative width likewise (code-review r7)."""
    from flink_exercise_spark.operators.multimodal import BMP_DECODER

    base = bytearray(open(f"{_DATA}/sample.bmp", "rb").read())
    for w, h in ((0, 2), (4, 0), (-4, 2)):
        bad = bytearray(base)
        bad[18:22] = w.to_bytes(4, "little", signed=True)
        bad[22:26] = h.to_bytes(4, "little", signed=True)
        with pytest.raises(NotImplementedError, match="degenerate"):
            BMP_DECODER.decode(bytes(bad))


def test_wav_garbage_container_hits_seam():
    """RIFF/WAVE magic + consistent size field but no valid chunks:
    the seam's NotImplementedError, never a raw wave.Error."""
    from flink_exercise_spark.operators.multimodal import WAV_DECODER

    junk = b"\x00" * 40
    payload = b"RIFF" + (len(junk) + 4).to_bytes(4, "little") + b"WAVE" + junk
    with pytest.raises(NotImplementedError, match="unparseable WAV"):
        WAV_DECODER.probe(payload)


def test_resize_uses_header_probe_on_real_bmp(spark):
    """resize over a real BMP gets its dims from the O(1) header
    probe; output dims must match a full decode's."""
    from flink_exercise_spark.operators.multimodal import resize_images

    out = resize_images(_media_df(spark, f"{_DATA}/sample.bmp"),
                        target=64).collect()
    assert len(out) == 1
    # 4x2 source -> long edge 4 scaled to 64 -> 64x32
    assert (out[0]["width"], out[0]["height"]) == (64, 32)


def test_avi_real_probe_via_spark(spark):
    """sample.avi: genuine RIFF/AVI with avih (48 frames at
    dwMicroSecPerFrame=41667, 32x24): the frame schedule comes from
    the real container header — stride-16 sampling yields frames
    0/16/32 with usec-exact integer timestamps."""
    from flink_exercise_spark.operators.multimodal import frame_sample

    out = sorted(
        frame_sample(_media_df(spark, f"{_DATA}/sample.avi")).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["ts_ms"]) for r in out] == [
        (0, 0),
        (16, 16 * 41667 // 1000),
        (32, 32 * 41667 // 1000),
    ]
    # frame hashes remain the documented per-frame-bytes seam
    import hashlib

    payload = open(f"{_DATA}/sample.avi", "rb").read()
    for r in out:
        assert r["frame_hash"] == hashlib.md5(
            payload + b":" + str(r["frame_idx"]).encode()
        ).hexdigest()


def test_avi_sniff_and_prober_domain(spark):
    """Strict AVI sniff: size-field two-factor check; WAV (also RIFF)
    does not match; malformed headers raise, not crash."""
    import pytest as _pytest

    from flink_exercise_spark.operators.multimodal import (
        AVI_PROBER,
        _looks_avi,
        _looks_bmp,
        _looks_wav,
    )

    avi = open(f"{_DATA}/sample.avi", "rb").read()
    wav = open(f"{_DATA}/sample.wav", "rb").read()
    assert _looks_avi(avi)
    assert not _looks_avi(wav)  # RIFF but form type WAVE
    assert not _looks_bmp(avi) and not _looks_wav(avi)
    assert not _looks_avi("RIFFxxxxAVI " .encode() + b"z" * 50)
    n, usec, w, h = AVI_PROBER.probe(avi)
    assert (n, usec, w, h) == (48, 41667, 32, 24)
    # zero frame count -> loud seam
    bad = bytearray(avi)
    off = avi.index(b"avih") + 8 + 16
    bad[off:off + 4] = (0).to_bytes(4, "little")
    with _pytest.raises(NotImplementedError, match="degenerate"):
        AVI_PROBER.probe(bytes(bad))


# --- real PNG codec (r8 seam fill) -------------------------------------------


def _encode_png(rows, channels=3, filters=None, color_type=None, plte=None):
    """Minimal stdlib PNG encoder for test fixtures: 8-bit depth, any
    of the decoder's color types, explicit per-row filter choice (the
    decoder's unfilter is the thing under test)."""
    import binascii
    import zlib

    ct = {1: 0, 2: 4, 3: 2, 4: 6}[channels] if color_type is None else color_type
    h = len(rows)
    w = len(rows[0]) // channels
    filters = filters or [0] * h

    def filt(ft, cur, prev):
        out = bytearray([ft])
        for i, x in enumerate(cur):
            left = cur[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            if ft == 0:
                f = 0
            elif ft == 1:
                f = left
            elif ft == 2:
                f = up
            elif ft == 3:
                f = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                f = (
                    left
                    if pa <= pb and pa <= pc
                    else (up if pb <= pc else ul)
                )
            out.append((x - f) & 0xFF)
        return bytes(out)

    raw = b""
    prev = bytes(len(rows[0]))
    for row, ft in zip(rows, filters):
        raw += filt(ft, row, prev)
        prev = row

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + binascii.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [8, ct, 0, 0, 0]
    )
    plte_chunk = chunk(b"PLTE", plte) if plte is not None else b""
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte_chunk
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_real_decode_via_spark(spark):
    """sample.png (checked in): 6x4 8-bit RGB, top half black / bottom
    half white -> mean luma exactly 0.5; its four rows were written
    with filter types 0/1/2/4, so the luma is real unfiltered pixel
    math end-to-end through the mapInPandas path."""
    from flink_exercise_spark.operators.multimodal import decode_features

    out = decode_features(_media_df(spark, f"{_DATA}/sample.png")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["format"] == "png"
    assert (r["width"], r["height"]) == (6, 4)
    assert r["mean_luma"] == pytest.approx(0.5, abs=1e-6)


def test_png_unfilter_every_filter_type_bit_exact():
    """Round-trip known pixels through each PNG filter type (incl. an
    all-five mix with value patterns that exercise Paeth's three
    branches): decode_pixels must reproduce the raw samples exactly."""
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    rows = [
        bytes([(3 * r + 7 * c + r * c) % 256 for c in range(15)])
        for r in range(6)
    ]
    for ft in (0, 1, 2, 3, 4):
        payload = _encode_png(rows, channels=3, filters=[ft] * 6)
        w, h, ch, raw = PNG_DECODER.decode_pixels(payload)
        assert (w, h, ch) == (5, 6, 3)
        assert raw == b"".join(rows), f"filter {ft}"
    payload = _encode_png(rows, channels=3, filters=[0, 1, 2, 3, 4, 4])
    assert PNG_DECODER.decode_pixels(payload)[3] == b"".join(rows)


def test_png_gray_and_rgba_luma():
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    gray = _encode_png([bytes([10, 20]), bytes([30, 40])], channels=1)
    assert PNG_DECODER.decode(gray) == (
        "png",
        2,
        2,
        round((10 + 20 + 30 + 40) / 4 / 255.0, 6),
    )
    # RGBA: alpha ignored, BMP luma convention on RGB
    rgba = _encode_png(
        [bytes([100, 150, 200, 7, 50, 60, 70, 255])], channels=4
    )
    want = (
        (0.299 * 100 + 0.587 * 150 + 0.114 * 200)
        + (0.299 * 50 + 0.587 * 60 + 0.114 * 70)
    ) / 2 / 255.0
    got = PNG_DECODER.decode(rgba)
    assert got[:3] == ("png", 2, 1)
    assert got[3] == pytest.approx(want, abs=1e-6)


def test_png_palette_decode_bit_exact():
    """Palette (color type 3) decode: indices run through the shared
    inflate+unfilter path, luma through the PLTE lookup — hand-built
    2x2 indexed image with exactly-known palette lumas."""
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    # palette: 0=black, 1=white, 2=pure red, 3=mid gray
    plte = bytes([0, 0, 0, 255, 255, 255, 255, 0, 0, 128, 128, 128])
    rows = [bytes([0, 1]), bytes([2, 3])]
    payload = _encode_png(rows, channels=1, color_type=3, plte=plte)
    w, h, ch, raw = PNG_DECODER.decode_pixels(payload)
    assert (w, h, ch) == (2, 2, 1)
    assert raw == b"\x00\x01\x02\x03"
    want = (
        0.0
        + (0.299 + 0.587 + 0.114) * 255
        + 0.299 * 255
        + (0.299 + 0.587 + 0.114) * 128
    ) / 4 / 255.0
    got = PNG_DECODER.decode(payload)
    assert got[:3] == ("png", 2, 2)
    assert got[3] == round(want, 6)
    # filtered palette rows go through the same unfilter path
    filtered = _encode_png(
        rows, channels=1, color_type=3, plte=plte, filters=[1, 4]
    )
    assert PNG_DECODER.decode(filtered) == got


def test_png_palette_seams():
    """Malformed palette files fail loudly: missing PLTE, out-of-range
    index, bad PLTE length."""
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    plte = bytes([0, 0, 0, 255, 255, 255])
    rows = [bytes([0, 1])]
    ok = _encode_png(rows, channels=1, color_type=3, plte=plte)
    assert PNG_DECODER.decode(ok)[3] == round(
        (0 + 255) / 2 / 255.0, 6
    )
    no_plte = _encode_png(rows, channels=1, color_type=3)
    with pytest.raises(NotImplementedError, match="PLTE"):
        PNG_DECODER.decode(no_plte)
    oob = _encode_png(
        [bytes([0, 5])], channels=1, color_type=3, plte=plte
    )
    with pytest.raises(NotImplementedError, match="beyond PLTE"):
        PNG_DECODER.decode(oob)
    bad_len = _encode_png(
        rows, channels=1, color_type=3, plte=bytes([1, 2])
    )
    with pytest.raises(NotImplementedError, match="PLTE"):
        PNG_DECODER.decode(bad_len)


def test_png_sniff_and_seam_boundaries():
    """Strict sniff: no text payload routes to the PNG codec;
    spec-illegal depth/color combinations, invalid interlace methods,
    and truncated containers hit the documented seam instead of
    crashing (Adam7, sub-byte depths, and 16-bit all decode since
    r10)."""
    from flink_exercise_spark.operators.multimodal import (
        PNG_DECODER,
        _looks_bmp,
        _looks_png,
        _looks_wav,
    )

    png = open(f"{_DATA}/sample.png", "rb").read()
    assert _looks_png(png) and not _looks_bmp(png) and not _looks_wav(png)
    bmp = open(f"{_DATA}/sample.bmp", "rb").read()
    assert not _looks_png(bmp)
    assert not _looks_png("plain text".encode())

    base = bytearray(png)
    base[24] = 4
    base[25] = 3  # 4-bit palette: SUPPORTED since r10 — probes fine
    PNG_DECODER.probe(bytes(base))
    base = bytearray(png)
    base[24] = 16  # 16-bit RGB: SUPPORTED since r10 — probes fine
    PNG_DECODER.probe(bytes(base))
    base = bytearray(png)
    base[24] = 16
    base[25] = 3  # 16-bit PALETTE is illegal per spec — stays the seam
    with pytest.raises(NotImplementedError, match="depth"):
        PNG_DECODER.probe(bytes(base))
    base = bytearray(png)
    base[24] = 3  # depth 3 exists for no color type
    with pytest.raises(NotImplementedError, match="depth"):
        PNG_DECODER.probe(bytes(base))
    base = bytearray(png)
    base[28] = 1  # Adam7 interlace: SUPPORTED since r10 — probes fine
    PNG_DECODER.probe(bytes(base))
    base = bytearray(png)
    base[28] = 2  # invalid interlace method stays the seam
    with pytest.raises(NotImplementedError, match="interlace"):
        PNG_DECODER.probe(bytes(base))
    with pytest.raises(NotImplementedError):
        PNG_DECODER.decode(png[:40])  # truncated mid-chunk
    # corrupt the IDAT payload -> zlib failure surfaces as the seam
    corrupt = bytearray(png)
    corrupt[41] ^= 0xFF
    with pytest.raises(NotImplementedError, match="IDAT"):
        PNG_DECODER.decode(bytes(corrupt))


def test_resize_uses_header_probe_on_real_png(spark):
    from flink_exercise_spark.operators.multimodal import resize_images

    out = resize_images(
        _media_df(spark, f"{_DATA}/sample.png"), target=3
    ).collect()
    assert len(out) == 1
    # 6x4 -> longest side 3 preserves aspect: 3x2
    assert (out[0]["width"], out[0]["height"]) == (3, 2)


# --- real GIF codec (r8 seam fill #2) ----------------------------------------


def _encode_gif(width, height, palette, indices, mcs=None, interlace=False):
    """Minimal spec-correct GIF89a encoder for test fixtures, using
    the 'uncompressed GIF' LZW strategy: literal codes only, a CLEAR
    before the decoder's table could force a width change — every
    byte the decoder sees exercises the real spec (sub-block framing,
    clear handling, palette mapping) without this test sharing a
    compressor's dictionary logic with the code under test."""
    if interlace:  # store whole rows in the 4-pass order
        rows = [indices[y * width : (y + 1) * width] for y in range(height)]
        indices = []
        for first, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            for y in range(first, height, step):
                indices += list(rows[y])
    n = len(palette)
    ct_bits = max(1, (n - 1).bit_length())
    gct_field = ct_bits - 1
    table_n = 2 << gct_field
    mcs = mcs or max(2, ct_bits)
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = [clear]
    count = 0
    for idx in indices:
        if count >= (1 << mcs) - 2:
            codes.append(clear)
            count = 0
        codes.append(idx)
        count += 1
    codes.append(end)
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += mcs + 1
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    hdr = (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([0x80 | gct_field, 0, 0])
    )
    gct = b"".join(bytes(p) for p in palette) + b"\x00\x00\x00" * (
        table_n - n
    )
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, exercises the walk
    desc = (
        b"\x2c"
        + b"\x00\x00\x00\x00"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + (b"\x40" if interlace else b"\x00")
    )
    data = bytes([mcs])
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        data += bytes([len(chunk)]) + bytes(chunk)
    data += b"\x00"
    return hdr + gct + ext + desc + data + b"\x3b"


def _pack_codes(codes_widths):
    """LSB-first bit packing with per-code widths (for hand-derived
    LZW streams)."""
    acc = bits = 0
    out = bytearray()
    for c, w in codes_widths:
        acc |= c << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_real_decode_via_spark(spark):
    """sample.gif (checked in): 4x3 two-color, 6 black / 6 white
    pixels -> mean luma exactly 0.5 through real LZW decode + palette
    mapping, end-to-end through the mapInPandas path."""
    from flink_exercise_spark.operators.multimodal import decode_features

    out = decode_features(_media_df(spark, f"{_DATA}/sample.gif")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["format"] == "gif"
    assert (r["width"], r["height"]) == (4, 3)
    assert r["mean_luma"] == pytest.approx(0.5, abs=1e-6)


def test_gif_lzw_hand_derived_sequences():
    """The LZW state machine against hand-derived code sequences:
    dictionary growth, the KwKwK (code == table size) case, and the
    width bump when the table fills — spec arithmetic worked out by
    hand, not round-tripped through our own encoder."""
    from flink_exercise_spark.operators.multimodal import GIF_DECODER

    mcs, w3 = 2, 3
    # clear, 1, 1, 6(=the entry just added: b'\x01\x01'), end
    data = _pack_codes([(4, w3), (1, w3), (1, w3), (6, w3), (5, w3)])
    assert GIF_DECODER._lzw(data, mcs, 4) == bytes([1, 1, 1, 1])
    # KwKwK: clear, 0, 6 (== len(table): prev + prev[0])
    data = _pack_codes([(4, w3), (0, w3), (6, w3), (5, w3)])
    assert GIF_DECODER._lzw(data, mcs, 3) == bytes([0, 0, 0])
    # width growth: after literals 0,1,2 the table holds 8 == 2^3
    # entries, so the NEXT codes (3, 0, end) read at 4 bits
    data = _pack_codes(
        [(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (0, 4), (5, 4)]
    )
    assert GIF_DECODER._lzw(data, mcs, 5) == bytes([0, 1, 2, 3, 0])


def test_gif_encoder_roundtrip_multiblock(spark):
    """A 2000-pixel 4-color image: at mcs=2 the code stream is ~1 kB
    (VERIFIED below to span multiple 255-byte sub-blocks, so the
    descriptor's sub-block reassembly walk genuinely iterates) and
    crosses many clears; indices must round-trip exactly and the luma
    must equal the palette-weighted mean."""
    from flink_exercise_spark.operators.multimodal import GIF_DECODER

    palette = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]
    idx = [(7 * i) % 4 for i in range(2000)]
    payload = _encode_gif(50, 40, palette, idx)
    # the claim under test must actually hold: >1 data sub-block.
    # Walk from the known structure (searching for 0x2C could match a
    # data byte): header(13) + GCT(3*4 colors) + ext(8) + desc(10).
    pos = 13 + 3 * 4 + 8 + 10 + 1  # + the mcs byte
    n_blocks = 0
    while payload[pos] != 0:
        n_blocks += 1
        pos += 1 + payload[pos]
    assert n_blocks >= 2, "fixture no longer spans sub-blocks"
    w, h, ct, got = GIF_DECODER.decode_indices(payload)
    assert (w, h) == (50, 40)
    assert list(got) == idx
    fmt, _, _, luma = GIF_DECODER.decode(payload)
    lumas = [
        (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        for r, g, b in palette
    ]
    want = sum(lumas[i] for i in idx) / len(idx)
    assert fmt == "gif" and luma == pytest.approx(want, abs=1e-6)


def test_gif_sniff_and_seam_boundaries():
    from flink_exercise_spark.operators.multimodal import (
        GIF_DECODER,
        _looks_bmp,
        _looks_gif,
        _looks_png,
    )

    gif = open(f"{_DATA}/sample.gif", "rb").read()
    assert _looks_gif(gif) and not _looks_png(gif) and not _looks_bmp(gif)
    # the magic is printable ASCII — a text payload starting with it
    # must still fail the structural walk
    assert not _looks_gif(b"GIF89a is a file format from 1989, " + b"x" * 40)
    png = open(f"{_DATA}/sample.png", "rb").read()
    assert not _looks_gif(png)

    base = bytearray(gif)
    # setting the interlace flag re-reads the SAME code stream as the
    # 4-pass row order (supported since r10): the decode must be the
    # row permutation of the plain decode, not an error
    pos = base.index(0x2C, 13)
    base[pos + 9] |= 0x40
    w, h, _, plain_idx = GIF_DECODER.decode_indices(gif)
    _, _, _, inter_idx = GIF_DECODER.decode_indices(bytes(base))
    assert inter_idx == GIF_DECODER._deinterlace(plain_idx, w, h)
    with pytest.raises(NotImplementedError):
        GIF_DECODER.decode_indices(gif[:20])  # truncated
    # code stream shorter than width x height -> pixels run short
    broken = _encode_gif(4, 6, [(0, 0, 0), (255, 255, 255)], [1] * 12)
    with pytest.raises(NotImplementedError, match="pixels"):
        GIF_DECODER.decode_indices(broken)


def test_resize_uses_header_probe_on_real_gif(spark):
    from flink_exercise_spark.operators.multimodal import resize_images

    out = resize_images(
        _media_df(spark, f"{_DATA}/sample.gif"), target=2
    ).collect()
    assert len(out) == 1
    # 4x3 -> longest side 2 preserves aspect: 2x1
    assert (out[0]["width"], out[0]["height"]) == (2, 1)


# ---------------------------------------------------------------------------
# baseline JPEG: spec-correct encoder + decoder pins (r10)
# ---------------------------------------------------------------------------

# Minimal canonical Huffman tables for the test encoder: 12 DC
# categories at code length 4; the 8 AC symbols the fixtures need at
# code length 3. Valid prefix codes by construction (Annex C), and
# deliberately NOT the decoder's tables — the decoder builds its
# tables from the DHT segments these bytes describe.
_JDC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_JDC_VALS = bytes(range(12))
_JAC_SYMS = (0x00, 0x01, 0x02, 0x03, 0x04, 0x11, 0x21, 0xF0)
_JAC_BITS = bytes([0, 0, 8] + [0] * 13)
_JAC_VALS = bytes(_JAC_SYMS)


class _JBits:
    """MSB-first bit packer with JPEG byte stuffing; flush pads the
    final byte with 1-bits (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self._buf = 0
        self._n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self._buf = (self._buf << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._buf)
                if self._buf == 0xFF:
                    self.out.append(0x00)
                self._buf = 0
                self._n = 0

    def flush(self):
        while self._n:
            self.put(1, 1)


def _enc_map(bits, vals):
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


def _cat(v):
    return abs(v).bit_length()


def _amp(v, s):
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(w, coefs_nat, dc_pred, dcm, acm, zigzag):
    diff = coefs_nat[0] - dc_pred
    s = _cat(diff)
    length, code = dcm[s]
    w.put(code, length)
    if s:
        w.put(_amp(diff, s), s)
    zz = [coefs_nat[zigzag[i]] for i in range(64)]
    last = max((i for i in range(1, 64) if zz[i]), default=0)
    run = 0
    for i in range(1, last + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = acm[0xF0]
            w.put(code, length)
            run -= 16
        s = _cat(v)
        sym = (run << 4) | s
        assert sym in acm, f"test AC table lacks symbol {sym:02x}"
        length, code = acm[sym]
        w.put(code, length)
        w.put(_amp(v, s), s)
        run = 0
    if last < 63:
        length, code = acm[0x00]
        w.put(code, length)
    return coefs_nat[0]


def _jseg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _jpeg_headers(w, h, comps, quants, sof_marker=0xC0,
                  ac_tables=None):
    """SOI + DQT(s) + SOF + DHT(DC0, AC0) for the given component
    list [(id, hv_byte, tq)] and {tq: zigzag_quant_list}."""
    out = bytearray(b"\xff\xd8")
    for tq, q in sorted(quants.items()):
        out += _jseg(0xDB, bytes([tq]) + bytes(q))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += _jseg(sof_marker, sof)
    out += _jseg(0xC4, bytes([0x00]) + _JDC_BITS + _JDC_VALS)
    ac_bits, ac_vals = ac_tables or (_JAC_BITS, _JAC_VALS)
    out += _jseg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
    return out


def make_gray_jpeg(blocks, w, h, quant_zz, restart=0, ac_tables=None):
    """Baseline grayscale JPEG from QUANTIZED natural-order coefficient
    blocks in MCU raster order."""
    from flink_exercise_spark.operators.multimodal import _JPEG_ZIGZAG

    out = bytearray(
        _jpeg_headers(w, h, [(1, 0x11, 0)], {0: quant_zz},
                      ac_tables=ac_tables)
    )
    if restart:
        out += _jseg(0xDD, restart.to_bytes(2, "big"))
    out += _jseg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    ac_bits, ac_vals = ac_tables or (_JAC_BITS, _JAC_VALS)
    dcm, acm = _enc_map(_JDC_BITS, _JDC_VALS), _enc_map(ac_bits, ac_vals)
    bits = _JBits()
    pred = 0
    n_rst = 0
    for i, blk in enumerate(blocks):
        if restart and i and i % restart == 0:
            bits.flush()
            out += bits.out
            bits = _JBits()
            out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            pred = 0
        pred = _encode_block(bits, blk, pred, dcm, acm, _JPEG_ZIGZAG)
    bits.flush()
    out += bits.out + b"\xff\xd9"
    return bytes(out)


def make_ycbcr420_jpeg(y_blocks, cb_block, cr_block, w, h, qy_zz, qc_zz,
                       ac_tables=None):
    """One-MCU (16x16 max) baseline 4:2:0 color JPEG: four Y blocks in
    2x2 raster order, one Cb, one Cr; all components share the test
    Huffman tables."""
    from flink_exercise_spark.operators.multimodal import _JPEG_ZIGZAG

    comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    out = bytearray(
        _jpeg_headers(w, h, comps, {0: qy_zz, 1: qc_zz},
                      ac_tables=ac_tables)
    )
    out += _jseg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    ac_bits, ac_vals = ac_tables or (_JAC_BITS, _JAC_VALS)
    dcm, acm = _enc_map(_JDC_BITS, _JDC_VALS), _enc_map(ac_bits, ac_vals)
    bits = _JBits()
    preds = {1: 0, 2: 0, 3: 0}
    for blk in y_blocks:
        preds[1] = _encode_block(bits, blk, preds[1], dcm, acm, _JPEG_ZIGZAG)
    preds[2] = _encode_block(bits, cb_block, preds[2], dcm, acm, _JPEG_ZIGZAG)
    preds[3] = _encode_block(bits, cr_block, preds[3], dcm, acm, _JPEG_ZIGZAG)
    bits.flush()
    out += bits.out + b"\xff\xd9"
    return bytes(out)


def _dc_block(v):
    return [v] + [0] * 63


def test_jpeg_dc_only_gray_exact():
    """Solid 8x8: quantized DC=1 against an all-16 table dequantizes to
    16; the DC-only IDCT is flat at dq/8 + 128 = 130 exactly."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    payload = make_gray_jpeg([_dc_block(1)], 8, 8, [16] * 64)
    fmt, w, h, luma = JPEG_DECODER.decode(payload)
    assert (fmt, w, h) == ("jpeg", 8, 8)
    assert luma == round(130 / 255.0, 6)
    assert JPEG_DECODER.probe(payload) == (8, 8, 1)


def test_jpeg_dc_prediction_across_blocks():
    """Two blocks, DCs 4 and 6 under q0=8: the second block's value
    arrives as a DIFFERENCE (2), so a decoder without the predictor
    would plateau wrong. Pixels 132 and 134 -> mean 133."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    q = [8] + [16] * 63
    payload = make_gray_jpeg([_dc_block(4), _dc_block(6)], 16, 8, q)
    _, w, h, luma = JPEG_DECODER.decode(payload)
    assert (w, h) == (16, 8)
    assert luma == round(133 / 255.0, 6)


def test_jpeg_single_ac_matches_cosine_reference():
    """One AC coefficient (u=1, v=0): expected pixels computed here
    directly from the T.81 IDCT definition with math.cos — independent
    of the decoder's precomputed basis and loop structure."""
    import math

    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    a, q = 5, 8  # dequantized AC = 40
    blk = [0] * 64
    blk[1] = a  # natural position row 0, col 1 -> horizontal freq u=1
    payload = make_gray_jpeg([blk], 8, 8, [q] * 64)
    _, _, _, luma = JPEG_DECODER.decode(payload)
    total = 0
    for x in range(8):
        val = 0.25 * (1 / math.sqrt(2)) * (a * q) * math.cos(
            (2 * x + 1) * math.pi / 16
        )
        p = int(round(val)) + 128
        p = 0 if p < 0 else 255 if p > 255 else p
        total += 8 * p  # same value down the whole column
    assert luma == round(total / 64 / 255.0, 6)


def test_jpeg_edge_mcus_clip_to_real_dims():
    """12x10 image = 2x2 blocks of padding; the mean must cover only
    the 120 real pixels: 64/32/16/8 of the four plateaus."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    q = [8] + [16] * 63
    vals = [4, 6, 2, 8]  # quantized DCs -> pixels 132, 134, 130, 136
    payload = make_gray_jpeg([_dc_block(v) for v in vals], 12, 10, q)
    _, w, h, luma = JPEG_DECODER.decode(payload)
    assert (w, h) == (12, 10)
    want = (64 * 132 + 32 * 134 + 16 * 130 + 8 * 136) / 120 / 255.0
    assert luma == round(want, 6)


def test_jpeg_restart_markers_reset_dc():
    """Restart interval 1: an RST0 sits between the two MCUs and the
    second DC is coded from a RESET predictor — a decoder that keeps
    the old predictor decodes 10, not 6."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    q = [8] + [16] * 63
    payload = make_gray_jpeg(
        [_dc_block(4), _dc_block(6)], 16, 8, q, restart=1
    )
    assert b"\xff\xd0" in payload
    _, _, _, luma = JPEG_DECODER.decode(payload)
    assert luma == round(133 / 255.0, 6)


def test_jpeg_ycbcr420_decodes_luma_skips_chroma():
    """4:2:0 color MCU: four DC-only Y plateaus; the chroma blocks
    carry AC energy whose only effect on this kernel is bitstream
    advancement — mis-stepping them would desynchronize the Y Huffman
    decode (caught by the exact mean)."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    qy = [8] + [16] * 63
    qc = [16] * 64
    y = [_dc_block(v) for v in (4, 6, 2, 8)]  # 132/134/130/136
    chroma = [0] * 64
    chroma[0], chroma[1], chroma[8], chroma[9] = 3, -2, 1, 1
    payload = make_ycbcr420_jpeg(y, chroma, chroma, 16, 16, qy, qc)
    fmt, w, h, luma = JPEG_DECODER.decode(payload)
    assert (fmt, w, h) == ("jpeg", 16, 16)
    want = (132 + 134 + 130 + 136) / 4 / 255.0
    assert luma == round(want, 6)
    assert JPEG_DECODER.probe(payload) == (16, 16, 3)


def test_jpeg_seams():
    """Malformed progressive scans, lossless frames, 16-bit quant
    tables, and truncation stay behind NotImplementedError — a
    narrowed seam, never a crash (progressive itself decodes since
    r10)."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    good = make_gray_jpeg([_dc_block(1)], 8, 8, [16] * 64)
    # flipping a BASELINE stream's SOF marker to SOF2 yields a
    # malformed progressive file (its one scan claims the 0..63 band
    # with Ss=0 — illegal for a progressive DC scan): since r10 the
    # progressive decoder accepts the header and rejects the scan
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="Se != 0"):
        JPEG_DECODER.decode(progressive)
    assert JPEG_DECODER.probe(progressive) == (8, 8, 1)
    # lossless sequential (SOF3) stays out entirely
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        JPEG_DECODER.probe(lossless)
    sixteen_bit = good.replace(b"\xff\xdb\x00\x43\x00", b"\xff\xdb\x00\x43\x10", 1)
    with pytest.raises(NotImplementedError):
        JPEG_DECODER.decode(sixteen_bit)
    # strip the EOI and the (single) entropy byte: the bit reader runs
    # off the end mid-block
    with pytest.raises(NotImplementedError, match="truncated|marker"):
        JPEG_DECODER.decode(good[:-3])


def test_jpeg_sniff_boundaries():
    """0xFF is not a valid UTF-8 lead byte, so text-derived fixture
    payloads can never route to the JPEG decoder — the md5-arithmetic
    oracles stay exact."""
    from flink_exercise_spark.operators.multimodal import (
        _looks_jpeg,
        decode_any,
    )

    assert not _looks_jpeg("any fixture text at all".encode())
    assert not _looks_jpeg(b"\xff\xd8")  # SOI alone, no marker lead-in
    fmt, _, _, _ = decode_any("plain text".encode())
    assert fmt == "fake/raw"
    good = make_gray_jpeg([_dc_block(1)], 8, 8, [16] * 64)
    assert _looks_jpeg(good)
    assert decode_any(good)[0] == "jpeg"


def test_jpeg_real_decode_via_spark(spark):
    """sample.jpg (checked in; generated by this file's spec-correct
    encoder): 16x16 baseline 4:2:0 with the exact plateaus of
    test_jpeg_ycbcr420 — real Huffman/IDCT math end-to-end through the
    mapInPandas path."""
    from flink_exercise_spark.operators.multimodal import decode_features

    out = decode_features(_media_df(spark, f"{_DATA}/sample.jpg")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["format"] == "jpeg"
    assert (r["width"], r["height"]) == (16, 16)
    assert r["mean_luma"] == round((132 + 134 + 130 + 136) / 4 / 255.0, 6)


# --- Adam7 interlaced PNG (r10 seam fill) -------------------------------------

_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _encode_png_adam7(rows, channels=3, color_type=None, plte=None,
                      filters_by_pass=None):
    """Interlaced twin of _encode_png: split the raster into the seven
    Adam7 passes, filter each pass independently (fresh zero prev —
    the property the decoder must honor), concatenate pass streams in
    order, set the IHDR interlace byte to 1."""
    import binascii
    import zlib

    ct = {1: 0, 2: 4, 3: 2, 4: 6}[channels] if color_type is None else color_type
    h = len(rows)
    w = len(rows[0]) // channels

    def filt(ft, cur, prev):
        out = bytearray([ft])
        for i, x in enumerate(cur):
            left = cur[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            if ft == 0:
                f = 0
            elif ft == 1:
                f = left
            elif ft == 2:
                f = up
            elif ft == 3:
                f = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                f = (
                    left
                    if pa <= pb and pa <= pc
                    else (up if pb <= pc else ul)
                )
            out.append((x - f) & 0xFF)
        return bytes(out)

    raw = b""
    for pidx, (x0, y0, dx, dy) in enumerate(_ADAM7):
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        ft = (filters_by_pass or [0] * 7)[pidx]
        prev = bytes(pw * channels)
        for j in range(ph):
            y = y0 + j * dy
            cur = bytearray()
            for i in range(pw):
                o = (x0 + i * dx) * channels
                cur += rows[y][o : o + channels]
            raw += filt(ft, bytes(cur), prev)
            prev = bytes(cur)

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + binascii.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [8, ct, 0, 0, 1]
    )
    plte_chunk = chunk(b"PLTE", plte) if plte is not None else b""
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte_chunk
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _raster(w, h, channels):
    """Deterministic raster with distinct values everywhere so any
    misplacement is a byte diff, not a coincidence."""
    return [
        bytes(
            (7 * y + 13 * x + 29 * c + 3) % 256
            for x in range(w)
            for c in range(channels)
        )
        for y in range(h)
    ]


def test_png_adam7_bit_exact_vs_progressive():
    """Adam7-interlaced decode must reproduce EXACTLY the samples the
    progressive (interlace 0) encoding of the same raster yields —
    across sizes that exercise empty passes (1x1 leaves six passes
    empty), odd dims, and per-pass nonzero filters."""
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    for (w, h) in ((1, 1), (2, 2), (3, 3), (5, 7), (8, 8), (9, 10)):
        rows = _raster(w, h, 3)
        plain = _encode_png(rows, channels=3)
        inter = _encode_png_adam7(rows, channels=3)
        assert PNG_DECODER.decode_pixels(plain) == PNG_DECODER.decode_pixels(
            inter
        ), (w, h)
        assert PNG_DECODER.decode(plain) == PNG_DECODER.decode(inter)

    # nonzero filters chosen per pass: unfilter state must reset at
    # every pass boundary or Sub/Up/Paeth bleed across passes
    rows = _raster(9, 10, 3)
    inter = _encode_png_adam7(
        rows, channels=3, filters_by_pass=[1, 2, 3, 4, 1, 2, 4]
    )
    assert PNG_DECODER.decode_pixels(inter) == PNG_DECODER.decode_pixels(
        _encode_png(rows, channels=3)
    )


def test_png_adam7_channel_variants_and_palette():
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    for channels in (1, 2, 4):
        rows = _raster(5, 6, channels)
        assert PNG_DECODER.decode(
            _encode_png_adam7(rows, channels=channels)
        ) == PNG_DECODER.decode(_encode_png(rows, channels=channels))

    plte = bytes(range(12))  # 4 entries
    rows = [bytes((x + y) % 4 for x in range(5)) for y in range(6)]
    a = PNG_DECODER.decode(
        _encode_png(rows, channels=1, color_type=3, plte=plte)
    )
    b = PNG_DECODER.decode(
        _encode_png_adam7(rows, channels=1, color_type=3, plte=plte)
    )
    assert a == b


def test_png_adam7_truncation_is_a_seam():
    import pytest as _pytest

    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    rows = _raster(9, 10, 3)
    inter = bytearray(_encode_png_adam7(rows, channels=3))
    # re-deflate a truncated pass stream so zlib still inflates
    import binascii
    import zlib

    raw = b""
    pos = 8
    while pos + 8 <= len(inter):
        ln = int.from_bytes(inter[pos : pos + 4], "big")
        if inter[pos + 4 : pos + 8] == b"IDAT":
            raw = zlib.decompress(bytes(inter[pos + 8 : pos + 8 + ln]))
            break
        pos += 12 + ln

    def rebuild(new_raw):
        def chunk(ctype, data):
            return (
                len(data).to_bytes(4, "big")
                + ctype
                + data
                + binascii.crc32(ctype + data).to_bytes(4, "big")
            )

        ihdr = (9).to_bytes(4, "big") + (10).to_bytes(4, "big") + bytes(
            [8, 2, 0, 0, 1]
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(new_raw))
            + chunk(b"IEND", b"")
        )

    with _pytest.raises(NotImplementedError, match="scanline data"):
        PNG_DECODER.decode_pixels(rebuild(raw[:-5]))
    with _pytest.raises(NotImplementedError, match="trailing bytes"):
        PNG_DECODER.decode_pixels(rebuild(raw + b"\x00"))


def test_gif_interlaced_roundtrip():
    """An interlaced encoding of a raster with a distinct value per
    row must decode to the row-major original — pinning the 4-pass
    row permutation exactly — and carry the same luma as the
    non-interlaced encoding of the same raster."""
    from flink_exercise_spark.operators.multimodal import GIF_DECODER

    palette = [(i * 16, i * 8, i * 4) for i in range(16)]
    for w, h in ((3, 1), (3, 4), (5, 9), (4, 16)):
        idx = [(y % 16) for y in range(h) for _ in range(w)]
        plain = _encode_gif(w, h, palette, idx)
        inter = _encode_gif(w, h, palette, idx, interlace=True)
        assert GIF_DECODER.decode_indices(inter) == GIF_DECODER.decode_indices(
            plain
        ), (w, h)
        assert GIF_DECODER.decode(inter) == GIF_DECODER.decode(plain)


# --- PNG sub-byte and 16-bit depths (r10 seam fill) ----------------------------


def _pack_row(samples, depth):
    """Pack one row of channel samples at the given depth: MSB-first
    bit packing below 8, big-endian pairs at 16."""
    if depth == 8:
        return bytes(samples)
    if depth == 16:
        return b"".join(int(s).to_bytes(2, "big") for s in samples)
    per = 8 // depth
    out = bytearray()
    for i in range(0, len(samples), per):
        b = 0
        for k, s in enumerate(samples[i : i + per]):
            b |= s << (8 - depth * (k + 1))
        out.append(b)
    return bytes(out)


def _encode_png_depth(rows, channels, depth, color_type=None, plte=None,
                      filters=None, interlace=False):
    """Arbitrary-depth PNG encoder for fixtures: ``rows`` are lists of
    integer channel samples. Filtering operates on the PACKED bytes
    with the spec's bpp offset — exactly what the decoder must undo."""
    import binascii
    import zlib

    ct = (
        {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        if color_type is None
        else color_type
    )
    h = len(rows)
    w = len(rows[0]) // channels
    bpp = max(1, channels * depth // 8)

    def filt(ft, cur, prev):
        out = bytearray([ft])
        for i, x in enumerate(cur):
            left = cur[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = 0
            elif ft == 1:
                f = left
            elif ft == 2:
                f = up
            elif ft == 3:
                f = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                f = (
                    left
                    if pa <= pb and pa <= pc
                    else (up if pb <= pc else ul)
                )
            out.append((x - f) & 0xFF)
        return bytes(out)

    raw = b""
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            prev = bytes(len(_pack_row([0] * pw * channels, depth)))
            for j in range(ph):
                y = y0 + j * dy
                sub = []
                for i in range(pw):
                    o = (x0 + i * dx) * channels
                    sub += rows[y][o : o + channels]
                cur = _pack_row(sub, depth)
                raw += filt(0, cur, prev)
                prev = cur
    else:
        filters = filters or [0] * h
        prev = bytes(len(_pack_row(rows[0], depth)))
        for row, ft in zip(rows, filters):
            cur = _pack_row(row, depth)
            raw += filt(ft, cur, prev)
            prev = cur

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + binascii.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [depth, ct, 0, 0, 1 if interlace else 0]
    )
    plte_chunk = chunk(b"PLTE", plte) if plte is not None else b""
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte_chunk
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_subbyte_gray_exact_samples_and_luma():
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    # 1-bit 5x2 checkerboard: width 5 exercises the pad bits in the
    # last byte of each packed row
    rows = [[(x + y) % 2 for x in range(5)] for y in range(2)]
    payload = _encode_png_depth(rows, channels=1, depth=1)
    w, h, c, samples, depth = PNG_DECODER._decode_samples(payload)
    assert (w, h, c, depth) == (5, 2, 1, 1)
    assert samples == [s for r in rows for s in r]
    fmt, _, _, luma = PNG_DECODER.decode(payload)
    # mean of bits over maxval 1
    assert luma == round(sum(samples) / 10 / 1, 6)

    # 2-bit and 4-bit gradients: luma = mean / (2^d - 1) exactly
    for d in (2, 4):
        maxv = (1 << d) - 1
        rows = [[(x + y) % (maxv + 1) for x in range(7)] for y in range(3)]
        payload = _encode_png_depth(rows, channels=1, depth=d)
        _, _, _, samples, _ = PNG_DECODER._decode_samples(payload)
        flat = [s for r in rows for s in r]
        assert samples == flat, d
        _, _, _, luma = PNG_DECODER.decode(payload)
        assert luma == round(sum(flat) / len(flat) / maxv, 6)


def test_png_subbyte_palette_equals_8bit_twin():
    """The same indexed image at depth 2/4 and depth 8 must decode to
    the same luma (indices identical, PLTE identical)."""
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    plte = bytes(range(12))  # 4 entries
    rows = [[(x + y) % 4 for x in range(5)] for y in range(6)]
    want = PNG_DECODER.decode(
        _encode_png_depth(rows, 1, 8, color_type=3, plte=plte)
    )
    for d in (2, 4):
        got = PNG_DECODER.decode(
            _encode_png_depth(rows, 1, d, color_type=3, plte=plte)
        )
        assert got == want, d


def test_png_16bit_equals_8bit_twin_and_filters():
    """v16 = v8 * 257 scales exactly (65535 = 255 * 257), so the
    16-bit encoding of an 8-bit image must decode to the SAME luma —
    for gray and RGB, under every filter type (filters act on packed
    bytes with bpp = 2*channels)."""
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    for channels in (1, 3):
        rows8 = [
            [(7 * y + 13 * x + 3) % 256 for x in range(6 * channels)]
            for y in range(7)
        ]
        rows16 = [[v * 257 for v in r] for r in rows8]
        want = PNG_DECODER.decode(
            _encode_png_depth(rows8, channels, 8)
        )
        for ft in (0, 1, 2, 3, 4):
            got = PNG_DECODER.decode(
                _encode_png_depth(
                    rows16, channels, 16, filters=[ft] * 7
                )
            )
            assert got == want, (channels, ft)
    # 16-bit samples decode to the exact integers, not a byte view
    rows = [[65535, 0, 257, 32896]]
    _, _, _, samples, depth = PNG_DECODER._decode_samples(
        _encode_png_depth(rows, 1, 16)
    )
    assert (samples, depth) == ([65535, 0, 257, 32896], 16)


def test_png_subbyte_and_16bit_interlaced():
    """Adam7 composes with every depth: interlaced == progressive."""
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    rows1 = [[(x * y + x) % 2 for x in range(9)] for y in range(10)]
    assert PNG_DECODER._decode_samples(
        _encode_png_depth(rows1, 1, 1, interlace=True)
    ) == PNG_DECODER._decode_samples(_encode_png_depth(rows1, 1, 1))

    rows16 = [
        [(257 * ((x + 2 * y) % 256)) for x in range(9)] for y in range(10)
    ]
    assert PNG_DECODER._decode_samples(
        _encode_png_depth(rows16, 1, 16, interlace=True)
    ) == PNG_DECODER._decode_samples(_encode_png_depth(rows16, 1, 16))


def test_png_decode_pixels_stays_the_8bit_view():
    from flink_exercise_spark.operators.multimodal import PNG_DECODER

    with pytest.raises(NotImplementedError, match="8-bit byte view"):
        PNG_DECODER.decode_pixels(
            _encode_png_depth([[1, 0, 1]], 1, 1)
        )


# --- progressive JPEG (r10 seam fill) -----------------------------------------


# every (run 0..15, size 0..6) symbol at code length 7 (112 codes fit
# in the 128-slot length): rich enough for random fixtures, EOB runs,
# ZRL (0xF0 = r15/s0), and refinement (size-1) symbols at any run
_PAC_SYMS = tuple((r << 4) | s for r in range(16) for s in range(7))
_PAC_BITS = bytes([0] * 6 + [112] + [0] * 9)
_PAC_VALS = bytes(_PAC_SYMS)
_PAC_TABLES = (_PAC_BITS, _PAC_VALS)


def _prog_dc_first(bits, dcs, dcm, al):
    pred = 0
    for dc in dcs:
        v = dc >> al  # DC point transform: arithmetic shift
        diff = v - pred
        pred = v
        s = _cat(diff)
        length, code = dcm[s]
        bits.put(code, length)
        if s:
            bits.put(_amp(diff, s), s)


def _prog_dc_refine(bits, dcs, al):
    for dc in dcs:
        bits.put((dc >> al) & 1, 1)


class _ProgAc:
    """AC scan encoder for progressive fixtures, mirroring T.81 G.1.2
    (libjpeg's emit structure): EOB-run coalescing with deferred
    correction bits in refinement passes."""

    def __init__(self, bits, acm, ss, se, al, zigzag):
        self.bits, self.acm = bits, acm
        self.ss, self.se, self.al = ss, se, al
        self.zz = zigzag
        self.eobrun = 0
        self.pending = []

    def _sym(self, sym):
        length, code = self.acm[sym]
        self.bits.put(code, length)

    def flush_eob(self):
        if not self.eobrun:
            return
        r = self.eobrun.bit_length() - 1
        assert r <= 14
        self._sym(r << 4)
        if r:
            self.bits.put(self.eobrun - (1 << r), r)
        for b in self.pending:
            self.bits.put(b, 1)
        self.eobrun = 0
        self.pending = []

    def first_block(self, blk):
        t = [0] * 64
        for k in range(self.ss, self.se + 1):
            c = blk[self.zz[k]]
            t[k] = (abs(c) >> self.al) * (1 if c >= 0 else -1)
        if not any(t[k] for k in range(self.ss, self.se + 1)):
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()
            return
        self.flush_eob()
        last = max(k for k in range(self.ss, self.se + 1) if t[k])
        run = 0
        for k in range(self.ss, last + 1):
            v = t[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                self._sym(0xF0)
                run -= 16
            s = _cat(v)
            self._sym((run << 4) | s)
            self.bits.put(_amp(v, s), s)
            run = 0
        if last < self.se:
            self.eobrun += 1

    def refine_block(self, blk):
        a = [0] * 64
        sgn = [1] * 64
        for k in range(self.ss, self.se + 1):
            c = blk[self.zz[k]]
            a[k] = abs(c) >> self.al
            sgn[k] = 1 if c > 0 else 0
        new = [k for k in range(self.ss, self.se + 1) if a[k] == 1]
        if not new:
            self.eobrun += 1
            self.pending += [
                a[k] & 1
                for k in range(self.ss, self.se + 1)
                if a[k] > 1
            ]
            if self.eobrun == 0x7FFF:
                self.flush_eob()
            return
        self.flush_eob()
        r = 0
        inline = []
        emitted_through = self.ss - 1
        for k in range(self.ss, self.se + 1):
            if a[k] == 0:
                r += 1
                if r == 16:
                    self._sym(0xF0)
                    for b in inline:
                        self.bits.put(b, 1)
                    inline = []
                    r = 0
                    emitted_through = k
            elif a[k] > 1:
                inline.append(a[k] & 1)
            else:  # newly significant +-1
                self._sym((r << 4) | 1)
                self.bits.put(sgn[k], 1)
                for b in inline:
                    self.bits.put(b, 1)
                inline = []
                r = 0
                emitted_through = k
        if emitted_through < self.se and (r > 0 or inline):
            self.eobrun += 1
            self.pending = inline
        elif inline:
            # history positions after the last new value with no
            # trailing zeros still need an EOB carrier
            self.eobrun += 1
            self.pending = inline


def make_gray_progressive_jpeg(blocks, w, h, quant_zz, scans, restart=0):
    """Progressive grayscale JPEG (SOF2) from QUANTIZED natural-order
    blocks: ``scans`` is a list of (Ss, Se, Ah, Al) in a legal
    successive order. ``restart`` inserts RSTn every that many blocks
    in every scan (DC predictor and EOB run reset per interval)."""
    from flink_exercise_spark.operators.multimodal import _JPEG_ZIGZAG

    out = bytearray(
        _jpeg_headers(w, h, [(1, 0x11, 0)], {0: quant_zz},
                      sof_marker=0xC2, ac_tables=_PAC_TABLES)
    )
    if restart:
        out += _jseg(0xDD, restart.to_bytes(2, "big"))
    dcm = _enc_map(_JDC_BITS, _JDC_VALS)
    acm = _enc_map(*_PAC_TABLES)
    step = restart or len(blocks)
    for ss, se, ah, al in scans:
        out += _jseg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        n_rst = 0
        for ci in range(0, len(blocks), step):
            if ci:
                out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
            chunk = blocks[ci : ci + step]
            bits = _JBits()
            if ss == 0:
                if ah == 0:
                    _prog_dc_first(bits, [b[0] for b in chunk], dcm, al)
                else:
                    _prog_dc_refine(bits, [b[0] for b in chunk], al)
            else:
                enc = _ProgAc(bits, acm, ss, se, al, _JPEG_ZIGZAG)
                for blk in chunk:
                    if ah == 0:
                        enc.first_block(blk)
                    else:
                        enc.refine_block(blk)
                enc.flush_eob()
            bits.flush()
            out += bits.out
    out += b"\xff\xd9"
    return bytes(out)


def _rand_blocks(n, seed=11, lo=-60, hi=60, density=0.25):
    """Deterministic pseudo-random coefficient blocks: a mix of zero,
    +-1..small, and larger magnitudes so refinement scans carry both
    newly-significant values and correction bits."""
    state = seed
    blocks = []
    for _ in range(n):
        blk = [0] * 64
        for i in range(64):
            state = (1103515245 * state + 12345) % (1 << 31)
            if (state % 100) / 100.0 < density:
                state = (1103515245 * state + 12345) % (1 << 31)
                blk[i] = lo + state % (hi - lo + 1)
        blk[0] = (blk[0] % 32) - 16
        blocks.append(blk)
    return blocks


def test_jpeg_progressive_equals_baseline_gray():
    """Every legal scan script must reconstruct the SAME coefficients
    as the baseline encoding of the same blocks — so the decoded luma
    is identical. Scripts cover: trivial two-scan, spectral bands,
    full successive approximation (the libjpeg default shape), and a
    band split under approximation."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    q = [16] * 64
    blocks = _rand_blocks(6)
    w, h = 48, 8
    want = JPEG_DECODER.decode(
        make_gray_jpeg(blocks, w, h, q, ac_tables=_PAC_TABLES)
    )
    scripts = [
        [(0, 0, 0, 0), (1, 63, 0, 0)],
        [(0, 0, 0, 0), (1, 5, 0, 0), (6, 63, 0, 0)],
        [
            (0, 0, 0, 1),
            (1, 63, 0, 2),
            (0, 0, 1, 0),
            (1, 63, 2, 1),
            (1, 63, 1, 0),
        ],
        [
            (0, 0, 0, 2),
            (1, 10, 0, 1),
            (11, 63, 0, 1),
            (0, 0, 2, 1),
            (0, 0, 1, 0),
            (1, 10, 1, 0),
            (11, 63, 1, 0),
        ],
    ]
    for scans in scripts:
        payload = make_gray_progressive_jpeg(blocks, w, h, q, scans)
        got = JPEG_DECODER.decode(payload)
        assert got == want, scans
        assert JPEG_DECODER.probe(payload) == (w, h, 1)


def test_jpeg_progressive_eobrun_and_zrl_paths():
    """Blocks engineered so the encoder emits multi-block EOB runs
    (all-zero bands) and ZRL-in-refinement spans — the G.1.2.3
    branches a generic fixture might miss."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    q = [16] * 64
    blocks = [
        _dc_block(3),            # empty AC band -> EOB run member
        _dc_block(-2),           # another
        [0] * 64,                # another
        [4] + [0] * 40 + [3] + [0] * 22,   # late coefficient: long runs
        [1] + [0] * 62 + [-1],   # coefficient at k=63 exactly
        [0] * 32 + [25] + [0] * 31,
    ]
    w, h = 48, 8
    want = JPEG_DECODER.decode(
        make_gray_jpeg(blocks, w, h, q, ac_tables=_PAC_TABLES)
    )
    for scans in (
        [(0, 0, 0, 0), (1, 63, 0, 0)],
        [(0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 1), (1, 63, 1, 0)],
    ):
        got = JPEG_DECODER.decode(
            make_gray_progressive_jpeg(blocks, w, h, q, scans)
        )
        assert got == want, scans


def make_ycbcr420_progressive_jpeg(y_blocks, cb_block, cr_block, w, h,
                                   qy_zz, qc_zz):
    """One-MCU 4:2:0 progressive JPEG: interleaved DC-first scan (all
    three components, MCU order), then per-component AC scans — luma
    first, then the chroma scans a luma-only decoder must SKIP."""
    from flink_exercise_spark.operators.multimodal import _JPEG_ZIGZAG

    comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    out = bytearray(
        _jpeg_headers(w, h, comps, {0: qy_zz, 1: qc_zz},
                      sof_marker=0xC2, ac_tables=_PAC_TABLES)
    )
    dcm = _enc_map(_JDC_BITS, _JDC_VALS)
    acm = _enc_map(*_PAC_TABLES)
    # interleaved DC first scan (Al=0)
    out += _jseg(
        0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0])
    )
    bits = _JBits()
    preds = {1: 0, 2: 0, 3: 0}

    def put_dc(cid, dc):
        diff = dc - preds[cid]
        preds[cid] = dc
        s = _cat(diff)
        length, code = dcm[s]
        bits.put(code, length)
        if s:
            bits.put(_amp(diff, s), s)

    for blk in y_blocks:
        put_dc(1, blk[0])
    put_dc(2, cb_block[0])
    put_dc(3, cr_block[0])
    bits.flush()
    out += bits.out
    # per-component AC scans: luma, then chroma (skipped downstream)
    for cid, blocks in ((1, y_blocks), (2, [cb_block]), (3, [cr_block])):
        out += _jseg(0xDA, bytes([1, cid, 0x00, 1, 63, 0]))
        bits = _JBits()
        enc = _ProgAc(bits, acm, 1, 63, 0, _JPEG_ZIGZAG)
        for blk in blocks:
            enc.first_block(blk)
        enc.flush_eob()
        bits.flush()
        out += bits.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_ycbcr_skips_chroma_scans():
    """The 4:2:0 progressive luma must equal the baseline 4:2:0 twin —
    and the chroma AC scans are never entropy-decoded (garbage chroma
    coefficients cannot perturb the luma; pinned by giving chroma
    blocks large coefficients)."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    qy, qc = [16] * 64, [32] * 64
    y_blocks = _rand_blocks(4, seed=23)
    cb = [60] + [31] * 63
    cr = [-50] + [-29] * 63
    w, h = 16, 16
    want = JPEG_DECODER.decode(
        make_ycbcr420_jpeg(y_blocks, cb, cr, w, h, qy, qc,
                           ac_tables=_PAC_TABLES)
    )
    got = JPEG_DECODER.decode(
        make_ycbcr420_progressive_jpeg(y_blocks, cb, cr, w, h, qy, qc)
    )
    assert got == want
    assert JPEG_DECODER.probe(
        make_ycbcr420_progressive_jpeg(y_blocks, cb, cr, w, h, qy, qc)
    ) == (16, 16, 3)


def test_jpeg_progressive_seams():
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    q = [16] * 64
    blocks = [_dc_block(2)]
    # an interleaved AC scan is illegal in progressive mode
    payload = bytearray(
        _jpeg_headers(8, 8, [(1, 0x11, 0)], {0: q}, sof_marker=0xC2)
    )
    payload += _jseg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
    bits = _JBits()
    _prog_dc_first(bits, [2], _enc_map(_JDC_BITS, _JDC_VALS), 0)
    bits.flush()
    payload += bits.out
    # hand-build a 2-component AC SOS header (structurally invalid)
    bad = bytes(payload) + _jseg(
        0xDA, bytes([2, 1, 0x00, 2, 0x00, 1, 63, 0])
    )
    with pytest.raises(NotImplementedError, match="interleaved AC"):
        JPEG_DECODER.decode(bad + b"\xff\xd9")
    # without any scan delivering quant... quant IS delivered; but a
    # progressive DC scan with Se != 0 is malformed
    bad2 = bytes(payload) + _jseg(
        0xDA, bytes([1, 1, 0x00, 0, 5, 0])
    )
    with pytest.raises(NotImplementedError, match="Se != 0"):
        JPEG_DECODER.decode(bad2 + b"\xff\xd9")
    # arithmetic-coded progressive (SOF10 = 0xCA) stays the seam
    arith = bytearray(
        _jpeg_headers(8, 8, [(1, 0x11, 0)], {0: q}, sof_marker=0xCA)
    )
    with pytest.raises(NotImplementedError, match="SOF"):
        JPEG_DECODER.decode(bytes(arith) + b"\xff\xd9")


def test_jpeg_progressive_restart_intervals():
    """RSTn markers inside progressive scans reset the DC predictor
    and the EOB run per interval — the decode must still equal the
    (restart-free) baseline twin."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    q = [16] * 64
    blocks = _rand_blocks(8, seed=5)
    w, h = 64, 8
    want = JPEG_DECODER.decode(
        make_gray_jpeg(blocks, w, h, q, ac_tables=_PAC_TABLES)
    )
    scans = [(0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 1), (1, 63, 1, 0)]
    got = JPEG_DECODER.decode(
        make_gray_progressive_jpeg(blocks, w, h, q, scans, restart=3)
    )
    assert got == want


# --- MJPEG video decode (r10: demux + in-repo JPEG codec) ----------------------


def _encode_avi(frames, usec=40000, w=8, h=8, in_rec_list=False):
    """Minimal RIFF/AVI for fixtures: LIST hdrl(avih) + LIST movi with
    one 00dc chunk per frame (optionally wrapped in a LIST rec group),
    RIFF size field consistent with the payload (the sniff's demand)."""

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    avih = (
        usec.to_bytes(4, "little")
        + b"\x00" * 12
        + len(frames).to_bytes(4, "little")
        + b"\x00" * 12
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    inner = b"".join(chunk(b"00dc", f) for f in frames)
    if in_rec_list:
        inner = chunk(b"LIST", b"rec " + inner)
    movi = chunk(b"LIST", b"movi" + inner)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_avi_demux_and_mjpeg_luma_exact(spark):
    """Five DC-only MJPEG frames with EXACTLY known lumas (the
    make_gray_jpeg fixtures): stride-2 sampling must decode frames
    0/2/4 with their known lumas, real dims, and avih timestamps."""
    from flink_exercise_spark.operators.multimodal import (
        AVI_PROBER,
        video_frame_luma,
    )

    q = [16] * 64
    # DC=v dequantizes to 16v; flat block at 16v/8 + 128
    frames = [
        make_gray_jpeg([_dc_block(v)], 8, 8, q) for v in (1, 2, 3, 4, 5)
    ]
    avi = _encode_avi(frames, usec=33366)
    assert AVI_PROBER.frames(avi) == frames
    df = spark.createDataFrame(
        [(7, bytearray(avi))], "doc_id long, payload binary"
    )
    rows = sorted(
        (r["frame_idx"], r["ts_ms"], r["width"], r["height"],
         r["mean_luma"])
        for r in video_frame_luma(df, stride=2).collect()
    )
    want = [
        (i, i * 33366 // 1000, 8, 8, round((128 + 2 * (i + 1)) / 255.0, 6))
        for i in (0, 2, 4)
    ]
    assert rows == want


def test_avi_demux_rec_lists_and_seams(spark):
    from flink_exercise_spark.operators.multimodal import (
        AVI_PROBER,
        video_frame_luma,
    )

    q = [16] * 64
    frames = [make_gray_jpeg([_dc_block(v)], 8, 8, q) for v in (1, 2)]
    # frames inside a LIST rec group demux identically
    assert AVI_PROBER.frames(_encode_avi(frames, in_rec_list=True)) == frames
    # header-only AVI (the checked-in sample): loud seam
    sample = open(f"{_DATA}/sample.avi", "rb").read()
    with pytest.raises(NotImplementedError, match="movi"):
        AVI_PROBER.frames(sample)
    # a non-JPEG frame codec stays the seam
    raw_avi = _encode_avi([b"\x00" * 32])
    df = spark.createDataFrame(
        [(1, bytearray(raw_avi))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="non-MJPEG"):
        video_frame_luma(df).collect()
    # non-AVI payload routes to the seam, not the stub
    txt = spark.createDataFrame(
        [(1, bytearray(b"not a video"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="AVI payload"):
        video_frame_luma(txt).collect()


def test_mjpeg_progressive_frames_decode(spark):
    """MJPEG frames are just JPEGs — a PROGRESSIVE frame decodes
    through the same seam (the codec upgrade composes into video)."""
    from flink_exercise_spark.operators.multimodal import video_frame_luma

    q = [16] * 64
    blocks = [_dc_block(3)]
    prog = make_gray_progressive_jpeg(
        blocks, 8, 8, q, [(0, 0, 0, 0), (1, 63, 0, 0)]
    )
    base = make_gray_jpeg(blocks, 8, 8, q)
    df = spark.createDataFrame(
        [(1, bytearray(_encode_avi([base, prog])))],
        "doc_id long, payload binary",
    )
    rows = video_frame_luma(df, stride=1).collect()
    assert len(rows) == 2
    assert rows[0]["mean_luma"] == rows[1]["mean_luma"]


def test_jpeg_missing_tables_are_loud_seams():
    """A scan referencing an undelivered Huffman or quantization table
    must raise the documented seam, not a bare KeyError (code-review
    r10 — the progressive path already guarded both)."""
    from flink_exercise_spark.operators.multimodal import JPEG_DECODER

    good = bytearray(make_gray_jpeg([_dc_block(1)], 8, 8, [16] * 64))
    # retarget the scan's DC table id to 1 (never delivered)
    sos_at = bytes(good).index(b"\xff\xda")
    no_dht = bytearray(good)
    no_dht[sos_at + 6] = 0x10  # component's Td=1, Ta=0
    with pytest.raises(NotImplementedError, match="Huffman table"):
        JPEG_DECODER.decode(bytes(no_dht))
    # retarget the frame's quant table id to 1 (never delivered)
    sof_at = bytes(good).index(b"\xff\xc0")
    no_dqt = bytearray(good)
    no_dqt[sof_at + 12] = 1  # component Tq=1
    with pytest.raises(NotImplementedError, match="quantization table"):
        JPEG_DECODER.decode(bytes(no_dqt))
