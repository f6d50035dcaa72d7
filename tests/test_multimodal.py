"""Multimodal binary-column handling: the stdlib BMP/WAV strict decode
chain (encode -> binary column -> mapInPandas decode), its failure modes,
and the Arrow plumbing invariants."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.multimodal import (
    BMP_H,
    BMP_W,
    FRAME_SAMPLE_EVERY,
    FRAMES_MAGIC,
    KIND_BMP,
    KIND_VIDEO,
    KIND_WAV,
    VIDEO_N_FRAMES,
    WAV_N,
    WAV_RATE,
    _bmp_rgb,
    _frame_seed,
    _wav_sample,
    decode_bmp,
    decode_frames,
    decode_wav,
    encode_bmp,
    encode_frames,
    encode_wav,
    extract_media_features,
    header_features,
    resize_media,
    strict_decoder,
    synthetic_media,
)


def test_bmp_round_trip_unflips_rows_and_strips_padding():
    # 3x2 -> 9-byte rows padded to 12: both the bottom-up flip and the
    # padding strip are load-bearing for this to hold
    for doc_id in (0, 7, 254, 99991):
        w, h, px = decode_bmp(encode_bmp(doc_id))
        assert (w, h) == (BMP_W, BMP_H)
        assert px == [_bmp_rgb(doc_id, i) for i in range(BMP_W * BMP_H)]


def test_bmp_top_down_negative_height():
    # height < 0 means rows are stored top-down; decoder must not flip
    payload = bytearray(encode_bmp(42))
    # stored bottom-up rows: [row1, row0]; patch height to -2 and swap
    # rows so the logical image is unchanged
    struct.pack_into("<i", payload, 22, -BMP_H)
    row_size = (3 * BMP_W + 3) & ~3
    off = 54
    r0 = bytes(payload[off : off + row_size])
    r1 = bytes(payload[off + row_size : off + 2 * row_size])
    payload[off : off + row_size] = r1
    payload[off + row_size : off + 2 * row_size] = r0
    _, h, px = decode_bmp(bytes(payload))
    assert h == BMP_H
    assert px == [_bmp_rgb(42, i) for i in range(BMP_W * BMP_H)]


def test_wav_round_trip_and_extra_chunk():
    for doc_id in (1, 13, 2001):
        rate, samples = decode_wav(encode_wav(doc_id))
        assert rate == WAV_RATE
        assert samples == [_wav_sample(doc_id, i) for i in range(WAV_N)]
    # an extra (odd-sized, word-padded) chunk before data must be walked over
    wav = encode_wav(13)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"
    patched = bytearray(wav[:fmt_end] + extra + wav[fmt_end:])
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    rate, samples = decode_wav(bytes(patched))
    assert rate == WAV_RATE
    assert samples == [_wav_sample(13, i) for i in range(WAV_N)]


def test_strict_decoder_features_match_generating_functions():
    f = strict_decoder(encode_bmp(10))
    n = BMP_W * BMP_H
    assert f[0] == KIND_BMP and f[1:3] == [float(BMP_W), float(BMP_H)]
    assert f[3] == sum(_bmp_rgb(10, i)[0] for i in range(n)) / n
    g = strict_decoder(encode_wav(11))
    s = [_wav_sample(11, i) for i in range(WAV_N)]
    assert g[0] == KIND_WAV and g[1] == float(WAV_RATE) and g[2] == float(WAV_N)
    assert g[3] == sum(s) / len(s)
    assert g[4] == float(max(abs(x) for x in s))


def test_strict_decoder_raises_only_for_compressed_or_unknown():
    with pytest.raises(NotImplementedError):
        strict_decoder(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # JPEG SOI
    with pytest.raises(NotImplementedError):
        strict_decoder(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    # valid BMP container but 8bpp palette — a real gap, must say so
    payload = bytearray(encode_bmp(1 + 1))
    struct.pack_into("<H", payload, 28, 8)
    with pytest.raises(NotImplementedError):
        strict_decoder(bytes(payload))
    with pytest.raises(ValueError):
        decode_bmp(b"XX not a bmp at all, nowhere near")


def test_spark_decode_chain_matches_pure_python(spark):
    docs = spark.range(0, 42).select(F.col("id").alias("doc_id"))
    feats = extract_media_features(synthetic_media(docs), decoder=strict_decoder)
    got = {r["doc_id"]: r for r in feats.collect()}
    assert len(got) == 42
    enc = {0: encode_bmp, 1: encode_wav, 2: encode_frames}
    typ = {0: "image/bmp", 1: "audio/wav", 2: "video/x-raw-frames"}
    for d in range(42):
        raw = enc[d % 3](d)
        assert got[d]["n_bytes"] == len(raw)
        assert got[d]["features"] == strict_decoder(raw)
        assert got[d]["media_type"] == typ[d % 3]


def test_on_error_drop_skips_undecodable_rows(spark):
    rows = [
        (1, encode_bmp(4), "image/bmp"),
        (2, b"\xff\xd8\xff\xe0 fake jpeg", "image/jpeg"),
        (3, encode_wav(5), "audio/wav"),
        (4, None, "image/bmp"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary, media_type string")
    out = extract_media_features(media, decoder=strict_decoder, on_error="drop")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    # default surfaces the failure instead of silently shrinking
    with pytest.raises(Exception, match="NotImplementedError|compressed"):
        extract_media_features(media, decoder=strict_decoder).collect()


def test_on_error_drop_survives_truncated_and_zero_frame_payloads(spark):
    """ADVICE r5: struct.error (truncated payload mid-unpack) is NOT a
    ValueError subclass, and a zero-frame raw-frames container used to
    hit ZeroDivisionError — both must follow the 'drop' path, not kill
    the job."""
    truncated_wav = encode_wav(5)[:20]  # RIFF/WAVE magic intact, fmt cut
    zero_frames = FRAMES_MAGIC + struct.pack("<I", 0)
    truncated_frames = encode_frames(2)[:10]  # magic + count + partial BM
    rows = [
        (1, encode_bmp(4), "image/bmp"),
        (2, truncated_wav, "audio/wav"),
        (3, zero_frames, "video/x-raw-frames"),
        (4, truncated_frames, "video/x-raw-frames"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary, media_type string")
    out = extract_media_features(media, decoder=strict_decoder, on_error="drop")
    assert sorted(r["doc_id"] for r in out.collect()) == [1]
    # resize's drop path takes the same failure tuple: a truncated BMP
    # (magic intact, header cut) must drop, good rows must survive
    bad_bmp = encode_bmp(7)[:30]
    media2 = spark.createDataFrame(
        [(1, encode_bmp(4), "image/bmp"), (2, bad_bmp, "image/bmp")],
        "doc_id long, media binary, media_type string",
    )
    resized = resize_media(media2, 2, 2, on_error="drop")
    assert sorted(r["doc_id"] for r in resized.collect()) == [1]


def test_header_features_fallback_unchanged():
    assert header_features(bytes(range(8))) == [b / 255.0 for b in range(8)]
    assert header_features(b"\x05") == [5 / 255.0] + [0.0] * 7


def test_synthetic_media_empty_and_single_row(spark):
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "doc_id long")
    assert extract_media_features(synthetic_media(empty), decoder=strict_decoder).count() == 0
    one = spark.createDataFrame([(42,)], "doc_id long")
    rows = extract_media_features(synthetic_media(one), decoder=strict_decoder).collect()
    assert len(rows) == 1 and rows[0]["features"] == strict_decoder(encode_bmp(42))


def test_video_frames_round_trip_and_temporal_sampling():
    for doc_id in (2, 8, 1001):
        frames = decode_frames(encode_frames(doc_id))
        assert len(frames) == VIDEO_N_FRAMES
        for f, (w, h, px) in enumerate(frames):
            assert (w, h) == (BMP_W, BMP_H)
            assert px == [_bmp_rgb(_frame_seed(doc_id, f), i) for i in range(BMP_W * BMP_H)]
        feats = strict_decoder(encode_frames(doc_id))
        assert feats[0] == KIND_VIDEO
        assert feats[1] == float(VIDEO_N_FRAMES)
        assert feats[2] == float(len(range(0, VIDEO_N_FRAMES, FRAME_SAMPLE_EVERY)))
        # features derive ONLY from the sampled frames
        sampled = [
            _bmp_rgb(_frame_seed(doc_id, f), i)
            for f in range(0, VIDEO_N_FRAMES, FRAME_SAMPLE_EVERY)
            for i in range(BMP_W * BMP_H)
        ]
        assert feats[3] == sum(p[0] for p in sampled) / len(sampled)
    with pytest.raises(ValueError):
        decode_frames(b"FRS0" + b"\x01\x00\x00\x00" + b"XX definitely not a frame here")


def test_resize_media_chain(spark):
    """resize_media: BMPs resize via nearest-neighbor and re-encode as
    valid BMPs (decode_bmp round-trips them at the new geometry); WAV
    payloads pass through byte-identical; the resized chain feeds
    extract_media_features unchanged."""
    from dynamic_etl_spark.ops.multimodal import resize_media, resize_nearest

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    resized = resize_media(synthetic_media(docs), new_w=6, new_h=4)
    got = {r["doc_id"]: r for r in resized.collect()}
    assert len(got) == 12
    for d in range(12):
        if d % 3 == 0:  # image: resized
            w, h, px = decode_bmp(bytes(got[d]["media"]))
            assert (w, h) == (6, 4)
            src = [_bmp_rgb(d, i) for i in range(BMP_W * BMP_H)]
            assert px == resize_nearest(src, BMP_W, BMP_H, 6, 4)
        elif d % 3 == 1:  # audio: pass-through
            assert bytes(got[d]["media"]) == encode_wav(d)
    feats = extract_media_features(resized, decoder=strict_decoder)
    for r in feats.collect():
        if r["media_type"] == "image/bmp":
            assert r["features"][1:3] == [6.0, 4.0]


def test_resize_nearest_reference_cases():
    from dynamic_etl_spark.ops.multimodal import resize_nearest

    # 2x1 -> 4x2: each source pixel replicates into a 2x2 block
    px = [(1, 2, 3), (4, 5, 6)]
    out = resize_nearest(px, 2, 1, 4, 2)
    assert out == [px[0], px[0], px[1], px[1]] * 2
    # downscale 4x2 -> 2x1 picks the top-left of each block
    big = [(i, i, i) for i in range(8)]
    assert resize_nearest(big, 4, 2, 2, 1) == [(0, 0, 0), (2, 2, 2)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resize_nearest(px, 2, 1, 0, 2)


def test_strict_decoder_numpy_path_equals_python_sums():
    """VERDICT r6 #4: the numpy inner loops must be bit-identical to the
    Python-int sums they replaced — uint8/int16 sums accumulated in
    int64 are exact, so the single IEEE divide sees the same integers.
    Pinned per media kind on the existing fixtures."""
    for doc_id in (0, 7, 254, 99991):
        w, h, px = decode_bmp(encode_bmp(doc_id))
        n = float(len(px))
        expect = [
            KIND_BMP, float(w), float(h),
            sum(p[0] for p in px) / n,
            sum(p[1] for p in px) / n,
            sum(p[2] for p in px) / n,
        ]
        assert strict_decoder(encode_bmp(doc_id)) == expect
    for doc_id in (1, 13, 2001):
        rate, samples = decode_wav(encode_wav(doc_id))
        n = float(len(samples))
        expect = [
            KIND_WAV, float(rate), n,
            sum(samples) / n,
            float(max(abs(s) for s in samples)),
            0.0,
        ]
        assert strict_decoder(encode_wav(doc_id)) == expect
    for doc_id in (2, 8, 1001):
        frames = decode_frames(encode_frames(doc_id))
        sampled = frames[::FRAME_SAMPLE_EVERY]
        px = [p for _, _, pixels in sampled for p in pixels]
        n = float(len(px))
        expect = [
            KIND_VIDEO, float(len(frames)), float(len(sampled)),
            sum(p[0] for p in px) / n,
            sum(p[1] for p in px) / n,
            sum(p[2] for p in px) / n,
        ]
        assert strict_decoder(encode_frames(doc_id)) == expect


def test_array_resize_and_serialize_twins_are_byte_identical():
    """r7 self-review follow-up: the array-native resize/serialize twins
    the resize TRANSFORM hot path now uses must be byte-identical to the
    tuple-list reference implementations, including non-square geometry
    and rows needing 4-byte padding."""
    from dynamic_etl_spark.ops.multimodal import (
        decode_bmp_array,
        resize_nearest,
        resize_nearest_array,
        serialize_bmp,
        serialize_bmp_array,
    )

    for doc_id in (0, 7, 254):
        payload = encode_bmp(doc_id)
        w, h, px = decode_bmp(payload)
        _, _, arr = decode_bmp_array(payload)
        assert serialize_bmp_array(arr, w, h) == serialize_bmp(px, w, h) == payload
        for new_w, new_h in ((6, 4), (1, 1), (5, 3), (7, 2)):
            ref = serialize_bmp(resize_nearest(px, w, h, new_w, new_h), new_w, new_h)
            fast = serialize_bmp_array(
                resize_nearest_array(arr, w, h, new_w, new_h), new_w, new_h
            )
            assert fast == ref, (doc_id, new_w, new_h)
