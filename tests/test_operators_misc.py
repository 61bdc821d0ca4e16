"""Tests: multimodal plumbing, JSON-lines ingest, salted join,
streaming windowed analytics, long-line guard, dedup operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
)
from kubernetes_logs_datalake_spark.operators.skew import salted_join
from kubernetes_logs_datalake_spark.sources.cri import parse_cri_lines
from kubernetes_logs_datalake_spark.sources.json_logs import parse_json_log_lines


def test_multimodal_feature_extraction(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes", ("image/png", 640, 480, None)),
        (2, "audio", b"RIFF-fake", ("audio/wav", None, None, 2000)),
        (3, "image", None, ("image/png", 1, 1, None)),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>"
    )
    feats = extract_features(df).collect()
    assert len(feats) == 3
    by_id = {r.media_id: r for r in feats}
    assert len(by_id[1].feature) == FEATURE_DIM
    # undecodable payloads take the deterministic fake with decoded_ok=false
    assert not any(r.decoded_ok for r in feats)
    # deterministic: same payload → same features
    feats2 = extract_features(df).collect()
    assert {r.media_id: r.feature for r in feats2} == {r.media_id: r.feature for r in feats}


def _pgm(width: int, height: int, pixels: bytes) -> bytes:
    return b"P5\n# test\n%d %d\n255\n" % (width, height) + pixels


def test_multimodal_real_pixel_decode(spark):
    """The netpbm decode path produces features from REAL pixels: a
    half-black/half-white PGM must pool to 0s on the left cells and 1s
    on the right cells."""
    from kubernetes_logs_datalake_spark.operators.multimodal import (
        decode_image,
        image_features,
    )

    w = h = 8
    rows = bytes([0] * 4 + [255] * 4) * h
    payload = _pgm(w, h, rows)
    dw, dh, gray = decode_image(payload)
    assert (dw, dh) == (8, 8) and gray == rows
    feat = image_features(dw, dh, gray)
    assert feat[0::4] == [0.0] * 4 and feat[1::4] == [0.0] * 4
    assert feat[2::4] == [1.0] * 4 and feat[3::4] == [1.0] * 4

    df = spark.createDataFrame(
        [(1, "image", payload, ("image/x-portable-graymap", w, h, None))],
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    rows_out = extract_features(df).collect()
    assert rows_out[0].decoded_ok
    assert [round(v, 6) for v in rows_out[0].feature] == [round(v, 6) for v in feat]


def test_multimodal_resize(spark):
    """Box-filter resize: an 8x8 half-black/half-white image downscales
    to a 2x2 thumbnail with exact block means; undecodable payloads get
    null thumbnails."""
    from kubernetes_logs_datalake_spark.operators.multimodal import (
        resize_gray,
        resize_images,
    )

    w = h = 8
    rows = bytes([0] * 4 + [255] * 4) * h
    assert list(resize_gray(w, h, rows, 2, 2)) == [0, 255, 0, 255]

    df = spark.createDataFrame(
        [(1, _pgm(w, h, rows)), (2, b"not-an-image")],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in resize_images(df, 2, 2).collect()}
    assert list(out[1].thumb) == [0, 255, 0, 255]
    assert (out[1].thumb_w, out[1].thumb_h) == (2, 2)
    assert out[2].thumb is None and out[2].thumb_w is None


def test_multimodal_ppm_luminance(spark):
    """P6 (RGB) decodes via integer Rec.601 luminance."""
    from kubernetes_logs_datalake_spark.operators.multimodal import decode_image

    # one red, one green, one blue, one white pixel
    body = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    payload = b"P6\n4 1\n255\n" + body
    w, h, gray = decode_image(payload)
    assert (w, h) == (4, 1)
    assert list(gray) == [76, 149, 29, 255]  # 299/587/114 per mille


def test_pnm_comments_and_low_maxval():
    """Spec conformance (ADVICE r2): comments are legal between any
    header tokens, and maxval<255 samples are rescaled so white stays
    white."""
    from kubernetes_logs_datalake_spark.operators.multimodal import decode_image

    payload = b"P5\n# a\n2 # b\n2\n# c\n15\n" + bytes([0, 15, 15, 0])
    w, h, gray = decode_image(payload)
    assert (w, h) == (2, 2)
    assert list(gray) == [0, 255, 255, 0]
    # 16-bit samples still rejected
    with pytest.raises(ValueError):
        decode_image(b"P5\n2 2\n65535\n" + bytes(8))


def test_small_image_block_clamp():
    """Images smaller than the pooling grid repeat the nearest block
    instead of producing spurious black cells (ADVICE r2)."""
    from kubernetes_logs_datalake_spark.operators.multimodal import (
        image_features,
        resize_gray,
    )

    # 2x2 all-white: every pooled cell must be 1.0, none 0.0
    feat = image_features(2, 2, bytes([255] * 4))
    assert feat == [1.0] * 16
    # 1x1 upscale to 4x4 repeats the single pixel
    assert list(resize_gray(1, 1, bytes([200]), 4, 4)) == [200] * 16


# ---- stdlib PNG decode fixtures: a minimal in-test encoder so every
# ---- scanline filter type (0-4) is exercised against known pixels


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _make_png(width, height, raw: bytes, color_type, row_filters) -> bytes:
    """Encode raw (height*width*channels) bytes as a PNG, forward-
    filtering each row with the given filter type (spec §9)."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp, stride = channels, width * channels
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        f = row_filters[y % len(row_filters)]
        out.append(f)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                q = a + b - c
                qa, qb, qc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (qa <= qb and qa <= qc) else (b if qb <= qc else c)
            out.append((row[x] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_gray_decode_all_filters(spark):
    """8x8 grayscale PNG, rows cycling through every filter type, must
    reconstruct the exact source pixels and flow through
    extract_features with decoded_ok=true."""
    from kubernetes_logs_datalake_spark.operators.multimodal import (
        decode_image,
        image_features,
    )

    w = h = 8
    raw = bytes([0] * 4 + [255] * 4) * h  # half-black / half-white
    payload = _make_png(w, h, raw, color_type=0, row_filters=[0, 1, 2, 3, 4])
    dw, dh, gray = decode_image(payload)
    assert (dw, dh) == (w, h) and gray == raw

    df = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    out = extract_features(df).collect()[0]
    assert out.decoded_ok
    feat = image_features(w, h, raw)
    assert [round(v, 6) for v in out.feature] == [round(v, 6) for v in feat]


def test_png_rgb_and_rgba_luminance():
    """Color PNGs decode via the same integer Rec.601 kernel as P6;
    alpha is ignored."""
    from kubernetes_logs_datalake_spark.operators.multimodal import decode_image

    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    w, h, gray = decode_image(_make_png(4, 1, rgb, 2, [0, 1, 4]))
    assert (w, h) == (4, 1) and list(gray) == [76, 149, 29, 255]

    rgba = bytes([255, 0, 0, 7, 0, 255, 0, 7])
    _, _, gray = decode_image(_make_png(2, 1, rgba, 6, [4]))
    assert list(gray) == [76, 149]

    # gray+alpha takes the gray channel
    ga = bytes([10, 255, 200, 0])
    _, _, gray = decode_image(_make_png(2, 1, ga, 4, [2]))
    assert list(gray) == [10, 200]


def test_png_unsupported_subtypes_fall_to_fake(spark):
    """Palette PNGs (no stdlib path, no PIL here) raise ValueError from
    decode and take the digest fake with decoded_ok=false in the
    pipeline, keeping the schema stable."""
    import struct

    from kubernetes_logs_datalake_spark.operators.multimodal import decode_image

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # color type 3
    payload = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    try:
        from PIL import Image  # noqa: F401

        pytest.skip("PIL installed: palette PNGs decode for real")
    except ImportError:
        pass
    with pytest.raises(ValueError, match="color type"):
        decode_image(payload)
    df = spark.createDataFrame([(9, payload)], "media_id long, payload binary")
    out = extract_features(df).collect()[0]
    assert not out.decoded_ok and len(out.feature) == FEATURE_DIM


def _wav_bytes(samples, rate=8000, nch=1, width=2) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
        else:
            w.writeframes(bytes(samples))
    return buf.getvalue()


def test_wav_decode_and_audio_features(spark):
    """Real stdlib WAV decode: duration, RMS, and segment features from
    actual samples; non-WAV payloads fall back with null duration."""
    import math

    from kubernetes_logs_datalake_spark.operators.multimodal import (
        audio_features,
        decode_wav,
    )

    # 0.5 s of a full-scale square wave at 8 kHz: RMS is exactly 1.0
    n, rate = 4000, 8000
    sq = [32767 if i % 2 == 0 else -32767 for i in range(n)]
    payload = _wav_bytes(sq, rate=rate)
    r, samples = decode_wav(payload)
    assert r == rate and len(samples) == n

    df = spark.createDataFrame(
        [(1, payload), (2, b"not audio"), (3, None)],
        "media_id long, payload binary",
    )
    out = {row.media_id: row for row in audio_features(df).collect()}
    assert out[1].decoded_ok
    assert out[1].duration_ms == 500
    assert math.isclose(out[1].rms, 32767 / 32768, rel_tol=1e-5)
    assert len(out[1].feature) == FEATURE_DIM
    assert all(math.isclose(v, out[1].rms, rel_tol=1e-4) for v in out[1].feature)
    for bad in (2, 3):
        assert not out[bad].decoded_ok
        assert out[bad].duration_ms is None and out[bad].rms is None
        assert len(out[bad].feature) == FEATURE_DIM


def test_wav_stereo_downmix_and_8bit():
    from kubernetes_logs_datalake_spark.operators.multimodal import decode_wav

    # stereo: L=+1000, R=-1000 → mono mean 0
    inter = []
    for _ in range(100):
        inter += [1000, -1000]
    _, samples = decode_wav(_wav_bytes(inter, rate=4000, nch=2))
    assert len(samples) == 100 and abs(samples).max() == 0.0

    # 8-bit unsigned: 128 is silence, 255 ≈ +1
    _, samples = decode_wav(_wav_bytes([128] * 10 + [255] * 10, rate=1000, width=1))
    assert samples[0] == 0.0 and samples[-1] > 0.99


def test_lsh_bucketed_pairs_empty_input_raises(spark):
    """Empty input without an explicit dim raises a clear ValueError
    (not a bare TypeError from the 1-row probe) — ADVICE r2."""
    from kubernetes_logs_datalake_spark.operators.similarity import lsh_bucketed_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        lsh_bucketed_pairs(empty, "vec_id", "embedding")
    # explicit dim: plan builds lazily and yields zero pairs
    assert lsh_bucketed_pairs(empty, "vec_id", "embedding", dim=4).count() == 0


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(7, "video", b"x", ("video/mp4", None, None, 3500))],
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    frames = frame_sample_plan(df, every_ms=1000).collect()
    assert [(r.frame_idx, r.frame_ts_ms) for r in frames] == [(0, 0), (1, 1000), (2, 2000)]


def test_json_log_lines(spark):
    lines = [
        '{"time":"2024-01-15T10:30:45.123456789Z","stream":"stdout","logtag":"F","message":"hello","cluster":"test"}',
        "not json at all",
    ]
    df = parse_json_log_lines(spark.createDataFrame([(s,) for s in lines], ["value"]))
    rows = df.collect()
    assert rows[0].time_ns == 1705314645123456789
    assert rows[0].stream == "stdout" and rows[0].cluster == "test"
    assert rows[1].time_ns is None and rows[1].message is None


def test_salted_join_matches_plain_join(spark):
    # hot key 1 dominates
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(10)], ["k", "v"]
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], ["k", "label"])
    plain = {(r.k, r.v, r.label) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.v, r.label) for r in salted_join(big, small, "k", salt=4).collect()}
    assert salted == plain


def test_salted_join_rejects_outer_how(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(df, df.select("k"), "k", how="full_outer")


def test_asof_tiebreak_deterministic(spark):
    """Two right rows at the same (key, ts): the one with the largest
    tiebreak must win, regardless of input partition order."""
    from kubernetes_logs_datalake_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 100)], ["k", "lts"])
    right = spark.createDataFrame(
        [(1, 50, 7), (1, 50, 9), (1, 50, 8)], ["k", "rts", "rid"]
    ).repartition(3)
    got = as_of_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        value_cols=["rid"], tiebreak="rid",
    ).collect()
    assert [r.rid_asof for r in got] == [9]


def test_range_join_ns_scale_bucketing(spark):
    """Regression (ADVICE r1): bucket ids must use exact long division.
    The old double route (`/` then cast) shifts a bucket id by one for
    ns-since-epoch values, and when the two sides' errors diverge the
    pair lands >1 bucket apart and is silently dropped despite being
    within max_delta."""
    from kubernetes_logs_datalake_spark.operators.rangejoin import range_join

    # constructed pair: 849_713 ns apart (< 1 ms) but the double route
    # puts them 2 buckets apart at max_delta=1_000_000
    ts_l, ts_r = 1669366385010150287, 1669366385011000000
    left = spark.createDataFrame([(1, ts_l)], ["k", "lts"])
    right = spark.createDataFrame([(1, ts_r)], ["k", "rts"])
    got = range_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     max_delta=1_000_000).collect()
    assert len(got) == 1


def test_windowed_counts_batch_and_stream_agree(spark, tmp_path):
    """The same windowed plan over batch input and over a file stream
    (complete mode) must produce identical finalized windows."""
    from kubernetes_logs_datalake_spark.streaming.analytics import windowed_counts

    data_dir = tmp_path / "in"
    data_dir.mkdir()
    lines = [
        f"2024-01-15T10:{30 + (i // 30):02d}:{i % 30:02d}.0Z stdout F m{i}" for i in range(90)
    ]
    (data_dir / "a.log").write_text("\n".join(lines) + "\n")

    def records_of(df):
        return parse_cri_lines(df.withColumn("path", F.input_file_name()),
                               path_col=None, cluster="dev")

    batch = records_of(spark.read.text(str(data_dir)))
    got_batch = {
        (str(r.window_start), r.n)
        for r in windowed_counts(batch, window="1 minute").collect()
    }
    assert got_batch == {
        ("2024-01-15 10:30:00", 30),
        ("2024-01-15 10:31:00", 30),
        ("2024-01-15 10:32:00", 30),
    }

    stream = records_of(spark.readStream.format("text").load(str(data_dir)))
    q = (
        windowed_counts(stream, window="1 minute", watermark_delay="1 minute")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got_stream = {
            (str(r.window_start), r.n) for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got_stream == got_batch
    finally:
        q.stop()


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-delivered (at-least-once) rows collapse to one per key in
    stream mode; batch mode gives the same answer via dropDuplicates."""
    from kubernetes_logs_datalake_spark.streaming.analytics import stream_dedup

    data_dir = tmp_path / "in"
    data_dir.mkdir()
    lines = [f"2024-01-15T10:30:{i % 10:02d}.0Z stdout F m{i % 5}" for i in range(20)]
    (data_dir / "a.log").write_text("\n".join(lines) + "\n")

    def records_of(df):
        return parse_cri_lines(df.withColumn("path", F.input_file_name()),
                               path_col=None, cluster="dev")

    batch = stream_dedup(records_of(spark.read.text(str(data_dir))), keys=["message"])
    got_batch = sorted(r.message for r in batch.collect())
    assert got_batch == [f"m{i}" for i in range(5)]

    stream = records_of(spark.readStream.format("text").load(str(data_dir)))
    q = (
        stream_dedup(stream, keys=["message"])
        .select("message")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got_stream = sorted(
            r.message for r in spark.sql("SELECT * FROM dedup_out").collect()
        )
        assert got_stream == got_batch
    finally:
        q.stop()


def test_long_line_guard(spark):
    lines = [
        ("p", "2024-01-15T10:30:45.0Z stdout F ok"),
        ("p", "2024-01-15T10:30:46.0Z stdout F " + "x" * 5000),
    ]
    df = spark.createDataFrame(lines, ["path", "value"])
    out = parse_cri_lines(df, cluster="c", max_line_bytes=1024)
    assert [r.message for r in out.collect()] == ["ok"]


def test_ivf_topk_recall(spark):
    """IVF probing half the cells must recover most of the exact top-k."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).first().embedding]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in brute_force_topk(rest, "embedding", q, k=10).collect()}
    approx = {
        r.vec_id
        for r in ivf_topk(rest, "embedding", q, k=10, n_centroids=8, n_probe=4).collect()
    }
    assert len(exact & approx) >= 5  # recall@10 ≥ 0.5 with 4/8 probes


def test_sessionized_counts_batch(spark):
    """Session windows: a >gap quiet period splits sessions."""
    from kubernetes_logs_datalake_spark.streaming.analytics import sessionized_counts

    lines = [
        ("p", "2024-01-15T10:30:00.0Z stdout F a"),
        ("p", "2024-01-15T10:30:05.0Z stdout F b"),
        ("p", "2024-01-15T10:31:00.0Z stdout F c"),  # 55s gap > 10s
    ]
    rec = parse_cri_lines(spark.createDataFrame(lines, ["path", "value"]), cluster="c")
    got = sorted(
        (str(r.session_start), r.n_events)
        for r in sessionized_counts(rec, gap="10 seconds").collect()
    )
    assert got == [("2024-01-15 10:30:00", 2), ("2024-01-15 10:31:00", 1)]


def test_streaming_sketch_counts_agree_with_batch(spark, tmp_path):
    """3-way agreement: the streaming CMS sketch (complete mode over a
    file stream), the same plan on the batch frame, and the batch
    operators.sketch.cms_sketch all produce identical counter tables —
    and point queries against the streamed sketch return exact counts."""
    from kubernetes_logs_datalake_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )
    from kubernetes_logs_datalake_spark.streaming.analytics import sketch_counts

    data_dir = tmp_path / "in"
    data_dir.mkdir()
    lines = [f"2024-01-15T10:30:{i % 10:02d}.0Z stdout F key{i % 7}" for i in range(70)]
    (data_dir / "a.log").write_text("\n".join(lines) + "\n")

    def records_of(df):
        return parse_cri_lines(df.withColumn("path", F.input_file_name()),
                               path_col=None, cluster="dev")

    batch_records = records_of(spark.read.text(str(data_dir)))
    want = {(r.j, r.bucket): r.cnt for r in
            sketch_counts(batch_records, "message", depth=3, width=256).collect()}
    also = {(r.j, r.bucket): r.cnt for r in
            cms_sketch(batch_records, "message", depth=3, width=256).collect()}
    assert want == also  # streaming plan == batch operator

    stream = records_of(spark.readStream.format("text").load(str(data_dir)))
    q = (
        sketch_counts(stream, "message", depth=3, width=256)
        .writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.j, r.bucket): r.cnt for r in
               spark.sql("SELECT * FROM cms_out").collect()}
        assert got == want
        # point-query the STREAMED sketch with the batch estimator
        probes = spark.createDataFrame([(f"key{i}",) for i in range(7)], "k string")
        est = {r.k: r.est for r in
               cms_estimate(probes, spark.table("cms_out"), "k", 3, 256).collect()}
        assert est == {f"key{i}": 10 for i in range(7)}
    finally:
        q.stop()
