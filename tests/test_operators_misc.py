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
