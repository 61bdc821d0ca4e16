"""BM25 search, incremental dedup, random projection, shard export."""

from __future__ import annotations

import glob
import math
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.text import bm25_topk
from kubernetes_logs_datalake_spark.operators.dedup import dedup_incremental
from kubernetes_logs_datalake_spark.operators.layout import (
    export_training_shards,
)
from kubernetes_logs_datalake_spark.operators.vectors import random_project


def test_bm25_ranks_relevance(spark):
    d = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),       # high tf for 'spark'
            (2, "spark engine cluster compute"),   # one mention
            (3, "cats and dogs at the park"),      # no match
            (4, "engine engine engine engine engine engine"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(d, "doc_id", "text", ["spark"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1 and 2 in ids and 3 not in ids and 4 not in ids
    assert out[0].score > out[1].score > 0


def test_bm25_idf_downweights_common_terms(spark):
    """A term in every doc scores below a rare term at equal tf."""
    d = spark.createDataFrame(
        [(i, "common text here") for i in range(1, 9)]
        + [(9, "common rare text")],
        "doc_id long, text string",
    )
    rare = {r.doc_id: r.score for r in
            bm25_topk(d, "doc_id", "text", ["rare"], k=10).collect()}
    common = {r.doc_id: r.score for r in
              bm25_topk(d, "doc_id", "text", ["common"], k=10).collect()}
    assert rare[9] > common[9]


def test_dedup_incremental_flags(spark):
    corpus = spark.createDataFrame(
        [(1, "existing document one"), (2, "existing document two")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "existing document one"),   # dup of corpus
            (11, "brand new content"),       # novel
            (12, "brand new content"),       # dup within batch
            (13, "Existing Document Two"),   # dup of corpus (normalized)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           dedup_incremental(new, corpus, "doc_id", "text").collect()}
    assert out[10].dup_of_corpus and not out[10].novel
    assert out[11].novel and not out[11].dup_of_corpus
    assert out[12].dup_in_batch and not out[12].novel
    assert out[13].dup_of_corpus, "normalization must fold case"
    assert sum(r.novel for r in out.values()) == 1


def test_random_project_preserves_rough_geometry(spark):
    """JL projection: projected norms stay within a loose factor for
    most vectors, and the operator is deterministic."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(100)
    p1 = random_project(emb, "vec_id", "embedding", out_dim=16, dim=64)
    rows = p1.collect()
    assert all(len(r.proj) == 16 for r in rows)
    again = {r.vec_id: r.proj for r in
             random_project(emb, "vec_id", "embedding", 16, 64).collect()}
    assert all(again[r.vec_id] == r.proj for r in rows)
    # rough norm preservation (E[|Px|^2] = out_dim/dim * |x|^2 for unit
    # rows): check the ratio is within a wide sanity band on average
    orig = {r.vec_id: r.n for r in emb.select(
        "vec_id",
        F.sqrt(F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0), lambda a, x: a + x)).alias("n"),
    ).collect()}
    ratios = [
        math.sqrt(sum(v * v for v in r.proj)) / orig[r.vec_id]
        for r in rows if orig[r.vec_id] > 0
    ]
    mean_ratio = sum(ratios) / len(ratios)
    expect = math.sqrt(16 / 64)
    assert 0.5 * expect < mean_ratio < 2.0 * expect


def test_export_training_shards_deterministic(spark, tmp_path):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    export_training_shards(d, "doc_id", out, n_shards=4)
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{out}/shard=*"))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    assert back.select("doc_id").distinct().count() == d.count()
    # intra-shard order is the md5 pseudo-shuffle, byte-stable across
    # re-exports: re-export and compare the raw row order of one shard
    out2 = str(tmp_path / "shards2")
    export_training_shards(d.repartition(13), "doc_id", out2, n_shards=4)
    for s in range(4):
        f1 = sorted(glob.glob(f"{out}/shard={s}/*.parquet"))
        f2 = sorted(glob.glob(f"{out2}/shard={s}/*.parquet"))
        ids1 = [i for f in f1 for i in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()]
        ids2 = [i for f in f2 for i in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()]
        assert ids1 == ids2 and len(ids1) > 0


def test_corpus_diff_statuses(spark):
    from kubernetes_logs_datalake_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "SAME   text"), (2, "has changed"), (4, "fresh doc")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in
           corpus_diff(old, new, "doc_id", "text").collect()}
    assert out == {
        1: "unchanged",   # case/whitespace normalizes away
        2: "modified",
        3: "removed",
        4: "added",
    }


def _avi_rgb24(w, h, frames):
    """Minimal uncompressed RGB24 AVI: frames = list of h*w lists of
    (r, g, b) rows top-down."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    payloads = []
    for fr in frames:
        rows = []
        for y in range(h - 1, -1, -1):          # bottom-up
            row = bytearray()
            for x in range(w):
                r, g, b = fr[y][x]
                row += bytes((b, g, r))          # BGR
            row += b"\0" * (stride - len(row))
            rows.append(bytes(row))
        payloads.append(b"".join(rows))

    def chunk(cid, body):
        pad = b"\0" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    bih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    strh = chunk(b"strh", b"vids" + b"DIB " + b"\0" * 48)
    strl = lst(b"strl", strh + chunk(b"strf", bih))
    avih = chunk(b"avih", struct.pack("<14I", 40000, 0, 0, 0, len(frames),
                                      0, 1, 0, w, h, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sample_frames_real_avi_decode(spark):
    from kubernetes_logs_datalake_spark.operators.multimodal import (
        sample_frames,
    )

    white = [[(255, 255, 255)] * 2] * 2
    black = [[(0, 0, 0)] * 2] * 2
    avi = _avi_rgb24(2, 2, [white, black, white, black])
    df = spark.createDataFrame(
        [(1, avi), (2, b"not a video")], "media_id long, payload binary"
    )
    out = sample_frames(df, every_n=2).collect()
    mine = sorted(
        (r.frame_idx for r in out if r.media_id == 1)
    )
    assert mine == [0, 2], "every_n=2 samples frames 0 and 2"
    for r in out:
        if r.media_id == 1:
            assert r.decoded_ok and (r.width, r.height) == (2, 2)
            assert all(abs(v - 1.0) < 1e-6 for v in r.feature), \
                "white frames pool to 1.0 luminance"
    fallback = [r for r in out if r.media_id == 2]
    assert len(fallback) == 1 and not fallback[0].decoded_ok


def test_sample_frames_rejects_compressed(spark):
    """A non-RGB24 strf falls back to the digest fake, schema intact."""
    import struct

    from kubernetes_logs_datalake_spark.operators.multimodal import (
        _decode_avi,
    )

    import pytest

    good = _avi_rgb24(2, 2, [[[(9, 9, 9)] * 2] * 2])
    w, h, grays = _decode_avi(good)
    assert (w, h, len(grays)) == (2, 2, 1)
    assert grays[0] == bytes([9, 9, 9, 9])
    bad = good.replace(
        struct.pack("<HHI", 1, 24, 0), struct.pack("<HHI", 1, 24, 1), 1
    )
    with pytest.raises(ValueError):
        _decode_avi(bad)
