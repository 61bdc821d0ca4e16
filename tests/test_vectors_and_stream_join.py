"""Semantic tests for label_centroids and stream_interval_join."""

from __future__ import annotations


def test_label_centroids_exact(spark):
    """Element-wise means, one centroid row per label."""
    from kubernetes_logs_datalake_spark.operators.vectors import label_centroids

    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [3.0, 4.0, 5.0]),
        ("b", [10.0, 0.0, -2.0]),
    ]
    df = spark.createDataFrame(rows, "label string, vec array<float>")
    out = {r.label: r for r in label_centroids(df, "label", "vec").collect()}
    assert out["a"].n_vectors == 2 and out["b"].n_vectors == 1
    assert out["a"].centroid == [2.0, 3.0, 4.0]
    assert out["b"].centroid == [10.0, 0.0, -2.0]


def test_label_centroids_order_independent(spark):
    """The decimal-sum recipe makes the result identical however the
    rows are partitioned (float accumulation would not be)."""
    from kubernetes_logs_datalake_spark.operators.vectors import label_centroids

    rows = [("x", [float(i) / 7, float(i) * 0.3]) for i in range(100)]
    df1 = spark.createDataFrame(rows, "label string, vec array<float>")
    df2 = spark.createDataFrame(list(reversed(rows)), "label string, vec array<float>").repartition(7)
    c1 = label_centroids(df1, "label", "vec").collect()[0]
    c2 = label_centroids(df2, "label", "vec").collect()[0]
    assert c1.centroid == c2.centroid


def test_label_centroids_distributed_plan(spark):
    """The summation shuffle is keyed on (label, pos) — no stage may
    collect a whole vector group to one task (no unpartitioned window,
    no cartesian)."""
    from kubernetes_logs_datalake_spark.operators.vectors import label_centroids

    df = spark.createDataFrame(
        [("a", [1.0, 2.0])], "label string, vec array<float>"
    )
    plan = (
        label_centroids(df, "label", "vec")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_stream_interval_join_batch_semantics(spark):
    """[t, t+horizon) pairing on the batch path: only right rows inside
    the window join; the boundary at t+horizon is exclusive."""
    from kubernetes_logs_datalake_spark.streaming.analytics import (
        stream_interval_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-15 10:00:00"), (2, "2024-01-15 11:00:00")],
        "k long, time string",
    )
    right = spark.createDataFrame(
        [
            (1, "2024-01-15 10:04:00", "in"),
            (1, "2024-01-15 10:10:00", "boundary"),
            (1, "2024-01-15 09:59:59", "before"),
            (2, "2024-01-15 11:09:59", "in2"),
            (3, "2024-01-15 10:00:00", "otherkey"),
        ],
        "k long, rtime string, tag string",
    )
    got = sorted(
        r.tag
        for r in stream_interval_join(
            left, right, "k", horizon="10 minutes"
        ).collect()
    )
    assert got == ["in", "in2"]


def test_stream_interval_join_stream_matches_batch(spark, tmp_path):
    """The same join over two file streams (append mode, watermarked)
    emits exactly the batch result set."""
    import json

    from kubernetes_logs_datalake_spark.streaming.analytics import (
        stream_interval_join,
    )

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    lrows = [{"k": i % 3, "time": f"2024-01-15 10:{i:02d}:00"} for i in range(10)]
    rrows = [
        {"k": i % 3, "rtime": f"2024-01-15 10:{i:02d}:30", "v": i}
        for i in range(10)
    ]
    (ldir / "l.json").write_text("\n".join(json.dumps(r) for r in lrows))
    (rdir / "r.json").write_text("\n".join(json.dumps(r) for r in rrows))
    lschema, rschema = "k long, time string", "k long, rtime string, v long"

    batch = stream_interval_join(
        spark.read.schema(lschema).json(str(ldir)),
        spark.read.schema(rschema).json(str(rdir)),
        "k",
        horizon="3 minutes",
    )
    expect = {(r.k, str(r.time), r.v) for r in batch.collect()}
    assert expect  # non-trivial fixture

    q = (
        stream_interval_join(
            spark.readStream.schema(lschema).json(str(ldir)),
            spark.readStream.schema(rschema).json(str(rdir)),
            "k",
            horizon="3 minutes",
        )
        .writeStream.format("memory")
        .queryName("sij")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.k, str(r.time), r.v)
            for r in spark.sql("SELECT * FROM sij").collect()
        }
        assert got == expect
    finally:
        q.stop()
