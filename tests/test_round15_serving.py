"""r15 serving-surface additions, both sides of the index ops story:

- snapshot publish + pointer-flip (`ivf_sq8_index_publish` /
  `resolve_serving_index`): zero-refusal serving while the live index
  mutates — the sources/compact.py rename-publish idiom applied to
  the index artifact (marker-last copy order, atomic CURRENT flip,
  retention + partial-sweep);
- batched stored-index serve (`ivf_sq8_index_search_many`): one plan
  for a query FRAME, bit-identical per query to the single-query
  serve on both raw and rotated (OPQ) indexes, with the probed-cells
  cut still reaching the scan as static partition pruning.
"""

from __future__ import annotations

import json as js

import pytest
from pyspark.sql import functions as F

from test_round14_ops import (  # reuse the r14 index harness
    _build_pair,
    _serve,
    small_embed_corpus,  # noqa: F401 — fixture re-export
)


# --------------------------------------------- publish / pointer flip


def test_publish_resolve_serves_bit_identically(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_publish, resolve_serving_index,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "pub"
    )
    serve_root = str(tmp_path / "serving")
    res = ivf_sq8_index_publish(spark, a, serve_root)
    assert res["snapshot"] == "snap-1" and res["pruned"] == []
    snap = resolve_serving_index(spark, serve_root)
    assert _serve(spark, snap, query) == _serve(spark, a, query)


def test_published_snapshot_is_immune_to_live_mutations_and_torn_state(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    """The zero-refusal contract: while the LIVE index is mid-mutation
    (torn — serving from it refuses), the published snapshot keeps
    serving the pre-mutation state; publishing FROM a torn index
    refuses; after repair + re-publish the pointer flips and the
    previous snapshot is retained for in-flight readers."""
    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_publish,
        ivf_sq8_index_repair, ivf_sq8_index_search,
        resolve_serving_index,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "pubmut"
    )
    serve_root = str(tmp_path / "serving")
    ivf_sq8_index_publish(spark, a, serve_root)
    before = _serve(spark, resolve_serving_index(spark, serve_root), query)

    # tear the live index open (mid-mutation state)
    fs = vmod._index_fs(spark, a)
    cfg = js.loads(fs.read_small(f"{a}/manifest.json"))
    vmod._invalidate_manifest(
        fs, f"{a}/manifest.json", cfg, op="append", touched=[0]
    )
    with pytest.raises(FileNotFoundError, match="TORN"):
        ivf_sq8_index_search(spark, a, query, topk=7)
    with pytest.raises(FileNotFoundError, match="TORN"):
        ivf_sq8_index_publish(spark, a, serve_root)
    # the snapshot serves on, bit-identically
    assert _serve(
        spark, resolve_serving_index(spark, serve_root), query
    ) == before

    # repair, mutate, re-publish: pointer flips, old snap retained
    ivf_sq8_index_repair(spark, a)
    ivf_sq8_index_append(batch, a, skip_existing_ids=True)
    res = ivf_sq8_index_publish(spark, a, serve_root)
    assert res["snapshot"] == "snap-2"
    snap2 = resolve_serving_index(spark, serve_root)
    assert snap2.endswith("snap-2")
    assert _serve(spark, snap2, query) == _serve(spark, a, query)
    sfs = vmod._index_fs(spark, serve_root)
    assert sfs.exists(f"{serve_root}/snapshots/snap-1/manifest.json")

    # a third publish prunes snap-1 (keep_snapshots=2)
    res3 = ivf_sq8_index_publish(spark, a, serve_root)
    assert res3["snapshot"] == "snap-3" and "snap-1" in res3["pruned"]
    assert not sfs.exists(f"{serve_root}/snapshots/snap-1")
    assert sfs.exists(f"{serve_root}/snapshots/snap-2/manifest.json")


def test_publish_crash_before_marker_leaves_readers_on_old_snapshot(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    """Kill the publish during the manifest (marker) copy — the LAST
    copy: CURRENT still names the old snapshot, readers are
    unaffected, and the next publish sweeps the manifest-less partial
    and completes."""
    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_publish, resolve_serving_index,
    )
    from kubernetes_logs_datalake_spark.sources import compact as cmod

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "pubcrash"
    )
    serve_root = str(tmp_path / "serving")
    ivf_sq8_index_publish(spark, a, serve_root)
    before = _serve(spark, resolve_serving_index(spark, serve_root), query)

    real = cmod._Fs.copy

    def crashing_copy(self, src, dst):
        if src.endswith("manifest.json"):
            raise RuntimeError("simulated crash during marker copy")
        return real(self, src, dst)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(cmod._Fs, "copy", crashing_copy)
        with pytest.raises(RuntimeError, match="simulated crash"):
            ivf_sq8_index_publish(spark, a, serve_root)

    # readers: old snapshot, unchanged
    cur = resolve_serving_index(spark, serve_root)
    assert cur.endswith("snap-1")
    assert _serve(spark, cur, query) == before
    # the partial (manifest-less) snap-2 exists but is never resolved
    sfs = vmod._index_fs(spark, serve_root)
    assert sfs.exists(f"{serve_root}/snapshots/snap-2")
    assert not sfs.exists(f"{serve_root}/snapshots/snap-2/manifest.json")

    # next publish sweeps it and lands snap-3 as CURRENT
    res = ivf_sq8_index_publish(spark, a, serve_root)
    assert res["snapshot"] == "snap-3" and "snap-2" in res["pruned"]
    assert resolve_serving_index(spark, serve_root).endswith("snap-3")


def test_resolve_without_publish_raises(spark, tmp_path):
    from kubernetes_logs_datalake_spark.operators.vectors import (
        resolve_serving_index,
    )

    with pytest.raises(FileNotFoundError, match="CURRENT"):
        resolve_serving_index(spark, str(tmp_path / "empty_root"))


# --------------------------------------------------- batched serving


def _loop_serve(spark, idx, queries, topk, n_probe):
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_search,
    )

    out = []
    for qid, qv in queries:
        for r in ivf_sq8_index_search(
            spark, idx, qv, topk=topk, n_probe=n_probe
        ).collect():
            out.append((qid, r[0], r[1]))
    return sorted(out)


@pytest.mark.parametrize("n_probe", [1, 3])
def test_search_many_matches_per_query_loop(
    spark, small_embed_corpus, tmp_path, n_probe  # noqa: F811
):
    """Batched == per-query loop, bit-for-bit: same probes (same
    (d2, index) tie-break), same decode+dot op sequence, same
    rounding, same (score desc, id) top-k order."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_search_many,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, f"many{n_probe}"
    )
    rows = batch.limit(5).collect()
    queries = [(int(r["vec_id"]), [float(v) for v in r["embedding"]])
               for r in rows]
    qdf = spark.createDataFrame(
        queries, "query_id long, embedding array<double>"
    )
    got = sorted(
        (int(r["query_id"]), int(r["vec_id"]), float(r["score"]))
        for r in ivf_sq8_index_search_many(
            spark, a, qdf, topk=7, n_probe=n_probe
        ).collect()
    )
    assert got == _loop_serve(spark, a, queries, 7, n_probe)


def test_search_many_rotated_index_bit_parity_and_plan_gate(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    """On an OPQ (rotated) index the batched path rotates queries with
    the IN-PLAN sequential HOF fold — bit-identical to the single
    query path's driver-side matvec (the GEMM would drift low bits).
    Also pins the scale story: the probed-clusters cut reaches the
    cells scan as STATIC partition pruning."""
    from pyspark.sql import functions as F  # noqa: F401

    from kubernetes_logs_datalake_spark.operators.rotation import (
        random_rotation,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, ivf_sq8_index_search_many, kmeans_fit,
    )

    df, query, dim = small_embed_corpus
    R = random_rotation(dim, seed=5)
    from kubernetes_logs_datalake_spark.operators.rotation import (
        rotate_vectors,
    )

    rotated = rotate_vectors(df, "embedding", R).localCheckpoint()
    centers, _ = kmeans_fit(rotated, "vec_id", "embedding", k=4, iters=2)
    idx = str(tmp_path / "rot_many")
    ivf_sq8_index_build(
        df, "vec_id", "embedding", idx, dim=dim, centers=centers,
        rotation=R,
    )
    rows = df.limit(4).collect()
    queries = [(int(r["vec_id"]) + 10_000,
                [float(v) for v in r["embedding"]]) for r in rows]
    qdf = spark.createDataFrame(
        queries, "query_id long, embedding array<double>"
    )
    out = ivf_sq8_index_search_many(spark, idx, qdf, topk=5, n_probe=2)
    got = sorted(
        (int(r["query_id"]), int(r["vec_id"]), float(r["score"]))
        for r in out.collect()
    )
    assert got == _loop_serve(spark, idx, queries, 5, 2)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan.replace(
        "PartitionFilters: [isnotnull(cluster", "PartitionFilters: [cluster"
    ) or "cluster IN" in plan, plan[:2000]


def test_search_many_validates_and_refuses_torn(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_search_many,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "manyval"
    )
    qdf = spark.createDataFrame(
        [(1, query)], "query_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="n_probe"):
        ivf_sq8_index_search_many(spark, a, qdf, n_probe=0)
    fs = vmod._index_fs(spark, a)
    cfg = js.loads(fs.read_small(f"{a}/manifest.json"))
    vmod._invalidate_manifest(
        fs, f"{a}/manifest.json", cfg, op="append", touched=[0]
    )
    with pytest.raises(FileNotFoundError, match="TORN"):
        ivf_sq8_index_search_many(spark, a, qdf)


def test_ingest_job_publishes_snapshots_per_epoch(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    """The streaming ops loop closed: AnnIngestJob(serve_root=...)
    publishes a snapshot after each non-empty epoch's manifest
    commit, so serving replicas resolving serve_root never see the
    mid-epoch refusal window and always read a complete post-epoch
    state."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_verify, resolve_serving_index,
    )
    from kubernetes_logs_datalake_spark.streaming.ann_ingest import (
        AnnIngestJob,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "pubstream"
    )
    serve_root = str(tmp_path / "serving")
    inbox = str(tmp_path / "inbox")
    b1 = batch.filter(F.col("vec_id") <= 105)
    b2 = batch.filter(F.col("vec_id") > 105)
    b1.coalesce(1).write.mode("append").parquet(inbox)

    job = AnnIngestJob(
        index_dir=a, checkpoint=str(tmp_path / "ckpt"),
        trigger_seconds=1, serve_root=serve_root,
    )
    source = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(inbox)
    )
    q = job.start(spark, source)
    try:
        q.processAllAvailable()
        snap1 = resolve_serving_index(spark, serve_root)
        assert snap1.endswith("snap-1")
        # the snapshot holds the post-epoch-1 state
        assert ivf_sq8_index_verify(spark, snap1)["n_rows"] == \
            90 + b1.count()
        b2.coalesce(1).write.mode("append").parquet(inbox)
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    snap2 = resolve_serving_index(spark, serve_root)
    assert snap2.endswith("snap-2")
    assert ivf_sq8_index_verify(spark, snap2)["n_rows"] == \
        90 + batch.count()
    # the published state serves identically to the live index
    assert _serve(spark, snap2, query) == _serve(spark, a, query)
