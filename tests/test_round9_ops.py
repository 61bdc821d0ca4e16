"""Round-9 operator behavior: the r8 ADVICE closures (snapshot_diff
NULL content, cluster_labels subset denominators, export_manifest
mismatch detection, histogram_quantiles integer ranks), the packed-SQ8
representation, and the occupancy-sample knob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ snapshot_diff NULLs


def test_snapshot_diff_null_content_is_presence_not_absence(spark):
    """A row whose content is NULL is still a PRESENT row: NULL→NULL is
    unchanged, NULL→text and text→NULL are modified — never added or
    removed (the md5(NULL)-is-NULL conflation from r8 ADVICE)."""
    from kubernetes_logs_datalake_spark.operators.incremental import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "ccc"), (4, "dd")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, "bb"), (3, None), (5, "e")],
        "id long, text string",
    )
    out = {r.status: (r.n_docs, r.n_chars)
           for r in snapshot_diff(old, new, "id", "text").collect()}
    assert out == {
        "unchanged": (1, 0),   # id 1: NULL == NULL, 0 chars
        "modified": (2, 2),    # id 2 (NULL→"bb", 2) + id 3 ("ccc"→NULL, 0)
        "removed": (1, 2),     # id 4, old chars
        "added": (1, 1),       # id 5, new chars
    }


# ------------------------------------- cluster_labels subset semantics


def test_cluster_labels_subset_assigned_uses_one_corpus(spark):
    """When `assigned` covers only a subset of `df`, BOTH the global
    document frequency and N must range over the assigned docs — the
    lift of a term that is everywhere in the assigned corpus is exactly
    1.0 no matter how many unassigned docs also contain it."""
    from kubernetes_logs_datalake_spark.operators.classify import (
        cluster_labels,
    )

    docs = [(i, "common alpha" if i < 4 else "common beta") for i in range(8)]
    # 100 unassigned docs that also contain 'common' — they must not
    # deflate (or inflate) any assigned-corpus lift
    docs += [(100 + i, "common noise") for i in range(100)]
    asg = [(i, 0 if i < 4 else 1) for i in range(8)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    a = spark.createDataFrame(asg, "doc_id long, cluster int")
    out = cluster_labels(a, d, "doc_id", "text", top_n=2, min_df=2)
    rows = {(r.cluster, r.term): r.score for r in out.collect()}
    # over the 8 assigned docs: common df_g=8 N=8 df_c=4 sz=4 → lift 1.0
    assert rows[(0, "common")] == 1.0
    assert rows[(1, "common")] == 1.0
    # alpha: df_c=4/sz=4 over df_g=4/N=8 → lift 2.0
    assert rows[(0, "alpha")] == 2.0
    assert rows[(1, "beta")] == 2.0
    assert not any(t == "noise" for (_, t) in rows)


# --------------------------------------- export_manifest mismatch gate


def test_export_manifest_raises_on_listing_mismatch(spark, tmp_path):
    """A data file the sha256 leg hashes but the parquet row-count leg
    never emits a row for (here: a zero-row parquet smuggled into a
    shard dir — exporters never write one, so it means the listings
    diverged) must RAISE, not report a plausible n_rows=0."""
    import os

    from kubernetes_logs_datalake_spark.operators.layout import (
        export_manifest,
        export_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, "text %d" % i) for i in range(40)], "doc_id long, text string"
    )
    root = str(tmp_path / "export")
    export_training_shards(docs, "doc_id", root, n_shards=2)
    # healthy tree: manifest works
    assert len(export_manifest(spark, root).collect()) >= 2

    # the divergence: a parquet file the glob hashes but the count
    # scan never yields rows for
    shard_dir = next(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("shard=")
    )
    docs.limit(0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(shard_dir, "_tmp")
    )
    part = next(
        f
        for f in os.listdir(os.path.join(shard_dir, "_tmp"))
        if f.endswith(".parquet")
    )
    os.replace(
        os.path.join(shard_dir, "_tmp", part),
        os.path.join(shard_dir, "stray.parquet"),
    )
    import shutil

    shutil.rmtree(os.path.join(shard_dir, "_tmp"))

    with pytest.raises(Exception, match="listing mismatch"):
        export_manifest(spark, root).collect()


# ------------------------------------- auto_time_bucket sample_mod


def _activity9(spark, n_users, n_hours, per_hour_users):
    hour = 3600 * 1_000_000
    rows = []
    for h in range(n_hours):
        for i in range(per_hour_users):
            u = (h * per_hour_users + i) % n_users
            rows.append((u, "t", h * hour + (i * hour) // per_hour_users))
    return spark.createDataFrame(rows, "user_id long, et string, ts_us long")


def test_auto_bucket_sampled_pick_matches_full_pick_at_10x(spark):
    """The 100 TB pre-pass knob: a deterministic 1-in-4 node hash
    sample must pick the SAME width as the full scan on both the
    sparse fixture and the 10x-dense fixture (occupancy quantiles
    concentrate — the sampled estimate occ*mod sits on the same side
    of the target)."""
    from kubernetes_logs_datalake_spark.operators.graph import (
        auto_time_bucket,
    )

    base = 3600 * 1_000_000
    sparse = _activity9(spark, n_users=200, n_hours=12, per_hour_users=4)
    dense = _activity9(spark, n_users=20000, n_hours=6, per_hour_users=1280)

    for df in (sparse, dense):
        full = auto_time_bucket(
            df, "user_id", "ts_us", ["et"], base, target_occupancy=32
        )
        sampled = auto_time_bucket(
            df, "user_id", "ts_us", ["et"], base, target_occupancy=32,
            sample_mod=4,
        )
        assert sampled == full
    # and the dense pick actually narrowed (the knob measures, not skips)
    assert auto_time_bucket(
        dense, "user_id", "ts_us", ["et"], base, target_occupancy=32,
        sample_mod=4,
    ) <= base // 4


def test_auto_bucket_sample_mod_one_is_identity(spark):
    from kubernetes_logs_datalake_spark.operators.graph import (
        auto_time_bucket,
    )

    base = 3600 * 1_000_000
    df = _activity9(spark, n_users=200, n_hours=6, per_hour_users=4)
    assert auto_time_bucket(
        df, "user_id", "ts_us", ["et"], base, sample_mod=1
    ) == auto_time_bucket(df, "user_id", "ts_us", ["et"], base)
    with pytest.raises(ValueError, match="sample_mod"):
        auto_time_bucket(df, "user_id", "ts_us", ["et"], base, sample_mod=0)


# ----------------------------- doc_length_bins_approx agreement gate


def test_doc_length_bins_approx_agrees_with_exact(spark):
    """The no-oracle-manifest contract for doc_length_bins_approx
    (mirrors test_approx_distinct_users_agrees_with_exact): the
    sketch-cutpoint bin must equal the exact ntile bin for >= 90% of
    documents, and never differ by more than one bin (sketch error and
    boundary ties move a row at most one bucket). Deterministic for a
    fixed input - a regression pin, not a flaky bound."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    exact = {
        r.doc_id: r.bin
        for r in entrymod.queries()["doc_length_bins"](spark, sf).collect()
    }
    approx = {
        r.doc_id: r.bin
        for r in entrymod.queries()["doc_length_bins_approx"](spark, sf).collect()
    }
    assert set(exact) == set(approx)
    n = len(exact)
    agree = sum(1 for k in exact if exact[k] == approx[k])
    assert agree >= 0.90 * n, f"only {agree}/{n} bins agree"
    assert all(abs(exact[k] - approx[k]) <= 1 for k in exact)


# --------------------------------------------------- packed SQ8 codes


def test_sq8_packed_scores_bit_identical_and_codegen_only(spark):
    """The packed binary representation must be a pure storage change:
    sq8_topk_packed returns the exact rows and scores of sq8_topk
    (same fold order over the same decoded values), with no Python
    stage in the plan (hex unpack stays in whole-stage codegen) —
    1 byte/dim in flight instead of array<int>."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        sq8_bounds,
        sq8_pack,
        sq8_encode,
        sq8_topk,
        sq8_topk_packed,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") != 0)
    q = [
        float(x)
        for x in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    b = sq8_bounds(emb, "embedding", 64)
    plain = sq8_topk(emb, "vec_id", "embedding", q, 64, bounds=b).collect()
    packed = sq8_topk_packed(
        emb, "vec_id", "embedding", q, 64, bounds=b
    ).collect()
    assert [(r.vec_id, r.score) for r in plain] == [
        (r.vec_id, r.score) for r in packed
    ]
    plan = (
        sq8_topk_packed(emb, "vec_id", "embedding", q, 64, bounds=b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # and the packed column really is dim bytes
    enc = sq8_pack(
        sq8_encode(emb.limit(5), "vec_id", "embedding", 64, bounds=b), "vec_id"
    )
    assert all(len(r.packed) == 64 for r in enc.collect())
    assert dict(enc.dtypes)["packed"] == "binary"


# --------------------------------------------- truncated (MRL) ANN


def test_truncated_topk_full_width_equals_bruteforce(spark):
    """dim_keep = dim must reproduce brute_force_topk exactly (same
    fold over the same values); dim_keep out of range raises."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        brute_force_topk,
        truncated_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") != 0)
    q = [
        float(x)
        for x in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    full = brute_force_topk(emb, "embedding", q, k=10).collect()
    trunc = truncated_topk(emb, "embedding", q, dim_keep=64, k=10).collect()
    assert [(r.vec_id, r.cos) for r in full] == [
        (r.vec_id, r.cos) for r in trunc
    ]
    # narrower prefixes return a valid (possibly different) top-k
    narrow = truncated_topk(emb, "embedding", q, dim_keep=16, k=10).collect()
    assert len(narrow) == 10
    assert all(-1.0 <= r.cos <= 1.0 for r in narrow)
    with pytest.raises(ValueError, match="dim_keep"):
        truncated_topk(emb, "embedding", q, dim_keep=0)
    with pytest.raises(ValueError, match="dim_keep"):
        truncated_topk(emb, "embedding", q, dim_keep=65)


def test_truncated_recall_monotone_in_dim_keep(spark):
    """Recall@10 vs the full-width ranking must not decrease as the
    kept prefix widens across the measured ladder (16 -> 32 -> 64; 64
    is exact so recall there is 1.0) — the property that makes the
    width knob a meaningful serving dial."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        brute_force_topk,
        truncated_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).filter(F.col("vec_id") != 0)
    q = [
        float(x)
        for x in spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    full = {r.vec_id for r in brute_force_topk(emb, "embedding", q, k=10).collect()}
    recalls = []
    for dk in (16, 32, 64):
        got = {
            r.vec_id
            for r in truncated_topk(emb, "embedding", q, dim_keep=dk, k=10).collect()
        }
        recalls.append(len(full & got) / 10)
    assert recalls[-1] == 1.0
    assert recalls == sorted(recalls), recalls
