"""Round-12 additions: the reliable-checkpoint knob for iterative
operators (r11 verdict "what's wrong" #2 / task #2).

`localCheckpoint` stores lineage-truncation blocks on executors
WITHOUT replication — losing one executor on a dynamic/spot cluster
makes the truncated lineage unrecoverable mid-iteration. The knob
(`checkpoint_dir` + `checkpoint_every` on every iterative operator)
routes round-boundary truncation through the reliable
`DataFrame.checkpoint()` instead. These tests pin the contract: output
is BIT-IDENTICAL under either mechanism, and the reliable path really
does write to the given directory.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.bpe import bpe_learn
from kubernetes_logs_datalake_spark.operators.dedup import (
    connected_components,
)
from kubernetes_logs_datalake_spark.operators.graph import (
    hits,
    kcore,
    label_propagation,
    pagerank,
)
from kubernetes_logs_datalake_spark.operators.lineage import (
    reliable_this_round,
    truncate_lineage,
)


def _edges(spark):
    rows = [
        # two communities bridged by one edge + a dangling sink
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "e"), ("e", "f"), ("f", "d"), ("f", "g"),
        ("g", "g2"),
    ]
    return spark.createDataFrame(rows, ["src", "dst"])


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy(*df.columns).collect()]


def test_reliable_this_round_policy():
    # unset dir -> always local, whatever the cadence
    assert reliable_this_round(None, 0, 1) is None
    assert reliable_this_round(None, 5, 3) is None
    # every=1 -> reliable every round
    assert reliable_this_round("/tmp/ck", 0, 1) == "/tmp/ck"
    assert reliable_this_round("/tmp/ck", 7, 1) == "/tmp/ck"
    # every=3 -> rounds 2, 5, 8 (0-based) take the reliable path
    picks = [reliable_this_round("/tmp/ck", i, 3) for i in range(6)]
    assert picks == [None, None, "/tmp/ck", None, None, "/tmp/ck"]
    # degenerate cadence -> never reliable (defensive, not an error)
    assert reliable_this_round("/tmp/ck", 4, 0) is None


def test_truncate_lineage_reliable_writes_to_dir(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = truncate_lineage(df, ckdir, eager=True)
    assert out.count() == 100
    # checkpoint files landed under the requested directory
    found = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(ckdir)
        for f in fs
    ]
    assert found, "reliable checkpoint wrote nothing under checkpoint_dir"
    # and the plan was truncated: the parquet/range scan is gone — the
    # physical plan reads the checkpointed RDD instead
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    ) if hasattr(out, "_jdf") else ""
    if plan:
        assert "Range" not in plan


def test_pagerank_identical_under_reliable_checkpoint(spark, tmp_path):
    e = _edges(spark)
    base = pagerank(e, iters=6)
    rel = pagerank(
        e, iters=6, checkpoint_dir=str(tmp_path / "pr"), checkpoint_every=2
    )
    assert _sorted_rows(base) == _sorted_rows(rel)


def test_label_propagation_identical_under_reliable_checkpoint(
    spark, tmp_path
):
    e = _edges(spark)
    seeds = spark.createDataFrame(
        [("a", "L1"), ("e", "L2")], ["node", "label"]
    )
    base = label_propagation(e, seeds, iters=4)
    rel = label_propagation(
        e, seeds, iters=4,
        checkpoint_dir=str(tmp_path / "lp"), checkpoint_every=1,
    )
    assert _sorted_rows(base) == _sorted_rows(rel)


def test_hits_identical_under_reliable_checkpoint(spark, tmp_path):
    e = _edges(spark)
    base = hits(e, iters=4)
    rel = hits(
        e, iters=4, checkpoint_dir=str(tmp_path / "h"), checkpoint_every=2
    )
    assert _sorted_rows(base) == _sorted_rows(rel)


def test_kcore_identical_under_reliable_checkpoint(spark, tmp_path):
    e = _edges(spark)
    base = kcore(e, k=2, rounds=6)
    rel = kcore(
        e, k=2, rounds=6,
        checkpoint_dir=str(tmp_path / "kc"), checkpoint_every=1,
    )
    assert _sorted_rows(base) == _sorted_rows(rel)


def test_connected_components_identical_under_reliable_checkpoint(
    spark, tmp_path
):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        ["id_a", "id_b"],
    )
    base = connected_components(pairs)
    rel = connected_components(
        pairs, checkpoint_dir=str(tmp_path / "cc"), checkpoint_every=2
    )
    assert _sorted_rows(base) == _sorted_rows(rel)


def test_bpe_learn_identical_under_reliable_checkpoint(spark, tmp_path):
    docs = spark.createDataFrame(
        [("low lower lowest",), ("new newer newest",), ("low new low",)],
        ["text"],
    )
    m_base, v_base = bpe_learn(docs, "text", num_merges=6)
    m_rel, v_rel = bpe_learn(
        docs, "text", num_merges=6,
        checkpoint_dir=str(tmp_path / "bpe"), checkpoint_every=3,
    )
    assert m_base == m_rel
    assert _sorted_rows(v_base.select("word", "cnt")) == _sorted_rows(
        v_rel.select("word", "cnt")
    )


def test_sq8_serving_cache_honors_checkpoint_dir(spark, tmp_path, monkeypatch):
    """The session-persisted SQ8 code frame (the serving fleet's single
    most durable asset) routes through the reliable checkpointer when
    the knob is set, and scores stay bit-identical."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    base = entry.queries()["ann_topk_sq8_served"](spark, sf)
    base_rows = _sorted_rows(base)

    ckdir = str(tmp_path / "sq8")
    monkeypatch.setattr(entry, "SQ8_CACHE_CHECKPOINT_DIR", ckdir)
    # fresh cache entry so the knob is exercised, not the memo
    entry._SQ8_PACKED_CACHE.clear()
    try:
        rel = entry.queries()["ann_topk_sq8_served"](spark, sf)
        assert _sorted_rows(rel) == base_rows
        found = [f for _r, _d, fs in os.walk(ckdir) for f in fs]
        assert found, "serving cache did not checkpoint to the reliable dir"
    finally:
        entry._SQ8_PACKED_CACHE.clear()


def test_hash_split_probe_rows_explode_across_subcells(spark):
    """r11 ADVICE: within a hash-split parent, own-id descent gives a
    probed query row ~1/m of the parent's candidates with zero
    locality. With probe_col set, probed rows (rank > 1) must fan out
    across ALL m sub-cells of the probed parent, primary rows (rank 1)
    must keep the bit-identical own-id descent, and rows in unsplit
    cells must pass through unchanged."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.cellsplit import (
        apply_cell_splits,
        split_oversized_cells,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_assign

    # 120 exact duplicates -> k-means can't split -> hash round fires
    rows = [(i, [0.5, 0.5, 0.5, 0.5]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    assigned = kmeans_assign(df, "vec_id", "embedding", [[0.5] * 4, [0.0] * 4])
    refined, splits = split_oversized_cells(
        assigned, "vec_id", "embedding", cap=50, max_rounds=2
    )
    (mods,) = [cells for kind, cells in splits if kind == "hash"]
    (parent, m) = next(iter(mods.items()))
    assert m >= 2

    # a probe frame: primary rows in the split parent + probed rows
    # visiting the split parent + a probed row in an unsplit cell
    probe = (
        assigned.withColumn("cell", F.col("cluster").cast("string"))
        .withColumn("probe_rank", F.lit(1))
        .select("vec_id", "embedding", "cell", "probe_rank")
    )
    visitors = spark.createDataFrame(
        [(1000, [0.5] * 4, parent, 2), (1001, [0.5] * 4, "1", 2)],
        "vec_id: long, embedding: array<double>, cell: string, "
        "probe_rank: int",
    )
    replay = apply_cell_splits(
        probe.unionByName(visitors), "embedding", splits,
        id_col="vec_id", probe_col="probe_rank",
    )
    # probed visitor of the split parent: one row per sub-cell
    fan = replay.filter(F.col("vec_id") == 1000).select("cell").collect()
    assert sorted(r["cell"] for r in fan) == [
        f"{parent}/{i}" for i in range(m)
    ]
    # probed visitor of an unsplit cell: passes through once
    passthru = replay.filter(F.col("vec_id") == 1001).collect()
    assert len(passthru) == 1 and passthru[0]["cell"] == "1"
    # primary rows: bit-identical to the split's own assignment
    assert (
        refined.select("vec_id", "cell")
        .join(
            replay.filter(F.col("probe_rank") == 1).select(
                "vec_id", F.col("cell").alias("c2")
            ),
            "vec_id",
        )
        .filter(F.col("cell") != F.col("c2"))
        .count()
        == 0
    )


def test_shuffle_partitions_falls_back_on_non_numeric(spark):
    """Managed platforms set spark.sql.shuffle.partitions to "auto"
    (OSS Spark refuses the value, so a stub session simulates it); the
    pair-stage pinning helper must fall back to defaultParallelism
    instead of raising (r11 ADVICE)."""
    from types import SimpleNamespace

    from kubernetes_logs_datalake_spark.session import shuffle_partitions

    # real session: returns the configured int
    assert shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    # managed-platform shape: conf value "auto" -> defaultParallelism
    stub = SimpleNamespace(
        conf=SimpleNamespace(get=lambda _k: "auto"),
        sparkContext=SimpleNamespace(defaultParallelism=7),
    )
    assert shuffle_partitions(stub) == 7
    # and a None value (missing conf) also falls back, not TypeError
    stub.conf = SimpleNamespace(get=lambda _k: None)
    assert shuffle_partitions(stub) == 7


def test_panel_recall_legs_agree_with_registered_operators(spark):
    """The r12 panel-recall instrument (tools/recall_at_scale.py) must
    score each family with the SAME rule as the registered operator:
    for a single panel query, the SQ8 leg's top-10 must equal
    sq8_topk's and the IVFPQ leg's top-10 must equal ivfadc_topk's on
    the self-excluded corpus. Otherwise the SCALE.md recall-vs-n rows
    measure a different index than the one shipped."""
    import importlib.util

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "recall_at_scale", "tools/recall_at_scale.py"
    )
    ras = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ras)

    import __spark_entry__ as entry
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivfadc_topk,
        sq8_topk,
    )

    sf = "/root/testdata/sf0.001"
    dim = entry.EMBEDDING_DIM
    emb = entry._t(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    rows = ras._panel_df(spark, emb, 1)
    (qrow,) = rows
    qid = int(qrow["vec_id"])
    qvec = [float(x) for x in qrow["embedding"]]
    rest = emb.filter(F.col("vec_id") != qid)

    # run the instrument's own legs at n_panel=1 by monkey-free reuse:
    # panel_recalls computes recall; here we reproduce its per-leg
    # top-10 through the registered operators and check the hit count
    # the instrument reports is consistent with them.
    out = ras.panel_recalls(spark, sf, n_panel=1)
    assert out["panel_sq8"]["n_queries"] == 1

    bounds = entry._sq8_bounds_cached(emb, sf)
    op_sq8 = {
        int(r["vec_id"])
        for r in sq8_topk(
            rest, "vec_id", "embedding", qvec, dim=dim, topk=10,
            bounds=bounds,
        ).collect()
    }
    centers, books = entry._ivfadc_trained(spark, sf)
    op_pq = {
        int(r["vec_id"])
        for r in ivfadc_topk(
            rest, "vec_id", "embedding", qvec, dim=dim,
            n_centroids=entry._IVFADC_CENTROIDS,
            n_probe=entry._IVFADC_PROBE, m=entry._PQ_M, k=entry._PQ_K,
            topk=10, centers=centers, codebooks=books,
        ).collect()
    }
    from kubernetes_logs_datalake_spark.operators.similarity import (
        brute_force_topk,
    )

    exact = {
        int(r["vec_id"])
        for r in brute_force_topk(rest, "embedding", qvec, k=10).collect()
    }
    assert abs(out["panel_sq8"]["recall"] - len(exact & op_sq8) / 10) < 1e-9
    assert abs(out["panel_ivfpq"]["recall"] - len(exact & op_pq) / 10) < 1e-9


def test_adc_join_rerank_colocates_on_bucketed_corpus(spark):
    """r11 verdict task #6: the ADC join's 'two narrow id-keyed re-rank
    joins co-locate for free on an id-bucketed corpus table' claim,
    pinned at the plan level. With broadcast disabled (the 100 TB
    regime — an n·refine_k shortlist cannot broadcast), reading the
    corpus from a vec_id-bucketed table must remove every corpus-side
    Exchange (codes⋈assignment + both re-rank legs: 4 exchanges at
    x10, measured), and results must stay bit-identical."""
    import shutil

    import __spark_entry__ as entry
    from kubernetes_logs_datalake_spark.operators.bucketing import (
        write_bucketed,
    )
    from kubernetes_logs_datalake_spark.operators.similarity import (
        ivf_knn_join_adc,
    )

    sf = "/root/testdata/sf0.001"
    emb = entry._t(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    cells, fit_mod = entry._sqrt_cells(entry._emb_count_cached(emb, sf, "nz"))
    centers = entry._kmeans_centers_cached(
        emb, sf, "ivfknn", k=cells, iters=3, fit_sample_mod=fit_mod
    )
    bounds = entry._sq8_bounds_cached(emb, sf)

    spark.sql("DROP TABLE IF EXISTS emb_b_t12")
    shutil.rmtree("spark-warehouse/emb_b_t12", ignore_errors=True)
    write_bucketed(emb, "emb_b_t12", ["vec_id"], 4, sort_cols=["vec_id"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        def run(src):
            out = ivf_knn_join_adc(
                src, "vec_id", "embedding", dim=entry.EMBEDDING_DIM, k=3,
                refine_k=12, cells=cells, iters=3, centers=centers,
                split_cap=entry._cell_split_cap(cells), bounds=bounds,
            )
            rows = _sorted_rows(out)
            plan = out._jdf.queryExecution().executedPlan().toString()
            return rows, plan.count("Exchange hashpartitioning")

        plain_rows, plain_ex = run(emb)
        buck_rows, buck_ex = run(spark.table("emb_b_t12"))
        assert buck_rows == plain_rows
        # the corpus-side exchanges (codes⋈assignment legs + the two
        # re-rank joins) must be gone — the bucketed scan provides the
        # vec_id partitioning (−3 at sandbox SF; −4 measured at x10,
        # see SCALE.md round 12)
        assert buck_ex <= plain_ex - 3, (plain_ex, buck_ex)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS emb_b_t12")
