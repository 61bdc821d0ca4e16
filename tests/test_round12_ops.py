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
    # degenerate cadence WITH a dir set raises: silently never taking
    # the reliable path would un-protect a job whose owner explicitly
    # asked for executor-loss survivability (r12 review)
    with pytest.raises(ValueError, match="checkpoint_every"):
        reliable_this_round("/tmp/ck", 4, 0)
    # ...but with no dir it stays the quiet always-local default
    assert reliable_this_round(None, 4, 0) is None


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
    # retired driver row (r15 capacity policy): pin via the private fn
    base = entry._ann_topk_sq8_served(spark, sf)
    base_rows = _sorted_rows(base)

    ckdir = str(tmp_path / "sq8")
    monkeypatch.setattr(entry, "SQ8_CACHE_CHECKPOINT_DIR", ckdir)
    # fresh cache entry so the knob is exercised, not the memo
    entry._SQ8_PACKED_CACHE.clear()
    try:
        rel = entry._ann_topk_sq8_served(spark, sf)
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


# ---------------------------------------------------------------------------
# per-cell SQ8 (ann_topk_sq8_cell) — the clustered-corpus recall fix
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_embed_corpus(spark):
    """Gaussian-mixture corpus (the organic-panel shape in miniature):
    8 tight components whose within-component neighbor margins are far
    below the GLOBAL per-dim range — exactly the regime where global
    SQ8 bounds collapse (panel recall 0.986 uniform → 0.116 organic,
    SCALE.md r12) and per-cell bounds must not."""
    import numpy as np

    rng = np.random.default_rng(12)
    dim, per = 16, 60
    comps = rng.uniform(-8.0, 8.0, (8, dim))
    vecs = np.vstack([
        c + rng.normal(0.0, 0.02, (per, dim)) for c in comps
    ])
    rows = [
        (i + 1, [float(v) for v in vec]) for i, vec in enumerate(vecs)
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )
    query = comps[3] + rng.normal(0.0, 0.02, dim)
    # ground truth by exact DOT PRODUCT — the metric the SQ8 family
    # scores (asymmetric q·v̂), so the comparison isolates pure
    # quantization error from any metric mismatch
    exact = set(int(i) + 1 for i in (vecs @ query).argsort()[::-1][:10])
    return df.localCheckpoint(), [float(v) for v in query], dim, exact


def _topk_ids(df):
    return [r[0] for r in df.collect()]


def test_sq8_cell_recovers_recall_global_sq8_loses(
    spark, clustered_embed_corpus
):
    """On the mixture corpus the query's true top-10 live inside one
    tight component whose margins are ~1e-2 of the global range — the
    global 8-bit grid (step = range/255 ≈ 0.06 per dim) can't resolve
    them, the per-cell grid (step ≈ component spread/255 ≈ 1e-4) can.
    Recall@10 per-cell must beat global AND be near-exact."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        kmeans_fit, sq8_cell_topk, sq8_topk,
    )

    df, query, dim, exact = clustered_embed_corpus
    global_ids = set(_topk_ids(
        sq8_topk(df, "vec_id", "embedding", query, dim=dim, topk=10)
        .select("vec_id")
    ))
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=8, iters=3)
    cell_ids = set(_topk_ids(
        sq8_cell_topk(
            df, "vec_id", "embedding", query, dim=dim, topk=10,
            centers=centers,
        ).select("vec_id")
    ))
    r_global = len(exact & global_ids) / 10
    r_cell = len(exact & cell_ids) / 10
    assert r_cell > r_global, (r_cell, r_global)
    assert r_cell >= 0.9, r_cell
    # and the failure being fixed is real on this fixture: the global
    # grid must actually be losing a material part of the ranking
    # signal (measured 0.6 here vs 1.0 per-cell)
    assert r_global <= 0.7, r_global


def test_sq8_cell_bounds_lossless_on_cellwise_constant_dims(spark):
    """A dimension CONSTANT within a cell gets sc=iv=0 and decodes to
    exactly mn — per-cell quantization of locally-constant dims is
    LOSSLESS, where the global grid must spend codes on the cross-cell
    spread. With every dim cell-wise constant, per-cell SQ8 scores
    equal the exact dot products to the rounding scale."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        sq8_cell_topk,
    )

    dim = 6
    # two point-clusters: all members of a cluster share the vector
    va = [1.25, -0.5, 3.0, 0.0, 2.5, -1.75]
    vb = [-2.0, 4.25, 0.5, 1.0, -3.5, 0.25]
    rows = [(i, va) for i in range(1, 6)] + [(i, vb) for i in range(6, 11)]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )
    centers = [va, vb]
    query = [0.5, 1.0, -0.25, 2.0, 1.5, -1.0]
    out = {
        r[0]: r[1]
        for r in sq8_cell_topk(
            df, "vec_id", "embedding", query, dim=dim, topk=10,
            centers=centers,
        ).collect()
    }
    ea = round(sum(q * v for q, v in zip(query, va)), 6)
    eb = round(sum(q * v for q, v in zip(query, vb)), 6)
    for i in range(1, 6):
        assert out[i] == ea
    for i in range(6, 11):
        assert out[i] == eb


# ---------------------------------------------------------------------------
# IMI kNN join (embedding_imi_knn_join) — the Θ(n^4/3) coarse quantizer
# ---------------------------------------------------------------------------


def test_icbrt_exact_across_cube_boundaries():
    """_icbrt must be the exact integer cube root at and around every
    cube boundary — the property that makes the Spark/DuckDB cell-count
    parity immune to pow() ulp noise."""
    import __spark_entry__ as entry

    for m in (1, 2, 3, 5, 7, 10, 12, 17, 100, 1000):
        c = m * m * m
        assert entry._icbrt(c - 1) == m - 1
        assert entry._icbrt(c) == m
        assert entry._icbrt(c + 1) == m
    for n in (1, 2, 7, 8, 9, 26, 27, 28, 63, 64, 65, 499, 1999, 6399):
        m = entry._icbrt(n)
        assert m**3 <= n < (m + 1) ** 3


def _cbrt_limit_value(n: int):
    import duckdb

    import __spark_entry__ as entry

    expr = entry._ddb_cbrt_cells_limit()
    sql = f"WITH corpus AS (SELECT * FROM range({n}) t(vec_id)) SELECT {expr}"
    return duckdb.connect().execute(sql).fetchone()[0]


def test_cbrt_cells_oracle_parity_and_boundary_guard():
    """The DuckDB floor(pow+0.5)±1 arithmetic must equal the Python
    _icbrt for every sandbox-reachable n, and error loudly past the
    n>=6400 sampled-fit boundary (same contract as the √n-cells
    guard)."""
    import __spark_entry__ as entry

    for n in (1, 7, 8, 26, 27, 64, 343, 499, 1000, 1999, 4096, 6399):
        k1, fit_mod = entry._cbrt_cells(n)
        assert fit_mod == 1, f"boundary mismatch at n={n}"
        assert _cbrt_limit_value(n) == k1
    assert entry._cbrt_cells(6400)[1] > 1
    with pytest.raises(Exception, match="oracle boundary"):
        _cbrt_limit_value(6400)


def test_imi_assign_matches_per_half_kmeans_assign(spark, skewed_corpus8):
    """The oracle's premise: each half's j from the single-pass
    _imi_assign is bit-identical to kmeans_assign run on the sliced
    corpus (same argmin, same low-index tie-break)."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        _imi_assign,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import (
        kmeans_assign, kmeans_fit,
    )

    df, _ = skewed_corpus8
    dim, h = 8, 4
    half1 = df.select("vec_id", F.slice("embedding", 1, h).alias("embedding"))
    half2 = df.select(
        "vec_id", F.slice("embedding", h + 1, h).alias("embedding")
    )
    c1, _ = kmeans_fit(half1, "vec_id", "embedding", k=5, iters=2)
    c2, _ = kmeans_fit(half2, "vec_id", "embedding", k=5, iters=2)
    got = {
        r["vec_id"]: (r["j1"], r["j2"])
        for r in _imi_assign(df, "vec_id", "embedding", c1, c2, dim).collect()
    }
    want1 = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(half1, "vec_id", "embedding", c1).collect()
    }
    want2 = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(half2, "vec_id", "embedding", c2).collect()
    }
    assert got == {k: (want1[k], want2[k]) for k in want1}


@pytest.fixture(scope="module")
def skewed_corpus8(spark):
    """The round-11 planted-hot-blob corpus shape (30% of rows in one
    tight Gaussian), reusable here for the IMI contract tests."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_hot, n_cold, dim = 600, 1400, 8
    hot = rng.normal(0.9, 0.05, (n_hot, dim))
    cold = rng.uniform(0, 1, (n_cold, dim))
    rows = [
        (i, [float(v) for v in vec])
        for i, vec in enumerate(np.vstack([hot, cold]))
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    return df.localCheckpoint(), dim


def test_imi_knn_join_finds_planted_twins(spark):
    """Near-duplicate pairs planted far apart from each other must land
    in the same product cell on BOTH halves (each twin is within ~1e-3
    of its sibling on every dim) and come out at rank 1 — the planted
    quality claim, same shape as the round-6 IVF quality test."""
    import numpy as np

    from kubernetes_logs_datalake_spark.operators.similarity import (
        imi_knn_join,
    )

    rng = np.random.default_rng(5)
    dim, pairs = 8, 40
    anchors = rng.uniform(-4.0, 4.0, (pairs, dim))
    rows = []
    for i, a in enumerate(anchors):
        rows.append((2 * i + 1, [float(v) for v in a]))
        rows.append(
            (2 * i + 2, [float(v) for v in a + rng.normal(0, 1e-3, dim)])
        )
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = imi_knn_join(
        df, "vec_id", "embedding", dim=dim, k=1, cells_per_half=4, iters=3
    )
    top1 = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    hits = sum(
        1
        for i in range(pairs)
        if top1.get(2 * i + 1) == 2 * i + 2
        and top1.get(2 * i + 2) == 2 * i + 1
    )
    assert hits == pairs, f"only {hits}/{pairs} twin pairs at rank 1"


def test_imi_knn_join_split_cap_bounds_hot_product_cell(
    spark, skewed_corpus8
):
    """With 30% of rows in one blob, both half-marginals concentrate and
    the product cell goes hot; split_cap must bound every refined cell
    <= cap while keeping the output contract (ranks 1..k dense per
    query, no self-pairs, cos in [-1, 1])."""
    from kubernetes_logs_datalake_spark.operators.cellsplit import (
        split_oversized_cells,
    )
    from kubernetes_logs_datalake_spark.operators.similarity import (
        _imi_assign, imi_knn_join,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_fit

    df, dim = skewed_corpus8
    h = dim // 2
    k1 = 5
    half1 = df.select("vec_id", F.slice("embedding", 1, h).alias("embedding"))
    half2 = df.select(
        "vec_id", F.slice("embedding", h + 1, h).alias("embedding")
    )
    c1, _ = kmeans_fit(half1, "vec_id", "embedding", k=k1, iters=2)
    c2, _ = kmeans_fit(half2, "vec_id", "embedding", k=k1, iters=2)
    assigned = _imi_assign(df, "vec_id", "embedding", c1, c2, dim)
    assigned = assigned.withColumn(
        "cluster", (F.col("j1") * k1 + F.col("j2")).cast("int")
    )
    cap = 320  # 4 * fair share at n=2000, 25 cells
    sizes = [r[1] for r in assigned.groupBy("cluster").count().collect()]
    assert max(sizes) > cap, "fixture must produce a hot product cell"
    refined, _ = split_oversized_cells(
        assigned, "vec_id", "embedding", cap=cap
    )
    refined_sizes = [r[1] for r in refined.groupBy("cell").count().collect()]
    assert max(refined_sizes) <= cap

    out = imi_knn_join(
        df, "vec_id", "embedding", dim=dim, k=3, cells_per_half=k1,
        iters=2, centers=(c1, c2), split_cap=cap,
    )
    rows = out.collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    assert all(-1.0001 <= r["cos"] <= 1.0001 for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(
        sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values()
    )


def test_imi_knn_join_plan_has_no_cartesian_and_pins_width(
    spark, skewed_corpus8
):
    """Plan gate: the pair stage is a cell-keyed equi-join behind
    explicit-N repartitions (the AQE byte-coalescing guard), never a
    cartesian."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        imi_knn_join,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_fit

    df, dim = skewed_corpus8
    h = dim // 2
    half1 = df.select("vec_id", F.slice("embedding", 1, h).alias("embedding"))
    half2 = df.select(
        "vec_id", F.slice("embedding", h + 1, h).alias("embedding")
    )
    c1, _ = kmeans_fit(half1, "vec_id", "embedding", k=4, iters=1)
    c2, _ = kmeans_fit(half2, "vec_id", "embedding", k=4, iters=1)
    out = imi_knn_join(
        df, "vec_id", "embedding", dim=dim, k=3, cells_per_half=4,
        iters=1, centers=(c1, c2),
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join Cross" not in plan
    assert "RepartitionByExpression [cell" in plan
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_imi_multi_probe_rank1_is_primary_cell(spark, skewed_corpus8):
    """probe_rank=1 of the multi-probe explode must be bit-identical to
    _imi_assign's per-half argmins (sum of half-distances is minimized
    at the independent argmins) — the invariant that makes the probed
    join's neighbor side equal the 1-probe assignment."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        _imi_assign, _imi_multi_probe_cells,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_fit

    df, dim = skewed_corpus8
    h = dim // 2
    half1 = df.select("vec_id", F.slice("embedding", 1, h).alias("embedding"))
    half2 = df.select(
        "vec_id", F.slice("embedding", h + 1, h).alias("embedding")
    )
    c1, _ = kmeans_fit(half1, "vec_id", "embedding", k=5, iters=2)
    c2, _ = kmeans_fit(half2, "vec_id", "embedding", k=5, iters=2)
    primary = {
        r["vec_id"]: (r["j1"], r["j2"])
        for r in _imi_assign(df, "vec_id", "embedding", c1, c2, dim).collect()
    }
    probed = _imi_multi_probe_cells(
        df, "vec_id", "embedding", c1, c2, dim, p=4
    )
    rank1 = {
        r["vec_id"]: (r["j1"], r["j2"])
        for r in probed.filter(F.col("probe_rank") == 1).collect()
    }
    assert rank1 == primary
    # p rows per vector, distinct cells per vector
    counts = probed.groupBy("vec_id").count().select("count").distinct()
    assert [r[0] for r in counts.collect()] == [4]
    dup = (
        probed.groupBy("vec_id", "j1", "j2").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_imi_knn_join_exact_at_full_probe_and_unique_pairs(spark):
    """At n_probe = K² every query probes every product cell, so the
    probed IMI join must equal the EXACT kNN join (the exact-at-full-
    probe contract the flat IVF family pins); at any p the output has
    no duplicate (query, neighbor) pairs."""
    import numpy as np

    from kubernetes_logs_datalake_spark.operators.similarity import (
        imi_knn_join,
    )

    rng = np.random.default_rng(11)
    dim, n = 8, 120
    vecs = rng.uniform(-2.0, 2.0, (n, dim))
    rows = [(i + 1, [float(v) for v in vec]) for i, vec in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    # exact ground truth by cosine, ties by neighbor id
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    exact = {}
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-cos[i, j], j + 1),
        )
        exact[i + 1] = [j + 1 for j in order[:3]]

    out = imi_knn_join(
        df, "vec_id", "embedding", dim=dim, k=3, cells_per_half=3,
        iters=2, n_probe=9,
    )
    got = {}
    for r in out.orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == exact

    out4 = imi_knn_join(
        df, "vec_id", "embedding", dim=dim, k=3, cells_per_half=3,
        iters=2, n_probe=4,
    )
    dup = (
        out4.groupBy("query_id", "neighbor_id").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0
    # recall is monotone in p on this corpus: p=4 hits at least as many
    # exact pairs as p=1
    def hits(df_):
        g = {}
        for r in df_.collect():
            g.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(set(exact[q]) & g.get(q, set())) for q in exact
        )

    out1 = imi_knn_join(
        df, "vec_id", "embedding", dim=dim, k=3, cells_per_half=3,
        iters=2, n_probe=1,
    )
    assert hits(out4) >= hits(out1)


def test_kmeans_assign_arrow_bit_exact_and_contract(spark, skewed_corpus8):
    """The Arrow/numpy assignment must be FULL-FRAME bit-identical to
    the expression path — same clusters (first-min tie-break), same
    float_round'ed dists — because its per-dim accumulation replays the
    HOF fold's IEEE order vectorized across rows. Ragged vectors must
    raise, not mis-assign."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        kmeans_assign, kmeans_assign_arrow, kmeans_fit,
    )

    df, _dim = skewed_corpus8
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=7, iters=2)
    a = kmeans_assign(df, "vec_id", "embedding", centers)
    b = kmeans_assign_arrow(df, "vec_id", "embedding", centers)
    cols = ["vec_id", "cluster", "dist"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
    assert [f.name for f in b.schema.fields] == [
        "vec_id", "cluster", "dist", "embedding",
    ]

    ragged = spark.createDataFrame(
        [(1, [0.1] * 8), (2, [0.2] * 7)],
        "vec_id: long, embedding: array<double>",
    )
    with pytest.raises(Exception, match="ragged|expected 8"):
        kmeans_assign_arrow(ragged, "vec_id", "embedding", centers).collect()


def test_assign_arrow_knob_is_result_identical(spark, skewed_corpus8):
    """The opt-in assign_arrow knob on ivf_knn_join / sq8_cell_topk must
    be output-identical to the expression path (the kernel is bit-exact;
    this pins the knob PLUMBING end to end)."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        ivf_knn_join,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import (
        kmeans_fit, sq8_cell_topk,
    )

    df, dim = skewed_corpus8
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=6, iters=2)
    a = ivf_knn_join(
        df, "vec_id", "embedding", k=3, cells=6, centers=centers
    )
    b = ivf_knn_join(
        df, "vec_id", "embedding", k=3, cells=6, centers=centers,
        assign_arrow=True,
    )
    assert _sorted_rows(a) == _sorted_rows(b)

    q = [0.5] * dim
    sa = sq8_cell_topk(
        df, "vec_id", "embedding", q, dim=dim, topk=10, centers=centers
    )
    sb = sq8_cell_topk(
        df, "vec_id", "embedding", q, dim=dim, topk=10, centers=centers,
        assign_arrow=True,
    )
    assert _sorted_rows(sa) == _sorted_rows(sb)


def test_ivf_sq8_topk_exact_at_full_probe_and_monotone(
    spark, clustered_embed_corpus
):
    """IVF,SQ8 serving contract: at n_probe == cells the probed scan is
    bit-identical to the full sq8_cell_topk scan; recall against the
    full scan's top-10 grows monotonically with n_probe, and even
    n_probe=1 finds the full top-10 on this corpus (the query's
    component maps to one cell)."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_topk, kmeans_fit, sq8_cell_topk,
    )

    df, query, dim, _exact = clustered_embed_corpus
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=8, iters=3)
    full = sq8_cell_topk(
        df, "vec_id", "embedding", query, dim=dim, topk=10, centers=centers
    ).collect()
    allp = ivf_sq8_topk(
        df, "vec_id", "embedding", query, dim=dim, topk=10,
        n_probe=8, centers=centers,
    ).collect()
    assert [tuple(r) for r in allp] == [tuple(r) for r in full]

    full_ids = {r[0] for r in full}
    hits = []
    for p in (1, 2, 4, 8):
        got = {
            r[0]
            for r in ivf_sq8_topk(
                df, "vec_id", "embedding", query, dim=dim, topk=10,
                n_probe=p, centers=centers,
            ).collect()
        }
        hits.append(len(got & full_ids))
    assert hits == sorted(hits), hits
    assert hits[0] == 10, hits  # tight component -> 1 probe suffices

    with pytest.raises(ValueError, match="n_probe"):
        ivf_sq8_topk(
            df, "vec_id", "embedding", query, dim=dim, n_probe=9,
            centers=centers,
        )


def test_ivf_sq8_topk_scans_only_probed_cells(spark, clustered_embed_corpus):
    """The probe cut is real: with n_probe=1 the scored row count is the
    probed cell's population, not the corpus (the scan-fraction claim —
    at scale the cluster filter becomes partition pruning)."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_topk, kmeans_fit,
    )

    df, query, dim, _exact = clustered_embed_corpus
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=8, iters=3)
    n = df.count()
    # topk = n (not a huge sentinel: TakeOrdered allocates a k-slot
    # buffer per partition, so a 1e9 limit OOMs the JVM)
    out = ivf_sq8_topk(
        df, "vec_id", "embedding", query, dim=dim, topk=n,
        n_probe=1, centers=centers,
    )
    scanned = out.count()
    assert scanned < n / 2, (scanned, n)
    # the probe predicate itself must be in the plan — 'cluster' and
    # '=' alone also appear in the unprobed broadcast-join condition,
    # so assert the actual IN/equality filter over the cluster column
    # (r12 review: the loose form was vacuous)
    import re as _re

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert _re.search(r"cluster#\d+L? IN? ?[(=]", plan) or _re.search(
        r"cluster#\d+L? INSET", plan
    ) or _re.search(r"cluster#\d+L? = \d", plan), plan[:1500]


def test_ivf_sq8_topk_served_from_stored_assignment(
    spark, clustered_embed_corpus
):
    """The serve-many path (assigned_df = the stored index frame) must
    be result-identical to the assign-inline path at every probe
    count."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_topk, kmeans_assign, kmeans_fit, sq8_cell_bounds,
    )

    df, query, dim, _exact = clustered_embed_corpus
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=8, iters=3)
    asg = kmeans_assign(df, "vec_id", "embedding", centers).localCheckpoint()
    bounds = sq8_cell_bounds(asg, "embedding", dim).localCheckpoint()
    for p in (1, 3, 8):
        inline = ivf_sq8_topk(
            df, "vec_id", "embedding", query, dim=dim, topk=10,
            n_probe=p, centers=centers,
        ).collect()
        served = ivf_sq8_topk(
            df, "vec_id", "embedding", query, dim=dim, topk=10,
            n_probe=p, centers=centers, bounds_df=bounds, assigned_df=asg,
        ).collect()
        assert [tuple(r) for r in served] == [tuple(r) for r in inline], p


def _duckdb_on(sf_dir: str, sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con.execute(sql).fetchall()


def test_r13_queued_ivf_sq8_oracle_parity(spark):
    """The r13-queued ann_topk_ivf_sq8 query and its oracle agree
    TODAY (sf0.001, side-by-side engines) — registration at r13 is
    just the two dict lines, with the parity already pinned."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [
        (int(r[0]), float(r[1]))
        for r in entry._ann_topk_ivf_sq8(spark, sf).collect()
    ]
    want = [
        (int(a), float(b))
        for a, b in _duckdb_on(sf, entry._ddb_ivf_sq8_sql())
    ]
    assert got == want


def test_r13_queued_imi_recall_oracle_parity(spark):
    """Same contract for the r13-queued ann_recall_imi_join."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in entry._ann_recall_imi_join(spark, sf).collect()]
    want = _duckdb_on(sf, entry._ddb_imi_join_recall_sql())
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert (int(g[0]), int(g[1]), int(g[2])) == (
        int(w[0]), int(w[1]), int(w[2]))
    assert abs(float(g[3]) - float(w[3])) < 1e-9


def test_ivf_sq8_index_lifecycle_partition_pruning(
    spark, clustered_embed_corpus, tmp_path
):
    """Build-once/serve-many with the REAL scan cut: the stored index
    is cluster-partitioned, the probe filter reaches the scan as
    PartitionFilters (not a post-scan Filter), results are
    bit-identical to the in-memory probed path, and a torn build (no
    manifest) refuses to serve."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, ivf_sq8_index_search, ivf_sq8_topk,
        kmeans_fit,
    )

    df, query, dim, _exact = clustered_embed_corpus
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=8, iters=3)
    idx = str(tmp_path / "ivfsq8")
    built = ivf_sq8_index_build(
        df, "vec_id", "embedding", idx, dim=dim, centers=centers
    )
    assert built == centers

    for p in (1, 3, 8):
        served = ivf_sq8_index_search(
            spark, idx, query, topk=10, n_probe=p
        )
        inline = ivf_sq8_topk(
            df, "vec_id", "embedding", query, dim=dim, topk=10,
            n_probe=p, centers=centers,
        )
        assert [tuple(r) for r in served.collect()] == [
            tuple(r) for r in inline.collect()
        ], p

    # the probe filter is partition pruning, not a row filter: the
    # physical scan's PartitionFilters carry the cluster predicate
    served1 = ivf_sq8_index_search(spark, idx, query, topk=10, n_probe=1)
    phys = served1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in phys
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", phys)
    assert pf and "cluster" in pf.group(1), phys[:1500]

    # torn build: killing the manifest must make serving refuse loudly
    import os

    os.remove(f"{idx}/manifest.json")
    with pytest.raises(FileNotFoundError, match="torn|manifest"):
        ivf_sq8_index_search(spark, idx, query)
