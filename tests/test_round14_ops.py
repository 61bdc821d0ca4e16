"""Round-14 additions: crash-SURVIVABLE manifest invalidation for the
stored-index lifecycle (r13 verdict item 2 — the `.torn` sidecar +
repair API, self-healing appends/compacts), the r13 ADVICE closures
(compact conf restore, pq append idempotency, reliable-checkpoint
threading, rotation dim validation).
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def small_embed_corpus(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    dim, n = 8, 120
    vecs = rng.normal(0.0, 1.0, (n, dim))
    df = spark.createDataFrame(
        [(i + 1, [float(v) for v in vec]) for i, vec in enumerate(vecs)],
        "vec_id: long, embedding: array<double>",
    )
    query = [float(v) for v in rng.normal(0.0, 1.0, dim)]
    return df.localCheckpoint(), query, dim


def _fail_manifest_write(mp, at_call: int):
    """Make the Nth write_small_atomic raise — the 'crash inside the
    manifest window' switch. Call #1 in any lifecycle op is the torn
    sidecar; call #2 is the commit, so at_call=2 crashes after the
    data mutation, before the manifest re-publish."""
    from kubernetes_logs_datalake_spark.sources import compact as cmod

    calls = {"i": 0}
    real = cmod._Fs.write_small_atomic

    def wrapper(self, p, data):
        calls["i"] += 1
        if calls["i"] == at_call:
            raise RuntimeError("simulated crash inside manifest window")
        return real(self, p, data)

    mp.setattr(cmod._Fs, "write_small_atomic", wrapper)
    return calls


def _serve(spark, idx, query, n_probe=4, topk=7):
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_search,
    )

    return [
        tuple(r)
        for r in ivf_sq8_index_search(
            spark, idx, query, topk=topk, n_probe=n_probe
        ).collect()
    ]


def _bounds_set(spark, idx):
    return sorted(
        (int(r["cluster"]), tuple(r["mn"]), tuple(r["sc"]), tuple(r["iv"]))
        for r in spark.read.parquet(f"{idx}/bounds").collect()
    )


def _build_pair(spark, small_embed_corpus, tmp_path, name):
    """Two bit-identical indexes from the same base corpus + the held
    out batch: one to crash, one as the uncrashed control."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, kmeans_fit,
    )

    df, query, dim = small_embed_corpus
    base = df.filter(F.col("vec_id") <= 90).localCheckpoint()
    batch = df.filter(F.col("vec_id") > 90).localCheckpoint()
    centers, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2)
    a, b = str(tmp_path / f"{name}_crash"), str(tmp_path / f"{name}_ctl")
    for idx in (a, b):
        ivf_sq8_index_build(
            base, "vec_id", "embedding", idx, dim=dim, centers=centers
        )
    return a, b, batch, query, dim


@pytest.mark.parametrize("crash_point", ["post_cells", "pre_commit"])
def test_append_crash_self_heals_bit_identically(
    spark, small_embed_corpus, tmp_path, crash_point
):
    """THE r13 verdict item-2 pin: kill the append inside the
    manifest-invalidation window — right after the cells append
    (bounds never recomputed) and right before the manifest commit
    (bounds done) — then show the index refuses-with-a-pointer, the
    REPLAYED epoch self-heals via the torn sidecar, and serving is
    bit-identical to an uncrashed control (bounds values included).
    Under the r13 protocol both crash points destroyed the only copy
    of the centroids and demanded a full refit."""
    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_search, ivf_sq8_index_verify,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, f"heal_{crash_point}"
    )
    assert ivf_sq8_index_append(
        batch, b, skip_existing_ids=True
    ) == batch.count()  # uncrashed control

    with pytest.MonkeyPatch.context() as mp:
        if crash_point == "post_cells":
            # crash between the cells append and the bounds recompute
            real = vmod.sq8_cell_bounds

            def boom(*args, **kw):
                raise RuntimeError("simulated crash after cells append")

            mp.setattr(vmod, "sq8_cell_bounds", boom)
        else:
            # crash after bounds, before the manifest commit (call #2;
            # #1 is the torn sidecar write)
            _fail_manifest_write(mp, at_call=2)
        with pytest.raises(RuntimeError, match="simulated crash"):
            ivf_sq8_index_append(batch, a, skip_existing_ids=True)

    # torn: manifest gone, sidecar present, serving refuses and the
    # error points at the repair API
    fs = vmod._index_fs(spark, a)
    assert not fs.exists(f"{a}/manifest.json")
    assert fs.exists(f"{a}/manifest.json.torn")
    with pytest.raises(FileNotFoundError, match="repair"):
        ivf_sq8_index_search(spark, a, query, topk=7)

    # the replayed epoch self-heals: repair inside the append restores
    # the manifest, the per-id guard completes whatever the crash left
    n_replay = ivf_sq8_index_append(batch, a, skip_existing_ids=True)
    if crash_point == "post_cells":
        assert n_replay == 0  # cells were committed before the crash
    assert fs.exists(f"{a}/manifest.json")
    assert not fs.exists(f"{a}/manifest.json.torn")

    assert ivf_sq8_index_verify(spark, a)["ok"]
    for p in (1, 4):
        assert _serve(spark, a, query, n_probe=p) == _serve(
            spark, b, query, n_probe=p
        ), p
    assert _bounds_set(spark, a) == _bounds_set(spark, b)


def test_repair_restores_invalidated_but_unmutated_index(
    spark, small_embed_corpus, tmp_path
):
    """Crash point zero: invalidation completed (sidecar written,
    manifest deleted) but the data mutation never started. Repair
    recomputes bounds from the untouched cells — bit-identical values,
    since sq8_cell_bounds is deterministic per-cell min/max — and
    restores serving exactly."""
    import json as js

    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_repair,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "heal_zero"
    )
    before = _serve(spark, a, query)
    fs = vmod._index_fs(spark, a)
    cfg = js.loads(fs.read_small(f"{a}/manifest.json"))
    vmod._invalidate_manifest(
        fs, f"{a}/manifest.json", cfg, op="append", touched=[0]
    )
    rep = ivf_sq8_index_repair(spark, a)
    assert rep["repaired"] and rep["op"] == "append"
    assert rep["verify"]["ok"]
    assert _serve(spark, a, query) == before


def test_compact_crash_self_heals_bit_identically(
    spark, small_embed_corpus, tmp_path
):
    """Kill the compaction before its manifest commit, then show the
    NEXT compact call self-heals (the sidecar's crowded-cell pre-count
    proves no rows were lost or duplicated) and finishes the layout
    rewrite; serving stays bit-identical to an uncrashed control
    throughout."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_compact, ivf_sq8_index_verify,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "cmp"
    )
    # crowd the cells on both indexes with identical epoch slices
    for lo, hi in ((90, 100), (100, 110), (110, 999)):
        sl = batch.filter(
            (F.col("vec_id") > lo) & (F.col("vec_id") <= hi)
        ).localCheckpoint()
        for idx in (a, b):
            ivf_sq8_index_append(sl, idx, skip_existing_ids=True)

    ctl = ivf_sq8_index_compact(spark, b, max_files_per_cell=1)
    assert ctl["compacted_cells"] > 0

    with pytest.MonkeyPatch.context() as mp:
        _fail_manifest_write(mp, at_call=2)
        with pytest.raises(RuntimeError, match="simulated crash"):
            ivf_sq8_index_compact(spark, a, max_files_per_cell=1)

    fs = vmod._index_fs(spark, a)
    assert not fs.exists(f"{a}/manifest.json")
    assert fs.exists(f"{a}/manifest.json.torn")

    # re-running the compaction self-heals, then finishes the job
    res = ivf_sq8_index_compact(spark, a, max_files_per_cell=1)
    assert fs.exists(f"{a}/manifest.json")
    assert not fs.exists(f"{a}/manifest.json.torn")
    assert res["files_after"] <= ctl["files_after"], (res, ctl)
    assert ivf_sq8_index_verify(spark, a)["ok"]
    for p in (1, 4):
        assert _serve(spark, a, query, n_probe=p) == _serve(
            spark, b, query, n_probe=p
        ), p


def test_repair_refuses_torn_build_and_missing_index(
    spark, small_embed_corpus, tmp_path
):
    """A crashed (re)BUILD is not repairable — the cells may be half
    overwritten between two corpora — so repair raises and points at a
    rebuild, with the old centroids preserved in the sidecar; and a
    never-built dir raises FileNotFoundError."""
    import json as js

    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, ivf_sq8_index_repair,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "bld"
    )
    with pytest.MonkeyPatch.context() as mp:
        _fail_manifest_write(mp, at_call=2)
        with pytest.raises(RuntimeError, match="simulated crash"):
            ivf_sq8_index_build(
                batch, "vec_id", "embedding", a, dim=dim, cells=2, iters=1
            )
    fs = vmod._index_fs(spark, a)
    torn = js.loads(fs.read_small(f"{a}/manifest.json.torn"))
    assert torn["op"] == "build" and torn["cfg"]["centers"]
    with pytest.raises(RuntimeError, match="rebuild"):
        ivf_sq8_index_repair(spark, a)
    # the prescribed recovery — a full rebuild — works in place
    ivf_sq8_index_build(
        batch, "vec_id", "embedding", a, dim=dim, cells=2, iters=1
    )
    assert fs.exists(f"{a}/manifest.json")
    assert not fs.exists(f"{a}/manifest.json.torn")

    with pytest.raises(FileNotFoundError, match="never built"):
        ivf_sq8_index_repair(spark, str(tmp_path / "no_such_index"))


def test_repair_on_healthy_index_is_noop_and_cleans_dangling_sidecar(
    spark, small_embed_corpus, tmp_path
):
    """A crash between the manifest commit and the sidecar cleanup
    leaves BOTH present — the manifest is authoritative; repair just
    clears the dangling sidecar."""
    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_repair,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "noop"
    )
    assert ivf_sq8_index_repair(spark, a) == {
        "repaired": False, "status": "healthy", "cleaned_sidecar": False,
    }
    fs = vmod._index_fs(spark, a)
    fs.write_small_atomic(f"{a}/manifest.json.torn", b'{"op":"append"}')
    rep = ivf_sq8_index_repair(spark, a)
    assert rep["cleaned_sidecar"] and not rep["repaired"]
    assert not fs.exists(f"{a}/manifest.json.torn")
    before = _serve(spark, a, query)
    assert _serve(spark, b, query) == before


def test_pq_append_crash_self_heals_and_replay_is_idempotent(
    spark, small_embed_corpus, tmp_path
):
    """The PQ mirror (ADVICE r13 + verdict item 2): crash the append
    before its manifest commit — the frozen codebooks survive in the
    sidecar; the replayed append self-heals via pq_index_repair and,
    with skip_existing_ids=True, appends 0 instead of duplicating code
    rows; served ADC results match the uncrashed control."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        pq_index_append, pq_index_build, pq_index_search,
    )

    df, query, dim = small_embed_corpus
    base = df.filter(F.col("vec_id") <= 90).localCheckpoint()
    batch = df.filter(F.col("vec_id") > 90).localCheckpoint()
    a, b = str(tmp_path / "pq_crash"), str(tmp_path / "pq_ctl")
    for idx in (a, b):
        pq_index_build(
            base, "vec_id", "embedding", idx, dim=dim, m=4, k=8, iters=2
        )
    assert pq_index_append(batch, b) == batch.count()

    with pytest.MonkeyPatch.context() as mp:
        _fail_manifest_write(mp, at_call=2)
        with pytest.raises(RuntimeError, match="simulated crash"):
            pq_index_append(batch, a)

    fs = vmod._index_fs(spark, a)
    assert not fs.exists(f"{a}/codebooks.json")
    assert fs.exists(f"{a}/codebooks.json.torn")
    with pytest.raises(FileNotFoundError, match="repair"):
        pq_index_search(spark, a, query, topk=7)

    # self-heal + per-id idempotency: the crashed batch WAS committed
    # (the crash hit after the codes append), so the replay appends 0
    assert pq_index_append(batch, a, skip_existing_ids=True) == 0
    assert fs.exists(f"{a}/codebooks.json")
    assert not fs.exists(f"{a}/codebooks.json.torn")
    sa = [tuple(r) for r in pq_index_search(spark, a, query, topk=7).collect()]
    sb = [tuple(r) for r in pq_index_search(spark, b, query, topk=7).collect()]
    assert sa == sb
    # no duplicated ids anywhere in the healed code table
    codes = spark.read.parquet(f"{a}/codes")
    assert codes.count() == codes.select("vec_id").distinct().count()

    # without the guard a replay duplicates — the documented trade-off
    assert pq_index_append(batch.limit(3), a) == 3
    assert spark.read.parquet(f"{a}/codes").count() == df.count() + 3


def test_compact_restores_unset_partition_overwrite_mode(
    spark, small_embed_corpus, tmp_path
):
    """ADVICE r13 (medium): compaction must leave the session conf
    exactly as found — including UNSET. A lingering dynamic mode makes
    a later rebuild into an existing dir overwrite only the clusters
    present in the new assignment, serving stale cells under a fresh
    manifest."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_build, ivf_sq8_index_compact,
        ivf_sq8_index_verify, kmeans_fit,
    )

    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    if prev is not None:
        spark.conf.unset(key)
    try:
        df, query, dim = small_embed_corpus
        base = df.filter(F.col("vec_id") <= 60).localCheckpoint()
        centers, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2)
        idx = str(tmp_path / "conf_restore")
        ivf_sq8_index_build(
            base, "vec_id", "embedding", idx, dim=dim, centers=centers
        )
        for lo, hi in ((60, 90), (90, 999)):
            ivf_sq8_index_append(
                df.filter(
                    (F.col("vec_id") > lo) & (F.col("vec_id") <= hi)
                ).localCheckpoint(),
                idx,
            )
        res = ivf_sq8_index_compact(spark, idx, max_files_per_cell=1)
        assert res["compacted_cells"] > 0
        assert spark.conf.get(key, None) is None, (
            "compact leaked partitionOverwriteMode=dynamic into the "
            "session"
        )
        # the downstream hazard the advice names: a REBUILD into the
        # same dir must fully replace the cells (static overwrite) —
        # with only 2 cells' worth of data, stale extra clusters would
        # fail the verifier's row count
        small = df.filter(F.col("vec_id") <= 30).localCheckpoint()
        c2, _ = kmeans_fit(small, "vec_id", "embedding", k=2, iters=2)
        ivf_sq8_index_build(
            small, "vec_id", "embedding", idx, dim=dim, centers=c2
        )
        rep = ivf_sq8_index_verify(spark, idx)
        assert rep["ok"] and rep["n_rows"] == small.count(), rep
    finally:
        if prev is not None:
            spark.conf.set(key, prev)


def test_append_and_compact_take_the_reliable_checkpoint_path(
    spark, small_embed_corpus, tmp_path
):
    """ADVICE r13 (low): the index append/compact lifecycle threads
    the lineage.truncate_lineage checkpoint_dir knob like the other
    iterative operators — with a dir set, the reliable checkpointer
    actually writes there, and the results are unchanged."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_compact, ivf_sq8_index_verify,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "ckpt"
    )
    ck = str(tmp_path / "reliable_ck")
    assert ivf_sq8_index_append(
        batch, a, skip_existing_ids=True, checkpoint_dir=ck
    ) == batch.count()
    assert ivf_sq8_index_append(
        batch, b, skip_existing_ids=True
    ) == batch.count()
    walked = [
        os.path.join(r, f) for r, _, fs in os.walk(ck) for f in fs
    ]
    assert walked, "reliable checkpoint dir never written"
    assert _serve(spark, a, query) == _serve(spark, b, query)
    assert ivf_sq8_index_compact(
        spark, a, max_files_per_cell=1, checkpoint_dir=ck
    )["compacted_cells"] >= 0
    assert ivf_sq8_index_verify(spark, a)["ok"]
    assert _serve(spark, a, query) == _serve(spark, b, query)


def test_fit_pca_rotation_validates_subspace_divisibility(
    spark, small_embed_corpus
):
    """ADVICE r13 (low): dim % subspaces != 0 must raise a ValueError
    naming both values, not an opaque min()-of-empty-sequence."""
    from kubernetes_logs_datalake_spark.operators.rotation import (
        fit_pca_rotation,
    )

    df, query, dim = small_embed_corpus
    with pytest.raises(ValueError, match=r"dim=8.*subspaces=3"):
        fit_pca_rotation(df, "vec_id", "embedding", dim=8, subspaces=3)


def test_streaming_ingest_epoch_crash_then_replay_self_heals(
    spark, small_embed_corpus, tmp_path
):
    """The end-to-end r13 verdict item-2 scenario: an AnnIngestJob
    epoch crashes inside the manifest window (commit write killed);
    the stream restarts from its checkpoint, REPLAYS the epoch, and
    the replay self-heals the torn index — final serving bit-identical
    to a never-crashed ingest of the same batches."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, ivf_sq8_index_verify, kmeans_fit,
    )
    from kubernetes_logs_datalake_spark.streaming.ann_ingest import (
        AnnIngestJob,
    )

    df, query, dim = small_embed_corpus
    base = df.filter(F.col("vec_id") <= 60).localCheckpoint()
    b1 = df.filter((F.col("vec_id") > 60) & (F.col("vec_id") <= 90))
    b2 = df.filter(F.col("vec_id") > 90)
    centers, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2)
    a, b = str(tmp_path / "stream_crash"), str(tmp_path / "stream_ctl")
    for idx in (a, b):
        ivf_sq8_index_build(
            base, "vec_id", "embedding", idx, dim=dim, centers=centers
        )

    def run_ingest(idx, inbox, ckpt, crash_first_epoch=False):
        job = AnnIngestJob(
            index_dir=idx, checkpoint=ckpt, trigger_seconds=1
        )
        source = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(inbox)
        )
        q = job.start(spark, source)
        try:
            if crash_first_epoch:
                with pytest.MonkeyPatch.context() as mp:
                    _fail_manifest_write(mp, at_call=2)
                    with pytest.raises(Exception):
                        q.processAllAvailable()
                return None
            job.process_available()
        finally:
            try:
                q.stop()
                q.awaitTermination(30)
            except Exception:
                pass
        return job

    inbox_a = str(tmp_path / "inbox_a")
    ckpt_a = str(tmp_path / "ckpt_a")
    b1.coalesce(1).write.mode("append").parquet(inbox_a)
    # epoch 1 crashes inside the manifest window → torn index
    run_ingest(a, inbox_a, ckpt_a, crash_first_epoch=True)
    fs = vmod._index_fs(spark, a)
    assert not fs.exists(f"{a}/manifest.json")
    assert fs.exists(f"{a}/manifest.json.torn")
    # restart: the replayed epoch self-heals, then the next epoch lands
    b2.coalesce(1).write.mode("append").parquet(inbox_a)
    run_ingest(a, inbox_a, ckpt_a)
    assert fs.exists(f"{a}/manifest.json")
    assert not fs.exists(f"{a}/manifest.json.torn")

    inbox_b = str(tmp_path / "inbox_b")
    b1.coalesce(1).write.mode("append").parquet(inbox_b)
    b2.coalesce(1).write.mode("append").parquet(inbox_b)
    run_ingest(b, inbox_b, str(tmp_path / "ckpt_b"))

    assert ivf_sq8_index_verify(spark, a)["n_rows"] == df.count()
    for p in (1, 4):
        assert _serve(spark, a, query, n_probe=p) == _serve(
            spark, b, query, n_probe=p
        ), p


def _duckdb_emb(sf: str, sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    return con.execute(sql).fetchall()


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_imi_knn_join_rotated_oracle_parity(spark, sf):
    """r13 verdict task #4, resolved BUILT: the corpus-dependent
    PCA-balanced rotation is oracle-replayable — the pyarrow/numpy
    refit is bit-identical to the Spark fit (same id-ordered sample,
    same float64 pipeline, deterministic eigh), and the full rotated
    IMI join matches the literal-R SQL oracle hash-for-hash on both
    driver fixtures."""
    import __spark_entry__ as entry

    assert entry._imi_rotation_cached(spark, sf) == \
        entry._imi_rotation_replay(sf)
    got = sorted(
        tuple(r)
        for r in entry._embedding_imi_knn_join_rotated(spark, sf).collect()
    )
    want = sorted(
        tuple(r)
        for r in _duckdb_emb(
            sf, entry._ddb_imi_knn_join_rotated_sql(sf_dir=sf)
        )
    )
    assert got == want
    # full contract shape: rank<=3 per query, no self-pairs
    assert all(r[3] <= 3 and r[0] != r[1] for r in got)


def test_drift_monitor_approx_percentile_agrees_with_exact(
    spark, small_embed_corpus, tmp_path
):
    """r13 verdict task #5 (the at-scale variant): approx_percentile
    drift must track the exact monitor — same n/touched bookkeeping,
    drift_ratio within a tight band on both an in-distribution batch
    and a far-shifted cloud (where what matters is the ORDER of
    magnitude, not the digits)."""
    import numpy as np
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, ivf_sq8_index_drift, kmeans_fit,
    )

    df, query, dim = small_embed_corpus
    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=4, iters=2)
    idx = str(tmp_path / "drift_approx")
    ivf_sq8_index_build(
        df, "vec_id", "embedding", idx, dim=dim, centers=centers
    )

    same = df.filter(F.col("vec_id") % 3 == 0)
    ex = ivf_sq8_index_drift(same, idx)
    ap = ivf_sq8_index_drift(same, idx, approx=True)
    assert ap["n_batch"] == ex["n_batch"]
    assert ap["n_touched_cells"] == ex["n_touched_cells"]
    # GK sketch error is <= 1/accuracy of the RANK; on these small
    # frames the quantiles land within a few percent and the RATIO of
    # two p95s is tighter still
    assert abs(ap["drift_ratio"] - ex["drift_ratio"]) <= 0.05 * max(
        ex["drift_ratio"], 1.0
    ), (ex, ap)

    rng = np.random.default_rng(33)
    far = spark.createDataFrame(
        [
            (1000 + i, [float(v) for v in rng.normal(40.0, 1.0, dim)])
            for i in range(30)
        ],
        "vec_id: long, embedding: array<double>",
    )
    exf = ivf_sq8_index_drift(far, idx)
    apf = ivf_sq8_index_drift(far, idx, approx=True)
    assert apf["drift_ratio"] > 3.0
    # small-n honesty: exact `percentile` INTERPOLATES between order
    # statistics, approx_percentile returns an actual element, so on a
    # ~30-row touched-cell frame the p95s can differ by one inter-rank
    # step (~10 % here) even at accuracy=10000. At real batch sizes
    # the two agree to 4 decimals (SCALE.md r14, n=4k batches) — this
    # fixture-scale bound is the interpolation gap, not sketch error.
    assert abs(apf["drift_ratio"] - exf["drift_ratio"]) <= 0.15 * exf[
        "drift_ratio"
    ], (exf, apf)


def test_index_build_and_append_write_one_file_per_touched_cell(
    spark, small_embed_corpus, tmp_path
):
    """SCALE.md r14: the build/append writes repartition on the
    partition column first, so the file census stays ~1 file per
    (cell, lifecycle event) instead of one per (task x cell) — the
    10M-small-file catastrophe at lake scale, measured 2,634 files for
    99 cells at x10 before the fix."""
    import glob as globmod

    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_build, kmeans_fit,
    )

    df, query, dim = small_embed_corpus
    base = df.filter(F.col("vec_id") <= 90).repartition(8).localCheckpoint()
    batch = df.filter(F.col("vec_id") > 90).repartition(8).localCheckpoint()
    centers, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2)
    idx = str(tmp_path / "layout")
    ivf_sq8_index_build(
        base, "vec_id", "embedding", idx, dim=dim, centers=centers
    )

    def census():
        return len(globmod.glob(f"{idx}/cells/cluster=*/part-*"))

    n_cells = len(globmod.glob(f"{idx}/cells/cluster=*"))
    assert census() <= n_cells, (census(), n_cells)
    before = census()
    ivf_sq8_index_append(batch, idx)
    # the epoch adds at most one file per touched cell (<= n_cells),
    # never one per (task x cell)
    assert census() - before <= n_cells, (census(), before, n_cells)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_r15_queued_ivf_sq8_rotated_oracle_parity(spark, sf):
    """r15-QUEUED (named in NEXT_WINDOW.json): the full OPQ,IVF,SQ8
    STORED-lifecycle composition matches its oracle hash-for-hash on
    both driver fixtures — registration at r15 is the two dict lines.
    Exact-bit literal transport (_ddb_exact_double) is load-bearing
    here: DuckDB's repr-literal parse is off-by-ulp and this oracle's
    fold feeds floor() quantizers."""
    import duckdb

    import __spark_entry__ as entry

    got = sorted(
        tuple(r)
        for r in entry._ann_topk_ivf_sq8_rotated(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entry._ddb_ivf_sq8_rotated_sql(sf_dir=sf)
        ).fetchall()
    )
    assert got == want
    assert len(got) == 10


def test_exact_double_literals_round_trip_through_duckdb():
    """The r14 finding pinned: DuckDB's decimal literal parse is not
    correctly rounded (a repr literal can come back one ulp off), and
    the _ddb_exact_double mantissa-times-power-of-two form transports
    every bit. If DuckDB ever fixes its parser this still passes; if
    the exact form ever breaks, the rotated-SQ8 oracle breaks with it
    — fail here first, with the value named."""
    import random

    import duckdb

    import __spark_entry__ as entry

    rng = random.Random(2)
    vals = [rng.uniform(-1, 1) for _ in range(200)]
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + ", ".join(entry._ddb_exact_double(v) for v in vals)
    ).fetchone()
    bad = [(v, g) for v, g in zip(vals, got) if v != g]
    assert not bad, bad[:3]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_r15_queued_drift_ratio_oracle_parity(spark, sf):
    """r15-QUEUED: the drift MONITOR under the hash gate — the stored
    index's frozen-center distances, the touched-cell cut, Spark
    ``percentile`` vs DuckDB ``quantile_cont`` (same (n-1)p linear
    interpolation), and the ratio all replay bit-for-bit on both
    driver fixtures."""
    import duckdb

    import __spark_entry__ as entry

    got = [tuple(r) for r in entry._ann_drift_ratio(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    want = [tuple(r) for r in con.execute(
        entry._ddb_drift_ratio_sql()
    ).fetchall()]
    assert got == want
    # an in-distribution batch must read inside the calibrated band
    assert 0.9 <= got[0][-1] <= 1.1, got
