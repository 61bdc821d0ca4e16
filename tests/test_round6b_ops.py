"""Round-6 additions: truncated EWMA, quantile calibration, tokenizer
fertility semantics."""

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.curate import quantile_calibrate
from kubernetes_logs_datalake_spark.operators.profile import (
    ewma_smooth,
    ewma_weights,
)


def test_ewma_matches_recursive_reference(spark):
    # constant series: EWMA of a constant is the constant, exactly,
    # including at the renormalized series head
    rows = [("k", t, 5.0) for t in range(20)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = ewma_smooth(df, ["k"], "t", "x", alpha=0.3, horizon=12)
    assert all(r["ewma"] == pytest.approx(5.0) for r in out.collect())


def test_ewma_step_response(spark):
    # step 0→10 at t=10: smoothed value must rise monotonically toward
    # 10 and reach within the truncation tail by t=22
    rows = [("k", t, 0.0 if t < 10 else 10.0) for t in range(30)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        r["t"]: r["ewma"]
        for r in ewma_smooth(df, ["k"], "t", "x", alpha=0.3, horizon=12).collect()
    }
    assert got[9] == pytest.approx(0.0)
    seg = [got[t] for t in range(10, 23)]
    assert all(b > a for a, b in zip(seg, seg[1:]))
    # after horizon+1 steps every contributing lag is 10
    assert got[23] == pytest.approx(10.0)
    # hand value at the step: only the j=0 lag sees the 10, and only
    # lags j=0..10 exist at t=10, so the head renormalizes over w[:11]
    w = ewma_weights(0.3, 12)
    assert got[10] == pytest.approx(round(w[0] * 10 / sum(w[:11]), 6), abs=1e-6)


def test_ewma_is_per_key(spark):
    rows = [("a", 0, 1.0), ("a", 1, 1.0), ("b", 0, 9.0), ("b", 1, 9.0)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma_smooth(df, ["k"], "t", "x").collect()
    }
    assert got[("a", 1)] == pytest.approx(1.0)
    assert got[("b", 1)] == pytest.approx(9.0)


def test_quantile_calibrate_keeps_top_fraction_per_group(spark):
    # group A scores 0..9, group B scores 100..109: a raw-score cutoff
    # would drop ALL of A; the calibrated gate keeps half of each
    rows = [("A", f"a{i}", float(i)) for i in range(10)] + [
        ("B", f"b{i}", 100.0 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "score"])
    out = quantile_calibrate(df, "score", "source", "doc_id", keep_frac=0.5)
    kept = out.filter("keep").groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in kept} == {"A": 5, "B": 5}
    # the kept rows are exactly the top scores of each group
    top = {
        r["doc_id"] for r in out.filter("keep").collect()
    }
    assert top == {f"a{i}" for i in range(5, 10)} | {f"b{i}" for i in range(5, 10)}


def test_quantile_calibrate_tie_determinism(spark):
    # all-equal scores: ordering falls to doc_id, so the kept set is
    # stable across partitionings
    rows = [("S", f"d{i:02d}", 1.0) for i in range(8)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "score"])
    a = {r["doc_id"] for r in quantile_calibrate(df, "score", "source", "doc_id", 0.25).filter("keep").collect()}
    b = {
        r["doc_id"]
        for r in quantile_calibrate(
            df.repartition(7), "score", "source", "doc_id", 0.25
        )
        .filter("keep")
        .collect()
    }
    assert a == b == {"d06", "d07"}


def test_fertility_query_consistency(spark):
    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    fert = {
        r["lang"]: r
        for r in e.queries()["docs_tokenizer_fertility"](spark, sf_dir).collect()
    }
    per_doc = e.queries()["text_bpe_estimate"](spark, sf_dir)
    docs = e.queries()["docs_readability"](spark, sf_dir)  # just for count
    assert sum(r["n_docs"] for r in fert.values()) == docs.count()
    # fertility equals the ratio of the per-doc totals
    tot = per_doc.agg(
        F.sum("n_words").alias("w"), F.sum("n_bpe_est").alias("t")
    ).collect()[0]
    overall = sum(r["total_bpe_tokens"] for r in fert.values()) / sum(
        r["total_words"] for r in fert.values()
    )
    assert overall == pytest.approx(tot["t"] / tot["w"])


def test_pq_encode_properties(spark):
    import random

    from kubernetes_logs_datalake_spark.operators.vectors import pq_encode

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = pq_encode(df, "vec_id", "embedding", dim=16, m=4, k=4, iters=2)
    got = out.collect()
    assert len(got) == 80
    for r in got:
        for s in range(4):
            assert 0 <= r[f"code_{s}"] < 4
        assert r["recon_err"] >= 0.0
    # deterministic across partitionings
    again = {
        r["vec_id"]: tuple(r)
        for r in pq_encode(
            df.repartition(7), "vec_id", "embedding", dim=16, m=4, k=4, iters=2
        ).collect()
    }
    assert {r["vec_id"]: tuple(r) for r in got} == again
    # a vector that IS a codebook entry of every subspace would have
    # recon_err 0; weaker invariant that must always hold: mean recon
    # error beats quantizing everything to the zero vector
    import math

    mean_err = sum(r["recon_err"] for r in got) / len(got)
    mean_norm = sum(
        math.sqrt(sum(v * v for v in vec)) for _, vec in rows
    ) / len(rows)
    assert mean_err < mean_norm


def test_pq_rejects_indivisible_dim(spark):
    from kubernetes_logs_datalake_spark.operators.vectors import pq_encode

    df = spark.createDataFrame([(1, [0.0] * 10)], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        pq_encode(df, "vec_id", "embedding", dim=10, m=4)


def test_pq_adc_exact_on_separable_corpus(spark):
    from kubernetes_logs_datalake_spark.operators.vectors import pq_adc_topk

    # k = n distinct vectors: every row seeds its own cluster, so the
    # codebooks ARE the corpus and ADC distance to a corpus-vector
    # query is exactly 0 for that row and strictly positive elsewhere
    protos = [
        [float(10 * (p + 1)) * (1.0 if i % 2 == 0 else -1.0) for i in range(8)]
        for p in range(4)
    ]
    df = spark.createDataFrame(
        list(enumerate(protos)), ["vec_id", "embedding"]
    )
    out = pq_adc_topk(
        df, "vec_id", "embedding", protos[2], dim=8, m=2, k=4, iters=3, topk=4
    ).collect()
    assert out[0]["vec_id"] == 2
    assert out[0]["adc_dist"] == pytest.approx(0.0)
    assert all(r["adc_dist"] > 0 for r in out[1:])


def test_pq_adc_equals_reconstruction_distance(spark):
    import random

    from kubernetes_logs_datalake_spark.operators.vectors import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = [rng.uniform(-1, 1) for _ in range(16)]
    books = pq_codebooks(df, "vec_id", "embedding", dim=16, m=4, k=4, iters=2)
    codes = {
        r["vec_id"]: [r[f"code_{s}"] for s in range(4)]
        for r in pq_encode(df, "vec_id", "embedding", dim=16, m=4, k=4, iters=2).collect()
    }
    got = pq_adc_topk(
        df, "vec_id", "embedding", q, dim=16, m=4, k=4, iters=2, topk=60
    ).collect()
    # ADC distance IS ||q - reconstruction||²: recompute independently
    for r in got:
        expect = 0.0
        for s in range(4):
            c = books[s][codes[r["vec_id"]][s]]
            qs = q[s * 4 : (s + 1) * 4]
            expect += sum((a - b) * (a - b) for a, b in zip(qs, c))
        assert r["adc_dist"] == pytest.approx(expect, abs=1e-5)


def test_pq_index_lifecycle(spark, tmp_path):
    import random

    from kubernetes_logs_datalake_spark.operators.vectors import (
        pq_adc_topk,
        pq_index_build,
        pq_index_search,
    )

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(100)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = [rng.uniform(-1, 1) for _ in range(16)]
    idx = str(tmp_path / "pq_index")
    pq_index_build(df, "vec_id", "embedding", idx, dim=16, m=4, k=8, iters=2)

    served = pq_index_search(spark, idx, q, topk=10).collect()
    direct = pq_adc_topk(
        df, "vec_id", "embedding", q, dim=16, m=4, k=8, iters=2, topk=10
    ).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in direct]

    # the serving scan reads the CODE table only — no embedding column
    plan = pq_index_search(spark, idx, q, topk=10)._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan

    with pytest.raises(ValueError):
        pq_index_search(spark, idx, [0.0] * 7)


def test_ewma_full_horizon_equals_adjusted_ewma(spark):
    """With horizon ≥ series length the truncated EWMA IS the classic
    'adjusted' EWMA (pandas ewm(adjust=True) semantics):
    y_t = Σ(1-α)^j·x_{t-j} / Σ(1-α)^j — the head renormalization makes
    the α factor cancel. Property-checked against a driver-side
    reference over random series."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        xs=st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=1,
            max_size=12,
        ),
        alpha=st.floats(0.05, 0.95),
    )
    def check(xs, alpha):
        df = spark.createDataFrame(
            [("k", t, float(x)) for t, x in enumerate(xs)], ["k", "t", "x"]
        )
        got = {
            r["t"]: r["ewma"]
            for r in ewma_smooth(
                df, ["k"], "t", "x", alpha=alpha, horizon=len(xs)
            ).collect()
        }
        for t in range(len(xs)):
            num = sum(
                (1 - alpha) ** j * xs[t - j] for j in range(t + 1)
            )
            den = sum((1 - alpha) ** j for j in range(t + 1))
            assert got[t] == pytest.approx(num / den, abs=1e-4)

    check()


def test_pretrain_pipeline_stage_monotonicity(spark):
    """Each pipeline stage only REMOVES documents: the full pipeline's
    kept count is bounded by clean_export's (same gate+dedup+split but
    no decontamination/calibration), and the calibration stage keeps
    ~half of what survives decontamination per source."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    pipe = {r["split"]: r for r in e.queries()["docs_pretrain_pipeline"](spark, sf).collect()}
    base = {r["split"]: r for r in e.queries()["docs_clean_export"](spark, sf).collect()}
    n_pipe = sum(r["n_docs"] for r in pipe.values())
    n_base = sum(r["n_docs"] for r in base.values())
    assert 0 < n_pipe < n_base
    # calibration keeps the top half per source: overall keep rate of
    # that stage must be near 50% (ties/rounding move it slightly)
    assert n_pipe <= 0.62 * n_base


def test_decontaminate_bloom_equals_exact_and_prunes(spark):
    from kubernetes_logs_datalake_spark.operators.scrub import (
        decontaminate,
        decontaminate_bloom,
    )

    rows = [(0, "the quick brown fox jumps over the lazy dog today")]
    rows += [(i, f"clean document number {i} with words w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(1, 40)]
    rows.append((40, "the quick brown fox jumps over a fence"))  # shares 5-gram with doc 0
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ev = df.filter("doc_id = 0")
    tr = df.filter("doc_id != 0")
    exact = {tuple(r) for r in decontaminate(tr, ev, "doc_id", "text", n=5).collect()}
    bloom = {tuple(r) for r in decontaminate_bloom(tr, ev, "doc_id", "text", n=5).collect()}
    assert bloom == exact
    assert (40, 2, True) in bloom  # planted: 2 shared 5-grams
    # the pre-filter actually prunes: count grams surviving the bloom
    from kubernetes_logs_datalake_spark.functions.text import shingles
    from kubernetes_logs_datalake_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from pyspark.sql import functions as F

    evg = ev.select(F.explode(shingles("text", 5)).alias("_g")).select(F.md5("_g").alias("_h")).distinct()
    words = bloom_build(evg, "_h")
    trg = tr.select(F.explode(shingles("text", 5)).alias("_g")).select(F.md5("_g").alias("_h"))
    total = trg.count()
    surviving = trg.filter(bloom_might_contain(F.col("_h"), words, 4, 1 << 20)).count()
    assert surviving < 0.2 * total  # clean grams die before the join


def test_quantile_calibrate_singleton_group_keeps_its_row(spark):
    # a source reduced to one document keeps it (percent_rank of a
    # singleton is 0 and would otherwise always fail the threshold)
    rows = [("A", "solo", 5.0)] + [("B", f"b{i}", float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "score"])
    kept = {
        r["doc_id"]
        for r in quantile_calibrate(df, "score", "source", "doc_id", 0.5)
        .filter("keep")
        .collect()
    }
    assert "solo" in kept
    assert kept == {"solo", "b2", "b3"}


def test_dedup_savings_consistency_with_components(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    comp = e.queries()["dedup_components"](spark, sf)
    rep = e.queries()["docs_dedup_savings"](spark, sf).collect()
    # histogram totals must reconcile with the raw components result
    n_nodes = comp.count()
    n_groups = comp.select("keep_id").distinct().count()
    assert sum(r["n_docs"] for r in rep) == n_nodes
    assert sum(r["n_clusters"] for r in rep) == n_groups
    assert sum(r["n_docs_removable"] for r in rep) == n_nodes - n_groups
    for r in rep:
        assert r["cluster_size"] >= 2  # components only contain paired docs
        assert r["chars_removable"] > 0


def test_seasonal_anomaly_semantics(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    rows = e.queries()["events_seasonal_anomaly"](spark, sf).collect()
    assert rows
    from collections import defaultdict

    series = defaultdict(list)
    for r in rows:
        assert r["hod"] == (r["bucket_us"] // 3_600_000_000) % 24
        series[(r["event_type"], r["hod"])].append(r)
    for (et, hod), grp in series.items():
        # the baseline is the group's own mean count
        mean = sum(g["n"] for g in grp) / len(grp)
        assert grp[0]["baseline"] == pytest.approx(mean, abs=1e-6)
        for g in grp:
            assert g["is_anomaly"] == (g["ratio"] >= 2.0)


def test_pq_index_rebuild_serves_new_data(spark, tmp_path):
    import random

    from kubernetes_logs_datalake_spark.operators.vectors import (
        pq_adc_topk,
        pq_index_build,
        pq_index_search,
    )

    rng = random.Random(7)

    def corpus(offset):
        return [
            (offset + i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(40)
        ]

    idx = str(tmp_path / "idx")
    q = [0.5] * 8
    df1 = spark.createDataFrame(corpus(0), ["vec_id", "embedding"])
    pq_index_build(df1, "vec_id", "embedding", idx, dim=8, m=2, k=4, iters=2)
    first = [r["vec_id"] for r in pq_index_search(spark, idx, q, topk=5).collect()]
    assert all(v < 100 for v in first)

    # REBUILD with disjoint ids: the invalidate-first + atomic-rename
    # order must leave a manifest that matches the new codes
    df2 = spark.createDataFrame(corpus(1000), ["vec_id", "embedding"])
    pq_index_build(df2, "vec_id", "embedding", idx, dim=8, m=2, k=4, iters=2)
    served = pq_index_search(spark, idx, q, topk=5).collect()
    assert all(r["vec_id"] >= 1000 for r in served)
    direct = pq_adc_topk(
        df2, "vec_id", "embedding", q, dim=8, m=2, k=4, iters=2, topk=5
    ).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in direct]
