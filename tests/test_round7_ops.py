"""Round-7 regression tests for the round-6 ADVICE findings, plus
tests for the round-7 operators added later in the round.

Each advice fix gets the failing case the advice described:
  - docs_quality_calibrated oracle: singleton source group must KEEP
    its only row on both engines (the operator always kept it; the
    oracle used to drop it).
  - jaccard_prefix_join: a threshold that rounds UP at 4 dp (2/3) must
    stay lossless vs the brute-force join.
  - table_profile: DATE columns get real extrema (epoch µs of midnight
    UTC), mirrored by the generated DuckDB oracle.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


# ------------------------------------------- calibrated-keep singleton


def test_quality_calibrated_singleton_source_parity(spark, tmp_path):
    """A source with exactly one document: the operator keeps it
    (percent_rank 0 would otherwise drop a source's only — by
    definition best — doc); the oracle must agree engine-for-engine."""
    rows = [
        (1, "alpha beta gamma delta", "en", "crawl", 22),
        (2, "epsilon zeta eta theta", "en", "crawl", 22),
        (3, "iota kappa lambda mu nu xi", "en", "crawl", 26),
        (4, "omicron pi rho sigma", "en", "crawl", 20),
        (5, "the lone curated document", "en", "curated", 25),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = entrymod._docs_quality_calibrated(spark, str(tmp_path)).collect()
    keep = {r.doc_id: r.keep for r in got}
    assert keep[5] is True  # singleton group always kept

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    orows = con.execute(
        entrymod.oracle_sql()["docs_quality_calibrated"]
    ).fetchall()
    okeep = {r[0]: r[4] for r in orows}
    assert okeep[5] is True
    assert okeep == keep


# --------------------------------- lossless prefix bound at 2/3


def test_prefix_join_lossless_at_threshold_two_thirds(spark):
    """threshold=2/3 rounds UP at 4 dp (0.6667): the old basis-point
    round() shortened the prefix below the PPJoin bound and dropped
    the exactly-at-threshold pair. Constructed so doc A's lossless
    prefix is its first TWO canonical shingles while the rounded-up
    bound kept only one: A = {c,a,b} (c unique so rarest-first), B =
    {a,b}; |A∩B| = 2, |A∪B| = 3 → jaccard exactly 2/3."""
    from kubernetes_logs_datalake_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(1, "c a b"), (2, "a b")], "doc_id long, text string"
    )
    t = 2.0 / 3.0
    brute = {
        (r.id_a, r.id_b): round(r.jaccard, 4)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=t).collect()
    }
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_prefix_join(df, "doc_id", "text", n=1, threshold=t).collect()
    }
    assert brute == {(1, 2): round(t, 4)}
    assert fast == brute


def test_prefix_join_lossless_fuzz_thresholds(spark):
    """Sweep awkward thresholds (round-up and round-down at 4 dp) over
    a corpus with planted dup clusters: prefix join == brute force."""
    from kubernetes_logs_datalake_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    docs = []
    for i in range(24):
        base = f"w0 w1 w2 u{i} v{i}"
        docs.append((2 * i, base))
        if i % 4 == 0:
            docs.append((2 * i + 1, base + f" x{i}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in [1.0 / 3.0, 2.0 / 3.0, 5.0 / 6.0, 0.55555]:
        brute = {
            (r.id_a, r.id_b): round(r.jaccard, 4)
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", n=1, threshold=t
            ).collect()
        }
        fast = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_prefix_join(
                df, "doc_id", "text", n=1, threshold=t
            ).collect()
        }
        assert fast == brute, t


# ------------------------------------------------- DATE extrema


def test_table_profile_date_extrema(spark):
    from kubernetes_logs_datalake_spark.operators.profile import table_profile

    d = spark.createDataFrame(
        [(1, "2021-03-05"), (2, "2020-01-01"), (3, None)],
        "k long, ds string",
    ).select("k", F.col("ds").cast("date").alias("d"))
    prof = {r.column_name: r for r in table_profile(d).collect()}
    row = prof["d"]
    assert row.n_nulls == 1 and row.n_distinct == 2
    # midnight UTC epoch-µs of the min/max dates
    assert row.min_value == 1577836800.0 * 1e6
    assert row.max_value == 1614902400.0 * 1e6


def test_table_profile_date_oracle_parity(spark, tmp_path, monkeypatch):
    """End-to-end: profile orders with o_orderdate cast to a true DATE
    and check the generated DuckDB oracle (kind='date') matches."""
    from kubernetes_logs_datalake_spark.operators.profile import table_profile

    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("o_odate"))
    )
    o.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.column_name: (r.n_rows, r.n_nulls, r.n_distinct, r.min_value, r.max_value)
        for r in table_profile(o).collect()
    }
    monkeypatch.setattr(
        entrymod,
        "_ORDERS_PROFILE_COLS",
        [("o_orderkey", "num"), ("o_odate", "date")],
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(entrymod._ddb_table_profile_sql()).fetchall()
    }
    assert got == want


# =============================================== round-7 operators


def test_triangle_counts_k4_plus_pendant(spark):
    """K4 has 4 triangles, 3 per node; a pendant edge adds none."""
    from kubernetes_logs_datalake_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 9)], "src long, dst long")
    got = {r.node: (r.degree, r.n_triangles) for r in triangle_counts(edges).collect()}
    assert got == {
        1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3), 9: (1, 0),
    }


def test_triangle_counts_no_cartesian_plan(spark):
    p = (
        entrymod.queries()["events_triangle_count"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_cooccurrence_edges_guards(spark):
    from kubernetes_logs_datalake_spark.operators.graph import (
        cooccurrence_edges,
    )

    rows = [
        (1, "a"), (2, "a"), (3, "a"),         # hot key: 3 nodes
        (1, "b"), (2, "b"),
        (1, "c"), (2, "c"),
        (1, "b"),                              # duplicate observation
    ]
    df = spark.createDataFrame(rows, "node long, key string")
    got = {
        (r.src, r.dst): r.n_shared
        for r in cooccurrence_edges(df, "node", ["key"], min_shared=2).collect()
    }
    assert got == {(1, 2): 3}  # keys a,b,c; dup row not double-counted
    # cap drops the hot key entirely: only b,c remain shared
    capped = {
        (r.src, r.dst): r.n_shared
        for r in cooccurrence_edges(
            df, "node", ["key"], min_shared=2, max_nodes_per_key=2
        ).collect()
    }
    assert capped == {(1, 2): 2}


def test_scd2_intervals_tile_timeline(spark):
    from kubernetes_logs_datalake_spark.operators.history import (
        scd2_intervals,
    )

    rows = [
        (7, "a", 10, 0), (7, "a", 20, 1), (7, "b", 30, 2),
        (7, "b", 40, 3), (7, "a", 50, 4),
        (8, "x", 5, 5),
    ]
    df = spark.createDataFrame(rows, "u long, st string, ts long, eid long")
    out = sorted(
        scd2_intervals(df, "u", "st", "ts", "eid").collect(),
        key=lambda r: (r.u, r.valid_from),
    )
    assert [(r.u, r.state, r.valid_from, r.valid_to, r.is_current) for r in out] == [
        (7, "a", 10, 30, False),
        (7, "b", 30, 50, False),
        (7, "a", 50, None, True),
        (8, "x", 5, None, True),
    ]


def test_session_paths_respects_gap(spark):
    from kubernetes_logs_datalake_spark.operators.funnel import (
        session_paths,
    )

    GAP = 100
    rows = [
        (1, "a", 0, 0), (1, "b", 10, 1),      # a>b in session 1
        (1, "c", 500, 2), (1, "d", 510, 3),   # c>d in session 2
        (2, "a", 0, 4), (2, "b", 50, 5),      # a>b again
    ]
    df = spark.createDataFrame(rows, "u long, et string, ts long, eid long")
    got = {
        r.path: r.n
        for r in session_paths(df, "u", "et", "ts", "eid", gap_us=GAP).collect()
    }
    # b>c would cross the gap — must NOT appear
    assert got == {"a>b": 2, "c>d": 1}


def test_zipf_fit_exact_power_law(spark):
    from kubernetes_logs_datalake_spark.operators.textstats import zipf_fit

    # counts = 60/rank: ln f = ln 60 - 1 * ln r -> slope -1, r2 = 1
    counts = {"w1": 60, "w2": 30, "w3": 20, "w4": 15, "w5": 12}
    text = " ".join(w for w, n in counts.items() for _ in range(n))
    df = spark.createDataFrame([(text,)], "text string")
    row = zipf_fit(df, "text", k=5).collect()[0]
    assert row.n_terms == 5
    assert row.slope == -1.0
    assert row.r2 == 1.0


def test_rake_keyphrases_scores(spark):
    from kubernetes_logs_datalake_spark.operators.textstats import (
        rake_keyphrases,
    )

    # 'the' is a stopword; candidates: "red apple" x2, "banana" x1
    # deg(red)=4, freq=2 -> 2; apple -> 2; banana -> 1
    # score("red apple") = 4, score("banana") = 1
    df = spark.createDataFrame(
        [(1, "red apple the red apple the banana")], "doc_id long, text string"
    )
    got = [(r.phrase, r.n, r.score) for r in rake_keyphrases(df, "doc_id", "text").collect()]
    assert got == [("red apple", 2, 4.0), ("banana", 1, 1.0)]


def test_label_ndcg_perfect_and_zero(spark):
    from kubernetes_logs_datalake_spark.operators.similarity import (
        label_relevance_eval,
    )

    # query 0 (label 1): both same-label vectors rank above the
    # opposite-label one -> ndcg = 1; query 10 (label 9): nothing
    # relevant -> ndcg = 0
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),
        (2, [0.8, 0.2], 1),
        (3, [0.0, 1.0], 2),
        (10, [0.5, 0.5], 9),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r.query_id: r
        for r in label_relevance_eval(
            emb, emb.filter("vec_id = 0 or vec_id = 10"), k=3
        ).collect()
    }
    assert out[0].n_rel == 2 and out[0].ndcg == 1.0
    assert out[10].n_rel == 0 and out[10].ndcg == 0.0 and out[10].idcg == 0.0


def test_pq_refine_full_candidates_equals_bruteforce(spark):
    """With n_candidates >= corpus size the refine stage must reproduce
    exact brute-force top-k (the ADC stage can then only propose)."""
    from kubernetes_logs_datalake_spark.operators.similarity import (
        brute_force_topk,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import (
        pq_refine_topk,
    )

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") != 0)
        .limit(120)
    )
    q = [float(v) for v in spark.read.parquet(f"{SF}/embeddings.parquet")
         .filter("vec_id = 0").first()["embedding"]]
    dim = len(q)
    brute = [
        (r.vec_id, round(r.cos, 4))
        for r in brute_force_topk(emb, "embedding", q, k=5).collect()
    ]
    refined = [
        (r.vec_id, r.cos)
        for r in pq_refine_topk(
            emb, "vec_id", "embedding", q, dim=dim, m=4, k=8, iters=1,
            n_candidates=200, topk=5,
        ).collect()
    ]
    assert refined == brute


def test_rake_max_len_drops_megaphrases(spark):
    """A stopword-free document is one giant run: with the cap it must
    contribute NOTHING (no phrase, no word stats); without it, it wins
    every ranking while being useless."""
    from kubernetes_logs_datalake_spark.operators.textstats import (
        rake_keyphrases,
    )

    giant = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, giant), (2, "red apple the red apple")],
        "doc_id long, text string",
    )
    capped = [(r.phrase, r.n) for r in rake_keyphrases(df, "doc_id", "text").collect()]
    assert capped == [("red apple", 2)]
    uncapped = [r.phrase for r in rake_keyphrases(df, "doc_id", "text", max_len=None).collect()]
    assert giant in uncapped


def test_hits_star_graph(spark):
    """Star u->{v1,v2,v3}: u is the only hub (authority 0), spokes are
    pure authorities with equal scores summing to 1."""
    from kubernetes_logs_datalake_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("u", "v1"), ("u", "v2"), ("u", "v3")], "src string, dst string"
    )
    got = {r.node: (r.hub, r.authority) for r in hits(edges, iters=4).collect()}
    assert got["u"][0] == 1.0 and got["u"][1] == 0.0
    for v in ("v1", "v2", "v3"):
        assert got[v][0] == 0.0
        assert abs(got[v][1] - 1 / 3) < 1e-9
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-9


def test_hits_weighted_prefers_heavy_edge(spark):
    from kubernetes_logs_datalake_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("u", "v1", 9.0), ("u", "v2", 1.0)], "src string, dst string, w double"
    )
    got = {r.node: r.authority for r in hits(edges, weight_col="w", iters=3).collect()}
    assert got["v1"] > got["v2"] > 0


def test_cooccurrence_similarity_jaccard(spark):
    from kubernetes_logs_datalake_spark.operators.graph import (
        cooccurrence_similarity,
    )

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "c"),
    ]
    df = spark.createDataFrame(rows, "node long, key string")
    got = {
        (r.src, r.dst): (r.n_shared, r.jaccard)
        for r in cooccurrence_similarity(df, "node", ["key"], min_shared=1).collect()
    }
    # |1∩2|=2, |1∪2|=3; |1∩3|=1, |1∪3|=3
    assert got == {(1, 2): (2, round(2 / 3, 6)), (1, 3): (1, round(1 / 3, 6))}


def test_snapshot_at_point_in_time(spark):
    from kubernetes_logs_datalake_spark.operators.history import (
        scd2_intervals,
        snapshot_at,
    )

    rows = [(7, "a", 10, 0), (7, "b", 30, 1), (8, "x", 50, 2)]
    df = spark.createDataFrame(rows, "u long, st string, ts long, eid long")
    iv = scd2_intervals(df, "u", "st", "ts", "eid")
    at20 = {(r.u, r.state) for r in snapshot_at(iv, 20).collect()}
    assert at20 == {(7, "a")}          # user 8 not yet born at t=20
    at30 = {(r.u, r.state) for r in snapshot_at(iv, 30).collect()}
    assert at30 == {(7, "b")}          # [from, to): boundary flips to b
    at99 = {(r.u, r.state) for r in snapshot_at(iv, 99).collect()}
    assert at99 == {(7, "b"), (8, "x")}


def test_filter_ablation_counts(spark):
    from kubernetes_logs_datalake_spark.operators.webclean import (
        filter_ablation,
    )

    rows = [
        (1, True, True),    # passes both
        (2, False, True),   # fails only a
        (3, False, False),  # fails both
        (4, True, False),   # fails only b
        (5, True, False),   # fails only b
    ]
    df = spark.createDataFrame(rows, "doc_id long, a boolean, b boolean")
    got = {r.rule: (r.n_docs, r.n_fail, r.n_unique_fail, r.fail_frac)
           for r in filter_ablation(df, ["a", "b"]).collect()}
    assert got == {
        "a": (5, 2, 1, 0.4),
        "b": (5, 3, 2, 0.6),
    }


def test_incremental_merge_equals_recompute(spark):
    """merge(state(a), state(b)) must be bit-identical to
    state(a ∪ b), including a group present on only one side."""
    from kubernetes_logs_datalake_spark.operators.incremental import (
        merge_agg_states,
        partial_agg_state,
    )

    a = spark.createDataFrame(
        [("x", 1.25), ("x", 2.50), ("y", 0.75)], "g string, v double"
    )
    b = spark.createDataFrame(
        [("x", 4.00), ("z", 9.99)], "g string, v double"
    )
    merged = {
        r.g: (r.n, float(r.sum_v))
        for r in merge_agg_states(
            partial_agg_state(a, ["g"], ["v"]),
            partial_agg_state(b, ["g"], ["v"]),
            ["g"],
        ).collect()
    }
    full = {
        r.g: (r.n, float(r.sum_v))
        for r in partial_agg_state(a.unionByName(b), ["g"], ["v"]).collect()
    }
    assert merged == full == {
        "x": (3, 7.75), "y": (1, 0.75), "z": (1, 9.99),
    }


def test_ivfadc_recall_on_clustered_corpus(spark):
    """Full IVFADC (coarse + residual-PQ + per-probe tables) must
    surface a query's planted near-duplicate in its top-10 on the
    clustered fixture — and residual encoding should be at least as
    good as raw-vector ADC there."""
    from bench import make_clustered_corpus
    from kubernetes_logs_datalake_spark.operators.vectors import ivfadc_topk

    emb_t, _ = make_clustered_corpus(n_bg_e=300, n_pl_e=60, n_bg_d=0, n_pl_d=0)
    emb = spark.createDataFrame(emb_t.to_pandas())
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    hits = 0
    queries = list(range(300, 306))  # planted-pair bases; dup = qi + 60
    for qi in queries:
        out = ivfadc_topk(
            emb.filter(f"vec_id != {qi}"),
            "vec_id",
            "embedding",
            vecs[qi],
            dim=64,
            n_centroids=8,
            n_probe=4,
            m=4,
            k=16,
            topk=10,
        )
        hits += (qi + 60) in [r["vec_id"] for r in out.collect()]
    assert hits >= 5, f"planted-dup IVFADC recall {hits}/6 < 5/6"


def test_ivfadc_rejects_bad_shapes(spark):
    import pytest as _pytest

    from kubernetes_logs_datalake_spark.operators.vectors import ivfadc_topk

    emb = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError):
        ivfadc_topk(emb, "vec_id", "embedding", [0.0] * 63, dim=64)
    with _pytest.raises(ValueError):
        ivfadc_topk(emb, "vec_id", "embedding", [0.0] * 64, dim=64, m=5)


def test_phrase_search_positions_and_overlaps(spark):
    from kubernetes_logs_datalake_spark.functions.text import phrase_search

    df = spark.createDataFrame(
        [
            (1, "x big table scan y big table scan"),
            (2, "big table only"),
            (3, "a a a"),            # self-overlapping phrase target
            (4, "Big, TABLE scan!"),  # tokenizer normalizes case/punct
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, "doc_id", "text", "big table scan").collect()
    }
    assert got == {1: (2, 1), 4: (1, 0)}
    over = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, "doc_id", "text", "a a").collect()
    }
    assert over[3] == (2, 0)  # overlapping occurrences both count
    import pytest as _pytest
    with _pytest.raises(ValueError):
        phrase_search(df, "doc_id", "text", "!!!")


def test_attribution_credit_models(spark):
    from kubernetes_logs_datalake_spark.operators.funnel import (
        attribution_credit,
    )

    # user 1: v,c,v -> conv at 30; then c -> conv at 50 (single touch)
    # user 2: v at 0, conv at 1000 (out of 100-lookback) -> no credit
    # user 3: touch after the last conversion -> no credit
    rows = [
        (1, "view", 0, 0), (1, "click", 10, 1), (1, "view", 20, 2),
        (1, "purchase", 30, 3),
        (1, "click", 40, 4), (1, "purchase", 50, 5),
        (2, "view", 0, 6), (2, "purchase", 1000, 7),
        (3, "purchase", 0, 8), (3, "view", 10, 9),
    ]
    df = spark.createDataFrame(rows, "u long, et string, ts long, eid long")
    out = {
        r.channel: r
        for r in attribution_credit(
            df, "u", "et", "ts", "eid", ["view", "click"], "purchase",
            lookback=100,
        ).collect()
    }
    # conv 1 (n=3): view rn=1 (first, 0.4), click rn=2 (mid, 0.2),
    # view rn=3 (last, 0.4); linear 1/3 each. conv 2 (n=1): click 1.0.
    assert out["view"].n_touches == 2
    assert (out["view"].credit_first, out["view"].credit_last) == (1, 1)
    assert abs(out["view"].credit_linear - 2 / 3) < 1e-6
    assert abs(out["view"].credit_position - 0.8) < 1e-9
    assert out["click"].n_touches == 2
    assert (out["click"].credit_first, out["click"].credit_last) == (1, 1)
    assert abs(out["click"].credit_linear - (1 / 3 + 1.0)) < 1e-6
    assert abs(out["click"].credit_position - 1.2) < 1e-9
    assert set(out) == {"view", "click"}


def test_expectations_audit_kinds(spark):
    import pytest as _pytest

    from kubernetes_logs_datalake_spark.operators.expectations import (
        expectations_audit,
    )

    rows = [
        (1, "a", 5.0, "1-HIGH"),
        (1, "b", 50.0, "9-BAD"),      # dup id, out-of-range, bad regex
        (2, None, 7.0, "2-MED"),      # null name
        (3, "zz", None, "3-LOW"),     # null value: range check skips
    ]
    df = spark.createDataFrame(rows, "id long, name string, v double, pri string")
    ref = spark.createDataFrame([(1,), (3,)], "k long")
    out = {
        r.check_id: (r.n_violations, r.passed)
        for r in expectations_audit(
            df,
            [
                ("c_fk", "fk", "id", "dim"),
                ("c_nn", "not_null", "name"),
                ("c_pri", "matches", "pri", "^[1-5]-"),
                ("c_range", "range", "v", 0.0, 10.0),
                ("c_set", "in_set", "name", ["a", "b", "zz"]),
                ("c_uniq", "unique", "id"),
            ],
            refs={"dim": (ref, "k")},
        ).collect()
    }
    assert out == {
        "c_fk": (1, False),      # id=2 twice? no — id 2 once, absent from ref
        "c_nn": (1, False),
        "c_pri": (1, False),
        "c_range": (1, False),   # the null v row does NOT count
        "c_set": (0, True),      # nulls skipped
        "c_uniq": (1, False),    # one excess row in the id=1 group
    }
    with _pytest.raises(ValueError):
        expectations_audit(df, [("x", "nope", "id")])
    with _pytest.raises(ValueError):
        expectations_audit(df, [("x", "fk", "id", "missing")])


def test_trend_slopes_exact_line_and_degenerate(spark):
    from kubernetes_logs_datalake_spark.operators.profile import trend_slopes

    rows = (
        # g=a: y = 3x + 2 exactly -> slope 3, intercept 2, r2 = 1
        [("a", x, 3 * x + 2) for x in range(10)]
        # g=b: constant y -> slope 0, r2 NULL (deny = 0)
        + [("b", x, 7) for x in range(5)]
        # g=c: single point -> denx = 0 -> slope NULL
        + [("c", 4, 9)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in trend_slopes(df, "g", "x", "y").collect()}
    assert (out["a"].slope, out["a"].intercept, out["a"].r2) == (3.0, 2.0, 1.0)
    assert out["a"].n_points == 10
    assert out["b"].slope == 0.0 and out["b"].r2 is None
    assert out["c"].slope is None and out["c"].r2 is None


def test_kcore_multiround_peel(spark):
    import pytest as _pytest

    from kubernetes_logs_datalake_spark.operators.graph import kcore

    # 4-clique {1,2,3,4} with a pendant chain 4-5-6: at k=2 the chain
    # peels over TWO rounds (6 first, then 5), the clique survives
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.core_degree for r in kcore(df, k=2, rounds=5).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # rounds=1 stops mid-peel: 6 is gone, 5 (now degree 1) remains
    partial = {r.node: r.core_degree for r in kcore(df, k=2, rounds=1).collect()}
    assert partial == {1: 3, 2: 3, 3: 3, 4: 4, 5: 1}
    # k above the max degree empties the graph
    assert kcore(df, k=5, rounds=4).count() == 0
    with _pytest.raises(ValueError):
        kcore(df, k=0, rounds=3)


def test_range_bounds_and_audit(spark):
    import pytest as _pytest

    from kubernetes_logs_datalake_spark.operators.layout import (
        compute_range_bounds,
        range_partition_audit,
    )

    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    # prefix 'ff...' samples everything -> exact order statistics
    bounds = compute_range_bounds(df, "k", 4, sample_prefix_lt="g")
    assert bounds == [249, 499, 749]  # rank (j*1000) div 4 of 0..999
    out = range_partition_audit(df, "k", 4, sample_prefix_lt="g").collect()
    assert [(r.bucket, r.n_rows, r.min_key, r.max_key) for r in out] == [
        (0, 250, 0, 249),
        (1, 250, 250, 499),
        (2, 250, 500, 749),
        (3, 250, 750, 999),
    ]
    # the real sampled path still partitions every row somewhere
    sampled = range_partition_audit(df, "k", 4).collect()
    assert sum(r.n_rows for r in sampled) == 1000
    assert len(sampled) <= 4
    with _pytest.raises(ValueError):
        compute_range_bounds(df, "k", 1)


def test_temporal_join_semantics(spark):
    from kubernetes_logs_datalake_spark.operators.history import (
        scd2_intervals,
        temporal_join,
    )

    dim_events = [
        (1, "bronze", 10, 0), (1, "gold", 30, 1), (1, "bronze", 50, 2),
        (2, "silver", 20, 3),
    ]
    dim = scd2_intervals(
        spark.createDataFrame(dim_events, "u long, s string, ts long, eid long"),
        "u", "s", "ts", tiebreak_col="eid",
    )
    facts = spark.createDataFrame(
        [(1, 5), (1, 30), (1, 49), (1, 60), (2, 25), (3, 7)],
        "u long, ts long",
    )
    out = {(r.u, r.ts): (r.state, r.state_since)
           for r in temporal_join(facts, dim, "u", "ts").collect()}
    assert out == {
        (1, 5): (None, None),       # before first interval
        (1, 30): ("gold", 30),      # boundary: valid_from <= ts
        (1, 49): ("gold", 30),      # open side: ts < valid_to
        (1, 60): ("bronze", 50),    # current (open) interval
        (2, 25): ("silver", 20),
        (3, 7): (None, None),       # entity absent from the dimension
    }
    assert temporal_join(facts, dim, "u", "ts").count() == 6  # no dup/drop


def test_score_agreement_bins_clamp_and_rates(spark):
    import pytest as _pytest

    from kubernetes_logs_datalake_spark.operators.classify import (
        score_agreement_bins,
    )

    rows = [
        (-5.0, False, False),   # clamps into bin 0, agree
        (0.05, True, False),    # bin 0 (0..1 over [0,1] w/ 10 bins -> b0)
        (0.95, True, True),     # bin 9, agree
        (7.0, False, True),     # clamps into bin 9, disagree
    ]
    df = spark.createDataFrame(rows, "score double, pred boolean, lab boolean")
    out = {r.bin: r for r in score_agreement_bins(
        df, "score", "pred", "lab", lo=0.0, hi=1.0, n_bins=10).collect()}
    assert set(out) == {0, 9}
    assert out[0].n_docs == 2 and out[9].n_docs == 2
    assert out[0].pred_keep_rate == 0.5 and out[0].label_keep_rate == 0.0
    assert out[0].agreement == 0.5
    assert out[9].pred_keep_rate == 0.5 and out[9].label_keep_rate == 1.0
    assert out[9].agreement == 0.5
    assert out[0].mean_score == round((-5.0 + 0.05) / 2, 9)
    with _pytest.raises(ValueError):
        score_agreement_bins(df, "score", "pred", "lab", lo=1.0, hi=1.0)
