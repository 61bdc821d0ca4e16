"""Graph operators: transition edges + PageRank against hand-computed
fixpoints (Page et al. 1999 §2.1 semantics: damping 0.85, uniform
dangling redistribution, Σrank = 1)."""

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.graph import (
    pagerank,
    transition_edges,
)


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_cycle_is_uniform(spark):
    # 3-cycle: symmetric, so rank is exactly 1/3 everywhere at every
    # iteration — any deviation means mass is leaking
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    r = _ranks(pagerank(e, iters=5))
    assert r == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, abs=1e-9)


def test_pagerank_star_and_mass_conservation(spark):
    # a,b,c all point to hub d; d points back to a.
    e = spark.createDataFrame(
        [("a", "d"), ("b", "d"), ("c", "d"), ("d", "a")], ["src", "dst"]
    )
    out = pagerank(e, iters=30)
    r = _ranks(out)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    # hub collects from 3 sources, must dominate; b and c only get the
    # teleport floor and are exactly symmetric
    assert r["d"] > r["a"] > r["b"]
    assert r["b"] == pytest.approx(r["c"], abs=1e-12)
    assert r["b"] == pytest.approx(0.15 / 4, abs=1e-9)


def test_pagerank_dangling_mass_redistributed(spark):
    # b has no out-edges: its rank must re-enter the system uniformly,
    # keeping the total at 1 (not decaying toward the teleport floor)
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    r = _ranks(pagerank(e, iters=40))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    # fixpoint by hand: ra = 0.075 + 0.425*rb ; rb = 0.075 + 0.425*rb + 0.85*ra
    # => rb = 0.13875/0.21375 ≈ 0.649123, ra ≈ 0.350877
    assert r["a"] == pytest.approx(0.350877, abs=1e-4)
    assert r["b"] == pytest.approx(0.649123, abs=1e-4)


def test_pagerank_weighted_edges(spark):
    # a splits 3:1 between b and c — b must get 3× c's damped share
    e = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        ["src", "dst", "n"],
    )
    r = _ranks(pagerank(e, weight_col="n", iters=30))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    damped_b = (r["b"] - 0.15 / 3) / 0.85
    damped_c = (r["c"] - 0.15 / 3) / 0.85
    assert damped_b == pytest.approx(3 * damped_c, rel=1e-3)


def test_pagerank_deterministic_across_partitionings(spark):
    rows = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    e1 = spark.createDataFrame(rows, ["src", "dst"])
    e2 = e1.repartition(13, "dst")
    assert _ranks(pagerank(e1, iters=8)) == _ranks(pagerank(e2, iters=8))


def test_transition_edges_counts_and_probs(spark):
    rows = [
        ("u1", 1, "view"),
        ("u1", 2, "click"),
        ("u1", 3, "view"),
        ("u1", 4, "click"),
        ("u2", 1, "view"),
        ("u2", 2, "buy"),
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "state"])
    out = {
        (r["src"], r["dst"]): (r["n_transitions"], r["p"])
        for r in transition_edges(df, "user", "ts", "state").collect()
    }
    # u1: view→click, click→view, view→click ; u2: view→buy
    assert out[("view", "click")] == (2, pytest.approx(2 / 3))
    assert out[("view", "buy")] == (1, pytest.approx(1 / 3))
    assert out[("click", "view")] == (1, pytest.approx(1.0))


def test_transition_edges_tiebreak_is_stable(spark):
    # equal order keys: the tiebreak column pins the sequence
    rows = [("u", 1, 2, "b"), ("u", 1, 1, "a"), ("u", 1, 3, "c")]
    df = spark.createDataFrame(rows, ["user", "ts", "eid", "state"])
    out = transition_edges(df, "user", "ts", "state", tiebreak_col="eid")
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_pagerank_drops_nonpositive_weight_edges(spark):
    # a's only out-edge has weight 0 → dropped → a is dangling; mass
    # must still sum to 1 (no silent NULL-message leak)
    e = spark.createDataFrame(
        [("a", "b", 0), ("b", "a", 1), ("c", "a", 2)], ["src", "dst", "n"]
    )
    out = {r["node"]: r["rank"] for r in pagerank(e, weight_col="n", iters=20).collect()}
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-6)
    assert set(out) == {"a", "b", "c"}


def test_transition_edges_null_states_dropped(spark):
    rows = [("u", 1, "a"), ("u", 2, None), ("u", 3, "b")]
    df = spark.createDataFrame(rows, ["user", "ts", "state"])
    got = {(r["src"], r["dst"]) for r in transition_edges(df, "user", "ts", "state").collect()}
    # NULL breaks the chain on both sides: no a→NULL, no NULL→b
    assert got == set()


def test_pq_adc_rejects_wrong_query_dim(spark):
    from kubernetes_logs_datalake_spark.operators.vectors import pq_adc_topk

    df = spark.createDataFrame([(1, [0.0] * 8)], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        pq_adc_topk(df, "vec_id", "embedding", [0.0] * 5, dim=8, m=2, k=1, iters=1)


def test_pagerank_oracle_matches_on_dangling_graph(spark):
    """The generated DuckDB oracle's dangling-mass CTEs are untested by
    the driver fixture (its event graph has no dangling nodes); this
    pins oracle == operator on a graph where the terminal state 'end'
    only ever appears as a destination."""
    import duckdb

    import __spark_entry__ as e

    rows = []
    eid = 0
    for u in range(6):
        for i, et in enumerate(["start", "mid", "end"]):
            rows.append((eid, u, et, i))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "t"])
    edges = transition_edges(df, "user_id", "t", "event_type", tiebreak_col="event_id")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, weight_col="n_transitions", iters=10, damping=0.85
        ).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i},{u},'{t}',TIMESTAMP '2024-01-01' + INTERVAL ({k}) SECOND)"
            for i, u, t, k in rows
        )
        + ") v(event_id, user_id, event_type, ts)"
    )
    sql = e._ddb_pagerank_sql(10, 0.85)
    oracle = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert oracle == got


def _lpa(spark, edges_rows, seeds_rows, **kw):
    from kubernetes_logs_datalake_spark.operators.graph import label_propagation

    e = spark.createDataFrame(edges_rows, ["src", "dst", "n"])
    s = spark.createDataFrame(seeds_rows, ["node", "label"])
    out = label_propagation(e, s, weight_col="n", **kw)
    return {r["node"]: r["label"] for r in out.collect()}


def test_label_propagation_two_communities(spark):
    # two triangles bridged by one weak edge; one seed per side
    edges = [
        ("a", "b", 5), ("b", "c", 5), ("c", "a", 5),
        ("x", "y", 5), ("y", "z", 5), ("z", "x", 5),
        ("c", "x", 1),
    ]
    got = _lpa(spark, edges, [("a", "L"), ("x", "R")], iters=5)
    assert got == {"a": "L", "b": "L", "c": "L", "x": "R", "y": "R", "z": "R"}


def test_label_propagation_seeds_are_clamped(spark):
    # a surrounded by R-labeled neighbors keeps its seed label
    edges = [("a", "x", 9), ("a", "y", 9)]
    got = _lpa(spark, edges, [("a", "L"), ("x", "R"), ("y", "R")], iters=4)
    assert got["a"] == "L"


def test_label_propagation_unreachable_stays_null(spark):
    edges = [("a", "b", 1), ("c", "d", 1)]
    got = _lpa(spark, edges, [("a", "L")], iters=3)
    assert got["b"] == "L"
    assert got["c"] is None and got["d"] is None


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    # b hears A and B with equal weight: deterministic min-label win
    edges = [("a1", "b", 3), ("a2", "b", 3)]
    got = _lpa(spark, edges, [("a1", "B"), ("a2", "A")], iters=2)
    assert got["b"] == "A"


def test_label_propagation_deterministic_across_partitionings(spark):
    from kubernetes_logs_datalake_spark.operators.graph import label_propagation

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 17}", (i % 4) + 1) for i in range(40)]
    e1 = spark.createDataFrame(edges, ["src", "dst", "n"])
    s = spark.createDataFrame([("n0", "P"), ("n9", "Q")], ["node", "label"])
    a = {r["node"]: r["label"] for r in label_propagation(e1, s, weight_col="n").collect()}
    b = {
        r["node"]: r["label"]
        for r in label_propagation(e1.repartition(7), s, weight_col="n").collect()
    }
    assert a == b
