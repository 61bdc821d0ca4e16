"""Round-15 additions.

- repair hardening (r14 verdict task #6): a malformed compact sidecar
  must RAISE instead of silently committing an unverified layout, and
  repair reports WHICH cells it touched;
- the drift-advisor lifecycle wiring (task #4) is covered in
  test_round15_advisor.py.

Reference parity: the reference has no index lifecycle — these pins
protect the Spark-first extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import json as js

import pytest
from pyspark.sql import functions as F

from test_round14_ops import (  # reuse the r14 crash harness
    _build_pair,
    _fail_manifest_write,
    _serve,
    small_embed_corpus,  # noqa: F401 — fixture re-export
)


def test_repair_raises_on_malformed_compact_sidecar(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    """r14 verdict task #6: the compact branch used to restore the
    manifest when a (hand-damaged) sidecar lacked ``crowded`` /
    ``rows_crowded`` — committing a layout it could not verify. A
    genuine compact sidecar always carries both (the compactor returns
    early, without invalidating, when nothing is crowded), so a
    missing field is damage and must refuse."""
    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_repair,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "malformed"
    )
    fs = vmod._index_fs(spark, a)
    cfg = js.loads(fs.read_small(f"{a}/manifest.json"))

    for damaged in (
        {"op": "compact", "cfg": cfg},                      # both missing
        {"op": "compact", "cfg": cfg, "crowded": []},       # vacuous
        {"op": "compact", "cfg": cfg, "crowded": [0]},      # count missing
        {"op": "compact", "cfg": cfg, "rows_crowded": 90},  # cells missing
    ):
        fs.write_small_atomic(
            f"{a}/manifest.json.torn", js.dumps(damaged).encode()
        )
        fs.delete(f"{a}/manifest.json")
        with pytest.raises(RuntimeError, match="malformed"):
            ivf_sq8_index_repair(spark, a)
        # the refusal must leave the torn state intact for forensics
        assert fs.exists(f"{a}/manifest.json.torn")
        assert not fs.exists(f"{a}/manifest.json")
        # restore the healthy state for the next variant
        fs.write_small_atomic(
            f"{a}/manifest.json", js.dumps(cfg).encode()
        )
        fs.delete(f"{a}/manifest.json.torn")

    # the undamaged index still serves identically to the control
    assert _serve(spark, a, query) == _serve(spark, b, query)


def test_repair_reports_touched_and_repaired_cells(
    spark, small_embed_corpus, tmp_path  # noqa: F811
):
    """The repair report names its blast radius: an append repair
    reports the sidecar's touched-cell fingerprint; a compact repair
    reports the crowded cells it re-verified and whether it had to
    deduplicate."""
    from kubernetes_logs_datalake_spark.operators import vectors as vmod
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_repair,
    )

    a, b, batch, query, dim = _build_pair(
        spark, small_embed_corpus, tmp_path, "report"
    )

    # append crash (post data mutation, pre commit) -> touched_cells
    with pytest.MonkeyPatch.context() as mp:
        _fail_manifest_write(mp, at_call=2)
        with pytest.raises(RuntimeError, match="simulated crash"):
            ivf_sq8_index_append(batch, a, skip_existing_ids=True)
    fs = vmod._index_fs(spark, a)
    sidecar = js.loads(fs.read_small(f"{a}/manifest.json.torn"))
    rep = ivf_sq8_index_repair(spark, a)
    assert rep["repaired"] and rep["op"] == "append"
    assert rep["touched_cells"] == sorted(
        int(c) for c in sidecar["touched"]
    )
    assert rep["verify"]["ok"]

    # compact-shaped sidecar over a consistent cell set -> the report
    # names the re-verified cells and records that no dedup was needed
    cfg = js.loads(fs.read_small(f"{a}/manifest.json"))
    cells = spark.read.parquet(f"{a}/cells")
    crowded = [
        int(r["cluster"])
        for r in cells.select("cluster").distinct().limit(2).collect()
    ]
    n = cells.filter(F.col("cluster").isin(crowded)).count()
    vmod._invalidate_manifest(
        fs, f"{a}/manifest.json", cfg, op="compact",
        crowded=crowded, rows_crowded=n,
    )
    rep2 = ivf_sq8_index_repair(spark, a)
    assert rep2["repaired"] and rep2["op"] == "compact"
    assert rep2["repaired_cells"] == sorted(crowded)
    assert rep2["deduplicated"] is False
    assert rep2["verify"]["ok"]


# ----------------------------- r16-QUEUED rows (capacity-policy cap: 2)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_r16_queued_personalized_pagerank_oracle_parity(spark, sf):
    """r16-QUEUED (named in NEXT_WINDOW.json plans['16'].planned_new):
    personalized PageRank over the event-transition graph — seeded
    teleport vector, teleport-directed dangling redistribution,
    decimal-exact message sums — matches the unrolled-CTE oracle
    bit-for-bit on both driver fixtures. Registration at r16 is the
    two dict lines."""
    import duckdb

    import __spark_entry__ as entry

    got = sorted(
        tuple(r)
        for r in entry._events_personalized_pagerank(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(
        entry._ddb_ppr_sql(
            entry._PAGERANK_ITERS, entry._PAGERANK_DAMPING,
            entry._PPR_SEEDS,
        )
    ).fetchall())
    assert got == want
    # mass conservation: Σrank = 1 (teleport + dangling both re-enter)
    total = sum(r for _n, r in got)
    assert abs(total - 1.0) < 1e-9, total
    # relevance concentrates on/near the seeds: every seed outranks
    # the uniform share
    ranks = dict(got)
    for s in entry._PPR_SEEDS:
        assert ranks[s] > 1.0 / len(ranks), (s, ranks)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_r16_queued_recall_ivf_sq8_rotated_oracle_parity(spark, sf):
    """r16-QUEUED: the honest-recall instrument for the stored
    OPQ,IVF,SQ8 composition — raw-space brute force vs the rotated
    probed serve — matches the nested-chain oracle on both fixtures."""
    import duckdb

    import __spark_entry__ as entry

    got = [tuple(r) for r in
           entry._ann_recall_ivf_sq8_rotated(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    want = [tuple(r) for r in con.execute(
        entry._ddb_recall_ivf_sq8_rotated_sql(sf_dir=sf)
    ).fetchall()]
    assert got == want
    assert got[0][0] == 10 and 0.0 <= got[0][2] <= 1.0


def test_personalized_pagerank_contracts(spark):
    """Operator contracts: seed validation raises; dangling mass
    re-enters through the SEEDS (not uniformly) — a sink node's mass
    flows back to the seed set, so non-seed, non-reachable nodes stay
    at rank 0."""
    from kubernetes_logs_datalake_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("d", "a", 1)],
        "src string, dst string, n int",
    )
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank(edges, "src", "dst", seeds=[])
    with pytest.raises(ValueError, match="none of the"):
        personalized_pagerank(edges, "src", "dst", seeds=["zz"])

    out = personalized_pagerank(
        edges, "src", "dst", seeds=["a"], weight_col="n", iters=12
    )
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    # Σ = 1; 'c' is a sink whose mass restarts at 'a'; 'd' has no
    # in-links and is not a seed -> exactly 0
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["d"] == 0.0
    assert ranks["a"] > ranks["b"] > ranks["c"] > 0
