#!/usr/bin/env python
"""Collect recall VALUES (not timings) of every ANN recall harness at a
scale-step fixture — the recall-vs-n table SCALE.md carries now that
the scale corpus is organic (r10 verdict item 4: replicated copies made
every harness read a degenerate 1.0; the seeded Gaussian-mixture
corpus gives the number a deployment actually sizes n_probe/refine_k
from).

Usage: python tools/recall_at_scale.py [copies] — expects the
/tmp/spark_graft_scale_x{copies} fixture (tools/scale_check.py builds
it); prints one JSON line {query: {recall, n_queries, ...}}.

Round-12 addition (r11 verdict "what's missing" #2): the single-probe
harnesses (ann_recall_sq8/ivfpq/mrl) probe ONE fixed query vector, so
on the organic mixture corpora they read degenerate values (the probe
sits in a dense component where near-ties differ by ~1e-4 cosine —
below 8-bit score resolution). The PANEL instruments below average
recall@10 over a deterministic ~100-query panel sampled from the
corpus itself, scoring every leg with the SAME formulas the registered
operators use (SQ8: dot against the decoded codes, the sq8_topk rule;
IVFPQ: ADC L2 — identically ||q − recon||² — restricted to the n_probe
coarse cells ivfadc_topk probes; MRL: prefix-dim cosine), against a
full-precision cosine ground truth. All legs are one broadcast of the
100-row panel against the corpus — no cartesian of the corpus with
itself — so the instrument itself scales linearly in n.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kubernetes_logs_datalake_spark import get_spark

HARNESSES = [
    "ann_recall_ivf_join",
    "ann_recall_ivf_join_probed",
    "ann_recall_ivf_join_adc",
    "ann_recall_mrl",
    # ann_recall_sq8 retired r15 (NEXT_WINDOW.json "retired")
    "ann_recall_ivfpq",
]

PANEL_SIZE = 100
K = 10


def _panel_df(spark, emb, n: int):
    """Deterministic pseudo-random n-query panel: corpus rows ordered
    by xxhash64(vec_id) — same ids for the same fixture every run."""
    from pyspark.sql import functions as F

    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.pmod(F.xxhash64("vec_id"), F.lit(999983)), "vec_id")
        .limit(n)
        .collect()
    )
    return rows


def _qdf(spark, rows, extra=None):
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.functions.vectors import norm

    data = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        + ((extra[int(r["vec_id"])],) if extra else ())
        for r in rows
    ]
    schema = "query_id bigint, _qv array<double>" + (
        ", _probes array<int>" if extra else ""
    )
    return spark.createDataFrame(data, schema).withColumn("_qn", norm("_qv"))


def _topk_ids(scored, k: int, ascending: bool):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = (
        [F.asc("score"), F.asc("vec_id")]
        if ascending
        else [F.desc("score"), F.asc("vec_id")]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "vec_id")
    )


def _mean_recall(exact, approx, k: int) -> dict:
    from pyspark.sql import functions as F

    hits = exact.join(approx, ["query_id", "vec_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("_h"))
    per_q = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(F.coalesce(F.col("_h"), F.lit(0)).alias("_h"))
    )
    row = per_q.agg(
        F.count("*").alias("n"), F.avg(F.col("_h") / k).alias("r")
    ).first()
    return {
        "n_queries": int(row["n"]),
        "k": k,
        "recall": round(float(row["r"]), 4),
    }


def panel_recalls(spark, dest: str, n_panel: int = PANEL_SIZE, k: int = K) -> dict:
    """Mean recall@k over the panel for the SQ8 / IVFPQ / MRL families
    (see module docstring for leg semantics)."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.functions.vectors import (
        cosine_prenorm,
        literal_vector,
        norm,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import (
        kmeans_assign,
        pq_encode,
        sq8_encode,
    )

    dim = entrymod.EMBEDDING_DIM
    emb = entrymod._t(spark, dest, "embeddings").filter(F.col("vec_id") != 0)
    rows = _panel_df(spark, emb, n_panel)
    qdf = F.broadcast(_qdf(spark, rows))

    corpus = emb.select("vec_id", "embedding").withColumn(
        "_n", norm("embedding")
    )
    pairs = corpus.join(qdf, F.col("vec_id") != F.col("query_id"))
    exact = _topk_ids(
        pairs.select(
            "query_id",
            "vec_id",
            cosine_prenorm("embedding", "_qv", "_n", "_qn").alias("score"),
        ),
        k,
        ascending=False,
    ).localCheckpoint(eager=False)

    out: dict = {}

    # ---- SQ8: dot(q, decoded codes), the sq8_topk ranking rule
    mins, maxs = entrymod._sq8_bounds_cached(emb, dest)
    steps = [
        ((mx - mn) / 255.0) if mx > mn else 0.0
        for mn, mx in zip(mins, maxs)
    ]
    Mn, St = literal_vector(mins), literal_vector(steps)
    codes = sq8_encode(emb, "vec_id", "embedding", dim, bounds=(mins, maxs))
    recon = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.element_at(Mn, i.cast("int"))
        + F.element_at(F.col("codes"), i.cast("int")).cast("double")
        * F.element_at(St, i.cast("int")),
    )
    sq8c = codes.select("vec_id", recon.alias("_rv"))
    sq8_pairs = sq8c.join(qdf, F.col("vec_id") != F.col("query_id"))
    dot_qr = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_rv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    out["panel_sq8"] = _mean_recall(
        exact,
        _topk_ids(
            sq8_pairs.select("query_id", "vec_id", dot_qr.alias("score")),
            k,
            ascending=False,
        ),
        k,
    )

    # ---- IVFPQ (full IVFADC): ADC L2 == ||q − (center + residual
    # recon)||², candidates restricted to the query's n_probe cells
    centers, books = entrymod._ivfadc_trained(spark, dest)
    n_probe = entrymod._IVFADC_PROBE
    m, subdim = entrymod._PQ_M, dim // entrymod._PQ_M

    def _sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probes = {
        int(r["vec_id"]): sorted(
            range(len(centers)),
            key=lambda c: _sqd([float(x) for x in r["embedding"]], centers[c]),
        )[:n_probe]
        for r in rows
    }
    qdf_p = F.broadcast(_qdf(spark, rows, extra=probes))
    asg = kmeans_assign(emb, "vec_id", "embedding", centers)
    Cflat = literal_vector([float(v) for c in centers for v in c])
    res = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.element_at(F.col("embedding"), i.cast("int")).cast(
            "double"
        )
        - F.element_at(Cflat, (F.col("cluster") * dim + i).cast("int")),
    )
    resdf = asg.select(
        "vec_id", "cluster", F.explode(F.array(res)).alias("_res")
    )
    enc = pq_encode(
        resdf, "vec_id", "_res", dim, m=m, k=entrymod._PQ_K,
        codebooks=books,
    ).join(asg.select("vec_id", "cluster"), "vec_id")
    def _sub_recon(s):
        # separate scope per subspace: a default-arg lambda would
        # change the HOF lambda's arity for the resolver (the
        # _subspace_d2_struct lesson)
        Bs = literal_vector([float(v) for c in books[s] for v in c])
        code = F.col(f"code_{s}")
        return F.transform(
            F.sequence(F.lit(1), F.lit(subdim)),
            lambda j: F.element_at(Bs, (code * subdim + j).cast("int")),
        )

    parts = [_sub_recon(s) for s in range(m)]
    recon_pq = F.zip_with(
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.element_at(
                Cflat, (F.col("cluster") * dim + i).cast("int")
            ),
        ),
        F.concat(*parts),
        lambda a, b: a + b,
    )
    pqc = enc.select("vec_id", "cluster", recon_pq.alias("_rv"))
    pq_pairs = pqc.join(
        qdf_p,
        (F.col("vec_id") != F.col("query_id"))
        & F.array_contains(F.col("_probes"), F.col("cluster").cast("int")),
    )
    l2 = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_rv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    out["panel_ivfpq"] = _mean_recall(
        exact,
        _topk_ids(
            pq_pairs.select("query_id", "vec_id", l2.alias("score")),
            k,
            ascending=True,
        ),
        k,
    )

    # ---- per-cell SQ8 (r12): dot(q, per-cell decoded codes) — the
    # sq8_cell_topk rule: bounds per √n-IVF-cell, so the 8-bit grid
    # adapts to each cell's local range. Same panel, same ground
    # truth, so out["panel_sq8_cell"] vs out["panel_sq8"] IS the
    # measured value of per-cell bounds on this corpus.
    from kubernetes_logs_datalake_spark.operators.vectors import (
        sq8_cell_bounds,
    )

    n_corpus = entrymod._emb_count_cached(emb, dest, "nz")
    cells_n, fit_mod = entrymod._sqrt_cells(n_corpus)
    cell_centers = entrymod._kmeans_centers_cached(
        emb, dest, "ivfknn", k=cells_n, iters=3, fit_sample_mod=fit_mod
    )
    casg = kmeans_assign(emb, "vec_id", "embedding", cell_centers)
    cb = sq8_cell_bounds(casg, "embedding", dim)
    cjoined = casg.join(F.broadcast(cb), "cluster")
    code_i = lambda i: F.least(  # noqa: E731 — mirror sq8_cell_topk
        F.greatest(
            F.floor(
                (
                    F.element_at(F.col("embedding"), i.cast("int")).cast(
                        "double"
                    )
                    - F.element_at(F.col("mn"), i.cast("int"))
                )
                * F.element_at(F.col("sc"), i.cast("int"))
            ),
            F.lit(0),
        ),
        F.lit(255),
    )
    recon_cell = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.element_at(F.col("mn"), i.cast("int"))
        + code_i(i).cast("double")
        * F.element_at(F.col("iv"), i.cast("int")),
    )
    cellc = cjoined.select("vec_id", recon_cell.alias("_rv"))
    cell_pairs = cellc.join(qdf, F.col("vec_id") != F.col("query_id"))
    out["panel_sq8_cell"] = _mean_recall(
        exact,
        _topk_ids(
            cell_pairs.select("query_id", "vec_id", dot_qr.alias("score")),
            k,
            ascending=False,
        ),
        k,
    )

    # ---- MRL: prefix-dim cosine (truncated_topk's rule)
    dk = entrymod._MRL_DIM
    q16, c16 = F.slice("_qv", 1, dk), F.slice("embedding", 1, dk)
    mrl_pairs = corpus.join(qdf, F.col("vec_id") != F.col("query_id"))
    out["panel_mrl"] = _mean_recall(
        exact,
        _topk_ids(
            mrl_pairs.select(
                "query_id",
                "vec_id",
                cosine_prenorm(c16, q16, norm(c16), norm(q16)).alias("score"),
            ),
            k,
            ascending=False,
        ),
        k,
    )
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dest = f"/tmp/spark_graft_scale_x{copies}"
    if not os.path.exists(os.path.join(dest, "_COMPLETE")):
        raise SystemExit(f"fixture missing: run tools/scale_check.py {copies}")
    spark = get_spark("recall-at-scale")
    qs = entrymod.queries()
    out: dict = {"copies": copies, "fixture": dest}
    for name in HARNESSES:
        try:
            row = qs[name](spark, dest).first().asDict()
            out[name] = {
                k: (round(float(v), 4) if isinstance(v, float) else int(v))
                for k, v in row.items()
            }
        except Exception as exc:  # noqa: BLE001 — record, continue
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
    # IMI join recall on the SAME fixed probe panel as the registered
    # ann_recall_ivf_join harnesses (entrymod._ivf_join_recall), so the
    # IMI-vs-flat-IVF quality comparison shares one metric (r12; the
    # registered harness query lands with the r13 window budget)
    try:
        row = entrymod._ivf_join_recall(
            spark, dest, entrymod._embedding_imi_knn_join(spark, dest)
        ).first().asDict()
        out["ann_recall_imi_join"] = {
            k: (round(float(v), 4) if isinstance(v, float) else int(v))
            for k, v in row.items()
        }
    except Exception as exc:  # noqa: BLE001 — record, continue
        out["ann_recall_imi_join"] = {
            "err": f"{type(exc).__name__}: {exc}"[:200]
        }
    try:
        out.update(panel_recalls(spark, dest))
    except Exception as exc:  # noqa: BLE001 — record, continue
        out["panel_err"] = f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
