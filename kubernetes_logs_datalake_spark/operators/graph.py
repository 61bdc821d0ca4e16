"""Graph operators: transition-edge extraction and PageRank.

Why in a training-data engine: link-graph centrality is a standard
corpus-quality prior — Common-Crawl-derived datasets rank hosts/pages
by (harmonic/Page-) rank before sampling, and sequence models use
transition graphs (session Markov chains) as behavioral features. Both
reduce to the same two kernels: build a weighted edge table, then run a
fixed number of power-method rounds over it.

Spark-first shape (Page et al. 1999 power iteration, the Pregel-free
dataframe formulation):

- the edge→fraction table (``w / out_weight``) is computed ONCE and
  localCheckpoint-ed; every iteration joins ranks to it by source and
  partial-aggregates by destination — one shuffle per round, keyed by
  node id, which stays balanced as long as in-degree is (AQE-handled)
  skewed rather than pathological.
- rank messages are summed as DECIMAL(38,18) (float sum order varies
  with partitioning; decimal sums are order-independent) and each
  round's ranks are rounded to ``scale`` — the repo's exact-reduce
  recipe, making the fixpoint bit-deterministic and therefore
  DuckDB-oracle-checkable by unrolling the rounds into CTEs.
- driver traffic: ZERO per round when the graph has no dangling nodes
  (checked once up front); with dangling nodes, one 1-row fetch per
  round (the dangling mass scalar — the same bounded pattern as
  kmeans_fit's k·dim centroid fetch), which doubles as the per-round
  checkpoint materializer so the twice-referenced rank frame is never
  recomputed through accumulated lineage.

At 100 TB: the corpus-sized tables only ever appear behind (node)-keyed
partial aggregations; per-round state is |nodes| rows, the working set
of any web-scale rank job. Fixed ``iters`` (no convergence collect)
keeps the job DAG static so AQE can plan every round identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lineage import reliable_this_round, truncate_lineage


def transition_edges(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Consecutive-state transition edges per key: the Markov-chain
    view of an event stream.

    Output: (src, dst, n_transitions, p) where p is the row-normalized
    transition probability (rounded to 6). One window pass partitioned
    by key + one (src, dst)-keyed partial agg; the probability
    normalization is a second tiny agg over |states|² rows at most.
    """
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.select(
            F.lag(F.col(state_col)).over(w).alias("src"),
            F.col(state_col).alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_tot = pairs.groupBy("src").agg(
        F.sum("n_transitions").alias("_tot")
    )
    return (
        pairs.join(row_tot, "src")
        .select(
            "src",
            "dst",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("_tot"), 6).alias("p"),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 10,
    damping: float = 0.85,
    scale: int = 12,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Weighted PageRank, fixed ``iters`` power-method rounds.

    Returns (node, rank) with ranks rounded to ``scale`` every round
    (bit-deterministic across partitionings — see module docstring).
    Dangling-node mass is redistributed uniformly each round, the
    Page-et-al convention that keeps Σrank = 1.

    ``checkpoint_dir``/``checkpoint_every`` select reliable round-
    boundary truncation (see :mod:`.lineage`): unset (default) keeps
    the executor-local fast path; set, the invariant frames and every
    ``checkpoint_every``-th round's ranks checkpoint to that FS so the
    job survives executor loss on dynamic/spot clusters. Output is
    bit-identical either way — only the truncation mechanism changes.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    if weight_col is not None:
        # a zero/negative-weight edge would poison the fraction table
        # (0-out-weight node → 0/0 → NULL messages → silently lost rank
        # mass); drop them up front — a node whose edges ALL drop
        # becomes dangling (or leaves the graph if nothing references
        # it), which is the Page-et-al semantics for "no usable links"
        edges = edges.filter(w > 0)
    nodes = truncate_lineage(
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct(),
        checkpoint_dir,
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    out_w = edges.groupBy(src_col).agg(F.sum(w).alias("_ow"))
    # per-edge transition fraction — invariant across rounds, built once
    frac = truncate_lineage(
        edges.join(out_w, src_col)
        .select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            (w / F.col("_ow")).alias("_fr"),
        ),
        checkpoint_dir,
    )
    dangling = truncate_lineage(
        nodes.join(
            edges.select(F.col(src_col).alias("node")).distinct(),
            "node",
            "left_anti",
        ),
        checkpoint_dir,
    )
    # FULL count, not limit(1): the count materializes every partition
    # of the checkpoint, so the per-round semi joins below never
    # recompute the anti-join through lineage (the dedup.py
    # connected-components lesson)
    has_dangling = dangling.count() > 0

    base = (1.0 - damping) / n_nodes
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), scale).alias("rank")
    )
    for _it in range(iters):
        if has_dangling:
            # 1-row fetch; also materializes this round's pending
            # checkpoint so the second reference below never recomputes
            dm_row = (
                ranks.join(dangling, "node", "semi")
                .agg(
                    F.coalesce(
                        F.sum(F.col("rank").cast("decimal(38,18)")),
                        F.lit(0).cast("decimal(38,18)"),
                    ).alias("_dm")
                )
                .collect()[0]
            )
            dangling_share = float(dm_row["_dm"]) / n_nodes
        else:
            dangling_share = 0.0
        summed = (
            frac.join(ranks, frac["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") * F.col("_fr")).alias("_c"),
            )
            .groupBy("node")
            .agg(
                F.sum(F.col("_c").cast("decimal(38,18)"))
                .cast("double")
                .alias("_in")
            )
        )
        ranks = truncate_lineage(
            nodes.join(summed, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.lit(dangling_share)),
                    scale,
                ).alias("rank"),
            ),
            reliable_this_round(checkpoint_dir, _it, checkpoint_every),
        )
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds: list | None = None,
    weight_col: str | None = None,
    iters: int = 10,
    damping: float = 0.85,
    scale: int = 12,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Personalized PageRank (Page et al. 1999 §6; the random-walk-
    with-restart relevance score): identical power method to
    :func:`pagerank` except the teleport distribution concentrates on
    ``seeds`` instead of being uniform — each restart jumps to a seed,
    so ranks measure proximity TO the seed set (the "related items /
    related hosts" primitive corpus curation and recommendation both
    reach for). Conventions, all deterministic and oracle-replayable:

    - teleport mass 1/|S| on each seed PRESENT in the graph (a seed
      with no edges contributes nothing and is dropped; an entirely
      absent seed set raises — an all-zero teleport vector has no
      fixpoint);
    - dangling-node mass is redistributed to the TELEPORT distribution
      (the standard PPR convention — uniform redistribution would leak
      relevance mass to unrelated nodes), so Σrank stays 1;
    - per-round ranks rounded to ``scale``, messages summed as
      DECIMAL(38,18) — bit-deterministic across partitionings, same as
      :func:`pagerank`.

    Non-seed nodes have base teleport 0: their rank is pure damped
    link mass. At lake scale the plan shape is the pagerank one — the
    seed frame is a broadcast semi/left join, never a shuffle."""
    if not seeds:
        raise ValueError(
            "personalized_pagerank: seeds must be a non-empty list"
        )
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    if weight_col is not None:
        edges = edges.filter(w > 0)  # same poisoned-fraction guard
    spark = edges.sparkSession
    nodes = truncate_lineage(
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct(),
        checkpoint_dir,
    )
    seed_df = spark.createDataFrame(
        [(s,) for s in sorted(set(seeds))], ["node"]
    )
    live_seeds = truncate_lineage(
        nodes.join(F.broadcast(seed_df), "node", "semi"), checkpoint_dir
    )
    n_seeds = live_seeds.count()
    if n_seeds == 0:
        raise ValueError(
            f"personalized_pagerank: none of the {len(set(seeds))} "
            "seeds appear in the graph — the teleport vector is zero"
        )

    out_w = edges.groupBy(src_col).agg(F.sum(w).alias("_ow"))
    frac = truncate_lineage(
        edges.join(out_w, src_col)
        .select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            (w / F.col("_ow")).alias("_fr"),
        ),
        checkpoint_dir,
    )
    dangling = truncate_lineage(
        nodes.join(
            edges.select(F.col(src_col).alias("node")).distinct(),
            "node",
            "left_anti",
        ),
        checkpoint_dir,
    )
    has_dangling = dangling.count() > 0

    is_seed = F.col("_seed").isNotNull()
    seeded_nodes = nodes.join(
        F.broadcast(live_seeds.select(F.col("node"), F.lit(1).alias("_seed"))),
        "node",
        "left",
    )
    teleport = F.when(is_seed, F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0))
    # start at the teleport distribution (the walk's t=0 state)
    ranks = seeded_nodes.select(
        "node", F.round(teleport, scale).alias("rank")
    )
    for _it in range(iters):
        if has_dangling:
            dm_row = (
                ranks.join(dangling, "node", "semi")
                .agg(
                    F.coalesce(
                        F.sum(F.col("rank").cast("decimal(38,18)")),
                        F.lit(0).cast("decimal(38,18)"),
                    ).alias("_dm")
                )
                .collect()[0]
            )
            dangling_mass = float(dm_row["_dm"])
        else:
            dangling_mass = 0.0
        summed = (
            frac.join(ranks, frac["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") * F.col("_fr")).alias("_c"),
            )
            .groupBy("node")
            .agg(
                F.sum(F.col("_c").cast("decimal(38,18)"))
                .cast("double")
                .alias("_in")
            )
        )
        # rank = (1-d)·p + d·(link_in + dm·p): the dangling mass dm
        # re-enters through the teleport vector p, not uniformly
        ranks = truncate_lineage(
            seeded_nodes.join(summed, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) * teleport
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0))
                       + F.lit(dangling_mass) * teleport),
                    scale,
                ).alias("rank"),
            ),
            reliable_this_round(checkpoint_dir, _it, checkpoint_every),
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    label_col: str = "label",
    iters: int = 5,
    symmetric: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002 /
    Raghavan et al. 2007, the clamped variant): seed nodes carry fixed
    labels; every round each node adopts the label with the largest
    incoming edge-weight total among its labeled neighbors (ties break
    to the lexicographically smallest label — deterministic). Nodes
    never reached by a labeled path stay NULL.

    ``seeds`` is (node, label). With ``symmetric`` (default) edges
    message both directions, the usual community semantics; weights are
    summed as exact integers/longs when the weight column is integral
    (the transition-count graph), so no decimal dance is needed for
    engine parity — and the oracle unrolls the rounds into MATERIALIZED
    CTEs exactly like PageRank's.

    Per-round plan: one (src=node) hash join to the label frame, one
    (dst, label)-keyed partial agg, one dst-partitioned window for the
    argmax, one left join back to nodes — label state is |nodes| rows,
    lineage truncated per round by localCheckpoint (or reliably, via
    the :func:`pagerank`-style ``checkpoint_dir``/``checkpoint_every``
    knob). Same 100 TB posture as :func:`pagerank`: everything keyed
    on node ids, zero driver traffic.
    """
    from pyspark.sql import Window

    w = (
        F.col(weight_col)
        if weight_col is not None
        else F.lit(1)
    )
    base = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"), w.alias("_w")
    )
    if symmetric:
        base = base.union(
            base.select(
                F.col("_d").alias("_s"), F.col("_s").alias("_d"), "_w"
            )
        )
    base = truncate_lineage(base, checkpoint_dir)
    seed = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.col(label_col).alias("_seed"),
    )
    # (node, _seed) is loop-invariant — join the seed table ONCE here
    # instead of once per round (r15: the per-round verdict join was
    # nodes⋈cand⋈seed; hoisting the constant seed leg drops one join —
    # at scale one fewer node-keyed pass per round, same values since
    # coalesce(_seed, _cand) reads the identical _seed either way).
    nodes = truncate_lineage(
        base.select(F.col("_s").alias("node"))
        .union(base.select(F.col("_d").alias("node")))
        .distinct()
        .join(seed, "node", "left"),
        checkpoint_dir,
    )
    labels = nodes.select("node", F.col("_seed").alias("label"))
    rk = Window.partitionBy("_d").orderBy(F.desc("_ws"), F.asc("label"))
    for _it in range(iters):
        lab = labels.filter(F.col("label").isNotNull()).select(
            F.col("node").alias("_ln"), "label"
        )
        cand = (
            base.join(lab, base["_s"] == F.col("_ln"))
            .groupBy("_d", "label")
            .agg(F.sum("_w").alias("_ws"))
            .withColumn("_rk", F.row_number().over(rk))
            .filter(F.col("_rk") == 1)
            .select(F.col("_d").alias("node"), F.col("label").alias("_cand"))
        )
        labels = truncate_lineage(
            nodes.join(cand, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_seed"), F.col("_cand")).alias("label"),
            ),
            reliable_this_round(checkpoint_dir, _it, checkpoint_every),
        )
    return labels


def auto_time_bucket(
    df: DataFrame,
    node_col: str,
    ts_col: str,
    key_cols: list[str],
    base_width: int,
    target_occupancy: int = 32,
    over_pct: int = 5,
    n_halvings: int = 8,
    sample_mod: int | None = None,
) -> int:
    """Self-tuning co-occurrence window: the widest time bucket (from
    the halving ladder base, base/2, …, base/2^n_halvings) whose
    context occupancy stays at or under ``target_occupancy`` for all
    but ``over_pct`` percent of contexts. This replaces the manual
    density rule (SCALE.md round 7: "narrow the bucket ∝ density by
    hand or the cap returns 0 rows") with a measured pre-pass — when
    activity density grows 10×, the chosen bucket narrows ~10×,
    holding per-context pair work constant, the same scaling family as
    LSH bits ∝ log2(n) and SemDeDup k ∝ n.

    The pre-pass is ONE aggregation: explode each (node, keys, ts) row
    across the candidate widths (a ladder of ≤ n_halvings+1 literals),
    distinct, count nodes per (width, context), then a width-keyed
    2-counter rollup — n_halvings × the kernel's own distinct scan,
    all map-side until the tiny final agg. Selection is pure integer
    arithmetic (n_over · 100 ≤ n_ctx · over_pct), so a SQL oracle
    replays the pick bit-for-bit.

    At 100 TB run the pre-pass on a hash-sample of NODES:
    ``sample_mod=m`` keeps the nodes with ``xxhash64(node) mod m == 0``
    (deterministic — the same m always samples the same nodes, so the
    pick is replayable) and compares ``occupancy·m`` against the
    target, still in exact integers. Occupancy quantiles concentrate
    fast, so the sampled pick matches the full pick once contexts hold
    a few sampled nodes each (tests pin agreement on a 10× fixture);
    the ladder scan then reads 1/m of the rows. Node-sampling (not
    row-sampling) keeps each surviving node's bucket membership exact.

    Choose ``target_occupancy`` under the kernel's hot-key cap: the
    cap stays as the last-resort guard for the over-pct tail, while
    the width keeps TYPICAL contexts well-behaved. Returns the chosen
    width (falls back to the narrowest candidate when even it is too
    dense — the cap then does its loud, cheap refusal).
    """
    if base_width < 1:
        raise ValueError(f"base_width must be >= 1, got {base_width}")
    if not 0 <= over_pct <= 100:
        raise ValueError(f"over_pct must be in [0, 100], got {over_pct}")
    if sample_mod is not None and sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    cands = [base_width >> i for i in range(n_halvings + 1) if base_width >> i]
    scale = sample_mod if sample_mod else 1
    src = df
    if sample_mod and sample_mod > 1:
        src = df.filter(
            F.pmod(F.xxhash64(F.col(node_col)), F.lit(sample_mod)) == 0
        )
    occ = (
        src.select(
            F.col(node_col).alias("_n"), *key_cols, F.col(ts_col).alias("_ts")
        )
        .withColumn("_w", F.explode(F.array(*[F.lit(w) for w in cands])))
        .select(
            "_w",
            *key_cols,
            (F.col("_ts") - F.col("_ts") % F.col("_w")).alias("_b"),
            "_n",
        )
        .distinct()
        .groupBy("_w", *key_cols, "_b")
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    stats = {
        r._w: (r.n_ctx, r.n_over)
        for r in occ.groupBy("_w")
        .agg(
            F.count(F.lit(1)).alias("n_ctx"),
            F.sum(
                F.when(
                    F.col("_occ") * F.lit(scale) > target_occupancy, 1
                ).otherwise(0)
            ).alias("n_over"),
        )
        .collect()
    }
    for w in cands:  # widest first
        n_ctx, n_over = stats.get(w, (0, 0))
        if n_over * 100 <= n_ctx * over_pct:
            return w
    return cands[-1]


def cooccurrence_edges(
    df: DataFrame,
    node_col: str,
    key_cols: list[str],
    min_shared: int = 2,
    max_nodes_per_key: int | None = None,
) -> DataFrame:
    """Undirected co-occurrence edges: two nodes are connected when
    they share at least ``min_shared`` distinct keys (key = the tuple
    of ``key_cols``) — the blocking-style graph builder behind
    "users active in the same context", "docs citing the same page".

    Output: (src, dst, n_shared) with ``src < dst`` (one row per
    undirected edge).

    Scale shape: distinct (node, key) → key-keyed self equi-join →
    pair-keyed partial agg. A key shared by d nodes emits C(d,2) pairs,
    so the join degree is Σd² over keys — the SAME hot-key hazard as
    the shingle inverted index, with the same guard:
    ``max_nodes_per_key`` drops keys hotter than the cap before the
    join (stopword-keys carry no pairing information anyway). The cap
    is part of the operator's contract — the registered query threads
    it into its DuckDB oracle so correctness holds UNDER the guard,
    exactly like the MinHash family's ``max_df``.
    """
    keys = df.select(F.col(node_col).alias("_n"), *key_cols).distinct()
    if max_nodes_per_key is not None:
        kc = keys.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_kc"))
        keys = (
            keys.join(kc, key_cols)
            .filter(F.col("_kc") <= max_nodes_per_key)
            .drop("_kc")
        )
    a = keys.select(F.col("_n").alias("src"), *key_cols)
    b = keys.select(F.col("_n").alias("dst"), *key_cols)
    return (
        a.join(b, key_cols)
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge table, by
    degree-ordered orientation (the Schank-Wagner / Cohen MapReduce
    rule; Suri-Vassilvitskii 2011 use the same orientation at web
    scale).

    Every edge is directed from its lower-(degree, id) endpoint to the
    higher one, so each triangle is generated exactly once — as a wedge
    at its LOWEST-ranked vertex — and, crucially, a hub of degree d
    contributes wedges only through its (few) lower-ranked neighbors
    instead of C(d,2): the worst-case wedge count drops from Σd² to
    O(|E|^1.5), which is what makes the plan survive power-law degree
    skew at 100 TB.

    Plan: degree agg (one shuffle) → orientation join → wedge self
    equi-join on the low vertex (the rank inequality on the two high
    ends is a post-join filter, so the join stays hash/merge, never a
    nested loop) → one closing equi-join on (v, w) → explode the 3
    corners → node-keyed count. Output: (node, degree, n_triangles)
    for every node of the graph, n_triangles = 0 when none.
    """
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("_u").alias("node"))
        .unionByName(e.select(F.col("_v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("node").alias("_u"), F.col("degree").alias("_du"))
    db = deg.select(F.col("node").alias("_v"), F.col("degree").alias("_dv"))
    both = e.join(da, "_u").join(db, "_v")
    # orient lower (degree, id) -> higher; carry the high end's rank
    # key so the wedge join can order the two high ends BY RANK (the
    # closing edge is stored rank-oriented, so an id-ordered wedge
    # would look up half its closing edges on the wrong side)
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))
    )
    oriented = both.select(
        F.when(u_first, F.col("_u")).otherwise(F.col("_v")).alias("lo"),
        F.when(u_first, F.col("_v")).otherwise(F.col("_u")).alias("hi"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("hdeg"),
    ).localCheckpoint(eager=False)
    x = oriented.select(
        F.col("lo"), F.col("hi").alias("_b"), F.col("hdeg").alias("_bd")
    )
    y = oriented.select(
        F.col("lo"), F.col("hi").alias("_c"), F.col("hdeg").alias("_cd")
    )
    wedges = x.join(y, "lo").filter(
        (F.col("_bd") < F.col("_cd"))
        | ((F.col("_bd") == F.col("_cd")) & (F.col("_b") < F.col("_c")))
    )
    closing = oriented.select(
        F.col("lo").alias("_b"), F.col("hi").alias("_c")
    )
    tri = wedges.join(closing, ["_b", "_c"]).select(
        F.col("lo").alias("_a"), "_b", "_c"
    )
    per_node = (
        tri.select(
            F.explode(F.array(F.col("_a"), F.col("_b"), F.col("_c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 8,
    scale: int = 12,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999), fixed ``iters``
    mutual-reinforcement rounds: authority(v) ← Σ w(u,v)·hub(u), then
    hub(u) ← Σ w(u,v)·authority(v), each half-round L1-normalized.
    Complements PageRank: where PageRank scores global reachability,
    HITS separates "points at good content" (hub — a crawl seed-list
    prior) from "is good content" (authority).

    Returns (node, hub, authority), both rounded to ``scale``.

    Same exact-reduce recipe as :func:`pagerank`: messages sum as
    DECIMAL(38,18) (order-independent under any partitioning), each
    half-round's scores are rounded before they feed the next, so the
    fixpoint is bit-deterministic and the DuckDB oracle can unroll the
    identical rounds. Driver traffic: one 1-row normalization scalar
    per half-round (the bounded pagerank/kmeans pattern), which also
    materializes that half-round's checkpoint so the twice-referenced
    score frame never re-computes through accumulated lineage.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    if weight_col is not None:
        edges = edges.filter(w > 0)
    ew = truncate_lineage(
        edges.select(
            F.col(src_col).alias("_s"),
            F.col(dst_col).alias("_d"),
            w.alias("_w"),
        ),
        checkpoint_dir,
    )
    nodes = truncate_lineage(
        ew.select(F.col("_s").alias("node"))
        .union(ew.select(F.col("_d").alias("node")))
        .distinct(),
        checkpoint_dir,
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    dec = "decimal(38,18)"

    def _half_round(
        scores: DataFrame,
        score_col: str,
        inbound: bool,
        dir_now: str | None = None,
    ):
        """One message pass + L1 normalization. ``inbound`` True sums
        into dst (authority update), False into src (hub update)."""
        join_on, group_to = ("_s", "_d") if inbound else ("_d", "_s")
        msgs = (
            ew.join(
                scores.select(
                    F.col("node").alias(join_on), F.col(score_col)
                ),
                join_on,
            )
            .groupBy(group_to)
            .agg(
                F.sum((F.col(score_col) * F.col("_w")).cast(dec))
                .cast("double")
                .alias("_v")
            )
        )
        raw = truncate_lineage(
            nodes.join(
                msgs.withColumnRenamed(group_to, "node"), "node", "left"
            )
            .select(
                "node",
                F.round(F.coalesce(F.col("_v"), F.lit(0.0)), scale).alias(
                    "_v"
                ),
            ),
            dir_now,
        )
        total = raw.agg(
            F.sum(F.col("_v").cast(dec)).cast("double")
        ).collect()[0][0]
        if not total:
            return raw.withColumnRenamed("_v", score_col)
        return raw.select(
            "node", F.round(F.col("_v") / F.lit(total), scale).alias(score_col)
        )

    init = round(1.0 / n, scale)
    hub = nodes.select("node", F.lit(init).alias("h"))
    auth = None
    for _it in range(iters):
        dir_now = reliable_this_round(checkpoint_dir, _it, checkpoint_every)
        auth = _half_round(
            hub, "h", inbound=True, dir_now=dir_now
        ).withColumnRenamed("h", "a")
        hub = _half_round(
            auth, "a", inbound=False, dir_now=dir_now
        ).withColumnRenamed("a", "h")
    return hub.join(auth, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("authority")
    )


def cooccurrence_similarity(
    df: DataFrame,
    node_col: str,
    key_cols: list[str],
    min_shared: int = 2,
    max_nodes_per_key: int | None = None,
    scale: int = 6,
) -> DataFrame:
    """Node-pair Jaccard similarity over shared key sets — the
    "similar users/docs by shared context" report built on the same
    guarded inverted-index kernel as :func:`cooccurrence_edges`.

    Output: (src, dst, n_shared, jaccard) with ``src < dst``; jaccard
    is computed over the CAPPED key universe when
    ``max_nodes_per_key`` is set (set sizes count the same filtered
    keys the pair counts see, so the ratio stays a true Jaccard of the
    filtered sets — the semantics the oracle mirrors).
    """
    keys = df.select(F.col(node_col).alias("_n"), *key_cols).distinct()
    if max_nodes_per_key is not None:
        kc = keys.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_kc"))
        keys = (
            keys.join(kc, key_cols)
            .filter(F.col("_kc") <= max_nodes_per_key)
            .drop("_kc")
        )
    keys = keys.localCheckpoint(eager=False)
    sizes = keys.groupBy("_n").agg(F.count(F.lit(1)).alias("_sz"))
    a = keys.select(F.col("_n").alias("src"), *key_cols)
    b = keys.select(F.col("_n").alias("dst"), *key_cols)
    pairs = (
        a.join(b, key_cols)
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("_n").alias("src"), F.col("_sz").alias("_sa")),
            "src",
        )
        .join(
            sizes.select(F.col("_n").alias("dst"), F.col("_sz").alias("_sb")),
            "dst",
        )
        .select(
            "src",
            "dst",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("_sa") + F.col("_sb") - F.col("n_shared")),
                scale,
            ).alias("jaccard"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """k-core extraction by fixed-round peeling: repeatedly remove
    nodes of degree < ``k`` (with the edges they carry) until the graph
    stabilizes — the standard coreness/"dense kernel" filter (Seidman
    1983; Batagelj-Zaveršnik peeling) behind spam-ring isolation and
    community seeding.

    Returns (node, core_degree) for nodes surviving ``rounds`` peels,
    with their degree INSIDE the surviving subgraph. Semantics are
    defined as exactly ``rounds`` peel steps (the oracle unrolls the
    same chain); a step that removes nothing is a fixpoint — every
    later step is the identity — so the loop exits early on
    convergence without changing the result. Size ``rounds`` to the
    peel depth, not the node count: each step removes a full frontier,
    so depth is bounded by the longest chain of cascading removals
    (log-ish in practice; the oracle makes an unconverged choice of
    ``rounds`` visible as a hash mismatch, not a silent wrong answer).

    Scale shape (r16): per round, ONE map-side-combined degree
    aggregate over the shrinking symmetric edge table, then the dying
    node set (deg < k, shrinks every round) broadcast into two
    anti-joins — the edges are filtered map-only, never shuffled per
    round, and a celebrity endpoint partial-aggregates across map
    tasks instead of landing one window partition on one task (the
    r15 verdict's §2.5 skew note). Edges only ever shrink, and each
    round's frontier is localCheckpointed with a materializing count
    (the pagerank recipe) so lineage stays flat across rounds. If a
    graph's first-round dying set were ever too large to broadcast
    (deg < k for most nodes), lower the first peel to a plain
    aggregate+join; every later round's dying set only shrinks.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sym = edges.select(
        F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    ).union(
        edges.select(F.col(dst_col).alias("_a"), F.col(src_col).alias("_b"))
    )
    cur = truncate_lineage(sym, checkpoint_dir)
    n_edges = cur.count()
    # Per-round peel: ONE partial-aggregated degree count over the
    # symmetric edges (groupBy _a covers every node — map-side partials
    # absorb celebrity endpoints, unlike the r15 partition-count
    # windows, which landed a hot node's whole edge partition in one
    # task: the §2.5 skew magnet the r15 verdict flagged), then the
    # DYING set (deg < k — shrinks every round) broadcast into two
    # null-safe anti-joins, so the edge table itself is filtered
    # map-only, never shuffled per round. Same predicate as before —
    # an edge survives iff deg(_a) >= k AND deg(_b) >= k — now at one
    # skew-proof exchange per round instead of two skew-prone ones.
    for _it in range(rounds):
        dying = (
            cur.groupBy("_a")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") < k)
            .select(F.col("_a").alias("_dying"))
        )
        nxt = truncate_lineage(
            cur.join(
                F.broadcast(dying),
                F.col("_a").eqNullSafe(F.col("_dying")),
                "left_anti",
            )
            .join(
                F.broadcast(dying),
                F.col("_b").eqNullSafe(F.col("_dying")),
                "left_anti",
            )
            .select("_a", "_b"),
            reliable_this_round(checkpoint_dir, _it, checkpoint_every),
        )
        n_next = nxt.count()
        if n_next == n_edges:
            break
        cur, n_edges = nxt, n_next
    return (
        cur.groupBy(F.col("_a").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy("node")
    )
