"""Distinct-count sketching that stays *oracle-exact*.

``approx_count_distinct`` (HyperLogLog) is the built-in answer, but its
estimate is implementation-defined — no other engine reproduces it, so
correctness checks degrade to rows-only. The K-minimum-values sketch
(Bar-Yossef et al. 2002) has the same one-pass / bounded-state shape,
yet every step is deterministic column algebra over md5, so Spark and
any ANSI engine produce bit-identical estimates — the property this
repo's oracle harness is built on.

Estimator: hash keys to uniform (0,1] via the first 8 md5 hex digits;
keep each group's k smallest distinct hashes; if the group has fewer
than k distinct keys the sketch IS the exact count, otherwise
estimate = (k-1) / h_(k).

At 100 TB: the heavy input first collapses to distinct (group, hash)
pairs with map-side partial aggregation, then a *partitioned* window
keeps k rows per group — Spark ≥3.5 rewrites rank-limit windows into
WindowGroupLimit, pruning to ≤k rows per partition before the shuffle,
so state per group is O(k) end to end (the sketch property), never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(16**8)  # 8 hex digits → uniform on [0, 2^32)


def uniform_hash(col) -> F.Column:
    """Deterministic uniform (0,1] hash of a key — engine-portable:
    md5 8-hex prefix scaled by 2^-32 (+2^-33 to stay nonzero), the same
    recipe in Spark (`conv`) and ANSI SQL (`('0x'||hex)::BIGINT`)."""
    c = F.col(col) if isinstance(col, str) else col
    prefix = F.substring(F.md5(c.cast("string")), 1, 8)
    return (F.conv(prefix, 16, 10).cast("long") + F.lit(0.5)) / F.lit(HASH_SPACE)


def kmv_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Per-group distinct-count estimate via the KMV sketch.

    Returns one row per group: (``*group_cols``, ``est_distinct``
    double). Exact (and flagged so) for groups with < k distinct keys.
    """
    h = uniform_hash(key_col).alias("_h")
    pairs = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = pairs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return topk.groupBy(*group_cols).agg(
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise(F.round((F.lit(float(k - 1))) / F.max("_h"), 4))
        .alias("est_distinct")
    )


def kmv_oracle_sql(
    table: str, key_expr: str, group_cols: list[str], k: int = 256
) -> str:
    """ANSI-SQL mirror of :func:`kmv_distinct` for the DuckDB oracle —
    generated from the same (k, group, key) parameters as the Spark
    plan so the two cannot silently diverge."""
    groups = ", ".join(group_cols)
    return f"""
        WITH pairs AS (
            SELECT DISTINCT {groups},
                   (('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT
                    + 0.5) / {HASH_SPACE!r} AS _h
            FROM {table}
        ), topk AS (
            SELECT *, row_number() OVER (PARTITION BY {groups} ORDER BY _h) AS _rn
            FROM pairs
        )
        SELECT {groups},
               CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                    ELSE round({float(k - 1)!r} / max(_h), 4) END AS est_distinct
        FROM topk WHERE _rn <= {k} GROUP BY {groups}
    """


# ------------------------------------------------- count-min sketch


def cms_bucket(col, j: int, width: int) -> F.Column:
    """Row j's CMS bucket for a key — engine-portable md5 recipe (the
    same family as :func:`uniform_hash`, salted with the row index so
    the depth rows are pairwise-independent-ish)."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{j}:"), c.cast("string"))
    prefix = F.substring(F.md5(salted), 1, 8)
    return (F.conv(prefix, 16, 10).cast("long") % width).alias(f"_b{j}")


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the depth×width count-min sketch (Cormode & Muthukrishnan
    2005) of a key column: one row per (row j, bucket) with its
    collision-summed count.

    This is the bounded-state frequency structure: however many
    distinct keys the input has, the aggregation state is ≤ depth·width
    counters per partition (map-side partial agg) and the shuffle moves
    ≤ depth·width rows per partition — at 100 TB the exact
    ``groupBy(key)`` alternative shuffles one row per distinct key;
    this shuffles a few thousand, period.
    """
    pairs = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    cms_bucket(key_col, j, width).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("p")
    ).select("p.j", "p.bucket")
    return pairs.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each key in ``keys`` (one row per
    key): est = min over the depth rows of the key's bucket count —
    never an underestimate, overestimates only on collisions.

    The join is (j, bucket)-keyed against a ≤ depth·width-row sketch —
    always broadcastable, so querying any number of keys is map-side.
    """
    from pyspark.sql import functions as _F

    probes = keys.select(
        _F.col(key_col),
        *[cms_bucket(key_col, j, width) for j in range(depth)],
    )
    melted = probes.select(
        key_col,
        _F.explode(
            _F.array(*[
                _F.struct(
                    _F.lit(j).alias("j"), _F.col(f"_b{j}").alias("bucket")
                )
                for j in range(depth)
            ])
        ).alias("p"),
    ).select(key_col, "p.j", "p.bucket")
    # LEFT join: a (j, bucket) row absent from the sketch is an empty
    # counter — its count is 0 and it caps the min, so keys never seen
    # at build time estimate 0 instead of being dropped or inflated by
    # whatever collision counts their other rows happen to hit
    return (
        melted.join(_F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(_F.min(_F.coalesce("cnt", _F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-k frequent keys by CMS estimate, with the exact count and
    the collision overestimate alongside (the calibration report that
    tells you whether depth×width is adequate for the corpus).

    Returns k rows: (key, est, exact, overestimate), ordered est desc /
    key asc. The exact count here is the audit column — at 100 TB you
    would drop it and trust the sketch; it is what makes the operator
    oracle-checkable end to end.
    """
    sketch = cms_sketch(df, key_col, depth, width)
    exact = df.groupBy(key_col).agg(F.count("*").alias("exact"))
    est = cms_estimate(exact, sketch, key_col, depth, width)
    out = est.join(exact, key_col).select(
        key_col,
        "est",
        "exact",
        (F.col("est") - F.col("exact")).alias("overestimate"),
    )
    return out.orderBy(F.col("est").desc(), F.col(key_col)).limit(k)


def cms_oracle_sql(
    table: str,
    key_expr: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    key_alias: str = "key",
) -> str:
    """ANSI-SQL mirror of :func:`cms_heavy_hitters`, generated from the
    same (depth, width, k) so the engines cannot silently diverge."""

    def bucket(j: int, key: str) -> str:
        return (
            f"(('0x' || substring(md5('{j}:' || CAST({key} AS VARCHAR)), 1, 8))"
            f"::BIGINT % {width})"
        )

    stacked = " UNION ALL ".join(
        f"SELECT {j} AS j, {bucket(j, key_expr)} AS bucket FROM {table}"
        for j in range(depth)
    )
    probes = " UNION ALL ".join(
        f"SELECT key, {j} AS j, {bucket(j, 'key')} AS bucket FROM exact"
        for j in range(depth)
    )
    return f"""
        WITH sketch AS (
            SELECT j, bucket, count(*) AS cnt FROM ({stacked}) GROUP BY j, bucket
        ), exact AS (
            SELECT {key_expr} AS key, count(*) AS exact FROM {table} GROUP BY 1
        ), probes AS ({probes}),
        est AS (
            SELECT p.key, min(COALESCE(s.cnt, 0)) AS est
            FROM probes p LEFT JOIN sketch s
              ON s.j = p.j AND s.bucket = p.bucket
            GROUP BY p.key
        )
        SELECT est.key AS {key_alias}, est.est, exact.exact,
               est.est - exact.exact AS overestimate
        FROM est JOIN exact ON exact.key = est.key
        ORDER BY est.est DESC, est.key LIMIT {k}
    """


# ------------------------------------------------- KMV set algebra


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    k: int = 256,
    scale: int = 4,
) -> DataFrame:
    """Set-overlap estimation from two KMV sketches (theta-sketch-style
    set algebra over the deterministic md5 hash space): one row with
    (est_a, est_b, est_union, est_intersection, est_jaccard) for the
    two key sets — the audience-overlap / cross-corpus-cardinality
    question answered in bounded state, never materializing either
    distinct set.

    Union comes from the k smallest distinct hashes of the COMBINED
    stream (a KMV sketch is mergeable by construction); intersection
    by inclusion-exclusion, clamped at 0; Jaccard from the two. Every
    estimate is the same deterministic (k-1)/h_(k) estimator as
    :func:`kmv_distinct` (exact below k), so the whole report is
    engine-reproducible.
    """

    def hashes(df: DataFrame, key: str) -> DataFrame:
        return df.select(uniform_hash(key).alias("_h")).distinct()

    def est(hdf: DataFrame, name: str) -> DataFrame:
        topk = hdf.orderBy("_h").limit(k)
        return topk.agg(
            F.when(F.count("*") < k, F.count("*").cast("double"))
            .otherwise(F.round(F.lit(float(k - 1)) / F.max("_h"), scale))
            .alias(name)
        )

    ha = hashes(a, key_a)
    hb = hashes(b, key_b)
    hu = ha.unionAll(hb).distinct()
    out = (
        est(ha, "est_a")
        .crossJoin(est(hb, "est_b"))
        .crossJoin(est(hu, "est_union"))
    )
    inter = F.greatest(
        F.lit(0.0), F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), scale)
    )
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.when(
            F.col("est_union") > 0,
            F.round(inter / F.col("est_union"), scale),
        )
        .otherwise(F.lit(0.0))
        .alias("est_jaccard"),
    )


def histogram_bin_col(value_col: str, lo: float, hi: float, n_bins: int):
    """The ONE deterministic binning expression the histogram family
    shares (batch state, streaming state, drift): floor((v − lo) ·
    n_bins / (hi − lo)) clamped to [0, n_bins−1] — identical IEEE
    operand order in the DuckDB oracles."""
    if hi <= lo:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) * n_bins / F.lit(float(hi - lo)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")


def histogram_state(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Mergeable fixed-grid histogram state: (keys, bin, n) — the
    quantile-sketch family member whose merge is plain count addition
    (union two states, sum n), so partial states from different days /
    partitions / clusters combine exactly like the incremental-agg
    states. One map-only binning expression + one keyed agg.

    Binning is a single deterministic double expression —
    floor((v − lo) · n_bins / (hi − lo)) clamped to [0, n_bins−1] —
    identical IEEE operand order in the DuckDB oracle, so states are
    bit-comparable across engines. NULLs and out-of-range values clamp
    into the edge bins (a production histogram never silently drops;
    pick [lo, hi) from a profile pass — see orders_table_profile).
    """
    bin_ = histogram_bin_col(value_col, lo, hi, n_bins)
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull())
        .select(*keys, bin_.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histogram_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """merge(state(x), state(y)) ≡ state(x ∪ y), bit-identical — the
    mergeability invariant (same contract as incremental.merge_agg_states)."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "bin")
        .agg(F.sum("n").alias("n"))
    )


def histogram_quantiles(
    state: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    n_bins: int,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates from a histogram state: for each q, the
    UPPER EDGE of the first bin whose cumulative count reaches
    ⌈q·N⌉ — a deterministic order statistic over the grid, error
    bounded by one bin width ((hi−lo)/n_bins), which is the knob the
    caller sizes. Each q is snapped to integer BASIS POINTS on the
    driver (round(q·10⁴) — lossless for the p50/p90/p99 family), so
    the rank really is exact integer ceil((bp·N + 10⁴−1) DIV 10⁴):
    no float product anywhere, any engine reproduces every estimate.
    The output q column is bp/10⁴ (identical double to the input for
    4-decimal qs).

    Plan: one key-partitioned cumsum window over ≤ n_bins rows per key
    (the STATE, not the data), then a ≤ |qs|-row semi-explode — the
    serving side never rescans the corpus; states stream in from
    :func:`histogram_state` / :func:`merge_histogram_states`.
    Output: (keys, q, est, max_err), ordered by keys, q.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(*keys)
    width = (hi - lo) / n_bins
    cum = state.withColumn("_cum", F.sum("n").over(w)).withColumn(
        "_tot", F.sum("n").over(tot_w)
    )
    bps = [int(round(float(q) * 10_000)) for q in qs]
    bparr = F.explode(
        F.array(*[F.lit(bp).cast("long") for bp in bps])
    ).alias("_bp")
    exploded = cum.select(*keys, "bin", "_cum", "_tot", bparr)
    # rank = ceil(q·N) exactly: all-integer (bp·N + 9999) DIV 10000
    rank = F.expr("(_bp * _tot + 9999) DIV 10000")
    hit = exploded.filter(F.col("_cum") >= rank)
    first_bin = hit.groupBy(*keys, "_bp").agg(F.min("bin").alias("_b"))
    return first_bin.select(
        *keys,
        (F.col("_bp") / F.lit(10_000.0)).alias("q"),
        F.round(
            F.lit(float(lo)) + (F.col("_b") + 1) * F.lit(float(width)), 6
        ).alias("est"),
        F.round(F.lit(float(width)), 6).alias("max_err"),
    ).orderBy(*keys, "q")


def histogram_drift(
    state_a: DataFrame,
    state_b: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Distribution drift between two histogram states (same grid):
    per key, the total variation distance ½·Σ|pᵢ − qᵢ| — the PSI-role
    drift monitor between a reference window and a current window
    (training-data mix drift, feature drift before a model refresh).

    TVD is computed in EXACT integer algebra: Σ|nᵃᵢ·Nᵇ − nᵇᵢ·Nᵃ| over
    bins as DECIMAL(38,0) (counts ≤ 1e12 keep the cross-products under
    1e24 — far inside DECIMAL38), with ONE double division by 2·Nᵃ·Nᵇ
    at the end. Per-bin probability division first would leave a
    float SUM whose value depends on partial-aggregation order; the
    integer form is associative, so the result is bit-stable on any
    partitioning and any engine. Missing bins on either side count as
    zero via the full outer join. Output: (keys, n_bins_compared,
    n_a, n_b, tvd ∈ [0,1]) ordered by keys.

    Plan: the states are ≤ n_bins rows per key — this is sketch-serving
    arithmetic, the corpus is never rescanned. Σ and N ride one keyed
    agg after a bin-keyed full outer join of the two states.
    """
    a = state_a.select(*keys, "bin", F.col("n").alias("_na"))
    b = state_b.select(*keys, "bin", F.col("n").alias("_nb"))
    both = a.join(b, [*keys, "bin"], "full_outer").select(
        *keys,
        F.coalesce("_na", F.lit(0)).cast("decimal(38,0)").alias("_na"),
        F.coalesce("_nb", F.lit(0)).cast("decimal(38,0)").alias("_nb"),
    )
    from pyspark.sql import Window

    tot = Window.partitionBy(*keys)
    w = both.withColumn("_ta", F.sum("_na").over(tot)).withColumn(
        "_tb", F.sum("_nb").over(tot)
    )
    num = F.sum(
        F.abs(F.col("_na") * F.col("_tb") - F.col("_nb") * F.col("_ta"))
    )
    return (
        w.groupBy(*keys, "_ta", "_tb")
        .agg(
            F.count(F.lit(1)).alias("n_bins_compared"),
            num.alias("_num"),
        )
        .select(
            *keys,
            "n_bins_compared",
            F.col("_ta").cast("long").alias("n_a"),
            F.col("_tb").cast("long").alias("n_b"),
            F.round(
                F.col("_num").cast("double")
                / F.nullif(
                    F.lit(2.0)
                    * F.col("_ta").cast("double")
                    * F.col("_tb").cast("double"),
                    F.lit(0.0),
                ),
                9,
            ).alias("tvd"),  # NULL (not Inf) when a side is empty
        )
        .orderBy(*keys)
    )
