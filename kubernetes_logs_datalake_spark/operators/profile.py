"""Data-profiling operators: the corpus-statistics pass a pipeline runs
before training — distributions, outliers, correlations.

All three operators follow this repo's exact-sums recipe: aggregate in
DECIMAL (order-independent, engine-exact), then derive the float
statistic from the exact sums with ONE fixed sequence of double ops —
so Spark and the DuckDB oracle produce bit-identical values and the
hash check stays meaningful. Naive float aggregation would differ by
partial-aggregation order; engine-native ``stddev``/``corr`` would
differ by implementation.

Each is one partial-agg shuffle (plus a broadcast of the tiny stats
frame where rows are filtered against group statistics) — no windows,
no second scan of wide data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec(col, p: int = 18, s: int = 4) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates more than ``z`` population standard
    deviations from their group mean: (id, group, value, z_score).

    Mean and variance come from exact decimal Σx / Σx² (König-Huygens),
    so the float z-score is a deterministic function of exact inputs.
    One agg shuffle on the group; the per-group stats frame broadcasts
    back onto the scan.
    """
    stats = df.groupBy(group_col).agg(
        F.count("*").alias("_n"),
        F.sum(_dec(value_col)).alias("_sx"),
        F.sum(_dec(value_col) * _dec(value_col)).alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_sx").cast("double") / n
    var = F.col("_sxx").cast("double") / n - mean * mean
    # degenerate groups (single row / constant value) have var <= 0 —
    # no deviation is definable, so the z-score is null (which the
    # |z| > threshold filter drops); an unguarded division would raise
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    zs = F.when(var > 0, (F.col(value_col) - mean) / F.sqrt(var))
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn("z_score", zs)
        .filter(F.abs(F.col("z_score")) > z)
        .select(
            id_col, group_col, value_col, F.round("z_score", 4).alias("z_score")
        )
    )


def fixed_width_histogram(
    df: DataFrame, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Fixed-width histogram over the global [min, max] range:
    (bin, lo, hi, n). The profiling pass behind "what does this column
    look like" — two scans (exact min/max, then a shuffle-free bin map
    + one partial-agg shuffle on the bin id), no sort.

    Bin edges are the same double expression in both engines; the top
    edge is closed (x = max lands in the last bin).
    """
    bounds = df.agg(
        F.min(value_col).cast("double").alias("_lo"),
        F.max(value_col).cast("double").alias("_hi"),
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    binned = (
        df.select(F.col(value_col).cast("double").alias("_x"))
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor((F.col("_x") - F.col("_lo")) / width).cast("int"),
                    F.lit(n_bins - 1),
                )
            ),
        )
    )
    return binned.groupBy("bin").agg(
        F.round(F.min("_lo") + F.col("bin") * F.min(width), 4).alias("lo"),
        F.round(F.min("_lo") + (F.col("bin") + 1) * F.min(width), 4).alias("hi"),
        F.count("*").alias("n"),
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact discrete quantiles per group: (group, q, value), where
    value is the element at rank ceil(q·n) — SQL-standard
    ``percentile_disc`` semantics, computed explicitly so both engines
    use the identical rank formula (DuckDB's ``quantile_disc`` rounds
    differently, and interpolated ``percentile_cont`` would compare
    floats produced by different arithmetic).

    Because the picked value is an actual element of the column, the
    result is exact — no float accumulation anywhere. Plan: one shuffle
    on the group key, a partitioned sort window (row_number + count,
    same window frame → one WindowExec), then a map-side explode of the
    requested quantile fractions and a rank-equality filter. No global
    sort, no driver round-trip; per-group state is the partition sort,
    which is the floor for any exact quantile.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("_v")
    wg = Window.partitionBy(group_col)
    ranked = (
        df.select(group_col, F.col(value_col).cast("double").alias("_v"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wg))
    )
    q = F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q")
    return (
        ranked.select(group_col, "_v", "_rn", "_n", q)
        .filter(
            F.col("_rn")
            == F.greatest(F.ceil(F.col("q") * F.col("_n")), F.lit(1))
        )
        .select(group_col, "q", F.col("_v").alias("value"))
    )


def exact_corr(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group Pearson correlation + population covariance from exact
    decimal sums: (group, corr, covar_pop), rounded to 4. The six
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) aggregate exactly;
    the closed-form corr is then one fixed float expression — unlike
    engine-native ``corr``, whose streaming accumulation differs across
    engines and partition orders."""
    sx = F.sum(_dec(x_col)).cast("double")
    sy = F.sum(_dec(y_col)).cast("double")
    sxx = F.sum(_dec(x_col) * _dec(x_col)).cast("double")
    syy = F.sum(_dec(y_col) * _dec(y_col)).cast("double")
    sxy = F.sum(_dec(x_col) * _dec(y_col)).cast("double")
    n = F.count(F.lit(1)).cast("double")
    # constant x, constant y, or a single row → zero denominator →
    # correlation undefined: null, not an ANSI DIVIDE_BY_ZERO abort
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    corr = F.when(den > 0, (n * sxy - sx * sy) / den)
    covar = (n * sxy - sx * sy) / (n * n)
    return df.groupBy(group_col).agg(
        F.round(corr, 4).alias("corr"),
        F.round(covar, 4).alias("covar_pop"),
    )


def cusum_alerts(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    target_col,
    slack: float,
    threshold: float,
    scale: int = 6,
) -> DataFrame:
    """One-sided CUSUM change detection (Page 1954) over an ordered
    per-key series: flag the points where the cumulative upward drift
    of ``value_col`` above ``target + slack`` exceeds ``threshold`` —
    the sequential change-point detector behind rate-spike alerting.

    The textbook recursion s_i = max(0, s_{i-1} + x_i − target − slack)
    looks iterative, but has the prefix-min closed form
    ``s_i = cum_i − min_{j≤i}(cum_j ∪ 0)`` over the running sum of
    deviations — so the whole detector is two *partitioned* running
    windows (cumsum + running min), no recursion, no UDF, no driver
    loop. Deviations accumulate in DECIMAL (exact, order-independent)
    and the statistic is rounded to ``scale`` for engine parity.

    Output: (*keys, order_col, value, cusum, alert) for every input
    row; ``alert`` = the statistic crossed ``threshold`` at this point.
    """
    from pyspark.sql import Window

    tgt = F.col(target_col) if isinstance(target_col, str) else target_col
    # the accumulator's decimal scale is derived from the caller's
    # ``scale`` so a scale>6 request isn't silently truncated; 18
    # integer digits of headroom regardless of scale
    dec = f"decimal({18 + scale},{scale})"
    dev = (
        F.round(F.col(value_col).cast("double") - tgt - F.lit(slack), scale)
        .cast(dec)
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("_cum", F.sum(dev).over(w))
    out = out.withColumn(
        "_floor", F.least(F.lit(0).cast(dec), F.min("_cum").over(w))
    )
    stat = F.round((F.col("_cum") - F.col("_floor")).cast("double"), scale)
    return out.select(
        *keys,
        order_col,
        F.col(value_col).alias("value"),
        stat.alias("cusum"),
        (stat > threshold).alias("alert"),
    )


def table_profile(df: DataFrame, scale: int = 6) -> DataFrame:
    """Whole-table column profile in ONE scan: per column
    (column_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    the data-quality summary an ingest pipeline records per batch.
    min/max are emitted as doubles for numeric columns and epoch-µs for
    timestamps and dates (NULL for strings — cross-engine string
    formatting of extrema is not stable, counts are).

    Plan: one aggregate over the scan computing every column's stats
    simultaneously; the row→column reshaping is a driver-free explode
    of one 1-row struct array. Exact n_distinct over k columns plans an
    Expand (k row-projections before the partial agg — map-side
    combined, but k× the scan's row traffic): acceptable for profile
    runs; at 100 TB swap ``countDistinct`` for
    ``approx_count_distinct`` if the ±2% HLL estimate is enough —
    that variant keeps the scan 1×.
    """
    from pyspark.sql.types import (
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    aggs = [F.count(F.lit(1)).alias("_n")]
    names = []
    for fld in df.schema.fields:
        c = F.col(fld.name)
        names.append(fld.name)
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nl_{fld.name}")
        )
        aggs.append(F.countDistinct(c).alias(f"_nd_{fld.name}"))
        if isinstance(fld.dataType, NumericType):
            mn = F.round(F.min(c).cast("double"), scale)
            mx = F.round(F.max(c).cast("double"), scale)
        elif isinstance(
            fld.dataType, (TimestampType, TimestampNTZType, DateType)
        ):
            # NTZ (how parquet TIMESTAMP without tz loads) and tz'd
            # timestamps both profile as epoch µs; the session is
            # pinned UTC so the two agree. DATE columns are orderable
            # too — cast to timestamp (midnight UTC) so a lake whose
            # date partition column is a true DATE keeps its range
            mn = F.unix_micros(F.min(c).cast("timestamp")).cast("double")
            mx = F.unix_micros(F.max(c).cast("timestamp")).cast("double")
        else:
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
        aggs.append(mn.alias(f"_mn_{fld.name}"))
        aggs.append(mx.alias(f"_mx_{fld.name}"))
    one = df.agg(*aggs)
    stacked = one.select(
        F.col("_n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("column_name"),
                        F.col(f"_nl_{n}").alias("n_nulls"),
                        F.col(f"_nd_{n}").alias("n_distinct"),
                        F.col(f"_mn_{n}").alias("min_value"),
                        F.col(f"_mx_{n}").alias("max_value"),
                    )
                    for n in names
                ]
            )
        ).alias("_s"),
    )
    return stacked.select(
        F.col("_s.column_name").alias("column_name"),
        F.col("_n").alias("n_rows"),
        F.col("_s.n_nulls").alias("n_nulls"),
        F.col("_s.n_distinct").alias("n_distinct"),
        F.col("_s.min_value").alias("min_value"),
        F.col("_s.max_value").alias("max_value"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    k: float = 3.0,
    scale: int = 6,
) -> DataFrame:
    """Robust per-group outliers by median absolute deviation: flag
    rows where |x − median| > k·MAD — the outlier detector that, unlike
    z-scores, is not itself corrupted by the outliers it hunts
    (breakdown point 50% vs 0%).

    Both the median and the MAD are EXACT element picks (the same
    ceil(q·n) rank formula as :func:`group_quantiles`), so the verdict
    is engine-reproducible — no float accumulation anywhere. Output:
    the outlier rows only, (group, id, value, med, mad), ordered
    deterministically by the caller if needed.

    Plan: two partitioned sort windows (values, then absolute
    deviations) + two broadcast-sized joins of per-group scalars; per
    group the state is the partition sort, the floor for any exact
    median. Groups with MAD = 0 (>50% identical values) flag every
    row off the median, the textbook behavior.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("double").alias("_v"),
    )

    def _median(frame: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("_g").orderBy(col)
        wg = Window.partitionBy("_g")
        ranked = frame.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_cnt", F.count("*").over(wg)
        )
        return ranked.filter(
            F.col("_rn")
            == F.greatest(F.ceil(0.5 * F.col("_cnt")), F.lit(1))
        ).select("_g", F.col(col).alias("_med"))

    med = _median(base, "_v").withColumnRenamed("_med", "_gmed")
    dev = base.join(med, "_g").withColumn(
        "_d", F.round(F.abs(F.col("_v") - F.col("_gmed")), scale)
    )
    mad = _median(dev.select("_g", F.col("_d").alias("_v")), "_v")
    out = dev.join(mad.withColumnRenamed("_med", "_mad"), "_g")
    return out.filter(F.col("_d") > k * F.col("_mad")).select(
        F.col("_g").alias(group_col),
        F.col("_id").alias(id_col),
        F.col("_v").alias("value"),
        F.col("_gmed").alias("med"),
        F.col("_mad").alias("mad"),
    )


def ewma_weights(alpha: float, horizon: int) -> list[float]:
    """The truncated-EWMA lag weights ``α(1-α)^j``, j = 0..horizon —
    computed ONCE in Python and shared verbatim (via repr) with the
    DuckDB oracle so both engines use bit-identical literals."""
    return [alpha * (1.0 - alpha) ** j for j in range(horizon + 1)]


def ewma_smooth(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    horizon: int = 12,
    scale: int = 6,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key series.

    ``ewma_t = Σ_{j=0..H} w_j·x_{t-j} / Σ_{j avail} w_j`` with
    ``w_j = α(1-α)^j`` — the classic smoother for rate dashboards and
    drift baselines, truncated at ``horizon`` lags so it is a pure
    window dot-product: ONE partitioned sort window, ``horizon`` lag
    expressions inside whole-stage codegen, no recursion, no per-key
    state beyond the window frame. (The untruncated recursive EWMA
    needs an ordered fold with unbounded per-key state; at H=12 and
    α≥0.3 the dropped tail weight is (1-α)^13 < 1%, below the
    rounding scale.) Series heads renormalize over the lags that
    exist, so early buckets are unbiased rather than damped toward 0.

    Determinism: weights are Python doubles embedded as literals, the
    numerator/denominator are left-associated sums evaluated in the
    same order in Spark and the SQL oracle — bit-identical before the
    final round.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(order_col)
    weights = ewma_weights(alpha, horizon)
    x = F.col(value_col).cast("double")
    num = den = None
    for j, wt in enumerate(weights):
        lagged = F.lag(x, j).over(w) if j else x
        term = F.when(lagged.isNotNull(), F.lit(wt) * lagged).otherwise(F.lit(0.0))
        wterm = F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return df.withColumn("ewma", F.round(num / den, scale))


def ewma_oracle_terms(
    value_sql: str, alpha: float, horizon: int, over_sql: str
) -> tuple[str, str]:
    """(numerator, denominator) SQL fragments mirroring
    :func:`ewma_smooth` term by term — same repr'd weight literals,
    same left-associated order. ``over_sql`` is the window clause,
    e.g. ``OVER (PARTITION BY k ORDER BY t)``."""
    num, den = [], []
    for j, wt in enumerate(ewma_weights(alpha, horizon)):
        lag = (
            f"CAST({value_sql} AS DOUBLE)"
            if j == 0
            else f"lag(CAST({value_sql} AS DOUBLE), {j}) {over_sql}"
        )
        num.append(
            f"CASE WHEN {lag} IS NOT NULL THEN {wt!r} * {lag} ELSE 0.0 END"
        )
        den.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt!r} ELSE 0.0 END")
    return " + ".join(num), " + ".join(den)


def trend_slopes(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-series least-squares trend: slope, intercept, and R² of
    ``y ~ x`` for each group, from the closed form.

    Input is an already-aggregated series table (one row per (group,
    x)); both coordinate columns must be integers, so every moment sum
    (Σx, Σy, Σxy, Σx², Σy²) is EXACT — each product is cast to
    DECIMAL(38,0) before the sum, making the aggregate overflow-proof
    and order-independent. The float statistics are then derived from
    the exact sums with one fixed sequence of double ops (the recipe
    `zscore_outliers` documents), so the oracle hash stays meaningful.
    Degenerate series (constant x, or constant y for R²) yield NULL via
    nullif rather than inf.

    ONE group-keyed partial-agg shuffle; the closed form needs no
    window and no second pass, so the shape holds at any series count.
    """
    x = F.col(x_col).cast("decimal(38,0)")
    y = F.col(y_col).cast("decimal(38,0)")
    agg = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n = F.col("n_points").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    slope = num / F.nullif(denx, F.lit(0.0))
    return agg.select(
        F.col(group_col),
        F.col("n_points"),
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 9).alias("intercept"),
        F.round(
            (num * num) / F.nullif(denx * deny, F.lit(0.0)), 9
        ).alias("r2"),
    ).orderBy(group_col)
