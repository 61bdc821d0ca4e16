"""As-of (point-in-time) join — an operator Spark lacks natively.

``as_of_join(left, right, …)`` matches each left row to the most recent
right row with ``right_ts <= left_ts`` within the same key (backward
direction; the standard point-in-time lookup for feature stores, market
data, and "state at event time" queries).

Spark-first implementation — the **union trick**, not a range join:
tag both inputs, union them, and run one window pass per key ordered by
(ts, side): ``last(right_value, ignorenulls=true)`` over the preceding
frame carries the latest right-side values forward onto left rows.

Cost model at scale: exactly ONE shuffle (the window's partitionBy on
the key) over left+right combined — versus a naive range join's
shuffle + per-key quadratic probe, or ``merge_asof`` in applyInPandas
which shuffles the same amount but pays the Python/Arrow hop. Skewed
keys degrade gracefully under AQE; extreme skew can pre-salt by
bucketed time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row at-or-before
    its timestamp (nulls when no prior right row exists).

    ``on``: equality key; ``left_ts``/``right_ts``: ordering columns of
    a common comparable type (ns longs or timestamps). ``tiebreak``: a
    right-side column that deterministically orders right rows sharing
    the same (key, ts) — the row with the LARGEST tiebreak wins. Without
    it, ties resolve to an arbitrary (partition-order-dependent) row.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # ONE struct carries all right-side values through a single last():
    # per-column last(ignorenulls) would skip a right row whose value is
    # null in that column — carrying a STALE value forward and, with
    # nulls in different columns, mixing columns from different right
    # rows into a combination that never existed. The struct itself is
    # non-null on every right row, so last() always picks whole rows.
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
    )
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_vals", F.lit(None).cast(r_tagged.schema["_vals"].dataType))
    # right rows sort before left rows at equal ts (_side 0 < 1), so a
    # right row at exactly left_ts matches (<= semantics, like ASOF JOIN)
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # _tb ascending → last() keeps the max-tiebreak right row among
    # equal-ts ties; left rows carry null _tb, irrelevant since _side
    # already orders them after every right row at the same ts.
    order = ["_ts", "_side"] + (["_tb"] if tiebreak else [])
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_vals_filled", F.last("_vals", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_vals_filled.{c}"))
    return out.drop("_ts", "_side", "_vals", "_vals_filled", *(["_tb"] if tiebreak else []))
