"""Declarative data-expectations audit — the constraint-verification
pass a lake runs on every ingested batch (the Deequ / dbt-tests /
Great-Expectations shape): not-null, uniqueness, accepted ranges,
accepted values, regex conformance, and referential integrity, each
reported as an exact violation count.

Spark-first plan: every row-local check is a conditional sum folded
into ONE aggregate over a single scan of the audited table — adding a
check adds a column to the agg, never a pass over the data. The
uniqueness check rides the same aggregate as ``count(col) -
count(DISTINCT col)`` (Catalyst plans multi-distinct via Expand, still
one scan). Referential-integrity checks are the only ones that touch a
second table: the referenced key set is distinct-reduced and
broadcast, so the fact side never shuffles. The tiny per-check result
rows are unioned on the driver plan — they are one row each, not data.

At 100 TB the audited table is scanned exactly once regardless of how
many checks the suite declares; FK dimension tables are broadcast
(dims that don't fit a broadcast belong in a bloom-filter semi-join —
see ``operators/bloom.py`` for that path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# check spec: (check_id, kind, column, params) — kinds below
KINDS = ("not_null", "unique", "range", "in_set", "matches", "fk")


def expectations_audit(
    df: DataFrame,
    checks: list[tuple],
    refs: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Run a constraint suite against ``df``.

    ``checks`` entries:
      ("<id>", "not_null", col)
      ("<id>", "unique", col)            # excess rows in duplicate groups
      ("<id>", "range", col, lo, hi)     # non-null values outside [lo, hi]
      ("<id>", "in_set", col, [v, ...])  # non-null values not in the set
      ("<id>", "matches", col, regex)    # non-null values not rlike regex
      ("<id>", "fk", col, ref_name)      # non-null keys absent from the
                                         # ref table (refs[ref_name])

    Returns one row per check: (check_id, kind, column, n_violations,
    passed), ordered by check_id. Violation counts are exact.
    """
    aggs: list[F.Column] = []
    order: list[tuple[str, str, str]] = []
    fk_checks: list[tuple[str, str, str]] = []
    for spec in checks:
        cid, kind, col = spec[0], spec[1], spec[2]
        if kind not in KINDS:
            raise ValueError(f"unknown expectation kind: {kind!r}")
        c = F.col(col)
        if kind == "fk":
            fk_checks.append((cid, col, spec[3]))
            continue
        if kind == "not_null":
            viol = F.sum(F.when(c.isNull(), 1).otherwise(0))
        elif kind == "unique":
            viol = F.count(c) - F.countDistinct(c)
        elif kind == "range":
            lo, hi = spec[3], spec[4]
            viol = F.sum(
                F.when(c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)), 1)
                .otherwise(0)
            )
        elif kind == "in_set":
            viol = F.sum(
                F.when(c.isNotNull() & ~c.isin(list(spec[3])), 1).otherwise(0)
            )
        else:  # matches
            viol = F.sum(
                F.when(c.isNotNull() & ~c.rlike(spec[3]), 1).otherwise(0)
            )
        aggs.append(viol.cast("long").alias(cid))
        order.append((cid, kind, col))

    parts: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cid).alias("check_id"),
                        F.lit(kind).alias("kind"),
                        F.lit(col).alias("column"),
                        F.col(cid).alias("n_violations"),
                    )
                    for cid, kind, col in order
                ]
            )
        )
        parts.append(wide.select(stack.alias("_s")).select("_s.*"))

    for cid, col, ref_name in fk_checks:
        if not refs or ref_name not in refs:
            raise ValueError(f"fk check {cid!r} needs refs[{ref_name!r}]")
        ref_df, ref_col = refs[ref_name]
        # no broadcast hint: a dim-key set can be arbitrarily large (fk
        # against a billion-row dim), and Catalyst/AQE already broadcasts
        # automatically when the distinct key set fits the threshold —
        # forcing it would OOM the driver on large dims
        keys = ref_df.select(F.col(ref_col).alias("_k")).distinct()
        missing = (
            df.filter(F.col(col).isNotNull())
            .select(F.col(col).alias("_k"))
            .join(keys, "_k", "left_anti")
        )
        parts.append(
            missing.agg(
                F.lit(cid).alias("check_id"),
                F.lit("fk").alias("kind"),
                F.lit(col).alias("column"),
                F.count(F.lit(1)).cast("long").alias("n_violations"),
            )
        )

    out = reduce(DataFrame.unionByName, parts)
    return out.withColumn("passed", F.col("n_violations") == 0).orderBy(
        "check_id"
    )
