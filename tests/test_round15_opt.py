"""Round-15 (optimization round) focused pins.

Each test guards an optimization that changed an operator's internals,
asserting the optimized form is bit-identical to the straightforward
form it replaced — the r15 contract is "same results, less time".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.vectors import (
    literal_matrix,
    literal_vector,
)


def test_literal_matrix_matches_nested_lit_and_constant_folds(spark):
    """``literal_matrix`` (flat packed literal + foldable slices) must
    produce element-identical values to the per-element ``F.lit``
    nested form it replaced (r15: the F.lit form cost 2.5–11 s of py4j
    round-trips per 64×64 build), and must CONSTANT-FOLD to a single
    nested array literal — if it stops folding, the reshape work moves
    into the per-row hot loop (measured 2.8 → 16 s on the rotated
    top-k for a lambda-bearing variant)."""
    from kubernetes_logs_datalake_spark.operators.rotation import (
        random_rotation,
    )

    R = random_rotation(8, seed=29)
    # adversarial values: exact-repr round-trip corners
    R[0][0] = 1e-17
    R[1][1] = -0.1
    R[2][2] = float(2**53 - 1)
    df = spark.range(1)
    nested = df.select(
        F.lit([[float(x) for x in row] for row in R]).alias("m")
    ).collect()[0][0]
    packed = df.select(literal_matrix(R).alias("m")).collect()[0][0]
    assert nested == packed
    # the optimized plan must carry one folded literal, no slice() left
    plan = (
        df.select(literal_matrix(R).alias("m"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "slice" not in plan
    assert "1.0E-17" in plan


def test_literal_matrix_rejects_ragged_rows(spark):
    with pytest.raises(ValueError, match="ragged"):
        literal_matrix([[1.0, 2.0], [3.0]])


def test_rotate_vector_expr_unchanged_by_packed_literal(spark):
    """The rotated-space matvec through the packed literal must stay
    bit-identical to the sequential driver-side fold (the oracle-parity
    order) — the r15 literal packing must not perturb a single bit."""
    from kubernetes_logs_datalake_spark.operators.rotation import (
        random_rotation,
        rotate_vector_expr,
    )

    R = random_rotation(8, seed=3)
    v = [0.25 * (i + 1) for i in range(8)]
    row = (
        spark.range(1)
        .select(literal_vector(v).alias("v"))
        .select(rotate_vector_expr("v", R).alias("rv"))
        .collect()[0][0]
    )
    expected = []
    for i in range(8):
        acc = 0.0
        for j in range(8):
            acc = acc + R[i][j] * v[j]
        expected.append(acc)
    assert list(row) == expected


def test_sq8_sql_text_builders_match_column_api(spark):
    """The r15 SQL-text expression builders (one F.expr parse instead
    of ~py4j-per-node) must stay BIT-identical to the Column-API trees
    they replaced — decode terms, the norm's flat left-associative
    sum, and the per-row partial."""
    import functools
    import operator as op
    import struct

    import kubernetes_logs_datalake_spark.operators.similarity as S
    from kubernetes_logs_datalake_spark.functions.vectors import sql_double

    dim = 8
    mins = [-0.5 + 0.01 * i for i in range(dim)]
    inv = [0.003 + 0.0001 * i for i in range(dim)]
    df = spark.range(64).select(
        F.expr(
            f"transform(sequence(1,{dim}),"
            " j -> CAST(pmod(id*31+j*17,256)-128 AS TINYINT))"
        ).alias("_cs")
    )
    old_terms = S._sq8_shifted_decoded_terms(F.col("_cs"), mins, inv, dim)
    old_dnorm = F.sqrt(
        functools.reduce(op.add, [t * t for t in old_terms])
    )
    new_dnorm = F.expr(
        "SQRT(%s)"
        % " + ".join(
            "(%s) * (%s)"
            % (
                S._sq8_shifted_decoded_sql("_cs", mins, inv, i),
                S._sq8_shifted_decoded_sql("_cs", mins, inv, i),
            )
            for i in range(1, dim + 1)
        )
    )
    bits = lambda rows: [struct.pack("d", r[0]) for r in rows]  # noqa: E731
    assert bits(df.select(old_dnorm.alias("n")).collect()) == bits(
        df.select(new_dnorm.alias("n")).collect()
    )


def test_sql_double_round_trips_corner_values(spark):
    import struct

    from kubernetes_logs_datalake_spark.functions.vectors import sql_double

    for x in [5e-324, 1.7976931348623157e308, -2.2250738585072014e-308,
              0.1, -0.0, 123456789.123456789]:
        got = spark.range(1).select(F.expr(sql_double(x)).alias("v")).collect()[0][0]
        assert struct.pack("d", got) == struct.pack("d", x), x
    with pytest.raises(ValueError):
        sql_double(float("nan"))
