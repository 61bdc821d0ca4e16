"""Vector math over ``array<float>`` embedding columns.

Expressed with ``zip_with``/``aggregate`` higher-order functions —
executed in the JVM per-row over the array, no Python involved. For the
very hot paths (brute-force ANN over millions of vectors) a pandas-UDF
matrix-multiply variant exists in operators/similarity.py; these column
forms are the portable baseline the DuckDB oracle can mirror
(``list_dot_product`` / ``list_cosine_similarity``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


from kubernetes_logs_datalake_spark.functions.time_ns import _col  # noqa: E402 — canonical helper


def float_round(c: Column, scale: int = 6) -> Column:
    """Engine-portable decimal rounding: ``floor(x·10^s + 0.5) / 10^s``
    spelled as explicit IEEE double ops.

    ``F.round(double, s)`` rounds the double's EXACT decimal expansion
    (BigDecimal HALF_UP) while DuckDB's ``round(double, s)`` float-
    rounds — near an exact .5 boundary at digit s+1 the two disagree by
    one ulp of 10^-s (first observed r10: 3 of 500 SemDeDup centroid
    coordinates flipped at k=22 where k=8 had been lucky). Multiply,
    add, floor, divide are all correctly-rounded IEEE operations, so
    this expression is bit-identical across any engine that mirrors the
    same op sequence — the k-means family (centroid update + dist)
    standardizes on it, with ``_ddb_fround`` as the oracle twin.

    Half-way values round toward +inf (not away from zero): a different
    convention than HALF_UP for negatives, applied identically in both
    engines, which is the property that matters.
    """
    p = float(10**scale)
    return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)


def dot(a: Column | str, b: Column | str) -> Column:
    prod = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero vectors (DuckDB's
    list_cosine_similarity NaNs there — callers filter zero vectors
    before comparing against the oracle)."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_prenorm(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """Cosine given precomputed norms — ``cosine()`` with the two norm
    folds hoisted out of a pair join (one HOF fold per pair instead of
    three). Same expression tree on the same values → bit-identical
    results, so oracle parity is preserved."""
    d = _col(na) * _col(nb)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def literal_vector(values: list[float]) -> Column:
    """Plan-time-constant vector, packed as ONE string literal +
    split/cast instead of ``array(lit, lit, …)``.

    Both forms optimize to the identical single array Literal
    (ConstantFolding evaluates the foldable split/cast once; ``repr``
    round-trips every IEEE double exactly), but ANALYSIS sees ~4 nodes
    instead of dim+1 — with many constant vectors in one plan (64 LSH
    hyperplanes, IVF centroid sets) the per-element form made Catalyst
    analysis the dominant cost of the whole query (measured 4.8 s of a
    6.1 s LSH-pairs run at dim=64; packed: 2.9 s construct, same
    execution, bit-identical results)."""
    s = ",".join(repr(float(v)) for v in values)
    return F.split(F.lit(s), ",").cast("array<double>")


def sql_double(x: float) -> str:
    """Exact Spark-SQL double literal text: ``repr`` round-trips every
    finite IEEE double (shortest-unique decimal) and the ``D`` suffix
    pins DoubleType, so ``F.expr`` parses back the bit-identical value.
    Used by the SQL-text expression builders (r15): constructing a
    64-term decode/dot chain through the Column API costs one py4j
    round-trip per node (~3.4 s per IVFADC build); one ``F.expr`` call
    on generated text is ~1000× cheaper and yields the same tree."""
    x = float(x)
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"sql_double: non-finite {x!r}")
    return repr(x) + "D"


def literal_matrix(rows: list[list[float]]) -> Column:
    """Plan-time-constant matrix (``array<array<double>>``), packed as
    one flat :func:`literal_vector` reshaped with foldable ``slice``
    calls — NOT ``F.lit(nested_list)``, which PySpark expands into one
    py4j round-trip per element (measured 2.5–11 s of pure driver time
    per build for a 64×64 matrix — the dominant cost of every
    rotated-family query, r15). The slice form is ~130 py4j calls and
    ConstantFolding collapses it to the bit-identical nested array
    Literal (slice of a folded literal is foldable; verified
    element-equal to the ``F.lit`` form), so analysis, execution and
    results are unchanged.

    Do NOT build a nested literal with a lambda-bearing HOF
    (``transform(split(...), r -> split(r, ','))``): HOFs never
    constant-fold, so the reshape would re-parse every element PER ROW
    at execution (measured 2.8 → 16 s on the rotated top-k)."""
    if not rows:
        return F.lit([]).cast("array<array<double>>")
    n = len(rows[0])
    if any(len(r) != n for r in rows):
        raise ValueError("literal_matrix: ragged rows")
    flat = literal_vector([float(x) for row in rows for x in row])
    return F.array(*[F.slice(flat, i * n + 1, n) for i in range(len(rows))])
