"""Bloom-filter semi-join pruning: filter a fact table against a
dimension's key set WITHOUT shuffling the fact — the runtime-filter /
sideways-information-passing pattern (Bloom 1970; the same idea Spark's
AQE injects as `bloomFilterJoin`, here as an explicit, audited
operator).

Why it matters at 100 TB: a semi join to a selective dimension still
shuffles every fact row that *might* match. A Bloom filter of the
dimension keys rides into the scan as a plan-time literal (the repo's
packed-literal recipe, same as the classifier weights and LSH
hyperplanes), so non-matching fact rows die inside whole-stage codegen
before any exchange. False positives only — never false negatives —
so a downstream exact join stays correct; the audit report measures
the FP rate so the m/k sizing is a measurement, not a guess.

Portable construction: bit positions come from the engine-portable
salted-md5 recipe (the CMS hash family), the filter is packed into
32-bit words with a `bit_or` aggregate, and membership is plain
integer arithmetic (floor-divide + mod — no engine-specific bit ops),
so a DuckDB oracle reproduces the filter and every count bit-for-bit.

Sizing: the packed words are collected to the driver (num_bits/32
ints — 4 KB at the 2^20-bit default) and embedded as ONE literal;
num_bits beyond ~2^24 should move to Spark's native
``bloom_filter_agg``/``might_contain`` instead of a literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def bloom_position(key, j: int, num_bits: int) -> Column:
    """Hash row ``j``'s bit position for a key — salted md5, mod m
    (identical recipe to :func:`operators.sketch.cms_bucket`)."""
    c = F.col(key) if isinstance(key, str) else key
    salted = F.concat(F.lit(f"{j}:"), c.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % num_bits


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 4
) -> list[int]:
    """Build the filter from a key column: returns the packed 32-bit
    words (length num_bits/32) as plain ints.

    Distributed: one scan explodes each key to its ``num_hashes``
    positions, a (word-index)-keyed ``bit_or`` packs bits with map-side
    partials, and only num_bits/32 small ints reach the driver — the
    dimension itself is never collected.
    """
    if num_bits % WORD_BITS:
        raise ValueError(f"num_bits must be a multiple of {WORD_BITS}")
    pos = df.select(
        F.explode(
            F.array(*[
                bloom_position(key_col, j, num_bits).alias(f"_p{j}")
                for j in range(num_hashes)
            ])
        ).alias("p")
    )
    packed = (
        pos.select(
            F.floor(F.col("p") / WORD_BITS).cast("long").alias("w"),
            F.pow(F.lit(2.0), (F.col("p") % WORD_BITS).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    words = [0] * (num_bits // WORD_BITS)
    for r in packed:
        words[int(r.w)] = int(r.word)
    return words


def bloom_might_contain(
    key, words: list[int], num_hashes: int, num_bits: int
) -> Column:
    """Boolean membership test against the packed literal — pure
    integer arithmetic (array lookup + floor-div + mod), no UDF, no
    join; stays inside whole-stage codegen.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import literal_vector

    # literal_vector packs doubles; 32-bit words are exact in a double
    lit_words = literal_vector([float(w) for w in words]).alias("_bw")

    def test_one(j: int) -> Column:
        p = bloom_position(key, j, num_bits)
        word = F.element_at(
            lit_words, (F.floor(p / WORD_BITS) + 1).cast("int")
        ).cast("long")
        bit = (
            F.floor(word / F.pow(F.lit(2.0), (p % WORD_BITS).cast("double")))
            .cast("long")
            % 2
        )
        return bit == 1

    out = test_one(0)
    for j in range(1, num_hashes):
        out = out & test_one(j)
    return out


def bloom_semi_filter(
    fact: DataFrame,
    key_col: str,
    words: list[int],
    num_hashes: int = 4,
    num_bits: int = 1 << 20,
) -> DataFrame:
    """Map-only pre-filter of ``fact`` to rows whose key *might* be in
    the filter (false positives possible, false negatives never) — run
    the exact join after; this just keeps non-candidates out of its
    shuffle."""
    return fact.filter(
        bloom_might_contain(F.col(key_col), words, num_hashes, num_bits)
    )


def bloom_prune_audit(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """One-row sizing report for pruning ``fact`` with a Bloom filter
    of ``dim_keys``: (n_fact, n_pass_bloom, n_match, n_false_positive).

    n_pass_bloom − n_match is the shuffle volume the filter failed to
    remove (false-positive rows); n_fact − n_pass_bloom is the volume
    it killed map-side before any exchange.

    One scan of the fact: the bloom test is a map-side column, the
    exact-match flag a broadcast left join, and all four counts come
    out of a single aggregation.
    """
    words = bloom_build(dim_keys, dim_key, num_bits, num_hashes)
    keys = dim_keys.select(F.col(dim_key).alias("_k")).distinct()
    marked = (
        fact.select(
            F.col(fact_key),
            bloom_might_contain(
                F.col(fact_key), words, num_hashes, num_bits
            ).alias("_pass"),
        )
        .join(
            F.broadcast(keys.withColumn("_m", F.lit(True))),
            F.col(fact_key) == F.col("_k"),
            "left",
        )
    )
    return marked.agg(
        F.count("*").alias("n_fact"),
        F.sum(F.col("_pass").cast("long")).alias("n_pass_bloom"),
        F.sum(F.coalesce(F.col("_m"), F.lit(False)).cast("long")).alias(
            "n_match"
        ),
    ).select(
        "n_fact",
        "n_pass_bloom",
        "n_match",
        (F.col("n_pass_bloom") - F.col("n_match")).alias("n_false_positive"),
    )
