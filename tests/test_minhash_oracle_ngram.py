"""MinHash oracle-generator n-gram parity.

The generated DuckDB oracle (`_ddb_minhash_lsh_sql`) historically
hardcoded unigram shingles while the Spark operator parameterized n —
so changing _MINHASH_N would have silently broken hash parity. Now the
generator threads n through `_ddb_shingle_list`; this suite proves the
two engines produce IDENTICAL candidate-pair sets for n = 1, 2, 3 on a
corpus with planted n-gram-sensitive near-duplicates.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from __spark_entry__ import _ddb_minhash_lsh_sql
from kubernetes_logs_datalake_spark.operators.dedup import minhash_lsh_candidates

DOCS = [
    # near-dup pair: same words, one substitution mid-sentence
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox leaps over the lazy dog near the river bank"),
    # same word MULTISET as doc 0 but shuffled order: unigram shingles
    # identical, bigram+ shingles differ — separates n=1 from n>1
    (2, "river the lazy bank fox dog brown near jumps the over quick the"),
    # unrelated
    (3, "completely different content about spark adaptive query execution"),
    (4, "short doc"),
    (5, "short doc"),  # exact dup of 4 (also equal under every n)
]


@pytest.mark.parametrize("n", [1, 2, 3])
def test_spark_and_duckdb_agree_for_ngram_shingles(spark, n):
    sdf = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            sdf, "doc_id", "text", num_hashes=64, bands=8, n=n,
            hash_family="portable",
        ).collect()
    )

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted(
        map(tuple, con.execute(_ddb_minhash_lsh_sql(64, 8, n)).fetchall())
    )
    assert got == want
    # sanity on the planted structure, not just engine agreement:
    if n <= 2:
        assert (4, 5) in got                 # exact dup collides
    else:
        # the 2-word docs have NO 3-gram shingles: both engines must
        # drop them (no signature), not emit a spurious collision
        assert not any(4 in p or 5 in p for p in got)
    if n == 1:
        assert (0, 2) in got                 # same word multiset
    else:
        assert (0, 2) not in got             # order matters for n-grams
