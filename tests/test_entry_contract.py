"""Driver-contract smoke: entry() runs, every queries() entry returns a
DataFrame at sf0.001, and every oracle key has a matching query."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert "revenue" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    extra = set(entrymod.oracle_sql()) - set(qs)
    assert not extra, f"oracle_sql keys without queries: {extra}"


def test_all_queries_run_at_sf0001(spark):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, SF)
        n = df.count()
        assert n >= 0, name
