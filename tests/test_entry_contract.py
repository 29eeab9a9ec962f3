"""Driver-contract invariants: every query runs at sf0.001, every oracle
key has a query, column names are stable."""

from __future__ import annotations

import __spark_entry__ as E
from conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries(spark):
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 69


def test_all_queries_execute_and_have_stable_schemas(spark):
    qs = E.queries()
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        # schema must be identical across two plan builds (determinism)
        assert df.schema == fn(spark, SF_DIR).schema, name
