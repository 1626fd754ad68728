"""Driver-replica parity gate: every registered oracle-backed query must
hash-match DuckDB; rows-only queries must run and return a stable schema."""

from __future__ import annotations

import pytest

from oracle_harness import compare, oracle_connection


def _registry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = _registry()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = oracle_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_parity(key, spark, sf_dir, con):
    df = QUERIES[key](spark, sf_dir)
    if key in ORACLES:
        compare(df, con, ORACLES[key], key=key)
    else:
        # rows-only check: runs, has a schema, returns >= 0 rows
        n = df.count()
        assert n >= 0
        assert len(df.columns) > 0


def test_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
