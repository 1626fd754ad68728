"""Empty-input robustness: every registered query must execute (not
crash) against a schema-identical but EMPTY copy of the fixture tables.

This is the failure class that actually bit in round 2 (run_significance
IndexError on an empty contacts slice): operators that collect a
driver-side table, fit on it, or index into a first row all have a
zero-row corner.  A 100 TB pipeline hits empty slices constantly — an
empty partition filter, a date with no data, a source with no documents
— so "returns an empty (or degenerate) result" is the contract, never a
stack trace.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Schema-preserving empty twin of the smallest fixture dir."""
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("empty_sf")
    from pfithic_spark.io import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        (
            spark.read.parquet(f"{src}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


def _keys():
    import __spark_entry__ as e

    return sorted(e.queries())


#: Pure-generator keys whose output derives from fixture CONSTANTS, not
#: from table rows — their own DuckDB oracle is a generate_series over
#: constants, so emitting rows from an empty table set is the correct
#: semantics, not fabrication.
_GENERATOR_KEYS = {"q_possible_pairs"}


@pytest.mark.parametrize("key", _keys())
def test_query_survives_empty_input(key, spark, empty_sf_dir):
    import __spark_entry__ as e

    df = e.queries()[key](spark, empty_sf_dir)
    rows = df.collect()
    # no exception is the contract; the result must be empty or a small
    # degenerate set (global aggregates legitimately emit one row of
    # zeros/nulls over zero input; grouping-set/profile shapes a few).
    # A falsifiable bound — not `>= 0` — so a query that fabricates
    # rows from nothing (e.g. a join against a non-empty dim it built
    # internally) fails here instead of slipping through.
    if key not in _GENERATOR_KEYS:
        assert len(rows) <= 16, (
            f"{key} produced {len(rows)} rows from empty input"
        )
    assert len(df.columns) > 0
