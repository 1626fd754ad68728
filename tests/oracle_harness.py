"""Local replica of the driver's t2 DuckDB-oracle correctness gate.

For each registered query key: run the Spark query and the oracle SQL on
the same sf dir, then compare row count, sorted column names, and an
order-insensitive value multiset.  Stricter than the driver is likely to
be: floats must match EXACTLY (bit-equal after our determinism rules),
so anything passing here should pass the real gate.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Canonical, hashable representation of one cell value."""
    if v is None:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, decimal.Decimal):
        # Distinguish what the driver distinguishes (round-9 verdict
        # #1): the driver hashes Decimal('6.104830') and float 6.10483
        # as DIFFERENT cells, so collapsing Decimal via float() here
        # made the replica BLINDER than the gate it claims to mimic.
        # A Decimal cell only ever matches another Decimal with the
        # same exact string form — keys must cast decimals to double
        # in their final projection (enforced by
        # tests/test_registry_contract.py::test_no_decimal_outputs).
        return f"dec:{v}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return f"f:{f!r}"
    if isinstance(v, (datetime.datetime, np.datetime64)):
        if isinstance(v, np.datetime64):
            v = v.astype("datetime64[us]").item()
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, np.ndarray)):
        return "l:[" + ",".join(_canon(x) for x in v) + "]"
    return f"s:{v}"


def _rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    return sorted(
        tuple(_canon(v) for v in row) for row in pdf.itertuples(index=False)
    ), cols


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, key: str = "?"):
    """Raise AssertionError with a diff preview on any mismatch."""
    spdf = spark_df.toPandas()
    opdf = con.execute(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{key}: column mismatch spark={sorted(spdf.columns)} "
        f"oracle={sorted(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), (
        f"{key}: row count mismatch spark={len(spdf)} oracle={len(opdf)}"
    )
    srows, cols = _rows(spdf)
    orows, _ = _rows(opdf)
    if srows != orows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o
        ][:5]
        msg = [f"{key}: value mismatch over {len(srows)} rows; cols={cols}"]
        for i, s, o in diffs:
            msg.append(f"  row {i}:\n    spark : {s}\n    oracle: {o}")
        only_s = [r for r in srows[:2000] if r not in set(orows)][:3]
        only_o = [r for r in orows[:2000] if r not in set(srows)][:3]
        if only_s:
            msg.append(f"  spark-only sample: {only_s}")
        if only_o:
            msg.append(f"  oracle-only sample: {only_o}")
        raise AssertionError("\n".join(msg))
