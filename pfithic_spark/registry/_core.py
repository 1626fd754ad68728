"""queries() / oracle_sql() registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle SQL string over the fixture views.  Column names/aliases
MUST match between the two sides; floats follow the determinism rules in
FIXTURES.md §4 (exact decimal sums, integer math where possible,
round(9) after final float ops, full tie-breakers on every rank/limit).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import aggregates as agg  # noqa: F401
from .. import fixtures as fx  # noqa: F401
from .. import relational as rel  # noqa: F401
from ..io import epoch_us, load_table  # noqa: F401
from ..session import ensure_engine_confs

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(key: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle SQL)."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        # A duplicate registration silently SHRINKS coverage (the
        # second definition replaces the first and the driver's
        # verify window sweeps one key fewer than intended) — exactly
        # what bit the round-10 q_psi_drift/q_winsorized_stats
        # collisions.  Fail loudly at import time instead.
        if key in QUERIES:
            raise ValueError(
                f"duplicate registry key {key!r}: already registered "
                f"as {QUERIES[key].__name__}, refusing to overwrite "
                f"with {fn.__name__}"
            )
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLE_SQL[key] = oracle.strip()
        return wrapped

    return deco



#: Absolute path of the committed golden-parquet oracles (generated and
#: independently certified by tools/make_goldens.py; pinned to the
#: driver's sf0.01 gate scale).  Resolved from this file's location —
#: the oracle SQL only ever runs driver-side, where the package is a
#: plain directory under the repo root.
_GOLDEN_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "tests",
    "golden",
)


#: Keys whose oracle is a committed golden parquet rather than a SQL
#: recomputation.  Goldens are pinned to the driver's sf0.01 gate scale
#: — a comparison at any other sf_dir is meaningless (the local parity
#: suite runs these keys' compares at sf0.01 explicitly).
GOLDEN_ORACLE_KEYS: set[str] = set()


def _golden_oracle(key: str) -> str:
    GOLDEN_ORACLE_KEYS.add(key)
    return (
        f"SELECT * FROM read_parquet('{_GOLDEN_DIR}/{key}_sf001.parquet')"
    )


# --- distance-range constants used by the Hi-C fixture queries ----------
DIST_LO = 10_000
DIST_HI = 1_000_000


