"""queries() / oracle_sql() registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle SQL string over the fixture views.  Column names/aliases
MUST match between the two sides; floats follow the determinism rules in
FIXTURES.md §4 (exact decimal sums, integer math where possible,
round(9) after final float ops, full tie-breakers on every rank/limit).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import aggregates as agg
from . import fixtures as fx
from . import relational as rel
from .io import load_table
from .session import ensure_engine_confs

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
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLE_SQL[key] = oracle.strip()
        return wrapped

    return deco


# --- distance-range constants used by the Hi-C fixture queries ----------
DIST_LO = 10_000
DIST_HI = 1_000_000


# ========================================================================
# §2.1 scans / §2.2 projections & filters
# ========================================================================


@register(
    "q_scan_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date
FROM lineitem
""",
)
def q_scan_project(spark, sf_dir):
    """Positional scan + project/alias (ref: fithic.py::read_All_Interactions
    load path).  Catalyst prunes the parquet scan to the 4 needed columns.

    Dates are emitted as ISO strings: the oracle comparison is value-
    typed and pandas folds DATE into datetime64, so temporal outputs are
    strings/epoch-ints engine-wide (determinism rule, FIXTURES.md §4).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date"),
    )


@register(
    "q_project_derive",
    oracle=f"""
WITH {fx.contacts_cte()}
SELECT chr1, mid1, chr2, mid2, contact_count,
       CAST(abs(mid2 - mid1) AS BIGINT) AS dist,
       CAST(CAST(FLOOR(mid1 / 50000) AS BIGINT) * 50000 + 25000 AS BIGINT) AS snap_mid1
FROM contacts
""",
)
def q_project_derive(spark, sf_dir):
    """Derived columns: genomic distance + grid snap (ref:
    read_All_Interactions distance derivation; grid convention §1.1)."""
    c = fx.fixture_contacts(spark, sf_dir)
    c = rel.with_distance(c)
    return c.withColumn("snap_mid1", rel.snap_to_grid(F.col("mid1"), 50_000))


@register(
    "q_filter_range",
    oracle=f"""
WITH {fx.contacts_cte()}
SELECT chr1, mid1, chr2, mid2, contact_count,
       CAST(abs(mid2 - mid1) AS BIGINT) AS dist
FROM contacts
WHERE abs(mid2 - mid1) BETWEEN {DIST_LO} AND {DIST_HI}
""",
)
def q_filter_range(spark, sf_dir):
    """In-range predicate distLow <= d <= distUp (ref: in_range_check)."""
    c = rel.with_distance(fx.fixture_contacts(spark, sf_dir))
    return rel.filter_distance_range(c, DIST_LO, DIST_HI)


# ========================================================================
# §2.4 aggregations
# ========================================================================


@register("q_agg_group", oracle=agg.PRICING_SUMMARY_SQL)
def q_agg_group(spark, sf_dir):
    """Flagship: grouped multi-aggregate summary (pFitHiC's core pandas
    groupby vectorization, TPC-H-Q1-shaped fixture)."""
    return agg.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register(
    "q_agg_global",
    oracle=f"""
WITH {fx.contacts_cte()}
SELECT
  CAST(COALESCE(SUM(CASE WHEN chr1 = chr2 AND mid2 - mid1 BETWEEN {DIST_LO} AND {DIST_HI} THEN contact_count END), 0) AS BIGINT) AS intra_in_range_sum,
  CAST(COALESCE(SUM(CASE WHEN chr1 = chr2 AND mid2 - mid1 BETWEEN {DIST_LO} AND {DIST_HI} THEN 1 END), 0) AS BIGINT) AS intra_in_range_count,
  CAST(COALESCE(SUM(CASE WHEN chr1 = chr2 THEN contact_count END), 0) AS BIGINT) AS intra_all_sum,
  CAST(COALESCE(SUM(CASE WHEN chr1 <> chr2 THEN contact_count END), 0) AS BIGINT) AS inter_all_sum,
  CAST(COALESCE(MAX(CASE WHEN chr1 = chr2 THEN mid2 - mid1 END), 0) AS BIGINT) AS max_intra_dist,
  CAST(COALESCE(MIN(CASE WHEN chr1 = chr2 THEN mid2 - mid1 END), 0) AS BIGINT) AS min_intra_dist,
  COUNT(*) AS n_rows
FROM contacts
""",
)
def q_agg_global(spark, sf_dir):
    """One-pass global scalars (ref: read_All_Interactions accumulators)."""
    return agg.global_contact_stats(
        fx.fixture_contacts(spark, sf_dir), DIST_LO, DIST_HI
    )


@register(
    "q_agg_marginal",
    oracle=f"""
WITH {fx.contacts_cte()},
endpoints AS (
  SELECT chr1 AS chr, mid1 AS mid, contact_count FROM contacts
  UNION ALL
  SELECT chr2 AS chr, mid2 AS mid, contact_count FROM contacts
)
SELECT chr, mid,
       CAST(SUM(contact_count) AS BIGINT) AS marginal_count,
       COUNT(*) AS n_contacts
FROM endpoints
GROUP BY chr, mid
""",
)
def q_agg_marginal(spark, sf_dir):
    """Per-fragment marginal counts over both endpoints (ref:
    utils/createFitHiCFragments*)."""
    return agg.marginal_counts(fx.fixture_contacts(spark, sf_dir))


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entry() query: flagship pricing summary."""
    return QUERIES["q_agg_group"](spark, sf_dir)
