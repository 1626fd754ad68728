"""§2.1 scans, §2.2 projections & filters, core §2.4 aggregations + the flagship query.

Mechanically split out of the flat registry.py (r5); behavior and
registration order unchanged — the façade imports families in the
original section order."""
from __future__ import annotations

import os  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import aggregates as agg  # noqa: F401
from .. import fixtures as fx  # noqa: F401
from .. import hic  # noqa: F401
from .. import llmops  # noqa: F401
from .. import multimodal  # noqa: F401
from .. import relational as rel  # noqa: F401
from .. import streaming as strm  # noqa: F401
from .. import windows as win  # noqa: F401
from ..io import epoch_us, load_table  # noqa: F401
from ..llmops import dot_double, knuth_hash, l2_norm  # noqa: F401
from ..session import ensure_engine_confs  # noqa: F401
from ._core import (  # noqa: F401
    DIST_HI,
    DIST_LO,
    GOLDEN_ORACLE_KEYS,
    ORACLE_SQL,
    QUERIES,
    _GOLDEN_DIR,
    _golden_oracle,
    register,
)

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


# ========================================================================
# §2.2 remaining filters
# ========================================================================


@register(
    "q_filter_in",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
FROM lineitem
WHERE l_returnflag IN ('A', 'R') AND l_linestatus = 'F'
""",
)
def q_filter_in(spark, sf_dir):
    """Membership + equality predicates (ref: contactType / chromosome
    allow-list branches in fithic.py::main)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R") & (F.col("l_linestatus") == "F")
    ).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"
    )


#: marginal-count threshold below which a fragment is "bad"
BAD_FRAG_THRESHOLD = 5

_BAD_FRAGS_CTES = f"""
endpoints AS (
  SELECT chr1 AS chr, mid1 AS mid, contact_count FROM contacts
  UNION ALL
  SELECT chr2 AS chr, mid2 AS mid, contact_count FROM contacts
),
marg AS (
  SELECT chr, mid, SUM(contact_count) AS m FROM endpoints GROUP BY chr, mid
),
bad AS (SELECT chr, mid FROM marg WHERE m < {BAD_FRAG_THRESHOLD})
"""


@register(
    "q_filter_mappability",
    oracle=f"""
WITH {fx.contacts_cte()},
{_BAD_FRAGS_CTES.strip()}
SELECT c.chr1, c.mid1, c.chr2, c.mid2, c.contact_count
FROM contacts c
WHERE NOT EXISTS (SELECT 1 FROM bad b WHERE b.chr = c.chr1 AND b.mid = c.mid1)
  AND NOT EXISTS (SELECT 1 FROM bad b WHERE b.chr = c.chr2 AND b.mid = c.mid2)
""",
)
def q_filter_mappability(spark, sf_dir):
    """badFrags removal: drop contacts touching low-marginal fragments
    (ref: fithic.py::generate_FragPairs badFrags).  Two broadcast
    left-anti joins — no shuffle of the fact side at scale."""
    c = fx.fixture_contacts(spark, sf_dir)
    bad = (
        agg.marginal_counts(c)
        .filter(F.col("marginal_count") < BAD_FRAG_THRESHOLD)
        .select("chr", "mid")
    )
    return rel.remove_bad_fragments(c, bad)
