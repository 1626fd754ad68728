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

from . import aggregates as agg
from . import fixtures as fx
from . import relational as rel
from .io import epoch_us, load_table
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



#: Absolute path of the committed golden-parquet oracles (generated and
#: independently certified by tools/make_goldens.py; pinned to the
#: driver's sf0.01 gate scale).  Resolved from this file's location —
#: the oracle SQL only ever runs driver-side, where the package is a
#: plain directory under the repo root.
_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
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


# ========================================================================
# §2.3 joins
# ========================================================================


@register(
    "q_join_broadcast",
    oracle="""
SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def q_join_broadcast(spark, sf_dir):
    """Small-dim × big-fact broadcast hash join (ref: per-locus attr
    lookups in generate_FragPairs consumers)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "inner")
        .groupBy("p_brand")
        .agg(agg.dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q_join_shuffle",
    oracle="""
SELECT r_name, n_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q_join_shuffle(spark, sf_dir):
    """Multi-table equi-join chain; Catalyst/AQE picks broadcast vs
    sort-merge per stage (dims here all broadcast)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            agg.dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "q_join_bias",
    oracle=f"""
WITH {fx.contacts_cte()},
{fx.biases_cte()}
SELECT c.chr1, c.mid1, c.chr2, c.mid2, c.contact_count,
       COALESCE(b1.bias, 1.0) AS bias1,
       COALESCE(b2.bias, 1.0) AS bias2
FROM contacts c
LEFT JOIN biases b1 ON b1.chr = c.chr1 AND b1.mid = c.mid1
LEFT JOIN biases b2 ON b2.chr = c.chr2 AND b2.mid = c.mid2
""",
)
def q_join_bias(spark, sf_dir):
    """contacts ⋈ biases ×2 endpoints, left outer, missing → 1.0
    (ref: fithic.py::read_biases consumers)."""
    c = fx.fixture_contacts(spark, sf_dir)
    b = fx.fixture_biases(spark, sf_dir)
    return rel.attach_biases(c, b).select(
        "chr1", "mid1", "chr2", "mid2", "contact_count", "bias1", "bias2"
    )


@register(
    "q_join_semi",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
""",
)
def q_join_semi(spark, sf_dir):
    """Existence filter → left-semi join (EXT, engine completeness)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_join_anti(spark, sf_dir):
    """NOT EXISTS → left-anti join (ref shape: pass-2 outlier removal,
    fithic.py outliers handling)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_range",
    oracle=f"""
WITH {fx.contacts_cte()},
bounds AS (
  SELECT CAST(k AS BIGINT) AS bucket,
         CAST(k * 50000 AS BIGINT) AS lo,
         CAST((k + 1) * 50000 AS BIGINT) AS hi
  FROM generate_series(0, 49) t(k)
),
d AS (SELECT mid2 - mid1 AS dist, contact_count FROM contacts)
SELECT b.bucket, COUNT(*) AS n_pairs, CAST(SUM(d.contact_count) AS BIGINT) AS sum_cc
FROM d JOIN bounds b ON d.dist >= b.lo AND d.dist < b.hi
GROUP BY b.bucket
""",
)
def q_join_range(spark, sf_dir):
    """Interval (range) join: distance → boundary bucket (ref:
    np.searchsorted over bin boundaries).  Boundary table is tiny →
    BroadcastNestedLoopJoin, safe at any fact scale."""
    c = rel.with_distance(fx.fixture_contacts(spark, sf_dir))
    bounds = spark.range(0, 50).select(
        F.col("id").alias("bucket"),
        (F.col("id") * 50_000).alias("lo"),
        ((F.col("id") + 1) * 50_000).alias("hi"),
    )
    joined = rel.interval_join(
        c.select("dist", "contact_count"), bounds, value_col="dist"
    )
    return joined.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("contact_count").alias("sum_cc"),
    )


@register(
    "q_join_asof",
    oracle="""
WITH j AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id % 100 AND o.o_orderdate <= e.ts
)
SELECT event_id,
       o_orderkey AS asof_orderkey,
       o_totalprice AS asof_totalprice
FROM j WHERE rn = 1
""",
)
def q_join_asof(spark, sf_dir):
    """As-of join (nearest preceding order per event) — EXT; no native
    Spark op.  Scalable form: cogroup on the key + per-group sorted
    merge (pd.merge_asof), linear per group; see also the pure-DataFrame
    composition relational.asof_join.  Tie-break: ties on o_orderdate
    resolve to max o_orderkey (right side sorted ascending, last wins),
    matching the oracle's DESC,DESC row_number."""
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_id",
        epoch_us(ev_raw).alias("us"),
        (F.col("user_id") % 100).alias("custkey"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_us"),
        "o_orderkey",
        "o_totalprice",
    )
    j = rel.asof_join_grouped(
        ev,
        o,
        key="custkey",
        left_us="us",
        right_us="o_us",
        right_value_cols=["o_orderkey", "o_totalprice"],
        out_schema="event_id long, us long, o_orderkey long, o_totalprice double",
        left_cols=["event_id", "us"],
    )
    return j.select(
        "event_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


# ========================================================================
# §2.6 sort / limit, §2.7 set ops
# ========================================================================


@register(
    "q_join_asof_tol",
    oracle="""
WITH j AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id % 100
   AND o.o_orderdate <= e.ts
   AND o.o_orderdate >= e.ts - INTERVAL 8380 DAY
)
SELECT event_id,
       o_orderkey AS asof_orderkey,
       o_totalprice AS asof_totalprice
FROM j WHERE rn = 1
""",
)
def q_join_asof_tol(spark, sf_dir):
    """As-of join with a staleness bound (feature-join freshness rule):
    the nearest preceding order only matches within 8380 days — an
    older one is treated as missing (the bound intentionally lands at
    the fixture's median staleness so both outcomes are exercised).  Same cogroup + per-group sorted merge
    as q_join_asof; the bound is merge_asof's tolerance, NOT a post
    filter, so the semantics match the oracle's range-bounded rank."""
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_id",
        epoch_us(ev_raw).alias("us"),
        (F.col("user_id") % 100).alias("custkey"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_us"),
        "o_orderkey",
        "o_totalprice",
    )
    j = rel.asof_join_grouped(
        ev,
        o,
        key="custkey",
        left_us="us",
        right_us="o_us",
        right_value_cols=["o_orderkey", "o_totalprice"],
        out_schema="event_id long, us long, o_orderkey long, o_totalprice double",
        left_cols=["event_id", "us"],
        tolerance_us=8380 * 86_400_000_000,
    )
    return j.select(
        "event_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


@register(
    "q_sort_limit",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""",
)
def q_sort_limit(spark, sf_dir):
    """Top-N: orderBy+limit → TakeOrderedAndProject (per-partition heap,
    no global sort shuffle).  Full deterministic tie-break chain."""
    li = load_table(spark, sf_dir, "lineitem")
    return rel.topn(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        100,
    )


@register(
    "q_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_union(spark, sf_dir):
    """Set union (dedup) of endpoint projections (ref shape: pandas
    concat of endpoint frames)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_except(spark, sf_dir):
    """Set difference — the pass-2 refinement shape (EXCEPT-distinct)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


# ========================================================================
# §2.4 aggregation breadth
# ========================================================================


@register(
    "q_agg_bin",
    oracle=f"""
WITH {fx.contacts_cte()},
b AS (
  SELECT CAST(FLOOR((mid2 - mid1) / 100000.0) AS BIGINT) AS bin_id,
         mid2 - mid1 AS dist, contact_count AS cc
  FROM contacts
)
SELECT bin_id,
       COUNT(*) AS n_pairs,
       CAST(SUM(cc) AS BIGINT) AS sum_cc,
       CAST(SUM(dist * cc) AS DOUBLE) / SUM(cc) AS avg_dist,
       SQRT((CAST(SUM(cc * cc) AS DOUBLE) - CAST(SUM(cc) AS DOUBLE) * SUM(cc) / COUNT(*))
            / NULLIF(COUNT(*) - 1, 0)) / SQRT(COUNT(*)) AS stderr
FROM b
GROUP BY bin_id
""",
)
def q_agg_bin(spark, sf_dir):
    """Per-bin null support stats with count-weighted mean + stderr
    (ref: calculateProbabilities).  stderr from exact integer power sums
    so the float math is order-independent."""
    c = rel.with_distance(fx.fixture_contacts(spark, sf_dir))
    b = c.select(
        F.floor(F.col("dist") / 100000.0).cast("long").alias("bin_id"),
        F.col("dist"),
        F.col("contact_count").alias("cc"),
    )
    n = F.count(F.lit(1))
    s1 = F.sum("cc")
    s2 = F.sum(F.col("cc") * F.col("cc"))
    var = (s2.cast("double") - s1.cast("double") * s1 / n) / F.when(
        n - 1 != 0, n - 1
    )
    return b.groupBy("bin_id").agg(
        n.alias("n_pairs"),
        s1.alias("sum_cc"),
        (F.sum(F.col("dist") * F.col("cc")).cast("double") / s1).alias("avg_dist"),
        (F.sqrt(var) / F.sqrt(n)).alias("stderr"),
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def q_agg_distinct(spark, sf_dir):
    """Exact distinct per group (EXT) — expand+dedup handled by Catalyst."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("q_agg_approx", oracle=_golden_oracle("q_agg_approx"))
def q_agg_approx(spark, sf_dir):
    """Approximate distinct via HyperLogLog++ (EXT).  At 100 TB this is
    the only sane distinct-cardinality path: fixed-size sketch, one pass,
    mergeable across partitions."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_id").alias("approx_events"),
    )


_ORDERS_JOINED_SQL = """
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


def _orders_joined(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
    )


@register(
    "q_corr_exact",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         -- DECIMAL(24,4) inputs force DuckDB's exact hugeint multiply
         -- (an int64-width (18,4) product overflows past 10^18)
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(24,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(24,4)) AS DECIMAL(38,8))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(24,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 9) AS corr_qty_price
FROM s
""",
)
def q_corr_exact(spark, sf_dir):
    """Pearson correlation per group via EXACT decimal sufficient
    statistics: the five sums are order-independent DECIMAL aggregates
    (shuffle-safe — a float running sum would make the result depend on
    partition merge order), and only the final closed-form expression
    runs in DOUBLE.  The built-in F.corr streams float moments and is
    NOT reproducible across partitionings; this form is, bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")

    def d18(c):
        return F.col(c).cast("decimal(18,4)")

    def dprod(a, b):
        return (d18(a) * d18(b)).cast("decimal(38,8)")

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d18("l_quantity")).cast("double").alias("sx"),
        F.sum(d18("l_extendedprice")).cast("double").alias("sy"),
        F.sum(dprod("l_quantity", "l_quantity")).cast("double").alias("sxx"),
        F.sum(dprod("l_extendedprice", "l_extendedprice"))
        .cast("double")
        .alias("syy"),
        F.sum(dprod("l_quantity", "l_extendedprice"))
        .cast("double")
        .alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "l_returnflag", "n", F.round(corr, 9).alias("corr_qty_price")
    )


@register(
    "q_rollup",
    oracle=f"""
SELECT r_name, n_name,
       CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
{_ORDERS_JOINED_SQL}
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_rollup(spark, sf_dir):
    """Hierarchical totals region→nation→grand (EXT)."""
    return (
        _orders_joined(spark, sf_dir)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            agg.dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "q_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        agg.dsum("l_quantity").alias("sum_qty"),
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""".strip()


@register("q_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark, sf_dir):
    """Explicit grouping sets — same SQL text on both engines (Spark
    runs it over a namespaced temp view)."""
    view = "pfithic_spark_lineitem_src"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(_GROUPING_SETS_SQL.replace("FROM lineitem", f"FROM {view}"))


@register(
    "q_pivot",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS qty_A,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag = 'N') AS DOUBLE) AS qty_N,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS qty_R
FROM lineitem
GROUP BY l_linestatus
""",
)
def q_pivot(spark, sf_dir):
    """Wide per-category aggregates via pivot (EXT).  Pivot values are
    given explicitly — never let Spark scan for distinct values at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(agg.dsum("l_quantity"))
    )
    return p.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


# ========================================================================
# §2.5 window functions
# ========================================================================

from . import windows as win  # noqa: E402

_BYD_CTE = """
byd AS (
  SELECT mid2 - mid1 AS d,
         CAST(SUM(contact_count) AS BIGINT) AS cc,
         COUNT(*) AS np
  FROM contacts
  GROUP BY mid2 - mid1
)
""".strip()


@register(
    "q_window_running",
    oracle=f"""
WITH {fx.contacts_cte()},
{_BYD_CTE}
SELECT d, cc,
       CAST(SUM(cc) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cc
FROM byd
""",
)
def q_window_running(spark, sf_dir):
    """Global running sum over distance — the heart of equal-occupancy
    binning — via the TWO-PHASE scalable cumsum (§4.4), not a one-task
    global window."""
    c = rel.with_distance(fx.fixture_contacts(spark, sf_dir))
    byd = win.per_distance_totals(c)
    return win.scalable_cumsum(byd, "d", "cc", "running_cc").select(
        "d", "cc", "running_cc"
    )


@register(
    "q_equal_occupancy_binning",
    oracle=f"""
WITH {fx.contacts_cte()},
{_BYD_CTE},
tot AS (SELECT CAST(SUM(cc) AS DOUBLE) / {fx.NBINS_OCC}.0 AS target FROM byd),
cum AS (
  SELECT d, cc, np,
         SUM(cc) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumcc
  FROM byd
),
assigned AS (
  SELECT d, cc, np,
         LEAST(CAST(FLOOR((cumcc - cc) / target) AS BIGINT), {fx.NBINS_OCC - 1}) AS bin_id
  FROM cum CROSS JOIN tot
)
SELECT bin_id,
       CAST(MIN(d) AS BIGINT) AS min_dist,
       CAST(MAX(d) AS BIGINT) AS max_dist,
       CAST(SUM(cc) AS BIGINT) AS sum_cc,
       CAST(SUM(np) AS BIGINT) AS n_pairs,
       CAST(SUM(d * cc) AS DOUBLE) / SUM(cc) AS avg_dist
FROM assigned
GROUP BY bin_id
""",
)
def q_equal_occupancy_binning(spark, sf_dir):
    """Full equal-occupancy binning [SC-1]: per-distance compression →
    scalable cumsum → bin assignment → per-bin support stats
    (ref: calculateProbabilities)."""
    c = rel.with_distance(fx.fixture_contacts(spark, sf_dir))
    byd = win.per_distance_totals(c)
    assigned = win.equal_occupancy_assign(byd, fx.NBINS_OCC)
    return win.bin_stats(assigned)


#: BH test count M = possible intra pairs on the 500-bin grid summed
#: over the fixture's chromosomes [SC-3]
POSSIBLE_PAIRS_M = fx.N_CHROMS * fx.NBINS_GRID * (fx.NBINS_GRID - 1) // 2

_SCORED_CTE = """
scored AS (
  SELECT chr1, mid1, chr2, mid2, contact_count,
         CAST((mid1 * 31 + mid2 * 17 + contact_count * 7919) % 1000003 AS DOUBLE) / 1000003.0 AS p_value
  FROM contacts
)
""".strip()


@register(
    "q_bh_fdr",
    oracle=f"""
WITH {fx.contacts_cte()},
{_SCORED_CTE},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p_value, chr1, mid1, mid2) AS rk FROM scored
),
q0 AS (
  SELECT *, LEAST(1.0, p_value * {POSSIBLE_PAIRS_M}.0 / rk) AS q_raw FROM ranked
)
SELECT chr1, mid1, chr2, mid2, contact_count,
       ROUND(p_value, 9) AS p_value,
       ROUND(MIN(q_raw) OVER (ORDER BY rk DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 9) AS q_value
FROM q0
""",
)
def q_bh_fdr(spark, sf_dir):
    """Benjamini–Hochberg with M = possible (not observed) pair count
    [SC-3] over a deterministic synthetic p column (the real pipeline
    plugs binom_sf p-values into the same operator)."""
    c = fx.fixture_contacts(spark, sf_dir)
    scored = c.withColumn(
        "p_value",
        (
            (F.col("mid1") * 31 + F.col("mid2") * 17 + F.col("contact_count") * 7919)
            % 1000003
        ).cast("double")
        / 1000003.0,
    )
    out = win.bh_fdr(
        scored, "p_value", m=POSSIBLE_PAIRS_M, tiebreak=["chr1", "mid1", "mid2"]
    )
    return out.select(
        "chr1",
        "mid1",
        "chr2",
        "mid2",
        "contact_count",
        F.round("p_value", 9).alias("p_value"),
        F.round("q_value", 9).alias("q_value"),
    )


@register(
    "q_window_ntile",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 9) AS prk,
       ROUND(CUME_DIST() OVER w, 9) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_ntile(spark, sf_dir):
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per customer — engine-completeness family alongside q_window_rank.
    Deterministic tie-breaker (orderkey) in the ordering."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("prk"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )


@register(
    "q_join_outer",
    oracle="""
WITH c AS (
  SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey % 5 < 3
),
o AS (
  SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT COALESCE(c.k, o.k) AS custkey,
       COALESCE(c.c_acctbal, -99999.0) AS acctbal,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders
FROM c FULL OUTER JOIN o ON c.k = o.k
""",
)
def q_join_outer(spark, sf_dir):
    """Full outer join with unmatched rows on BOTH sides (custkey%5
    filter creates order-only keys; customers without orders create
    customer-only keys).  Sentinels instead of NULLs so the value hash
    is engine-portable."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 5 < 3)
        .select(F.col("c_custkey").alias("k"), "c_acctbal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = cust.join(orders, "k", "full_outer")
    return j.select(
        F.col("k").alias("custkey"),
        F.coalesce("c_acctbal", F.lit(-99999.0)).alias("acctbal"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


@register(
    "q_window_rank",
    oracle="""
SELECT c_nationkey, c_custkey, c_acctbal,
       CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS drnk,
       CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
FROM customer
""",
)
def q_window_rank(spark, sf_dir):
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    wt = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(wt).cast("long").alias("rn"),
    )


@register(
    "q_window_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS moving_sum,
       COUNT(*) OVER w AS n_in_frame,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS moving_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def q_window_frame(spark, sf_dir):
    """Sliding rows-frame aggregates; decimal sums keep the moving
    average bit-deterministic."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    msum = F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        msum.alias("moving_sum"),
        cnt.alias("n_in_frame"),
        (msum / cnt).alias("moving_avg"),
    )


@register(
    "q_window_lead_lag",
    oracle="""
WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
SELECT event_id, user_id, us,
       us - LAG(us) OVER w AS delta_us,
       LEAD(event_id) OVER w AS next_event_id
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
""",
)
def q_window_lead_lag(spark, sf_dir):
    """Neighbor access per user ordered by time (epoch-us integers via
    io.epoch_us, so the math is tz-proof)."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_id", "user_id", epoch_us(ev_raw).alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "us",
        (F.col("us") - F.lag("us").over(w)).alias("delta_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "q_topk_per_group",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
""",
)
def q_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return win.topk_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


# ========================================================================
# §2.9 statistical kernels
# ========================================================================

from . import hic  # noqa: E402

#: closed-form power-law null used by the SQL-expressible stat queries
#: (the real pipeline plugs the fitted spline into the same operators)
_NULL_SQL = "1.0 / (1.0 + (mid2 - mid1) / 5000.0)"


def _null_prob_col():
    return 1.0 / (1.0 + (F.col("mid2") - F.col("mid1")) / 5000.0)


def _chr_nbins(spark):
    """Fixture chromosome dimension: N_CHROMS chromosomes, same grid."""
    return spark.createDataFrame(
        [(f"chr{i + 1}", fx.NBINS_GRID) for i in range(fx.N_CHROMS)],
        "chr string, nbins int",
    )


@register(
    "q_possible_pairs",
    oracle=f"""
SELECT CAST(k * {fx.RES} AS BIGINT) AS dist,
       CAST({fx.N_CHROMS} * ({fx.NBINS_GRID} - k) AS BIGINT) AS n_possible
FROM generate_series(1, {fx.NBINS_GRID - 1}) t(k)
""",
)
def q_possible_pairs(spark, sf_dir):
    """Possible intra pairs per genomic distance (lag k on an n-bin grid
    has n−k pairs, summed over chromosomes) — the BH denominator's
    source [SC-3] (ref: generate_FragPairs)."""
    return hic.possible_pairs_per_lag(_chr_nbins(spark), fx.RES)


@register(
    "q_possible_pairs_frag",
    oracle=f"""
WITH {fx.frags_cte()}
SELECT CAST(b.mid - a.mid AS BIGINT) AS dist,
       COUNT(*) AS n_possible
FROM frags a
JOIN frags b
  ON a.chr = b.chr AND b.mid > a.mid
 AND b.mid - a.mid BETWEEN 10000 AND 200000
GROUP BY 1
""",
)
def q_possible_pairs_frag(spark, sf_dir):
    """Fragment-mode (res=0) possible-pair census: per-distance counts
    over the ACTUAL irregular fragment midpoints, not a grid closed form
    (ref: generate_FragPairs with variable restriction fragments).
    Banded self-join — each fragment probes only the two dist_hi-wide
    buckets that can hold in-range partners."""
    frags = fx.fixture_fragments(spark, sf_dir)
    return hic.possible_pairs_from_fragments(frags, 10_000, 200_000)


@register(
    "q_contact_prior",
    oracle=f"""
WITH {fx.contacts_cte()},
{fx.biases_cte()},
j AS (
  SELECT c.chr1, c.mid1, c.chr2, c.mid2, c.contact_count,
         COALESCE(b1.bias, 1.0) AS bias1,
         COALESCE(b2.bias, 1.0) AS bias2
  FROM contacts c
  LEFT JOIN biases b1 ON b1.chr = c.chr1 AND b1.mid = c.mid1
  LEFT JOIN biases b2 ON b2.chr = c.chr2 AND b2.mid = c.mid2
)
SELECT chr1, mid1, chr2, mid2, contact_count, bias1, bias2,
       {_NULL_SQL} AS null_prob,
       LEAST(GREATEST(
         {_NULL_SQL} *
         CASE WHEN bias1 < 0.5 OR bias1 > 2.0 OR bias2 < 0.5 OR bias2 > 2.0
              THEN 1.0 ELSE bias1 * bias2 END,
         0.0), 1.0) AS p_prior
FROM j
""",
)
def q_contact_prior(spark, sf_dir):
    """Contact prior p = null(d)·bias1·bias2 with the SC-2 bias validity
    window (out-of-[0.5,2] endpoint → neutral product), clamped to [0,1]
    (ref: fit_Spline prior assembly)."""
    c = fx.fixture_contacts(spark, sf_dir)
    b = fx.fixture_biases(spark, sf_dir)
    j = rel.attach_biases(c, b)
    return j.select(
        "chr1",
        "mid1",
        "chr2",
        "mid2",
        "contact_count",
        "bias1",
        "bias2",
        _null_prob_col().alias("null_prob"),
        hic.contact_prior(
            None, _null_prob_col(), F.col("bias1"), F.col("bias2")
        ).alias("p_prior"),
    )


#: possible inter-chromosomal pairs on the two 500-bin fixture grids
_POSSIBLE_INTER = fx.NBINS_GRID * fx.NBINS_GRID


@register(
    "q_contact_prior_inter",
    oracle=f"""
WITH {fx.inter_cte()},
{fx.biases_cte()},
tot AS (
  SELECT CAST(SUM(contact_count) AS DOUBLE) / {_POSSIBLE_INTER}.0 AS p0
  FROM inter
),
j AS (
  SELECT i.chr1, i.mid1, i.chr2, i.mid2, i.contact_count,
         COALESCE(b1.bias, 1.0) AS bias1,
         COALESCE(b2.bias, 1.0) AS bias2
  FROM inter i
  LEFT JOIN biases b1 ON b1.chr = i.chr1 AND b1.mid = i.mid1
  LEFT JOIN biases b2 ON b2.chr = i.chr2 AND b2.mid = i.mid2
)
SELECT chr1, mid1, chr2, mid2, contact_count, bias1, bias2,
       LEAST(GREATEST(
         p0 *
         CASE WHEN bias1 < 0.5 OR bias1 > 2.0 OR bias2 < 0.5 OR bias2 > 2.0
              THEN 1.0 ELSE bias1 * bias2 END,
         0.0), 1.0) AS p_prior
FROM j CROSS JOIN tot
""",
)
def q_contact_prior_inter(spark, sf_dir):
    """Inter-chromosomal contact prior [SC-5]: the FLAT interChrProb
    null (observedInterAllSum / possibleInterAllCount) times the
    bias-validity product, clamped — the scoring path 'All'/'interOnly'
    modes use (ref: fithic.py interChrProb).  The scalar null is one
    bounded agg collect; bias joins broadcast on (chr, mid)."""
    i = fx.fixture_inter_contacts(spark, sf_dir)
    b = fx.fixture_biases(spark, sf_dir)
    total = i.agg(F.sum("contact_count")).collect()[0][0]
    # SUM over zero rows is SQL NULL → empty slice scores with p0 = 0
    p0 = float(total or 0) / float(_POSSIBLE_INTER)
    j = rel.attach_biases(i, b)
    return j.select(
        "chr1",
        "mid1",
        "chr2",
        "mid2",
        "contact_count",
        "bias1",
        "bias2",
        hic.contact_prior(
            None, F.lit(p0), F.col("bias1"), F.col("bias2")
        ).alias("p_prior"),
    )


@register("q_binom_sf", oracle=_golden_oracle("q_binom_sf"))
def q_binom_sf(spark, sf_dir):
    """Binomial survival p-values P(X ≥ cc | N, prior) via the numpy
    betainc kernel in an Arrow pandas_udf (ref: fit_Spline scoring,
    scipy.stats.binom.sf(cc-1, N, p)).  Accuracy gate: tests/test_stats.py
    vs mpmath; the DuckDB oracle is a committed golden parquet whose
    every value was mpmath-certified at generation (tools/make_goldens.py),
    so the driver's hash match checks end-to-end bit-reproducibility of
    the distributed path against certified values."""
    c = rel.with_distance(fx.fixture_contacts(spark, sf_dir))
    n_total = c.agg(F.sum("contact_count")).collect()[0][0]
    prior = hic.contact_prior(None, _null_prob_col() * 0.001)
    scored = c.withColumn("p_prior", prior)
    sf_udf = hic._binom_sf_udf(int(n_total or 0))  # empty slice → N=0
    return scored.select(
        "chr1",
        "mid1",
        "chr2",
        "mid2",
        "contact_count",
        "p_prior",
        sf_udf(F.col("contact_count"), F.col("p_prior")).alias("p_value"),
    )


@register("q_spline_fit_eval", oracle=_golden_oracle("q_spline_fit_eval"))
def q_spline_fit_eval(spark, sf_dir):
    """Monotone null-curve fit + distributed evaluation: equal-occupancy
    bin stats → collect ≤noOfBins rows → penalized smooth + PAVA →
    broadcast dense grid → clamped interp in a pandas_udf
    (ref: fit_Spline; SC-4).  Monotonicity property-tested in pytest;
    golden-parquet oracle certified against an independent pandas-dataflow
    refit at generation (tools/make_goldens.py)."""
    c = rel.with_distance(fx.fixture_contacts(spark, sf_dir))
    cfg = hic.SigConfig(resolution=fx.RES, n_bins=fx.NBINS_OCC)
    possible = hic.possible_pairs_np(
        [fx.NBINS_GRID] * fx.N_CHROMS, fx.RES, cfg.dist_lo, cfg.dist_hi
    )[:2]
    # n_total=None: N comes out of the same per-distance collect
    _, (gx, gy), _ = hic.fit_null_curve(spark, c, None, possible, cfg)
    eval_udf = hic._curve_eval_udf(spark, gx, gy)
    byd = win.per_distance_totals(c)
    return byd.select(
        "d", "cc", eval_udf(F.col("d").cast("double")).alias("spline_prob")
    )


@register("q_hic_significance", oracle=_golden_oracle("q_hic_significance"))
def q_hic_significance(spark, sf_dir):
    """End-to-end two-pass significance pipeline (ref: main loop over
    calculateProbabilities → fit_Spline with outlier refinement [SC-7]).
    Golden-tested against an independent pandas implementation in
    tests/test_hic_pipeline.py."""
    c = fx.fixture_contacts(spark, sf_dir)
    b = fx.fixture_biases(spark, sf_dir)
    cfg = hic.SigConfig(
        resolution=fx.RES, n_bins=fx.NBINS_OCC, passes=2, dist_lo=0, dist_hi=2**40
    )
    return hic.run_significance(
        spark,
        c,
        [(f"chr{i + 1}", fx.NBINS_GRID) for i in range(fx.N_CHROMS)],
        biases=b,
        cfg=cfg,
    )


# ========================================================================
# §2.8 scalar function families
# ========================================================================


@register(
    "q_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25.0) AS abs_qty,
       CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS floor_div,
       SQRT(l_extendedprice) AS sqrt_price,
       ROUND(LN(l_extendedprice), 9) AS log_price,
       ROUND(EXP(l_discount), 9) AS exp_disc,
       l_quantity * l_quantity AS qty_sq,
       ROUND(l_extendedprice, 1) AS price_r1
FROM lineitem
""",
)
def q_math_funcs(spark, sf_dir):
    """Math scalar family (ref: spline/stat support math).  Transcendental
    outputs rounded to 9 dp — libm vs JVM differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("abs_qty"),
        F.floor(F.col("l_quantity") / 7.0).cast("long").alias("floor_div"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 9).alias("log_price"),
        F.round(F.exp("l_discount"), 9).alias("exp_disc"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round("l_extendedprice", 1).alias("price_r1"),
    )


@register(
    "q_string_funcs",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       LOWER(c_mktsegment) AS seg_lower,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       CONCAT_WS('|', c_mktsegment, c_name) AS joined,
       REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
       CAST(LEN(STRING_SPLIT(c_name, '#')) AS BIGINT) AS n_parts
FROM customer
""",
)
def q_string_funcs(spark, sf_dir):
    """String scalar family (ref: chromosome-name normalization is the
    only reference usage; rest EXT)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.size(F.split(F.col("c_name"), "#")).cast("long").alias("n_parts"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
       CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
       CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
FROM orders
""",
)
def q_date_funcs(spark, sf_dir):
    """Date scalar family (EXT).  Timestamps leave the query as ISO
    strings / integer day counts (determinism rule)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .cast("string")
        .alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days_since"),
        F.last_day(F.col("o_orderdate").cast("date"))
        .cast("string")
        .alias("month_end"),
    )


from .llmops import dot_double, knuth_hash, l2_norm  # noqa: E402


@register(
    "q_array_funcs",
    oracle="""
SELECT vec_id,
       CAST(LEN(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) / LEN(embedding), 6) AS mean_val
FROM embeddings
""",
)
def q_array_funcs(spark, sf_dir):
    """Array scalar family over the embedding column: size, indexing,
    transform + sequential-fold aggregate (the vector-math workhorse)."""
    e = load_table(spark, sf_dir, "embeddings")
    total = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.round(l2_norm(F.col("embedding")), 6).alias("l2_norm"),
        F.round(total / F.size("embedding"), 6).alias("mean_val"),
    )


@register(
    "q_map_funcs",
    oracle="""
SELECT event_id,
       CAST(LEN(JSON_KEYS(props)) AS BIGINT) AS n_keys,
       JSON_EXTRACT_STRING(props, '$.k') AS k_val
FROM events
""",
)
def q_map_funcs(spark, sf_dir):
    """Map scalar family: props JSON → MapType, key census + lookup."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        m.getItem("k").alias("k_val"),
    )


@register(
    "q_json_funcs",
    oracle="""
SELECT event_id,
       JSON_EXTRACT_STRING(props, '$.k') AS k_str,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_num
FROM events
""",
)
def q_json_funcs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
    )


# ========================================================================
# §2.10 LLM-data-pipeline operators
# ========================================================================

from . import llmops  # noqa: E402
from . import multimodal  # noqa: E402


@register(
    "q_dedup_exact",
    oracle="""
SELECT MD5(LOWER(TRIM(text))) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY MD5(LOWER(TRIM(text)))
""",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup keyed on md5(normalized text) — the shuffle carries
    16-byte keys, not documents (100 TB rule)."""
    return llmops.dedup_exact(load_table(spark, sf_dir, "documents"))


@register("q_dedup_near", oracle=_golden_oracle("q_dedup_near"))
def q_dedup_near(spark, sf_dir):
    """MinHash(64) + 16-band LSH candidate pairs with signature-estimated
    Jaccard (shingle→minhash→band→bucket-join)."""
    return llmops.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@register("q_dedup_simhash", oracle=_golden_oracle("q_dedup_simhash"))
def q_dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs, EXACT within Hamming radius 3 (the
    standard near-dup radius: 4×16-bit chunk banding + bit_count(xor)
    verification).  Banding is sized to the requested radius — wider
    radii (≤15) cost more candidate pairs; recall gate vs a brute-force
    Hamming self-join: tests/test_llmops.py."""
    return llmops.simhash_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(toks) - 2),
           i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])
         ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.id1, p.id2, CAST(p.common AS BIGINT) AS common,
       CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2,
       ROUND(CAST(p.common AS DOUBLE) / (s1.sz + s2.sz - p.common), 9) AS jaccard
FROM pairs p
JOIN sizes s1 ON p.id1 = s1.doc_id
JOIN sizes s2 ON p.id2 = s2.doc_id
""",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard over source-blocked pairs: shingle-set
    explode + equi-join on a 64-bit shingle hash (inverted-index shape —
    the pair space never materializes as a cross product; collision
    odds ~n²/2⁶⁵, the DuckDB oracle keeps strings).  The registered
    form is exhaustive; llmops.ngram_jaccard_pairs(max_df=...) is the
    hot-shingle skew lever for 100 TB corpora."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.ngram_jaccard_pairs(d, block_col="source", max_df=None)


@register(
    "q_dedup_ngram_global",
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(toks) - 2),
           i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])
         ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
kept AS (
  SELECT s.doc_id, s.shingle FROM sh s JOIN freq f USING (shingle)
  WHERE f.df <= 50
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
  FROM kept a JOIN kept b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.id1, p.id2, CAST(p.common AS BIGINT) AS common,
       CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2,
       ROUND(CAST(p.common AS DOUBLE) / (s1.sz + s2.sz - p.common), 9) AS jaccard
FROM pairs p
JOIN sizes s1 ON p.id1 = s1.doc_id
JOIN sizes s2 ON p.id2 = s2.doc_id
""",
)
def q_dedup_ngram_global(spark, sf_dir):
    """CROSS-source 3-gram Jaccard with the max_df=50 hot-shingle cap —
    the unblocked 100 TB form: without a blocking key, the df cap is
    what keeps a boilerplate shingle shared by 10⁶ docs from generating
    ~10¹² candidate pairs.  Jaccard denominators still use full shingle
    sets (documented containment trade); the blocked exhaustive twin is
    q_dedup_ngram_jaccard."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.ngram_jaccard_pairs(d, block_col=None, max_df=50)


@register(
    "q_dedup_embedding",
    oracle="""
WITH s AS (SELECT label, vec_id, embedding FROM embeddings),
pairs AS (
  SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
         ROUND(
           LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         6) AS cosine
  FROM s a JOIN s b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label, id1, id2, cosine FROM pairs WHERE cosine >= 0.25
""",
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs blocked by label (IVF-cell shape:
    equi-join on the block key, no cross product)."""
    e = load_table(spark, sf_dir, "embeddings")
    return llmops.cosine_pairs_blocked_gemm(e, threshold=0.25)


@register(
    "q_sim_topk",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.q_id, e.vec_id AS e_id,
         ROUND(
           LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
             i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           / (SQRT(LIST_SUM(LIST_TRANSFORM(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, e_id) AS rn
  FROM pairs
)
SELECT q_id, e_id, cosine, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= 5
""",
)
def q_sim_topk(spark, sf_dir):
    """Brute-force cosine top-k (k=5) per query vector — broadcast query
    side, arrays stay intact (zip_with fold, no explode)."""
    e = load_table(spark, sf_dir, "embeddings")
    return llmops.cosine_topk(e, e.filter(F.col("vec_id") < 10), k=5)


@register(
    "q_text_stats",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM t GROUP BY lang
""",
)
def q_text_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


@register(
    "q_token_count",
    oracle="""
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS BIGINT) AS ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(TRIM(text)), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
FROM documents
""",
)
def q_token_count(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex segmentation."""
    d = load_table(spark, sf_dir, "documents")
    nt = llmops.norm_text("text")
    return d.select(
        "doc_id",
        F.size(F.split(nt, " ")).cast("long").alias("ws_tokens"),
        F.regexp_count(nt, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


@register(
    "q_quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(LENGTH(text) AS BIGINT) AS n_chars,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\b(the|a)\\b')) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_tokens, n_chars, stop_hits,
       ROUND(
         LEAST(1.0, n_tokens / 50.0) * 0.4
         + LEAST(1.0, stop_hits * 5.0 / n_tokens) * 0.3
         + LEAST(1.0, (CAST(n_chars AS DOUBLE) / n_tokens) / 5.0) * 0.3,
       9) AS quality
FROM t
""",
)
def q_quality_score(spark, sf_dir):
    """Heuristic quality scoring: length, stopword ratio, avg token
    length — identical arithmetic on both engines."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.regexp_count(F.col("text"), F.lit(r"\b(the|a)\b"))
        .cast("long")
        .alias("stop_hits"),
    )
    return t.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        "stop_hits",
        llmops.quality_score_expr().alias("quality"),
    )


@register(
    "q_lang_id",
    oracle="""
WITH c AS (
  SELECT doc_id, lang,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\bthe\\b')) AS BIGINT) AS c_the,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\bdata\\b')) AS BIGINT) AS c_data,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\bspark\\b')) AS BIGINT) AS c_spark
  FROM documents
)
SELECT doc_id, lang, c_the, c_data, c_spark,
       CASE WHEN c_the >= c_data AND c_the >= c_spark THEN 'en'
            WHEN c_data >= c_spark THEN 'de'
            ELSE 'zh' END AS predicted_lang
FROM c
""",
)
def q_lang_id(spark, sf_dir):
    """Marker-token language-ID heuristic (n-gram scoring shape with a
    deterministic argmax)."""
    d = load_table(spark, sf_dir, "documents")
    c = d.select(
        "doc_id",
        "lang",
        F.regexp_count(F.col("text"), F.lit(r"\bthe\b")).cast("long").alias("c_the"),
        F.regexp_count(F.col("text"), F.lit(r"\bdata\b")).cast("long").alias("c_data"),
        F.regexp_count(F.col("text"), F.lit(r"\bspark\b")).cast("long").alias("c_spark"),
    )
    return c.withColumn(
        "predicted_lang",
        F.when(
            (F.col("c_the") >= F.col("c_data")) & (F.col("c_the") >= F.col("c_spark")),
            F.lit("en"),
        )
        .when(F.col("c_data") >= F.col("c_spark"), F.lit("de"))
        .otherwise(F.lit("zh")),
    )


@register(
    "q_fingerprint",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS tok
  FROM documents
),
m AS (
  SELECT doc_id, MIN(MD5(tok)) AS min_tok_sig, COUNT(*) AS n_toks
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, MD5(LOWER(TRIM(d.text))) AS fp_doc, m.min_tok_sig, m.n_toks
FROM documents d JOIN m ON d.doc_id = m.doc_id
""",
)
def q_fingerprint(spark, sf_dir):
    """Document fingerprinting: whole-doc md5 + min token signature
    (winnowing shape)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(llmops.norm_text("text"), " ")).alias("tok")
    )
    m = toks.groupBy("doc_id").agg(
        F.min(F.md5("tok")).alias("min_tok_sig"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    return d.select("doc_id", F.md5(llmops.norm_text("text")).alias("fp_doc")).join(
        m, "doc_id"
    )


@register(
    "q_tfidf_terms",
    oracle="""
WITH toks AS (
  SELECT source, doc_id, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS term
  FROM documents
),
tf AS (SELECT source, term, COUNT(*) AS tf FROM toks GROUP BY source, term),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.source, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / dfreq.df), 9) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
""",
)
def q_tfidf_terms(spark, sf_dir):
    """Top tf-idf terms per source: pure relational pipeline (explode →
    two aggregations → broadcast-joined idf → per-group top-k)."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = d.select(
        "source", "doc_id", F.explode(F.split(llmops.norm_text("text"), " ")).alias("term")
    )
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "source",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 9
        ).alias("tfidf"),
    )
    return win.topk_per_group(
        scored, ["source"], [F.col("tfidf").desc(), F.col("term")], 5
    )


@register(
    "q_pii_redact",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555' || CAST(doc_id * 7 AS VARCHAR)
              || CAST(1000000 + doc_id AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(text,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS BIGINT) AS n_emails,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9][0-9][0-9][0-9][0-9][0-9]+'))
           AS BIGINT) AS n_long_numbers,
       MD5(REGEXP_REPLACE(REGEXP_REPLACE(text,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+', '<EMAIL>', 'g'),
           '[0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g')) AS redacted_md5
FROM aug
""",
)
def q_pii_redact(spark, sf_dir):
    """PII scrubbing: count + redact email-like and long-digit spans.

    Pure JVM regexp (whole-stage codegen) — no UDF; patterns restricted
    to the Java∩RE2 common subset so the DuckDB oracle matches the
    redacted output byte-for-byte (compared via md5).  The synthetic
    corpus has no PII, so a deterministic pii-ish suffix is appended
    in-query on both engines."""
    d = load_table(spark, sf_dir, "documents")
    email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
    num = "[0-9][0-9][0-9][0-9][0-9][0-9]+"
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555"),
            (F.col("doc_id") * 7).cast("string"),
            (F.col("doc_id") + 1_000_000).cast("string"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(num))
        .cast("long")
        .alias("n_long_numbers"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), email, "<EMAIL>"),
                num,
                "<NUM>",
            )
        ).alias("redacted_md5"),
    )


@register(
    "q_sample_stratified",
    oracle="""
WITH h AS (
  SELECT doc_id, source, lang,
         ((doc_id % 2654435761) * 2654435761) % 4294967296 AS hkey
  FROM documents
)
SELECT doc_id, source, lang
FROM h WHERE hkey % 100 < 10
""",
)
def q_sample_stratified(spark, sf_dir):
    """Deterministic hash sampling (training-data subsetting): Knuth
    multiplicative hash on the key, mod-bucket keep — reproducible
    across engines and runs, unlike rand()-based sample().  Fully
    pushdown-friendly: the predicate is a pure projection filter."""
    d = load_table(spark, sf_dir, "documents")
    hkey = knuth_hash("doc_id")
    return d.filter(hkey % 100 < 10).select("doc_id", "source", "lang")


@register(
    "q_pack_sequences",
    oracle="""
WITH t AS (
  SELECT source,
         doc_id,
         ((doc_id % 2654435761) * 2654435761) % 4294967296 AS hkey,
         CAST(((doc_id % 2654435761) * 2654435761) % 4294967296 % 16 AS BIGINT) AS shard,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY hkey, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS cum_before
  FROM t
)
SELECT source, shard,
       CAST(FLOOR(cum_before / 2048.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY source, shard, seq_id
""",
)
def q_pack_sequences(spark, sf_dir):
    """Sequence packing (training-batch construction): greedy
    concatenation order cut at 2048-token boundaries, per
    (source, hash-shard) so the running-total window is embarrassingly
    parallel — no global or single-key window at 100 TB; deterministic
    Knuth-hash order; power-of-two target keeps the float division
    bit-exact across engines."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.pack_sequences(
        d, target_tokens=2048, n_shards=16
    ).select("source", "shard", "seq_id", "n_docs", "total_tokens")


@register(
    "q_repetition_filter",
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         CAST(GREATEST(LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 2, 0) AS BIGINT) AS n_3grams,
         CAST(LEN(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 2),
           i -> CONCAT_WS(' ',
             STRING_SPLIT(LOWER(TRIM(text)), ' ')[i],
             STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+1],
             STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+2])
         ))) AS BIGINT) AS n_distinct
  FROM documents
)
SELECT doc_id, source, n_3grams, n_distinct,
       ROUND(CASE WHEN n_3grams > 0
                  THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_3grams
                  ELSE 0.0 END, 9) AS dup_ratio
FROM t
WHERE CASE WHEN n_3grams > 0
           THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_3grams
           ELSE 0.0 END <= 0.5
""",
)
def q_repetition_filter(spark, sf_dir):
    """Within-document repetition filter (Gopher/RefinedWeb-style
    quality gate): drop documents whose duplicate-3-gram ratio exceeds
    0.5.  Distinct counts come from the ROW-form shingle pipeline
    (posexplode + window lead — whole-stage codegen; the array-lambda
    form runs interpreted per element and measured ~5× slower), one
    doc_id shuffle + partial-final countDistinct; docs too short for a
    3-gram survive via the left join with ratio 0."""
    d = load_table(spark, sf_dir, "documents")
    n3 = F.greatest(
        F.size(F.split(F.lower(F.trim(F.col("text"))), " ")) - 2, F.lit(0)
    ).cast("long")
    base = d.select("doc_id", "source", n3.alias("n_3grams"))
    counts = (
        llmops.shingle_rows(d, k=3, dedup=False)
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_distinct"))
    )
    t = base.join(counts, "doc_id", "left").withColumn(
        "n_distinct", F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long")
    )
    ratio = F.when(
        F.col("n_3grams") > 0,
        1.0 - F.col("n_distinct").cast("double") / F.col("n_3grams"),
    ).otherwise(F.lit(0.0))
    return t.withColumn("dup_ratio", F.round(ratio, 9)).filter(
        ratio <= 0.5
    )


@register(
    "q_ngram_coverage",
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1),
    i -> CONCAT_WS(' ', t[i], t[i+1]))) AS bg
  FROM toks
),
df AS (SELECT bg, COUNT(DISTINCT doc_id) AS df FROM bi GROUP BY bg),
j AS (
  SELECT b.doc_id, CASE WHEN d.df >= 3 THEN 1 ELSE 0 END AS known
  FROM bi b JOIN df d USING (bg)
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(known) AS BIGINT) AS n_known,
       ROUND(CAST(SUM(known) AS DOUBLE) / COUNT(*), 9) AS known_frac
FROM j GROUP BY doc_id
""",
)
def q_ngram_coverage(spark, sf_dir):
    """Corpus-vocabulary coverage score (quality/novelty filter): the
    fraction of a document's bigrams that occur in ≥3 corpus documents.
    Integer-exact (counts + one division — no transcendentals, so the
    oracle hash-matches bit-for-bit).  Inverted-index shape: bigram df
    aggregation, equi-join back, per-doc aggregation — two key shuffles,
    never a pair join."""
    d = load_table(spark, sf_dir, "documents")
    bi = llmops.shingle_rows(d, k=2, dedup=False)
    df_counts = bi.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("df")
    )
    j = bi.join(df_counts, "shingle").select(
        "doc_id", F.when(F.col("df") >= 3, 1).otherwise(0).alias("known")
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("known").cast("long").alias("n_known"),
        F.round(
            F.sum("known").cast("double") / F.count(F.lit(1)), 9
        ).alias("known_frac"),
    )


@register(
    "q_mix_sources",
    oracle="""
WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
m AS (SELECT MIN(n_src) AS min_n FROM c),
r AS (
  SELECT source, SQRT(CAST(min_n AS DOUBLE) / CAST(n_src AS DOUBLE)) AS keep_rate
  FROM c, m
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN r USING (source)
WHERE ((d.doc_id % 2654435761) * 2654435761) % 4294967296 % 1000000
      < CAST(FLOOR(keep_rate * 1000000.0) AS BIGINT)
""",
)
def q_mix_sources(spark, sf_dir):
    """Deterministic source rebalancing (training-mixture construction):
    square-root damping toward uniform via a hash-threshold keep — the
    per-source rate dimension broadcasts, the corpus never shuffles,
    and the kept set is engine-exact (correctly-rounded IEEE ops)."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.mix_sources_balanced(d)


@register(
    "q_contamination",
    oracle="""
WITH probe AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
c_sh AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
    GENERATE_SERIES(1, LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 4),
    i -> CONCAT_WS(' ',
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+1],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+2],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+3],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+4])
  ))) AS shingle
  FROM documents
),
p_sh AS (
  SELECT doc_id AS probe_doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
    GENERATE_SERIES(1, LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 4),
    i -> CONCAT_WS(' ',
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+1],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+2],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+3],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+4])
  ))) AS shingle
  FROM probe
)
SELECT c.doc_id, p.probe_doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM c_sh c JOIN p_sh p USING (shingle)
WHERE c.doc_id <> p.probe_doc_id
GROUP BY c.doc_id, p.probe_doc_id
""",
)
def q_contamination(spark, sf_dir):
    """Benchmark-contamination detection: 5-gram overlap between the
    corpus and a (deterministic) probe set.  The probe side broadcasts —
    the corpus shingle stream never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    return llmops.contamination_pairs(d, probe, k=5)


@register(
    "q_multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS BIGINT) AS fake_width,
       CAST((OCTET_LENGTH(ENCODE(text)) * 7) % 480 + 1 AS BIGINT) AS fake_height,
       CAST(OCTET_LENGTH(ENCODE(text)) % 16 + 1 AS BIGINT) AS fake_frames,
       MD5(text) AS checksum
FROM documents
""",
)
def q_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary payload → Arrow mapInPandas
    metadata extraction (decode step stubbed deterministically; schema,
    batching and UDF signature are the real thing)."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_media_meta(multimodal.with_binary_payload(d))


@register(
    "q_multimodal_resize",
    oracle="""
WITH d AS (
  SELECT doc_id,
         OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS w,
         (OCTET_LENGTH(ENCODE(text)) * 7) % 480 + 1 AS h
  FROM documents
),
s1 AS (
  SELECT doc_id, w, h,
         CASE WHEN w > 128 THEN 128 ELSE w END AS w1,
         CASE WHEN w > 128 THEN GREATEST(h * 128 // w, 1) ELSE h END AS h1
  FROM d
)
SELECT doc_id,
       CAST(w AS BIGINT) AS src_width,
       CAST(h AS BIGINT) AS src_height,
       CAST(CASE WHEN h1 > 128 THEN GREATEST(w1 * 128 // h1, 1)
                 ELSE w1 END AS BIGINT) AS out_width,
       CAST(CASE WHEN h1 > 128 THEN 128 ELSE h1 END AS BIGINT) AS out_height
FROM s1
""",
)
def q_multimodal_resize(spark, sf_dir):
    """Bounded aspect-preserving resize over binary payloads (decode
    stubbed; integer-only dimension math so the oracle replays it)."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.resize_media(multimodal.with_binary_payload(d))


@register(
    "q_multimodal_frames",
    oracle="""
WITH m AS (
  SELECT doc_id, MD5(text) AS ck,
         OCTET_LENGTH(ENCODE(text)) % 16 + 1 AS frames
  FROM documents
),
f AS (
  SELECT doc_id, ck,
         UNNEST(GENERATE_SERIES(0, frames - 1, 4)) AS frame_idx
  FROM m
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       MD5(ck || '-' || CAST(frame_idx AS VARCHAR)) AS frame_checksum
FROM f
""",
)
def q_multimodal_frames(spark, sf_dir):
    """Every-4th-frame sampling from fake-decoded video payloads — the
    fan-out happens inside the Arrow batch (mapInPandas generator), so
    a 100 TB corpus never routes frame rows through the driver."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.with_binary_payload(d), stride=4)


def _hex16_sql(i: int) -> str:
    """SQL expression parsing hex chars [4i, 4i+4) of MD5(text) as int."""
    nibbles = [
        f"(STRPOS('0123456789abcdef', SUBSTR(MD5(text), {4 * i + j + 1}, 1)) - 1)"
        for j in range(4)
    ]
    return (
        f"({nibbles[0]} * 4096 + {nibbles[1]} * 256 "
        f"+ {nibbles[2]} * 16 + {nibbles[3]})"
    )


@register(
    "q_multimodal_features",
    oracle="SELECT doc_id, "
    + ", ".join(
        f"CAST({_hex16_sql(i)} AS BIGINT) AS f{i}"
        for i in range(multimodal.FEATURE_DIM)
    )
    + " FROM documents",
)
def q_multimodal_features(spark, sf_dir):
    """Feature-extraction stage (model inference stand-in): fixed-width
    vector per payload via vectorized pandas ops in mapInPandas."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.with_binary_payload(d))


# ========================================================================
# §2.11 streaming (batch twins — see streaming.py for readStream forms)
# ========================================================================

from . import streaming as strm  # noqa: E402

_US_PER_HOUR = 3600 * 1000 * 1000
_US_PER_15MIN = 900 * 1000 * 1000


@register(
    "q_stream_tumbling",
    oracle=f"""
SELECT CAST(EPOCH_US(ts) // {_US_PER_HOUR} * 3600 AS BIGINT) AS window_start_s,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling 1 h windows per event type — epoch-integer window math
    (tz-proof); identical logical spec as streaming.tumbling_counts."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("_us", epoch_us(ev))
    ws = (F.expr(f"_us div {_US_PER_HOUR}") * 3600).cast("long")
    return (
        ev.select(
            ws.alias("window_start_s"),
            "event_type",
            "value",
        )
        .groupBy("window_start_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            agg.dsum("value", 6).alias("sum_value"),
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
WITH w AS (
  SELECT event_type, value,
         (EPOCH_US(ts) // {_US_PER_15MIN}) * 900 - k * 900 AS window_start_s
  FROM events, GENERATE_SERIES(0, 3) t(k)
)
SELECT CAST(window_start_s AS BIGINT) AS window_start_s, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM w GROUP BY 1, 2
""",
)
def q_stream_sliding(spark, sf_dir):
    """Sliding 1 h / 15 min windows: each event belongs to 4 windows —
    explode(sequence) replication, then one hash aggregation."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("_us", epoch_us(ev))
    base = (F.expr(f"_us div {_US_PER_15MIN}") * 900).cast("long")
    w = ev.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
        base.alias("base_s"),
    ).select(
        (F.col("base_s") - F.col("k") * 900).alias("window_start_s"),
        "event_type",
        "value",
    )
    return w.groupBy("window_start_s", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        agg.dsum("value", 6).alias("sum_value"),
    )


@register(
    "q_stream_topk",
    oracle=f"""
WITH w AS (
  SELECT CAST(EPOCH_US(ts) // {_US_PER_HOUR} * 3600 AS BIGINT) AS window_start_s,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY window_start_s ORDER BY n_events DESC, event_type
  ) AS rnk
  FROM w
)
SELECT window_start_s, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
""",
)
def q_stream_topk(spark, sf_dir):
    """Top-3 event types per tumbling hour (trending-items shape): one
    hash aggregation, then WindowGroupLimit rank pruning per window —
    the per-window agg output is bounded by |event types|, so the rank
    window never sees raw events."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("_us", epoch_us(ev))
    ws = (F.expr(f"_us div {_US_PER_HOUR}") * 3600).cast("long")
    agg_w = (
        ev.select(ws.alias("window_start_s"), "event_type")
        .groupBy("window_start_s", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    rnk = F.row_number().over(
        W.partitionBy("window_start_s").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
    )
    return agg_w.withColumn("rnk", rnk.cast("long")).filter(F.col("rnk") <= 3)


@register(
    "q_stream_stateful",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
""",
)
def q_stream_stateful(spark, sf_dir):
    """Batch twin of streaming.stateful_user_totals (the
    applyInPandasWithState custom stateful operator): final per-user
    state equals a plain groupBy total, which is what the oracle checks;
    the incremental-state streaming form is smoke-tested in
    tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        agg.dsum("value", 6).alias("total_value"),
    )


@register(
    "q_stream_session",
    oracle="""
WITH t AS (SELECT user_id, event_id, EPOCH_US(ts) AS us FROM events),
g AS (
  SELECT *,
         CASE WHEN LAG(us) OVER w IS NULL
                OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
       CAST(MIN(us) AS BIGINT) AS sess_start_us,
       CAST(MAX(us) AS BIGINT) AS sess_end_us
FROM s GROUP BY user_id, sess_id
""",
)
def q_stream_session(spark, sf_dir):
    """Sessionization (30 min gap) as batch islands-and-gaps — the
    SQL-checkable twin of streaming.session_counts (session_window)."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id", "event_id", epoch_us(ev_raw).alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    g = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return s.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("sess_start_us"),
        F.max("us").alias("sess_end_us"),
    )


@register(
    "q_stream_dedup",
    oracle="""
SELECT DISTINCT event_id FROM events
""",
)
def q_stream_dedup(spark, sf_dir):
    """Batch twin of streaming.dedup_within_watermark: exact dedup on
    the event key over a duplicated input (self-union) — the streaming
    form bounds its state by the watermark; the batch form is one
    hash-agg shuffle on the key."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    return ev.unionByName(ev).dropDuplicates(["event_id"])


@register(
    "q_text_clean",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         text || ' see https://site' || CAST(doc_id AS VARCHAR)
              || '.example/path?q=1 and http://m' || CAST(doc_id * 3 AS VARCHAR)
              || '.org end' AS text
  FROM documents
)
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
       MD5(TRIM(REGEXP_REPLACE(
         REGEXP_REPLACE(text, 'https?://[^ ]+', ' ', 'g'),
         '  +', ' ', 'g'))) AS cleaned_md5
FROM aug
""",
)
def q_text_clean(spark, sf_dir):
    """Corpus cleaning: strip URLs and collapse the whitespace they
    leave behind — pure JVM regexp in the Java∩RE2 subset (codegen, no
    UDF), output compared via md5.  The synthetic corpus has no URLs,
    so deterministic ones are appended in-query on both engines."""
    url = "https?://[^ ]+"
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            F.col("doc_id").cast("string"),
            F.lit(".example/path?q=1 and http://m"),
            (F.col("doc_id") * 3).cast("string"),
            F.lit(".org end"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(url)).cast("long").alias("n_urls"),
        F.md5(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), url, " "), "  +", " "
                )
            )
        ).alias("cleaned_md5"),
    )


@register(
    "q_cap_per_group",
    oracle="""
WITH h AS (
  SELECT doc_id, source,
         ((doc_id % 2654435761) * 2654435761) % 4294967296 AS hkey
  FROM documents
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS rn
  FROM h
)
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 100
""",
)
def q_cap_per_group(spark, sf_dir):
    """Training-data downsampling: keep at most N documents per source,
    chosen by deterministic hash order (reproducible across runs and
    engines, unlike rand()).  row_number ≤ k rewrites to
    WindowGroupLimit — per-partition top-k, no full sort at scale."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        "source",
        (knuth_hash("doc_id")).alias(
            "hkey"
        ),
    )
    return win.topk_per_group(
        h, ["source"], [F.col("hkey"), F.col("doc_id")], 100
    ).select("doc_id", "source", "rn")


@register("q_agg_approx_quantile", oracle=_golden_oracle("q_agg_approx_quantile"))
def q_agg_approx_quantile(spark, sf_dir):
    """Approximate percentiles per group via the KLL/GK-style sketch
    (percentile_approx) — the one-pass mergeable path for quantiles at
    100 TB (exact percentile needs a per-group sort).  Accuracy vs the
    exact form is pytest-gated (tests/test_parity.py)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("median_approx"),
        F.percentile_approx("o_totalprice", 0.9, 10_000).alias("p90_approx"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_stream_join",
    oracle="""
WITH t AS (SELECT user_id, event_id, EPOCH_US(ts) AS us FROM events)
SELECT a.user_id,
       a.event_id AS l_event_id,
       b.event_id AS r_event_id,
       CAST(a.us - b.us AS BIGINT) AS lag_us
FROM t a
JOIN t b
  ON a.user_id = b.user_id
 AND b.us <= a.us
 AND b.us >= a.us - 1800000000
""",
)
def q_stream_join(spark, sf_dir):
    """Batch twin of streaming.join_streams_within (stream-stream join
    with watermark + time-range bound): per-user event pairs within a
    30-minute trailing window.  The streaming form is reconciled against
    this exact join in tests/test_streaming.py.

    TIME-BANDED: the right side's partner must lie in one of two
    window-wide time buckets, so the equi-join key is (user_id, bucket)
    — a hot user's rows spread across time buckets instead of one
    quadratic partition (same banding as the fragment-census join)."""
    w = 1_800_000_000  # 30 min in µs
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id", "event_id", epoch_us(ev_raw).alias("us")
    )
    left = ev.select(
        "user_id",
        F.col("event_id").alias("l_event_id"),
        F.col("us").alias("l_us"),
        F.explode(
            F.array(F.floor(F.col("us") / w), F.floor(F.col("us") / w) - 1)
        ).alias("_bkt"),
    )
    right = ev.select(
        "user_id",
        F.col("event_id").alias("r_event_id"),
        F.col("us").alias("r_us"),
        F.floor(F.col("us") / w).alias("_bkt"),
    )
    return (
        left.join(right, ["user_id", "_bkt"])
        .filter(
            (F.col("r_us") <= F.col("l_us"))
            & (F.col("r_us") >= F.col("l_us") - w)
        )
        .select(
            "user_id",
            "l_event_id",
            "r_event_id",
            (F.col("l_us") - F.col("r_us")).alias("lag_us"),
        )
    )


@register("q_hic_significance_all", oracle=_golden_oracle("q_hic_significance_all"))
def q_hic_significance_all(spark, sf_dir):
    """End-to-end significance in contact_type='All' mode: intra
    contacts scored against the fitted distance null, inter contacts
    against the flat interChrProb null [SC-5], one combined BH pass
    with M = possibleIntra + possibleInter.  Inter semantics are
    golden-tested in tests/test_hic_pipeline.py
    (test_all_mode_matches_pandas_ref vs the independent pandas All-mode
    dataflow); the DuckDB oracle is a committed golden parquet certified
    against that same reference at generation (tools/make_goldens.py),
    upgrading this key from rows-only to a full hash match."""
    c = fx.fixture_contacts(spark, sf_dir).unionByName(
        fx.fixture_inter_contacts(spark, sf_dir)
    )
    b = fx.fixture_biases(spark, sf_dir)
    cfg = hic.SigConfig(
        resolution=fx.RES,
        n_bins=fx.NBINS_OCC,
        passes=1,
        dist_lo=0,
        dist_hi=2**40,
        contact_type="All",
    )
    return hic.run_significance(
        spark,
        c,
        [(f"chr{i + 1}", fx.NBINS_GRID) for i in range(fx.N_CHROMS)],
        biases=b,
        cfg=cfg,
    )


@register("q_kr_balance", oracle=_golden_oracle("q_kr_balance"))
def q_kr_balance(spark, sf_dir):
    """Knight–Ruiz bias vector per chromosome (ref: utils/HiCKRy.py),
    distributed one chromosome per applyInPandas group.  Validated by
    the row-sum property test in tests/test_hic_pipeline.py."""
    c = fx.fixture_contacts(spark, sf_dir)
    return hic.kr_biases(c, fx.RES)


#: Committed IVF centroids (trained once at sf0.01 by
#: tools/make_goldens.py, recall-certified, then frozen).  Loading the
#: frozen model instead of re-training makes the registered probe fully
#: deterministic — training is the only nondeterministic-across-layouts
#: step — which is what lets q_sim_ivf carry a golden hash oracle.
_IVF_CENTROIDS_PATH = os.path.join(_GOLDEN_DIR, "ivf_centroids.parquet")


def _ivf_centroids(spark, sf_dir):
    """Frozen golden centroids when committed; seeded training fallback
    otherwise (the library path, llmops.ivf_train_centroids)."""
    if os.path.exists(_IVF_CENTROIDS_PATH):
        import pandas as pd

        pdf = pd.read_parquet(_IVF_CENTROIDS_PATH).sort_values("cell")
        return [list(map(float, v)) for v in pdf["centroid"]]
    e = load_table(spark, sf_dir, "embeddings")
    return llmops.ivf_train_centroids(e, k=16, max_iter=10)


@register("q_sim_ivf", oracle=_golden_oracle("q_sim_ivf"))
def q_sim_ivf(spark, sf_dir):
    """Full IVF scale path for similarity search, end to end: load the
    frozen spherical-k-means centroids (trained once and committed —
    the faiss deployment shape: train offline, ship the index model),
    materialize the corpus as a cell-PARTITIONED parquet index
    (ivf_write_index), then probe it partition-pruned (ivf_topk_pruned)
    — only the probed cells' files are read, which is what makes the op
    sublinear at 100 TB.  The recall floor vs brute force and the
    PartitionFilters plan gate live in tests/test_llmops.py and
    tests/test_plans.py; the golden oracle is independently certified
    by a pure-python IVF probe replication in tools/make_goldens.py."""
    import hashlib
    import tempfile

    e = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    # empty corpus → empty result, probe schema (isEmpty probes one
    # partition — cheap at any scale; without the guard the partitioned
    # index write emits zero files and the probe-side read cannot infer
    # a schema)
    if len(cents) == 0 or e.isEmpty():
        return spark.createDataFrame(
            [], "q_id long, e_id long, cosine double, rn long"
        )
    # tag the on-disk index by (sf_dir, centroid bytes) so a model or
    # fixture change can never serve a stale index from a prior session
    tag = hashlib.sha1(
        sf_dir.encode() + repr(cents).encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pfithic_ivf_index_{tag}")
    llmops.ivf_write_index(e, cents, path)
    return llmops.ivf_topk_pruned(
        spark, path, e.filter(F.col("vec_id") < 10), cents, k=5, nprobe=4
    )


@register(
    "q_window_range_frame",
    oracle="""
WITH t AS (
  SELECT o_custkey, o_orderkey,
         CAST(EPOCH_US(o_orderdate) / 86400000000 AS BIGINT) AS day_no,
         o_totalprice
  FROM orders
)
SELECT o_custkey, o_orderkey, day_no,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_90d_spend
FROM t
""",
)
def q_window_range_frame(spark, sf_dir):
    """RANGE (value-based) frame: trailing-90-day spend per customer —
    the range twin of the rows-frame query (frame bounds in day units
    over an epoch-day integer, so both engines agree exactly)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast("double")
            / 86400000000.0
        )
        .cast("long")
        .alias("day_no"),
        "o_totalprice",
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-90, W.currentRow)
    )
    return t.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_90d_spend"),
    )


@register(
    "q_agg_percentile",
    oracle="""
SELECT o_orderpriority,
       QUANTILE_CONT(o_totalprice, 0.5) AS median_price,
       QUANTILE_CONT(o_totalprice, 0.9) AS p90_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_percentile(spark, sf_dir):
    """Exact interpolated percentiles per group (linear interpolation —
    identical definition in Spark percentile() and DuckDB
    quantile_cont).  At 100 TB prefer approx_percentile (sketch-based,
    one pass, mergeable) — exercised rows-only in q_agg_approx."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_canonicalize",
    oracle="""
WITH raw AS (
    SELECT 'chr1' AS chr1,
           CAST((event_id * 13 + 7) % 500 * 5000 + 2500 AS BIGINT) AS mid1,
           'chr1' AS chr2,
           CAST((event_id * 31 + user_id) % 500 * 5000 + 2500 AS BIGINT) AS mid2,
           CAST(1 + event_id % 3 AS BIGINT) AS contact_count
    FROM events
    WHERE (event_id * 13 + 7) % 500 <> (event_id * 31 + user_id) % 500
)
SELECT chr1,
       LEAST(mid1, mid2) AS mid1,
       chr2,
       GREATEST(mid1, mid2) AS mid2,
       CAST(SUM(contact_count) AS BIGINT) AS contact_count
FROM raw
GROUP BY chr1, LEAST(mid1, mid2), chr2, GREATEST(mid1, mid2)
""",
)
def q_canonicalize(spark, sf_dir):
    """Pair canonicalization + duplicate summing [SC-6] on a derived
    UNORDERED pair stream (ref: read_All_Interactions load
    normalization).  Engine op: relational.canonicalize_pairs (struct
    comparison ordering; equals LEAST/GREATEST on a single chromosome)."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.filter(
        (F.col("event_id") * 13 + 7) % 500 != (F.col("event_id") * 31 + F.col("user_id")) % 500
    ).select(
        F.lit("chr1").alias("chr1"),
        ((F.col("event_id") * 13 + 7) % 500 * 5000 + 2500).cast("long").alias("mid1"),
        F.lit("chr1").alias("chr2"),
        ((F.col("event_id") * 31 + F.col("user_id")) % 500 * 5000 + 2500)
        .cast("long")
        .alias("mid2"),
        (1 + F.col("event_id") % 3).cast("long").alias("contact_count"),
    )
    return rel.canonicalize_pairs(raw)


@register(
    "q_unpivot",
    oracle="""
WITH p AS (
  SELECT l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS qty_A,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag = 'N') AS DOUBLE) AS qty_N,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS qty_R
  FROM lineitem
  GROUP BY l_linestatus
)
SELECT l_linestatus, 'qty_A' AS flag_col, qty_A AS qty FROM p
UNION ALL
SELECT l_linestatus, 'qty_N' AS flag_col, qty_N AS qty FROM p
UNION ALL
SELECT l_linestatus, 'qty_R' AS flag_col, qty_R AS qty FROM p
""",
)
def q_unpivot(spark, sf_dir):
    """Unpivot / melt (wide → long): the inverse of q_pivot, via the
    native DataFrame.unpivot (Expand node — each input row fans out to
    one row per value column, no shuffle)."""
    wide = QUERIES["q_pivot"](spark, sf_dir)
    return wide.unpivot(
        ["l_linestatus"], ["qty_A", "qty_N", "qty_R"], "flag_col", "qty"
    )


@register(
    "q_array_explode",
    oracle="""
SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
       CAST(embedding[u.i] AS DOUBLE) AS val
FROM embeddings,
LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i) u
""",
)
def q_array_explode(spark, sf_dir):
    """Positional array explode (posexplode): one row per embedding
    dimension — the array→rows Generate node (narrow, shuffle-free)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "_v")
    ).select("vec_id", F.col("pos").cast("long"), F.col("_v").cast("double").alias("val"))


@register(
    "q_struct_funcs",
    oracle="""
SELECT o_orderkey,
       {'custkey': o_custkey, 'price': o_totalprice}.custkey AS s_custkey,
       {'custkey': o_custkey, 'price': o_totalprice}.price AS s_price,
       CASE WHEN {'a': o_custkey, 'b': CAST(o_orderkey % 7 AS BIGINT)}
                 < {'a': CAST(o_orderkey % 1000 AS BIGINT), 'b': CAST(3 AS BIGINT)}
            THEN 1 ELSE 0 END AS s_lt
FROM orders
""",
)
def q_struct_funcs(spark, sf_dir):
    """Struct family: construction, field access, lexicographic struct
    comparison (the engine's pair-canonicalization primitive)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("custkey"), F.col("o_totalprice").alias("price")
    )
    a = F.struct(
        F.col("o_custkey").alias("a"), (F.col("o_orderkey") % 7).alias("b")
    )
    b = F.struct(
        (F.col("o_orderkey") % 1000).alias("a"), F.lit(3).cast("long").alias("b")
    )
    return o.select(
        "o_orderkey",
        s.getField("custkey").alias("s_custkey"),
        s.getField("price").alias("s_price"),
        F.when(a < b, 1).otherwise(0).alias("s_lt"),
    )


# ========================================================================
# registry ordering
# ========================================================================

@register(
    "q_dedup_clusters",
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, source, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(toks) - 2),
           i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])
         ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jp AS (
  SELECT p.id1, p.id2 FROM pairs p
  JOIN sizes s1 ON p.id1 = s1.doc_id
  JOIN sizes s2 ON p.id2 = s2.doc_id
  WHERE CAST(p.common AS DOUBLE) / (s1.sz + s2.sz - p.common) >= 0.2
),
e2 AS (SELECT id1 AS a, id2 AS b FROM jp UNION ALL SELECT id2, id1 FROM jp),
walk(v, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, w.l FROM walk w JOIN e2 e ON w.v = e.a
),
lab AS (SELECT v, MIN(l) AS cluster_id FROM walk GROUP BY v)
SELECT lab.v AS doc_id, lab.cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY lab.cluster_id) AS BIGINT) AS cluster_size
FROM lab
""",
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: exact source-blocked 3-gram Jaccard pairs at
    threshold 0.2 → connected components by iterative min-label
    propagation (llmops.connected_components) → (doc_id, cluster_id =
    min doc id of the component, cluster_size).  The step a real dedup
    pipeline needs between candidate pairs and the keep-list: near-dup
    is transitive in practice, so representatives come from components
    of the pair graph, not pairwise output.  The DuckDB oracle closes
    the same edge set with a recursive CTE; transitivity on multi-hop
    chains is pinned by tests/test_llmops.py (chain + star graphs)."""
    d = load_table(spark, sf_dir, "documents")
    edges = llmops.ngram_jaccard_pairs(d, block_col="source", max_df=None).filter(
        F.col("jaccard") >= 0.2
    )
    return llmops.connected_components(edges, d, id_col="doc_id")


@register(
    "q_shuffle_shards",
    oracle="""
WITH h AS (
  SELECT doc_id,
         ((doc_id % 2654435761) * 2654435761) % 4294967296 AS hkey
  FROM documents
)
SELECT doc_id,
       CAST(hkey % 8 AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY hkey % 8 ORDER BY hkey, doc_id
       ) AS BIGINT) AS pos
FROM h
""",
)
def q_shuffle_shards(spark, sf_dir):
    """Deterministic training-order shuffle: every document gets a
    (shard, position) from a Knuth multiplicative hash — the corpus
    order is reproducible across engines and runs (rand() is neither),
    a training job reads shard files independently, and the per-shard
    ROW_NUMBER windows parallelize across shards with no global sort.
    At 100 TB raise the shard count so each window stays
    executor-sized."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    hkey = llmops.knuth_hash("doc_id")
    t = d.select("doc_id", hkey.alias("hkey"), (hkey % 8).cast("long").alias("shard"))
    w = W.partitionBy("shard").orderBy("hkey", "doc_id")
    return t.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


@register(
    "q_curation_pipeline",
    oracle="""
WITH RECURSIVE q AS (
  SELECT doc_id, source, lang,
         ROUND(
           LEAST(1.0, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) / 50.0) * 0.4
           + LEAST(1.0, CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\b(the|a)\\b')) AS BIGINT) * 5.0
                         / LEN(STRING_SPLIT(text, ' '))) * 0.3
           + LEAST(1.0, (CAST(LENGTH(text) AS DOUBLE) / LEN(STRING_SPLIT(text, ' '))) / 5.0) * 0.3,
         9) AS quality
  FROM documents
),
exact_keep AS (
  SELECT MIN(doc_id) AS doc_id
  FROM documents GROUP BY MD5(LOWER(TRIM(text)))
),
toks AS (
  SELECT doc_id, source, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(toks) - 2),
           i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])
         ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jp AS (
  SELECT p.id1, p.id2 FROM pairs p
  JOIN sizes s1 ON p.id1 = s1.doc_id
  JOIN sizes s2 ON p.id2 = s2.doc_id
  WHERE CAST(p.common AS DOUBLE) / (s1.sz + s2.sz - p.common) >= 0.2
),
e2 AS (SELECT id1 AS a, id2 AS b FROM jp UNION ALL SELECT id2, id1 FROM jp),
walk(v, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, w.l FROM walk w JOIN e2 e ON w.v = e.a
),
near_keep AS (
  SELECT v AS doc_id FROM walk GROUP BY v HAVING v = MIN(l)
)
SELECT q.doc_id, q.source, q.lang, q.quality
FROM q
JOIN exact_keep USING (doc_id)
JOIN near_keep USING (doc_id)
WHERE q.quality >= 0.6
""",
)
def q_curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation keep-list — the composition a
    training-data pipeline actually ships: quality gate (>= 0.6) ∩
    exact-dedup representatives (min doc per md5 of normalized text) ∩
    near-dup cluster representatives (doc_id == component min over the
    0.2-Jaccard pair graph).  Every stage reuses the oracled primitive
    (q_quality_score arithmetic, llmops.dedup_exact,
    llmops.connected_components); the keep-list is their semi-join —
    corpus text never shuffles, only ids and 16-byte hashes.  The
    dataflow lives in llmops.curation_keep_list (shared with the
    api.run_curation_files surface)."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.curation_keep_list(
        d, min_quality=0.6, jaccard_threshold=0.2, block_col="source"
    )


@register(
    "q_join_interval_overlap",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         CAST(EPOCH_US(o_orderdate) / 86400000000 AS BIGINT) AS lo1,
         CAST(EPOCH_US(o_orderdate) / 86400000000 AS BIGINT) + o_orderkey % 30 AS hi1
  FROM orders WHERE o_orderkey % 97 = 0
),
l AS (
  SELECT l_orderkey, l_linenumber,
         CAST(EPOCH_US(l_shipdate) / 86400000000 AS BIGINT) AS lo2,
         CAST(EPOCH_US(l_shipdate) / 86400000000 AS BIGINT) + 7 AS hi2
  FROM lineitem WHERE l_orderkey % 101 = 0
)
SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber,
       GREATEST(o.lo1, l.lo2) AS overlap_lo,
       LEAST(o.hi1, l.hi2) AS overlap_hi
FROM o JOIN l ON GREATEST(o.lo1, l.lo2) <= LEAST(o.hi1, l.hi2)
""",
)
def q_join_interval_overlap(spark, sf_dir):
    """Interval OVERLAP join (range × range — the genomic-overlap
    primitive, distinct from point-in-range q_join_range): order
    validity windows × shipment windows on the day grid via
    relational.overlap_join — banded equi-join on a day-bucket key with
    the report-once rule (only the bucket holding the overlap's left
    edge emits), so pairs never materialize as a cross product and no
    distinct() pass is needed.  The DuckDB oracle is the direct
    predicate join over the same (bounded) interval sets."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    day1 = (epoch_us(o, "o_orderdate") / F.lit(86_400_000_000)).cast("long")
    left = o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        day1.alias("lo1"),
        (day1 + F.col("o_orderkey") % 30).alias("hi1"),
    )
    day2 = (epoch_us(li, "l_shipdate") / F.lit(86_400_000_000)).cast("long")
    right = li.filter(F.col("l_orderkey") % 101 == 0).select(
        "l_orderkey",
        "l_linenumber",
        day2.alias("lo2"),
        (day2 + F.lit(7)).alias("hi2"),
    )
    joined = rel.overlap_join(left, right, band=16)
    return joined.select(
        "o_orderkey",
        "l_orderkey",
        "l_linenumber",
        F.greatest("lo1", "lo2").alias("overlap_lo"),
        F.least("hi1", "hi2").alias("overlap_hi"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
WITH w AS (
  SELECT user_id,
         CAST(EPOCH_US(ts) // 604800000000 AS BIGINT) AS week
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id)
SELECT c.cohort_week,
       w.week - c.cohort_week AS week_offset,
       CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS active_users
FROM w JOIN cohort c USING (user_id)
GROUP BY c.cohort_week, week_offset
""",
)
def q_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix over the event stream: cohort = the
    epoch-week of a user's first event; cell (cohort_week, week_offset)
    counts distinct users from that cohort active offset weeks later.
    Two shuffles total — the first-seen aggregation (user-dim sized)
    and the cohort-cell distinct count; the events table itself never
    shuffles twice because the cohort dim joins back on the same
    user_id key.  Event-time arithmetic goes through io.epoch_us (the
    ts physical encoding drifts between rounds)."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.select(
        "user_id",
        F.floor(epoch_us(ev, "ts") / F.lit(604_800_000_000))
        .cast("long")
        .alias("week"),
    )
    cohort = w.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        w.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
    )


@register(
    "q_funnel_steps",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, EPOCH_US(ts) AS us FROM events
),
v AS (SELECT user_id, MIN(us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT ev.user_id, MIN(ev.us) AS t2
  FROM ev JOIN v USING (user_id)
  WHERE ev.event_type = 'click' AND ev.us > v.t1 AND ev.us <= v.t1 + 3600000000
  GROUP BY ev.user_id
),
p AS (
  SELECT ev.user_id, MIN(ev.us) AS t3
  FROM ev JOIN c USING (user_id)
  WHERE ev.event_type = 'purchase' AND ev.us > c.t2 AND ev.us <= c.t2 + 3600000000
  GROUP BY ev.user_id
)
SELECT * FROM (
  SELECT 'view' AS step, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
  UNION ALL
  SELECT 'view>click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
  UNION ALL
  SELECT 'view>click>purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
)
""",
)
def q_funnel_steps(spark, sf_dir):
    """Ordered-sequence funnel over the event stream: users who did
    view → click → purchase, each step within one hour of the previous
    step's FIRST qualifying occurrence.  Each stage is a per-user min
    aggregation joined to the next event slice on user_id — the event
    stream shuffles on the same user_id key at every stage (exchange
    reuse), the per-stage user dims are bounded by distinct converting
    users, and no per-user sort or collect_list materializes the
    event history."""
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id", "event_type", epoch_us(ev_raw, "ts").alias("us")
    )
    hour = F.lit(3_600_000_000)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("us") > F.col("t1")) & (F.col("us") <= F.col("t1") + hour))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("us") > F.col("t2")) & (F.col("us") <= F.col("t2") + hour))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def cnt(df, name):
        return df.agg(
            F.lit(name).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    return (
        cnt(v, "view")
        .unionByName(cnt(c, "view>click"))
        .unionByName(cnt(p, "view>click>purchase"))
    )


@register(
    "q_anomaly_zscore",
    oracle="""
WITH ev AS (
  SELECT event_id, event_type, value, EPOCH_US(ts) AS us FROM events
),
w AS (
  SELECT event_id, event_type, value,
         COUNT(*) OVER fr AS n,
         SUM(CAST(value AS DECIMAL(18,4))) OVER fr AS s,
         SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER fr AS s2
  FROM ev
  WINDOW fr AS (
    PARTITION BY event_type ORDER BY us, event_id
    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id, event_type, value,
       ROUND(
         (value - CAST(s AS DOUBLE) / n)
         / SQRT((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)),
       6) AS z_score
FROM w
WHERE n >= 30
""",
)
def q_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly scoring per event type: each event's
    value against the trailing-100-event mean/std (frame excludes the
    current row; emitted once 30 priors exist).  Same reproducibility
    design as q_corr_exact: the windowed sufficient statistics (n, Σv,
    Σv²) accumulate as DECIMAL — exact, order-independent — and only
    the closed-form z expression runs in double, so Spark's running
    window and DuckDB's segment-tree window agree bit-for-bit (raw
    double window sums would drift in the low bits)."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_id", "event_type", "value", epoch_us(ev_raw, "ts").alias("us")
    )
    fr = (
        W.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(-100, -1)
    )
    dec = F.col("value").cast("decimal(18,4)")
    w = ev.select(
        "event_id",
        "event_type",
        "value",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum(dec).over(fr).alias("s"),
        F.sum(dec * dec).over(fr).alias("s2"),
    ).filter(F.col("n") >= 30)
    sd = F.col("s").cast("double")
    s2d = F.col("s2").cast("double")
    mean = sd / F.col("n")
    var = (s2d - sd * sd / F.col("n")) / (F.col("n") - 1)
    return w.select(
        "event_id",
        "event_type",
        "value",
        F.round((F.col("value") - mean) / F.sqrt(var), 6).alias("z_score"),
    )


@register(
    "q_agg_mode",
    oracle="""
WITH c AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_returnflag, qty
),
r AS (
  SELECT l_returnflag, qty, n,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag ORDER BY n DESC, qty
         ) AS rn
  FROM c
)
SELECT l_returnflag, qty AS mode_qty, n AS mode_n FROM r WHERE rn = 1
""",
)
def q_agg_mode(spark, sf_dir):
    """Per-group MODE (most frequent value) with a deterministic
    tie-break (smallest value wins) — the two-level shape that scales:
    count per (group, value) first (map-side partials collapse the
    fact table to the value domain), then a row_number over the
    domain-sized counts.  Never a collect_list of raw rows; Spark's
    own ``mode()`` aggregate is tie-unstable across partitions, so the
    explicit rank keeps the result engine-reproducible and
    oracle-matched."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    c = (
        li.select(
            "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
        )
        .groupBy("l_returnflag", "qty")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = W.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("qty"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("n").alias("mode_n"),
        )
    )


@register(
    "q_resample_fill",
    oracle="""
WITH ev AS (
  SELECT event_type, EPOCH_US(ts) // 21600000000 AS bucket,
         CAST(value AS DECIMAL(18,4)) AS v
  FROM events
),
agg AS (
  SELECT event_type, bucket,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(v) AS DOUBLE) AS sum_value
  FROM ev GROUP BY event_type, bucket
),
bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM ev GROUP BY event_type
),
grid AS (
  SELECT b.event_type, g.bucket
  FROM bounds b, LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi)) AS bucket) g
),
joined AS (
  SELECT g.event_type, g.bucket,
         COALESCE(a.n_events, 0) AS n_events,
         a.sum_value
  FROM grid g LEFT JOIN agg a USING (event_type, bucket)
)
SELECT event_type, bucket, n_events,
       LAST_VALUE(sum_value IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_sum
FROM joined
""",
)
def q_resample_fill(spark, sf_dir):
    """Time-series resample with gap fill — the hypertable staple: 6 h
    buckets per event type, EVERY bucket between a type's first and
    last event materialized (empty ones as zero-count rows), and the
    per-bucket sum forward-filled across gaps with
    last_value(ignorenulls).  The bucket grid comes from a per-type
    sequence explode off the bounds aggregate (dim-sized — never a
    driver loop or a calendar table scan), so grid size is
    (span/bucket)·n_types regardless of event volume; the gap-fill
    window partitions by type (no global sort).  Sums aggregate as
    DECIMAL so the forward-filled doubles are engine-bit-exact."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_type",
        F.floor(epoch_us(ev_raw) / F.lit(21_600_000_000)).alias("bucket"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    agg_b = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("v").cast("double").alias("sum_value"),
    )
    grid = (
        ev.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bucket"),
        )
    )
    joined = grid.join(agg_b, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        "sum_value",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket",
        "n_events",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_sum"),
    )


@register(
    "q_histogram",
    oracle="""
WITH b AS (
  SELECT CASE
           WHEN o_totalprice < 0 THEN 0
           WHEN o_totalprice >= 600000 THEN 61
           ELSE CAST(FLOOR(o_totalprice / 10000) AS BIGINT) + 1
         END AS bucket
  FROM orders
)
SELECT bucket,
       CAST(bucket * 10000 - 10000 AS DOUBLE) AS lo,
       CAST(bucket * 10000 AS DOUBLE) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b
GROUP BY bucket
""",
)
def q_histogram(spark, sf_dir):
    """Fixed-width histogram over order totals (60 × 10k buckets plus
    under/overflow) — the profiling companion to q_profile_columns.
    ``width_bucket`` is pure codegen arithmetic, so the histogram is
    one scan + one node-bounded aggregation (the shuffle carries at
    most 62 partial rows per task regardless of input size).  Bucket
    edges are exact in double (multiples of 10⁴), so bucket assignment
    and the bucket-edge columns hash-match the floor-division oracle
    bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(60))
        .cast("long")
        .alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 10000.0 - 10000.0).alias("lo"),
            (F.col("bucket") * 10000.0).alias("hi"),
            "n",
        )
    )


@register(
    "q_agg_collect",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       STRING_AGG(DISTINCT CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), ','
                  ORDER BY CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)) AS qty_set
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_collect(spark, sf_dir):
    """Collect-to-array aggregation made deterministic: the per-group
    distinct quantity set, sorted, joined to one string.  Raw
    ``collect_list`` order is partition-dependent (never hashable);
    ``array_sort(collect_set(...))`` + ``array_join`` pins it, and the
    oracle's ordered STRING_AGG(DISTINCT) reproduces it exactly.  The
    per-group array is bounded by the value domain (distinct
    quantities), not the row count, so the agg buffer stays small at
    any scale; partial (map-side) collect_set still applies."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long").cast("string")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.array_join(F.array_sort(F.collect_set(qty)), ",").alias("qty_set"),
    )


@register(
    "q_profile_columns",
    oracle="""
WITH li AS (SELECT * FROM lineitem)
SELECT * FROM (
  SELECT 'l_quantity' AS col_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
         CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
         CAST(MAX(l_quantity) AS DOUBLE) AS max_v
  FROM li
  UNION ALL
  SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
         COUNT(DISTINCT l_extendedprice),
         CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
  FROM li
  UNION ALL
  SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
         COUNT(DISTINCT l_discount),
         CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
  FROM li
  UNION ALL
  SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
         COUNT(DISTINCT l_tax),
         CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
  FROM li
  UNION ALL
  SELECT 'l_suppkey', COUNT(*), COUNT(*) - COUNT(l_suppkey),
         COUNT(DISTINCT l_suppkey),
         CAST(MIN(l_suppkey) AS DOUBLE), CAST(MAX(l_suppkey) AS DOUBLE)
  FROM li
  UNION ALL
  SELECT 'l_partkey', COUNT(*), COUNT(*) - COUNT(l_partkey),
         COUNT(DISTINCT l_partkey),
         CAST(MIN(l_partkey) AS DOUBLE), CAST(MAX(l_partkey) AS DOUBLE)
  FROM li
)
""",
)
def q_profile_columns(spark, sf_dir):
    """Column profiling — the first query any curation pipeline runs on
    a new 100 TB drop: one scan of the table produces per-column row /
    null / exact-distinct counts and min/max, emitted as one row per
    column.  All statistics come from a SINGLE aggregate (Spark plans
    the six COUNT(DISTINCT)s as one Expand + two-stage agg: one scan,
    map-side partials, ×7 row expansion only AFTER projection down to
    the six columns), then a driver-free ``stack`` unpivots the 1×N
    summary row.  At real scale the exact distincts are the knob to
    relax first — swap ``count_distinct`` for ``approx_count_distinct``
    and the Expand disappears; the exact form is kept here because the
    oracle must hash-match.  min/max are cast to double (exact for
    these key/price domains) so every profiled column shares one
    output schema."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_suppkey",
        "l_partkey",
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [
            F.count(d).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(d).alias(f"mn_{c}"),
            F.max(d).alias(f"mx_{c}"),
        ]
    row = li.select(cols).agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, nn, n_distinct, min_v, max_v)",
        "n_rows",
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("nn")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_v",
        "max_v",
    )


@register(
    "q_join_skew_salted",
    oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_join_skew_salted(spark, sf_dir):
    """Skew-mitigated shuffle join — the manual salting pattern for the
    case AQE's skew-join split can't fix: a handful of hot keys that
    overflow a single reducer.  The fact side adds a deterministic salt
    (event_id mod 8); the dim side explodes ×8 so every (key, salt)
    combination exists; the join key becomes (user_id, salt), spreading
    each hot user over 8 reducers.  ``shuffle_hash`` hints keep the
    demo on the shuffle path (a broadcast would be the right plan for a
    dim THIS small — salting earns its keep when both sides are big).
    The post-join aggregate sums values as DECIMAL so the regrouped
    partial sums are order-independent and the oracle — the PLAIN
    unsalted join, proving salting is a pure physical rewrite —
    hash-matches bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    n_salt = 8
    fact = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,4)").alias("value_dec"),
        # pmod, not %: Spark % preserves sign, so a negative id would
        # get a salt outside 0..7 and silently drop from the join;
        # coalesce(0) keeps a NULL event_id in a valid bucket — either
        # way breaks the pure-physical-rewrite invariant the oracle pins
        F.coalesce(
            F.pmod(F.col("event_id"), F.lit(n_salt)), F.lit(0)
        ).cast("int").alias("salt"),
    )
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("int"))
    joined = fact.hint("shuffle_hash").join(
        dim.hint("shuffle_hash"),
        (fact.user_id == dim.c_custkey) & (fact.salt == dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value_dec").cast("double"), 4).alias("sum_value"),
    )


@register(
    "q_pagerank",
    oracle="""
WITH eb AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
e AS (SELECT src, dst FROM eb UNION ALL SELECT dst AS src, src AS dst FROM eb),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank, outdeg FROM deg),
i1 AS (SELECT e.dst AS node, CAST(150000000 + (85 * SUM(r.rank // r.outdeg)) // 100 AS BIGINT) AS rank
       FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
r1 AS (SELECT i.node, i.rank, d.outdeg FROM i1 i JOIN deg d ON i.node = d.node),
i2 AS (SELECT e.dst AS node, CAST(150000000 + (85 * SUM(r.rank // r.outdeg)) // 100 AS BIGINT) AS rank
       FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
r2 AS (SELECT i.node, i.rank, d.outdeg FROM i2 i JOIN deg d ON i.node = d.node),
i3 AS (SELECT e.dst AS node, CAST(150000000 + (85 * SUM(r.rank // r.outdeg)) // 100 AS BIGINT) AS rank
       FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
r3 AS (SELECT i.node, i.rank, d.outdeg FROM i3 i JOIN deg d ON i.node = d.node),
i4 AS (SELECT e.dst AS node, CAST(150000000 + (85 * SUM(r.rank // r.outdeg)) // 100 AS BIGINT) AS rank
       FROM e JOIN r3 r ON e.src = r.node GROUP BY e.dst),
r4 AS (SELECT i.node, i.rank, d.outdeg FROM i4 i JOIN deg d ON i.node = d.node),
i5 AS (SELECT e.dst AS node, CAST(150000000 + (85 * SUM(r.rank // r.outdeg)) // 100 AS BIGINT) AS rank
       FROM e JOIN r4 r ON e.src = r.node GROUP BY e.dst)
SELECT node, rank FROM i5
""",
)
def q_pagerank(spark, sf_dir):
    """Driver fast path + eager distributed wrapper.

    Small-graph fast path (same design as llmops.connected_components'
    union-find probe): when the DISTINCT edge list fits a bounded Arrow
    probe, the 5 damped-update rounds run as numpy int64 bincount-adds
    on the driver — the rank mass is INTEGER throughout, so the result
    is bit-identical to the distributed loop (and to the unrolled-CTE
    oracle), while skipping 5 rounds × several-job fixed overhead.  The
    distributed loop below remains the 100 TB path, pinned by the
    8 M-edge scale row in tools/bench_scalable.py and the cached-edge
    plan gate (tests/test_plans.py, via :func:`pagerank_lazy`).

    Distributed path: materialize via localCheckpoint, then UNPERSIST
    the loop invariants (edge list, degree dim) — a registry sweep
    evaluates up to 50 keys in one session, and without the cleanup
    the full symmetrized edge list stays cached in executor memory for
    the rest of the session.  The retained checkpoint is node-sized."""
    import numpy as np

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    eb = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    probe = eb.limit(2_000_001).toPandas()  # Arrow: 16 B/row bounded
    if len(probe) <= 2_000_000:
        s = probe["src"].to_numpy(np.int64)
        d = probe["dst"].to_numpy(np.int64)
        # symmetrize, relabel nodes densely for bincount
        src = np.concatenate([s, d])
        dst = np.concatenate([d, s])
        nodes, inv_src = np.unique(src, return_inverse=True)
        idx_dst = np.searchsorted(nodes, dst)  # same node set (symmetric)
        outdeg = np.bincount(inv_src, minlength=len(nodes)).astype(np.int64)
        rank = np.full(len(nodes), 1_000_000_000, dtype=np.int64)
        for _ in range(5):
            shares = rank // outdeg  # every node has outdeg >= 1
            recv = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(recv, idx_dst, shares[inv_src])
            rank = 150_000_000 + (85 * recv) // 100
        pdf = __import__("pandas").DataFrame(
            {"node": nodes, "rank": rank}
        )
        return spark.createDataFrame(pdf, "node long, rank long")
    ranks, invariants = pagerank_lazy(spark, sf_dir)
    out = ranks.localCheckpoint(eager=True)
    for df in invariants:
        df.unpersist()
    return out


def pagerank_lazy(spark, sf_dir):
    """PageRank (5 unrolled iterations, damping 0.85) over the
    customer↔supplier bipartite trade graph (distinct who-bought-from-
    whom edges via orders ⋈ lineitem, symmetrized; node ids namespaced
    2k / 2k+1).  Rank mass is INTEGER throughout — each node starts at
    10^9, a node's per-edge share is ``rank DIV outdeg`` and the update
    is ``0.15·10^9 + (85·Σshares) DIV 100`` — so the result is
    bit-exact regardless of partition merge order (a float PageRank
    differs in low bits run-to-run AND engine-to-engine; this is the
    same exact-sufficient-statistics discipline as q_corr_exact).
    Physically each iteration is share-map (node-sized, no shuffle) →
    join on src → re-agg on dst.  The loop invariants (edge list,
    degree dim) are persisted once — without the persist every
    iteration re-derives the orders ⋈ lineitem distinct (AQE's
    exchange reuse only recovers part of it), a 5× recompute that
    dominated the wall clock; with it the per-iteration work that
    actually moves is node-sized state plus one cached-edge join.  For iteration-to-convergence (unbounded rounds) the
    checkpointed-loop form of llmops.connected_components is the
    template; 5 fixed rounds keeps this key's plan static and
    oracle-expressible.  Overflow headroom: Σ mass ≈ n_nodes·10^9,
    ×85 stays under int64 past sf100."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    eb = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = eb.unionByName(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).persist()
    # Small-graph fast path (same pattern as connected_components):
    # when the NODE set fits a broadcast, ship the node-sized rank
    # state to the cached edge partitions — zero shuffle per join, and
    # the groupBy's map-side partials reduce the exchange to node-sized.
    # Past the threshold the same loop runs as partitioned shuffle
    # joins against the src-partitioned cached edges (the 100 TB path).
    n_nodes = deg.count()
    small = n_nodes <= 5_000_000
    if not small:
        # co-locate the cached edges with the per-iteration src joins;
        # pointless (an extra full shuffle) when shares broadcast.
        # Materialize the co-located cache from the original one, then
        # DROP the original — otherwise the large-graph path holds two
        # full edge-list copies in executor memory for the session
        co = edges.repartition("src").persist()
        co.count()
        edges.unpersist()
        edges = co
    ranks = deg.select("node", F.lit(1_000_000_000).alias("rank"), "outdeg")
    for _ in range(5):
        shares = ranks.select(
            "node", F.expr("rank DIV outdeg").alias("share")
        )
        if small:
            shares = F.broadcast(shares)
        contrib = (
            edges.join(shares, edges.src == shares.node)
            .groupBy(edges.dst.alias("node"))
            .agg(
                (F.lit(150_000_000) + F.expr("(85 * SUM(share)) DIV 100")).alias(
                    "rank"
                )
            )
        )
        dd = F.broadcast(deg) if small else deg
        ranks = contrib.join(dd, "node").select("node", "rank", "outdeg")
    return ranks.select("node", "rank"), [edges, deg]


# ========================================================================
# §2.13 round-4 additions: bucketed join, SCD2, embedding quantization
# ========================================================================


@register(
    "q_join_bucketed",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS sum_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_join_bucketed(spark, sf_dir):
    """Bucketed co-located join: both sides are written CLUSTERED BY
    the join key into the SAME bucket count, so the join needs NO
    Exchange on either side (plan-gated in tests/test_plans.py) — the
    100 TB pattern for a fact repeatedly joined on a stable key: pay
    the bucketing shuffle once at ingest, never again.  DECIMAL sums
    make the post-join aggregate order-independent, so the oracle (the
    PLAIN join — bucketing is a pure physical rewrite) hash-matches."""
    import hashlib
    import tempfile

    from .io import write_bucketed_table

    # tag by (sf_dir, applicationId): the catalog entry is session-
    # scoped but the files are not — a second concurrent session
    # sharing a plain sf_dir-keyed path could overwrite the directory
    # mid-query.  Per-session paths make reuse exactly as wide as the
    # catalog entry's validity.
    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"pfithic_buckets_{tag}")
    t_o, t_c = f"pfithic_orders_b_{tag}", f"pfithic_customer_b_{tag}"
    # guard on BOTH tables: a failure between the two writes must not
    # leave a half-registered pair that every retry then trips over
    if not (
        spark.catalog.tableExists(t_o) and spark.catalog.tableExists(t_c)
    ):
        write_bucketed_table(
            load_table(spark, sf_dir, "orders").select(
                "o_custkey", "o_totalprice"
            ),
            t_o,
            ["o_custkey"],
            8,
            ["o_custkey"],
            path=os.path.join(base, "orders"),
        )
        write_bucketed_table(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            t_c,
            ["c_custkey"],
            8,
            ["c_custkey"],
            path=os.path.join(base, "customer"),
        )
    o = spark.table(t_o)
    c = spark.table(t_c)
    # merge hint: the fixture dim is broadcast-sized, which would
    # bypass the co-location being demonstrated (and plan-gated); at
    # 100 TB both sides are far past any broadcast threshold and the
    # bucketed sort-merge is the only sane plan
    return (
        o.hint("merge")
        .join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                    "double"
                ),
                4,
            ).alias("sum_price"),
        )
    )


@register(
    "q_join_bloom",
    oracle="""
SELECT e.event_id, e.user_id
FROM events e
WHERE e.user_id IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
""",
)
def q_join_bloom(spark, sf_dir):
    """Bloom pre-filtered semi join: the dim keys fold into an 8 KB
    driver-built Bloom filter whose probe runs as constant-folded
    shifts/ands INSIDE the fact scan's codegen, pruning fact rows
    before the join shuffle; the real semi join then removes the false
    positives, so the result is EXACTLY the plain semi join (the
    oracle).  The explicit form of the runtime-filter lever — available
    even when AQE's injected bloom/IN-subquery filters are not (dim
    built mid-pipeline, no stats)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    out = rel.bloom_semi_join(
        ev.select("event_id", "user_id"), cust, "user_id", "c_custkey"
    )
    # re-pin column order: the using-column semi join moves the join
    # key first, but the oracle SELECTs (event_id, user_id)
    return out.select("event_id", "user_id")


@register(
    "q_scd2_merge",
    oracle="""
WITH t AS (
  SELECT user_id, event_id, event_type,
         EPOCH_US(ts) AS valid_from_us,
         LEAD(EPOCH_US(ts)) OVER (
           PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id
         ) AS valid_to_us
  FROM events
)
SELECT user_id, event_id, event_type, valid_from_us, valid_to_us,
       CAST(valid_to_us IS NULL AS BOOLEAN) AS is_current
FROM t
""",
)
def q_scd2_merge(spark, sf_dir):
    """Slowly-changing-dimension type 2 from a change log: each event
    opens a version valid until the user's next event (half-open
    [valid_from, valid_to)); the latest version per user is flagged
    current.  One window per user partition — no global sort; ties on
    the timestamp break by event_id so the versioning is deterministic.
    This is the dimension-versioning step every warehouse load needs
    between a CDC feed and point-in-time joins (the as-of join,
    q_join_asof, is the read side of the same contract)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        "event_id",
        "event_type",
        epoch_us(ev, "ts").alias("valid_from_us"),
    )
    w = W.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    return t.select(
        "user_id",
        "event_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w).alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


@register(
    "q_embedding_quantize",
    oracle="""
WITH s AS (
  SELECT vec_id, embedding,
         LIST_MAX(LIST_TRANSFORM(embedding,
                                 v -> ABS(CAST(v AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
)
SELECT vec_id,
       ROUND(scale, 9) AS scale,
       ROUND(CASE WHEN scale = 0 THEN 0.0 ELSE
         LIST_MAX(LIST_TRANSFORM(embedding,
           v -> ABS(CAST(v AS DOUBLE)
                    - ROUND(CAST(v AS DOUBLE) / scale, 0) * scale)))
       END, 9) AS err_max,
       ROUND(CASE WHEN scale = 0 THEN 0.0 ELSE
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
           i -> CAST(embedding[i] AS DOUBLE)
                * ROUND(CAST(embedding[i] AS DOUBLE) / scale, 0) * scale))
         / (SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
              v -> ROUND(CAST(v AS DOUBLE) / scale, 0) * scale
                   * ROUND(CAST(v AS DOUBLE) / scale, 0) * scale))))
       END, 6) AS cos_self
FROM s
""",
)
def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding column —
    the 4× storage/bandwidth lever for 100 TB ANN corpora (the IVF
    index in q_sim_ivf would store these instead of float32).  Emits
    per-vector scale, max reconstruction error, and the cosine between
    the original and its dequantized self (the recall-impact proxy).
    Everything stays JVM-side: transform/zip_with/aggregate lambdas,
    no Python UDF, elementwise ops + in-order folds so the DuckDB
    oracle hash-matches bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    xd = F.transform(x, lambda v: v.cast("double"))
    scale = (
        F.array_max(F.transform(xd, lambda v: F.abs(v))) / F.lit(127.0)
    ).alias("scale")
    t = e.select("vec_id", xd.alias("xd"), scale)
    deq = F.transform(
        F.col("xd"), lambda v: F.round(v / F.col("scale"), 0) * F.col("scale")
    )
    t = t.withColumn("deq", deq)
    err_max = F.array_max(
        F.zip_with(F.col("xd"), F.col("deq"), lambda a, b: F.abs(a - b))
    )
    zero = F.col("scale") == 0
    return t.select(
        "vec_id",
        F.round(F.col("scale"), 9).alias("scale"),
        F.round(F.when(zero, 0.0).otherwise(err_max), 9).alias("err_max"),
        F.round(
            F.when(zero, 0.0).otherwise(
                dot_double(F.col("xd"), F.col("deq"))
                / (l2_norm(F.col("xd")) * l2_norm(F.col("deq")))
            ),
            6,
        ).alias("cos_self"),
    )


@register(
    "q_merge_upsert",
    oracle="""
WITH latest AS (
  SELECT user_id, value AS new_value FROM (
    SELECT user_id, value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id
             ORDER BY EPOCH_US(ts) DESC, event_id DESC
           ) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT COALESCE(c.c_custkey, l.user_id) AS key,
       c.c_mktsegment AS segment,
       ROUND(COALESCE(l.new_value, CAST(c.c_acctbal AS DOUBLE)), 6)
         AS balance,
       CASE WHEN c.c_custkey IS NULL THEN 'insert'
            WHEN l.user_id IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.user_id
""",
)
def q_merge_upsert(spark, sf_dir):
    """MERGE/upsert (the Delta ``MERGE INTO`` shape, the CDC write
    side that q_scd2_merge versions): fold a change feed — each user's
    LATEST event value, deterministic (ts, event_id) argmax — into the
    customer dimension.  Matched keys update, source-only keys insert,
    target-only keys keep; every row labeled with its action.

    Physically: the change feed collapses via max_by (one agg — the
    feed's key cardinality, not its row count), then ONE full outer
    join against the target — the standard scalable MERGE plan (a
    row-at-a-time upsert loop is the anti-pattern this replaces)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    latest = (
        ev.select(
            "user_id",
            "value",
            F.struct(
                epoch_us(ev, "ts").alias("t"), F.col("event_id").alias("e")
            ).alias("ord"),
        )
        .groupBy("user_id")
        .agg(F.max_by("value", "ord").alias("new_value"))
    )
    j = cust.join(latest, cust.c_custkey == latest.user_id, "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("user_id")).alias("key"),
        F.col("c_mktsegment").alias("segment"),
        F.round(
            F.coalesce(
                F.col("new_value"), F.col("c_acctbal").cast("double")
            ),
            6,
        ).alias("balance"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("user_id").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


@register(
    "q_snapshot_diff",
    oracle="""
WITH a AS (
  SELECT o_orderkey AS key, MD5(CONCAT_WS('|', o_orderstatus,
         CAST(o_totalprice AS VARCHAR))) AS h
  FROM orders WHERE o_orderkey % 10 <> 0
),
b AS (
  SELECT o_orderkey AS key, MD5(CONCAT_WS('|', o_orderstatus,
         CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                   ELSE o_totalprice END AS VARCHAR))) AS h
  FROM orders WHERE o_orderkey % 11 <> 0
)
SELECT COALESCE(a.key, b.key) AS key,
       CASE WHEN a.key IS NULL THEN 'added'
            WHEN b.key IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b USING (key)
WHERE a.key IS NULL OR b.key IS NULL OR a.h <> b.h
""",
)
def q_snapshot_diff(spark, sf_dir):
    """Snapshot reconciliation: diff two table versions into
    added/removed/changed keys — what you run between two atomic-sink
    snapshots (io.read_parquet_atomic time travel) before trusting a
    pipeline rerun.  Row content is compared via a single md5 over the
    tracked columns, so the full outer join ships (key, 16-byte hash)
    — never the rows themselves — and unchanged keys drop out before
    the result materializes.  Fixture twins: snapshot A = orders minus
    keys %10=0 (those keys exist only in B → 'added'), snapshot B =
    orders minus %11=0 (those exist only in A → 'removed') with %7=0
    prices perturbed ('changed')."""
    o = load_table(spark, sf_dir, "orders")
    ha = F.md5(
        F.concat_ws(
            "|", F.col("o_orderstatus"), F.col("o_totalprice").cast("string")
        )
    )
    a = o.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("key"), ha.alias("h")
    )
    price_b = F.when(
        F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
    ).otherwise(F.col("o_totalprice"))
    hb = F.md5(
        F.concat_ws("|", F.col("o_orderstatus"), price_b.cast("string"))
    )
    b = o.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("key"), hb.alias("h")
    )
    j = a.withColumnRenamed("h", "ha").join(
        b.withColumnRenamed("h", "hb"), "key", "full_outer"
    )
    return j.filter(
        F.col("ha").isNull()
        | F.col("hb").isNull()
        | (F.col("ha") != F.col("hb"))
    ).select(
        "key",
        F.when(F.col("ha").isNull(), "added")
        .when(F.col("hb").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
    )


@register(
    "q_lm_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS t FROM documents
),
v AS (
  SELECT COUNT(DISTINCT w) AS vocab
  FROM (SELECT UNNEST(t) AS w FROM toks)
),
bi AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1), i -> t[i]))
           AS w1,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1), i -> t[i+1]))
           AS w2
  FROM toks
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
scored AS (
  SELECT b.doc_id,
         CAST(ROUND(LN(CAST(c.c12 + 1 AS DOUBLE)
                       / CAST(g.c1 + v.vocab AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS logp
  FROM bi b
  JOIN c12 c ON b.w1 = c.w1 AND b.w2 = c.w2
  JOIN c1 g ON b.w1 = g.w1
  CROSS JOIN v
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6) AS avg_logp,
       ROUND(EXP(-ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6)), 6)
         AS ppl
FROM scored GROUP BY doc_id
""",
)
def q_lm_score(spark, sf_dir):
    """Bigram-LM quality scoring (the CCNet/DCLM-style perplexity
    filter): train Laplace-smoothed bigram statistics on the corpus
    itself, then score every document by its average bigram
    log-probability (and the perplexity exp(-avg)).  The standard
    quality gate between raw crawl and training mix.

    100 TB shape: two count aggregations (bigram and prefix counts —
    inverted-index keys, never a pair join), a scalar vocab aggregate,
    then equi-joins back to the per-doc bigram rows.  Determinism: the
    per-bigram log-prob is a correctly-rounded double expression
    rounded to 9 dp and summed as DECIMAL (order-independent exact
    sum), so the per-doc average — and the oracle hash — is bit-stable
    under any partition order (same discipline as q_corr_exact)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        F.col("doc_id"),
        F.posexplode(F.split(llmops.norm_text("text"), " ")).alias(
            "pos", "w1"
        ),
    )
    wspec = W.partitionBy("doc_id").orderBy("pos")
    bi = (
        t.select("doc_id", "w1", F.lead("w1", 1).over(wspec).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    # one tokenization definition (llmops.tokens_col == the oracle's
    # STRING_SPLIT(LOWER(TRIM(text)), ' ')) for vocab and bigrams alike
    toks = d.select(F.explode(llmops.tokens_col("text")).alias("w"))
    vocab = toks.agg(F.countDistinct("w").alias("vocab"))
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("vocab")).cast("double")
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("logp"),
        )
    )
    avg = F.round(
        F.sum("logp").cast("double") / F.count(F.lit(1)), 6
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        avg.alias("avg_logp"),
        F.round(F.exp(-avg), 6).alias("ppl"),
    )


@register("q_bpe_train", oracle=_golden_oracle("q_bpe_train"))
def q_bpe_train(spark, sf_dir):
    """Real BPE vocabulary training (Sennrich et al. 2016) the
    production way: ONE distributed pass builds the distinct
    (word, count) table — bounded by corpus VOCABULARY, not corpus
    size, which is why 100 TB of text still trains driver-side (every
    standard trainer works from word counts) — then the classic merge
    loop runs in pure python ints/strings: deterministic on any host
    (no floats, no hashing, lexicographic tie-break).  Output: the
    learned merge table in learning order.  Golden oracle certified by
    an independent Counter-based retrain in tools/make_goldens.py."""
    d = load_table(spark, sf_dir, "documents")
    wc = llmops.bpe_word_counts(d)
    merges = llmops.bpe_train_merges(wc, num_merges=64)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "merge_id": range(len(merges)),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
        }
    )
    return spark.createDataFrame(
        pdf, "merge_id long, left string, right string"
    )


@register("q_bpe_tokenize", oracle=_golden_oracle("q_bpe_tokenize"))
def q_bpe_tokenize(spark, sf_dir):
    """Token-budget accounting under a LEARNED BPE vocabulary: train
    the merge table (bounded driver loop, see q_bpe_train), broadcast
    it, and tokenize the corpus in Arrow mapInPandas batches with a
    per-batch word→length memo (Zipf reuse).  Output per doc: n_words,
    n_tokens, n_chars.  Certified by an independent segmenter + the
    detokenization round-trip in tools/make_goldens.py."""
    d = load_table(spark, sf_dir, "documents")
    merges = llmops.bpe_train_merges(llmops.bpe_word_counts(d), num_merges=64)
    return llmops.bpe_tokenize(d, merges)


# ========================================================================
# §2.14 Round-4 continuation (EXT): event analytics + IR / chunking
# ========================================================================

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "q_sessionize",
    oracle=f"""
WITH t AS (
  SELECT user_id, event_id, EPOCH_US(ts) AS us, value FROM events
),
m AS (
  SELECT *,
         CASE WHEN LAG(us) OVER w IS NULL
                OR us - LAG(us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM m
)
SELECT user_id, CAST(sess AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(us) AS start_us, MAX(us) AS end_us,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us,
       ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS sum_value
FROM s GROUP BY user_id, sess
""",
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization: split each user's event stream into
    sessions at >30-min inactivity gaps — the canonical clickstream /
    telemetry prep step (the batch twin of q_stream_session's
    session_window).

    Physically: ONE shuffle on user_id feeds both windows (lag for the
    gap flag, running sum for the session ordinal — same partition key,
    Catalyst reuses the sort) and the final groupBy is
    partition-local (user_id, sess) so no second exchange is needed.
    Per-user windows, never a global one — skew ceiling is the busiest
    single user.  Epoch-µs integer math end-to-end (tz-proof,
    FIXTURES.md §5.4); the value sum is round-then-DECIMAL (§7)."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id", "event_id", epoch_us(ev_raw).alias("us"), "value"
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us", 1).over(w)
    flagged = ev.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).cast("bigint").alias("dur_us"),
        F.round(
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)")).cast(
                "double"
            ),
            6,
        ).alias("sum_value"),
    ).select(
        "user_id",
        F.col("sess").cast("bigint").alias("session_id"),
        "n_events",
        "start_us",
        "end_us",
        "dur_us",
        "sum_value",
    )


@register(
    "q_time_weighted_avg",
    oracle="""
WITH t AS (
  SELECT user_id, event_id, EPOCH_US(ts) AS us, value FROM events
),
d AS (
  SELECT user_id, value,
         LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
           AS dur
  FROM t
),
p AS (
  SELECT user_id,
         CAST(ROUND(value, 6) AS DECIMAL(20,6)) * CAST(dur AS DECIMAL(18,0))
           AS piece,
         dur
  FROM d WHERE dur IS NOT NULL AND dur > 0
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(dur) AS BIGINT) AS total_us,
       ROUND(CAST(SUM(piece) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6)
         AS twa_value
FROM p GROUP BY user_id
""",
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average (the metrics/IoT 'average holding value'):
    each reading holds until the user's next event, so it weighs by its
    duration — a plain AVG over irregular samples is biased toward
    burst periods.

    Physically: one shuffle on user_id for the lead() window, then a
    partition-local groupBy on the same key.  Exactness: the weighted
    pieces are DECIMAL(18,6) value × DECIMAL µs-duration products —
    exact integer-scaled arithmetic, order-independent sums — and the
    ONLY float op is the final single division (FIXTURES.md §5.1)."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id", "event_id", epoch_us(ev_raw).alias("us"), "value"
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    d = ev.select(
        "user_id",
        "value",
        (F.lead("us", 1).over(w) - F.col("us")).alias("dur"),
    ).filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
    # DECIMAL(20,6) forces 128-bit storage on the DuckDB side: the
    # (value × µs-duration) product overflows int64 decimals (§5.3's
    # "keep the decimal-scaled sum below 2^53" applies to the PRODUCT
    # here), and 20+18 = 38 is the widest multiply both dialects allow.
    piece = F.round(F.col("value"), 6).cast("decimal(20,6)") * F.col(
        "dur"
    ).cast("decimal(18,0)")
    return (
        d.select("user_id", piece.alias("piece"), "dur")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur").cast("bigint").alias("total_us"),
            F.round(
                F.sum("piece").cast("double")
                / F.sum("dur").cast("double"),
                6,
            ).alias("twa_value"),
        )
    )


_CHUNK_SIZE = 256
_CHUNK_STRIDE = 192


@register(
    "q_chunk_documents",
    oracle=f"""
WITH t AS (SELECT doc_id, text, LEN(text) AS n FROM documents),
k AS (
  SELECT doc_id, n, text,
         UNNEST(GENERATE_SERIES(0,
           CASE WHEN n <= {_CHUNK_SIZE} THEN 0
                ELSE (n - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)
                     // {_CHUNK_STRIDE} END)) AS k
  FROM t
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
       CAST(1 + k * {_CHUNK_STRIDE} AS BIGINT) AS start_pos,
       LEN(SUBSTR(text, CAST(1 + k * {_CHUNK_STRIDE} AS INT),
                  {_CHUNK_SIZE})) AS chunk_len,
       MD5(SUBSTR(text, CAST(1 + k * {_CHUNK_STRIDE} AS INT),
                  {_CHUNK_SIZE})) AS chunk_md5
FROM k
""",
)
def q_chunk_documents(spark, sf_dir):
    """Sliding-window document chunking (RAG / context-window prep):
    256-char chunks every 192 chars, so consecutive chunks overlap by
    64.  The step between raw corpus and any embedding or packing
    stage.

    Physically NARROW — sequence() + posexplode + substring are all
    JVM codegen expressions, zero shuffles, zero Python; output rows
    stay on the partition that read the document, so 100 TB chunks at
    scan speed.  Chunk count is exact integer math ((n-size+stride-1)
    div stride); chunks are emitted with their md5 so downstream dedup
    joins ship 16-byte digests, not text."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    n_extra = F.when(
        n <= _CHUNK_SIZE, F.lit(0)
    ).otherwise(
        F.floor((n - _CHUNK_SIZE + _CHUNK_STRIDE - 1) / _CHUNK_STRIDE)
    ).cast("int")
    chunks = d.select(
        "doc_id",
        "text",
        F.posexplode(F.sequence(F.lit(0), n_extra)).alias("pos", "k"),
    )
    start = (1 + F.col("k") * _CHUNK_STRIDE).cast("int")
    piece = F.substring(F.col("text"), start, _CHUNK_SIZE)
    return chunks.select(
        "doc_id",
        F.col("k").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_pos"),
        F.length(piece).alias("chunk_len"),
        F.md5(piece).alias("chunk_md5"),
    )


#: Fixed query-term set for the BM25 key — common fixture-vocabulary
#: words, so every sf has matches.
_BM25_TERMS = ("table", "spark", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "q_bm25",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS w
  FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avg_dl
  FROM dl
),
q AS (SELECT UNNEST(['table', 'spark', 'window']) AS w),
tf AS (
  SELECT t.doc_id, t.w, COUNT(*) AS tf
  FROM toks t JOIN q ON t.w = q.w GROUP BY t.doc_id, t.w
),
df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           LN((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1} + 1.0))
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * (dl.dl / s.avg_dl))),
           9) AS DECIMAL(28,9)) AS term_score
  FROM tf
  JOIN df ON tf.w = df.w
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, COUNT(*) AS n_terms_hit,
       ROUND(CAST(SUM(term_score) AS DOUBLE), 6) AS bm25
FROM scored GROUP BY doc_id
""",
)
def q_bm25(spark, sf_dir):
    """BM25 ranked retrieval (Robertson/Sparck-Jones; k1=1.2, b=0.75)
    for a fixed query term set — the classic lexical scorer behind
    search/contamination tooling.

    Physically: tokenization is narrow; tf is an aggregation keyed on
    (doc_id, term) AFTER a broadcast semi-join against the tiny query
    term set (the corpus-wide token stream is filtered to query terms
    before any shuffle); df/N/avg_dl are small aggregates broadcast
    back.  Nothing joins corpus-to-corpus.  Determinism: each
    doc-term score is one fixed-order IEEE expression rounded to 9 dp,
    then DECIMAL-summed per doc (FIXTURES.md §7)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(llmops.tokens_col("text")).alias("w")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats_df = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )
    q = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], "w string"
    )
    tf = (
        toks.join(F.broadcast(q), "w")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * (F.col("dl") / F.col("avg_dl"))
    )
    term_score = F.round(
        idf * (F.col("tf") * (_BM25_K1 + 1.0)) / denom, 9
    ).cast("decimal(28,9)")
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats_df))
        .select("doc_id", term_score.alias("term_score"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("term_score").cast("double"), 6).alias("bm25"),
    )


@register(
    "q_outlier_mad",
    oracle="""
WITH med AS (
  SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY event_type
),
a AS (
  SELECT e.event_type, e.value, m.med,
         ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, MEDIAN(adev) AS mad FROM a GROUP BY event_type
)
SELECT a.event_type,
       COUNT(*) AS n,
       ROUND(MIN(a.med), 6) AS med,
       ROUND(MIN(d.mad), 6) AS mad,
       CAST(SUM(CASE WHEN a.adev > 3.0 * d.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM a JOIN mad d USING (event_type)
GROUP BY a.event_type
""",
)
def q_outlier_mad(spark, sf_dir):
    """Robust outlier detection via median absolute deviation — the
    standard robust alternative to q_anomaly_zscore (a single wild
    value shifts a mean/std badly but moves a median/MAD almost not at
    all).  Flags values with |v - median| > 3·MAD per event type.

    Physically: exact medians need a per-group sort, but each sort is
    per-EVENT-TYPE (bounded group count, never a global order-by); the
    two median tables are tiny and broadcast back onto the events scan
    — the corpus itself shuffles once per agg and never joins to
    itself.  At 100 TB you'd swap percentile→approx_percentile (same
    plan shape); exact is kept so the oracle hash-matches.
    Determinism: both engines interpolate the same sorted doubles with
    the same lower+(higher-lower)·frac formula; outputs round to 6 dp
    and the outlier test compares identical IEEE expressions."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    a = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = a.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    return (
        a.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3.0 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


#: Deterministic sparsifier for the co-purchase graph: keep an edge when
#: (a·31 + b) mod 97 < 12 — same integer arithmetic in both dialects.
_TRI_MOD, _TRI_KEEP = 97, 12
#: Bounded-probe threshold for the triangle driver fast path (tests
#: patch this to 0 to force the distributed branch).
_TRI_PROBE_LIMIT = 2_000_000


@register(
    "q_triangle_count",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
),
edges AS (
  SELECT a, b FROM pairs
  WHERE (a * 31 + b) % {_TRI_MOD} < {_TRI_KEEP}
),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  ) GROUP BY v
),
tri AS (
  SELECT COUNT(*) AS n_tri
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
w AS (SELECT COALESCE(SUM(d * (d - 1) / 2), 0) AS n_wedges FROM deg)
SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT n_tri FROM tri) AS n_triangles,
       ROUND(CASE WHEN (SELECT n_wedges FROM w) = 0 THEN 0.0
                  ELSE 3.0 * (SELECT n_tri FROM tri)
                       / (SELECT n_wedges FROM w) END, 9)
         AS clustering_coeff
""",
)
def q_triangle_count(spark, sf_dir):
    """Triangle counting on the co-purchase graph (parts sharing an
    order), plus the global clustering coefficient — the graph-shape
    statistic behind community/quality analysis of link graphs.

    Scale design — degree-ordered orientation (the MapReduce-era
    Cohen / Suri-Vassilvitskii trick): each undirected edge is
    directed from its lower-(degree, id) endpoint to the higher, so
    every wedge is generated at its LOWEST-degree apex; wedge count
    drops from Σd² to O(m·√m) on skewed graphs and each triangle is
    produced exactly once, no a<b<c triple-ordering scan needed.  Two
    self-equi-joins on oriented edges (shuffle on vertex id), degree
    table broadcast.  The deterministic mod-97 sparsifier bounds the
    fixture graph's density; all outputs are exact integers until the
    single final division (round 9).

    Driver fast path (pagerank's bounded-Arrow-probe design): when the
    sparsified DISTINCT edge list fits the probe, triangles count on
    the driver with the same degree-ordered orientation over python
    adjacency sets — integers end-to-end, so the result is IDENTICAL
    to the distributed loop (asserted by the unchanged oracle), while
    skipping ~8 shuffle stages of fixed overhead.  The distributed
    path below remains the 100 TB shape."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # pair generation per ORDER GROUP via rel.cooccurrence_pairs: the
    # common (bounded, ~7-element) basket expands with a narrow in-row
    # nested transform off one map-side-combined agg — no 2×-scan
    # shuffle join — while HOT baskets past the cap switch to the
    # blocked self-join so one 10⁵-item group can't materialize B²/2
    # structs inside a single task (VERDICT r4).  Sparsifier applies
    # before distinct (pure function of (a, b)).  The edge list feeds
    # FIVE downstream branches, so persist it (and deg); released
    # after the eager checkpoint (pagerank's persist discipline).
    edges_lazy = (
        rel.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .filter((F.col("a") * 31 + F.col("b")) % _TRI_MOD < _TRI_KEEP)
        .distinct()
    )
    probe = edges_lazy.limit(_TRI_PROBE_LIMIT + 1).toPandas()  # Arrow
    if len(probe) <= _TRI_PROBE_LIMIT:
        from collections import defaultdict

        deg_cnt: dict = defaultdict(int)
        epairs = list(
            zip(probe["a"].astype(int).tolist(), probe["b"].astype(int).tolist())
        )
        for a, b in epairs:
            deg_cnt[a] += 1
            deg_cnt[b] += 1
        adj: dict = defaultdict(set)  # oriented low→high by (deg, id)
        for a, b in epairs:
            u, w = (
                (a, b)
                if (deg_cnt[a], a) < (deg_cnt[b], b)
                else (b, a)
            )
            adj[u].add(w)
        n_tri = 0
        empty: set = set()
        for outs in adj.values():
            for v1 in outs:
                # closing edge v1—v2 is oriented from the lower (deg, id);
                # .get, not [v1] — defaultdict indexing would insert
                # during iteration
                n_tri += len(outs & adj.get(v1, empty))
        n_edges = len(epairs)
        n_vertices = len(deg_cnt)
        n_wedges = sum(d * (d - 1) // 2 for d in deg_cnt.values())
        if n_wedges:
            # Spark's round() is BigDecimal HALF_UP over the shortest
            # decimal repr; python round() is half-even — replicate
            # Spark exactly so both paths stay bit-identical
            import decimal

            coeff = float(
                decimal.Decimal(repr(3.0 * n_tri / n_wedges)).quantize(
                    decimal.Decimal("1e-9"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )
        else:
            coeff = 0.0
        return spark.createDataFrame(
            [(n_vertices, n_edges, n_tri, coeff)],
            "n_vertices bigint, n_edges bigint, n_triangles bigint, "
            "clustering_coeff double",
        )
    edges = edges_lazy.persist()
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    # orient each edge low→high by (degree, id); triangles survive as
    # exactly one (u→v, u→w, v→w) oriented triple
    e = (
        edges.join(
            F.broadcast(deg).withColumnRenamed("v", "a").withColumnRenamed(
                "d", "da"
            ),
            "a",
        )
        .join(
            F.broadcast(deg).withColumnRenamed("v", "b").withColumnRenamed(
                "d", "db"
            ),
            "b",
        )
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("w"))
            )
            .alias("e")
        )
        .select("e.u", "e.w")
    )
    # each unordered wedge at its apex exactly once (v1 < v2 by id);
    # the triangle's two-out-edge apex is unique, so no /2 correction
    w1 = e.select(F.col("u"), F.col("w").alias("v1"))
    w2 = e.select(F.col("u"), F.col("w").alias("v2"))
    wedges = w1.join(w2, "u").filter(F.col("v1") < F.col("v2"))
    # closing edge may be oriented either way between v1 and v2
    closing = e.select(
        F.least("u", "w").alias("lo"), F.greatest("u", "w").alias("hi")
    )
    tri = (
        wedges.select(
            F.col("v1").alias("lo"), F.col("v2").alias("hi")
        )
        .join(closing, ["lo", "hi"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    # COALESCE to 0 on the empty graph: SUM over no rows is NULL, which
    # would diverge from the driver fast path's integer 0 (and from the
    # oracle's identical COALESCE)
    n_wedges_open = deg.agg(
        F.coalesce(
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("n_wedges")
    )
    counts = deg.agg(F.count(F.lit(1)).alias("n_vertices")).crossJoin(
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
    )
    result = (
        counts.crossJoin(tri)
        .crossJoin(n_wedges_open)
        .select(
            "n_vertices",
            "n_edges",
            F.col("n_tri").alias("n_triangles"),
            F.round(
                F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                    3.0 * F.col("n_tri") / F.col("n_wedges")
                ),
                9,
            ).alias("clustering_coeff"),
        )
    )
    out = result.localCheckpoint(eager=True)  # single-row
    edges.unpersist()
    deg.unpersist()
    return out


@register("q_pca", oracle=_golden_oracle("q_pca"))
def q_pca(spark, sf_dir):
    """PCA of the embedding corpus: distributed sufficient-statistics
    covariance (llmops.pca_moments — round-then-DECIMAL sums, the d²
    blow-up generated per ROW and streamed, two corpus passes, nothing
    collected beyond the d×d matrix) → deterministic driver Jacobi
    eigensolve (stats.jacobi_eigh — scalar cyclic rotations; LAPACK is
    hardware-dependent per FIXTURES.md §6) → per-row in-order fold
    projection onto the top-2 components.  The dimensionality-
    reduction step ahead of visualization / clustering / whitening in
    an embedding pipeline.  Golden oracle; certified vs an independent
    numpy eigh at generation (sign-aligned, plus the variance-along-pc
    = eigenvalue identity)."""
    from . import stats as st

    emb = load_table(spark, sf_dir, "embeddings")
    mean, cov, n = llmops.pca_moments(emb)
    if n == 0:
        return spark.createDataFrame(
            [], "vec_id long, label int, pc1 double, pc2 double"
        )
    _eigvals, eigvecs = st.jacobi_eigh(cov)
    proj = llmops.pca_project(emb, mean, eigvecs[:2])
    return proj.select(
        "vec_id",
        "label",
        F.round("pc1", 6).alias("pc1"),
        F.round("pc2", 6).alias("pc2"),
    )


@register(
    "q_entropy",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS w
  FROM documents
),
wc AS (
  SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w
),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct,
         SUM(CAST(ROUND(c * LN(CAST(c AS DOUBLE)), 9) AS DECIMAL(28,9)))
           AS s
  FROM wc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       ROUND(LN(CAST(n_tokens AS DOUBLE))
             - CAST(s AS DOUBLE) / n_tokens, 6) AS entropy,
       ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr
FROM agg
""",
)
def q_entropy(spark, sf_dir):
    """Token-level Shannon entropy + type-token ratio per document —
    the lexical-diversity quality signals (low entropy = boilerplate /
    keyword stuffing; complements q_repetition_filter's n-gram view
    and q_lm_score's fluency view in a curation stack).

    H = ln(n) − (Σ c·ln c)/n from per-(doc, word) counts: one narrow
    tokenize + one groupBy — the count table is the inverted-index
    shape, corpus text never re-shuffles.  Determinism: c·ln c is
    rounded to 9 dp and DECIMAL-summed (order-free, FIXTURES.md §7);
    ln(n) and the division are single fixed-order IEEE ops."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(llmops.tokens_col("text")).alias("w")
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.round(
                    F.col("c") * F.log(F.col("c").cast("double")), 9
                ).cast("decimal(28,9)")
            ).alias("s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("s").cast("double") / F.col("n_tokens"),
                6,
            ).alias("entropy"),
            F.round(
                F.col("n_distinct").cast("double") / F.col("n_tokens"), 6
            ).alias("ttr"),
        )
    )


_HH_PHI = 0.02  # support threshold: count > phi·n


@register(
    "q_heavy_hitters",
    oracle=f"""
WITH toks AS (
  SELECT UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS w FROM documents
),
n AS (SELECT COUNT(*) AS n FROM toks),
c AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w)
SELECT c.w, c.cnt,
       ROUND(CAST(c.cnt AS DOUBLE) / n.n, 9) AS freq
FROM c CROSS JOIN n
WHERE c.cnt > {_HH_PHI} * n.n
""",
)
def q_heavy_hitters(spark, sf_dir):
    """EXACT heavy hitters (tokens with frequency > 2%) by the
    standard two-pass scale algorithm: a two-level Misra-Gries
    candidate sweep (llmops.heavy_hitter_candidates), then exact
    counting of the candidates only.

    The candidate set reaching the driver is provably ≤ k = 2/φ rows
    even on adversarially topic-clustered corpora — level 2 applies
    the MG decrement GLOBALLY over the per-batch summaries before any
    collect (the r4 VERDICT's unbounded-candidate-union fix) — and is
    still a guaranteed superset of the φ-hitters (undercount ≤
    2n/(k+1) < gap to the φn bar; see the helper's proof).  Pass 2:
    broadcast the ≤ k candidates, filter the token stream, exact
    groupBy count, keep count > φ·n.  The point at 100 TB: the full
    groupBy over the unbounded long-tail vocabulary never happens —
    only candidate tokens shuffle — and the driver never materializes
    more than k words.  The final answer is exact and
    sketch-independent (the sketch only prunes), so the output is
    deterministic under any partition/batch layout."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(llmops.tokens_col("text")).alias("w"))
    k = int(2.0 / _HH_PHI)

    cand, n_total = llmops.heavy_hitter_candidates(toks, k)
    cand_df = spark.createDataFrame([(w,) for w in cand], "w string")
    exact = (
        toks.join(F.broadcast(cand_df), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > _HH_PHI * n_total)
    )
    return exact.select(
        "w",
        "cnt",
        F.round(F.col("cnt").cast("double") / n_total, 9).alias("freq"),
    )


@register(
    "q_gaps_islands",
    oracle="""
WITH t AS (
  SELECT user_id, event_id,
         event_id - ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY event_id
         ) AS grp
  FROM events
)
SELECT user_id, MIN(event_id) AS start_id, MAX(event_id) AS end_id,
       COUNT(*) AS island_len
FROM t GROUP BY user_id, grp
""",
)
def q_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: maximal runs of CONSECUTIVE event_ids per
    user (the classic sequence-completeness / missing-data audit —
    same pattern finds gaps in ingest offsets or date coverage).
    The id-minus-row_number trick: within a user, consecutive ids
    share (event_id − row_number), so islands fall out of one groupBy.

    One shuffle on user_id for the window; the groupBy on
    (user_id, grp) is partition-local.  Integer-only — bit-exact."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    w = W.partitionBy("user_id").orderBy("event_id")
    t = ev.withColumn(
        "grp", F.col("event_id") - F.row_number().over(w)
    )
    return t.groupBy("user_id", "grp").agg(
        F.min("event_id").alias("start_id"),
        F.max("event_id").alias("end_id"),
        F.count(F.lit(1)).alias("island_len"),
    ).drop("grp")


@register(
    "q_skyline",
    oracle="""
WITH pts AS (
  SELECT o_totalprice AS x, EPOCH_US(o_orderdate) AS y FROM orders
),
gx AS (SELECT x, MAX(y) AS ymax FROM pts GROUP BY x),
cnt AS (SELECT x, y, COUNT(*) AS n FROM pts GROUP BY x, y),
m AS (
  SELECT x, ymax,
         MAX(ymax) OVER (ORDER BY x DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prevmax
  FROM gx
)
SELECT m.x AS price, m.ymax AS odate_us, c.n AS n_orders
FROM m JOIN cnt c ON c.x = m.x AND c.y = m.ymax
WHERE m.prevmax IS NULL OR m.ymax > m.prevmax
""",
)
def q_skyline(spark, sf_dir):
    """2-D skyline (Pareto frontier): orders not dominated on
    (price↑, recency↑) — another order with ≥ both and > one knocks a
    point out.  The multi-criteria shortlist operator (build-vs-buy
    frontiers, best-price-freshest-data tradeoffs).

    Scale shape — the sort-sweep algorithm, distributed: group by x
    (bounded by distinct prices), then ONE exclusive running max over
    x-descending via windows.scalable_cummax_exclusive (two-phase:
    range repartition + per-partition window + broadcast prefix
    offsets — never a single-task global window); a point survives
    iff its y beats every strictly-better-x group's max.  The
    all-pairs dominance join (O(n²)) never happens.  Integer epoch-µs
    y, raw parquet-double x — exact compares, no float derivation."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        F.col("o_totalprice").alias("x"),
        epoch_us(o, "o_orderdate").alias("y"),
    )
    gx = pts.groupBy("x").agg(F.max("y").alias("ymax"))
    cnt = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n"))
    m = win.scalable_cummax_exclusive(
        gx, "x", "ymax", "prevmax", descending=True
    )
    keep = m.filter(
        F.col("prevmax").isNull() | (F.col("ymax") > F.col("prevmax"))
    )
    return (
        keep.join(
            cnt,
            (keep.x == cnt.x) & (keep.ymax == cnt.y),
        )
        .select(
            keep.x.alias("price"),
            keep.ymax.alias("odate_us"),
            F.col("n").alias("n_orders"),
        )
    )


_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@register(
    "q_pmi_bigrams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1), i -> t[i]))
           AS w1,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1), i -> t[i+1]))
           AS w2
  FROM toks
),
n AS (SELECT COUNT(*) AS n FROM bi),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
c2 AS (SELECT w2, COUNT(*) AS c2 FROM bi GROUP BY w2),
scored AS (
  SELECT p.w1, p.w2, p.c12,
         ROUND(LN(CAST(p.c12 AS DOUBLE) * n.n
                  / (CAST(a.c1 AS DOUBLE) * b.c2)), 6) AS pmi
  FROM c12 p
  JOIN c1 a ON p.w1 = a.w1
  JOIN c2 b ON p.w2 = b.w2
  CROSS JOIN n
  WHERE p.c12 >= {_PMI_MIN_COUNT}
)
SELECT w1, w2, c12, pmi
FROM scored
ORDER BY pmi DESC, w1, w2
LIMIT {_PMI_TOPK}
""",
)
def q_pmi_bigrams(spark, sf_dir):
    """Collocation mining: top-50 bigrams by pointwise mutual
    information (PMI = ln(c12·N / c1·c2), min count 5) — the classic
    phrase detector (word2vec's phrase pass, quality-signal n-grams).

    Three count aggregations over the bigram stream (pair + two
    marginals — inverted-index keys, no pair-to-pair join), marginals
    equi-joined back, scalar N broadcast.  Global top-k plans as
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Rank is on the ROUNDED pmi with (w1, w2) tie-breakers
    (FIXTURES.md §5.5); the pre-round expression is one fixed-order
    IEEE chain, identical in both dialects."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        F.col("doc_id"),
        F.posexplode(F.split(llmops.norm_text("text"), " ")).alias(
            "pos", "w1"
        ),
    )
    wspec = W.partitionBy("doc_id").orderBy("pos")
    bi = (
        t.select("doc_id", "w1", F.lead("w1", 1).over(wspec).alias("w2"))
        .filter(F.col("w2").isNotNull())
        .select("w1", "w2")
    )
    n_df = bi.agg(F.count(F.lit(1)).alias("n"))
    c12 = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= _PMI_MIN_COUNT)
    )
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        c12.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n_df))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("n")
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(_PMI_TOPK)


@register(
    "q_interval_coalesce",
    oracle="""
WITH iv AS (
  SELECT l_suppkey,
         CAST(EPOCH_US(l_shipdate) / 86400000000 AS BIGINT) AS lo,
         CAST(EPOCH_US(l_shipdate) / 86400000000 AS BIGINT)
           + 3 + l_orderkey % 11 AS hi
  FROM lineitem WHERE l_suppkey % 13 = 0
),
m AS (
  SELECT *,
         MAX(hi) OVER (PARTITION BY l_suppkey ORDER BY lo, hi
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_maxhi
  FROM iv
),
g AS (
  SELECT *,
         SUM(CASE WHEN prev_maxhi IS NULL OR lo > prev_maxhi
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_suppkey ORDER BY lo, hi
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM m
)
SELECT l_suppkey, CAST(grp AS BIGINT) AS grp,
       MIN(lo) AS start_day, MAX(hi) AS end_day,
       COUNT(*) AS n_intervals,
       CAST(MAX(hi) - MIN(lo) AS BIGINT) AS span_days
FROM g GROUP BY l_suppkey, grp
""",
)
def q_interval_coalesce(spark, sf_dir):
    """Coalesce overlapping/touching intervals per key (supplier ship
    windows on the day grid) — the region-merge primitive (bedtools
    merge / significant-loci consolidation downstream of
    q_hic_significance; q_join_interval_overlap's write-side twin).

    Sweep-line as windows: per-key sort by lo, exclusive running
    MAX(hi) — an interval starts a new merged run iff its lo clears
    everything seen before (strictly; touching merges) — then a
    running-sum ordinal and one partition-local groupBy.  ONE shuffle
    on the key; the per-key window never crosses keys, so skew ceiling
    is the busiest key.  Integer day arithmetic end-to-end."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    day = (epoch_us(li, "l_shipdate") / F.lit(86_400_000_000)).cast("long")
    iv = li.filter(F.col("l_suppkey") % 13 == 0).select(
        "l_suppkey",
        day.alias("lo"),
        (day + 3 + F.col("l_orderkey") % 11).alias("hi"),
    )
    w = W.partitionBy("l_suppkey").orderBy("lo", "hi")
    m = iv.withColumn(
        "prev_maxhi", F.max("hi").over(w.rowsBetween(W.unboundedPreceding, -1))
    )
    g = m.withColumn(
        "grp",
        F.sum(
            F.when(
                F.col("prev_maxhi").isNull()
                | (F.col("lo") > F.col("prev_maxhi")),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return g.groupBy("l_suppkey", "grp").agg(
        F.min("lo").alias("start_day"),
        F.max("hi").alias("end_day"),
        F.count(F.lit(1)).alias("n_intervals"),
        (F.max("hi") - F.min("lo")).cast("bigint").alias("span_days"),
    ).select(
        "l_suppkey",
        F.col("grp").cast("bigint").alias("grp"),
        "start_day",
        "end_day",
        "n_intervals",
        "span_days",
    )


_ATTR_WINDOW_US = 7 * 86_400_000_000  # 7-day attribution window


@register(
    "q_attribution",
    oracle=f"""
WITH t AS (
  SELECT user_id, event_id, event_type, EPOCH_US(ts) AS us, value
  FROM events
),
m AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'click'
                  THEN us ELSE NULL END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_us
  FROM t
)
SELECT user_id, event_id AS purchase_id, us AS purchase_us,
       CASE WHEN last_click_us IS NOT NULL
              AND us - last_click_us <= {_ATTR_WINDOW_US}
            THEN last_click_us ELSE NULL END AS attributed_click_us,
       CASE WHEN last_click_us IS NOT NULL
              AND us - last_click_us <= {_ATTR_WINDOW_US}
            THEN 'click' ELSE 'organic' END AS channel,
       ROUND(value, 6) AS purchase_value
FROM m WHERE event_type = 'purchase'
""",
)
def q_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 7-day lookback, else counts as organic — the
    marketing/causal-credit assignment every events warehouse runs.

    The conditional carry-forward shape: a per-user running
    MAX(CASE WHEN click THEN ts) over strictly-preceding rows gives
    the last click before each event — one window, no self-join
    against the click subset (the naive as-of join re-shuffles the
    event table against itself; this reads it once).  ONE shuffle on
    user_id; epoch-µs integer math (FIXTURES §5.4)."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id",
        "event_id",
        "event_type",
        epoch_us(ev_raw).alias("us"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("us"))
    ).over(w)
    m = ev.withColumn("last_click_us", last_click).filter(
        F.col("event_type") == "purchase"
    )
    in_window = F.col("last_click_us").isNotNull() & (
        F.col("us") - F.col("last_click_us") <= _ATTR_WINDOW_US
    )
    return m.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("purchase_us"),
        F.when(in_window, F.col("last_click_us")).alias(
            "attributed_click_us"
        ),
        F.when(in_window, F.lit("click"))
        .otherwise("organic")
        .alias("channel"),
        F.round("value", 6).alias("purchase_value"),
    )


@register(
    "q_rfm",
    oracle="""
WITH t AS (
  SELECT user_id, event_type, EPOCH_US(ts) AS us, value FROM events
),
anchor AS (SELECT MAX(us) AS now_us FROM t),
rfm AS (
  SELECT user_id,
         CAST((a.now_us - MAX(CASE WHEN event_type = 'purchase'
                                   THEN us END)) // 86400000000 AS BIGINT)
           AS recency_days,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS frequency,
         ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value, 6) AS DECIMAL(28,6))
                        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE), 6)
           AS monetary
  FROM t CROSS JOIN anchor a
  GROUP BY user_id, a.now_us
  HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
)
SELECT user_id, recency_days, frequency, monetary,
       NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
       NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
       NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
FROM rfm
""",
)
def q_rfm(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary quartiles per
    purchasing user) — the classic customer-value scoring every events
    warehouse ships.  Anchor 'now' is the corpus max timestamp
    (data-derived, deterministic — no wall clock, FIXTURES §4).

    One aggregation over events collapses to per-USER rows before any
    window — the ntile quartiles run over the bounded user dimension,
    not the event stream (the same post-aggregation-cardinality rule
    the Hi-C bin tables follow).  Monetary uses round-then-DECIMAL
    sums; ntile ties break on user_id in both dialects."""
    from pyspark.sql import Window as W

    ev_raw = load_table(spark, sf_dir, "events")
    t = ev_raw.select(
        "user_id", "event_type", epoch_us(ev_raw).alias("us"), "value"
    )
    anchor = t.agg(F.max("us").alias("now_us"))
    is_p = F.col("event_type") == "purchase"
    rfm = (
        t.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "now_us")
        .agg(
            F.max(F.when(is_p, F.col("us"))).alias("last_p"),
            F.sum(F.when(is_p, 1).otherwise(0)).cast("bigint").alias(
                "frequency"
            ),
            F.round(
                F.sum(
                    F.when(
                        is_p,
                        F.round(F.col("value"), 6).cast("decimal(28,6)"),
                    ).otherwise(F.lit(0).cast("decimal(28,6)"))
                ).cast("double"),
                6,
            ).alias("monetary"),
        )
        .filter(F.col("frequency") > 0)
        .select(
            "user_id",
            F.floor(
                (F.col("now_us") - F.col("last_p")) / F.lit(86_400_000_000)
            )
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return rfm.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(W.orderBy(F.asc("recency_days"), F.asc("user_id")))
        .alias("r_score"),
        F.ntile(4)
        .over(W.orderBy(F.desc("frequency"), F.asc("user_id")))
        .alias("f_score"),
        F.ntile(4)
        .over(W.orderBy(F.desc("monetary"), F.asc("user_id")))
        .alias("m_score"),
    )


_BFS_MAX_DEPTH = 6


@register(
    "q_graph_bfs",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
),
edges AS (
  SELECT a, b FROM pairs
  WHERE (a * 31 + b) % {_TRI_MOD} < {_TRI_KEEP}
),
sym AS (
  SELECT a AS u, b AS v FROM edges
  UNION ALL SELECT b AS u, a AS v FROM edges
),
src AS (SELECT MIN(a) AS s FROM edges),
walk(v, d) AS (
  SELECT s, 0 FROM src WHERE s IS NOT NULL
  UNION
  SELECT sym.v, walk.d + 1
  FROM walk JOIN sym ON sym.u = walk.v
  WHERE walk.d < {_BFS_MAX_DEPTH}
),
dist AS (SELECT v, MIN(d) AS d FROM walk GROUP BY v)
SELECT d AS dist, COUNT(*) AS n_nodes FROM dist GROUP BY d
""",
)
def q_graph_bfs(spark, sf_dir):
    """BFS level sizes from the minimum-id vertex of the (sparsified)
    co-purchase graph — the reachability / neighborhood-growth
    primitive (fraud rings, lineage radius, k-hop feature counts).

    The oracle is a recursive CTE (DuckDB WITH RECURSIVE + UNION
    dedup); Spark has no recursive SQL, so the engine shape is the
    ITERATIVE FRONTIER loop: per level, join the frontier to the
    symmetrized adjacency, anti-join everything already visited,
    localCheckpoint the (bounded, node-sized) state to cut lineage.
    Each iteration shuffles only frontier-sized data.  Driver fast
    path (pagerank/triangle's bounded-Arrow-probe design) runs the
    same BFS over python adjacency sets — identical integer output.
    Depth capped at {_BFS_MAX_DEPTH}."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # hot-basket-safe pair generation (see q_triangle_count)
    edges_lazy = (
        rel.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .filter((F.col("a") * 31 + F.col("b")) % _TRI_MOD < _TRI_KEEP)
        .distinct()
    )
    probe = edges_lazy.limit(_TRI_PROBE_LIMIT + 1).toPandas()
    if len(probe) <= _TRI_PROBE_LIMIT:
        from collections import defaultdict, deque

        adj: dict = defaultdict(set)
        src = None
        for a, b in zip(
            probe["a"].astype(int).tolist(), probe["b"].astype(int).tolist()
        ):
            adj[a].add(b)
            adj[b].add(a)
            src = a if src is None else min(src, a)
        levels: dict = {}
        if src is not None:
            dist = {src: 0}
            q = deque([src])
            while q:
                u = q.popleft()
                if dist[u] >= _BFS_MAX_DEPTH:
                    continue
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        q.append(w)
            for d in dist.values():
                levels[d] = levels.get(d, 0) + 1
        return spark.createDataFrame(
            sorted(levels.items()), "dist bigint, n_nodes bigint"
        )
    # distributed frontier loop (the 100 TB path)
    edges = edges_lazy.persist()
    sym = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )
    src_row = edges.agg(F.min("a").alias("s")).first()
    if src_row["s"] is None:  # empty graph → empty histogram (== oracle)
        edges.unpersist()
        return spark.createDataFrame([], "dist bigint, n_nodes bigint")
    visited = spark.createDataFrame(
        [(int(src_row["s"]), 0)], "v long, dist long"
    ).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, _BFS_MAX_DEPTH + 1):
        nxt = (
            frontier.join(sym, frontier.v == sym.u)
            .select(sym.v.alias("v"))
            .distinct()
            .join(visited.select("v"), "v", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    out = (
        visited.groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("dist").cast("bigint"), "n_nodes")
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    sym.unpersist()
    return out


_BOOT_B = 32  # bootstrap replicates
#: Poisson(1) CDF thresholds on h mod 1000 → replicate weight 0..4
_BOOT_T = (368, 736, 920, 981)


@register(
    "q_bootstrap_ci",
    oracle=f"""
WITH rows_b AS (
  SELECT l_extendedprice AS price,
         (l_orderkey * 8 + l_linenumber) * 64 + b.b AS pairkey,
         b.b AS b
  FROM lineitem CROSS JOIN (
    SELECT UNNEST(GENERATE_SERIES(0, {_BOOT_B - 1})) AS b
  ) b
),
mix AS (
  -- avalanche finalizer (xor-shift + odd-multiply, 32-bit lanes): the
  -- bare multiplicative hash is LINEAR in the replicate index, which
  -- correlates replicate weights (lattice shifts) and miscalibrates
  -- the CI; two xor/multiply rounds bring cross-replicate weight
  -- correlation from |rho|~0.2 to ~0.002 (measured)
  SELECT b, price,
         xor(x4, x4 >> 16) % 1000 AS h
  FROM (
    SELECT *, (x3 * 73244475) % 4294967296 AS x4 FROM (
      SELECT *, xor(x2, x2 >> 16) AS x3 FROM (
        SELECT *, (x1 * 73244475) % 4294967296 AS x2 FROM (
          SELECT *, xor(x0, x0 >> 16) AS x1 FROM (
            SELECT *, ((pairkey % 2654435761) * 2654435761)
                      % 4294967296 AS x0
            FROM rows_b
  ) ) ) ) )
),
w AS (
  SELECT b, price,
         CASE
           WHEN h < {_BOOT_T[0]} THEN 0
           WHEN h < {_BOOT_T[1]} THEN 1
           WHEN h < {_BOOT_T[2]} THEN 2
           WHEN h < {_BOOT_T[3]} THEN 3
           ELSE 4 END AS w
  FROM mix
),
reps AS (
  SELECT b,
         CAST(SUM(w) AS BIGINT) AS n_eff,
         ROUND(CAST(SUM(w * CAST(ROUND(price, 2) AS DECIMAL(18,2)))
                    AS DOUBLE)
               / SUM(w), 9) AS boot_mean
  FROM w GROUP BY b
),
point AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice, 2)
                             AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*), 6) AS point_mean
  FROM lineitem
)
SELECT (SELECT COUNT(*) FROM reps) AS n_replicates,
       (SELECT point_mean FROM point) AS point_mean,
       ROUND((SELECT QUANTILE_CONT(boot_mean, 0.025) FROM reps), 6)
         AS ci_lo,
       ROUND((SELECT QUANTILE_CONT(boot_mean, 0.975) FROM reps), 6)
         AS ci_hi
""",
)
def q_bootstrap_ci(spark, sf_dir):
    """Bootstrap confidence interval for the mean price — via the
    POISSON BOOTSTRAP (Chamandy et al.), the standard distributed
    form: instead of resampling n rows with replacement (which needs
    global coordination), each row independently receives a
    Poisson(1) replicate weight, here derived DETERMINISTICALLY from
    hashing (row, replicate) against the Poisson CDF thresholds — so
    the 'randomness' is reproducible and both engines replay it
    bit-for-bit.  The hash is the shared knuth fold FINISHED with an
    avalanching xor-shift/odd-multiply mixer: the bare multiplicative
    hash is linear in the replicate index, which lattice-correlates
    replicate weights (measured |rho| up to 0.58) and miscalibrates
    the CI; with the mixer, cross-replicate weight correlation is
    ~0.002 and replicate-mean correlations sit at the noise floor.

    SINGLE corpus pass, no explode: an Arrow sufficient-stats kernel
    (the pca_moments discipline) computes all B replicate partials —
    plus the point-estimate totals — per batch with exact integer
    cents and the vectorized hash; the ×B row blow-up of the textbook
    formulation never materializes (it ran ~10× slower, and a
    64-expression JVM aggregate still ~4× — codegen budget).  One
    groupBy over B+1 keys, then the percentile CI over B rows.  B and
    the thresholds are the at-scale knobs; nothing else changes at
    100 TB."""
    import pandas as pd

    from .llmops import _KNUTH, _KNUTH_MOD

    li = load_table(spark, sf_dir, "lineitem").select(
        (
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 64
        ).alias("keybase"),
        "l_extendedprice",
    )
    B, T = _BOOT_B, _BOOT_T
    KN, KM = _KNUTH, _KNUTH_MOD  # single source of truth (llmops)

    def boot_partials(batches):
        # per-batch exact integer partials (2-dp prices: ×100 is
        # lossless), summed order-free downstream; arithmetic is
        # IDENTICAL to the SQL oracle's mix CTE
        import numpy as np

        thresholds = np.array(T, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            kb = pdf["keybase"].to_numpy(np.int64)
            kbm = kb % KN  # hoisted: (kb + rb) % KN == (kbm + rb) % KN
            cents = np.rint(
                pdf["l_extendedprice"].to_numpy(np.float64) * 100
            ).astype(np.int64)
            total_s = int(cents.sum())
            total_n = len(cents)
            s = np.empty(B, dtype=np.int64)
            n = np.empty(B, dtype=np.int64)
            for rb in range(B):
                x = ((kbm + rb) % KN) * KN % KM
                x ^= x >> 16
                x = (x * 73244475) % KM
                x ^= x >> 16
                x = (x * 73244475) % KM
                x ^= x >> 16
                w = np.searchsorted(thresholds, x % 1000, side="right")
                s[rb] = int((w * cents).sum())
                n[rb] = int(w.sum())
            yield pd.DataFrame(
                {
                    "b": list(range(B)) + [-1],  # -1 = point totals
                    "s": list(s) + [total_s],
                    "n": list(n) + [total_n],
                }
            )

    stats = (
        li.mapInPandas(boot_partials, schema="b int, s long, n long")
        .groupBy("b")
        .agg(
            F.sum("s").alias("s"),
            F.sum("n").cast("bigint").alias("n_eff"),
        )
        .persist()
    )
    reps = stats.filter(F.col("b") >= 0).select(
        "b",
        "n_eff",
        F.round(
            (F.col("s").cast("decimal(28,0)") / 100).cast("double")
            / F.col("n_eff"),
            9,
        ).alias("boot_mean"),
    )
    point = stats.filter(F.col("b") < 0).select(
        F.round(
            (F.col("s").cast("decimal(28,0)") / 100).cast("double")
            / F.col("n_eff"),
            6,
        ).alias("point_mean")
    )
    summary = reps.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.expr("percentile(boot_mean, 0.025D)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(boot_mean, 0.975D)"), 6).alias("ci_hi"),
    )
    out = (
        summary.crossJoin(F.broadcast(point))
        .select("n_replicates", "point_mean", "ci_lo", "ci_hi")
        .localCheckpoint(eager=True)  # single row; lets stats release
    )
    stats.unpersist()
    return out


#: The driver walks the registry in insertion order and evaluates at
#: most 50 entries per round, so this list is rotated each round to put
#: the least-recently-verified keys first.  Round-4 continuation: the
#: 16 brand-new §2.14 keys lead (none has a driver row yet), then the
#: keys whose code changed earlier in round 4, then the 13 keys whose
#: newest CORRECTNESS row still dates from round 1, then the round-3
#: backlog in last-verified order.
_VERIFY_FIRST = [
    # new in round-4 continuation session (§2.14)
    "q_bootstrap_ci",
    "q_graph_bfs",
    "q_rfm",
    "q_attribution",
    "q_interval_coalesce",
    "q_skyline",
    "q_pmi_bigrams",
    "q_heavy_hitters",
    "q_gaps_islands",
    "q_entropy",
    "q_pca",
    "q_sessionize",
    "q_time_weighted_avg",
    "q_chunk_documents",
    "q_bm25",
    "q_outlier_mad",
    "q_triangle_count",
    # new / code-changed in round 4
    "q_merge_upsert",
    "q_snapshot_diff",
    "q_lm_score",
    "q_bpe_train",
    "q_bpe_tokenize",
    "q_join_bucketed",
    "q_join_bloom",
    "q_scd2_merge",
    "q_embedding_quantize",
    "q_sim_ivf",
    "q_join_skew_salted",
    # newest driver row is still round 1
    "q_math_funcs",
    "q_string_funcs",
    "q_date_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_funcs",
    "q_window_rank",
    "q_window_frame",
    "q_window_lead_lag",
    "q_window_ntile",
    "q_topk_per_group",
    "q_join_outer",
    "q_dedup_exact",
    # round-2 rows not re-swept in round 3 (oldest next)
    "q_scan_project",
    "q_project_derive",
    "q_filter_range",
    "q_filter_in",
    "q_canonicalize",
    "q_join_asof_tol",
    "q_agg_global",
    "q_agg_group",
    "q_agg_marginal",
    "q_agg_percentile",
    "q_unpivot",
    "q_window_range_frame",
    "q_corr_exact",
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_fingerprint",
    "q_tfidf_terms",
    "q_pii_redact",
    "q_sample_stratified",
    "q_contamination",
    "q_pack_sequences",
    "q_mix_sources",
    "q_repetition_filter",
    "q_ngram_coverage",
    "q_text_clean",
    "q_cap_per_group",
    "q_struct_funcs",
    "q_array_explode",
    "q_possible_pairs_frag",
    "q_dedup_ngram_global",
    "q_dedup_embedding",
    "q_sim_topk",
    "q_quality_score",
    "q_multimodal_meta",
    "q_multimodal_resize",
    "q_multimodal_frames",
    "q_multimodal_features",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_stateful",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_topk",
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
