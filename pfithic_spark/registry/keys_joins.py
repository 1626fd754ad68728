"""§2.3 join family, §2.6 sort/limit, §2.7 set operations.

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
