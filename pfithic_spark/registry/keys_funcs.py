"""§2.8 scalar function families (math/string/date/array/map/json).

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
