"""§2.19 round-7 additions (EXT): rank-statistics / information-theory
/ ops-analytics breadth.

Operators a warehouse-analytics or training-data user reaches for next
to the §2.16–2.18 statistical kernels: rank correlations (Kendall
tau-b, Spearman rho), the Mann–Kendall trend test, categorical mutual
information, interval-stabbing backlog curves, price/volume revenue
bridges, growth accounting, and containment dedup.  Every key follows
the FIXTURES.md determinism rules: exact integer units end to end,
order-free integer/DECIMAL sums (LN terms round(9) → DECIMAL, the
q_entropy precedent), identical double algebra on both engines for
every final ratio, `div` for integer division (§8.7), and full
tie-break chains under every rank.

O(D²) pair constructions ride the CALENDAR-BOUNDED day grain (the
q_theil_sen_trend discipline): the only full-data stage at 100 TB is
the one groupBy to the day table; the pair join broadcasts a
few-thousand-row side.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import windows as win  # noqa: F401
from ..io import epoch_us, load_table  # noqa: F401
from ._core import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
    register,
)

#: Shared DuckDB day-grain CTE for the daily (orders, revenue) series —
#: dayidx from epoch-µs floor-division (io.epoch_us contract), revenue
#: in exact integer cents.  The Spark twin is :func:`_daily_series`.
_DAILY_SQL = """
  SELECT EPOCH_US(o_orderdate) // 86400000000 AS dayidx,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
"""


def _daily_series(spark, sf_dir):
    """Daily (dayidx, cnt, cents) series over orders — the bounded day
    grain every rank-statistic key in this module rides (mirrors
    :data:`_DAILY_SQL`)."""
    o = load_table(spark, sf_dir, "orders")
    us = epoch_us(o, "o_orderdate")
    return o.groupBy(
        F.floor(us / F.lit(86_400_000_000)).alias("dayidx")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("cents"),
    )


def _int_sign(c) -> "F.Column":
    """Integer sign (−1/0/1) — F.signum returns DOUBLE, and the pair
    censuses below want exact integer conditional counts."""
    return (
        F.when(c > 0, F.lit(1)).when(c < 0, F.lit(-1)).otherwise(F.lit(0))
    )


# ========================================================================
# q_kendall_tau — Kendall tau-b between daily order count and revenue
# ========================================================================


@register(
    "q_kendall_tau",
    oracle="""
WITH d AS (
"""
    + _DAILY_SQL
    + """
),
p AS (
  SELECT CASE WHEN b.cnt > a.cnt THEN 1
              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS dx,
         CASE WHEN b.cents > a.cents THEN 1
              WHEN b.cents < a.cents THEN -1 ELSE 0 END AS dy
  FROM d a JOIN d b ON a.dayidx < b.dayidx
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN dx * dy = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS concordant,
         CAST(SUM(CASE WHEN dx * dy = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS discordant,
         CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
         CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
  FROM p
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
       n0 AS n_pairs, concordant, discordant, ties_x, ties_y,
       ROUND(
         CAST(concordant - discordant AS DOUBLE)
         / SQRT(CAST(n0 - ties_x AS DOUBLE) * CAST(n0 - ties_y AS DOUBLE)),
         6
       ) AS tau_b
FROM s
""",
)
def q_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank correlation between the daily order count and
    daily revenue — the tie-corrected, outlier-immune monotone-
    association measure (complements q_corr_exact's Pearson and
    q_theil_sen_trend's robust slope).

    The O(D²) pair set rides the CALENDAR-BOUNDED day grain (≤ ~2,500
    days — constant in data volume); at 100 TB the only full-data
    stage is the one groupBy to the day table, then the pair join
    broadcasts the few-thousand-row side.  Pair signs are exact
    integers (F.signum is DOUBLE — a CASE keeps the census integer),
    the five censuses are one conditional aggregate, and tau-b =
    (C−D)/√((n0−n1)(n0−n2)) runs the identical double expression on
    both engines from exact BIGINT inputs (each factor ≤ ~3e6 pairs²
    — the PRODUCT is taken in double, correctly rounded identically,
    because BIGINT would hold it here but not at wider calendars)."""
    d = _daily_series(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    dx = _int_sign(F.col("b.cnt") - F.col("a.cnt"))
    dy = _int_sign(F.col("b.cents") - F.col("a.cents"))
    p = a.join(F.broadcast(b), F.col("a.dayidx") < F.col("b.dayidx")).select(
        dx.alias("dx"), dy.alias("dy")
    )
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(F.col("dx") * F.col("dy") == 1, 1).otherwise(0))
        .cast("long")
        .alias("concordant"),
        F.sum(F.when(F.col("dx") * F.col("dy") == -1, 1).otherwise(0))
        .cast("long")
        .alias("discordant"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ties_x"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ties_y"),
    )
    n_days = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return n_days.crossJoin(s).select(
        "n_days",
        F.col("n0").alias("n_pairs"),
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        F.round(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("ties_x")).cast("double")
                * (F.col("n0") - F.col("ties_y")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


# ========================================================================
# q_spearman_corr — Spearman rho between daily order count and revenue
# ========================================================================


@register(
    "q_spearman_corr",
    oracle="""
WITH d AS (
"""
    + _DAILY_SQL
    + """
),
r AS (
  SELECT
    2 * RANK() OVER (ORDER BY cnt)
      + COUNT(*) OVER (PARTITION BY cnt) - 1 AS rx,
    2 * RANK() OVER (ORDER BY cents)
      + COUNT(*) OVER (PARTITION BY cents) - 1 AS ry
  FROM d
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy
  FROM r
)
SELECT n AS n_days,
       ROUND(
         CAST(n * sxy - sx * sy AS DOUBLE)
         / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)),
         6
       ) AS rho
FROM s
""",
)
def q_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between daily order count and daily
    revenue — Pearson over AVERAGE ranks, the standard tie handling.

    Ranks stay EXACT INTEGERS by carrying 2×avgrank = 2·RANK() +
    (tie_count − 1) (an average rank is a half-integer; doubling it
    dodges the float).  The five sufficient sums are then exact BIGINT
    (2r ≤ 2D ≤ 5,000, Σr² ≤ D·(2D)² ≈ 6e10 — far inside int64), and
    rho's closed form runs the identical double expression on both
    engines; each n·S−S² factor is computed IN BIGINT (exact, ≤ ~1e14)
    and only the cross-product/sqrt run in double.  The rank windows
    ride the bounded day grain — single-partition by construction
    (q_rolling_corr convention)."""
    d = _daily_series(spark, sf_dir)
    rx = (
        F.lit(2) * F.rank().over(Window.orderBy("cnt"))
        + F.count(F.lit(1)).over(Window.partitionBy("cnt"))
        - F.lit(1)
    ).cast("long")
    ry = (
        F.lit(2) * F.rank().over(Window.orderBy("cents"))
        + F.count(F.lit(1)).over(Window.partitionBy("cents"))
        - F.lit(1)
    ).cast("long")
    r = d.select(rx.alias("rx"), ry.alias("ry"))
    s = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double")
                * (
                    F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                ).cast("double")
            ),
            6,
        ).alias("rho"),
    )


# ========================================================================
# q_mann_kendall — Mann–Kendall monotone-trend test on daily revenue
# ========================================================================


@register(
    "q_mann_kendall",
    oracle="""
WITH d AS (
"""
    + _DAILY_SQL
    + """
),
s AS (
  SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                       WHEN b.cents < a.cents THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM d a JOIN d b ON a.dayidx < b.dayidx
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
t AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY cents)
  WHERE t > 1
),
v AS (
  SELECT n.n, s.s_stat,
         CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE)
           / 18.0 AS var_s
  FROM n, s, t
)
SELECT n AS n_days, s_stat, ROUND(var_s, 6) AS var_s,
       ROUND(CASE WHEN s_stat > 0
                    THEN CAST(s_stat - 1 AS DOUBLE) / SQRT(var_s)
                  WHEN s_stat < 0
                    THEN CAST(s_stat + 1 AS DOUBLE) / SQRT(var_s)
                  ELSE 0.0 END, 6) AS z,
       CASE WHEN s_stat > 0
              AND CAST(s_stat - 1 AS DOUBLE) / SQRT(var_s) > 1.959964
            THEN 'increasing'
            WHEN s_stat < 0
              AND CAST(s_stat + 1 AS DOUBLE) / SQRT(var_s) < -1.959964
            THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM v
""",
)
def q_mann_kendall(spark, sf_dir):
    """Mann–Kendall monotone-trend test on daily revenue: S = Σ_{i<j}
    sign(y_j − y_i), tie-corrected variance, continuity-corrected z —
    the nonparametric companion to q_theil_sen_trend (MK answers "is
    there a trend", Theil–Sen "how steep").

    S is an exact integer over the calendar-bounded O(D²) pair set
    (broadcast join, the q_theil_sen_trend shape); the tie correction
    Σ t(t−1)(2t+5) is exact BIGINT over per-value tie groups; var_S
    divides by 18.0 ONCE in double, and z's continuity correction
    (S∓1) keeps everything integer until the final division.  The
    trend classification compares the SAME double expression both
    engines, so the label cannot disagree (q_control_chart's flag
    rule)."""
    d = _daily_series(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    s = (
        a.join(F.broadcast(b), F.col("a.dayidx") < F.col("b.dayidx"))
        .agg(
            F.sum(_int_sign(F.col("b.cents") - F.col("a.cents")))
            .cast("long")
            .alias("s_stat")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = (
        d.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = (
        n.crossJoin(s)
        .crossJoin(t)
        .select(
            "n",
            "s_stat",
            (
                (
                    F.col("n")
                    * (F.col("n") - 1)
                    * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                ).cast("double")
                / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    zpos = (F.col("s_stat") - 1).cast("double") / F.sqrt(F.col("var_s"))
    zneg = (F.col("s_stat") + 1).cast("double") / F.sqrt(F.col("var_s"))
    return v.select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(
            F.when(F.col("s_stat") > 0, zpos)
            .when(F.col("s_stat") < 0, zneg)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("z"),
        F.when(
            (F.col("s_stat") > 0) & (zpos > 1.959964), F.lit("increasing")
        )
        .when(
            (F.col("s_stat") < 0) & (zneg < -1.959964), F.lit("decreasing")
        )
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


# ========================================================================
# q_mutual_information — categorical MI: market segment × order priority
# ========================================================================


@register(
    "q_mutual_information",
    oracle="""
WITH cell AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
m AS (
  SELECT segment, priority, n_xy,
         CAST(SUM(n_xy) OVER (PARTITION BY segment) AS BIGINT) AS n_x,
         CAST(SUM(n_xy) OVER (PARTITION BY priority) AS BIGINT) AS n_y,
         CAST(SUM(n_xy) OVER () AS BIGINT) AS n
  FROM cell
),
terms AS (
  SELECT segment, priority, n_xy,
         ROUND(LN((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE))
                  / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6)
           AS pmi,
         ROUND((CAST(n_xy AS DOUBLE) / n)
               * LN((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE))
                    / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 9)
           AS term
  FROM m
)
SELECT segment, priority, n_xy, pmi,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) OVER () AS DOUBLE), 6)
         AS mi_nats
FROM terms
""",
)
def q_mutual_information(spark, sf_dir):
    """Mutual information (nats) between customer market segment and
    order priority, with per-cell pointwise MI — the information-
    theoretic association measure beside q_chi_square / q_cramers_v
    (MI is comparable across tables of different shape; PMI names
    WHICH cells drive it).

    One join + groupBy to the ≤25-cell crosstab (customer broadcast —
    at 100 TB the orders side never shuffles for a bounded dim);
    margins are windows on the bounded cell table (q_chi_square's
    one-chain rule).  The log ratio multiplies/divides in DOUBLE
    (n·n_xy would overflow BIGINT at petabyte counts; double mult/div
    is correctly rounded so both engines agree bit-for-bit), LN is the
    q_entropy precedent, and the cell terms round(9) → DECIMAL so the
    cross-cell sum is ORDER-FREE; mi_nats rides a full-frame window —
    every cell row carries the table's MI (q_control_chart shape)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    )
    m = cell.select(
        "segment",
        "priority",
        "n_xy",
        F.sum("n_xy")
        .over(Window.partitionBy("segment"))
        .cast("long")
        .alias("n_x"),
        F.sum("n_xy")
        .over(Window.partitionBy("priority"))
        .cast("long")
        .alias("n_y"),
        F.sum("n_xy")
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    ratio = (F.col("n_xy").cast("double") * F.col("n").cast("double")) / (
        F.col("n_x").cast("double") * F.col("n_y").cast("double")
    )
    terms = m.select(
        "segment",
        "priority",
        "n_xy",
        F.round(F.log(ratio), 6).alias("pmi"),
        F.round(
            (F.col("n_xy").cast("double") / F.col("n")) * F.log(ratio), 9
        ).alias("term"),
    )
    return terms.select(
        "segment",
        "priority",
        "n_xy",
        "pmi",
        F.round(
            F.sum(F.col("term").cast("decimal(28,9)"))
            .over(Window.partitionBy())
            .cast("double"),
            6,
        ).alias("mi_nats"),
    ).drop("term")


# ========================================================================
# q_dedup_containment — directional shingle containment (12th dedup form)
# ========================================================================


@register(
    "q_dedup_containment",
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
freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
kept AS (
  SELECT s.doc_id, s.source, s.shingle FROM sh s JOIN freq f USING (shingle)
  WHERE f.df <= 1000
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS common
  FROM kept a JOIN kept b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
dirs AS (
  SELECT p.id1 AS contained, p.id2 AS container, p.common, s1.sz AS set_sz
  FROM pairs p JOIN sizes s1 ON p.id1 = s1.doc_id
  UNION ALL
  SELECT p.id2, p.id1, p.common, s2.sz
  FROM pairs p JOIN sizes s2 ON p.id2 = s2.doc_id
)
SELECT contained, container, common, CAST(set_sz AS BIGINT) AS set_sz,
       ROUND(CAST(common AS DOUBLE) / set_sz, 9) AS containment
FROM dirs
WHERE 5 * common >= 3 * set_sz
""",
)
def q_dedup_containment(spark, sf_dir):
    """Directional shingle-containment near-dup pairs (|Sa∩Sb|/|Sa| ≥
    0.6) — the ASYMMETRIC dedup form (Broder's containment next to
    resemblance): a short document quoted wholesale inside a long one
    has tiny Jaccard (q_dedup_ngram_jaccard misses it) but containment
    ≈ 1.  Twelfth dedup form; complements q_dedup_substring (which
    finds the covered SPANS, not the doc pairs).

    Same inverted-index + source-blocking + max_df=1000 hot-shingle
    cap shape as the Jaccard keys (denominators keep FULL set sizes);
    each undirected co-shingle pair scores ONCE and fans to ≤2
    directional rows via a 2-element explode.  The 0.6 threshold is a
    RATIONAL tested by integer cross-multiply (5·common ≥ 3·sz) — an
    exact cut on both engines."""
    from .. import llmops

    d = load_table(spark, sf_dir, "documents")
    return llmops.ngram_containment_pairs(
        d, threshold_num=3, threshold_den=5, block_col="source", max_df=1000
    )


# ========================================================================
# q_open_order_backlog — daily open-order backlog (interval stabbing)
# ========================================================================


@register(
    "q_open_order_backlog",
    oracle="""
WITH po AS (
  SELECT o.o_orderkey,
         EPOCH_US(o.o_orderdate) // 86400000000 AS s,
         MAX(EPOCH_US(l.l_shipdate) // 86400000000) AS e
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
d AS (
  SELECT s AS dayidx, CAST(COUNT(*) AS BIGINT) AS op, CAST(0 AS BIGINT) AS cl
  FROM po GROUP BY 1
  UNION ALL
  SELECT e + 1, 0, CAST(COUNT(*) AS BIGINT) FROM po GROUP BY e + 1
),
dd AS (
  SELECT dayidx, CAST(SUM(op) AS BIGINT) AS op, CAST(SUM(cl) AS BIGINT) AS cl
  FROM d GROUP BY 1
),
span AS (SELECT MIN(s) AS lo, MAX(e) + 1 AS hi FROM po),
grid AS (SELECT UNNEST(GENERATE_SERIES(lo, hi)) AS dayidx FROM span)
SELECT g.dayidx,
       COALESCE(dd.op, 0) AS n_opened,
       COALESCE(dd.cl, 0) AS n_closed,
       CAST(SUM(COALESCE(dd.op, 0) - COALESCE(dd.cl, 0))
            OVER (ORDER BY g.dayidx) AS BIGINT) AS backlog
FROM grid g LEFT JOIN dd ON g.dayidx = dd.dayidx
""",
)
def q_open_order_backlog(spark, sf_dir):
    """Daily open-order backlog curve — interval stabbing ("how many
    orders were open on day d"): an order is open from its order date
    through its LAST LINEITEM SHIP DATE (the unshipped-work backlog; this fixture carries no receipt date).  The ops-analytics
    companion to q_conversion_lag (backlog level vs latency
    distribution).

    The naive form — join every order interval to every day it covers
    — is O(rows × interval_len).  Here each interval contributes TWO
    delta rows (+1 at start, −1 at end+1; one explode), deltas
    aggregate map-side to the CALENDAR-BOUNDED day grain, and the
    backlog is one running sum over that grid — at 100 TB the only
    full-data stages are the orders▷lineitem orderkey join
    (q_star_agg's one fact-fact shuffle) and the delta aggregation.
    The day grid comes from explode(sequence(lo, hi)) so zero-traffic
    days still carry their backlog level; the cumulative window rides
    the bounded grid (single-partition by construction; the day grain
    cannot grow with volume — scalable_cumsum would be the swap if it
    could)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s_day = F.floor(
        epoch_us(o, "o_orderdate") / F.lit(86_400_000_000)
    ).alias("s")
    e_day = F.floor(epoch_us(li, "l_shipdate") / F.lit(86_400_000_000))
    po = (
        o.select(F.col("o_orderkey").alias("okey"), s_day)
        .join(
            li.groupBy(F.col("l_orderkey").alias("okey")).agg(
                F.max(e_day).alias("e")
            ),
            "okey",
        )
    )
    deltas = po.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("dayidx"),
                    F.lit(1).alias("op"),
                    F.lit(0).alias("cl"),
                ),
                F.struct(
                    (F.col("e") + 1).alias("dayidx"),
                    F.lit(0).alias("op"),
                    F.lit(1).alias("cl"),
                ),
            )
        ).alias("d")
    ).select("d.dayidx", "d.op", "d.cl")
    dd = deltas.groupBy("dayidx").agg(
        F.sum("op").cast("long").alias("op"),
        F.sum("cl").cast("long").alias("cl"),
    )
    grid = po.agg(
        F.min("s").alias("lo"), (F.max("e") + 1).alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("dayidx"))
    g = grid.join(dd, "dayidx", "left").select(
        "dayidx",
        F.coalesce(F.col("op"), F.lit(0)).cast("long").alias("n_opened"),
        F.coalesce(F.col("cl"), F.lit(0)).cast("long").alias("n_closed"),
    )
    w = Window.orderBy("dayidx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select(
        "dayidx",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("long")
        .alias("backlog"),
    )


# ========================================================================
# q_price_volume_mix — price/volume revenue bridge between two years
# ========================================================================


@register(
    "q_price_volume_mix",
    oracle="""
WITH f AS (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM l.l_shipdate) AS yr,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE EXTRACT(YEAR FROM l.l_shipdate) IN (1997, 1998)
),
g AS (
  SELECT nation,
         CAST(SUM(CASE WHEN yr = 1997 THEN qty ELSE 0 END) AS BIGINT) AS q1,
         CAST(SUM(CASE WHEN yr = 1998 THEN qty ELSE 0 END) AS BIGINT) AS q2,
         CAST(SUM(CASE WHEN yr = 1997 THEN cents ELSE 0 END) AS BIGINT) AS r1,
         CAST(SUM(CASE WHEN yr = 1998 THEN cents ELSE 0 END) AS BIGINT) AS r2
  FROM f GROUP BY nation
  HAVING q1 > 0 AND q2 > 0
)
SELECT nation, q1 AS qty1, q2 AS qty2,
       CAST(r1 AS DOUBLE) / 100.0 AS rev1_usd,
       CAST(r2 AS DOUBLE) / 100.0 AS rev2_usd,
       CAST(r2 - r1 AS DOUBLE) / 100.0 AS delta_usd,
       ROUND(CAST(q2 - q1 AS DOUBLE) * (CAST(r1 AS DOUBLE) / q1) / 100.0, 2)
         AS volume_effect_usd,
       ROUND((CAST(r2 AS DOUBLE) / q2 - CAST(r1 AS DOUBLE) / q1)
             * CAST(q2 AS DOUBLE) / 100.0, 2) AS price_effect_usd
FROM g
""",
)
def q_price_volume_mix(spark, sf_dir):
    """Price/volume revenue bridge per supplier nation between 1997 and
    1998 — the FP&A variance decomposition: ΔR = (q₂−q₁)·p̄₁ (volume
    effect) + (p̄₂−p̄₁)·q₂ (price effect), which telescopes exactly to
    rev2−rev1 in real arithmetic.

    One scan of the WHERE-pruned fact (year predicate pushes to the
    parquet scan), supplier/nation broadcast, conditional BIGINT sums
    pivot the two periods on ONE chain (q_topk_movers rule — a branch
    self-join would re-execute the join per period); nations missing
    a period are excluded (a bridge needs both endpoints — the HAVING
    mirrors it).  Quantities and gross cents are exact integers; the
    average prices are single correctly-rounded double divisions and
    the two effects round(2) at ≤11 total digits (§8.14)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    yr = F.year("l_shipdate")
    # range predicate on the RAW column (not year(col)) so it reaches
    # the parquet scan as a PushedFilter — year() is a function of the
    # column and would scan every row group
    in_span = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    f = (
        li.filter(in_span)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            yr.alias("yr"),
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    g = (
        f.groupBy("nation")
        .agg(
            F.sum(F.when(F.col("yr") == 1997, F.col("qty")).otherwise(0))
            .cast("long")
            .alias("q1"),
            F.sum(F.when(F.col("yr") == 1998, F.col("qty")).otherwise(0))
            .cast("long")
            .alias("q2"),
            F.sum(F.when(F.col("yr") == 1997, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("r1"),
            F.sum(F.when(F.col("yr") == 1998, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("r2"),
        )
        .filter((F.col("q1") > 0) & (F.col("q2") > 0))
    )
    p1 = F.col("r1").cast("double") / F.col("q1")
    p2 = F.col("r2").cast("double") / F.col("q2")
    return g.select(
        "nation",
        F.col("q1").alias("qty1"),
        F.col("q2").alias("qty2"),
        (F.col("r1").cast("double") / F.lit(100.0)).alias("rev1_usd"),
        (F.col("r2").cast("double") / F.lit(100.0)).alias("rev2_usd"),
        ((F.col("r2") - F.col("r1")).cast("double") / F.lit(100.0)).alias(
            "delta_usd"
        ),
        F.round(
            (F.col("q2") - F.col("q1")).cast("double") * p1 / F.lit(100.0),
            2,
        ).alias("volume_effect_usd"),
        F.round(
            (p2 - p1) * F.col("q2").cast("double") / F.lit(100.0), 2
        ).alias("price_effect_usd"),
    )


# ========================================================================
# q_growth_accounting — weekly new/retained/resurrected/churned users
# ========================================================================


@register(
    "q_growth_accounting",
    oracle="""
WITH um AS (
  SELECT DISTINCT user_id,
         (EPOCH_US(ts) // 86400000000) // 7 AS wk
  FROM events
),
lagd AS (
  SELECT user_id, wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
         LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
  FROM um
),
act AS (
  SELECT wk,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN prev = wk - 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < wk - 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM lagd GROUP BY wk
),
mx AS (SELECT MAX(wk) AS maxwk FROM um),
ch AS (
  SELECT wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM lagd, mx
  WHERE (nxt IS NULL OR nxt > wk + 1) AND wk + 1 <= mx.maxwk
  GROUP BY wk + 1
)
SELECT CAST(a.wk AS BIGINT) AS week,
       a.n_active, a.n_new, a.n_retained, a.n_resurrected,
       COALESCE(c.n_churned, 0) AS n_churned
FROM act a LEFT JOIN ch c ON a.wk = c.wk
""",
)
def q_growth_accounting(spark, sf_dir):
    """Weekly user growth accounting over events: every active user is
    exactly one of NEW (first week), RETAINED (active the previous
    week), RESURRECTED (active before, but not the previous week);
    CHURNED counts users active in w−1 and absent in w — the standard
    growth decomposition behind "where did the actives come from"
    (complements q_retention_cohorts / q_new_vs_returning, which
    answer the cohort-curve and two-way splits).

    One distinct to the (user, week) grain, lag/lead over each user's
    week sequence (user_id-partitioned windows — full key cardinality,
    no low-cardinality ceiling), then two bounded aggregates full-join
    on the week grid.  Churn counts once per activity GAP (a user
    churning and resurrecting later contributes to both censuses) and
    is clipped at the corpus' last week so nobody churns out of the
    observation window.  Weeks are PURE INTEGER epoch-day div 7 via
    io.epoch_us (no calendar extraction — the fixture determinism
    lesson: derive event grains from epoch-µs integer math); all
    counts exact integers."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(epoch_us(ev, "ts") / F.lit(86_400_000_000)).cast("long")
    um = ev.select(
        "user_id", F.floor(day / F.lit(7)).cast("long").alias("wk")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("wk")
    lagd = um.select(
        "user_id",
        "wk",
        F.lag("wk").over(wu).alias("prev"),
        F.lead("wk").over(wu).alias("nxt"),
    )
    act = lagd.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(F.when(F.col("prev").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("prev") == F.col("wk") - 1, 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev").isNotNull()
                & (F.col("prev") < F.col("wk") - 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    maxwk = um.agg(F.max("wk").alias("maxwk"))
    ch = (
        lagd.crossJoin(F.broadcast(maxwk))
        .filter(
            (F.col("nxt").isNull() | (F.col("nxt") > F.col("wk") + 1))
            & (F.col("wk") + 1 <= F.col("maxwk"))
        )
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    out = act.join(ch, "wk", "left")
    return out.select(
        F.col("wk").cast("long").alias("week"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0))
        .cast("long")
        .alias("n_churned"),
    )
