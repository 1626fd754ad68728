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
    )


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
    could).  The day-grain delta table `dd` is persisted and BOTH the
    grid bounds and the calendar join read it (round-8 ADVICE: deltas
    and grid were previously two lineage branches of `po`, so the one
    fact-fact join executed twice); bounds are exact — min(dayidx)
    over open deltas = min(s), max(dayidx) over close deltas =
    max(e)+1 — with no shipdate≥orderdate assumption."""
    out, invariants = open_order_backlog_lazy(spark, sf_dir)
    try:
        # bounded (day grain): eager localCheckpoint materializes while
        # dd is still cached, so the unpersist can't trigger a recompute
        return out.localCheckpoint(eager=True)
    finally:
        for inv in invariants:
            inv.unpersist()


def open_order_backlog_lazy(spark, sf_dir):
    """Lazy dataflow for q_open_order_backlog: returns (out, [dd])
    with dd persisted and NOT yet unpersisted, and no checkpoint — the
    plan gate in tests/test_plans.py reads the executed plan off `out`
    (the registered key's own return is an ExistingRDD scan after the
    eager localCheckpoint, same split as pagerank_lazy).  Callers must
    unpersist every frame in the second element."""
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
    ).persist()
    grid = dd.agg(
        F.min(F.when(F.col("op") > 0, F.col("dayidx"))).alias("lo"),
        F.max(F.when(F.col("cl") > 0, F.col("dayidx"))).alias("hi"),
    ).select(F.explode(F.sequence("lo", "hi")).alias("dayidx"))
    g = grid.join(dd, "dayidx", "left").select(
        "dayidx",
        F.coalesce(F.col("op"), F.lit(0)).cast("long").alias("n_opened"),
        F.coalesce(F.col("cl"), F.lit(0)).cast("long").alias("n_closed"),
    )
    w = Window.orderBy("dayidx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = g.select(
        "dayidx",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("long")
        .alias("backlog"),
    )
    return out, [dd]


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
SELECT CAST(COALESCE(a.wk, c.wk) AS BIGINT) AS week,
       COALESCE(a.n_active, 0) AS n_active,
       COALESCE(a.n_new, 0) AS n_new,
       COALESCE(a.n_retained, 0) AS n_retained,
       COALESCE(a.n_resurrected, 0) AS n_resurrected,
       COALESCE(c.n_churned, 0) AS n_churned
FROM act a FULL OUTER JOIN ch c ON a.wk = c.wk
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
    # FULL outer: a week where everyone churned and nobody was active
    # has a churn row but no active row — a left join would silently
    # drop that census (round-7 review finding)
    out = act.join(ch, "wk", "full")
    zero = F.lit(0).cast("long")
    return out.select(
        F.col("wk").cast("long").alias("week"),
        F.coalesce(F.col("n_active"), zero).alias("n_active"),
        F.coalesce(F.col("n_new"), zero).alias("n_new"),
        F.coalesce(F.col("n_retained"), zero).alias("n_retained"),
        F.coalesce(F.col("n_resurrected"), zero).alias("n_resurrected"),
        F.coalesce(F.col("n_churned"), zero).alias("n_churned"),
    )


# ========================================================================
# q_js_divergence — pairwise Jensen–Shannon divergence between sources
# ========================================================================


@register(
    "q_js_divergence",
    oracle="""
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS tok
  FROM documents
),
tc AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY source, tok
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY source),
common AS (
  SELECT a.source AS source1, b.source AS source2,
         a.c AS c1, b.c AS c2, t1.n AS n1, t2.n AS n2
  FROM tc a
  JOIN tc b ON a.tok = b.tok AND a.source < b.source
  JOIN tot t1 ON a.source = t1.source
  JOIN tot t2 ON b.source = t2.source
),
agg AS (
  SELECT source1, source2,
         CAST(COUNT(*) AS BIGINT) AS n_common_tokens,
         SUM(CAST(ROUND(
           (CAST(c1 AS DOUBLE) / n1)
           * LN((2.0 * (CAST(c1 AS DOUBLE) / n1))
                / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)), 9)
           AS DECIMAL(28,9))) AS sp,
         SUM(CAST(ROUND(
           (CAST(c2 AS DOUBLE) / n2)
           * LN((2.0 * (CAST(c2 AS DOUBLE) / n2))
                / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)), 9)
           AS DECIMAL(28,9))) AS sq,
         SUM(CAST(ROUND(CAST(c1 AS DOUBLE) / n1, 9) AS DECIMAL(28,9)))
           AS pmass,
         SUM(CAST(ROUND(CAST(c2 AS DOUBLE) / n2, 9) AS DECIMAL(28,9)))
           AS qmass
  FROM common GROUP BY source1, source2
),
grid AS (
  SELECT s1.source AS source1, s2.source AS source2
  FROM tot s1 JOIN tot s2 ON s1.source < s2.source
)
SELECT g.source1, g.source2,
       COALESCE(a.n_common_tokens, 0) AS n_common_tokens,
       ROUND(0.5 * (CAST(COALESCE(a.sp, 0) AS DOUBLE)
                    + (1.0 - CAST(COALESCE(a.pmass, 0) AS DOUBLE)) * LN(2.0))
           + 0.5 * (CAST(COALESCE(a.sq, 0) AS DOUBLE)
                    + (1.0 - CAST(COALESCE(a.qmass, 0) AS DOUBLE)) * LN(2.0)),
           6) AS jsd_nats
FROM grid g LEFT JOIN agg a
  ON g.source1 = a.source1 AND g.source2 = a.source2
""",
)
def q_js_divergence(spark, sf_dir):
    """Pairwise Jensen–Shannon divergence (nats) between the token
    distributions of every source pair — the bounded, symmetric
    domain-shift measure behind corpus-mix dashboards (KL is infinite
    on disjoint support; JSD ≤ ln 2).  Complements
    q_source_vocab_overlap (set overlap) with a MASS-weighted one.

    Tokens exclusive to one side never join, but their JSD
    contribution has a CLOSED FORM — p·ln(2p/(p+0)) = p·ln 2 — so the
    exclusive mass is (1 − Σ_common p) and only CO-OCCURRING tokens
    need the join: per-token fan-out is bounded by C(S,2) PER TOKEN
    (the q_source_vocab_overlap rule — hot tokens cannot blow up) and
    no outer join materializes each pair's full union vocabulary.
    Counts and totals are exact integers; per-token terms run
    identical double algebra and round(9) → DECIMAL so the cross-token
    sums are ORDER-FREE (q_entropy precedent); the exclusive-mass
    correction and final ×0.5 happen once per pair."""
    d = load_table(spark, sf_dir, "documents")
    from .. import llmops

    tc = (
        d.select(
            "source",
            F.explode(F.split(llmops.norm_text("text"), " ")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # the token-count table feeds BOTH sides of the self-join plus the
    # totals (which feed two broadcasts and the pair grid) — persist so
    # the heaviest stage (scan+explode+groupBy) runs once, not once per
    # lineage branch (the q_adamic_adar self-join discipline; round-7
    # review finding)
    tc = tc.persist()
    tot = tc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a, b = tc.alias("a"), tc.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source1"),
            F.col("b.source").alias("source2"),
            F.col("a.c").alias("c1"),
            F.col("b.c").alias("c2"),
        )
        .join(
            F.broadcast(tot.select(F.col("source").alias("source1"), F.col("n").alias("n1"))),
            "source1",
        )
        .join(
            F.broadcast(tot.select(F.col("source").alias("source2"), F.col("n").alias("n2"))),
            "source2",
        )
    )
    p = F.col("c1").cast("double") / F.col("n1")
    q = F.col("c2").cast("double") / F.col("n2")
    agg = common.groupBy("source1", "source2").agg(
        F.count(F.lit(1)).cast("long").alias("n_common_tokens"),
        F.sum(
            F.round(p * F.log(F.lit(2.0) * p / (p + q)), 9).cast(
                "decimal(28,9)"
            )
        ).alias("sp"),
        F.sum(
            F.round(q * F.log(F.lit(2.0) * q / (p + q)), 9).cast(
                "decimal(28,9)"
            )
        ).alias("sq"),
        F.sum(F.round(p, 9).cast("decimal(28,9)")).alias("pmass"),
        F.sum(F.round(q, 9).cast("decimal(28,9)")).alias("qmass"),
    )
    ln2 = F.log(F.lit(2.0))
    # pair GRID, not just co-occurring pairs: two sources with DISJOINT
    # vocabularies never survive the token join, but their JSD is
    # exactly ln 2 — the maximal-divergence row a corpus-mix dashboard
    # most needs (round-7 review finding).  Sources are bounded, so the
    # grid is a broadcast self-join of the totals table.
    s1 = tot.select(F.col("source").alias("source1"))
    s2 = tot.select(F.col("source").alias("source2"))
    grid = s1.join(F.broadcast(s2), F.col("source1") < F.col("source2"))
    j = grid.join(agg, ["source1", "source2"], "left")
    zd = F.lit(0).cast("decimal(28,9)")
    out = j.select(
        "source1",
        "source2",
        F.coalesce(F.col("n_common_tokens"), F.lit(0))
        .cast("long")
        .alias("n_common_tokens"),
        F.round(
            F.lit(0.5)
            * (
                F.coalesce(F.col("sp"), zd).cast("double")
                + (
                    F.lit(1.0)
                    - F.coalesce(F.col("pmass"), zd).cast("double")
                )
                * ln2
            )
            + F.lit(0.5)
            * (
                F.coalesce(F.col("sq"), zd).cast("double")
                + (
                    F.lit(1.0)
                    - F.coalesce(F.col("qmass"), zd).cast("double")
                )
                * ln2
            ),
            6,
        ).alias("jsd_nats"),
    )
    # bounded (C(S,2) rows): eager localCheckpoint materializes while
    # tc is cached, so unpersist can't trigger a recompute
    try:
        return out.localCheckpoint(eager=True)
    finally:
        tc.unpersist()


# ========================================================================
# q_psi_drift — population stability index of order value, 1997 → 1998
# ========================================================================


@register(
    "q_psi_drift",
    oracle="""
WITH f AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
),
cuts AS (
  SELECT UNNEST(quantile_cont(cents,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS cut
  FROM f WHERE yr = 1997
),
binned AS (
  SELECT yr,
         1 + (SELECT COUNT(*) FROM cuts WHERE cut < f.cents) AS bin
  FROM f
),
g AS (
  SELECT bin,
         CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN yr = 1998 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
),
t AS (
  SELECT bin, n_ref, n_cur,
         CAST(n_ref AS DOUBLE) / NULLIF(SUM(n_ref) OVER (), 0) AS p_ref,
         CAST(n_cur AS DOUBLE) / NULLIF(SUM(n_cur) OVER (), 0) AS p_cur
  FROM g
),
terms AS (
  SELECT bin, n_ref, n_cur,
         ROUND(p_ref, 9) AS p_ref, ROUND(p_cur, 9) AS p_cur,
         CASE WHEN n_ref > 0 AND n_cur > 0
              THEN ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 9)
              ELSE NULL END AS term
  FROM t
)
SELECT bin, n_ref, n_cur, p_ref, p_cur, term AS psi_term,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) OVER () AS DOUBLE), 6)
         AS psi
FROM terms
""",
)
def q_psi_drift(spark, sf_dir):
    """Population stability index of the order-value distribution
    between 1997 (reference) and 1998 (current) over reference-decile
    bins — the standard ML-monitoring drift score (PSI < 0.1 stable,
    > 0.25 shifted), beside q_ks_test's distribution test.

    Bin edges are EXACT interpolated deciles of the reference year
    (Spark percentile ≡ DuckDB quantile_cont — the q_iqr_outliers
    contract; approx_percentile is the documented 100 TB swap); both
    years then bin through ONE broadcast fan-out join against the
    9-row cut table (bin = 1 + #cuts strictly below — identical cut
    doubles make the comparison consistent even on boundary ties).
    Counts are exact integers, shares and terms run identical double
    algebra, terms round(9) → DECIMAL so the cross-bin sum is
    order-free, and every bin row carries the table PSI via a
    full-frame window (q_control_chart shape).  Bins empty in either
    year are excluded from the sum (the standard finite-PSI
    convention), mirrored in both engines."""
    o = load_table(spark, sf_dir, "orders")
    in_span = (
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ) & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    f = o.filter(in_span).select(
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cuts = (
        f.filter(F.col("yr") == 1997)
        .agg(
            F.expr(
                "percentile(cents, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ).alias("cuts")
        )
        .select(F.explode("cuts").alias("cut"))
    )
    # count rows per (yr, cents) FIRST, then fan the value grain out
    # against the 9 cuts — the ×9 join never touches row multiplicity
    vc = f.groupBy("yr", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    binned = (
        # LEFT join on an always-true condition, not crossJoin: with an
        # EMPTY reference year (no cuts) a cross join would annihilate
        # every row including the current-year census, while the
        # oracle's correlated COUNT puts everything in bin 1 — the left
        # join's null cut falls to otherwise(0) and matches (round-7
        # review finding)
        vc.join(F.broadcast(cuts), F.lit(True), "left")
        .groupBy("yr", "cents", "m")
        .agg(
            F.sum(F.when(F.col("cut") < F.col("cents"), 1).otherwise(0))
            .cast("long")
            .alias("below")
        )
        .select("yr", "m", (F.lit(1) + F.col("below")).alias("bin"))
    )
    g = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("yr") == 1997, F.col("m")).otherwise(0))
        .cast("long")
        .alias("n_ref"),
        F.sum(F.when(F.col("yr") == 1998, F.col("m")).otherwise(0))
        .cast("long")
        .alias("n_cur"),
    )
    wall = Window.partitionBy()
    # NULL share when a period is entirely absent (mirrors the oracle's
    # NULLIF; a bare division trips ANSI divide-by-zero)
    tref = F.sum("n_ref").over(wall)
    tcur = F.sum("n_cur").over(wall)
    p_ref = F.when(tref > 0, F.col("n_ref").cast("double") / tref)
    p_cur = F.when(tcur > 0, F.col("n_cur").cast("double") / tcur)
    t = g.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 9).alias("p_ref"),
        F.round(p_cur, 9).alias("p_cur"),
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 9),
        ).alias("term"),
    )
    return t.select(
        "bin",
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        F.col("term").alias("psi_term"),
        F.round(
            F.sum(F.col("term").cast("decimal(28,9)"))
            .over(wall)
            .cast("double"),
            6,
        ).alias("psi"),
    )


# ========================================================================
# q_stratified_kfold — deterministic hash folds, stratified by source
# ========================================================================


@register(
    "q_stratified_kfold",
    oracle="""
WITH h AS (
  SELECT doc_id, source, n_chars,
         ASCII(SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
  FROM documents
),
f AS (
  SELECT doc_id, source, n_chars,
         (CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END) % 4 AS fold
  FROM h
)
SELECT source, CAST(fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM f GROUP BY source, fold
""",
)
def q_stratified_kfold(spark, sf_dir):
    """Deterministic stratified k-fold assignment (k=4, strata =
    source): fold = first MD5 hex digit of the document id, mod 4 —
    reproducible across engines, runs, and cluster sizes (rand() is
    none of those; q_train_test_split's hash-split discipline extended
    to folds), with per-(source, fold) balance census the training
    job reads before trusting the split.

    MD5 of the DECIMAL STRING id is the cross-engine contract (both
    engines hash the same bytes); the hex digit maps through the same
    explicit CASE on ASCII codes on both sides (Spark conv() and a
    DuckDB hex parse could disagree on case/width; ASCII arithmetic
    cannot), and 16 % 4 = 0 keeps the digit→fold map unbiased.  One
    map-side-combinable aggregate; the mean is a single unrounded
    division of exact integers."""
    d = load_table(spark, sf_dir, "documents")
    a = F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
    fold = (
        F.when(a >= 97, a - 87).otherwise(a - 48) % 4
    ).cast("long")
    return (
        d.select("doc_id", "source", "n_chars", fold.alias("fold"))
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "mean_chars"
            ),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
    )


# ========================================================================
# q_embedding_outliers — farthest-from-centroid census per label
# ========================================================================


@register(
    "q_embedding_outliers",
    oracle="""
WITH x AS (
  SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
         UNNEST(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
cent AS (
  SELECT label, dim,
         CAST(SUM(CAST(ROUND(v, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / COUNT(*) AS m
  FROM x GROUP BY label, dim
),
d2 AS (
  SELECT x.vec_id, x.label,
         SUM(CAST(ROUND((x.v - c.m) * (x.v - c.m), 9)
                  AS DECIMAL(28,9))) AS dist2_dec
  FROM x JOIN cent c ON x.label = c.label AND x.dim = c.dim
  GROUP BY x.vec_id, x.label
),
r AS (
  -- rank on the DECIMAL sum, matching the Spark side: a double cast
  -- before ranking could collapse 1e-9 differences at magnitudes
  -- > ~4.5e6 and tie-break differently (round-7 review finding)
  SELECT label, vec_id, dist2_dec,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY dist2_dec DESC, vec_id) AS rn
  FROM d2
)
SELECT label, CAST(rn AS BIGINT) AS rn, vec_id,
       ROUND(CAST(dist2_dec AS DOUBLE), 6) AS dist2
FROM r WHERE rn <= 5
""",
)
def q_embedding_outliers(spark, sf_dir):
    """Top-5 farthest-from-centroid vectors per label (squared L2 to
    the label mean) — the embedding-QA screen for mislabeled /
    corrupt vectors next to q_embedding_centroid (which reports the
    centroids themselves).

    One posexplode to (label, dim, x); centroids aggregate at
    (labels × dims) cardinality (round(9) → DECIMAL means, the
    q_embedding_centroid contract) and BROADCAST back onto the
    component stream; per-vector distances are Σ over dims of
    (x−m)² with each term round(9) → DECIMAL so the 64-term sum is
    ORDER-FREE (a raw double sum would drift with partitioning);
    DECIMAL distances make the per-label top-5 rank exact, with
    vec_id as the total tie-break.  At 100 TB: no vector shuffles
    whole — components flow through two map-side-combinable
    aggregates and one broadcast join; the rank is per-label top-k
    (q_topk_per_group shape)."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim0", "v0")
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("v0").cast("double").alias("v"),
    )
    cent = x.groupBy("label", "dim").agg(
        (
            F.sum(F.round(F.col("v"), 9).cast("decimal(28,9)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("m")
    )
    d2 = (
        x.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.round(
                    (F.col("v") - F.col("m")) * (F.col("v") - F.col("m")), 9
                ).cast("decimal(28,9)")
            ).alias("dist2_dec")
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist2_dec").desc(), "vec_id"
    )
    return (
        d2.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select(
            "label",
            "rn",
            "vec_id",
            F.round(F.col("dist2_dec").cast("double"), 6).alias("dist2"),
        )
    )


# ========================================================================
# q_survival_curve — empirical activity-span survival over users
# ========================================================================


@register(
    "q_survival_curve",
    oracle="""
WITH uw AS (
  SELECT user_id, (EPOCH_US(ts) // 86400000000) // 7 AS wk
  FROM events
),
span AS (
  SELECT user_id, MAX(wk) - MIN(wk) AS span FROM uw GROUP BY user_id
),
sc AS (
  SELECT span, CAST(COUNT(*) AS BIGINT) AS c FROM span GROUP BY span
),
grid AS (
  SELECT UNNEST(GENERATE_SERIES(0, (SELECT MAX(span) FROM span)))
    AS week_offset
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM span)
SELECT g.week_offset,
       CAST((SELECT SUM(c) FROM sc WHERE sc.span >= g.week_offset)
            AS BIGINT) AS n_surviving,
       CAST((SELECT SUM(c) FROM sc WHERE sc.span >= g.week_offset)
            AS DOUBLE) / n.n_users AS survival
FROM grid g, n
""",
)
def q_survival_curve(spark, sf_dir):
    """Empirical survival function of user ACTIVITY SPAN (weeks between
    first and last event): S(w) = share of users still active ≥ w weeks
    after their first event — the lifetime curve product teams read
    next to q_retention_cohorts (which conditions on calendar cohorts;
    this marginalizes them out).  No Kaplan–Meier product is needed:
    with full observation of the fixture window the empirical form is
    exact, integer-countable, and order-free (a KM running product of
    doubles would be neither).

    Spans aggregate at user grain (one shuffle), collapse to the
    BOUNDED span grain, and the survival counts are one reverse
    running sum over the ≤(max-span) grid; survival = single division
    of exact integers, left unrounded (identical quotient both
    engines — q_embedding_centroid rule)."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.floor(
        F.floor(epoch_us(ev, "ts") / F.lit(86_400_000_000)) / F.lit(7)
    ).cast("long")
    span = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg((F.max("wk") - F.min("wk")).alias("span"))
    )
    sc = span.groupBy("span").agg(F.count(F.lit(1)).cast("long").alias("c"))
    grid = sc.agg(F.max("span").alias("mx")).select(
        F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("week_offset")
    )
    n = span.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    w_rev = (
        Window.orderBy(F.col("span").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    surv = sc.select(
        "span", F.sum("c").over(w_rev).cast("long").alias("n_surviving")
    )
    return (
        grid.join(surv, grid.week_offset == surv.span, "left")
        .crossJoin(F.broadcast(n))
        .select(
            "week_offset",
            # a week_offset with no exact span match still has survivors
            # (those with larger spans) — fill from the nearest larger
            # span via a running max over descending week_offset
            "n_surviving",
            "n_users",
        )
        .withColumn(
            "n_surviving",
            F.coalesce(
                F.last("n_surviving", ignorenulls=True).over(
                    Window.orderBy(F.col("week_offset").desc()).rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select(
            "week_offset",
            "n_surviving",
            (F.col("n_surviving").cast("double") / F.col("n_users")).alias(
                "survival"
            ),
        )
    )


# ========================================================================
# q_order_cycle_time — order→ship latency distribution per priority
# ========================================================================


@register(
    "q_order_cycle_time",
    oracle="""
WITH lag AS (
  SELECT o.o_orderpriority AS priority,
         MIN(EPOCH_US(l.l_shipdate) // 86400000000)
           - ANY_VALUE(EPOCH_US(o.o_orderdate) // 86400000000)
           AS d_first,
         MAX(EPOCH_US(l.l_shipdate) // 86400000000)
           - ANY_VALUE(EPOCH_US(o.o_orderdate) // 86400000000)
           AS d_full
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(d_first) AS DOUBLE) / COUNT(*) AS mean_days_first,
       quantile_cont(d_first, 0.5) AS p50_first,
       quantile_cont(d_first, 0.9) AS p90_first,
       CAST(SUM(d_full) AS DOUBLE) / COUNT(*) AS mean_days_full,
       quantile_cont(d_full, 0.5) AS p50_full,
       quantile_cont(d_full, 0.9) AS p90_full
FROM lag GROUP BY priority
""",
)
def q_order_cycle_time(spark, sf_dir):
    """Order fulfilment cycle times per priority: days from order to
    FIRST ship and to FULL ship (last lineitem), with mean / exact
    p50 / p90 — the ops-latency companion to q_conversion_lag (user
    funnel) and q_open_order_backlog (level): does priority actually
    buy faster fulfilment?

    One fact-fact orderkey join (q_star_agg's only full-data shuffle)
    aggregates to order grain; lags are exact integer day diffs
    (io.epoch_us floor-division); the ≤5-row priority table carries
    means as single unrounded divisions of exact integers and EXACT
    interpolated percentiles (Spark percentile ≡ DuckDB quantile_cont,
    the q_iqr_outliers contract; approx_percentile is the documented
    100 TB swap)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    oday = F.floor(epoch_us(o, "o_orderdate") / F.lit(86_400_000_000))
    sday = F.floor(epoch_us(li, "l_shipdate") / F.lit(86_400_000_000))
    lag = (
        o.select("o_orderkey", F.col("o_orderpriority").alias("priority"), oday.alias("od"))
        .join(
            li.groupBy("l_orderkey").agg(
                F.min(sday).alias("s1"), F.max(sday).alias("s2")
            ),
            o.o_orderkey == F.col("l_orderkey"),
        )
        .select(
            "priority",
            (F.col("s1") - F.col("od")).cast("long").alias("d_first"),
            (F.col("s2") - F.col("od")).cast("long").alias("d_full"),
        )
    )
    return lag.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.sum("d_first").cast("double") / F.count(F.lit(1))).alias(
            "mean_days_first"
        ),
        F.expr("percentile(d_first, 0.5)").alias("p50_first"),
        F.expr("percentile(d_first, 0.9)").alias("p90_first"),
        (F.sum("d_full").cast("double") / F.count(F.lit(1))).alias(
            "mean_days_full"
        ),
        F.expr("percentile(d_full, 0.5)").alias("p50_full"),
        F.expr("percentile(d_full, 0.9)").alias("p90_full"),
    )


# ========================================================================
# q_adamic_adar — co-purchase link prediction over parts
# ========================================================================


@register(
    "q_adamic_adar",
    oracle="""
WITH basket AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem
),
bs AS (
  SELECT okey, CAST(COUNT(*) AS BIGINT) AS b FROM basket GROUP BY okey
  HAVING COUNT(*) BETWEEN 2 AND 64
),
pairs AS (
  SELECT a.pk AS part1, b.pk AS part2, s.b
  FROM basket a JOIN basket b ON a.okey = b.okey AND a.pk < b.pk
  JOIN bs s ON a.okey = s.okey
),
agg AS (
  SELECT part1, part2,
         CAST(COUNT(*) AS BIGINT) AS n_common_orders,
         SUM(CAST(ROUND(1.0 / LN(CAST(b AS DOUBLE)), 9)
                  AS DECIMAL(28,9))) AS aa_dec
  FROM pairs GROUP BY part1, part2
)
SELECT part1, part2, n_common_orders,
       ROUND(CAST(aa_dec AS DOUBLE), 6) AS aa_score
FROM agg
ORDER BY aa_dec DESC, part1, part2
LIMIT 20
""",
)
def q_adamic_adar(spark, sf_dir):
    """Top-20 part pairs by Adamic–Adar score over the co-order
    bipartite graph: AA(x,y) = Σ over shared orders of 1/ln(basket
    size) — small baskets are strong evidence, mega-baskets weak; the
    link-prediction ranking next to q_assoc_rules' support/confidence
    (which ignores basket informativeness).

    Pair generation fans C(b,2) per order, bounded by the 64-item
    basket cap (ASSOC_MAX_BASKET discipline — mirrored in the oracle's
    HAVING; single-item baskets produce no pairs and ln(1)=0 never
    divides).  Weights follow the LN-term rule (round(9) → DECIMAL) so
    per-pair sums are ORDER-FREE and the DECIMAL score makes the
    top-20 rank exact under the (score, part1, part2) tie chain —
    TakeOrderedAndProject, never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    bs = (
        basket.groupBy("okey")
        .agg(F.count(F.lit(1)).cast("long").alias("b"))
        .filter((F.col("b") >= 2) & (F.col("b") <= 64))
    )
    # the cap must land BEFORE the self-join — joining then filtering
    # would emit C(b,2) rows for a mega-basket first (Catalyst does not
    # reorder inner joins without CBO); and the self-join re-executes
    # its input subtree twice, so the capped basket table is PERSISTED
    # (assoc_rules triangle discipline — measured 3.6 s → 2.7 s at
    # sf0.1: one distinct+cap build instead of two)
    kept = basket.join(bs, "okey").persist()
    try:
        a, b = kept.alias("a"), kept.alias("b")
        pairs = a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.pk") < F.col("b.pk")),
        ).select(
            F.col("a.pk").alias("part1"),
            F.col("b.pk").alias("part2"),
            F.col("a.b").alias("b"),
        )
        agg = pairs.groupBy("part1", "part2").agg(
            F.count(F.lit(1)).cast("long").alias("n_common_orders"),
            F.sum(
                F.round(
                    F.lit(1.0) / F.log(F.col("b").cast("double")), 9
                ).cast("decimal(28,9)")
            ).alias("aa_dec"),
        )
        out = (
            agg.orderBy(F.col("aa_dec").desc(), "part1", "part2")
            .limit(20)
            .select(
                "part1",
                "part2",
                "n_common_orders",
                F.round(F.col("aa_dec").cast("double"), 6).alias(
                    "aa_score"
                ),
            )
        )
        # bounded (20 rows): eager localCheckpoint materializes while
        # kept is still cached, so the unpersist can't trigger a
        # recompute (assoc_rules persist discipline)
        return out.localCheckpoint(eager=True)
    finally:
        kept.unpersist()


# ========================================================================
# q_benjamini_yekutieli — BY-FDR under arbitrary dependence
# ========================================================================

#: Harmonic number H(M) for M = POSSIBLE_PAIRS_M (249,500) — computed
#: ONCE in Python and embedded as the same literal in both engines
#: (a distributed Σ1/i would need the round→DECIMAL dance; a frozen
#: constant cannot drift).  BY = BH with M_eff = M·H(M).
_BY_HARMONIC = 13.004431863082075
_BY_M_EFF = 249_500 * _BY_HARMONIC


from .. import fixtures as fx  # noqa: E402
from .keys_agg_window import _SCORED_CTE  # noqa: E402


@register(
    "q_benjamini_yekutieli",
    oracle=f"""
WITH {fx.contacts_cte()},
{_SCORED_CTE},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p_value, chr1, mid1, mid2) AS rk
  FROM scored
),
q0 AS (
  SELECT *, LEAST(1.0, p_value * {_BY_M_EFF!r} / rk) AS q_raw FROM ranked
)
SELECT chr1, mid1, chr2, mid2, contact_count,
       ROUND(p_value, 9) AS p_value,
       ROUND(MIN(q_raw) OVER (ORDER BY rk DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 9)
         AS by_q_value
FROM q0
""",
)
def q_benjamini_yekutieli(spark, sf_dir):
    """Benjamini–Yekutieli q-values — FDR control under ARBITRARY
    dependence: BH's thresholds shrunk by the harmonic factor
    H(M) = Σ 1/i, i.e. BH computed with M_eff = M·H(M) then the same
    suffix-min (q_i = min_{{j≥i}} min(1, p_j·M_eff/j)).  The
    conservative companion the multiple-testing user reaches for when
    p-values correlate (neighboring genomic bins do) and q_bh_fdr's
    independence assumption is in doubt.

    Same deterministic synthetic p column and operator shape as
    q_bh_fdr (windows.bh_fdr — at 100 TB bh_fdr_scalable is the
    documented swap); H(249,500) is a Python-frozen literal shared by
    both engines."""
    from . import keys_agg_window as kaw

    if kaw.POSSIBLE_PAIRS_M != 249_500:
        raise ValueError(
            "q_benjamini_yekutieli's frozen harmonic H(249500) no longer "
            f"matches POSSIBLE_PAIRS_M={kaw.POSSIBLE_PAIRS_M}; recompute "
            "_BY_HARMONIC/_BY_M_EFF for the new grid (a stale constant "
            "would ship wrong q-values through a PASSING oracle check)"
        )
    c = kaw.fx.fixture_contacts(spark, sf_dir)
    scored = c.withColumn(
        "p_value",
        (
            (
                F.col("mid1") * 31
                + F.col("mid2") * 17
                + F.col("contact_count") * 7919
            )
            % 1000003
        ).cast("double")
        / 1000003.0,
    )
    out = win.bh_fdr(
        scored,
        "p_value",
        m=_BY_M_EFF,
        tiebreak=["chr1", "mid1", "mid2"],
        q_col="by_q_value",
    )
    return out.select(
        "chr1",
        "mid1",
        "chr2",
        "mid2",
        "contact_count",
        F.round("p_value", 9).alias("p_value"),
        F.round("by_q_value", 9).alias("by_q_value"),
    )


# ========================================================================
# q_ljung_box — portmanteau autocorrelation test on daily revenue
# ========================================================================

#: χ²(0.95, df=7) — a GEOMETRY-INDEPENDENT mathematical constant (unlike
#: the BY harmonic, nothing in the fixtures can drift under it), frozen
#: once and shared by both engines.
_LB_CRIT_95_DF7 = 14.067140

_LB_LAGS = 7


@register(
    "q_ljung_box",
    oracle=f"""
WITH d AS (
{_DAILY_SQL}
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM d
),
z AS (
  SELECT dayidx, CAST(st.n * d.cents - st.s AS DECIMAL(19,0)) AS z
  FROM d, st
),
lagged AS (
  SELECT z,
         {", ".join(f"LAG(z, {k}) OVER (ORDER BY dayidx) AS z{k}" for k in range(1, _LB_LAGS + 1))}
  FROM z
),
agg AS (
  SELECT (SELECT n FROM st) AS n,
         SUM(z * z) AS den,
         {", ".join(f"SUM(z * z{k}) AS num{k}" for k in range(1, _LB_LAGS + 1))}
  FROM lagged
),
rows_ AS (
  SELECT a.n, a.den, g.lag,
         CASE g.lag {" ".join(f"WHEN {k} THEN a.num{k}" for k in range(1, _LB_LAGS + 1))} END AS num
  FROM agg a, (SELECT UNNEST(GENERATE_SERIES(1, {_LB_LAGS})) AS lag) g
),
terms AS (
  SELECT n, CAST(lag AS BIGINT) AS lag,
         ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS rho,
         ROUND((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
               * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
               / (n - lag), 12) AS term
  FROM rows_
)
SELECT lag, rho,
       ROUND(n * (n + 2.0)
             * CAST(SUM(CAST(term AS DECIMAL(28,12))) OVER () AS DOUBLE),
             6) AS q_stat,
       (n * (n + 2.0)
        * CAST(SUM(CAST(term AS DECIMAL(28,12))) OVER () AS DOUBLE))
         > {_LB_CRIT_95_DF7!r} AS reject_white_noise
FROM terms
""",
)
def q_ljung_box(spark, sf_dir):
    """Ljung–Box portmanteau test on daily revenue — "is this series
    white noise?": Q = n(n+2)·Σ_k ρ_k²/(n−k) over lags 1..7 against
    χ²(0.95, 7), with the per-lag autocorrelations.  The aggregate
    serial-dependence screen beside q_autocorr (single lags) and
    q_runs_test (sign runs).

    The mean never divides: z_t = n·y_t − Σy keeps centering EXACT
    INTEGER (ρ_k = Σz_t z_{{t−k}} / Σz_t² is invariant to the n²
    scaling), products run in DECIMAL(19)×DECIMAL(19) → DECIMAL(38)
    (int128 on DuckDB — §8 lesson: int64 physical would overflow at
    ~3e25), and the lag windows ride the calendar-bounded day grain.
    ρ and the Q terms are identical double expressions; terms
    round(12) → DECIMAL so the 7-term sum is order-free; the χ²
    critical value is a frozen mathematical literal (no geometry to
    drift under it, unlike the BY harmonic).  Both engines compare
    the SAME unrounded Q expression against it, so the verdict flag
    cannot disagree (q_control_chart rule)."""
    d = _daily_series(spark, sf_dir)
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    z = d.crossJoin(F.broadcast(st)).select(
        "dayidx",
        "n",
        (F.col("n") * F.col("cents") - F.col("s"))
        .cast("decimal(19,0)")
        .alias("z"),
    )
    w = Window.orderBy("dayidx")
    lagged = z.select(
        "n",
        "z",
        *[F.lag("z", k).over(w).alias(f"z{k}") for k in range(1, _LB_LAGS + 1)],
    )
    agg = lagged.groupBy("n").agg(
        F.sum(F.col("z") * F.col("z")).alias("den"),
        *[
            F.sum(F.col("z") * F.col(f"z{k}")).alias(f"num{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    grid = spark.range(1, _LB_LAGS + 1).select(F.col("id").alias("lag"))
    pick = None
    for k in range(1, _LB_LAGS + 1):
        cond = F.when(F.col("lag") == k, F.col(f"num{k}"))
        pick = cond if pick is None else pick.when(
            F.col("lag") == k, F.col(f"num{k}")
        )
    rows_ = agg.crossJoin(F.broadcast(grid)).select(
        "n", "den", F.col("lag").cast("long").alias("lag"), pick.alias("num")
    )
    rho = F.col("num").cast("double") / F.col("den").cast("double")
    terms = rows_.select(
        "n",
        "lag",
        F.round(rho, 6).alias("rho"),
        F.round(rho * rho / (F.col("n") - F.col("lag")), 12).alias("term"),
    )
    wall = Window.partitionBy()
    q_expr = (
        F.col("n")
        * (F.col("n") + F.lit(2.0))
        * F.sum(F.col("term").cast("decimal(28,12)"))
        .over(wall)
        .cast("double")
    )
    return terms.select(
        "lag",
        "rho",
        F.round(q_expr, 6).alias("q_stat"),
        (q_expr > F.lit(_LB_CRIT_95_DF7)).alias("reject_white_noise"),
    )


# ========================================================================
# q_cohens_d — standardized effect size between customer segments
# ========================================================================


@register(
    "q_cohens_d",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
s AS (
  SELECT
    SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS n1,
    SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS n2,
    CAST(SUM(CAST(ROUND(CASE WHEN seg = 'BUILDING' THEN x END, 2)
              AS DECIMAL(18,2))) AS DOUBLE) AS sx1,
    CAST(SUM(CAST(ROUND(CASE WHEN seg = 'MACHINERY' THEN x END, 2)
              AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
    CAST(SUM(CAST(ROUND(CASE WHEN seg = 'BUILDING' THEN x * x END, 4)
              AS DECIMAL(28,4))) AS DOUBLE) AS sq1,
    CAST(SUM(CAST(ROUND(CASE WHEN seg = 'MACHINERY' THEN x * x END, 4)
              AS DECIMAL(28,4))) AS DOUBLE) AS sq2
  FROM j
),
m AS (
  SELECT n1, n2, sx1 / n1 AS m1, sx2 / n2 AS m2,
         (sq1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
         (sq2 - sx2 * sx2 / n2) / (n2 - 1) AS v2
  FROM s
),
d AS (
  SELECT n1, n2, m1, m2,
         SQRT(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)) AS sp,
         (m1 - m2) / SQRT(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
           AS cd
  FROM m
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(m1, 9) AS mean1, ROUND(m2, 9) AS mean2,
       ROUND(sp, 6) AS pooled_sd,
       ROUND(cd, 6) AS cohens_d,
       ROUND(cd * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g
FROM d
""",
)
def q_cohens_d(spark, sf_dir):
    """Cohen's d (pooled-SD standardized mean difference) + the
    small-sample Hedges' g correction between BUILDING and MACHINERY
    customers' order values — the EFFECT-SIZE companion to
    q_welch_ttest (a t-statistic says "significant"; d says "big
    enough to matter", the number an experimentation platform reports
    beside every p-value).

    Same one-scan conditional-DECIMAL sufficient-statistics shape as
    q_welch_ttest (map-side combinable, order-free), over the
    broadcast customer-dim join with the segment predicate pushed to
    the dim scan; the closed form runs on a 1-row frame with
    identical double-arithmetic order on both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = (
        o.join(
            F.broadcast(
                c.filter(
                    F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
                )
            ),
            o.o_custkey == c.c_custkey,
        )
        .select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("x"))
    )

    def cond(seg, expr, scale, prec):
        return F.sum(
            F.round(F.when(F.col("seg") == seg, expr), scale).cast(
                f"decimal({prec},{scale})"
            )
        ).cast("double")

    x = F.col("x")
    s = j.agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0)).alias("n2"),
        cond("BUILDING", x, 2, 18).alias("sx1"),
        cond("MACHINERY", x, 2, 18).alias("sx2"),
        cond("BUILDING", x * x, 4, 28).alias("sq1"),
        cond("MACHINERY", x * x, 4, 28).alias("sq2"),
    )
    m1 = F.col("sx1") / F.col("n1")
    m2 = F.col("sx2") / F.col("n2")
    v1 = (F.col("sq1") - F.col("sx1") * F.col("sx1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    v2 = (F.col("sq2") - F.col("sx2") * F.col("sx2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    sp = F.sqrt(
        ((F.col("n1") - 1) * v1 + (F.col("n2") - 1) * v2)
        / (F.col("n1") + F.col("n2") - 2)
    )
    cd = (m1 - m2) / sp
    return s.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(m1, 9).alias("mean1"),
        F.round(m2, 9).alias("mean2"),
        F.round(sp, 6).alias("pooled_sd"),
        F.round(cd, 6).alias("cohens_d"),
        F.round(
            cd
            * (
                F.lit(1.0)
                - F.lit(3.0) / (F.lit(4.0) * (F.col("n1") + F.col("n2")) - 9.0)
            ),
            6,
        ).alias("hedges_g"),
    )
