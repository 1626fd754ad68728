"""§2.20 round-8 additions (EXT): sketches / robust statistics /
training-pipeline sampling breadth.

The VERDICT-r7 north-star list (mergeable quantile digests, weighted
reservoir sampling, product-quantization codes, removal-effect Markov
attribution, Huber robust regression) plus the robust/rank statistics
and deterministic sampling operators a 100 TB pipeline user reaches
for next.  Every key follows FIXTURES.md §4–8: exact integer cents,
order-free integer/DECIMAL sums, LN/EXP terms round(9) → DECIMAL
(q_entropy precedent), identical double algebra on both engines for
every final ratio (shared expression strings where the algebra is
generated), `//` ↔ F.floor for integer division (§8.7, non-negative
domains), and full tie-break chains under every rank.

O(D²) constructions ride the CALENDAR-BOUNDED day grain (the
q_theil_sen_trend discipline); rank machinery follows q_mann_whitney
(integer average-rank arithmetic at value grain, scalable_cumsum as
the documented continuous-metric swap) and q_theil_sen_trend
(windows.scalable_rank two-phase median selection).
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

#: Shared DuckDB day-grain CTE — daily revenue in exact integer cents
#: (the keys_r7 _DAILY_SQL twin, re-declared here so this module is
#: import-order independent).
_DAILY_SQL = """
  SELECT EPOCH_US(o_orderdate) // 86400000000 AS dayidx,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
"""


def _daily_cents(spark, sf_dir):
    """Daily (dayidx, cents) revenue series — mirrors
    :data:`_DAILY_SQL`."""
    o = load_table(spark, sf_dir, "orders")
    us = epoch_us(o, "o_orderdate")
    return o.groupBy(
        F.floor(us / F.lit(86_400_000_000)).alias("dayidx")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("cents")
    )


# ========================================================================
# q_theil_index — Theil T inequality of customer revenue, decomposed
# ========================================================================


@register(
    "q_theil_index",
    oracle="""
WITH cx AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM cx
),
terms AS (
  SELECT SUM(CAST(ROUND(
           ((CAST(cents AS DOUBLE) / s) * n)
           * LN((CAST(cents AS DOUBLE) / s) * n), 9)
         AS DECIMAL(28,9))) AS tsum
  FROM cx, tot
),
grp AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(SUM(cents) AS BIGINT) AS sg,
         CAST(COUNT(*) AS BIGINT) AS ng
  FROM cx JOIN customer c ON cx.o_custkey = c.c_custkey
  GROUP BY 1
),
bterms AS (
  SELECT SUM(CAST(ROUND(
           (CAST(sg AS DOUBLE) / s)
           * LN(((CAST(sg AS DOUBLE) / s) * n) / ng), 9)
         AS DECIMAL(28,9))) AS bsum
  FROM grp, tot
)
SELECT n AS n_customers,
       CAST(tsum AS DOUBLE) / n AS theil_total,
       CAST(bsum AS DOUBLE) AS theil_between,
       CAST(tsum AS DOUBLE) / n - CAST(bsum AS DOUBLE) AS theil_within
FROM tot, terms, bterms
""",
)
def q_theil_index(spark, sf_dir):
    """Theil T inequality index of customer revenue with its
    between/within-nation DECOMPOSITION — the property q_gini cannot
    offer (Gini is not additively decomposable; Theil's
    T = T_between + T_within splits concentration into "nations
    differ" vs "customers within a nation differ", the
    corpus-mix/revenue-mix governance number).

    T = (1/n)·Σᵢ rᵢ·ln rᵢ with rᵢ = (xᵢ/S)·n; T_between =
    Σ_g (S_g/S)·ln((S_g/S)·(n/n_g)); T_within = T − T_between.

    Scale shape: ONE custkey groupBy is the only full-data shuffle
    (customer grain; the customer→nation dim join happens after the
    pre-aggregation, q_star_agg discipline).  Revenues are exact
    integer cents; each rᵢ runs the identical division/multiply chain
    on both engines ((x/S)·n — never x·n/S, whose product overflows
    int64-exact doubles at 100 TB row counts); per-customer ln terms
    round(9) → DECIMAL so the cross-customer sum is ORDER-FREE
    (q_entropy precedent; |r·ln r| stays well under the §8.14
    magnitude bound at real concentration levels); the three final
    doubles are single identical-order expressions, left unrounded
    (§8.13)."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cx = o.groupBy(F.col("o_custkey")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("cents")
    )
    # cx feeds the totals, the per-customer terms AND the nation
    # rollup — persist the bounded customer-grain table so the orders
    # scan+groupBy runs once (branch-DAG persist discipline)
    cx = cx.persist()
    try:
        tot = cx.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
        )
        r = (F.col("cents").cast("double") / F.col("s")) * F.col("n")
        terms = cx.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                F.round(r * F.log(r), 9).cast("decimal(28,9)")
            ).alias("tsum")
        )
        grp = (
            cx.join(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_nationkey").alias("nationkey"),
                ),
                "o_custkey",
            )
            .groupBy("nationkey")
            .agg(
                F.sum("cents").cast("long").alias("sg"),
                F.count(F.lit(1)).cast("long").alias("ng"),
            )
        )
        share = F.col("sg").cast("double") / F.col("s")
        bterms = grp.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                F.round(
                    share * F.log((share * F.col("n")) / F.col("ng")), 9
                ).cast("decimal(28,9)")
            ).alias("bsum")
        )
        t_total = F.col("tsum").cast("double") / F.col("n")
        out = (
            tot.crossJoin(F.broadcast(terms))
            .crossJoin(F.broadcast(bterms))
            .select(
                F.col("n").alias("n_customers"),
                t_total.alias("theil_total"),
                F.col("bsum").cast("double").alias("theil_between"),
                (t_total - F.col("bsum").cast("double")).alias(
                    "theil_within"
                ),
            )
        )
        # bounded (1 row): materialize while cx is cached
        return out.localCheckpoint(eager=True)
    finally:
        cx.unpersist()


# ========================================================================
# q_hodges_lehmann — HL location estimate of daily revenue
# ========================================================================


@register(
    "q_hodges_lehmann",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
w AS (
  SELECT a.cents + b.cents AS s2
  FROM d a JOIN d b ON a.dayidx <= b.dayidx
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_pairs,
       (SELECT ROUND(MEDIAN(s2) / 200, 6) FROM w) AS hl_usd
""",
)
def q_hodges_lehmann(spark, sf_dir):
    """Hodges–Lehmann estimator of daily revenue — the median of all
    Walsh averages (xᵢ+xⱼ)/2 over day pairs i ≤ j: the robust
    LOCATION companion to q_theil_sen_trend's robust SLOPE (≈29%
    breakdown, far tighter than the median on symmetric-ish data, and
    the point estimate dual of the Wilcoxon signed-rank test).

    Walsh sums stay EXACT BIGINT cents (the /2 and the /100 to
    dollars fold into ONE final /200 after selection — no per-pair
    float).  The O(D²) pair set rides the calendar-bounded day grain
    (q_theil_sen_trend discipline: one full-data groupBy, broadcast
    pair join); the median is the same two-phase
    ``windows.scalable_rank`` selection — value-deterministic bucket
    boundaries, per-bucket row_number + broadcast prefix offsets,
    filter the two middle ranks — never a one-task global sort or a
    TypedImperative percentile over millions of distinct values.
    DuckDB MEDIAN ≡ quantile_cont(0.5) interpolates the same two
    order statistics; round(6) at |usd| ≤ 1e7 sits inside §8.14."""
    d = _daily_cents(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    w = a.join(
        F.broadcast(b), F.col("a.dayidx") <= F.col("b.dayidx")
    ).select((F.col("a.cents") + F.col("b.cents")).alias("s2"))
    w = w.persist()
    try:
        ranked = win.scalable_rank(
            w, [F.col("s2")], "s2", rank_col="_grank", tot_col="_tot"
        )
        sel = ranked.filter(
            (F.col("_grank") == F.expr("(_tot + 1) div 2"))
            | (F.col("_grank") == F.expr("(_tot + 2) div 2"))
        )
        med = sel.agg(
            F.max("_tot").alias("n_pairs"),
            F.round(F.avg("s2") / 200, 6).alias("hl_usd"),
        )
        nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
        out = nd.crossJoin(F.broadcast(med)).select(
            "n_days", "n_pairs", "hl_usd"
        )
        return out.localCheckpoint(eager=True)
    finally:
        w.unpersist()


# ========================================================================
# q_isotonic_trend — isotonic (non-decreasing) fit of daily revenue
# ========================================================================


@register(
    "q_isotonic_trend",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
r AS (
  SELECT dayidx, cents,
         ROW_NUMBER() OVER (ORDER BY dayidx) AS i,
         SUM(cents) OVER (ORDER BY dayidx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM d
),
spans AS (
  SELECT a.i AS j,
         CAST(b.p - a.p + a.cents AS DOUBLE) / (b.i - a.i + 1) AS avg_v
  FROM r a JOIN r b ON a.i <= b.i
),
mins AS (
  SELECT j, MIN(avg_v) AS mv FROM spans GROUP BY j
),
fit AS (
  SELECT r.dayidx, r.cents,
         MAX(m.mv) OVER (ORDER BY r.i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
  FROM r JOIN mins m ON r.i = m.j
)
SELECT dayidx,
       CAST(cents AS DOUBLE) / 100 AS revenue_usd,
       f / 100 AS iso_fit_usd
FROM fit
""",
)
def q_isotonic_trend(spark, sf_dir):
    """Isotonic (non-decreasing) regression of daily revenue via the
    PAVA minimax identity: fitᵢ = max_{{j≤i}} min_{{k≥j}} avg(y[j..k])
    — the shape-constrained trend (monotone calibration curves,
    cumulative-metric repair) that OLS/Theil–Sen's straight line
    cannot express.  The sequential pool-adjacent-violators loop is
    inherently order-recursive; the minimax closed form re-expresses
    it as an O(D²) span table — embarrassingly parallel, and bounded
    by the CALENDAR day grain (q_theil_sen_trend discipline: the one
    full-data stage is the day groupBy; the span join broadcasts a
    few-thousand-row side).

    Span averages are single divisions of exact integer cents
    (prefix-sum differences) by integer span lengths → bit-identical
    doubles; min-per-start, running max and the final /100 operate on
    those identical doubles, so every fitted value matches without
    any rounding (§8.13).  The two windows ride the bounded day
    grain (scalable_cumsum / scalable_trailing_aggs are the swaps if
    the grain could grow)."""
    d = _daily_cents(spark, sf_dir)
    wd = Window.orderBy("dayidx")
    r = d.select(
        "dayidx",
        "cents",
        F.row_number().over(wd).alias("i"),
        F.sum("cents")
        .over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("p"),
    )
    # r feeds both sides of the span join plus the final fit join —
    # persist the bounded day-grain table (branch-DAG discipline)
    r = r.persist()
    try:
        a, b = r.alias("a"), r.alias("b")
        spans = a.join(
            F.broadcast(b), F.col("a.i") <= F.col("b.i")
        ).select(
            F.col("a.i").alias("j"),
            (
                (
                    F.col("b.p") - F.col("a.p") + F.col("a.cents")
                ).cast("double")
                / (F.col("b.i") - F.col("a.i") + 1)
            ).alias("avg_v"),
        )
        mins = spans.groupBy("j").agg(F.min("avg_v").alias("mv"))
        wi = Window.orderBy("i").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        fit = r.join(
            F.broadcast(mins), F.col("i") == F.col("j")
        ).select(
            "dayidx",
            "cents",
            "i",
            F.col("mv"),
        )
        out = fit.select(
            "dayidx",
            (F.col("cents").cast("double") / 100).alias("revenue_usd"),
            (F.max("mv").over(wi) / 100).alias("iso_fit_usd"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        r.unpersist()


# ========================================================================
# q_kruskal_wallis — k-group rank test across order priorities
# ========================================================================

#: χ²(0.95, df=4) — frozen Python literal shared by both engines
#: (scipy.stats.chi2.ppf(0.95, 4); the q_ljung_box frozen-constant
#: discipline, §8.18).  Guarded by the k==5 check in the verdict CASE.
_KW_CHI2_95_DF4 = 9.487729036781154


@register(
    "q_kruskal_wallis",
    oracle=f"""
WITH t AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         o_orderpriority AS grp
  FROM orders
),
g AS (
  SELECT v,
         SUM(CASE WHEN grp = '1-URGENT' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN grp = '2-HIGH' THEN 1 ELSE 0 END) AS c2,
         SUM(CASE WHEN grp = '3-MEDIUM' THEN 1 ELSE 0 END) AS c3,
         SUM(CASE WHEN grp = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS c4,
         SUM(CASE WHEN grp = '5-LOW' THEN 1 ELSE 0 END) AS c5,
         COUNT(*) AS ct
  FROM t GROUP BY v
),
r AS (
  SELECT c1, c2, c3, c4, c5, ct,
         COALESCE(SUM(ct) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cb
  FROM g
),
s AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c3) AS BIGINT) AS n3, CAST(SUM(c4) AS BIGINT) AS n4,
         CAST(SUM(c5) AS BIGINT) AS n5,
         CAST(SUM(c1 * (2 * cb + ct + 1)) AS BIGINT) AS tr1,
         CAST(SUM(c2 * (2 * cb + ct + 1)) AS BIGINT) AS tr2,
         CAST(SUM(c3 * (2 * cb + ct + 1)) AS BIGINT) AS tr3,
         CAST(SUM(c4 * (2 * cb + ct + 1)) AS BIGINT) AS tr4,
         CAST(SUM(c5 * (2 * cb + ct + 1)) AS BIGINT) AS tr5,
         CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tie3
  FROM r
),
h AS (
  SELECT n1 + n2 + n3 + n4 + n5 AS n,
         (CASE WHEN n1 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n2 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n3 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n4 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n5 > 0 THEN 1 ELSE 0 END) AS k,
         ((((CAST(tr1 AS DOUBLE) * CAST(tr1 AS DOUBLE)) / n1
           + (CAST(tr2 AS DOUBLE) * CAST(tr2 AS DOUBLE)) / n2)
           + (CAST(tr3 AS DOUBLE) * CAST(tr3 AS DOUBLE)) / n3)
           + (CAST(tr4 AS DOUBLE) * CAST(tr4 AS DOUBLE)) / n4)
           + (CAST(tr5 AS DOUBLE) * CAST(tr5 AS DOUBLE)) / n5 AS sum_r2,
         CAST(tie3 AS DOUBLE) AS tie3d,
         n1, n2, n3, n4, n5
  FROM s
),
f AS (
  SELECT n, k, n1, n2, n3, n4, n5,
         (12.0 * (sum_r2 / 4.0)
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
          - 3.0 * (CAST(n AS DOUBLE) + 1.0))
         / (1.0 - tie3d
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(n AS DOUBLE))) AS h_stat
  FROM h
)
SELECT n AS n_total, k AS k_groups, n1, n2, n3, n4, n5,
       ROUND(h_stat, 6) AS h_stat,
       CASE WHEN k = 5 THEN h_stat > {_KW_CHI2_95_DF4!r} ELSE NULL END
         AS reject_h0
FROM f
""",
)
def q_kruskal_wallis(spark, sf_dir):
    """Kruskal–Wallis H test of order value across the five order
    priorities — the k-group generalization of q_mann_whitney (one
    rank pass instead of C(5,2) pairwise U tests), tie-corrected.

    Same integer rank machinery as q_mann_whitney: value-grain
    groupBy, 2·R_g = Σ c_g·(2·cum_before + ct + 1) EXACT BIGINT per
    group, Σ(t³−t) exact.  (2R_g)² is squared AFTER the int64→double
    cast (tr_d·tr_d): int64→double is a correctly-rounded HARDWARE
    conversion on both engines, whereas a DECIMAL(38)→DOUBLE cast is
    NOT correctly rounded in DuckDB (truncating two-part split —
    round-8 finding, FIXTURES §8.20; the exact-DECIMAL square would
    be wider than int64 and hit that cast).  The five R²_g/n_g terms
    are NAMED COLUMNS summed in explicit fixed order — a SUM() over a
    5-row group would be order-unspecified doubles.  N³−N runs in
    double (exact while N < 2²⁶·√2 ≈ 9.5e7; the hi/lo int64-pair
    spelling is the documented swap past that).  The cum_before
    window rides the value grain — scalable_cumsum is the
    continuous-metric swap (q_mann_whitney contract).  Verdict
    compares the same double expression to the frozen χ²(0.95,4)
    literal on both engines, NULL when a priority class is absent
    (df would shift)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("v"),
        F.col("o_orderpriority").alias("grp"),
    )
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    g = t.groupBy("v").agg(
        *[
            F.sum((F.col("grp") == p).cast("long")).alias(f"c{i+1}")
            for i, p in enumerate(pris)
        ],
        F.count(F.lit(1)).alias("ct"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    r = g.select(
        *[f"c{i}" for i in range(1, 6)],
        "ct",
        F.coalesce(F.sum("ct").over(w), F.lit(0)).alias("cb"),
    )
    s = r.agg(
        *[
            F.sum(f"c{i}").cast("bigint").alias(f"n{i}")
            for i in range(1, 6)
        ],
        *[
            F.sum(
                F.col(f"c{i}") * (2 * F.col("cb") + F.col("ct") + 1)
            )
            .cast("bigint")
            .alias(f"tr{i}")
            for i in range(1, 6)
        ],
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("bigint")
        .alias("tie3"),
    )
    r2 = [
        (
            F.col(f"tr{i}").cast("double")
            * F.col(f"tr{i}").cast("double")
        )
        / F.col(f"n{i}")
        for i in range(1, 6)
    ]
    sum_r2 = (((r2[0] + r2[1]) + r2[2]) + r2[3]) + r2[4]
    n = (
        F.col("n1") + F.col("n2") + F.col("n3") + F.col("n4") + F.col("n5")
    )
    k = sum(
        F.when(F.col(f"n{i}") > 0, 1).otherwise(0) for i in range(1, 6)
    )
    nd = n.cast("double")
    h_stat = (
        12.0 * (sum_r2 / 4.0) / (nd * (nd + 1.0)) - 3.0 * (nd + 1.0)
    ) / (1.0 - F.col("tie3").cast("double") / (nd * nd * nd - nd))
    return s.select(
        n.alias("n_total"),
        k.alias("k_groups"),
        "n1",
        "n2",
        "n3",
        "n4",
        "n5",
        F.round(h_stat, 6).alias("h_stat"),
        F.when(k == 5, h_stat > F.lit(_KW_CHI2_95_DF4))
        .otherwise(F.lit(None).cast("boolean"))
        .alias("reject_h0"),
    )


# ========================================================================
# q_weighted_sample — A-ES weighted reservoir sample (deterministic)
# ========================================================================


@register(
    "q_weighted_sample",
    oracle="""
WITH h AS (
  SELECT doc_id, n_chars,
         (((doc_id % 2654435761) * 2654435761) % 4294967296 + 1)
           / 4294967297.0 AS u
  FROM documents
)
SELECT doc_id, n_chars,
       ROUND(LN(u), 9) / n_chars AS es_key
FROM h
ORDER BY es_key DESC, doc_id
LIMIT 100
""",
)
def q_weighted_sample(spark, sf_dir):
    """Weighted sample WITHOUT replacement, k=100, weight = n_chars —
    the Efraimidis–Spirakis A-ES reservoir scheme beside the UNIFORM
    q_sample_reservoir: each row gets key u^(1/w) (equivalently
    ln(u)/w, monotone) and the top-k keys are exactly a
    weight-proportional without-replacement draw.  The length-weighted
    draw is the standard token-budget corpus subsample (long docs
    proportionally likelier, no doc twice).

    u is the deterministic Knuth uniform ((h+1)/2³²⁺¹ ∈ (0,1), the
    q_shuffle_shards hash — rand() is neither reproducible nor
    engine-portable); ln(u) is rounded to 9 dp FIRST (the §7
    transcendental rule: libm/JVM log agree at 9 dp), so the rank key
    is ONE correctly-rounded IEEE division of identical doubles by an
    exact integer weight — bit-identical on both engines, ranked
    directly (doc_id tiebreak).  Scale shape: stateless per-row hash →
    TakeOrderedAndProject top-k; no shuffle beyond the k-row merge,
    mergeable across partitions by construction (the reservoir
    property)."""
    d = load_table(spark, sf_dir, "documents")
    from .. import llmops

    u = (llmops.knuth_hash("doc_id") + 1) / F.lit(4294967297.0)
    key = F.round(F.log(u), 9) / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(100)
    )


# ========================================================================
# q_negative_sampling — deterministic negatives for contrastive pairs
# ========================================================================


@register(
    "q_negative_sampling",
    oracle="""
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS custkey, p.p_brand AS brand
  FROM orders o
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
bdim AS (
  SELECT brand, ROW_NUMBER() OVER (ORDER BY brand) - 1 AS bidx,
         COUNT(*) OVER () AS nb
  FROM (SELECT DISTINCT brand FROM pos)
),
cand AS (
  SELECT p.custkey, p.brand AS pos_brand, s.slot,
         CAST((((p.custkey * 53 + b.bidx * 7919 + s.slot) % 2654435761)
               * 2654435761) % 4294967296 % b.nb AS BIGINT) AS nidx
  FROM pos p
  JOIN bdim b ON p.brand = b.brand
  CROSS JOIN (SELECT UNNEST([1, 2]) AS slot) s
),
neg AS (
  SELECT c.custkey, c.pos_brand, c.slot, nb.brand AS neg_brand,
         CASE WHEN p2.custkey IS NOT NULL THEN 1 ELSE 0 END AS clash
  FROM cand c
  JOIN bdim nb ON c.nidx = nb.bidx
  LEFT JOIN pos p2
    ON c.custkey = p2.custkey AND nb.brand = p2.brand
)
SELECT pos_brand, neg_brand,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(clash) AS BIGINT) AS n_clash
FROM neg
GROUP BY pos_brand, neg_brand
""",
)
def q_negative_sampling(spark, sf_dir):
    """Deterministic negative sampling for contrastive training
    pairs: for every positive (customer, brand) purchase pair, draw 2
    hash-derived candidate negative brands, and FLAG (never resample)
    the candidates that collide with the customer's own positives —
    the collision report is aggregated per (pos_brand, neg_brand).
    Resampling loops are non-deterministic under distribution;
    flagging keeps the draw a pure function of the key so every
    engine, run and retry emits identical pairs (downstream filters
    or keeps flagged rows per its loss function).

    The candidate index is the Knuth hash of (custkey·53 +
    brand_idx·7919 + slot) mod |brands| — brand indices come from a
    row_number over the SORTED distinct brands (engine-portable,
    unlike any hash of the brand string).  Scale shape: the positives
    distinct is the one full-data shuffle; the 25-row brand dim
    broadcasts twice; the clash check is a left join of candidates
    against positives on (custkey, brand) — co-partitioned with the
    distinct that built them."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    from .. import llmops

    pos = (
        o.select(F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("custkey"))
        .join(
            li.select(
                F.col("l_orderkey").alias("okey"),
                F.col("l_partkey").alias("pkey"),
            ),
            "okey",
        )
        .join(
            p.select(
                F.col("p_partkey").alias("pkey"),
                F.col("p_brand").alias("brand"),
            ),
            "pkey",
        )
        .select("custkey", "brand")
        .distinct()
    )
    # positives feed the candidate fan-out AND the clash join —
    # persist the deduped pair table (branch-DAG discipline)
    pos = pos.persist()
    try:
        wb = Window.orderBy("brand")
        bdim = (
            pos.select("brand")
            .distinct()
            .select(
                "brand",
                (F.row_number().over(wb) - 1).alias("bidx"),
                F.count(F.lit(1)).over(
                    Window.partitionBy()
                ).alias("nb"),
            )
        )
        cand = (
            pos.join(F.broadcast(bdim), "brand")
            .select(
                "custkey",
                F.col("brand").alias("pos_brand"),
                F.explode(F.array(F.lit(1), F.lit(2))).alias("slot"),
                "bidx",
                "nb",
            )
            .select(
                "custkey",
                "pos_brand",
                "slot",
                (
                    llmops.knuth_hash(
                        F.col("custkey") * 53
                        + F.col("bidx") * 7919
                        + F.col("slot")
                    )
                    % F.col("nb")
                )
                .cast("long")
                .alias("nidx"),
            )
        )
        neg = cand.join(
            F.broadcast(
                bdim.select(
                    F.col("bidx").alias("nidx"),
                    F.col("brand").alias("neg_brand"),
                )
            ),
            "nidx",
        ).join(
            pos.select(
                "custkey", F.col("brand").alias("neg_brand"), F.lit(1).alias("_hit")
            ),
            ["custkey", "neg_brand"],
            "left",
        )
        out = neg.groupBy("pos_brand", "neg_brand").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_clash"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        pos.unpersist()


# ========================================================================
# q_tdigest_quantiles — batch t-digest centroid construction
# ========================================================================


@register(
    "q_tdigest_quantiles",
    oracle="""
WITH v AS (
  SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem
),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, l_orderkey, l_linenumber)
           AS rk,
         COUNT(*) OVER () AS n
  FROM v
),
c AS (
  SELECT cents,
         (100 * (2 * m * m * m - 3000 * m * m + 2000000 * m))
           // 1000000000 AS centroid
  FROM (SELECT cents, (1000 * (2 * rk - 1)) // (2 * n) AS m FROM r)
)
SELECT centroid,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       (CAST(SUM(cents) AS DOUBLE) / COUNT(*)) / 100 AS mean_usd,
       CAST(MIN(cents) AS DOUBLE) / 100 AS lo_usd,
       CAST(MAX(cents) AS DOUBLE) / 100 AS hi_usd
FROM c
GROUP BY centroid
""",
)
def q_tdigest_quantiles(spark, sf_dir):
    """Batch t-digest of lineitem price: the mergeable quantile
    sketch as a first-class result — ~100 (centroid, count, mean,
    min, max) rows with TAIL-WEIGHTED resolution (centroid widths
    shrink 4× toward q→0/1, the property that makes t-digest the
    p99-accurate sketch; a plain equi-depth histogram wastes
    resolution mid-distribution).  Any quantile is then answered from
    the digest by cumulative-weight interpolation, and two digests
    MERGE by re-clustering their centroids through the same scale
    function — the 100 TB path is per-partition digests merged
    associatively, while THIS exact-rank construction is the
    certification oracle those merges are tested against.

    Determinism: the classic k₁ scale function's asin would put a
    floor() one ulp from an integer (the §8.10 POWER trap, worse);
    instead the scale function is the RATIONAL tail-weighted cubic
    k(q) = δ·(2q³ − 3q² + 2q) (k' = 2 at the tails vs ½ at the
    middle), evaluated on PER-MILLE ranks m = ⌊1000(2r−1)/(2n)⌋ so
    centroid = ⌊δ(2m³ − 3·10³m² + 2·10⁶m)/10⁹⌋ is PURE INT64
    ARITHMETIC at any n (max term 2·10¹¹) — `//` ↔ F.floor on
    non-negative operands (§8.7).  The global rank runs through
    windows.scalable_rank (value buckets + prefix offsets — never a
    one-task sort), full (cents, orderkey, linenumber) tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    r = win.scalable_rank(
        v,
        [F.col("cents"), F.col("l_orderkey"), F.col("l_linenumber")],
        "cents",
        rank_col="rk",
        tot_col="n",
    )
    m = F.floor(
        (1000 * (2 * F.col("rk") - 1)) / (2 * F.col("n"))
    ).cast("long")
    centroid = F.floor(
        (
            100
            * (
                2 * F.col("m") * F.col("m") * F.col("m")
                - 3000 * F.col("m") * F.col("m")
                + 2000000 * F.col("m")
            )
        )
        / F.lit(1000000000)
    ).cast("long")
    return (
        r.select("cents", m.alias("m"))
        .select("cents", centroid.alias("centroid"))
        .groupBy("centroid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (
                (F.sum("cents").cast("double") / F.count(F.lit(1)))
                / 100
            ).alias("mean_usd"),
            (F.min("cents").cast("double") / 100).alias("lo_usd"),
            (F.max("cents").cast("double") / 100).alias("hi_usd"),
        )
    )


# ========================================================================
# q_huber_regression — robust IRLS trend beside OLS / Theil–Sen
# ========================================================================

_HUBER_PASSES = 4


def _huber_pass_sql(p: int, last: bool) -> str:
    """One IRLS pass as oracle CTEs: per-pass robust scale m{p}
    (δ = 1.345·1.4826·MAD over the current residuals), floor-quantized
    integer weights w{p}, exact weighted sums a{p} (hi/lo int64 pair
    for Σw·x·y — §8.21), solved coefficients i{p}."""
    prev = f"i{p - 1}"
    down = (
        ",\n         CAST(SUM(CASE WHEN wq < 1000000 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_down"
        if last
        else ""
    )
    return f"""m{p} AS (
  SELECT 1.345 * 1.4826
         * MEDIAN(ABS(CAST(cents AS DOUBLE) - b0 - b1 * xp)) AS delta
  FROM dx, {prev}
),
w{p} AS (
  SELECT xp, cents,
         CAST(FLOOR(1000000.0 * CASE
           WHEN ABS(CAST(cents AS DOUBLE) - b0 - b1 * xp) <= delta THEN 1.0
           ELSE delta / ABS(CAST(cents AS DOUBLE) - b0 - b1 * xp)
         END) AS BIGINT) AS wq
  FROM dx, {prev}, m{p}
),
a{p} AS (
  SELECT CAST(SUM(wq) AS BIGINT) AS sw,
         CAST(SUM(wq * xp) AS BIGINT) AS swx,
         CAST(SUM(wq * cents) AS BIGINT) AS swy,
         CAST(SUM(wq * (xp * xp)) AS BIGINT) AS swxx,
         CAST(SUM((wq * (xp * cents)) // 4294967296) AS BIGINT) AS swxyh,
         CAST(SUM((wq * (xp * cents)) % 4294967296) AS BIGINT) AS swxyl{down}
  FROM w{p}
),
i{p} AS (
  SELECT b1,
         (CAST(swy AS DOUBLE) - b1 * CAST(swx AS DOUBLE))
           / CAST(sw AS DOUBLE) AS b0
  FROM (
    SELECT (CAST(sw AS DOUBLE)
              * (CAST(swxyh AS DOUBLE) * 4294967296.0
                   + CAST(swxyl AS DOUBLE))
              - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
           / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
                - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)) AS b1,
           sw, swx, swy
    FROM a{p}
  )
)"""


def _huber_oracle() -> str:
    passes = ",\n".join(
        _huber_pass_sql(p, p == _HUBER_PASSES)
        for p in range(1, _HUBER_PASSES + 1)
    )
    k = _HUBER_PASSES
    return f"""
WITH d AS ({_DAILY_SQL}),
mn AS (SELECT MIN(dayidx) AS m0 FROM d),
dx AS (SELECT dayidx - m0 AS xp, cents FROM d, mn),
s0 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xp) AS BIGINT) AS sx,
         CAST(SUM(cents) AS BIGINT) AS sy,
         CAST(SUM(xp * xp) AS BIGINT) AS sxx,
         CAST(SUM(xp * cents) AS BIGINT) AS sxy
  FROM dx
),
ols AS (
  SELECT n, sx, sy,
         (CAST(sxy AS DOUBLE)
            - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / n)
         / (CAST(sxx AS DOUBLE)
              - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n) AS b1
  FROM s0
),
i0 AS (
  SELECT n, b1,
         (CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE)) / n AS b0
  FROM ols
),
{passes}
SELECT i0.n AS n_days,
       i0.b1 / 100 AS slope_ols_usd,
       i0.b0 / 100 AS icept_ols_usd,
       i{k}.b1 / 100 AS slope_huber_usd,
       i{k}.b0 / 100 AS icept_huber_usd,
       a{k}.n_down AS n_downweighted
FROM i0, a{k}, i{k}
"""


@register("q_huber_regression", oracle=_huber_oracle())
def q_huber_regression(spark, sf_dir):
    """Huber robust regression of daily revenue on day index — the
    IRLS M-estimator beside OLS (q_linear_regression, which a flash
    sale day drags) and Theil–Sen (q_theil_sen_trend, robust slope
    but no intercept/scale): four iteratively-reweighted least-squares
    passes with the Huber ψ (w = min(1, δ/|r|)) and the STANDARD
    per-pass robust scale δ = 1.345·1.4826·MAD(|r|) — an OLS-derived
    σ̂ is itself contaminated by the very outlier being resisted (this
    key's first spelling left a 1e7-cent spike with 27% weight; the
    planted test caught it), while the residual MAD shrinks as the
    fit improves, so the spike's weight collapses geometrically
    (planted end-of-range spike: OLS slope 924 → 272 → 24 → ≈1 usd
    across passes).  MAD's median runs on the bounded day grain via
    the exact percentile ≡ quantile_cont contract (q_outlier_mad
    precedent; approx_percentile is the documented swap if the grain
    could grow).  The pass count is FIXED (deterministic; an
    until-converged loop would be data-dependent).

    Determinism (two round-8 rules — FIXTURES §8.20/§8.21): (a)
    per-row weights are FLOOR-QUANTIZED to integer 1e-6 units (floor
    of an identical double is identical; ROUND(w, 9) split one of
    ~2,200 weights at a .5 tie between Spark's shortest-repr HALF_UP
    and DuckDB's binary expansion), so every weighted sum is an EXACT
    INTEGER sum — order-free — and n_downweighted is an exact
    compare; (b) every to-double cast stays WITHIN INT64 (DuckDB's
    DECIMAL/HUGEINT→DOUBLE cast truncates): the one sum that exceeds
    int64 (Σw·x·y) is carried as a hi/lo int64 PAIR split at 2³² and
    reconstructed as hi_d·2³² + lo_d (power-of-two multiply is exact;
    the single rounded add is identical IEEE).  x is re-based to
    min(dayidx) so Σx, Σx², Σxy stay int64 at any calendar; the
    budget holds while daily cents < ~3.7e9 (3× the sf0.1 level;
    splitting the product term itself is the documented swap).
    Coefficients are left unrounded (§8.13).

    Scale shape: ONE day-grain groupBy is the only full-data stage;
    each pass's MAD and weighted sums re-scan the PERSISTED bounded
    day table with 1-row coefficient frames broadcast-attached (no
    driver sync, no lineage re-execution)."""
    d = _daily_cents(spark, sf_dir)
    d = d.persist()
    try:
        mn = d.agg(F.min("dayidx").alias("m0"))
        dx = d.crossJoin(F.broadcast(mn)).select(
            (F.col("dayidx") - F.col("m0")).alias("xp"), "cents"
        )
        s0 = dx.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xp").cast("long").alias("sx"),
            F.sum("cents").cast("long").alias("sy"),
            F.sum(F.col("xp") * F.col("xp")).cast("long").alias("sxx"),
            F.sum(F.col("xp") * F.col("cents")).cast("long").alias("sxy"),
        )
        sxd = F.col("sx").cast("double")
        syd = F.col("sy").cast("double")
        b1_ols = (
            F.col("sxy").cast("double") - (sxd * syd) / F.col("n")
        ) / (F.col("sxx").cast("double") - (sxd * sxd) / F.col("n"))
        i0 = s0.select(
            "n",
            b1_ols.alias("b1"),
            ((syd - b1_ols * sxd) / F.col("n")).alias("b0"),
        )
        # 1-row coefficient frames are read by several later stages —
        # eager localCheckpoint keeps every pass's plan shallow
        i0 = i0.localCheckpoint(eager=True)

        resid = (
            F.col("cents").cast("double")
            - F.col("b0")
            - F.col("b1") * F.col("xp")
        )

        def irls_pass(coef_df, with_down):
            # per-pass robust scale: δ = 1.345·1.4826·MAD(|resid|)
            m = dx.crossJoin(F.broadcast(coef_df)).agg(
                F.expr(
                    "1.345 * 1.4826 * percentile(abs(CAST(cents AS "
                    "DOUBLE) - b0 - b1 * xp), 0.5)"
                ).alias("delta")
            )
            w = F.when(
                F.abs(resid) <= F.col("delta"), F.lit(1.0)
            ).otherwise(F.col("delta") / F.abs(resid))
            # FLOOR-quantize to integer 1e-6 units (§8.20)
            wq = F.floor(F.lit(1_000_000.0) * w).cast("long")
            wdf = (
                dx.crossJoin(F.broadcast(coef_df))
                .crossJoin(F.broadcast(m))
                .select("xp", "cents", wq.alias("wq"))
            )
            aggs = [
                F.sum("wq").cast("long").alias("sw"),
                F.sum(F.col("wq") * F.col("xp"))
                .cast("long")
                .alias("swx"),
                F.sum(F.col("wq") * F.col("cents"))
                .cast("long")
                .alias("swy"),
                F.sum(F.col("wq") * (F.col("xp") * F.col("xp")))
                .cast("long")
                .alias("swxx"),
                # Σ wq·x·y exceeds int64 → hi/lo int64 pair (§8.21)
                F.sum(F.expr("(wq * (xp * cents)) div 4294967296"))
                .cast("long")
                .alias("swxyh"),
                F.sum(
                    (F.col("wq") * (F.col("xp") * F.col("cents")))
                    % F.lit(4294967296)
                )
                .cast("long")
                .alias("swxyl"),
            ]
            if with_down:
                aggs.append(
                    F.sum(
                        F.when(F.col("wq") < 1_000_000, 1).otherwise(0)
                    )
                    .cast("long")
                    .alias("n_down")
                )
            a = wdf.agg(*aggs)
            swd = F.col("sw").cast("double")
            swxd = F.col("swx").cast("double")
            swyd = F.col("swy").cast("double")
            swxyd = (
                F.col("swxyh").cast("double") * F.lit(4294967296.0)
                + F.col("swxyl").cast("double")
            )
            b1n = (swd * swxyd - swxd * swyd) / (
                swd * F.col("swxx").cast("double") - swxd * swxd
            )
            return a.select(
                "*",
                b1n.alias("_b1"),
                ((swyd - b1n * swxd) / swd).alias("_b0"),
            )

        coef = i0.select("b0", "b1")
        a_last = None
        for p in range(1, _HUBER_PASSES + 1):
            a_last = irls_pass(coef, p == _HUBER_PASSES)
            coef = a_last.select(
                F.col("_b1").alias("b1"), F.col("_b0").alias("b0")
            ).localCheckpoint(eager=True)
        out = (
            i0.select(
                F.col("n").alias("n_days"),
                (F.col("b1") / 100).alias("slope_ols_usd"),
                (F.col("b0") / 100).alias("icept_ols_usd"),
            )
            .crossJoin(
                F.broadcast(
                    a_last.select(
                        (F.col("_b1") / 100).alias("slope_huber_usd"),
                        (F.col("_b0") / 100).alias("icept_huber_usd"),
                        F.col("n_down").alias("n_downweighted"),
                    )
                )
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        d.unpersist()


# ========================================================================
# q_partial_autocorr — PACF via unrolled Durbin–Levinson
# ========================================================================

_PACF_LAGS = 7

#: 2^24 / 2^48 — the §8.21 split constants: z values (|z| ≤ n·max
#: daily cents ≈ 2.2e12 at sf0.1) split into hi/lo at 2^24 so every
#: lag-product PIECE and its sum stays int64, and the reconstruction
#: hi·2^48 + mid·2^24 + lo happens in shared-spelling double algebra
#: (int64→double casts are correctly-rounded HARDWARE conversions on
#: both engines; DECIMAL(38)→double is NOT in DuckDB).
_PACF_M = 16777216
_PACF_M2 = 281474976710656


def _pacf_dbl3(a: str, b: str, c: str) -> str:
    """Shared reconstruction spelling for a 2^24-split product sum:
    identical parse → identical left-associated IEEE ops on both
    engines."""
    return (
        f"(CAST({a} AS DOUBLE) * {float(_PACF_M2)!r}"
        f" + CAST({b} AS DOUBLE) * {float(_PACF_M)!r}"
        f" + CAST({c} AS DOUBLE))"
    )


def _durbin_levinson_exprs(lags: int) -> list[list[tuple[str, str]]]:
    """Generate the Durbin–Levinson recursion as ONE list of
    (column, SQL-expression) levels, consumed verbatim by BOTH engines
    (Spark via F.expr, DuckDB via chained CTEs) — sharing the literal
    expression string is what makes every intermediate double
    bit-identical: same parse, same left-associated operation order.
    Level k defines p{k}_{j} (φ_{k,j}); the PACF at lag k is p{k}_{k}."""
    levels: list[list[tuple[str, str]]] = [[("p1_1", "r1")]]
    for k in range(2, lags + 1):
        lvl: list[tuple[str, str]] = []
        num_terms = " + ".join(
            f"p{k-1}_{j} * r{k-j}" for j in range(1, k)
        )
        den_terms = " + ".join(f"p{k-1}_{j} * r{j}" for j in range(1, k))
        lvl.append(
            (f"p{k}_{k}", f"(r{k} - ({num_terms})) / (1.0 - ({den_terms}))")
        )
        for j in range(1, k):
            lvl.append(
                (f"p{k}_{j}", f"p{k-1}_{j} - p{k}_{k} * p{k-1}_{k-j}")
            )
        levels.append(lvl)
    return levels


def _pacf_r_exprs() -> list[str]:
    """r1..r7 as shared strings over the split-sum columns."""
    den = _pacf_dbl3("a0", "b0", "c0")
    return [
        f"{_pacf_dbl3(f'a{k}', f'b{k}', f'c{k}')} / {den}"
        for k in range(1, _PACF_LAGS + 1)
    ]


def _pacf_oracle() -> str:
    ks = range(1, _PACF_LAGS + 1)
    m = _PACF_M
    lag_cols = ", ".join(
        f"LAG(zh, {k}) OVER (ORDER BY dayidx) AS zh{k}, "
        f"LAG(zl, {k}) OVER (ORDER BY dayidx) AS zl{k}"
        for k in ks
    )
    sum_cols = [
        "CAST(SUM(zh * zh) AS BIGINT) AS a0",
        "CAST(SUM(zh * zl + zl * zh) AS BIGINT) AS b0",
        "CAST(SUM(zl * zl) AS BIGINT) AS c0",
    ]
    for k in ks:
        sum_cols += [
            f"CAST(SUM(zh * zh{k}) AS BIGINT) AS a{k}",
            f"CAST(SUM(zh * zl{k} + zl * zh{k}) AS BIGINT) AS b{k}",
            f"CAST(SUM(zl * zl{k}) AS BIGINT) AS c{k}",
        ]
    r_cols = ", ".join(
        f"{expr} AS r{k}" for k, expr in zip(ks, _pacf_r_exprs())
    )
    ctes = []
    prev = "rr"
    for i, lvl in enumerate(_durbin_levinson_exprs(_PACF_LAGS)):
        defs = ", ".join(f"{expr} AS {name}" for name, expr in lvl)
        ctes.append(f"dl{i} AS (SELECT *, {defs} FROM {prev})")
        prev = f"dl{i}"
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS lag, r{k} AS acf, "
        f"p{k}_{k} AS pacf FROM {prev}"
        for k in ks
    )
    return f"""
WITH d AS ({_DAILY_SQL}),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM d
),
z AS (
  SELECT dayidx,
         CAST((st.n * d.cents - st.s) // {m} AS BIGINT) AS zh0,
         CAST((st.n * d.cents - st.s) % {m} AS BIGINT) AS zl
  FROM d, st
),
zz AS (SELECT dayidx, zh0 AS zh, zl FROM z),
lagged AS (SELECT dayidx, zh, zl, {lag_cols} FROM zz),
agg AS (SELECT {", ".join(sum_cols)} FROM lagged),
rr AS (SELECT {r_cols} FROM agg),
{", ".join(ctes)}
{unions}
"""


@register("q_partial_autocorr", oracle=_pacf_oracle())
def q_partial_autocorr(spark, sf_dir):
    """Partial autocorrelation (PACF) of daily revenue at lags 1..7
    via the Durbin–Levinson recursion — THE AR-order diagnostic next
    to q_autocorr/q_ljung_box's plain ACF: pacf(k) is lag-k
    correlation with lags 1..k−1 regressed out, and the lag where it
    cuts off is the AR(p) order an anomaly/forecast model needs.

    ACF inputs use q_ljung_box's exact integer centering
    (z = n·y − Σy; the n² factor cancels in every ratio) but NOT its
    DECIMAL(38)→double casts: DuckDB's wide-decimal→double conversion
    is a truncating split, not correctly rounded (round-8 finding,
    FIXTURES §8.21), so z is SPLIT at 2²⁴ into int64 hi/lo parts,
    every lag-product piece Σzh·zh', Σ(zh·zl'+zl·zh'), Σzl·zl' is an
    exact INT64 sum (order-free), and ρ_k reconstructs through the
    shared-spelling double chain hi·2⁴⁸ + mid·2²⁴ + lo — int64→double
    is a correctly-rounded hardware conversion on both engines.  The
    `div`/% split uses truncation-toward-zero semantics, identical in
    Spark (`div`) and DuckDB (`//`) INCLUDING on negative z (§8.7's
    floor-vs-truncate caveat is why F.floor is NOT used here).

    The recursion itself is UNROLLED from
    :func:`_durbin_levinson_exprs` — the SAME expression strings run
    on both engines (Spark F.expr, DuckDB CTEs), so every φ_{k,j}
    double is bit-identical by construction: identical parse,
    identical left-associated order, no SUM() over rows whose order
    an engine could choose.  Lag windows ride the calendar-bounded
    day grain; |z| ≤ n·max(daily cents) must stay under 2⁴⁰ for the
    int64 budget (≈2.2e12 at sf0.1; a wider 2³²-split is the
    documented swap).  Output is the 7-row (lag, acf, pacf) table,
    unrounded (§8.13)."""
    d = _daily_cents(spark, sf_dir)
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    m = _PACF_M
    z = d.crossJoin(F.broadcast(st)).select(
        "dayidx",
        F.expr(f"(n * cents - s) div {m}").cast("long").alias("zh"),
        ((F.col("n") * F.col("cents") - F.col("s")) % F.lit(m))
        .cast("long")
        .alias("zl"),
    )
    wlag = Window.orderBy("dayidx")
    ks = range(1, _PACF_LAGS + 1)
    lagged = z.select(
        "zh",
        "zl",
        *[F.lag("zh", k).over(wlag).alias(f"zh{k}") for k in ks],
        *[F.lag("zl", k).over(wlag).alias(f"zl{k}") for k in ks],
    )
    sums = [
        F.sum(F.col("zh") * F.col("zh")).cast("long").alias("a0"),
        F.sum(
            F.col("zh") * F.col("zl") + F.col("zl") * F.col("zh")
        )
        .cast("long")
        .alias("b0"),
        F.sum(F.col("zl") * F.col("zl")).cast("long").alias("c0"),
    ]
    for k in ks:
        sums += [
            F.sum(F.col("zh") * F.col(f"zh{k}"))
            .cast("long")
            .alias(f"a{k}"),
            F.sum(
                F.col("zh") * F.col(f"zl{k}")
                + F.col("zl") * F.col(f"zh{k}")
            )
            .cast("long")
            .alias(f"b{k}"),
            F.sum(F.col("zl") * F.col(f"zl{k}"))
            .cast("long")
            .alias(f"c{k}"),
        ]
    agg = lagged.agg(*sums)
    rr = agg.select(
        *[
            F.expr(expr).alias(f"r{k}")
            for k, expr in zip(ks, _pacf_r_exprs())
        ]
    )
    cur = rr
    for lvl in _durbin_levinson_exprs(_PACF_LAGS):
        cur = cur.select(
            "*", *[F.expr(expr).alias(name) for name, expr in lvl]
        )
    rows = [
        F.struct(
            F.lit(k).cast("long").alias("lag"),
            F.col(f"r{k}").alias("acf"),
            F.col(f"p{k}_{k}").alias("pacf"),
        )
        for k in ks
    ]
    return cur.select(F.explode(F.array(*rows)).alias("o")).select(
        "o.lag", "o.acf", "o.pacf"
    )


# ========================================================================
# q_markov_attribution — removal-effect channel attribution
# ========================================================================

_MK_CHANNELS = ["click", "error", "signup", "view"]
_MK_STEPS = 16


def _markov_value_exprs() -> tuple[list[list[tuple[str, str]]], dict]:
    """Generate the fixed-horizon absorption recursion as shared
    expression strings (the q_partial_autocorr discipline: one parse,
    one left-associated order, bit-identical doubles on both engines).

    Tracks: ``full`` plus one per removed channel.  Level i defines
    v_{track}_{i}_{s} = P(s→CONV) + Σ_{u kept} P(s→u)·v_{track}_{i-1}_{u}
    (v_0 ≡ 0, so level 1 is P(s→CONV)); after the last level the
    START-state absorption closes the recursion.  Returns (levels,
    start_exprs) with start_exprs[track] the final expression."""
    chans = _MK_CHANNELS
    tracks = ["full"] + chans
    levels: list[list[tuple[str, str]]] = []
    lvl1 = []
    for t in tracks:
        for s in chans:
            lvl1.append((f"v_{t}_1_{s}", f"pr_{s}_conv"))
    levels.append(lvl1)
    for i in range(2, _MK_STEPS + 1):
        lvl = []
        for t in tracks:
            kept = [u for u in chans if u != t]
            for s in chans:
                terms = " + ".join(
                    f"pr_{s}_{u} * v_{t}_{i-1}_{u}" for u in kept
                )
                lvl.append(
                    (f"v_{t}_{i}_{s}", f"pr_{s}_conv + ({terms})")
                )
        levels.append(lvl)
    start = {}
    for t in tracks:
        kept = [u for u in chans if u != t]
        terms = " + ".join(
            f"pr_start_{u} * v_{t}_{_MK_STEPS}_{u}" for u in kept
        )
        start[t] = f"pr_start_conv + ({terms})"
    return levels, start


def _markov_oracle() -> str:
    chans = _MK_CHANNELS
    srcs = ["start"] + chans
    dsts = chans + ["conv", "null"]
    cnt_cols = ", ".join(
        f"CAST(SUM(CASE WHEN src = '{s}' AND dst = '{d}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c_{s}_{d}"
        for s in srcs
        for d in dsts
    )
    tot_cols = ", ".join(
        f"({' + '.join(f'c_{s}_{d}' for d in dsts)}) AS tot_{s}"
        for s in srcs
    )
    pr_cols = ", ".join(
        f"CASE WHEN tot_{s} = 0 THEN 0.0 "
        f"ELSE CAST(c_{s}_{d} AS DOUBLE) / tot_{s} END AS pr_{s}_{d}"
        for s in srcs
        for d in dsts
        if d != "null"
    )
    levels, start = _markov_value_exprs()
    ctes = []
    prev = "pr"
    for i, lvl in enumerate(levels):
        defs = ", ".join(f"{expr} AS {name}" for name, expr in lvl)
        ctes.append(f"it{i} AS (SELECT *, {defs} FROM {prev})")
        prev = f"it{i}"
    fin = ", ".join(f"({expr}) AS p_{t}" for t, expr in start.items())
    eff = " + ".join(f"(p_full - p_{c})" for c in chans)
    unions = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, p_full, p_{c} AS p_removed, "
        f"p_full - p_{c} AS removal_effect, "
        f"(p_full - p_{c}) / NULLIF({eff}, 0.0) AS attribution "
        f"FROM fin"
        for c in chans
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
fp AS (
  SELECT user_id, MIN(rn) AS prn FROM ev
  WHERE event_type = 'purchase' GROUP BY user_id
),
j AS (
  SELECT e.user_id,
         CASE WHEN e.event_type = 'purchase' THEN 'conv'
              ELSE e.event_type END AS state,
         e.rn, fp.prn
  FROM ev e LEFT JOIN fp ON e.user_id = fp.user_id
  WHERE fp.prn IS NULL OR e.rn <= fp.prn
),
seq AS (
  SELECT user_id, state, rn, prn,
         LAG(state) OVER (PARTITION BY user_id ORDER BY rn) AS prev,
         LEAD(state) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
  FROM j
),
tr AS (
  SELECT COALESCE(prev, 'start') AS src, state AS dst FROM seq
  UNION ALL
  SELECT state AS src, 'null' AS dst FROM seq
  WHERE nxt IS NULL AND prn IS NULL
),
cnt AS (SELECT {cnt_cols} FROM tr),
tot AS (SELECT *, {tot_cols} FROM cnt),
pr AS (SELECT *, {pr_cols} FROM tot),
{", ".join(ctes)},
fin AS (SELECT {fin} FROM {prev})
{unions}
"""


@register("q_markov_attribution", oracle=_markov_oracle())
def q_markov_attribution(spark, sf_dir):
    """Removal-effect Markov attribution over user event journeys —
    the data-driven multi-touch model beside q_attribution's
    last-touch heuristic: build the first-order channel transition
    chain (START → {click, view, signup, error} → CONV on the first
    purchase, NULL when a journey ends unconverted), compute the
    conversion (absorption) probability, then re-compute it with each
    channel REMOVED (its inbound transitions diverted to NULL) — a
    channel's credit is the conversion probability it carries.

    Semantics: the FIXED-HORIZON (16-step) absorption probability —
    a deterministic, engine-identical quantity at any mixing rate,
    unlike "iterate until converged" whose step count is data-
    dependent (documented choice; 16 steps bounds the truncation by
    P(non-absorb)¹⁶, far below reporting granularity on journey data
    where most absorption happens in the first few steps).  The
    recursion is UNROLLED through shared expression strings
    (:func:`_markov_value_exprs` — the q_partial_autocorr/Durbin–
    Levinson discipline): five tracks (full + 4 removals) × 16
    levels, every double bit-identical by construction; transition
    probabilities are single divisions of exact BIGINT counts; a
    state with ZERO outgoing transitions (a channel absent from the
    data) gets probability 0, not NULL — a NULL would poison every
    track's recursion through the cross terms (planted-test finding),
    while zero mass is the honest semantics: an unvisited state
    carries no conversion.  Only the final attribution share keeps a
    NULLIF guard (§8.17: all-zero effects have no shares).  The 5×6
    count matrix is ONE conditional aggregate pivoted to named
    columns, so no SUM order is ever engine-chosen.

    Scale shape: the per-user ROW_NUMBER/LAG windows are the one
    full-data stage (full-cardinality user partitioning — the
    q_growth_accounting window shape); everything after the 30-cell
    count aggregate is a 1-row frame.  Output: 4 rows (channel,
    p_full, p_removed, removal_effect, attribution)."""
    ev_raw = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev_raw.select(
        "user_id",
        "event_type",
        F.row_number().over(wu).alias("rn"),
    )
    # first-purchase rank per user, attached without a second scan:
    # min(rn | purchase) over the user partition
    wup = Window.partitionBy("user_id")
    j = (
        ev.withColumn(
            "prn",
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("rn"))
            ).over(wup),
        )
        .filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
        .select(
            "user_id",
            F.when(F.col("event_type") == "purchase", F.lit("conv"))
            .otherwise(F.col("event_type"))
            .alias("state"),
            "rn",
            "prn",
        )
    )
    ws = Window.partitionBy("user_id").orderBy("rn")
    seq = j.select(
        "state",
        "prn",
        F.lag("state").over(ws).alias("prev"),
        F.lead("state").over(ws).alias("nxt"),
    )
    # 1-or-2-row explode instead of a self-union: the terminal
    # (state → null) row rides the SAME pass as the transition row, so
    # the events scan and the user windows run ONCE, not once per
    # lineage branch (the q_open_order_backlog delta pattern)
    emit = F.concat(
        F.array(
            F.struct(
                F.coalesce(F.col("prev"), F.lit("start")).alias("src"),
                F.col("state").alias("dst"),
            )
        ),
        F.when(
            F.col("nxt").isNull() & F.col("prn").isNull(),
            F.array(
                F.struct(
                    F.col("state").alias("src"),
                    F.lit("null").alias("dst"),
                )
            ),
        ).otherwise(F.array().cast("array<struct<src:string,dst:string>>")),
    )
    tr = seq.select(F.explode(emit).alias("t")).select("t.src", "t.dst")
    chans = _MK_CHANNELS
    srcs = ["start"] + chans
    dsts = chans + ["conv", "null"]
    cnt = tr.agg(
        *[
            F.sum(
                F.when(
                    (F.col("src") == s) & (F.col("dst") == d), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"c_{s}_{d}")
            for s in srcs
            for d in dsts
        ]
    )
    tot = cnt.select(
        "*",
        *[
            F.expr(" + ".join(f"c_{s}_{d}" for d in dsts)).alias(
                f"tot_{s}"
            )
            for s in srcs
        ],
    )
    pr = tot.select(
        "*",
        *[
            F.expr(
                f"CASE WHEN tot_{s} = 0 THEN 0.0 "
                f"ELSE CAST(c_{s}_{d} AS DOUBLE) / tot_{s} END"
            ).alias(f"pr_{s}_{d}")
            for s in srcs
            for d in dsts
            if d != "null"
        ],
    )
    levels, start = _markov_value_exprs()
    cur = pr
    for lvl in levels:
        cur = cur.select(
            "*", *[F.expr(expr).alias(name) for name, expr in lvl]
        )
    fin = cur.select(
        *[F.expr(expr).alias(f"p_{t}") for t, expr in start.items()]
    )
    eff = " + ".join(f"(p_full - p_{c})" for c in chans)
    rows = [
        F.struct(
            F.lit(c).alias("channel"),
            F.col("p_full").alias("p_full"),
            F.col(f"p_{c}").alias("p_removed"),
            F.expr(f"p_full - p_{c}").alias("removal_effect"),
            F.expr(f"(p_full - p_{c}) / NULLIF({eff}, 0.0)").alias(
                "attribution"
            ),
        )
        for c in chans
    ]
    return fin.select(F.explode(F.array(*rows)).alias("o")).select(
        "o.channel",
        "o.p_full",
        "o.p_removed",
        "o.removal_effect",
        "o.attribution",
    )


# ========================================================================
# q_pq_codes — product-quantization code assignment + error report
# ========================================================================

import os as _os

from ._core import _GOLDEN_DIR as _GDIR

#: Committed PQ codebook (trained once at sf0.01 by
#: tools/make_goldens.py::prepare_pq_codebook, then frozen — the
#: q_sim_ivf discipline: k-means is the one host/layout-
#: nondeterministic step, so the registered key NEVER retrains).
_PQ_CODEBOOK_PATH = _os.path.join(_GDIR, "pq_codebook.parquet")

#: FLOOR quantum for squared-distance terms (§8.20: floor of an
#: identical double is identical on both engines; ROUND is not).
_PQ_Q = 1_000_000_000_000


@register(
    "q_pq_codes",
    oracle=f"""
WITH dims AS (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS dim),
xv AS (
  SELECT e.vec_id, CAST(e.embedding[d.dim + 1] AS DOUBLE) AS x,
         d.dim // 8 AS sub, d.dim % 8 AS sd
  FROM embeddings e, dims d
),
cb AS (
  SELECT subspace, centroid, dim AS sd, value
  FROM read_parquet('{_PQ_CODEBOOK_PATH}')
),
q AS (
  SELECT xv.vec_id, xv.sub, cb.centroid,
         CAST(SUM(CAST(FLOOR({float(_PQ_Q)!r}
                * ((xv.x - cb.value) * (xv.x - cb.value)))
              AS BIGINT)) AS BIGINT) AS qdist
  FROM xv JOIN cb ON xv.sub = cb.subspace AND xv.sd = cb.sd
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, sub, centroid, qdist,
         ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                            ORDER BY qdist, centroid) AS rn
  FROM q
)
SELECT sub AS subspace, centroid AS code,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(qdist) AS BIGINT) AS sum_qdist
FROM best WHERE rn = 1
GROUP BY 1, 2
""",
)
def q_pq_codes(spark, sf_dir):
    """Product-quantization code assignment over the embedding corpus
    — the ANN MEMORY lever beside q_embedding_quantize's int8 scalar
    quantization and q_sim_ivf's partition pruning: the 64-dim vector
    splits into 8 sub-spaces of 8 dims, each assigned its nearest of
    16 frozen per-subspace centroids, compressing a 256-byte float32
    vector to 8 BYTES (one code per sub-space) while asymmetric
    distances remain computable from the codebooks.  Output is the
    per-(subspace, code) census with the summed quantization error —
    the codebook-health report (a dead code or an error-hogging cell
    means retraining).

    The codebook is a COMMITTED frozen model
    (tests/golden/pq_codebook.parquet, train-if-missing via
    tools/make_goldens.py — the q_sim_ivf discipline; k-means is the
    one nondeterministic step, assignment is not).  Determinism of
    the assignment itself is EXACT-INTEGER: each squared-dim term is
    FLOOR-quantized at 1e-12 (§8.20 — floor of identical doubles;
    float32→double casts are exact, subtraction/square identical
    IEEE), per-(vec, subspace, centroid) distances are INT64 SUMS of
    8 such terms (order-free), and the argmin rank ties break on
    centroid id — so codes, counts and sum_qdist are all exact
    integers on both engines (no double ever reaches the output; the
    BIGINT error-sum budget holds to ~1e6 vectors per output cell at
    this quantum — the documented swap past it is the §8.21 hi/lo
    pair).

    Scale shape: posexplode streams components without shuffling
    whole vectors (q_embedding_outliers discipline); the 1,024-row
    codebook broadcasts; the one shuffle is the (vec, sub, centroid)
    aggregation, map-side combinable; the argmin window partitions on
    (vec_id, sub) — full-cardinality but 16-row groups."""
    e = load_table(spark, sf_dir, "embeddings")
    cb = spark.read.parquet(_PQ_CODEBOOK_PATH).select(
        F.col("subspace").alias("sub"),
        "centroid",
        F.col("dim").alias("sd"),
        "value",
    )
    xv = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "vec_id",
        F.col("xf").cast("double").alias("x"),
        F.expr("dim div 8").alias("sub"),
        (F.col("dim") % 8).alias("sd"),
    )
    diff = F.col("x") - F.col("value")
    term = F.floor(F.lit(float(_PQ_Q)) * (diff * diff)).cast("long")
    q = (
        xv.join(F.broadcast(cb), ["sub", "sd"])
        .groupBy("vec_id", "sub", "centroid")
        .agg(F.sum(term).cast("long").alias("qdist"))
    )
    wbest = Window.partitionBy("vec_id", "sub").orderBy(
        "qdist", "centroid"
    )
    best = q.withColumn("rn", F.row_number().over(wbest)).filter(
        F.col("rn") == 1
    )
    return best.groupBy(
        F.col("sub").alias("subspace"), F.col("centroid").alias("code")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("qdist").cast("long").alias("sum_qdist"),
    )


# ========================================================================
# q_brown_forsythe — variance-homogeneity test (Levene, median centers)
# ========================================================================

#: F(0.95; df1=4, df2=∞) = χ²(0.95,4)/4 — frozen literal shared by both
#: engines (the asymptotic gate; the q_kruskal_wallis discipline, with
#: the verdict NULLed when a priority class is absent).
_BF_F_95_DF4_INF = 2.3719322591952885


@register(
    "q_brown_forsythe",
    oracle=f"""
WITH t AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         o_orderpriority AS grp
  FROM orders
),
med AS (
  SELECT grp, CAST(2.0 * MEDIAN(v) AS BIGINT) AS m2
  FROM t GROUP BY grp
),
z AS (
  SELECT t.grp, ABS(2 * t.v - med.m2) AS w
  FROM t JOIN med ON t.grp = med.grp
),
s AS (
  SELECT
    {", ".join(
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN w ELSE 0 END) AS BIGINT)"
        f" AS w{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN (w * w) // 4294967296"
        f" ELSE 0 END) AS BIGINT) AS qh{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN (w * w) % 4294967296"
        f" ELSE 0 END) AS BIGINT) AS ql{i}"
        for i, p in enumerate(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            start=1,
        )
    )}
  FROM z
),
h AS (
  SELECT n1 + n2 + n3 + n4 + n5 AS n,
         (CASE WHEN n1 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n2 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n3 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n4 > 0 THEN 1 ELSE 0 END
          + CASE WHEN n5 > 0 THEN 1 ELSE 0 END) AS k,
         (((CAST(w1 AS DOUBLE) * CAST(w1 AS DOUBLE) / n1
           + CAST(w2 AS DOUBLE) * CAST(w2 AS DOUBLE) / n2)
           + CAST(w3 AS DOUBLE) * CAST(w3 AS DOUBLE) / n3)
           + CAST(w4 AS DOUBLE) * CAST(w4 AS DOUBLE) / n4)
           + CAST(w5 AS DOUBLE) * CAST(w5 AS DOUBLE) / n5 AS sum_wg2,
         CAST(w1 + w2 + w3 + w4 + w5 AS DOUBLE) AS wtot,
         ((((CAST(qh1 AS DOUBLE) + CAST(qh2 AS DOUBLE))
            + CAST(qh3 AS DOUBLE)) + CAST(qh4 AS DOUBLE))
            + CAST(qh5 AS DOUBLE)) * 4294967296.0
           + ((((CAST(ql1 AS DOUBLE) + CAST(ql2 AS DOUBLE))
            + CAST(ql3 AS DOUBLE)) + CAST(ql4 AS DOUBLE))
            + CAST(ql5 AS DOUBLE)) AS qtot
  FROM s
),
f AS (
  SELECT n, k,
         ((CAST(n AS DOUBLE) - k) / (k - 1.0))
         * (sum_wg2 - (wtot * wtot) / n)
         / (qtot - sum_wg2) AS bf_f
  FROM h
)
SELECT n AS n_total, k AS k_groups,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(n - k AS BIGINT) AS df2,
       bf_f,
       CASE WHEN k = 5 THEN bf_f > {_BF_F_95_DF4_INF!r} ELSE NULL END
         AS reject_equal_variance
FROM f
""",
)
def q_brown_forsythe(spark, sf_dir):
    """Brown–Forsythe variance-homogeneity test of order value across
    the five priorities — "do the groups differ in SPREAD?": a
    one-way ANOVA (q_anova_f shape) on z = |x − median_g|, the
    median-centered Levene variant that stays level-accurate under
    the heavy-tailed revenue distributions where the mean-centered
    original (and q_anova_f's equal-variance assumption itself)
    breaks.  The diagnostic to run BEFORE trusting q_anova_f /
    q_welch_ttest's pooled-variance flavor.

    Determinism: per-group medians via the exact percentile ≡
    quantile_cont contract; 2·median is an exact integer-valued
    double (the interpolated midpoint of two int64 cents), so
    w = |2x − 2·med| is EXACT INT64 (the /2 scale cancels in the F
    ratio, both numerator and denominator being quadratic in w).
    Σw is int64; Σw² exceeds int64 → hi/lo int64 pair split at 2³²
    (§8.21) reconstructed through the shared five-term fixed-order
    double chain; W_g² squares AFTER the int64→double cast (the
    q_kruskal_wallis rule — an exact DECIMAL square would hit
    DuckDB's truncating wide-decimal cast).  Named per-group columns
    keep every cross-group sum in explicit fixed order.  Verdict vs
    the frozen asymptotic F(0.95; 4, ∞) literal, NULL when a priority
    class is absent.

    Scale shape: ONE scan + one 5-row median aggregate broadcast back
    (the medians are the only percentile machinery —
    approx_percentile is the documented swap if the group count could
    grow); the census is one map-side-combinable conditional
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        F.col("o_orderpriority").alias("grp"),
    )
    med = t.groupBy("grp").agg(
        F.expr("CAST(2.0 * percentile(v, 0.5) AS BIGINT)").alias("m2")
    )
    z = t.join(F.broadcast(med), "grp").select(
        "grp", F.abs(2 * F.col("v") - F.col("m2")).alias("w")
    )
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    aggs = []
    for i, p in enumerate(pris, start=1):
        g = F.col("grp") == p
        aggs += [
            F.sum(F.when(g, 1).otherwise(0)).cast("long").alias(f"n{i}"),
            F.sum(F.when(g, F.col("w")).otherwise(0))
            .cast("long")
            .alias(f"w{i}"),
            F.sum(
                F.when(g, F.expr("(w * w) div 4294967296")).otherwise(0)
            )
            .cast("long")
            .alias(f"qh{i}"),
            F.sum(
                F.when(g, (F.col("w") * F.col("w")) % F.lit(4294967296))
                .otherwise(0)
            )
            .cast("long")
            .alias(f"ql{i}"),
        ]
    s = z.agg(*aggs)
    wg2 = [
        F.col(f"w{i}").cast("double")
        * F.col(f"w{i}").cast("double")
        / F.col(f"n{i}")
        for i in range(1, 6)
    ]
    sum_wg2 = (((wg2[0] + wg2[1]) + wg2[2]) + wg2[3]) + wg2[4]
    n = sum(F.col(f"n{i}") for i in range(1, 6))
    k = sum(
        F.when(F.col(f"n{i}") > 0, 1).otherwise(0) for i in range(1, 6)
    )
    wtot = sum(F.col(f"w{i}") for i in range(1, 6)).cast("double")
    qh = [F.col(f"qh{i}").cast("double") for i in range(1, 6)]
    ql = [F.col(f"ql{i}").cast("double") for i in range(1, 6)]
    qtot = ((((qh[0] + qh[1]) + qh[2]) + qh[3]) + qh[4]) * F.lit(
        4294967296.0
    ) + ((((ql[0] + ql[1]) + ql[2]) + ql[3]) + ql[4])
    nd = n.cast("double")
    bf_f = (
        ((nd - k) / (k - 1.0))
        * (sum_wg2 - (wtot * wtot) / n)
        / (qtot - sum_wg2)
    )
    return s.select(
        n.alias("n_total"),
        k.alias("k_groups"),
        (k - 1).cast("long").alias("df1"),
        (n - k).cast("long").alias("df2"),
        bf_f.alias("bf_f"),
        F.when(k == 5, bf_f > F.lit(_BF_F_95_DF4_INF))
        .otherwise(F.lit(None).cast("boolean"))
        .alias("reject_equal_variance"),
    )
