"""§2.16 round-6 additions: substring-level (repeated-span) dedup and
statistical-test breadth.

Every key follows the FIXTURES.md determinism rules: DECIMAL sums for
float aggregation (order-free), integer math where possible, round(9)
on final float expressions, and a full tie-break chain under every
rank/limit/window."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..io import epoch_us, load_table  # noqa: F401
from ._core import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
    register,
)

#: Token width of the repeated-span anchor k-grams.  8 whitespace
#: tokens is the classic train-data-hygiene span floor (Lee et al.
#: 2021 use 50 BPE tokens on web corpora; the fixture docs are short,
#: so the same shape is exercised at k=8).
SUBSTR_K = 8

#: q_assoc_rules basket-size cap — baskets larger than this are
#: dropped before pair generation (C(64,2) = 2016 pairs max per
#: basket; a 100k-item mega-basket would otherwise fan out 5e9 pairs
#: inside one join group).
ASSOC_MAX_BASKET = 64


@register(
    "q_dedup_substring",
    oracle=f"""
WITH t AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
),
g AS (
  SELECT t.doc_id, r.i AS pos,
         MD5(ARRAY_TO_STRING(toks[r.i:r.i+{SUBSTR_K - 1}], ' ')) AS h
  FROM t, UNNEST(RANGE(1, GREATEST(LEN(toks) - {SUBSTR_K - 2}, 1))) AS r(i)
),
dup AS (SELECT h FROM g GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)),
dpos AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos, pos + {SUBSTR_K - 1} AS e,
         CASE WHEN MAX(pos + {SUBSTR_K - 1}) OVER w IS NULL
                OR pos > MAX(pos + {SUBSTR_K - 1}) OVER w
              THEN 1 ELSE 0 END AS ni
  FROM dpos
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl2 AS (
  SELECT doc_id, pos, e,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e2
  FROM isl2 GROUP BY doc_id, island
),
cov AS (
  SELECT doc_id, CAST(SUM(e2 - s + 1) AS BIGINT) AS dup_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS n_tokens,
       COALESCE(cov.dup_tokens, 0) AS dup_tokens,
       COALESCE(cov.n_spans, 0) AS n_spans,
       ROUND(CAST(COALESCE(cov.dup_tokens, 0) AS DOUBLE)
             / CAST(LEN(STRING_SPLIT(d.text, ' ')) AS DOUBLE), 9)
         AS dup_ratio
FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
""",
)
def q_dedup_substring(spark, sf_dir):
    """Substring-level exact dedup (repeated-span flagging): for every
    document, the number of token positions covered by some >= K-token
    span that ALSO appears verbatim in at least one other document,
    plus the count of maximal such spans — the train-data hygiene pass
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better") that doc-level dedup cannot express.

    Distributed shape, NOT a monolithic suffix array:
    1. k-gram anchors: tokens posexplode under a per-doc window; the
       K-1 lead()s + concat_ws build each anchor fully inside
       whole-stage codegen (no interpreted higher-order lambdas — the
       round-5 54 s lesson).  Only the 32-hex MD5 of the anchor ever
       shuffles, never gram text.
    2. cross-doc flag per anchor hash: groupBy(h).agg(min(doc_id) <>
       max(doc_id)) — a map-side-combinable min/max, so a boilerplate
       anchor shared by millions of docs costs one partial pair per
       task, no posting list, no hot-key blow-up (this is WHY the flag
       beats an inverted-index join here: we never need the postings,
       only "seen in >= 2 docs").
    3. span assembly: duplicated anchor starts cover [pos, pos+K-1];
       overlapping intervals merge per doc via the running-max
       gaps-and-islands window (bounded by doc length), giving maximal
       repeated spans without pairwise doc alignment.

    The heavy joins key on doc_id (the natural parallel unit) or on
    16-byte hashes; every window is per-doc and bounded.  The gram
    chain is deliberately evaluated twice (flag agg + semi-join probe)
    rather than persisted: at 100 TB caching token-grain grams costs
    more than re-running a narrow whole-stage-codegen chain, and the
    semi-join form (unlike a min/max window over h) lets AQE
    skew-split a hot boilerplate anchor's probe rows across tasks.
    An 8 M-token planted-span scale row gates the shape in
    tools/bench_scalable.py."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.posexplode("toks").alias("pos", "tok"),
    )
    wt = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ",
        F.col("tok"),
        *[F.lead("tok", j).over(wt) for j in range(1, SUBSTR_K)],
    )
    g = (
        t.withColumn("h", F.md5(gram))
        # concat_ws SKIPS nulls, so tail positions would yield short
        # grams instead of null — cut them off explicitly
        .filter(F.col("pos") <= F.col("n_tokens") - SUBSTR_K)
        .select("doc_id", "pos", "h")
    )
    dup = (
        g.groupBy("h")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select("h")
    )
    dpos = g.join(dup, "h", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + F.lit(SUBSTR_K - 1)).alias("e")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max("e").over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dpos.withColumn(
        "ni",
        F.when(
            prev_max.isNull() | (F.col("pos") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("ni").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    cov = (
        isl.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("e").alias("e2"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e2") - F.col("s") + 1).alias("dup_tokens"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
    docs = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return docs.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double"),
            9,
        ).alias("dup_ratio"),
    )


@register(
    "q_welch_ttest",
    oracle="""
WITH s AS (
  SELECT
    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n1,
    SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS n2,
    CAST(SUM(CAST(ROUND(CASE WHEN l_returnflag = 'R'
          THEN l_extendedprice END, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sx1,
    CAST(SUM(CAST(ROUND(CASE WHEN l_returnflag = 'N'
          THEN l_extendedprice END, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
    CAST(SUM(CAST(ROUND(CASE WHEN l_returnflag = 'R'
          THEN l_extendedprice * l_extendedprice END, 4)
          AS DECIMAL(28,4))) AS DOUBLE) AS sq1,
    CAST(SUM(CAST(ROUND(CASE WHEN l_returnflag = 'N'
          THEN l_extendedprice * l_extendedprice END, 4)
          AS DECIMAL(28,4))) AS DOUBLE) AS sq2
  FROM lineitem
),
m AS (
  SELECT n1, n2, sx1 / n1 AS m1, sx2 / n2 AS m2,
         (sq1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
         (sq2 - sx2 * sx2 / n2) / (n2 - 1) AS v2
  FROM s
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(m1, 9) AS mean1, ROUND(m2, 9) AS mean2,
       ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
       ROUND(
         (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
         / ((v1 / n1) * (v1 / n1) / (n1 - 1)
            + (v2 / n2) * (v2 / n2) / (n2 - 1)), 3) AS df
FROM m
""",
)
def q_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance two-sample t-test (statistic + the
    Welch–Satterthwaite degrees of freedom) comparing returned vs
    non-returned line-item prices — the A/B-test primitive.  ONE scan
    builds both groups' sufficient statistics as conditional
    DECIMAL sums (map-side combinable, order-free per FIXTURES §4);
    the closed form then runs on a 1-row frame with the identical
    double-arithmetic order as the oracle, so the statistic is
    bit-stable.  No p-value column: the t CDF needs betainc (Python
    kernel) and the statistic itself is the distributable part."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")

    def cond(flag, expr, scale, prec):
        return F.sum(
            F.round(F.when(F.col("l_returnflag") == flag, expr), scale).cast(
                f"decimal({prec},{scale})"
            )
        ).cast("double")

    s = li.agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n1"),
        F.sum(
            F.when(F.col("l_returnflag") == "N", 1).otherwise(0)
        ).alias("n2"),
        cond("R", x, 2, 18).alias("sx1"),
        cond("N", x, 2, 18).alias("sx2"),
        cond("R", x * x, 4, 28).alias("sq1"),
        cond("N", x * x, 4, 28).alias("sq2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1, m2 = F.col("sx1") / n1, F.col("sx2") / n2
    v1 = (F.col("sq1") - F.col("sx1") * F.col("sx1") / n1) / (n1 - 1)
    v2 = (F.col("sq2") - F.col("sx2") * F.col("sx2") / n2) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    return s.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(m1, 9).alias("mean1"),
        F.round(m2, 9).alias("mean2"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 3).alias("df"),
    )


@register(
    "q_benford",
    oracle="""
WITH d AS (
  SELECT SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                AS VARCHAR), 1, 1) AS digit
  FROM orders
),
c AS (SELECT digit, COUNT(*) AS cnt FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM c),
e AS (
  SELECT digit, cnt,
         CASE digit WHEN '1' THEN 0.301029996 WHEN '2' THEN 0.176091259
                    WHEN '3' THEN 0.124938737 WHEN '4' THEN 0.096910013
                    WHEN '5' THEN 0.079181246 WHEN '6' THEN 0.066946790
                    WHEN '7' THEN 0.057991947 WHEN '8' THEN 0.051152522
                    WHEN '9' THEN 0.045757491 END AS expected
  FROM c
)
SELECT e.digit, CAST(e.cnt AS BIGINT) AS cnt,
       ROUND(e.cnt / t.n, 9) AS share,
       e.expected,
       ROUND(ABS(ROUND(e.cnt / t.n, 9) - e.expected), 9) AS abs_dev
FROM e CROSS JOIN t
""",
)
def q_benford(spark, sf_dir):
    """Benford first-significant-digit audit of order totals — the
    classic fraud/corruption data-quality screen.  The first digit is
    taken from the INTEGER cents string (round(x*100) → bigint →
    string), never via log10/pow (FIXTURES §8.10: libm 1-ulp drift in
    hashed expressions) and never via double→string formatting (which
    differs across engines in scientific-notation edge cases).  The
    expected Benford mass is a shared literal table (log10(1+1/d)
    pre-rounded to 9), so both engines compare against identical
    constants.  One scan; the digit table is <= 9 rows."""
    o = load_table(spark, sf_dir, "orders")
    c = (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("long")
                .cast("string"),
                1,
                1,
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t = c.agg(F.sum("cnt").cast("double").alias("n"))
    expected = F.create_map(
        *[
            y
            for d, p in [
                ("1", 0.301029996), ("2", 0.176091259), ("3", 0.124938737),
                ("4", 0.096910013), ("5", 0.079181246), ("6", 0.066946790),
                ("7", 0.057991947), ("8", 0.051152522), ("9", 0.045757491),
            ]
            for y in (F.lit(d), F.lit(p))
        ]
    )[F.col("digit")]
    share = F.round(F.col("cnt") / F.col("n"), 9)
    return (
        c.crossJoin(F.broadcast(t))
        .withColumn("expected", expected)
        .select(
            "digit",
            F.col("cnt").cast("long").alias("cnt"),
            share.alias("share"),
            "expected",
            F.round(F.abs(share - F.col("expected")), 9).alias("abs_dev"),
        )
    )


@register(
    "q_iqr_outliers",
    oracle="""
WITH q AS (
  SELECT o_orderpriority,
         QUANTILE_CONT(o_totalprice, 0.25) AS q1,
         QUANTILE_CONT(o_totalprice, 0.75) AS q3
  FROM orders GROUP BY o_orderpriority
),
f AS (
  SELECT o_orderpriority, q1, q3,
         q1 - 1.5 * (q3 - q1) AS lo,
         q3 + 1.5 * (q3 - q1) AS hi
  FROM q
)
SELECT f.o_orderpriority,
       ROUND(f.q1, 9) AS q1, ROUND(f.q3, 9) AS q3,
       ROUND(f.lo, 9) AS lo, ROUND(f.hi, 9) AS hi,
       CAST(SUM(CASE WHEN o.o_totalprice < f.lo
                       OR o.o_totalprice > f.hi
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       COUNT(*) AS n
FROM orders o JOIN f ON o.o_orderpriority = f.o_orderpriority
GROUP BY f.o_orderpriority, f.q1, f.q3, f.lo, f.hi
""",
)
def q_iqr_outliers(spark, sf_dir):
    """Tukey-fence (1.5x IQR) outlier census per order priority — the
    box-plot rule, complementing q_outlier_mad's robust-z form.  Pass
    1 computes exact interpolated quartiles per group (identical
    linear-interpolation definition in Spark percentile() and DuckDB
    quantile_cont — the q_agg_percentile precedent); the <= 5-row fence
    table then BROADCASTS back onto the fact scan, so the second pass
    is a map-side join + count with no extra shuffle.  Fences compare
    unrounded (both engines derive bit-identical fence doubles from
    identical algebra); exposed floats round(9).  At 100 TB swap pass
    1 to approx_percentile (mergeable sketch) — the documented
    q_profile_columns trade."""
    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    f = q.select(
        "o_orderpriority",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    j = o.select("o_orderpriority", "o_totalprice").join(
        F.broadcast(f), "o_orderpriority"
    )
    return (
        j.groupBy("o_orderpriority", "q1", "q3", "lo", "hi")
        .agg(
            F.sum(
                F.when(
                    (F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "o_orderpriority",
            F.round("q1", 9).alias("q1"),
            F.round("q3", 9).alias("q3"),
            F.round("lo", 9).alias("lo"),
            F.round("hi", 9).alias("hi"),
            "n_outliers",
            "n",
        )
    )


@register(
    "q_dow_profile",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         DATE_PART('dow', o_orderdate) AS dow,
         CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1, 2
),
p AS (
  SELECT CAST(dow AS BIGINT) AS dow, COUNT(*) AS n_days,
         CAST(SUM(rev) AS DECIMAL(28,2)) AS total_rev
  FROM d GROUP BY dow
),
t AS (SELECT CAST(SUM(total_rev) AS DOUBLE) AS g FROM p)
SELECT p.dow, p.n_days,
       ROUND(CAST(p.total_rev AS DOUBLE) / p.n_days, 4)
         AS avg_daily_rev,
       ROUND(CAST(p.total_rev AS DOUBLE) / t.g, 9) AS share
FROM p CROSS JOIN t
""",
)
def q_dow_profile(spark, sf_dir):
    """Day-of-week seasonality profile of revenue — the weekly-cycle
    screen behind staffing/capacity models.  Two-level aggregation:
    the day grain collapses first (the only big shuffle), then the
    bounded <=7-row dow table derives averages and shares with a
    broadcast total.  dow is 0=Sunday on BOTH engines (Spark
    dayofweek() is 1-based Sunday, minus 1; DuckDB DATE_PART('dow')
    is 0-based Sunday).  Revenue sums are DECIMAL end to end — the
    day AND dow levels both aggregate order-free."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
    ).agg(
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    p = d.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rev").cast("decimal(28,2)").alias("total_rev"),
    )
    t = p.agg(F.sum("total_rev").cast("double").alias("g"))
    return (
        p.crossJoin(F.broadcast(t))
        .select(
            "dow",
            "n_days",
            # round(4), not round(9): the quotient's magnitude is
            # ~1e6, and 9 decimals there is 16 significant digits —
            # past double's shortest-repr boundary, where Spark's
            # BigDecimal-via-toString ROUND and DuckDB's exact-binary
            # ROUND can split by one ulp (FIXTURES §8.13 family)
            F.round(
                F.col("total_rev").cast("double") / F.col("n_days"), 4
            ).alias("avg_daily_rev"),
            F.round(
                F.col("total_rev").cast("double") / F.col("g"), 9
            ).alias("share"),
        )
    )


@register(
    "q_source_vocab_overlap",
    oracle="""
WITH st AS (
  SELECT DISTINCT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok
  FROM documents
),
sz AS (SELECT source, COUNT(*) AS nv FROM st GROUP BY source),
inter AS (
  SELECT a.source AS src1, b.source AS src2, COUNT(*) AS ni
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.src1, i.src2,
       CAST(sa.nv AS BIGINT) AS nv1, CAST(sb.nv AS BIGINT) AS nv2,
       CAST(i.ni AS BIGINT) AS n_common,
       ROUND(CAST(i.ni AS DOUBLE) / (sa.nv + sb.nv - i.ni), 9)
         AS jaccard
FROM inter i
JOIN sz sa ON sa.source = i.src1
JOIN sz sb ON sb.source = i.src2
""",
)
def q_source_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary Jaccard between corpus sources — the
    source-mix diagnostic (near-identical vocabularies flag mirrored
    crawls; disjoint ones flag domain shift).  Inverted-index shape at
    SOURCE grain: distinct (source, token) first (the only corpus-size
    shuffle), then a token-keyed self-join whose per-token fan-out is
    bounded by the SOURCE COUNT (<= C(S,2) pairs per token — a token
    lives in at most S sources after the distinct), so no hot-token
    blow-up is possible no matter how common the token; the bounded
    pair/size tables broadcast for the final closed form."""
    d = load_table(spark, sf_dir, "documents")
    st = (
        d.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .distinct()
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = st.select(F.col("source").alias("src1"), "tok")
    b = st.select(F.col("source").alias("src2"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src1") < F.col("src2"))
        .groupBy("src1", "src2")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sz.select(
        F.col("source").alias("src1"), F.col("nv").alias("nv1")
    )
    sb = sz.select(
        F.col("source").alias("src2"), F.col("nv").alias("nv2")
    )
    return (
        inter.join(F.broadcast(sa), "src1")
        .join(F.broadcast(sb), "src2")
        .select(
            "src1",
            "src2",
            "nv1",
            "nv2",
            F.col("ni").alias("n_common"),
            F.round(
                F.col("ni").cast("double")
                / (F.col("nv1") + F.col("nv2") - F.col("ni")),
                9,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# §2.17 — warehouse-analytics breadth (round-6 continuation)
# ---------------------------------------------------------------------------


@register(
    "q_star_agg",
    oracle="""
SELECT r.r_name, CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, YEAR(o.o_orderdate)
""",
)
def q_star_agg(spark, sf_dir):
    """Star-schema flatten + rollup (the TPC-H Q5 shape): discounted
    revenue by region x order-year across the full dimension chain
    lineitem > orders > customer > nation > region.  The ONLY big
    exchange is the fact-fact lineitem><orders shuffle on orderkey;
    customer/nation/region are explicitly broadcast so the dimension
    chain adds zero exchanges (plan-gated).  At 100 TB customer stops
    being broadcastable -- the documented swap is a shuffle join on
    custkey (or bucketing both sides), which adds exactly one
    exchange; the broadcast chain for nation/region never changes.

    Determinism: price*(1-discount) has exact 4-dp values, so
    ROUND(.,2) half-cent ties are REACHABLE and the engines' ROUND
    split (§8.13 family — observed at both fixture scales).  Instead
    revenue is computed in exact INTEGER 1e-4-dollar units
    (cents x (100 - discount%), both factors recovered exactly from
    the 2-dp doubles), BIGINT-summed order-free, with ONE double
    division at the end left unrounded.  Unit sums stay under 2^53
    through the 8 M-row scale (~1e9/row x 8M rows spread over ~35
    groups)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    units = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(
            "r_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (F.sum(units).cast("double") / 10000).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_hhi_concentration",
    oracle="""
WITH rv AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
           AS BIGINT) AS ru
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name, s.s_suppkey
),
m AS (
  SELECT n_name, s_suppkey, ru,
         CAST(SUM(ru) OVER (PARTITION BY n_name) AS DOUBLE) AS tot,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY ru DESC, s_suppkey) AS rnk
  FROM rv
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       (CAST(SUM((ru // 1048576) * (ru // 1048576)) AS DOUBLE)
          * 1099511627776.0
        + CAST(SUM(2 * (ru // 1048576) * (ru % 1048576)) AS DOUBLE)
          * 1048576.0
        + CAST(SUM((ru % 1048576) * (ru % 1048576)) AS DOUBLE))
         * 10000 / (MAX(tot) * MAX(tot)) AS hhi,
       CAST(SUM(CASE WHEN rnk <= 4 THEN ru END) AS DOUBLE) / MAX(tot)
         AS cr4
FROM m
GROUP BY n_name
""",
)
def q_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman revenue-concentration index + CR4
    (top-4 concentration ratio) of suppliers within each nation --
    the market-concentration screen.  One fact scan collapses to
    (nation, supplier) grain (the only corpus-size shuffle; supplier
    and nation broadcast); the HHI/CR4 algebra runs on that bounded
    table via margin windows, per the q_chi_square one-chain
    discipline (branching would rescan the fact).

    Determinism: revenue is exact INTEGER 1e-4-dollar units (the
    q_star_agg form -- rounded quotient shares hit reachable 9th-
    decimal ties, observed at sf0.01).  HHI = 1e4 * sum(ru^2)/tot^2;
    sum(ru^2) exceeds int64, and DuckDB's wide-DECIMAL->DOUBLE cast
    is not correctly rounded (~0.7% of values land 1 ulp low --
    round-8 finding, FIXTURES 8.21; with this key's UNROUNDED hhi a
    fixture regeneration had real odds of a hash flip), so ru splits
    at 2^20 into int64 hi/lo piece-sums reconstructed through the
    shared spelling A*2^40 + B*2^20 + C (power-of-two multiplies
    exact, two identical rounded adds; budget: the binding piece-sum
    is sum((ru div 2^20)^2) <= 2^62, i.e. ru < ~2^41 at <=1e6
    suppliers per nation -- ADVICE r8 correction; Spark's sum(long)
    wraps silently past it while DuckDB promotes to HUGEINT, so
    wider pieces / a 2^22 split are the swap BEFORE the budget, not
    after a divergence).
    tot^2 / divisions stay identical IEEE doubles, unrounded.  CR4
    sums the top-4 ru as integers (< 2^53, hardware-exact cast) with
    ONE final division.  Rank ties break on s_suppkey."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    units = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    rv = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(units).alias("ru"))
    )
    m = rv.select(
        "n_name",
        "s_suppkey",
        "ru",
        F.sum("ru")
        .over(W.partitionBy("n_name"))
        .cast("double")
        .alias("tot"),
        F.row_number()
        .over(W.partitionBy("n_name").orderBy(F.desc("ru"), "s_suppkey"))
        .alias("rnk"),
    )
    rh = F.expr("ru div 1048576")
    rl = F.col("ru") % F.lit(1048576)
    syy = (
        F.sum(rh * rh).cast("double") * F.lit(1099511627776.0)
        + F.sum(2 * rh * rl).cast("double") * F.lit(1048576.0)
        + F.sum(rl * rl).cast("double")
    )
    return m.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        (syy * 10000 / (F.max("tot") * F.max("tot"))).alias("hhi"),
        (
            F.sum(F.when(F.col("rnk") <= 4, F.col("ru"))).cast("double")
            / F.max("tot")
        ).alias("cr4"),
    )


@register(
    "q_cramers_v",
    oracle="""
WITH o AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         COUNT(*) AS obs
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
),
m AS (
  SELECT seg, pri, obs,
         SUM(obs) OVER (PARTITION BY seg) AS r,
         SUM(obs) OVER (PARTITION BY pri) AS c,
         SUM(obs) OVER () AS n
  FROM o
),
a AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND(
           CAST(obs * n - r * c AS DOUBLE)
           * CAST(obs * n - r * c AS DOUBLE)
           / (CAST(n AS DOUBLE) * r * c), 9) AS DECIMAL(28,9)))
         AS DOUBLE), 6) AS chi2,
         CAST(COUNT(DISTINCT seg) AS BIGINT) AS r_levels,
         CAST(COUNT(DISTINCT pri) AS BIGINT) AS c_levels,
         CAST(MAX(n) AS BIGINT) AS n
  FROM m
  HAVING COUNT(*) > 0
)
SELECT r_levels, c_levels, n, chi2,
       ROUND(SQRT(chi2 / (n * LEAST(r_levels - 1, c_levels - 1))), 9)
         AS cramers_v
FROM a
""",
)
def q_cramers_v(spark, sf_dir):
    """Cramer's V association strength between customer market
    segment and order priority -- the normalized effect size on top
    of q_chi_square's statistic (chi2 alone grows with n; V in [0,1]
    is comparable across table sizes).  Same one-chain discipline:
    one join + one groupBy to the bounded 5x5 crosstab, margins as
    windows over it, cell terms round(9)-then-DECIMAL summed.  V is
    derived FROM THE ROUNDED chi2 (both engines start from the
    identical 6-dp value, so the sqrt is bit-identical); customer
    broadcasts at fixture scale -- the 100 TB swap is a shuffle join
    on custkey, nothing downstream changes."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ct = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    m = ct.select(
        "seg",
        "pri",
        "obs",
        F.sum("obs").over(W.partitionBy("seg")).alias("r"),
        F.sum("obs").over(W.partitionBy("pri")).alias("c"),
        F.sum("obs").over(W.partitionBy()).alias("n"),
    )
    diff = (
        F.col("obs") * F.col("n") - F.col("r") * F.col("c")
    ).cast("double")
    a = m.agg(
        F.round(
            F.sum(
                F.round(
                    diff
                    * diff
                    / (
                        F.col("n").cast("double")
                        * F.col("r")
                        * F.col("c")
                    ),
                    9,
                ).cast("decimal(28,9)")
            ).cast("double"),
            6,
        ).alias("chi2"),
        F.countDistinct("seg").alias("r_levels"),
        F.countDistinct("pri").alias("c_levels"),
        F.max("n").alias("n"),
    )
    return a.select(
        "r_levels",
        "c_levels",
        "n",
        "chi2",
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.least(
                        F.col("r_levels") - 1, F.col("c_levels") - 1
                    )
                )
            ),
            9,
        ).alias("cramers_v"),
    )


@register(
    "q_anova_f",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp, COUNT(*) AS n_g,
         CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s_g,
         CAST(SUM(CAST(ROUND(o_totalprice * o_totalprice, 2)
                  AS DECIMAL(28,2))) AS DECIMAL(38,2)) AS q_g
  FROM orders GROUP BY o_orderpriority
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS DOUBLE) AS s,
         CAST(SUM(q_g) AS DOUBLE) AS q,
         CAST(SUM(CAST(ROUND(
             CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g, -2)
           AS DECIMAL(38,2))) AS DOUBLE) AS t
  FROM g
)
SELECT k, n,
       ROUND((t - s * s / n) / (k - 1)
             / ((q - t) / (n - k)), 6) AS f_stat,
       ROUND((t - s * s / n) / (q - s * s / n), 9) AS eta_sq
FROM a
""",
)
def q_anova_f(spark, sf_dir):
    """One-way ANOVA F statistic (+ eta-squared effect size) of order
    value across order priorities -- the k-group generalization of
    q_welch_ttest.  ONE fact scan to per-group sufficient sums
    (n, S, Q; map-side combinable DECIMAL), then closed forms on the
    bounded k-row table: SSB = T - S^2/N, SSW = Q - T with
    T = sum_g S_g^2/n_g.  The cross-group sum of T's double terms is
    made order-free by round(term, -2)-then-DECIMAL (terms reach
    ~6e14: 15 sig digits at scale -2, inside the §8.14 boundary;
    the 1e-13 relative loss is 1e5x below f_stat's 6-dp round).
    eta_sq <= 1 takes round(9)."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("s_g"),
        F.sum(
            F.round(
                F.col("o_totalprice") * F.col("o_totalprice"), 2
            ).cast("decimal(28,2)")
        )
        .cast("decimal(38,2)")
        .alias("q_g"),
    )
    sd = F.col("s_g").cast("double")
    a = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").cast("double").alias("s"),
        F.sum("q_g").cast("double").alias("q"),
        F.sum(
            F.round(sd * sd / F.col("n_g"), -2).cast("decimal(38,2)")
        )
        .cast("double")
        .alias("t"),
    )
    ssb = F.col("t") - F.col("s") * F.col("s") / F.col("n")
    sst = F.col("q") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("t")
    return a.select(
        "k",
        "n",
        F.round(
            ssb / (F.col("k") - 1) / (ssw / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(ssb / sst, 9).alias("eta_sq"),
    )


def assoc_basket_table(li):
    """Distinct (basket, item) table with the hot-basket cap applied
    (baskets over ASSOC_MAX_BASKET items dropped — the max_df analog).
    Factored out so test_plans can gate the REAL plan including the
    cap's size-count + left-semi join."""
    b0 = li.select("l_orderkey", "l_partkey").distinct()
    ok = (
        b0.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") <= ASSOC_MAX_BASKET)
        .select("l_orderkey")
    )
    return b0.join(ok, "l_orderkey", "left_semi")


def assoc_rules_from_baskets(b):
    """Lazy assoc-rules plan over a (capped) basket table: pair
    self-join -> min-support prune -> broadcast margins -> top-100
    under the full integer tie-break."""
    ic = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    nb = b.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    a = b.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa")
    )
    b2 = b.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb")
    )
    p = (
        a.join(b2, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    ia = F.broadcast(
        ic.select(F.col("l_partkey").alias("pa"), F.col("cnt").alias("supp_a"))
    )
    ib = F.broadcast(
        ic.select(F.col("l_partkey").alias("pb"), F.col("cnt").alias("supp_b"))
    )
    return (
        p.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(nb))
        .select(
            "pa",
            "pb",
            "support",
            "supp_a",
            "supp_b",
            "n_baskets",
            (F.col("support").cast("double") / F.col("supp_a")).alias(
                "conf_ab"
            ),
            (F.col("support").cast("double") / F.col("supp_b")).alias(
                "conf_ba"
            ),
            (
                (F.col("support") * F.col("n_baskets")).cast("double")
                / (F.col("supp_a") * F.col("supp_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "pa", "pb")
        .limit(100)
    )


@register(
    "q_assoc_rules",
    oracle="""
WITH b0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ok AS (SELECT l_orderkey FROM b0 GROUP BY l_orderkey
       HAVING COUNT(*) <= 64),
b AS (SELECT b0.* FROM b0 JOIN ok USING (l_orderkey)),
ic AS (SELECT l_partkey, COUNT(*) AS cnt FROM b GROUP BY l_partkey),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
p AS (
  SELECT a.l_partkey AS pa, b2.l_partkey AS pb, COUNT(*) AS support
  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
                    AND a.l_partkey < b2.l_partkey
  GROUP BY a.l_partkey, b2.l_partkey
  HAVING COUNT(*) >= 2
)
SELECT p.pa, p.pb, CAST(p.support AS BIGINT) AS support,
       CAST(ia.cnt AS BIGINT) AS supp_a, CAST(ib.cnt AS BIGINT) AS supp_b,
       CAST(nb.n AS BIGINT) AS n_baskets,
       CAST(p.support AS DOUBLE) / ia.cnt AS conf_ab,
       CAST(p.support AS DOUBLE) / ib.cnt AS conf_ba,
       CAST(p.support * nb.n AS DOUBLE) / (ia.cnt * ib.cnt) AS lift
FROM p
JOIN ic ia ON ia.l_partkey = p.pa
JOIN ic ib ON ib.l_partkey = p.pb
CROSS JOIN nb
ORDER BY support DESC, pa, pb
LIMIT 100
""",
)
def q_assoc_rules(spark, sf_dir):
    """Market-basket association rules over order baskets: top-100
    part pairs by co-occurrence support with confidence (both
    directions) and lift -- the recommender / cross-sell primitive.
    Pair generation is a self-join on the basket key whose fan-out is
    bounded by basket size (C(B,2) per order; TPC-H baskets are <=13
    items) AND capped: baskets over ASSOC_MAX_BASKET=64 items are
    dropped up front (the max_df analog — a degenerate mega-basket
    would fan out C(B,2) pairs inside one join group; the planted
    100k-item-basket scale row proves the cap bounds the join), and
    min-support pruning drops singleton pairs before the margin
    joins.  The capped basket table branches three ways (pairs / item
    counts / basket count) so it is persisted once (triangle/pagerank
    discipline).  Confidence and lift are single divisions of exact
    integers, left unrounded; top-100 runs as TakeOrderedAndProject
    under the full integer tie-break (support desc, pa, pb).  Plan
    construction lives in assoc_basket_table / assoc_rules_from_
    baskets so test_plans gates the REAL shipped plan."""
    li = load_table(spark, sf_dir, "lineitem")
    b = assoc_basket_table(li).persist()
    try:
        out = assoc_rules_from_baskets(b)
        # bounded (<=100 rows): eager localCheckpoint materializes the
        # result while b is still cached, so the unpersist below can't
        # force a 3x recompute of the basket scan (triangle/pagerank
        # persist discipline)
        out = out.localCheckpoint(eager=True)
    finally:
        b.unpersist()
    return out


@register(
    "q_cusum_changepoint",
    oracle="""
WITH d AS (
  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT grp, day, c,
         SUM(c) OVER (PARTITION BY grp ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day) AS t,
         SUM(c) OVER (PARTITION BY grp) AS s,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM d
),
dev AS (
  SELECT grp, day, n,
         ABS(CAST(n AS BIGINT) * cum - CAST(t AS BIGINT) * s) AS a,
         ROW_NUMBER() OVER (PARTITION BY grp
             ORDER BY ABS(CAST(n AS BIGINT) * cum
                          - CAST(t AS BIGINT) * s) DESC, day) AS r
  FROM w
)
SELECT grp, STRFTIME(day, '%Y-%m-%d') AS cp_day,
       CAST(n AS BIGINT) AS n_days,
       CAST(a AS DOUBLE) / (CAST(n AS DOUBLE) * 100) AS cusum_abs
FROM dev WHERE r = 1
""",
)
def q_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint estimate per order-priority series: the day
    maximizing |cumulative deviation from the series mean| of daily
    revenue -- the level-shift detector behind drift monitoring.
    The statistic is EXACT INTEGER algebra end to end:
    n*CUSUM_t = n*cumsum_t - t*S avoids the mean division inside the
    scan (the q_ks_test trick) — products run in DECIMAL(38,0)
    (exact to cumsum ~1e27; DuckDB's HUGEINT window sums match), so
    the argmax is bit-deterministic at any fixture scale;
    ONE double division at the end converts to dollars, unrounded.
    One fact scan collapses to (priority, day) grain (map-side
    combinable); every window runs on that bounded table, partitioned
    by series.  Argmax ties break on earliest day."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    d = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(cents).alias("c"))
    wo = W.partitionBy("grp").orderBy("day")
    wf = W.partitionBy("grp")
    w = d.select(
        "grp",
        "day",
        F.sum("c").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wo).alias("t"),
        F.sum("c").over(wf).alias("s"),
        F.count(F.lit(1)).over(wf).alias("n"),
    )
    # DECIMAL, not int64: n*cum at the 8 M scale is ~3e17 (only ~30x
    # of headroom under 2^63, and a bigger fixture would first hit
    # Spark's ANSI overflow error while DuckDB's HUGEINT window sums
    # stay exact).  (10,0)x(27,0) products stay inside DECIMAL(38,0),
    # exact to cum ~ 1e27 — effectively unbounded for revenue cents
    a = F.abs(
        F.col("n").cast("decimal(10,0)")
        * F.col("cum").cast("decimal(27,0)")
        - F.col("t").cast("decimal(10,0)") * F.col("s").cast("decimal(27,0)")
    )
    dev = w.select(
        "grp",
        "day",
        "n",
        a.alias("a"),
        F.row_number()
        .over(W.partitionBy("grp").orderBy(a.desc(), "day"))
        .alias("r"),
    )
    return dev.filter(F.col("r") == 1).select(
        "grp",
        F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
        F.col("n").alias("n_days"),
        (
            F.col("a").cast("double") / (F.col("n").cast("double") * 100)
        ).alias("cusum_abs"),
    )


@register(
    "q_rolling_corr",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
w AS (
  SELECT day,
         COUNT(*) OVER tw AS n,
         SUM(x) OVER tw AS sx,
         SUM(y) OVER tw AS sy,
         SUM(x * x) OVER tw AS sxx,
         SUM(x * y) OVER tw AS sxy,
         SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
           OVER tw AS syy,
         CAST(SUM((y // 1048576) * (y // 1048576)) OVER tw AS BIGINT)
           AS syy_a,
         CAST(SUM(2 * (y // 1048576) * (y % 1048576)) OVER tw AS BIGINT)
           AS syy_b,
         CAST(SUM((y % 1048576) * (y % 1048576)) OVER tw AS BIGINT)
           AS syy_c
  FROM d
  WINDOW tw AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day,
       CASE WHEN CAST(n AS BIGINT) * sxx - sx * sx > 0
             AND CAST(28 AS DECIMAL(19,0)) * syy
                 - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                 > 0
            THEN CAST(CAST(n AS BIGINT) * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(CAST(n AS BIGINT) * sxx - sx * sx AS DOUBLE)
                        * (28.0
                           * (CAST(syy_a AS DOUBLE) * 1099511627776.0
                              + CAST(syy_b AS DOUBLE) * 1048576.0
                              + CAST(syy_c AS DOUBLE))
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
            END AS corr_28d
FROM w WHERE n = 28
""",
)
def q_rolling_corr(spark, sf_dir):
    """Trailing-28-day rolling Pearson correlation between daily order
    count and daily revenue — the co-movement monitor behind
    mix-shift alerts (volume up while revenue flat = smaller orders).
    Sufficient stats (n, Σx, Σy, Σx², Σxy, Σy²) accumulate EXACTLY in
    the window: counts/cross-terms in BIGINT; Σy² is carried TWICE —
    once in DECIMAL(19)² for the exact zero-variance GUARD (compare
    only, never cast), and once as 2²⁰-split int64 piece-sums whose
    shared reconstruction A·2⁴⁰ + B·2²⁰ + C feeds the VALUE path
    (round-8 FIXTURES §8.21: DuckDB's wide-DECIMAL→DOUBLE cast lands
    1 ulp low on ~0.7% of values, a real hash-flip risk for this
    key's unrounded output; binding piece-sum is the 28-row
    Σ(y div 2²⁰)² ≤ 2⁶² ⇒ daily cents < ~2⁴⁸ — the stated working
    budget 2⁴⁰ ≈ 100× the sf0.1 level sits well inside it).  corr's num/den then run one
    division + sqrt, unrounded — identical IEEE on both engines.  One fact scan to day grain; the window runs on the
    bounded (~2.4k-row) day table — at 100 TB the day grain is still
    bounded, so the single-partition window is fine by construction.
    Rows without a full 28-day history are excluded; zero-variance
    windows yield NULL."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("x"), F.sum(cents).alias("y")
    )
    tw = W.orderBy("day").rowsBetween(-27, 0)
    ydec = F.col("y").cast("decimal(19,0)")
    yh = F.expr("y div 1048576")
    yl = F.col("y") % F.lit(1048576)
    w = d.select(
        "day",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum("x").over(tw).alias("sx"),
        F.sum("y").over(tw).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(tw).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(tw).alias("sxy"),
        F.sum(ydec * ydec).over(tw).alias("syy"),
        F.sum(yh * yh).over(tw).cast("long").alias("syy_a"),
        F.sum(2 * yh * yl).over(tw).cast("long").alias("syy_b"),
        F.sum(yl * yl).over(tw).cast("long").alias("syy_c"),
    )
    den1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    sydec = F.col("sy").cast("decimal(19,0)")
    # the GUARD compares the exact DECIMAL (no cast, no rounding risk)
    den2_exact = (
        F.lit(28).cast("decimal(19,0)") * F.col("syy") - sydec * sydec
    )
    # the VALUE reconstructs Σy² from 2^20-split int64 piece-sums
    # (§8.21: DuckDB's wide-DECIMAL→DOUBLE cast is not correctly
    # rounded; with this key's unrounded output a fixture regeneration
    # had ~0.7%-per-window odds of a hash flip)
    syy_d = (
        F.col("syy_a").cast("double") * F.lit(1099511627776.0)
        + F.col("syy_b").cast("double") * F.lit(1048576.0)
        + F.col("syy_c").cast("double")
    )
    den2_d = (
        F.lit(28.0) * syy_d
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return w.filter(F.col("n") == 28).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(
            (den1 > 0) & (den2_exact > 0),
            num.cast("double") / F.sqrt(den1.cast("double") * den2_d),
        ).alias("corr_28d"),
    )


@register(
    "q_seasonal_decompose",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         DATE_PART('dow', o_orderdate) AS dow,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT day, CAST(dow AS BIGINT) AS dow, c,
         SUM(c) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS s7,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS nd
  FROM d
),
inner_days AS (
  SELECT day, dow, c, s7, 7 * c - s7 AS det
  FROM w WHERE rn >= 4 AND rn <= nd - 3
),
seas AS (
  SELECT day, dow, c, s7, det,
         SUM(det) OVER (PARTITION BY dow) AS sdet,
         COUNT(*) OVER (PARTITION BY dow) AS ndow
  FROM inner_days
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day, dow,
       CAST(c AS DOUBLE) / 100 AS revenue,
       CAST(s7 AS DOUBLE) / 700 AS trend,
       CAST(sdet AS DOUBLE) / (700.0 * ndow) AS seasonal,
       CAST(det AS DOUBLE) / 700
         - CAST(sdet AS DOUBLE) / (700.0 * ndow) AS resid
FROM seas
""",
)
def q_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition of daily revenue (trend =
    centered 7-day moving average; seasonal = mean detrended value
    per day-of-week over the interior days; resid = remainder) — the
    classic series screen behind anomaly triage.  All intermediate
    algebra is EXACT INTEGER cents: detrended is scaled by 7
    (det = 7c − s7) so the per-dow seasonal mean is an integer sum
    with ONE division — no order-dependent double sums anywhere; the
    final /700 conversions are single divisions of exact integers,
    unrounded.  One fact scan to the bounded day grain; three windows
    over it (trend MA, interior gate, per-dow full frame).  Interior
    days only (rows 4..n−3): the MA is undefined at the edges."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    d = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
    ).agg(F.sum(cents).alias("c"))
    wo = W.orderBy("day")
    w = d.select(
        "day",
        "dow",
        "c",
        F.sum("c").over(wo.rowsBetween(-3, 3)).alias("s7"),
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1))
        .over(wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("nd"),
    )
    inner = w.filter(
        (F.col("rn") >= 4) & (F.col("rn") <= F.col("nd") - 3)
    ).withColumn("det", 7 * F.col("c") - F.col("s7"))
    wd = W.partitionBy("dow")
    seas = inner.select(
        "day",
        "dow",
        "c",
        "s7",
        "det",
        F.sum("det").over(wd).alias("sdet"),
        F.count(F.lit(1)).over(wd).alias("ndow"),
    )
    seasonal = F.col("sdet").cast("double") / (700.0 * F.col("ndow"))
    return seas.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        (F.col("c").cast("double") / 100).alias("revenue"),
        (F.col("s7").cast("double") / 700).alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("det").cast("double") / 700 - seasonal).alias("resid"),
    )


@register(
    "q_conversion_lag",
    oracle="""
WITH t AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN EPOCH_US(ts) END) AS fv,
         MIN(CASE WHEN event_type = 'purchase' THEN EPOCH_US(ts) END)
           AS fp
  FROM events GROUP BY user_id
),
lag AS (
  SELECT (fp - fv) // 1000000 AS lag_s
  FROM t WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       QUANTILE_CONT(lag_s, 0.25) AS p25_s,
       QUANTILE_CONT(lag_s, 0.50) AS p50_s,
       QUANTILE_CONT(lag_s, 0.75) AS p75_s,
       QUANTILE_CONT(lag_s, 0.90) AS p90_s,
       CAST(SUM(lag_s) AS DOUBLE) / COUNT(*) AS mean_s
FROM lag
""",
)
def q_conversion_lag(spark, sf_dir):
    """First-view -> first-purchase conversion latency distribution —
    the funnel-velocity KPI behind q_funnel_steps' reach counts.  ONE
    events scan to user grain via conditional MINs (map-side
    combinable; no per-type branch scans), then exact interpolated
    quantiles over integer lag seconds (Spark percentile == DuckDB
    quantile_cont on the same integers) and a mean as one unrounded
    division of exact integer sums.  Lag seconds use integer `div`
    (both engines truncate identically on the non-negative domain —
    FIXTURES §8.7).  Users who purchased before ever viewing are
    excluded (attribution rule, documented).  At 100 TB the quantile
    swap is approx_percentile, as in q_agg_percentile."""
    ev = load_table(spark, sf_dir, "events")
    us = epoch_us(ev)
    t = ev.select(
        "user_id",
        F.when(F.col("event_type") == "view", us).alias("vus"),
        F.when(F.col("event_type") == "purchase", us).alias("pus"),
    ).groupBy("user_id").agg(
        F.min("vus").alias("fv"), F.min("pus").alias("fp")
    )
    lag = t.filter(
        F.col("fv").isNotNull()
        & F.col("fp").isNotNull()
        & (F.col("fp") >= F.col("fv"))
    ).select(F.expr("(fp - fv) div 1000000").alias("lag_s"))
    return lag.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr("percentile(lag_s, 0.25)").alias("p25_s"),
        F.expr("percentile(lag_s, 0.50)").alias("p50_s"),
        F.expr("percentile(lag_s, 0.75)").alias("p75_s"),
        F.expr("percentile(lag_s, 0.90)").alias("p90_s"),
        (F.sum("lag_s").cast("double") / F.count(F.lit(1))).alias(
            "mean_s"
        ),
    )


@register(
    "q_gains_table",
    oracle="""
WITH rc AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
nt AS (
  SELECT o_custkey, cents,
         NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
  FROM rc
),
d AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS c
  FROM nt GROUP BY decile
),
m AS (
  SELECT decile, n_customers, c,
         CAST(SUM(c) OVER () AS DOUBLE) AS tot,
         CAST(SUM(c) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
  FROM d
)
SELECT decile, n_customers,
       CAST(c AS DOUBLE) / 100 AS revenue,
       CAST(c AS DOUBLE) / tot AS share,
       CAST(cum AS DOUBLE) / tot AS cum_share
FROM m
""",
)
def q_gains_table(spark, sf_dir):
    """Decile gains/lift table: customers ranked by total spend,
    cut into revenue deciles, with each decile's share and cumulative
    share — the campaign-targeting curve ("top decile holds X% of
    revenue").  NTILE runs under the fully deterministic order
    (cents desc, custkey); Spark and DuckDB share the ceil-split
    NTILE definition, so decile assignment is identical.  Revenue is
    exact integer cents (§8.15); share/cum_share are single unrounded
    divisions.  One orders scan to customer grain; the global ranking
    window runs at CUSTOMER cardinality — bounded at fixture scale;
    the 100 TB swap is the two-phase global order of
    windows.scalable_cumsum feeding rank = cum_count, as in
    q_ks_test's documented swap.  Downstream margins ride the 10-row
    decile table."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    rc = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    nt = rc.select(
        "cents",
        F.ntile(10)
        .over(W.orderBy(F.desc("cents"), "o_custkey"))
        .alias("decile"),
    )
    d = nt.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("c"),
    )
    m = d.select(
        "decile",
        "n_customers",
        "c",
        F.sum("c")
        .over(W.orderBy("decile").rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        ))
        .cast("double")
        .alias("tot"),
        F.sum("c")
        .over(W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    return m.select(
        "decile",
        "n_customers",
        (F.col("c").cast("double") / 100).alias("revenue"),
        (F.col("c").cast("double") / F.col("tot")).alias("share"),
        (F.col("cum").cast("double") / F.col("tot")).alias("cum_share"),
    )


@register(
    "q_dedup_lsh_cosine",
    oracle="""
WITH bits AS (
  SELECT e.vec_id, t.j,
         CASE WHEN LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
           i -> (CASE WHEN BIT_COUNT(t.j & CAST(i - 1 AS BIGINT)) % 2 = 0
                      THEN 1 ELSE -1 END)
                * CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE)
                             * 1073741824) AS BIGINT)
         )) >= 0 THEN 1 ELSE 0 END AS b
  FROM embeddings e, UNNEST(GENERATE_SERIES(1, 16)) AS t(j)
),
sig AS (
  SELECT vec_id,
         SUM(CASE WHEN j <= 8 THEN b * (1 << (j - 1)) ELSE 0 END)
           AS band0,
         SUM(CASE WHEN j > 8 THEN b * (1 << (j - 9)) ELSE 0 END)
           AS band1
  FROM bits GROUP BY vec_id
),
cand AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM sig a JOIN sig b
    ON a.vec_id < b.vec_id
   AND (a.band0 = b.band0 OR a.band1 = b.band1)
)
SELECT c.id1, c.id2,
       ROUND(
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
           i -> CAST(x.embedding[i] AS DOUBLE)
                * CAST(y.embedding[i] AS DOUBLE)))
         / (SQRT(LIST_SUM(LIST_TRANSFORM(x.embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * SQRT(LIST_SUM(LIST_TRANSFORM(y.embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
       6) AS cosine
FROM cand c
JOIN embeddings x ON x.vec_id = c.id1
JOIN embeddings y ON y.vec_id = c.id2
WHERE ROUND(
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
           i -> CAST(x.embedding[i] AS DOUBLE)
                * CAST(y.embedding[i] AS DOUBLE)))
         / (SQRT(LIST_SUM(LIST_TRANSFORM(x.embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * SQRT(LIST_SUM(LIST_TRANSFORM(y.embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
       6) >= 0.25
""",
)
def q_dedup_lsh_cosine(spark, sf_dir):
    """Random-hyperplane LSH near-dup pairs over embeddings —
    DATA-INDEPENDENT blocking (q_dedup_embedding needs an external
    label; q_sim_ivf needs trained centroids; this needs nothing):
    16 WALSH-HADAMARD ±1 hyperplanes (mutually orthogonal —
    see llmops.lsh_plane_sign on why a lazy hash family collapses
    into quadratic buckets) -> 2 signature bands of 8 bits;
    pairs sharing a band verify by exact cosine >= 0.25.

    The scale crux is SIGN DETERMINISM: hyperplane dots run on
    floor(v[i]·2^30) EXACT INTEGERS (power-of-two float scaling is
    exact; floor is tie-free), so the ±1-weighted sums are order-free
    BIGINT aggregates — no float-sum sign flips near 0, bit-identical
    under any partitioning.  One posexplode + ONE groupBy builds all
    16 dots as conditional integer sums (no plane-table join, no
    per-plane row blow-up); banding bounds the self-join per bucket
    exactly as MinHash banding does for text (llmops.lsh_cosine_pairs)."""
    from .. import llmops

    e = load_table(spark, sf_dir, "embeddings")
    return llmops.lsh_cosine_pairs(
        e, n_planes=16, n_bands=2, threshold=0.25
    )


@register(
    "q_control_chart",
    oracle="""
WITH d AS (
  SELECT EPOCH_US(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err
  FROM events GROUP BY 1
),
m AS (
  SELECT day, n, err,
         SUM(n) OVER () AS tn, SUM(err) OVER () AS te
  FROM d
),
c AS (
  SELECT day, n, err,
         CAST(err AS DOUBLE) / n AS rate,
         CAST(te AS DOUBLE) / tn AS pbar,
         3 * SQRT(CAST(te AS DOUBLE) / tn
                  * (1 - CAST(te AS DOUBLE) / tn) / n) AS sigma3
  FROM m
)
SELECT day, n, err, rate,
       pbar + sigma3 AS ucl,
       GREATEST(pbar - sigma3, 0.0) AS lcl,
       CAST(rate > pbar + sigma3
            OR rate < GREATEST(pbar - sigma3, 0.0) AS BOOLEAN)
         AS out_of_control
FROM c
""",
)
def q_control_chart(spark, sf_dir):
    """p-chart (attribute control chart) of the daily error-event
    rate with 3-sigma Shewhart limits — the SPC screen behind
    reliability alerting.  One events scan to day grain; the global
    center line p-bar rides a full-frame window over the bounded day
    table (one chain — branching into a separate global agg would
    rescan events).  Every number derives from exact integer counts
    through IDENTICAL double expressions (one division each, sqrt is
    correctly rounded IEEE), left unrounded; the out_of_control flag
    compares those identical doubles, so it cannot disagree between
    engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    # day index via epoch_us (the q_wau form): event-time arithmetic
    # must survive the fixture ts-encoding flips recorded in
    # FIXTURES/io.epoch_us — never to_date(ts) directly.  The err sum
    # uses WHEN/OTHERWISE(0), not a bool cast: an all-NULL-event_type
    # day would make sum(cast) NULL while the oracle's CASE..ELSE 0
    # yields 0
    d = ev.groupBy(
        F.floor(epoch_us(ev, "ts") / F.lit(86_400_000_000)).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("long").alias("err"),
    )
    wf = W.partitionBy()
    m = d.select(
        "day",
        "n",
        "err",
        F.sum("n").over(wf).alias("tn"),
        F.sum("err").over(wf).alias("te"),
    )
    rate = F.col("err").cast("double") / F.col("n")
    pbar = F.col("te").cast("double") / F.col("tn")
    sigma3 = 3 * F.sqrt(
        F.col("te").cast("double")
        / F.col("tn")
        * (1 - F.col("te").cast("double") / F.col("tn"))
        / F.col("n")
    )
    ucl = pbar + sigma3
    lcl = F.greatest(pbar - sigma3, F.lit(0.0))
    return m.select(
        "day",
        "n",
        "err",
        rate.alias("rate"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((rate > ucl) | (rate < lcl)).alias("out_of_control"),
    )


@register(
    "q_topk_movers",
    oracle="""
WITH r AS (
  SELECT l.l_partkey AS part,
         CASE WHEN YEAR(o.o_orderdate) >= 1998 THEN 1 ELSE 0 END AS per,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
              * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
           AS BIGINT) AS ru
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
rk AS (
  SELECT part, per, ru,
         ROW_NUMBER() OVER (PARTITION BY per ORDER BY ru DESC, part)
           AS rnk
  FROM r
)
SELECT a.part,
       CAST(a.rnk AS BIGINT) AS rank_early,
       CAST(b.rnk AS BIGINT) AS rank_late,
       CAST(a.rnk - b.rnk AS BIGINT) AS rank_gain,
       CAST(a.ru AS DOUBLE) / 10000 AS rev_early,
       CAST(b.ru AS DOUBLE) / 10000 AS rev_late
FROM rk a JOIN rk b ON a.part = b.part AND a.per = 0 AND b.per = 1
ORDER BY ABS(a.rnk - b.rnk) DESC, a.part
LIMIT 20
""",
)
def q_topk_movers(spark, sf_dir):
    """Top-20 rank movers: parts whose revenue rank shifted most
    between the early (<1998) and late (>=1998) periods — the
    movers-and-shakers report behind assortment reviews.  Revenue is
    exact integer units (§8.15); ranks are ROW_NUMBER under the full
    integer tie-break (units desc, part) per period, so the rank
    join, gain, and the |gain| top-20 (TakeOrderedAndProject with
    part as the tie-break) are all bit-deterministic.  ONE fact scan
    to (part, period) grain; rank windows partition BY PERIOD over
    the part-grain aggregate (bounded; the 100 TB swap is the
    two-phase scalable_cumsum rank, as in q_gains_table)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    units = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    r = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("l_partkey").alias("part"),
            # WHEN/OTHERWISE(0), not a bool cast: a NULL orderdate
            # must land in period 0 on BOTH engines (the oracle's
            # CASE..ELSE 0), not in a NULL group the pivot ignores
            F.when(F.year("o_orderdate") >= 1998, 1)
            .otherwise(0)
            .alias("per"),
        )
        .agg(F.sum(units).alias("ru"))
    )
    rk = r.select(
        "part",
        "per",
        "ru",
        F.row_number()
        .over(W.partitionBy("per").orderBy(F.desc("ru"), "part"))
        .alias("rnk"),
    )
    # pivot the two periods on the SAME chain — splitting rk into
    # per==0 / per==1 branches and self-joining would RE-EXECUTE the
    # scan+join+agg+window subtree once per branch (the q_chi_square
    # branch-re-execution rule); conditional max() over the <=2 rows
    # per part is the one-chain pivot
    pv = rk.groupBy("part").agg(
        F.max(F.when(F.col("per") == 0, F.col("rnk"))).alias("rank_early"),
        F.max(F.when(F.col("per") == 1, F.col("rnk"))).alias("rank_late"),
        F.max(F.when(F.col("per") == 0, F.col("ru"))).alias("ru_e"),
        F.max(F.when(F.col("per") == 1, F.col("ru"))).alias("ru_l"),
    )
    return (
        pv.filter(
            F.col("rank_early").isNotNull() & F.col("rank_late").isNotNull()
        )
        .select(
            "part",
            "rank_early",
            "rank_late",
            (F.col("rank_early") - F.col("rank_late")).alias("rank_gain"),
            (F.col("ru_e").cast("double") / 10000).alias("rev_early"),
            (F.col("ru_l").cast("double") / 10000).alias("rev_late"),
        )
        .orderBy(
            F.abs(F.col("rank_early") - F.col("rank_late")).desc(), "part"
        )
        .limit(20)
    )


@register(
    "q_forecast_naive_eval",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1
),
w AS (
  SELECT day, c, LAG(c, 7) OVER (ORDER BY day) AS pred
  FROM d
),
e AS (
  SELECT ABS(c - pred) AS ae, c FROM w WHERE pred IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CAST(ae AS HUGEINT)) AS DOUBLE)
         / (COUNT(*) * 100.0) AS mae,
       CAST(SUM(CAST(ae AS HUGEINT) * 1000000 // CAST(c AS HUGEINT))
            AS DOUBLE) / (COUNT(*) * 1e6)
         AS mape
FROM e
""",
)
def q_forecast_naive_eval(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's revenue
    by the value 7 days (rows) earlier and report MAE / MAPE — the
    baseline every real forecasting model must beat, and the
    evaluation harness shape (lag-k prediction + error aggregate)
    that any backtest reuses.  EXACT INTEGER end to end: absolute
    errors are integer cents; MAPE's per-day ratio is the exact
    integer floor((ae·1e6)/c) computed by BASE-1000 LONG DIVISION
    (q1 = ae div c, then two more digit groups off the remainders —
    every intermediate ≤ c·1000 so nothing approaches int64 even at
    100 TB daily-revenue cents; a naive ae·1e6 wraps past ~$92 B/day
    of error in non-ANSI Spark while the DuckDB oracle errors — the
    CUSUM DECIMAL-headroom precedent, caught at round-6 review), and
    both day sums carry 128-bit headroom (DECIMAL(38,0) / HUGEINT),
    so both final statistics are single unrounded divisions at 1e-6
    resolution.  One scan to the bounded day grain; the lag window
    rides it."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(cents).alias("c")
    )
    w = d.select(
        "day", "c", F.lag("c", 7).over(W.orderBy("day")).alias("pred")
    )
    e = w.filter(F.col("pred").isNotNull()).select(
        F.abs(F.col("c") - F.col("pred")).alias("ae"), "c"
    )
    # floor(ae*1e6/c) in three base-1000 digit groups: the second and
    # third groups are remainders scaled by 1000 (< c*1000, int64-safe
    # at any cents magnitude) and each quotient digit is < 1000; the
    # FIRST group ae div c is unbounded by c (a near-zero-revenue day
    # against a huge error makes it arbitrarily large), so it widens
    # to DECIMAL before the *1e6 — raw int64 there wraps exactly the
    # way the original ae*1e6 did (second review pass).
    term = F.expr(
        "CAST((ae div c) AS DECIMAL(28,0)) * 1000000"
        " + (((ae % c) * 1000) div c) * 1000"
        " + (((((ae % c) * 1000) % c) * 1000) div c)"
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.sum(F.col("ae").cast("decimal(20,0)")).cast("double")
            / (F.count(F.lit(1)) * 100.0)
        ).alias("mae"),
        (
            F.sum(term.cast("decimal(30,0)")).cast("double")
            / (F.count(F.lit(1)) * 1e6)
        ).alias("mape"),
    )


@register(
    "q_two_proportion_ztest",
    oracle="""
WITH s AS (
  SELECT
    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
    SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
    SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'error'
             THEN 1 ELSE 0 END) AS x0,
    SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'error'
             THEN 1 ELSE 0 END) AS x1
  FROM events
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       CAST(x0 AS BIGINT) AS x0, CAST(x1 AS BIGINT) AS x1,
       CAST(x0 AS DOUBLE) / n0 AS rate0,
       CAST(x1 AS DOUBLE) / n1 AS rate1,
       CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1 THEN
         (CAST(x0 AS DOUBLE) / n0 - CAST(x1 AS DOUBLE) / n1)
         / SQRT(CAST(x0 + x1 AS DOUBLE) / (n0 + n1)
                * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                * (1.0 / n0 + 1.0 / n1))
       END AS z_stat
FROM s
""",
)
def q_two_proportion_ztest(spark, sf_dir):
    """Two-proportion z-test on the error-event rate between the two
    user cohorts — the A/B primitive for RATES, next to q_welch_ttest
    (means) and q_chi_square (independence).  Event grain, not user
    grain: the fixture's ~670 events/user make any per-user
    "converted at least once" flag degenerate (100% both cohorts →
    pooled variance 0 → ANSI divide-by-zero, observed).  ONE events
    scan collapses to four sufficient integers via conditional sums;
    rates and the pooled-variance z are IDENTICAL double expressions
    of exact integers, unrounded; a degenerate pool (all or none)
    yields NULL z on both engines."""
    ev = load_table(spark, sf_dir, "events")
    coh = F.col("user_id") % 2
    is_err = F.col("event_type") == "error"
    s = ev.agg(
        F.sum(F.when(coh == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(coh == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when((coh == 0) & is_err, 1).otherwise(0)).alias("x0"),
        F.sum(F.when((coh == 1) & is_err, 1).otherwise(0)).alias("x1"),
    )
    r0 = F.col("x0").cast("double") / F.col("n0")
    r1 = F.col("x1").cast("double") / F.col("n1")
    tot_x = F.col("x0") + F.col("x1")
    tot_n = F.col("n0") + F.col("n1")
    pp = tot_x.cast("double") / tot_n
    return s.select(
        "n0",
        "n1",
        "x0",
        "x1",
        r0.alias("rate0"),
        r1.alias("rate1"),
        F.when(
            (tot_x > 0) & (tot_x < tot_n),
            (r0 - r1)
            / F.sqrt(
                pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
            ),
        ).alias("z_stat"),
    )


@register(
    "q_histogram_2d",
    oracle="""
WITH t AS (
  SELECT EPOCH_US(ts) // 86400000000 AS dayidx,
         EPOCH_US(ts) % 86400000000 // 3600000000 AS hour
  FROM events
),
c AS (
  SELECT (dayidx + 4) % 7 AS dow, hour, COUNT(*) AS n
  FROM t GROUP BY 1, 2
),
m AS (SELECT dow, hour, n, SUM(n) OVER () AS tot FROM c)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / tot AS share
FROM m
""",
)
def q_histogram_2d(spark, sf_dir):
    """Day-of-week × hour-of-day activity heatmap (the 7×24 usage
    grid behind capacity planning and anomaly baselines).  Bin
    indexes are pure INTEGER arithmetic on epoch microseconds
    (io.epoch_us — survives the fixture ts-encoding flips; epoch day
    0 = Thursday, so dow = (dayidx + 4) mod 7 keeps 0=Sunday, the
    q_dow_profile convention); shares divide exact integers once,
    unrounded.  One scan to the ≤168-cell grid, total via one
    full-frame window over it."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    us = epoch_us(ev, "ts")
    t = ev.select(
        F.floor(us / F.lit(86_400_000_000)).alias("dayidx"),
        F.floor(
            (us % F.lit(86_400_000_000)) / F.lit(3_600_000_000)
        ).alias("hour"),
    )
    c = t.groupBy(
        ((F.col("dayidx") + 4) % 7).alias("dow"), "hour"
    ).agg(F.count(F.lit(1)).alias("n"))
    m = c.select(
        "dow", "hour", "n", F.sum("n").over(W.partitionBy()).alias("tot")
    )
    return m.select(
        "dow",
        "hour",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("share"),
    )
