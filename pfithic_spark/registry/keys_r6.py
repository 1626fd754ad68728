"""§2.16 round-6 additions: substring-level (repeated-span) dedup and
statistical-test breadth.

Every key follows the FIXTURES.md determinism rules: DECIMAL sums for
float aggregation (order-free), integer math where possible, round(9)
on final float expressions, and a full tie-break chain under every
rank/limit/window."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..io import load_table  # noqa: F401
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
