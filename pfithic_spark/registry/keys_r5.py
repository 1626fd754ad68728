"""§2.15 round-5 additions: sampling/splitting, data-quality audits,
statistical breadth (correlation matrix, autocorrelation, rolling
median), record-linkage dedup (edit-distance, sorted-neighborhood),
Markov transitions, skew profiling, vector-norm stats, incremental
aggregation maintenance, and window breadth (cume_dist, equi-depth
discretize).

Every key follows the FIXTURES.md determinism rules: DECIMAL sums for
float aggregation (order-free), integer math where possible, round(9)
on final float expressions, and a full tie-break chain under every
rank/limit/window."""
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

# The Knuth multiplicative hash, spelled identically in Spark and
# DuckDB SQL (llmops.knuth_hash is the Column form).
_KH_SQL = "((doc_id % 2654435761) * 2654435761) % 4294967296"


@register(
    "q_sample_reservoir",
    oracle=f"""
SELECT doc_id, source, n_chars
FROM documents
ORDER BY {_KH_SQL}, doc_id
LIMIT 100
""",
)
def q_sample_reservoir(spark, sf_dir):
    """Deterministic uniform k-sample without replacement: order every
    row by a pseudo-random-but-reproducible hash of its key and keep
    the k smallest — the distributed form of reservoir sampling with a
    fixed seed (same sample on every run/partitioning, unlike
    df.sample's partition-seeded RNG).

    Scale shape: orderBy(...).limit(k) plans as TakeOrderedAndProject —
    a per-partition k-heap plus a k-row merge on the driver, never a
    global sort.  At 100 TB the scan is the whole cost."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "source", "n_chars", knuth_hash("doc_id").alias("_h"))
        .orderBy("_h", "doc_id")
        .limit(100)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "q_train_test_split",
    oracle=f"""
WITH s AS (
  SELECT CASE WHEN ({_KH_SQL}) % 10 < 8 THEN 'train'
              WHEN ({_KH_SQL}) % 10 < 9 THEN 'val'
              ELSE 'test' END AS split,
         lang
  FROM documents
),
g AS (SELECT split, lang, COUNT(*) AS n FROM s GROUP BY split, lang)
SELECT split, lang, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY split), 9) AS frac
FROM g
""",
)
def q_train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by key hash — the
    reproducible-split primitive every training pipeline needs (a row's
    split never changes as the corpus grows, because it depends only on
    its own key).  Output: per-(split, lang) counts and within-split
    fractions, i.e. the stratification audit.

    One scan + one small groupBy; the window runs on the tiny
    (split × lang) aggregate, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    h = knuth_hash("doc_id") % 10
    s = d.select(
        F.when(h < 8, "train").when(h < 9, "val").otherwise("test").alias(
            "split"
        ),
        "lang",
    )
    g = s.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n"))
    return g.select(
        "split",
        "lang",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("split")),
            9,
        ).alias("frac"),
    )


@register(
    "q_dq_checks",
    oracle="""
WITH m AS (
  SELECT COUNT(*) AS n,
         COUNT(*) - COUNT(o_custkey) AS custkey_nulls,
         COUNT(DISTINCT o_orderkey) AS key_distinct,
         MIN(o_totalprice) AS min_price,
         SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
           AS bad_status
  FROM orders
)
SELECT 'row_count' AS check, CAST(n AS DOUBLE) AS value,
       CAST(n > 0 AS BIGINT) AS passed FROM m
UNION ALL
SELECT 'o_custkey_nulls', CAST(custkey_nulls AS DOUBLE),
       CAST(custkey_nulls = 0 AS BIGINT) FROM m
UNION ALL
SELECT 'o_orderkey_unique', CAST(key_distinct AS DOUBLE),
       CAST(key_distinct = n AS BIGINT) FROM m
UNION ALL
SELECT 'o_totalprice_nonneg', ROUND(min_price, 9),
       CAST(min_price >= 0 AS BIGINT) FROM m
UNION ALL
SELECT 'o_orderstatus_domain', CAST(bad_status AS DOUBLE),
       CAST(bad_status = 0 AS BIGINT) FROM m
""",
)
def q_dq_checks(spark, sf_dir):
    """Declarative data-quality validation (the Deequ/expectations
    shape): null counts, key uniqueness, value-range and domain checks
    computed in ONE aggregate pass, emitted as a (check, value, passed)
    violations table.  At 100 TB the whole suite costs a single scan +
    one reduce — checks must never each rescan the table.

    COUNT(DISTINCT) is exact here (one column); the documented at-scale
    swap is approx_count_distinct when the audit tolerates ±2%."""
    o = load_table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("custkey_nulls"),
        F.countDistinct("o_orderkey").alias("key_distinct"),
        F.min("o_totalprice").alias("min_price"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")
        ).alias("bad_status"),
    )
    return m.select(
        F.expr(
            """stack(5,
              'row_count', CAST(n AS DOUBLE), CAST(n > 0 AS BIGINT),
              'o_custkey_nulls', CAST(custkey_nulls AS DOUBLE),
                CAST(custkey_nulls = 0 AS BIGINT),
              'o_orderkey_unique', CAST(key_distinct AS DOUBLE),
                CAST(key_distinct = n AS BIGINT),
              'o_totalprice_nonneg', ROUND(min_price, 9),
                CAST(min_price >= 0 AS BIGINT),
              'o_orderstatus_domain', CAST(bad_status AS DOUBLE),
                CAST(bad_status = 0 AS BIGINT)
            ) AS (check, value, passed)"""
        )
    )


@register(
    "q_crosstab",
    oracle="""
WITH g AS (
  SELECT event_type, user_id % 4 AS cohort, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id % 4
)
SELECT event_type, cohort, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type), 9) AS row_frac
FROM g
""",
)
def q_crosstab(spark, sf_dir):
    """Contingency table (crosstab) of event_type × user cohort with
    per-row fractions — the categorical-association audit.  One groupBy
    over the fact table; the row-normalizing window runs on the tiny
    (types × cohorts) aggregate.  Integer counts; the only float is the
    final rounded division."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("n"))
    return g.select(
        "event_type",
        "cohort",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("event_type")),
            9,
        ).alias("row_frac"),
    )


_CM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _cm_sql():
    sums = ["COUNT(*) AS n"]
    for c in _CM_COLS:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) AS s_{c}")
    for i, a in enumerate(_CM_COLS):
        for b in _CM_COLS[i:]:
            # DECIMAL(24,4) inputs force DuckDB's exact hugeint
            # multiply — an int64-width (18,4) product overflows past
            # 10^18 (the q_corr_exact rule)
            sums.append(
                f"CAST(SUM(CAST(CAST({a} AS DECIMAL(24,4))"
                f" * CAST({b} AS DECIMAL(24,4)) AS DECIMAL(38,8)))"
                f" AS DOUBLE) AS s_{a}_{b}"
            )
    pair_rows = []
    for i, a in enumerate(_CM_COLS):
        for b in _CM_COLS[i + 1 :]:
            pair_rows.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, "
                f"ROUND((n * s_{a}_{b} - s_{a} * s_{b}) / "
                f"(SQRT(n * s_{a}_{a} - s_{a} * s_{a})"
                f" * SQRT(n * s_{b}_{b} - s_{b} * s_{b})), 9) AS corr FROM m"
            )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(pair_rows)
    )


@register("q_corr_matrix", oracle=_cm_sql())
def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation MATRIX over d numeric columns in a
    single scan: all d + d(d+1)/2 sufficient-statistic sums (exact
    order-free DECIMAL aggregates — q_corr_exact's rule) come out of
    ONE reduce, then the d(d-1)/2 closed-form correlations are scalar
    expressions on that single row.  The anti-pattern at 100 TB is one
    pass per pair; this is one pass total, and partial aggregation
    makes the shuffle a single row per partition."""
    li = load_table(spark, sf_dir, "lineitem")

    def d18(c):
        return F.col(c).cast("decimal(18,4)")

    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CM_COLS:
        aggs.append(F.sum(d18(c)).cast("double").alias(f"s_{c}"))
    for i, a in enumerate(_CM_COLS):
        for b in _CM_COLS[i:]:
            aggs.append(
                F.sum((d18(a) * d18(b)).cast("decimal(38,8)"))
                .cast("double")
                .alias(f"s_{a}_{b}")
            )
    m = li.agg(*aggs)
    # One row → d(d-1)/2 rows via stack() ON THE SAME BRANCH: a union
    # of per-pair selects would re-execute the aggregate (and rescan
    # lineitem) once per pair — the exact multi-pass shape this key
    # exists to avoid (plan-gated to one scan in test_plans).
    pair_cols = []
    stack_args = []
    for i, a in enumerate(_CM_COLS):
        for b in _CM_COLS[i + 1 :]:
            corr = (
                F.col("n") * F.col(f"s_{a}_{b}")
                - F.col(f"s_{a}") * F.col(f"s_{b}")
            ) / (
                F.sqrt(
                    F.col("n") * F.col(f"s_{a}_{a}")
                    - F.col(f"s_{a}") * F.col(f"s_{a}")
                )
                * F.sqrt(
                    F.col("n") * F.col(f"s_{b}_{b}")
                    - F.col(f"s_{b}") * F.col(f"s_{b}")
                )
            )
            pair_cols.append(F.round(corr, 9).alias(f"corr_{a}_{b}"))
            stack_args.append(f"'{a}', '{b}', n, corr_{a}_{b}")
    row = m.select("n", *pair_cols)
    return row.select(
        F.expr(
            f"stack({len(stack_args)}, "
            + ", ".join(stack_args)
            + ") AS (col_x, col_y, n, corr)"
        )
    )


@register(
    "q_markov_transitions",
    oracle="""
WITH s AS (
  SELECT event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS next_type
  FROM events
),
g AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM s WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type), 9) AS prob
FROM g
""",
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user event sequences:
    per-user LEAD over (event-time, event_id), then transition counts
    and row-normalized probabilities — the behavioral-model primitive
    behind next-action prediction and anomaly scoring.

    One shuffle on user_id for the sequence window (each user's events
    are modest); the normalizing window runs on the tiny type×type
    aggregate.  Event-time arithmetic goes through io.epoch_us, so the
    key is immune to the fixture timestamp-encoding drift."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        "user_id",
        "event_id",
        epoch_us(ev, "ts").alias("t_us"),
    )
    w = W.partitionBy("user_id").orderBy("t_us", "event_id")
    s = t.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    g = s.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("event_type")),
            9,
        ).alias("prob"),
    )


@register(
    "q_rolling_median",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day, n,
       ROUND(MEDIAN(n) OVER (
         ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 9) AS med7
FROM d
""",
)
def q_rolling_median(spark, sf_dir):
    """Trailing 7-day rolling MEDIAN of daily order counts — the
    robust-smoothing twin of the moving average (q_window_frame), used
    for spike-resistant trend lines.  The median is holistic, so it
    runs on the DAY-GRAIN aggregate (bounded: one row per day), never
    the raw facts; the only big-data stage is the groupBy producing
    that day table.  Spark percentile() and DuckDB MEDIAN share the
    linear-interpolation definition (the q_agg_percentile rule)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return d.select(
        # render the day as ISO text: the fixture o_orderdate is a
        # TIMESTAMP, and DuckDB's DATE-typed group key hashes as a
        # midnight timestamp in the driver compare — a string day is
        # encoding-proof on both sides
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(F.expr("percentile(n, 0.5)").over(w), 9).alias("med7"),
    )


@register(
    "q_autocorr",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS tot
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
p AS (
  SELECT tot AS x, LEAD(tot) OVER (ORDER BY day) AS y FROM d
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(x, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy
  FROM p WHERE y IS NOT NULL
)
SELECT n AS n_pairs,
       ROUND((n * sxy - sx * sy) /
             (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 9)
         AS autocorr_lag1
FROM m
""",
)
def q_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of the daily revenue series — the
    seasonality/trend screen run before any forecasting model.  The
    heavy stage is the day-grain DECIMAL aggregation (one scan, one
    shuffle); the lag pairing and Pearson closed form run on the
    bounded day table.  Products are rounded then DECIMAL-summed so
    the result is partition-order-free (FIXTURES §4)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("tot")
    )
    p = d.select(
        F.col("tot").alias("x"),
        F.lead("tot").over(W.orderBy("day")).alias("y"),
    ).filter(F.col("y").isNotNull())

    def dsum(expr, scale, prec):
        return F.sum(
            F.round(expr, scale).cast(f"decimal({prec},{scale})")
        ).cast("double")

    m = p.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x"), 4, 18).alias("sx"),
        dsum(F.col("y"), 4, 18).alias("sy"),
        dsum(F.col("x") * F.col("x"), 6, 28).alias("sxx"),
        dsum(F.col("y") * F.col("y"), 6, 28).alias("syy"),
        dsum(F.col("x") * F.col("y"), 6, 28).alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").alias("n_pairs"),
        F.round(corr, 9).alias("autocorr_lag1"),
    )


#: Edit-distance blocking: drop any (source, prefix) block larger than
#: this — the max_df analog for record-linkage.  A block of B rows
#: costs B²/2 levenshtein comparisons; 1000 bounds that at 5·10⁵ per
#: block while real fixture blocks top out at 17 rows (sf0.1).  The
#: oracle applies the identical cap, so the key stays exact whether or
#: not the cap fires.
EDIT_DEDUP_MAX_BLOCK = 1000


@register(
    "q_edit_distance_dedup",
    oracle=f"""
WITH k AS (
  SELECT doc_id, source,
         SUBSTR(LOWER(TRIM(text)), 1, 32) AS pfx
  FROM documents
),
kb AS (
  SELECT doc_id, source, pfx, SUBSTR(pfx, 1, 4) AS blk,
         COUNT(*) OVER (PARTITION BY source, SUBSTR(pfx, 1, 4)) AS bsz
  FROM k
),
f AS (SELECT * FROM kb WHERE bsz <= {EDIT_DEDUP_MAX_BLOCK})
SELECT a.doc_id AS id1, b.doc_id AS id2,
       CAST(LEVENSHTEIN(a.pfx, b.pfx) AS BIGINT) AS dist
FROM f a JOIN f b
  ON a.source = b.source
 AND a.blk = b.blk
 AND a.doc_id < b.doc_id
WHERE LEVENSHTEIN(a.pfx, b.pfx) <= 8
""",
)
def q_edit_distance_dedup(spark, sf_dir):
    """Fuzzy record-linkage by edit distance: candidate pairs within a
    (source, 4-char-prefix) BLOCK whose 32-char normalized prefixes are
    within Levenshtein 8 — the classic blocking+comparison shape.  The
    O(L²)-per-pair Levenshtein only ever runs inside blocks (an
    equi-join), never all-pairs; the prefix block is the skew lever,
    and widening it is the recall/cost dial.

    Hot-block guard: blocks larger than EDIT_DEDUP_MAX_BLOCK are
    DROPPED before the self-join (the ngram-dedup max_df analog) — a
    web-boilerplate prefix like ``http`` or ``<!do`` shared by millions
    of docs would otherwise recreate the O(B²) blow-up inside one
    partition.  The block-size count rides a window over the SAME
    (source, blk) hash partitioning the join needs, so the guard adds
    no extra exchange; oversized blocks are the sorted-neighborhood
    key's territory (q_dedup_sorted_neighborhood is O(n·w) regardless
    of block shape).  Gated by a planted hot-prefix 8 M scale row
    (tools/bench_scalable.py) that completes with bounded candidates
    and full planted-pair recall.  Both engines run their native JVM/C
    levenshtein — no Python in the loop."""
    d = load_table(spark, sf_dir, "documents")
    k = d.select(
        "doc_id",
        "source",
        F.substring(F.lower(F.trim("text")), 1, 32).alias("pfx"),
    ).withColumn("blk", F.substring("pfx", 1, 4))
    from pyspark.sql import Window

    bw = Window.partitionBy("source", "blk")
    k = k.withColumn("bsz", F.count(F.lit(1)).over(bw)).filter(
        F.col("bsz") <= EDIT_DEDUP_MAX_BLOCK
    )
    a = k.select(
        F.col("doc_id").alias("id1"),
        F.col("source").alias("src"),
        F.col("pfx").alias("p1"),
        "blk",
    )
    b = k.select(
        F.col("doc_id").alias("id2"),
        F.col("source").alias("src"),
        F.col("pfx").alias("p2"),
        "blk",
    )
    return (
        a.join(b, ["src", "blk"])
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("dist", F.levenshtein("p1", "p2").cast("bigint"))
        .filter(F.col("dist") <= 8)
        .select("id1", "id2", "dist")
    )


@register(
    "q_referential_orphans",
    oracle="""
SELECT 'orders_without_customer' AS relation,
       CAST(COUNT(*) AS BIGINT) AS orphans
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_without_order',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'event_user_without_customer',
       CAST(COUNT(DISTINCT user_id) AS BIGINT)
FROM events e WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
""",
)
def q_referential_orphans(spark, sf_dir):
    """Referential-integrity audit: orphan counts across the three
    fact→dimension edges, as one (relation, orphans) report — the
    constraint check a lakehouse has to run itself, since parquet
    enforces no foreign keys.  Each edge is a LEFT ANTI join (Spark's
    NOT EXISTS physical form); the dimension sides broadcast when
    small, and only keys ship — never fact payloads."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev = load_table(spark, sf_dir, "events").select("user_id")

    r1 = (
        o.select("o_custkey")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
        .select(
            F.lit("orders_without_customer").alias("relation"), "orphans"
        )
    )
    ok = o.select("o_orderkey")
    r2 = (
        li.join(ok, li.l_orderkey == ok.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
        .select(
            F.lit("lineitem_without_order").alias("relation"), "orphans"
        )
    )
    r3 = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey, "left_anti")
        .agg(F.countDistinct("user_id").alias("orphans"))
        .select(
            F.lit("event_user_without_customer").alias("relation"),
            "orphans",
        )
    )
    return r1.unionByName(r2).unionByName(r3)


@register(
    "q_dedup_sorted_neighborhood",
    oracle="""
WITH k AS (
  SELECT doc_id, source, LOWER(TRIM(text)) AS sk,
         LIST_DISTINCT(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS toks
  FROM documents
),
w AS (
  SELECT doc_id, source, toks,
         LEAD(doc_id, 1) OVER win AS n1_id,
         LEAD(toks, 1) OVER win AS n1_toks,
         LEAD(doc_id, 2) OVER win AS n2_id,
         LEAD(toks, 2) OVER win AS n2_toks
  FROM k
  WINDOW win AS (PARTITION BY source ORDER BY sk, doc_id)
),
cand AS (
  SELECT doc_id AS ida, n1_id AS idb, toks AS ta, n1_toks AS tb
  FROM w WHERE n1_id IS NOT NULL
  UNION ALL
  SELECT doc_id, n2_id, toks, n2_toks FROM w WHERE n2_id IS NOT NULL
),
j AS (
  SELECT LEAST(ida, idb) AS id1, GREATEST(ida, idb) AS id2,
         CAST(LEN(LIST_INTERSECT(ta, tb)) AS DOUBLE)
           / (LEN(ta) + LEN(tb) - LEN(LIST_INTERSECT(ta, tb))) AS jac
  FROM cand
)
SELECT id1, id2, ROUND(jac, 9) AS jaccard
FROM j WHERE jac >= 0.3
""",
)
def q_dedup_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup (the record-linkage classic): sort
    each source block by a normalized key and compare every row only
    to its next w−1=2 neighbors — candidate count is O(n·w) by
    construction, the cheapest blocking there is when near-dups sort
    adjacently.  The window is PARTITIONED by source, so no global
    sort; pairs then score exact token-set Jaccard with JVM array
    intersect/union (no Python)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    k = d.select(
        "doc_id",
        "source",
        F.lower(F.trim("text")).alias("sk"),
        F.array_distinct(F.split(F.lower(F.trim("text")), " ")).alias(
            "toks"
        ),
    )
    win_ = W.partitionBy("source").orderBy("sk", "doc_id")
    w = k.select(
        "doc_id",
        "toks",
        F.lead("doc_id", 1).over(win_).alias("n1_id"),
        F.lead("toks", 1).over(win_).alias("n1_toks"),
        F.lead("doc_id", 2).over(win_).alias("n2_id"),
        F.lead("toks", 2).over(win_).alias("n2_toks"),
    )
    c1 = w.filter(F.col("n1_id").isNotNull()).select(
        F.col("doc_id").alias("ida"),
        F.col("n1_id").alias("idb"),
        F.col("toks").alias("ta"),
        F.col("n1_toks").alias("tb"),
    )
    c2 = w.filter(F.col("n2_id").isNotNull()).select(
        F.col("doc_id").alias("ida"),
        F.col("n2_id").alias("idb"),
        F.col("toks").alias("ta"),
        F.col("n2_toks").alias("tb"),
    )
    cand = c1.unionByName(c2)
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    jac = inter / (
        F.size("ta") + F.size("tb") - F.size(F.array_intersect("ta", "tb"))
    )
    return (
        cand.select(
            F.least("ida", "idb").alias("id1"),
            F.greatest("ida", "idb").alias("id2"),
            jac.alias("jac"),
        )
        .filter(F.col("jac") >= 0.3)
        .select("id1", "id2", F.round("jac", 9).alias("jaccard"))
    )


@register(
    "q_skew_metrics",
    oracle="""
WITH c AS (
  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
),
t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n, COUNT(*) AS n_keys FROM c),
r AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey) AS rk
  FROM c
),
ent AS (
  SELECT CAST(SUM(CAST(ROUND(
           (cnt / t.n) * LN(cnt / t.n), 9) AS DECIMAL(28,9))) AS DOUBLE)
         AS neg_h
  FROM c CROSS JOIN t GROUP BY t.n
)
SELECT t.n_keys,
       (SELECT cnt FROM r WHERE rk = 1) AS top1_cnt,
       ROUND((SELECT cnt FROM r WHERE rk = 1) / t.n, 9) AS top1_share,
       ROUND((SELECT SUM(cnt) FROM r WHERE rk <= 10) / t.n, 9)
         AS top10_share,
       ROUND(CASE WHEN t.n_keys > 1 THEN -ent.neg_h / LN(t.n_keys)
                  ELSE 0.0 END, 6) AS norm_entropy
FROM t CROSS JOIN ent
""",
)
def q_skew_metrics(spark, sf_dir):
    """Key-distribution SKEW profile of a join/shuffle key — the
    audit you run before picking a partitioning strategy at 100 TB:
    top-1/top-10 key share (is salting needed?) and normalized Shannon
    entropy (how uniform is the key space?).  One groupBy builds the
    per-key counts; every later stage runs on that bounded key table.
    Entropy terms are rounded then DECIMAL-summed (the q_entropy rule)
    so the scalar is partition-order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    c = c.persist()  # feeds both driver actions below
    # ONE collect for total/n_keys/entropy: the 1-row totals frame
    # broadcast-cross-joins back onto the key table so the rounded
    # entropy terms (identical algebra to the oracle) aggregate in the
    # same pass that surfaces n and n_keys — no separate totals action
    tot = c.agg(
        F.sum("cnt").cast("double").alias("n"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    term = F.round(
        (F.col("cnt") / F.col("n")) * F.log(F.col("cnt") / F.col("n")), 9
    ).cast("decimal(28,9)")
    stats = (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n").alias("n"),
            F.first("n_keys").alias("n_keys"),
            F.sum(term).cast("double").alias("neg_h"),
        )
        .collect()[0]
    )
    if stats["n"] is None:  # empty table: no keys, empty profile
        c.unpersist()
        return spark.createDataFrame(
            [],
            "n_keys long, top1_cnt long, top1_share double, "
            "top10_share double, norm_entropy double",
        )
    n, n_keys, neg_h = float(stats["n"]), int(stats["n_keys"]), stats["neg_h"]
    # top-10 via orderBy().limit() (TakeOrderedAndProject per-partition
    # heaps) — a global row_number window would single-task the whole
    # key table at scale; top1 and top10 come out of this ONE collect
    top = (
        c.orderBy(F.col("cnt").desc(), "l_suppkey").limit(10).collect()
    )
    top1 = top[0]["cnt"]
    top10 = sum(t["cnt"] for t in top)
    c.unpersist()
    import math

    # single key ⇒ entropy undefined (ln 1 = 0); define the normalized
    # entropy of a degenerate distribution as 0, on both sides
    norm_h = -neg_h / math.log(n_keys) if n_keys > 1 else 0.0
    raw = spark.createDataFrame(
        [(n_keys, int(top1), top1 / n, top10 / n, norm_h)],
        "n_keys long, top1_cnt long, top1_share double, "
        "top10_share double, norm_entropy double",
    )
    # round through F.round, NOT python round(): python rounds
    # half-even while Spark/DuckDB ROUND are HALF_UP — a tie at the
    # rounded digit would diverge from the oracle
    return raw.select(
        "n_keys",
        "top1_cnt",
        F.round("top1_share", 9).alias("top1_share"),
        F.round("top10_share", 9).alias("top10_share"),
        F.round("norm_entropy", 6).alias("norm_entropy"),
    )


@register(
    "q_vector_norm_stats",
    oracle="""
WITH nrm AS (
  SELECT ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 9) AS norm
  FROM embeddings
)
SELECT COUNT(*) AS n,
       ROUND(MIN(norm), 9) AS min_norm,
       ROUND(MAX(norm), 9) AS max_norm,
       ROUND(CAST(SUM(CAST(norm AS DECIMAL(28,9))) AS DOUBLE)
             / COUNT(*), 9) AS avg_norm,
       CAST(SUM(CASE WHEN ABS(norm - 1.0) <= 0.01 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unit
FROM nrm
""",
)
def q_vector_norm_stats(spark, sf_dir):
    """Embedding-column health check: per-vector L2 norms (JVM
    zip/aggregate fold — no Python), then min/max/mean norm and the
    count of ~unit vectors.  The screen you run before cosine search:
    un-normalized vectors silently turn cosine top-k into dot-product
    top-k.  Norms round(9) before the DECIMAL mean so the left-to-right
    fold's low bits can't differ across engines."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = e.select(F.round(l2_norm("embedding"), 9).alias("norm"))
    return nrm.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("norm"), 9).alias("min_norm"),
        F.round(F.max("norm"), 9).alias("max_norm"),
        F.round(
            F.sum(F.col("norm").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("avg_norm"),
        F.sum(
            (F.abs(F.col("norm") - 1.0) <= 0.01).cast("bigint")
        ).alias("n_unit"),
    )


@register(
    "q_incremental_agg",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*), 6) AS avg_price
FROM orders
GROUP BY o_orderstatus
""",
)
def q_incremental_agg(spark, sf_dir):
    """Incremental aggregate MAINTENANCE (materialized-view refresh):
    a precomputed per-status state (sum, count) merges with a delta
    batch's partial state by ADDING the partials — never rescanning
    the base.  The fixture splits orders %5 into base/delta to prove
    merged-partials == full recompute (the oracle recomputes from
    scratch; DECIMAL sums make the two bit-equal regardless of split).
    At 100 TB this is the difference between an O(delta) nightly
    refresh and an O(table) one; avg is derived from the mergeable
    (sum, n) pair, never averaged directly (averages don't merge)."""
    o = load_table(spark, sf_dir, "orders")

    def partial(df):
        return df.groupBy("o_orderstatus").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )

    base = partial(o.filter(F.col("o_orderkey") % 5 != 0))
    delta = partial(o.filter(F.col("o_orderkey") % 5 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
    )
    return merged.select(
        "o_orderstatus",
        F.col("s").cast("double").alias("total_price"),
        F.col("c").alias("n"),
        F.round(F.col("s").cast("double") / F.col("c"), 6).alias(
            "avg_price"
        ),
    )


@register(
    "q_window_cume_dist",
    oracle="""
SELECT s_suppkey, s_nationkey,
       ROUND(s_acctbal, 2) AS acctbal,
       ROUND(CUME_DIST() OVER w, 9) AS cd,
       ROUND(PERCENT_RANK() OVER w, 9) AS pr
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
""",
)
def q_window_cume_dist(spark, sf_dir):
    """cume_dist + percent_rank per nation partition — the relative-
    standing window pair (SQL:2003) completing the §2.5 rank family.
    The ORDER BY carries the full (acctbal, suppkey) tie-break chain,
    which makes both distributions deterministic AND identical across
    engines (with ties unbroken, cume_dist's peer-group counting is
    engine-sensitive).  One shuffle on the partition key."""
    from pyspark.sql import Window as W

    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
    )


@register(
    "q_quantile_discretize",
    oracle="""
WITH b AS (
  SELECT l_returnflag,
         NTILE(10) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
         ) AS bucket,
         l_extendedprice
  FROM lineitem
)
SELECT l_returnflag, bucket, COUNT(*) AS n,
       ROUND(MIN(l_extendedprice), 2) AS lo,
       ROUND(MAX(l_extendedprice), 2) AS hi
FROM b GROUP BY l_returnflag, bucket
""",
)
def q_quantile_discretize(spark, sf_dir):
    """Equi-DEPTH discretization (decile binning) of a numeric column
    per group, with per-bucket count and value range — the feature-
    engineering step that turns a heavy-tailed number into a uniform
    categorical.  NTILE over a PARTITIONED window (never a global
    sort), full tie-break chain so bucket edges are deterministic.
    At 100 TB the same result comes cheaper from approx_percentile
    edges + a bucketize join — the documented swap when exact decile
    boundaries aren't required."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    b = li.select(
        "l_returnflag",
        F.ntile(10).over(w).alias("bucket"),
        "l_extendedprice",
    )
    return b.groupBy("l_returnflag", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


# ---- round-5 batch 2: statistical / time-series / graph breadth -------

_LR_D = "CAST({0} AS DECIMAL(24,4))"


@register(
    "q_linear_regression",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST({_LR_D.format('l_quantity')} * {_LR_D.format('l_quantity')}
              AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST({_LR_D.format('l_extendedprice')} * {_LR_D.format('l_extendedprice')}
              AS DECIMAL(38,8))) AS DOUBLE) AS syy,
         CAST(SUM(CAST({_LR_D.format('l_quantity')} * {_LR_D.format('l_extendedprice')}
              AS DECIMAL(38,8))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS r2
FROM s
""",
)
def q_linear_regression(spark, sf_dir):
    """Per-group ordinary least squares (price ~ quantity): slope,
    intercept, R² from EXACT decimal sufficient statistics in one
    scan/reduce — the q_corr_exact discipline extended to the fitted
    line.  The model every dashboard trend line and simple forecaster
    needs; never a per-group iterative solver."""
    li = load_table(spark, sf_dir, "lineitem")

    # Spark-side products at decimal(18,4): an (18,4)x(18,4) product is
    # decimal(37,8) — EXACT and within Spark's 38-digit budget.  A wider
    # (24,4) input would push the product past 38 digits and trigger
    # Spark's silent precision-loss truncation to 6 dp (the 24,4 width
    # is only needed in the DuckDB dialect, where <=18-digit inputs
    # multiply in int64 and overflow — the q_corr_exact rule).
    def d18(c):
        return F.col(c).cast("decimal(18,4)")

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d18("l_quantity")).cast("double").alias("sx"),
        F.sum(d18("l_extendedprice")).cast("double").alias("sy"),
        F.sum((d18("l_quantity") * d18("l_quantity")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxx"),
        F.sum(
            (d18("l_extendedprice") * d18("l_extendedprice")).cast(
                "decimal(38,8)"
            )
        )
        .cast("double")
        .alias("syy"),
        F.sum(
            (d18("l_quantity") * d18("l_extendedprice")).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    # r2 via explicit num*num, never F.pow: JVM Math.pow is 1-ulp
    # accurate (not correctly rounded) while libm pow is — a 1-ulp
    # split at a .5e-9 boundary would flip the round(9)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            (num * num)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            9,
        ).alias("r2"),
    )


_ZIPF_TOP = 1000


@register(
    "q_zipf_fit",
    oracle=f"""
WITH toks AS (
  SELECT UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS w FROM documents
),
c AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
r AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rk FROM c
),
xy AS (
  SELECT ROUND(LN(CAST(rk AS DOUBLE)), 9) AS x,
         ROUND(LN(CAST(cnt AS DOUBLE)), 9) AS y
  FROM r WHERE rk <= {_ZIPF_TOP}
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxy
  FROM xy
)
SELECT n AS n_ranks,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS log_intercept
FROM m
""",
)
def q_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the token frequency distribution: OLS slope of
    ln(freq) ~ ln(rank) over the top 1000 (_ZIPF_TOP) ranks — the
    corpus-health fingerprint (natural text sits near slope −1;
    boilerplate/spam corpora deviate).  The rank window runs over the
    VOCABULARY aggregate (bounded), the regression over the top-k —
    raw text never shuffles.  ln values round(9) before the DECIMAL
    sums (the entropy-key rule) so both engines fold identically."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    c = d.select(F.explode(llmops.tokens_col("text")).alias("w")).groupBy(
        "w"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # top-k FIRST (TakeOrderedAndProject: per-partition heaps over the
    # vocabulary, never a single-task global sort of the whole vocab),
    # THEN rank within the bounded k rows — a global row_number window
    # would move the entire 100M-type vocabulary to one task at scale
    top = c.orderBy(F.col("cnt").desc(), "w").limit(_ZIPF_TOP)
    r = top.select(
        "cnt",
        F.row_number()
        .over(W.orderBy(F.col("cnt").desc(), "w"))
        .alias("rk"),
    )
    xy = r.select(
        F.round(F.log(F.col("rk").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 9).alias("y"),
    )

    def dsum(e):
        return F.sum(e.cast("decimal(28,9)")).cast("double")

    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.round(F.col("x") * F.col("x"), 9)).alias("sxx"),
        dsum(F.round(F.col("x") * F.col("y"), 9)).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        F.col("n").alias("n_ranks"),
        F.round(num / den, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - num / den * F.col("sx")) / F.col("n"), 6
        ).alias("log_intercept"),
    )


@register(
    "q_gini",
    oracle="""
WITH r AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS p,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
         ) AS rk
  FROM orders
),
s AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         CAST(SUM(CAST(rk AS DECIMAL(18,0)) * p) AS DOUBLE) AS srx,
         CAST(SUM(p) AS DOUBLE) AS sx
  FROM r GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       ROUND(2.0 * srx / (n * sx) - CAST(n + 1 AS DOUBLE) / n, 9) AS gini
FROM s
""",
)
def q_gini(spark, sf_dir):
    """Gini coefficient of order value per priority class — the
    inequality/concentration measure (revenue concentration, token
    budget skew).  Rank-sum closed form G = 2·Σr·x/(n·Σx) − (n+1)/n
    over a PARTITIONED rank window with a full tie-break; rank×price
    products are exact DECIMALs, so the only float is the final
    expression."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    r = o.select(
        "o_orderpriority",
        F.round("o_totalprice", 2).cast("decimal(18,2)").alias("p"),
        F.row_number()
        .over(
            W.partitionBy("o_orderpriority").orderBy(
                "o_totalprice", "o_orderkey"
            )
        )
        .alias("rk"),
    )
    s = r.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rk").cast("decimal(18,0)") * F.col("p"))
        .cast("double")
        .alias("srx"),
        F.sum("p").cast("double").alias("sx"),
    )
    return s.select(
        "o_orderpriority",
        "n",
        F.round(
            2.0 * F.col("srx") / (F.col("n") * F.col("sx"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            9,
        ).alias("gini"),
    )


@register(
    "q_ks_test",
    oracle="""
WITH t AS (
  SELECT value AS v, user_id % 2 AS grp FROM events
  WHERE value IS NOT NULL
),
g AS (
  SELECT v,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
  FROM t GROUP BY v
),
c AS (
  SELECT SUM(c0) OVER (ORDER BY v) AS a0,
         SUM(c1) OVER (ORDER BY v) AS a1,
         SUM(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS n0,
         SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS n1
  FROM g
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       ROUND(CAST(MAX(ABS(a0 * n1 - a1 * n0)) AS DOUBLE)
             / (n0 * n1), 9) AS d_stat
FROM c
GROUP BY n0, n1
""",
)
def q_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic between the value
    distributions of two user cohorts — the nonparametric drift test
    behind data-distribution monitoring (train/serve skew, A/B sanity).
    D = max|ECDF₀ − ECDF₁| computed as exact INTEGERS
    (|a0·n1 − a1·n0|, one division at the end): bit-deterministic.

    Shape: one groupBy to VALUE GRAIN (both cohorts' counts per
    distinct value), then the running sums and max run on that bounded
    aggregate.  At 100 TB with a continuous metric, the documented
    swap is windows.scalable_cumsum over the value grain (two-phase
    global order) — the fixture grain fits one window task."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    t = ev.filter(F.col("value").isNotNull()).select(
        F.col("value").alias("v"), (F.col("user_id") % 2).alias("grp")
    )
    g = t.groupBy("v").agg(
        F.sum((F.col("grp") == 0).cast("long")).alias("c0"),
        F.sum((F.col("grp") == 1).cast("long")).alias("c1"),
    )
    w = W.orderBy("v")
    # totals via a FULL-FRAME window in the SAME window pass as the
    # running sums: n0/n1 ride along each row, so the whole statistic
    # is one scan, one shuffle, one sorted pass — a separate g.agg()
    # branch would re-execute the aggregation subtree (Spark reuses
    # exchanges only opportunistically), i.e. a second scan
    w_full = W.orderBy("v").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    c = g.select(
        F.sum("c0").over(w).alias("a0"),
        F.sum("c1").over(w).alias("a1"),
        F.sum("c0").over(w_full).alias("n0"),
        F.sum("c1").over(w_full).alias("n1"),
    )
    return (
        c.groupBy("n0", "n1")
        .agg(
            F.round(
                F.max(
                    F.abs(F.col("a0") * F.col("n1") - F.col("a1") * F.col("n0"))
                ).cast("double")
                / (F.col("n0") * F.col("n1")),
                9,
            ).alias("d_stat")
        )
        .select("n0", "n1", "d_stat")
    )


@register(
    "q_chi_square",
    oracle="""
WITH o AS (
  SELECT event_type, user_id % 2 AS cohort, COUNT(*) AS obs
  FROM events GROUP BY event_type, user_id % 2
),
m AS (
  SELECT event_type, cohort, obs,
         SUM(obs) OVER (PARTITION BY event_type) AS r,
         SUM(obs) OVER (PARTITION BY cohort) AS c,
         SUM(obs) OVER () AS n
  FROM o
)
SELECT ROUND(CAST(SUM(CAST(ROUND(
         CAST(obs * n - r * c AS DOUBLE)
         * CAST(obs * n - r * c AS DOUBLE)
         / (CAST(n AS DOUBLE) * r * c), 9) AS DECIMAL(28,9)))
       AS DOUBLE), 6) AS chi2,
       CAST((COUNT(DISTINCT event_type) - 1)
            * (COUNT(DISTINCT cohort) - 1) AS BIGINT) AS dof
FROM m
HAVING COUNT(*) > 0
""",
)
def q_chi_square(spark, sf_dir):
    """Chi-square test of independence on the event_type × cohort
    contingency table — the categorical-drift screen next to q_ks_test's
    continuous one.  Each cell term is (o·n − r·c)²/(n·r·c): integers
    inside, rounded(9), DECIMAL-summed — deterministic under any
    partitioning.  The crosstab is bounded, so everything after the
    one groupBy is scalar work."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    # margins as WINDOWS over the bounded crosstab — one chain, one
    # scan: branching o into rt/ct/tot/dims sub-aggregates would
    # re-execute the events groupBy once per branch (Spark reuses
    # exchanges only opportunistically), i.e. up to five scans of the
    # fact table for numbers the crosstab already holds
    o = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("obs"))
    m = o.select(
        "event_type",
        "cohort",
        "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("r"),
        F.sum("obs").over(W.partitionBy("cohort")).alias("c"),
        F.sum("obs").over(W.partitionBy()).alias("n"),
    )
    # square AFTER the double cast: diff = obs·n − r·c is ≤ n² ≈
    # 6.4e13 at the 8 M bench scale (exactly representable in a
    # double), but diff² overflows int64 past |diff| ≈ 3e9 — under
    # Spark 4's default ANSI mode that's a hard ARITHMETIC_OVERFLOW
    # (review r5 #3); the double square is correctly rounded and
    # identical in both engines
    diff = (
        F.col("obs") * F.col("n") - F.col("r") * F.col("c")
    ).cast("double")
    out = m.agg(
        F.round(
            F.sum(
                F.round(
                    diff
                    * diff
                    / (F.col("n").cast("double") * F.col("r") * F.col("c")),
                    9,
                ).cast("decimal(28,9)")
            ).cast("double"),
            6,
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("cohort") - 1)
        )
        .cast("bigint")
        .alias("dof"),
    )
    # zero rows (not a NULL-chi2 row) on an empty table, matching the
    # oracle's HAVING COUNT(*) > 0: chi2 is NULL iff no cells existed
    return out.filter(F.col("chi2").isNotNull())


@register(
    "q_graph_degree_dist",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
),
edges AS (
  SELECT a, b FROM pairs WHERE (a * 31 + b) % 97 < 12
),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  ) GROUP BY v
)
SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY d
""",
)
def q_graph_degree_dist(spark, sf_dir):
    """Degree distribution of the co-purchase graph — the first thing
    you plot on any large graph (power-law vs uniform decides every
    downstream algorithm choice: sampling, partitioning, salting).
    Shares the hot-basket-safe pair generator with q_triangle_count;
    degrees and the histogram are two bounded groupBys past it."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        rel.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .filter((F.col("a") * 31 + F.col("b")) % 97 < 12)
        .distinct()
    )
    # both endpoints from ONE pass over the edge stream — a union of
    # two selects would execute the whole pair pipeline twice
    nodes = edges.select(
        F.explode(F.array("a", "b")).alias("v")
    )
    deg = nodes.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


@register(
    "q_burstiness",
    oracle="""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
  FROM d GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_daily,
       ROUND((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
             / (CAST(n AS DOUBLE) * (n - 1)) / (CAST(sx AS DOUBLE) / n), 6)
         AS fano
FROM s WHERE n > 1
""",
)
def q_burstiness(spark, sf_dir):
    """Burstiness (Fano factor: variance/mean of daily counts) per
    event type — distinguishes steady traffic from bursty incident
    patterns; Poisson traffic sits at 1.  Day indices via integer
    FLOOR-division of epoch-µs (the §8.7 dialect trap: DuckDB `//`,
    Spark F.floor) — counts are integers, so the sums are EXACT and
    only the final ratio is float."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.floor(epoch_us(ev, "ts") / F.lit(86_400_000_000)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    var = (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    mean = F.col("sx").cast("double") / F.col("n")
    return s.filter(F.col("n") > 1).select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean_daily"),
        F.round(var / mean, 6).alias("fano"),
    )


@register(
    "q_period_over_period",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS tot
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day,
       ROUND(tot, 4) AS tot,
       ROUND(LAG(tot) OVER (ORDER BY day), 4) AS prev,
       ROUND((tot - LAG(tot) OVER (ORDER BY day))
             / LAG(tot) OVER (ORDER BY day), 6) AS pct_change
FROM d
""",
)
def q_period_over_period(spark, sf_dir):
    """Day-over-day revenue change — the simplest KPI delta every
    dashboard renders.  The heavy stage is the day-grain DECIMAL
    aggregation; the lag/percent math runs on the bounded day table
    (same discipline as q_rolling_median/q_autocorr).  Day rendered as
    ISO text so the grouping key is timestamp-encoding-proof."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("tot")
    )
    w = W.orderBy("day")
    prev = F.lag("tot").over(w)
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("tot", 4).alias("tot"),
        F.round(prev, 4).alias("prev"),
        F.round((F.col("tot") - prev) / prev, 6).alias("pct_change"),
    )


@register(
    "q_ewma",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS tot
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(LIST_REDUCE(
         LIST(tot ORDER BY day),
         (acc, v) -> CAST(0.2 AS DOUBLE) * v + CAST(0.8 AS DOUBLE) * acc
       ), 6) AS ewma_last
FROM d
""",
)
def q_ewma(spark, sf_dir):
    """Exponentially weighted moving average of the daily revenue
    series (α = 0.2) — the recursive smoother no window frame can
    express (each value depends on ALL predecessors).  Both engines run
    the IDENTICAL in-order fold — Spark F.aggregate over the day-sorted
    array, DuckDB LIST_REDUCE over LIST(... ORDER BY day), seeded with
    the first element, each step 0.2·x + 0.8·acc in pure doubles — so
    every intermediate double is bit-equal and the final round(6)
    hashes across engines.

    The fold runs on the BOUNDED day-grain aggregate (one array per
    series); the only big-data stage is the DECIMAL day aggregation.
    At 100 TB with many series, the same shape partitions by series
    key — one in-order fold per group, never a global recursion."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("tot")
    )
    arr = d.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct("day", "tot"))
        ).alias("series"),
    )
    # seed with the first element, fold the rest — DuckDB LIST_REDUCE's
    # seeding convention, replicated exactly; empty series (zero-row
    # input) yields NULL, matching LIST_REDUCE over an empty list
    fold = F.when(F.size("series") == 0, F.lit(None).cast("double")).otherwise(
        F.aggregate(
            F.slice(
                F.col("series"),
                2,
                F.greatest(F.size("series") - 1, F.lit(0)),
            ),
            F.get(F.col("series"), 0)["tot"],
            lambda acc, x: F.lit(0.2) * x["tot"] + F.lit(0.8) * acc,
        )
    )
    return arr.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(fold, 6).alias("ewma_last"),
    )


@register(
    "q_mann_whitney",
    oracle="""
WITH t AS (
  SELECT value AS v, user_id % 2 AS grp FROM events
  WHERE value IS NOT NULL
),
g AS (
  SELECT v,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
         COUNT(*) AS ct
  FROM t GROUP BY v
),
r AS (
  SELECT c0, c1, ct,
         COALESCE(SUM(ct) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM g
),
s AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS n0,
         CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c0 * (2 * cum_before + ct + 1)) AS BIGINT) AS two_r0,
         CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tie3
  FROM r
)
SELECT n0, n1,
       ROUND(CAST(two_r0 AS DOUBLE) / 2
             - CAST(n0 AS DOUBLE) * (n0 + 1) / 2, 1) AS u0,
       ROUND(
         (CAST(two_r0 AS DOUBLE) / 2
            - CAST(n0 AS DOUBLE) * (n0 + 1) / 2
            - CAST(n0 AS DOUBLE) * n1 / 2)
         / SQRT(CAST(n0 AS DOUBLE) * n1 / 12.0
                * ((n0 + n1 + 1)
                   - CAST(tie3 AS DOUBLE)
                     / ((CAST(n0 AS DOUBLE) + n1)
                        * (CAST(n0 AS DOUBLE) + n1 - 1)))), 6) AS z
FROM s
""",
)
def q_mann_whitney(spark, sf_dir):
    """Mann–Whitney U (rank-sum) test between two cohorts' value
    distributions — the robust location-shift twin of q_ks_test's
    shape test.  Average-rank tie handling computed as INTEGERS at
    value grain: 2·R₀ = Σ c₀·(2·cum_before + ct + 1) is exact, as is
    the tie-correction Σ(t³−t); only the final z standardization is
    float.  One groupBy to value grain; the rank arithmetic runs on
    the bounded aggregate (scalable_cumsum is the continuous-metric
    swap, as for q_ks_test)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    t = ev.filter(F.col("value").isNotNull()).select(
        F.col("value").alias("v"), (F.col("user_id") % 2).alias("grp")
    )
    g = t.groupBy("v").agg(
        F.sum((F.col("grp") == 0).cast("long")).alias("c0"),
        F.sum((F.col("grp") == 1).cast("long")).alias("c1"),
        F.count(F.lit(1)).alias("ct"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    r = g.select(
        "c0",
        "c1",
        "ct",
        F.coalesce(F.sum("ct").over(w), F.lit(0)).alias("cum_before"),
    )
    s = r.agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(
            F.col("c0") * (2 * F.col("cum_before") + F.col("ct") + 1)
        )
        .cast("bigint")
        .alias("two_r0"),
        F.sum(
            F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")
        )
        .cast("bigint")
        .alias("tie3"),
    )
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    u0 = F.col("two_r0").cast("double") / 2 - n0d * (F.col("n0") + 1) / 2
    var = (
        n0d
        * n1d
        / 12.0
        * (
            (F.col("n0") + F.col("n1") + 1)
            - F.col("tie3").cast("double")
            / ((n0d + n1d) * (n0d + n1d - 1))
        )
    )
    return s.select(
        "n0",
        "n1",
        F.round(u0, 1).alias("u0"),
        F.round((u0 - n0d * n1d / 2) / F.sqrt(var), 6).alias("z"),
    )


@register(
    "q_wau",
    oracle="""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du),
w AS (
  SELECT d.day AS report_day, du.user_id
  FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
)
SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM w GROUP BY report_day
""",
)
def q_wau(spark, sf_dir):
    """Rolling 7-day active users (WAU) per day — THE engagement KPI,
    and the classic hard rolling metric: COUNT(DISTINCT) does not
    decompose over window frames, so no frame trick works.

    Scale shape: dedup to (day, user) grain once, then each active-day
    row REPLICATES to the ≤7 report days it contributes to via a
    map-side sequence-explode — a bounded 7× row expansion feeding one
    distinct-count shuffle.  The naive alternative (range join day
    table × activity) builds the same pairs through a nested-loop
    join; the explode form needs no join at all.  Report days restrict
    to days actually observed (broadcast semi join on the tiny day
    dimension)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.floor(epoch_us(ev, "ts") / F.lit(86_400_000_000)).alias("day"),
        "user_id",
    ).distinct()
    # posexplode carries the OFFSET, so "report day was actually
    # observed" falls out of the same aggregate (a report day is
    # observed iff some contributor has offset 0) — a separate
    # distinct-days branch would re-scan and re-dedup events
    rep = du.select(
        F.posexplode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("off", "report_day"),
        "user_id",
    )
    return (
        rep.groupBy("report_day")
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.max((F.col("off") == 0).cast("int")).alias("_obs"),
        )
        .filter(F.col("_obs") == 1)
        .select("report_day", "wau")
    )


@register(
    "q_new_vs_returning",
    oracle="""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events
),
f AS (
  SELECT day, user_id,
         MIN(day) OVER (PARTITION BY user_id) AS first_day
  FROM du
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM f GROUP BY day
""",
)
def q_new_vs_returning(spark, sf_dir):
    """Daily new-vs-returning user split — the acquisition/retention
    KPI next to q_wau and q_retention_cohorts.  One dedup to
    (day, user) grain, one per-user window attaching the first-seen
    day (shuffle on user_id, state bounded by the user dimension),
    one day-grain groupBy.  All integers."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.floor(epoch_us(ev, "ts") / F.lit(86_400_000_000)).alias("day"),
        "user_id",
    ).distinct()
    f = du.withColumn(
        "first_day", F.min("day").over(W.partitionBy("user_id"))
    )
    return f.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum((F.col("day") == F.col("first_day")).cast("long")).alias(
            "n_new"
        ),
        F.sum((F.col("day") > F.col("first_day")).cast("long")).alias(
            "n_returning"
        ),
    )


@register(
    "q_duplicate_rate_report",
    oracle="""
WITH h AS (
  SELECT source, MD5(LOWER(TRIM(text))) AS th FROM documents
),
g AS (
  SELECT source, th, COUNT(*) AS n FROM h GROUP BY source, th
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dupes,
       ROUND(CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n), 9) AS dup_rate
FROM g GROUP BY source
""",
)
def q_duplicate_rate_report(spark, sf_dir):
    """Per-source exact-duplicate rate report — the curation KPI that
    decides where dedup effort goes (a source at 40% dup rate gets a
    pipeline fix, not just filtering).  One hash projection (16-byte
    md5 of normalized text — the q_dedup_exact key), one
    (source, hash) groupBy, one source rollup; document text never
    shuffles, only hashes."""
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select(
            "source", F.md5(F.lower(F.trim("text"))).alias("th")
        )
        .groupBy("source", "th")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return g.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        (F.sum("n") - F.count(F.lit(1))).cast("bigint").alias("n_dupes"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n"), 9
        ).alias("dup_rate"),
    )


@register(
    "q_embedding_centroid",
    oracle="""
WITH e AS (
  SELECT label, UNNEST(embedding) AS x,
         GENERATE_SUBSCRIPTS(embedding, 1) AS dim
  FROM embeddings
)
SELECT label, CAST(dim AS INT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE), 9)
                AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS centroid
FROM e GROUP BY label, dim
""",
)
def q_embedding_centroid(spark, sf_dir):
    """Per-label embedding centroids, one row per (label, dimension) —
    the embedding-QA primitive behind drift dashboards and the seed
    step of k-means-style methods (q_sim_ivf's training shape).
    posexplode fans vectors to (label, dim, x) and ONE groupBy builds
    every centroid coordinate; components round(9) before the DECIMAL
    mean so partition order can't move the result.  At 100 TB the
    same aggregate runs map-side-combined at (labels × dims)
    cardinality — no vector ever shuffles whole."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "label", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "label",
        (F.col("dim0") + 1).cast("int").alias("dim"),  # 1-based like SQL
        F.col("x").cast("double").alias("x"),
    )
    return x.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        # NO final round: the exact-decimal sum, its correctly-rounded
        # double cast, and the double division are each bit-identical
        # across engines — a ROUND(…, 9) at the end REINTRODUCES
        # divergence when the quotient's shortest repr straddles a
        # .5e-9 tie (Spark rounds the repr, DuckDB multiplies by 1e9;
        # observed 1-ulp split at sf0.01)
        (
            F.sum(F.round(F.col("x"), 9).cast("decimal(28,9)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("centroid"),
    )


@register(
    "q_join_pit",
    oracle="""
WITH dim AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS valid_from_us,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS valid_to_us
  FROM events
),
probes AS (
  SELECT event_id AS probe_id, user_id,
         epoch_us(ts) + 1800000000 AS t_probe
  FROM events
)
SELECT p.probe_id, p.user_id,
       d.event_id AS version_event_id,
       d.event_type AS version_type,
       d.valid_from_us
FROM probes p
JOIN dim d
  ON d.user_id = p.user_id
 AND p.t_probe >= d.valid_from_us
 AND (d.valid_to_us IS NULL OR p.t_probe < d.valid_to_us)
""",
)
def q_join_pit(spark, sf_dir):
    """POINT-IN-TIME join: each probe row joins the dimension VERSION
    that was valid at its event time — the read side of the SCD2
    contract (q_scd2_merge writes the versions; this consumes them for
    leak-free training features and as-of reporting).  Probes are the
    event stream shifted +30 min, so every probe lands inside exactly
    one of its user's version intervals (the orders fixture's 1995-era
    timestamps sit entirely outside the 2024 events timeline and would
    make the key vacuously empty).

    Versions are half-open [valid_from, valid_to) and non-overlapping
    per key, so the equi-join on the key plus the interval predicate
    yields EXACTLY ONE match per probe — no dedup window needed.
    Physically one shuffle on the key for the version window and one
    equi-join (the interval test rides the join as a post-condition);
    at 100 TB, bucket both sides on the key so the join co-locates
    (q_join_bucketed's lever)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        "event_id",
        "event_type",
        epoch_us(ev, "ts").alias("valid_from_us"),
    )
    w = W.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    dim = t.select(
        "user_id",
        "event_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w).alias("valid_to_us"),
    )
    probes = ev.select(
        F.col("event_id").alias("probe_id"),
        F.col("user_id").alias("p_user"),
        (epoch_us(ev, "ts") + 1_800_000_000).alias("t_probe"),
    )
    return (
        probes.join(dim, probes.p_user == dim.user_id)
        .filter(
            (F.col("t_probe") >= F.col("valid_from_us"))
            & (
                F.col("valid_to_us").isNull()
                | (F.col("t_probe") < F.col("valid_to_us"))
            )
        )
        .select(
            "probe_id",
            "user_id",
            F.col("event_id").alias("version_event_id"),
            F.col("event_type").alias("version_type"),
            "valid_from_us",
        )
    )
