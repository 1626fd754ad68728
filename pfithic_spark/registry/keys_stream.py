"""§2.11 streaming batch twins + composite Hi-C keys (see streaming.py for readStream forms).

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
# §2.11 streaming (batch twins — see streaming.py for readStream forms)
# ========================================================================


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

#: session-built IVF index dirs already registered for atexit cleanup
#: (round-14 ADVICE — see q_sim_ivf)
_IVF_TMP_REGISTERED: set[str] = set()


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
    # tag the on-disk index by (sf_dir, centroid bytes, applicationId):
    # a model or fixture change can never serve a stale index, and the
    # applicationId makes the path SESSION-scoped (round 13 — the
    # q_join_bucketed write-once discipline): the old sf_dir-keyed tag
    # could serve a prior session's files, and re-publishing the index
    # on every call made bench best-of-2 pay the build twice.  Build
    # once per session (skip when this session's _SUCCESS marker
    # exists), probe every call — the faiss deployment shape the
    # docstring describes.
    tag = hashlib.sha1(
        sf_dir.encode()
        + repr(cents).encode()
        + spark.sparkContext.applicationId.encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pfithic_ivf_index_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        llmops.ivf_write_index(e, cents, path)
        # round-14 ADVICE: the applicationId-scoped tag means every
        # session builds a fresh dir that nothing reuses afterwards —
        # remove it at interpreter exit so long-lived hosts don't
        # accumulate index copies in /tmp.  (Own path only: sweeping
        # OTHER pfithic_ivf_index_* dirs could yank a concurrently
        # running session's live index.)
        if path not in _IVF_TMP_REGISTERED:
            _IVF_TMP_REGISTERED.add(path)
            import atexit
            import shutil

            atexit.register(shutil.rmtree, path, True)
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
