"""Aggregation operators (SURVEY.md §2.4).

All aggregations are expressed with built-in Catalyst aggregates so the
planner emits partial (map-side) + final HashAggregate pairs — the Spark
equivalent of the reference's per-chunk accumulation
[P `fithic.py::read_All_Interactions`] and pandas groupby vectorization.

Determinism note (FIXTURES.md §4): floating-point SUM over a shuffled
dataset is order-dependent in the last ulps, which breaks value-hash
comparison against the oracle.  Monetary/quantity sums therefore go
through exact DECIMAL accumulation (:func:`dsum`) and only convert to
DOUBLE at the end — bit-identical on both engines and, at 100 TB, also
the numerically safer choice (no catastrophic cancellation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Exact sum: per-row cast to DECIMAL(18,scale), sum, cast to DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum / row count, in DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Flagship query: TPC-H-Q1-shaped pricing summary.

    Spark analogue of the reference's core per-group vectorized
    aggregation (pFitHiC pandas groupby+agg [P]).  Single shuffle on the
    two grouping keys; all eight aggregates computed in one pass with
    map-side partials.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate").cast("date") <= F.lit(cutoff).cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            # products of 2-dp inputs have 4/6 natural decimal digits;
            # scale 6 keeps the per-row decimal cast tie-free on both
            # engines (HALF_UP vs half-even diverge on exact ties)
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            (dsum("l_discount", 6) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip()


def global_contact_stats(contacts: DataFrame, dist_lo: int, dist_hi: int) -> DataFrame:
    """One-pass global scalars over a canonical contacts table.

    Mirrors the reference's single pass that accumulates
    observedIntraInRangeSum / observedIntraAllSum / observedInterAllSum
    and the distance extrema [P `fithic.py::read_All_Interactions`] —
    here a single ``agg`` job with conditional sums, so Spark computes
    every scalar in one scan regardless of data size.
    """
    d = F.col("mid2") - F.col("mid1")
    intra = F.col("chr1") == F.col("chr2")
    in_range = intra & d.between(dist_lo, dist_hi)
    cc = F.col("contact_count")
    zero = F.lit(0).cast("long")
    return contacts.agg(
        F.coalesce(F.sum(F.when(in_range, cc)), zero).alias("intra_in_range_sum"),
        F.coalesce(F.sum(F.when(in_range, 1)), zero).alias("intra_in_range_count"),
        F.coalesce(F.sum(F.when(intra, cc)), zero).alias("intra_all_sum"),
        F.coalesce(F.sum(F.when(~intra, cc)), zero).alias("inter_all_sum"),
        F.coalesce(F.max(F.when(intra, d)), zero).alias("max_intra_dist"),
        F.coalesce(F.min(F.when(intra, d)), zero).alias("min_intra_dist"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def marginal_counts(contacts: DataFrame) -> DataFrame:
    """Per-fragment marginal contact counts (both endpoints).

    Union of the two endpoint projections then one hash aggregation —
    the fragments-file / KR-input generation path
    [P `utils/createFitHiCFragments*`].  The union is narrow (no
    shuffle); the single groupBy is the only exchange.
    """
    e1 = contacts.select(
        F.col("chr1").alias("chr"), F.col("mid1").alias("mid"), "contact_count"
    )
    e2 = contacts.select(
        F.col("chr2").alias("chr"), F.col("mid2").alias("mid"), "contact_count"
    )
    return (
        e1.unionByName(e2)
        .groupBy("chr", "mid")
        .agg(
            F.sum("contact_count").alias("marginal_count"),
            F.count(F.lit(1)).alias("n_contacts"),
        )
    )


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "sum_value",
) -> DataFrame:
    """Two-stage salted aggregation for pathologically skewed keys.

    Hi-C distance keys are power-law skewed (small distances dominate
    [P]); hash partial aggregation usually absorbs this, and AQE splits
    skewed reducers — but when one key's partials still overwhelm a
    reducer, salting splits it explicitly: stage 1 aggregates on
    (key, salt), stage 2 merges the ≤ n_salts partials per key.  The
    result is identical for any algebraic aggregate (integer/decimal
    sums here, so bit-identical).
    """
    from pyspark.sql import functions as F

    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    stage1 = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_partial")
    )
    return stage1.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))
