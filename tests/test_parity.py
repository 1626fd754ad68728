"""Driver-replica parity gate: every registered oracle-backed query must
hash-match DuckDB; rows-only queries must run and return a stable schema."""

from __future__ import annotations

import pytest

from oracle_harness import compare, oracle_connection


def _registry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = _registry()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = oracle_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_parity(key, spark, sf_dir, con):
    from pfithic_spark.registry import GOLDEN_ORACLE_KEYS

    df = QUERIES[key](spark, sf_dir)
    # Registry-wide contract (round-9 verdict #1): no key's OUTPUT
    # schema may contain DecimalType — the driver's value hasher
    # distinguishes Decimal('6.104830') from float 6.10483, so a
    # decimal output column hash-fails on any trailing-zero cell even
    # when the values are bit-identical to the oracle.  Decimals stay
    # INTERNAL (exact sums, §8.16 round-before-rank); the final
    # projection casts to double.
    assert "decimal" not in df.schema.simpleString(), (
        f"{key}: output schema contains DecimalType — cast to double "
        f"in the final projection ({df.schema.simpleString()})"
    )
    if key in GOLDEN_ORACLE_KEYS and not sf_dir.rstrip("/").endswith("sf0.01"):
        # golden parquet is pinned to the driver's sf0.01 gate scale;
        # the bit-exact compare for these keys runs in
        # test_golden_oracles_at_gate_scale below
        rows = df.collect()
        assert len(rows) >= 0
    elif key in ORACLES:
        compare(df, con, ORACLES[key], key=key)
    else:
        # rows-only check: FULL collect — count() alone can prune UDF
        # columns and mask worker-side import/compute failures
        rows = df.collect()
        assert len(rows) >= 0
        assert len(df.columns) > 0


def test_golden_oracles_at_gate_scale(spark):
    """Golden-parquet oracle keys compared bit-exact at sf0.01 — the
    same (sf, oracle) pairing the driver's gate evaluates."""
    from pfithic_spark.registry import GOLDEN_ORACLE_KEYS

    gate_sf = "/root/testdata/sf0.01"
    con = oracle_connection(gate_sf)
    try:
        for key in sorted(GOLDEN_ORACLE_KEYS):
            compare(QUERIES[key](spark, gate_sf), con, ORACLES[key], key=key)
    finally:
        con.close()


def test_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_salted_sum_equals_direct(spark, sf_dir):
    """Salted two-stage aggregation must equal the direct groupBy."""
    from pfithic_spark import fixtures as fx
    from pfithic_spark.aggregates import salted_sum
    from pfithic_spark.relational import with_distance
    from pyspark.sql import functions as F

    c = with_distance(fx.fixture_contacts(spark, sf_dir))
    direct = {
        r["dist"]: r["s"]
        for r in c.groupBy("dist").agg(F.sum("contact_count").alias("s")).collect()
    }
    salted = {
        r["dist"]: r["sum_value"]
        for r in salted_sum(c, ["dist"], "contact_count", n_salts=8).collect()
    }
    assert direct == salted


def test_bh_scalable_equals_naive(spark, sf_dir):
    """Two-phase distributed BH must equal the single-window form."""
    from pfithic_spark import fixtures as fx, windows as win
    from pyspark.sql import functions as F

    c = fx.fixture_contacts(spark, sf_dir).withColumn(
        "p_value",
        ((F.col("mid1") * 31 + F.col("mid2") * 17) % 1000003).cast("double")
        / 1000003.0,
    )
    naive = win.bh_fdr(c, "p_value", m=124750, tiebreak=["mid1", "mid2"])
    twop = win.bh_fdr_scalable(c, "p_value", m=124750, tiebreak=["mid1", "mid2"])
    a = {(r["mid1"], r["mid2"]): r["q_value"] for r in naive.collect()}
    b = {(r["mid1"], r["mid2"]): r["q_value"] for r in twop.collect()}
    assert a == b


def test_approx_quantile_accuracy(spark, sf_dir):
    """Sketch quantiles must land within 2% relative error of the exact
    interpolated percentiles (accuracy=10000 → rank error ≤ 1/10000)."""
    import __spark_entry__ as e

    q = e.queries()
    approx = {
        r["o_orderpriority"]: (r["median_approx"], r["p90_approx"])
        for r in q["q_agg_approx_quantile"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: (r["median_price"], r["p90_price"])
        for r in q["q_agg_percentile"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k, (m_a, p_a) in approx.items():
        m_e, p_e = exact[k]
        assert abs(m_a - m_e) / m_e < 0.02, (k, m_a, m_e)
        assert abs(p_a - p_e) / p_e < 0.02, (k, p_a, p_e)


def test_pagerank_fast_path_equals_distributed(spark, sf_dir):
    """The driver numpy fast path and the distributed 5-iteration loop
    must agree BIT-FOR-BIT (integer rank mass) — same contract as the
    connected-components union-find fast path."""
    import __spark_entry__ as e
    from pfithic_spark.registry import pagerank_lazy

    fast = {
        r["node"]: r["rank"]
        for r in e.queries()["q_pagerank"](spark, sf_dir).collect()
    }
    ranks, invariants = pagerank_lazy(spark, sf_dir)
    dist = {r["node"]: r["rank"] for r in ranks.collect()}
    for inv in invariants:
        inv.unpersist()
    assert fast == dist
