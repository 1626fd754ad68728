"""Property tests for the §2.22 keys: random inputs vs brute-force
python references.  The DuckDB oracles pin one fixture distribution;
these pin the SEMANTICS (the pairwise energy identity, the Gini rank
formula, summary rank-error bounds, RRF integer fusion) over
adversarial generated multisets.  Few examples, each a real Spark job
— sized to hit structure, not to be many."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as hs
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


def _orders(spark, sf, rows):
    """rows: (okey, custkey, cents, urgent)"""
    (
        spark.createDataFrame(
            [
                (
                    k,
                    ck,
                    "1997-01-01",
                    c / 100.0,
                    "1-URGENT" if u else "5-LOW",
                    "O",
                )
                for k, ck, c, u in rows
            ],
            "o_orderkey long, o_custkey long, d string, "
            "o_totalprice double, o_orderpriority string, "
            "o_orderstatus string",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("d").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
            "o_orderpriority",
            "o_orderstatus",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/orders.parquet")
    )


@given(
    data=hs.lists(
        hs.tuples(hs.integers(0, 50), hs.booleans()),  # (cents, group X?)
        min_size=2,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_energy_distance_matches_pairwise_bruteforce(
    spark, tmp_path_factory, data
):
    """The prefix-sum identity must reproduce the O(n²) pairwise
    energy 2·E|X−Y| − E|X−X'| − E|Y−Y'| for ANY two multisets —
    including heavy ties, empty sides (NULL), and X==Y (exactly 0).
    The double chain is mirrored exactly (hi/lo 2²¹ reconstruction)."""
    import __spark_entry__ as e

    sf = str(tmp_path_factory.mktemp("ed"))
    rows = [
        (i + 1, 1, c, in_x) for i, (c, in_x) in enumerate(data)
    ]
    _orders(spark, sf, rows)
    r = e.queries()["q_energy_distance"](spark, sf).collect()[0]
    xs = [c for c, in_x in data if in_x]
    ys = [c for c, in_x in data if not in_x]
    assert r["n_x"] == len(xs) and r["n_y"] == len(ys)
    if not xs or not ys:
        assert r["energy_cents"] is None
        return
    sxy = sum(abs(a - b) for a in xs for b in ys)
    sxx = sum(abs(a - b) for a in xs for b in xs)
    syy = sum(abs(a - b) for a in ys for b in ys)

    def rec(t):
        return float(t // 2097152) * 2097152.0 + float(t % 2097152)

    want = (
        2.0 * rec(sxy) / (float(len(xs)) * float(len(ys)))
        - rec(sxx) / (float(len(xs)) * float(len(xs)))
        - rec(syy) / (float(len(ys)) * float(len(ys)))
    )
    assert r["energy_cents"] == want, (r["energy_cents"], want)


@given(
    cents=hs.lists(hs.integers(0, 10_000), min_size=1, max_size=25)
)
@settings(**_SETTINGS)
def test_gini_matches_rank_formula_bruteforce(
    spark, tmp_path_factory, cents
):
    """Gini must equal the sorted-rank formula computed brute-force
    (with the identical 2³⁹ hi/lo double reconstruction) for any
    revenue multiset, and must sit in [0, 1) when total > 0."""
    import __spark_entry__ as e

    sf = str(tmp_path_factory.mktemp("gini"))
    rows = [(i + 1, i + 1, c, False) for i, c in enumerate(cents)]
    _orders(spark, sf, rows)
    r = e.queries()["q_gini_coefficient"](spark, sf).collect()[0]
    n, tot = len(cents), sum(cents)
    assert r["n_customers"] == n and r["total_cents"] == tot
    if tot == 0:
        assert r["gini"] is None
        return
    xs = sorted(cents)
    terms = [(i + 1) * x for i, x in enumerate(xs)]
    hi = sum(t // 549755813888 for t in terms)
    lo = sum(t % 549755813888 for t in terms)
    s_ix = float(hi) * 549755813888.0 + float(lo)
    want = (2.0 * s_ix - (float(n) + 1.0) * float(tot)) / (
        float(n) * float(tot)
    )
    assert r["gini"] == want
    assert 0.0 <= r["gini"] < 1.0


@given(
    prices=hs.lists(
        hs.integers(1, 300), min_size=1, max_size=40, unique=True
    )
)
@settings(**_SETTINGS)
def test_quantile_sketch_rank_error_bound(
    spark, tmp_path_factory, prices
):
    """For ANY value set: est/exact values are the true order
    statistics at their printed ranks, and |rank_gap| < step (the
    1/512 uniform guarantee's mechanism) with step = min power of
    two with n ≤ 512·step."""
    import __spark_entry__ as e
    import pandas as pd

    sf = str(tmp_path_factory.mktemp("qsk"))
    pd.DataFrame(
        {
            "l_orderkey": range(1, len(prices) + 1),
            "l_linenumber": [1] * len(prices),
            "l_partkey": [1] * len(prices),
            "l_quantity": [1.0] * len(prices),
            "l_extendedprice": [p / 100.0 for p in prices],
        }
    ).to_parquet(f"{sf}/lineitem.parquet")
    rows = e.queries()["q_quantile_sketch"](spark, sf).collect()
    n = len(prices)
    step = 1
    while 512 * step < n:
        step *= 2
    xs = sorted(prices)
    assert len(rows) == 7
    for r in rows:
        assert r["step"] == step
        assert r["exact_cents"] == xs[r["target_rank"] - 1]
        assert r["est_cents"] == xs[r["est_rank"] - 1]
        assert r["est_rank"] % step == 0
        assert abs(r["rank_gap"]) < step or r["est_rank"] == (
            n // step
        ) * step
