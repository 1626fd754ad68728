"""Property tests for the §2.21 keys: random inputs vs brute-force
python references.  The DuckDB oracles pin one fixture distribution;
these pin the SEMANTICS (tie half-weights, discordant-only pairs,
register maxima, block caps, multiplicity arithmetic) over adversarial
generated data.  Few examples, each a real Spark job — sized to hit
structure, not to be many."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as hs
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


def _knuth(x: int) -> int:
    return ((x % 2654435761) * 2654435761) % 4294967296


def _orders(spark, sf, rows):
    """rows: (okey, cents, urgent, status_f)"""
    (
        spark.createDataFrame(
            [
                (
                    k,
                    1,
                    "1997-01-01",
                    c / 100.0,
                    "1-URGENT" if u else "5-LOW",
                    "F" if f else "O",
                )
                for k, c, u, f in rows
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
        hs.tuples(hs.integers(1, 8), hs.booleans()),  # (cents, urgent)
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_roc_auc_matches_pairwise_bruteforce(spark, tmp_path_factory, data):
    """2U must equal the O(n²) pairwise count (2 per win, 1 per tie)
    exactly, for any score/label multiset."""
    import __spark_entry__ as e

    sf = str(tmp_path_factory.mktemp("auc"))
    rows = [(i + 1, c, u, False) for i, (c, u) in enumerate(data)]
    _orders(spark, sf, rows)
    r = e.queries()["q_roc_auc"](spark, sf).collect()[0]
    pos = [c for c, u in data if u]
    neg = [c for c, u in data if not u]
    two_u = sum(
        2 if p > q else (1 if p == q else 0) for p in pos for q in neg
    )
    assert (r["n_pos"], r["n_neg"], r["two_u"]) == (
        len(pos),
        len(neg),
        two_u,
    )
    if pos and neg:
        assert r["auc"] == two_u / (2.0 * (float(len(pos)) * float(len(neg))))
    else:
        assert r["auc"] is None


@given(
    data=hs.lists(
        hs.tuples(hs.integers(0, 5), hs.integers(0, 1)),  # (value, grp)
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_cliffs_delta_matches_bruteforce(spark, tmp_path_factory, data):
    """delta must equal (#(x>y) − #(x<y))/(n0·n1) over all pairs."""
    import __spark_entry__ as e

    sf = str(tmp_path_factory.mktemp("cliffs"))
    (
        spark.createDataFrame(
            [(i, g, float(v)) for i, (v, g) in enumerate(data)],
            "event_id long, user_id long, value double",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/events.parquet")
    )
    r = e.queries()["q_cliffs_delta"](spark, sf).collect()[0]
    g0 = [v for v, g in data if g == 0]
    g1 = [v for v, g in data if g == 1]
    assert (r["n0"], r["n1"]) == (len(g0), len(g1))
    if g0 and g1:
        num = sum(
            (1 if x > y else 0) - (1 if x < y else 0)
            for x in g0
            for y in g1
        )
        assert r["delta"] == float(num) / float(len(g0) * len(g1))
    else:
        assert r["delta"] is None


@given(
    flags=hs.lists(
        hs.tuples(hs.booleans(), hs.booleans()),  # (urgent95, urgent96)
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_mcnemar_matches_discordant_count(spark, tmp_path_factory, flags):
    import __spark_entry__ as e

    sf = str(tmp_path_factory.mktemp("mcn"))
    rows, okey = [], 0
    for cust, (a, b) in enumerate(flags, start=1):
        okey += 1
        rows.append(
            (okey, cust, "1995-06-01", 1.0,
             "1-URGENT" if a else "5-LOW", "O")
        )
        okey += 1
        rows.append(
            (okey, cust, "1996-06-01", 1.0,
             "1-URGENT" if b else "5-LOW", "O")
        )
    (
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, d string, "
            "o_totalprice double, o_orderpriority string, "
            "o_orderstatus string",
        )
        .select(
            "o_orderkey", "o_custkey",
            F.col("d").cast("timestamp").alias("o_orderdate"),
            "o_totalprice", "o_orderpriority", "o_orderstatus",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/orders.parquet")
    )
    r = e.queries()["q_mcnemar"](spark, sf).collect()[0]
    n10 = sum(1 for a, b in flags if a and not b)
    n01 = sum(1 for a, b in flags if b and not a)
    assert (r["n_subjects"], r["n10"], r["n01"]) == (
        len(flags), n10, n01,
    )
    if n10 + n01 == 0:
        assert r["chi2_cc"] is None
    else:
        d = max(abs(n10 - n01) - 1, 0)
        assert r["chi2_cc"] == float(d * d) / float(n10 + n01)


@given(users=hs.lists(hs.integers(0, 10**12), min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_hll_registers_match_python_mirror(spark, tmp_path_factory, users):
    """z_scaled, n_zero and n_exact must match the integer python
    mirror of the register build for arbitrary user-id multisets."""
    import __spark_entry__ as e

    sf = str(tmp_path_factory.mktemp("hll"))
    (
        spark.createDataFrame(
            [(i, u) for i, u in enumerate(users)],
            "event_id long, user_id long",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/events.parquet")
    )
    regs: dict[int, int] = {}
    for u in users:
        h = _knuth(u)
        b, w = h // 16777216, h % 16777216
        rho = 25 if w == 0 else 25 - len(bin(w)[2:])
        regs[b] = max(regs.get(b, 0), rho)
    z = sum(1 << (32 - regs.get(b, 0)) for b in range(256))
    r = e.queries()["q_hll_sketch"](spark, sf).collect()[0]
    assert (r["n_zero"], r["z_scaled"], r["n_exact"]) == (
        256 - len(regs), z, len(set(users)),
    )


@given(
    custs=hs.lists(
        # (custkey, name digit, band source, block)
        hs.tuples(
            hs.integers(1, 400),
            hs.integers(0, 2),
            hs.integers(0, 1),
            hs.integers(0, 1),
        ),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_record_linkage_matches_bruteforce(spark, tmp_path_factory, custs):
    """The per-class (n_pairs, sum_w_micro) census must match an O(n²)
    python scorer over the same blocked, rank-capped pair set."""
    import __spark_entry__ as e

    sf = str(tmp_path_factory.mktemp("rl"))
    rows = [
        (k, f"Cust#{dig}", blk, "S", float(band * 2000))
        for k, dig, band, blk in custs
    ]
    (
        spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_mktsegment string, c_acctbal double",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/customer.parquet")
    )
    out = {
        r["classification"]: (r["n_pairs"], r["sum_w_micro"])
        for r in e.queries()["q_record_linkage"](spark, sf).collect()
    }
    W = {
        "name": (2251292, -2890372),
        "band": (2890372, -2251292),
        "hash": (4412192, -1886757),
    }
    want: dict[str, list[int]] = {}
    by_block: dict[int, list] = {}
    for k, dig, band, blk in sorted(custs):
        by_block.setdefault(blk, []).append((k, dig, band))
    for members in by_block.values():
        members = members[:100]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (k1, d1, b1), (k2, d2, b2) = members[i], members[j]
                cents1 = round(b1 * 2000 * 100)
                cents2 = round(b2 * 2000 * 100)
                w = (
                    W["name"][0 if d1 == d2 else 1]
                    + W["band"][
                        0 if cents1 // 100000 == cents2 // 100000 else 1
                    ]
                    + W["hash"][0 if k1 % 97 == k2 % 97 else 1]
                )
                cls = (
                    "link"
                    if w >= 4_000_000
                    else ("possible" if w >= 0 else "non_link")
                )
                acc = want.setdefault(cls, [0, 0])
                acc[0] += 1
                acc[1] += w
    assert out == {k: tuple(v) for k, v in want.items()}
