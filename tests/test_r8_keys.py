"""Round-8 key edge cases the sf fixtures cannot reach — closed-form
planted inputs for the §2.20 keys (robust statistics, sketches,
deterministic sampling, removal-effect attribution)."""
from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401


def _write_orders_daily(spark, sf, cents_by_day):
    """Plant an orders table with EXACTLY one order per (day, cents)
    pair so the day-grain keys see the given daily revenue series."""
    rows = []
    okey = 0
    for day, cents in cents_by_day:
        okey += 1
        rows.append((okey, 1, f"1997-01-{day + 1:02d}", cents / 100.0))
    (
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, d string, o_totalprice double"
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("d").cast("date").alias("o_orderdate"),
            "o_totalprice",
            F.lit("1-URGENT").alias("o_orderpriority"),
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/orders.parquet")
    )


def test_isotonic_trend_pools_adjacent_violators(spark, tmp_path):
    """[10, 20, 15, 30] must pool the (20, 15) violation to 17.5 —
    the PAVA minimax closed form, checked exactly."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_orders_daily(
        spark, sf, [(0, 1000), (1, 2000), (2, 1500), (3, 3000)]
    )
    out = {
        int(r["dayidx"]): r["iso_fit_usd"]
        for r in e.queries()["q_isotonic_trend"](spark, sf).collect()
    }
    days = sorted(out)
    fits = [out[d] for d in days]
    assert fits == [10.0, 17.5, 17.5, 30.0], fits


def test_hodges_lehmann_closed_form(spark, tmp_path):
    """Days [10, 20, 90] (cents): Walsh sums sorted are
    20,30,40,100,110,180 → median 70 → HL = 70/200 = 0.35 usd."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_orders_daily(spark, sf, [(0, 10), (1, 20), (2, 90)])
    r = e.queries()["q_hodges_lehmann"](spark, sf).collect()[0]
    assert r["n_days"] == 3 and r["n_pairs"] == 6
    assert r["hl_usd"] == 0.35, r


def test_kruskal_wallis_known_value(spark, tmp_path):
    """Five groups of two with perfectly separated values: ranks
    (1,2),(3,4),... → H = 12·382.5/110 − 33 = 8.7272…; no ties, all
    five priorities present so the verdict compares df=4."""
    import __spark_entry__ as e

    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []
    for gi, p in enumerate(pris):
        for j in (1, 2):
            v = gi * 2 + j  # cents 1..10
            rows.append((len(rows) + 1, 1, "1997-01-01", v / 100.0, p))
    (
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, d string, "
            "o_totalprice double, o_orderpriority string",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("d").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/orders.parquet")
    )
    r = e.queries()["q_kruskal_wallis"](spark, str(tmp_path)).collect()[0]
    assert r["n_total"] == 10 and r["k_groups"] == 5
    want = 12.0 * 382.5 / (10 * 11) - 3.0 * 11
    assert abs(r["h_stat"] - round(want, 6)) < 1e-9, (r["h_stat"], want)
    assert r["reject_h0"] is False  # 8.73 < 9.4877


def test_huber_downweights_flash_sale_day(spark, tmp_path):
    """y = 100·x cents on 25 days except a +1e7 spike on the LAST day
    (an end-of-range outlier drags the OLS slope; a mid-range one only
    drags the intercept): the Huber slope must sit far closer to the
    true 1 usd/day and the spike day must be down-weighted."""
    import __spark_entry__ as e

    series = [(d, 100 * d + 100) for d in range(25)]
    series[24] = (24, 100 * 24 + 100 + 10_000_000)
    sf = str(tmp_path)
    _write_orders_daily(spark, sf, series)
    r = e.queries()["q_huber_regression"](spark, sf).collect()[0]
    assert r["n_days"] == 25
    assert abs(r["slope_ols_usd"] - 1.0) > 100, r  # dragged hard
    assert abs(r["slope_huber_usd"] - 1.0) < 0.5, r
    assert r["n_downweighted"] >= 1, r


def test_partial_autocorr_linear_series(spark, tmp_path):
    """A strictly increasing series: ACF(1) near 1, and the lag-1 PACF
    must EQUAL the lag-1 ACF exactly (Durbin–Levinson level 1 is the
    identity p1_1 = r1)."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_orders_daily(spark, sf, [(d, 1000 + 100 * d) for d in range(28)])
    out = {
        int(r["lag"]): r
        for r in e.queries()["q_partial_autocorr"](spark, sf).collect()
    }
    assert sorted(out) == [1, 2, 3, 4, 5, 6, 7]
    assert out[1]["pacf"] == out[1]["acf"]
    assert out[1]["acf"] > 0.8, out[1]


def test_theil_index_equal_revenue_is_zero(spark, tmp_path):
    """Every customer with identical revenue → r = 1, ln r = 0: total,
    between and within must all be exactly 0."""
    import __spark_entry__ as e

    rows = [(i, i % 4 + 1, "1997-01-01", 123.45) for i in range(1, 9)]
    (
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, d string, o_totalprice double",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("d").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/orders.parquet")
    )
    cust = spark.createDataFrame(
        [(c, c % 2) for c in (1, 2, 3, 4)],
        "c_custkey long, c_nationkey long",
    )
    cust.write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    r = e.queries()["q_theil_index"](spark, str(tmp_path)).collect()[0]
    assert r["n_customers"] == 4
    assert r["theil_total"] == 0.0
    assert r["theil_between"] == 0.0
    assert r["theil_within"] == 0.0


def test_markov_attribution_closed_form(spark, tmp_path):
    """Planted journeys — 4 users click→purchase, 4 users view→(end):
    P(conv) = 0.5 entirely through click, so removing click zeroes
    conversion (full credit) and removing view changes nothing."""
    import __spark_entry__ as e

    rows = []
    eid = 0
    for u in range(1, 5):  # click -> purchase
        for i, et in enumerate(["click", "purchase"]):
            eid += 1
            rows.append((eid, f"2024-01-01 0{i}:00:00", u, et))
    for u in range(5, 9):  # view, never converts
        eid += 1
        rows.append((eid, "2024-01-01 00:00:00", u, "view"))
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/events.parquet")
    )
    out = {
        r["channel"]: r
        for r in e.queries()["q_markov_attribution"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["click"]["p_full"] == 0.5
    assert out["click"]["p_removed"] == 0.0
    assert out["click"]["removal_effect"] == 0.5
    assert out["click"]["attribution"] == 1.0
    assert out["view"]["p_removed"] == 0.5
    assert out["view"]["removal_effect"] == 0.0
    assert out["view"]["attribution"] == 0.0
    # absent channels carry zero effect, not NULL/NaN
    assert out["error"]["removal_effect"] == 0.0
    assert out["signup"]["removal_effect"] == 0.0


def test_negative_sampling_all_brands_owned_always_clashes(spark, tmp_path):
    """A corpus whose ONE customer purchased EVERY brand: any sampled
    negative collides with a positive — Σn_clash must equal Σn_pairs
    (the flag-not-resample contract)."""
    import __spark_entry__ as e

    brands = ["B#1", "B#2", "B#3"]
    orders = [(k + 1, 7, "1997-01-01", 1.0) for k in range(3)]
    (
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, d string, o_totalprice double",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("d").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/orders.parquet")
    )
    spark.createDataFrame(
        [(k + 1, k + 1, 1) for k in range(3)],
        "l_orderkey long, l_partkey long, l_linenumber long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(k + 1, brands[k]) for k in range(3)],
        "p_partkey long, p_brand string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    rows = e.queries()["q_negative_sampling"](spark, str(tmp_path)).collect()
    n_pairs = sum(r["n_pairs"] for r in rows)
    n_clash = sum(r["n_clash"] for r in rows)
    assert n_pairs == 6  # 3 positives x 2 slots
    assert n_clash == n_pairs, rows


def test_weighted_sample_prefers_heavy_docs(spark, tmp_path):
    """50 heavy docs (n_chars = 100000) vs 500 light (n_chars = 10):
    the top-100 A-ES draw must contain every heavy doc — with key
    u^(1/w), a 10^4 weight ratio makes a light doc beating a heavy one
    require u_light^(1/10) > u_heavy^(1/100000), astronomically rare
    under the fixed hash (checked deterministically here)."""
    import __spark_entry__ as e

    rows = [(i, "x", "en", "s", 100_000) for i in range(50)]
    rows += [(1000 + i, "x", "en", "s", 10) for i in range(500)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = e.queries()["q_weighted_sample"](spark, str(tmp_path)).collect()
    assert len(out) == 100
    heavy = [r for r in out if r["doc_id"] < 50]
    assert len(heavy) == 50, len(heavy)
    # determinism: a second run returns the identical set in order
    out2 = e.queries()["q_weighted_sample"](spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in out2]


def test_tdigest_tail_resolution_and_conservation(spark, tmp_path):
    """4,000 uniform values: total count conserved, centroid [lo, hi]
    ranges non-overlapping and ordered, means inside their ranges, and
    the TAIL centroids hold FEWER rows than the middle ones (k' = 2 at
    the tails vs ½ mid — the t-digest property a plain equi-depth
    histogram lacks)."""
    import __spark_entry__ as e

    n = 4000
    spark.createDataFrame(
        [(i // 7 + 1, i % 7 + 1, (1000 + i) / 100.0) for i in range(n)],
        "l_orderkey long, l_linenumber long, l_extendedprice double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    rows = sorted(
        e.queries()["q_tdigest_quantiles"](spark, str(tmp_path)).collect(),
        key=lambda r: r["centroid"],
    )
    assert sum(r["n_rows"] for r in rows) == n
    for a, b in zip(rows, rows[1:]):
        assert a["hi_usd"] <= b["lo_usd"], (a, b)
    for r in rows:
        assert r["lo_usd"] <= r["mean_usd"] <= r["hi_usd"], r
    mid = rows[len(rows) // 2]["n_rows"]
    assert rows[0]["n_rows"] < mid and rows[-1]["n_rows"] < mid, (
        rows[0]["n_rows"],
        mid,
        rows[-1]["n_rows"],
    )
    # digest-reconstructed median within the widest centroid of truth
    cum = 0
    for r in rows:
        cum += r["n_rows"]
        if cum >= n / 2:
            true_med = (1000 + n / 2) / 100.0
            assert r["lo_usd"] <= true_med <= r["hi_usd"] or abs(
                r["mean_usd"] - true_med
            ) < (rows[len(rows) // 2]["hi_usd"] - rows[len(rows) // 2]["lo_usd"]) * 2
            break


def test_pq_codes_invariants(spark):
    """Registry-level invariants at sf0.001: per-subspace counts
    conserve the corpus, codes stay in [0, 16), errors are
    non-negative, and all 8 subspaces report."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    n = (
        spark.read.parquet(f"{sf}/embeddings.parquet").count()
    )
    rows = e.queries()["q_pq_codes"](spark, sf).collect()
    by_sub = {}
    for r in rows:
        assert 0 <= r["code"] < 16
        assert r["sum_qdist"] >= 0
        by_sub.setdefault(r["subspace"], 0)
        by_sub[r["subspace"]] += r["n_vecs"]
    assert sorted(by_sub) == list(range(8)), sorted(by_sub)
    assert all(v == n for v in by_sub.values()), by_sub


def test_brown_forsythe_spread_separation(spark, tmp_path):
    """Five groups of {c−d, c, c+d}: equal d everywhere → the
    between-group spread term cancels EXACTLY (bf_f = 0.0, no
    rejection); one group with a much larger d → rejection."""
    import __spark_entry__ as e

    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def write(ds):
        rows = []
        for gi, (p, dd) in enumerate(zip(pris, ds)):
            c = 1000 * (gi + 1)
            for v in (c - dd, c, c + dd):
                rows.append(
                    (len(rows) + 1, 1, "1997-01-01", v / 100.0, p)
                )
        (
            spark.createDataFrame(
                rows,
                "o_orderkey long, o_custkey long, d string, "
                "o_totalprice double, o_orderpriority string",
            )
            .select(
                "o_orderkey",
                "o_custkey",
                F.col("d").cast("date").alias("o_orderdate"),
                "o_totalprice",
                "o_orderpriority",
            )
            .write.mode("overwrite")
            .parquet(f"{tmp_path}/orders.parquet")
        )

    write([5, 5, 5, 5, 5])
    r = e.queries()["q_brown_forsythe"](spark, str(tmp_path)).collect()[0]
    assert r["n_total"] == 15 and r["k_groups"] == 5
    assert r["df1"] == 4 and r["df2"] == 10
    # the between term cancels mathematically; doubles leave ~1e-16
    assert abs(r["bf_f"]) < 1e-12, r["bf_f"]
    assert r["reject_equal_variance"] is False

    write([5, 5, 5, 5, 500])
    r = e.queries()["q_brown_forsythe"](spark, str(tmp_path)).collect()[0]
    assert r["bf_f"] > _bf_crit()
    assert r["reject_equal_variance"] is True


def _bf_crit():
    from pfithic_spark.registry.keys_r8 import _BF_F_95_DF4_INF

    return _BF_F_95_DF4_INF
