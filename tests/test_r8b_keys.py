"""Round-8 §2.21 key edge cases the sf fixtures cannot reach —
closed-form planted inputs for the evaluation-metric / feature-
engineering / sketch keys (keys_r8b.py)."""
from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F  # noqa: F401


def _knuth(x: int) -> int:
    return ((x % 2654435761) * 2654435761) % 4294967296


def _md5_digit(s: str, pos: int) -> int:
    ch = hashlib.md5(s.encode()).hexdigest()[pos - 1]
    a = ord(ch)
    return a - 87 if a >= 97 else a - 48


def _write_orders(spark, sf, rows):
    """rows: (okey, custkey, date_str, totalprice, priority, status)"""
    (
        spark.createDataFrame(
            rows,
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


def _write_documents(spark, sf, rows):
    """rows: (doc_id, text, source)"""
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .write.mode("overwrite")
        .parquet(f"{sf}/documents.parquet")
    )


def test_roc_auc_half_weight_ties(spark, tmp_path):
    """Scores (cents) [100−, 200−, 200+, 300+]: U = 1.5 + 2 = 3.5
    (the tied 200 pair counts half), AUC = 3.5/4 = 0.875, two_u=7."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_orders(
        spark,
        sf,
        [
            (1, 1, "1997-01-01", 1.00, "5-LOW", "O"),
            (2, 1, "1997-01-01", 2.00, "5-LOW", "O"),
            (3, 1, "1997-01-01", 2.00, "1-URGENT", "O"),
            (4, 1, "1997-01-01", 3.00, "1-URGENT", "O"),
        ],
    )
    r = e.queries()["q_roc_auc"](spark, sf).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["two_u"]) == (2, 2, 7)
    assert r["auc"] == 0.875


def test_roc_auc_single_class_is_null(spark, tmp_path):
    """An all-positive corpus has no ranking to grade — NULL, not a
    divide-by-zero throw (§8.17)."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_orders(
        spark, sf, [(1, 1, "1997-01-01", 1.00, "1-URGENT", "O")]
    )
    r = e.queries()["q_roc_auc"](spark, sf).collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0


def test_mcnemar_discordant_closed_form(spark, tmp_path):
    """n10=1, n01=3 → chi2_cc = (|1−3|−1)²/4 = 0.25, not significant;
    the both-years and neither-year customers are concordant noise."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    rows = [
        # c1: urgent 1995 only  -> n10
        (1, 1, "1995-06-01", 1.0, "1-URGENT", "O"),
        (2, 1, "1996-06-01", 1.0, "5-LOW", "O"),
        # c2..c4: urgent 1996 only -> n01 ×3
        (3, 2, "1996-06-01", 1.0, "1-URGENT", "O"),
        (4, 3, "1996-06-01", 1.0, "1-URGENT", "O"),
        (5, 4, "1996-06-01", 1.0, "1-URGENT", "O"),
        # c5: both years (concordant)
        (6, 5, "1995-06-01", 1.0, "1-URGENT", "O"),
        (7, 5, "1996-06-01", 1.0, "1-URGENT", "O"),
        # c6: neither (non-urgent both years)
        (8, 6, "1995-06-01", 1.0, "5-LOW", "O"),
    ]
    _write_orders(spark, sf, rows)
    r = e.queries()["q_mcnemar"](spark, sf).collect()[0]
    assert (r["n_subjects"], r["n10"], r["n01"]) == (6, 1, 3)
    assert r["chi2_cc"] == 0.25 and r["significant"] is False


def test_mcnemar_all_concordant_is_null(spark, tmp_path):
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_orders(
        spark, sf, [(1, 1, "1995-06-01", 1.0, "1-URGENT", "O"),
                    (2, 1, "1996-06-01", 1.0, "1-URGENT", "O")]
    )
    r = e.queries()["q_mcnemar"](spark, sf).collect()[0]
    assert r["chi2_cc"] is None and r["significant"] is None


def test_target_encoding_smoothing_closed_form(spark, tmp_path):
    """Cell A: 2 customers, 1 positive; cell B: 2 customers, 0.
    prior = 1/4; enc_A = (1 + 10/4)/12 = 7/24, enc_B = (10/4)/12 =
    5/24 — exact rational chains both reachable as doubles."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    (
        spark.createDataFrame(
            [
                (1, "AUTO", 0),
                (2, "AUTO", 0),
                (3, "BLDG", 1),
                (4, "BLDG", 1),
            ],
            "c_custkey long, c_mktsegment string, c_nationkey int",
        )
        .withColumn("c_acctbal", F.lit(0.0))
        .write.mode("overwrite")
        .parquet(f"{sf}/customer.parquet")
    )
    _write_orders(
        spark, sf, [(1, 1, "1997-01-01", 1.0, "1-URGENT", "O")]
    )
    out = {
        r["segment"]: r
        for r in e.queries()["q_target_encoding"](spark, sf).collect()
    }
    a, b = out["AUTO"], out["BLDG"]
    assert (a["n_cust"], a["n_pos"]) == (2, 1)
    assert (b["n_cust"], b["n_pos"]) == (2, 0)
    assert a["enc"] == (1.0 + 10 * 0.25) / 12.0
    assert b["enc"] == (10 * 0.25) / 12.0


def test_split_information_gain_perfect_split(spark, tmp_path):
    """discount 0 → never returned, discount 0.10 → always returned
    (balanced): IG at threshold 0 is the full parent entropy ln 2;
    the constant quantity feature yields NO split rows (nl < n)."""
    import __spark_entry__ as e

    rows = []
    for i, (disc, flag) in enumerate(
        [(0.0, "N"), (0.0, "N"), (0.10, "R"), (0.10, "R")]
    ):
        rows.append((1, i, 5.0, disc, flag))
    (
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_linenumber int, l_quantity double, "
            "l_discount double, l_returnflag string",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/lineitem.parquet")
    )
    out = e.queries()["q_split_information_gain"](
        spark, str(tmp_path)
    ).collect()
    by_feat = {}
    for r in out:
        by_feat.setdefault(r["feature"], []).append(r)
    assert "quantity" not in by_feat  # single value → no valid split
    (d0,) = by_feat["discount"]
    assert d0["threshold"] == 0 and d0["n_left"] == 2
    assert d0["pos_left"] == 0
    assert float(d0["info_gain"]) == round(math.log(2.0), 9)


def test_calibration_bins_single_row_closed_form(spark, tmp_path):
    """One order: p6 = (knuth(k)·10⁶) div 2³², brier =
    (p6 − y·10⁶)²/10¹² — replicated exactly in python ints."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_orders(spark, sf, [(7, 1, "1997-01-01", 1.0, "5-LOW", "F")])
    p6 = (_knuth(7) * 1000000) // 4294967296
    r = e.queries()["q_calibration_bins"](spark, sf).collect()[0]
    assert r["bin"] == p6 // 100000 and r["n"] == 1
    assert r["mean_pred"] == p6 / 1e6
    assert r["obs_rate"] == 1.0
    sq = (p6 - 1000000) ** 2
    want = ((sq // 4294967296) * 4294967296.0 + (sq % 4294967296)) / 1e12
    assert r["brier"] == want


def test_feature_hash_buckets_match_python_md5(spark, tmp_path):
    """'alpha alpha beta': bucket(w) = 3 MD5 hex digits mod 512,
    replicated in python; counts exact."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_documents(spark, sf, [(1, "alpha alpha beta", "s0")])

    def bucket(w):
        return (
            _md5_digit(w, 1) * 256 + _md5_digit(w, 2) * 16 + _md5_digit(w, 3)
        ) % 512

    out = {
        r["bucket"]: (r["n_distinct"], r["n_tokens"])
        for r in e.queries()["q_feature_hash"](spark, sf).collect()
    }
    want = {}
    for w, c in [("alpha", 2), ("beta", 1)]:
        b = bucket(w)
        nd, nt = want.get(b, (0, 0))
        want[b] = (nd + 1, nt + c)
    assert out == want


def test_token_chi2_perfect_separator(spark, tmp_path):
    """Token 'hot' in all 5 docs of source A and none of B's 5:
    chi2 = 10·(5·5−0)²/(5·5·5·5) = 10 for both sources; a token in
    EVERY doc is excluded (df_w < n)."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    docs = []
    for i in range(5):
        docs.append((i, "hot common x" + str(i), "A"))
    for i in range(5, 10):
        docs.append((i, "cold common x" + str(i), "B"))
    _write_documents(spark, sf, docs)
    out = e.queries()["q_token_chi2"](spark, sf).collect()
    toks = {(r["token"], r["source"]): r for r in out}
    assert ("common", "A") not in toks  # df_w == n excluded
    hot_a = toks[("hot", "A")]
    assert hot_a["df_in_source"] == 5 and hot_a["df_total"] == 5
    assert float(hot_a["chi2"]) == 10.0
    assert float(toks[("cold", "B")]["chi2"]) == 10.0


def test_cross_correlation_perfect_lead(spark, tmp_path):
    """Urgent volume replays total volume one day later over the
    overlap: xcorr at lag +1 is exactly 1.0 (integer-exact sums,
    sqrt of a perfect square)."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    rows = []
    okey = 0
    x = [1, 2, 3, 9]  # total orders per day
    y = [0, 1, 2, 3]  # urgent per day = x shifted by one
    for d in range(4):
        for j in range(x[d]):
            okey += 1
            pri = "1-URGENT" if j < y[d] else "5-LOW"
            rows.append(
                (okey, 1, f"1997-01-{d + 1:02d}", 1.0, pri, "O")
            )
    _write_orders(spark, sf, rows)
    out = {
        r["lag"]: r
        for r in e.queries()["q_cross_correlation"](spark, sf).collect()
    }
    assert out[1]["n_days"] == 3
    assert out[1]["xcorr"] == 1.0
    # lags with no overlapping days emit no row at all (inner join)
    assert -7 not in out and 7 not in out
    # lag +3: single overlapping day → zero variance → NULL (§8.17)
    assert out[3]["n_days"] == 1 and out[3]["xcorr"] is None


def test_hll_sketch_registers_match_python(spark, tmp_path):
    """Small user set: z_scaled and the linear-counting estimate are
    replicated exactly in python ints (HALF_UP round of the ln term
    per §8.8)."""
    from decimal import ROUND_HALF_UP, Decimal

    import __spark_entry__ as e

    sf = str(tmp_path)
    users = [3, 17, 99, 12345, 999983]
    (
        spark.createDataFrame(
            [(i, u) for i, u in enumerate(users)],
            "event_id long, user_id long",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/events.parquet")
    )
    regs = {}
    for u in set(users):
        h = _knuth(u)
        b, w = h // 16777216, h % 16777216
        rho = 25 if w == 0 else 25 - len(bin(w)[2:])
        regs[b] = max(regs.get(b, 0), rho)
    z = sum(1 << (32 - regs.get(b, 0)) for b in range(256))
    n_zero = 256 - len(regs)
    r = e.queries()["q_hll_sketch"](spark, sf).collect()[0]
    assert (r["m"], r["n_zero"], r["z_scaled"], r["n_exact"]) == (
        256,
        n_zero,
        z,
        len(set(users)),
    )
    e_raw = (0.7213 / (1 + 1.079 / 256)) * 65536.0 * 4294967296.0 / z
    if e_raw <= 640.0 and n_zero > 0:
        ln9 = float(
            Decimal(repr(math.log(256.0 / n_zero))).quantize(
                Decimal("1e-9"), ROUND_HALF_UP
            )
        )
        assert r["estimate"] == 256.0 * ln9
    else:
        assert r["estimate"] == e_raw


def test_countmin_estimate_bounds(spark, tmp_path):
    """CM estimates never undercount; with a single-token vocabulary
    the estimate is exact."""
    import __spark_entry__ as e

    sf = str(tmp_path)
    _write_documents(spark, sf, [(1, "solo solo solo", "s0")])
    r = e.queries()["q_countmin_sketch"](spark, sf).collect()
    assert len(r) == 1
    assert r[0]["token"] == "solo" and r[0]["exact_count"] == 3
    assert r[0]["cm_estimate"] == 3 and r[0]["overcount"] == 0


def test_ndcg_uniform_gains_is_one_and_zero_gain_null(spark, tmp_path):
    """All retrieved docs share one grade → ideal ordering == retrieved
    ordering → NDCG exactly 1.0; an all-grade-0 group → NULL."""
    import __spark_entry__ as e

    # custkeys with h%4 == 3 (gain 7) for nation 0; h%4 == 0 for nation 1
    g3 = [k for k in range(1, 4000) if _knuth(k) % 4 == 3][:5]
    g0 = [k for k in range(1, 4000) if _knuth(k) % 4 == 0][:5]
    rows = [(k, "S", 0, float(k)) for k in g3] + [
        (k, "S", 1, float(k)) for k in g0
    ]
    (
        spark.createDataFrame(
            rows,
            "c_custkey long, c_mktsegment string, c_nationkey int, "
            "c_acctbal double",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/customer.parquet")
    )
    out = {
        r["nationkey"]: r
        for r in e.queries()["q_ndcg"](spark, str(tmp_path)).collect()
    }
    assert out[0]["n_ranked"] == 5 and out[0]["ndcg"] == 1.0
    assert out[1]["ndcg"] is None and float(out[1]["idcg"]) == 0.0


def test_silhouette_vector_on_centroid(spark, tmp_path):
    """A vector planted (in float32) on frozen centroid 0 lands in
    cluster 0 with silhouette ≈ 1 (a ≈ 0 up to float32 rounding)."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as e
    from pfithic_spark.registry.keys_r8b import _SIL_CENTROIDS_PATH

    cb = pd.read_parquet(_SIL_CENTROIDS_PATH).sort_values("cell")
    c0 = [float(np.float32(v)) for v in cb.iloc[0]["centroid"]]
    (
        spark.createDataFrame(
            pd.DataFrame({"vec_id": [1], "embedding": [c0], "label": [0]}),
            "vec_id long, embedding array<float>, label int",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/embeddings.parquet")
    )
    r = e.queries()["q_silhouette_score"](spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["cluster"] == 0
    assert r[0]["n_vecs"] == 1
    assert r[0]["mean_silhouette"] > 0.999


def test_cochran_armitage_perfect_trend(spark, tmp_path):
    """Failure rate rises 0/2 → 2/2 across the five ordered
    priorities: z replicated by the identical python IEEE chain."""
    import __spark_entry__ as e

    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    fails = [0, 0, 1, 2, 2]
    rows, okey = [], 0
    for w, (p, nf) in enumerate(zip(pris, fails), start=1):
        for j in range(2):
            okey += 1
            st = "F" if j < nf else "O"
            rows.append((okey, 1, "1997-01-01", 1.0, p, st))
    _write_orders(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_cochran_armitage"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    n, rr = 10, 5
    swn = sum(w * 2 for w in range(1, 6))
    swr = sum(w * f for w, f in zip(range(1, 6), fails))
    sw2n = sum(w * w * 2 for w in range(1, 6))
    pbar = float(rr) / float(n)
    num = float(swr) - pbar * float(swn)
    var = pbar * (1.0 - pbar) * (
        float(sw2n) - (float(swn) * float(swn)) / float(n)
    )
    assert (r["n"], r["r"], r["swr"]) == (n, rr, swr)
    assert r["z"] == num / math.sqrt(var)
    assert r["significant"] == (abs(num / math.sqrt(var)) > 1.959963984540054)


def test_cochran_armitage_constant_outcome_null(spark, tmp_path):
    import __spark_entry__ as e

    _write_orders(
        spark, tmp_path.as_posix(),
        [(1, 1, "1997-01-01", 1.0, "1-URGENT", "O"),
         (2, 1, "1997-01-01", 1.0, "5-LOW", "O")],
    )
    r = e.queries()["q_cochran_armitage"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["z"] is None and r["significant"] is None


def _write_events_values(spark, sf, rows):
    """rows: (event_id, user_id, value)"""
    (
        spark.createDataFrame(
            rows, "event_id long, user_id long, value double"
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/events.parquet")
    )


def test_cliffs_delta_full_separation_and_ties(spark, tmp_path):
    """grp0 strictly dominates grp1 → delta exactly 1.0 ('large');
    all-equal values → delta exactly 0.0 ('negligible')."""
    import __spark_entry__ as e

    sf = tmp_path.as_posix()
    _write_events_values(
        spark, sf,
        [(1, 0, 10.0), (2, 0, 20.0), (3, 1, 1.0), (4, 1, 2.0)],
    )
    r = e.queries()["q_cliffs_delta"](spark, sf).collect()[0]
    assert (r["n0"], r["n1"]) == (2, 2)
    assert r["delta"] == 1.0 and r["magnitude"] == "large"

    _write_events_values(
        spark, sf, [(1, 0, 5.0), (2, 1, 5.0), (3, 0, 5.0), (4, 1, 5.0)]
    )
    r = e.queries()["q_cliffs_delta"](spark, sf).collect()[0]
    assert r["delta"] == 0.0 and r["magnitude"] == "negligible"


def test_ab_srm_closed_form(spark, tmp_path):
    """Known-parity custkeys: chi2 = (nA−nB)²/N replicated in ints;
    a 9:1 split over 10k subjects alarms, a fair split does not."""
    import __spark_entry__ as e

    even = [k for k in range(1, 50000) if _knuth(k) % 2 == 0]
    odd = [k for k in range(1, 50000) if _knuth(k) % 2 == 1]
    keys = even[:9000] + odd[:1000]
    (
        spark.createDataFrame(
            [(k, "S", 0, 0.0) for k in keys],
            "c_custkey long, c_mktsegment string, c_nationkey int, "
            "c_acctbal double",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/customer.parquet")
    )
    r = e.queries()["q_ab_srm"](spark, tmp_path.as_posix()).collect()[0]
    assert (r["n_a"], r["n_b"]) == (9000, 1000)
    assert r["chi2"] == (8000 * 8000) / 10000.0
    assert r["srm_detected"] is True


def test_granger_lag1_python_replica(spark, tmp_path):
    """Deterministic small series: every sufficient statistic and the
    final F replicated in python with the SAME IEEE operation order —
    exact equality, no tolerance."""
    import __spark_entry__ as e

    y = [3, 5, 2, 7, 4, 6, 3, 8]   # daily order counts
    x = [1, 2, 0, 3, 1, 2, 0, 4]   # daily urgent counts (x <= y)
    rows, okey = [], 0
    for d, (yd, xd) in enumerate(zip(y, x)):
        for j in range(yd):
            okey += 1
            pri = "1-URGENT" if j < xd else "5-LOW"
            rows.append((okey, 1, f"1997-01-{d + 1:02d}", 1.0, pri, "O"))
    _write_orders(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_granger_lag1"](spark, tmp_path.as_posix()).collect()[0]

    yy = y[1:]
    ll = y[:-1]
    xx = x[:-1]
    t = float(len(yy))
    sy, sl, sx = float(sum(yy)), float(sum(ll)), float(sum(xx))
    syy, sll = float(sum(v * v for v in yy)), float(sum(v * v for v in ll))
    sxx = float(sum(v * v for v in xx))
    sly = float(sum(a * b for a, b in zip(ll, yy)))
    sxy = float(sum(a * b for a, b in zip(xx, yy)))
    slx = float(sum(a * b for a, b in zip(ll, xx)))
    cyy = syy - (sy * sy) / t
    cll = sll - (sl * sl) / t
    cxx = sxx - (sx * sx) / t
    cly = sly - (sl * sy) / t
    cxy = sxy - (sx * sy) / t
    clx = slx - (sl * sx) / t
    det = cll * cxx - clx * clx
    rss_r = cyy - (cly * cly) / cll
    rss_u = (
        cyy
        - ((cly * cxx - cxy * clx) / det) * cly
        - ((cxy * cll - cly * clx) / det) * cxy
    )
    f_stat = (rss_r - rss_u) / (rss_u / (len(yy) - 3))
    assert r["n_obs"] == len(yy)
    assert r["rss_r"] == rss_r and r["rss_u"] == rss_u
    assert r["f_stat"] == f_stat


def test_granger_lag1_constant_regressor_null(spark, tmp_path):
    """x identically zero → cxx = 0 → singular normal equations →
    NULL (never a divide-by-zero throw, §8.17)."""
    import __spark_entry__ as e

    rows, okey = [], 0
    for d, yd in enumerate([2, 3, 2, 4, 3]):
        for _ in range(yd):
            okey += 1
            rows.append((okey, 1, f"1997-01-{d + 1:02d}", 1.0, "5-LOW", "O"))
    _write_orders(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_granger_lag1"](spark, tmp_path.as_posix()).collect()[0]
    assert r["f_stat"] is None and r["x_causes_y"] is None
    assert r["rss_u"] is None  # guarded, not inf


def test_fisher_exact_separated_table(spark, tmp_path):
    """Three high-revenue H1 days vs three low H2 days: a perfect
    2×2 (3,0,0,3) — hypergeometric two-sided p = 2·C(3,3)C(3,0)/C(6,3)
    = 0.1; zero cells → odds ratio NULL."""
    import __spark_entry__ as e

    rows, okey = [], 0
    for d in range(3):  # January, 20 cents
        okey += 1
        rows.append((okey, 1, f"1997-01-{d + 1:02d}", 0.20, "5-LOW", "O"))
    for d in range(3):  # July, 10 cents
        okey += 1
        rows.append((okey, 1, f"1997-07-{d + 1:02d}", 0.10, "5-LOW", "O"))
    _write_orders(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_fisher_exact"](spark, tmp_path.as_posix()).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 0, 0, 3)
    assert r["odds_ratio"] is None
    assert abs(r["p_two_sided"] - 0.1) < 1e-8


def test_knn_classify_majority_vote(spark, tmp_path):
    """Two orthogonal query vectors; 3 exact label-0 copies vs 4 exact
    label-1 copies: q0 wins 3-2 on label 0 (the two zero-cosine
    fillers tie-break by e_id), q1 wins 4-1 on label 1."""
    import pandas as pd

    import __spark_entry__ as e

    def vec(axis):
        v = [0.0] * 64
        v[axis] = 1.0
        return v

    rows = [
        (0, vec(0), 0), (1, vec(1), 1),            # queries (<10)
        (10, vec(0), 0), (11, vec(0), 0), (12, vec(0), 0),
        (13, vec(1), 1), (14, vec(1), 1), (15, vec(1), 1),
        (16, vec(1), 1),
    ]
    (
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
            "vec_id long, embedding array<float>, label int",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/embeddings.parquet")
    )
    out = {
        r["q_id"]: r
        for r in e.queries()["q_knn_classify"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert out[0]["pred_label"] == 0 and out[0]["n_votes"] == 3
    assert out[0]["correct"] is True
    assert out[1]["pred_label"] == 1 and out[1]["n_votes"] == 4
    assert out[1]["correct"] is True


def test_readability_closed_form(spark, tmp_path):
    """'the cat sat. it ran!': 5 words, 2 sentence-punct runs, 5 vowel
    groups → flesch replicated by the identical python chain; a
    punctuation-free doc clamps sentences to 1."""
    import __spark_entry__ as e

    _write_documents(
        spark, tmp_path.as_posix(),
        [(1, "the cat sat. it ran!", "s0"), (2, "no stops here", "s0")],
    )
    out = {
        r["doc_id"]: r
        for r in e.queries()["q_readability"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    assert r1["flesch"] == 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)
    r2 = out[2]
    assert r2["n_sentences"] == 1 and r2["n_words"] == 3


def test_bag_set_ops_multiplicity(spark, tmp_path):
    """customer nations {1:3 copies, 2:1}, supplier nations {1:1, 3:2}:
    INTERSECT ALL → one 1; EXCEPT ALL → two 1s and one 2."""
    import __spark_entry__ as e

    (
        spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 2)],
            "c_custkey long, c_nationkey int",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/customer.parquet")
    )
    (
        spark.createDataFrame(
            [(1, 1), (2, 3), (3, 3)], "s_suppkey long, s_nationkey int"
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/supplier.parquet")
    )
    ia = sorted(
        r["nationkey"]
        for r in e.queries()["q_intersect_all"](
            spark, tmp_path.as_posix()
        ).collect()
    )
    ea = sorted(
        r["nationkey"]
        for r in e.queries()["q_except_all"](
            spark, tmp_path.as_posix()
        ).collect()
    )
    assert ia == [1]
    assert ea == [1, 1, 2]


def _write_customers_rl(spark, sf, rows):
    """rows: (custkey, name, nationkey, segment, acctbal)"""
    (
        spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_mktsegment string, c_acctbal double",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/customer.parquet")
    )


def test_record_linkage_classification(spark, tmp_path):
    """Twins (keys 1 and 98 ≡ 1 mod 97, same name digit, same band)
    score +9.553856 nats → link; the third member agrees on name+band
    only (+3.254907) → possible, twice."""
    import __spark_entry__ as e

    _write_customers_rl(
        spark, tmp_path.as_posix(),
        [
            (1, "Cust#001", 0, "S", 100.0),
            (98, "Cust#011", 0, "S", 100.0),
            (2, "Cust#021", 0, "S", 100.0),
        ],
    )
    out = {
        r["classification"]: r
        for r in e.queries()["q_record_linkage"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert out["link"]["n_pairs"] == 1
    assert out["link"]["sum_w_micro"] == 2251292 + 2890372 + 4412192
    assert out["possible"]["n_pairs"] == 2
    assert out["possible"]["sum_w_micro"] == 2 * (
        2251292 + 2890372 - 1886757
    )
    assert "non_link" not in out


def test_record_linkage_block_cap(spark, tmp_path):
    """A 102-member block keeps its first 100 ranked members: exactly
    C(100,2) = 4950 pairs ever score — the quadratic lever."""
    import __spark_entry__ as e

    rows = [
        (k, f"Cust#{k:03d}", 0, "S", float(k))
        for k in range(1, 103)
    ]
    _write_customers_rl(spark, tmp_path.as_posix(), rows)
    out = e.queries()["q_record_linkage"](
        spark, tmp_path.as_posix()
    ).collect()
    assert sum(r["n_pairs"] for r in out) == 4950


def test_weighted_quantile_mass_not_rows(spark, tmp_path):
    """One 1-cent row carrying weight 97 vs three heavy-price rows of
    weight 1: every quartile of the UNIT mass is 1 cent — a row-wise
    percentile would say ~200."""
    import __spark_entry__ as e

    rows = [
        (1, 1, 0.01, 97.0),
        (2, 2, 2.00, 1.0),
        (3, 3, 3.00, 1.0),
        (4, 4, 4.00, 1.0),
    ]
    (
        spark.createDataFrame(
            [(k, ln, 1.0, 0.0, "N", p, q) for k, ln, p, q in [
                (r[0], r[1], r[2], r[3]) for r in rows
            ]],
            "l_orderkey long, l_linenumber int, l_discount double, "
            "l_tax double, l_returnflag string, l_extendedprice double, "
            "l_quantity double",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/lineitem.parquet")
    )
    r = e.queries()["q_weighted_quantile"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["total_weight"] == 100 and r["n_values"] == 4
    assert (r["p25_cents"], r["p50_cents"], r["p75_cents"]) == (1, 1, 1)


def test_quantile_normalize_rank_alignment(spark, tmp_path):
    """Source A lengths 10× source B's: every decile of A maps to the
    pooled decile, computed by the exact nearest-rank python mirror."""
    import __spark_entry__ as e

    docs = []
    lens_a = [100, 200, 300, 400, 500]
    lens_b = [10, 20, 30, 40, 50]
    i = 0
    for L in lens_a:
        docs.append((i, "x" * L, "A")); i += 1
    for L in lens_b:
        docs.append((i, "x" * L, "B")); i += 1
    _write_documents(spark, tmp_path.as_posix(), docs)
    out = {
        (r["source"], r["decile"]): (r["raw_chars"], r["normalized_chars"])
        for r in e.queries()["q_quantile_normalize"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    pooled = sorted(lens_a + lens_b)
    n = len(pooled)
    for src, lens in [("A", sorted(lens_a)), ("B", sorted(lens_b))]:
        ns = len(lens)
        for dec in range(1, 11):
            raw = lens[(dec * ns + 9) // 10 - 1]
            norm = pooled[(dec * n + 9) // 10 - 1]
            assert out[(src, dec)] == (raw, norm), (src, dec)


def test_changepoint_binary_level_shift(spark, tmp_path):
    """[10, 10, 10, 50, 50] cents: the best split is after day 3, and
    the gain equals the python IEEE chain exactly."""
    import __spark_entry__ as e

    rows = []
    for d, cents in enumerate([10, 10, 10, 50, 50]):
        rows.append((d + 1, 1, f"1997-01-{d + 1:02d}", cents / 100.0,
                     "5-LOW", "O"))
    _write_orders(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_changepoint_binary"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["split_after_day"] % 100000, r["n_left"], r["n_right"])[1:] \
        == (3, 2)
    cum, tot, k, nd = 30.0, 130.0, 3.0, 5.0
    gain = (cum * cum) / k + ((tot - cum) * (tot - cum)) / (nd - k) \
        - (tot * tot) / nd
    assert r["gain"] == gain
    assert r["mean_left_cents"] == 10.0
    assert r["mean_right_cents"] == 50.0


def test_oov_rate_against_planted_vocab(spark, tmp_path):
    """Pooled top-1000 = the 1000 double-counted tokens; source B's
    ten singleton rares are OOV → rate exactly 10/11."""
    import __spark_entry__ as e

    common = " ".join(f"w{i:04d}" for i in range(1000))
    docs = [
        (1, common, "A"),
        (2, common, "A"),
        (3, "w0000 " + " ".join(f"rare{i}" for i in range(10)), "B"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    out = {
        r["source"]: r
        for r in e.queries()["q_oov_rate"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert out["A"]["n_oov"] == 0 and out["A"]["oov_rate"] == 0.0
    b = out["B"]
    assert (b["n_tokens"], b["n_oov"]) == (11, 10)
    assert b["oov_rate"] == 10.0 / 11.0


def test_quantile_normalize_stable_reuse_off(spark, sf_dir):
    """The scalable_rank pooled spine (VERDICT r8 `weak` fix) must
    produce identical decile mappings with exchange reuse and AQE
    disabled — bucket ids are frozen-literal functions of n_chars, so
    no lineage branch can re-sample boundaries and mis-rank."""
    import __spark_entry__ as e

    k = e.queries()["q_quantile_normalize"]
    base = {
        (r["source"], r["decile"]): (r["raw_chars"], r["normalized_chars"])
        for r in k(spark, sf_dir).collect()
    }
    confs = {
        "spark.sql.exchange.reuse": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    old = {}
    for key, v in confs.items():
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        off = {
            (r["source"], r["decile"]): (
                r["raw_chars"],
                r["normalized_chars"],
            )
            for r in k(spark, sf_dir).collect()
        }
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)
    assert off == base and len(base) > 0
