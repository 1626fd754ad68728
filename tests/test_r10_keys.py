"""Round-10 §2.23 key edge cases the sf fixtures cannot reach —
closed-form planted inputs whose expected values come from OUTSIDE the
shared Spark/DuckDB formula (the round-9 verify-skill gotcha: an error
written identically into both engines passes every parity gate)."""
from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F  # noqa: F401

from test_r9_keys import (  # noqa: F401
    _write_customers,
    _write_documents,
    _write_events,
    _write_orders,
)

_KNUTH = 2_654_435_761


def _khash(x: int) -> int:
    return ((x % _KNUTH) * _KNUTH) % 2**32


def _write_embeddings(spark, sf, rows):
    """rows: (vec_id, embedding list[float], label)"""
    (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/embeddings.parquet")
    )


# ------------------------------------------------------------------
# q_rolling_distinct_hll
# ------------------------------------------------------------------


def test_rolling_distinct_hll_closed_form(spark, tmp_path):
    """3 users on day 0, 2 users (1 shared) on day 1, 1 user on day 9:
    exact rolling series is {d0: 3, d1: 4, d9: 1} (day 9 outside the
    7-day reach of days 0-1); registers/n_zero/z are asserted against
    an independent python mirror of the Knuth-hash bucket math, and
    the linear-counting estimate (tiny n ⇒ LC branch) agrees with the
    python formula to 1e-9."""
    import __spark_entry__ as e

    ev = [
        (1, "2024-01-01 10:00:00", 101, "A"),
        (2, "2024-01-01 11:00:00", 202, "A"),
        (3, "2024-01-01 12:00:00", 303, "A"),
        (4, "2024-01-02 10:00:00", 303, "A"),
        (5, "2024-01-02 11:00:00", 404, "A"),
        (6, "2024-01-10 10:00:00", 505, "A"),
    ]
    _write_events(spark, tmp_path.as_posix(), ev)
    rows = {
        r["day"]: r
        for r in e.queries()["q_rolling_distinct_hll"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    d0 = next(iter(sorted(rows)))
    assert [rows[d]["n_exact_7d"] for d in sorted(rows)] == [3, 4, 1]
    assert sorted(rows) == [d0, d0 + 1, d0 + 9]

    def regs(users):
        m = {}
        for u in users:
            h = _khash(u)
            b, w = divmod(h, 16_777_216)
            rho = 25 if w == 0 else 25 - w.bit_length()
            m[b] = max(m.get(b, 0), rho)
        return m

    for day, users in (
        (d0, [101, 202, 303]),
        (d0 + 1, [101, 202, 303, 404]),
        (d0 + 9, [505]),
    ):
        m = regs(users)
        n_zero = 256 - sum(1 for v in m.values() if v > 0)
        z = sum(1 << (32 - r) for r in m.values()) + (
            256 - len(m)
        ) * (1 << 32)
        assert rows[day]["n_zero"] == n_zero, day
        assert rows[day]["z_scaled"] == z, day
        est = 256.0 * round(math.log(256.0 / n_zero), 9)
        assert abs(rows[day]["estimate_7d"] - est) < 1e-9, day


# ------------------------------------------------------------------
# q_minhash_signature_index
# ------------------------------------------------------------------


def test_minhash_index_matches_python_md5_mirror(spark, tmp_path):
    """Band keys equal an independent hashlib mirror; two docs with
    the SAME token multiset (different order/repeats) share all 4
    band keys; a disjoint doc shares none."""
    import __spark_entry__ as e

    docs = [
        (0, "red green blue", "s"),
        (1, "blue blue red green red", "s"),  # same token SET
        (2, "cyan magenta yellow", "s"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    got = {
        (r["doc_id"], r["band"]): r["band_key"]
        for r in e.queries()["q_minhash_signature_index"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert len(got) == 12

    def mh(tokens):
        mins = []
        for j in range(1, 9):
            mins.append(
                min(
                    hashlib.md5(f"{w}#{j}".encode()).hexdigest()
                    for w in set(tokens)
                )
            )
        return [mins[2 * b] + mins[2 * b + 1] for b in range(4)]

    k0 = mh(["red", "green", "blue"])
    k2 = mh(["cyan", "magenta", "yellow"])
    for b in range(4):
        assert got[(0, b)] == k0[b]
        assert got[(1, b)] == k0[b]  # same token set ⇒ same keys
        assert got[(2, b)] == k2[b]
        assert got[(2, b)] != k0[b]


# ------------------------------------------------------------------
# q_psi_source_panel
# ------------------------------------------------------------------


def test_psi_source_panel_identical_halves_zero_and_planted_shift(
    spark, tmp_path
):
    """Source 'same': both halves have identical length histograms →
    every smoothed p_A = p_B and PSI is EXACTLY 0.0 (no ln needed —
    the terms vanish identically).  Source 'shift': half A all in
    bucket 1 (lengths 2-3), half B all in bucket 3 (lengths 8-15) →
    PSI from the independent python mirror."""
    import __spark_entry__ as e

    docs = []
    # 'same': one doc of length 5 and one of length 9 in EACH half
    docs += [
        (0, "x" * 5, "same"),
        (2, "x" * 9, "same"),
        (1, "x" * 5, "same"),
        (3, "x" * 9, "same"),
    ]
    # 'shift': even doc_ids (half A) length 3; odd (half B) length 9
    docs += [
        (10, "y" * 3, "shift"),
        (12, "y" * 3, "shift"),
        (11, "y" * 9, "shift"),
        (13, "y" * 9, "shift"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    got = {
        r["source"]: r
        for r in e.queries()["q_psi_source_panel"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got["same"]["psi"] == 0.0
    assert got["same"]["drift_detected"] is False
    # mirror: buckets len3→1, len9→3; A: {1: 2}, B: {3: 2}; union
    # bins = {1, 3}, nbins = 2, ta = tb = 2, smoothing +1 / (2+2)
    pa = {1: 3 / 4, 3: 1 / 4}
    pb = {1: 1 / 4, 3: 3 / 4}
    psi = sum(
        round(
            (pa[b] - pb[b]) * round(math.log(pa[b] / pb[b]), 9), 9
        )
        for b in (1, 3)
    )
    assert abs(got["shift"]["psi"] - psi) < 1e-12
    assert got["shift"]["n_bins"] == 2
    assert got["shift"]["drift_detected"] is bool(psi > 0.2)


# ------------------------------------------------------------------
# q_stratified_conformal
# ------------------------------------------------------------------


def test_stratified_conformal_closed_form(spark, tmp_path):
    """One segment; calibration cents (100, 200, 300, 400) → S=1000,
    n=4, scaled residuals |4c−1000| = (600, 200, 200, 600), q̂ rank
    = min(ceil(0.9·5), 4) = 4 → q̂_scaled = 600, q̂_cents = 150.
    Test half: cents 250 (residual 0, covered) and 1000 (residual
    3000, not) → coverage 0.5."""
    import __spark_entry__ as e

    cust = [(1, "c", 0, 0.0, "SEG")]
    _write_customers(spark, tmp_path.as_posix(), cust)
    orders = [
        (0, 1, 1.00, "X"),
        (2, 1, 2.00, "X"),
        (4, 1, 3.00, "X"),
        (6, 1, 4.00, "X"),
        (1, 1, 2.50, "X"),
        (3, 1, 10.00, "X"),
    ]
    _write_orders(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_stratified_conformal"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_cal"] == 4
    assert row["qhat_scaled"] == 600
    assert row["qhat_cents"] == 150.0
    assert row["n_test"] == 2
    assert row["n_covered"] == 1
    assert row["coverage"] == 0.5


# ------------------------------------------------------------------
# q_token_budget_curriculum
# ------------------------------------------------------------------


def test_token_budget_curriculum_hand_allocation(spark, tmp_path):
    """Sources with 300 and 100 tokens: w = (7500, 2500) bp, u = 5000.
    Hand-computed schedule: epoch 1 (λ=1, B=200) → (150, 50);
    epoch 2 (λ=0.6, B=300) → mix (6500, 3500) → (195, 105);
    epoch 3 (λ=0.3, B=400) → mix (5750, 4250) → (230, 170)."""
    import __spark_entry__ as e

    docs = [
        (0, " ".join(f"w{i}" for i in range(300)), "big"),
        (1, " ".join(f"v{i}" for i in range(100)), "small"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    got = {
        (r["epoch"], r["source"]): r
        for r in e.queries()["q_token_budget_curriculum"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    exp = {
        (1, "big"): (7500, 7500, 200, 150),
        (1, "small"): (2500, 2500, 200, 50),
        (2, "big"): (7500, 6500, 300, 195),
        (2, "small"): (2500, 3500, 300, 105),
        (3, "big"): (7500, 5750, 400, 230),
        (3, "small"): (2500, 4250, 400, 170),
    }
    assert len(got) == 6
    for k, (wbp, mix, bud, alloc) in exp.items():
        r = got[k]
        assert (
            r["weight_bp"],
            r["mix_bp"],
            r["budget_tokens"],
            r["alloc_tokens"],
        ) == (wbp, mix, bud, alloc), k


# ------------------------------------------------------------------
# q_kcore_census
# ------------------------------------------------------------------


def test_kcore_census_planted_graph(spark, tmp_path):
    """Label 0: five IDENTICAL vectors → each node's 3-nn are the 3
    smallest other ids (cosine 1.0 ties broken by dst), giving a K4
    clique on {0,1,2,3} with node 4 unreciprocated (K4 is 3-regular:
    stable under every peel round).  Label 1: five unit vectors on an
    arc at 0°,10°,20°,30°,40° → mutual edges {01,02,12,13,23,34} by
    the cosine-rank derivation in this test's comments; node 4 (deg
    1) peels in round 1, after which degrees are ≥ 2 and the series
    is stable.  Expected: round 0 = (9 nodes, 12 edges), rounds 1-6
    = (8, 11)."""
    import __spark_entry__ as e

    vecs = []
    base = [1.0] + [0.0] * 63
    for i in range(5):
        vecs.append((i, [float(x) for x in base], 0))
    for i, deg in enumerate((0.0, 10.0, 20.0, 30.0, 40.0)):
        th = math.radians(deg)
        v = [math.cos(th), math.sin(th)] + [0.0] * 62
        vecs.append((100 + i, [float(x) for x in v], 1))
    _write_embeddings(spark, tmp_path.as_posix(), vecs)
    got = {
        r["round"]: (r["n_nodes"], r["n_edges"])
        for r in e.queries()["q_kcore_census"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got[0] == (9, 12), got
    for r in range(1, 7):
        assert got[r] == (8, 11), (r, got)


def test_kcore_fast_path_equals_distributed(spark):
    """The round-13 driver fast path of kcore_peel_series must emit
    the IDENTICAL series as the distributed peel loop (the
    triangle/pagerank fast==distributed pin): same planted edge set,
    small_threshold default (fast) vs None (forced distributed)."""
    from pfithic_spark.registry.keys_r10 import kcore_peel_series

    # chain 1-2-3-4 plus triangle 10-11-12, as symmetric directed rows
    und = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    edges = und + [(b, a) for a, b in und]
    mut = spark.createDataFrame(edges, "src long, dst long")
    fast = sorted(
        (r["round"], r["n_nodes"], r["n_edges"])
        for r in kcore_peel_series(mut, k=2, rounds=6).collect()
    )
    dist = sorted(
        (r["round"], r["n_nodes"], r["n_edges"])
        for r in kcore_peel_series(
            mut, k=2, rounds=6, small_threshold=None
        ).collect()
    )
    assert fast == dist, (fast, dist)
    # external truth: the chain erodes from both ends (1,4 peel, then
    # 2,3); the triangle is 2-regular and never peels
    assert fast[0] == (0, 7, 6) and fast[1] == (1, 5, 4), fast
    assert fast[2] == (2, 3, 3), fast
    for r in range(3, 7):
        assert fast[r] == (r, 3, 3), fast


# ------------------------------------------------------------------
# q_ivf_assignment
# ------------------------------------------------------------------


def test_ivf_assignment_exact_centroid_and_offset(spark, tmp_path):
    """A vector EQUAL to a committed centroid assigns to that cell at
    dist2 = 0; the same vector with +0.5 on one component assigns to
    the same cell at dist2 = exactly 500000² (the micro-quantized
    square), provided no other centroid is closer (asserted via the
    independent numpy argmin mirror)."""
    import numpy as np

    import __spark_entry__ as e
    from pfithic_spark.registry import _GOLDEN_DIR

    cent = {
        r["cell"]: list(r["centroid"])
        for r in spark.read.parquet(
            f"{_GOLDEN_DIR}/ivf_centroids.parquet"
        ).collect()
    }
    c0 = sorted(cent)[0]
    v0 = cent[c0]
    v1 = list(v0)
    v1[0] += 0.5
    _write_embeddings(
        spark,
        tmp_path.as_posix(),
        [
            (0, [float(x) for x in v0], 0),
            (1, [float(x) for x in v1], 0),
        ],
    )
    got = {
        r["vec_id"]: (r["cell"], r["dist2_micro"])
        for r in e.queries()["q_ivf_assignment"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    # independent mirror: float32-storage-exact quantized argmin
    q = {
        c: np.array([round(x * 1e6) for x in v], dtype=np.int64)
        for c, v in cent.items()
    }

    def assign(vec):
        vv = np.array(
            [round(float(np.float32(x)) * 1e6) for x in vec],
            dtype=np.int64,
        )
        best = min(
            (int(((q[c] - vv) ** 2).sum()), c) for c in sorted(q)
        )
        return (best[1], best[0])

    assert got[0] == assign(v0)
    assert got[0][1] == 0
    assert got[1] == assign(v1)


# ------------------------------------------------------------------
# q_cohens_kappa
# ------------------------------------------------------------------


def test_cohens_kappa_perfect_and_independent(spark, tmp_path):
    """Both raters agree on every doc → κ = 1.0 exactly; a 1/1/1/1
    contingency square (po = pe = ½) → κ = 0.0 exactly."""
    import __spark_entry__ as e

    both_pos = " ".join("word1" for _ in range(60))  # 359 ch, 60 tok
    both_neg = "a b"
    a_only = "x" * 300  # 300 chars, 1 token
    b_only = " ".join("z" for _ in range(60))  # 119 chars, 60 tokens

    _write_documents(
        spark,
        tmp_path.as_posix(),
        [(0, both_pos, "s"), (1, both_neg, "s"),
         (2, both_pos, "s"), (3, both_neg, "s")],
    )
    r = e.queries()["q_cohens_kappa"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (2, 0, 0, 2)
    assert r["kappa"] == 1.0

    _write_documents(
        spark,
        tmp_path.as_posix(),
        [(0, both_pos, "s"), (1, both_neg, "s"),
         (2, a_only, "s"), (3, b_only, "s")],
    )
    r = e.queries()["q_cohens_kappa"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (1, 1, 1, 1)
    assert r["kappa"] == 0.0


# ------------------------------------------------------------------
# q_pinball_loss
# ------------------------------------------------------------------


def test_pinball_loss_closed_form(spark, tmp_path):
    """Train (even keys): cents 100..1000 → f50 = rank 5 = 500,
    f90 = rank 9 = 900.  Test: 500 and 1000 → loss50×100 =
    50·0 + 50·500 = 25000, loss90×100 = 10·400 + 90·100 = 13000;
    means 125.0 / 65.0."""
    import __spark_entry__ as e

    cust = [(1, "c", 0, 0.0, "SEG")]
    _write_customers(spark, tmp_path.as_posix(), cust)
    orders = [
        (2 * i, 1, float(i), "X") for i in range(1, 11)
    ] + [(1, 1, 5.00, "X"), (3, 1, 10.00, "X")]
    _write_orders(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_pinball_loss"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(r) == 1
    row = r[0]
    assert row["f50_cents"] == 500
    assert row["f90_cents"] == 900
    assert row["n_test"] == 2
    assert row["loss50_x100"] == 25000
    assert row["loss90_x100"] == 13000
    assert row["mean_pinball50"] == 125.0
    assert row["mean_pinball90"] == 65.0


# ------------------------------------------------------------------
# q_ratio_metric_delta
# ------------------------------------------------------------------


def test_ratio_metric_delta_single_customer_arms(spark, tmp_path):
    """One customer per arm (parity chosen via the Knuth hash): a
    single-customer arm has zero between-customer variance → se is
    exactly 0.0, and the ratio is the exact cents/orders quotient."""
    import __spark_entry__ as e

    ca = next(c for c in range(1, 50) if _khash(c) % 2 == 0)
    cb = next(c for c in range(1, 50) if _khash(c) % 2 == 1)
    orders = [
        (1, ca, 100.00, "X"),
        (2, ca, 100.00, "X"),
        (3, cb, 50.00, "X"),
    ]
    _write_orders(spark, tmp_path.as_posix(), orders)
    got = {
        r["arm"]: r
        for r in e.queries()["q_ratio_metric_delta"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got["A"]["n_customers"] == 1
    assert got["A"]["sum_cents"] == 20000
    assert got["A"]["n_orders"] == 2
    assert got["A"]["ratio_cents"] == 10000.0
    assert got["A"]["se_dollars"] == 0.0
    assert got["B"]["ratio_cents"] == 5000.0
    assert got["B"]["se_dollars"] == 0.0


# ------------------------------------------------------------------
# q_k_anonymity
# ------------------------------------------------------------------


def test_k_anonymity_census(spark, tmp_path):
    """QI classes of sizes 1 / 4 / 10 → min 1; below-k census at
    k = 2, 5, 10 is (1 grp, 1 row) / (2, 5) / (2, 5)."""
    import __spark_entry__ as e

    rows = []
    cid = 0
    for nation, seg, sz in ((0, "A", 1), (1, "B", 4), (2, "C", 10)):
        for _ in range(sz):
            cid += 1
            rows.append((cid, f"c{cid}", nation, 0.0, seg))
    _write_customers(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_k_anonymity"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_groups"] == 3
    assert r["min_group_size"] == 1
    assert r["n_rows"] == 15
    assert (r["groups_lt2"], r["rows_lt2"]) == (1, 1)
    assert (r["groups_lt5"], r["rows_lt5"]) == (2, 5)
    assert (r["groups_lt10"], r["rows_lt10"]) == (2, 5)


# ------------------------------------------------------------------
# q_heaps_law
# ------------------------------------------------------------------


def test_heaps_law_two_point_fit(spark, tmp_path):
    """Two sources with hand-counted (N, V): P = "a a b" -> (3, 2),
    Q = 9 tokens / 4 types -> (9, 4).  A two-point OLS line passes
    through both points exactly: beta = ln2/ln3, lnk = ln2 - beta*ln3
    = ... asserted against the independent math.log mirror."""
    import __spark_entry__ as e

    docs = [
        (0, "a a b", "P"),
        (1, "a a a b b c c d d", "Q"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    rows = {
        r["source"]: r
        for r in e.queries()["q_heaps_law"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert rows["P"]["n_tokens"] == 3 and rows["P"]["n_types"] == 2
    assert rows["Q"]["n_tokens"] == 9 and rows["Q"]["n_types"] == 4
    x1, y1 = math.log(3), math.log(2)
    x2, y2 = math.log(9), math.log(4)
    beta = (y2 - y1) / (x2 - x1)
    lnk = ((y1 + y2) - beta * (x1 + x2)) / 2
    assert abs(rows["P"]["heaps_beta"] - beta) < 1e-5
    assert abs(rows["P"]["heaps_lnk"] - lnk) < 1e-5
    assert rows["Q"]["heaps_beta"] == rows["P"]["heaps_beta"]


def test_heaps_law_single_source_degenerate(spark, tmp_path):
    """One source -> n < 2 -> the fit columns are NULL (never a
    divide-by-zero), while the (N, V) census still reports."""
    import __spark_entry__ as e

    _write_documents(spark, tmp_path.as_posix(), [(0, "a b a", "P")])
    r = e.queries()["q_heaps_law"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(r) == 1
    assert r[0]["n_tokens"] == 3 and r[0]["n_types"] == 2
    assert r[0]["heaps_beta"] is None and r[0]["heaps_lnk"] is None


# ------------------------------------------------------------------
# q_source_overlap
# ------------------------------------------------------------------


def test_source_overlap_jaccard(spark, tmp_path):
    """Vocabularies X = {a,b,c}, Y = {b,c,d}, Z = {e}: the X-Y pair
    has |∩| = 2, |∪| = 4 → jaccard 0.5; zero-overlap pairs (X-Z,
    Y-Z) are ABSENT by contract (no row = no shared vocabulary)."""
    import __spark_entry__ as e

    docs = [
        (0, "a b c", "X"),
        (1, "b c d", "Y"),
        (2, "e", "Z"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    rows = e.queries()["q_source_overlap"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("X", "Y")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard"] == 0.5
