"""Round-10 §2.24 key edge cases — closed-form planted inputs with
expectations computed OUTSIDE the shared Spark/DuckDB formula."""
from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401

from test_r9_keys import _write_customers, _write_documents  # noqa: F401
from test_r10_keys import _khash  # noqa: F401


def _write_orders_dated(spark, sf, rows):
    """rows: (okey, custkey, totalprice, priority, date_str)"""
    (
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderpriority string, d string",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("d").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
            "o_orderpriority",
            F.lit("O").alias("o_orderstatus"),
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/orders.parquet")
    )


def _write_events_seq(spark, sf, rows):
    """rows: (event_id, ts_str, user_id, event_type)"""
    (
        spark.createDataFrame(
            rows,
            "event_id long, t string, user_id long, event_type string",
        )
        .select(
            "event_id",
            F.col("t").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/events.parquet")
    )


# ------------------------------------------------------------------
# q_cmh_test
# ------------------------------------------------------------------


def test_cmh_closed_form_two_identical_strata(spark, tmp_path):
    """Each stratum: a=2, b=1, c=1, d=2, n=6 → E=1.5, dev=0.5,
    V = 81/180 = 0.45, ad/n = 2/3, bc/n = 1/6.  Two identical
    strata: χ² = (|1.0|−0.5)²/0.9 = 0.2777…, OR_MH = 4.0 (computed
    via the independent python mirror with the same round-9
    terms)."""
    import __spark_entry__ as e

    ca = next(c for c in range(1, 99) if _khash(c) % 2 == 0)  # exposed
    cb = next(c for c in range(1, 99) if _khash(c) % 2 == 1)
    cust = [
        (ca, "a", 0, 0.0, "S1"),
        (cb, "b", 0, 0.0, "S1"),
        (ca + 100, "c", 0, 0.0, "S2"),
        (cb + 100, "d", 0, 0.0, "S2"),
    ]
    # custkeys +100 must keep the same parity for the planted cells
    assert _khash(ca + 100) % 2 == _khash(ca) % 2 or True
    ca2 = next(
        c for c in range(100, 199) if _khash(c) % 2 == 0 and c != ca
    )
    cb2 = next(
        c for c in range(100, 199) if _khash(c) % 2 == 1 and c != cb
    )
    cust = [
        (ca, "a", 0, 0.0, "S1"),
        (cb, "b", 0, 0.0, "S1"),
        (ca2, "c", 0, 0.0, "S2"),
        (cb2, "d", 0, 0.0, "S2"),
    ]
    _write_customers(spark, tmp_path.as_posix(), cust)
    orders = []
    oid = 0
    for s_exposed, s_unexposed in ((ca, cb), (ca2, cb2)):
        for _ in range(2):  # a = 2 exposed urgent
            oid += 1
            orders.append((oid, s_exposed, 1.0, "1-URGENT", "1995-01-01"))
        oid += 1
        orders.append((oid, s_exposed, 1.0, "3-MEDIUM", "1995-01-01"))
        oid += 1
        orders.append((oid, s_unexposed, 1.0, "1-URGENT", "1995-01-01"))
        for _ in range(2):
            oid += 1
            orders.append((oid, s_unexposed, 1.0, "3-MEDIUM", "1995-01-01"))
    _write_orders_dated(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_cmh_test"](spark, tmp_path.as_posix()).collect()[0]
    assert r["n_strata"] == 2
    assert r["sum_a"] == 4
    sdev = round(2.0 - 1.5, 9) * 2
    sv = round(81.0 / 180.0, 9) * 2
    chi2 = (abs(sdev) - 0.5) ** 2 / sv
    assert abs(r["chi2"] - chi2) < 1e-12
    or_mh = (round(4.0 / 6.0, 9) * 2) / (round(1.0 / 6.0, 9) * 2)
    assert abs(r["or_mh"] - or_mh) < 1e-9
    assert r["significant"] is False


# ------------------------------------------------------------------
# q_hill_tail_index
# ------------------------------------------------------------------


def test_hill_exact_powers_of_two(spark, tmp_path):
    """Prices 80/40/20/10/10 dollars → top-5 cents, xmin = 1000,
    log-ratios (ln8, ln4, ln2, 0) → γ = Σround(ln·,9)/4 from the
    python mirror; the tie with the threshold contributes exactly
    0."""
    import __spark_entry__ as e

    orders = [
        (1, 1, 80.0, "X", "1995-01-01"),
        (2, 1, 40.0, "X", "1995-01-01"),
        (3, 1, 20.0, "X", "1995-01-01"),
        (4, 1, 10.0, "X", "1995-01-01"),
        (5, 1, 10.0, "X", "1995-01-01"),
    ]
    _write_orders_dated(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_hill_tail_index"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["k_eff"] == 4
    assert r["xmin_cents"] == 1000
    slr = (
        round(math.log(8.0), 9)
        + round(math.log(4.0), 9)
        + round(math.log(2.0), 9)
        + 0.0
    )
    assert abs(r["gamma_hill"] - slr / 4.0) < 1e-12
    assert abs(r["alpha_hill"] - 4.0 / slr) < 1e-12


# ------------------------------------------------------------------
# q_log_odds_tokens
# ------------------------------------------------------------------


def test_log_odds_top_token_and_mirror(spark, tmp_path):
    """Half A (even doc ids) holds 10 'alpha' + 10 'base'; half B
    10 'beta' + 10 'base'.  'alpha' must rank first; its z matches
    the independent python mirror of the Monroe chain."""
    import __spark_entry__ as e

    docs = [
        (0, " ".join(["alpha"] * 10 + ["base"] * 10), "s"),
        (1, " ".join(["beta"] * 10 + ["base"] * 10), "s"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    rows = e.queries()["q_log_odds_tokens"](
        spark, tmp_path.as_posix()
    ).collect()
    assert rows[0]["token"] == "alpha"
    got = {r["token"]: r for r in rows}

    def mirror(ya, yb, na, nb, ntot, a0=1000.0):
        aw = a0 * (ya + yb) / ntot
        la = round(math.log((ya + aw) / (na + a0 - ya - aw)), 9)
        lb = round(math.log((yb + aw) / (nb + a0 - yb - aw)), 9)
        return round(
            (la - lb)
            / math.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw)),
            6,
        )

    na = nb = 20
    ntot = 40
    assert got["alpha"]["z_score"] == mirror(10, 0, na, nb, ntot)
    assert got["base"]["z_score"] == mirror(10, 10, na, nb, ntot)
    assert got["beta"]["z_score"] == mirror(0, 10, na, nb, ntot)
    assert got["base"]["z_score"] == 0.0  # symmetric token


# ------------------------------------------------------------------
# q_markov_stationary
# ------------------------------------------------------------------


def test_markov_stationary_two_state_cycle(spark, tmp_path):
    """Deterministic A→B→A cycle: the uniform start (500000, 500000)
    micro-units is already stationary — every round maps it to
    itself EXACTLY (integer math, no drift)."""
    import __spark_entry__ as e

    ev = [
        (1, "2024-01-01 10:00:00", 7, "A"),
        (2, "2024-01-01 10:01:00", 7, "B"),
        (3, "2024-01-01 10:02:00", 7, "A"),
        (4, "2024-01-01 10:03:00", 7, "B"),
        (5, "2024-01-01 10:04:00", 7, "A"),
    ]
    _write_events_seq(spark, tmp_path.as_posix(), ev)
    got = {
        r["event_type"]: r["pi_micro"]
        for r in e.queries()["q_markov_stationary"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got == {"A": 500000, "B": 500000}


def test_markov_stationary_absorbing_state(spark, tmp_path):
    """B→A and A→A: all mass flows to the absorbing state A within
    one round and stays — B has no incoming edge so it leaves the
    support entirely."""
    import __spark_entry__ as e

    ev = [
        (1, "2024-01-01 10:00:00", 7, "B"),
        (2, "2024-01-01 10:01:00", 7, "A"),
        (3, "2024-01-01 10:02:00", 7, "A"),
        (4, "2024-01-01 10:03:00", 7, "A"),
    ]
    _write_events_seq(spark, tmp_path.as_posix(), ev)
    got = {
        r["event_type"]: r["pi_micro"]
        for r in e.queries()["q_markov_stationary"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got == {"A": 1000000}


# ------------------------------------------------------------------
# q_poisson_rate_test
# ------------------------------------------------------------------


def test_poisson_rate_closed_form(spark, tmp_path):
    """One user per arm, 4 vs 1 events: p̂ = ½, z = 1.5/√1.25 from
    the python mirror; not significant at 1.96."""
    import __spark_entry__ as e

    ua = next(c for c in range(1, 99) if _khash(c) % 2 == 0)
    ub = next(c for c in range(1, 99) if _khash(c) % 2 == 1)
    ev = [(i, "2024-01-01 10:00:00", ua, "A") for i in range(4)] + [
        (10, "2024-01-01 10:00:00", ub, "A")
    ]
    _write_events_seq(spark, tmp_path.as_posix(), ev)
    r = e.queries()["q_poisson_rate_test"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["n1"], r["n2"], r["u1"], r["u2"]) == (4, 1, 1, 1)
    assert r["rate1"] == 4.0 and r["rate2"] == 1.0
    z = (4.0 - 5.0 * 0.5) / math.sqrt(5.0 * 0.5 * 0.5)
    assert abs(r["z"] - z) < 1e-12
    assert r["significant"] is False


# ------------------------------------------------------------------
# q_sequence_entropy
# ------------------------------------------------------------------


def test_sequence_entropy_deterministic_chain(spark, tmp_path):
    """A→B→A→B: every conditional is certain → H_cond = 0.0 EXACTLY
    and predictability = 1.0; the marginal entropy matches the
    python mirror of the per-term round-9 fold."""
    import __spark_entry__ as e

    ev = [
        (1, "2024-01-01 10:00:00", 7, "A"),
        (2, "2024-01-01 10:01:00", 7, "B"),
        (3, "2024-01-01 10:02:00", 7, "A"),
        (4, "2024-01-01 10:03:00", 7, "B"),
        (5, "2024-01-01 10:04:00", 7, "A"),
    ]
    _write_events_seq(spark, tmp_path.as_posix(), ev)
    r = e.queries()["q_sequence_entropy"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_bigrams"] == 4
    assert r["h_cond_nats"] == 0.0
    # python round() is half-even; Spark/DuckDB ROUND is HALF_UP and
    # the inner product 0.3465735905 lands exactly on a tie (§8.8) —
    # mirror with Decimal HALF_UP
    import decimal

    def r9(x):
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP
            )
        )

    hm = 2 * r9(-(0.5) * r9(math.log(0.5)))
    assert abs(r["h_marginal_nats"] - hm) < 1e-12
    assert r["predictability"] == 1.0


# ------------------------------------------------------------------
# q_block_maxima_gumbel
# ------------------------------------------------------------------


def test_gumbel_fit_three_blocks(spark, tmp_path):
    """Three weekly maxima 100/200/300 dollars → mean 20000 cents,
    var 1e8, s = 10000: β, μ and the 52-block return level equal the
    python mirror of the frozen-literal moment chain."""
    import __spark_entry__ as e

    orders = [
        (1, 1, 100.0, "X", "2024-01-01"),
        (2, 1, 50.0, "X", "2024-01-02"),
        (3, 1, 200.0, "X", "2024-01-08"),
        (4, 1, 300.0, "X", "2024-01-15"),
    ]
    _write_orders_dated(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_block_maxima_gumbel"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_blocks"] == 3
    assert r["mean_max_cents"] == 20000.0
    beta = 10000.0 * 0.779696801233676
    mu = 20000.0 - 0.5772156649015329 * beta
    rl = mu - beta * -3.9415503865226063
    assert abs(r["gumbel_beta"] - beta) < 1e-9
    assert abs(r["gumbel_mu"] - mu) < 1e-9
    assert abs(r["return_level_52"] - rl) < 1e-9


def test_gumbel_single_block_degenerate(spark, tmp_path):
    """One block → n < 2 → NULL fit, census still reports."""
    import __spark_entry__ as e

    orders = [(1, 1, 100.0, "X", "2024-01-01")]
    _write_orders_dated(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_block_maxima_gumbel"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_blocks"] == 1
    assert r["gumbel_beta"] is None and r["gumbel_mu"] is None


# ------------------------------------------------------------------
# q_mrr
# ------------------------------------------------------------------


def test_mrr_hand_ranks(spark, tmp_path):
    """Relevance flags are hash-determined: pick doc ids so source X
    has its first relevant doc at rank 2 (RR = 1/2) and source Y has
    none (contributes 0) → MRR = 0.25 with n_with_hit = 1."""
    import __spark_entry__ as e

    rel = [i for i in range(1, 400) if _khash(i) % 5 == 0]
    non = [i for i in range(1, 400) if _khash(i) % 5 != 0]
    # X: longest doc irrelevant (rank 1), second-longest relevant
    docs = [
        (non[0], "w " * 50, "X"),
        (rel[0], "w " * 30, "X"),
        (non[1], "w " * 10, "X"),
        (non[2], "w " * 40, "Y"),
        (non[3], "w " * 20, "Y"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    r = e.queries()["q_mrr"](spark, tmp_path.as_posix()).collect()[0]
    assert r["n_queries"] == 2
    assert r["n_with_hit"] == 1
    assert r["mrr"] == 0.25


# ------------------------------------------------------------------
# q_rank_biased_overlap
# ------------------------------------------------------------------


def test_rbo_identical_and_planted_rankings(spark, tmp_path):
    """With n ≤ 50 docs ALL in both prefixes, each doc contributes
    w[max(ra, rb)]; the python mirror recomputes the fold from the
    frozen weight table and the two hand-derived rank orders."""
    import __spark_entry__ as e
    from pfithic_spark.registry.keys_r10b import _RBO_WEIGHTS

    docs = [(i, "w " * (10 + i), "s") for i in range(1, 9)]
    _write_documents(spark, tmp_path.as_posix(), docs)
    r = e.queries()["q_rank_biased_overlap"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_in_both_top50"] == 8
    # lexical rank: n_chars DESC → doc 8 first ... doc 1 last
    ra = {doc: 9 - doc for doc in range(1, 9)}
    rb_order = sorted(range(1, 9), key=lambda i: (_khash(i), i))
    rb = {doc: i + 1 for i, doc in enumerate(rb_order)}
    import decimal

    acc = decimal.Decimal(0)
    for doc in range(1, 9):
        w = _RBO_WEIGHTS[max(ra[doc], rb[doc]) - 1]
        acc += decimal.Decimal(repr(w)).quantize(
            decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP
        )
    assert abs(r["rbo"] - float(acc)) < 1e-12
    # identical rankings upper bound: sum of w[ra] for the same set
    ub = sum(_RBO_WEIGHTS[ra[doc] - 1] for doc in range(1, 9))
    assert r["rbo"] <= ub + 1e-9


# ------------------------------------------------------------------
# q_price_index
# ------------------------------------------------------------------


def test_price_index_closed_form(spark, tmp_path):
    """One common part: 1997 price 2.00/unit (q=10), 1998 price
    3.00/unit (q=5) → L = P = F = 1.5 exactly.  A part traded only
    in 1998 is excluded."""
    import __spark_entry__ as e

    # lineitem: (okey, lineno, partkey, qty, extendedprice)
    li = [
        (1, 1, 77, 10.0, 20.00),
        (2, 1, 77, 5.0, 15.00),
        (2, 2, 99, 4.0, 4.00),
    ]
    from test_r9_keys import _write_lineitem

    _write_lineitem(spark, tmp_path.as_posix(), li)
    orders = [
        (1, 1, 0.0, "X", "1997-06-01"),
        (2, 1, 0.0, "X", "1998-06-01"),
    ]
    _write_orders_dated(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_price_index"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_common_parts"] == 1
    assert r["laspeyres"] == 1.5
    assert r["paasche"] == 1.5
    assert abs(r["fisher"] - 1.5) < 1e-12


# ------------------------------------------------------------------
# q_negative_binomial_fit
# ------------------------------------------------------------------


def test_negative_binomial_closed_form(spark, tmp_path):
    """Counts (1, 2, 6) → mean 3, var 7, dispersion 7/3,
    r = 9/4, p = 3/7 — all exact-rational double chains."""
    import __spark_entry__ as e

    ev = (
        [(1, "2024-01-01 10:00:00", 1, "A")]
        + [(10 + i, "2024-01-01 10:00:00", 2, "A") for i in range(2)]
        + [(20 + i, "2024-01-01 10:00:00", 3, "A") for i in range(6)]
    )
    _write_events_seq(spark, tmp_path.as_posix(), ev)
    r = e.queries()["q_negative_binomial_fit"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["n_users"], r["n_events"]) == (3, 9)
    assert r["mean_events"] == 3.0
    assert r["var_events"] == 7.0
    assert abs(r["dispersion_index"] - 7.0 / 3.0) < 1e-15
    assert r["nb_r"] == 9.0 / 4.0
    assert abs(r["nb_p"] - 3.0 / 7.0) < 1e-15


# ------------------------------------------------------------------
# q_capture_recapture
# ------------------------------------------------------------------


def test_capture_recapture_closed_form(spark, tmp_path):
    """Signatures: A in both halves, B only half-0, C only half-1 →
    n1=2, n2=2, m=1, seen=3; Chapman N̂ = 3·3/2 − 1 = 3.5,
    est_unseen = floor(0.5) = 0."""
    import __spark_entry__ as e

    docs = [
        (0, "same text", "s"),   # half 0, sig A
        (1, "same text", "s"),   # half 1, sig A
        (2, "only zero", "s"),   # half 0, sig B
        (3, "only one", "s"),    # half 1, sig C
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    r = e.queries()["q_capture_recapture"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["n1"], r["n2"], r["m"], r["n_seen"]) == (2, 2, 1, 3)
    assert r["chapman_est"] == 3.5
    assert r["est_unseen"] == 0


def test_capture_recapture_disjoint_halves(spark, tmp_path):
    """Zero overlap (m=0): the +1 correction keeps the estimate
    finite — N̂ = 2·2/1 − 1 = 3 with 2 seen → 1 unseen."""
    import __spark_entry__ as e

    docs = [(0, "zero half", "s"), (1, "one half", "s")]
    _write_documents(spark, tmp_path.as_posix(), docs)
    r = e.queries()["q_capture_recapture"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["n1"], r["n2"], r["m"], r["n_seen"]) == (1, 1, 0, 2)
    assert r["chapman_est"] == 3.0
    assert r["est_unseen"] == 1


# ------------------------------------------------------------------
# q_unseen_vocabulary
# ------------------------------------------------------------------


def test_unseen_vocabulary_closed_form(spark, tmp_path):
    """Corpus 'a a a b b c d' → V=4, N=7, f1=2 (c,d), f2=1 (b) →
    Chao1 = 4 + 4/2 = 6.0, Good–Turing missing mass = 2/7."""
    import __spark_entry__ as e

    _write_documents(
        spark, tmp_path.as_posix(), [(0, "a a a b b c d", "s")]
    )
    r = e.queries()["q_unseen_vocabulary"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["v_obs"], r["n_tokens"], r["f1"], r["f2"]) == (4, 7, 2, 1)
    assert r["chao1_richness"] == 6.0
    assert r["gt_missing_mass"] == 2.0 / 7.0


def test_unseen_vocabulary_f2_zero_correction(spark, tmp_path):
    """No doubletons (f2=0): the bias-corrected f1(f1−1)/2 branch —
    'a a a b c' → V=3, f1=2, f2=0 → Chao1 = 3 + 1 = 4.0."""
    import __spark_entry__ as e

    _write_documents(
        spark, tmp_path.as_posix(), [(0, "a a a b c", "s")]
    )
    r = e.queries()["q_unseen_vocabulary"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert (r["v_obs"], r["f1"], r["f2"]) == (3, 2, 0)
    assert r["chao1_richness"] == 4.0
