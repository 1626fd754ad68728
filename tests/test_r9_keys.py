"""Round-9 §2.22 key edge cases the sf fixtures cannot reach —
closed-form planted inputs for the pipeline-assembly keys
(keys_r9.py)."""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F  # noqa: F401


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


def _write_customers(spark, sf, rows):
    """rows: (custkey, name, nationkey, acctbal, segment)"""
    (
        spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/customer.parquet")
    )


def _write_events(spark, sf, rows):
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


def _write_lineitem(spark, sf, rows):
    """rows: (okey, lineno, partkey, qty, price)"""
    (
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_linenumber int, l_partkey long, "
            "l_quantity double, l_extendedprice double",
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/lineitem.parquet")
    )


def _write_orders(spark, sf, rows):
    """rows: (okey, custkey, totalprice, priority)"""
    (
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderpriority string",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("1995-01-01").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
            "o_orderpriority",
            F.lit("O").alias("o_orderstatus"),
        )
        .write.mode("overwrite")
        .parquet(f"{sf}/orders.parquet")
    )


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
# q_er_clusters
# ------------------------------------------------------------------


def test_er_clusters_triangle_and_singleton(spark, tmp_path):
    """Three customers in one (nation, segment) block pairwise clear
    the link threshold → one entity with entity_id = min custkey and
    size 3; a fourth shares the block but matches nobody → singleton.

    Fields derive from planted columns (digit = last name char, band
    = cents div 100000, hash = custkey % 97): custkeys 2/99/196 all
    share hash 2 and digit '7'; 196's band differs (3000.0 vs
    1000.0) so its links ride digit+hash = 4412192 ≥ 4e6; the full
    triple-agree A–B pair scores 9553856.  D(3): all three fields
    differ from everyone → every pair deeply negative."""
    import __spark_entry__ as e

    rows = [
        (2, "x7", 0, 1000.0, "S"),
        (99, "y7", 0, 1000.0, "S"),
        (196, "z7", 0, 3000.0, "S"),
        (3, "w0", 0, 7000.0, "S"),
    ]
    _write_customers(spark, tmp_path.as_posix(), rows)
    out = {
        r["c_custkey"]: (r["entity_id"], r["entity_size"])
        for r in e.queries()["q_er_clusters"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert out[2] == (2, 3) and out[99] == (2, 3) and out[196] == (2, 3)
    assert out[3] == (3, 1)


def test_er_clusters_pure_chain_transitivity(spark, tmp_path):
    """A–B link, B–C link, but the A–C pair does NOT clear the
    threshold — one entity of 3 anyway (the component, not the pair
    list — the property that distinguishes this key from
    q_record_linkage's pairwise output).

    Construction: all three share hash 6 (custkeys 6/103/200 ≡ 6 mod
    97).  A–B agree digit+hash, bands differ → 2251292 − 2251292 +
    4412192 = 4412192 ≥ 4e6 link.  B–C agree band+hash, digits
    differ → 5051272 link.  A–C agree only hash (digit AND band
    differ) → −2251292 − 2890372 + 4412192 = −729472 — no link."""
    import __spark_entry__ as e

    rows = [
        # A: name ends '7', band 9 (bal 9000), hash 6 (custkey 6)
        (6, "a7", 0, 9000.0, "S"),
        # B: name ends '7' (digit matches A), band 1, hash 6
        # (custkey 103 = 6 + 97) → A–B: digit+hash agree, band
        # differs: 2251292 − 2251292 + 4412192 = 4412192 ≥ 4e6 link
        (103, "b7", 0, 1000.0, "S"),
        # C: name ends '3', band 1 (matches B), hash 6 (custkey 200
        # = 6 + 2·97) → B–C: band+hash, digit differs: 4412192 link
        # A–C: hash agree, digit differ, band differ → −729472: no
        (200, "c3", 0, 1000.0, "S"),
    ]
    _write_customers(spark, tmp_path.as_posix(), rows)
    out = {
        r["c_custkey"]: (r["entity_id"], r["entity_size"])
        for r in e.queries()["q_er_clusters"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert out == {6: (6, 3), 103: (6, 3), 200: (6, 3)}, out


# ------------------------------------------------------------------
# q_group_reservoir
# ------------------------------------------------------------------


def test_group_reservoir_per_source_counts(spark, tmp_path):
    """A 5-doc source returns all 5 rows; a 30-doc source returns
    exactly 20; ranks are 1..k dense per source and stable across
    reuse-off re-execution."""
    import __spark_entry__ as e

    docs = [(i, "x" * (10 + i % 7), "small") for i in range(5)]
    docs += [(100 + i, "y" * (10 + i % 13), "big") for i in range(30)]
    _write_documents(spark, tmp_path.as_posix(), docs)
    rows = e.queries()["q_group_reservoir"](
        spark, tmp_path.as_posix()
    ).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["rk"])
    assert sorted(by_src["small"]) == [1, 2, 3, 4, 5]
    assert sorted(by_src["big"]) == list(range(1, 21))


# ------------------------------------------------------------------
# q_session_ngrams
# ------------------------------------------------------------------


def test_session_ngrams_sliding_and_gap(spark, tmp_path):
    """One user, events A B C D within one session → trigrams A>B>C
    and B>C>D (SLIDING, not just the opening path — the distinction
    from q_session_paths).  A 31-minute gap before E F G starts a new
    session: no trigram spans the boundary (C>D>E and D>E>F must NOT
    appear; E>F>G must)."""
    import __spark_entry__ as e

    ev = [
        (1, "2024-01-01 10:00:00", 7, "A"),
        (2, "2024-01-01 10:01:00", 7, "B"),
        (3, "2024-01-01 10:02:00", 7, "C"),
        (4, "2024-01-01 10:03:00", 7, "D"),
        (5, "2024-01-01 10:34:00", 7, "E"),
        (6, "2024-01-01 10:35:00", 7, "F"),
        (7, "2024-01-01 10:36:00", 7, "G"),
    ]
    _write_events(spark, tmp_path.as_posix(), ev)
    got = {
        r["trigram"]: r["n_occurrences"]
        for r in e.queries()["q_session_ngrams"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got == {"A>B>C": 1, "B>C>D": 1, "E>F>G": 1}, got


# ------------------------------------------------------------------
# q_lift_deciles
# ------------------------------------------------------------------


def test_lift_deciles_planted_concentration(spark, tmp_path):
    """20 customers, responders = exactly the top-10 balances →
    deciles 1–5 (2 customers each) have lift 2.0, deciles 6–10 lift
    0, cum_capture climbs 0.2 … 1.0 and stays 1.0."""
    import __spark_entry__ as e

    cust = [
        (i, f"c{i}", 0, 10000.0 - i * 100.0, "S") for i in range(1, 21)
    ]
    _write_customers(spark, tmp_path.as_posix(), cust)
    # top-10 balances = custkeys 1..10 → they respond
    orders = [(i, i, 100.0, "1-URGENT") for i in range(1, 11)]
    orders += [(100 + i, i, 100.0, "3-MEDIUM") for i in range(11, 21)]
    _write_orders(spark, tmp_path.as_posix(), orders)
    rows = sorted(
        e.queries()["q_lift_deciles"](
            spark, tmp_path.as_posix()
        ).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["n_customers"] for r in rows] == [2] * 10
    assert [r["n_resp"] for r in rows] == [2] * 5 + [0] * 5
    for i, r in enumerate(rows):
        want_lift = 2.0 if i < 5 else 0.0
        assert r["lift"] == want_lift, (i, r)
        want_cap = min((i + 1) * 0.2, 1.0)
        assert abs(r["cum_capture"] - want_cap) < 1e-12, (i, r)


# ------------------------------------------------------------------
# q_simhash_band_index
# ------------------------------------------------------------------


def test_simhash_band_index_python_mirror(spark, tmp_path):
    """sig16 equals a hashlib.md5 python mirror of the
    nibble-parity majority vote; 4 band rows per doc decompose the
    signature exactly; identical docs share identical signatures."""
    import __spark_entry__ as e

    docs = [
        (1, "alpha beta gamma", "s"),
        (2, "alpha beta gamma", "s"),
        (3, "delta epsilon zeta eta", "s"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    rows = e.queries()["q_simhash_band_index"](
        spark, tmp_path.as_posix()
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["band"]] = (
            r["band_key"],
            r["sig16"],
        )

    def mirror_sig(tokens):
        toks = sorted(set(tokens))
        sig = 0
        for b in range(16):
            ones = sum(
                1
                for t in toks
                if hashlib.md5(t.encode()).hexdigest()[b]
                in "13579bdf"
            )
            if 2 * ones > len(toks):
                sig |= 1 << b
        return sig

    want1 = mirror_sig(["alpha", "beta", "gamma"])
    want3 = mirror_sig(["delta", "epsilon", "zeta", "eta"])
    for doc, want in [(1, want1), (2, want1), (3, want3)]:
        assert set(by_doc[doc]) == {0, 1, 2, 3}
        for b in range(4):
            bk, sig = by_doc[doc][b]
            assert sig == want, (doc, sig, want)
            assert bk == (want >> (4 * b)) & 15, (doc, b)


# ------------------------------------------------------------------
# q_conformal_interval
# ------------------------------------------------------------------


def test_conformal_perfect_fit(spark, tmp_path):
    """y = 2x exactly on both halves → slope 2, intercept 0, every
    residual 0, q̂ = 0, coverage 1.0."""
    import __spark_entry__ as e

    rows = []
    for okey in range(1, 41):
        q = float(1 + okey % 7)
        rows.append((okey, 1, 1, q, 2.0 * q))
    _write_lineitem(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_conformal_interval"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_cal"] == 20 and r["n_test"] == 20
    assert r["slope"] == 2.0 and r["intercept"] == 0.0
    assert r["qhat"] == 0.0
    assert r["n_covered"] == 20 and r["coverage"] == 1.0


def test_conformal_planted_outliers(spark, tmp_path):
    """Calibration: 19 exact-fit rows + one +1000 outlier.  With
    n_cal = 20, the conformal rank is ceil(0.9·21) = 19 → q̂ = 0
    (the outlier sits at rank 20).  Test half: 18 exact rows + two
    +5 rows → coverage = 18/20."""
    import __spark_entry__ as e

    rows = []
    for i in range(20):  # calibration: even orderkeys
        okey = 2 * (i + 1)
        q = float(1 + i % 5)
        y = 3.0 * q + (1000.0 if i == 0 else 0.0)
        rows.append((okey, 1, 1, q, y))
    for i in range(20):  # test: odd orderkeys
        okey = 2 * i + 1
        q = float(1 + i % 5)
        y = 3.0 * q + (5.0 if i < 2 else 0.0)
        rows.append((okey, 1, 1, q, y))
    _write_lineitem(spark, tmp_path.as_posix(), rows)
    r = e.queries()["q_conformal_interval"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    # one outlier in 20 shifts the fit; assert the CONTRACT pieces
    # that are outlier-robust: counts, the rank position, coverage
    # arithmetic
    assert r["n_cal"] == 20 and r["n_test"] == 20
    assert r["n_covered"] + sum(
        1
        for i in range(20)
        if abs(
            (3.0 * (1 + i % 5) + (5.0 if i < 2 else 0.0))
            - (r["intercept"] + r["slope"] * (1 + i % 5))
        )
        > r["qhat"] + 1e-9
    ) == 20
    assert r["coverage"] == r["n_covered"] / 20.0


# ------------------------------------------------------------------
# q_energy_distance
# ------------------------------------------------------------------


def test_energy_distance_two_point_closed_form(spark, tmp_path):
    """X = n copies of a, Y = m copies of b → E|X−Y| = |a−b|,
    E|X−X'| = E|Y−Y'| = 0 → energy = 2|a−b| cents exactly."""
    import __spark_entry__ as e

    orders = [(i, 1, 100.00, "1-URGENT") for i in range(1, 8)]
    orders += [(100 + i, 1, 350.00, "3-MEDIUM") for i in range(1, 12)]
    _write_orders(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_energy_distance"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_x"] == 7 and r["n_y"] == 11
    assert r["energy_cents"] == 2.0 * 25000.0, r


def test_energy_distance_identical_distributions_zero(spark, tmp_path):
    """X and Y drawn as the SAME multiset of values → energy 0."""
    import __spark_entry__ as e

    vals = [10.0, 20.0, 20.0, 55.5]
    orders = [
        (i + 1, 1, v, "1-URGENT") for i, v in enumerate(vals)
    ] + [
        (100 + i, 1, v, "3-MEDIUM") for i, v in enumerate(vals)
    ]
    _write_orders(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_energy_distance"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["energy_cents"] == 0.0, r


# ------------------------------------------------------------------
# q_quantile_sketch
# ------------------------------------------------------------------


def test_quantile_sketch_closed_form_1024(spark, tmp_path):
    """1024 distinct cents values 1..1024 → step = 2 (512·1 < 1024 ≤
    512·2), summary = even ranks; every probe's exact value = its
    target rank, estimate = target rounded up to even (clamped), gap
    ∈ {0, 1} < step."""
    import __spark_entry__ as e

    rows = [(i, 1, 1, 1.0, i / 100.0) for i in range(1, 1025)]
    _write_lineitem(spark, tmp_path.as_posix(), rows)
    out = {
        r["permille"]: r
        for r in e.queries()["q_quantile_sketch"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert len(out) == 7
    for p, r in out.items():
        tr = (p * 1024 + 999) // 1000
        er = min(((tr + 1) // 2) * 2, 1024)
        assert r["step"] == 2, r
        assert r["target_rank"] == tr and r["est_rank"] == er, (p, r)
        assert r["exact_cents"] == tr and r["est_cents"] == er, (p, r)
        assert r["rank_gap"] == er - tr and 0 <= r["rank_gap"] < 2


def test_quantile_sketch_small_input_step_one(spark, tmp_path):
    """n ≤ 512 → step = 1: the summary IS the data and every
    estimate is exact (gap 0) — the lossless fast floor."""
    import __spark_entry__ as e

    rows = [(i, 1, 1, 1.0, (100 + i) / 100.0) for i in range(1, 101)]
    _write_lineitem(spark, tmp_path.as_posix(), rows)
    for r in e.queries()["q_quantile_sketch"](
        spark, tmp_path.as_posix()
    ).collect():
        assert r["step"] == 1 and r["rank_gap"] == 0
        assert r["est_cents"] == r["exact_cents"]


# ------------------------------------------------------------------
# q_bipartite_projection
# ------------------------------------------------------------------


def test_bipartite_projection_cap_and_weights(spark, tmp_path):
    """Parts 1,2 co-occur in 3 orders (weight 3 top edge); a
    20-part mega-order is capped to its 8 smallest partkeys —
    C(8,2) = 28 pairs, and no pair involving parts 109..120
    appears."""
    import __spark_entry__ as e

    rows = []
    for okey in (1, 2, 3):
        rows.append((okey, 1, 1, 1.0, 1.0))
        rows.append((okey, 2, 2, 1.0, 1.0))
    for j in range(20):  # mega-order: parts 101..120
        rows.append((9, j + 1, 101 + j, 1.0, 1.0))
    _write_lineitem(spark, tmp_path.as_posix(), rows)
    got = {
        (r["p1"], r["p2"]): r["weight"]
        for r in e.queries()["q_bipartite_projection"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got[(1, 2)] == 3
    mega = [k for k in got if k[0] >= 100 or k[1] >= 100]
    assert len(mega) == 28, len(mega)
    assert all(p1 <= 108 and p2 <= 108 for p1, p2 in mega), mega


# ------------------------------------------------------------------
# q_knn_graph
# ------------------------------------------------------------------


def test_knn_graph_mutuality_census(spark, tmp_path):
    """Label 0: four vectors — three identical (mutually nearest)
    and one orthogonal-ish outlier.  k=3 with only 3 candidates per
    node → every directed edge exists (12 edges), all reciprocated.
    Label 1: two vectors → 2 directed edges, both mutual (k clamps
    at the block size)."""
    import __spark_entry__ as e

    def vec(pattern):
        return [float(x) for x in pattern] + [0.0] * (64 - len(pattern))

    rows = [
        (1, vec([10, 0]), 0),
        (2, vec([10, 0]), 0),
        (3, vec([10, 0]), 0),
        (4, vec([0, 10]), 0),
        (10, vec([5, 5]), 1),
        (11, vec([5, 5]), 1),
    ]
    _write_embeddings(spark, tmp_path.as_posix(), rows)
    got = {
        r["label"]: r
        for r in e.queries()["q_knn_graph"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got[0]["n_nodes"] == 4 and got[0]["n_edges"] == 12
    assert got[0]["n_mutual"] == 12
    assert got[1]["n_nodes"] == 2 and got[1]["n_edges"] == 2
    assert got[1]["n_mutual"] == 2
    # cosine mass: label 1 edges are identical vectors (cos 1.0)
    assert got[1]["sum_cos_micro"] == 2 * 1000000


def _catalyst_knn_edges(e, k):
    """The pre-round-14 Catalyst spelling of the k-NN edge build (n²
    pair equi-join + zip_with fold + rank window) — kept here as the
    bit-exactness reference for the grouped-Arrow kernel."""
    from pyspark.sql import Window

    from pfithic_spark import llmops

    s = e.select(
        "vec_id",
        "label",
        "embedding",
        llmops.l2_norm(F.col("embedding")).alias("nrm"),
    )
    a, b = s.alias("a"), s.alias("b")
    cos = F.round(
        llmops.dot_double(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        cos.alias("cosine"),
    )
    we = Window.partitionBy("src").orderBy(F.col("cosine").desc(), "dst")
    return (
        pairs.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= k)
        .select("label", "src", "dst", "cosine")
    )


def test_knn_edges_gemm_equals_catalyst(spark, sf_dir):
    """The round-14 grouped-Arrow kernel must emit BIT-identical edges
    (same (label, src, dst) set, byte-identical cosine doubles) to the
    Catalyst pair-join spelling it replaced — the kernel's sequential
    fold order and exact Spark-rounding replication are the contract
    that keeps q_knn_graph / q_kcore_census oracle-stable."""
    import struct

    from pfithic_spark import llmops
    from pfithic_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")

    def keyed(rows):
        return sorted(
            (
                r["label"],
                r["src"],
                r["dst"],
                struct.pack("<d", r["cosine"]),
            )
            for r in rows
        )

    ref = keyed(_catalyst_knn_edges(e, 3).collect())
    got = keyed(llmops.knn_topk_edges_gemm(e, k=3).collect())
    assert len(got) == len(ref) and got == ref


def test_knn_edges_gemm_equals_catalyst_planted_ties(spark, tmp_path):
    """Planted block with exact cosine TIES (identical vectors) and a
    clamped block (fewer candidates than k): the kernel's in-kernel
    (cosine DESC, dst ASC) rank must break ties exactly like the
    row_number window."""
    import struct

    from pfithic_spark import llmops
    from pfithic_spark.io import load_table

    def vec(pattern):
        return [float(x) for x in pattern] + [0.0] * (64 - len(pattern))

    rows = [
        (5, vec([10, 0]), 0),
        (1, vec([10, 0]), 0),
        (3, vec([10, 0]), 0),
        (9, vec([10, 0.0001]), 0),
        (4, vec([0, 10]), 0),
        (2, vec([7, 7]), 0),
        (10, vec([5, 5]), 1),
        (11, vec([5, 5]), 1),
    ]
    _write_embeddings(spark, tmp_path.as_posix(), rows)
    e = load_table(spark, tmp_path.as_posix(), "embeddings")

    def keyed(rs):
        return sorted(
            (r["label"], r["src"], r["dst"], struct.pack("<d", r["cosine"]))
            for r in rs
        )

    ref = keyed(_catalyst_knn_edges(e, 3).collect())
    got = keyed(llmops.knn_topk_edges_gemm(e, k=3).collect())
    assert got == ref


def test_round6_micro_matches_spark_round(spark):
    """_round6_micro_spark must agree with Spark's Round(col, 6) on
    DoubleType bit-for-bit — including exact .5 boundaries (where
    HALF_UP rounds away from zero, unlike floor(x+0.5)), negatives,
    and values whose shortest decimal repr sits ON the boundary."""
    import struct

    import numpy as np

    from pfithic_spark import llmops

    vals: list[float] = []
    # exact half-boundaries at the 6th decimal, both signs
    for kk in range(-12, 13):
        vals.append((kk + 0.5) / 1e6)
        vals.append((kk + 0.5) * 1e-6)
    # shortest-repr boundary cases and near-boundary doubles
    vals += [
        0.1234565,
        -0.1234565,
        0.2874999999999999,
        0.9999995,
        -0.9999995,
        1.0,
        -1.0,
        0.0,
        0.12345649999999999,
        0.1234565000000001,
    ]
    rng = np.random.RandomState(42)
    vals += [float(v) for v in rng.uniform(-1, 1, 500)]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    exp = [r["r"] for r in df.select(F.round("v", 6).alias("r")).collect()]
    got = llmops._round6_micro_spark(np.asarray(vals, dtype=np.float64)) / 1e6
    for v, g, x in zip(vals, got, exp):
        assert struct.pack("<d", g) == struct.pack("<d", x), (v, g, x)


# ------------------------------------------------------------------
# q_rrf_fusion
# ------------------------------------------------------------------


def test_rrf_fusion_integer_mirror(spark, tmp_path):
    """Fused micro-scores equal a pure-python integer mirror of both
    rankings (length-desc and Knuth-hash-asc) — the whole key is
    int64, so the mirror is exact, not approximate."""
    import __spark_entry__ as e

    n = 40
    docs = [(i, "x" * (10 + (i * 7) % 31), "s") for i in range(n)]
    _write_documents(spark, tmp_path.as_posix(), docs)
    got = {
        r["doc_id"]: (r["rank_lex"], r["rank_sem"], r["rrf_micro"])
        for r in e.queries()["q_rrf_fusion"](
            spark, tmp_path.as_posix()
        ).collect()
    }

    def knuth(x):
        return ((x % 2654435761) * 2654435761) % 4294967296

    lens = {i: 10 + (i * 7) % 31 for i in range(n)}
    lex = sorted(range(n), key=lambda i: (-lens[i], i))
    sem = sorted(range(n), key=lambda i: (knuth(i), i))
    r_lex = {d: r + 1 for r, d in enumerate(lex)}
    r_sem = {d: r + 1 for r, d in enumerate(sem)}
    score = {
        d: 10**12 // (60 + r_lex[d]) + 10**12 // (60 + r_sem[d])
        for d in range(n)
    }
    want_top = sorted(range(n), key=lambda d: (-score[d], d))[:20]
    assert set(got) == set(want_top), (sorted(got), sorted(want_top))
    for d in want_top:
        assert got[d] == (r_lex[d], r_sem[d], score[d]), (d, got[d])


# ------------------------------------------------------------------
# q_mixture_allocation
# ------------------------------------------------------------------


def test_mixture_allocation_cap_and_redistribution(spark, tmp_path):
    """Source A (weight 2, avail 1000) hits its 800-char cap on the
    proportional pass; the 200-char leftover redistributes entirely
    to B.  Exact integer closed form: A → 800 (fill 1.0), B → 4200
    of cap 7200."""
    import __spark_entry__ as e

    docs = [(i, "a" * 500, "A") for i in range(2)]
    docs += [(10 + i, "b" * 1125, "B") for i in range(8)]
    _write_documents(spark, tmp_path.as_posix(), docs)
    got = {
        r["source"]: r
        for r in e.queries()["q_mixture_allocation"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    a, b = got["A"], got["B"]
    assert a["weight_bp"] == 2000 and a["cap_chars"] == 800
    assert a["alloc_chars"] == 800 and a["fill_rate"] == 1.0
    assert b["weight_bp"] == 8000 and b["cap_chars"] == 7200
    assert b["alloc_chars"] == 4200, b
    assert b["fill_rate"] == round(4200 / 7200, 6)


# ------------------------------------------------------------------
# q_interarrival_stats
# ------------------------------------------------------------------


def test_interarrival_planted_gaps(spark, tmp_path):
    """One user, one type, gaps 60 s / 120 s / 60 s → n=3, exact mean
    80 s, lower-median 60 s (rank (3+1) div 2 = 2 of sorted
    [60, 60, 120]); a second type with one event yields no gap row."""
    import __spark_entry__ as e

    ev = [
        (1, "2024-01-01 10:00:00", 7, "A"),
        (2, "2024-01-01 10:01:00", 7, "A"),
        (3, "2024-01-01 10:03:00", 7, "A"),
        (4, "2024-01-01 10:04:00", 7, "A"),
        (5, "2024-01-01 10:00:30", 7, "B"),
    ]
    _write_events(spark, tmp_path.as_posix(), ev)
    rows = e.queries()["q_interarrival_stats"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(rows) == 1 and rows[0]["event_type"] == "A"
    r = rows[0]
    assert r["n_gaps"] == 3
    assert r["mean_gap_us"] == 80_000_000.0
    assert r["min_gap_us"] == 60_000_000
    assert r["max_gap_us"] == 120_000_000
    assert r["median_gap_us"] == 60_000_000


# ------------------------------------------------------------------
# q_ngram_novelty
# ------------------------------------------------------------------


def test_ngram_novelty_closed_form(spark, tmp_path):
    """Train half (doc 0): 'a b c d' → trigram set {a b c, b c d}.
    Test half (doc 1): 'a b c x y z' → 4 trigrams, 3 novel →
    novelty_rate 0.75 exactly.  Short docs (<3 tokens) on BOTH
    halves contribute ZERO trigrams — Spark's sequence(1, n-2)
    descends to [1, 0] for n < 3 and tk[i+1] then indexes past the
    array (round-9 ADVICE high: ArrayIndexOutOfBounds under the
    default ANSI session; spurious trigrams with ANSI off, where
    DuckDB's GENERATE_SERIES is empty)."""
    import __spark_entry__ as e

    docs = [
        (0, "a b c d", "s"),
        (1, "a b c x y z", "s"),
        # short docs: 0, 1 and 2 tokens, one per half — must neither
        # crash nor add trigram occurrences
        (2, "p q", "s"),
        (3, "p q", "s"),
        (4, "", "s"),
        (5, "solo", "s"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    r = e.queries()["q_ngram_novelty"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(r) == 1
    assert r[0]["n_test_trigrams"] == 4
    assert r[0]["n_novel"] == 3
    assert r[0]["novelty_rate"] == 0.75


# ------------------------------------------------------------------
# q_length_log2_histogram
# ------------------------------------------------------------------


def test_length_log2_histogram_bucket_edges(spark, tmp_path):
    """Lengths 1 / 2,3 / 4..7 land in buckets 0 / 1 / 2 exactly (the
    2^k edges are where a float log2 would be 1-ulp fragile); shares
    are exact fractions of the source total."""
    import __spark_entry__ as e

    lens = [1, 2, 3, 4, 5, 6, 7]
    docs = [(i, "x" * ln, "s") for i, ln in enumerate(lens)]
    _write_documents(spark, tmp_path.as_posix(), docs)
    got = {
        r["log2_bucket"]: (r["n_docs"], r["share"])
        for r in e.queries()["q_length_log2_histogram"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got == {
        0: (1, 1 / 7),
        1: (2, 2 / 7),
        2: (4, 4 / 7),
    }, got


# ------------------------------------------------------------------
# q_auc_by_group
# ------------------------------------------------------------------


def test_auc_by_group_perfect_and_degenerate(spark, tmp_path):
    """Segment P: urgent orders all priced above non-urgent → AUC
    exactly 1.0.  Segment S: every order urgent → single-class NULL
    (the §8.17 guard, per slice)."""
    import __spark_entry__ as e

    cust = [(1, "a", 0, 0.0, "P"), (2, "b", 0, 0.0, "S")]
    _write_customers(spark, tmp_path.as_posix(), cust)
    orders = [
        (1, 1, 500.0, "1-URGENT"),
        (2, 1, 400.0, "1-URGENT"),
        (3, 1, 100.0, "3-MEDIUM"),
        (4, 1, 50.0, "3-MEDIUM"),
        (5, 2, 70.0, "1-URGENT"),
        (6, 2, 90.0, "1-URGENT"),
    ]
    _write_orders(spark, tmp_path.as_posix(), orders)
    got = {
        r["segment"]: r
        for r in e.queries()["q_auc_by_group"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got["P"]["n_pos"] == 2 and got["P"]["n_neg"] == 2
    assert got["P"]["auc"] == 1.0
    assert got["S"]["n_pos"] == 2 and got["S"]["n_neg"] == 0
    assert got["S"]["auc"] is None


# ------------------------------------------------------------------
# q_power_mde
# ------------------------------------------------------------------


def test_power_mde_python_mirror(spark, tmp_path):
    """MDE equals the identical-IEEE python chain on the planted
    counts (arm split mirrored through the Knuth hash)."""
    import math

    import __spark_entry__ as e

    def knuth(x):
        return ((x % 2654435761) * 2654435761) % 4294967296

    n = 30
    cust = [(i, f"c{i}", 0, 0.0, "S") for i in range(1, n + 1)]
    _write_customers(spark, tmp_path.as_posix(), cust)
    responders = [i for i in range(1, n + 1) if i % 3 == 0]
    orders = [(i, i, 10.0, "1-URGENT") for i in responders]
    orders += [(100 + i, i, 10.0, "3-LOW") for i in range(1, n + 1)
               if i not in responders]
    _write_orders(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_power_mde"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    n_a = sum(1 for i in range(1, n + 1) if knuth(i) % 2 == 0)
    n_b = n - n_a
    n_resp = len(responders)
    assert (r["n_a"], r["n_b"], r["n_resp"]) == (n_a, n_b, n_resp)
    p = n_resp / n
    mde = (1.959964 + 0.841621) * math.sqrt(
        2.0 * p * (1.0 - p) / min(n_a, n_b)
    )
    assert r["pooled_rate"] == p
    assert r["mde_abs"] == mde and r["mde_rel"] == mde / p


# ------------------------------------------------------------------
# q_bloom_membership
# ------------------------------------------------------------------


def test_bloom_membership_python_mirror(spark, tmp_path):
    """Bit set and probe verdicts equal an exact python mirror of
    the salted-Knuth positions for a tiny planted key set."""
    import __spark_entry__ as e

    keys = [1, 2, 3, 4, 500]
    cust = [(k, f"c{k}", 0, 0.0, "S") for k in keys]
    _write_customers(spark, tmp_path.as_posix(), cust)
    r = e.queries()["q_bloom_membership"](
        spark, tmp_path.as_posix()
    ).collect()[0]

    def pos(x, j):
        return ((((x * (2 * j + 1) + j) % 2654435761) * 2654435761)
                % 4294967296) % 4096

    bits = {pos(x, j) for x in keys for j in range(3)}
    assert r["n_keys"] == 5 and r["bits_set"] == len(bits)
    mx = max(keys)
    n_fp = sum(
        1
        for p in range(1, 1001)
        if all(pos(mx + p, j) in bits for j in range(3))
    )
    assert r["n_fp"] == n_fp
    assert r["fpr_measured"] == n_fp / 1000.0
    ratio = len(bits) / 4096.0
    assert r["fpr_expected"] == ratio * ratio * ratio


# ------------------------------------------------------------------
# q_gini_coefficient
# ------------------------------------------------------------------


def test_gini_equal_and_concentrated(spark, tmp_path):
    """All-equal revenues → Gini exactly 0; one customer holding
    everything → Gini exactly (n−1)/n."""
    import __spark_entry__ as e

    orders = [(i, i, 100.0, "3-LOW") for i in range(1, 11)]
    _write_orders(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_gini_coefficient"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_customers"] == 10 and r["gini"] == 0.0

    orders = [(i, i, 0.0, "3-LOW") for i in range(1, 10)]
    orders.append((10, 10, 1000.0, "3-LOW"))
    _write_orders(spark, tmp_path.as_posix(), orders)
    r = e.queries()["q_gini_coefficient"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["gini"] == (10 - 1) / 10.0, r


# ------------------------------------------------------------------
# q_dp_counts
# ------------------------------------------------------------------


def test_dp_counts_seeded_mirror_and_stability(spark, tmp_path):
    """Noise equals the seeded inverse-CDF python mirror (Knuth
    uniform keyed on the segment's sorted position, HALF_UP-rounded
    ln), and two runs release IDENTICAL noisy values — replay
    stability is part of the mechanism's soundness."""
    import decimal
    import math

    import __spark_entry__ as e

    cust = [(i, f"c{i}", 0, 0.0, ["A", "B", "C"][i % 3])
            for i in range(30)]
    _write_customers(spark, tmp_path.as_posix(), cust)
    k = e.queries()["q_dp_counts"]
    rows1 = {r["segment"]: r for r in k(spark, tmp_path.as_posix()).collect()}
    rows2 = {r["segment"]: r for r in k(spark, tmp_path.as_posix()).collect()}
    assert rows1.keys() == rows2.keys() == {"A", "B", "C"}

    def round_half_up9(x):
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def knuth(x):
        return ((x % 2654435761) * 2654435761) % 4294967296

    for i, seg in enumerate(sorted(rows1)):
        seed = i + 1
        u = (knuth(seed) + 1) / 4294967297.0
        if u >= 0.5:
            noise = -(1.0 / 1.0) * round_half_up9(math.log(2.0 - 2.0 * u))
        else:
            noise = (1.0 / 1.0) * round_half_up9(math.log(2.0 * u))
        r1, r2 = rows1[seg], rows2[seg]
        assert r1["noise"] == noise, (seg, r1["noise"], noise)
        assert r1["noisy_count"] == r1["true_count"] + noise
        assert (r1["noise"], r1["noisy_count"]) == (
            r2["noise"],
            r2["noisy_count"],
        )
        assert r1["true_count"] == 10


# ------------------------------------------------------------------
# q_holdout_leakage
# ------------------------------------------------------------------


def test_holdout_leakage_planted_copy(spark, tmp_path):
    """Test doc 1 is a byte-copy (after lower/trim) of train doc 0 →
    leaked; test doc 3 is unique → not.  Per-source rate = 1/2."""
    import __spark_entry__ as e

    docs = [
        (0, "The Quick Fox  ", "s"),
        (2, "other train doc", "s"),
        (1, "  the quick fox", "s"),
        (3, "completely new", "s"),
    ]
    _write_documents(spark, tmp_path.as_posix(), docs)
    r = e.queries()["q_holdout_leakage"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(r) == 1
    assert r[0]["n_test_docs"] == 2 and r[0]["n_leaked"] == 1
    assert r[0]["leak_rate"] == 0.5


# ------------------------------------------------------------------
# q_er_golden_record
# ------------------------------------------------------------------


def test_er_golden_record_survivorship(spark, tmp_path):
    """The triangle entity {2, 99, 196} (see
    test_er_clusters_triangle_and_singleton) elects the richest
    member's attributes: golden_name 'z7' (3000.0 > 1000.0), total
    balance the exact cents sum; the singleton never appears
    (n_members >= 2 filter)."""
    import __spark_entry__ as e

    rows = [
        (2, "x7", 0, 1000.0, "S"),
        (99, "y7", 0, 1000.0, "S"),
        (196, "z7", 0, 3000.0, "S"),
        (3, "w0", 0, 7000.0, "S"),
    ]
    _write_customers(spark, tmp_path.as_posix(), rows)
    out = e.queries()["q_er_golden_record"](
        spark, tmp_path.as_posix()
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["entity_id"] == 2 and r["n_members"] == 3
    assert r["golden_name"] == "z7"
    assert r["golden_bal_cents"] == 300000
    assert r["total_bal_cents"] == 500000


# ------------------------------------------------------------------
# q_price_elasticity
# ------------------------------------------------------------------


def test_price_elasticity_planted_slopes(spark, tmp_path):
    """Brand A: perfect elasticity −1 planted in exact round(9) log
    space (qty halves as unit price doubles); brand B: one price
    point → NULL (no identifiable slope)."""
    import decimal
    import math

    import __spark_entry__ as e

    # brand A parts: (unit_cents, qty) = (100, 400), (200, 200),
    # (400, 100) — ln(q) = c − 1·ln(p) exactly in unrounded reals;
    # with round(9) logs the OLS slope lands within 1e-9 of −1.
    li = []
    parts = []
    pk = 1
    for cents, qty in ((100, 400), (200, 200), (400, 100)):
        li.append((pk, 1, pk, float(qty), cents * qty / 100.0))
        parts.append((pk, "BrandA"))
        pk += 1
    for qty in (50, 60):
        li.append((pk, 1, pk, float(qty), 300 * qty / 100.0))
        parts.append((pk, "BrandB"))
        pk += 1
    _write_lineitem(spark, tmp_path.as_posix(), li)
    (
        spark.createDataFrame(parts, "p_partkey long, p_brand string")
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/part.parquet")
    )
    got = {
        r["brand"]: r
        for r in e.queries()["q_price_elasticity"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    assert got["BrandA"]["n_parts"] == 3
    assert abs(got["BrandA"]["elasticity"] + 1.0) < 1e-8, got["BrandA"]
    # BrandB: both parts share unit price 300 → zero x-variance → NULL
    assert got["BrandB"]["n_parts"] == 2
    assert got["BrandB"]["elasticity"] is None


# ------------------------------------------------------------------
# q_sketch_merge
# ------------------------------------------------------------------


def test_sketch_merge_zero_mismatch(spark, tmp_path):
    """Register merge must equal the direct build exactly —
    n_mismatch 0 and identical rho mass — on a planted stream where
    both shards see overlapping AND disjoint users."""
    import __spark_entry__ as e

    ev = []
    eid = 1
    for u in range(1, 40):  # users 1..39 on shard determined by eid
        ev.append((eid, "2024-01-01 10:00:00", u, "A"))
        eid += 1
    for u in range(1, 10):  # overlap: early users appear again
        ev.append((eid, "2024-01-01 11:00:00", u, "B"))
        eid += 1
    _write_events(spark, tmp_path.as_posix(), ev)
    r = e.queries()["q_sketch_merge"](
        spark, tmp_path.as_posix()
    ).collect()[0]
    assert r["n_mismatch"] == 0
    assert r["n_buckets_direct"] == r["n_buckets_merged"]
    assert r["sum_rho_direct"] == r["sum_rho_merged"]
    assert r["n_buckets_direct"] >= 1


# ------------------------------------------------------------------
# q_ab_cuped
# ------------------------------------------------------------------


def test_ab_cuped_unbiased_and_variance(spark, tmp_path):
    """Planted y = 2x + arm-effect: CUPED with a perfectly
    correlated covariate removes ALL covariate variance
    (var_reduction == rho^2 mirrored bit-exactly) and the adjusted
    diff equals the python IEEE mirror of the same chain."""
    import __spark_entry__ as e

    def knuth(x):
        return ((x % 2654435761) * 2654435761) % 4294967296

    n = 24
    cust = [(i, f"c{i}", 0, 0.0, "S") for i in range(1, n + 1)]
    _write_customers(spark, tmp_path.as_posix(), cust)
    # pre-period x_i = 100·i cents (1995); period y = 2x (+1000 for
    # arm 1): write two orders per customer with explicit years
    rows = []
    ok = 1
    xs, ys, arms = {}, {}, {}
    for i in range(1, n + 1):
        arm = knuth(i) % 2
        x = 100 * i
        y = 2 * x + (1000 if arm == 1 else 0)
        xs[i], ys[i], arms[i] = x, y, arm
        rows.append((ok, i, "1995-03-01", x / 100.0)); ok += 1
        rows.append((ok, i, "1996-03-01", y / 100.0)); ok += 1
    (
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, d string, "
            "o_totalprice double",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("d").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
            F.lit("3-LOW").alias("o_orderpriority"),
            F.lit("O").alias("o_orderstatus"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/orders.parquet")
    )
    r = e.queries()["q_ab_cuped"](spark, tmp_path.as_posix()).collect()[0]
    # python mirror with the identical fixed-order chain
    N = float(n)
    sx = float(sum(xs.values())); sy = float(sum(ys.values()))
    sxx = float(sum(v * v for v in xs.values()))
    sxy = float(sum(xs[i] * ys[i] for i in xs))
    syy = float(sum(v * v for v in ys.values()))
    na = sum(1 for i in arms if arms[i] == 0)
    nb = n - na
    sya = float(sum(ys[i] for i in arms if arms[i] == 0))
    syb = float(sum(ys[i] for i in arms if arms[i] == 1))
    sxa = float(sum(xs[i] for i in arms if arms[i] == 0))
    sxb = float(sum(xs[i] for i in arms if arms[i] == 1))
    den = N * sxx - sx * sx
    num = N * sxy - sx * sy
    theta = num / den
    mean_x = sx / N
    adj_b = syb / nb - theta * (sxb / nb - mean_x)
    adj_a = sya / na - theta * (sxa / na - mean_x)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["theta"] == theta
    assert r["diff_cuped"] == adj_b - adj_a
    assert r["var_reduction"] == (num * num) / (den * (N * syy - sy * sy))
    # the planted structure: adjusted diff recovers ~the 1000-cent
    # effect while the raw diff is polluted by covariate imbalance
    assert abs(r["diff_cuped"] - 1000.0) < abs(r["diff_raw"] - 1000.0) + 1e-9


# ------------------------------------------------------------------
# q_importance_weights
# ------------------------------------------------------------------


def test_importance_weights_ratio_and_clip(spark, tmp_path):
    """Exact ratio per bucket and clip behavior: a bucket with zero
    target mass clips up to 0.2 from 0; an all-target bucket's raw
    ratio tot_src/tot_tgt clips at 5 when extreme."""
    import __spark_entry__ as e

    docs = []
    i = 0
    # bucket 3 (len 8): 8 docs, all target (en)
    for _ in range(8):
        docs.append((i, "x" * 8, "s", "en")); i += 1
    # bucket 4 (len 16): 12 docs, none target
    for _ in range(12):
        docs.append((i, "x" * 16, "s", "fr")); i += 1
    (
        spark.createDataFrame(
            docs, "doc_id long, text string, source string, lang string"
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )
    got = {
        r["bucket"]: r
        for r in e.queries()["q_importance_weights"](
            spark, tmp_path.as_posix()
        ).collect()
    }
    # bucket 3: tgt share 8/8 = 1, src share 8/20 → raw 2.5 (inside
    # the clip range)
    assert got[3]["n_src"] == 8 and got[3]["n_tgt"] == 8
    assert got[3]["weight_raw"] == (8 / 8) / (8 / 20)
    assert got[3]["weight_clipped"] == got[3]["weight_raw"]
    # bucket 4: tgt share 0 → raw 0, clipped up to 0.2
    assert got[4]["n_tgt"] == 0
    assert got[4]["weight_raw"] == 0.0
    assert got[4]["weight_clipped"] == 0.2
