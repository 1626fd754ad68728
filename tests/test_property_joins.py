"""Property-based tests for the custom join operators: random inputs
vs an O(n²) brute-force python reference.  The DuckDB oracles pin one
fixture distribution; these pin the SEMANTICS (ties, tolerance edges,
nested/adjacent/point intervals) over adversarial generated data.

Few hypothesis examples, each a real Spark job — examples are sized to
hit the interesting structure (duplicate keys, equal timestamps,
interval containment) with high probability rather than to be many.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as hs

from pfithic_spark import relational as rel

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@given(
    data=hs.lists(
        hs.tuples(hs.integers(0, 40), hs.integers(0, 25)),  # (lo, length)
        min_size=1,
        max_size=25,
    ),
    band=hs.sampled_from([1, 3, 7, 16]),
)
@settings(**_SETTINGS)
def test_overlap_join_matches_bruteforce(spark, data, band):
    """Every overlapping (left, right) pair exactly once — including
    point intervals, adjacency (hi1 == lo2, closed semantics), and full
    containment — for any band width."""
    left = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(data)]
    right = [(100 + i, lo + 5, lo + 5 + ln) for i, (lo, ln) in enumerate(data)]
    ldf = spark.createDataFrame(left, "lid long, lo1 long, hi1 long")
    rdf = spark.createDataFrame(right, "rid long, lo2 long, hi2 long")
    got = sorted(
        (r["lid"], r["rid"])
        for r in rel.overlap_join(ldf, rdf, band=band).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, lo1, hi1 in left
        for rid, lo2, hi2 in right
        if max(lo1, lo2) <= min(hi1, hi2)
    )
    assert got == want


@given(
    lefts=hs.lists(
        hs.tuples(hs.integers(0, 3), hs.integers(0, 50)),  # (key, ts)
        min_size=1,
        max_size=20,
    ),
    rights=hs.lists(
        hs.tuples(hs.integers(0, 3), hs.integers(0, 50), hs.integers(0, 9)),
        min_size=1,
        max_size=20,
    ),
    tol=hs.sampled_from([None, 0, 3, 10]),
)
@settings(**_SETTINGS)
def test_asof_join_grouped_matches_bruteforce(spark, lefts, rights, tol):
    """Backward as-of with optional staleness bound: per left row the
    LATEST right row at-or-before its timestamp (ties on right ts break
    to the larger value — the documented sort-order semantics), dropped
    when staler than the tolerance; inner-join rows without a match."""
    lrows = [(k, ts, i) for i, (k, ts) in enumerate(lefts)]
    rrows = list(rights)
    ldf = spark.createDataFrame(lrows, "k long, lts long, lid long")
    rdf = spark.createDataFrame(rrows, "k long, rts long, rv long")
    out = rel.asof_join_grouped(
        ldf,
        rdf,
        key="k",
        left_us="lts",
        right_us="rts",
        right_value_cols=["rv"],
        out_schema="lts long, lid long, rv long",
        tolerance_us=tol,
    )
    got = sorted((r["lid"], r["rv"]) for r in out.collect())
    want = []
    for k, lts, lid in lrows:
        cand = [
            (rts, rv)
            for rk, rts, rv in rrows
            if rk == k and rts <= lts and (tol is None or lts - rts <= tol)
        ]
        if cand:
            want.append((lid, max(cand)[1]))
    assert got == sorted(want)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fact_keys=hs.lists(
        hs.one_of(hs.integers(-10_000, 10_000), hs.none()),
        min_size=0,
        max_size=40,
    ),
    dim_keys=hs.lists(hs.integers(-10_000, 10_000), min_size=0, max_size=15),
)
def test_bloom_semi_join_equals_plain_semi(spark, fact_keys, dim_keys):
    """bloom_semi_join must be EXACTLY the plain semi join for any key
    sets — negatives, misses, NULL fact keys, empty sides.  The bloom
    only prunes; the final join removes every false positive."""
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], "rid long, k long"
    )
    dim = spark.createDataFrame([(k,) for k in dim_keys], "dk long")
    got = sorted(
        (r["rid"], r["k"])
        for r in rel.bloom_semi_join(fact, dim, "k", "dk").collect()
    )
    dset = set(dim_keys)
    want = sorted(
        (i, k) for i, k in enumerate(fact_keys) if k is not None and k in dset
    )
    assert got == want


def test_bloom_semi_join_mixed_key_types(spark):
    """Regression: xxhash64 is type-sensitive, so an int fact key
    against a bigint dim key silently pruned EVERY true match until
    the dim side was cast to the fact column's exact type."""
    fact = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "rid long, k int")
    dim = spark.createDataFrame([(10,), (20,)], "dk long")
    got = sorted(
        r["rid"] for r in rel.bloom_semi_join(fact, dim, "k", "dk").collect()
    )
    assert got == [1, 2]


def test_cooccurrence_pairs_hot_basket_matches_naive(spark):
    """The blocked self-join path (baskets > cap) must emit EXACTLY the
    same pair multiset as the in-row expansion, including a planted hot
    basket far past the cap — and each pair exactly once per group."""
    from itertools import combinations

    from pfithic_spark.relational import cooccurrence_pairs

    rows = []
    # normal baskets
    for g in range(20):
        for item in range(g, g + 5):
            rows.append((g, item * 7 % 40))
    # planted HOT basket: 700 distinct items in one group
    rows += [(999, i * 3) for i in range(700)]
    # duplicates within a group must not duplicate pairs
    rows += [(999, 0), (3, 21)]
    df = spark.createDataFrame(rows, "g int, item int")

    got = sorted(
        map(tuple, cooccurrence_pairs(
            df, "g", "item", basket_cap=64, chunk=50
        ).collect())
    )
    # naive reference
    from collections import defaultdict

    baskets = defaultdict(set)
    for g, item in rows:
        baskets[g].add(item)
    want = sorted(
        p
        for items in baskets.values()
        for p in combinations(sorted(items), 2)
    )
    assert got == want


def test_cooccurrence_pairs_default_path_small_baskets(spark):
    """Default cap leaves TPC-H-sized baskets on the in-row path and
    produces a<b ordered pairs."""
    from pfithic_spark.relational import cooccurrence_pairs

    df = spark.createDataFrame(
        [(1, 5), (1, 3), (1, 9), (2, 4), (2, 4)], "g int, item int"
    )
    got = sorted(map(tuple, cooccurrence_pairs(df, "g", "item").collect()))
    assert got == [(3, 5), (3, 9), (5, 9)]


@given(
    baskets=hs.lists(
        hs.lists(hs.integers(0, 60), min_size=0, max_size=30),
        min_size=1,
        max_size=12,
    ),
    cap=hs.integers(2, 8),
)
@settings(**_SETTINGS)
def test_cooccurrence_pairs_property(spark, baskets, cap):
    """For ANY basket mix and cap (forcing arbitrary small/blocked path
    splits), the hybrid generator emits exactly the per-group unordered
    distinct-item pairs, each once."""
    from itertools import combinations

    rows = [(g, item) for g, items in enumerate(baskets) for item in items]
    if not rows:
        rows = [(0, 1)]
    df = spark.createDataFrame(rows, "g int, item int")
    got = sorted(
        map(
            tuple,
            rel.cooccurrence_pairs(
                df, "g", "item", basket_cap=cap, chunk=3
            ).collect(),
        )
    )
    want = sorted(
        p
        for items in (set(b) for b in ([i for g2, i in rows if g2 == g] for g in {g for g, _ in rows}))
        for p in combinations(sorted(items), 2)
    )
    assert got == want


@given(
    segments=hs.lists(
        hs.lists(hs.sampled_from("abcdefgh"), min_size=1, max_size=40),
        min_size=1,
        max_size=6,
    ),
    k=hs.integers(3, 12),
)
@settings(**_SETTINGS)
def test_heavy_hitter_candidates_property(spark, segments, k):
    """For ANY stream layout and capacity k: the candidate collect is
    ≤ k rows AND contains every true (2/k)-hitter — the two MG merge
    invariants, under arbitrary adversarial segmentation."""
    from collections import Counter

    from pfithic_spark.llmops import heavy_hitter_candidates

    rows = [(w,) for seg in segments for w in seg]
    toks = spark.createDataFrame(rows, "w string").repartition(
        max(1, len(segments))
    )
    cand, n = heavy_hitter_candidates(toks, k)
    assert n == len(rows)
    assert len(cand) <= k
    counts = Counter(w for (w,) in rows)
    true_hh = {w for w, c in counts.items() if c > (2.0 / k) * n}
    assert true_hh <= set(cand)


def test_cooccurrence_pairs_degenerate_baskets(spark):
    """All-null and singleton baskets yield no pairs and no crash (the
    empty basket's descending sequence(0,-1) fed slice a 0 start)."""
    from pfithic_spark.relational import cooccurrence_pairs

    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 7), (3, 1), (3, 2)], "g int, item int"
    )
    got = sorted(map(tuple, cooccurrence_pairs(df, "g", "item").collect()))
    assert got == [(1, 2)]
