"""Property tests for the round-4-continuation operators: random
inputs vs brute-force python references.  The DuckDB oracles pin one
fixture distribution; these pin the SEMANTICS (gap/tie edges, interval
adjacency, dominance ties, Pareto duplicates, eigen degeneracy) over
adversarial generated data.  Few examples, each a real Spark job —
sized to hit structure, not to be many."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as hs
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


# ---------------- sessionize ----------------


def _sessions_ref(events, gap):
    """events: list[(user, us, eid)] → dict[user, list[session sizes]]"""
    by_user: dict = {}
    for u, us, eid in events:
        by_user.setdefault(u, []).append((us, eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        sizes = []
        for i, (us, _) in enumerate(evs):
            if i == 0 or us - evs[i - 1][0] > gap:
                sizes.append(1)
            else:
                sizes[-1] += 1
        out[u] = sorted(sizes)
    return out


@given(
    data=hs.lists(
        hs.tuples(hs.integers(0, 3), hs.integers(0, 200)),  # (user, us)
        min_size=1,
        max_size=40,
    ),
    gap=hs.sampled_from([1, 10, 50]),
)
@settings(**_SETTINGS)
def test_sessionize_matches_bruteforce(spark, data, gap):
    """Session split at strict >gap for any arrival pattern, including
    duplicate timestamps (event_id tie-break) and gap-boundary ties
    (== gap stays in-session)."""
    events = [(u, us, i) for i, (u, us) in enumerate(data)]
    df = spark.createDataFrame(events, "user_id long, us long, event_id long")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    g = F.col("us") - F.lag("us", 1).over(w)
    sess = (
        df.withColumn(
            "new_s", F.when(g.isNull() | (g > gap), 1).otherwise(0)
        )
        .withColumn(
            "sess",
            F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got: dict = {}
    for r in sess:
        got.setdefault(r["user_id"], []).append(r["n"])
    got = {u: sorted(v) for u, v in got.items()}
    assert got == _sessions_ref(events, gap)


# ---------------- interval coalesce ----------------


def _coalesce_ref(ivs):
    """ivs: list[(lo, hi)] → list[(start, end, n)] merged, touching
    counts as overlapping."""
    out = []
    for lo, hi in sorted(ivs):
        if out and lo <= out[-1][1]:
            s, e, n = out[-1]
            out[-1] = (s, max(e, hi), n + 1)
        else:
            out.append((lo, hi, 1))
    return sorted(out)


@given(
    data=hs.lists(
        hs.tuples(hs.integers(0, 30), hs.integers(0, 10)),  # (lo, len)
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_interval_coalesce_matches_bruteforce(spark, data):
    """Merged runs match a sequential sweep for any mix of nested,
    duplicate, adjacent, and disjoint intervals."""
    ivs = [(lo, lo + ln) for lo, ln in data]
    df = spark.createDataFrame(
        [(0, lo, hi) for lo, hi in ivs], "k long, lo long, hi long"
    )
    w = W.partitionBy("k").orderBy("lo", "hi")
    m = df.withColumn(
        "prev", F.max("hi").over(w.rowsBetween(W.unboundedPreceding, -1))
    )
    g = m.withColumn(
        "grp",
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("lo") > F.col("prev")), 1)
            .otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    got = sorted(
        (r["s"], r["e"], r["n"])
        for r in g.groupBy("k", "grp")
        .agg(
            F.min("lo").alias("s"),
            F.max("hi").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert got == _coalesce_ref(ivs)


# ---------------- skyline ----------------


@given(
    data=hs.lists(
        hs.tuples(hs.integers(0, 12), hs.integers(0, 12)),  # (x, y)
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_skyline_matches_bruteforce(spark, data):
    """Survivors == points not dominated (≥ both, > one) under the
    O(n²) definition, for any duplicates/ties."""
    from pfithic_spark import windows as win

    pts = list(data)
    df = spark.createDataFrame(pts, "x long, y long")
    gx = df.groupBy("x").agg(F.max("y").alias("ymax"))
    m = win.scalable_cummax_exclusive(
        gx, "x", "ymax", "prevmax", descending=True, num_partitions=3
    )
    keep = m.filter(
        F.col("prevmax").isNull() | (F.col("ymax") > F.col("prevmax"))
    )
    got = sorted((r["x"], r["ymax"]) for r in keep.collect())
    dominated = lambda p: any(
        (q[0] >= p[0] and q[1] >= p[1]) and (q[0] > p[0] or q[1] > p[1])
        for q in pts
    )
    want = sorted({p for p in pts if not dominated(p)})
    assert got == want


# ---------------- heavy hitters (two-pass exactness) ----------------


@given(
    stream=hs.lists(hs.integers(0, 8), min_size=1, max_size=200),
    phi_inv=hs.sampled_from([4, 10]),
)
@settings(**_SETTINGS)
def test_heavy_hitters_two_pass_exact(spark, stream, phi_inv):
    """The Misra-Gries candidate sweep + exact verify returns EXACTLY
    the > φ·n items regardless of batch layout (superset property +
    exact second pass)."""
    import pandas as pd

    phi = 1.0 / phi_inv
    k = int(2.0 / phi)
    df = spark.createDataFrame([(str(w),) for w in stream], "w string")

    def candidates(batches):
        for pdf in batches:
            vc = pdf["w"].value_counts()
            yield pd.DataFrame({"w": vc[vc > len(pdf) / k].index})

    cand = {
        r["w"]
        for r in df.repartition(4)
        .mapInPandas(candidates, schema="w string")
        .distinct()
        .collect()
    }
    n = len(stream)
    from collections import Counter

    exact = Counter(str(w) for w in stream)
    want = {w for w, c in exact.items() if c > phi * n}
    assert want <= cand  # superset guarantee under ANY partitioning
    got = {
        r["w"]
        for r in df.join(
            F.broadcast(spark.createDataFrame([(w,) for w in cand] or [("",)], "w string")),
            "w",
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > phi * n)
        .collect()
    }
    assert got == want


# ---------------- jacobi eigensolver ----------------


@given(
    n=hs.integers(2, 8),
    seed=hs.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_jacobi_eigh_matches_lapack(n, seed):
    """Eigenvalues within 1e-9 of LAPACK, vectors orthonormal and
    satisfying A·v = λ·v — including near-degenerate spectra."""
    import numpy as np

    from pfithic_spark.stats import jacobi_eigh

    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, n))
    a = (m + m.T) / 2
    if seed % 3 == 0:  # force a degenerate spectrum
        a[0, :] = a[1, :]
        a[:, 0] = a[:, 1]
    ev, evec = jacobi_eigh(a.tolist())
    ref = np.sort(np.linalg.eigvalsh(a))[::-1]
    assert max(abs(x - y) for x, y in zip(ev, ref)) < 1e-9
    V = np.array(evec).T
    np.testing.assert_allclose(V.T @ V, np.eye(n), atol=1e-9)
    for lam, v in zip(ev, np.array(evec)):
        assert np.linalg.norm(a @ v - lam * v) < 1e-8


def test_jacobi_eigh_is_deterministic():
    """Bit-identical across calls (golden-gating requirement)."""
    import numpy as np

    from pfithic_spark.stats import jacobi_eigh

    rng = np.random.default_rng(7)
    m = rng.normal(size=(16, 16))
    a = ((m + m.T) / 2).tolist()
    e1, v1 = jacobi_eigh(a)
    e2, v2 = jacobi_eigh(a)
    assert e1 == e2 and v1 == v2


def test_triangle_fast_path_equals_distributed(spark, sf_dir, monkeypatch):
    """The driver fast path and the distributed degree-ordered loop
    must return the IDENTICAL row (integer counts + replicated
    HALF_UP rounding)."""
    from pfithic_spark import registry
    from pfithic_spark.registry import keys_ext

    fast = registry.QUERIES["q_triangle_count"](spark, sf_dir).collect()
    monkeypatch.setattr(keys_ext, "_TRI_PROBE_LIMIT", 0)
    dist = registry.QUERIES["q_triangle_count"](spark, sf_dir).collect()
    assert [r.asDict() for r in fast] == [r.asDict() for r in dist]


def test_bfs_fast_path_equals_distributed(spark, sf_dir, monkeypatch):
    """The driver BFS and the iterative frontier loop must return the
    identical level histogram."""
    from pfithic_spark import registry
    from pfithic_spark.registry import keys_ext

    fast = sorted(
        (r["dist"], r["n_nodes"])
        for r in registry.QUERIES["q_graph_bfs"](spark, sf_dir).collect()
    )
    monkeypatch.setattr(keys_ext, "_TRI_PROBE_LIMIT", 0)
    dist = sorted(
        (r["dist"], r["n_nodes"])
        for r in registry.QUERIES["q_graph_bfs"](spark, sf_dir).collect()
    )
    assert fast == dist and len(fast) > 1


@given(
    sizes=hs.lists(hs.integers(min_value=1, max_value=10_000), max_size=60),
    target=hs.integers(min_value=1, max_value=20_000),
)
@settings(max_examples=200, deadline=None)
def test_binpack_ffd_properties(sizes, target):
    """OPTIMIZE's packer: (1) bins + singletons partition the input
    exactly (no file lost or duplicated); (2) every emitted bin holds
    >= 2 files and respects target_bytes; (3) the result is invariant
    under input permutation (the internal sort makes plans
    deterministic regardless of listing order)."""
    from pfithic_spark.io import _binpack_ffd

    sized = [(f"f{i:04d}", s) for i, s in enumerate(sizes)]
    bins, singles = _binpack_ffd(sized, target)
    emitted = [f for b in bins for f in b] + singles
    assert sorted(emitted) == sorted(f for f, _ in sized)
    by_name = dict(sized)
    for b in bins:
        assert len(b) >= 2
        # every multi-bin fits the target; the opening (largest) item
        # may exceed it only when it could never fit anywhere, but
        # then nothing else joins that bin, so it is a singleton by
        # construction and never reaches here
        assert sum(by_name[f] for f in b) <= target
    perm = list(reversed(sized))
    bins2, singles2 = _binpack_ffd(perm, target)
    assert bins2 == bins and singles2 == singles
