"""Force-exercise the scale-critical primitives on inputs large enough
that only the scalable form survives.

The per-round bench (bench.py) runs the registry queries, whose
bounded-cardinality inputs route through the small-side fast paths; this
tool drives the primitives on synthetic tables (default 8M rows) where
the scalable path is the only viable one — and cross-checks a closed
form / planted ground truth so the numbers are correctness-gated, not
just timed:

- windows.scalable_cumsum / windows.bh_fdr_scalable (two-phase global
  order, no single-task window);
- llmops.ngram_jaccard_pairs with max_df on a corpus where EVERY
  document shares one boilerplate shingle (df = n): without the hot-
  shingle cap the inverted-index self-join would generate ~n² candidate
  pairs; with it, exactly the planted n/2 near-dup pairs survive —
  empirical proof the skew lever bounds the join;
- llmops.pack_sequences on one giant single-source corpus: the
  (group, shard) hash sharding keeps the running-total window
  parallel (a single source must never serialize onto one task), with
  token conservation + bin-bound invariants asserted.

    python tools/bench_scalable.py [n_rows] [cpus]

Prints one JSON line: {"n": ..., "cumsum_s": ..., "bh_s": ...,
"bh_single_window_s": ..., "ngram_maxdf_s": ..., "pack_s": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pfithic_spark import windows as win  # noqa: E402
from pfithic_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    )
    spark = get_spark(app="bench-scalable", cpus=cpus)

    df = spark.range(n).select(
        F.col("id").alias("d"), ((F.col("id") * 37) % 97 + 1).alias("cc")
    )

    t0 = time.time()
    cum = win.scalable_cumsum(df, "d", "cc", "run", small_threshold=None)
    # force full evaluation + correctness: the global total must match
    # the closed form, and a probed key must match the prefix sum
    total = cum.agg(F.max("run")).collect()[0][0]
    cumsum_s = time.time() - t0
    i = np.arange(n, dtype=np.int64)
    cs = np.cumsum((i * 37) % 97 + 1)
    assert total == int(cs[-1]), (total, int(cs[-1]))

    scored = df.withColumn(
        "p_value", ((F.col("d") * 7919) % 1000003).cast("double") / 1000003.0
    )
    t0 = time.time()
    bh = win.bh_fdr_scalable(scored, "p_value", m=n, tiebreak=["d"])
    # q in [0,1] everywhere; full pass forced by the global agg
    qmin, qmax = bh.agg(F.min("q_value"), F.max("q_value")).collect()[0]
    bh_s = time.time() - t0
    assert 0.0 <= qmin <= qmax <= 1.0, (qmin, qmax)

    # the single-window form at the same scale, for the honest ratio
    t0 = time.time()
    bh1 = win.bh_fdr(scored, "p_value", m=n, tiebreak=["d"], n_rows=n)
    bh1.agg(F.min("q_value"), F.max("q_value")).collect()
    bh_single_s = time.time() - t0

    # --- ngram_jaccard_pairs + max_df: hot-shingle skew lever --------
    from pfithic_spark import llmops

    half = n // 2
    # every doc: 5-word boilerplate prefix (k=3 shingles with df = n)
    # + a 5-word unique tail derived from id % half, so docs i and
    # i + half are exact near-dups — the ONLY legitimate pairs
    u = (F.col("id") % half).cast("long")
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("terms of service apply here"),
            F.concat(F.lit("ua"), u),
            F.concat(F.lit("ub"), (u * 31) % 999983),
            F.concat(F.lit("uc"), (u * 57) % 999979),
            F.concat(F.lit("ud"), (u * 91) % 999961),
            F.concat(F.lit("ue"), (u * 17) % 999959),
        ).alias("text"),
    )
    t0 = time.time()
    pairs = llmops.ngram_jaccard_pairs(
        docs, k=3, block_col=None, max_df=100
    )
    n_pairs, dmin, dmax, jmin = pairs.agg(
        F.count(F.lit(1)),
        F.min(F.col("id2") - F.col("id1")),
        F.max(F.col("id2") - F.col("id1")),
        F.min("jaccard"),
    ).collect()[0]
    ngram_s = time.time() - t0
    # exactly the planted pairs: (i, i + half) for every i < half —
    # without max_df the boilerplate shingles alone would contribute
    # ~n²/2 candidate pairs and this agg would never finish at 8M
    assert n_pairs == half, (n_pairs, half)
    assert dmin == half and dmax == half, (dmin, dmax, half)
    # closed-form jaccard: 8 shingles per doc, the 3 boilerplate-only
    # ones pruned by max_df, denominators keep full sizes → 5/11
    assert jmin is not None and abs(jmin - 5.0 / 11.0) < 1e-6, jmin

    # --- pack_sequences: one giant source, hash-sharded packing ------
    # worst-case mixture: EVERY doc in the same source group; the
    # (group, shard) sharding is what keeps the cumsum window parallel
    pdocs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("web").alias("source"),
        F.concat(
            F.lit("w"),
            F.repeat(F.lit(" w"), (F.col("id") % 50).cast("int")),
        ).alias("text"),
    )
    t0 = time.time()
    packed = llmops.pack_sequences(
        pdocs, target_tokens=2048, n_shards=64
    )
    n_seq, tot, mx = packed.agg(
        F.count(F.lit(1)), F.sum("total_tokens"), F.max("total_tokens")
    ).collect()[0]
    pack_s = time.time() - t0
    # token conservation: Σ(1 + i % 50) in closed form
    cycles, rem = divmod(n, 50)
    want_tot = cycles * (50 * 51 // 2) + rem * (rem + 1) // 2
    assert tot == want_tot, (tot, want_tot)
    # greedy boundary rule: a sequence holds at most target + (max doc
    # tokens − 1) tokens; and the shard fan-out actually packed (no
    # single degenerate sequence)
    assert mx <= 2048 + 49, mx
    assert n_seq >= want_tot // (2048 + 49), n_seq

    # --- connected components: diameter-bounded label propagation ----
    # planted ground truth: n/4 disjoint 4-node CHAINS (diameter 3
    # forces multiple propagation rounds); every node's component id
    # must come back as the chain head, cluster_size as 4
    n_cc = n // 2  # vertices (keep runtime bounded: rounds × joins)
    verts = spark.range(n_cc).select(F.col("id").alias("doc_id"))
    chain_edges = (
        spark.range(n_cc)
        .filter(F.col("id") % 4 != 3)  # no edge out of a chain tail
        .select(F.col("id").alias("id1"), (F.col("id") + 1).alias("id2"))
    )
    t0 = time.time()
    # force the DISTRIBUTED loop (the small-side fast path would
    # otherwise absorb this graph): that's the path being pinned here
    cc = llmops.connected_components(chain_edges, verts, small_threshold=None)
    n_rows, n_clusters, bad = cc.agg(
        F.count(F.lit(1)),
        F.countDistinct("cluster_id"),
        F.sum(
            (
                (F.col("cluster_id") != (F.col("doc_id") - F.col("doc_id") % 4))
                | (F.col("cluster_size") != 4)
            ).cast("long")
        ),
    ).collect()[0]
    cc_s = time.time() - t0
    assert n_rows == n_cc and n_clusters == n_cc // 4 and bad == 0, (
        n_rows,
        n_clusters,
        bad,
    )

    # --- PageRank: partitioned-join iteration path -------------------
    # planted ground truth: a 4-regular ring (edges to i±1, i±2 mod n)
    # is degree-uniform, so the INTEGER-mass update has an exact fixed
    # point — share = 1e9 DIV 4 (exact), received = 4·share = 1e9,
    # new rank = 150e6 + (85·1e9) DIV 100 = 1e9.  Every rank must come
    # back EXACTLY 1_000_000_000 after every iteration, on the
    # partitioned-shuffle path (no node-state broadcast) the registry
    # key reserves for graphs past its 5M-node broadcast threshold.
    n_pr = n // 4  # nodes → n edges total
    offs = F.array(F.lit(-2), F.lit(-1), F.lit(1), F.lit(2))
    pr_edges = (
        spark.range(n_pr)
        .select(F.col("id").alias("src"), F.explode(offs).alias("o"))
        .select(
            "src",
            ((F.col("src") + F.col("o") + n_pr) % n_pr).alias("dst"),
        )
        .repartition("src")
        .persist()
    )
    deg = pr_edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).persist()
    t0 = time.time()
    ranks = deg.select("node", F.lit(1_000_000_000).alias("rank"), "outdeg")
    for _ in range(3):
        shares = ranks.select("node", F.expr("rank DIV outdeg").alias("share"))
        contrib = (
            pr_edges.join(shares, pr_edges.src == shares.node)
            .groupBy(pr_edges.dst.alias("node"))
            .agg(
                (F.lit(150_000_000) + F.expr("(85 * SUM(share)) DIV 100")).alias(
                    "rank"
                )
            )
        )
        ranks = contrib.join(deg, "node").select("node", "rank", "outdeg")
    n_pr_rows, mn, mx = ranks.agg(
        F.count(F.lit(1)), F.min("rank"), F.max("rank")
    ).collect()[0]
    pagerank_s = time.time() - t0
    assert n_pr_rows == n_pr and mn == mx == 1_000_000_000, (n_pr_rows, mn, mx)

    # --- salted join under a genuinely hot key -----------------------
    # planted skew: HALF the fact rows carry user_id=1; the rest spread
    # over 100k users.  The salted rewrite (fact salt = pmod(id, 8),
    # dim exploded ×8, join on (key, salt)) must return bit-identical
    # per-segment counts to the plain shuffle join AND to the numpy
    # closed form — proving the salt is a pure physical rewrite while
    # timing both shapes at scale.
    n_users = 100_000
    hot_cut = n // 2
    fact = spark.range(n).select(
        F.when(F.col("id") < hot_cut, F.lit(1))
        .otherwise(F.col("id") % n_users)
        .alias("user_id")
    )
    dim = spark.range(n_users).select(
        F.col("id").alias("c_custkey"), (F.col("id") % 5).alias("seg")
    )
    t0 = time.time()
    plain = {
        r["seg"]: r["cnt"]
        for r in fact.hint("shuffle_hash")
        .join(dim.hint("shuffle_hash"), fact.user_id == dim.c_custkey)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    plain_join_s = time.time() - t0
    salted_fact = spark.range(n).select(
        F.when(F.col("id") < hot_cut, F.lit(1))
        .otherwise(F.col("id") % n_users)
        .alias("user_id"),
        F.pmod(F.col("id"), F.lit(8)).cast("int").alias("salt"),
    )
    salted_dim = dim.select(
        "c_custkey",
        "seg",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("int"))
    t0 = time.time()
    salted = {
        r["seg"]: r["cnt"]
        for r in salted_fact.hint("shuffle_hash")
        .join(
            salted_dim.hint("shuffle_hash"),
            (salted_fact.user_id == salted_dim.c_custkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    salted_join_s = time.time() - t0
    cold = np.arange(hot_cut, n, dtype=np.int64) % n_users
    segs = np.concatenate([np.full(hot_cut, 1, dtype=np.int64), cold]) % 5
    want = {int(s): int(c) for s, c in zip(*np.unique(segs, return_counts=True))}
    assert plain == want and salted == want, (plain, salted, want)

    # --- profile columns: exact vs sketch distinct counts ------------
    # the q_profile_columns shape (single scan, one agg) on 8M rows
    # with closed-form cardinalities: exact COUNT(DISTINCT)s pay a ×K
    # Expand; approx_count_distinct is the documented at-scale knob —
    # both gated (exact == closed form; sketch within 5%).
    prof = spark.range(n).select(
        (F.col("id") % 1_000_003).alias("a"),
        ((F.col("id") * 7919) % 97).alias("b"),
        F.col("id").alias("c"),
    )
    t0 = time.time()
    ex = prof.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("a").alias("da"),
        F.countDistinct("b").alias("db"),
        F.countDistinct("c").alias("dc"),
        F.min("a").alias("mna"),
        F.max("a").alias("mxa"),
    ).collect()[0]
    profile_exact_s = time.time() - t0
    want_da = min(n, 1_000_003)
    # b = (id·7919) mod 97: 7919 coprime to 97 → full residue cycle
    want_db = min(n, 97)
    assert (ex["n_rows"], ex["da"], ex["db"], ex["dc"]) == (n, want_da, want_db, n)
    assert ex["mna"] == 0 and ex["mxa"] == min(n, 1_000_003) - 1
    t0 = time.time()
    ap = prof.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("a").alias("da"),
        F.approx_count_distinct("b").alias("db"),
        F.approx_count_distinct("c").alias("dc"),
        F.min("a").alias("mna"),
        F.max("a").alias("mxa"),
    ).collect()[0]
    profile_approx_s = time.time() - t0
    # default HLL++ rsd is 0.05 (one sigma) — gate at 2 sigma, same
    # envelope as the q_agg_approx golden certification
    for got, exact in ((ap["da"], want_da), (ap["db"], want_db), (ap["dc"], n)):
        assert abs(got - exact) <= 0.10 * exact, (got, exact)

    # ---- z-order + manifest stats pruning at scale -------------------
    # grid closed form: u = id % U (user), t = id / U (time step) →
    # a [100,199]² needle selects exactly 100×100 rows.  The Morton
    # layout must keep BOTH envelopes tight → most files skip, and the
    # pruned read must return the exact closed-form count.
    import shutil
    import tempfile

    from pfithic_spark.io import (
        atomic_snapshot_files,
        read_parquet_atomic,
        write_parquet_atomic,
    )

    U = 10_000
    zdf = spark.range(n).select(
        (F.col("id") % U).alias("u"),
        (F.col("id") / U).cast("bigint").alias("t"),
        F.col("id").alias("payload"),
    )
    zpath = tempfile.mkdtemp(prefix="zorder_bench_")
    try:
        t0 = time.time()
        write_parquet_atomic(
            zdf,
            zpath,
            mode="overwrite",
            zorder_by=["u", "t"],
            zorder_files=64,
            stats_cols=["u", "t"],
        )
        zorder_write_s = time.time() - t0
        pred = {"u": (100, 199), "t": (100, 199)}
        cond = (
            (F.col("u") >= 100) & (F.col("u") <= 199)
            & (F.col("t") >= 100) & (F.col("t") <= 199)
        )
        kept, skipped = atomic_snapshot_files(zpath, predicate=pred)
        assert skipped >= 48, (len(kept), skipped)  # ≥75% of 64 skip
        t0 = time.time()
        got = read_parquet_atomic(spark, zpath, predicate=pred).filter(
            cond
        ).count()
        zorder_pruned_read_s = time.time() - t0
        if n // U >= 200:  # needle fully inside the grid
            assert got == 100 * 100, got
        t0 = time.time()
        full = read_parquet_atomic(spark, zpath).filter(cond).count()
        zorder_full_read_s = time.time() - t0
        assert full == got, (full, got)
    finally:
        shutil.rmtree(zpath, ignore_errors=True)

    # ---- sessionize at scale (per-user windows, closed form) ---------
    # per user: k = n/NU events; the gap BEFORE event i is 40 min when
    # i%3==0 else 10 min → cumulative us = (10·i + 30·(i div 3)) min;
    # a >30-min threshold starts a session at i=0 and every i%3==0 →
    # sessions/user = 1 + floor((k-1)/3), exactly.
    from pyspark.sql import Window as W

    NU = 50_000
    k = n // NU
    MIN_US = 60_000_000
    ev = spark.range(NU * k).select(
        (F.col("id") % NU).alias("user_id"),
        (F.col("id") / NU).cast("bigint").alias("i"),
    ).select(
        "user_id",
        F.col("i").alias("event_id"),
        (
            (10 * F.col("i") + 30 * F.floor(F.col("i") / 3)) * MIN_US
        ).alias("us"),
    )
    gap_us = 30 * MIN_US
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us", 1).over(w)
    t0 = time.time()
    sess = (
        ev.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0),
        )
        .withColumn(
            "sess",
            F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    agg = sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    ).collect()[0]
    sessionize_s = time.time() - t0
    want_sessions = NU * (1 + (k - 1) // 3)
    assert agg["n_sessions"] == want_sessions, (
        agg["n_sessions"],
        want_sessions,
    )
    assert agg["n_events"] == NU * k

    # ---- PCA sufficient-stats covariance at scale --------------------
    # 8 M synthetic 16-dim vectors; gates close the loop without any
    # driver-side materialization of the data: (a) cov symmetric with
    # positive diagonal, (b) trace(cov) equals the per-dim variances
    # computed by an INDEPENDENT decimal aggregation, (c) the variance
    # of the pc1 projection (distributed, decimal-exact) equals the top
    # Jacobi eigenvalue.
    from pfithic_spark import llmops as llm
    from pfithic_spark import stats as stx

    D_PCA = 16
    emb8 = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    ((F.col("id") * (2 * i + 3)) % 1009).cast("double")
                    / 1009.0
                )
                for i in range(D_PCA)
            ]
        ).alias("embedding"),
    )
    t0 = time.time()
    mean8, cov8, n8 = llm.pca_moments(emb8)
    ev8, evec8 = stx.jacobi_eigh(cov8)
    pca_moments_s = time.time() - t0
    assert n8 == n
    for i in range(D_PCA):
        assert cov8[i][i] > 0
        for j in range(D_PCA):
            assert cov8[i][j] == cov8[j][i]
    # independent variance check per dim (decimal-exact second pass)
    t0 = time.time()
    var_rows = (
        emb8.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(
            F.sum(
                F.round(F.col("x") * F.col("x"), 9).cast("decimal(28,9)")
            ).alias("sxx"),
            F.sum(F.round(F.col("x"), 9).cast("decimal(28,9)")).alias("sx"),
        )
        .collect()
    )
    trace_indep = 0.0
    for r in var_rows:
        m = float(r["sx"]) / n
        trace_indep += (float(r["sxx"]) - n * m * m) / (n - 1)
    trace_cov = sum(cov8[i][i] for i in range(D_PCA))
    assert abs(trace_cov - trace_indep) / trace_indep < 1e-6, (
        trace_cov,
        trace_indep,
    )
    # variance along pc1 == top eigenvalue (distributed projection)
    proj = llm.pca_project(emb8, mean8, evec8[:1])
    stats_row = proj.agg(
        F.sum(
            F.round(F.col("pc1") * F.col("pc1"), 9).cast("decimal(38,9)")
        ).alias("spp"),
        F.sum(F.round(F.col("pc1"), 9).cast("decimal(38,9)")).alias("sp"),
    ).collect()[0]
    mp = float(stats_row["sp"]) / n
    var_pc1 = (float(stats_row["spp"]) - n * mp * mp) / (n - 1)
    pca_total_s = time.time() - t0 + pca_moments_s
    assert abs(var_pc1 - ev8[0]) / ev8[0] < 1e-4, (var_pc1, ev8[0])

    # ---- distributed BFS frontier loop (planted ring) ----------------
    # ring of n/4 nodes: BFS from node 0 to depth 6 must see levels
    # 1,2,2,2,2,2,2 — forces the frontier join + anti-join machinery
    # (the registry key's driver fast path is bypassed: adjacency here
    # is built directly, no probe)
    from pyspark.sql import functions as FF

    n_ring = n // 4
    ring = spark.range(n_ring).select(
        F.col("id").alias("a"),
        ((F.col("id") + 1) % n_ring).alias("b"),
    )
    sym = ring.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(
        ring.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).persist()
    sym.count()
    t0 = time.time()
    visited = spark.createDataFrame([(0, 0)], "v long, dist long").localCheckpoint(
        eager=True
    )
    frontier = visited
    for depth in range(1, 7):
        nxt = (
            frontier.join(sym, frontier.v == sym.u)
            .select(sym.v.alias("v"))
            .distinct()
            .join(visited.select("v"), "v", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    levels = {
        r["dist"]: r["n"]
        for r in visited.groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    bfs_s = time.time() - t0
    sym.unpersist()
    assert levels == {0: 1, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2}, levels

    # ---- exact heavy hitters at scale (planted hot tokens) -----------
    # 8 M-token stream: token 'hot<k>' for k in 0..3 each occupies 5%
    # (> φ=2%), the long tail is unique-ish ids below threshold; the
    # two-pass (MG candidates → broadcast exact count) must return
    # EXACTLY the four planted hitters with exact counts.
    import pandas as pd

    hot_share = n // 20  # 5% each
    toks = spark.range(n).select(
        F.when(F.col("id") % 20 < 4, F.concat(F.lit("hot"), (F.col("id") % 20)))
        .otherwise(F.concat(F.lit("t"), (F.col("id") / 7).cast("bigint")))
        .alias("w")
    )
    phi = 0.02
    k_mg = int(2.0 / phi)
    t0 = time.time()

    def candidates(batches):
        for pdf in batches:
            vc = pdf["w"].value_counts()
            keep = vc[vc > len(pdf) / k_mg]
            yield pd.DataFrame(
                {
                    "w": list(keep.index) + [None],
                    "cnt": [0] * len(keep) + [len(pdf)],
                }
            )

    pass1 = (
        toks.mapInPandas(candidates, schema="w string, cnt long")
        .groupBy("w")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    cand = [r["w"] for r in pass1 if r["w"] is not None]
    n_total = sum(r["cnt"] for r in pass1 if r["w"] is None)
    cand_df = spark.createDataFrame([(w,) for w in cand], "w string")
    hits = {
        r["w"]: r["cnt"]
        for r in toks.join(FF.broadcast(cand_df), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > phi * n_total)
        .collect()
    }
    hh_s = time.time() - t0
    assert n_total == n
    assert hits == {f"hot{k}": hot_share for k in range(4)}, hits

    # ---- Poisson-bootstrap sufficient-stats kernel at scale ----------
    # synthetic prices with a closed-form exact mean; gates: the point
    # estimate equals the closed form exactly, every replicate's
    # effective n is within 5σ of Poisson(1)·n, and the CI brackets
    # the point estimate.
    from pfithic_spark import registry as reg

    boot_src = spark.range(n).select(
        (F.col("id") + 1).alias("l_orderkey"),
        F.lit(1).alias("l_linenumber"),
        ((F.col("id") % 1000).cast("double") / 10.0).alias(
            "l_extendedprice"
        ),
    )
    boot_dir = tempfile.mkdtemp(prefix="boot_bench_")
    try:
        boot_src.write.mode("overwrite").parquet(
            os.path.join(boot_dir, "lineitem.parquet")
        )
        t0 = time.time()  # q_bootstrap_ci reads only lineitem
        row = reg.QUERIES["q_bootstrap_ci"](spark, boot_dir).collect()[0]
        bootstrap_s = time.time() - t0
        # closed form: mean of (id % 1000)/10 over n divisible by 1000
        want_mean = round(sum(range(1000)) / 1000 / 10, 6)
        assert row["point_mean"] == want_mean, (row["point_mean"], want_mean)
        assert row["ci_lo"] <= want_mean <= row["ci_hi"], row
        assert row["n_replicates"] == 32
    finally:
        shutil.rmtree(boot_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "n": n,
                "cumsum_s": round(cumsum_s, 2),
                "bh_s": round(bh_s, 2),
                "bh_single_window_s": round(bh_single_s, 2),
                "ngram_maxdf_s": round(ngram_s, 2),
                "pack_s": round(pack_s, 2),
                "cc_s": round(cc_s, 2),
                "pagerank_s": round(pagerank_s, 2),
                "plain_join_s": round(plain_join_s, 2),
                "salted_join_s": round(salted_join_s, 2),
                "profile_exact_s": round(profile_exact_s, 2),
                "profile_approx_s": round(profile_approx_s, 2),
                "zorder_write_s": round(zorder_write_s, 2),
                "zorder_pruned_read_s": round(zorder_pruned_read_s, 2),
                "zorder_full_read_s": round(zorder_full_read_s, 2),
                "zorder_files_skipped": skipped,
                "sessionize_s": round(sessionize_s, 2),
                "pca_moments_s": round(pca_moments_s, 2),
                "pca_total_s": round(pca_total_s, 2),
                "bfs_s": round(bfs_s, 2),
                "heavy_hitters_s": round(hh_s, 2),
                "bootstrap_s": round(bootstrap_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
