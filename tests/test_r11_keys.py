"""Planted closed-form tests for the §2.25 round-11 keys.

Expected values come from OUTSIDE the shared Spark/DuckDB formulas
(hand-computed corpora with known keep/drop fates) — the bug class
oracle parity is blind to (round-9 lesson)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pfithic_spark.registry import keys_r11

_KNUTH = 2654435761


def _khash(i: int) -> int:
    return ((i % _KNUTH) * _KNUTH) % 2**32


def _hq_doc(prefix: str, n_pairs: int = 25) -> str:
    """A quality-1.0 document: n_pairs × 'the <prefix>NNNNN' — 2n
    tokens, n stop hits (>= 20%), avg chars/token 5.48 (>= 5)."""
    return " ".join(f"the {prefix}{i:05d}" for i in range(n_pairs))


def test_curation_dag_planted_fates(spark):
    """Every DAG stage drops exactly its planted victim:
    - doc 2: exact duplicate of doc 1 (same md5) -> exact-dedup drop;
    - doc 3: near-dup of doc 1 (3-gram Jaccard ~0.65, same source)
      -> cluster-representative drop (rep = min id = 1);
    - doc 5: two junk tokens -> quality-gate drop (q ~= 0.106 < 0.6);
    - doc 97: probe/benchmark doc (97 % 97 == 0) -> probe drop;
    - doc 6: HIGH-quality doc embedding the probe's 'p1..p5' 5-gram
      -> contamination drop (quality alone would keep it);
    - docs 1, 4 (source s1) and 7, 8 (source s2) survive; the two
      post-filter sources tie at 2 docs each so the sqrt-mixing rate
      is exactly 1.0 and nothing mixes out;
    - packing: 50 tokens/doc << 2048 so every survivor is seq_id 0 in
      shard knuth(id) % 16."""
    a = _hq_doc("w")
    # doc 3 = first 40 tokens of doc 1 + 10 fresh tokens: shares 38 of
    # 48 distinct shingles -> jaccard 38/58 ~ 0.655 >= 0.2
    c_neardup = " ".join(
        a.split(" ")[:40] + [t for i in range(5) for t in ("the", f"z{i:05d}")]
    )
    probe = " ".join(f"p{i}" for i in range(1, 11))
    contaminated = " ".join(
        [t for i in range(22) for t in ("the", f"f{i:02d}")]
        + ["the", "p1", "p2", "p3", "p4", "p5"]
    )
    rows = [
        (1, "s1", "en", a),
        (2, "s1", "en", a),  # exact dup
        (3, "s1", "en", c_neardup),  # near dup of 1
        (4, "s1", "en", _hq_doc("g")),
        (5, "s2", "en", "x y"),  # junk
        (97, "s2", "en", probe),  # probe doc
        (6, "s2", "en", contaminated),
        (7, "s2", "en", _hq_doc("h")),
        (8, "s2", "en", _hq_doc("i")),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    frame, caches = keys_r11.curation_dag_from(d)
    out = {r["doc_id"]: r for r in frame.collect()}
    for c in caches:
        c.unpersist()
    assert sorted(out) == [1, 4, 7, 8]
    for i, src in ((1, "s1"), (4, "s1"), (7, "s2"), (8, "s2")):
        r = out[i]
        assert r["source"] == src and r["lang"] == "en"
        assert r["quality"] == 1.0
        assert r["n_tokens"] == 50
        assert r["shard"] == _khash(i) % 16
        assert r["seq_id"] == 0
    # sanity on the planted near-dup geometry: doc 6 IS high quality
    # (so only contamination can have dropped it)
    n_tok = len(contaminated.split(" "))
    assert n_tok == 50
    stop_hits = sum(1 for t in contaminated.split(" ") if t == "the")
    assert stop_hits * 5 >= n_tok


def test_curation_dag_packing_boundary(spark):
    """Packing seam inside the composition: one source, one shard
    forced (equal hash residues impossible — instead pick ids that
    land in the same shard), token counts chosen so the greedy
    2048-cut splits survivors into two sequences."""
    # find three ids in the same shard with known hash order
    ids = [i for i in range(1, 4000) if _khash(i) % 16 == 0][:3]
    ids.sort(key=lambda i: (_khash(i), i))
    # 1100 tokens/doc: in hash order cum_before = 0, 1100, 2200 —
    # the first two docs START inside sequence 0 (1100 < 2048, a
    # straddling doc belongs where it starts), the third starts at
    # 2200 >= 2048 -> sequence 1.
    def big_doc(tag: str) -> str:
        return " ".join(f"the {tag}{i:05d}" for i in range(550))

    rows = [
        (ids[0], "s", "en", big_doc("a")),
        (ids[1], "s", "en", big_doc("b")),
        (ids[2], "s", "en", big_doc("c")),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    frame, caches = keys_r11.curation_dag_from(d)
    out = {r["doc_id"]: r for r in frame.collect()}
    for c in caches:
        c.unpersist()
    assert sorted(out) == sorted(ids)
    assert [out[i]["seq_id"] for i in ids] == [0, 0, 1]
    assert all(out[i]["n_tokens"] == 1100 for i in ids)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_curation_dag_text_never_shuffles(spark, sf_dir):
    """The composition-level 100 TB invariant (VERDICT r10 #5): no
    shuffle Exchange in the composed plan carries the corpus `text`
    column — only ids, hashes, shingles, and bounded dimensions move.
    (BroadcastExchange of the tiny probe set is sanctioned.)"""
    df, caches = keys_r11.curation_dag_frame(spark, sf_dir)
    p = _plan(df)
    assert "CartesianProduct" not in p
    assert "EvalPythonExec" not in p
    blocks = re.findall(
        r"\(\d+\) Exchange\b.*?\nInput \[\d+\]: \[([^\]]*)\]", p
    )
    assert blocks, "expected at least one shuffle Exchange in the DAG"
    for cols in blocks:
        assert "text#" not in cols, cols
    # release the dataflow's persists (the gate bypasses the key's
    # own drain)
    for c in caches:
        c.unpersist()


def test_curation_dag_atomic_snapshot_roundtrip(spark, sf_dir, queries):
    """The registered key publishes through the atomic sink and reads
    back the committed snapshot: a second invocation in the same
    session reuses the manifest (write-once guard) and returns the
    identical frame."""
    k = queries["q_curation_dag"]
    first = k(spark, sf_dir).collect()
    second = k(spark, sf_dir).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    assert len(first) > 0


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_compaction_plan_planted(spark):
    """Hand census: files (bucket, rows) = (0,10) (1,9) (2,5) (3,3)
    (4,2); total 29, 5 files, mean 5.8.  Below-mean files 5/3/2
    compact; target = 29 // 4 = 7; next-fit in (rows DESC, bucket)
    order: 5 starts at 0 (group 0), 3 at 5 (group 0), 2 at 8
    (group 1).  Expected plan computed by hand, not by the shared
    formula."""
    cen = spark.createDataFrame(
        [(0, 10), (1, 9), (2, 5), (3, 3), (4, 2)],
        "bucket long, n_rows long",
    )
    out = {
        r["bucket"]: (r["n_rows"], r["action"], r["group_id"])
        for r in keys_r11.compaction_plan(cen).collect()
    }
    assert out == {
        0: (10, "keep", None),
        1: (9, "keep", None),
        2: (5, "compact", 0),
        3: (3, "compact", 0),
        4: (2, "compact", 1),
    }


def test_ivf_rebalance_planted_geometry(spark):
    """1-D planted world with centroids at 0 / 100 / 1000:
    - 90 vectors at coords (i-1) % 45 -> cell 0 holds 90% of mass
      (> 3/40 share) -> SPLIT; seed_lo = id 1 (coord 0, the min-id
      tie winner at d2=0), seed_hi = id 45 (coord 44, min-id winner
      at max d2); members with coord <= 22 go subcell 0 (the
      coord-22 tie inclusive), else 1;
    - 6 vectors at coords 100..105 -> cell 1 share 6% (between
      17/320 and 3/40) -> KEEP;
    - 4 vectors at coords 998..1001 -> cell 2 share 4% (< 17/320)
      -> MERGE, every member's nearest non-merge cell is 1.
    All distances and fates computed by hand from the geometry."""
    cents = {0: 0, 1: 100, 2: 1000}
    vecs = (
        [(i, (i - 1) % 45) for i in range(1, 91)]
        + [(90 + j, 99 + j) for j in range(1, 7)]
        + [(96 + j, 997 + j) for j in range(1, 5)]
    )
    q = spark.createDataFrame(
        [
            (vid, c, (x - cx) * (x - cx))
            for vid, x in vecs
            for c, cx in cents.items()
        ],
        "vec_id long, cell long, dist2_micro long",
    )
    qe = spark.createDataFrame(
        [(vid, [x]) for vid, x in vecs],
        "vec_id long, eq array<long>",
    )
    cells = spark.createDataFrame([(c,) for c in cents], "cell long")
    out_df, caches = keys_r11.ivf_rebalance_plan(q, qe, cells)
    rows = out_df.collect()
    for c in caches:
        c.unpersist()
    got = {r["vec_id"]: (r["cell"], r["action"], r["new_cell"], r["subcell"]) for r in rows}
    assert len(got) == 100
    for vid, x in vecs:
        if vid <= 90:
            want_sub = 0 if x <= 22 else 1
            assert got[vid] == (0, "split", 0, want_sub), (vid, x, got[vid])
        elif vid <= 96:
            assert got[vid] == (1, "keep", 1, 0), (vid, got[vid])
        else:
            assert got[vid] == (2, "merge", 1, 0), (vid, got[vid])


def test_psi_incremental_matches_panel(spark, sf_dir, queries):
    """The snapshot-fed twin must reproduce q_psi_source_panel
    row-for-row: both halve the corpus by doc_id parity; the twin
    routes the halves through publish -> time travel -> incremental
    read instead of one scan."""
    a = sorted(
        map(tuple, queries["q_psi_source_panel"](spark, sf_dir).collect())
    )
    b = sorted(
        map(
            tuple,
            queries["q_psi_drift_incremental"](spark, sf_dir).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_packing_efficiency_planted(spark):
    """Hand census: source sA = three 1100-token docs all landing in
    one shard -> seq0 holds two docs (2200 tokens, OVERFULL: the
    straddling doc belongs where it starts), seq1 one doc;
    mean_fill_bp = 33000000 // 4096 = 8056.  Source sB = one 10-token
    doc -> a single under-half sequence at fill 48 bp."""
    ids = [i for i in range(1, 4000) if _khash(i) % 16 == 0][:3]

    def big_doc(tag):
        return " ".join(f"w{tag}{i:05d}" for i in range(1100))

    rows = [(i, "sA", "en", big_doc(str(i))) for i in ids] + [
        (9999, "sB", "en", " ".join(f"t{i}" for i in range(10)))
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    out = {
        r["source"]: (
            r["n_seqs"],
            r["n_docs"],
            r["total_tokens"],
            r["mean_fill_bp"],
            r["n_overfull"],
            r["n_underhalf"],
        )
        for r in keys_r11.packing_efficiency_from(d).collect()
    }
    assert out["sA"] == (2, 3, 3300, 33000000 // 4096, 1, 0)
    assert out["sB"] == (1, 1, 10, 100000 // 2048, 0, 1)


def test_temperature_mixing_planted(spark):
    """Hand panel: sources sBig (4 docs) and sSmall (1 doc) -> x =
    1/4; rates by hand: T=1 -> 0.25, 0.5 -> 0.5, 0.25 -> ~0.7071,
    0.75 -> ~0.35355.  n_kept recomputed in PYTHON from the Knuth
    hashes of the planted ids against floor(rate*1e6)."""
    import math

    big_ids = [11, 22, 33, 44]
    rows = [(i, "sBig", "en", "x") for i in big_ids] + [
        (55, "sSmall", "en", "x")
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    out = {
        (r["source"], r["t_bp"]): (r["n_src"], r["keep_rate"], r["n_kept"])
        for r in keys_r11.temperature_mixing_from(d).collect()
    }
    x = 0.25
    rates = {
        2500: math.sqrt(math.sqrt(x)),
        5000: math.sqrt(x),
        7500: math.sqrt(x) * math.sqrt(math.sqrt(x)),
        10000: x,
    }
    for t, rate in rates.items():
        thr = math.floor(rate * 1_000_000)
        kept = sum(1 for i in big_ids if _khash(i) % 1_000_000 < thr)
        n, kr, nk = out[("sBig", t)]
        assert n == 4 and nk == kept, (t, nk, kept)
        assert abs(kr - round(rate, 9)) < 1e-12
        # the smallest source keeps everything at every temperature
        assert out[("sSmall", t)] == (1, 1.0, 1)


def test_tukey_hsd_planted(spark):
    """Hand ANOVA world: groups A = 4x10, B = 4x20, C = (10,20,10,20).
    Within-SS: 0 + 0 + 100 -> MSW = 100/9; SE(any pair) =
    sqrt(MSW/2 * (1/4 + 1/4)) = 10/6.  q(A,B) = 10/(10/6) = 6 >
    3.858 -> significant; q(A,C) = q(B,C) = 3 -> not."""
    rows = (
        [("A", 10.0)] * 4 + [("B", 20.0)] * 4 + [("C", 10.0), ("C", 20.0)] * 2
    )
    o = spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    )
    out = {
        (r["grp1"], r["grp2"]): (r["mean_diff"], r["q_stat"], r["significant"])
        for r in keys_r11.tukey_hsd_from(o).collect()
    }
    assert out[("A", "B")] == (-10.0, 6.0, True)
    assert out[("A", "C")] == (-5.0, 3.0, False)
    assert out[("B", "C")] == (5.0, 3.0, False)


def test_survival_km_planted(spark):
    """Hand KM world (30-min session gap; censor horizon = one gap
    before the global last event at t = 100 min):
    - u1: events at 0 and 10 min -> one 10-min session ending at 10
      (death);
    - u2: events at 5 min and 60 min -> TWO zero-length sessions
      (55-min gap splits), both deaths;
    - u3: events at 95 and 100 min -> 5-min session ending AT the
      edge -> censored.
    KM: t=0: n=4, d=2 -> S=0.5; t=5: n=2, d=0, c=1 -> S stays 0.5;
    t=10: n=1, d=1 = n -> saturated, S=0 exactly."""
    m = 60_000_000
    rows = [
        (1, 1, 0 * m),
        (2, 1, 10 * m),
        (3, 2, 5 * m),
        (4, 2, 60 * m),
        (5, 3, 95 * m),
        (6, 3, 100 * m),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )
    out = {
        r["dur_minutes"]: (
            r["n_at_risk"],
            r["n_deaths"],
            r["n_censored"],
            r["survival"],
        )
        for r in keys_r11.survival_km_from(ev).collect()
    }
    assert out[0] == (4, 2, 0, 0.5)
    assert out[5] == (2, 0, 1, 0.5)
    assert out[10] == (1, 1, 0, 0.0)
    assert len(out) == 3


def test_minhash_calibration_planted(spark):
    """Signatures recomputed with PYTHON hashlib (the external
    engine): docs 1/2 share tokens {a,b,c} of 5 distinct (true
    Jaccard 0.6); docs 3/4 are identical (true 1.0, all 8 minima
    equal, candidate in every band).  Expected buckets assembled in
    python from the hashlib minima and the (4,2) banding rule."""
    import hashlib as hl

    texts = {1: "a b c d", 2: "a b c e", 3: "q r s", 4: "q r s"}

    def sig(text):
        toks = sorted(set(text.split(" ")))
        return [
            min(hl.md5(f"{w}#{j}".encode()).hexdigest() for w in toks)
            for j in range(1, 9)
        ]

    sigs = {i: sig(t) for i, t in texts.items()}

    def bands(s):
        return {(b, s[2 * b] + s[2 * b + 1]) for b in range(4)}

    exp = {}
    import itertools

    for i, j in itertools.combinations(sorted(texts), 2):
        if bands(sigs[i]) & bands(sigs[j]):
            k = sum(a == b for a, b in zip(sigs[i], sigs[j]))
            ti, tj = set(texts[i].split()), set(texts[j].split())
            true_j = round(len(ti & tj) / len(ti | tj), 9)
            exp.setdefault(k, []).append(true_j)
    want = {
        k: (len(v), round(sum(v) / len(v), 9)) for k, v in exp.items()
    }
    assert want, "planted corpus must produce at least one candidate"
    assert 8 in want and want[8][1] == 1.0  # the identical pair

    d = spark.createDataFrame(
        [(i, "s", "en", t) for i, t in texts.items()],
        "doc_id long, source string, lang string, text string",
    )
    got = {
        r["k_matches"]: (r["n_pairs"], r["mean_true_jaccard"])
        for r in keys_r11.minhash_calibration_from(d).collect()
    }
    assert got == want, (got, want)


def test_vacuum_plan_planted(spark, tmp_path):
    """Hand history: three single-file appends -> seqs 1..3 hold
    1/2/3 files, each added exactly 1; a keep-last-2 vacuum retains
    seqs 2 and 3 only."""
    from pfithic_spark import io as pio

    path = str(tmp_path / "t")
    for i, mode in ((0, "overwrite"), (1, "append"), (2, "append")):
        pio.write_parquet_atomic(
            spark.range(i * 10, i * 10 + 5).coalesce(1), path, mode=mode
        )
    out = sorted(
        map(tuple, keys_r11.vacuum_plan_from(spark, path).collect())
    )
    assert out == [
        (1, 1, 1, False),
        (2, 2, 1, True),
        (3, 3, 1, True),
    ]


def test_vacuum_plan_matches_real_vacuum(spark, tmp_path):
    """The dry-run must agree with what io.vacuum_parquet_atomic
    actually deletes at keep_last_n=2: the non-retained manifests
    disappear, the retained ones survive."""
    import os

    from pfithic_spark import io as pio

    path = str(tmp_path / "t")
    for i, mode in ((0, "overwrite"), (1, "append"), (2, "append")):
        pio.write_parquet_atomic(
            spark.range(i * 10, i * 10 + 5).coalesce(1), path, mode=mode
        )
    plan = {
        r["seq"]: r["retained"]
        for r in keys_r11.vacuum_plan_from(spark, path).collect()
    }
    pio.vacuum_parquet_atomic(path, keep_last_n=2)
    left = {
        int(f.split("-")[1])
        for f in os.listdir(path)
        if f.startswith("manifest-") and f.endswith(".json")
    }
    assert left == {s for s, kept in plan.items() if kept}


def test_minhash_calibration_hot_bucket_cap(spark):
    """LSH_MAX_BUCKET discipline on the calibration key: with
    max_bucket=2, the three identical 'm n o' docs form size-3 band
    buckets in every band and are DROPPED from candidacy (exact-dedup
    territory); the size-2 near pair survives."""
    texts = {
        1: "m n o",
        2: "m n o",
        3: "m n o",
        4: "a b c d",
        5: "a b c e",
    }
    d = spark.createDataFrame(
        [(i, "s", "en", t) for i, t in texts.items()],
        "doc_id long, source string, lang string, text string",
    )
    rows = keys_r11.minhash_calibration_from(d, max_bucket=2).collect()
    pairs = sum(r["n_pairs"] for r in rows)
    # only the (4, 5) pair can appear (true jaccard 0.6); the
    # identical triple contributed zero candidates
    assert pairs <= 1, rows
    for r in rows:
        assert r["mean_true_jaccard"] != 1.0


def test_herfindahl_planted(spark):
    """Hand world: two firms with revenue 0.75 / 0.25 -> HHI =
    0.5625 + 0.0625 = 0.625; normalized = (0.625 - 0.5)/0.5 = 0.25;
    effective N = 1/0.625 = 1.6."""
    li = spark.createDataFrame(
        [(1, 0.75), (2, 0.25)],
        "l_suppkey long, l_extendedprice double",
    )
    from pfithic_spark.registry.keys_r11 import q_herfindahl

    # the key loads <dir>/lineitem.parquet — plant a tiny table there
    import tempfile

    d = tempfile.mkdtemp(prefix="hhi_")
    li.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    row = q_herfindahl(spark, d).collect()[0]
    assert row["n_firms"] == 2
    assert row["hhi"] == 0.625
    assert row["hhi_normalized"] == 0.25
    assert row["effective_n"] == 1.6


def test_psi_incremental_repairs_torn_history(spark, sf_dir, queries):
    """ADVICE r11 #1: a crash between the base overwrite and the
    delta append leaves ONE committed manifest; a same-session retry
    must not silently read an empty delta — it re-publishes both
    halves and the panel still matches q_psi_source_panel."""
    import hashlib
    import os
    import shutil
    import tempfile

    from pfithic_spark import io as pio

    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pfithic_psi_inc_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )
    # plant the torn state: base half committed, delta append crashed
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") % 2 == 0), path, mode="overwrite"
    )
    assert len(pio.list_manifests(path)) == 1
    got = sorted(
        map(
            tuple,
            queries["q_psi_drift_incremental"](spark, sf_dir).collect(),
        )
    )
    want = sorted(
        map(tuple, queries["q_psi_source_panel"](spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0
    # the repair re-published: >= 3 manifests, base anchored at [-2]
    assert len(pio.list_manifests(path)) >= 3


def test_bucketed_sink_rebuilds_on_torn_layout(spark, sf_dir):
    """ADVICE r11 #2: a crash mid-way through the 8 appends leaves a
    partial manifest history; the helper must refuse to census it —
    it rebuilds under a fresh retry tag, and the vacuum census over
    the returned path sees exactly the planted 8-commit layout."""
    import hashlib
    import os
    import shutil
    import tempfile

    from pfithic_spark import io as pio
    from pfithic_spark import llmops

    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    base_path = os.path.join(
        tempfile.gettempdir(), f"pfithic_compact_{tag}"
    )
    shutil.rmtree(base_path, ignore_errors=True)
    for n in range(1, 64):
        shutil.rmtree(f"{base_path}_retry{n}", ignore_errors=True)
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            (llmops.knuth_hash("doc_id") % 8).cast("long").alias("bucket"),
        )
    )
    # plant the torn state: only 2 of the 8 appends committed
    for b in range(2):
        pio.write_parquet_atomic(
            d.filter(F.col("bucket") == b).coalesce(1),
            base_path,
            mode="overwrite" if b == 0 else "append",
            stats_cols=["bucket"],
        )
    got = keys_r11._ensure_bucketed_sink_table(spark, sf_dir)
    assert got == f"{base_path}_retry1"
    assert len(pio.list_manifests(got)) == 8
    # idempotent: a second call reuses the committed rebuild
    assert keys_r11._ensure_bucketed_sink_table(spark, sf_dir) == got
    # the torn base layout was left untouched, never censused
    assert len(pio.list_manifests(base_path)) == 2


def test_compaction_plan_scalable_spine(spark):
    """VERDICT r11 #5: above the _CENSUS_SMALL routing bound the
    next-fit packing must ride the two-phase value-bucketed spine —
    value-identical to the single-window form, with every window
    keyed on the bucketing pid (no unpartitioned window over the
    file-census data grain)."""
    import random

    rng = random.Random(7)
    rows = [(b, rng.randrange(1, 500)) for b in range(300)]
    cen = spark.createDataFrame(rows, "bucket long, n_rows long")
    small = sorted(
        map(tuple, keys_r11.compaction_plan(cen).collect())
    )
    big = sorted(
        map(
            tuple,
            keys_r11.compaction_plan(cen, small_threshold=10).collect(),
        )
    )
    assert small == big and len(small) == 300

    df = keys_r11.compaction_plan(cen, small_threshold=10)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    heads = re.findall(r"windowspecdefinition\((\w+)#", p)
    assert heads and all(h == "_pid" for h in heads), heads
