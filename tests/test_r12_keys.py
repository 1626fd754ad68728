"""Planted closed-form tests for the §2.26 round-12 keys.

Expected values come from OUTSIDE the shared Spark/DuckDB formulas
(hand-built tables and hand-computed checksums) — the bug class
oracle parity is blind to (round-9 lesson)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pfithic_spark import io as pio
from pfithic_spark.registry import keys_r12

_KNUTH = 2654435761


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def _khash(i: int) -> int:
    return ((i % _KNUTH) * _KNUTH) % 2**32


def test_execute_lifecycle_planted(spark, tmp_path):
    """Hand table: 3 one-bucket appends (ids 1-2 / 3 / 4-5-6) →
    compact to 1 file → vacuum keep-last-2 must expire exactly
    (3 + 1) − 2 = 2 snapshots and remove 0 data files (the retained
    pre-compact snapshot references every original file); the final
    census must carry the hand-computed Knuth id_sums; time travel
    to the pre-compact seq must survive the whole apply."""
    path = str(tmp_path / "t")
    groups = {0: [1, 2], 1: [3], 2: [4, 5, 6]}
    for b, ids in groups.items():
        df = spark.createDataFrame(
            [(i, b) for i in ids], "doc_id long, bucket long"
        ).coalesce(1)
        pio.write_parquet_atomic(
            df, path, mode="overwrite" if b == 0 else "append"
        )
    stats = keys_r12._execute_lifecycle(spark, path)
    assert stats == {
        "snapshots_expired": 2,
        "files_removed": 0,
        "files_after": 1,
    }
    got = {
        r["bucket"]: (r["n_rows"], r["id_sum"])
        for r in keys_r12._bucket_census(
            pio.read_parquet_atomic(spark, path)
        ).collect()
    }
    want = {
        b: (len(ids), sum(_khash(i) for i in ids))
        for b, ids in groups.items()
    }
    assert got == want
    # exactly keep-last-2 manifests remain; newest is the compact
    assert len(pio.list_manifests(path)) == 2


def test_execute_lifecycle_raises_on_drifted_rewrite(
    spark, tmp_path, monkeypatch
):
    """A compaction that silently loses rows must FAIL the apply, not
    publish a certified census."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "doc_id long, bucket long"
    ).coalesce(1)
    pio.write_parquet_atomic(df, path, mode="overwrite")
    pio.write_parquet_atomic(
        spark.createDataFrame([(9, 2)], "doc_id long, bucket long"),
        path,
        mode="append",
    )

    real = pio.compact_parquet_atomic

    def lossy(spark_, p, target_files=1):
        # drop a row during the "rewrite" then publish
        d = pio.read_parquet_atomic(spark_, p).filter(F.col("doc_id") != 2)
        return pio.write_parquet_atomic(
            d.coalesce(target_files), p, mode="overwrite"
        )

    monkeypatch.setattr(pio, "compact_parquet_atomic", lossy)
    with pytest.raises(ValueError, match="census drifted"):
        keys_r12._execute_lifecycle(spark, path)
    monkeypatch.setattr(pio, "compact_parquet_atomic", real)


def test_compaction_apply_idempotent(spark, sf_dir, queries):
    """bench best-of-2: the second invocation must reuse the applied
    table via the terminal marker, byte-identical output."""
    a = sorted(map(tuple, queries["q_compaction_apply"](spark, sf_dir).collect()))
    b = sorted(map(tuple, queries["q_compaction_apply"](spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_ivf_rebalance_apply_census_conserves(spark, sf_dir, queries):
    """The applied relayout must conserve mass: census total ==
    |embeddings|, and the census must equal a direct GROUP BY over
    the (lazy) plan — the committed artifact IS the plan."""
    cen = queries["q_ivf_rebalance_apply"](spark, sf_dir).collect()
    total = sum(r["n_vecs"] for r in cen)
    n_vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert total == n_vecs
    from pfithic_spark.registry import keys_r11
    from pfithic_spark.registry.keys_r10 import ivf_distance_table
    from pfithic_spark.registry._core import _GOLDEN_DIR

    q = ivf_distance_table(spark, sf_dir)
    qe = keys_r11._quantized_embeddings(spark, sf_dir)
    cells = (
        spark.read.parquet(f"{_GOLDEN_DIR}/ivf_centroids.parquet")
        .select("cell")
        .distinct()
    )
    plan, caches = keys_r11.ivf_rebalance_plan(q, qe, cells)
    want = sorted(
        map(
            tuple,
            plan.groupBy("new_cell", "subcell")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
            .collect(),
        )
    )
    for c in caches:
        c.unpersist()
    assert sorted(map(tuple, cen)) == want


def test_drift_panel_streamed_matches_batch(spark, sf_dir, queries):
    """Stream-state equivalence: the panel folded from the streamed
    per-epoch count partials must equal the one-scan batch panel
    row-for-row, and the count table must show the four planted
    arrival epochs."""
    import hashlib
    import os
    import tempfile

    got = sorted(
        map(tuple, queries["q_drift_panel_streamed"](spark, sf_dir).collect())
    )
    want = sorted(
        map(tuple, queries["q_psi_source_panel"](spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0
    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    counts = os.path.join(
        tempfile.gettempdir(), f"pfithic_driftstream_{tag}", "counts"
    )
    eps = spark.read.parquet(counts).select("epoch").distinct().count()
    assert eps == 4


def _hq_doc(prefix: str, n_pairs: int = 25) -> str:
    """A quality-1.0 document: n_pairs x 'the <prefix>NNNNN' — 2n
    tokens, n stop hits (>= 20%), avg chars/token >= 5."""
    return " ".join(f"the {prefix}{i:05d}" for i in range(n_pairs))


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_curation_incremental_planted_fates(spark, tmp_path, queries):
    """Every stage drops exactly its planted victim, on BOTH sides of
    the base/delta split (max id 1000 → T = 900):
    base: 10 kept; 20 exact-dup of 10 → drop; 30 near-dup of 10 →
    drop; 50 junk → drop; 97 probe (has the 'p1..p5' 5-gram) → drop;
    delta: 910 kept; 920 exact-dup of BASE 10 → drop via the hash
    index; 930 near-dup of BASE 10 → drop via the inverted index;
    940 near-dup of (already-dropped) DELTA 930 → drop (the
    no-earlier-near-dup rule counts every earlier doc, kept or not);
    950 high-quality but embeds the frozen probe's 5-gram → drop;
    960 junk → drop; 970 % 97 == 0 → drop; 1000 kept.
    The result must ALSO equal the batch twin on the full corpus."""
    from pfithic_spark.registry import keys_r12

    a = _hq_doc("a")
    near = " ".join(a.split(" ")[:-4] + ["zq1", "zq2", "zq3", "zq4"])
    probe_text = _hq_doc("pp", 10) + " p1 p2 p3 p4 p5"
    rows = [
        (10, "s1", "en", a),
        (20, "s1", "en", a),
        (30, "s1", "en", near),
        (50, "s1", "en", "x y"),
        (97, "s1", "en", probe_text),
        (910, "s1", "en", _hq_doc("b")),
        (920, "s1", "en", a),
        (930, "s1", "en", near),
        (940, "s1", "en", " ".join(near.split(" ")[:-2] + ["zr8", "zr9"])),
        (950, "s1", "en", _hq_doc("c", 10) + " p1 p2 p3 p4 p5"),
        (960, "s1", "en", "u v"),
        (970, "s1", "en", _hq_doc("d")),
        (1000, "s1", "en", _hq_doc("e")),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = queries["q_curation_incremental"](spark, sf).collect()
    assert sorted(r["doc_id"] for r in got) == [10, 910, 1000]
    d = spark.read.parquet(f"{sf}/documents.parquet")
    want = keys_r12.curation_incr_batch_from(d, 900).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_curation_incremental_pack_continuation(spark, tmp_path, queries):
    """The delta pack must CONTINUE the committed base pack state
    exactly: two 1000-token base docs fill a (source, shard) group to
    cum 2000; the first 100-token delta doc still starts in seq 0
    (2000 < 2048), the second crosses into seq 1 — identical to the
    batch window over the union."""
    from pfithic_spark.registry import keys_r12

    same_shard = [i for i in range(2, 3000) if _khash(i) % 16 == 7]
    base_ids = [i for i in same_shard if i <= 900][:2]
    delta_ids = [i for i in same_shard if i > 900][:2]
    assert len(base_ids) == 2 and len(delta_ids) == 2
    rows = [
        (base_ids[0], "s1", "en", _hq_doc("a", 500)),
        (base_ids[1], "s1", "en", _hq_doc("b", 500)),
        (delta_ids[0], "s1", "en", _hq_doc("c", 50)),
        (delta_ids[1], "s1", "en", _hq_doc("d", 50)),
        (1000, "s1", "en", _hq_doc("e")),  # pins max id → T = 900
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"])
        for r in queries["q_curation_incremental"](spark, sf).collect()
    }
    assert got[base_ids[0]] == (7, 0)
    assert got[base_ids[1]] == (7, 0)
    assert got[delta_ids[0]] == (7, 0)  # cum_before 2000 < 2048
    assert got[delta_ids[1]] == (7, 1)  # cum_before 2100 >= 2048
    d = spark.read.parquet(f"{sf}/documents.parquet")
    want = {
        r["doc_id"]: (r["shard"], r["seq_id"])
        for r in keys_r12.curation_incr_batch_from(d, 900).collect()
    }
    assert got == want


def test_curation_incremental_idempotent(spark, sf_dir, queries):
    """bench best-of-2: the second invocation reuses the committed
    cycle via the terminal marker, byte-identical output."""
    k = queries["q_curation_incremental"]
    a = sorted(map(tuple, k(spark, sf_dir).collect()))
    b = sorted(map(tuple, k(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_curation_incremental_text_never_shuffles(spark):
    """The delta dataflow's 100 TB invariant: no shuffle Exchange
    carries the corpus `text` column — only ids, hashes, shingles,
    and tokens move; and no EvalPython anywhere."""
    import re

    from pfithic_spark.registry import keys_r12

    delta = spark.createDataFrame(
        [(901 + i, "s1", "en", _hq_doc(f"t{i}")) for i in range(5)],
        "doc_id long, source string, lang string, text string",
    )
    sh3 = spark.createDataFrame([], "doc_id long, source string, shingle long")
    sz = spark.createDataFrame([], "doc_id long, sz long")
    hot = spark.createDataFrame([], "shingle long")
    hsh = spark.createDataFrame([], "h string")
    p5 = spark.createDataFrame([], "shingle long")
    st = spark.createDataFrame([], "source string, shard long, cum0 long")
    out, caches = keys_r12._inc_delta_placements(
        delta, sh3, sz, hot, hsh, p5, st
    )
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for c in caches:
        c.unpersist()
    assert "EvalPython" not in p
    blocks = re.findall(
        r"\(\d+\) Exchange\b.*?\nInput \[\d+\]: \[([^\]]*)\]", p
    )
    assert blocks, "expected at least one shuffle Exchange"
    for cols in blocks:
        assert "text#" not in cols, cols


def test_curation_incremental_two_cycles(spark, tmp_path):
    """The maintained state must survive REPEATED cycles: after
    cycle 1 absorbs delta1 into the index (shingles, sizes, hashes,
    pack offsets), cycle 2's dedup must see delta1's docs and its
    packing must continue the rolled-forward offsets — the final
    sink must equal the batch twin over base ∪ delta1 ∪ delta2:
    - 960 exact-dups a DELTA1 doc → dropped via the absorbed hash;
    - 971 near-dups a DELTA1 doc → dropped via the absorbed index;
    - pack: 1000+1000 tokens from (base, delta1) in shard 7, then
      two 100-token delta2 docs — the first continues seq 0
      (cum 2000 < 2048), the second crosses into seq 1."""
    import os

    from pfithic_spark.registry import keys_r12

    s7 = [i for i in range(2, 1001) if _khash(i) % 16 == 7]
    b0 = [i for i in s7 if i <= 900][0]
    d1p = [i for i in s7 if 900 < i <= 950]
    d2p = [i for i in s7 if 950 < i <= 1000]
    assert d1p and len(d2p) >= 2, (d1p, d2p)
    b_text = _hq_doc("b")
    near_b = " ".join(b_text.split(" ")[:-4] + ["zq1", "zq2", "zq3", "zq4"])
    rows = [
        (10, "s1", "en", _hq_doc("a")),
        (b0, "s1", "en", _hq_doc("p0", 500)),
        (910, "s1", "en", b_text),
        (d1p[0], "s1", "en", _hq_doc("p1", 500)),
        (960, "s1", "en", b_text),
        (971, "s1", "en", near_b),
        (980, "s1", "en", _hq_doc("g")),
        (d2p[0], "s1", "en", _hq_doc("p2", 50)),
        (d2p[1], "s1", "en", _hq_doc("p3", 50)),
        (1000, "s1", "en", _hq_doc("e")),
    ]
    # ids must be unique (the packing probes may collide with the
    # hand-picked ids)
    assert len({r[0] for r in rows}) == len(rows), rows
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    root = str(tmp_path / "root")
    raw = os.path.join(root, "raw")
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") <= 900), raw, mode="overwrite"
    )
    base_seq = pio.list_manifests(raw)[-1][0][0]
    pio.write_parquet_atomic(
        d.filter((F.col("doc_id") > 900) & (F.col("doc_id") <= 950)),
        raw,
        mode="append",
    )
    d1_seq = pio.list_manifests(raw)[-1][0][0]
    keys_r12._inc_initial_load(spark, root, base_seq, 900)
    keys_r12._inc_process_delta(spark, root, base_seq)
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") > 950), raw, mode="append"
    )
    keys_r12._inc_process_delta(spark, root, d1_seq)
    got = (
        pio.read_parquet_atomic(spark, os.path.join(root, "curated"))
        .select(
            "doc_id", "source", "lang", "quality", "n_tokens", "shard",
            "seq_id",
        )
        .collect()
    )
    want = keys_r12.curation_incr_batch_from(d, 900).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    fates = {r["doc_id"]: r["seq_id"] for r in got}
    assert 960 not in fates and 971 not in fates
    assert 910 in fates and 980 in fates
    assert fates[d2p[0]] == 0 and fates[d2p[1]] == 1


def test_psi_incremental_repairs_crashed_repair(spark, sf_dir, queries):
    """Round-12 review: a repair that crashed between its overwrite
    and its append leaves TWO manifests whose newest REPLACES (not
    extends) the previous — counting manifests alone would anchor
    base_seq to the superseded torn base and wedge the incremental
    reader.  The append-shape guard must detect this and re-repair."""
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
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    # torn base, then a crashed repair's overwrite — 2 manifests,
    # newest is NOT an append over [-2]
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") % 2 == 0), path, mode="overwrite"
    )
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") % 2 == 0), path, mode="overwrite"
    )
    assert len(pio.list_manifests(path)) == 2
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


def test_apply_lifecycle_abandons_half_vacuumed_state(spark, tmp_path, monkeypatch):
    """Round-12 review: a vacuum that crashed after removing exactly
    one manifest leaves 8 manifests — the same COUNT as a clean
    build, but the newest is the 1-file compact.  The guard must
    abandon that state to a fresh retry tag, never re-apply over it."""
    import hashlib
    import os
    import tempfile

    from pfithic_spark.registry import keys_r11

    # steer the helper at a private tempdir via a fake sf_dir tag:
    # build the planted table at the BASE path, then simulate the
    # torn vacuum state by compacting and removing one old manifest
    sf_dir = str(tmp_path)  # unique → unique tag
    os.makedirs(f"{sf_dir}", exist_ok=True)
    # the helper loads documents from sf_dir — plant a tiny corpus
    spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    base_path = os.path.join(
        tempfile.gettempdir(), f"pfithic_capply_{tag}"
    )
    keys_r11._build_bucketed_appends(spark, sf_dir, base_path)
    pio.compact_parquet_atomic(spark, base_path, target_files=1)
    # remove the OLDEST manifest: 8 manifests remain, newest=compact
    oldest = pio.list_manifests(base_path)[0][1]
    os.remove(os.path.join(base_path, oldest))
    assert len(pio.list_manifests(base_path)) == 8
    path, stats = keys_r12._apply_lifecycle_table(spark, sf_dir)
    assert path == f"{base_path}_retry1"
    assert stats["files_after"] == 1 and stats["snapshots_expired"] == 7


def test_curation_incremental_bucketed_index_no_exchange(spark, tmp_path):
    """100 TB gate: the maintained shingle index is a BUCKETED table
    on its join column, so the recurring candidate join reads it
    co-located — the index subtree must contain a bucketed scan
    (SelectedBucketsCount) and NO Exchange may repartition the index
    side; only the delta side may shuffle or broadcast."""
    import os
    import re

    from pfithic_spark.registry import keys_r12

    rows = [
        (i, "s1", "en", _hq_doc(f"x{i}")) for i in range(1, 30)
    ] + [(1000, "s1", "en", _hq_doc("e"))]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    root = str(tmp_path / "root")
    raw = os.path.join(root, "raw")
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") <= 900), raw, mode="overwrite"
    )
    base_seq = pio.list_manifests(raw)[-1][0][0]
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") > 900), raw, mode="append"
    )
    keys_r12._inc_initial_load(spark, root, base_seq, 900)
    delta = pio.read_parquet_atomic_incremental(spark, raw, from_seq=base_seq)
    idx = os.path.join(root, "idx")
    out, caches = keys_r12._inc_delta_placements(
        delta,
        sh3_idx=spark.table(keys_r12._inc_sh3_table(root)),
        sz_idx=spark.read.parquet(os.path.join(idx, "sz")),
        hot_idx=spark.read.parquet(os.path.join(idx, "hot")),
        hash_idx=spark.read.parquet(os.path.join(idx, "hash")),
        probe5_idx=spark.read.parquet(os.path.join(idx, "probe5")),
        pack_state=spark.read.parquet(os.path.join(idx, "state")),
    )
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for c in caches:
        c.unpersist()
    assert "SelectedBucketsCount" in p, p[:2000]
    # the index's shingle column must never feed a shuffle Exchange:
    # every Exchange hashpartitioning over a `shingle` column must be
    # on the DELTA side, whose lineage begins at posexplode — the
    # bucketed scan side reports its partitioning from the table
    assert re.search(r"Scan parquet [^\n]*sh3", p) is not None
    # structural check: the plan has at most ONE hashpartitioning
    # exchange keyed on a shingle column (the delta side); with the
    # index side co-located there can never be two
    n_shingle_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(shingle", p)
    )
    assert n_shingle_exchanges <= 1, p[:3000]


def test_audit_keys_planted(spark, tmp_path, queries):
    """q_index_consistency / q_sink_history planted fates: corpus =
    kept base doc 10, exact-dup 20 (dropped from the SINK but still
    INDEXED — the index records every doc seen), kept delta doc
    1000.  Index census expectations computed with plain python
    string ops; sink history = one row per commit with (base=1,
    delta=1) keeps."""
    rows = [
        (10, "s1", "en", _hq_doc("a")),
        (20, "s1", "en", _hq_doc("a")),
        (1000, "s1", "en", _hq_doc("e")),
    ]
    sf = _write_docs(spark, tmp_path, rows)

    def shingles(text):
        t = text.lower().strip().split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    per_doc = [shingles(r[3]) for r in rows]
    want_docs = sum(1 for s in per_doc if s)
    want_rows = sum(len(s) for s in per_doc)
    want_distinct = len(set().union(*per_doc))
    got = queries["q_index_consistency"](spark, sf).collect()[0]
    assert (
        got["n_docs"],
        got["n_shingle_rows"],
        got["n_distinct_shingles"],
    ) == (want_docs, want_rows, want_distinct)

    hist = sorted(
        (r["commit_idx"], r["n_rows"])
        for r in queries["q_sink_history"](spark, sf).collect()
    )
    assert hist == [(1, 1), (2, 1)]

    # round-13 single-job gate (VERDICT r12 #8), tightened round 14
    # (ADVICE): the per-commit counts must sit IN the returned plan as
    # parquet file scans feeding ONE aggregate over a union — not be
    # pre-collected by a driver-side count() loop (which would plan as
    # a bare LocalTableScan with no file source, and which the old
    # "Relation + parquet appear somewhere" grep could miss if only
    # SOME counts were pre-collected).
    import re as _re

    df = queries["q_sink_history"](spark, sf)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_scans = len(_re.findall(r"Relation[^\n]*parquet", plan))
    assert n_scans >= 2, plan[:2000]  # one file scan per commit generation
    # exactly one count aggregate keyed on commit_idx consumes them
    n_aggs = len(_re.findall(r"Aggregate \[commit_idx", plan))
    assert n_aggs == 1, plan[:2000]
    assert "Union" in plan, plan[:2000]
