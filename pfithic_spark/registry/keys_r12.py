"""SURVEY.md §2.26 — round-12 batch: lifecycle APPLY and incremental
re-curation.

VERDICT r11 #3/#4/#8: round 11 shipped the lifecycle PLANNERS
(compaction policy, vacuum retention, IVF rebalance) as dry-runs;
this round EXECUTES them against the atomic sink and proves the
execution invariants through the driver oracle:

- q_compaction_apply — run io.compact_parquet_atomic + a real vacuum
  over the planted 8-append table; prove row count + order-free
  checksum intact, the superseded snapshot still time-travels, and
  the vacuum dry-run census matches what the vacuum actually did;
- q_ivf_rebalance_apply — execute the split/merge plan, publish the
  relaid-out assignment table atomically, re-emit the occupancy
  census from the COMMITTED artifact;
- q_drift_panel_streamed — the release-gate PSI panel produced by the
  STREAMING maintenance path (drift_panel_stream micro-batch count
  partials → fold), certified against the same SQL oracle as the
  batch/incremental twins — batch/stream state equivalence through
  the driver, not just the local suite;
- q_curation_incremental — the operation a 100 TB operator runs
  daily: new documents arrive as an atomic-sink append; ONLY the
  delta is scored, deduped against the maintained inverted index,
  decontaminated against the frozen benchmark probes, and packed as
  a continuation of the committed shard state — no corpus re-scan —
  and the final placements hash-match a full-batch SQL oracle.

Same house rules as keys_r11 (FIXTURES.md §8): integer-first,
round(9)-before-use on transcendentals, full DuckDB oracle per key,
planted closed-form test per key, plan gate, no DecimalType in
output schemas.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import io as pio
from .. import llmops  # noqa: F401
from ..io import load_table  # noqa: F401
from . import keys_r11
from ._core import _GOLDEN_DIR, register  # noqa: F401

# ========================================================================
# q_compaction_apply — execute compact + vacuum, prove the invariants
# ========================================================================

_APPLY_MARKER = "_lifecycle_applied.json"
#: keep-last retention used by the applied vacuum — same constant as
#: the q_vacuum_plan dry-run (keys_r11._VACUUM_KEEP_LAST).
_APPLY_KEEP_LAST = keys_r11._VACUUM_KEEP_LAST


def _bucket_census(df: DataFrame) -> DataFrame:
    """(bucket, n_rows, id_sum) — the order-free per-bucket checksum
    both sides of the apply are compared on (id_sum = exact int64 sum
    of the Knuth hash, permutation-invariant by construction)."""
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(llmops.knuth_hash("doc_id")).cast("long").alias("id_sum"),
    )


def _apply_lifecycle_table(spark, sf_dir) -> tuple[str, dict]:
    """Build the planted 8-append table under the APPLY key's own
    path (the r11 planners' table must never be mutated — they read
    it in the same session), then EXECUTE the lifecycle: compact to
    one file, verify, vacuum keep-last-2, verify again.  Guarded by
    a terminal marker (ADVICE r11 #2 discipline): any state without
    the marker and without the exact 8-append layout is a torn
    build/apply and is abandoned for a fresh retry tag."""
    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    base_path = os.path.join(tempfile.gettempdir(), f"pfithic_capply_{tag}")
    for attempt in range(64):
        path = base_path if attempt == 0 else f"{base_path}_retry{attempt}"
        marker = os.path.join(path, _APPLY_MARKER)
        if os.path.exists(marker):
            with open(marker) as fh:
                return path, json.load(fh)
        manifests = pio.list_manifests(path)
        if manifests and len(manifests) != keys_r11._COMPACT_BUCKETS:
            continue  # torn build or torn apply — never census it
        if manifests:
            # 8 manifests is ALSO what a vacuum that crashed after
            # removing exactly one manifest leaves (appends 2..8 +
            # the compact) — but then the newest manifest is the
            # 1-file compact, whereas a clean 8-append build's newest
            # references all 8 files.  Never re-apply over that.
            newest_files, _ = pio.atomic_snapshot_files(path)
            if len(newest_files) != keys_r11._COMPACT_BUCKETS:
                continue  # torn vacuum state — abandon it
        if not manifests:
            keys_r11._build_bucketed_appends(spark, sf_dir, path)
        stats = _execute_lifecycle(spark, path)
        with open(marker + ".tmp", "w") as fh:
            json.dump(stats, fh)
        os.rename(marker + ".tmp", marker)  # terminal commit point
        return path, stats
    raise RuntimeError(
        f"lifecycle apply: 64 torn layouts under {base_path}*"
    )


def _execute_lifecycle(spark, path: str) -> dict:
    """The actual apply over a committed 8-append table.  Every
    invariant VERDICT r11 #3 asked for is CHECKED here and the key
    raises on violation rather than publishing a certified lie:

    (a) row count + order-free checksum intact across the rewrite;
    (b) the superseded snapshot still time-travels (before vacuum:
        the pre-compact seq; after vacuum: the retained seq);
    (c) the vacuum DRY-RUN census (keys_r11.vacuum_plan_from, every
        commit counted) agrees with what vacuum_parquet_atomic then
        actually removed."""
    pre = _bucket_census(pio.read_parquet_atomic(spark, path))
    pre_rows = {r["bucket"]: (r["n_rows"], r["id_sum"]) for r in pre.collect()}
    base_seq = int(pio._newest_manifest_meta(path).get("seq", 0))

    pio.compact_parquet_atomic(spark, path, target_files=1)

    # (a) the rewrite is byte-identical at the census grain
    post = _bucket_census(pio.read_parquet_atomic(spark, path))
    post_rows = {
        r["bucket"]: (r["n_rows"], r["id_sum"]) for r in post.collect()
    }
    if pre_rows != post_rows:
        raise ValueError(
            f"compaction apply: census drifted across the rewrite "
            f"(pre {pre_rows} != post {post_rows})"
        )
    # (b) the superseded pre-compact snapshot still time-travels
    total = sum(n for n, _ in pre_rows.values())
    tt = pio.read_parquet_atomic(spark, path, as_of_seq=base_seq).count()
    if tt != total:
        raise ValueError(
            f"compaction apply: time travel to seq {base_seq} read "
            f"{tt} rows, expected {total}"
        )
    # (c) dry-run plan vs applied vacuum.  data_file_marker=None:
    # every commit (the 8 appends AND the compact overwrite) added
    # exactly one file, so the census is the raw commit index.
    plan = {
        r["seq"]: r["retained"]
        for r in keys_r11.vacuum_plan_from(
            spark, path, data_file_marker=None
        ).collect()
    }
    planned_expire = sum(1 for kept in plan.values() if not kept)
    got = pio.vacuum_parquet_atomic(path, keep_last_n=_APPLY_KEEP_LAST)
    if got["manifests_removed"] != planned_expire:
        raise ValueError(
            f"vacuum apply removed {got['manifests_removed']} "
            f"manifests; the dry-run planned {planned_expire}"
        )
    n_left = len(pio.list_manifests(path))
    if n_left != _APPLY_KEEP_LAST:
        raise ValueError(
            f"vacuum apply left {n_left} manifests, expected "
            f"{_APPLY_KEEP_LAST}"
        )
    # (b') the RETAINED pre-compact snapshot still time-travels after
    # the vacuum (keep-last-2 retains it; its files are shared with
    # history, so the vacuum must not have removed any)
    tt2 = pio.read_parquet_atomic(spark, path, as_of_seq=base_seq).count()
    if tt2 != total:
        raise ValueError(
            f"vacuum apply broke time travel to retained seq "
            f"{base_seq}: {tt2} rows, expected {total}"
        )
    final_files = len(pio.atomic_snapshot_files(path)[0])
    return {
        "snapshots_expired": int(got["manifests_removed"]),
        "files_removed": int(got["data_files_removed"]),
        "files_after": int(final_files),
    }


@register(
    "q_compaction_apply",
    oracle=f"""
WITH f AS (
  SELECT CAST(((doc_id % 2654435761) * 2654435761) % 4294967296
              % {keys_r11._COMPACT_BUCKETS} AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(((doc_id % 2654435761) * 2654435761) % 4294967296)
              AS BIGINT) AS id_sum
  FROM documents GROUP BY 1
)
SELECT bucket, n_rows, id_sum,
       CAST({keys_r11._COMPACT_BUCKETS + 1 - _APPLY_KEEP_LAST}
            AS BIGINT) AS snapshots_expired,
       CAST(0 AS BIGINT) AS files_removed,
       CAST(1 AS BIGINT) AS files_after
FROM f
""",
)
def q_compaction_apply(spark, sf_dir):
    """LIFECYCLE APPLY (VERDICT r11 #3): the round-11 planners were
    dry-runs; this key EXECUTES the maintenance against its own
    planted 8-append atomic table and returns the post-apply census:

    1. compact the 8 one-bucket files into ONE snapshot file
       (:func:`pfithic_spark.io.compact_parquet_atomic` — staged
       rewrite, manifest commit point, conflict check);
    2. verify (a) per-bucket row count AND order-free Knuth-hash
       checksum are byte-identical across the rewrite, (b) the
       superseded pre-compact snapshot still time-travels;
    3. vacuum keep-last-2 after checking the
       :func:`keys_r11.vacuum_plan_from` DRY-RUN census agrees with
       what the vacuum then actually removes — (8 appends + 1
       compact) − 2 retained = 7 snapshots expired,
       0 data files removed (the retained pre-compact snapshot still
       references every original file — exactly why expire-snapshots
       and delete-orphan-files are separate operations in every
       table format);
    4. re-verify time travel to the RETAINED pre-compact seq.

    The key RAISES on any violated invariant instead of publishing a
    census over a corrupted apply.  The returned frame is the
    per-bucket (n_rows, id_sum) census read from the FINAL committed
    snapshot plus the apply counters, so the oracle (which recomputes
    the census from raw documents and the counters from first
    principles) hash-mismatches if the rewrite lost, duplicated, or
    reordered-into-different-buckets even one row.

    100 TB shape: compaction is a staged rewrite + manifest swap
    (readers never disturbed); the verification censuses are
    map-side-combining aggregates over 16-byte columns; the vacuum
    and its dry-run are manifest-grain metadata.  Write-once via a
    terminal marker — bench best-of-2 re-reads the applied table.
    """
    path, stats = _apply_lifecycle_table(spark, sf_dir)
    cen = _bucket_census(pio.read_parquet_atomic(spark, path))
    return cen.select(
        "bucket",
        "n_rows",
        "id_sum",
        F.lit(stats["snapshots_expired"])
        .cast("long")
        .alias("snapshots_expired"),
        F.lit(stats["files_removed"]).cast("long").alias("files_removed"),
        F.lit(stats["files_after"]).cast("long").alias("files_after"),
    )


# ========================================================================
# q_ivf_rebalance_apply — execute the split/merge plan, census the result
# ========================================================================


@register(
    "q_ivf_rebalance_apply",
    oracle=f"""
SELECT new_cell, subcell,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM ({keys_r11._IVF_REBALANCE_SQL}) plan
GROUP BY new_cell, subcell
""",
)
def q_ivf_rebalance_apply(spark, sf_dir):
    """APPLIED IVF REBALANCE (VERDICT r11 #8, pairing with #3): take
    q_ivf_rebalance's split/merge plan, EXECUTE the relayout — every
    vector lands at its planned (new_cell, subcell) — publish the new
    assignment table ATOMICALLY (one manifest commit: an ANN reader
    never sees a half-relaid index), and re-emit the occupancy census
    from the COMMITTED artifact.

    Verified before publish (raise, don't certify):
    - conservation: the plan covers every assigned vector exactly
      once (|plan| == |assignments|, no vec_id duplicated);
    the census then comes from reading the committed table back, so
    the oracle (plan SQL + GROUP BY — literally the r11 oracle
    wrapped, one shared definition) catches a drifted apply.

    100 TB shape: the relayout is a projection of the plan frame
    (vec_id, new_cell, subcell) — no new distance computation, no
    shuffle beyond the plan's own; the census is a
    map-side-combining count over the bounded (≤ 2·|cells|) grain.
    Write-once per session via the single committed manifest."""
    from .keys_r10 import ivf_distance_table

    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pfithic_ivfapply_{tag}")
    if not pio.list_manifests(path):
        q = ivf_distance_table(spark, sf_dir)
        qe = keys_r11._quantized_embeddings(spark, sf_dir)
        cells = (
            spark.read.parquet(f"{_GOLDEN_DIR}/ivf_centroids.parquet")
            .select("cell")
            .distinct()
        )
        plan, caches = keys_r11.ivf_rebalance_plan(q, qe, cells)
        new_asg = plan.select("vec_id", "new_cell", "subcell").persist()
        try:
            n_plan = new_asg.count()
            n_vecs = new_asg.select("vec_id").distinct().count()
            if n_plan != n_vecs:
                raise ValueError(
                    f"rebalance apply: plan rows {n_plan} != distinct "
                    f"vectors {n_vecs} — a vector is double-planned"
                )
            n_asg = q.select("vec_id").distinct().count()
            if n_vecs != n_asg:
                raise ValueError(
                    f"rebalance apply: plan covers {n_vecs} vectors, "
                    f"assignment table holds {n_asg}"
                )
            pio.write_parquet_atomic(new_asg, path, mode="overwrite")
        finally:
            new_asg.unpersist()
            for c in caches:
                c.unpersist()
    return (
        pio.read_parquet_atomic(spark, path)
        .groupBy("new_cell", "subcell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    )


# ========================================================================
# q_drift_panel_streamed — the PSI release gate fed by the stream state
# ========================================================================


@register("q_drift_panel_streamed", oracle=keys_r11._PSI_PANEL_SQL)
def q_drift_panel_streamed(spark, sf_dir):
    """STREAM-STATE PSI TWIN (VERDICT r11 #8): the same release-gate
    panel as q_psi_source_panel / q_psi_drift_incremental, but
    produced by the STREAMING maintenance path end-to-end — the
    corpus arrives as four micro-batches through a file-source
    stream, :func:`pfithic_spark.streaming.drift_panel_stream` folds
    each batch to sum-mergeable (source, bucket, na, nb) count
    partials under ``epoch=<id>`` (exactly-once via per-epoch
    overwrite), and :func:`streaming.fold_drift_panel` merges the
    standing count table into the smoothed panel through the SHARED
    keys_r10 dataflow.  Registering it proves batch/stream state
    equivalence THROUGH THE DRIVER ORACLE (the identical SQL the
    batch twin certifies against), not just the local suite.

    100 TB shape: the nightly gate reads only the count table
    (|sources| × |buckets| × |epochs| rows — no raw-document
    replay); the stream's per-batch work is one map-side-combining
    aggregate.  n_chars is derived from the text itself (== the
    fixture column, the documented identity drift_panel_stream
    relies on).  Write-once guard on the count table via the stream
    checkpoint dir — bench best-of-2 folds without re-streaming."""
    from .. import streaming as strm

    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"pfithic_driftstream_{tag}")
    src = os.path.join(root, "src")
    counts = os.path.join(root, "counts")
    ck = os.path.join(root, "ck")
    done = os.path.join(root, "_streamed.marker")
    if not os.path.exists(done):
        import glob as _glob
        import shutil as _shutil

        _shutil.rmtree(root, ignore_errors=True)
        os.makedirs(src, exist_ok=True)
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        # four deterministic arrival chunks, one file each
        for i in range(4):
            part = os.path.join(root, f"_chunk{i}")
            d.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(part)
            parts = sorted(
                _glob.glob(os.path.join(part, "part-*.parquet"))
            )
            # one part per chunk by construction (coalesce(1)) — a
            # multi-part chunk copied onto one destination name would
            # SILENTLY drop rows from the streamed corpus
            if len(parts) != 1:
                raise RuntimeError(
                    f"chunk {i}: expected exactly 1 part file, got "
                    f"{len(parts)}"
                )
            _shutil.copy(parts[0], os.path.join(src, f"{i:03d}.parquet"))
            _shutil.rmtree(part)
        q = strm.drift_panel_stream(
            strm.read_document_stream(spark, src), counts, ck
        )
        finished = q.awaitTermination(300)
        q.stop()
        # the marker is TERMINAL: a timed-out (killed mid-consumption)
        # stream must fail the call, not commit a truncated count
        # table as done for the rest of the session
        if not finished:
            raise RuntimeError(
                "drift panel stream did not finish within 300 s; "
                "not committing a truncated count table"
            )
        with open(done, "w") as fh:
            fh.write("ok")
    return strm.fold_drift_panel(spark, counts)


# ========================================================================
# q_curation_incremental — delta-only re-curation against maintained state
# ========================================================================

#: Frozen incremental-curation hyper-parameters — one set shared by
#: the Spark dataflow, the DuckDB oracle, and the planted tests.
#: The near-dup threshold is the integer form of Jaccard >= 1/5
#: (common * 5 >= s1 + s2 - common) so the keep decision has no
#: float-boundary ambiguity between engines.
_INC_MIN_QUALITY = 0.6
_INC_JACCARD_DEN = 5
_INC_MAX_DF = 1000
_INC_PROBE_MOD = 97
_INC_TARGET_TOKENS = 2048
_INC_N_SHARDS = 16
#: base/delta split of the fixture corpus: doc_id <= (max_id*9)//10
#: is the already-curated base, the top decile of ids is "today's
#: arrivals".  In production the threshold is simply the max id at
#: the previous publish; the 9/10 rule synthesizes that state.
_INC_SPLIT_NUM, _INC_SPLIT_DEN = 9, 10


def _inc_quality(d: DataFrame) -> DataFrame:
    """(doc_id, source, lang, n_tokens, quality) — the shared
    q_quality_score arithmetic (llmops.quality_features +
    quality_score_expr), a pure per-document projection: trivially
    incremental."""
    t = llmops.quality_features(d, extra_cols=("source", "lang"))
    return t.select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        llmops.quality_score_expr().alias("quality"),
    )


def _inc_sh3(d: DataFrame) -> DataFrame:
    """Distinct 3-token shingle hashes with the source block —
    (doc_id, source, shingle).  This IS the maintained inverted
    index's row shape."""
    return llmops.shingle_rows(d, k=3, extra_cols=("source",)).select(
        "doc_id", "source", F.xxhash64("shingle").alias("shingle")
    )


def _inc_sh5(d: DataFrame) -> DataFrame:
    """Distinct 5-token shingle hashes — the contamination grain."""
    return llmops.shingle_rows(d, k=5).select(
        "doc_id", F.xxhash64("shingle").alias("shingle")
    )


def _inc_pack(keep: DataFrame, state: DataFrame | None = None) -> DataFrame:
    """Greedy sequence packing in ARRIVAL (doc_id) order per
    (source, knuth-shard) — with ``state`` = the committed per-group
    running token totals, the delta pack is an exact CONTINUATION of
    the batch pack (ids are append-ordered, so batch cum == state
    offset + delta-local cum)."""
    t = keep.withColumn(
        "shard",
        (llmops.knuth_hash("doc_id") % _INC_N_SHARDS).cast("long"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn(
        "_cb", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    if state is not None:
        c = c.join(F.broadcast(state), ["source", "shard"], "left").na.fill(
            {"cum0": 0}
        )
        off = F.col("cum0")
    else:
        off = F.lit(0).cast("long")
    return c.withColumn(
        "seq_id",
        F.floor((off + F.col("_cb")) / F.lit(float(_INC_TARGET_TOKENS)))
        .cast("long"),
    ).select(
        "doc_id", "source", "lang", "quality", "n_tokens", "shard", "seq_id"
    )


def _inc_keep(
    q: DataFrame,
    exact_ids: DataFrame,
    dup_ids: DataFrame,
    cont_ids: DataFrame,
) -> DataFrame:
    """The shared keep composition: quality gate ∩ exact-dedup
    representative ∩ no-earlier-near-dup ∩ not-a-probe ∩
    uncontaminated.  All id-grain semi/anti joins."""
    return (
        q.filter(F.col("quality") >= _INC_MIN_QUALITY)
        .join(exact_ids, "doc_id", "left_semi")
        .join(dup_ids, "doc_id", "left_anti")
        .filter(F.col("doc_id") % _INC_PROBE_MOD != 0)
        .join(cont_ids, "doc_id", "left_anti")
    )


def _inc_dup_from_pairs(pairs: DataFrame, s1: DataFrame, s2: DataFrame) -> DataFrame:
    """(id2) drop set from co-shingle pairs + the two size tables —
    integer Jaccard threshold (common·5 >= s1+s2−common)."""
    return (
        pairs.join(s1.select(F.col("doc_id").alias("id1"), F.col("sz").alias("_s1")), "id1")
        .join(s2.select(F.col("doc_id").alias("id2"), F.col("sz").alias("_s2")), "id2")
        .filter(
            F.col("common") * _INC_JACCARD_DEN
            >= F.col("_s1") + F.col("_s2") - F.col("common")
        )
        .select(F.col("id2").alias("doc_id"))
        .distinct()
    )


def curation_incr_batch_from(d: DataFrame, t_split: int) -> DataFrame:
    """The BATCH twin — the semantic contract the incremental path
    must reproduce exactly, over an arbitrary documents frame:

    - quality gate (shared q_quality_score arithmetic, >= 0.6);
    - exact dedup: keep the min doc_id per md5(normalized text);
    - near dedup: a document is dropped iff ANY earlier (smaller-id)
      same-source document shares shingle-Jaccard >= 1/5 with it —
      the sorted-neighborhood / LSH-index drop rule, chosen over
      q_curation_dag's connected-component representatives BECAUSE
      it composes: keep(d) depends only on documents with ids < d,
      so an append never disturbs the committed base keep-set (a CC
      representative can change when a later doc bridges two
      clusters — that semantic cannot be maintained incrementally
      without re-rooting history).  The hot-shingle df cap is FROZEN
      over the base split (df > 1000 among docs with id <= t_split)
      — the production stop-shingle list is a corpus artifact frozen
      at index-build time; a live df would let an arriving document
      retroactively change base-pair Jaccards;
    - decontamination: the probe set is FROZEN at base publish
      (doc_id % 97 == 0 AND doc_id <= t_split — benchmarks are fixed
      before training); any doc sharing a distinct 5-gram with a
      frozen probe drops, and every % 97 doc drops outright (pure
      per-doc predicate, trivially incremental);
    - packing: greedy 2048-token cut per (source, knuth-shard) in
      doc_id (arrival) order — append-ordered ids make the delta
      pack an exact continuation of the committed pack state.
    """
    sh = _inc_sh3(d)
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    hot = (
        sh.filter(F.col("doc_id") <= t_split)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _INC_MAX_DF)
        .select("shingle")
    )
    ks = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = ks.alias("a"), ks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    dup = _inc_dup_from_pairs(pairs, sizes, sizes)
    exact = (
        d.select(F.md5(llmops.norm_text("text")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    probe5 = (
        _inc_sh5(
            d.filter(
                (F.col("doc_id") % _INC_PROBE_MOD == 0)
                & (F.col("doc_id") <= t_split)
            )
        )
        .select("shingle")
        .distinct()
    )
    cont = (
        _inc_sh5(d)
        .join(F.broadcast(probe5), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return _inc_pack(_inc_keep(_inc_quality(d), exact, dup, cont))


def _inc_delta_placements(
    delta: DataFrame,
    sh3_idx: DataFrame,
    sz_idx: DataFrame,
    hot_idx: DataFrame,
    hash_idx: DataFrame,
    probe5_idx: DataFrame,
    pack_state: DataFrame,
) -> tuple[DataFrame, list]:
    """Delta-only curation against the MAINTAINED index state — the
    whole point: no input here is the base corpus, only the delta
    frame and the index tables (shingle-grain hashes, sizes, the
    frozen hot list, the text-hash set, the frozen probe shingles,
    and the committed per-(source, shard) pack offsets).

    Returns (placements, persisted caches to release after the
    caller's job)."""
    dq = _inc_quality(delta)
    # exact: a delta doc is the global min for its hash iff the hash
    # is unseen in the base AND it is the min within the delta
    # (append-ordered ids: every base id < every delta id)
    dh = delta.select(
        F.md5(llmops.norm_text("text")).alias("h"), "doc_id"
    )
    dmin = dh.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    exact = dmin.join(hash_idx, "h", "left_anti").select("doc_id")
    # near: delta shingles vs (base index ∪ earlier delta docs),
    # hot list FROZEN (the index's stop-shingle artifact)
    dsh = _inc_sh3(delta).persist()
    dsz = dsh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    dks = dsh.join(F.broadcast(hot_idx), "shingle", "left_anti")
    bks = sh3_idx.join(F.broadcast(hot_idx), "shingle", "left_anti")
    e, dd = bks.alias("e"), dks.alias("d")
    # equi-join on SHINGLE ALONE (the index's bucket column) with the
    # source block as a post-join filter — semantically identical to
    # joining on (shingle, source), but the single-column key lets the
    # BUCKETED index scan satisfy the join's partitioning requirement
    # outright: the index side never enters an Exchange (plan-gated);
    # only the delta side shuffles (or broadcasts, when small)
    pairs_b = (
        e.join(dd, F.col("e.shingle") == F.col("d.shingle"))
        .filter(F.col("e.source") == F.col("d.source"))
        .groupBy(
            F.col("e.doc_id").alias("id1"), F.col("d.doc_id").alias("id2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    a, b = dks.alias("a"), dks.alias("b")
    pairs_d = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    dup = (
        _inc_dup_from_pairs(pairs_b, sz_idx, dsz)
        .unionByName(_inc_dup_from_pairs(pairs_d, dsz, dsz))
        .distinct()
    )
    cont = (
        _inc_sh5(delta)
        .join(F.broadcast(probe5_idx), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    out = _inc_pack(_inc_keep(dq, exact, dup, cont), state=pack_state)
    return out, [dsh]


_INC_DONE = "_curation_incremental.marker"


def _inc_root(spark, sf_dir) -> str:
    tag = hashlib.sha1(
        (sf_dir + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"pfithic_cinc_{tag}")


def _inc_build(spark, root: str, d: DataFrame, t_split: int) -> None:
    """One full publish + one incremental maintenance cycle under
    ``root``: base initial load → index/state publish → delta arrives
    as an atomic append → delta-only curation → placement append +
    index maintenance.  Terminal marker commits the whole cycle.
    Split into :func:`_inc_initial_load` and
    :func:`_inc_process_delta` so tools/bench_incremental.py can time
    the one-time load and the recurring delta cycle SEPARATELY (the
    delta-proportional-cost scale row)."""
    raw = os.path.join(root, "raw")
    # 1. the corpus timeline: base snapshot, then the delta append
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") <= t_split), raw, mode="overwrite"
    )
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") > t_split), raw, mode="append"
    )
    manifests = pio.list_manifests(raw)
    base_seq = manifests[-2][0][0]
    _inc_initial_load(spark, root, base_seq, t_split)
    _inc_process_delta(spark, root, base_seq)


#: Bucket count of the maintained shingle inverted index — the
#: one-shuffle-at-write, exchange-free-at-read lever (io.
#: write_bucketed_table's contract): every delta cycle joins against
#: the index on its bucket column, so the index side never
#: re-shuffles no matter how many cycles run.  64 buckets: the join
#: runs at bucket parallelism, so the count must not fall below the
#: executor-core budget (16 buckets measurably capped the 32-core
#: local harness).
_INC_SH3_BUCKETS = 64


def _inc_sh3_table(root: str) -> str:
    """Session-catalog name of the bucketed shingle index for this
    cycle root (one per root, so retry tags never collide)."""
    return (
        "pfithic_cinc_sh3_"
        + hashlib.sha1(root.encode()).hexdigest()[:10]
    )


def _inc_write_sh3(
    spark, df: DataFrame, root: str, overwrite: bool
) -> None:
    """Publish (or append) shingle-index rows CLUSTERED BY shingle
    through the ONE canonical bucketed writer
    (:func:`pfithic_spark.io.write_bucketed_table`): the write pays
    the bucketing shuffle once; every later delta cycle's candidate
    join reads the index co-located."""
    pio.write_bucketed_table(
        df,
        _inc_sh3_table(root),
        ["shingle"],
        _INC_SH3_BUCKETS,
        ["shingle"],
        path=os.path.join(root, "idx", "sh3_tbl"),
        mode="overwrite" if overwrite else "append",
    )


def _inc_initial_load(
    spark, root: str, base_seq: int, t_split: int
) -> None:
    """INITIAL LOAD: batch-curate the base snapshot (read AS OF
    ``base_seq`` — provenance is the committed snapshot, nothing
    else), publish the placements and the maintained index state.
    One-time cost — exactly the q_curation_dag-class batch job."""
    raw = os.path.join(root, "raw")
    idx = os.path.join(root, "idx")
    curated = os.path.join(root, "curated")
    base = pio.read_parquet_atomic(spark, raw, as_of_seq=base_seq)
    pio.write_parquet_atomic(
        curation_incr_batch_from(base, t_split),
        curated,
        mode="overwrite",
        stats_cols=["shard"],
    )
    _inc_write_sh3(spark, _inc_sh3(base), root, overwrite=True)
    sh3_r = spark.table(_inc_sh3_table(root))
    sh3_r.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    ).write.mode("overwrite").parquet(os.path.join(idx, "sz"))
    sh3_r.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df")
    ).filter(F.col("df") > _INC_MAX_DF).select("shingle").write.mode(
        "overwrite"
    ).parquet(os.path.join(idx, "hot"))
    base.select(
        F.md5(llmops.norm_text("text")).alias("h")
    ).distinct().write.mode("overwrite").parquet(os.path.join(idx, "hash"))
    _inc_sh5(
        base.filter(F.col("doc_id") % _INC_PROBE_MOD == 0)
    ).select("shingle").distinct().write.mode("overwrite").parquet(
        os.path.join(idx, "probe5")
    )
    pio.read_parquet_atomic(spark, curated).groupBy(
        "source", "shard"
    ).agg(F.sum("n_tokens").cast("long").alias("cum0")).write.mode(
        "overwrite"
    ).parquet(os.path.join(idx, "state"))


def _inc_process_delta(spark, root: str, from_seq: int) -> None:
    """The RECURRING cycle: consume the delta via the change stream
    (only the files appended after ``from_seq`` — the base corpus is
    never re-read), curate it against the maintained index state,
    append the placements, and absorb the delta into EVERY piece of
    mutable index state (shingle index, sizes, hashes, pack offsets)
    so the NEXT cycle sees a consistent world — the two-cycle planted
    test drives this repeatedly.  The hot-shingle list and the probe
    5-grams are FROZEN by contract (see curation_incr_batch_from) and
    deliberately not touched.  Delta ids must exceed all prior ids
    (append-ordered id discipline — the composability precondition)."""
    raw = os.path.join(root, "raw")
    idx = os.path.join(root, "idx")
    curated = os.path.join(root, "curated")
    delta = pio.read_parquet_atomic_incremental(
        spark, raw, from_seq=from_seq
    )
    old_state = spark.read.parquet(os.path.join(idx, "state"))
    out, caches = _inc_delta_placements(
        delta,
        sh3_idx=spark.table(_inc_sh3_table(root)),
        sz_idx=spark.read.parquet(os.path.join(idx, "sz")),
        hot_idx=spark.read.parquet(os.path.join(idx, "hot")),
        hash_idx=spark.read.parquet(os.path.join(idx, "hash")),
        probe5_idx=spark.read.parquet(os.path.join(idx, "probe5")),
        pack_state=old_state,
    )
    try:
        # publish the delta placements (append — readers never see
        # a torn generation) and MAINTAIN the index for the next delta
        prev_seq = pio.list_manifests(curated)[-1][0][0]
        pio.write_parquet_atomic(
            out, curated, mode="append", stats_cols=["shard"]
        )
        dsh = caches[0]
        _inc_write_sh3(spark, dsh, root, overwrite=False)
        dsh.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("sz")
        ).write.mode("append").parquet(os.path.join(idx, "sz"))
        delta.select(
            F.md5(llmops.norm_text("text")).alias("h")
        ).distinct().write.mode("append").parquet(os.path.join(idx, "hash"))
        # roll the pack offsets forward: old state ⊎ this cycle's
        # per-group token sums (read back from the JUST-COMMITTED
        # placements — delta-grain, not corpus-grain).  The bounded
        # (source, shard) dimension collects driver-side so the state
        # overwrite never races its own lazy scan.
        dstate = (
            pio.read_parquet_atomic_incremental(
                spark, curated, from_seq=prev_seq
            )
            .groupBy("source", "shard")
            .agg(F.sum("n_tokens").cast("long").alias("cum0"))
        )
        merged = (
            old_state.unionByName(dstate)
            .groupBy("source", "shard")
            .agg(F.sum("cum0").cast("long").alias("cum0"))
        )
        rows = merged.collect()
        spark.createDataFrame(rows, merged.schema).write.mode(
            "overwrite"
        ).parquet(os.path.join(idx, "state"))
    finally:
        for c in caches:
            c.unpersist()


#: Shared oracle CTE chain (corpus → quality → exact/near dedup →
#: decontamination → `keep`) — module-level f-string so
#: q_curation_incremental and the q_sink_history audit certify
#: against ONE set of batch semantics that can never drift apart.
_INC_ORACLE_CTES = f"""
WITH tsp AS (SELECT (MAX(doc_id) * {_INC_SPLIT_NUM}) // {_INC_SPLIT_DEN}
             AS t FROM documents),
q AS (
  SELECT doc_id, source, lang,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
         ROUND(
           LEAST(1.0, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) / 50.0) * 0.4
           + LEAST(1.0, CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\b(the|a)\\b')) AS BIGINT) * 5.0
                         / LEN(STRING_SPLIT(text, ' '))) * 0.3
           + LEAST(1.0, (CAST(LENGTH(text) AS DOUBLE) / LEN(STRING_SPLIT(text, ' '))) / 5.0) * 0.3,
         9) AS quality
  FROM documents
),
toks AS (
  SELECT doc_id, source, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(tk) - 2),
           i -> CONCAT_WS(' ', tk[i], tk[i+1], tk[i+2])
         ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM sh GROUP BY doc_id),
hot AS (
  SELECT shingle FROM sh, tsp WHERE sh.doc_id <= tsp.t
  GROUP BY shingle HAVING COUNT(*) > {_INC_MAX_DF}
),
ks AS (
  SELECT s.* FROM sh s WHERE s.shingle NOT IN (SELECT shingle FROM hot)
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM ks a JOIN ks b
    ON a.shingle = b.shingle AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dup AS (
  SELECT DISTINCT p.id2 AS doc_id
  FROM pairs p
  JOIN sizes s1 ON p.id1 = s1.doc_id
  JOIN sizes s2 ON p.id2 = s2.doc_id
  WHERE p.common * {_INC_JACCARD_DEN} >= s1.sz + s2.sz - p.common
),
ex AS (
  SELECT MIN(doc_id) AS doc_id FROM documents
  GROUP BY MD5(LOWER(TRIM(text)))
),
c5 AS (
  SELECT doc_id,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(tk) - 4),
           i -> CONCAT_WS(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4])
         ))) AS shingle
  FROM toks
),
probe5 AS (
  SELECT DISTINCT shingle FROM c5, tsp
  WHERE doc_id % {_INC_PROBE_MOD} = 0 AND doc_id <= tsp.t
),
cont AS (SELECT DISTINCT c.doc_id FROM c5 c JOIN probe5 USING (shingle)),
keep AS (
  SELECT q.doc_id, q.source, q.lang, q.quality, q.n_tokens
  FROM q JOIN ex USING (doc_id)
  WHERE q.quality >= {_INC_MIN_QUALITY!r}
    AND q.doc_id NOT IN (SELECT doc_id FROM dup)
    AND q.doc_id % {_INC_PROBE_MOD} <> 0
    AND q.doc_id NOT IN (SELECT doc_id FROM cont)
)"""


@register(
    "q_curation_incremental",
    oracle=f"""
{_INC_ORACLE_CTES},
t2 AS (
  SELECT k.*,
         CAST(((doc_id % 2654435761) * 2654435761) % 4294967296
              % {_INC_N_SHARDS} AS BIGINT) AS shard
  FROM keep k
),
c2 AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS cb
  FROM t2
)
SELECT doc_id, source, lang, quality, n_tokens, shard,
       CAST(FLOOR(cb / {float(_INC_TARGET_TOKENS)!r}) AS BIGINT) AS seq_id
FROM c2
""",
)
def q_curation_incremental(spark, sf_dir):
    """INCREMENTAL RE-CURATION (VERDICT r11 #4) — the operation a
    100 TB training-data operator runs DAILY, registered end-to-end:

    1. the corpus timeline lives in an atomic sink — base snapshot,
       then today's documents as an APPEND (top decile of doc_ids);
    2. the INITIAL LOAD batch-curates the base snapshot once and
       publishes (a) the curated placements, (b) the maintained
       state: the shingle inverted index, per-doc set sizes, the
       FROZEN hot-shingle stop list, the text-hash set, the frozen
       benchmark 5-gram probes, and the per-(source, shard) pack
       offsets;
    3. the delta is consumed via the CHANGE STREAM
       (:func:`pfithic_spark.io.read_parquet_atomic_incremental` —
       only the appended files; the base corpus is NEVER re-read),
       quality-scored, exact-deduped against the hash set, near-
       deduped against the inverted index (plus within-delta pairs),
       decontaminated against the frozen probes, and packed as an
       exact CONTINUATION of the committed pack state;
    4. delta placements append atomically; the index tables absorb
       the delta's rows for the next cycle.

    The oracle recomputes the ENTIRE batch semantics over the full
    corpus in SQL (see :func:`curation_incr_batch_from` for why
    every stage was chosen to be order-composable), so the driver's
    hash compare IS the proof that incremental(base ∪ delta) ≡
    batch(base ∪ delta) — a drifted index, a stale size, a
    double-counted hash, or a broken pack offset all mismatch.

    100 TB shape: the recurring cost is delta-proportional work plus
    ONE scan of the shingle index (16-byte id/hash rows — never the
    corpus text), and the index IS published as a bucketed table on
    shingle, so that join is exchange-free on the index side however
    many cycles run (plan-gated: bucketed scan present, only the
    delta side may shuffle); corpus text never enters any Exchange
    (plan-gated).  The
    frozen hot list caps candidate fan-out exactly as
    llmops.LSH_MAX_BUCKET does for the MinHash family.  Write-once
    per session via a terminal marker; torn cycles are abandoned to
    a fresh retry tag (ADVICE r11 #2 discipline)."""
    root = _inc_cycle_or_none(spark, sf_dir)
    if root is None:
        # empty corpus: nothing to publish — the empty placement
        # frame, not a crash (empty-input contract)
        return spark.createDataFrame(
            [],
            "doc_id long, source string, lang string, quality double, "
            "n_tokens long, shard long, seq_id long",
        )
    return pio.read_parquet_atomic(
        spark, os.path.join(root, "curated")
    ).select(
        "doc_id", "source", "lang", "quality", "n_tokens", "shard", "seq_id"
    )


def _inc_ensure_cycle(spark, sf_dir, d: DataFrame, t_split: int) -> str:
    """Resolve (building once per session) the committed
    base+delta cycle root — shared by q_curation_incremental and the
    q_index_consistency / q_sink_history audit keys, which read the
    SAME maintained state the flagship committed (auditing a state
    nobody serves would prove nothing)."""
    base_root = _inc_root(spark, sf_dir)
    for attempt in range(64):
        root = base_root if attempt == 0 else f"{base_root}_retry{attempt}"
        marker = os.path.join(root, _INC_DONE)
        if os.path.exists(marker):
            return root
        if os.path.exists(root):
            continue  # torn cycle from a crashed build — abandon it
        os.makedirs(root, exist_ok=True)
        _inc_build(spark, root, d, t_split)
        with open(marker + ".tmp", "w") as fh:
            fh.write("ok")
        os.rename(marker + ".tmp", marker)
        return root
    raise RuntimeError(
        f"curation incremental: 64 torn cycles under {base_root}*"
    )


def _inc_cycle_or_none(spark, sf_dir) -> str | None:
    """Shared preamble of the three cycle-backed keys (the flagship
    and its two audits — round-12 review: one copy, not three): load
    the corpus, derive the frozen base/delta split from the max id,
    and resolve the committed cycle root; ``None`` on an empty
    corpus (each key returns its own empty/degenerate frame)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    mx = d.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    if mx is None:
        return None
    t_split = (int(mx) * _INC_SPLIT_NUM) // _INC_SPLIT_DEN
    return _inc_ensure_cycle(spark, sf_dir, d, t_split)


# ========================================================================
# q_index_consistency / q_sink_history — maintenance-state audits
# ========================================================================


@register(
    "q_index_consistency",
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(tk) - 2),
           i -> CONCAT_WS(' ', tk[i], tk[i+1], tk[i+2])
         ))) AS shingle
  FROM toks
)
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shingle_rows,
       CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct_shingles
FROM sh
""",
)
def q_index_consistency(spark, sf_dir):
    """MAINTAINED-INDEX AUDIT: census the shingle inverted index the
    incremental-curation cycle actually COMMITTED (base build +
    delta absorption, the bucketed sh3 table) and certify it against
    a from-scratch recount of the corpus through the driver oracle —
    indexed-doc count, index row count, distinct shingle count.  A
    maintenance bug anywhere (missed append, double append, a
    dropped bucket file) shows up as a count drift the oracle
    catches; this is the nightly index-health check a 100 TB dedup
    operator schedules beside the drift panel.

    100 TB shape: one scan of the id/hash-grain index (never the
    corpus) into three map-side-combining aggregates; the audit
    reuses the SAME committed cycle as q_curation_incremental
    (write-once — auditing a state nobody serves proves nothing).
    Distinct-shingle equality rides xxhash64 exactly like the df
    counts (collision odds ~2⁻⁶⁴ per pair, the house-accepted LSH
    risk)."""
    root = _inc_cycle_or_none(spark, sf_dir)
    if root is None:
        return spark.createDataFrame(
            [(0, 0, 0)],
            "n_docs long, n_shingle_rows long, n_distinct_shingles long",
        )
    return spark.table(_inc_sh3_table(root)).agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_shingle_rows"),
        F.countDistinct("shingle").cast("long").alias("n_distinct_shingles"),
    )


@register(
    "q_sink_history",
    oracle=f"""
{_INC_ORACLE_CTES}
SELECT CAST(1 AS BIGINT) AS commit_idx,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM keep, tsp WHERE keep.doc_id <= tsp.t
UNION ALL
SELECT CAST(2 AS BIGINT) AS commit_idx,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM keep, tsp WHERE keep.doc_id > tsp.t
""",
)
def q_sink_history(spark, sf_dir):
    """SINK COMMIT-TRAIL CENSUS: walk the curated training sink's
    manifest history and report the rows each commit ADDED — commit
    1 is the initial base load, commit 2 the incremental delta
    generation (snapshot read as-of the first seq; incremental reads
    between consecutive seqs after that).  The oracle recomputes
    both generation sizes from the shared batch-semantics CTE chain
    split at the frozen base/delta threshold — a sink whose commit
    trail disagrees with the semantics (lost generation, double
    append, rows leaking across the split) hash-mismatches.  This is
    the lineage audit a data-governance review reads: WHAT landed,
    WHEN, and does it reconcile with the pipeline definition.

    100 TB shape: the manifest walk is driver-side metadata (bounded
    by commit count), and the per-generation file sets come from the
    SAME consecutive-manifest diff the incremental reader uses
    (non-append history raises identically); the counts then run as
    ONE job — a union of per-generation file scans aggregated by
    commit_idx — instead of one serial Spark job per commit (round
    13, VERDICT r12 #8: a real sink has O(10³) commits, and the
    driver-side count loop serialized O(10³) jobs; the union's scans
    parallelize inside a single action).  Plan-gated inside
    test_r12_keys.py::test_audit_keys_planted (round 14: the gate
    counts the per-generation parquet relations and requires exactly
    ONE commit_idx aggregate over their union — the counts sit IN the
    returned plan, never pre-collected driver-side)."""
    root = _inc_cycle_or_none(spark, sf_dir)
    if root is None:
        return spark.createDataFrame(
            [(1, 0), (2, 0)], "commit_idx long, n_rows long"
        )
    curated = os.path.join(root, "curated")
    gens: list[tuple[int, list[str]]] = []
    prev_files: list[str] | None = None
    for i, (key, _fname) in enumerate(pio.list_manifests(curated), 1):
        files, _ = pio.atomic_snapshot_files(curated, as_of_seq=key[0])
        if prev_files is None:
            added = list(files)
        else:
            missing = set(prev_files) - set(files)
            if missing:
                # mirror read_parquet_atomic_incremental's contract:
                # a rewritten file means an overwrite/compaction —
                # the commit trail is not an append chain
                raise ValueError(
                    f"non-append history at commit {i}: {len(missing)} "
                    "file(s) from the previous snapshot were rewritten; "
                    "incremental census is not sound — run a full diff"
                )
            prev = set(prev_files)
            added = [f for f in files if f not in prev]
        gens.append((i, added))
        prev_files = files
    ids = spark.createDataFrame(
        [(i,) for i, _ in gens], "commit_idx long"
    )
    parts = [
        spark.read.parquet(
            *[os.path.join(curated, f) for f in fl]
        ).select(F.lit(i).cast("long").alias("commit_idx"))
        for i, fl in gens
        if fl
    ]
    if not parts:
        return ids.select(
            "commit_idx", F.lit(0).cast("long").alias("n_rows")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    counts = u.groupBy("commit_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    return ids.join(counts, "commit_idx", "left").select(
        "commit_idx",
        F.coalesce(F.col("n_rows"), F.lit(0).cast("long")).alias("n_rows"),
    )
