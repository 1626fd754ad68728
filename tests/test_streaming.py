"""Streaming smoke tests: drive real readStream queries to completion
through the memory sink and reconcile them with their batch twins."""

from __future__ import annotations

import shutil
import uuid

import pytest
from datetime import timezone
from pyspark.sql import functions as F

from pfithic_spark import streaming as strm


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Copy the events fixture into a temp dir (file streams want a
    directory they can list)."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    yield str(d)


def _run(spark, df, mode):
    name = f"s_{uuid.uuid4().hex[:8]}"
    return strm.run_to_memory_sink(df, name, mode=mode)


def test_stream_tumbling_matches_batch(spark, sf_dir, stream_dir):
    stream = strm.read_event_stream(spark, stream_dir)
    out = _run(spark, strm.tumbling_counts(stream), "complete").collect()
    assert len(out) > 0
    # reconcile against the batch twin: same total event count
    batch_total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in out) == batch_total
    # window bounds are 1h-aligned
    for r in out:
        assert r["window"].start.minute == 0 and r["window"].start.second == 0


def test_stream_session_counts(spark, sf_dir, stream_dir):
    stream = strm.read_event_stream(spark, stream_dir)
    out = _run(spark, strm.session_counts(stream), "complete").collect()
    assert len(out) > 0
    batch_total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in out) == batch_total
    # one state row per (user, session); users in fixture: 15
    users = {r["user_id"] for r in out}
    assert len(users) > 1


def test_stream_dedup_within_watermark(spark, stream_dir):
    stream = strm.read_event_stream(spark, stream_dir)
    out = _run(spark, strm.dedup_within_watermark(stream), "append")
    n = out.count()
    ids = out.select("event_id").distinct().count()
    assert n == ids > 0


def test_stream_stream_join_within(spark, sf_dir, stream_dir):
    """Stream-stream join with watermarks + time-range bound: results
    must equal the equivalent batch self-join."""
    s1 = strm.read_event_stream(spark, stream_dir)
    s2 = strm.read_event_stream(spark, stream_dir)
    out = _run(
        spark, strm.join_streams_within(s1, s2, within="30 minutes"), "append"
    )
    got = out.count()
    assert got > 0
    from pfithic_spark.io import epoch_us

    ev_raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev_raw.select(
        "user_id", "event_id", epoch_us(ev_raw).alias("us")
    )
    a, b = ev.alias("a"), ev.alias("b")
    want = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.us") <= F.col("a.us"))
        & (F.col("b.us") >= F.col("a.us") - 1_800_000_000),
    ).count()
    assert got == want


def test_sliding_replication_factor(spark, sf_dir):
    """Batch twin sanity: 1h/15min sliding puts every event in exactly
    4 windows."""
    import __spark_entry__ as e

    ev_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out = e.queries()["q_stream_sliding"](spark, sf_dir)
    assert out.agg(F.sum("n_events")).collect()[0][0] == 4 * ev_n


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode tumbling agg under a 2h watermark: an event arriving
    in a later micro-batch but 3h behind the stream's max event time is
    dropped; on-time windows finalize and emit."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late_stream"
    d.mkdir()
    h = 1_700_000_000_000_000_000  # base ns, hour-aligned enough
    hour = 3_600 * 10**9

    def write(name, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        # ts arrives as epoch-ns ints; store as TIMESTAMP(MICROS) to
        # match the driver fixture's physical encoding
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ns")
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), d / name)
        os.utime(d / name, (mtime, mtime))

    now = time.time()
    # four micro-batches: W0 events; +4h; +8h; then ONE event back in W0.
    # Note: the filtering watermark lags one batch behind the advertised
    # one in this Spark build, hence two advancing batches before the
    # late arrival.
    write(
        "f1.parquet",
        [(i, h + i * 10**9, 1, "click", 1.0, "{}") for i in range(10)],
        now - 100,
    )
    write(
        "f2.parquet",
        [(100 + i, h + 4 * hour + i * 10**9, 1, "click", 1.0, "{}") for i in range(5)],
        now - 80,
    )
    write(
        "f3.parquet",
        [(200 + i, h + 8 * hour + i * 10**9, 1, "click", 1.0, "{}") for i in range(5)],
        now - 60,
    )
    write("f4.parquet", [(999, h + 30 * 10**9, 1, "late", 1.0, "{}")], now - 40)

    stream = strm.read_event_stream(spark, str(d), max_files_per_trigger=1)
    name = "late_drop_t"
    q = (
        strm.tumbling_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for s in p.get("stateOperators", [])
    )
    q.stop()
    out = spark.sql(f"SELECT * FROM {name}").collect()
    assert dropped == 1  # the 8h-late row was dropped by the watermark
    types = {r["event_type"] for r in out}
    assert "late" not in types
    # pin the naive collected datetime to UTC: .timestamp() alone reads
    # it in the host TZ and only matches epoch math on UTC machines
    w0 = [
        r
        for r in out
        if abs(
            r["window"].start.replace(tzinfo=timezone.utc).timestamp() * 10**9
            - (h - h % hour)
        )
        < hour
    ]
    assert w0 and w0[0]["n_events"] == 10  # on-time window finalized intact


def test_stateful_user_totals(spark, sf_dir, stream_dir):
    """applyInPandasWithState custom stateful operator: final emitted
    state per user equals the batch groupBy totals."""
    stream = strm.read_event_stream(spark, stream_dir)
    out = _run(spark, strm.stateful_user_totals(stream), "update").collect()
    assert len(out) > 0
    # update mode with one input file → one state row per user; totals
    # must reconcile with the batch twin
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tot"))
        .collect()
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out}
    for r in batch:
        n, tot = got[r["user_id"]]
        assert n == r["n"]
        assert abs(tot - r["tot"]) < 1e-6


def test_stream_static_enrich(spark, sf_dir, stream_dir):
    """Stream-static broadcast join preserves every stream row and
    attaches the dim attribute."""
    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"), (F.col("id") % 3).alias("tier")
    )
    stream = strm.read_event_stream(spark, stream_dir)
    out = _run(spark, strm.enrich_with_dim(stream, dim), "append")
    n_stream = out.count()
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n_stream == n_batch
    assert out.filter(F.col("tier").isNull()).count() == 0


def test_stream_parquet_sink_exactly_once(spark, sf_dir, stream_dir, tmp_path):
    """Checkpointed parquet sink: restarting the same query over the
    same source appends nothing new (exactly-once via the commit log)."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    for _ in range(2):  # second start replays the committed offsets
        stream = strm.read_event_stream(spark, stream_dir)
        q = strm.write_stream_parquet(strm.dedup_within_watermark(stream), out, ck)
        q.awaitTermination(120)
        q.stop()
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.parquet(out).count() == n_batch


def test_stream_foreach_batch_sink(spark, sf_dir, stream_dir, tmp_path):
    """foreachBatch: per-microbatch batch logic (grouped write)."""
    out, ck = str(tmp_path / "fb_out"), str(tmp_path / "fb_ck")

    def handle(df, epoch_id):
        (
            df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(out)
        )

    stream = strm.read_event_stream(spark, stream_dir)
    q = strm.write_stream_foreach_batch(stream, handle, ck)
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out).agg(F.sum("n")).collect()[0][0]
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got == n_batch


def test_trending_topk_foreach_batch(spark, sf_dir, tmp_path):
    """Streaming trending top-k: windowed counts stream into
    foreachBatch, which applies the rank prune as batch logic.  Two
    micro-batches over the same file: batch 1 advances the watermark,
    batch 2 finalizes and emits every window behind it."""
    import shutil

    d = tmp_path / "trend_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")
    out, ck = str(tmp_path / "trend_out"), str(tmp_path / "trend_ck")
    stream = strm.read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = strm.trending_topk_sink(stream, out, ck, k=3)
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out)
    rows = got.collect()
    assert len(rows) > 0
    assert all(1 <= r["rnk"] <= 3 for r in rows)
    # per emitted window the rank-1 type must match the batch twin
    # (each event was ingested twice, which scales every count by 2 —
    # rank order is unaffected)
    import __spark_entry__ as e

    twin = e.queries()["q_stream_topk"](spark, sf_dir)
    want_top = {
        r["window_start_s"]: r["event_type"]
        for r in twin.collect()
        if r["rnk"] == 1
    }
    for r in rows:
        if r["rnk"] == 1:
            # UTC-pinned for non-UTC hosts (same as the watermark test)
            ws = int(r["window_start"].replace(tzinfo=timezone.utc).timestamp())
            assert want_top[ws] == r["event_type"], ws
    # restart idempotency: a FULL re-run with a FRESH checkpoint into
    # the SAME out_path must not duplicate windows — the sink keys its
    # dynamic partition overwrite on window_start_s, not the epoch id
    ck2 = str(tmp_path / "trend_ck2")
    q2 = strm.trending_topk_sink(stream, out, ck2, k=3)
    q2.awaitTermination(120)
    q2.stop()
    again = spark.read.parquet(out).collect()
    assert sorted(
        (r["window_start_s"], r["event_type"], r["rnk"]) for r in again
    ) == sorted((r["window_start_s"], r["event_type"], r["rnk"]) for r in rows)



# --- late-data property test (hypothesis) --------------------------------


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HOUR_NS = 3_600 * 10**9
_MIN_NS = 60 * 10**9
_BASE_NS = 1_700_000_000_000_000_000


def _bounds_for(batches, watermark_hours=2):
    """Conservative simulation of append-mode watermark semantics.

    Spark guarantees (Structured Streaming docs): a row is dropped ONLY
    if it is behind the watermark, and the engine's filtering watermark
    never runs ahead of (max event time of completed batches − W).  So
    rows that are on-time even against that most AGGRESSIVE possible
    watermark are definitely kept; everything else is possibly dropped.
    Returns per-window {definitely_kept} and {total} input-row counts,
    keyed by hour-window index.
    """
    kept_lower: dict[int, int] = {}
    total: dict[int, int] = {}
    seen_max = None
    w_ns = watermark_hours * _HOUR_NS
    for batch in batches:
        for off_min in batch:
            t = _BASE_NS + off_min * _MIN_NS
            win = t // _HOUR_NS
            total[win] = total.get(win, 0) + 1
            if seen_max is None or t >= seen_max - w_ns:
                kept_lower[win] = kept_lower.get(win, 0) + 1
        batch_max = max(
            (_BASE_NS + o * _MIN_NS for o in batch), default=None
        )
        if batch_max is not None:
            seen_max = batch_max if seen_max is None else max(seen_max, batch_max)
    return kept_lower, total


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=1200),  # minutes (≤20 h)
            min_size=1,
            max_size=6,
        ),
        min_size=2,
        max_size=4,
    )
)
def test_watermark_late_data_property(spark, tmp_path_factory, batches):
    """For ANY out-of-order arrival pattern, the append-mode tumbling
    agg under a 2 h watermark must: (a) emit each window at most once,
    (b) count at most the window's true input rows and at least its
    definitely-on-time rows, (c) drop nothing when nothing was ever
    late, and (d) never report more watermark drops than there are
    possibly-late rows.  Exact input-row conservation is NOT asserted:
    numRowsDroppedByWatermark counts post-partial-aggregation state
    rows, so one dropped metric row can represent several input rows.
    """
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("wm_prop")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    now = time.time()
    eid = 0
    # final flush batch far ahead finalizes every real window
    flush_min = 100 * 60
    all_batches = [list(b) for b in batches] + [[flush_min]]
    for i, batch in enumerate(all_batches):
        rows = []
        for off_min in batch:
            t = _BASE_NS + off_min * _MIN_NS
            rows.append((eid, pd.Timestamp(t, unit="ns"), 1, "e", 1.0, "{}"))
            eid += 1
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        f = d / f"f{i:03d}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), f)
        os.utime(f, (now - 1000 + i, now - 1000 + i))
    stream = strm.read_event_stream(spark, str(d), max_files_per_trigger=1)
    name = f"wm_prop_{uuid.uuid4().hex[:8]}"
    q = (
        strm.tumbling_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for s in p.get("stateOperators", [])
    )
    q.stop()
    out = spark.sql(f"SELECT * FROM {name}").collect()
    emitted = {}
    for r in out:
        win = int(
            r["window"].start.replace(tzinfo=timezone.utc).timestamp()
            * 10**9
            // _HOUR_NS
        )
        # (a) append mode finalizes each window exactly once
        assert win not in emitted, f"window {win} emitted twice"
        emitted[win] = r["n_events"]
    kept_lower, total = _bounds_for(batches)
    n_real = sum(total.values())
    n_safe = sum(kept_lower.values())
    flush_win = (_BASE_NS + flush_min * _MIN_NS) // _HOUR_NS
    emitted_real = {w: n for w, n in emitted.items() if w != flush_win}
    for win, n in emitted_real.items():
        # (b) per-window bounds from the watermark contract
        assert kept_lower.get(win, 0) <= n <= total[win], (
            win, kept_lower.get(win, 0), n, total[win],
        )
    # windows with definitely-kept rows must appear at all
    for win, lo in kept_lower.items():
        if lo > 0:
            assert win in emitted_real, f"window {win} never emitted"
    # (c) nothing possibly late → exact conservation, zero drops
    if n_safe == n_real:
        assert dropped == 0
        assert sum(emitted_real.values()) == n_real
    # (d) drops bounded by the possibly-late row count
    assert dropped <= n_real - n_safe


def test_atomic_txid_commit_is_idempotent(spark, tmp_path):
    """Same txid twice → second commit is a no-op returning the
    existing manifest (the foreachBatch replay case)."""
    from pfithic_spark.io import read_parquet_atomic, write_parquet_atomic

    path = str(tmp_path / "txn")
    d = spark.range(5).withColumnRenamed("id", "v")
    m1 = write_parquet_atomic(d, path, mode="append", txid="batch-1")
    m2 = write_parquet_atomic(d, path, mode="append", txid="batch-1")
    assert m1 == m2
    assert read_parquet_atomic(spark, path).count() == 5
    write_parquet_atomic(d, path, mode="append", txid="batch-2")
    assert read_parquet_atomic(spark, path).count() == 10


def test_stream_atomic_sink_exactly_once(spark, tmp_path, stream_dir):
    """availableNow stream → atomic table: rows match the source with
    one manifest per micro-batch; a manual replay of an already-
    committed epoch changes nothing (exactly-once under at-least-once
    foreachBatch)."""
    import os

    from pfithic_spark.io import read_parquet_atomic, write_parquet_atomic

    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = strm.read_event_stream(spark, stream_dir)
    q = strm.write_stream_atomic(stream, table, ckpt)
    q.awaitTermination(120)
    src = spark.read.parquet(stream_dir)
    got = read_parquet_atomic(spark, table)
    assert got.count() == src.count()
    n_manifests = sum(
        1 for n in os.listdir(table) if n.startswith("manifest-")
    )
    assert n_manifests >= 1
    # replay epoch 0 by hand — the txid check must make it a no-op;
    # the app id is anchored in the checkpoint dir marker (stable
    # across path spellings / cwd, unlike a path hash)
    with open(os.path.join(ckpt, "_pfithic_app_id")) as fh:
        app_id = fh.read().strip()
    write_parquet_atomic(
        src, table, mode="append", txid=f"app-{app_id}-batch-{0:010d}"
    )
    assert read_parquet_atomic(spark, table).count() == src.count()
    assert (
        sum(1 for n in os.listdir(table) if n.startswith("manifest-"))
        == n_manifests
    )
    # a SECOND query (fresh checkpoint) restarts epochs at 0 — its
    # app id differs, so its batch-0 must COMMIT, not be swallowed as
    # a replay of the first query's epoch 0
    ckpt2 = str(tmp_path / "ckpt2")
    q2 = strm.write_stream_atomic(
        strm.read_event_stream(spark, stream_dir), table, ckpt2
    )
    q2.awaitTermination(120)
    assert read_parquet_atomic(spark, table).count() == 2 * src.count()


def test_vacuum_preserves_txid_idempotence(spark, tmp_path):
    """Exactly-once must survive VACUUM: expired manifests carried the
    txids, but the seen-set is cumulative in the newest manifest, so a
    replay of a vacuumed-away epoch is still a no-op."""
    from pfithic_spark.io import (
        read_parquet_atomic,
        vacuum_parquet_atomic,
        write_parquet_atomic,
    )

    path = str(tmp_path / "vtx")
    d = spark.range(3).withColumnRenamed("id", "v")
    for i in range(4):
        write_parquet_atomic(d, path, mode="append", txid=f"e-{i}")
    assert read_parquet_atomic(spark, path).count() == 12
    res = vacuum_parquet_atomic(path, keep_last_n=1)
    assert res["manifests_removed"] == 3
    # replay an epoch whose manifest was just vacuumed
    write_parquet_atomic(d, path, mode="append", txid="e-0")
    assert read_parquet_atomic(spark, path).count() == 12  # unchanged


def test_txid_watermark_compaction_and_legacy_fallback(spark, tmp_path):
    """Batch-shaped txids compact into a per-app watermark (manifest
    size bounded at any batch count); pre-registry tables fall back to
    a one-time history scan and get harvested on the next commit."""
    import json
    import os

    from pfithic_spark.io import (
        _newest_manifest_entry,
        read_parquet_atomic,
        write_parquet_atomic,
    )

    path = str(tmp_path / "wm")
    d = spark.range(2).withColumnRenamed("id", "v")
    for ep in range(5):
        write_parquet_atomic(
            d, path, mode="append", txid=f"app-x-batch-{ep:010d}"
        )
    name, meta = _newest_manifest_entry(path)
    assert meta["txids"] == []  # all compacted into the watermark
    assert meta["tx_watermarks"] == {"app-x-batch-": 4}
    # any epoch ≤ watermark replays as a no-op
    write_parquet_atomic(d, path, mode="append", txid="app-x-batch-0000000002")
    assert read_parquet_atomic(spark, path).count() == 10
    # irregular ids go to the explicit list
    write_parquet_atomic(d, path, mode="append", txid="manual-load-1")
    _, meta2 = _newest_manifest_entry(path)
    assert meta2["txids"] == ["manual-load-1"]

    # legacy table: strip the registry fields from the newest manifest
    legacy = str(tmp_path / "legacy")
    write_parquet_atomic(d, legacy, mode="append", txid="old-1")
    nm, m = _newest_manifest_entry(legacy)
    for k in ("txids", "tx_watermarks"):
        m.pop(k, None)
    with open(os.path.join(legacy, nm), "w") as fh:
        json.dump(m, fh)
    # replay of the pre-registry txid must still no-op (history scan)
    write_parquet_atomic(d, legacy, mode="append", txid="old-1")
    assert read_parquet_atomic(spark, legacy).count() == 2
    # a new commit harvests history into the registry
    write_parquet_atomic(d, legacy, mode="append", txid="new-1")
    _, m2 = _newest_manifest_entry(legacy)
    assert set(m2["txids"]) >= {"old-1", "new-1"}


def test_txid_backfill_batch_shaped_ids_not_swallowed(spark, tmp_path):
    """Caller ids that merely END in '-batch-N' keep exact list
    semantics: an out-of-order backfill must COMMIT, not be dropped by
    a watermark (the reserved 'app-<id>-batch-' namespace alone
    compacts)."""
    from pfithic_spark.io import read_parquet_atomic, write_parquet_atomic

    path = str(tmp_path / "bf")
    d = spark.range(3).withColumnRenamed("id", "v")
    write_parquet_atomic(d, path, mode="append", txid="ingest-batch-10")
    write_parquet_atomic(d, path, mode="append", txid="ingest-batch-9")
    assert read_parquet_atomic(spark, path).count() == 6
    # true replay of either still no-ops
    write_parquet_atomic(d, path, mode="append", txid="ingest-batch-9")
    assert read_parquet_atomic(spark, path).count() == 6


def test_app_id_marker_stable_across_spellings(spark, tmp_path):
    """file:/ URI, file:/// URI, and the plain path must resolve to the
    same checkpoint marker (same app id)."""
    import os

    from pfithic_spark import streaming as s

    base = str(tmp_path / "ckspell")
    # one real streaming run creates the marker via the plain path
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.range(3).select(
        F.col("id").alias("event_id"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir))
    table = str(tmp_path / "tbl2")
    q = s.write_stream_atomic(
        s.read_event_stream(spark, str(src_dir)), table, base
    )
    q.awaitTermination(60)
    with open(os.path.join(base, "_pfithic_app_id")) as fh:
        first_id = fh.read().strip()
    # a respelled restart reuses the SAME marker (no new mint)
    q2 = s.write_stream_atomic(
        s.read_event_stream(spark, str(src_dir)), table, f"file:{base}"
    )
    q2.awaitTermination(60)
    with open(os.path.join(base, "_pfithic_app_id")) as fh:
        assert fh.read().strip() == first_id
    from pfithic_spark.io import read_parquet_atomic

    # same checkpoint + same epochs → replay no-ops, rows NOT doubled
    assert read_parquet_atomic(spark, table).count() == 3


def test_scd2_stream_sink_versions_dimension(spark, tmp_path):
    """CDC stream → SCD2 atomic dimension: two micro-batches with a
    changed, an unchanged, and a new key must yield correct version
    chains, current flags, and time-travelable batch snapshots."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pfithic_spark.io import read_parquet_atomic

    d = tmp_path / "cdc"
    d.mkdir()
    h = 1_700_000_000_000_000  # µs

    def write(name, rows, mtime):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), d / name)
        import time as _t

        os.utime(d / name, (mtime, mtime))

    import time as _t

    now = _t.time()
    # batch 1: users 1,2 get values; user 1 updates twice in-batch
    # (latest wins: 15.0)
    write(
        "b1.parquet",
        [
            (1, h + 1_000_000, 1, "set", 10.0, "{}"),
            (2, h + 2_000_000, 1, "set", 15.0, "{}"),
            (3, h + 3_000_000, 2, "set", 20.0, "{}"),
        ],
        now - 100,
    )
    # batch 2: user 1 changes, user 2 unchanged value, user 3 new
    write(
        "b2.parquet",
        [
            (4, h + 10_000_000, 1, "set", 99.0, "{}"),
            (5, h + 11_000_000, 2, "set", 20.0, "{}"),
            (6, h + 12_000_000, 3, "set", 7.0, "{}"),
        ],
        now - 50,
    )
    table = str(tmp_path / "dim")
    q = strm.scd2_stream_sink(
        strm.read_event_stream(spark, str(d)), table, str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    rows = {
        (r["k"], r["valid_from"]): r
        for r in read_parquet_atomic(spark, table).collect()
    }
    # user 1: closed v=15 @ t+2s..t+10s, open v=99 @ t+10s
    v1a = rows[(1, h + 2_000_000)]
    assert (v1a["val"], v1a["valid_to"], v1a["is_current"]) == (
        15.0,
        h + 10_000_000,
        False,
    )
    v1b = rows[(1, h + 10_000_000)]
    assert (v1b["val"], v1b["valid_to"], v1b["is_current"]) == (99.0, None, True)
    # user 2: single OPEN version (batch-2 value identical → no churn)
    v2 = rows[(2, h + 3_000_000)]
    assert (v2["val"], v2["valid_to"], v2["is_current"]) == (20.0, None, True)
    assert len([k for k in rows if k[0] == 2]) == 1
    # user 3: new in batch 2
    v3 = rows[(3, h + 12_000_000)]
    assert (v3["val"], v3["is_current"]) == (7.0, True)
    # time travel: snapshot 1 (after batch 1) has only users 1,2, all open
    snap1 = read_parquet_atomic(spark, table, as_of_seq=1).collect()
    assert {r["k"] for r in snap1} == {1, 2}
    assert all(r["is_current"] for r in snap1)


def test_scd2_stream_sink_stale_and_null_changes_ignored(spark, tmp_path):
    """Out-of-order (stale) events and NULL-value events must not
    corrupt the version chain: the dimension keeps its current version
    untouched."""
    import os
    import time as _t

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pfithic_spark.io import read_parquet_atomic

    d = tmp_path / "cdc2"
    d.mkdir()
    h = 1_700_000_000_000_000

    def write(name, rows, mtime):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), d / name)
        os.utime(d / name, (mtime, mtime))

    now = _t.time()
    write("b1.parquet", [(1, h + 5_000_000, 1, "set", 10.0, "{}")], now - 100)
    # batch 2: a STALE change (t2 < t5) and a NULL-value change
    write(
        "b2.parquet",
        [
            (2, h + 2_000_000, 1, "set", 7.0, "{}"),
            (3, h + 9_000_000, 1, "set", None, "{}"),
        ],
        now - 50,
    )
    table = str(tmp_path / "dim2")
    q = strm.scd2_stream_sink(
        strm.read_event_stream(spark, str(d)), table, str(tmp_path / "ck2")
    )
    q.awaitTermination(120)
    rows = read_parquet_atomic(spark, table).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["val"], r["valid_from"], r["valid_to"], r["is_current"]) == (
        1,
        10.0,
        h + 5_000_000,
        None,
        True,
    )


def test_app_id_marker_race_converges(tmp_path):
    """Concurrent starters on one checkpoint must resolve the SAME app
    id, and the marker must never be observable empty/partial (the
    link(2)-election protocol; ADVICE r4 found the old O_EXCL mint
    publishes the path before the bytes).  Hammer the mint from many
    processes and assert one id wins everywhere."""
    import multiprocessing as mp

    ck = str(tmp_path / "race_ck")

    ids = []
    ctx = mp.get_context("spawn")
    with ctx.Pool(8) as pool:
        ids = pool.map(_mint_app_id, [ck] * 32)
    assert len(set(ids)) == 1, f"divergent app ids: {set(ids)}"
    assert ids[0] and len(ids[0]) == 12


def _mint_app_id(ck):
    from pfithic_spark.streaming import _checkpoint_app_id

    return _checkpoint_app_id(ck)


def test_app_id_empty_marker_refused(tmp_path):
    """A pre-fix empty marker (interrupted O_EXCL mint) must raise, not
    silently mint a divergent id."""
    import os

    import pytest as _pytest

    ck = str(tmp_path / "empty_ck")
    os.makedirs(ck)
    open(os.path.join(ck, "_pfithic_app_id"), "w").close()
    with _pytest.raises(RuntimeError, match="empty app-id marker"):
        strm._checkpoint_app_id(ck)


def _events_dir(tmp_path, name, batches):
    """Write one parquet file per micro-batch of (event_id, ts_us,
    user_id, event_type, value, props) rows, mtime-ordered so the file
    source triggers them in sequence."""
    import os
    import time as _t

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    now = _t.time()
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema), d / f"b{i}.parquet"
        )
        mt = now - 100 + 10 * i
        os.utime(d / f"b{i}.parquet", (mt, mt))
    return str(d)


def test_stream_atomic_sink_crash_mid_commit(spark, tmp_path):
    """Kill the writer BETWEEN staging and manifest publish mid-epoch
    (VERDICT r4 #5): readers must never see the torn state, and a
    restart on the same checkpoint must commit the crashed epoch
    exactly once — no dupes, no loss."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from pfithic_spark import io as pio
    from pfithic_spark.io import read_parquet_atomic

    h = 1_700_000_000_000_000
    src = _events_dir(
        tmp_path,
        "ev_crash",
        [
            [(i, h + i * 1_000_000, i % 3, "a", float(i), "{}") for i in range(5)],
            [(10 + i, h + (10 + i) * 1_000_000, i % 3, "b", float(i), "{}") for i in range(7)],
        ],
    )
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")

    calls = {"n": 0}

    def die_on_second_commit(path, txid):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before manifest publish")

    pio._FAILPOINT_BEFORE_COMMIT = die_on_second_commit
    try:
        q = strm.write_stream_atomic(
            strm.read_event_stream(spark, src), table, ckpt
        )
        with pytest.raises(StreamingQueryException, match="injected crash"):
            q.awaitTermination(120)
    finally:
        pio._FAILPOINT_BEFORE_COMMIT = None

    # torn state on disk: exactly one committed manifest (epoch 0), the
    # crashed epoch's staging dir + .tmp manifest are garbage
    names = os.listdir(table)
    assert sum(1 for n in names if n.startswith("manifest-") and n.endswith(".json")) == 1
    assert any(n.endswith(".json.tmp") for n in names)
    assert sum(1 for n in names if n.startswith("_staging_")) == 2
    # readers see ONLY epoch 0 — never the torn epoch
    assert read_parquet_atomic(spark, table).count() == 5

    # restart on the same checkpoint: epoch 1 replays and commits once
    q2 = strm.write_stream_atomic(
        strm.read_event_stream(spark, src), table, ckpt
    )
    q2.awaitTermination(120)
    got = read_parquet_atomic(spark, table)
    assert got.count() == 12  # 5 + 7, no dupes, no loss
    assert got.select("event_id").distinct().count() == 12


def test_stream_atomic_sink_crash_after_commit_before_checkpoint(
    spark, tmp_path
):
    """Kill the writer AFTER the manifest publish but BEFORE the
    checkpoint advances — the at-least-once replay window.  On restart
    the epoch replays with the same namespaced txid and must be a
    committed no-op (exactly-once), not a duplicate append."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from pfithic_spark import io as pio
    from pfithic_spark.io import read_parquet_atomic

    h = 1_700_000_000_000_000
    src = _events_dir(
        tmp_path,
        "ev_crash2",
        [
            [(i, h + i * 1_000_000, i % 3, "a", float(i), "{}") for i in range(4)],
            [(10 + i, h + (10 + i) * 1_000_000, i % 3, "b", float(i), "{}") for i in range(6)],
        ],
    )
    table = str(tmp_path / "tbl2")
    ckpt = str(tmp_path / "ck2")

    calls = {"n": 0}

    def die_after_second_commit(path, txid):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after commit")

    pio._FAILPOINT_AFTER_COMMIT = die_after_second_commit
    try:
        q = strm.write_stream_atomic(
            strm.read_event_stream(spark, src), table, ckpt
        )
        with pytest.raises(StreamingQueryException, match="injected crash"):
            q.awaitTermination(120)
    finally:
        pio._FAILPOINT_AFTER_COMMIT = None

    # BOTH epochs committed (the crash hit after publish)...
    assert read_parquet_atomic(spark, table).count() == 10
    n_manifests = sum(
        1 for n in os.listdir(table) if n.startswith("manifest-")
    )
    # ...but the checkpoint thinks epoch 1 is unfinished: the restart
    # REPLAYS it, and the txid dedup must swallow the replay
    q2 = strm.write_stream_atomic(
        strm.read_event_stream(spark, src), table, ckpt
    )
    q2.awaitTermination(120)
    got = read_parquet_atomic(spark, table)
    assert got.count() == 10  # unchanged — replay was a no-op
    assert got.select("event_id").distinct().count() == 10
    assert (
        sum(1 for n in os.listdir(table) if n.startswith("manifest-"))
        == n_manifests
    )


def test_scd2_sink_crash_mid_commit_recovers(spark, tmp_path):
    """scd2_stream_sink under a mid-commit crash on its second batch:
    restart must produce the IDENTICAL dimension an uncrashed run
    yields (version chains intact, no duplicate versions)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from pfithic_spark import io as pio
    from pfithic_spark.io import read_parquet_atomic

    h = 1_700_000_000_000_000
    batches = [
        [
            (1, h + 1_000_000, 1, "set", 10.0, "{}"),
            (2, h + 2_000_000, 2, "set", 20.0, "{}"),
        ],
        [
            (3, h + 10_000_000, 1, "set", 99.0, "{}"),
            (4, h + 11_000_000, 3, "set", 7.0, "{}"),
        ],
    ]
    src_a = _events_dir(tmp_path, "cdc_a", batches)
    src_b = _events_dir(tmp_path, "cdc_b", batches)

    # reference: uncrashed run
    tbl_ref = str(tmp_path / "dim_ref")
    q = strm.scd2_stream_sink(
        strm.read_event_stream(spark, src_a), tbl_ref, str(tmp_path / "ck_a")
    )
    q.awaitTermination(120)
    want = sorted(
        map(tuple, read_parquet_atomic(spark, tbl_ref).collect())
    )

    # crashed-and-restarted run
    tbl = str(tmp_path / "dim_crash")
    ck = str(tmp_path / "ck_b")
    calls = {"n": 0}

    def die_on_second_commit(path, txid):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected scd2 crash")

    pio._FAILPOINT_BEFORE_COMMIT = die_on_second_commit
    try:
        q1 = strm.scd2_stream_sink(
            strm.read_event_stream(spark, src_b), tbl, ck
        )
        with pytest.raises(StreamingQueryException, match="injected scd2"):
            q1.awaitTermination(120)
    finally:
        pio._FAILPOINT_BEFORE_COMMIT = None
    q2 = strm.scd2_stream_sink(
        strm.read_event_stream(spark, src_b), tbl, ck
    )
    q2.awaitTermination(120)
    got = sorted(map(tuple, read_parquet_atomic(spark, tbl).collect()))
    assert got == want


def test_agg_stream_sink_matches_batch_recompute(spark, tmp_path):
    """The streaming materialized view after N micro-batches must be
    BIT-IDENTICAL to a from-scratch batch aggregate over the same
    events (decimal-sum state ⇒ batching-invariant)."""
    from pfithic_spark.io import read_parquet_atomic

    h = 1_700_000_000_000_000
    batches = [
        [(i, h + i * 1_000_000, i % 5, f"t{i % 3}", float(i) / 7, "{}") for i in range(20)],
        [(50 + i, h + (50 + i) * 1_000_000, i % 5, f"t{i % 3}", float(i) * 1.5, "{}") for i in range(15)],
        [(90 + i, h + (90 + i) * 1_000_000, i % 5, f"t{(i + 1) % 3}", -float(i), "{}") for i in range(10)],
    ]
    src = _events_dir(tmp_path, "mv_src", batches)
    table = str(tmp_path / "mv_state")
    q = strm.agg_stream_sink(
        strm.read_event_stream(spark, src), table, str(tmp_path / "mv_ck")
    )
    q.awaitTermination(120)
    got = {
        r["g"]: (str(r["total"]), r["n"], r["avg"])
        for r in read_parquet_atomic(spark, table).collect()
    }
    full = (
        spark.read.parquet(src)
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("g"))
        .agg(
            F.sum(F.col("value").cast("decimal(28,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "g",
            F.col("s").cast("decimal(28,6)").alias("total"),
            "n",
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg"),
        )
    )
    want = {
        r["g"]: (str(r["total"]), r["n"], r["avg"]) for r in full.collect()
    }
    assert got == want
    # one snapshot per micro-batch → time travel to the batch-1 state
    import os

    assert (
        sum(1 for n in os.listdir(table) if n.startswith("manifest-")) == 3
    )


def test_agg_stream_sink_crash_and_replay_exact(spark, tmp_path):
    """Read-merge-overwrite's replay hazard: crash AFTER the epoch's
    commit but before the checkpoint advances, restart (the epoch
    re-merges against post-commit state — double-counted in memory),
    and assert the txid no-op discards the double count."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from pfithic_spark import io as pio
    from pfithic_spark.io import read_parquet_atomic

    h = 1_700_000_000_000_000
    batches = [
        [(i, h + i * 1_000_000, 0, "a", 1.0, "{}") for i in range(10)],
        [(20 + i, h + (20 + i) * 1_000_000, 0, "a", 2.0, "{}") for i in range(5)],
    ]
    src = _events_dir(tmp_path, "mv_crash", batches)
    table = str(tmp_path / "mv_state2")
    ck = str(tmp_path / "mv_ck2")

    calls = {"n": 0}

    def die_after_second(path, txid):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected mv crash")

    pio._FAILPOINT_AFTER_COMMIT = die_after_second
    try:
        q = strm.agg_stream_sink(
            strm.read_event_stream(spark, src), table, ck
        )
        with pytest.raises(StreamingQueryException, match="injected mv"):
            q.awaitTermination(120)
    finally:
        pio._FAILPOINT_AFTER_COMMIT = None
    # restart: epoch 1 replays, re-merges against post-commit state,
    # but the commit is a txid no-op — totals stay exact
    q2 = strm.agg_stream_sink(
        strm.read_event_stream(spark, src), table, ck
    )
    q2.awaitTermination(120)
    rows = read_parquet_atomic(spark, table).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["g"], str(r["total"]), r["n"], r["avg"]) == (
        "a",
        "20.000000",
        15,
        round(20.0 / 15, 6),
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(1, 4),            # user key
                st.integers(0, 30),           # ts offset (seconds)
                st.sampled_from([None, 1.0, 2.0, 3.0]),  # value
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_scd2_sink_matches_independent_fold(
    spark, tmp_path_factory, batches
):
    """scd2_stream_sink vs an INDEPENDENT in-order python fold over
    arbitrary random change logs (random keys, ts collisions, NULLs,
    stale updates, multi-batch interleavings): per batch, each key's
    latest non-null change applies iff the value differs and the event
    time is strictly newer than the open version."""
    import pandas as pd

    from pfithic_spark.io import read_parquet_atomic

    h = 1_700_000_000_000_000
    tmp = tmp_path_factory.mktemp("scd2_prop")
    rows_batches = []
    eid = 0
    for b in batches:
        rows = []
        for (k, off, val) in b:
            rows.append((eid, h + off * 1_000_000, k, "set", val, "{}"))
            eid += 1
        rows_batches.append(rows)
    src = _events_dir(tmp, "cdc", rows_batches)

    # independent reference fold (batch granularity, same rules)
    dim: dict = {}  # k -> list of [val, valid_from, valid_to, is_current]
    for rows in rows_batches:
        latest: dict = {}
        for (e, ts, k, _t, val, _p) in rows:
            if val is None:
                continue
            if k not in latest or (ts, e) > (latest[k][0], latest[k][1]):
                latest[k] = (ts, e, val)
        for k, (ts, e, val) in latest.items():
            if k not in dim:
                dim[k] = [[val, ts, None, True]]
            else:
                cur = dim[k][-1]
                if cur[0] != val and ts > cur[1]:
                    cur[2] = ts
                    cur[3] = False
                    dim[k].append([val, ts, None, True])
    want = sorted(
        (k, v[0], v[1], v[2], v[3])
        for k, versions in dim.items()
        for v in versions
    )

    table = str(tmp / "dim")
    q = strm.scd2_stream_sink(
        strm.read_event_stream(spark, src), table, str(tmp / "ck")
    )
    q.awaitTermination(180)
    if not want:
        try:
            got_rows = read_parquet_atomic(spark, table).collect()
        except FileNotFoundError:
            got_rows = []  # no batch produced any change: no table
    else:
        got_rows = read_parquet_atomic(spark, table).collect()
    got = sorted(
        (r["k"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in got_rows
    )
    assert got == want


def test_rolling_distinct_approx_tracks_exact(spark, sf_dir):
    """HLL rolling distinct (the at-scale WAU swap) stays within 5% of
    the exact sequence-explode rolling count on the events fixture."""
    from pfithic_spark import windows as winmod
    from pfithic_spark.io import epoch_us, load_table

    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.floor(epoch_us(ev, "ts") / F.lit(86_400_000_000)).alias("day"),
        "user_id",
    ).distinct()
    approx = {
        r["day"]: r["approx_distinct"]
        for r in winmod.rolling_distinct_approx(
            du, "day", "user_id"
        ).collect()
    }
    # exact rolling 7-day distinct via the q_wau explode shape
    rep = du.select(
        F.posexplode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("off", "report_day"),
        "user_id",
    )
    exact = {
        r["report_day"]: r["n"]
        for r in rep.groupBy("report_day")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.max((F.col("off") == 0).cast("int")).alias("obs"),
        )
        .filter("obs = 1")
        .collect()
    }
    assert set(approx) == set(exact)
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(3, 0.05 * n), (d, approx[d], n)


def test_stream_sink_auto_optimize(spark, sf_dir, tmp_path):
    """optimize_every_n_batches: every Nth epoch bin-packs the small
    batch files right after its commit — the newest snapshot stays at
    O(1) files while rows and exactly-once semantics are untouched."""
    import os

    from pfithic_spark.io import read_parquet_atomic

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(40)
    pdf = ev.toPandas()
    for i in range(4):
        spark.createDataFrame(pdf.iloc[i * 10:(i + 1) * 10]).coalesce(
            1
        ).write.mode("overwrite").parquet(str(src_dir / f"f{i}"))
    # flatten: the file source wants files in one listable dir
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil

    for i in range(4):
        part = next(
            p for p in os.listdir(src_dir / f"f{i}")
            if p.endswith(".parquet")
        )
        shutil.copy(src_dir / f"f{i}" / part, flat / f"part-{i:03d}.parquet")
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = strm.read_event_stream(spark, str(flat))  # 1 file/trigger
    q = strm.write_stream_atomic(
        stream, table, ckpt, optimize_every_n_batches=2
    )
    q.awaitTermination(120)
    got = read_parquet_atomic(spark, table)
    assert got.count() == 40
    manifests = sorted(
        n for n in os.listdir(table) if n.startswith("manifest-")
    )
    # 4 batch appends + 2 auto-optimizes (epochs 1 and 3)
    assert len(manifests) == 6, manifests
    import json

    newest = json.load(open(os.path.join(table, manifests[-1])))
    assert len(newest["files"]) == 1, newest["files"]


def test_simhash_index_stream_incremental_dedup(spark, tmp_path):
    """Incremental near-dup candidacy against the maintained band
    index: batch 2's copy of a batch-1 doc is flagged (new_doc,
    dup_of) through the standing index; two near-dups arriving in
    the SAME micro-batch flag each other within that epoch (round-9
    ADVICE: the candidates join must not be epoch<current only);
    unrelated docs are not flagged; the index accumulates every
    epoch's band rows with provenance, and signatures are IDENTICAL
    to the batch q_simhash_band_index format (shared
    llmops.simhash16_band_rows definition)."""
    import time as _time

    import __spark_entry__ as e
    from pfithic_spark import llmops, streaming as strm

    docs_dir = str(tmp_path / "docs_in")
    t1 = "the quick brown fox jumps over the lazy dog"
    t2 = "entirely different words about databases and sketches"
    b1 = spark.createDataFrame(
        [(1, t1, "s"), (2, t2, "s")],
        "doc_id long, text string, source string",
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{docs_dir}/b1")
    _time.sleep(1.1)  # distinct mtimes → deterministic batch order
    b2 = spark.createDataFrame(
        [
            (3, t1, "s"),
            (4, "unique new content entirely", "s"),
            (5, t1, "s"),  # within-batch dup of doc 3
        ],
        "doc_id long, text string, source string",
    )
    b2.coalesce(1).write.mode("overwrite").parquet(f"{docs_dir}/b2")
    # the file stream reads the leaf files; move them into one dir
    import glob
    import shutil

    for i, sub in enumerate(("b1", "b2")):
        for f in sorted(glob.glob(f"{docs_dir}/{sub}/part-*.parquet")):
            shutil.copy(f, f"{docs_dir}/{i:03d}.parquet")
        shutil.rmtree(f"{docs_dir}/{sub}")
        _time.sleep(1.1)

    idx_path = str(tmp_path / "band_index")
    cand_path = str(tmp_path / "cands")
    ck = str(tmp_path / "ck")
    stream = strm.read_document_stream(spark, docs_dir)
    q = strm.simhash_index_stream(stream, idx_path, cand_path, ck)
    q.awaitTermination(180)
    q.stop()

    cands = {
        (r["doc_id"], r["dup_of"])
        for r in spark.read.parquet(cand_path).collect()
    }
    # (3,1)/(5,1): via the standing index; (5,3): within batch 2
    assert cands == {(3, 1), (5, 1), (5, 3)}, cands

    idx = spark.read.parquet(idx_path)
    assert idx.count() == 5 * 4  # 5 docs × 4 band rows
    assert idx.select("epoch").distinct().count() == 2
    # signature parity with the batch key's format
    batch_rows = {
        (r["doc_id"], r["band"]): (r["band_key"], r["sig16"])
        for r in llmops.simhash16_band_rows(
            spark.createDataFrame(
                [(1, t1, "s"), (2, t2, "s"), (3, t1, "s"),
                 (4, "unique new content entirely", "s"),
                 (5, t1, "s")],
                "doc_id long, text string, source string",
            )
        ).collect()
    }
    for r in idx.collect():
        assert batch_rows[(r["doc_id"], r["band"])] == (
            r["band_key"],
            r["sig16"],
        )


def test_minhash_index_stream_incremental_dedup(spark, tmp_path):
    """Jaccard-side maintained index: batch 2's near-copy of a
    batch-1 doc is flagged through the standing MinHash band index;
    two near-dups arriving in the SAME micro-batch flag each other
    within that epoch; unrelated docs are not flagged; signatures
    are IDENTICAL to the batch q_minhash_signature_index format
    (shared llmops.md5_minhash_band_rows definition)."""
    import time as _time

    from pfithic_spark import llmops, streaming as strm

    docs_dir = str(tmp_path / "docs_in")
    t1 = "the quick brown fox jumps over the lazy dog"
    t1near = "the quick brown fox jumps over the lazy cat"  # 1 token off
    t2 = "entirely different words about databases and sketches"
    b1 = spark.createDataFrame(
        [(1, t1, "s"), (2, t2, "s")],
        "doc_id long, text string, source string",
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{docs_dir}/b1")
    _time.sleep(1.1)
    b2 = spark.createDataFrame(
        [(3, t1near, "s"), (4, "unique new content entirely", "s"),
         (5, t1, "s")],
        "doc_id long, text string, source string",
    )
    b2.coalesce(1).write.mode("overwrite").parquet(f"{docs_dir}/b2")
    import glob
    import shutil

    for i, sub in enumerate(("b1", "b2")):
        for f in sorted(glob.glob(f"{docs_dir}/{sub}/part-*.parquet")):
            shutil.copy(f, f"{docs_dir}/{i:03d}.parquet")
        shutil.rmtree(f"{docs_dir}/{sub}")
        _time.sleep(1.1)

    idx_path = str(tmp_path / "mh_index")
    cand_path = str(tmp_path / "mh_cands")
    ck = str(tmp_path / "mh_ck")
    stream = strm.read_document_stream(spark, docs_dir)
    q = strm.minhash_index_stream(stream, idx_path, cand_path, ck)
    q.awaitTermination(180)
    q.stop()

    cands = {
        (r["doc_id"], r["dup_of"])
        for r in spark.read.parquet(cand_path).collect()
    }
    # (5,1): exact copy via the standing index — guaranteed (all 4
    # bands agree); (5,3)/(3,1): 8/9-token Jaccard ≈ 0.78 — verify
    # against the signature truth rather than hard-coding band luck
    rows_all = {
        (r["doc_id"], r["band"]): r["band_key"]
        for r in llmops.md5_minhash_band_rows(
            spark.createDataFrame(
                [(1, t1, "s"), (3, t1near, "s"), (5, t1, "s"),
                 (2, t2, "s"), (4, "unique new content entirely", "s")],
                "doc_id long, text string, source string",
            )
        ).collect()
    }

    def share_band(a, b):
        return any(
            rows_all[(a, bb)] == rows_all[(b, bb)] for bb in range(4)
        )

    expected = set()
    if share_band(5, 1):
        expected.add((5, 1))
    if share_band(3, 1):
        expected.add((3, 1))
    if share_band(5, 3):
        expected.add((5, 3))
    assert (5, 1) in expected  # exact copy always collides
    assert cands == expected, (cands, expected)
    # docs 2 and 4 never appear
    assert all(a not in (2, 4) and b not in (2, 4) for a, b in cands)

    idx = spark.read.parquet(idx_path)
    assert idx.count() == 5 * 4  # 5 docs x 4 band rows
    assert idx.select("epoch").distinct().count() == 2
    for r in idx.collect():
        assert rows_all[(r["doc_id"], r["band"])] == r["band_key"]


def test_hll_register_stream_matches_batch_registers(spark, tmp_path):
    """Streamed per-epoch daily registers, folded by MAX, must equal
    the batch registers over the union of all events (merge
    associativity live in the stream — the q_sketch_merge property),
    even when one day's users are split across micro-batches."""
    import time as _time

    from pfithic_spark import llmops, streaming as strm

    ev_dir = str(tmp_path / "ev_in")
    rows1 = [
        (1, "2024-01-01 10:00:00", 101, "A"),
        (2, "2024-01-01 11:00:00", 202, "A"),
        (3, "2024-01-02 10:00:00", 303, "A"),
    ]
    rows2 = [
        (4, "2024-01-01 12:00:00", 404, "A"),  # day 0 continues
        (5, "2024-01-03 10:00:00", 505, "A"),
    ]

    def write(name, rows):
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
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{ev_dir}/{name}")
        )

    import glob
    import shutil

    for i, rows in enumerate((rows1, rows2)):
        write(f"b{i}", rows)
        for f in sorted(glob.glob(f"{ev_dir}/b{i}/part-*.parquet")):
            shutil.copy(f, f"{ev_dir}/{i:03d}.parquet")
        shutil.rmtree(f"{ev_dir}/b{i}")
        _time.sleep(1.1)

    reg_path = str(tmp_path / "registers")
    ck = str(tmp_path / "hll_ck")
    stream = strm.read_event_stream(spark, ev_dir)
    q = strm.hll_register_stream(stream, reg_path, ck)
    q.awaitTermination(180)
    q.stop()

    folded = {
        (r["day"], r["bucket"]): r["rho"]
        for r in strm.fold_hll_registers(spark, reg_path).collect()
    }
    all_events = spark.createDataFrame(
        rows1 + rows2,
        "event_id long, t string, user_id long, event_type string",
    ).select(
        "event_id",
        F.col("t").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    )
    batch = {
        (r["day"], r["bucket"]): r["rho"]
        for r in llmops.hll_daily_registers(all_events).collect()
    }
    assert folded == batch
    assert len({d for d, _ in folded}) == 3  # three distinct days
    # the streamed table kept per-epoch provenance
    eps = spark.read.parquet(reg_path).select("epoch").distinct().count()
    assert eps == 2


def test_read_prior_index_downgrade_vs_reraise(spark, tmp_path):
    """First-epoch detection contract (ADVICE r10 #3): a MISSING
    index path downgrades to None (no standing index yet); a PRESENT
    but unreadable/corrupt index RE-RAISES so Spark retries the epoch
    instead of silently losing recall forever."""
    from pyspark.errors import AnalysisException

    missing = str(tmp_path / "never_written")
    assert strm._read_prior_index(spark, missing, epoch=0) is None

    corrupt = tmp_path / "corrupt_index"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
    # a corrupt index must RE-RAISE (schema inference / footer read
    # fails), never downgrade to the "no index yet" None — a silent
    # None here is the permanent-recall-loss bug.  The downgrade check
    # runs OUTSIDE pytest.raises so a wrong None fails loudly.
    raised = False
    df = None
    try:
        df = strm._read_prior_index(spark, str(corrupt), epoch=5)
        if df is not None:
            df.collect()  # lazy footer reads surface here
    except Exception:
        raised = True
    assert df is not None or raised, "corrupt index was downgraded to None"
    assert raised, "corrupt index did not raise"

    # a real prior index reads back filtered to epoch < current
    good = str(tmp_path / "good_index")
    spark.range(4).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).alias("epoch")
    ).write.partitionBy("epoch").parquet(good)
    df = strm._read_prior_index(spark, good, epoch=1)
    assert df is not None and df.count() == 2
    assert df.filter(F.col("epoch") >= 1).count() == 0


def test_drift_panel_stream_matches_batch_panel(spark, tmp_path):
    """The streamed drift panel must equal the batch panel on the
    same corpus regardless of batching: two micro-batches of planted
    docs -> per-epoch count partials -> fold -> EXACT row equality
    with psi_panel_from_counts fed by a one-shot batch aggregate of
    the union (counts are sum-mergeable, the whole point)."""
    import glob
    import shutil
    import time as _time

    from pfithic_spark.registry.keys_r10 import psi_panel_from_halves

    docs_dir = str(tmp_path / "docs_in")
    rows1 = [(i, "x" * (10 + 7 * (i % 5)), f"s{i % 2}") for i in range(1, 40)]
    rows2 = [(i, "y" * (3 + 11 * (i % 7)), f"s{i % 2}") for i in range(40, 90)]
    for n, rows in (("b1", rows1), ("b2", rows2)):
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{docs_dir}/{n}")
    for i, sub in enumerate(("b1", "b2")):
        for f in sorted(glob.glob(f"{docs_dir}/{sub}/part-*.parquet")):
            shutil.copy(f, f"{docs_dir}/{i:03d}.parquet")
        shutil.rmtree(f"{docs_dir}/{sub}")
        _time.sleep(1.1)

    counts_path = str(tmp_path / "drift_counts")
    ck = str(tmp_path / "ck")
    q = strm.drift_panel_stream(
        strm.read_document_stream(spark, docs_dir), counts_path, ck
    )
    q.awaitTermination(180)
    q.stop()

    # two epochs landed with provenance
    eps = spark.read.parquet(counts_path).select("epoch").distinct().count()
    assert eps == 2

    streamed = sorted(
        map(tuple, strm.fold_drift_panel(spark, counts_path).collect())
    )
    all_docs = spark.createDataFrame(
        rows1 + rows2, "doc_id long, text string, source string"
    )
    b = all_docs.filter(F.length("text") >= 1).select(
        "source",
        (F.col("doc_id") % 2).alias("half"),
        (F.length(F.bin(F.length("text").cast("long"))) - 1).alias(
            "bucket"
        ),
    )
    batch = sorted(map(tuple, psi_panel_from_halves(b).collect()))
    assert streamed == batch and len(batch) == 2


def test_ivf_assignment_stream_matches_batch(spark, tmp_path, sf_dir):
    """The streamed per-epoch assignments, unioned across epochs,
    must equal the batch q_ivf_assignment scoring of the same
    vectors (one shared distance/argmin definition): split the
    fixture embeddings into two micro-batches, stream them through,
    compare exactly."""
    import glob
    import shutil
    import time as _time

    from pfithic_spark.registry._core import _GOLDEN_DIR
    from pfithic_spark.registry.keys_r10 import (
        ivf_assign_from,
        ivf_distance_table_from,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    vec_dir = str(tmp_path / "vec_in")
    e.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{vec_dir}/b1")
    e.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{vec_dir}/b2")
    for i, sub in enumerate(("b1", "b2")):
        for f in sorted(glob.glob(f"{vec_dir}/{sub}/part-*.parquet")):
            shutil.copy(f, f"{vec_dir}/{i:03d}.parquet")
        shutil.rmtree(f"{vec_dir}/{sub}")
        _time.sleep(1.1)

    asg_path = str(tmp_path / "asg")
    ck = str(tmp_path / "ck")
    q = strm.ivf_assignment_stream(
        strm.read_vector_stream(spark, vec_dir), asg_path, ck
    )
    q.awaitTermination(180)
    q.stop()

    streamed = sorted(
        (r["vec_id"], r["cell"], r["dist2_micro"])
        for r in spark.read.parquet(asg_path).collect()
    )
    cent = spark.read.parquet(f"{_GOLDEN_DIR}/ivf_centroids.parquet")
    batch = sorted(
        map(
            tuple,
            ivf_assign_from(ivf_distance_table_from(e, cent)).collect(),
        )
    )
    assert streamed == batch and len(batch) == e.count()
    eps = spark.read.parquet(asg_path).select("epoch").distinct().count()
    assert eps == 2
