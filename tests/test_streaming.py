"""Streaming smoke tests: drive real readStream queries to completion
through the memory sink and reconcile them with their batch twins."""

from __future__ import annotations

import shutil
import uuid

import pytest
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


def test_sliding_replication_factor(spark, sf_dir):
    """Batch twin sanity: 1h/15min sliding puts every event in exactly
    4 windows."""
    import __spark_entry__ as e

    ev_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out = e.queries()["q_stream_sliding"](spark, sf_dir)
    assert out.agg(F.sum("n_events")).collect()[0][0] == 4 * ev_n
