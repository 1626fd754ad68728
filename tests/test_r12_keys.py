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
