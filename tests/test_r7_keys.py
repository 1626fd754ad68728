"""Round-7 key edge cases the sf fixtures cannot reach (zero-active
churn weeks, disjoint-vocabulary source pairs) — planted-input gates
for the review findings fixed in round 7."""
from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401


def test_growth_accounting_counts_churn_in_zero_active_week(spark, tmp_path):
    """A week where EVERYONE churned and nobody was active has a churn
    census but no active row — the left-join shape silently dropped it
    (round-7 review finding); the full outer join must keep it."""
    import __spark_entry__ as e

    # users 1..3 active week 0 and week 2, nobody active week 1:
    # week 1 must appear with n_active=0, n_churned=3
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for wk in (0, 2):
            eid += 1
            rows.append((eid, f"2024-01-{1 + 7 * wk:02d} 12:00:00", u))
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sf = str(tmp_path)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {
        r["week"]: r
        for r in e.queries()["q_growth_accounting"](spark, sf).collect()
    }
    base = min(out)
    assert out[base]["n_active"] == 3 and out[base]["n_new"] == 3
    assert base + 1 in out, "zero-active churn week must not be dropped"
    assert out[base + 1]["n_active"] == 0
    assert out[base + 1]["n_churned"] == 3
    assert out[base + 2]["n_active"] == 3
    assert out[base + 2]["n_resurrected"] == 3


def test_js_divergence_disjoint_sources_is_ln2(spark, tmp_path):
    """Two sources with DISJOINT vocabularies never co-occur in the
    token join, but their JSD is exactly ln 2 — the closed-form
    exclusive-mass row must appear (round-7 review finding)."""
    import __spark_entry__ as e

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "srcA", 16),
            (2, "delta epsilon zeta", "en", "srcB", 18),
            (3, "alpha beta gamma delta", "en", "srcC", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {
        (r["source1"], r["source2"]): r
        for r in e.queries()["q_js_divergence"](spark, sf).collect()
    }
    assert set(out) == {("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")}
    ab = out[("srcA", "srcB")]
    assert ab["n_common_tokens"] == 0
    assert abs(ab["jsd_nats"] - round(math.log(2.0), 6)) < 1e-9
    # overlapping pairs are strictly below ln 2
    assert out[("srcA", "srcC")]["jsd_nats"] < math.log(2.0)


def test_psi_drift_empty_reference_year(spark, tmp_path):
    """With NO reference-year rows, the cut list is empty: a cross join
    would annihilate the current-year census entirely (round-7 review
    finding) — everything must land in bin 1 with NULL shares/PSI
    (NULLIF semantics, both engines)."""
    import __spark_entry__ as e

    spark.range(100).select(
        F.col("id").alias("o_orderkey"),
        F.lit(1).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        (F.col("id") * 11 % 1000 + 100.0).alias("o_totalprice"),
        F.lit("1998-06-01 00:00:00")
        .cast("timestamp_ntz")
        .alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    rows = e.queries()["q_psi_drift"](spark, str(tmp_path)).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["bin"] == 1 and r["n_ref"] == 0 and r["n_cur"] == 100
    assert r["p_ref"] is None and r["psi_term"] is None and r["psi"] is None
