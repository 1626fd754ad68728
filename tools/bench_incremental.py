"""Incremental-curation scale row: prove the recurring delta cycle
costs DELTA-proportional work, not corpus-proportional (VERDICT r11
#4's done criterion), with an engine-independent exact keep-set gate.

Planted corpus (n docs, 10-doc blocks, source = block % 4 — the
bench_composition structure, re-derived for the INCREMENTAL key's
order-composable semantics):
  slot 0: original quality-1.0 doc, block-unique tokens  -> kept;
  slot 1: exact byte copy of slot 0                      -> exact drop;
  slot 2: near-dup of slot 0 (20/25 shared pairs)        -> no-earlier-
          near-dup drop (slot 0 is the earlier doc);
  slot 3: junk "x y"                                     -> quality drop;
  slots 4-9: originals                                   -> kept.
Probe rule: every doc_id % 97 == 0 drops outright; only probes with
id <= t_split (the FROZEN benchmark set) contaminate — a frozen
probe in block-slots {0,1,2} drags the other trio members (the only
distinct-5-gram sharers).  No mixing stage (not order-composable —
see curation_incr_batch_from's docstring).  The numpy reference
computes the EXACT surviving id set with no Spark/DuckDB
involvement; the gate compares count, Σid, Σid² of the curated sink
read-back.

The timeline is driven through the registered key's own internals
(_inc_initial_load / _inc_process_delta over the atomic raw sink),
so the timed path IS the shipped path.

Usage: python tools/bench_incremental.py [n_base] [n_delta] [cpus]
Prints ONE JSON line."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pfithic_spark import io as pio  # noqa: E402
from pfithic_spark.registry import keys_r12  # noqa: E402
from pfithic_spark.session import get_spark  # noqa: E402

_PROBE_MOD = 97


def _expected_keep_ids(n: int, t_split: int) -> np.ndarray:
    ids = np.arange(n, dtype=np.int64)
    slot = ids % 10
    block = ids // 10
    keep0 = (slot == 0) | (slot >= 4)
    probe = ids % _PROBE_MOD == 0
    frozen = probe & (ids <= t_split)
    trio_frozen_block = np.zeros(n // 10 + 1, dtype=bool)
    trio_ids = ids[(slot <= 2) & frozen]
    trio_frozen_block[trio_ids // 10] = True
    contaminated = (slot <= 2) & trio_frozen_block[block]
    return ids[keep0 & ~probe & ~contaminated]


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_800_000
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    )
    n = n_base + n_delta
    t_split = n_base - 1
    spark = get_spark(app="bench-incremental", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    ids = F.col("id")
    slot = ids % 10
    block = F.expr("id div 10")
    src = F.concat(F.lit("s"), (block % 4))

    def body(prefix, n_pairs, fam):
        return F.array_join(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_pairs - 1)),
                    lambda i: F.array(
                        F.lit("the"),
                        F.concat(
                            F.lit(fam), prefix, F.lit("_"), i.cast("string")
                        ),
                    ),
                )
            ),
            " ",
        )

    orig_body = body(block.cast("string"), 25, "w")
    uniq_body = body(
        F.concat(block.cast("string"), F.lit("s"), slot.cast("string")),
        25,
        "u",
    )
    near_body = F.concat_ws(
        " ",
        body(block.cast("string"), 20, "w"),
        body(block.cast("string"), 5, "z"),
    )
    text = (
        F.when(slot <= 1, orig_body)
        .when(slot == 2, near_body)
        .when(slot == 3, F.lit("x y"))
        .otherwise(uniq_body)
    )
    corpus_dir = tempfile.mkdtemp(prefix="bench_incr_")
    (
        spark.range(n)
        .select(
            ids.alias("doc_id"),
            src.alias("source"),
            F.lit("en").alias("lang"),
            text.alias("text"),
        )
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/documents.parquet")
    )
    d = spark.read.parquet(f"{corpus_dir}/documents.parquet")

    root = tempfile.mkdtemp(prefix="bench_incr_root_")
    raw = os.path.join(root, "raw")
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") <= t_split), raw, mode="overwrite"
    )
    pio.write_parquet_atomic(
        d.filter(F.col("doc_id") > t_split), raw, mode="append"
    )
    base_seq = pio.list_manifests(raw)[-2][0][0]

    t0 = time.time()
    keys_r12._inc_initial_load(spark, root, base_seq, t_split)
    t1 = time.time()
    keys_r12._inc_process_delta(spark, root, base_seq)
    t2 = time.time()

    got = (
        pio.read_parquet_atomic(spark, os.path.join(root, "curated"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("sid"),
            F.sum(F.col("doc_id") * F.col("doc_id")).alias("sid2"),
        )
        .collect()[0]
    )
    exp = _expected_keep_ids(n, t_split)
    assert got["n"] == len(exp), (got["n"], len(exp))
    assert got["sid"] == int(exp.sum()), (got["sid"], int(exp.sum()))
    assert got["sid2"] == int((exp * exp).sum())
    print(
        json.dumps(
            {
                "n_base": n_base,
                "n_delta": n_delta,
                "n_kept": int(got["n"]),
                "initial_load_s": round(t1 - t0, 2),
                "delta_cycle_s": round(t2 - t1, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
