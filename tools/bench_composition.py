"""Composition-scale row: the END-TO-END curation DAG on a planted
corpus whose keep set has an engine-independent reference.

Per-key scale rows prove each stage's shape; this proves the
COMPOSITION (quality gate ∩ exact-dedup ∩ near-dup CC →
decontamination → √-mixing → packing) holds at millions of documents
— the cache/persist seams and stage interactions a single-stage row
cannot see (VERDICT r10 #5's second half).

Planted corpus (n docs, 10-doc blocks, source = block % 4):
  slot 0: original quality-1.0 doc with BLOCK-UNIQUE tokens;
  slot 1: exact byte copy of slot 0      -> exact-dedup drop;
  slot 2: near-dup of slot 0 (40-token
          shared prefix, Jaccard ~0.66)  -> CC-representative drop;
  slot 3: junk "x y"                     -> quality-gate drop
          (all junk docs are also mutual exact dups — the global
          exact group is irrelevant because quality drops them);
  slots 4-9: originals                   -> kept.
Probe rule (frozen in the key): doc_id % 97 == 0.  A probe doc is
dropped outright; any doc sharing a distinct 5-gram with a probe is
contamination-dropped — within a block the only 5-gram sharers are
slots {0, 1, 2}, so a probe landing on one of those drags the other
two (structurally modeled in the numpy reference below).  Mixing
keep decisions are the exact Knuth-hash thresholds, reproduced in
int64 numpy.  The reference computes the EXACT surviving doc-id set
with no Spark/DuckDB involvement; the gate compares count, per-source
counts, Σid and Σid² of the returned frame against it.

Usage: python tools/bench_composition.py [n_docs] [cpus]
Prints ONE JSON line."""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pfithic_spark.session import get_spark  # noqa: E402

_KNUTH = 2_654_435_761
_PROBE_MOD = 97


def _expected_keep_ids(n: int) -> np.ndarray:
    ids = np.arange(n, dtype=np.int64)
    slot = ids % 10
    block = ids // 10
    # structural keep-list: slots {0, 4..9} survive quality/exact/CC
    keep0 = (slot == 0) | (slot >= 4)
    probe = ids % _PROBE_MOD == 0
    # contamination: a probe in block-slots {0,1,2} drags the OTHER
    # members of that trio (the only distinct-5-gram sharers)
    trio_probe_block = np.zeros(n // 10 + 1, dtype=bool)
    trio_ids = ids[(slot <= 2) & probe]
    trio_probe_block[trio_ids // 10] = True
    contaminated = (slot <= 2) & trio_probe_block[block]
    clean = keep0 & ~probe & ~contaminated
    # sqrt mixing on the SURVIVOR censuses
    src = (block % 4).astype(np.int64)
    counts = np.bincount(src[clean], minlength=4)
    min_n = counts.min()
    kept = np.zeros(n, dtype=bool)
    h = (ids % _KNUTH) * _KNUTH % (1 << 32)
    for s in range(4):
        rate = math.sqrt(min_n / counts[s])
        thr = math.floor(rate * 1_000_000)
        m = clean & (src == s) & (h % 1_000_000 < thr)
        kept |= m
    return ids[kept]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    )
    assert n % 40 == 0, "n must be a multiple of 40 (blocks x sources)"
    spark = get_spark(app="bench-composition", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    ids = F.col("id")
    slot = ids % 10
    block = F.expr("id div 10")
    src = F.concat(F.lit("s"), (block % 4))

    def body(prefix, n_pairs, fam):
        # "the <fam><block>_<i>" x n_pairs, built with transform +
        # array_join (a flat 100-arg concat_ws blows the janino 64KB
        # method limit and falls back to interpreted eval per row)
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
    import tempfile

    corpus_dir = tempfile.mkdtemp(prefix="bench_comp_")
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

    from pfithic_spark.registry.keys_r11 import curation_dag_from

    t0 = time.time()
    frame, caches = curation_dag_from(d)
    got = frame.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sid"),
        F.sum(F.col("doc_id") * F.col("doc_id")).alias("sid2"),
        F.countDistinct("source").alias("nsrc"),
    ).collect()[0]
    dag_s = time.time() - t0
    for c in caches:
        c.unpersist()

    exp = _expected_keep_ids(n)
    assert got["n"] == len(exp), (got["n"], len(exp))
    assert got["sid"] == int(exp.sum()), (got["sid"], int(exp.sum()))
    assert got["sid2"] == int((exp * exp).sum())
    assert got["nsrc"] == 4
    print(
        json.dumps(
            {
                "n_docs": n,
                "n_kept": int(got["n"]),
                "keep_frac": round(len(exp) / n, 4),
                "dag_s": round(dag_s, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
