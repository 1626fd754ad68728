"""MinHash-calibration scale row (VERDICT r11 #7): run
q_minhash_calibration's dataflow (minhash_calibration_from) on a
planted >= 2 M-doc corpus whose calibration table has an EXACT
python-arithmetic reference, and gate every output cell.

Planted corpus:
- n filler docs, 20 tokens each, every token doc-unique ("u<id>x<i>")
  — no two filler docs (and no filler/planted pair) share a token,
  so md5 minima never coincide and the filler contributes ZERO
  candidate pairs: the candidate set is exactly the planted pairs
  that band-collide;
- P planted pairs (ids n+2p, n+2p+1): both docs have 20 tokens from
  the pair-private namespace, sharing s = S_LEVELS[p % 8] tokens →
  true Jaccard s / (40 − s) spanning ~0.11 .. 1.0.

The reference replicates the EXACT engine arithmetic per pair in
pure python (hashlib md5 with the '#j' tag, lexicographic minima,
(4, 2) banding for candidacy, HALF_UP round-9 → Decimal sum → one
division per bucket) — expected (k_matches, est_jaccard, n_pairs,
mean_true_jaccard) rows with no Spark/DuckDB involvement.  The gate
is full-table equality.

Cost shape being proven: signatures are one corpus-linear
zero-shuffle projection; the band self-join touches only size-1
buckets plus the planted collisions, so the candidate stage is
O(candidates), not O(n²).

Usage: python tools/bench_minhash_cal.py [n_filler] [n_pairs] [cpus]
Prints ONE JSON line."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pfithic_spark.registry.keys_r11 import (  # noqa: E402
    minhash_calibration_from,
)
from pfithic_spark.session import get_spark  # noqa: E402

S_LEVELS = [4, 8, 12, 14, 16, 18, 19, 20]


def _r9(x: float) -> Decimal:
    """Spark F.round(double, 9): shortest-repr decimal, HALF_UP."""
    return Decimal(repr(x)).quantize(
        Decimal("1.000000000"), rounding=ROUND_HALF_UP
    )


def _sig(tokens: list[str]) -> list[str]:
    return [
        min(
            hashlib.md5(f"{w}#{j}".encode()).hexdigest()
            for w in tokens
        )
        for j in range(1, 9)
    ]


def _pair_tokens(p: int) -> tuple[list[str], list[str]]:
    s = S_LEVELS[p % len(S_LEVELS)]
    shared = [f"p{p}c{i}" for i in range(s)]
    a = shared + [f"p{p}a{i}" for i in range(20 - s)]
    b = shared + [f"p{p}b{i}" for i in range(20 - s)]
    return a, b


def _expected_rows(n_pairs: int) -> list[tuple]:
    agg: dict[int, tuple[int, Decimal]] = {}
    for p in range(n_pairs):
        ta, tb = _pair_tokens(p)
        ha, hb = _sig(ta), _sig(tb)
        bands_match = any(
            (ha[2 * b], ha[2 * b + 1]) == (hb[2 * b], hb[2 * b + 1])
            for b in range(4)
        )
        if not bands_match:
            continue
        k = sum(x == y for x, y in zip(ha, hb))
        s = len(set(ta) & set(tb))
        tj = s / (len(set(ta)) + len(set(tb)) - s)
        n, tot = agg.get(k, (0, Decimal(0)))
        agg[k] = (n + 1, tot + _r9(tj))
    out = []
    for k, (n, tot) in sorted(agg.items()):
        mean = float(_r9(float(tot) / n))
        out.append((k, k / 8.0, n, mean))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
    cpus = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    )
    spark = get_spark(app="bench-minhash-cal", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    filler_text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda i: F.concat(
                F.lit("u"),
                F.col("id").cast("string"),
                F.lit("x"),
                i.cast("string"),
            ),
        ),
        " ",
    )
    corpus_dir = tempfile.mkdtemp(prefix="bench_mhc_")
    (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), filler_text.alias("text"))
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/documents.parquet")
    )
    planted = []
    for p in range(n_pairs):
        ta, tb = _pair_tokens(p)
        planted.append((n + 2 * p, " ".join(ta)))
        planted.append((n + 2 * p + 1, " ".join(tb)))
    spark.createDataFrame(
        planted, "doc_id long, text string"
    ).write.mode("append").parquet(f"{corpus_dir}/documents.parquet")

    d = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    t0 = time.time()
    got = sorted(
        (
            r["k_matches"],
            r["est_jaccard"],
            r["n_pairs"],
            r["mean_true_jaccard"],
        )
        for r in minhash_calibration_from(d).collect()
    )
    cal_s = time.time() - t0
    want = _expected_rows(n_pairs)
    assert got == want, (got[:4], want[:4])
    print(
        json.dumps(
            {
                "n_docs": n + 2 * n_pairs,
                "n_planted_pairs": n_pairs,
                "n_candidate_pairs": int(sum(r[2] for r in got)),
                "n_octiles": len(got),
                "calibration_s": round(cal_s, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
