"""Head-to-head: the Spark significance pipeline vs the reference's
architecture (single-process pandas/numpy dataflow, tests/pandas_ref.py
— the same shape as pFitHiC's vectorized implementation) on identical
synthetic Hi-C contact sets.

Both sides read the same parquet and share the numeric kernels, so the
delta is purely the execution architecture.  Usage:

    python tools/bench_pipeline.py [n_target_pairs] [passes] [nbins] [chrs]

Scale the GRID (nbins/chrs), not just the draw count: the canonical
pair space saturates at chrs·nbins²/2 distinct pairs, after which more
draws only raise counts, not rows.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import pandas as pd


def make_contacts(n_target: int, nbins: int = 5000, chrs: int = 2) -> pd.DataFrame:
    """Power-law distance-decay contact set, canonical, pre-summed."""
    rng = np.random.default_rng(42)
    per_chr = n_target // chrs
    frames = []
    for c in range(chrs):
        i = rng.integers(0, nbins, per_chr * 2)
        lag = np.minimum((rng.pareto(1.2, per_chr * 2) * 3 + 1).astype(np.int64), nbins - 1)
        j = np.minimum(i + lag, nbins - 1)
        keep = i < j
        df = pd.DataFrame(
            {
                "chr1": f"chr{c+1}",
                "mid1": i[keep] * 5000 + 2500,
                "chr2": f"chr{c+1}",
                "mid2": j[keep] * 5000 + 2500,
                "contact_count": rng.integers(1, 12, keep.sum()),
            }
        )
        frames.append(df)
    out = (
        pd.concat(frames)
        .groupby(["chr1", "mid1", "chr2", "mid2"], as_index=False)["contact_count"]
        .sum()
    )
    return out


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    nbins = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    chrs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    pdf = make_contacts(n_target, nbins=nbins, chrs=chrs)
    path = "/tmp/bench_pipeline_contacts.parquet"
    pdf.to_parquet(path, index=False)
    print(f"contacts: {len(pdf):,} canonical pairs → {path}")

    # --- reference architecture: single-process pandas dataflow ---------
    from pandas_ref import run_significance_pandas

    t0 = time.perf_counter()
    ref = run_significance_pandas(
        pd.read_parquet(path), None, nbins_grid=nbins, passes=passes
    )
    t_pandas = time.perf_counter() - t0
    print(f"pandas (reference architecture): {t_pandas:.2f}s  rows={len(ref):,}")

    # --- this engine -----------------------------------------------------
    from pfithic_spark.session import get_spark
    from pfithic_spark import hic

    spark = get_spark(app="bench-pipeline")
    chr_nbins = spark.createDataFrame(
        [(f"chr{c+1}", nbins) for c in range(chrs)], "chr string, nbins int"
    )
    cfg = hic.SigConfig(n_bins=100, passes=passes, dist_lo=0, dist_hi=2**40)
    contacts = spark.read.parquet(path)
    # warm JVM scan AND the Python workers (first pandas_udf pays ~5s of
    # worker spawn + numpy import across local[32])
    contacts.count()
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm(x: pd.Series) -> pd.Series:
        return x * 1.0

    contacts.select(F.sum(_warm(F.col("mid1").cast("double")))).collect()

    for label in ("cold caches", "steady state"):
        t0 = time.perf_counter()
        out = hic.run_significance(spark, contacts, chr_nbins, cfg=cfg)
        n = out.count()
        t_spark = time.perf_counter() - t0
        print(
            f"spark local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}] "
            f"({label}): {t_spark:.2f}s  rows={n:,}  "
            f"ratio pandas/spark: {t_pandas / t_spark:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
