"""Corpus-curation CLI — the EXT training-data counterpart of the
reference-mirroring ``python -m pfithic_spark`` entry point:

    python -m pfithic_spark.curate -i documents.parquet -o outdir \
        [--min-quality 0.6] [--jaccard 0.2] [--target-tokens 2048] \
        [--max-df N]

Writes ``keep_list.parquet``, ``curated.parquet`` (source-partitioned),
``sequences.parquet`` under outdir and prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(
        prog="pfithic_spark.curate", description=__doc__
    )
    ap.add_argument("-i", "--input", required=True, help="documents parquet")
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("--min-quality", type=float, default=0.6)
    ap.add_argument("--jaccard", type=float, default=0.2)
    ap.add_argument("--target-tokens", type=int, default=2048)
    ap.add_argument(
        "--max-df",
        type=int,
        default=None,
        help="hot-shingle document-frequency cap for the near-dup "
        "inverted index (the skew lever; None = no cap)",
    )
    args = ap.parse_args()

    from .api import run_curation_files
    from .session import get_spark

    spark = get_spark(app="pfithic-spark-curate")
    stats = run_curation_files(
        spark,
        args.input,
        args.outdir,
        min_quality=args.min_quality,
        jaccard_threshold=args.jaccard,
        target_tokens=args.target_tokens,
        max_df=args.max_df,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
