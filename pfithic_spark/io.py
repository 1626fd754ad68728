"""Sources and sinks.

Two input families:

1. **Fixture parquet** (driver-generated TPC-H-ish tables) — the test
   substrate.  :func:`load_table` / :func:`register_views`.

2. **Hi-C domain TSV** — the reference's native input model
   (SURVEY.md §1.1 [P `fithic.py::read_All_Interactions`]): positional
   tab-separated tables, plain or gzip, *no header*, fixed schema by
   position.  Explicit ``StructType``s; never ``inferSchema`` — at
   100 TB an inference pass is a full extra scan.

Writers mirror the reference's outputs (gz TSV significances +
per-pass bin stats) plus parquet, the scale-sane default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .session import ensure_engine_confs

#: Fixture tables the driver registers as DuckDB views (Appendix A).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# --- Hi-C domain schemas (positional TSV, reference input model) -------

#: fragments: chr, extraField, fragmentMid, marginalizedContactCount, mappable
FRAGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("extra_field", T.LongType(), True),
        T.StructField("frag_mid", T.LongType(), False),
        T.StructField("marginal_count", T.LongType(), True),
        T.StructField("mappable", T.DoubleType(), True),
    ]
)

#: interactions: chr1, fragmentMid1, chr2, fragmentMid2, contactCount
CONTACTS_SCHEMA = T.StructType(
    [
        T.StructField("chr1", T.StringType(), False),
        T.StructField("mid1", T.LongType(), False),
        T.StructField("chr2", T.StringType(), False),
        T.StructField("mid2", T.LongType(), False),
        T.StructField("contact_count", T.LongType(), False),
    ]
)

#: biases: chr, midpoint, bias (ICE / Knight-Ruiz factors, ~1.0-centred)
BIASES_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("mid", T.LongType(), False),
        T.StructField("bias", T.DoubleType(), True),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture parquet table.

    ``events.ts`` is parquet TIMESTAMP(MICROS), which Spark reads as
    TIMESTAMP_NTZ; earlier fixture generations used TIMESTAMP(NANOS),
    which lands as an epoch-nanos LongType under ``nanosAsLong`` (set
    here).  Consumers that need event-time arithmetic go through
    :func:`epoch_us`, which handles both physical encodings.
    """
    ensure_engine_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def epoch_us(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds Column from an event-time column, whatever
    physical type the source delivered:

    - timestamp / timestamp_ntz (parquet TIMESTAMP(MICROS)): the session
      timezone is pinned UTC (session.py), so ``unix_micros(cast(ts as
      timestamp))`` equals DuckDB's ``epoch_us(ts)`` on the same naive
      value — the oracle contract.
    - bigint (legacy parquet TIMESTAMP(NANOS) under ``nanosAsLong``):
      integer nanos → micros.

    Pure JVM expression either way — safe in the 100 TB hot path.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def register_views(spark: SparkSession, sf_dir: str, names=FIXTURE_TABLES) -> None:
    """Register fixture tables as temp views (mirrors the oracle's views)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --- Hi-C TSV readers (reference-native input path) --------------------


def read_contacts_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-style interactions file (TSV/gz, headerless).

    Malformed lines (wrong arity / non-numeric fields) parse to nulls
    under CSV permissive mode and are DROPPED on the required columns —
    at 100 TB a single corrupt line must not kill the ingest (the
    reference, reading eagerly, would crash); the drop is explicit
    here so the semantics are documented rather than accidental.
    """
    df = spark.read.csv(path, sep="\t", schema=CONTACTS_SCHEMA, header=False)
    return df.na.drop(subset=["chr1", "mid1", "chr2", "mid2", "contact_count"])


def read_fragments_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Fragments TSV; malformed lines dropped on (chr, frag_mid)."""
    df = spark.read.csv(path, sep="\t", schema=FRAGMENTS_SCHEMA, header=False)
    return df.na.drop(subset=["chr", "frag_mid"])


def read_biases_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Biases TSV; malformed lines dropped on (chr, mid) — a null bias
    is kept (missing value ≠ malformed row; attach_biases defaults it)."""
    df = spark.read.csv(path, sep="\t", schema=BIASES_SCHEMA, header=False)
    return df.na.drop(subset=["chr", "mid"])


# --- sinks --------------------------------------------------------------


def write_tsv_gz(df: DataFrame, path: str) -> None:
    """Reference-style gz TSV output (significances / pass stats)."""
    df.write.mode("overwrite").option("sep", "\t").option(
        "compression", "gzip"
    ).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """JSON-lines sink — the interchange format most external text/LLM
    tooling consumes.  One object per line, optionally gzipped; complex
    types (arrays/structs/maps) serialize natively."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source.  ALWAYS pass an explicit schema in production:
    without one Spark runs a full inference scan (twice the I/O) and an
    inferred schema can drift between drops; with one, malformed rows
    land in the permissive-mode corrupt-record column instead of
    failing the job."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink — columnar alternative where the downstream stack is
    Hive/Trino-flavored; same predicate-pushdown/column-pruning story
    as parquet."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table so later
    joins/aggregations on the bucket key are co-located — no shuffle of
    either side.  THE lever for repeated large-fact joins at 100 TB:
    pay one shuffle at write time, never again at read time.

    ``path`` makes it an EXTERNAL table at an explicit location —
    required when the session's warehouse dir (defaults to the driver
    process cwd) may not be writable, e.g. under an externally-built
    SparkSession.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


# --- atomic-publish parquet sink (manifest commit protocol) --------------


def write_parquet_atomic(
    df: DataFrame,
    path: str,
    mode: str = "append",
) -> str:
    """Publish a parquet dataset ATOMICALLY without relying on
    directory rename: the mini commit protocol every object-store
    table format (Delta/Iceberg/Hudi) is built on.

    1. data files land under ``path/_staging_<txid>/`` — invisible to
       readers (readers never list the directory);
    2. the COMMIT POINT is publishing ``manifest-<seq>-<txid>.json``
       listing the staged files — a single-object write, which is
       atomic on both POSIX (temp + rename) and S3-style stores (PUT
       is atomic per object);
    3. :func:`read_parquet_atomic` reads the newest manifest and loads
       exactly its file list.

    A writer that dies before step 2 leaves only an orphaned staging
    directory: garbage, never observed by any reader.  ``mode`` is
    ``append`` (new manifest = previous files + staged files) or
    ``overwrite`` (new manifest = staged files only).  Returns the
    committed manifest path.

    This implementation targets local/POSIX paths (os.listdir /
    os.rename); on a real object store the listing goes through the
    Hadoop FileSystem API and the rename becomes a conditional PUT —
    the PROTOCOL (staging dir + manifest commit point + manifest-only
    reads) is the part that carries over unchanged.  Two concurrent
    committers can race to the same seq; every reader deterministically
    resolves max (seq, txid), so one racer wins everywhere and the
    other's files become orphaned garbage — serializable commits would
    add a compare-and-swap on the manifest name, which object stores
    offer as conditional PUT.
    """
    import json
    import os
    import uuid

    txid = uuid.uuid4().hex[:12]
    staging = os.path.join(path, f"_staging_{txid}")
    df.write.mode("overwrite").parquet(staging)
    files = sorted(
        os.path.join(f"_staging_{txid}", f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    os.makedirs(path, exist_ok=True)
    prev_seq, prev_files = _newest_manifest(path)
    if mode == "append":
        files = prev_files + files
    elif mode != "overwrite":
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    seq = prev_seq + 1
    manifest = os.path.join(path, f"manifest-{seq:010d}-{txid}.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"seq": seq, "txid": txid, "files": files}, fh)
    os.rename(tmp, manifest)  # the commit point
    return manifest


def _newest_manifest(path: str) -> tuple[int, list[str]]:
    import json
    import os

    # tie-break equal seqs by txid so snapshot selection is
    # DETERMINISTIC when two committers raced to the same seq — every
    # reader resolves the same winner regardless of listing order (the
    # loser's files become orphaned garbage, same as a crashed writer)
    best_key = (0, "")
    best_files: list[str] = []
    if not os.path.isdir(path):
        return 0, best_files
    for name in sorted(os.listdir(path)):
        if name.startswith("manifest-") and name.endswith(".json"):
            with open(os.path.join(path, name)) as fh:
                m = json.load(fh)
            key = (int(m["seq"]), str(m.get("txid", "")))
            if key > best_key:
                best_key = key
                best_files = list(m["files"])
    return best_key[0], best_files


def read_parquet_atomic(
    spark: SparkSession, path: str, as_of_seq: int | None = None
) -> DataFrame:
    """Read the dataset as of a committed manifest — staged but
    uncommitted files are invisible, so readers always see a consistent
    snapshot (crashed writers leave no torn reads).

    ``as_of_seq`` reads a HISTORICAL snapshot (time travel): manifests
    are immutable and data files are never rewritten in place, so every
    committed seq stays readable until a retention job prunes it —
    the same property Iceberg/Delta time travel rests on."""
    import json
    import os

    if as_of_seq is None:
        _, files = _newest_manifest(path)
        if not files:
            raise FileNotFoundError(f"no committed manifest under {path}")
    else:
        files = None
        for name in sorted(os.listdir(path) if os.path.isdir(path) else []):
            if name.startswith(f"manifest-{as_of_seq:010d}-") and name.endswith(
                ".json"
            ):
                with open(os.path.join(path, name)) as fh:
                    files = list(json.load(fh)["files"])
        if files is None:
            raise FileNotFoundError(
                f"no committed manifest with seq={as_of_seq} under {path}"
            )
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def compact_parquet_atomic(
    spark: SparkSession, path: str, target_files: int = 1
) -> str:
    """Compact the newest snapshot's files into ``target_files`` and
    publish the result as a new OVERWRITE snapshot — the small-files
    remedy every append-heavy 100 TB table needs (thousands of tiny
    appended files destroy scan/listing performance; object stores
    price per request).

    Readers are never disturbed: the compacted data lands in a fresh
    staging dir and becomes visible only at its manifest commit point;
    prior snapshots (and any reader pinned to them) remain intact —
    compaction is a pure physical rewrite, byte-identical rows."""
    df = read_parquet_atomic(spark, path).coalesce(int(target_files))
    return write_parquet_atomic(df, path, mode="overwrite")
