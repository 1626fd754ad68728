"""Multimodal (image/audio/video) column plumbing (north-star EXT).

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as Arrow
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch.  The image/audio codec libraries are NOT in this container, so
the decode step is STUBBED: :func:`decode_image_batch` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (pure arithmetic on the byte stream) stands
in.  Everything around the stub — schema, batching, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the media metadata extractor
MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, fake_width long, fake_height long, "
    "fake_frames long, checksum string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image/video decoder: derives
    plausible dimensions from the byte length only (pure arithmetic, so
    the DuckDB oracle can replay it)."""
    n = len(payload)
    return n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Decode a batch of image payloads → (width, height, frames).

    Real decoding requires Pillow/ffmpeg, absent in this container."""
    if not fake:
        raise NotImplementedError(
            "image/audio decode needs Pillow/ffmpeg (not in this container); "
            "pass fake=True for the deterministic stand-in"
        )
    rows = [_fake_decode(p) for p in payloads]
    return pd.DataFrame(rows, columns=["fake_width", "fake_height", "fake_frames"])


def with_binary_payload(
    docs: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (fixture: UTF-8 bytes of the
    text; production: the image/audio blob read from object storage)."""
    return docs.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def extract_media_meta(docs_with_payload: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over the binary column.

    One Arrow batch in → one metadata frame out; no per-row Python."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            meta = decode_image_batch(pdf["payload"], fake=True)
            meta.insert(0, "doc_id", pdf["doc_id"].values)
            meta.insert(1, "n_bytes", pdf["payload"].map(len).astype("int64"))
            meta["checksum"] = pdf["payload"].map(
                lambda b: hashlib.md5(b).hexdigest()
            )
            yield meta

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        extract, schema=MEDIA_META_SCHEMA
    )
