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

    Real decoding requires Pillow/ffmpeg, absent in this container
    (ADR re-confirmed 2026-08-14: PIL/cv2/soundfile all unimportable, so
    the decode stays stubbed; all Spark-side plumbing — schema,
    partitioning, Arrow batch shape — is real and oracle-tested)."""
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


#: output schema of the resize stage
RESIZE_SCHEMA = (
    "doc_id long, src_width long, src_height long, "
    "out_width long, out_height long"
)


def resize_media(
    docs_with_payload: DataFrame, max_w: int = 128, max_h: int = 128
) -> DataFrame:
    """Aspect-ratio-preserving bounded resize over the binary column.

    Real resizing needs a pixel decoder (stubbed — see module docstring);
    the dimension arithmetic, batching, and mapInPandas plumbing are the
    production shape.  Integer-only math (floor division, clamp ≥ 1) so
    the DuckDB oracle replays it exactly: clamp width to ``max_w``
    rescaling height, then clamp height to ``max_h`` rescaling width.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_image_batch(pdf["payload"], fake=True)
            w = meta["fake_width"].astype("int64")
            h = meta["fake_height"].astype("int64")
            w1 = w.clip(upper=max_w)
            h1 = h.where(w <= max_w, (h * max_w // w).clip(lower=1))
            h2 = h1.clip(upper=max_h)
            w2 = w1.where(h1 <= max_h, (w1 * max_h // h1).clip(lower=1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "src_width": w,
                    "src_height": h,
                    "out_width": w2,
                    "out_height": h2,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )


#: output schema of the frame sampler (one row per sampled frame)
FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_checksum string"


def sample_frames(docs_with_payload: DataFrame, stride: int = 4) -> DataFrame:
    """Every-``stride``-th frame sample from the (fake-decoded) video
    payload — a generator-shaped mapInPandas stage: one input row fans
    out to ``ceil(frames/stride)`` output rows inside the Arrow batch,
    so the fan-out never materializes driver-side."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            meta = decode_image_batch(pdf["payload"], fake=True)
            ids, idxs, cks = [], [], []
            for doc_id, payload, frames in zip(
                pdf["doc_id"], pdf["payload"], meta["fake_frames"]
            ):
                ck = hashlib.md5(payload).hexdigest()
                for idx in range(0, int(frames), stride):
                    ids.append(doc_id)
                    idxs.append(idx)
                    cks.append(hashlib.md5(f"{ck}-{idx}".encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": cks}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        sample, schema=FRAMES_SCHEMA
    )


FEATURE_DIM = 8

#: output schema of the feature extractor (fixed-width numeric columns)
FEATURES_SCHEMA = "doc_id long, " + ", ".join(
    f"f{i} long" for i in range(FEATURE_DIM)
)


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Fixed-width feature vector per payload (the embedding-extraction
    stage of a multimodal pipeline; a real model would run here).

    Deterministic stand-in: 8 × 16-bit integers parsed from the payload
    MD5 — vectorized pandas string ops over the Arrow batch, replayable
    by the DuckDB oracle via SUBSTR/STRPOS hex parsing."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
            out = {"doc_id": pdf["doc_id"].values}
            for i in range(FEATURE_DIM):
                out[f"f{i}"] = (
                    digests.str.slice(4 * i, 4 * i + 4)
                    .map(lambda hx: int(hx, 16))
                    .astype("int64")
                )
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURES_SCHEMA
    )
