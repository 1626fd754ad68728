"""Multimodal (image/audio/video) column plumbing (north-star EXT).

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as Arrow
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch.

Decode status (round 4): PNG (8- and 16-bit, all five scanline
filters, sequential and Adam7-interlaced), 24/32 bpp uncompressed
BMP, binary PPM (8/16-bit), and JPEG — both BASELINE sequential
(SOF0/1) and PROGRESSIVE (SOF2: spectral selection + successive
approximation incl. AC refinement, T.81 Annex G) — decode for REAL via
:func:`decode_image_real`: public spec + numpy only, no Pillow.
VIDEO (round-4 continuation): RIFF/AVI containers parse for real
(:func:`decode_avi`), and MJPEG or raw-DIB streams decode fully (MJPEG
frames reuse the in-house JPEG decoder).  The remaining ADR gap is
lossless/arithmetic-coded JPEG (rare; arithmetic needs an MQ coder)
and codec-compressed video (h264 etc. — ffmpeg territory), which
raise ``NotImplementedError``.  The oracled fixture keys use the
deterministic fake decoder (``fake=True``) because fixture payloads
are text bytes, not images.
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

    ``fake=False`` runs the REAL pure-python decoders below (PNG via
    stdlib zlib + spec defilter, uncompressed BMP, binary PPM,
    baseline AND progressive JPEG via T.81 Huffman+IDCT — no Pillow
    needed) and raises NotImplementedError only for formats that
    genuinely require external codec libraries (lossless/arithmetic
    JPEG, video containers) — the remaining ADR gap, re-confirmed
    2026-08-14 (PIL/cv2/soundfile unimportable, installs off-limits).
    ``fake=True`` keeps the deterministic arithmetic stand-in the
    oracled fixture keys replay (fixture payloads are text bytes, not
    images).

    The real path returns honest ``width/height/frames`` column names
    (a decoded still image is 1 frame); only the fake path keeps the
    ``fake_*`` names, which exist so MEDIA_META_SCHEMA makes the
    stand-in unmistakable in the oracled fixture keys.  Callers wanting
    the richer real-decode surface (channels, mean pixel) should use
    :func:`extract_real_meta`."""
    if not fake:
        rows = []
        for p in payloads:
            img = decode_image_real(bytes(p))
            rows.append((img.shape[1], img.shape[0], 1))
        return pd.DataFrame(rows, columns=["width", "height", "frames"])
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


# --- real decoders (pure python/numpy + stdlib zlib — no Pillow) --------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_defilter(raw: bytes, width: int, height: int, channels: int):
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/
    Paeth) → H×W×C uint8 array.  Scalar loops — correctness-first; at
    production volume the decode belongs in a vectorized/compiled
    kernel, but the format logic is identical."""
    import numpy as np

    bpp = channels
    stride = width * channels
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(out[y - 1][i - bpp]) if (y > 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    return out.reshape(height, width, channels)


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_deinterlace(raw: bytes, width: int, height: int, channels: int):
    """Adam7: the IDAT stream holds 7 independently-filtered reduced
    images; defilter each with the standard machinery at its reduced
    width and scatter onto the full-size grid."""
    import numpy as np

    expect = sum(
        h_p * (1 + w_p * channels)
        for x0, y0, dx, dy in _ADAM7
        for w_p in ((width - x0 + dx - 1) // dx,)
        for h_p in ((height - y0 + dy - 1) // dy,)
        if w_p > 0 and h_p > 0
    )
    if len(raw) != expect:
        raise ValueError(
            f"malformed PNG: Adam7 stream is {len(raw)} bytes, "
            f"expected {expect} for {width}x{height}x{channels}"
        )
    out = np.zeros((height, width, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        w_p = (width - x0 + dx - 1) // dx
        h_p = (height - y0 + dy - 1) // dy
        if w_p <= 0 or h_p <= 0:
            continue
        need = h_p * (1 + w_p * channels)
        sub = _png_defilter(raw[pos : pos + need], w_p, h_p, channels)
        pos += need
        out[y0::dy, x0::dx] = sub
    if pos != len(raw):
        raise ValueError(
            f"malformed PNG: Adam7 stream is {len(raw)} bytes, "
            f"consumed {pos}"
        )
    return out


def decode_png(payload: bytes):
    """Decode an 8-bit PNG (gray / gray+alpha / RGB / RGBA; sequential
    OR Adam7-interlaced) to an H×W×C uint8 numpy array — PNG spec
    (public) + stdlib zlib only."""
    import struct
    import zlib

    import numpy as np  # noqa: F401  (used via _png_defilter)

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = None
    interlace = 0
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth not in (8, 16):
                raise NotImplementedError(
                    f"PNG bit depth {depth} (8/16 only)"
                )
            if interlace not in (0, 1):
                raise ValueError(f"PNG: bad interlace method {interlace}")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise NotImplementedError(f"PNG color type {color}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    # validate before defiltering: a payload truncated before IHDR or a
    # short/corrupt IDAT must fail with a clear, catchable ValueError,
    # not a TypeError/IndexError deep inside the defilter loop (one bad
    # blob in a mapInPandas batch should be diagnosable, not task-fatal
    # with an obscure trace)
    if width is None or channels is None:
        raise ValueError("malformed PNG: no IHDR chunk")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"malformed PNG: corrupt IDAT ({exc})") from exc
    # the filter machinery operates on BYTES: for 16-bit samples the
    # per-pixel byte count doubles (spec: bpp = ceil(depth/8)·channels)
    # and the big-endian byte pairs recombine after defiltering
    byte_ch = channels * (depth // 8)
    if interlace == 1:
        img = _png_deinterlace(raw, width, height, byte_ch)
    else:
        expect = height * (1 + width * byte_ch)
        if len(raw) != expect:
            raise ValueError(
                f"malformed PNG: inflated IDAT is {len(raw)} bytes, "
                f"expected {expect} for {width}x{height}x{byte_ch}"
            )
        img = _png_defilter(raw, width, height, byte_ch)
    if depth == 16:
        img = (
            img[:, :, 0::2].astype("uint16") << 8
        ) | img[:, :, 1::2].astype("uint16")
    return img


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER, public
    spec) to H×W×C uint8 (BGR order preserved → converted to RGB)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(payload) < 34:
        raise ValueError("malformed BMP: truncated header")
    (data_off,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    nch = bpp // 8
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * nch + 3) & ~3
    # validate up front: a short pixel array must fail with a clear,
    # catchable error, not a reshape TypeError mid-batch (same contract
    # as decode_png)
    if len(payload) < data_off + (height - 1) * row_bytes + width * nch:
        raise ValueError(
            f"malformed BMP: pixel array truncated "
            f"({len(payload)} bytes for {width}x{height}x{nch})"
        )
    img = np.zeros((height, width, nch), dtype=np.uint8)
    for y in range(height):
        row = payload[data_off + y * row_bytes :][: width * nch]
        arr = np.frombuffer(row, dtype=np.uint8).reshape(width, nch)
        img[height - 1 - y if bottom_up else y] = arr
    # BGR(A) → RGB(A)
    img[..., :3] = img[..., 2::-1]
    return img


def decode_ppm(payload: bytes):
    """Decode a binary PPM (P6) to H×W×3 — uint8 for maxval ≤ 255,
    uint16 (big-endian samples per the spec) for 255 < maxval ≤
    65535."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    pos += 1  # the single whitespace after maxval
    width, height, maxval = (int(f) for f in fields)
    if maxval > 65535:
        raise ValueError(f"malformed PPM: maxval {maxval}")
    bps = 2 if maxval > 255 else 1
    need = width * height * 3 * bps
    data = payload[pos : pos + need]
    if len(data) < need:
        raise ValueError(
            f"malformed PPM: raster truncated ({len(data)} bytes for "
            f"{width}x{height}x3x{bps})"
        )
    dtype = ">u2" if bps == 2 else "uint8"
    return (
        np.frombuffer(data, dtype=dtype)
        .reshape(height, width, 3)
        .astype("uint16" if bps == 2 else "uint8")
    )


# --- baseline JPEG (ITU-T T.81, sequential DCT, Huffman) -----------------

#: zigzag scan order: _JPEG_ZIGZAG[k] = natural (row-major) index of the
#: k-th coefficient in zigzag order (T.81 Figure 5)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_huff_table(bits, vals):
    """Canonical Huffman decode table from the DHT BITS/HUFFVAL lists
    (T.81 Annex C): {(code_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _jpeg_idct_basis():
    import numpy as np

    x = np.arange(8)
    u = np.arange(8)
    C = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    C[0, :] /= np.sqrt(2.0)
    return C  # block = C.T @ coeffs @ C


class _JpegBitReader:
    """MSB-first bit reader over one de-stuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                # fill bits past the segment end decode as zeros (the
                # final EOB may sit flush against the terminating marker)
                return 0
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_decode(r: _JpegBitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("malformed JPEG: invalid Huffman code")


def _jpeg_extend(v: int, ssss: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): map the ssss raw bits to the
    signed coefficient value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _jpeg_destuff(payload: bytes, pos: int):
    """De-stuff one scan's entropy stream from ``pos``: returns the
    per-restart-interval byte segments and the position of the next
    marker."""
    segments = []
    cur = bytearray()
    while pos < len(payload):
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < len(payload) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # next marker: end of scan
            break
    segments.append(bytes(cur))
    return segments, pos


def decode_jpeg(payload: bytes):
    """Decode a Huffman-coded JPEG — baseline sequential (SOF0/SOF1)
    or PROGRESSIVE (SOF2, T.81 Annex G: spectral selection + successive
    approximation, incl. AC refinement with EOB runs) — to an H×W×C
    uint8 array.  Public spec + numpy only, no codec library.
    Grayscale and YCbCr at any standard sampling (4:4:4/4:2:2/4:2:0),
    restart intervals, 8-bit precision.  Lossless/arithmetic-coded
    JPEGs raise NotImplementedError — with video containers, the
    remaining ADR gap."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables = {}
    htables = {}
    frame = None  # (height, width, comps) from SOF
    progressive = False
    restart_interval = 0
    scans = []  # per SOS: dict(comps, ss, se, ah, al, segments, ht, ri)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("malformed JPEG: expected marker")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip padding to the marker code itself
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("malformed JPEG: truncated at marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(payload):
            raise ValueError("malformed JPEG: truncated segment header")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT: 64 entries in ZIGZAG order
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                off += 1
                if pq:  # 16-bit precision
                    vals = struct.unpack(">64H", seg[off : off + 128])
                    off += 128
                else:
                    vals = list(seg[off : off + 64])
                    off += 64
                qtables[tq] = np.array(vals, dtype=np.int32)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-sequential/non-progressive JPEG (lossless/arithmetic)"
                " — ADR"
            )
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                htables[(tc, th)] = _jpeg_huff_table(bits, vals)
                off += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS header + entropy data, maybe more
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tbl = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append((cs, tbl >> 4, tbl & 15))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            segments, pos = _jpeg_destuff(payload, pos)
            scans.append(
                dict(
                    comps=scomps,
                    ss=ss,
                    se=se,
                    ah=ahal >> 4,
                    al=ahal & 15,
                    segments=segments,
                    ht=dict(htables),  # snapshot: DHT may redefine later
                    ri=restart_interval,
                )
            )
        # APPn / COM / others: skipped
    if frame is None or not scans:
        raise ValueError("malformed JPEG: missing SOF or SOS")
    h, w, comps = frame
    if progressive:
        return _jpeg_decode_progressive(h, w, comps, scans, qtables)
    if len(scans) > 1 or len(scans[0]["comps"]) < len(comps):
        # T.81 permits non-interleaved baseline (one SOS per component);
        # decoding only the first scan would silently leave the missing
        # components' planes at zero and color-convert garbage — refuse
        # loudly instead
        raise NotImplementedError("multi-scan baseline JPEG — ADR")
    scan = scans[0]["comps"]
    htables = scans[0]["ht"]
    restart_interval = scans[0]["ri"]
    segments = scans[0]["segments"]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    basis = _jpeg_idct_basis()
    planes = {}
    for cid, hi, vi, tq in comps:
        planes[cid] = np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
    dc_pred = {cid: 0 for cid, *_ in comps}
    comp_by_id = {c[0]: c for c in comps}
    n_mcu = mcux * mcuy
    seg_i = 0
    reader = _JpegBitReader(segments[0])
    for m in range(n_mcu):
        if restart_interval and m > 0 and m % restart_interval == 0:
            seg_i += 1  # RSTn: byte-align via fresh reader, reset DC
            if seg_i >= len(segments):
                raise ValueError("malformed JPEG: missing restart segment")
            reader = _JpegBitReader(segments[seg_i])
            dc_pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cs, td, ta in scan:
            cid, hi, vi, tq = comp_by_id[cs]
            qt = qtables[tq]
            for by in range(vi):
                for bx in range(hi):
                    # decode one 8×8 block (T.81 F.2.2)
                    ssss = _jpeg_huff_decode(reader, htables[(0, td)])
                    diff = _jpeg_extend(reader.bits(ssss), ssss)
                    dc_pred[cid] += diff
                    coef = np.zeros(64, dtype=np.float64)
                    coef[0] = dc_pred[cid] * int(qt[0])
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(reader, htables[(1, ta)])
                        rrrr, s = rs >> 4, rs & 15
                        if s == 0:
                            if rrrr == 15:
                                k += 16  # ZRL: run of 16 zeros
                                continue
                            break  # EOB
                        k += rrrr
                        if k > 63:
                            raise ValueError("malformed JPEG: AC overrun")
                        coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(
                            reader.bits(s), s
                        ) * int(qt[k])
                        k += 1
                    block = basis.T @ coef.reshape(8, 8) @ basis + 128.0
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    return _jpeg_finish(planes, comps, h, w, hmax, vmax)


def _jpeg_finish(planes, comps, h, w, hmax, vmax):
    """Upsample subsampled planes to the full grid, crop, color-convert."""
    import numpy as np

    full = []
    for cid, hi, vi, tq in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    else:
        raise NotImplementedError(f"JPEG with {len(full)} components")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _jpeg_decode_progressive(h, w, comps, scans, qtables):
    """Progressive decode (T.81 Annex G, Huffman): coefficients
    accumulate across scans — spectral bands [Ss..Se] and successive-
    approximation passes (Ah/Al) — then ONE dequant + IDCT per block.

    Scan walks: a multi-component scan interleaves MCUs exactly like
    baseline; a single-component scan walks that component's OWN
    ceil(comp/8) block grid.  Restart intervals reset the DC
    predictors, the EOB run, and byte-align (fresh segment).  The AC
    refinement algorithm (newly-significant coefficients + correction
    bits + EOB runs) follows G.1.2.3."""
    import numpy as np

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_by_id = {c[0]: c for c in comps}
    # coefficient store: padded interleaved grid per component,
    # (block_rows, block_cols, 64) ints in NATURAL order
    coef = {}
    nonint_grid = {}
    for cid, hi, vi, tq in comps:
        coef[cid] = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        nonint_grid[cid] = ((ch + 7) // 8, (cw + 7) // 8)

    for sc in scans:
        ht = sc["ht"]
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        ri = sc["ri"]
        segments = sc["segments"]
        interleaved = len(sc["comps"]) > 1
        reader = _JpegBitReader(segments[0])
        seg_i = 0
        dc_pred = {cs: 0 for cs, _, _ in sc["comps"]}
        eob_run = 0

        def restart():
            nonlocal reader, seg_i, dc_pred, eob_run
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("malformed JPEG: missing restart segment")
            reader = _JpegBitReader(segments[seg_i])
            dc_pred = {cs: 0 for cs, _, _ in sc["comps"]}
            eob_run = 0

        def dc_unit(cs, td, blk):
            nonlocal eob_run
            if ah == 0:  # first DC pass
                s = _jpeg_huff_decode(reader, ht[(0, td)])
                diff = _jpeg_extend(reader.bits(s), s)
                dc_pred[cs] += diff
                blk[0] = dc_pred[cs] << al
            else:  # DC refinement: one magnitude bit per block
                if reader.bit():
                    blk[0] |= 1 << al

        def ac_first_unit(ta, blk):
            nonlocal eob_run
            if eob_run > 0:
                eob_run -= 1
                return
            k = ss
            while k <= se:
                rs = _jpeg_huff_decode(reader, ht[(1, ta)])
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eob_run = (1 << r) - 1
                    if r:
                        eob_run += reader.bits(r)
                    return
                k += r
                if k > se:
                    raise ValueError("malformed JPEG: AC band overrun")
                blk[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.bits(s), s) << al
                k += 1

        def ac_refine_unit(ta, blk):
            # G.1.2.3 / the libjpeg-equivalent correction-bit walk
            nonlocal eob_run
            p1 = 1 << al
            m1 = -1 << al
            k = ss
            if eob_run == 0:
                while k <= se:
                    rs = _jpeg_huff_decode(reader, ht[(1, ta)])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            # NOTE: unlike the first-scan EOB, no -1
                            # here — the CURRENT block's remaining
                            # nonzeros still take correction bits, in
                            # the eob_run phase below, which then
                            # decrements for this block (T.81 G.1.2.3)
                            eob_run = 1 << r
                            if r:
                                eob_run += reader.bits(r)
                            break
                        newval = 0  # ZRL: pass 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError(
                                "malformed JPEG: bad AC refinement size"
                            )
                        newval = p1 if reader.bit() else m1
                    while k <= se:
                        z = _JPEG_ZIGZAG[k]
                        if blk[z] != 0:
                            # nonzero history: correction bit
                            if reader.bit() and (blk[z] & p1) == 0:
                                blk[z] += p1 if blk[z] >= 0 else m1
                        else:
                            if r == 0:
                                if newval:
                                    blk[z] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eob_run > 0:
                while k <= se:  # correct the band's remaining nonzeros
                    z = _JPEG_ZIGZAG[k]
                    if blk[z] != 0 and reader.bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                    k += 1
                eob_run -= 1

        def data_unit(cs, td, ta, by, bx):
            blk = coef[cs][by, bx]
            if ss == 0:
                if se != 0:
                    raise ValueError(
                        "malformed JPEG: progressive DC scan with Se != 0"
                    )
                dc_unit(cs, td, blk)
            elif ah == 0:
                ac_first_unit(ta, blk)
            else:
                ac_refine_unit(ta, blk)

        if interleaved:
            n_mcu = mcux * mcuy
            for m in range(n_mcu):
                if ri and m > 0 and m % ri == 0:
                    restart()
                my, mx = divmod(m, mcux)
                for cs, td, ta in sc["comps"]:
                    _, hi, vi, _ = comp_by_id[cs]
                    for by in range(vi):
                        for bx in range(hi):
                            data_unit(cs, td, ta, my * vi + by, mx * hi + bx)
        else:
            cs, td, ta = sc["comps"][0]
            nby, nbx = nonint_grid[cs]
            for bi in range(nby * nbx):
                if ri and bi > 0 and bi % ri == 0:
                    restart()
                by, bx = divmod(bi, nbx)
                data_unit(cs, td, ta, by, bx)

    # all scans applied: dequant + IDCT each block once
    basis = _jpeg_idct_basis()
    planes = {}
    for cid, hi, vi, tq in comps:
        qt_zig = qtables[tq]
        qt_nat = np.zeros(64, dtype=np.int64)
        for k in range(64):
            qt_nat[_JPEG_ZIGZAG[k]] = int(qt_zig[k])
        nby, nbx = coef[cid].shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        deq = coef[cid].astype(np.float64) * qt_nat[None, None, :]
        for by in range(nby):
            for bx in range(nbx):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    basis.T @ deq[by, bx].reshape(8, 8) @ basis + 128.0
                )
        planes[cid] = plane
    return _jpeg_finish(planes, comps, h, w, hmax, vmax)


def decode_image_real(payload: bytes):
    """Dispatch on magic bytes to a real pure-python decoder.  Raises
    NotImplementedError for formats that genuinely need external codec
    libraries (lossless/arithmetic JPEG, video containers) — that
    remaining gap is the ADR; PNG/BMP/PPM and both baseline and
    progressive JPEG are fully decoded here."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise NotImplementedError(
        "unsupported image format (AVI video: use decode_avi; "
        "codec-compressed video needs ffmpeg — ADR)"
    )


def extract_real_meta(docs_with_payload: DataFrame) -> DataFrame:
    """mapInPandas REAL-decode metadata extraction: width/height/
    channels plus a mean-pixel feature per payload, for corpora whose
    binary column holds PNG/BMP/PPM blobs.  Same Arrow plumbing as
    extract_media_meta; per-batch python, never per-row JVM crossings."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image_real(bytes(payload))
                rows.append(
                    (
                        int(doc_id),
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(img.shape[2]),
                        float(np.round(img.astype(np.float64).mean(), 6)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "mean_pixel"],
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        extract,
        schema="doc_id long, width long, height long, channels long, "
        "mean_pixel double",
    )


def decode_wav(payload: bytes):
    """Decode a PCM WAV (RIFF) payload — public spec, stdlib struct +
    numpy only.  Returns (samples ndarray [n_frames, n_channels],
    sample_rate).  8-bit unsigned / 16/32-bit signed integer PCM
    (tag 1) and 32/64-bit IEEE-float PCM (tag 3, incl. the
    WAVE_FORMAT_EXTENSIBLE wrapper when its SubFormat is PCM/float);
    compressed codecs raise NotImplementedError (ADR gap)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("malformed WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, _align, bits = fmt
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real tag is the SubFormat GUID's
        # first two bytes (offset 24 of the fmt body)
        if len(fmt_body) >= 26:
            tag = struct.unpack("<H", fmt_body[24:26])[0]
    if tag == 1:
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
    elif tag == 3:  # IEEE float PCM
        dtype = {32: np.float32, 64: np.float64}.get(bits)
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (integer/float PCM only — ADR)"
        )
    if dtype is None:
        raise NotImplementedError(f"WAV bit depth {bits} for tag {tag}")
    samples = np.frombuffer(
        data[: (len(data) // (n_ch * bits // 8)) * (n_ch * bits // 8)],
        dtype=dtype,
    ).reshape(-1, n_ch)
    return samples, rate


# ------------------------------------------------------------------
# Video: RIFF/AVI container parsing — MJPEG and raw-DIB streams decode
# fully (MJPEG frames are baseline/progressive JPEGs → decode_jpeg;
# raw DIB is bottom-up padded BGR).  Codec-compressed streams (h264,
# cinepak, ...) genuinely need external codecs and stay ADR.
# ------------------------------------------------------------------


def _riff_walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each chunk in a RIFF
    span; LIST chunks yield their TYPE fourcc with the body after it."""
    while pos + 8 <= end:
        fcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body_start, body_end = pos + 8, pos + 8 + size
        if body_end > end:
            raise ValueError("truncated RIFF chunk")
        yield fcc, body_start, body_end
        pos = body_end + (size & 1)


def decode_avi(payload: bytes):
    """Decode an AVI container: returns ``(frames, meta)`` where
    frames is a list of HxWx3 uint8 arrays and meta carries
    width/height/n_frames/us_per_frame/codec.

    Pure stdlib byte walking + the in-house JPEG decoder — no ffmpeg.
    MJPEG ('MJPG') and uncompressed DIB (biCompression=0, 24 bpp)
    streams decode fully; anything codec-bearing raises
    NotImplementedError (the honest ADR boundary).  Malformed payloads
    raise ValueError with a clear message (a corrupt blob in a
    mapInPandas batch must be catchable, not a deep IndexError)."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    avih = strh = strf = None
    movi: list[bytes] = []

    def walk_list(start: int, end: int):
        nonlocal avih, strh, strf
        for fcc, b0, b1 in _riff_walk(payload, start, end):
            if fcc == b"LIST":
                ltype = payload[b0 : b0 + 4]
                # 'rec ' groups interleave frame chunks inside movi
                # (Video-for-Windows muxers) — must be descended or
                # such files silently decode to zero frames
                if ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk_list(b0 + 4, b1)
            elif fcc == b"avih" and avih is None:
                avih = payload[b0:b1]
            elif fcc == b"strh" and strh is None:
                strh = payload[b0:b1]
            elif fcc == b"strf" and strf is None:
                strf = payload[b0:b1]
            elif fcc in (b"00dc", b"00db"):
                movi.append(payload[b0:b1])

    walk_list(12, len(payload))
    if avih is None or strh is None or strf is None:
        raise ValueError("AVI missing avih/strh/strf headers")
    if strh[:4] != b"vids":
        raise ValueError("first AVI stream is not video")
    us_per_frame = int.from_bytes(avih[0:4], "little")
    handler = strh[4:8]
    width = int.from_bytes(strf[4:8], "little", signed=True)
    height_raw = int.from_bytes(strf[8:12], "little", signed=True)
    height = abs(height_raw)
    bpp = int.from_bytes(strf[14:16], "little")
    compression = strf[16:20]
    is_mjpg = handler == b"MJPG" or compression == b"MJPG"
    is_raw = compression == b"\x00\x00\x00\x00"
    frames = []
    for data in movi:
        if is_mjpg:
            frames.append(decode_jpeg(data))
        elif is_raw and bpp == 24:
            stride = (width * 3 + 3) & ~3
            need = stride * height
            if len(data) < need:
                raise ValueError("truncated DIB frame")
            arr = np.frombuffer(data[:need], dtype=np.uint8).reshape(
                height, stride
            )[:, : width * 3].reshape(height, width, 3)
            if height_raw > 0:  # bottom-up
                arr = arr[::-1]
            frames.append(arr[:, :, ::-1].copy())  # BGR → RGB
        else:
            raise NotImplementedError(
                f"AVI codec {handler!r}/{compression!r} needs an external "
                "decoder (ffmpeg) — ADR"
            )
    meta = {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "us_per_frame": us_per_frame,
        "codec": (
            "mjpeg" if is_mjpg else "rawdib" if is_raw else "other"
        ),
    }
    return frames, meta


def sample_frames_real(
    docs_with_payload: DataFrame, stride: int = 4
) -> DataFrame:
    """REAL frame sampling over an AVI binary column: every
    ``stride``-th frame's metadata + mean pixel — the video twin of
    extract_real_meta.  Same shuffle-free mapInPandas plumbing as the
    fixture-backed sample_frames; per-frame mean uses an exact integer
    sum (one final division), so output is bit-stable."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, meta = decode_avi(bytes(payload))
                for idx in range(0, len(frames), stride):
                    f = frames[idx]
                    total = int(f.astype(np.int64).sum())
                    rows.append(
                        (
                            int(doc_id),
                            idx,
                            int(meta["width"]),
                            int(meta["height"]),
                            round(total / f.size, 6),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "width",
                    "height",
                    "mean_pixel",
                ],
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        sample,
        schema="doc_id long, frame_idx int, width int, height int, "
        "mean_pixel double",
    )


def resize_image_real(img, max_w: int = 128, max_h: int = 128):
    """Aspect-preserving nearest-neighbor downsample of a decoded
    H×W×C array — pure integer index mapping (src_i = out_i·src/out,
    floor), so the result is bit-deterministic on any host.  Only
    shrinks; an image already inside the box is returned unchanged."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    out_w, out_h = w, h
    if out_w > max_w:
        out_h = max(1, out_h * max_w // out_w)
        out_w = max_w
    if out_h > max_h:
        out_w = max(1, out_w * max_h // out_h)
        out_h = max_h
    if (out_w, out_h) == (w, h):
        return img
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[np.ix_(ys, xs)]


def resize_media_real(
    docs_with_payload: DataFrame, max_w: int = 128, max_h: int = 128
) -> DataFrame:
    """REAL resize over a binary image column: decode (PNG/BMP/PPM/
    JPEG), nearest-neighbor downsample, emit source/output dims + the
    resized image's exact integer-sum mean — the real-pixel twin of
    the oracled resize_media (which keeps the arithmetic stand-in for
    driver-replayable fixtures).  Shuffle-free mapInPandas."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image_real(bytes(payload))
                out = resize_image_real(img, max_w, max_h)
                total = int(out.astype(np.int64).sum())
                rows.append(
                    (
                        int(doc_id),
                        img.shape[1],
                        img.shape[0],
                        out.shape[1],
                        out.shape[0],
                        round(total / out.size, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "src_width",
                    "src_height",
                    "out_width",
                    "out_height",
                    "mean_pixel",
                ],
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        resize,
        schema="doc_id long, src_width int, src_height int, "
        "out_width int, out_height int, mean_pixel double",
    )


def extract_features_real(docs_with_payload: DataFrame) -> DataFrame:
    """REAL feature extraction over a binary image column: per-channel
    means plus a 2×2 spatial grid of grayscale means — 7 deterministic
    features from decoded pixels (exact integer sums, one final
    division each), the shape an embedding/clustering stage consumes.
    Shuffle-free mapInPandas; the fake-decode twin (extract_features)
    stays for the oracled fixture keys."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image_real(bytes(payload)).astype(np.int64)
                if img.ndim == 2:
                    img = img[:, :, None]
                h, w, c = img.shape
                # color planes only: 2-channel is GRAY+ALPHA (PNG color
                # type 4) — alpha is not a color and must not skew the
                # means; 4-channel drops alpha via the :3 slice
                n_color = 1 if c in (1, 2) else 3
                ch_means = [
                    round(int(img[:, :, k].sum()) / (h * w), 6)
                    for k in range(n_color)
                ]
                while len(ch_means) < 3:
                    ch_means.append(ch_means[-1])
                gray = img[:, :, :n_color].sum(axis=2)
                gdiv = n_color
                h2, w2 = max(1, h // 2), max(1, w // 2)
                quads = []
                for ys, xs in (
                    (slice(0, h2), slice(0, w2)),
                    (slice(0, h2), slice(w2, w)),
                    (slice(h2, h), slice(0, w2)),
                    (slice(h2, h), slice(w2, w)),
                ):
                    q = gray[ys, xs]
                    quads.append(
                        round(int(q.sum()) / (q.size * gdiv), 6)
                        if q.size
                        else 0.0
                    )
                rows.append((int(doc_id), *ch_means, *quads))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "q_tl",
                    "q_tr",
                    "q_bl",
                    "q_br",
                ],
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        extract,
        schema="doc_id long, mean_r double, mean_g double, mean_b double, "
        "q_tl double, q_tr double, q_bl double, q_br double",
    )
