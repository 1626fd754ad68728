"""REAL image decode (no Pillow): PNG (stdlib zlib + spec defilter),
uncompressed BMP, binary PPM — each decoder round-tripped against
images encoded in-test from known pixel arrays, including every PNG
filter type, then driven end-to-end through the Arrow mapInPandas
metadata stage.  JPEG/video remain the documented ADR gap."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pfithic_spark import multimodal as mm


def _rng_img(h, w, c, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def _encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (filter applied per the spec, so decoding
    exercises the REVERSE of each filter, not just filter 0)."""
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        raw.append(filter_type)
        if filter_type == 0:
            enc = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - left) % 256
        elif filter_type == 2:  # Up
            enc = (row - prev) % 256
        elif filter_type == 3:  # Average
            enc = row.copy()
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) % 256
        elif filter_type == 4:  # Paeth
            enc = row.copy()
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (row[i] - pred) % 256
        raw.extend(int(v) & 0xFF for v in enc)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB → BGR
        data.extend(row)
        data.extend(b"\x00" * (row_bytes - len(row)))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + info + bytes(data)


def _encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3
    return f"P6\n# test\n{w} {h}\n255\n".encode() + img.tobytes()


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type, channels):
    img = _rng_img(5, 7, channels, seed=filter_type * 10 + channels)
    got = mm.decode_png(_encode_png(img, filter_type))
    np.testing.assert_array_equal(got, img)


def test_bmp_roundtrip():
    img = _rng_img(6, 5, 3)
    np.testing.assert_array_equal(mm.decode_bmp(_encode_bmp(img)), img)


def test_ppm_roundtrip_with_comment():
    img = _rng_img(4, 9, 3)
    np.testing.assert_array_equal(mm.decode_ppm(_encode_ppm(img)), img)


def test_decode_dispatch_and_adr_gap():
    img = _rng_img(3, 3, 3)
    assert mm.decode_image_real(_encode_png(img)).shape == (3, 3, 3)
    assert mm.decode_image_real(_encode_bmp(img)).shape == (3, 3, 3)
    assert mm.decode_image_real(_encode_ppm(img)).shape == (3, 3, 3)
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\xff\xd8\xff\xe0JFIF-ish")  # JPEG magic


def test_extract_real_meta_mapinpandas(spark):
    """End-to-end: PNG/BMP/PPM payloads in a binary column through the
    Arrow mapInPandas stage; dimensions and mean pixel must match the
    source arrays."""
    imgs = {1: _rng_img(8, 6, 3, 1), 2: _rng_img(5, 5, 3, 2), 3: _rng_img(3, 10, 3, 3)}
    rows = [
        (1, bytearray(_encode_png(imgs[1], filter_type=4))),
        (2, bytearray(_encode_bmp(imgs[2]))),
        (3, bytearray(_encode_ppm(imgs[3]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.extract_real_meta(df).collect()}
    for i, img in imgs.items():
        assert got[i]["width"] == img.shape[1]
        assert got[i]["height"] == img.shape[0]
        assert got[i]["channels"] == 3
        assert got[i]["mean_pixel"] == float(
            np.round(img.astype(np.float64).mean(), 6)
        )


def _encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    n_frames, n_ch = samples.shape
    assert samples.dtype == np.int16
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm_roundtrip():
    rng = np.random.default_rng(5)
    samples = rng.integers(-32768, 32767, (250, 2), dtype=np.int16)
    got, rate = mm.decode_wav(_encode_wav(samples, rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(got, samples)


def test_wav_compressed_is_adr_gap():
    samples = np.zeros((4, 1), dtype=np.int16)
    payload = bytearray(_encode_wav(samples))
    payload[20] = 2  # format tag: ADPCM
    with pytest.raises(NotImplementedError):
        mm.decode_wav(bytes(payload))
