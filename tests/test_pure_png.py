"""Pure-python PNG codec: spec-valid bytes, filterful decode, and the
CompressedImageCodec round trip through a materialized dataset."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql.types import IntegerType

from petastorm_spark.codecs import CompressedImageCodec, ScalarCodec
from petastorm_spark.functions.pure_png import png_decode, png_encode

rng = np.random.default_rng(11)


def _parse_chunks(data):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF), tag
        chunks.append((tag, body))
        pos += 12 + length
    return chunks


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((13, 7), np.uint8),
        ((8, 5, 3), np.uint8),
        ((6, 9), np.uint16),
        ((4, 3, 3), np.uint16),
    ],
)
def test_png_roundtrip_and_structure(shape, dtype):
    hi = 255 if dtype == np.uint8 else 65535
    img = rng.integers(0, hi + 1, shape).astype(dtype)
    data = png_encode(img)
    tags = [t for t, _ in _parse_chunks(data)]
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND" and b"IDAT" in tags
    back = png_decode(data)
    assert back.dtype == dtype and back.shape == shape
    np.testing.assert_array_equal(back, img)


def _filter_lines(img, ftype):
    """Forward-filter scanlines per the PNG spec (encoder side of the
    filters the decoder must invert)."""
    h, stride = img.shape[0], img.shape[1] * (1 if img.ndim == 2 else img.shape[2])
    raw = img.reshape(h, stride).astype(np.int64)
    bpp = 1 if img.ndim == 2 else img.shape[2]
    out = b""
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = raw[y]
        filt = np.empty(stride, dtype=np.int64)
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            upleft = prev[x - bpp] if x >= bpp else 0
            up = prev[x]
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else upleft)
            filt[x] = (line[x] - pred) & 0xFF
        out += bytes([ftype]) + bytes(filt.astype(np.uint8))
        prev = line
    return out


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_decode_filtered_scanlines(ftype):
    """Sub/Up/Average/Paeth-filtered PNGs (what real encoders emit)
    must decode to the original pixels."""
    img = rng.integers(0, 256, (9, 6, 3)).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", 6, 9, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(_filter_lines(img, ftype)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png_decode(data), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        png_encode(np.zeros((2, 2), np.float32))
    with pytest.raises(ValueError):
        png_decode(b"not a png")
    # palette color type
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        png_decode(bad)


def test_image_codec_emits_real_png_without_pil(spark, tmp_path):
    """C4 parity, provable in THIS container: CompressedImageCodec
    round-trips an actual png through a materialized dataset."""
    from petastorm_spark.etl.dataset_metadata import materialize_dataset
    from petastorm_spark.reader import make_reader
    from petastorm_spark.unischema import (
        Unischema,
        UnischemaField,
        dict_to_spark_row,
    )

    schema = Unischema(
        "ImgSchema",
        [
            UnischemaField("id", np.int32, (), ScalarCodec(IntegerType()), False),
            UnischemaField(
                "image", np.uint8, (16, 12, 3), CompressedImageCodec("png"), False
            ),
        ],
    )
    imgs = [rng.integers(0, 256, (16, 12, 3)).astype(np.uint8) for _ in range(6)]
    url = str(tmp_path / "imgds")
    with materialize_dataset(spark, url, schema):
        spark.createDataFrame(
            [
                dict_to_spark_row(schema, {"id": i, "image": im})
                for i, im in enumerate(imgs)
            ],
            schema.as_spark_schema(),
        ).coalesce(1).write.mode("overwrite").parquet(url)

    # stored payloads are REAL png byte streams (signature + valid CRCs)
    raw = spark.read.parquet(url).select("id", "image").collect()
    for row in raw:
        payload = bytes(row.image)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        _parse_chunks(payload)

    with make_reader(url, spark=spark) as r:
        got = {x.id: x.image for x in r}
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(got[i], im)
