"""Pure-python baseline JPEG decoder: real byte-stream fixtures from
CPython's test suite decoded against a lossless PPM ground truth.

Parity surface: the reference decodes jpeg through OpenCV
(/root/reference/petastorm/codecs.py:58-130, exercised by its
tests/test_codec_compressed_image.py); here the decode path must work
with no image library in the container at all.
"""

from __future__ import annotations

import numpy as np
import pytest

from petastorm_spark.functions.pure_jpeg import jpeg_decode
from tests.fixtures_images import (
    JPEG_BASELINE_420,
    JPEG_NO_JFIF_HEADER,
    PPM_GROUND_TRUTH,
)


def _ppm_pixels() -> np.ndarray:
    parts = PPM_GROUND_TRUTH.split(b"\n", 3)
    assert parts[0] == b"P6"
    w, h = (int(x) for x in parts[1].split())
    assert parts[2] == b"255"
    return (
        np.frombuffer(parts[3][: w * h * 3], dtype=np.uint8)
        .reshape(h, w, 3)
        .astype(np.float64)
    )


@pytest.mark.parametrize("raw", [JPEG_BASELINE_420, JPEG_NO_JFIF_HEADER])
def test_decode_baseline_420_matches_lossless_twin(raw):
    """16x16 YCbCr 4:2:0 baseline frame vs the lossless PPM of the same
    logo. Bounds are honest measurements of THIS fixture's quantization
    + chroma subsampling: luma (full-res) tracks closely, chroma edges
    on a sharp logo diverge pointwise but not in aggregate."""
    dec = jpeg_decode(raw)
    assert dec.shape == (16, 16, 3)
    assert dec.dtype == np.uint8
    gt = _ppm_pixels()
    d = dec.astype(np.float64)
    assert np.abs(d - gt).mean() < 12.0  # measured 8.82
    luma = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert np.abs(luma(d) - luma(gt)).mean() < 5.0  # measured 3.03
    assert np.corrcoef(d.ravel(), gt.ravel())[0, 1] > 0.95  # measured 0.983


def test_decode_both_fixtures_agree():
    """The JFIF-headered and headerless streams carry the same frame."""
    a = jpeg_decode(JPEG_BASELINE_420)
    b = jpeg_decode(JPEG_NO_JFIF_HEADER)
    assert np.array_equal(a, b)


def test_progressive_raises_not_implemented():
    # splice the SOF0 marker into SOF2 (progressive): the decoder must
    # refuse rather than mis-decode
    raw = bytearray(JPEG_BASELINE_420)
    idx = raw.find(b"\xff\xc0")
    assert idx > 0
    raw[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg_decode(bytes(raw))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_compressed_image_codec_decodes_real_jpeg():
    """CompressedImageCodec('jpeg').decode handles an externally-written
    baseline jpeg byte stream with no PIL in the container."""
    from petastorm_spark.codecs import CompressedImageCodec
    from petastorm_spark.unischema import UnischemaField

    field = UnischemaField("img", np.uint8, (16, 16, 3), None, False)
    codec = CompressedImageCodec("jpeg")
    out = codec.decode(field, JPEG_BASELINE_420)
    assert out.shape == (16, 16, 3)
    assert out.dtype == np.uint8


def test_multimodal_kernels_consume_real_jpeg(spark):
    """with_image_meta / resize_images / embed_images over a column of
    real baseline JPEG bytes — format reported 'jpeg'."""
    from petastorm_spark.operators.multimodal import (
        embed_images,
        resize_images,
        with_image_meta,
    )

    df = spark.createDataFrame(
        [(1, bytearray(JPEG_BASELINE_420)), (2, bytearray(JPEG_NO_JFIF_HEADER))],
        "id: long, img: binary",
    )
    meta = with_image_meta(df, "img").orderBy("id").collect()
    assert [m.image_meta.format for m in meta] == ["jpeg", "jpeg"]
    assert meta[0].image_meta.height == 16 and meta[0].image_meta.width == 16

    small = resize_images(df, "img", "small", (8, 8)).orderBy("id").collect()
    assert all(r.small is not None for r in small)

    emb = embed_images(df, "img", dim=16).orderBy("id").collect()
    assert len(emb[0].embedding) == 16
    # deterministic: the two identical frames embed identically
    assert np.allclose(emb[0].embedding, emb[1].embedding)


# ---- encoder ---------------------------------------------------------------


def _smooth_rgb(h=64, w=96):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            x * 255 / w,
            y * 255 / h,
            128 + 100 * np.sin(x / 15.0) * np.cos(y / 12.0),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_encode_round_trip_quality_ladder():
    img = _smooth_rgb()
    from petastorm_spark.functions.pure_jpeg import jpeg_encode

    prev_size = None
    for q, bound in ((95, 2.0), (80, 3.0), (50, 5.0)):
        enc = jpeg_encode(img, quality=q)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        dec = jpeg_decode(enc)
        err = np.abs(dec.astype(float) - img.astype(float)).mean()
        assert err < bound, (q, err)  # measured 0.62 / 1.08 / 1.76
        if prev_size is not None:
            assert len(enc) < prev_size  # lower quality -> smaller file
        prev_size = len(enc)


def test_encode_grayscale_and_odd_sizes():
    from petastorm_spark.functions.pure_jpeg import jpeg_encode

    gray = _smooth_rgb()[..., 0]
    dec = jpeg_decode(jpeg_encode(gray, quality=90))
    assert dec.shape == gray.shape and dec.ndim == 2
    assert np.abs(dec.astype(float) - gray.astype(float)).mean() < 2.0

    odd = _smooth_rgb()[:50, :70]  # not multiples of 8: edge padding
    dec = jpeg_decode(jpeg_encode(odd, 85))
    assert dec.shape == (50, 70, 3)
    assert np.abs(dec.astype(float) - odd.astype(float)).mean() < 3.0


def test_encode_survives_noise_and_flat():
    """Adversarial content for the entropy coder: pure noise exercises
    ZRL/long AC runs and byte stuffing; flat images exercise all-EOB."""
    from petastorm_spark.functions.pure_jpeg import jpeg_encode

    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(noise, 90))
    assert dec.shape == noise.shape  # lossy, but structurally intact

    flat = np.full((24, 24), 200, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(flat, 80))
    assert np.abs(dec.astype(float) - 200).max() <= 2


def test_codec_jpeg_encode_is_real_jfif():
    """CompressedImageCodec('jpeg') without PIL now writes real JFIF
    bytes (uint8); uint16 keeps the RAW0 container."""
    from petastorm_spark.codecs import CompressedImageCodec
    from petastorm_spark.unischema import UnischemaField

    img = _smooth_rgb(32, 32)
    f8 = UnischemaField("img", np.uint8, (32, 32, 3), None, False)
    codec = CompressedImageCodec("jpeg", quality=92)
    raw = bytes(codec.encode(f8, img))
    assert raw[:2] == b"\xff\xd8"
    out = codec.decode(f8, raw)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 3.0

    img16 = (img.astype(np.uint16) << 8)[..., 0]
    f16 = UnischemaField("img", np.uint16, (32, 32), None, False)
    raw16 = bytes(codec.encode(f16, img16))
    assert raw16[:4] == b"RAW0"
    assert np.array_equal(codec.decode(f16, raw16), img16)
