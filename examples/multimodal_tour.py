"""Tour of the multimodal surface on the sf0.001 testdata: opaque
binary columns (image/audio/video) with typed metadata, decode /
resize / frame-sample kernels, and perceptual near-dup across all
three modalities via the shared 60-bit fingerprint machinery.

The reference ships image-centric examples (examples/imagenet,
examples/mnist); this is the Spark-first equivalent over the engine's
own pure-python codecs — no PIL/ffmpeg needed.

    PYTHONPATH=. python examples/multimodal_tour.py
"""

import numpy as np
import pandas as pd

from petastorm_spark.functions.pure_png import png_encode
from petastorm_spark.operators.audio import (
    audio_dup_pairs,
    encode_wav,
    with_audio_meta,
)
from petastorm_spark.operators.multimodal import (
    encode_fake_image,
    image_dup_pairs,
    resize_images,
    with_image_meta,
)
from petastorm_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("multimodal_tour")
    ids = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")

    # 1. attach binary columns: real PNG images and real PCM WAV clips
    def media(batches):
        rng_like = None  # deterministic from doc_id, no RNG state
        for pdf in batches:
            imgs, wavs, vids = [], [], []
            for did in pdf["doc_id"]:
                d = int(did)
                px = (np.arange(48, dtype=np.int64) * (d + 7)) % 251
                imgs.append(png_encode(px.reshape(6, 8).astype(np.uint8)))
                s = ((np.arange(320) * (d + 3)) % 199).astype(np.int16)
                wavs.append(encode_wav(s, 16000))
                fr = ((np.arange(61 * 4) * (d + 11)) % 223).astype(np.uint8)
                vids.append(encode_fake_image(fr.reshape(61, 2, 2)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "image": imgs,
                 "audio": wavs, "video": vids}
            )

    df = ids.mapInPandas(
        media, "doc_id bigint, image binary, audio binary, video binary"
    )

    # 2. typed metadata without decoding into rows
    with_image_meta(df, "image").select("doc_id", "image_meta.*").show(3)
    with_audio_meta(df, "audio").select("doc_id", "audio_meta.*").show(3)

    # 3. transform kernel: decode -> nearest-neighbor resize -> PNG out
    small = resize_images(df, "image", "thumb", (3, 4))
    print("thumbnails:", small.select("doc_id", "thumb").count())

    # 4. perceptual near-dup, image and audio legs (same banded join)
    print("image dup pairs:",
          image_dup_pairs(df, "image", "doc_id", max_hamming=3).count())
    print("audio dup pairs:",
          audio_dup_pairs(df, "audio", "doc_id", max_hamming=3).count())

    spark.stop()


if __name__ == "__main__":
    main()
