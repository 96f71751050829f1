"""Multimodal queries (rows-only checks — binary media has no SQL
oracle; correctness is covered by tests/test_multimodal.py goldens).

Media is generated deterministically ON THE EXECUTORS (mapInPandas over
spark.range) — no driver-side byte shuffling, the same shape a real
100 TB media table scan has.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    MEDIA_SCHEMA,
    encode_fake_image,
    encode_fake_video,
    extract_features,
    media_embedding,
    sample_frames,
)
from ..session import ensure_pyfiles
from .registry import register

N_IMAGES, N_VIDEOS = 48, 16


def synthetic_media(spark: SparkSession) -> DataFrame:
    ensure_pyfiles(spark)
    base = spark.range(N_IMAGES + N_VIDEOS).repartition(8)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for raw in pdf["id"]:
                i = int(raw)
                if i < N_IMAGES:
                    w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
                    rows.append(
                        (i, "image", encode_fake_image(w, h, seed=i), w, h, 1, None, "synm")
                    )
                else:
                    w = h = 8
                    n = 4 + (i % 4) * 2
                    rows.append(
                        (i, "video", encode_fake_video(w, h, n, seed=i), w, h, n, None, "synm")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return base.mapInPandas(gen, MEDIA_SCHEMA)


@register(
    "q_media_features",
    None,
    doc="Multimodal: binary payload → intensity stats + 16-bin histogram "
    "via mapInPandas (decode kernel pluggable; fake codec in this env). "
    "Rows-only check; golden values in tests/test_multimodal.py.",
)
def q_media_features(spark, sf_dir):
    feats = extract_features(synthetic_media(spark))
    return feats.select("media_id", "kind", "n_frames", "mean_intensity", "std_intensity")


@register(
    "q_media_frame_sample",
    None,
    doc="Multimodal: video frame sampling (row-expanding mapInPandas, one "
    "row per kept frame). Rows-only check.",
)
def q_media_frame_sample(spark, sf_dir):
    media = synthetic_media(spark)
    frames = sample_frames(media.where("kind = 'video'"), every_n=2)
    return frames.select("media_id", "frame_idx", "mean_intensity")


@register(
    "q_media_embedding",
    None,
    doc="Multimodal: media → unit-norm embedding (histogram features "
    "through a fixed projection; CLIP-encoder stand-in). Rows-only check.",
)
def q_media_embedding(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = media_embedding(synthetic_media(spark), dim=32)
    # scalar projection of the vector so the row check sees stable values
    norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return emb.select("media_id", "kind", F.round(norm, 4).alias("sq_norm"))
