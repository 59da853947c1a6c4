"""Multimodal corpus plumbing: the image+caption documents table
(BASELINE.json input_hint schema) as DataFrame operators.

Images/audio/video are opaque ``binary`` columns with typed metadata;
all decode/feature work runs inside Arrow batches via mapInPandas.
Real JPEG/audio/video codecs are not in this container — decode_image
raises NotImplementedError for them (sources/images.py), while the
Spark-side plumbing (schema, batch shape, partitioning) is identical to
a production deployment with PIL/ffmpeg plugged in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def synth_corpus(spark: SparkSession, n: int, partitions: int = 16) -> DataFrame:
    """Materialize n deterministic image+caption rows, built in Arrow
    batches on the executors (nothing flows through the driver)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vbpl_web_crawl_spark.sources import images as IMG

        for pdf in it:
            recs = [IMG.synth_image_record(f"img{int(i):08d}") for i in pdf["id"]]
            out = pd.DataFrame(recs, columns=[f.name for f in CORPUS_SCHEMA.fields])
            out["phash"] = pd.array([r["phash"] for r in recs], dtype="Int64")
            yield out

    return spark.range(n).repartition(partitions).mapInPandas(gen, CORPUS_SCHEMA)


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("phash_match", T.BooleanType(), False),
        T.StructField("caption_tokens", T.IntegerType(), False),
    ]
)


def decode_features(corpus: DataFrame) -> DataFrame:
    """Decode each image and extract features (mean luma, phash
    recomputation check) — the decode/feature-extract stage of a
    multimodal training pipeline, one Arrow batch at a time."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vbpl_web_crawl_spark.sources import images as IMG

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = IMG.decode_image(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "w": int(r.w),
                        "h": int(r.h),
                        "mean_luma": float(px.astype("float64").mean()),
                        "phash_match": IMG.phash64(px) == r.phash,
                        "caption_tokens": len(r.caption.split()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_STATS_SCHEMA.fields])

    return corpus.mapInPandas(run, DECODE_STATS_SCHEMA)


def resize_to_thumbnail(corpus: DataFrame, size: int = 32) -> DataFrame:
    """Resize stage (block-mean downsample; PIL-free) -> thumbnail
    binary column. Shows the transform-and-reencode batch shape."""
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("thumb_png", T.BinaryType(), False),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from vbpl_web_crawl_spark.sources import images as IMG

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = IMG.decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                bh, bw = max(h // size, 1), max(w // size, 1)
                small = (
                    px[: bh * size, : bw * size]
                    .reshape(size, bh, size, bw, 3)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                rows.append({"image_id": r.image_id, "thumb_png": IMG.png_encode(small)})
            yield pd.DataFrame(rows, columns=["image_id", "thumb_png"])

    return corpus.mapInPandas(run, out_schema)
