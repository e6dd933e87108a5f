"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

Design for 100 TB of images/audio/video interleaved with text:
  * the payload is an opaque ``binary`` column next to typed metadata
    (modality, byte length, content hash) — Spark shuffles/partitions the
    bytes without interpreting them, and Parquet stores them as BYTE_ARRAY
    with column stats on the metadata only;
  * decode / feature-extract / resize / frame-sample run as ``mapInPandas``
    stages: Arrow moves each partition to Python in columnar batches (the
    ONLY sanctioned Python hot path in this engine), the UDF is pure
    per-batch, and the output schema is declared up front so Catalyst can
    keep planning around it;
  * batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
    — at real payload sizes set it so a batch of decoded frames fits in
    worker memory.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
container, so ``decode_image_stub`` is a clearly-marked deterministic fake
behind the same signature the real decoder would have; the Spark-side
plumbing (schema, partitioning, UDF shape, batch iteration) is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of a multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_md5", T.StringType(), True),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.DoubleType()), True),
])


def synthetic_assets(docs: DataFrame, modality_col: str = "source") -> DataFrame:
    """Derive a deterministic multimodal asset table from `documents`:
    the text bytes stand in for an encoded payload (the container has no
    real image/audio fixtures). Pure expressions — checksum/length/modality
    are computed JVM-side, exactly as they would be on real payloads.
    md5 (not sha1) because the correctness oracle's engine only ships md5."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB DECODER — deterministic fake.

    A real deployment replaces this body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))      # decode
        img = img.resize((224, 224))                   # resize
        arr = np.asarray(img, dtype=np.float32) / 255  # normalize
        return img.width, img.height, embed(arr)       # feature-extract

    PIL/ffmpeg are not installed in this container, so we derive
    deterministic pseudo-dimensions and a pseudo-feature vector from the
    payload's sha1 — stable across runs/engines, which lets the plumbing
    be tested end-to-end without the codec.
    """
    if payload is None:
        raise NotImplementedError("real decoder required for NULL-payload repair")
    h = hashlib.sha1(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    features = [round(b / 255.0, 6) for b in h[2:2 + FEATURE_DIM]]
    return width, height, features


def extract_features(assets: DataFrame) -> DataFrame:
    """decode → resize → feature-extract as ONE mapInPandas stage.

    One Arrow round-trip per partition; the iterator-of-batches shape means
    constant memory regardless of partition size. Output schema is declared
    (FEATURES_SCHEMA) so downstream stays fully planned.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].astype("int64"),
                "modality": pdf["modality"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "features": [d[2] for d in decoded],
            })

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame-sampling plumbing: explode one row per sampled "frame"
    offset. With a real container parser the offsets would come from the
    codec index; here they are byte strides — the partitioning/explode
    shape (1 asset row → k frame rows, still distributed) is the point."""
    # floor, not cast — cast(double→int) truncates in Spark but rounds in
    # DuckDB; floor agrees everywhere for non-negative counts.
    n_frames = F.greatest(
        F.floor(F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "asset_id",
            "frame_idx",
            (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
            "n_bytes",
        )
    )
