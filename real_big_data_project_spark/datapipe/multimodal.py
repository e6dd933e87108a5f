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


def decode_image_stub(
    payload: bytes | None,
) -> tuple[int | None, int | None, list[float] | None]:
    """STUB DECODER — deterministic fake.

    A real deployment replaces this body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))      # decode
        img = img.resize((224, 224))                   # resize
        arr = np.asarray(img, dtype=np.float32) / 255  # normalize
        return img.width, img.height, embed(arr)       # feature-extract

    PIL/ffmpeg are not installed in this container, so we derive
    deterministic pseudo-dimensions and a pseudo-feature vector from the
    payload's md5 — stable across runs/engines AND reproducible in ANSI
    SQL (the oracle's engine ships md5, not sha1), which puts even the
    stub path under the value-level correctness gate.

    A NULL payload decodes to NULL dims/features rather than failing the
    job: at corpus scale a missing blob is data to quarantine downstream
    (filter on width IS NULL), not a reason to kill a 1000-executor stage.
    """
    if payload is None:
        return None, None, None
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    features = [round(b / 255.0, 6) for b in h[2:2 + FEATURE_DIM]]
    return width, height, features


def decode_dispatch(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, list[float] | None]:
    """Per-payload codec dispatch — the mixed-feed decode entry point
    (mirrors the reference's per-file format dispatch at
    /root/reference/etl/etl.py:507-511, lifted to binary payloads):
    sniff the container magic, route to the real decoder when one exists
    (24-bit BMP here), fall back to the pluggable stub otherwise, and
    pass NULL payloads through as NULL rows. Returns
    (codec, width, height, features)."""
    if payload is None:
        return None, None, None, None
    if payload[:2] == b"BM":
        w, h, feats = decode_bmp(payload)
        return "bmp", w, h, feats
    w, h, feats = decode_image_stub(payload)
    return "stub", w, h, feats


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


# ---------------------------------------------------------------------------
# Real codec: 24-bit BMP (pure struct — no PIL needed). One real format so
# decode correctness is oracle-checkable; the pluggable stub above remains
# for formats whose codecs aren't in this container.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, base: int) -> bytes:
    """Encode a width×height 24-bit BMP whose grayscale pixel at image
    coordinate (x, y) is ``base + x + y`` (callers keep base + w + h < 256
    so no wraparound). Bottom-up row order, rows padded to 4 bytes — the
    standard layout any real decoder must handle."""
    import struct

    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            v = base + x + y
            body += bytes((v, v, v))  # B, G, R
        body += b"\x00" * pad
    img_size = len(body)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return bytes(header + dib + body)


def decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL decoder: parse the BMP headers + pixel array with ``struct``
    and return (width, height, 8 grayscale features):

    [mean, min, max, first-row mean, last-row mean, first-col mean,
     last-col mean, n_pixels] — each a plain pixel statistic a real
    feature extractor would start from, and each closed-form predictable
    for the generator above, so the whole decode sits under a DuckDB
    oracle. Handles bottom-up and top-down (negative height) layouts and
    row padding."""
    import struct

    if payload is None or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size, width, height_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={compression}")
    height = abs(height_raw)
    top_down = height_raw < 0
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4

    rows: list[list[int]] = []
    for stored in range(height):
        y = stored if top_down else height - 1 - stored
        off = data_offset + stored * stride
        # grayscale = blue channel (r==g==b for our generator; a real
        # extractor would weight channels — same plumbing)
        row = [payload[off + 3 * x] for x in range(width)]
        while len(rows) <= y:
            rows.append([])
        rows[y] = row

    n = width * height
    flat = [v for row in rows for v in row]
    mean = sum(flat) / n
    feats = [
        mean,
        float(min(flat)),
        float(max(flat)),
        sum(rows[0]) / width,
        sum(rows[-1]) / width,
        sum(r[0] for r in rows) / height,
        sum(r[-1] for r in rows) / height,
        float(n),
    ]
    return width, height, [round(f, 6) for f in feats]


def bmp_assets(docs: DataFrame) -> DataFrame:
    """Deterministic real-BMP asset table from `documents`: doc_id drives
    width = 4 + id%13, height = 3 + id%7, base gray = id%193 (so
    base + w + h < 256 — no wraparound and the pixel stats are closed
    form). Encoding runs executor-side via mapInPandas, exactly where a
    real transcode stage would."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                encode_bmp(4 + int(d) % 13, 3 + int(d) % 7, int(d) % 193)
                for d in ids
            ]
            yield pd.DataFrame({
                "asset_id": ids,
                "modality": "image",
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
                "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
            })

    return docs.select("doc_id").mapInPandas(encode, schema=ASSET_SCHEMA)


BMP_FEATURES_SCHEMA = T.StructType(
    FEATURES_SCHEMA.fields[:2]
    + [T.StructField("n_bytes", T.LongType(), True)]
    + FEATURES_SCHEMA.fields[2:]
)


def extract_bmp_features(assets: DataFrame) -> DataFrame:
    """Same one-pass mapInPandas stage as ``extract_features`` but with the
    REAL BMP decoder — this is the oracled path. Carries ``n_bytes``
    through so encoder output size and decoder stats come out of ONE
    map-only stage (no join-back shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_bmp(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].astype("int64"),
                "modality": pdf["modality"],
                "n_bytes": pdf["n_bytes"].astype("int64"),
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "features": [d[2] for d in decoded],
            })

    return assets.mapInPandas(run, schema=BMP_FEATURES_SCHEMA)


DISPATCH_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("codec", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.DoubleType()), True),
])


def extract_features_dispatch(assets: DataFrame) -> DataFrame:
    """Mixed-format decode: ONE mapInPandas stage that sniffs each
    payload's magic and routes to the real decoder (BMP) or the pluggable
    stub (decode_dispatch). Shuffle-free — format dispatch is a per-row
    decision inside the Arrow batch, not a split/union of the plan, so a
    100 TB mixed feed stays a single map stage regardless of the format
    mix per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_dispatch(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].astype("int64"),
                "modality": pdf["modality"],
                "codec": [d[0] for d in decoded],
                "width": [d[1] for d in decoded],
                "height": [d[2] for d in decoded],
                "features": [d[3] for d in decoded],
            })

    return assets.mapInPandas(run, schema=DISPATCH_SCHEMA)


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
