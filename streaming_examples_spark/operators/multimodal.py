"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature-extract as Arrow-batched ``mapInPandas`` stages.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI); metadata (codec, dims,
duration) is typed columns; decode/resize/frame-sample run as
``mapInPandas`` over Arrow batches so each Python worker touches a
bounded batch of bytes. Partitioning stays row-count based
(``maxRecordsPerBatch`` keeps batches memory-safe for large blobs).

The decode bodies here are deterministic fakes — the real image/audio
libs are not in this container (clearly marked below); everything
around them (schema, batching, UDF signature, null handling) is real
and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def with_binary_payload(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + typed metadata (stands in for
    image/audio bytes; on real data this column comes from the source)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("utf-8-text").alias("codec"),
        ),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_and_featurize(docs_with_payload: DataFrame, *, batch_hint: int = 1024) -> DataFrame:
    """"Decode" each payload and emit a small feature vector.

    STUB DECODER: a real pipeline would call PIL/ffmpeg here — not
    available in this container — so the decode is a deterministic
    fake (dims derived from byte length, features from byte content).
    The mapInPandas plumbing (Arrow batches, schema, column pruning of
    the binary column) is the real, scale-relevant part.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            # --- deterministic fake decode (see docstring) -------------
            width = (n_bytes % 640).astype("int32") + 1
            height = (n_bytes % 480).astype("int32") + 1
            feature = payloads.map(
                lambda b: [
                    float(sum(b[i::8]) % 256) / 255.0 for i in range(8)
                ]
            )
            # -----------------------------------------------------------
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "width": width,
                    "height": height,
                    "feature": feature,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        decode, schema=DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_payloads(
    docs_with_payload: DataFrame, *, width: int = 224, height: int = 224
) -> DataFrame:
    """"Resize" each image payload to a fixed ``width``×``height``.

    STUB RESIZER: a real pipeline calls PIL/torchvision here — not in
    this container — so the body deterministically truncates/tiles the
    source bytes to exactly ``width*height`` bytes (grayscale-plane
    stand-in). The real, scale-relevant parts: the binary column rides
    Arrow batches (bounded by ``maxRecordsPerBatch``), output bytes
    are fixed-size (so downstream batch memory is predictable — the
    reason training pipelines resize BEFORE shuffling samples), and
    empty payloads pass through as empty bytes, not nulls.
    """
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(b: bytes) -> bytes:
                if not b:
                    return b""
                reps = -(-target // len(b))  # ceil-divide, then trim
                return (b * reps)[:target]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized": pdf["payload"].map(fake_resize),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        resize, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    docs_with_payload: DataFrame, *, n_frames: int = 4, frame_interval_ms: int = 1000
) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced "frames" from each video
    payload — the 1-to-N shape (one input row → several frame rows).

    STUB DECODER: real frame extraction is ffmpeg — not in this
    container — so each frame is the i-th of ``n_frames`` even byte
    slices. The scale-relevant parts are real: ``mapInPandas`` emits
    MORE rows than it receives (the Arrow iterator contract allows
    any output cardinality, so no explode-then-decode double pass),
    frame timestamps are typed columns ready for windowed sampling
    downstream, and payloads too short to slice yield zero rows
    (skip, not null-explode).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, blobs = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if not b or len(b) < n_frames:
                    continue
                step = len(b) // n_frames
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * frame_interval_ms)
                    blobs.append(bytes(b[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": pd.Series(blobs, dtype=object),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        frames, schema=FRAMES_SCHEMA
    )


def payload_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Pure-SQL metadata over binary payloads (no decode): byte length
    + prefix hex — pushdown-friendly filtering before any decode."""
    return docs_with_payload.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.lower(F.hex(F.col("payload"))), 1, 16).alias("prefix_hex"),
    )
