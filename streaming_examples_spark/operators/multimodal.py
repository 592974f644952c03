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


def payload_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Pure-SQL metadata over binary payloads (no decode): byte length
    + prefix hex — pushdown-friendly filtering before any decode."""
    return docs_with_payload.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.lower(F.hex(F.col("payload"))), 1, 16).alias("prefix_hex"),
    )
