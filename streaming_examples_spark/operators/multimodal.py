"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature-extract as Arrow-batched ``mapInPandas`` stages.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI); metadata (codec, dims,
duration) is typed columns; decode/resize/frame-sample run as
``mapInPandas`` over Arrow batches so each Python worker touches a
bounded batch of bytes. Partitioning stays row-count based
(``maxRecordsPerBatch`` keeps batches memory-safe for large blobs).

The payload is a REAL structured format (SIMG below — the container
has no image libs, so the codec is synthetic, but the byte layout,
header parsing, validation, and per-band statistics are genuine
binary decoding, oracle-checked byte-for-byte in DuckDB). Only
``resize_payloads``/``sample_frames`` keep stand-in transform bodies
(real resampling is PIL/ffmpeg territory); their Arrow plumbing —
schema, batching, 1→N cardinality, null handling — is real and
tested.

SIMG payload layout (big-endian, 10-byte header):

    bytes 0-3   magic "SIMG"
    byte  4     version (0x01)
    bytes 5-6   width   uint16
    byte  7     n_bands uint8   (band-interleaved pixel layout)
    bytes 8-9   height  uint16
    bytes 10+   width*height*n_bands pixel bytes; pixel p's band b
                sample sits at offset p*n_bands + b
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

SIMG_MAGIC = b"SIMG"
SIMG_HEADER_LEN = 10


def with_binary_payload(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a structured binary column + typed metadata (stands in
    for image bytes; on real data this column comes from the source).

    The payload is a valid SIMG byte string (module docstring):
    deterministic dims derived from the doc id, pixel bytes = the
    leading ``width*height*n_bands`` bytes of the UTF-8 text. Pure
    Catalyst construction (hex-string assembly + unhex + binary
    concat) — map-only, no Python."""
    tb = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(tb)
    w = (F.pmod(F.col(id_col), F.lit(9)) + 8).cast("int")
    b = (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int")
    h = F.least(F.floor(n / (w * b)), F.lit(65535)).cast("int")
    header_hex = F.concat(
        F.lit("53494D47"),  # "SIMG"
        F.lit("01"),
        F.lpad(F.hex(w), 4, "0"),
        F.lpad(F.hex(b), 2, "0"),
        F.lpad(F.hex(h), 4, "0"),
    )
    payload = F.concat(F.unhex(header_hex), tb.substr(F.lit(1), w * h * b))
    return docs.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("simg-v1").alias("codec"),
        ),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bands", T.IntegerType()),
        T.StructField("band_mean", T.ArrayType(T.DoubleType())),
        T.StructField("band_max", T.ArrayType(T.IntegerType())),
        T.StructField("checksum", T.LongType()),
    ]
)


def decode_and_featurize(docs_with_payload: DataFrame, *, batch_hint: int = 1024) -> DataFrame:
    """Decode each SIMG payload: validate magic/version, parse the
    header, and compute per-band pixel statistics (mean, max) plus a
    whole-image checksum — REAL binary parsing over Arrow batches (the
    codec is synthetic; the decoding is not).

    Malformed payloads (short, wrong magic, truncated pixel region)
    emit ``valid = false`` rows with null stats — decode errors are
    data, not exceptions, so one corrupt blob cannot kill a 100 TB
    scan. Zero-pixel images (header-only) are valid with null
    band stats and checksum 0.

    mapInPandas is the right shape: each Python worker sees a bounded
    Arrow batch of blobs (``maxRecordsPerBatch``), numpy does the
    per-band strided reductions, and only KB-sized stats cross back —
    the binary column itself never re-enters the JVM.
    """
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in DECODED_SCHEMA.fields}

            def emit(doc_id, valid, width=None, height=None, n_bands=None,
                     band_mean=None, band_max=None, checksum=None):
                rows["doc_id"].append(doc_id)
                rows["valid"].append(valid)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["n_bands"].append(n_bands)
                rows["band_mean"].append(band_mean)
                rows["band_max"].append(band_max)
                rows["checksum"].append(checksum)

            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                if raw is None or len(raw) < SIMG_HEADER_LEN:
                    emit(doc_id, False)
                    continue
                buf = bytes(raw)
                if buf[:4] != SIMG_MAGIC or buf[4] != 1:
                    emit(doc_id, False)
                    continue
                width, = struct.unpack(">H", buf[5:7])
                n_bands = buf[7]
                height, = struct.unpack(">H", buf[8:10])
                npx = width * height * n_bands
                pix = buf[SIMG_HEADER_LEN : SIMG_HEADER_LEN + npx]
                if len(pix) < npx or n_bands == 0:
                    emit(doc_id, False, width, height, n_bands)
                    continue
                arr = np.frombuffer(pix, dtype=np.uint8)
                per_band = width * height
                if per_band:
                    # integer sums are exact → the mean division is the
                    # same single IEEE op the SQL oracle performs
                    band_mean = [
                        int(arr[b::n_bands].sum(dtype=np.int64)) / per_band
                        for b in range(n_bands)
                    ]
                    band_max = [int(arr[b::n_bands].max()) for b in range(n_bands)]
                else:
                    band_mean = [None] * n_bands
                    band_max = [None] * n_bands
                emit(doc_id, True, width, height, n_bands, band_mean, band_max,
                     int(arr.sum(dtype=np.int64)))
            yield pd.DataFrame(rows)

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


SAUD_MAGIC = b"SAUD"
SAUD_HEADER_LEN = 9


def with_audio_payload(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a structured audio binary column (the audio leg of the
    image/audio/video triad; on real data this column comes from the
    source). SAUD layout (big-endian, 9-byte header):

        bytes 0-3  magic "SAUD"
        byte  4    version (0x01)
        bytes 5-6  sample_rate_hz uint16 (8000/16000/44100 by doc id)
        bytes 7-8  n_samples uint16
        bytes 9+   n_samples int16 big-endian PCM samples

    Samples are the leading ``2*n_samples`` bytes of the UTF-8 text —
    synthetic waveform, genuine byte layout. Pure Catalyst (hex
    assembly + unhex + concat), map-only."""
    tb = F.encode(F.col(text_col), "utf-8")
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    n_samples = F.least(F.floor(F.octet_length(tb) / 2), F.lit(65535)).cast("int")
    header_hex = F.concat(
        F.lit("53415544"),  # "SAUD"
        F.lit("01"),
        F.lpad(F.hex(rate), 4, "0"),
        F.lpad(F.hex(n_samples), 4, "0"),
    )
    payload = F.concat(F.unhex(header_hex), tb.substr(F.lit(1), n_samples * 2))
    return docs.withColumn("audio", payload)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("sample_rate_hz", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def decode_audio(docs_with_audio: DataFrame) -> DataFrame:
    """Decode each SAUD payload: validate magic/version, parse the
    header, and compute the classic audio-curation features — duration,
    RMS energy, peak amplitude, zero-crossing count (the cheap
    speech/noise/silence discriminators a pipeline filters on before
    any expensive ASR pass). numpy int16 vectorized over Arrow batches;
    malformed payloads become ``valid = false`` rows, not exceptions.
    """
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in AUDIO_SCHEMA.fields}

            def emit(doc_id, valid, rate=None, n=None, dur=None, rms=None,
                     peak=None, zc=None):
                rows["doc_id"].append(doc_id)
                rows["valid"].append(valid)
                rows["sample_rate_hz"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(dur)
                rows["rms"].append(rms)
                rows["peak"].append(peak)
                rows["zero_crossings"].append(zc)

            for doc_id, raw in zip(pdf["doc_id"], pdf["audio"]):
                if raw is None or len(raw) < SAUD_HEADER_LEN:
                    emit(doc_id, False)
                    continue
                buf = bytes(raw)
                if buf[:4] != SAUD_MAGIC or buf[4] != 1:
                    emit(doc_id, False)
                    continue
                rate, n = struct.unpack(">HH", buf[5:9])
                body = buf[SAUD_HEADER_LEN : SAUD_HEADER_LEN + 2 * n]
                if len(body) < 2 * n or rate == 0:
                    emit(doc_id, False, rate, n)
                    continue
                if n == 0:
                    emit(doc_id, True, rate, 0, 0.0, None, None, 0)
                    continue
                s = np.frombuffer(body, dtype=">i2").astype(np.int64)
                emit(
                    doc_id,
                    True,
                    rate,
                    n,
                    n * 1000.0 / rate,
                    float(np.sqrt((s * s).sum() / n)),
                    int(np.abs(s).max()),
                    int((np.signbit(s[1:]) != np.signbit(s[:-1])).sum()),
                )
            yield pd.DataFrame(rows)

    return docs_with_audio.select("doc_id", "audio").mapInPandas(
        decode, schema=AUDIO_SCHEMA
    )


def payload_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Pure-SQL metadata over binary payloads (no decode): byte length
    + prefix hex — pushdown-friendly filtering before any decode."""
    return docs_with_payload.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.lower(F.hex(F.col("payload"))), 1, 16).alias("prefix_hex"),
    )
