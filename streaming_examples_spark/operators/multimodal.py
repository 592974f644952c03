"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature-extract as Arrow-batched ``mapInPandas`` stages.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI); metadata (codec, dims,
duration) is typed columns; decode/resize/frame-sample run as
``mapInPandas`` over Arrow batches so each Python worker touches a
bounded batch of bytes. Partitioning stays row-count based
(``maxRecordsPerBatch`` keeps batches memory-safe for large blobs).

The payloads are REAL structured formats (SIMG/SAUD/SVID below — the
container has no image/video libs, so the codecs are synthetic, but
the byte layouts, header parsing, validation, per-band statistics,
nearest-neighbor resampling, and frame demuxing are genuine binary
processing, the image decode oracle-checked byte-for-byte in DuckDB).
``resize_payloads`` really resamples the SIMG pixel grid and re-emits
valid SIMG bytes; ``sample_frames`` really demuxes the SVID container
into per-frame SIMG payloads that feed straight back into
``decode_and_featurize``.

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
import warnings
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

SIMG_MAGIC = b"SIMG"
SIMG_HEADER_LEN = 10

#: one Arrow task realizing this many payload bytes, on a stage the
#: auto gate declined to widen, means the size estimate was badly wrong
#: (compressed/expression-built blobs) — warn loudly (16× the gate)
LOUD_BYTES_PER_TASK = 64 << 20



def _widen_for_python(
    df: DataFrame, *, widen: bool | None = None, min_bytes_per_task: int = 4 << 20
) -> tuple[DataFrame, str]:
    """A ``mapInPandas`` stage is only as parallel as its input split
    count. Corpus-scale inputs arrive in thousands of parquet splits
    and pass through here untouched; a few-file input (one giant file,
    a skewed compaction) would serialize the Arrow workers, so widen to
    the session's default parallelism — the round-robin shuffle of the
    (doc_id, payload) projection is strictly cheaper than decoding
    terabytes of blobs one core deep.

    Returns ``(frame, status)``; status ∈ {"passthrough", "explicit",
    "shuffled-input", "wide-enough", "declined-small", "widened"}.
    ``"declined-small"`` is the estimate-blind case the caller arms the
    realized-bytes monitor for (:func:`_loud_monitor`).

    ``widen=None`` (auto — the decode/demux default): widen only when
    Catalyst's pre-execution size estimate says each widened task would
    get ≥ ``min_bytes_per_task`` of blobs — a KB-scale input is not
    worth an extra stage. CAVEAT: the estimate follows the SCAN, so it
    cannot see in-flight expression expansion or heavy parquet
    compression; for such estimate-blind inputs pass ``widen=True``
    through the operator (the monitor warns at runtime if this bites).
    ``widen=True`` (resize's default — its fixed ``w*h*bands`` output
    per row means the shuffle always pays for itself: measured
    local[32] on the single-file sf0.1 documents table, 224² resize
    5.6 s → 0.9 s). CAVEAT: on adaptive (exchange-bearing) plans the
    input's width is unknowable without finalizing AQE, so widen=True
    repartitions unconditionally to ``defaultParallelism`` — an input
    already WIDER than that would be reduced; pass ``widen=False``
    when you know the input is wide (e.g. already repartitioned
    upstream). ``widen=False`` never repartitions. Streaming frames
    pass through (micro-batch sizing governs there).

    Inputs whose plan already contains a shuffle exchange pass through
    untouched WITHOUT inspecting ``.rdd``: their parallelism is set by
    ``spark.sql.shuffle.partitions``/AQE, and touching ``.rdd`` on an
    adaptive plan finalizes it — executing every upstream query stage
    once for the probe and again for the real run. On exchange-free
    plans (a narrow chain over a scan) there are no query stages to
    pre-execute, so the exact ``.rdd`` split count is free.
    """
    if df.isStreaming or widen is False:
        return df, "passthrough"
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        adaptive = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .startswith("AdaptiveSparkPlan")
        )
    except Exception:
        adaptive = True  # can't tell → don't probe (safe)
    if not adaptive and df.rdd.getNumPartitions() >= target:
        # exchange-free plan: the split count is free to read, and an
        # already-wide input (a corpus-scale scan with thousands of
        # parquet splits) must NOT be funneled down to
        # defaultParallelism — even under explicit widen=True, which
        # exists to ADD parallelism, never to remove it
        return df, "wide-enough"
    if widen is True:
        # the documented contract: explicit overrides beat the auto
        # gate, on EVERY plan shape. repartition needs no .rdd probe,
        # so it is safe on adaptive plans too — an AQE-coalesced narrow
        # partition feeding an expanding decode (the estimate-blind
        # case arriving through a join) is exactly when the caller
        # reaches for widen=True.
        return df.repartition(target), "explicit"
    if adaptive:
        # AQE only wraps plans containing exchanges (or subqueries):
        # parallelism is already the shuffle's business (shuffle
        # partitions / AQE coalescing, which only shrinks counts when
        # the data is small enough not to care), and probing .rdd would
        # FINALIZE the adaptive plan — executing every upstream query
        # stage once for the probe and again for the real run. The
        # caller arms the realized-bytes monitor on this status: AQE
        # coalescing is estimate-driven, so a coalesced-narrow split
        # feeding an expanding decode warns instead of silently
        # serializing (escape hatch: widen=True, handled above).
        return df, "shuffled-input"
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = None  # stats unavailable → assume heavy (safe at scale)
    if est is not None and est // target < min_bytes_per_task:
        return df, "declined-small"
    return df.repartition(target), "widened"


def _loud_monitor(fn, payload_col: str, sc, threshold: int = LOUD_BYTES_PER_TASK):
    """Wrap an Arrow batch function with a realized-bytes watchdog for
    the estimate-blind gate cases: the auto widen gate declined because
    the SCAN estimate looked tiny, but compressed or expression-built
    blob columns can expand orders of magnitude in flight. Each task
    counts the payload bytes it actually sees; past ``threshold`` it
    warns once (worker-side) and bumps a driver-visible accumulator
    (``df._sg_widen_monitor``) so the under-parallelization is loud
    instead of silently serializing a 100 TB decode. Counting stops
    after firing — overhead is one vectorized length pass per batch
    until then, nothing after."""
    acc = sc.accumulator(0)

    def wrapped(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        fired = False
        for pdf in batches:
            if not fired:
                # vectorized: pandas maps len() over the object column
                # C-side; the per-blob Python loop this replaces was a
                # measurable tax on narrow-batch stages
                seen += int(pdf[payload_col].str.len().sum())
                if seen > threshold:
                    fired = True
                    acc.add(1)
                    warnings.warn(
                        f"multimodal: one task realized {seen >> 20} MiB of "
                        f"'{payload_col}' bytes (threshold "
                        f"{threshold >> 20} MiB) on a stage the auto widen "
                        "gate left narrow (its size estimate could not see "
                        "the payload bytes). Pass widen=True through the "
                        "operator to parallelize the decode.",
                        RuntimeWarning,
                    )
            yield from fn(iter([pdf]))

    return wrapped, acc


def _arrow_map(
    df: DataFrame, fn, schema, *, widen: bool | None, payload_col: str
) -> DataFrame:
    """Shared tail for the four decode operators: widen-gate the
    projection, arm the realized-bytes monitor on the estimate-blind
    path, run the Arrow stage."""
    base, status = _widen_for_python(df, widen=widen)
    monitor = None
    if status in ("declined-small", "shuffled-input"):
        # both estimate-driven gate outcomes: "declined-small" trusted a
        # scan estimate, "shuffled-input" trusts the shuffle's sizing
        # (AQE coalescing). Either can under-parallelize an expanding
        # blob decode — watch realized bytes and warn instead of
        # silently serializing. The shuffled threshold is 16× higher:
        # AQE sizes coalesced partitions from MEASURED shuffle bytes
        # (~64 MB targets; a few × more raw after decompression is a
        # HEALTHY task, not a mis-gate), so only an order-of-magnitude
        # exceedance — a skewed or hand-coalesced narrow split feeding
        # an expanding decode — should get loud.
        threshold = LOUD_BYTES_PER_TASK * (16 if status == "shuffled-input" else 1)
        fn, monitor = _loud_monitor(
            fn, payload_col, base.sparkSession.sparkContext, threshold
        )
    out = base.mapInPandas(fn, schema=schema)
    if monitor is not None:
        out._sg_widen_monitor = monitor
    return out


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


def decode_and_featurize(
    docs_with_payload: DataFrame,
    *,
    batch_hint: int = 1024,
    widen: bool | None = None,
) -> DataFrame:
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

    return _arrow_map(
        docs_with_payload.select("doc_id", "payload"),
        decode,
        DECODED_SCHEMA,
        widen=widen,
        payload_col="payload",
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bands", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_payloads(
    docs_with_payload: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    widen: bool | None = True,
) -> DataFrame:
    """Resize each SIMG payload to ``width``×``height`` by
    nearest-neighbor resampling of the band-interleaved pixel grid —
    REAL resampling (numpy integer index maps, the same arithmetic
    PIL's NEAREST uses), re-emitted as a valid SIMG byte string so the
    output feeds straight back into :func:`decode_and_featurize`.

    Output payloads are fixed-size per band count
    (``header + width*height*n_bands`` bytes) — the property that
    makes downstream Arrow batch memory predictable, and the reason
    training pipelines resize BEFORE shuffling samples. Malformed or
    zero-pixel sources (nothing to sample from) emit
    ``valid = false`` rows with a null blob — decode errors are data,
    not exceptions. Resizing to the source's own dims is the identity
    (byte-identical payload).
    """
    import numpy as np

    tw, th = width, height
    ys_for = {}  # source height -> target row index map (tiny, reused)
    xs_for = {}

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in RESIZED_SCHEMA.fields}

            def emit(doc_id, valid, n_bands=None, blob=None):
                rows["doc_id"].append(doc_id)
                rows["valid"].append(valid)
                rows["width"].append(tw)
                rows["height"].append(th)
                rows["n_bands"].append(n_bands)
                rows["resized"].append(blob)

            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                if raw is None or len(raw) < SIMG_HEADER_LEN:
                    emit(doc_id, False)
                    continue
                buf = bytes(raw)
                if buf[:4] != SIMG_MAGIC or buf[4] != 1:
                    emit(doc_id, False)
                    continue
                sw, = struct.unpack(">H", buf[5:7])
                nb = buf[7]
                sh, = struct.unpack(">H", buf[8:10])
                npx = sw * sh * nb
                pix = buf[SIMG_HEADER_LEN : SIMG_HEADER_LEN + npx]
                if len(pix) < npx or nb == 0 or sw == 0 or sh == 0:
                    emit(doc_id, False, nb)
                    continue
                arr = np.frombuffer(pix, dtype=np.uint8).reshape(sh, sw, nb)
                ys = ys_for.get(sh)
                if ys is None:
                    ys = ys_for[sh] = (np.arange(th) * sh) // th
                xs = xs_for.get(sw)
                if xs is None:
                    xs = xs_for[sw] = (np.arange(tw) * sw) // tw
                out = arr[ys][:, xs]  # nearest-neighbor gather
                header = SIMG_MAGIC + b"\x01" + struct.pack(">H", tw) + bytes(
                    [nb]
                ) + struct.pack(">H", th)
                emit(doc_id, True, nb, header + out.tobytes())
            yield pd.DataFrame(rows)

    return _arrow_map(
        docs_with_payload.select("doc_id", "payload"),
        resize,
        RESIZED_SCHEMA,
        widen=widen,
        payload_col="payload",
    )


SVID_MAGIC = b"SVID"
SVID_HEADER_LEN = 14


def with_video_payload(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a structured video binary column (the video leg of the
    image/audio/video triad; on real data this column comes from the
    source). SVID layout (big-endian, 14-byte header):

        bytes 0-3    magic "SVID"
        byte  4      version (0x01)
        bytes 5-6    width  uint16
        byte  7      n_bands uint8
        bytes 8-9    height uint16
        bytes 10-11  n_frames uint16
        bytes 12-13  frame_interval_ms uint16 (40/80/120 by doc id)
        bytes 14+    n_frames planes of width*height*n_bands bytes,
                     frame-major, band-interleaved within a frame —
                     i.e. each plane is exactly a SIMG pixel region

    Planes are the leading ``w*h*b*n_frames`` bytes of the UTF-8 text —
    synthetic footage, genuine byte layout. Pure Catalyst (hex
    assembly + unhex + concat), map-only."""
    tb = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(tb)
    w = (F.pmod(F.col(id_col), F.lit(5)) + 4).cast("int")
    b = (F.pmod(F.col(id_col), F.lit(2)) + 1).cast("int")
    nf = (F.pmod(F.col(id_col), F.lit(4)) + 2).cast("int")
    h = F.least(F.floor(n / (w * b * nf)), F.lit(65535)).cast("int")
    interval = ((F.pmod(F.col(id_col), F.lit(3)) + 1) * 40).cast("int")
    header_hex = F.concat(
        F.lit("53564944"),  # "SVID"
        F.lit("01"),
        F.lpad(F.hex(w), 4, "0"),
        F.lpad(F.hex(b), 2, "0"),
        F.lpad(F.hex(h), 4, "0"),
        F.lpad(F.hex(nf), 4, "0"),
        F.lpad(F.hex(interval), 4, "0"),
    )
    payload = F.concat(F.unhex(header_hex), tb.substr(F.lit(1), w * h * b * nf))
    return docs.withColumn("video", payload)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    docs_with_video: DataFrame, *, n_frames: int = 4, widen: bool | None = None
) -> DataFrame:
    """Demux each SVID payload and keep ``n_frames`` evenly-spaced
    frames — REAL container parsing, the 1-to-N shape (one input row →
    several frame rows).

    Each kept frame is re-emitted as a valid SIMG byte string
    (header + that frame's plane), so sampled frames feed straight
    into :func:`decode_and_featurize`/:func:`resize_payloads` — the
    demux→decode→resize chain a video curation pipeline runs.
    ``frame_idx`` is the frame's index IN THE SOURCE CLIP and
    ``frame_ts_ms = frame_idx * frame_interval_ms`` comes from the
    container's own timing metadata. Clips with fewer frames than
    requested keep them all; malformed/truncated payloads yield zero
    rows (skip, not null-explode — one bad clip cannot kill the scan).

    ``mapInPandas`` emits MORE rows than it receives (the Arrow
    iterator contract allows any output cardinality), so there is no
    explode-then-decode double pass over the blob column.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, blobs = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["video"]):
                if raw is None or len(raw) < SVID_HEADER_LEN:
                    continue
                buf = bytes(raw)
                if buf[:4] != SVID_MAGIC or buf[4] != 1:
                    continue
                sw, = struct.unpack(">H", buf[5:7])
                nb = buf[7]
                sh, = struct.unpack(">H", buf[8:10])
                total, interval = struct.unpack(">HH", buf[10:14])
                plane = sw * sh * nb
                if plane == 0 or total == 0:
                    continue
                if len(buf) < SVID_HEADER_LEN + plane * total:
                    continue  # truncated footage
                simg_header = SIMG_MAGIC + b"\x01" + buf[5:10]
                k = min(n_frames, total)
                for i in range(k):
                    fi = (i * total) // k  # evenly spaced, first frame kept
                    off = SVID_HEADER_LEN + fi * plane
                    ids.append(doc_id)
                    idxs.append(fi)
                    tss.append(fi * interval)
                    blobs.append(simg_header + buf[off : off + plane])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": pd.Series(blobs, dtype=object),
                }
            )

    return _arrow_map(
        docs_with_video.select("doc_id", "video"),
        frames,
        FRAMES_SCHEMA,
        widen=widen,
        payload_col="video",
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


def decode_audio(docs_with_audio: DataFrame, *, widen: bool | None = None) -> DataFrame:
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

    return _arrow_map(
        docs_with_audio.select("doc_id", "audio"),
        decode,
        AUDIO_SCHEMA,
        widen=widen,
        payload_col="audio",
    )


#: unified output grain of :func:`decode_meta_fused`: one row per
#: (doc, band) for image/resize, per sampled frame, per doc for audio,
#: discriminated by `kind`; doubles UNROUNDED (the caller rounds in
#: Catalyst so engine rounding semantics stay in one place)
MM_FUSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("prefix_hex", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bands", T.IntegerType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_mean", T.DoubleType()),
        T.StructField("band_max", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("sample_rate_hz", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def decode_meta_fused(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_frames: int = 4,
    resize_to: tuple[int, int] = (8, 8),
    widen: bool | None = None,
) -> DataFrame:
    """The whole multimodal quartet — image decode, resize re-decode,
    video frame demux, audio decode — in ONE Arrow pass (guide §4.2,
    §4.5). The branch form ran FIVE mapInPandas stages over the same
    documents (image decode, resize, resize re-decode, frame demux,
    audio decode), each paying its own Catalyst payload assembly
    (hex/unhex over megabytes of text) and its own JVM→Python crossing
    of the payload bytes; here the text bytes cross once and every
    decoder runs on them while they are hot in the worker.

    Per-row logic mirrors :func:`decode_and_featurize`,
    :func:`resize_payloads`, :func:`sample_frames` and
    :func:`decode_audio` over payloads built exactly as
    :func:`with_binary_payload` / :func:`with_video_payload` /
    :func:`with_audio_payload` assemble them in Catalyst (slicing the
    same UTF-8 text bytes under the same headers) — equivalence is
    pinned by ``test_fused_multimodal_matches_branch_union`` and by the
    DuckDB oracle hash of the ``multimodal_meta`` entry. Invalid-source
    semantics follow the branch form: image rows only for valid SIMG
    (always, by construction), resize rows only when the source has
    pixels, frame rows only when a plane exists, audio rows for every
    doc. ``band_mean``/``duration_ms``/``rms`` come back unrounded;
    round in Catalyst like the branch form did."""
    import hashlib

    import numpy as np

    tw, th = resize_to
    ys_for: dict = {}
    xs_for: dict = {}

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in MM_FUSED_SCHEMA.fields}

            def emit(doc_id, kind, **kw):
                for f in MM_FUSED_SCHEMA.fields:
                    if f.name == "doc_id":
                        rows["doc_id"].append(doc_id)
                    elif f.name == "kind":
                        rows["kind"].append(kind)
                    else:
                        rows[f.name].append(kw.get(f.name))

            def band_rows(arr, n_bands, per_band):
                # identical arithmetic to decode_and_featurize: exact
                # integer sums, ONE IEEE division per band
                if per_band:
                    means = [
                        int(arr[b::n_bands].sum(dtype=np.int64)) / per_band
                        for b in range(n_bands)
                    ]
                    maxes = [int(arr[b::n_bands].max()) for b in range(n_bands)]
                else:
                    means = [None] * n_bands
                    maxes = [None] * n_bands
                return means, maxes, int(arr.sum(dtype=np.int64))

            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    # branch-form semantics: a NULL text nulls every
                    # payload (concat with NULL), the decoders emit
                    # invalid / skip, and every branch filters — zero
                    # rows for the doc
                    continue
                doc_id = int(doc_id)
                tb = text.encode("utf-8")
                n = len(tb)

                # ---- image: with_binary_payload + decode_and_featurize
                w = doc_id % 9 + 8
                b = doc_id % 3 + 1
                h = min(n // (w * b), 65535)
                pix = tb[: w * h * b]
                payload = (
                    SIMG_MAGIC
                    + b"\x01"
                    + struct.pack(">H", w)
                    + bytes([b])
                    + struct.pack(">H", h)
                    + pix
                )
                arr = np.frombuffer(pix, dtype=np.uint8)
                means, maxes, checksum = band_rows(arr, b, w * h)
                n_bytes = len(payload)
                prefix_hex = payload[:8].hex()
                for band in range(b):
                    emit(
                        doc_id, "image",
                        n_bytes=n_bytes, prefix_hex=prefix_hex,
                        width=w, height=h, n_bands=b, band=band,
                        band_mean=means[band], band_max=maxes[band],
                        checksum=checksum,
                    )

                # ---- resize re-decode: resize_payloads(8×8) → decode
                if w * h > 0:
                    src = arr.reshape(h, w, b)
                    ys = ys_for.get(h)
                    if ys is None:
                        ys = ys_for[h] = (np.arange(th) * h) // th
                    xs = xs_for.get(w)
                    if xs is None:
                        xs = xs_for[w] = (np.arange(tw) * w) // tw
                    rz = np.ascontiguousarray(src[ys][:, xs]).reshape(-1)
                    rmeans, rmaxes, rchecksum = band_rows(rz, b, tw * th)
                    for band in range(b):
                        emit(
                            doc_id, "resize",
                            width=tw, height=th, n_bands=b, band=band,
                            band_mean=rmeans[band], band_max=rmaxes[band],
                            checksum=rchecksum,
                        )

                # ---- frames: with_video_payload + sample_frames +
                #      md5(lower(hex(frame)))
                vw = doc_id % 5 + 4
                vb = doc_id % 2 + 1
                nf = doc_id % 4 + 2
                iv = (doc_id % 3 + 1) * 40
                fh = min(n // (vw * vb * nf), 65535)
                plane = vw * fh * vb
                if plane > 0:
                    simg_header = (
                        SIMG_MAGIC
                        + b"\x01"
                        + struct.pack(">H", vw)
                        + bytes([vb])
                        + struct.pack(">H", fh)
                    )
                    k = min(n_frames, nf)
                    for i in range(k):
                        fi = (i * nf) // k
                        frame = simg_header + tb[fi * plane : (fi + 1) * plane]
                        emit(
                            doc_id, "frame",
                            frame_idx=fi, frame_ts_ms=fi * iv,
                            frame_md5=hashlib.md5(
                                frame.hex().encode()
                            ).hexdigest(),
                        )

                # ---- audio: with_audio_payload + decode_audio
                rate = (8000, 16000, 44100)[doc_id % 3]
                ns = min(n // 2, 65535)
                if ns == 0:
                    emit(
                        doc_id, "audio",
                        sample_rate_hz=rate, n_samples=0,
                        duration_ms=0.0, zero_crossings=0,
                    )
                else:
                    s = np.frombuffer(tb[: 2 * ns], dtype=">i2").astype(np.int64)
                    emit(
                        doc_id, "audio",
                        sample_rate_hz=rate, n_samples=ns,
                        duration_ms=ns * 1000.0 / rate,
                        rms=float(np.sqrt((s * s).sum() / ns)),
                        peak=int(np.abs(s).max()),
                        zero_crossings=int(
                            (np.signbit(s[1:]) != np.signbit(s[:-1])).sum()
                        ),
                    )
            yield pd.DataFrame(rows)

    return _arrow_map(
        docs.select(id_col, text_col),
        fused,
        MM_FUSED_SCHEMA,
        widen=widen,
        payload_col=text_col,
    )


def payload_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Pure-SQL metadata over binary payloads (no decode): byte length
    + prefix hex — pushdown-friendly filtering before any decode."""
    return docs_with_payload.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.lower(F.hex(F.col("payload"))), 1, 16).alias("prefix_hex"),
    )
