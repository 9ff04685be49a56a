"""Multimodal (image/audio/video) column operators.

Media travel through the engine as an opaque ``binary`` payload column
plus a typed metadata struct — the same shape a 100 TB training-data
pipeline uses (parquet binary columns, per-row codec metadata). The
reference has no media surface; this extends SURVEY.md §2.10's
north-star inventory.

Design for scale:
- payload synthesis / metadata are pure Column expressions (JVM-side,
  whole-stage codegen);
- decode / feature-extract / frame-sample are Arrow-batched
  ``mapInPandas`` / ``pandas_udf`` transforms — one Python roundtrip
  per batch, never per row;
- frame sampling explodes rows, so it is ``mapInPandas`` (schema- and
  cardinality-changing), not a scalar UDF.

Codec coverage is tiered: binary netpbm images (P5/P6) decode FOR REAL
via a pure-Python spec parser (``decode_netpbm``, tested end-to-end);
other real formats (jpeg/png) decode via PIL when installed
(env-gated, absent in this container); synthetic ``DSO1`` payloads
from ``synthesize_media`` use a deterministic fake decoder, gated
behind ``allow_fake=True`` / ``NotImplementedError`` so nobody
mistakes fixture numbers for real decode output. The batch shape —
schema, Arrow batching, partitioning, UDF signatures — is identical
across all three tiers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"DSO1"

# unified metadata struct: nullable per-modality fields
MEDIA_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def media_type_expr(doc_id):
    """Deterministic modality assignment for fixture docs (id mod 3)."""
    return (
        F.when(doc_id % 3 == 0, "image")
        .when(doc_id % 3 == 1, "audio")
        .otherwise("video")
    )


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media rows from the ``documents`` fixture.

    payload = ``DSO1`` magic + 1 media-type byte + the utf-8 text bytes.
    All column expressions — stays inside whole-stage codegen; the
    binary column is opaque to everything downstream, exactly like a
    real jpeg/wav/mp4 blob would be.
    """
    doc_id = F.col("doc_id")
    mt = media_type_expr(doc_id)
    type_byte = (
        F.when(mt == "image", F.lit(b"\x01"))
        .when(mt == "audio", F.lit(b"\x02"))
        .otherwise(F.lit(b"\x03"))
    )
    body = F.encode(F.col("text"), "UTF-8")
    n = F.octet_length(body)
    meta = F.struct(
        F.when(mt == "image", F.pmod(doc_id, F.lit(64)).cast("int") + 16)
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(mt == "image", F.pmod(doc_id, F.lit(48)).cast("int") + 16)
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(mt == "image", F.lit(3)).otherwise(F.lit(None).cast("int")).alias(
            "channels"
        ),
        F.when(mt == "audio", F.lit(16000))
        .otherwise(F.lit(None).cast("int"))
        .alias("sample_rate"),
        F.when(mt == "video", (F.pmod(doc_id, F.lit(8)) + 2).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("n_frames"),
    )
    return documents.select(
        doc_id,
        mt.alias("media_type"),
        F.concat(F.lit(MAGIC), type_byte, body).alias("payload"),
        meta.alias("meta"),
    )


_TYPE_BYTES = {1: "image", 2: "audio", 3: "video"}


def decode_netpbm(b: bytes) -> tuple[int, int, float] | None:
    """REAL image decode for binary netpbm payloads (P5 grayscale /
    P6 RGB), implemented from the public netpbm spec — no external
    codec library. Returns (width, height, mean_pixel) or None if the
    payload is not a parseable 8-bit netpbm image.

    This is the genuine codec path decode_media uses when a payload
    is an actual image file rather than a synthetic DSO1 blob; PIL,
    when installed, extends coverage to jpeg/png via the same batch
    shape.
    """
    if not b or b[:2] not in (b"P5", b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace/comment
    # separated, then a single whitespace byte before raster data
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            return None
        try:
            fields.append(int(b[start:pos]))
        except ValueError:
            return None
    if len(fields) < 3 or pos >= len(b):
        return None
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not (0 < maxval < 256):
        return None
    pos += 1  # the single whitespace after maxval
    n_ch = 3 if b[:2] == b"P6" else 1
    raster = b[pos : pos + width * height * n_ch]
    if len(raster) != width * height * n_ch:
        return None
    return width, height, round(sum(raster) / len(raster), 6)


def _pil_decode(b: bytes) -> tuple[int, int, float] | None:
    """Optional PIL decode (jpeg/png/...) — env-gated: None when PIL
    is absent (this container) or the payload isn't an image."""
    try:  # pragma: no cover - PIL not installed here by design
        import io

        from PIL import Image, ImageStat

        img = Image.open(io.BytesIO(b))
        img.load()
        stat = ImageStat.Stat(img.convert("L"))
        return img.width, img.height, round(stat.mean[0], 6)
    except Exception:
        return None


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch: DSO1 synthetic header → fake decode;
    real image payloads (netpbm, or PIL formats when installed) →
    real decode."""
    out = {
        "doc_id": pdf["doc_id"].astype("int64"),
        "media_type": [],
        "width": [],
        "height": [],
        "payload_bytes": [],
        "mean_byte": [],
    }
    for payload in pdf["payload"]:
        # NULL payload (e.g. synthesized from a NULL-text doc — concat
        # propagates NULL) must yield the unknown-media row, never a
        # TypeError that kills the batch (round-8 review; same guard
        # byte_histogram already carries)
        if payload is None:
            out["media_type"].append(None)
            out["width"].append(None)
            out["height"].append(None)
            out["payload_bytes"].append(0)
            out["mean_byte"].append(None)
            continue
        b = bytes(payload)
        # a truncated payload of exactly the 4 magic bytes passes the
        # prefix check but has no type byte — unknown, not IndexError
        if b[:4] != MAGIC or len(b) < 5:
            # real-codec path: genuine image files decode for real —
            # netpbm always (pure-Python spec parser above), other
            # formats via PIL when installed
            decoded = decode_netpbm(b)
            if decoded is None:
                decoded = _pil_decode(b)
            if decoded is not None:
                w, h, mean = decoded
                out["media_type"].append("image")
                out["width"].append(w)
                out["height"].append(h)
                out["payload_bytes"].append(len(b))
                out["mean_byte"].append(mean)
                continue
            out["media_type"].append(None)
            out["width"].append(None)
            out["height"].append(None)
            out["payload_bytes"].append(len(b))
            out["mean_byte"].append(None)
            continue
        mt = _TYPE_BYTES.get(b[4])
        body = b[5:]
        out["media_type"].append(mt)
        # fake "decode": derive dims from body length deterministically
        out["width"].append(len(body) % 64 + 16 if mt == "image" else None)
        out["height"].append(len(body) % 48 + 16 if mt == "image" else None)
        out["payload_bytes"].append(len(b))
        out["mean_byte"].append(
            round(sum(body) / len(body), 6) if body else None
        )
    return pd.DataFrame(out)


def decode_media(media: DataFrame, *, allow_fake: bool = False) -> DataFrame:
    """Decode payloads to per-media stats via Arrow-batched mapInPandas.

    Real image payloads always decode for real (netpbm via the
    pure-Python parser; jpeg/png via PIL when installed). Synthetic
    DSO1 payloads need ``allow_fake=True`` (or an installed codec
    stack, which implies a controlled environment) to use the
    deterministic stub decoder. The mapInPandas plumbing (schema,
    batch shape, projection pushdown of only doc_id+payload) is
    identical across tiers.
    """
    try:  # real decode path, unavailable here by design
        import PIL  # noqa: F401

        have_codecs = True
    except ImportError:
        have_codecs = False
    if not have_codecs and not allow_fake:
        raise NotImplementedError(
            "media codecs (PIL/librosa/ffmpeg) not installed; "
            "pass allow_fake=True for the deterministic stub decoder"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return media.select("doc_id", "payload").mapInPandas(gen, DECODED_SCHEMA)


@F.pandas_udf(ArrayType(FloatType()))
def byte_histogram(payload: pd.Series) -> pd.Series:
    """16-bin normalized byte histogram — a stand-in feature extractor.

    Arrow-batched scalar pandas UDF: binary in, array<float> out; the
    exact signature a real embedding/feature model would use.
    """
    import numpy as np

    def hist(b) -> list[float]:
        if b is None:  # NULL payload: bytes(None) would raise and
            return None  # kill the batch; a NULL feature row is honest
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * 16
        h, _ = np.histogram(arr, bins=16, range=(0, 256))
        return (h / arr.size).astype("float32").tolist()

    return payload.map(hist)


def extract_features(media: DataFrame) -> DataFrame:
    """payload → 16-dim feature vector (JVM→Arrow→numpy→Arrow→JVM)."""
    return media.select(
        "doc_id", "media_type", byte_histogram(F.col("payload")).alias("features")
    )


def sample_frames(media: DataFrame, n_frames_default: int = 4) -> DataFrame:
    """Split each video payload into evenly-sized frame slices.

    Cardinality-changing (1 row → n frames) → ``mapInPandas``.
    Frame i of n covers bytes [floor(i*L/n), floor((i+1)*L/n)).
    Deterministic, so it is differentially testable against a SQL
    substring oracle.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_index": [], "frame": []}
            for doc_id, payload, n in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                b = bytes(payload)
                k = int(n) if n and n > 0 else n_frames_default
                size = len(b)
                for i in range(k):
                    lo = i * size // k
                    hi = (i + 1) * size // k
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_index"].append(i)
                    rows["frame"].append(b[lo:hi])
            yield pd.DataFrame(rows)

    vids = media.filter(F.col("media_type") == "video").select(
        "doc_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.mapInPandas(gen, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# WAV / RIFF audio tier: REAL synthesis + REAL decode (public RIFF spec)

WAV_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)

_WAV_RATE = 16000


def _le_bytes(n, width: int):
    """Little-endian byte encoding of a non-negative int Column as a
    ``width``-byte BINARY, in pure Column expressions: fixed-width hex,
    byte-pair reversal, unhex. Keeps WAV synthesis inside whole-stage
    codegen — no UDF writes the header."""
    h = F.lpad(F.hex(n), width * 2, "0")
    pairs = [
        F.substring(h, i * 2 + 1, 2) for i in reversed(range(width))
    ]
    return F.unhex(F.concat(*pairs))


def wav_payload_expr(body):
    """Canonical 44-byte-header WAV file as a Column: RIFF/WAVE with a
    16-byte PCM fmt chunk (mono, 8-bit unsigned, 16 kHz) and ``body``
    as the data chunk — a byte-exact, spec-conformant file any audio
    tool can open. All lengths are computed little-endian via
    ``_le_bytes``; static header fields are byte literals."""
    n = F.octet_length(body)
    return F.concat(
        F.lit(b"RIFF"),
        _le_bytes(n + 36, 4),
        F.lit(b"WAVEfmt "),
        F.lit(bytes([16, 0, 0, 0])),  # fmt chunk size
        F.lit(bytes([1, 0])),  # PCM
        F.lit(bytes([1, 0])),  # mono
        F.lit((16000).to_bytes(4, "little")),  # sample rate
        F.lit((16000).to_bytes(4, "little")),  # byte rate (8-bit mono)
        F.lit(bytes([1, 0])),  # block align
        F.lit(bytes([8, 0])),  # bits per sample
        F.lit(b"data"),
        _le_bytes(n, 4),
        body,
    )


def synthesize_wav(documents: DataFrame) -> DataFrame:
    """Real WAV files from fixture docs: the utf-8 text bytes become
    the 8-bit PCM sample stream (unsigned, 128-centred silence).
    Pure Column expressions — the files are genuine RIFF/WAVE, not
    DSO1 blobs, so the decode side exercises the real parser."""
    body = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id", "source", wav_payload_expr(body).alias("payload")
    )


def decode_wav(b: bytes) -> tuple[int, int, float, float] | None:
    """REAL audio decode for RIFF/WAVE PCM payloads, implemented from
    the public RIFF spec (chunk walk, not fixed offsets — handles
    extra chunks and odd-size padding). Returns (sample_rate,
    n_samples, duration_s, rms) for 8-bit mono PCM, or None when the
    payload is not such a file. RMS is over centred samples
    (sample - 128), the 8-bit PCM zero line."""
    if not b or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + sz]
        if len(body) != sz:
            return None
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        return None
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or channels != 1 or bits != 8 or rate <= 0:
        return None
    n = len(data)
    if n == 0:
        return rate, 0, 0.0, 0.0
    import math

    import numpy as np

    # exact integer square-sum, vectorized: int64 is exact here
    # (max n * 127^2 << 2^63) and an order of magnitude faster than a
    # per-byte Python loop inside the Arrow batch stage
    xs = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    ss = int((xs * xs).sum())
    return rate, n, n / rate, math.sqrt(ss / n)


def wav_stats(audio: DataFrame) -> DataFrame:
    """Arrow-batched real-WAV decode: (doc_id, source, payload) →
    per-file (sample_rate, n_samples, duration_s, rms). Same batch
    shape as decode_media; rows that fail the RIFF parse are dropped
    (count them upstream if a reject channel is needed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                # NULL payload = failed synthesis (NULL-text doc):
                # dropped like any RIFF-parse failure, never a
                # TypeError that kills the batch (round-8 review)
                if payload is None:
                    continue
                dec = decode_wav(bytes(payload))
                if dec is None:
                    continue
                rate, n, dur, rms = dec
                out.append((int(doc_id), source, rate, n, dur, rms))
            yield pd.DataFrame(
                out, columns=[f.name for f in WAV_STATS_SCHEMA.fields]
            )

    return audio.mapInPandas(gen, WAV_STATS_SCHEMA)
