"""Multimodal-column queries: binary payloads + typed metadata.

Media synthesized deterministically from the ``documents`` fixture
(payload = ``DSO1`` magic + type byte + utf-8 text — see
operators/multimodal.py). The fixture text is pure ASCII, so DuckDB
VARCHAR oracles can reproduce the byte-level semantics exactly
(1 char == 1 byte) while Spark operates on true ``binary`` columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# payload reproduced as VARCHAR: 'DSO1' + chr(type) + text (ASCII-only)
_ORACLE_PAYLOAD = """
    'DSO1' || chr(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END)
           || text
"""


@query(
    "multimodal_metadata",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           length(text) + 5 AS payload_bytes,
           sha256({_ORACLE_PAYLOAD}) AS payload_sha,
           CASE WHEN doc_id % 3 = 0 THEN doc_id % 64 + 16 END AS width,
           CASE WHEN doc_id % 3 = 1 THEN 16000 END AS sample_rate
    FROM documents
    """,
    doc="Opaque binary payload + typed metadata struct: length, sha-256 "
    "content hash, per-modality metadata fields. All JVM-side column "
    "expressions (synthesize_media operator).",
)
def multimodal_metadata(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.sample_rate").cast("long").alias("sample_rate"),
    )


@query(
    "multimodal_decode_stats",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CASE WHEN doc_id % 3 = 0 THEN length(text) % 64 + 16 END AS width,
           CASE WHEN doc_id % 3 = 0 THEN length(text) % 48 + 16 END AS height,
           length(text) + 5 AS payload_bytes
    FROM documents
    """,
    doc="Arrow-batched mapInPandas decode (stub codec behind "
    "allow_fake=True — real PIL/ffmpeg not in container): parses the "
    "payload header, emits per-media decoded dimensions.",
)
def multimodal_decode_stats(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    decoded = decode_media(synthesize_media(docs), allow_fake=True)
    return decoded.select(
        "doc_id",
        "media_type",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "payload_bytes",
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, {_ORACLE_PAYLOAD} AS payload,
             doc_id % 8 + 2 AS k, length(text) + 5 AS size
      FROM documents WHERE doc_id % 3 = 2)
    SELECT v.doc_id, g.i::INT AS frame_index,
           lower(hex(substring(v.payload, (g.i * v.size // v.k)::INT + 1,
                 ((g.i + 1) * v.size // v.k - g.i * v.size // v.k)::INT)))
               AS frame_hex
    FROM v JOIN generate_series(0, 9) g(i) ON g.i < v.k
    """,
    doc="Video frame sampling: 1 row → n_frames byte slices via "
    "mapInPandas (cardinality-changing; sample_frames operator). "
    "Frames hex-encoded for engine-neutral comparison.",
)
def multimodal_frame_sample(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    frames = sample_frames(synthesize_media(docs))
    return frames.select(
        "doc_id", "frame_index", F.lower(F.hex("frame")).alias("frame_hex")
    )


@query(
    "multimodal_features",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             {_ORACLE_PAYLOAD} AS payload
      FROM documents),
    c AS (
      SELECT doc_id, media_type, length(payload) AS n,
             ascii(substring(payload, g.i::INT, 1)) // 16 AS bin
      FROM p, UNNEST(generate_series(1, length(payload))) g(i)),
    f AS (
      SELECT doc_id, media_type, (count(*) / any_value(n))::REAL AS frac
      FROM c GROUP BY doc_id, media_type, bin)
    SELECT doc_id, media_type,
           round(sum(frac::DOUBLE), 4) AS feature_sum,
           round(max(frac)::DOUBLE, 4) AS feature_max
    FROM f GROUP BY doc_id, media_type
    """,
    doc="Feature extraction: binary payload → 16-dim byte-histogram "
    "vector via Arrow-batched scalar pandas UDF (byte_histogram), the "
    "signature a real embedding model plugs into. The oracle replays "
    "the 16-bin histogram per byte with the same float32 quantization "
    "(::REAL) numpy applies, so every registered query now has a full "
    "value-hash check — zero rows-only entries.",
)
def multimodal_features(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media(docs))
    return feats.select(
        "doc_id",
        "media_type",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4).alias(
            "feature_sum"
        ),
        F.round(F.array_max("features").cast("double"), 4).alias("feature_max"),
    )


@query(
    "multimodal_wav_decode",
    oracle="""
    WITH a AS (SELECT doc_id, source, text FROM documents
               WHERE doc_id % 3 = 1
                 AND strlen(text) = length(text)
                 AND text <> ''),
    ch AS (SELECT doc_id, source,
                  ascii(unnest(string_split(text, ''))) AS code
           FROM a),
    per AS (SELECT doc_id, source,
                   count(*)::BIGINT AS n,
                   sqrt(sum((code - 128) * (code - 128)) * 1.0
                        / count(*)) AS rms
            FROM ch GROUP BY doc_id, source)
    SELECT source,
           count(*)::BIGINT AS n_audio,
           sum(n)::BIGINT AS total_samples,
           round(avg(n / 16000.0), 6) AS avg_duration_s,
           round(avg(rms), 6) AS avg_rms
    FROM per GROUP BY source ORDER BY source
    """,
    doc="REAL audio codec round-trip: byte-exact RIFF/WAVE files "
    "(canonical 44-byte header, 8-bit mono PCM at 16 kHz, "
    "little-endian lengths packed by pure Column hex arithmetic — "
    "no UDF writes the header) synthesized from the audio-modality "
    "docs, then decoded by the pure-Python RIFF chunk walker "
    "(operators/multimodal.py decode_wav — handles extra chunks and "
    "odd-size padding per the public spec) in one Arrow-batched "
    "mapInPandas pass; per-source duration and centred-RMS report. "
    "The oracle recomputes duration and RMS from the text bytes "
    "(ascii codes) without ever seeing a WAV file, so a single "
    "header-offset or byte-order bug anywhere in synth or parse "
    "fails the hash. Decode is the only Python stage and is "
    "batch-vectorized; everything around it is codegen'd Columns "
    "and a source-bounded aggregate.",
)
def multimodal_wav_decode(spark, sf_dir):
    from dso_import_spark.operators.multimodal import (
        synthesize_wav,
        wav_stats,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    # the oracle counts CHARACTERS (ascii codes) while the payload
    # carries UTF-8 BYTES — identical only for non-empty ASCII text,
    # so both sides filter to that symmetrically (the fixture is all
    # ASCII; the guard makes the equivalence explicit, not assumed)
    ascii_docs = docs.filter(
        (F.col("doc_id") % 3 == 1)
        & (F.octet_length("text") == F.length("text"))
        & (F.col("text") != "")
    )
    audio = synthesize_wav(ascii_docs)
    stats = wav_stats(audio)
    return (
        stats.groupBy("source")
        .agg(
            F.count("*").alias("n_audio"),
            F.sum("n_samples").alias("total_samples"),
            F.round(F.avg(F.col("n_samples") / 16000.0), 6).alias(
                "avg_duration_s"
            ),
            F.round(F.avg("rms"), 6).alias("avg_rms"),
        )
        .orderBy("source")
    )
