"""Multimodal operator tests: binary payload plumbing, stubbed decode,
Arrow-batched feature extraction, cardinality-changing frame sampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dso_import_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)
from dso_import_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media(load_table(spark, sf_dir, "documents")).cache()


def test_payload_layout(media, spark, sf_dir):
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, sf_dir, "documents").collect()}
    rows = media.collect()
    assert len(rows) == len(docs)
    for r in rows[:50]:
        b = bytes(r["payload"])
        assert b[:4] == b"DSO1"
        assert b[5:] == docs[r["doc_id"]].encode()
        assert b[4] == {"image": 1, "audio": 2, "video": 3}[r["media_type"]]


def test_metadata_typed_per_modality(media):
    img = media.filter("media_type = 'image'").select("meta.*").collect()
    assert all(r["width"] >= 16 and r["channels"] == 3 for r in img)
    aud = media.filter("media_type = 'audio'").select("meta.*").collect()
    assert all(r["sample_rate"] == 16000 and r["width"] is None for r in aud)
    vid = media.filter("media_type = 'video'").select("meta.*").collect()
    assert all(2 <= r["n_frames"] <= 9 for r in vid)


def test_decode_requires_explicit_fake_optin(media):
    with pytest.raises(NotImplementedError, match="allow_fake"):
        decode_media(media).collect()


def test_fake_decode_matches_python(media):
    decoded = {r["doc_id"]: r for r in
               decode_media(media, allow_fake=True).collect()}
    for r in media.limit(30).collect():
        b = bytes(r["payload"])
        d = decoded[r["doc_id"]]
        assert d["media_type"] == r["media_type"]
        assert d["payload_bytes"] == len(b)
        assert d["mean_byte"] == pytest.approx(
            round(sum(b[5:]) / len(b[5:]), 6))


def test_byte_histogram_matches_numpy(media):
    feats = {r["doc_id"]: r["features"] for r in
             extract_features(media).collect()}
    for r in media.limit(20).collect():
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        h, _ = np.histogram(arr, bins=16, range=(0, 256))
        expect = (h / arr.size).astype("float32")
        got = np.array(feats[r["doc_id"]], dtype="float32")
        assert np.allclose(got, expect)
        assert got.sum() == pytest.approx(1.0, abs=1e-5)


def test_frame_sample_reassembles_payload(media):
    frames = sample_frames(media).collect()
    vids = {r["doc_id"]: r for r in
            media.filter("media_type = 'video'").collect()}
    by_doc: dict[int, list] = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], []).append(f)
    assert set(by_doc) == set(vids)
    for doc_id, fs in by_doc.items():
        fs.sort(key=lambda f: f["frame_index"])
        assert len(fs) == vids[doc_id]["meta"]["n_frames"]
        joined = b"".join(bytes(f["frame"]) for f in fs)
        assert joined == bytes(vids[doc_id]["payload"])


def test_payload_sha_stable(media):
    got = media.select(
        "doc_id", F.sha2("payload", 256).alias("sha")).limit(10).collect()
    raw = {r["doc_id"]: bytes(r["payload"])
           for r in media.limit(10).collect()}
    for r in got:
        assert r["sha"] == hashlib.sha256(raw[r["doc_id"]]).hexdigest()


def test_decode_netpbm_real_images():
    # the REAL codec tier: binary netpbm parsed from the public spec
    from dso_import_spark.operators.multimodal import decode_netpbm

    # P6 RGB 2x2, maxval 255, with a header comment
    raster = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    p6 = b"P6\n# a comment\n2 2\n255\n" + raster
    assert decode_netpbm(p6) == (2, 2, round(sum(raster) / 12, 6))
    # P5 grayscale 3x1
    p5 = b"P5 3 1 255 " + bytes([0, 128, 255])
    assert decode_netpbm(p5) == (3, 1, round((0 + 128 + 255) / 3, 6))
    # rejects: truncated raster, 16-bit maxval, not an image
    assert decode_netpbm(b"P6\n2 2\n255\n" + raster[:-1]) is None
    assert decode_netpbm(b"P5 2 2 65535 " + raster) is None
    assert decode_netpbm(b"DSO1\x01whatever") is None
    assert decode_netpbm(b"") is None


def test_decode_media_mixed_real_and_synthetic(spark):
    # one mapInPandas pass decodes real netpbm rows for real and DSO1
    # rows through the gated stub — identical batch shape
    from dso_import_spark.operators.multimodal import (
        MAGIC,
        decode_media,
        synthesize_media,
    )

    raster = bytes(range(12))
    p6 = b"P6 2 2 255 " + raster
    real = spark.createDataFrame(
        [(999999, bytearray(p6))], "doc_id long, payload binary"
    )
    docs = spark.createDataFrame(
        [(0, "hello world")], "doc_id long, text string"
    )
    synth = synthesize_media(docs).select("doc_id", "payload")
    out = {
        r.doc_id: r
        for r in decode_media(real.unionByName(synth), allow_fake=True).collect()
    }
    assert out[999999].media_type == "image"
    assert (out[999999].width, out[999999].height) == (2, 2)
    assert out[999999].mean_byte == round(sum(raster) / 12, 6)
    assert out[0].media_type == "image"  # doc_id 0 -> image modality
    assert bytes(MAGIC) not in bytes(p6)


def test_wav_round_trip_is_byte_exact(spark, sf_dir):
    """Column-synthesized WAV files parse with the real RIFF walker
    and agree with a hand-packed struct header."""
    import struct

    from dso_import_spark.operators.multimodal import (
        decode_wav,
        synthesize_wav,
    )
    from dso_import_spark.queries_pkg.util import tables

    (docs,) = tables(spark, sf_dir, "documents")
    row = (
        synthesize_wav(docs.filter("doc_id % 3 = 1"))
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    payload = bytes(row.payload)
    # independent reference file for the same body
    body = payload[44:]
    ref = (
        b"RIFF" + struct.pack("<I", len(body) + 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000, 1, 8)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    assert payload == ref  # byte-exact canonical header
    rate, n, dur, rms = decode_wav(payload)
    assert rate == 16000 and n == len(body)
    assert dur == n / 16000


def test_wav_decoder_rejects_malformed():
    from dso_import_spark.operators.multimodal import decode_wav

    assert decode_wav(b"") is None
    assert decode_wav(b"RIFF") is None
    assert decode_wav(b"DSO1" + b"\x02" + b"hello" * 20) is None
    # truncated data chunk must not parse
    import struct

    body = b"x" * 10
    good = (
        b"RIFF" + struct.pack("<I", len(body) + 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000, 1, 8)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    assert decode_wav(good) is not None
    assert decode_wav(good[:-3]) is None
    # 16-bit stereo declared: not our PCM tier
    bad_fmt = (
        b"RIFF" + struct.pack("<I", len(body) + 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    assert decode_wav(bad_fmt) is None
