"""Multimodal plumbing: schema, decode stub, frame sampling, resize shape.

The payload pipeline must behave like a real media pipeline (binary in,
typed metadata through, Arrow batches, per-frame explode) with the codec
stubbed deterministically; media_features / media_frame_sample are also
oracle-checked in test_queries_oracle.py.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from torchtrajectory_spark.operators import multimodal as mm
from torchtrajectory_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(load_table(spark, SF, "documents")).persist()


def test_media_schema_and_payload(spark, media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "width", "height", "payload"
    ]
    assert dict(media.dtypes)["payload"] == "binary"
    docs = load_table(spark, SF, "documents")
    row = media.where(F.col("media_id") == 3).first()
    text = docs.where(F.col("doc_id") == 3).first()["text"]
    assert bytes(row["payload"]) == text.encode("utf-8")
    assert row["media_type"] == mm._TYPES[3 % 3]
    assert row["width"] == 16 + 3 % 240


def test_decode_stub_raises_for_real_codecs():
    assert mm.decode_media(b"x", "image", codec="fake") == b"x"
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"x", "image", codec="jpeg")


def test_frame_sample_matches_python(spark, media):
    got = {
        (r["media_id"], r["frame_idx"]): r["frame_sha256"]
        for r in mm.frame_sample(media).collect()
    }
    exp = {}
    for r in media.select("media_id", "payload").collect():
        raw = bytes(r["payload"])
        n_frames = -(-len(raw) // mm.FRAME_BYTES) if raw else 0
        for i in range(0, n_frames, mm.FRAME_STRIDE):
            exp[(r["media_id"], i)] = hashlib.sha256(
                raw[i * mm.FRAME_BYTES:(i + 1) * mm.FRAME_BYTES]
            ).hexdigest()
    assert got == exp
    assert len(got) > 0


def test_resize_stub_shapes(spark, media):
    out = mm.resize_stub(media, 32, 16)
    rows = out.limit(5).collect()
    for r in rows:
        assert r["width"] == 32 and r["height"] == 16
        assert len(bytes(r["payload"])) == 32 * 16


def test_features_partition_invariant(spark, media):
    """Repartitioning must not change any feature row (batch-shape safety)."""
    a = mm.media_features(media).orderBy("media_id").collect()
    b = mm.media_features(media.repartition(13)).orderBy("media_id").collect()
    assert a == b


def test_ppm_codec_roundtrip_and_resize():
    import numpy as np

    from torchtrajectory_spark.operators.multimodal import (
        decode_media, decode_ppm, encode_ppm, resize_nearest,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(12, 7, 3), dtype=np.uint8)
    payload = encode_ppm(img)
    assert (decode_ppm(payload) == img).all()
    assert (decode_media(payload, "image", "ppm") == img).all()
    small = resize_nearest(img, 4, 3)
    assert small.shape == (3, 4, 3)
    # nearest-neighbor: every output pixel exists in the input
    assert small[0, 0].tolist() == img[0, 0].tolist()


def test_image_channel_stats_distributed(spark):
    import numpy as np

    from torchtrajectory_spark.operators.multimodal import (
        encode_ppm, image_channel_stats,
    )

    rng = np.random.default_rng(5)
    rows = []
    exp = {}
    for mid in range(6):
        img = rng.integers(0, 256, size=(8 + mid, 5, 3), dtype=np.uint8)
        rows.append((mid, bytearray(encode_ppm(img))))
        sums = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
        npix = img.shape[0] * img.shape[1]
        exp[mid] = [int(round(float(s) / npix * 1000)) for s in sums]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: [r["mean_r_m"], r["mean_g_m"], r["mean_b_m"]]
           for r in image_channel_stats(media).collect()}
    assert got == exp
