"""Multimodal (image/audio/video) column plumbing — binary payloads with
typed metadata, processed by Arrow-batched UDFs.

There is no multimodal analog in the reference (its "media" is the GPS
point stream); this module is the training-data-pipeline extension the
engine needs at corpus scale: media rows are ``(media_id, media_type,
width, height, payload BINARY)``; decode / feature-extract / resize /
frame-sample run inside ``mapInPandas`` so each task touches one Arrow
batch of payloads and nothing ever collects to the driver.

Real codec work (PIL/ffmpeg) is NOT available in this environment; the
decode step is stubbed two ways:

* ``decode_media`` raises ``NotImplementedError`` for real formats — the
  documented integration point;
* the ``fake`` format is a deterministic payload (the UTF-8 bytes of the
  source text) whose "decode" is well-defined, so the Spark-side plumbing
  (schema, partitioning, UDF signature, batch shape) is fully testable and
  two of the operators are DuckDB-oracle-checked end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 256
FRAME_STRIDE = 4

MEDIA_SCHEMA = ("media_id bigint, media_type string, width int, height int, "
                "payload binary")
FEATURES_SCHEMA = ("media_id bigint, media_type string, width int, "
                   "height int, n_bytes bigint, payload_sha256 string")
FRAMES_SCHEMA = "media_id bigint, frame_idx bigint, frame_sha256 string"

_TYPES = ["image", "audio", "video"]


def media_table(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text corpus.

    payload = UTF-8 bytes of the text (the ``fake`` codec); metadata is a
    pure function of the id — the *shape* of an ingested media table
    (opaque bytes + typed metadata) without external data.
    """
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in _TYPES]),
            (F.col(id_col) % len(_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        (16 + F.col(id_col) % 240).cast("int").alias("width"),
        (16 + (F.col(id_col) * 7) % 240).cast("int").alias("height"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_media(payload: bytes, media_type: str, codec: str = "fake"):
    """Decode stub: the integration point for real codecs.

    ``fake`` returns the raw bytes; anything else is explicitly
    unimplemented in this environment (no PIL/ffmpeg in the container).
    """
    if codec == "fake":
        return payload
    raise NotImplementedError(
        f"codec {codec!r} for {media_type!r}: real decoders are not "
        "available in this environment; plug one in here"
    )


def media_features(media: DataFrame) -> DataFrame:
    """Per-media features from the decoded payload (size + sha256) plus the
    typed metadata, computed batch-at-a-time in Arrow."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pays = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "width": pdf["width"],
                "height": pdf["height"],
                "n_bytes": pays.map(len).astype("int64"),
                "payload_sha256": pays.map(
                    lambda b: hashlib.sha256(
                        decode_media(bytes(b), "any")).hexdigest()
                ),
            })

    return media.mapInPandas(feats, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = FRAME_BYTES,
                 stride: int = FRAME_STRIDE) -> DataFrame:
    """Video-style frame sampling: cut the payload into ``frame_bytes``
    frames, keep every ``stride``-th, fingerprint each (sha256).

    Exploding happens inside the Arrow batch (one output row per sampled
    frame) — the distributed shape of a frame-extraction pipeline.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = decode_media(bytes(b), "any")
                n_frames = -(-len(raw) // frame_bytes) if raw else 0
                for i in range(0, n_frames, stride):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(
                        raw[i * frame_bytes:(i + 1) * frame_bytes]
                    ).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_sha256": pd.Series(shas, dtype="object"),
            })

    return media.select("media_id", "payload").mapInPandas(
        frames, schema=FRAMES_SCHEMA
    )


def resize_stub(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize stub: deterministic fake resample (truncate/cycle the payload
    to out_w*out_h bytes) keeping the real pipeline shape — swap the body
    for a PIL/opencv call when codecs exist."""
    n = out_w * out_h

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = out_w
            out["height"] = out_h
            out["payload"] = out["payload"].map(
                lambda b: (bytes(b) * (n // max(len(b), 1) + 1))[:n]
            )
            yield out

    return media.mapInPandas(rs, schema=MEDIA_SCHEMA)
