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


def encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6) — a real image
    format, pure numpy (no PIL needed)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "PPM P6 is RGB"
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes):
    """Decode binary PPM (P6) to an (h, w, 3) uint8 numpy array."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, whitespace-separated w h maxval, single whitespace
    parts = []
    i = 2
    while len(parts) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def resize_nearest(arr, out_w: int, out_h: int):
    """Nearest-neighbor resize of an (h, w, 3) array — the real resample
    kernel the resize pipeline runs per decoded image."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows[:, None], cols[None, :], :]


def decode_media(payload: bytes, media_type: str, codec: str = "fake"):
    """Decode dispatch: the integration point for real codecs.

    * ``fake`` returns the raw bytes (deterministic test payload);
    * ``ppm`` decodes binary PPM (P6) to an (h, w, 3) uint8 array — a
      real, pure-numpy image codec proving the non-identity path;
    * anything else (jpeg/png/audio/video) is explicitly unimplemented in
      this environment (no PIL/ffmpeg in the container) — plug a decoder
      in here; the Arrow plumbing upstream does not change.
    """
    if codec == "fake":
        return payload
    if codec == "ppm":
        return decode_ppm(payload)
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


def image_channel_stats(media: DataFrame, codec: str = "ppm") -> DataFrame:
    """Per-image (media_id, width, height, mean_r_m, mean_g_m, mean_b_m)
    from DECODED pixels — the feature-extraction pattern over a real
    decode path (integer pixel sums, milli-units; Arrow-batched, nothing
    collects). Exercised with the vendored PPM codec; identical plumbing
    for any decoder plugged into ``decode_media``."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                img = decode_media(bytes(b), "image", codec)
                sums = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
                npix = img.shape[0] * img.shape[1]
                rows.append((
                    mid, img.shape[1], img.shape[0],
                    *(int(round(float(s) / npix * 1000)) for s in sums),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height",
                "mean_r_m", "mean_g_m", "mean_b_m",
            ])

    return media.select("media_id", "payload").mapInPandas(
        stats,
        schema=("media_id bigint, width int, height int, "
                "mean_r_m bigint, mean_g_m bigint, mean_b_m bigint"),
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
