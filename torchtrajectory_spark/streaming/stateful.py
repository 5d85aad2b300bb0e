"""Custom stateful streaming operator — the R4 analog.

The reference incrementally updates per-vehicle trajectory state as new
edge observations stream in (``clustering/Streaming/StreamKpath.
updateDataset:74-…``, ``streaming/streamEdge.java``), with ad-hoc in-memory
maps. Spark-first: ``applyInPandasWithState`` keeps one typed state row per
user — last point + running totals — and each micro-batch folds its
(ts-ordered) points into that state. Exactly the harness a large-scale
"per-entity accumulating feature" pipeline needs (session stats, running
token counts, per-repo ingest cursors).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("last_lat", DoubleType()),
    StructField("last_lng", DoubleType()),
    StructField("n_hops", LongType()),
    StructField("total_m", LongType()),
])

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_hops", LongType()),
    StructField("total_m", LongType()),
])


def _haversine_np(lat1, lng1, lat2, lng2):
    r = 6371000.0
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1) / 2
    dlng = np.radians(lng2 - lng1) / 2
    a = np.sin(dlat) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlng) ** 2
    return 2 * r * np.arcsin(np.sqrt(a))


def _update(key: Any, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch points into the running hop totals.

    Points are sorted by (ts, event_id) inside the batch; the stored last
    point bridges batches, so the stream result equals the batch
    ``trajectory.user_hops`` once all input is consumed. Per-hop rounding
    to whole meters before summing keeps the total addition-order free.
    """
    (user_id,) = key
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    lats = pdf["lat"].to_numpy(dtype=np.float64)
    lngs = pdf["lng"].to_numpy(dtype=np.float64)
    if state.exists:
        last_lat, last_lng, n_hops, total_m = state.get
        plats = np.concatenate(([last_lat], lats[:-1]))
        plngs = np.concatenate(([last_lng], lngs[:-1]))
        hops = np.round(_haversine_np(plats, plngs, lats, lngs)).astype(
            np.int64)
    else:
        n_hops, total_m = 0, 0
        hops = np.round(
            _haversine_np(lats[:-1], lngs[:-1], lats[1:], lngs[1:])
        ).astype(np.int64) if len(lats) > 1 else np.empty(0, dtype=np.int64)
    n_hops += int(hops.size)
    total_m += int(hops.sum())
    state.update((float(lats[-1]), float(lngs[-1]), n_hops, total_m))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_hops": [n_hops], "total_m": [total_m]}
    )


def running_user_hops(points_stream: DataFrame) -> DataFrame:
    """Streaming per-user hop totals over (user_id, ts, event_id, lat, lng)
    rows; emits the updated (user_id, n_hops, total_m) row per batch."""
    return points_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
