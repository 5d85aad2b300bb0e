"""Trajectory-shaped operators over event streams — window-function family.

The reference's core domain objects are point sequences per moving object;
its resolver walks consecutive points to rebuild geometry
(``TrajectoryResolver.resolveRet:151-223``) and its grid uses haversine
refinement (``VertexGridIndex.java:288-299``). Here the same shapes are
expressed as Catalyst window functions over an event table: consecutive
points per user via ``lag``, per-hop haversine (functions/geo.py), integer
rounding per hop BEFORE the sum so the aggregate is addition-order
independent (float determinism across partitionings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.geo import haversine_m


def synth_points(events: DataFrame) -> DataFrame:
    """Deterministic lat/lng from the event value (no external geo data):
    lat = value % 120 - 60, lng = (value * 3) % 360 - 180."""
    return events.select(
        "user_id", "ts", "event_id",
        (F.col("value") % 120 - 60).alias("lat"),
        ((F.col("value") * 3) % 360 - 180).alias("lng"),
    )


GRID_LAT0, GRID_LNG0 = -60.0, -180.0
GRID_CELL_DEG = 5.0
GRID_COLS = 72  # 360 / 5


def window_cells(lat_lo: float, lat_hi: float, lng_lo: float,
                 lng_hi: float) -> list[int]:
    """Row-major tile ids covering a lat/lng window (driver-side, tiny) —
    the candidate-generation step of ``VertexGridIndex._pointsInWindow``
    (J4): window -> covered tiles -> candidate rows."""
    import math

    r0 = max(0, math.floor((lat_lo - GRID_LAT0) / GRID_CELL_DEG))
    r1 = max(0, math.floor((lat_hi - GRID_LAT0) / GRID_CELL_DEG))
    c0 = max(0, math.floor((lng_lo - GRID_LNG0) / GRID_CELL_DEG))
    c1 = max(0, math.floor((lng_hi - GRID_LNG0) / GRID_CELL_DEG))
    return [
        r * GRID_COLS + c
        for r in range(int(r0), int(r1) + 1)
        for c in range(int(c0), int(c1) + 1)
    ]


def points_in_window(points: DataFrame, lat_lo: float, lat_hi: float,
                     lng_lo: float, lng_hi: float) -> DataFrame:
    """Range query: grid candidate filter, then exact bounding-box refine.

    Two-phase exactly like the reference (tiles first
    ``VertexGridIndex._pointsInWindow:301-326``, then the exact re-check
    ``:269-286`` F3); the tile predicate is a coarse pushdown-friendly
    filter (at scale: the partition key of the points table), the refine
    restores exactness, so the result equals the plain predicate.
    """
    from ..functions.geo import tile_id

    cells = window_cells(lat_lo, lat_hi, lng_lo, lng_hi)
    cand = points.withColumn(
        "cell",
        tile_id(F.col("lat"), F.col("lng"), GRID_LAT0, GRID_LNG0,
                GRID_CELL_DEG, GRID_COLS),
    ).where(F.col("cell").isin(cells))
    return cand.where(
        F.col("lat").between(lat_lo, lat_hi)
        & F.col("lng").between(lng_lo, lng_hi)
    ).select("event_id", "user_id")


def user_hops(points: DataFrame) -> DataFrame:
    """(user_id, n_hops, total_m) over consecutive points per user.

    Ordering inside a user is (ts, event_id) — a total order, so ``lag`` is
    deterministic; each hop is rounded to whole meters before summation.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = points.select(
        "user_id",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lng").over(w).alias("plng"),
        "lat", "lng",
    ).where(F.col("plat").isNotNull())
    hop_m = F.round(
        haversine_m(F.col("plat"), F.col("plng"), F.col("lat"), F.col("lng"))
    ).cast("bigint")
    return (
        hops.select("user_id", hop_m.alias("hop_m"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hops"),
            F.sum("hop_m").alias("total_m"),
        )
    )
