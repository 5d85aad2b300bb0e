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


def points_in_radius(points: DataFrame, lat_c: float, lng_c: float,
                     radius_m: float) -> DataFrame:
    """Radius query (F4 + J5's ring bound): coarse tile candidates from
    the circle's bounding box, then the exact haversine refine.

    Returns (event_id, user_id, dist_m) for points within ``radius_m``
    meters of the center — the ``VertexGridIndex.java:288-299`` circle
    search. The tile filter only generates candidates (pushdown-friendly
    at scale); exactness comes from the refine, so the result equals the
    plain haversine predicate.
    """
    import math

    # bounding box of the spherical cap (driver-side, C2 analog). The
    # longitude half-extent of a cap at lat_c with angular radius c is
    # asin(sin(c) / cos(lat)) evaluated at the WIDEST latitude the cap
    # reaches (not lat_c: the equirectangular r/(R cos lat_c) is slightly
    # too narrow and could drop a whole candidate cell on a fine grid).
    # If the cap reaches a pole, or the extent formula leaves its domain,
    # or the box would cross the antimeridian, degrade to the full
    # longitude range — candidates only, exactness comes from the refine.
    c_ang = radius_m / 6371000.0
    dlat = math.degrees(c_ang)
    lat_lo, lat_hi = lat_c - dlat, lat_c + dlat
    widest_lat = max(abs(lat_lo), abs(lat_hi))
    full_lng = False
    if lat_hi >= 90.0 or lat_lo <= -90.0 or widest_lat >= 90.0:
        full_lng = True
    else:
        s = math.sin(c_ang) / math.cos(math.radians(widest_lat))
        if s >= 1.0:
            full_lng = True
        else:
            dlng = math.degrees(math.asin(s))
    if full_lng or lng_c - dlng < -180.0 or lng_c + dlng > 180.0:
        lng_lo, lng_hi = -180.0, 180.0
    else:
        lng_lo, lng_hi = lng_c - dlng, lng_c + dlng
    cells = window_cells(max(lat_lo, -90.0), min(lat_hi, 90.0),
                         lng_lo, lng_hi)
    from ..functions.geo import tile_id

    cand = points.withColumn(
        "cell",
        tile_id(F.col("lat"), F.col("lng"), GRID_LAT0, GRID_LNG0,
                GRID_CELL_DEG, GRID_COLS),
    ).where(F.col("cell").isin(cells))
    dist = haversine_m(F.col("lat"), F.col("lng"),
                       F.lit(float(lat_c)), F.lit(float(lng_c)))
    return (
        cand.where(dist <= F.lit(float(radius_m)))
        .select("event_id", "user_id",
                F.round(dist).cast("bigint").alias("dist_m"))
    )


DENSIFY_STEP_DEG = 5.0


def densify_hops(points: DataFrame, step_deg: float = DENSIFY_STEP_DEG
                 ) -> DataFrame:
    """J8 — geometry densification on resolve
    (``TrajectoryResolver.java:185-221`` interpolates every 50 m; here
    every ``step_deg`` planar degrees, a portable closed form with no
    trig in the step count so the oracle is bit-exact).

    For each consecutive point pair per user: n_extra =
    floor(sqrt(dlat^2+dlng^2)/step_deg) interpolated points at fractions
    i/(n_extra+1). Returns (user_id, event_id, seq, lat_u6, lng_u6) where
    seq=0 is the segment's start point and 1..n_extra the interpolated
    points (pure Catalyst: window lag + sequence + posexplode-style
    explode of the fraction range).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = points.select(
        "user_id", "event_id",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lng").over(w).alias("plng"),
        "lat", "lng",
    ).where(F.col("plat").isNotNull())
    seg_len = F.sqrt(
        (F.col("lat") - F.col("plat")) * (F.col("lat") - F.col("plat"))
        + (F.col("lng") - F.col("plng")) * (F.col("lng") - F.col("plng"))
    )
    n_extra = F.floor(seg_len / F.lit(float(step_deg))).cast("int")
    dense = hops.select(
        "user_id", "event_id", "plat", "plng", "lat", "lng",
        F.explode(F.sequence(F.lit(0), n_extra)).alias("seq"),
        n_extra.alias("n_extra"),
    )
    frac = F.col("seq").cast("double") / (F.col("n_extra") + F.lit(1)).cast("double")
    ilat = F.col("plat") + (F.col("lat") - F.col("plat")) * frac
    ilng = F.col("plng") + (F.col("lng") - F.col("plng")) * frac
    return dense.select(
        "user_id", "event_id", F.col("seq").cast("bigint").alias("seq"),
        F.round(ilat * 1e6).cast("bigint").alias("lat_u6"),
        F.round(ilng * 1e6).cast("bigint").alias("lng_u6"),
    )


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
