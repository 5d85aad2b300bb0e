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


def _cap_cells(lat_c: float, lng_c: float, radius_m: float) -> list[int]:
    """Grid cells covering the bounding box of a spherical cap
    (driver-side, C2 analog). The longitude half-extent of a cap at
    lat_c with angular radius c is asin(sin(c) / cos(lat)) evaluated at
    the WIDEST latitude the cap reaches (not lat_c: the equirectangular
    r/(R cos lat_c) is slightly too narrow and could drop a whole
    candidate cell on a fine grid). If the cap reaches a pole, or the
    extent formula leaves its domain, or the box would cross the
    antimeridian, degrade to the full longitude range — candidates only,
    exactness comes from the caller's refine."""
    import math

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
    return window_cells(max(lat_lo, -90.0), min(lat_hi, 90.0),
                        lng_lo, lng_hi)


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
    cells = _cap_cells(lat_c, lng_c, radius_m)
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


def points_near_track(points: DataFrame,
                      track: list[tuple[float, float]],
                      eps_m: float) -> DataFrame:
    """J6 — the ε-ball candidate join (``LEVI.java:120-131,190-199``):
    the reference generates, for EACH query-trajectory point, the
    vertices within ``epsilon`` (50 m default, ``LEVI.java:30``) and
    unions their posting lists as the LCSS/EDR candidate set. Here the
    same shape over a points table: the union of per-track-point grid
    candidates (one isin filter over the union of ε-box cells — a single
    scan, not one scan per query point), then the exact refine
    ``min_p haversine(x, p) <= eps``.

    Returns (event_id, user_id, dist_m) with dist_m = the rounded
    distance to the NEAREST track point. The track is query-sized
    (bounded), so the min is a ``least()`` over |track| codegen'd
    haversine expressions; at scale the cell isin prunes partitions of a
    cell-partitioned points table exactly like knn_points.
    """
    cells = sorted({
        c for la, ln in track for c in _cap_cells(la, ln, eps_m)
    })
    from ..functions.geo import tile_id

    cand = points.withColumn(
        "cell",
        tile_id(F.col("lat"), F.col("lng"), GRID_LAT0, GRID_LNG0,
                GRID_CELL_DEG, GRID_COLS),
    ).where(F.col("cell").isin(cells))
    dists = [
        haversine_m(F.col("lat"), F.col("lng"),
                    F.lit(float(la)), F.lit(float(ln)))
        for la, ln in track
    ]
    mind = F.least(*dists) if len(dists) > 1 else dists[0]
    return (
        cand.where(mind <= F.lit(float(eps_m)))
        .select("event_id", "user_id",
                F.round(mind).cast("bigint").alias("dist_m"))
    )


GRID_ROWS = 24  # 120 / 5 (lat in [-60, 60))


def _hav_py(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    """Driver-side haversine, same formula shape as functions/geo."""
    import math

    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlng = math.radians(lng2 - lng1) / 2
    a = (math.sin(dlat) ** 2
         + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlng) ** 2)
    return 2.0 * 6371000.0 * math.asin(math.sqrt(a))


def _cell_bounds(r: int, c: int) -> tuple[float, float, float, float]:
    return (GRID_LAT0 + r * GRID_CELL_DEG,
            GRID_LAT0 + (r + 1) * GRID_CELL_DEG,
            GRID_LNG0 + c * GRID_CELL_DEG,
            GRID_LNG0 + (c + 1) * GRID_CELL_DEG)


def _cell_min_dist(lat_c: float, lng_c: float, r: int, c: int) -> float:
    """Min haversine from the center to a grid cell: distance to the
    lat/lng-clamped point (exact for axis-aligned boxes away from the
    antimeridian), shrunk by a 1e-9 relative margin so the bound is
    conservative against float error."""
    lo_lat, hi_lat, lo_lng, hi_lng = _cell_bounds(r, c)
    clat = min(max(lat_c, lo_lat), hi_lat)
    clng = min(max(lng_c, lo_lng), hi_lng)
    return _hav_py(lat_c, lng_c, clat, clng) * (1.0 - 1e-9)


def _cell_max_dist(lat_c: float, lng_c: float, r: int, c: int) -> float:
    """Max haversine from the center to a grid cell (a corner), widened
    by a 1e-9 relative margin."""
    lo_lat, hi_lat, lo_lng, hi_lng = _cell_bounds(r, c)
    return max(
        _hav_py(lat_c, lng_c, la, ln)
        for la in (lo_lat, hi_lat) for ln in (lo_lng, hi_lng)
    ) * (1.0 + 1e-9)


def knn_points(points: DataFrame, lat_c: float, lng_c: float,
               k: int, use_cell_col: bool = True) -> DataFrame:
    """k nearest points to a center — J5's INCREMENTAL RING EXPANSION
    (``VertexGridIndex.incrementallyFind:338-393``): grow Chebyshev rings
    of grid cells around the center cell until >= k candidates are
    covered, bound the k-th distance by the farthest corner of the
    covered non-empty cells, then add every cell whose nearest point can
    still beat that bound. Exact: the final candidate cell set provably
    contains the true top-k, and the refine orders by exact haversine
    (ties -> event_id ASC). Returns (event_id, user_id, dist_m).

    Scale shape: job 1 is the per-cell histogram (the vertex-grid index's
    cell counts — prebuilt index-side in the reference, one bounded-
    cardinality aggregation here); the ring walk runs on the driver over
    that histogram (grid-sized, tiny); job 2 scans ONLY the selected
    cells (cell predicate pushed into the scan) and TakeOrderedAndProject
    merges per-partition top-k heaps. No shuffle except the final k-row
    merge.

    At scale, store the points table PARTITIONED by ``cell`` (the grid
    index the reference prebuilds, ``VertexGridIndex.build:64-112``,
    re-expressed as a partition spec): an input that already carries a
    ``cell`` column is used as-is, so the final-cells ``isin`` predicate
    becomes a PartitionFilter and job 2 reads only the selected cells'
    files (demonstrated in tests/test_geo_traj.py + EXPLAIN.md).

    CONTRACT: a pre-existing ``cell`` column must have been computed
    with this module's grid (``tile_id`` over GRID_LAT0/GRID_LNG0/
    GRID_CELL_DEG/GRID_COLS — i.e. written by ``grid_cells``/this
    pipeline); the ring geometry assumes it, and a foreign grid would
    silently mislocate candidates. Pass ``use_cell_col=False`` to ignore
    an unrelated column of that name and recompute.
    """
    import math

    from ..functions.geo import tile_id

    if use_cell_col and "cell" in points.columns:
        pts = points  # pre-gridded (e.g. cell-partitioned table) layout
    else:
        pts = points.withColumn(
            "cell",
            tile_id(F.col("lat"), F.col("lng"), GRID_LAT0, GRID_LNG0,
                    GRID_CELL_DEG, GRID_COLS),
        )
    hist = {
        int(r["cell"]): int(r["n"])
        for r in pts.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    r0 = min(max(int(math.floor((lat_c - GRID_LAT0) / GRID_CELL_DEG)), 0),
             GRID_ROWS - 1)
    c0 = min(max(int(math.floor((lng_c - GRID_LNG0) / GRID_CELL_DEG)), 0),
             GRID_COLS - 1)

    def ring(level: int) -> list[tuple[int, int]]:
        if level == 0:
            return [(r0, c0)]
        out = []
        for r in range(r0 - level, r0 + level + 1):
            for c in range(c0 - level, c0 + level + 1):
                if max(abs(r - r0), abs(c - c0)) == level \
                        and 0 <= r < GRID_ROWS and 0 <= c < GRID_COLS:
                    out.append((r, c))
        return out

    covered: list[tuple[int, int]] = []
    cum = 0
    max_level = max(GRID_ROWS, GRID_COLS)
    for level in range(max_level + 1):
        cells = ring(level)
        covered.extend(cells)
        cum += sum(hist.get(r * GRID_COLS + c, 0) for r, c in cells)
        if cum >= k:
            break
    if cum == 0:
        return pts.select("event_id", "user_id").where(F.lit(False)) \
            .withColumn("dist_m", F.lit(0).cast("bigint"))
    # k-th nearest is at most the farthest corner of the covered
    # NON-EMPTY cells (they hold >= min(k, total) candidates); admit
    # every cell whose nearest point could still beat that
    d_ub = max(
        _cell_max_dist(lat_c, lng_c, r, c)
        for r, c in covered if hist.get(r * GRID_COLS + c, 0) > 0
    )
    final_cells = sorted(
        r * GRID_COLS + c
        for r in range(GRID_ROWS) for c in range(GRID_COLS)
        if hist.get(r * GRID_COLS + c, 0) > 0
        and _cell_min_dist(lat_c, lng_c, r, c) <= d_ub
    )
    dist = haversine_m(F.col("lat"), F.col("lng"),
                       F.lit(float(lat_c)), F.lit(float(lng_c)))
    return (
        pts.where(F.col("cell").isin(final_cells))
        .select("event_id", "user_id", dist.alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("event_id").asc())
        .limit(k)
        .select("event_id", "user_id",
                F.round(F.col("dist")).cast("bigint").alias("dist_m"))
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
