"""Geospatial scalar functions — native Catalyst expressions.

Analog of the reference's ``base/helper/GeoUtil.java``:
* haversine distance in meters (``GeoUtil.distance:14-63``, C1)
* lat/lng offset by meters (``increaseLat:67-75`` / ``increaseLng:87-95``, C2)
* tile id from lat/lng (``VertexGridIndex.calculateTileID:153-168``, C4)

All pure `pyspark.sql.functions` arithmetic — whole-stage codegen, no UDFs.
The formula shape (2R·asin(√(sin²+cos·cos·sin²))) is written identically in
the DuckDB oracles so float64 results agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in meters (float64)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlng = F.radians(lng2 - lng1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng) * F.sin(dlng)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def increase_lat(lat: Column, meters: Column) -> Column:
    """Latitude offset by meters (GeoUtil.increaseLat analog)."""
    return lat + F.degrees(meters / F.lit(EARTH_RADIUS_M))


def increase_lng(lat: Column, lng: Column, meters: Column) -> Column:
    """Longitude offset by meters at a given latitude."""
    return lng + F.degrees(meters / (F.lit(EARTH_RADIUS_M) * F.cos(F.radians(lat))))


def tile_id(lat: Column, lng: Column, lat0: float, lng0: float,
            cell_deg: float, n_cols: int) -> Column:
    """Row-major tile id on a fixed grid (clamped at 0 like the reference)."""
    row = F.greatest(F.floor((lat - F.lit(lat0)) / F.lit(cell_deg)), F.lit(0))
    col = F.greatest(F.floor((lng - F.lit(lng0)) / F.lit(cell_deg)), F.lit(0))
    return (row * F.lit(n_cols) + col).cast("bigint")
