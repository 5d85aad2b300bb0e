"""Geo scalar functions + trajectory hop aggregation.

haversine / offsets vs an independent Python implementation; user_hops is
additionally oracle-checked in test_queries_oracle.py.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from torchtrajectory_spark.functions import geo


def py_haversine(lat1, lng1, lat2, lng2):
    r = 6371000.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlng = math.radians(lng2 - lng1)
    a = (math.sin(dlat / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dlng / 2) ** 2)
    return 2 * r * math.asin(math.sqrt(a))


CASES = [
    (0.0, 0.0, 0.0, 1.0),
    (41.15, -8.61, 41.16, -8.60),   # Porto-ish (reference corpus city)
    (-33.87, 151.21, 48.85, 2.35),
    (10.0, 179.9, 10.0, -179.9),
    (52.52, 13.40, 52.52, 13.40),
]


def test_haversine_matches_python(spark):
    df = spark.createDataFrame(CASES, "lat1 double, lng1 double, lat2 double, lng2 double")
    got = df.select(
        geo.haversine_m(F.col("lat1"), F.col("lng1"),
                        F.col("lat2"), F.col("lng2")).alias("d")
    ).collect()
    for row, case in zip(got, CASES):
        assert row["d"] == pytest.approx(py_haversine(*case), rel=1e-12)


def test_offsets_roundtrip(spark):
    df = spark.createDataFrame([(41.15, -8.61)], "lat double, lng double")
    moved = df.select(
        geo.increase_lat(F.col("lat"), F.lit(1000.0)).alias("lat2"),
        geo.increase_lng(F.col("lat"), F.col("lng"), F.lit(1000.0)).alias("lng2"),
        "lat", "lng",
    ).first()
    # moving 1000 m north/east must measure ~1000 m by haversine
    d_north = py_haversine(moved["lat"], moved["lng"], moved["lat2"], moved["lng"])
    d_east = py_haversine(moved["lat"], moved["lng"], moved["lat"], moved["lng2"])
    assert d_north == pytest.approx(1000.0, rel=1e-3)
    assert d_east == pytest.approx(1000.0, rel=1e-3)


def test_tile_id_grid(spark):
    df = spark.createDataFrame(
        [(0.05, 0.05), (0.15, 0.05), (0.05, 0.15), (-5.0, -5.0)],
        "lat double, lng double",
    )
    got = [
        r["t"] for r in df.select(
            geo.tile_id(F.col("lat"), F.col("lng"), 0.0, 0.0, 0.1, 100).alias("t")
        ).collect()
    ]
    assert got == [0, 100, 1, 0]  # row-major; clamped at 0 like the reference


def test_user_hops_partition_invariant(spark):
    """Integer-per-hop rounding makes the sum independent of partitioning."""
    from torchtrajectory_spark.operators import trajectory
    from torchtrajectory_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    a = sorted(
        r.asDict().items().__str__()
        for r in trajectory.user_hops(trajectory.synth_points(e)).collect()
    )
    b = sorted(
        r.asDict().items().__str__()
        for r in trajectory.user_hops(
            trajectory.synth_points(e.repartition(17))).collect()
    )
    assert a == b


def test_points_in_radius_equals_plain_predicate(spark):
    """The grid candidate phase is a superset: result == plain haversine."""
    from pyspark.sql import functions as F

    from torchtrajectory_spark.functions.geo import haversine_m
    from torchtrajectory_spark.operators.trajectory import (
        points_in_radius, synth_points,
    )
    from torchtrajectory_spark.sources.tables import load_table

    pts = synth_points(load_table(spark, "/root/testdata/sf0.001", "events"))
    got = {r["event_id"]
           for r in points_in_radius(pts, -10.0, -30.0, 2e6).collect()}
    dist = haversine_m(F.col("lat"), F.col("lng"),
                       F.lit(-10.0), F.lit(-30.0))
    exp = {r["event_id"]
           for r in pts.where(dist <= 2e6).select("event_id").collect()}
    assert got == exp and len(got) > 0


def test_knn_ring_expansion_equals_bruteforce(spark):
    """Ring-expansion candidates must be invisible: knn == exhaustive
    (dist ASC, event_id ASC) LIMIT k — at several centers and k values,
    including a center far from any point and k > cell population."""
    from pyspark.sql import functions as F

    from torchtrajectory_spark.functions.geo import haversine_m
    from torchtrajectory_spark.operators.trajectory import (
        knn_points, synth_points,
    )
    from torchtrajectory_spark.sources.tables import load_table

    pts = synth_points(load_table(spark, "/root/testdata/sf0.001", "events"))
    for (lat, lng, k) in [(-10.0, -30.0, 25), (55.0, 170.0, 7),
                          (0.0, 0.0, 200)]:
        dist = haversine_m(F.col("lat"), F.col("lng"),
                           F.lit(lat), F.lit(lng))
        exp = [
            (r["event_id"], r["dist_m"])
            for r in pts.select(
                "event_id", F.round(dist).cast("bigint").alias("dist_m"),
                dist.alias("d"),
            ).orderBy(F.col("d").asc(), F.col("event_id").asc())
            .limit(k).collect()
        ]
        got = [
            (r["event_id"], r["dist_m"])
            for r in knn_points(pts, lat, lng, k).collect()
        ]
        assert got == exp, (lat, lng, k)


def test_knn_cell_partitioned_layout_prunes_scan(spark, tmp_path):
    """The knn scale story (VERDICT r3 task #5): with the points table
    written PARTITIONED by cell (the reference's prebuilt vertex grid,
    ``VertexGridIndex.build:64-112``, as a partition spec), the final
    candidate scan carries a PartitionFilters entry on cell and reads
    only the selected cells' partitions — and results stay identical to
    the unpartitioned path."""
    from pyspark.sql import functions as F

    from torchtrajectory_spark.functions.geo import tile_id
    from torchtrajectory_spark.operators.trajectory import (
        GRID_CELL_DEG, GRID_COLS, GRID_LAT0, GRID_LNG0,
        knn_points, synth_points,
    )
    from torchtrajectory_spark.sources.tables import load_table

    pts = synth_points(load_table(spark, "/root/testdata/sf0.001", "events"))
    layout = str(tmp_path / "points_by_cell")
    pts.withColumn(
        "cell",
        tile_id(F.col("lat"), F.col("lng"), GRID_LAT0, GRID_LNG0,
                GRID_CELL_DEG, GRID_COLS),
    ).write.partitionBy("cell").parquet(layout)
    gridded = spark.read.parquet(layout)

    lat, lng, k = -10.0, -30.0, 25
    exp = [(r["event_id"], r["dist_m"])
           for r in knn_points(pts, lat, lng, k).collect()]
    df = knn_points(gridded, lat, lng, k)
    got = [(r["event_id"], r["dist_m"]) for r in df.collect()]
    assert got == exp and len(got) == k

    # the isin() became a PartitionFilter on the parquet scan (plan paths
    # are truncated, so match the filter itself, not the table path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    # and the pruned scan reads fewer partitions than exist
    n_cells = gridded.select("cell").distinct().count()
    assert len(m.group(1).split(",")) < n_cells
    # cell never reaches the data filters or the read schema
    ds = re.search(r"DataFilters: \[([^\]]*)\]", plan)
    assert ds and "cell" not in ds.group(1), plan


def test_engine_find_knn_facade(spark):
    from torchtrajectory_spark.engine import Engine
    from torchtrajectory_spark.operators.trajectory import synth_points
    from torchtrajectory_spark.sources.tables import load_table

    pts = synth_points(load_table(spark, "/root/testdata/sf0.001", "events"))
    rows = Engine.find_knn(pts, -10.0, -30.0, k=5).collect()
    assert len(rows) == 5
    assert [r["dist_m"] for r in rows] == sorted(r["dist_m"] for r in rows)


def test_points_near_track_equals_plain_predicate(spark):
    """J6 candidate generation must be invisible: the ε-ball union +
    refine equals the plain min-haversine predicate, including a track
    whose ε-boxes span multiple and shared grid cells."""
    from pyspark.sql import functions as F

    from torchtrajectory_spark.functions.geo import haversine_m
    from torchtrajectory_spark.operators.trajectory import (
        points_near_track, synth_points,
    )
    from torchtrajectory_spark.sources.tables import load_table

    pts = synth_points(load_table(spark, "/root/testdata/sf0.001", "events"))
    track = [(-10.0, -30.0), (-14.0, -24.0), (55.0, 170.0)]
    eps = 1_200_000.0
    dists = [haversine_m(F.col("lat"), F.col("lng"),
                         F.lit(la), F.lit(ln)) for la, ln in track]
    mind = F.least(*dists)
    exp = {
        (r["event_id"], r["dist_m"])
        for r in pts.select(
            "event_id", F.round(mind).cast("bigint").alias("dist_m"),
        ).where(mind <= eps).collect()
    }
    got = {
        (r["event_id"], r["dist_m"])
        for r in points_near_track(pts, track, eps).collect()
    }
    assert got == exp and len(got) > 0

    # single-point track degenerates to points_in_radius's result set
    from torchtrajectory_spark.operators.trajectory import points_in_radius

    one = {(r["event_id"], r["dist_m"])
           for r in points_near_track(pts, [(-10.0, -30.0)], eps).collect()}
    rad = {(r["event_id"], r["dist_m"])
           for r in points_in_radius(pts, -10.0, -30.0, eps).collect()}
    assert one == rad
