"""Geo primitives (functions/geo.py): haversine sanity against known
city distances, box membership, geotile keys at known coordinates."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.functions import geo as G


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


def test_haversine_known_distance(spark):
    # SFO (37.6213, -122.3790) to JFK (40.6413, -73.7781) ≈ 4,151 km
    d = _one(spark, G.haversine_m(
        F.lit(37.6213), F.lit(-122.3790), 40.6413, -73.7781))
    assert abs(d - 4_151_000) < 25_000  # within 25 km (sphere model)
    # zero distance to itself
    z = _one(spark, G.haversine_m(F.lit(10.0), F.lit(20.0), 10.0, 20.0))
    assert z == 0.0


def test_bounding_box_membership(spark):
    inside = _one(spark, G.in_bounding_box(
        F.lit(45.0), F.lit(-100.0), 60.0, -130.0, 20.0, -60.0))
    outside = _one(spark, G.in_bounding_box(
        F.lit(70.0), F.lit(-100.0), 60.0, -130.0, 20.0, -60.0))
    assert inside is True and outside is False


def test_geotile_key_known_points(spark):
    # zoom 0: the whole world is tile 0/0/0
    assert _one(spark, G.geotile_key(F.lit(37.77), F.lit(-122.42), 0)) == "0/0/0"
    # zoom 1: SF is west (x=0) and north (y=0)
    assert _one(spark, G.geotile_key(F.lit(37.77), F.lit(-122.42), 1)) == "1/0/0"
    # Sydney (-33.87, 151.21): east (x=1), south (y=1)
    assert _one(spark, G.geotile_key(F.lit(-33.87), F.lit(151.21), 1)) == "1/1/1"
