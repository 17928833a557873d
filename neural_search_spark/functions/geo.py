"""Geo primitives: haversine distance, bounding box, geotile keys.

OpenSearch core surface (geo_distance / geo_bounding_box queries,
geotile_grid aggregation) expressed as pure Catalyst expressions —
trig stays JVM-side, no UDFs, so geo predicates push into the scan
like any other filter. The geotile key is the standard Web-Mercator
z/x/y tiling (identical ln/tan formula on the oracle side).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat_a: Column, lon_a: Column, lat_b, lon_b) -> Column:
    """Great-circle distance in meters (haversine, mean Earth radius).
    Accepts Columns or literals for the b-side (query point)."""
    la, lb = F.radians(lat_a), F.radians(F.lit(lat_b) if not isinstance(lat_b, Column) else lat_b)
    oa, ob = F.radians(lon_a), F.radians(F.lit(lon_b) if not isinstance(lon_b, Column) else lon_b)
    dlat, dlon = lb - la, ob - oa
    h = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(la) * F.cos(lb) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def in_bounding_box(
    lat: Column, lon: Column, top: float, left: float, bottom: float, right: float
) -> Column:
    """geo_bounding_box membership (no dateline wrap — documented)."""
    return (
        (lat <= F.lit(top)) & (lat >= F.lit(bottom))
        & (lon >= F.lit(left)) & (lon <= F.lit(right))
    )


def geotile_key(lat: Column, lon: Column, zoom: int) -> Column:
    """Web-Mercator z/x/y tile key "z/x/y" (the geotile_grid bucket
    key format). x = floor((lon+180)/360 · 2^z); y from the Mercator
    projection of latitude."""
    n = float(1 << zoom)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    lat_r = F.radians(lat)
    y = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi) / 2.0 * n
    ).cast("long")
    return F.concat_ws("/", F.lit(zoom), x, y)
