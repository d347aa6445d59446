"""Geo-distance query + sort (reference Q20,
/root/reference/openaleph_search/query/queries.py:587-630): filter to
rows with a geo point, order by distance to a probe location.

Pure Column arithmetic (haversine) — whole-stage codegen, no UDF.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (lat, lon) columns/lits,
    degrees in, Column out."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (F.sin(dlat / 2) ** 2
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2)
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance_query(df: DataFrame, lat: float, lon: float,
                       lat_col: str = "lat", lon_col: str = "lon",
                       max_km: float | None = None,
                       k: int | None = None) -> DataFrame:
    """exists(geo) filter → distance column → nearest-first sort;
    optional radius filter and top-k."""
    out = (df.filter(F.col(lat_col).isNotNull()
                     & F.col(lon_col).isNotNull())
           .withColumn("distance_km", F.round(haversine_km(
               F.col(lat_col), F.col(lon_col),
               F.lit(float(lat)), F.lit(float(lon))), 6)))
    if max_km is not None:
        out = out.filter(F.col("distance_km") <= max_km)
    out = out.orderBy(F.asc("distance_km"))
    return out.limit(k) if k else out
