"""Geospatial radius joins (operators/geo.py, NEW r14): grid-cell
blocked neighbor search with exact haversine verification — exactness
vs brute force, pair uniqueness by construction, known-distance
haversine pins, the polar guard, and plan budgets."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import geo


def _city_points(spark, n, seed_salt=""):
    """Deterministic md5-scattered points in a ~133 x 153 km box."""
    def h(salt):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")

    return spark.range(1, n + 1).select(
        "id",
        (F.lit(10.3) + (h(seed_salt + ":lat") % 12000) / 10000.0).alias("lat"),
        (F.lit(106.2) + (h(seed_salt + ":lon") % 14000) / 10000.0).alias("lon"),
    )


def _brute(rows, radius_km):
    def hav(a, b):
        la1, lo1, la2, lo2 = map(math.radians, (a[1], a[2], b[1], b[2]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if hav(a, b) <= radius_km:
                out.add((min(a[0], b[0]), max(a[0], b[0])))
    return out


class TestHaversine:
    def test_known_distances(self, spark):
        """Pinned against published city distances (±1%):
        Ho Chi Minh City -> Hanoi ~1140 km great-circle; 1 deg of
        latitude at the equator ~111.2 km."""
        df = spark.createDataFrame(
            [(10.7769, 106.7009, 21.0278, 105.8342), (0.0, 0.0, 1.0, 0.0)],
            "lat1 double, lon1 double, lat2 double, lon2 double",
        )
        d = [
            r.d
            for r in df.select(
                geo.haversine_km(
                    F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
                ).alias("d")
            ).collect()
        ]
        assert abs(d[0] - 1140) / 1140 < 0.01, d[0]
        assert abs(d[1] - 111.2) / 111.2 < 0.005, d[1]

    def test_zero_distance_and_symmetry(self, spark):
        df = spark.createDataFrame(
            [(10.5, 106.5, 10.5, 106.5), (10.0, 106.0, 10.9, 106.9)],
            "lat1 double, lon1 double, lat2 double, lon2 double",
        )
        fwd = geo.haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
        rev = geo.haversine_km(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1"))
        rows = df.select(fwd.alias("f"), rev.alias("r")).collect()
        assert rows[0].f == 0.0
        # sign-flip symmetry is exact, not approximate
        assert all(r.f == r.r for r in rows)


class TestGeoRadiusPairs:
    def test_exact_vs_bruteforce(self, spark):
        """The grid only prunes: the pair set equals the all-pairs
        ground truth (cells at least the radius's degree span, 3x3
        probe coverage)."""
        pts = _city_points(spark, 800)
        got = {
            (r.id_a, r.id_b)
            for r in geo.geo_radius_pairs(
                pts, "id", "lat", "lon", 3.0, max_abs_lat=15.0
            ).collect()
        }
        rows = [(r.id, r.lat, r.lon) for r in pts.collect()]
        assert got == _brute(rows, 3.0)

    def test_pair_uniqueness_by_construction(self, spark):
        """No distinct in the plan — each unordered pair must appear
        exactly once, including same-cell and cross-cell neighbors."""
        pts = _city_points(spark, 800)
        out = geo.geo_radius_pairs(pts, "id", "lat", "lon", 3.0, max_abs_lat=15.0)
        assert out.count() == out.select("id_a", "id_b").distinct().count()

    def test_cross_cell_boundary_pair_found(self, spark):
        """Two points just under the radius apart, straddling a cell
        boundary — the 3x3 probe must cover them."""
        df = spark.createDataFrame(
            [(1, 10.5000, 106.5000), (2, 10.5170, 106.5000)],
            "id long, lat double, lon double",
        )  # ~1.89 km apart in latitude
        got = geo.geo_radius_pairs(df, "id", "lat", "lon", 2.0, max_abs_lat=15.0).collect()
        assert [(r.id_a, r.id_b) for r in got] == [(1, 2)]
        assert abs(got[0].dist_km - 1.88) < 0.02

    def test_beyond_radius_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 10.5000, 106.5000), (2, 10.5200, 106.5000)],
            "id long, lat double, lon double",
        )  # ~2.21 km apart
        assert (
            geo.geo_radius_pairs(df, "id", "lat", "lon", 2.0, max_abs_lat=15.0).count()
            == 0
        )

    def test_null_coordinates_never_pair(self, spark):
        df = spark.createDataFrame(
            [(1, 10.5, 106.5), (2, None, 106.5), (3, 10.5, None), (4, 10.5, 106.5)],
            "id long, lat double, lon double",
        )
        got = {
            (r.id_a, r.id_b)
            for r in geo.geo_radius_pairs(
                df, "id", "lat", "lon", 2.0, max_abs_lat=15.0
            ).collect()
        }
        assert got == {(1, 4)}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 10.5, 106.5)], "id long, lat double, lon double")
        with pytest.raises(ValueError, match="radius_km"):
            geo.geo_radius_pairs(df, "id", "lat", "lon", 0.0)
        with pytest.raises(ValueError, match="max_abs_lat"):
            geo.geo_radius_pairs(df, "id", "lat", "lon", 2.0, max_abs_lat=89.0)

    def test_polar_point_raises_at_execution(self, spark):
        """|lat| > max_abs_lat breaks the lon cell-width guarantee —
        it must fail the job (in-expression guard), not silently miss
        pairs."""
        df = spark.createDataFrame(
            [(1, 80.0, 106.5), (2, 10.5, 106.5)], "id long, lat double, lon double"
        )
        with pytest.raises(Exception, match="max_abs_lat"):
            geo.geo_radius_pairs(df, "id", "lat", "lon", 2.0, max_abs_lat=15.0).collect()

    def test_negative_coordinates(self, spark):
        """floor-based cells work across the sign change (southern /
        western hemispheres)."""
        df = spark.createDataFrame(
            [(1, -0.005, -0.005), (2, 0.005, 0.005), (3, -0.5, -0.5)],
            "id long, lat double, lon double",
        )
        got = {
            (r.id_a, r.id_b)
            for r in geo.geo_radius_pairs(
                df, "id", "lat", "lon", 2.0, max_abs_lat=15.0
            ).collect()
        }
        assert got == {(1, 2)}

    def test_plan_no_python_one_join(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        pts = _city_points(spark, 800)
        pairs = geo.geo_radius_pairs(pts, "id", "lat", "lon", 3.0, max_abs_lat=15.0)
        # exchanges: the cell-key join's two sides only — no distinct,
        # no aggregate; verification is a codegen filter
        stats = assert_plan(pairs, max_shuffles=3, forbid_python=True)
        assert stats.sortmerge_joins + stats.broadcast_joins >= 1, stats


class TestGeoNearest:
    def _centers(self, spark):
        return spark.createDataFrame(
            [(100, 10.5000, 106.5000), (200, 10.5100, 106.5000), (300, 11.0, 107.0)],
            "cid long, lat double, lon double",
        )

    def test_nearest_within_radius(self, spark):
        """Point at 10.5020 is ~0.22 km from center 100 and ~0.89 km
        from center 200 — nearest wins; center 300 is ~80 km away and
        never matches at r=2."""
        pts = spark.createDataFrame(
            [(1, 10.5020, 106.5000), (2, 10.5090, 106.5000)],
            "id long, lat double, lon double",
        )
        got = {
            r.id: (r.cid, r.dist_km)
            for r in geo.geo_nearest(
                pts, self._centers(spark), "id", "cid", 2.0, max_abs_lat=15.0
            ).collect()
        }
        assert got[1][0] == 100 and abs(got[1][1] - 0.221) < 0.01
        assert got[2][0] == 200 and abs(got[2][1] - 0.111) < 0.01

    def test_out_of_range_point_absent(self, spark):
        pts = spark.createDataFrame(
            [(1, 10.8, 106.8)], "id long, lat double, lon double"
        )  # ~40 km from everything
        assert (
            geo.geo_nearest(
                pts, self._centers(spark), "id", "cid", 2.0, max_abs_lat=15.0
            ).count()
            == 0
        )

    def test_tie_breaks_on_center_id(self, spark):
        """Two centers at the IDENTICAL location: the lower id wins
        deterministically (the oracle's (dist, id) row_number order)."""
        pts = spark.createDataFrame(
            [(1, 10.5, 106.5)], "id long, lat double, lon double"
        )
        ctrs = spark.createDataFrame(
            [(9, 10.5005, 106.5), (5, 10.5005, 106.5)],
            "cid long, lat double, lon double",
        )
        got = geo.geo_nearest(pts, ctrs, "id", "cid", 2.0, max_abs_lat=15.0).collect()
        assert [(r.id, r.cid) for r in got] == [(1, 5)]

    def test_matches_bruteforce_argmin(self, spark):
        """End-to-end vs driver-side argmin over scattered points and
        centers — exact, including the cross-cell cases."""
        pts = _city_points(spark, 400)
        ctrs = _city_points(spark, 40, seed_salt="c").select(
            F.col("id").alias("cid"), "lat", "lon"
        )
        got = {
            (r.id, r.cid)
            for r in geo.geo_nearest(
                pts, ctrs, "id", "cid", 8.0, max_abs_lat=15.0
            ).collect()
        }
        import math as _m

        def hav(a, b):
            la1, lo1, la2, lo2 = map(_m.radians, (a[1], a[2], b[1], b[2]))
            h = (
                _m.sin((la2 - la1) / 2) ** 2
                + _m.cos(la1) * _m.cos(la2) * _m.sin((lo2 - lo1) / 2) ** 2
            )
            return 2 * 6371.0088 * _m.asin(_m.sqrt(h))

        p_rows = [(r.id, r.lat, r.lon) for r in pts.collect()]
        c_rows = [(r.cid, r.lat, r.lon) for r in ctrs.collect()]
        want = set()
        for p in p_rows:
            cands = sorted(
                ((hav(p, c), c[0]) for c in c_rows if hav(p, c) <= 8.0)
            )
            if cands:
                want.add((p[0], cands[0][1]))
        assert got == want

    def test_validation(self, spark):
        pts = spark.createDataFrame([(1, 10.5, 106.5)], "id long, lat double, lon double")
        with pytest.raises(ValueError, match="radius_km"):
            geo.geo_nearest(pts, pts, "id", "id2", -1.0)
        with pytest.raises(ValueError, match="point_id and center_id"):
            geo.geo_nearest(pts, pts, "id", "id", 2.0)

    def test_plan_no_python(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        pts = _city_points(spark, 400)
        ctrs = _city_points(spark, 40, seed_salt="c").select(
            F.col("id").alias("cid"), "lat", "lon"
        )
        near = geo.geo_nearest(pts, ctrs, "id", "cid", 8.0, max_abs_lat=15.0)
        # cell join + the per-point argmin aggregate
        assert_plan(near, max_shuffles=4, forbid_python=True)
