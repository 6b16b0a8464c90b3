"""Edit-distance fuzzy matching (operators/fuzzy.py, NEW r14):
k-deletion-neighborhood blocking (FastSS) + exact Levenshtein verify —
exact-pair semantics vs brute force, the lookup-join form, the
short-string contract's runtime guard, and the plan budgets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import fuzzy as fz
from real_estate_bigdata_spark.schema import load_table

SF = "/root/testdata/sf0.001"

FIXTURE = [
    (1, "kitten"),
    (2, "sitten"),
    (3, "sittin"),
    (4, "mitten"),
    (5, "kitten"),
    (6, None),
    (7, "banana"),
]


def _fixture(spark):
    return spark.createDataFrame(FIXTURE, "id long, s string")


def _brute(rows, k):
    """Driver-side ground truth over a small fixture."""
    import difflib  # noqa: F401  (stdlib presence only)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    out = set()
    vals = [(i, s) for i, s in rows if s is not None]
    for x, (ia, sa) in enumerate(vals):
        for ib, sb in vals[x + 1 :]:
            d = lev(sa, sb)
            if d <= k:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


class TestEditDistancePairs:
    def test_hand_pinned_k1(self, spark):
        got = set(map(tuple, fz.edit_distance_pairs(_fixture(spark), "id", "s", 1).collect()))
        assert got == {
            (1, 2, 1), (1, 4, 1), (1, 5, 0),
            (2, 3, 1), (2, 4, 1), (2, 5, 1), (4, 5, 1),
        }

    def test_hand_pinned_k2_matches_brute(self, spark):
        got = set(map(tuple, fz.edit_distance_pairs(_fixture(spark), "id", "s", 2).collect()))
        assert got == _brute(FIXTURE, 2)

    def test_exact_duplicates_pair_at_zero(self, spark):
        got = {
            (r.id_a, r.id_b): r.dist
            for r in fz.edit_distance_pairs(_fixture(spark), "id", "s", 1).collect()
        }
        assert got[(1, 5)] == 0

    def test_null_strings_never_pair(self, spark):
        got = set(
            r.id_a for r in fz.edit_distance_pairs(_fixture(spark), "id", "s", 2).collect()
        ) | set(
            r.id_b for r in fz.edit_distance_pairs(_fixture(spark), "id", "s", 2).collect()
        )
        assert 6 not in got

    @pytest.mark.parametrize("k", [1, 2])
    def test_completeness_vs_bruteforce_customers(self, spark, k):
        """The FastSS lemma end-to-end: the blocked pair set equals the
        all-pairs ground truth on real shared-prefix data — exactly the
        shape where segment blocking would degenerate."""
        rows = [
            (r.c_custkey, r.c_name)
            for r in load_table(spark, SF, "customer").collect()
        ]
        got = set(
            map(
                tuple,
                fz.edit_distance_pairs(
                    load_table(spark, SF, "customer"), "c_custkey", "c_name", k
                ).collect(),
            )
        )
        assert got == _brute(rows, k)

    def test_short_and_empty_strings(self, spark):
        """len <= k strings: deletion variants reach '' and single
        chars; a/b at distance 1, ''/x at distance 1."""
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, ""), (4, "ab")], "id long, s string"
        )
        got = set(map(tuple, fz.edit_distance_pairs(df, "id", "s", 1).collect()))
        assert got == {
            (1, 2, 1), (1, 3, 1), (1, 4, 1), (2, 3, 1), (2, 4, 1),
        }

    def test_validation(self, spark):
        df = _fixture(spark)
        with pytest.raises(ValueError, match="max_distance"):
            fz.edit_distance_pairs(df, "id", "s", 3)
        with pytest.raises(ValueError, match="max_len"):
            fz.edit_distance_pairs(df, "id", "s", 1, max_len=100)
        with pytest.raises(ValueError, match="max_len"):
            fz.edit_distance_pairs(df, "id", "s", 2, max_len=40)

    def test_overlong_string_raises_at_execution(self, spark):
        """The short-string contract is enforced INSIDE the expression
        (the dedup.py signature-guard pattern) — an overlong row fails
        the job, it does not silently explode the variant count."""
        df = spark.createDataFrame([(1, "x" * 80), (2, "y")], "id long, s string")
        with pytest.raises(Exception, match="max_len"):
            fz.edit_distance_pairs(df, "id", "s", 1).collect()

    def test_plan_no_python_and_bounded_exchanges(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        pairs = fz.edit_distance_pairs(
            load_table(spark, SF, "customer"), "c_custkey", "c_name", 1
        )
        # exchanges: the variant-hash join's two sides + the pair-dedup
        # aggregate; variant generation (map-only explode + the
        # min-parallelism repartition) runs ONCE into a localCheckpoint
        # (r15), so its exchange is not in this plan
        stats = assert_plan(pairs, max_shuffles=4, forbid_python=True)
        assert stats.sortmerge_joins + stats.broadcast_joins >= 1, stats

    def test_pairs_feed_connected_components(self, spark):
        """The pair stream composes with the dedup clustering tier,
        the MinHash idiom."""
        from real_estate_bigdata_spark.operators.clustering import (
            connected_components,
        )

        pairs = fz.edit_distance_pairs(_fixture(spark), "id", "s", 1)
        comp = connected_components(pairs.select("id_a", "id_b"))
        rows = comp.collect()
        comp_of = {r[0]: r[1] for r in rows}
        # 1-2-3-4-5 chain collapses to one cluster; 7 isolated (absent)
        assert len({comp_of[i] for i in (1, 2, 3, 4, 5)}) == 1
        assert 7 not in comp_of


class TestEditDistanceJoin:
    def test_lookup_semantics(self, spark):
        canon = spark.createDataFrame(
            [(100, "banana"), (200, "kitten")], "cid long, name string"
        )
        got = set(
            map(
                tuple,
                fz.edit_distance_join(
                    _fixture(spark), canon, "id", "cid", "s", "name", 1
                ).collect(),
            )
        )
        assert got == {
            (1, 200, 0), (2, 200, 1), (4, 200, 1), (5, 200, 0), (7, 100, 0),
        }

    def test_id_collision_raises(self, spark):
        df = _fixture(spark)
        with pytest.raises(ValueError, match="left_id and right_id"):
            fz.edit_distance_join(df, df, "id", "id", "s", "s", 1)

    def test_asymmetric_lengths_cross_k_boundary(self, spark):
        """Insertions/deletions across the join: 'kitte' (len 5)
        matches 'kitten' (len 6) at distance 1 in either direction."""
        left = spark.createDataFrame([(1, "kitte")], "id long, s string")
        right = spark.createDataFrame([(9, "kitten")], "rid long, name string")
        got = list(
            map(
                tuple,
                fz.edit_distance_join(
                    left, right, "id", "rid", "s", "name", 1
                ).collect(),
            )
        )
        assert got == [(1, 9, 1)]


class TestRecordLinkageComposition:
    def test_both_evidence_channels_required(self, spark):
        """The linkage join keeps a pair only when BOTH hold: names
        within distance 1 AND coordinates within radius — text-close/
        geo-far and geo-close/text-far pairs are excluded."""
        from real_estate_bigdata_spark.operators import geo

        rows = [
            (1, "villa saigon 9", 10.5000, 106.5000),
            (2, "villa saigon 8", 10.5010, 106.5000),  # both close to 1
            (3, "villa saigon 7", 11.4000, 107.3000),  # text-close, geo-far
            (4, "totally different", 10.5005, 106.5000),  # geo-close, text-far
        ]
        df = spark.createDataFrame(rows, "id long, s string, lat double, lon double")
        name_pairs = fz.edit_distance_pairs(df, "id", "s", 1)
        geo_pairs = geo.geo_radius_pairs(df, "id", "lat", "lon", 2.0, max_abs_lat=15.0)
        linked = name_pairs.join(geo_pairs, ["id_a", "id_b"])
        assert [(r.id_a, r.id_b) for r in linked.collect()] == [(1, 2)]
