"""Prototype-distance pruning (Sorscher et al. 2022): hand-pinned
centroid/cosine arithmetic, hard-vs-easy regimes, per-class keep
fractions, the approx (sort-free) path's agreement, the NULL contract,
and the plan shape (broadcast prototypes, no Python stages)."""

import math

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


class TestPrototypeScores:
    def test_hand_pinned_centroid_and_cosine(self, spark):
        from real_estate_bigdata_spark.operators.pruning import (
            prototype_scores,
        )

        # label 0 centroid = mean of (1,0) and (0,1) = (.5,.5)
        df = _mk(
            spark,
            [
                (1, [1.0, 0.0], 0),
                (2, [0.0, 1.0], 0),
                (3, [2.0, 2.0], 1),
            ],
        )
        out = {r.vec_id: r for r in prototype_scores(df).collect()}
        expect = round(0.5 / (1.0 * math.sqrt(0.5)), 6)
        assert out[1].proto_cosine == expect
        assert out[2].proto_cosine == expect
        # singleton class: cosine to itself = 1
        assert out[3].proto_cosine == 1.0

    def test_null_contract(self, spark):
        from real_estate_bigdata_spark.operators.pruning import (
            prototype_scores,
        )

        df = _mk(
            spark,
            [
                (1, [1.0, 0.0], 0),
                (2, None, 0),          # NULL vector: NULL score, no vote
                (3, [0.0, 0.0], 0),    # zero norm: NULL score
                (4, [1.0, 1.0], None), # NULL label: NULL score
            ],
        )
        out = {r.vec_id: r for r in prototype_scores(df).collect()}
        # centroid of label 0 = mean of (1,0) and (0,0) = (.5, 0) —
        # the NULL vector cast no vote, the zero vector did
        assert out[1].proto_cosine == 1.0
        assert out[2].proto_cosine is None
        assert out[3].proto_cosine is None
        assert out[4].proto_cosine is None

    def test_plan_broadcast_and_jvm_only(self, spark):
        from real_estate_bigdata_spark.operators.pruning import (
            prototype_scores,
        )
        from real_estate_bigdata_spark.plans.audit import plan_stats

        df = _mk(spark, [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)])
        out = prototype_scores(df)
        stats = plan_stats(out)
        assert stats.python_stages == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestPrototypePrune:
    ROWS = [
        # label 0: an ASYMMETRIC sweep (symmetric vectors tie on
        # cosine-to-centroid and make the keep sets rank-unstable)
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.3], 0),
        (3, [0.5, 0.6], 0),
        (4, [-0.2, 1.0], 0),
        # label 1: two rows, distinct margins
        (10, [1.0, 0.9], 1),
        (11, [-0.5, 1.0], 1),
    ]

    def test_hard_keeps_farthest_per_class(self, spark):
        from real_estate_bigdata_spark.operators.pruning import (
            prototype_prune,
            prototype_scores,
        )

        df = _mk(spark, self.ROWS)
        scores = {
            r.vec_id: r.proto_cosine
            for r in prototype_scores(df).collect()
        }
        kept = prototype_prune(df, keep_frac=0.5, keep="hard").collect()
        by_label = {}
        for r in kept:
            by_label.setdefault(r.label, set()).add(r.vec_id)
        # label 0: percent_rank 0, 1/3, 2/3, 1 ascending by cosine;
        # <= 0.5 keeps the two LOWEST-cosine (hardest) ids
        hard0 = sorted([i for i, _, l in self.ROWS if l == 0],
                       key=lambda i: (scores[i], i))[:2]
        assert by_label[0] == set(hard0)
        # label 1: ranks 0 and 1 — only the harder one survives
        hard1 = min((i for i, _, l in self.ROWS if l == 1),
                    key=lambda i: (scores[i], i))
        assert by_label[1] == {hard1}

    def test_easy_is_the_mirror(self, spark):
        from real_estate_bigdata_spark.operators.pruning import (
            prototype_prune,
            prototype_scores,
        )

        df = _mk(spark, self.ROWS)
        scores = {
            r.vec_id: r.proto_cosine
            for r in prototype_scores(df).collect()
        }
        kept = {
            r.vec_id
            for r in prototype_prune(
                df, keep_frac=0.5, keep="easy"
            ).collect()
            if r.label == 0
        }
        easy0 = sorted([i for i, _, l in self.ROWS if l == 0],
                       key=lambda i: (-scores[i], i))[:2]
        assert kept == set(easy0)

    def test_approx_agrees_on_separated_scores(self, spark):
        """The sort-free path must keep the same rows when class scores
        are well separated (percentile interpolation can only disagree
        at knife-edge ties)."""
        from real_estate_bigdata_spark.operators.pruning import (
            prototype_prune,
        )

        df = _mk(spark, self.ROWS)
        exact = {
            (r.label, r.vec_id)
            for r in prototype_prune(df, 0.5, "hard").collect()
        }
        approx = {
            (r.label, r.vec_id)
            for r in prototype_prune(df, 0.5, "hard", approx=True).collect()
        }
        assert exact == approx
        # approx path emits NULL rank (no exact rank exists there)
        r = prototype_prune(df, 0.5, "hard", approx=True).collect()[0]
        assert r.keep_rank_frac is None

    def test_null_rows_dropped_and_validation(self, spark):
        from real_estate_bigdata_spark.operators.pruning import (
            prototype_prune,
        )

        df = _mk(
            spark,
            self.ROWS + [(99, None, 0), (98, [1.0, 0.0], None)],
        )
        kept = prototype_prune(df, keep_frac=1.0).collect()
        ids = {r.vec_id for r in kept}
        assert 99 not in ids and 98 not in ids
        assert {i for i, _, l in self.ROWS} == ids
        with pytest.raises(ValueError):
            prototype_prune(df, keep_frac=0.0)
        with pytest.raises(ValueError):
            prototype_prune(df, keep_frac=0.5, keep="middling")
