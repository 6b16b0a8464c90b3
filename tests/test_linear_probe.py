"""Closed-form linear probe (FineWeb-Edu pattern): the distributed
one-pass ridge fit must agree with an independent single-pass numpy
mirror, recover a planted linear signal, score unlabeled rows without
letting them vote, and keep the scoring plan map-only/JVM-only."""

import numpy as np
import pytest


def _corpus(spark, n=200, d=8, seed=7, unlabeled_every=5):
    """Deterministic synthetic corpus with a planted linear target:
    y = X @ w* + 0.25 (exactly linear — recoverable)."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    w_true = rng.standard_normal(d)
    y = X @ w_true + 0.25
    rows = []
    for i in range(n):
        lab = None if i % unlabeled_every == 0 else float(y[i])
        rows.append((i, [float(v) for v in X[i]], lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label double"
    ).repartition(4)
    return df, X, y, w_true


def _numpy_ridge(X, y, l2, intercept=True):
    if intercept:
        X = np.hstack([X, np.ones((X.shape[0], 1))])
    G = X.T @ X
    reg = np.eye(X.shape[1]) * l2
    if intercept:
        reg[-1, -1] = 0.0
    return np.linalg.solve(G + reg, X.T @ y)


class TestFit:
    def test_matches_numpy_mirror_and_recovers_signal(self, spark):
        from real_estate_bigdata_spark.operators.linear_probe import (
            fit_linear_probe,
        )

        df, X, y, w_true = _corpus(spark)
        mask = np.array([i % 5 != 0 for i in range(len(y))])
        w = fit_linear_probe(df, l2=1e-6)
        w_np = _numpy_ridge(X[mask], y[mask], 1e-6)
        assert np.allclose(w, w_np, atol=1e-8)
        # the planted signal is exactly linear: near-exact recovery
        assert np.allclose(w[:-1], w_true, atol=1e-6)
        assert abs(w[-1] - 0.25) < 1e-6

    def test_no_intercept_and_l2_shrinks(self, spark):
        from real_estate_bigdata_spark.operators.linear_probe import (
            fit_linear_probe,
        )

        df, X, y, _ = _corpus(spark)
        mask = np.array([i % 5 != 0 for i in range(len(y))])
        w0 = fit_linear_probe(df, l2=0.0, intercept=False)
        assert np.allclose(
            w0, _numpy_ridge(X[mask], y[mask], 0.0, intercept=False),
            atol=1e-8,
        )
        w_reg = fit_linear_probe(df, l2=100.0, intercept=False)
        assert np.linalg.norm(w_reg) < np.linalg.norm(w0)

    def test_validation(self, spark):
        from real_estate_bigdata_spark.operators.linear_probe import (
            fit_linear_probe,
        )

        empty = spark.createDataFrame(
            [(1, [1.0, 2.0], None)],
            "vec_id long, embedding array<double>, label double",
        )
        with pytest.raises(ValueError, match="no training rows"):
            fit_linear_probe(empty)
        ragged = spark.createDataFrame(
            [(1, [1.0, 2.0], 1.0), (2, [1.0, 2.0, 3.0], 0.0)],
            "vec_id long, embedding array<double>, label double",
        ).repartition(2)
        with pytest.raises(ValueError):
            fit_linear_probe(ragged)
        with pytest.raises(ValueError, match="l2"):
            fit_linear_probe(empty, l2=-1.0)


class TestScores:
    def test_scores_everyone_fit_on_labeled_only(self, spark):
        from real_estate_bigdata_spark.operators.linear_probe import (
            linear_probe_scores,
        )

        df, X, y, _ = _corpus(spark)
        out = {r.vec_id: r.probe_score for r in linear_probe_scores(
            df, l2=1e-6
        ).collect()}
        assert len(out) == len(y)
        # unlabeled rows (every 5th) are scored too, and the exactly
        # linear target makes every score ~the true y
        for i in (0, 5, 10, 3, 7):
            assert out[i] == pytest.approx(y[i], abs=1e-4)

    def test_null_vector_scores_null(self, spark):
        from real_estate_bigdata_spark.operators.linear_probe import (
            probe_scores,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None)],
            "vec_id long, embedding array<double>",
        )
        out = {
            r.vec_id: r.probe_score
            for r in probe_scores(df, np.array([2.0, 0.0, 0.5])).collect()
        }
        assert out[1] == 2.5
        assert out[2] is None

    def test_dim_mismatch_flagged_not_silent(self, spark):
        """A non-NULL vector of the WRONG length scores NULL and is
        flagged dim_ok=false — distinguishable from the NULL-vector
        case (dim_ok NULL), so corpus dim corruption on unlabeled rows
        is visible at scoring time (ADVICE r8 #3)."""
        from real_estate_bigdata_spark.operators.linear_probe import (
            probe_scores,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.0, 9.0])],
            "vec_id long, embedding array<double>",
        )
        rows = {
            r.vec_id: r
            for r in probe_scores(df, np.array([2.0, 0.0, 0.5])).collect()
        }
        assert rows[1].probe_score == 2.5 and rows[1].dim_ok is True
        assert rows[2].probe_score is None and rows[2].dim_ok is None
        assert rows[3].probe_score is None and rows[3].dim_ok is False

    def test_scoring_plan_map_only_jvm_only(self, spark):
        from real_estate_bigdata_spark.operators.linear_probe import (
            probe_scores,
        )
        from real_estate_bigdata_spark.plans.audit import plan_stats

        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        stats = plan_stats(probe_scores(df, np.array([1.0, 1.0, 0.0])))
        assert stats.shuffles == 0
        assert stats.python_stages == 0


class TestElementNulls:
    def test_null_element_excluded_from_fit_scored_null(self, spark):
        """A vector containing a NULL element must not poison the Gram
        accumulation (excluded from training like a NULL vector) and
        must score NULL (the Column dot propagates element NULLs)."""
        from real_estate_bigdata_spark.operators.linear_probe import (
            fit_linear_probe,
            linear_probe_scores,
        )

        # second feature varies (a constant one would be collinear
        # with the intercept and singular at l2=0)
        clean = [
            (i, [float(i), float(i % 3)], float(2 * i + 0.5 * (i % 3) + 3))
            for i in range(8)
        ]
        df = spark.createDataFrame(
            clean + [(99, [1.0, None], 100.0)],
            "vec_id long, embedding array<double>, label double",
        )
        w = fit_linear_probe(df, l2=0.0)
        # fit on the clean rows only: y = 2*x0 + 0.5*x1 + 3 exactly
        assert w == pytest.approx([2.0, 0.5, 3.0], abs=1e-8)
        out = {
            r.vec_id: r.probe_score
            for r in linear_probe_scores(df, l2=0.0).collect()
        }
        assert out[99] is None
        assert out[4] == pytest.approx(2 * 4 + 0.5 * 1 + 3, abs=1e-6)

    def test_within_batch_ragged_dims_clear_error(self, spark):
        from real_estate_bigdata_spark.operators.linear_probe import (
            fit_linear_probe,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 2.0], 1.0), (2, [1.0, 2.0, 3.0], 0.0)],
            "vec_id long, embedding array<double>, label double",
        ).coalesce(1)
        with pytest.raises(Exception, match="inconsistent embedding dims"):
            fit_linear_probe(df)
