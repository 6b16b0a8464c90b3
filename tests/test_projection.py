"""Distributed PCA / whitening (r12): numpy-mirror parity (allclose —
the linear-probe contract), whitening variance, deterministic signs,
NULL/width contracts, and the map-only no-Python apply plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.projection import (
    PcaModel,
    apply_pca,
    embedding_pca,
    fit_pca,
)


def _mirror_pca(x, k, whiten=False, eps=1e-9):
    """Independent numpy PCA with the operator's sign convention."""
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    vals = np.maximum(evals[order], 0.0)
    comp = evecs[:, order].T
    idx = np.abs(comp).argmax(axis=1)
    signs = np.sign(comp[np.arange(len(comp)), idx])
    signs[signs == 0] = 1.0
    comp = comp * signs[:, None]
    if whiten:
        comp = comp / np.sqrt(vals + eps)[:, None]
    return mean, comp, vals


def _fixture(n=400, d=12, seed=3):
    rng = np.random.RandomState(seed)
    # anisotropic: a few dominant directions so top-k is well-separated
    scales = np.linspace(5.0, 0.2, d)
    return rng.randn(n, d) * scales


def _df(spark, x, ids=None):
    ids = range(len(x)) if ids is None else ids
    return spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, x)],
        "vec_id long, embedding array<double>",
    )


class TestFitPca:
    def test_matches_numpy_mirror(self, spark):
        x = _fixture()
        m = fit_pca(_df(spark, x), k=4)
        mean, comp, vals = _mirror_pca(x, 4)
        assert np.allclose(m.mean, mean, atol=1e-8)
        assert np.allclose(m.components, comp, atol=1e-6)
        assert np.allclose(m.explained_variance, vals, rtol=1e-6)
        assert m.n_rows == len(x)

    def test_partitioning_invariance_allclose(self, spark):
        x = _fixture()
        a = fit_pca(_df(spark, x).repartition(1), k=3)
        b = fit_pca(_df(spark, x).repartition(7), k=3)
        assert np.allclose(a.components, b.components, atol=1e-8)
        assert np.allclose(a.mean, b.mean, atol=1e-10)

    def test_explained_variance_non_increasing(self, spark):
        m = fit_pca(_df(spark, _fixture()), k=6)
        ev = list(m.explained_variance)
        assert ev == sorted(ev, reverse=True)

    def test_nulls_excluded_and_explicit_dim_excludes_other_widths(
        self, spark
    ):
        x = _fixture(n=100, d=6)
        df = _df(spark, x).unionByName(
            spark.createDataFrame(
                [(900, None), (901, [1.0, 2.0])],
                "vec_id long, embedding array<double>",
            )
        )
        clean = fit_pca(_df(spark, x), k=2)
        # dim=6 states the width: NULLs and the width-2 row excluded
        dirty = fit_pca(df, k=2, dim=6)
        assert dirty.n_rows == clean.n_rows == 100
        assert np.allclose(dirty.components, clean.components, atol=1e-10)

    def test_mixed_widths_raise_without_explicit_dim(self, spark):
        """ADVICE r12: which width a limit(1) probe surfaced depended
        on scan order — mixed widths must fail loudly instead."""
        df = _df(spark, _fixture(n=20, d=6)).unionByName(
            spark.createDataFrame(
                [(901, [1.0, 2.0])], "vec_id long, embedding array<double>"
            )
        )
        with pytest.raises(ValueError, match="distinct vector widths"):
            fit_pca(df, k=2)
        with pytest.raises(ValueError, match="dim must be"):
            fit_pca(df, k=2, dim=0)

    def test_uncentered_mode_preserves_cluster_cosine(self, spark):
        """r13 (found by the PCA-masked near-dup dense-cluster test):
        center=False fits E[xx^T] with a zero mean, so a tight
        cluster's projected cosines track the raw ones — centered PCA
        would subtract the mean and leave decorrelated noise."""
        rng = np.random.default_rng(3)
        base = rng.standard_normal(12)
        x = base + 0.05 * rng.standard_normal((80, 12))
        df = _df(spark, x)
        m = fit_pca(df, k=4, center=False)
        assert all(v == 0.0 for v in m.mean)
        from real_estate_bigdata_spark.operators.projection import apply_pca

        out = apply_pca(df, m).orderBy("vec_id").collect()
        P = np.array([r.projected for r in out])
        pn = P / np.linalg.norm(P, axis=1)[:, None]
        xn = x / np.linalg.norm(x, axis=1)[:, None]
        # raw cluster cosines ~0.99+; uncentered projection keeps them
        raw = xn @ xn.T
        proj = pn @ pn.T
        iu = np.triu_indices(len(x), 1)
        assert raw[iu].min() > 0.95
        assert proj[iu].min() > 0.9
        # the CENTERED fit on the same cluster decorrelates them
        mc = fit_pca(df, k=4, center=True)
        outc = apply_pca(df, mc).orderBy("vec_id").collect()
        Pc = np.array([r.projected for r in outc])
        pcn = Pc / np.linalg.norm(Pc, axis=1)[:, None]
        assert (pcn @ pcn.T)[iu].min() < 0.5

    def test_validation(self, spark):
        df = _df(spark, _fixture(n=10, d=4))
        with pytest.raises(ValueError, match="k must be"):
            fit_pca(df, k=0)
        with pytest.raises(ValueError, match="exceeds embedding width"):
            fit_pca(df, k=5)
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="no non-null vectors"):
            fit_pca(empty, k=1)


class TestApplyPca:
    def test_projection_matches_numpy(self, spark):
        x = _fixture()
        df = _df(spark, x)
        got = {
            r.vec_id: r.projected
            for r in embedding_pca(df, k=4).select("vec_id", "projected").collect()
        }
        mean, comp, _ = _mirror_pca(x, 4)
        want = (x - mean) @ comp.T
        for i in range(len(x)):
            assert np.allclose(got[i], want[i], atol=1e-6), i

    def test_whitened_unit_variance(self, spark):
        x = _fixture(n=600)
        proj = np.array(
            [
                r.projected
                for r in embedding_pca(_df(spark, x), k=3, whiten=True)
                .select("projected")
                .collect()
            ]
        )
        assert np.allclose(proj.var(axis=0, ddof=1), 1.0, atol=1e-3)
        # and near-zero mean: centered before rotation
        assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-6)

    def test_null_and_wrong_width_project_to_null(self, spark):
        x = _fixture(n=50, d=6)
        model = fit_pca(_df(spark, x), k=2)
        df = spark.createDataFrame(
            [(0, [0.0] * 6), (1, None), (2, [1.0, 2.0])],
            "vec_id long, embedding array<double>",
        )
        got = {r.vec_id: r.projected for r in apply_pca(df, model).collect()}
        assert got[0] is not None
        assert got[1] is None and got[2] is None

    def test_out_col_collision_raises(self, spark):
        df = _df(spark, _fixture(n=20, d=4)).withColumn("projected", F.lit(1))
        model = fit_pca(_df(spark, _fixture(n=20, d=4)), k=1)
        with pytest.raises(ValueError, match="already exists"):
            apply_pca(df, model)

    def test_apply_plan_map_only_no_python(self, spark):
        """The registry posture: a PREFIT model applies as pure Column
        algebra — no exchange, no Arrow/Python stage (components bind
        via a broadcast single-row frame, never per-row literals)."""
        from real_estate_bigdata_spark.plans import assert_plan

        x = _fixture(n=50, d=8)
        model = fit_pca(_df(spark, x), k=2)
        out = apply_pca(_df(spark, x), model)
        assert_plan(out, max_shuffles=0, forbid_python=True)

    def test_model_is_plain_data(self):
        m = PcaModel(
            mean=(0.0,), components=((1.0,),), explained_variance=(1.0,),
            n_rows=2, whiten=False,
        )
        assert m.k == 1 and m.dim == 1
