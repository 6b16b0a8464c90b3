"""Closed-form linear probes over embedding columns.

The FineWeb-Edu pattern (Penedo et al. 2024, "The FineWeb Datasets:
Decanting the Web for the Finest Text Data at Scale"): annotate a
small labeled subset, fit a linear model ON THE EMBEDDINGS, score the
whole corpus with it, and curate by the score. The fit here is the
closed-form ridge solution ``w = (X'X + l2*I)^-1 X'y`` (standard
least squares, e.g. Hastie/Tibshirani/Friedman, *The Elements of
Statistical Learning*) — no gradient loop, ONE distributed pass.

Why closed-form on Spark: the sufficient statistics (the Gram matrix
``X'X`` — (d+1)x(d+1) for embedding dim d — and the moment vector
``X'y``) are sums over rows, so they reduce map-side: each Arrow
batch contributes one BLAS ``X.T @ X`` partial, the driver sums the
bounded per-batch partials (one small row per Arrow batch — KBs for
d<=1024) and solves a dxd system locally. The corpus is touched once;
nothing corpus-sized ever concentrates.

Scoring is a pure Column dot product against the broadcast weight
literal — map-only, zero Python, codegen-fused; at 100 TB the scoring
pass is a scan.

Plan shape:
* fit: one ``mapInPandas`` Arrow pass (BLAS partial Grams — the
  documented Python-by-design stage class) -> bounded driver collect
  -> numpy ``solve``.
* score: map-only Column expressions; no shuffle, no Python.

The fit is float64 throughout; the per-batch partial-sum ORDER is
nondeterministic (partition scheduling), so fitted weights agree with
a single-pass numpy mirror to ~1e-9 relative, not bit-exactly — the
tests pin ``allclose`` tolerances, and the driver query is rows-only
(a d x d linear solve is not expressible in ANSI SQL; same class as
the BPE argmax loop).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_estate_bigdata_spark.functions.vectors import dot

__all__ = ["fit_linear_probe", "probe_scores", "linear_probe_scores"]


def fit_linear_probe(
    emb: DataFrame,
    target_col: str = "label",
    vec_col: str = "embedding",
    l2: float = 1e-3,
    intercept: bool = True,
) -> np.ndarray:
    """One-pass distributed ridge fit -> weight vector (length d, or
    d+1 with the intercept LAST when ``intercept=True``).

    Training rows are those with non-null target AND vector; the
    target is cast to double (a 0/1 indicator target makes this the
    least-squares classifier FineWeb-Edu's quality annotator is).
    ``l2`` regularizes the feature weights only — never the intercept
    (standard ridge convention). Raises on zero training rows or
    inconsistent embedding dims (a corrupt corpus must fail the fit,
    not silently produce garbage weights)."""
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    # a vector CONTAINING a NULL element is unusable for the fit the
    # same way a NULL vector is: exclude it here (it still gets a NULL
    # score downstream — the Column dot propagates element NULLs)
    train = emb.filter(
        F.col(target_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & F.forall(F.col(vec_col), lambda x: x.isNotNull())
    ).select(
        F.col(vec_col).cast("array<double>").alias("__x"),
        F.col(target_col).cast("double").alias("__y"),
    )

    def partial_grams(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            try:
                X = np.stack(pdf["__x"].to_numpy())
            except ValueError as exc:
                # ragged dims inside one Arrow batch — raise the same
                # contract message the cross-batch check gives instead
                # of numpy's opaque stack error
                raise ValueError(
                    "fit_linear_probe: inconsistent embedding dims "
                    f"within a batch: {sorted({len(v) for v in pdf['__x']})}"
                ) from exc
            y = pdf["__y"].to_numpy(dtype=np.float64)
            if intercept:
                X = np.hstack([X, np.ones((X.shape[0], 1))])
            yield pd.DataFrame(
                {
                    "g": [(X.T @ X).ravel().tolist()],
                    "b": [(X.T @ y).tolist()],
                    "n": [len(pdf)],
                    "dim": [X.shape[1]],
                }
            )

    parts = train.mapInPandas(
        partial_grams, "g array<double>, b array<double>, n long, dim int"
    ).collect()
    if not parts:
        raise ValueError(
            f"fit_linear_probe: no training rows (non-null {target_col} "
            f"and {vec_col})"
        )
    dims = {p["dim"] for p in parts}
    if len(dims) > 1:
        raise ValueError(
            f"fit_linear_probe: inconsistent embedding dims {sorted(dims)}"
        )
    k = dims.pop()
    G = np.zeros((k, k))
    b = np.zeros(k)
    for p in parts:
        G += np.asarray(p["g"]).reshape(k, k)
        b += np.asarray(p["b"])
    reg = np.eye(k) * l2
    if intercept:
        reg[-1, -1] = 0.0
    return np.linalg.solve(G + reg, b)


def probe_scores(
    emb: DataFrame,
    weights: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    intercept: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """Score every row with a fitted weight vector: (id,
    ``probe_score``, ``dim_ok``) — pure Column dot product against the
    plan-literal weights, map-only, no Python. NULL vectors score NULL
    (unscored, never silently zero).

    A non-NULL vector whose length differs from the fitted feature
    dimension also scores NULL but is FLAGGED ``dim_ok = false``
    (ADVICE r8 #3): without the guard, zip_with pads the short side
    with NULLs and the corruption is indistinguishable from the
    documented NULL-vector case — the fit raises on bad training rows,
    so scoring must not silently swallow bad unlabeled rows.
    ``dim_ok`` is NULL for NULL vectors (nothing to check), so
    ``filter(~dim_ok)`` isolates exactly the corrupted rows."""
    w = np.asarray(weights, dtype=np.float64)
    feat = w[:-1] if intercept else w
    bias = float(w[-1]) if intercept else 0.0
    lit = F.array(*[F.lit(float(v)) for v in feat])
    vec = F.col(vec_col)
    dim_ok = F.when(vec.isNotNull(), F.size(vec) == F.lit(len(feat)))
    return emb.select(
        F.col(id_col),
        F.round(
            F.when(
                vec.isNotNull() & (F.size(vec) == F.lit(len(feat))),
                dot(vec, lit) + F.lit(bias),
            ),
            decimals,
        ).alias("probe_score"),
        dim_ok.alias("dim_ok"),
    )


def linear_probe_scores(
    emb: DataFrame,
    target_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    l2: float = 1e-3,
    intercept: bool = True,
) -> DataFrame:
    """Fit on the labeled subset, score the WHOLE corpus (labeled or
    not) — the FineWeb-Edu deployment shape: annotations are scarce,
    the score is universal. The fit runs eagerly at build time (one
    bounded Arrow pass); the returned frame is the map-only scoring
    scan."""
    w = fit_linear_probe(emb, target_col, vec_col, l2, intercept)
    return probe_scores(emb, w, id_col, vec_col, intercept)
