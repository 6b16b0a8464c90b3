"""Embedding projection: distributed PCA fit + whitening transform.

The embedding-preprocessing stage a 100 TB curation pipeline runs
before any cosine-threshold operator (SemDeDup, embedding near-dup,
IVF): center the corpus, rotate onto the top-k principal directions,
optionally whiten (unit variance per direction) so one dominant
direction cannot swamp cosine similarity, and shrink the vectors
(64 -> 16 dims = 4x less shuffle traffic for every downstream pair
generator). Standard PCA — eigendecomposition of the corpus covariance
(Pearson 1901 / Hotelling 1933); whitening as in ZCA/PCA-whitening
practice.

Scale shape (the reference has no embedding surface — north-star
ABSENT category):

* **Fit** (:func:`fit_pca`) is ONE corpus pass: each partition reduces
  its vectors to a (d x d Gram, d-sum, count) triple inside an
  Arrow-batched ``mapInPandas`` (BLAS ``X.T @ X`` — the blocked-GEMM
  dedup precedent), the driver sums the per-partition triples (bounded
  by partition count, never rows) and eigendecomposes the d x d
  covariance (d is the embedding width — driver math on a 64 x 64
  matrix, the linear-probe closed-form precedent). No corpus-sized
  state ever concentrates.
* **Apply** (:func:`apply_pca`) is map-only PURE Column algebra: the
  mean and (pre-scaled, pre-signed) components bind as a broadcast
  single-row frame (NEVER inline ``F.lit(list)`` literals inside a
  per-row lambda — the r9 bloom lesson: a large CreateArray inside a
  lambda is rebuilt per row, measured ~10x), then one ``F.transform``
  over the component list computes each output coordinate as a
  ``zip_with``/``aggregate`` dot product. Zero Python in the plan, so
  a registry query built on a prefit model needs NO plan-audit
  whitelist entry.

Two fit modes: classic CENTERED PCA (covariance — variance analysis,
whitening, feature work) and ``center=False`` (uncentered second
moment — the dot-product/cosine-preserving mode the similarity-mask
kernels use; see :func:`fit_pca`).

Determinism: component SIGNS are fixed at fit time (the coordinate
with the largest |value| is made positive — eigenvector sign is
otherwise arbitrary and numpy returns either). Float reduction order
across partitions still varies, so parity with the numpy mirror is
allclose, never bit-exact (the linear-probe contract), and the driver
query is rows-only at the oracle gate (eigendecomposition is not
ANSI-SQL-expressible — the BPE/Dawid-Skene class).

NULL contract: NULL vectors are EXCLUDED from the fit; a corpus with
MIXED vector widths raises unless ``dim=`` states which width to fit
on (then other widths are excluded); ``apply_pca`` propagates NULL
for NULL / wrong-width inputs (unmeasured, never guessed).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PcaModel:
    """Fitted projection: ``mean`` (d,), ``components`` (k, d) rows
    already sign-fixed and, when whitened, pre-scaled by
    ``1/sqrt(eigval + eps)`` — so apply is always ``(x - mean) @ W.T``.
    ``explained_variance`` carries the top-k eigenvalues (pre-scaling)
    for ratio readouts."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    explained_variance: tuple[float, ...]
    n_rows: int
    whiten: bool

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def _fix_signs(components: np.ndarray) -> np.ndarray:
    """Make each component's largest-|coordinate| positive — the
    deterministic sign convention (eigenvector sign is arbitrary)."""
    idx = np.abs(components).argmax(axis=1)
    signs = np.sign(components[np.arange(len(components)), idx])
    signs[signs == 0] = 1.0
    return components * signs[:, None]


def fit_pca(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    whiten: bool = False,
    eps: float = 1e-9,
    dim: int | None = None,
    center: bool = True,
) -> PcaModel:
    """Fit a :class:`PcaModel` in one distributed pass (see module doc).

    Eager at call time (the linear-probe precedent): the corpus pass
    runs NOW and the returned model is plain driver data, so frames
    built from it are map-only scans.

    ``center=False`` fits the UNCENTERED second-moment matrix instead
    of the covariance (model mean = zero vector; apply is then a pure
    rotation/truncation of x itself). That is the right mode when the
    projection must preserve DOT PRODUCTS / cosines — the top-k
    eigenvectors of E[xx^T] are the least-squares dot-product
    preserver, while classic centered PCA subtracts the corpus mean
    first, and when the mean carries the signal (a tight cluster) the
    centered projections of two near-identical vectors are just their
    NOISE components — decorrelated from the raw cosine (r13: found
    by the dense-cluster regression test of the PCA-masked near-dup
    kernel). Keep center=True for variance analysis / whitening /
    feature work; use center=False for similarity masking.

    ``dim`` pins the embedding width explicitly; when None it is
    DERIVED from the corpus with one bounded aggregate, and a corpus
    holding MORE THAN ONE vector width raises instead of fitting on
    whichever width a scan happened to surface first (ADVICE r12: a
    ``limit(1)`` probe made the fitted model — and which rows were
    silently excluded — depend on partition order). Mixed widths are
    a data bug; fail loudly or state the width you mean."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dim is None:
        widths = sorted(
            r["d"]
            for r in (
                emb.filter(F.col(vec_col).isNotNull())
                .select(F.size(vec_col).alias("d"))
                .distinct()
                .limit(17)
                .collect()
            )  # bounded: width cardinality, not rows
        )
        if not widths:
            raise ValueError("fit_pca: no non-null vectors to fit on")
        if len(widths) > 1:
            raise ValueError(
                f"fit_pca: corpus holds {len(widths)} distinct vector "
                f"widths {widths[:16]} — pass dim= to state which one "
                f"to fit on (rows of other widths are excluded)"
            )
        d = widths[0]
    else:
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        d = dim
    if k > d:
        raise ValueError(f"k={k} exceeds embedding width d={d}")

    vecs = emb.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == d)
    ).select(F.col(vec_col).cast("array<double>").alias("v"))

    def gram_batches(batches):
        import pandas as pd

        g = np.zeros((d, d))
        s = np.zeros(d)
        n = 0
        for pdf in batches:
            x = np.stack(pdf["v"].to_numpy())
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        yield pd.DataFrame(
            {"g": [g.ravel().tolist()], "s": [s.tolist()], "n": [n]}
        )

    parts = vecs.mapInPandas(
        gram_batches, schema="g array<double>, s array<double>, n long"
    ).collect()  # bounded: one row per partition
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError(f"fit_pca needs >= 2 vectors, got {n}")
    gram = np.zeros((d, d))
    ssum = np.zeros(d)
    for r in parts:
        gram += np.array(r["g"]).reshape(d, d)
        ssum += np.array(r["s"])
    mean = ssum / n
    if center:
        cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    else:
        cov = gram / max(n - 1, 1)
        mean = np.zeros_like(mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    top_vals = np.maximum(evals[order], 0.0)
    comp = _fix_signs(evecs[:, order].T)
    if whiten:
        comp = comp / np.sqrt(top_vals + eps)[:, None]
    return PcaModel(
        mean=tuple(float(x) for x in mean),
        components=tuple(tuple(float(x) for x in row) for row in comp),
        explained_variance=tuple(float(x) for x in top_vals),
        n_rows=int(n),
        whiten=whiten,
    )


def apply_pca(
    emb: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "projected",
    round_to: int | None = 9,
) -> DataFrame:
    """Project ``vec_col`` onto ``model`` as ``out_col`` — map-only
    pure Column algebra, all other columns pass through. NULL vectors
    project to NULL. ``round_to`` (default 9, the prototype-pruning
    precedent) truncates reduction-order float noise below any
    downstream 6-decimal readout; None disables."""
    if out_col in emb.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    bind = emb.sparkSession.createDataFrame(
        [(list(model.mean), [list(c) for c in model.components])],
        "__pca_mean array<double>, __pca_w array<array<double>>",
    )
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("__pca_mean"),
        lambda a, b: a - b,
    )
    proj = F.transform(
        F.col("__pca_w"),
        lambda w: F.aggregate(
            F.zip_with(centered, w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if round_to is not None:
        proj = F.transform(proj, lambda x: F.round(x, round_to))
    out = (
        emb.crossJoin(F.broadcast(bind))
        .withColumn(
            out_col,
            F.when(
                F.col(vec_col).isNotNull()
                & (F.size(vec_col) == model.dim),
                proj,
            ),
        )
        .drop("__pca_mean", "__pca_w")
    )
    return out


def apply_pca_arrow(
    emb: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "projected",
    round_to: int | None = 9,
) -> DataFrame:
    """BLAS twin of :func:`apply_pca` for FAT models (r14): one
    Arrow-batched numpy GEMM per batch instead of interpreted
    higher-order-function algebra. Catalyst evaluates HOF lambdas
    per-element (never codegen'd), so the Column form costs ~3*k*d
    boxed flops per row — measured ~30 s per 2000 rows at d=768/k=64,
    where this form is milliseconds. Same contract: NULL or
    wrong-width vectors project to NULL, all other columns pass
    through, same ``round_to``. Reduction ORDER differs (numpy pairwise
    vs sequential fold), so cross-form equality is a round-``round_to``
    property, not bit-construction.

    This is an Arrow crossing — BLAS-whitelisted callers only (the
    embedding near-dup / ANN family); pure-Column consumers
    (q_embed_pca's registered plan) stay on :func:`apply_pca`.
    """
    import numpy as np

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    if out_col in emb.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    W = np.asarray([list(c) for c in model.components], dtype=np.float64)
    mu = np.asarray(list(model.mean), dtype=np.float64)
    dim = model.dim
    # fresh StructType: StructType.add MUTATES, and df.schema is cached
    schema = StructType(
        list(emb.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()), True)]
    )

    def project(batches):
        for pdf in batches:
            n = len(pdf)
            out = [None] * n
            vec = pdf[vec_col]
            ok = [
                v is not None and len(v) == dim for v in vec
            ]
            if any(ok):
                M = np.stack(
                    [np.asarray(v, dtype=np.float64) for v, o in zip(vec, ok) if o]
                )
                P = (M - mu) @ W.T
                if round_to is not None:
                    P = np.round(P, round_to)
                it = iter(P)
                out = [next(it).tolist() if o else None for o in ok]
            pdf[out_col] = out
            yield pdf

    return emb.mapInPandas(project, schema)


def embedding_pca(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "projected",
    whiten: bool = False,
) -> DataFrame:
    """Fit-and-apply convenience: one corpus fit pass, then the
    map-only projection. For repeated use, :func:`fit_pca` once and
    :func:`apply_pca` everywhere (the persisted-model pattern — a
    PcaModel is plain data, trivially JSON/parquet-serializable)."""
    return apply_pca(
        emb, fit_pca(emb, k, vec_col=vec_col, whiten=whiten),
        vec_col=vec_col, out_col=out_col,
    )
