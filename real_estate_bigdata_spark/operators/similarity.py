"""Similarity search over embedding columns (array<float>).

North-star surface: approximate-nearest-neighbor for training-data
curation. Two tiers:

- **brute-force top-k** — broadcast the (small) query set against the
  corpus, cosine per (query, candidate), per-query top-k via window.
  Exact; the baseline and the verifier for the approximate tier. Scales
  linearly in corpus size with zero shuffle of the corpus (queries are
  broadcast, top-k folds map-side through TakeOrdered-like window).
- **hyperplane LSH** — deterministic pseudo-random hyperplanes (seeded),
  sign-bit bucket key per vector; candidates share a bucket in >=1 of
  several bands. Approximate; recall tunable by bands x bits.

Pair scoring is ``zip_with``/``aggregate`` in double — JVM-side and
deterministic (norms hoisted to once per row). The many-projection LSH
key computation runs as one Arrow-batched BLAS matrix multiply per
batch (seeded planes — still deterministic across runs/executors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_estate_bigdata_spark.functions.vectors import cosine_from_norms, l2_norm

__all__ = [
    "brute_force_topk",
    "label_agreement",
    "label_agreement_ivf",
    "hyperplane_lsh_bucket",
    "lsh_topk",
    "IvfIndex",
    "build_ivf_index",
    "extend_ivf_index",
    "append_ivf_epoch",
    "append_pq_epoch",
    "save_ivf_index",
    "load_ivf_index",
    "ivf_search",
    "ivf_topk",
    "tune_n_probe",
    "cluster_balanced_sample",
    "PqCodebook",
    "train_pq",
    "pq_encode",
    "pq_topk",
    "save_pq",
    "load_pq",
    "ivfpq_topk",
    "retract_from_ann_index",
    "compact_ann_index",
]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    ``queries`` must be small (it is broadcast); the corpus streams
    through map-side, so the only shuffle is the per-query top-k window
    over k*|queries| surviving rows... which AQE collapses to almost
    nothing. Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_nrm", l2_norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).withColumn("c_nrm", l2_norm(F.col("c_vec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rn")
    )


#: last label_agreement snapshot broadcast per applicationId — NOT a
#: result cache (every call re-collects and re-broadcasts its own
#: snapshot); only tracked so the superseded handle can be unpersisted
#: instead of accumulating executor-cached blocks for the session's
#: lifetime (ADVICE r15).
_LA_PREV_BROADCAST: dict = {}


def label_agreement(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_rows: int = 200_000,
    _tile_elems: int = 1 << 23,
) -> DataFrame:
    """Label-noise detection over a labeled embedding set: for every
    vector, its exact cosine 1-nearest-neighbor and whether the labels
    agree. Rows with ``agree = false`` are the classic mislabel /
    ambiguous-class candidates (a point deep inside another class's
    region) — the first audit to run on labeled finetuning or eval data
    before training on it.

    Execution: the labeled set is snapshotted driver-side (sorted by id
    for the deterministic tie-break) and shipped to executors as ONE
    ``sparkContext.broadcast`` referenced by a THIN mapInPandas closure
    (VERDICT r14 what's-wrong #2: baking the numpy arrays into the
    closure re-serialized ~5 MB of snapshot per EXECUTION — every bench
    pass, every noop write — which amplified 25x inside a
    broadcast-heavy session; a broadcast ships via torrent once and is
    cached on executors, and the closure pickle drops to bytes); each
    Arrow batch is scored against the whole set in ONE BLAS matrix
    multiply, then per-row argmax over round-6 cosines with lowest-id
    tie-break — bit-compatible with the DuckDB oracle's ``ORDER BY
    cosine DESC, nn_id`` ranking. The driver-side collect is the same
    bounded-snapshot shape as the IVF training sample: labeled sets are
    orders of magnitude smaller than pretraining corpora, and
    ``max_rows`` (default 200k ≈ 100 MB at dim 64) enforces the
    assumption rather than letting the driver OOM — probed with a
    ``LIMIT max_rows+1`` count so a mistakenly huge input fails after a
    bounded scan, not a full one. Past that bound, the blocked-GEMM pair
    machinery (``dedup.embedding_neardup_pairs_blocked``) is the scale
    twin.

    ``id_col`` and ``label_col`` must be integral and non-null (the
    kernel packs them into int64 arrays); validated up front with a
    clear error rather than a pandas-worker crash.

    The per-batch GEMM is TILED over the snapshot axis (``_tile_elems``
    product-matrix elements per tile, default 8M ≈ 64 MB — a testing
    hook, not a tuning knob): the r6 scale battery's x30 point caught
    the unblocked form building multi-GB products per task and
    page-thrashing every worker. Tiling is result-identical (strict->
    displacement keeps the lowest-id tie-break across tiles;
    pytest-pinned at a forced 1-column tile).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    for cname in (id_col, label_col):
        dt = emb.schema[cname].dataType
        if not isinstance(dt, integral):
            raise TypeError(
                f"label_agreement requires an integral {cname!r} column "
                f"(got {dt.simpleString()}); map string ids/labels to "
                f"integers first"
            )
    # ONE bounded TopK collect replaces the probe-count + collect pair
    # (r16): orderBy + LIMIT max_rows+1 is a TakeOrdered, so an
    # oversized input still fails after a bounded scan (the extra row
    # proves the overflow), and the in-bound case pays one job, not two.
    snap = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>"), F.col(label_col))
        .orderBy(id_col)
        .limit(max_rows + 1)
        .collect()
    )
    if len(snap) > max_rows:
        raise ValueError(
            f"label_agreement snapshots the labeled set driver-side; "
            f"input exceeds max_rows={max_rows}. Use label_agreement_ivf "
            f"for corpus-scale sets (same audit, IVF-blocked 1-NN, no "
            f"driver snapshot)."
        )
    if any(r[0] is None or r[2] is None for r in snap):
        raise ValueError(
            f"label_agreement requires non-null {id_col!r}/{label_col!r}"
        )
    ids = np.array([r[0] for r in snap], dtype=np.int64)
    labels = np.array([r[2] for r in snap], dtype=np.int64)
    M = np.array([r[1] for r in snap], dtype=np.float64)
    nrm = np.sqrt((M * M).sum(axis=1))
    nrm[nrm == 0.0] = np.inf  # zero vectors: cosine 0 to everything
    Mn = M / nrm[:, None]
    # One torrent broadcast per call; the mapInPandas closure below
    # captures only this handle (bytes, not megabytes) so re-executing
    # the frame never re-ships the snapshot. The PREVIOUS call's
    # broadcast is unpersisted (not destroyed) so repeated calls in a
    # long session don't accumulate ~5 MB executor-cached blocks per
    # call (ADVICE r15): an older frame re-executed later lazily
    # re-fetches its value from the driver — slower, never wrong.
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((ids, labels, Mn))
    prev = _LA_PREV_BROADCAST.pop(sc.applicationId, None)
    if prev is not None:
        prev.unpersist(blocking=False)
    _LA_PREV_BROADCAST[sc.applicationId] = bc

    def batches(it):
        ids, labels, Mn = bc.value
        id_pos = {int(i): p for p, i in enumerate(ids)}
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {c: pd.array([], dtype="int64")
                     for c in ("__id", "__label", "nn_id", "nn_label")}
                )
                continue
            q = np.array(list(pdf["__v"]), dtype=np.float64)
            qn = np.sqrt((q * q).sum(axis=1))
            qn[qn == 0.0] = np.inf
            Qn = q / qn[:, None]
            # Tile the GEMM over the snapshot axis, bounding the product
            # matrix to ~64 MB. Unblocked, a 10k-row Arrow batch against
            # a 60k-row snapshot builds a 4.8 GB product PER TASK — the
            # r6 scale battery's x30 point caught all 32 local workers
            # page-thrashing at 92% system time on exactly that. Results
            # are bit-identical to the unblocked form: rounding happens
            # per tile before comparison, within-tile argmax takes the
            # first (lowest-id — ids are sorted) max column, and across
            # tiles only a STRICTLY greater cosine displaces the
            # incumbent, so the earliest tile keeps ties.
            tile = max(1, _tile_elems // max(len(q), 1))
            best = np.full(len(q), -np.inf)
            nn_pos = np.zeros(len(q), dtype=np.int64)
            row_self = np.array(
                [id_pos[int(qid)] for qid in pdf["__id"]], dtype=np.int64
            )
            rows = np.arange(len(q))
            for start in range(0, Mn.shape[0], tile):
                stop = min(start + tile, Mn.shape[0])
                raw = Qn @ Mn[start:stop].T
                # half-away-from-zero to match DuckDB round() (np.round
                # is half-to-even; boundary cosines would tie-break
                # differently)
                sims = np.copysign(
                    np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6, raw
                )
                in_tile = (row_self >= start) & (row_self < stop)
                sims[rows[in_tile], row_self[in_tile] - start] = -np.inf
                t_best = sims.max(axis=1)
                t_pos = (sims == t_best[:, None]).argmax(axis=1) + start
                upd = t_best > best
                best[upd] = t_best[upd]
                nn_pos[upd] = t_pos[upd]
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].astype("int64"),
                    "__label": pdf["__label"].astype("int64"),
                    "nn_id": ids[nn_pos],
                    "nn_label": labels[nn_pos],
                }
            )

    label_type = emb.schema[label_col].dataType
    id_type = emb.schema[id_col].dataType
    scored = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.col(label_col).alias("__label"),
    ).mapInPandas(
        batches, schema="__id long, __label long, nn_id long, nn_label long"
    )
    return scored.select(
        F.col("__id").cast(id_type).alias(id_col),
        F.col("__label").cast(label_type).alias(label_col),
        F.col("nn_id").cast(id_type).alias("nn_id"),
        F.col("nn_label").cast(label_type).alias("nn_label"),
        (F.col("__label") == F.col("nn_label")).alias("agree"),
    )


def label_agreement_ivf(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    index: IvfIndex | None = None,
) -> DataFrame:
    """:func:`label_agreement` past its driver-snapshot bound (VERDICT
    r6 task #4): the same 1-NN label audit, but the corpus is assigned
    to IVF inverted lists (shared :func:`build_ivf_index` /
    ``_assign_lists`` machinery) and each vector scores only against its
    ``n_probe`` nearest lists instead of the whole set — per-doc work
    drops from O(N) to O(N * n_probe / n_lists), and nothing snapshots
    to the driver beyond the bounded k-means sample.

    Semantics: identical ranking to the exact path — round-6
    (half-away-from-zero) cosine, argmax with lowest-id tie-break,
    self-match excluded — over the PROBED candidate set. With
    ``n_probe == n_lists`` the candidate set is the full corpus and the
    result EQUALS the exact path by construction (pytest-pinned); below
    that, recall of the true 1-NN is approximate exactly like
    ``ivf_search`` (a planted mislabel deep inside another class's
    region is still flagged — its whole neighborhood shares its lists).
    A query whose every probed list is empty of other vectors emits no
    row (the exact path has no such case — its candidate set is always
    the full snapshot). Pass a prebuilt/persisted ``index`` to amortize
    the coarse quantizer across audits.

    Scale shape: probe assignment is one Arrow-batched argmin per batch;
    scoring is a PER-LIST BLAS GEMM — query and candidate sides union
    into one frame tagged by role, ONE shuffle groups it by ``__list``,
    and each list's kernel call scores that list's probing queries
    against its members in tiled matrix multiplies (the same
    ``_tile_elems`` bound as the exact path — a hot list cannot build a
    multi-GB product). Labels ride through the kernel, so the only
    other shuffle is the per-query argmax-across-lists aggregate. A
    first cut scored candidates with per-pair Column-expression cosine
    inside a list equi-join; the scale battery measured it 4-7x SLOWER
    than the exact GEMM at x1-x10 — per-element expression folds cannot
    compete with BLAS on 64-dim dots, so the Arrow crossing pays for
    itself here. NULL/ragged vectors cannot be scored and are excluded;
    the integral id/label contract matches the exact path.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    for cname in (id_col, label_col):
        dt = emb.schema[cname].dataType
        if not isinstance(dt, integral):
            raise TypeError(
                f"label_agreement_ivf requires an integral {cname!r} column "
                f"(got {dt.simpleString()}); map string ids/labels to "
                f"integers first"
            )
    # same non-null contract (and error shape) as the exact path: a NULL
    # id/label would otherwise survive the vector filter and crash the
    # pandas kernel's int64 pack with an opaque executor-side error
    if emb.filter(
        F.col(id_col).isNull() | F.col(label_col).isNull()
    ).limit(1).count():
        raise ValueError(
            f"label_agreement_ivf requires non-null {id_col!r}/{label_col!r}"
        )
    if index is None:
        index = build_ivf_index(
            emb, n_lists=n_lists, seed=seed, id_col=id_col, vec_col=vec_col
        )
    dim = index.dim
    probe = _probe_lists_udf(index.centroids, min(n_probe, index.n_lists))
    base = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
        F.col(label_col).cast("long").alias("__lab"),
    ).filter(F.col("__vec").isNotNull() & (F.size("__vec") == dim))
    q_side = base.select(
        F.explode(probe(F.col("__vec"))).alias("__list"),
        "__id",
        "__vec",
        "__lab",
        F.lit(True).alias("__isq"),
    )
    # candidate-side assignment = the 1-probe (nearest centroid) of the
    # same shared probe kernel, so labels ride along with no join; the
    # passed index contributes its CENTROIDS (the coarse quantizer) —
    # membership is re-derived for exactly the audited frame
    assign1 = _probe_lists_udf(index.centroids, 1)
    c_side = base.select(
        F.element_at(assign1(F.col("__vec")), 1).alias("__list"),
        "__id",
        "__vec",
        "__lab",
        F.lit(False).alias("__isq"),
    )
    tile_elems = 1 << 23

    def score_list(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "__qid": pd.array([], dtype="int64"),
                "__qlab": pd.array([], dtype="int64"),
                "nn_id": pd.array([], dtype="int64"),
                "nn_label": pd.array([], dtype="int64"),
                "cosine": pd.array([], dtype="float64"),
            }
        )
        qf = pdf[pdf["__isq"]]
        cf = pdf[~pdf["__isq"]].sort_values("__id")  # lowest-id argmax
        if len(qf) == 0 or len(cf) == 0:
            return empty
        qids = qf["__id"].to_numpy(dtype=np.int64)
        qlabs = qf["__lab"].to_numpy(dtype=np.int64)
        cids = cf["__id"].to_numpy(dtype=np.int64)
        clabs = cf["__lab"].to_numpy(dtype=np.int64)
        Q = np.array(list(qf["__vec"]), dtype=np.float64)
        C = np.array(list(cf["__vec"]), dtype=np.float64)
        for M in (Q, C):
            n = np.sqrt((M * M).sum(axis=1))
            n[n == 0.0] = np.inf  # zero vectors: cosine 0, like exact
            M /= n[:, None]
        # tiled over the candidate axis — same strictly-greater
        # displacement as the exact path, so ties keep the lowest id
        tile = max(1, tile_elems // max(len(Q), 1))
        best = np.full(len(Q), -np.inf)
        nn_pos = np.zeros(len(Q), dtype=np.int64)
        for start in range(0, len(C), tile):
            stop = min(start + tile, len(C))
            raw = Q @ C[start:stop].T
            sims = np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6, raw)
            sims[qids[:, None] == cids[None, start:stop]] = -np.inf
            t_best = sims.max(axis=1)
            t_pos = (sims == t_best[:, None]).argmax(axis=1) + start
            upd = t_best > best
            best[upd] = t_best[upd]
            nn_pos[upd] = t_pos[upd]
        keep = best > -np.inf  # a lone self-match has no neighbor here
        return pd.DataFrame(
            {
                "__qid": qids[keep],
                "__qlab": qlabs[keep],
                "nn_id": cids[nn_pos[keep]],
                "nn_label": clabs[nn_pos[keep]],
                "cosine": best[keep],
            }
        )

    per_list = (
        q_side.unionByName(c_side)
        .groupBy("__list")
        .applyInPandas(
            score_list,
            schema="__qid long, __qlab long, nn_id long, nn_label long, "
            "cosine double",
        )
    )
    # across probed lists: best rounded cosine, lowest nn_id on ties —
    # per-list winners are already lowest-id within their list, so the
    # global min over winners is the global lowest-id max
    w = Window.partitionBy("__qid").orderBy(F.desc("cosine"), F.col("nn_id"))
    label_type = emb.schema[label_col].dataType
    id_type = emb.schema[id_col].dataType
    return (
        per_list.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("__qid").cast(id_type).alias(id_col),
            F.col("__qlab").cast(label_type).alias(label_col),
            F.col("nn_id").cast(id_type).alias("nn_id"),
            F.col("nn_label").cast(label_type).alias("nn_label"),
            (F.col("__qlab") == F.col("nn_label")).alias("agree"),
        )
    )


def _planes(dim: int, bits: int, bands: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bands, bits, dim))


def hyperplane_lsh_bucket(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    bands: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach (band, bucket) keys: per band, ``bits`` sign-bits of dot
    products with seeded Gaussian hyperplanes, packed into a bigint.

    All bands*bits projections happen in ONE Arrow-batched matrix
    multiply per batch (V @ P.T in BLAS) instead of bands*bits
    interpreted fold expressions per row — the same batched-GEMM shape
    as ``dedup.embedding_neardup_pairs_blocked``. The planes are
    seeded and baked into the closure (deterministic across
    runs/executors); each row fans out to ``bands`` rows — the blocking
    shuffle key for within-bucket candidate generation.
    """
    from pyspark.sql.functions import pandas_udf

    planes = _planes(dim, bits, bands, seed)
    P = planes.reshape(bands * bits, dim)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf("array<bigint>")
    def band_keys(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        # NULL / wrong-length vectors project as zero vectors: every dot
        # is 0, no sign bit set, bucket 0 per band — the same well-
        # defined key the Column-expression formulation produced.
        A = np.zeros((len(v), P.shape[1]))
        for i, vec in enumerate(v.to_numpy()):
            if vec is not None and len(vec) == P.shape[1]:
                A[i] = vec
        signs = (A @ P.T) > 0
        B = signs.reshape(len(A), bands, bits) @ weights
        return pd.Series(list(B))

    return (
        df.withColumn("bb", band_keys(F.col(vec_col).cast("array<double>")))
        .select("*", F.posexplode("bb").alias("band", "bucket"))
        .drop("bb")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 4,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing >=1 LSH
    bucket with the query, then exact cosine + per-query window top-k.

    Recall < 1 by construction (rows-only correctness check); the win is
    that each query only scores its bucket mates. Tune bits/bands to the
    similarity regime: high-similarity near-dup search tolerates many
    bits (tight buckets); top-k over weakly-correlated embeddings (cosine
    ~0.3-0.5) needs few bits + more bands — P(bucket hit) =
    (1 - theta/pi)^bits per band. Defaults (4 bits x 8 bands) target the
    weak-correlation regime; at 10^9 vectors raise bits and bands
    together to keep buckets small AND recall up.
    """
    # Candidate generation on ids only (cheap distinct over 8-byte
    # pairs); vectors join back AFTER dedup so each surviving candidate
    # is scored exactly once — scoring before distinct would re-evaluate
    # the dot product once per shared band.
    cb = hyperplane_lsh_bucket(corpus, dim, bits, bands, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "band", "bucket"
    )
    qb = hyperplane_lsh_bucket(queries, dim, bits, bands, vec_col=vec_col).select(
        F.col(id_col).alias(query_id_col), "band", "bucket"
    )
    cand_ids = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id")
        .distinct()
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).withColumn("c_nrm", l2_norm(F.col("c_vec")))
    q_vecs = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_nrm", l2_norm(F.col("q_vec")))
    cand = (
        cand_ids.join(c_vecs, "neighbor_id")
        .join(F.broadcast(q_vecs), query_id_col)
        .select(
            query_id_col,
            "neighbor_id",
            cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rn")
    )


class IvfIndex:
    """A built IVF index: seeded k-means centroids (driver-side numpy,
    tiny — n_lists x dim) + the corpus assigned to inverted lists
    (DataFrame: neighbor_id, c_vec, c_nrm, __list).

    Built once by :func:`build_ivf_index`, queried many times by
    :func:`ivf_search`, persisted by :func:`save_ivf_index` /
    :func:`load_ivf_index` — at scale the index build is its own job;
    repeated queries over a static corpus must not repay the k-means
    fit (VERDICT r1 "What's wrong" #2).
    """

    def __init__(
        self,
        centroids: np.ndarray,
        lists: DataFrame,
        tuned_n_probe: int | None = None,
    ):
        self.centroids = centroids
        self.lists = lists
        #: the serving operating point :func:`tune_n_probe` selected
        #: (None until tuned); persisted with the artifact so serving
        #: never re-pays the tuning ladder
        self.tuned_n_probe = tuned_n_probe

    @property
    def n_lists(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]


def build_ivf_index(
    corpus: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train: int = 100_000,
    max_iter: int = 10,
) -> IvfIndex:
    """Build the IVF index: seeded MLlib k-means partitions the corpus
    into ``n_lists`` inverted lists; each vector lands under its nearest
    centroid with its norm precomputed.

    The k-means fit runs on a seeded sample of at most ``max_train``
    vectors — centroid quality saturates far below corpus size, and at
    10^9 vectors fitting on the full corpus would dominate the build
    for no recall gain (the standard IVF practice); the full corpus is
    still ASSIGNED to lists. ``max_iter`` defaults to 10: inverted-list
    bucketing needs good centroids, not converged ones.

    The fit itself runs DRIVER-SIDE in numpy over the bounded sample
    (<= max_train x dim doubles — ~50 MB at the default, the FAISS-style
    coarse-quantizer training shape): Lloyd iterations are a BLAS matmul
    there, versus 2 distributed jobs per iteration for a cluster fit of
    the same sample. Only the full-corpus ASSIGNMENT pass (one Arrow-
    batched argmin per batch) is distributed — the part that is actually
    corpus-sized.

    NULL/ragged vectors cannot be indexed — excluded up front (a NULL
    would poison the centroid math; a ragged vector cannot be assigned).
    The expected dimension comes from the first indexable corpus vector
    (one tiny driver action — acceptable here because index build IS a
    job, unlike the search path, which stays action-free until the
    caller collects).
    """
    sample, dim = _deterministic_vector_sample(
        corpus, id_col, vec_col, seed, max_train, caller="build_ivf_index"
    )
    centers = _kmeans_fit(sample, k=n_lists, seed=seed, max_iter=max_iter)
    indexable = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).filter(F.col("c_vec").isNotNull() & (F.size("c_vec") == dim))
    return IvfIndex(centroids=centers, lists=_assign_lists(indexable, centers))


def _deterministic_vector_sample(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    seed: int,
    max_train: int,
    caller: str,
) -> tuple[np.ndarray, int]:
    """Bounded, content-deterministic training sample shared by the
    coarse quantizer (:func:`build_ivf_index`) and the product
    quantizer (:func:`train_pq`): NULL/ragged vectors excluded, then
    the ``max_train`` smallest seeded id-hashes (orderBy+limit folds to
    TakeOrdered — no full sort). A Bernoulli ``.sample()`` would depend
    on partitioning/row order and only bound the count in expectation —
    and even BELOW max_train the orderBy is load-bearing: collect()
    order is partition-dependent, and the seeded k-means++ init indexes
    into the collected array, so an unordered sample would make the
    same corpus produce different centroids under a different file
    split. Returns (sample matrix, vector dimension)."""
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).filter(F.col("c_vec").isNotNull())
    first = raw.select(F.size("c_vec").alias("d")).first()
    if first is None:
        raise ValueError(f"{caller}: corpus has no non-null vectors")
    dim = first.d
    train = (
        raw.filter(F.size("c_vec") == dim)
        .orderBy(F.xxhash64("neighbor_id", F.lit(seed)))
        .limit(max_train)
    )
    # Arrow driver transfer (guide §6): at the 100k x 768 production
    # sample the pickled-row collect ships ~600 MB row objects; Arrow
    # batches carry the same float64 bits (exact, order-preserving)
    pdf = train.select("c_vec").toPandas()
    X = (
        np.stack(pdf["c_vec"].to_numpy()).astype(np.float64, copy=False)
        if len(pdf)
        else np.empty((0, dim), dtype=np.float64)
    )
    return X, dim


def _assign_lists(indexable: DataFrame, centers: np.ndarray) -> DataFrame:
    """Distributed nearest-centroid assignment of an (neighbor_id,
    c_vec) frame — one Arrow-batched argmin GEMM per batch; the
    centroid matrix (n_lists x dim, tiny) ships with the task
    closures. Shared by the initial build and the incremental extend
    path so assignment semantics can never diverge."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign_list(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        A = np.stack(v.to_numpy())
        d = _sq_dists(A, centers)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return indexable.select(
        "neighbor_id",
        "c_vec",
        l2_norm(F.col("c_vec")).alias("c_nrm"),
        assign_list(F.col("c_vec")).alias("__list"),
    )


def extend_ivf_index(
    index: IvfIndex,
    new_corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Incremental IVF maintenance: assign NEW vectors to the EXISTING
    centroids (no refit) and union them into the inverted lists — the
    standard FAISS-style append path for a continuously-ingested
    embedding corpus. Centroids are immutable here by design: a refit
    would re-shuffle every existing assignment (and invalidate a
    persisted index); the coarse quantizer's recall degrades only when
    the DISTRIBUTION shifts, which is a rebuild decision, not an
    append decision — monitor with ``quality.distribution_drift`` over
    a projection and rebuild when it alarms.

    Same exclusion contract as the build: NULL vectors and vectors of
    the wrong dimension cannot be assigned and are dropped. The
    returned index shares the (immutable) centroid matrix; only the
    assignment pass over the NEW vectors runs — history is never
    re-scanned. Compose with :func:`save_ivf_index` to persist the
    appended lists.
    """
    new_raw = new_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).filter(F.col("c_vec").isNotNull() & (F.size("c_vec") == index.dim))
    return IvfIndex(
        centroids=index.centroids,
        lists=index.lists.unionByName(_assign_lists(new_raw, index.centroids)),
    )


def _sq_dists(A: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Pairwise squared distances via the expanded form — one GEMM, no
    N x K x D broadcast temp (which at an Arrow batch of 10k rows,
    n_lists=4096, dim=128 would be a ~42 GB allocation)."""
    return (A**2).sum(1)[:, None] - 2 * (A @ C.T) + (C**2).sum(1)[None, :]


def _kmeans_fit(X: np.ndarray, k: int, seed: int, max_iter: int) -> np.ndarray:
    """Seeded k-means++ init + Lloyd iterations, pure numpy (deterministic).

    Sized for the coarse-quantizer regime: X is the bounded training
    sample (<= max_train rows), k = n_lists. Empty clusters are re-seeded
    to the farthest point from its assigned centroid.
    """
    rng = np.random.default_rng(seed)
    n = len(X)
    if n == 0:
        raise ValueError("k-means: empty training sample")
    k = min(k, n)
    # k-means++ seeding
    centers = np.empty((k, X.shape[1]))
    centers[0] = X[rng.integers(n)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centers[i] = X[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((X - centers[i]) ** 2).sum(axis=1))
    for _ in range(max_iter):
        dists = _sq_dists(X, centers)
        assign = dists.argmin(axis=1)
        new_centers = centers.copy()
        # re-seed empty clusters to DISTINCT worst-served points — one
        # shared point would leave duplicate centroids (argmin ties go
        # to the lower index, so the duplicates stay empty forever)
        worst_order = np.argsort(-dists.min(axis=1))
        next_worst = iter(worst_order)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                new_centers[j] = members.mean(axis=0)
            else:
                new_centers[j] = X[next(next_worst)]
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    return centers


def save_ivf_index(index: IvfIndex, path: str) -> None:
    """Persist the index: inverted lists as parquet PARTITIONED BY
    ``__list`` (so a probe-limited search prunes whole list directories
    at the scan) + centroids as a tiny parquet table + (when tuned) the
    serving operating point, so a loaded index serves at the point the
    offline :func:`tune_n_probe` run selected without re-sweeping."""
    spark = index.lists.sparkSession
    index.lists.write.mode("overwrite").partitionBy("__list").parquet(
        f"{path}/lists"
    )
    cent_rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(index.centroids)
    ]
    spark.createDataFrame(
        cent_rows, "list_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    if index.tuned_n_probe is not None:
        spark.createDataFrame(
            [(int(index.tuned_n_probe),)], "tuned_n_probe int"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_ivf_index(spark, path: str) -> IvfIndex:
    """Load a persisted index. Centroids (tiny) collect to the driver;
    the lists stay a lazy partitioned scan, masked against the
    artifact's retraction ledger (:func:`retract_from_ann_index`) so a
    retracted id can never surface from ``ivf_search`` / ``ivfpq_topk``
    over a loaded index — a broadcast anti-join that vanishes entirely
    in the common no-retractions case."""
    cent = (
        spark.read.parquet(f"{path}/centroids")
        .orderBy("list_id")
        .collect()
    )
    centroids = np.stack([np.asarray(r.centroid) for r in cent])
    lists = spark.read.parquet(f"{path}/lists").select(
        "neighbor_id", "c_vec", "c_nrm", "__list"
    )
    epochs = _ivf_live_epochs(spark, path)
    if epochs is not None:
        lists = lists.unionByName(
            epochs.select("neighbor_id", "c_vec", "c_nrm", "__list")
        )
    lists = _mask_ann_retracted(
        lists,
        _read_ann_tombstones(
            spark, path, lists.schema["neighbor_id"].dataType.simpleString()
        ),
        "neighbor_id",
    )
    # optional-tier probe is a driver-side fs.exists, not a caught
    # AnalysisException (the r8 lesson: per-load exception probes cost
    # ~0.3 s); absent meta = never tuned, the common case. The probe
    # targets meta/_SUCCESS, not the bare directory (ADVICE r10): a
    # crash mid-meta-write leaves a partial dir whose parquet read
    # would fail every later load — a torn meta write must degrade to
    # an untuned index, never a load failure.
    tuned = None
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    meta_p = jvm.org.apache.hadoop.fs.Path(f"{path}/meta/_SUCCESS")
    if meta_p.getFileSystem(conf).exists(meta_p):
        tuned = spark.read.parquet(f"{path}/meta").collect()[0][
            "tuned_n_probe"
        ]
    return IvfIndex(centroids=centroids, lists=lists, tuned_n_probe=tuned)


def _ivf_epochs_dir(path: str) -> str:
    return path.rstrip("/") + "/lists_epochs"


def _read_ivf_epochs(spark, path: str) -> DataFrame | None:
    """The append tier of a persisted IVF index: epoch-partitioned list
    rows written by :func:`append_ivf_epoch`, or None when the index
    has never been appended to — the common static-corpus case decided
    by one driver-side ``fs.exists`` (r8: a per-session load must not
    pay a caught AnalysisException to learn there is no tier)."""
    epochs_dir = _ivf_epochs_dir(path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(epochs_dir)
    if not p.getFileSystem(conf).exists(p):
        return None
    return spark.read.parquet(epochs_dir)


def _ivf_live_epochs(spark, path: str) -> DataFrame | None:
    """The epoch partitions NOT yet folded into the base ``lists`` table:
    the append tier filtered by the base's fold fencepost
    (``util.read_fold_marker``), mirroring ``text_analysis``'s
    ``_bm25_live_epochs``. In the crash window between a compaction's
    lists swap and the epoch-directory delete, the folded partitions are
    still on disk but the freshly-swapped base already contains them —
    without the fencepost a load would union them back in and a
    duplicated row could occupy two top-k slots, displacing a legitimate
    k-th neighbor until compaction re-ran."""
    from real_estate_bigdata_spark.util import read_fold_marker

    tier = _read_ivf_epochs(spark, path)
    if tier is None:
        return None
    marker = read_fold_marker(spark, f"{path}/lists")
    if marker >= 0:
        tier = tier.filter(F.col("ingest_batch") > marker)
    return tier


def append_ivf_epoch(
    spark,
    path: str,
    new_corpus: DataFrame,
    epoch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a PERSISTED IVF index without rewriting it
    — the scale path :func:`extend_ivf_index` lacks: extend+save
    rewrites every existing list to add a batch, which a 10^9-vector
    index cannot afford per micro-batch. The new vectors are assigned
    to the index's immutable centroids (shared ``_assign_lists``, so
    assignment semantics cannot diverge from the build) and land under
    ``lists_epochs/ingest_batch=<epoch>/__list=<l>/`` with dynamic
    partition overwrite — a replayed epoch recomputes the identical
    assignment and overwrites exactly its own partition, the same
    exactly-once recipe as the dedup stores. ``__list`` stays a
    partition level, so probe-pruned searches skip unprobed directories
    in the epoch tier exactly like the base tier.

    :func:`load_ivf_index` unions the tier in automatically;
    :func:`compact_ann_index` folds it into the base ``lists`` table
    (and drops the epoch directories) on its next run — steady-state
    maintenance, exactly like signature-store compaction. Same
    exclusion contract as the build: NULL/ragged vectors are dropped.
    """
    cent = (
        spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    )
    centroids = np.stack([np.asarray(r.centroid) for r in cent])
    dim = centroids.shape[1]
    new_raw = new_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).filter(F.col("c_vec").isNotNull() & (F.size("c_vec") == dim))
    (
        _assign_lists(new_raw, centroids)
        .withColumn("ingest_batch", F.lit(int(epoch)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch", "__list")
        .parquet(_ivf_epochs_dir(path))
    )


def _probe_lists_udf(centers: np.ndarray, n_probe: int):
    """Arrow-batched pandas_udf: vector -> array<int> of the ``n_probe``
    nearest centroid ids. Shared by ``ivf_search`` and
    ``dedup.embedding_neardup_pairs_ivf`` so the probing semantics
    can't drift. NULL/ragged vectors probe as the zero vector (callers
    filter them out before or after — the guard just keeps np.stack
    from crashing)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probe_lists(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        A = np.zeros((len(v), centers.shape[1]))
        for i, vec in enumerate(v.to_numpy()):
            if vec is not None and len(vec) == centers.shape[1]:
                A[i] = vec
        d = _sq_dists(A, centers)
        return pd.Series(list(np.argsort(d, axis=1)[:, :n_probe].astype(np.int32)))

    return probe_lists


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    prune_lists: bool = True,
) -> DataFrame:
    """Search a built :class:`IvfIndex`: every query ranks the (driver-
    side, tiny) centroid table, probes only its ``n_probe`` nearest
    lists, and runs exact cosine + window top-k inside those lists —
    scanning ~n_probe/n_lists of the corpus instead of all of it.

    No k-means fit, no corpus pass beyond the probed lists: with
    ``prune_lists`` (default) the union of probed list ids (bounded by
    n_lists — a handful of ints) filters the lists scan, which on a
    :func:`save_ivf_index`-persisted index becomes STATIC partition
    pruning — unprobed list directories are never read. Recall < 1 by
    construction; pick ``n_probe`` with :func:`tune_n_probe` (sweep a
    sampled query set to the cheapest setting meeting a recall target)
    rather than trusting any fixed default — measured here, n_probe=4
    over 16 lists served 0.40 worst-case recall. At 10^9 vectors
    n_lists grows ~sqrt(N) and the per-list scan stays bounded.
    """
    n_probe = min(n_probe, index.n_lists)
    dim = index.dim
    probe_lists = _probe_lists_udf(index.centroids, n_probe)

    # NULL/ragged queries would probe as the zero vector and return k
    # fake neighbors with NULL cosines — excluded, matching the build.
    q = (
        queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        )
        .filter(F.col("q_vec").isNotNull() & (F.size("q_vec") == dim))
        .withColumn("q_nrm", l2_norm(F.col("q_vec")))
        .withColumn("__list", F.explode(probe_lists(F.col("q_vec"))))
    )
    lists = index.lists
    if prune_lists:
        # queries are the small/broadcast side by contract, so this
        # collect is bounded by n_lists ids; the isin becomes a
        # partition filter on a persisted index. localCheckpoint first:
        # q may hang off an expensive upstream (feature extraction), and
        # without materializing, the collect AND the join would each
        # re-run that whole pipeline (block storage is GC-reclaimed, so
        # no unpersist bookkeeping leaks into the caller).
        q = q.localCheckpoint(eager=True)
        probed = sorted({r["__list"] for r in q.select("__list").distinct().collect()})
        lists = lists.filter(F.col("__list").isin(probed))
    cand = (
        lists.join(F.broadcast(q), "__list")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """One-shot IVF top-k: :func:`build_ivf_index` + :func:`ivf_search`.

    Ad-hoc convenience only — a production corpus builds the index once
    (``save_ivf_index``) and searches it many times (``ivf_search``),
    never re-fitting k-means per query batch.
    """
    index = build_ivf_index(
        corpus, n_lists=n_lists, seed=seed, id_col=id_col, vec_col=vec_col
    )
    return ivf_search(
        index,
        queries,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        # an in-memory (unpersisted) index has no partition directories
        # to skip — the prune's collect job would be pure overhead here
        prune_lists=False,
    )


def tune_n_probe(
    index: IvfIndex,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    target_recall: float = 0.9,
    recall_stat: str = "min",
    candidates: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    search=None,
    exact: DataFrame | None = None,
) -> dict:
    """Recall-targeted ``n_probe`` selection (VERDICT r8 task #3): sweep
    a doubling ladder of probe counts on a SAMPLED query set, measure
    each against brute force with :func:`evaluation.topk_recall`, and
    return the CHEAPEST setting whose macro recall meets
    ``target_recall`` — the knee a serving deployment should run at,
    instead of a hand-picked default that silently ships 40% worst-case
    recall (the r8 q_ann_recall readout at n_probe=4).

    ``recall_stat`` picks the gate: ``"min"`` (worst query — the SLO
    framing, default) or ``"mean"``. ``candidates`` defaults to
    ``[1, 2, 4, ... , n_lists]``; ``n_lists`` is always appended, and at
    full probe IVF search equals brute force (pytest-pinned), so the
    sweep ALWAYS terminates at a setting meeting any target <= 1.0.
    ``search`` overrides the probed searcher — ``lambda np_:
    ivfpq_topk(index, codebook, codes, queries, k, n_probe=np_)`` tunes
    the IVF-PQ composition with the same ladder; the default probes
    :func:`ivf_search` on ``index``. ``exact`` lets a caller who
    already materialized the brute-force frame (to report recall at
    the tuned point afterwards) reuse it instead of paying a second
    corpus pass.

    Driver-side shape: this is a TUNING pass, run once per index build
    over a bounded query sample (tens of queries), not per request —
    the exact side is computed once and localCheckpointed; each ladder
    step is one bounded Spark job collecting a single stats row, and
    early-stop means ~log2(n_lists) steps worst case.

    Returns ``{"n_probe", "target_recall", "recall_stat", "swept":
    [{"n_probe", "n_queries", "mean_recall", "min_recall"}, ...]}`` —
    the swept trail makes the knee auditable, not just the answer.
    """
    from real_estate_bigdata_spark.operators.evaluation import topk_recall

    if not 0.0 < target_recall <= 1.0:
        raise ValueError(
            f"target_recall must be in (0, 1], got {target_recall}"
        )
    if recall_stat not in ("min", "mean"):
        raise ValueError(f"recall_stat must be min|mean, got {recall_stat}")
    if candidates is None:
        candidates = []
        c = 1
        while c < index.n_lists:
            candidates.append(c)
            c *= 2
    ladder = sorted({min(c, index.n_lists) for c in candidates} | {index.n_lists})
    if exact is None:
        exact = brute_force_topk(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col
        ).localCheckpoint(eager=True)
    if search is None:
        def search(np_: int) -> DataFrame:
            return ivf_search(
                index, queries, k=k, n_probe=np_,
                id_col=id_col, vec_col=vec_col, prune_lists=False,
            )
    swept: list[dict] = []
    best = ladder[-1]
    for c in ladder:
        row = (
            topk_recall(search(c), exact)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.round(F.avg("recall"), 6).alias("mean_recall"),
                F.round(F.min("recall"), 6).alias("min_recall"),
            )
            .collect()[0]
        )
        swept.append(
            {
                "n_probe": c,
                "n_queries": row["n_queries"],
                "mean_recall": row["mean_recall"],
                "min_recall": row["min_recall"],
            }
        )
        stat = row["min_recall"] if recall_stat == "min" else row["mean_recall"]
        if stat is not None and stat >= target_recall:
            best = c
            break
    # pin the operating point ON the index object so save_ivf_index
    # persists it with the artifact: tuning is an offline, per-build
    # job — serving readouts (q_ann_recall) report recall at the
    # pinned point instead of re-paying the ladder per query
    # (VERDICT r9 task #4)
    index.tuned_n_probe = best
    return {
        "n_probe": best,
        "target_recall": target_recall,
        "recall_stat": recall_stat,
        "swept": swept,
    }


def cluster_balanced_sample(
    embeddings: DataFrame,
    n_clusters: int = 16,
    cap: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: IvfIndex | None = None,
) -> DataFrame:
    """Diversity-preserving subset selection over an embedding corpus:
    cluster the vectors (seeded k-means — the same coarse quantizer
    :func:`build_ivf_index` trains) and keep at most ``cap`` rows per
    cluster, so dense semantic regions are downsampled while sparse
    ones survive whole — the cluster-balanced curation step of
    SemDeDup-style pipelines (dedup removes near-identical points;
    this flattens REGION density, the complementary lever on corpus
    diversity). Output: the input schema plus a ``cluster`` column.

    Within-cluster selection delegates to
    :func:`operators.sampling.cap_per_group`'s hash-ordered policy —
    deterministic, content-defined survivors on every run, engine, and
    partitioning; under-cap clusters pass through whole.

    Approximate by construction (k-means regions), so rows-only /
    pytest-pinned like the rest of the IVF family: invariants are
    per-cluster caps, determinism, and whole-corpus pass-through when
    nothing is over cap. Pass a prebuilt ``index`` to amortize the
    k-means across multiple curation runs on a static corpus.

    Scale posture: the fit is the bounded driver-side sample k-means
    (build_ivf_index's contract); assignment is one Arrow-batched
    argmin pass; the cap is one window shuffle on the cluster id with
    the count-prefilter shrinking any monster cluster's sort partition
    to ~cap + O(sqrt(cap)) rows.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from real_estate_bigdata_spark.operators.sampling import cap_per_group

    idx = index if index is not None else build_ivf_index(
        embeddings, n_lists=n_clusters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    assigned = idx.lists.select(
        F.col("neighbor_id").alias(id_col), F.col("__list").alias("cluster")
    )
    kept = cap_per_group(
        assigned,
        max_rows=cap,
        group_col="cluster",
        id_col=id_col,
        prefilter_counts=True,
    )
    return embeddings.join(kept.select(id_col, "cluster"), id_col)


class PqCodebook:
    """A trained product-quantization codebook: the vector space split
    into ``m`` contiguous sub-spaces, each with its own ``ksub``-entry
    centroid table. ``centroids`` has shape (m, ksub, dim/m).

    Train once (:func:`train_pq`), encode the corpus
    (:func:`pq_encode` — one uint8 code per sub-space, a dim-float
    vector compresses to ``m`` bytes), search with asymmetric-distance
    lookup tables (:func:`pq_topk`). The compression half of FAISS-
    style IVF-PQ; compose with :class:`IvfIndex` lists for candidate
    pruning when the corpus outgrows a full code scan.
    """

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (m, ksub, dsub)

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ksub(self) -> int:
        return self.centroids.shape[1]

    @property
    def dim(self) -> int:
        return self.centroids.shape[0] * self.centroids.shape[2]


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 256,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train: int = 100_000,
    max_iter: int = 10,
) -> PqCodebook:
    """Train a product quantizer on a bounded, content-deterministic
    sample (same seeded-hash orderBy+limit as :func:`build_ivf_index` —
    rebuilds of the same corpus give the same codebook under any file
    split). Vectors are L2-normalized before training so the
    inner-product ADC in :func:`pq_topk` ranks by cosine.

    One driver-side k-means per sub-space over the sample (reusing the
    seeded ``_kmeans_fit``); ``ksub`` caps at the sample size. ``m``
    must divide the vector dimension.
    """
    X, dim = _deterministic_vector_sample(
        corpus, id_col, vec_col, seed, max_train, caller="train_pq"
    )
    if dim % m != 0:
        raise ValueError(f"m={m} must divide the vector dimension {dim}")
    nrm = np.sqrt((X * X).sum(axis=1))
    nrm[nrm == 0.0] = 1.0
    X = X / nrm[:, None]
    dsub = dim // m
    cents = np.stack(
        [
            _kmeans_fit(
                X[:, j * dsub : (j + 1) * dsub], k=ksub, seed=seed + j,
                max_iter=max_iter,
            )
            for j in range(m)
        ]
    )
    return PqCodebook(cents)


def _collect_query_rows(
    queries: DataFrame, id_col: str, vec_col: str, dim: int, caller: str
) -> list:
    """Driver-side query snapshot shared by :func:`pq_topk` and
    :func:`ivfpq_topk` (small-queries contract): NULL ids, NULL
    vectors, and wrong-dimension vectors excluded; raises with a clear
    error when nothing searchable remains."""
    rows = (
        queries.select(
            F.col(id_col).alias("__qid"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
        .filter(
            F.col("__qid").isNotNull()
            & F.col("__qv").isNotNull()
            & (F.size("__qv") == dim)
        )
        .collect()
    )
    if not rows:
        raise ValueError(f"{caller}: no valid query vectors")
    return rows


def _require_integral_id(df: DataFrame, id_col: str, caller: str) -> None:
    """The PQ mapInPandas schemas carry ids as int64; a non-integral id
    column would crash the Arrow cast deep inside a pandas worker —
    validate up front with a clear error (same contract and rationale
    as ``label_agreement``)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = df.schema[id_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"{caller} requires an integral {id_col!r} column "
            f"(got {dt.simpleString()}); map string ids to integers first"
        )


def pq_encode(
    corpus: DataFrame,
    codebook: PqCodebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code: array<int>[m]) — each vector L2-normalized and
    quantized to its nearest sub-space centroids. A dim-float vector
    becomes ``m`` small ints — the 16-32x memory compression that lets
    a billion-vector corpus live in cluster RAM. NULL / wrong-dimension
    vectors and NULL ids are excluded (the Arrow long schema cannot
    carry a NaN id, and an id-less code is unusable downstream);
    ``id_col`` must be integral, like ``label_agreement``'s ids.
    Arrow-batched argmin per sub-space; the full-precision vector never
    leaves the scan."""
    _require_integral_id(corpus, id_col, "pq_encode")
    cents = codebook.centroids
    dim, m, dsub = codebook.dim, codebook.m, cents.shape[2]

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"__id": pdf["__id"], "code": []})
                continue
            A = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((A * A).sum(axis=1))
            nrm[nrm == 0.0] = 1.0
            A = A / nrm[:, None]
            codes = np.empty((len(A), m), dtype=np.int32)
            for j in range(m):
                codes[:, j] = _sq_dists(
                    A[:, j * dsub : (j + 1) * dsub], cents[j]
                ).argmin(axis=1)
            yield pd.DataFrame({"__id": pdf["__id"], "code": list(codes)})

    out = (
        corpus.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .filter(
            F.col("__id").isNotNull()
            & F.col("__v").isNotNull()
            & (F.size("__v") == dim)
        )
        .mapInPandas(batches, schema="__id long, code array<int>")
    )
    return out.select(F.col("__id").alias(id_col), "code")


def pq_topk(
    codes: DataFrame,
    codebook: PqCodebook,
    queries: DataFrame,
    k: int = 10,
    rerank: DataFrame | None = None,
    rerank_factor: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    _qrows: list | None = None,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via asymmetric distance:
    each query builds an (m x ksub) inner-product lookup table against
    the codebook, and a candidate's score is the sum of ``m`` table
    lookups — the corpus is scanned as ``m``-byte codes, never floats.
    Same small-queries contract as :func:`brute_force_topk` (the LUT
    tensor rides into the task closures); self-matches excluded.

    With ``rerank`` (the original vector table), the ADC pass keeps
    ``k * rerank_factor`` candidates per query and exact cosine
    re-scores just those — the standard two-stage that recovers
    near-exact recall while still never scanning full vectors.
    Output: (query_id, neighbor_id, cosine, rn); in the pure-ADC path
    ``cosine`` is the quantized estimate.
    """
    if k < 1 or rerank_factor < 1:
        raise ValueError(f"need k >= 1 and rerank_factor >= 1")
    _require_integral_id(codes, id_col, "pq_topk")
    _require_integral_id(queries, id_col, "pq_topk")
    cents = codebook.centroids  # (m, ksub, dsub)
    dim, m, dsub = codebook.dim, codebook.m, cents.shape[2]
    # _qrows: pre-collected query rows from ivfpq_topk — the composed
    # search already ran this exact collect for list probing; accepting
    # it avoids executing the queries' upstream pipeline twice
    qrows = (
        _collect_query_rows(queries, id_col, vec_col, dim, "pq_topk")
        if _qrows is None
        else _qrows
    )
    qids = np.array([r["__qid"] for r in qrows], dtype=np.int64)
    Q = np.array([r["__qv"] for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    qn[qn == 0.0] = 1.0
    Q = Q / qn[:, None]
    # LUT[q, j, c] = <query_q sub_j, centroid_{j,c}> ; scores sum over j
    lut = np.stack(
        [Q[:, j * dsub : (j + 1) * dsub] @ cents[j].T for j in range(m)],
        axis=1,
    )
    n_keep = k * (rerank_factor if rerank is not None else 1)

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["code"].to_numpy())  # (n, m)
            ids = pdf["__cid"].to_numpy()
            # scores[q, n] = sum_j lut[q, j, C[n, j]]
            scores = np.zeros((len(qids), len(C)))
            for j in range(m):
                scores += lut[:, j, C[:, j]]
            # exclude self-matches BEFORE the per-batch truncation —
            # filtering after would burn one of the kept slots on the
            # self row (always the max ADC score), permanently losing
            # the true k-th candidate for queries drawn from the corpus
            scores[ids[None, :] == qids[:, None]] = -np.inf
            out_q, out_n, out_s = [], [], []
            top = min(n_keep, len(C))
            for qi in range(len(qids)):
                part = np.argpartition(-scores[qi], top - 1)[:top]
                out_q.extend([qids[qi]] * len(part))
                out_n.extend(ids[part])
                out_s.extend(scores[qi, part])
            yield pd.DataFrame(
                {"__qid": out_q, "neighbor_id": out_n, "__score": out_s}
            )

    cand = (
        codes.select(F.col(id_col).alias("__cid"), "code")
        .filter(F.col("__cid").isNotNull())
        .mapInPandas(batches, schema="__qid long, neighbor_id long, __score double")
        .filter(F.col("neighbor_id") != F.col("__qid"))
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("__score").desc(), F.col("neighbor_id")
    )
    if rerank is None:
        return (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(
                F.col("__qid").alias(query_id_col),
                "neighbor_id",
                F.round(F.col("__score"), 6).alias("cosine"),
                "rn",
            )
        )
    shortlist = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_keep)
        .select("__qid", "neighbor_id")
    )
    from real_estate_bigdata_spark.util import local_frame

    qdf = local_frame(
        codes.sparkSession,
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, Q)],
        "__qid long, __qv array<double>",
    )
    truth = rerank.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    rescored = (
        shortlist.join(truth, "neighbor_id")
        .join(F.broadcast(qdf), "__qid")
        .select(
            "__qid",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qv"), F.col("__cv"), l2_norm(F.col("__qv")),
                l2_norm(F.col("__cv")),
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("__qid").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select(
            F.col("__qid").alias(query_id_col), "neighbor_id", "cosine", "rn"
        )
    )


def save_pq(
    codebook: PqCodebook, codes: DataFrame, path: str, id_col: str = "vec_id"
) -> None:
    """Persist a product-quantized corpus: the codebook as one tiny
    parquet table (one row per sub-space, its ksub x dsub centroid
    block flattened) and the codes as parquet. The build-once /
    search-many contract of :func:`save_ivf_index` extended to PQ:
    re-encoding a static corpus on every search session would repay
    the full decode+argmin pass for nothing."""
    spark = codes.sparkSession
    m, ksub, dsub = codebook.centroids.shape
    rows = [
        (int(j), int(ksub), int(dsub),
         [float(x) for x in codebook.centroids[j].reshape(-1)])
        for j in range(m)
    ]
    spark.createDataFrame(
        rows, "sub_space int, ksub int, dsub int, flat array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    codes.select(F.col(id_col), "code").write.mode("overwrite").parquet(
        f"{path}/codes"
    )


def _load_pq_codebook(spark, path: str) -> PqCodebook:
    """The (tiny, driver-side) codebook half of a persisted PQ corpus
    — shared by :func:`load_pq` and :func:`append_pq_epoch` so epoch
    encodes can never use different centroids than the build."""
    from pyspark.errors import AnalysisException

    from real_estate_bigdata_spark.util import is_missing_path_error

    try:
        rows = (
            spark.read.parquet(f"{path}/codebook")
            .orderBy("sub_space")
            .collect()
        )
    except AnalysisException as exc:
        if not is_missing_path_error(exc):
            raise
        raise ValueError(
            f"no PQ artifact at {path!r} — run save_pq first"
        ) from exc
    return PqCodebook(
        np.stack([np.asarray(r.flat).reshape(r.ksub, r.dsub) for r in rows])
    )


def _pq_epochs_dir(path: str) -> str:
    return path.rstrip("/") + "/codes_epochs"


def _read_pq_epochs(spark, path: str) -> DataFrame | None:
    """The append tier of a persisted PQ corpus
    (:func:`append_pq_epoch`), or None when never appended to — decided
    by one driver-side ``fs.exists`` (same rationale as the BM25
    probes: a per-query search must not pay a caught
    AnalysisException to learn there is no tier)."""
    epochs_dir = _pq_epochs_dir(path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(epochs_dir)
    if not p.getFileSystem(conf).exists(p):
        return None
    return spark.read.parquet(epochs_dir)


def _pq_live_epochs(spark, path: str) -> DataFrame | None:
    """Epoch partitions NOT yet folded into the base ``codes`` table:
    the append tier filtered by the base's fold fencepost — the same
    crash-window protection as ``_ivf_live_epochs`` /
    ``_bm25_live_epochs`` (a compaction crash between the codes swap
    and the epoch delete must not serve a folded code twice)."""
    from real_estate_bigdata_spark.util import read_fold_marker

    tier = _read_pq_epochs(spark, path)
    if tier is None:
        return None
    marker = read_fold_marker(spark, f"{path}/codes")
    if marker >= 0:
        tier = tier.filter(F.col("ingest_batch") > marker)
    return tier


def append_pq_epoch(
    spark,
    path: str,
    new_corpus: DataFrame,
    epoch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a PERSISTED PQ corpus without re-encoding
    it — the codes twin of :func:`append_ivf_epoch`, closing the last
    index-lifecycle asymmetry: a continuously-ingested IVF-PQ
    deployment appends the batch to BOTH artifacts (lists for probing,
    codes for the ADC scan); re-running ``pq_encode``+``save_pq`` over
    a 10^9-vector corpus per micro-batch is not an option.

    The batch encodes against the artifact's own persisted codebook
    (:func:`_load_pq_codebook` — the frozen-quantizer contract every
    production PQ system uses; new vectors never re-train centroids)
    and lands under ``codes_epochs/ingest_batch=<epoch>/`` with dynamic
    partition overwrite — a replayed epoch re-encodes identically
    (deterministic argmin) and overwrites exactly its own partition.
    :func:`load_pq` unions the tier in automatically;
    :func:`compact_ann_index` folds it back into the base ``codes``
    table behind the same fold fencepost as the lists tier.

    Same exclusion contract as :func:`pq_encode` (NULL/ragged vectors
    and NULL ids dropped; integral ids required) and the same
    never-seen-ids contract as every epoch append — dedup upstream.

    ``id_col`` names the column in ``new_corpus`` ONLY; the epoch
    tier's physical id column is read from the artifact's own ``codes``
    schema (r8 review: the module-wide "artifact decides, never the
    caller" rule — a mismatched caller default would otherwise write a
    malformed tier that every later ``load_pq`` rejects at serve time,
    possibly many epochs deep)."""
    codebook = _load_pq_codebook(spark, path)
    id_field = next(
        f.name
        for f in spark.read.parquet(f"{path}/codes").schema.fields
        if f.name != "code"
    )
    (
        pq_encode(new_corpus, codebook, id_col, vec_col)
        .select(F.col(id_col).alias(id_field), "code")
        .withColumn("ingest_batch", F.lit(int(epoch)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(_pq_epochs_dir(path))
    )


def load_pq(spark, path: str) -> tuple[PqCodebook, DataFrame]:
    """Load a persisted PQ corpus -> (codebook, codes). The codebook
    (tiny) collects to the driver; codes stay a lazy scan — base table
    unioned with any live :func:`append_pq_epoch` tier, then masked
    against the artifact's retraction ledger
    (:func:`retract_from_ann_index`) so ``pq_topk`` / ``ivfpq_topk``
    over loaded codes can never return a retracted id."""
    codebook = _load_pq_codebook(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    id_field = next(f.name for f in codes.schema.fields if f.name != "code")
    codes = codes.select(id_field, "code")
    epochs = _pq_live_epochs(spark, path)
    if epochs is not None:
        codes = codes.unionByName(epochs.select(id_field, "code"))
    codes = _mask_ann_retracted(
        codes,
        _read_ann_tombstones(
            spark, path, codes.schema[id_field].dataType.simpleString()
        ),
        id_field,
    )
    return codebook, codes


def ivfpq_topk(
    index: IvfIndex,
    codebook: PqCodebook,
    codes: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 6,
    rerank: DataFrame | None = None,
    rerank_factor: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Full FAISS-shape IVF-PQ search: the coarse quantizer prunes the
    corpus to the union of every query's ``n_probe`` nearest inverted
    lists, and the PQ ADC kernel (:func:`pq_topk`) scans only those
    lists' m-byte codes — compute proportional to probed lists, memory
    proportional to codes, never a full-corpus float scan. Composes the
    two persisted artifacts (:func:`save_ivf_index` + :func:`save_pq`):
    with the partitioned list layout the ``isin`` filter prunes whole
    list directories at the scan, exactly like :func:`ivf_search`.

    Probing uses RAW query vectors against the raw-vector centroids
    (the assignment metric); ADC scoring then normalizes, as always.
    The union-of-probes candidate set can only ADD candidates for any
    single query versus per-query pruning — recall is monotonically
    better at the cost of scoring a few extra codes per batch.
    Pick ``n_probe`` with :func:`tune_n_probe` (pass ``search=lambda
    np_: ivfpq_topk(..., n_probe=np_)``) — the coarse-quantizer recall
    ceiling applies here exactly as in :func:`ivf_search`.
    """
    _require_integral_id(queries, id_col, "ivfpq_topk")
    if codebook.dim != index.dim:
        # fail fast with the artifact named — a mismatched pair would
        # otherwise die in _sq_dists with an opaque broadcast error
        raise ValueError(
            f"ivfpq_topk: codebook dim {codebook.dim} != index dim "
            f"{index.dim} — the PQ and IVF artifacts were built on "
            f"different embedding spaces"
        )
    dim = codebook.dim
    qrows = _collect_query_rows(queries, id_col, vec_col, dim, "ivfpq_topk")
    Q = np.array([r["__qv"] for r in qrows], dtype=np.float64)
    d = _sq_dists(Q, index.centroids)
    n_probe = min(n_probe, index.n_lists)
    probed = sorted(
        {int(x) for row in np.argsort(d, axis=1)[:, :n_probe] for x in row}
    )
    cand_ids = (
        index.lists.filter(F.col("__list").isin(probed))
        .select(F.col("neighbor_id").alias(id_col))
    )
    return pq_topk(
        codes.join(cand_ids, id_col, "left_semi"),
        codebook,
        queries,
        k=k,
        rerank=rerank,
        rerank_factor=rerank_factor,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        _qrows=qrows,
    )

# --------------------------------------------------------------------------
# Persisted-artifact retraction (round 7, VERDICT r6 task #3)
# --------------------------------------------------------------------------
#
# The dedup stores gained takedown support in round 6
# (streaming/ingest.retract_fingerprints / retract_signatures), but a
# taken-down document's VECTORS remained retrievable forever through the
# persisted IVF lists and PQ codes — the search half of the takedown
# story. Same deletion-vector design: retraction appends (id) tombstones
# to a hidden ledger inside the artifact, every artifact LOAD masks
# against it (so all three search paths — ivf_search, pq_topk,
# ivfpq_topk — stop returning the id with zero rewrite cost), and
# compaction applies the mask physically and consumes the ledger.


def _ann_tombstones_dir(path: str) -> str:
    # leading underscore: Spark's file index treats _-prefixed paths as
    # hidden, so the ledger is invisible to a raw artifact read
    return path.rstrip("/") + "/_tombstones"


def _ann_data_tables(spark, path: str) -> list[tuple[str, str, str]]:
    """The data tables of the persisted ANN artifact at ``path``:
    ``[(subdir, id_field, id_type)]`` — ``lists`` for an IVF index
    (:func:`save_ivf_index`), ``codes`` for a PQ corpus
    (:func:`save_pq`); both for a co-located IVF-PQ pair. The id
    field/type are read from the ARTIFACT's own parquet schema — never
    trusted from the caller's frame (a narrower caller type would
    otherwise write a ledger the masks cannot join exactly)."""
    from pyspark.errors import AnalysisException

    from real_estate_bigdata_spark.util import is_missing_path_error

    out: list[tuple[str, str, str]] = []
    for sub in ("lists", "codes"):
        try:
            schema = spark.read.parquet(f"{path}/{sub}").schema
        except AnalysisException as exc:
            if not is_missing_path_error(exc):
                raise
            continue
        if sub == "lists":
            id_field = "neighbor_id"
        else:
            id_field = next(f.name for f in schema.fields if f.name != "code")
        out.append((sub, id_field, schema[id_field].dataType.simpleString()))
    if not out:
        raise ValueError(
            f"retract/compact: no ANN artifact at {path!r} — expected a "
            f"save_ivf_index 'lists' and/or save_pq 'codes' table"
        )
    return out


def _read_ann_tombstones(spark, path: str, id_type: str) -> DataFrame | None:
    """The artifact's retraction ledger, or None (the common case,
    decided by one driver-side ``fs.exists`` — every index load pays
    this probe, so it must not cost a caught AnalysisException)."""
    tomb_dir = _ann_tombstones_dir(path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(tomb_dir)
    if not p.getFileSystem(conf).exists(p):
        return None
    return spark.read.schema(f"__retracted_id {id_type}").parquet(tomb_dir)


def _mask_ann_retracted(
    rows: DataFrame, tombs: DataFrame | None, id_field: str
) -> DataFrame:
    """Key-only anti-join mask; the ledger is retraction-sized —
    broadcast, never a shuffle of the lists/codes side."""
    if tombs is None:
        return rows
    t = tombs.select(F.col("__retracted_id").alias(id_field)).distinct()
    return rows.join(F.broadcast(t), id_field, "left_anti")


def retract_from_ann_index(
    spark, path: str, ids: DataFrame, id_col: str = "vec_id"
) -> int:
    """Retract vectors from a persisted ANN artifact (IVF index, PQ
    corpus, or a co-located IVF-PQ pair at one ``path``): after this
    call, :func:`load_ivf_index` / :func:`load_pq` mask the ids out, so
    ``ivf_search`` / ``pq_topk`` / ``ivfpq_topk`` over the loaded
    artifacts can never return them — the search-side half of the
    takedown story (the dedup-store half is
    ``streaming.ingest.retract_fingerprints`` / ``retract_signatures``).

    Deletion-vector style: nothing is rewritten now; ``(id)`` tombstones
    append to a hidden ``_tombstones`` ledger inside the artifact and
    :func:`compact_ann_index` later applies them physically and consumes
    the ledger. The ledger key type derives from the ARTIFACT schema;
    caller ids are cast to it and the cast is validated (a lossy cast
    fails loudly instead of writing unjoinable tombstones). NULL ids are
    dropped — no artifact row can equi-join them.

    Re-adding a retracted id (``extend_ivf_index`` + save, or appending
    fresh codes) requires a :func:`compact_ann_index` first — the ledger
    is epoch-less (the artifacts carry no ingest history), so a live
    tombstone masks the id regardless of when its row was written. Same
    single-writer, searches-drained contract as store compaction.
    Returns the number of distinct ids tombstoned."""
    tables = _ann_data_tables(spark, path)
    id_types = {t[2] for t in tables}
    if len(id_types) > 1:
        raise ValueError(
            f"retract_from_ann_index: artifact tables at {path!r} disagree "
            f"on id type ({sorted(id_types)}) — rebuild them from one corpus"
        )
    id_type = id_types.pop()
    src_type = ids.schema[id_col].dataType.simpleString()
    # checkpoint FIRST, then validate on the checkpointed frame: the
    # validation must see the exact rows the ledger write will see — a
    # non-deterministic ids lineage could otherwise pass a recomputed
    # check while the written ledger carries bad rows. Two guards: a
    # NULL __retracted_id (cast produced nothing) and a round-trip
    # inequality (non-ANSI truncating cast, e.g. double 7.5 -> bigint 7,
    # produces a NON-null wrong key that would tombstone the wrong row).
    keys = (
        ids.select(F.col(id_col).alias("__raw"))
        .filter(F.col("__raw").isNotNull())
        .distinct()
        .withColumn("__retracted_id", F.col("__raw").cast(id_type))
        .localCheckpoint(eager=True)
    )
    bad = keys.filter(
        F.col("__retracted_id").isNull()
        | (F.col("__retracted_id").cast(src_type) != F.col("__raw"))
    ).limit(1)
    if bad.count():
        raise ValueError(
            f"retract_from_ann_index: ids of type {src_type!r} do not cast "
            f"losslessly to the artifact id type {id_type!r}"
        )
    out = keys.select("__retracted_id")
    n = out.count()
    if n:
        out.write.mode("append").parquet(_ann_tombstones_dir(path))
    return n


def compact_ann_index(spark, path: str) -> int:
    """Apply a persisted ANN artifact's tombstone ledger physically —
    rewrite the ``lists`` / ``codes`` tables without the retracted rows
    — and CONSUME the ledger, returning the number of ids applied.
    Also FOLDS the append tiers — :func:`append_ivf_epoch`'s
    ``lists_epochs`` into the base ``lists`` table and
    :func:`append_pq_epoch`'s ``codes_epochs`` into the base ``codes``
    table, each behind its own fold fencepost — and drops the epoch
    directories: the steady-state maintenance pass, so a
    continuously-appended index periodically collapses back to one
    partition-pruned tier. A fold-only run (append tier present, no
    ledger) still rewrites and returns 0; with neither present it is a
    true no-op. After compaction a re-added id is searchable again (the
    rewrite-half of :func:`retract_from_ann_index`'s contract).

    Rewrite protocol (the artifact path IS the pointer — no catalog
    version to swing, unlike the epoch stores' versioned fold): write
    the masked table to a hidden ``_<name>_new`` sibling, rename the
    live table aside, rename ``_new`` in, drop the old. Every crash
    window re-runs to completion: before the renames the live table and
    ledger are untouched (re-run restarts); between the renames the next
    call finds ``_<name>_new`` present with the live table missing and
    finishes the swap before doing anything else; after the swap but
    before ledger consumption, re-masking the already-clean table is a
    no-op rewrite. Single-writer maintenance op — run with searches
    drained, same contract as the dedup-store compactions."""
    from real_estate_bigdata_spark.util import (
        delete_dir,
        finish_pending_dir_swap,
        read_fold_marker,
        swap_in_rewrite,
        write_fold_marker,
    )

    # crash recovery first: finish a half-done swap from a prior run
    for sub in ("lists", "codes"):
        finish_pending_dir_swap(spark, f"{path}/{sub}")

    tables = _ann_data_tables(spark, path)
    has_lists = any(sub == "lists" for sub, _, _ in tables)
    has_codes = any(sub == "codes" for sub, _, _ in tables)
    tombs = _read_ann_tombstones(spark, path, tables[0][2])
    # raw vs live tier, per table family: raw decides whether epoch
    # DIRECTORIES need dropping; live (fencepost-filtered, mirroring
    # _bm25_live_epochs) decides what actually folds — a re-run after a
    # crash between a table's swap and its epoch delete sees raw
    # partitions the swapped base already contains and must not re-add
    raw_epochs = _read_ivf_epochs(spark, path) if has_lists else None
    epochs = _ivf_live_epochs(spark, path) if raw_epochs is not None else None
    raw_pq = _read_pq_epochs(spark, path) if has_codes else None
    pq_epochs = _pq_live_epochs(spark, path) if raw_pq is not None else None
    if tombs is None and raw_epochs is None and raw_pq is None:
        return 0
    fold_marks: dict[str, int] = {}
    pre_marks: dict[str, int] = {}
    for sub, raw in (("lists", raw_epochs), ("codes", raw_pq)):
        mark = read_fold_marker(spark, f"{path}/{sub}")
        pre_marks[sub] = mark
        if raw is not None:
            m = raw.agg(F.max("ingest_batch")).first()[0]
            if m is not None:
                mark = max(mark, int(m))
        fold_marks[sub] = mark
    n_ids = (
        tombs.select("__retracted_id").distinct().count()
        if tombs is not None
        else 0
    )

    for sub, id_field, _ in tables:
        live = f"{path}/{sub}"
        rows = spark.read.parquet(live)
        folded_tier = epochs if sub == "lists" else pq_epochs
        if sub == "lists":
            rows = rows.select("neighbor_id", "c_vec", "c_nrm", "__list")
            if epochs is not None:
                rows = rows.unionByName(
                    epochs.select("neighbor_id", "c_vec", "c_nrm", "__list")
                )
        else:
            rows = rows.select(id_field, "code")
            if pq_epochs is not None:
                rows = rows.unionByName(pq_epochs.select(id_field, "code"))
        if folded_tier is not None and pre_marks[sub] < 0:
            # LEGACY posture: an epoch tier with no fold fencepost on the
            # base table. A pre-fencepost compaction that crashed between
            # the swap and the epoch-directory delete left the folded
            # rows BOTH in the base and on disk as epochs — the old code
            # relied on this distinct for exactly that window, and
            # without a marker the live-tier filter cannot tell. One-time
            # cost: this run writes the marker, so the distinct never
            # runs again on this artifact.
            rows = rows.distinct()
        masked = _mask_ann_retracted(rows, tombs, id_field)
        writer = masked.write.mode("overwrite")
        if sub == "lists":
            # preserve the partition-pruned layout searches depend on
            writer = writer.partitionBy("__list")
        writer.parquet(f"{path}/_{sub}_new")
        if fold_marks[sub] >= 0:
            # fencepost INSIDE the _new table before its swap, so the
            # marker travels with the data: the moment the swap lands,
            # loads filter the still-on-disk epoch tier by it and the
            # crash window between swap and epoch-delete cannot serve
            # a folded row twice
            write_fold_marker(spark, f"{path}/_{sub}_new", fold_marks[sub])
        swap_in_rewrite(spark, live)

    if raw_epochs is not None:
        delete_dir(spark, _ivf_epochs_dir(path))
    if raw_pq is not None:
        delete_dir(spark, _pq_epochs_dir(path))
    delete_dir(spark, _ann_tombstones_dir(path))
    return n_ids
