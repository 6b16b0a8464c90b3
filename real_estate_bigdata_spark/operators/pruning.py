"""Prototype-distance data pruning over labeled embeddings.

Sorscher et al. 2022, "Beyond neural scaling laws: beating power law
scaling via data pruning" (NeurIPS 2022): score every example by its
cosine to its class prototype (the class-mean embedding) and prune by
that margin — keep the HARD (far-from-prototype) fraction when data is
abundant, the EASY fraction when it is scarce. The published
model-free curation lever that composes with SemDeDup
(``dedup.semantic_dedup``) and cluster-balanced sampling
(``similarity.cluster_balanced_sample``): SemDeDup removes redundancy,
prototype pruning removes easiness.

North-star surface — the reference (SURVEY §2) has no vector ops.

Plan shape / 100 TB posture:

* **Prototypes** are ONE map-side-combinable aggregate: ``posexplode``
  of the vector (d-fold row inflation of (label, pos, val) triples —
  never the payload) -> ``groupBy(label, pos).avg`` -> per-label
  array re-assembly. The result is ``n_labels`` rows — broadcast back
  onto the corpus; corpus embeddings never shuffle.
* **Scoring** is the shared pure-Column cosine
  (``functions.vectors.cosine_similarity``) — JVM-side, codegen-fused.
* **Pruning** ranks within each class. ``approx=False`` is the exact
  ``percent_rank`` window (per-class sort — the oracle-checkable
  formulation); ``approx=True`` swaps in a per-class
  ``approx_percentile`` cutoff broadcast-joined back (one pass, no
  sort — the 100 TB path, same trade as ``quality.quantile_floor``).

Centroid components are rounded to 9 decimals before scoring so the
engine-dependent reduction order of the mean (Spark partial aggregates
vs the oracle's single pass) cannot leak a last-ulp difference into
the 6-decimal cosine the oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_estate_bigdata_spark.functions.vectors import cosine_similarity

__all__ = ["class_prototypes", "prototype_scores", "prototype_prune"]


def class_prototypes(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 9,
) -> DataFrame:
    """Per-label mean embedding -> (label, ``__proto``) — ``n_labels``
    rows, built from one map-side-combinable aggregate over exploded
    (label, pos, val) triples. Rows with NULL label or NULL vector are
    excluded (they get NULL scores downstream, never a vote here)."""
    triples = (
        emb.filter(F.col(label_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(label_col).alias("__label"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "__pos", "__val"
            ),
        )
    )
    return (
        triples.groupBy("__label", "__pos")
        .agg(F.avg("__val").alias("__mean"))
        .groupBy("__label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__mean"))
                ),
                lambda s: F.round(s["__mean"], decimals),
            ).alias("__proto")
        )
    )


def prototype_scores(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """Per-example prototype margin: (id, label, ``proto_cosine``) where
    ``proto_cosine`` is the round-``decimals`` cosine between the
    example and its class-mean embedding (Sorscher et al. 2022's
    self-supervised prototype metric, here over provided labels — pass
    k-means assignments for the fully unsupervised variant).

    High cosine = prototypical/easy, low = hard/outlier — the score is
    the pruning axis AND a label-noise signal (a far-from-prototype
    example in a tight class is a mislabel candidate, the
    distributional complement of ``similarity.label_agreement``'s 1-NN
    vote). NULL label / NULL vector / zero-norm rows carry a NULL
    score and never vote in the prototype."""
    protos = F.broadcast(class_prototypes(emb, vec_col, label_col))
    return (
        emb.join(
            protos, emb[label_col] == protos["__label"], "left"
        )
        .select(
            F.col(id_col),
            F.col(label_col),
            F.round(
                cosine_similarity(F.col(vec_col), F.col("__proto")),
                decimals,
            ).alias("proto_cosine"),
        )
    )


def prototype_prune(
    emb: DataFrame,
    keep_frac: float = 0.5,
    keep: str = "hard",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    approx: bool = False,
) -> DataFrame:
    """Keep the ``keep_frac`` fraction of each class by prototype
    margin: ``keep="hard"`` keeps the examples FARTHEST from their
    class prototype (lowest cosine — the abundant-data regime of
    Sorscher et al. 2022, where easy examples are redundant),
    ``keep="easy"`` the closest (the scarce-data regime). Per-class,
    so no class is emptied by a global threshold.

    Returns (id, label, proto_cosine, keep_rank_frac) for the kept
    rows; NULL-score rows (NULL label/vector, zero norm) are dropped —
    a pruner must emit only rankable rows.

    ``approx=False``: exact ``percent_rank`` over (proto_cosine, id)
    per class — deterministic, oracle-checkable; costs a per-class
    sort. ``approx=True``: per-class ``approx_percentile`` cutoff
    broadcast back — one pass, no sort, rank-error-bounded; the
    ``keep_rank_frac`` column is NULL there (no exact rank exists)."""
    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    scored = prototype_scores(emb, id_col, vec_col, label_col).filter(
        F.col("proto_cosine").isNotNull()
    )
    if approx:
        q = keep_frac if keep == "hard" else 1.0 - keep_frac
        cuts = F.broadcast(
            scored.groupBy(label_col).agg(
                F.percentile_approx("proto_cosine", q).alias("__cut")
            )
        )
        pred = (
            F.col("proto_cosine") <= F.col("__cut")
            if keep == "hard"
            else F.col("proto_cosine") >= F.col("__cut")
        )
        return (
            scored.join(cuts, label_col)
            .filter(pred)
            .select(
                id_col,
                label_col,
                "proto_cosine",
                F.lit(None).cast("double").alias("keep_rank_frac"),
            )
        )
    from pyspark.sql import Window

    direction = (
        [F.col("proto_cosine").asc(), F.col(id_col).asc()]
        if keep == "hard"
        else [F.col("proto_cosine").desc(), F.col(id_col).asc()]
    )
    w = Window.partitionBy(label_col).orderBy(*direction)
    return (
        scored.withColumn(
            "keep_rank_frac", F.round(F.percent_rank().over(w), 9)
        )
        .filter(F.col("keep_rank_frac") <= keep_frac)
        .select(id_col, label_col, "proto_cosine", "keep_rank_frac")
    )
