"""Classifier / quality-score evaluation over scored corpora.

Once a curation signal exists — the closed-form linear probe
(``operators.linear_probe``), a Gopher/C4 rule battery, a bigram LM
score — the pipeline needs to MEASURE it before trusting it with 100 TB
of keep/drop decisions. These are the standard evaluation statistics
(AUC, calibration, confusion, precision@k), each expressed as a
distributed aggregation so no corpus-sized state ever concentrates:

* ``auc_score`` — exact ROC-AUC via the Mann-Whitney rank statistic
  with the standard tie correction (ties contribute 1/2; Hanley &
  McNeil 1982). Distributed shape: ``groupBy(score)`` collapses the
  corpus to its DISTINCT scores map-side (one shuffle, output bounded
  by score cardinality — scores here are rounded columns, so the
  collapsed frame is tiny relative to the corpus), then one ordered
  window over that collapsed frame accumulates the negative mass below
  each score. The single-partition window runs over distinct scores,
  never rows.
* ``calibration_bins`` — reliability-diagram bins (mean score vs
  empirical positive rate per fixed-width bin). Pure groupBy.
* ``confusion_at_threshold`` — tp/fp/tn/fn + accuracy/precision/
  recall/F1 in ONE full-corpus aggregate (map-side partial, no
  intermediate frame).
* ``precision_at_k`` — precision among the global top-k by score with
  a deterministic id tiebreak (TakeOrderedAndProject plan: per-
  partition heaps, driver merges k rows, never a global sort).

The reference has no evaluation surface (north-star ABSENT category);
semantics follow the standard definitions, and every op here is
ANSI-SQL-expressible, so the driver queries carry full DuckDB oracles.
All outputs round to 6 decimals for hash-stable oracle comparison.

Null contract: rows with a NULL score or NULL label are excluded from
every statistic (an unscored row is unmeasured, never counted as
wrong); labels are cast to double and expected to be 0/1 indicators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "auc_score",
    "calibration_bins",
    "confusion_at_threshold",
    "precision_at_k",
]


def _scored(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Non-null (score, label) rows with the label as a 0/1 double."""
    return df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("double").alias("__y"),
    )


def auc_score(
    df: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """Exact ROC-AUC -> one row ``(auc, n_pos, n_neg)``.

    Mann-Whitney form: AUC = P(s_pos > s_neg) + 0.5 * P(s_pos = s_neg),
    computed from the distinct-score histogram — for each distinct
    score, its positives are "above" every negative with a strictly
    smaller score and tie with the negatives at the same score:

        AUC = sum_s pos(s) * (cum_neg_below(s) + neg(s)/2) / (P * N)

    ``auc`` is NULL when either class is empty (undefined, not 0.5 —
    the caller must see a degenerate evaluation set, not a plausible
    number). Rounded to 6 decimals.
    """
    hist = (
        _scored(df, score_col, label_col)
        .groupBy("__s")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(1 - F.col("__y")).alias("neg"),
        )
    )
    below = (
        Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = hist.select(
        F.col("pos"),
        F.col("neg"),
        (
            F.col("pos")
            * (
                F.coalesce(F.sum("neg").over(below), F.lit(0.0))
                + F.col("neg") / 2.0
            )
        ).alias("c"),
    )
    return contrib.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum("c").alias("__num"),
    ).select(
        F.round(
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.col("__num") / (F.col("n_pos") * F.col("n_neg")),
            ),
            6,
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins -> ``(bin, n, mean_score, frac_pos)``.

    Fixed-width bins over ``[lo, hi)`` with out-of-range scores CLAMPED
    into the edge bins (a probe score slightly past the design range
    must still be measured, not dropped). ``lo``/``hi`` are explicit
    literals, not a data pass — the bin edges of an evaluation are part
    of its definition and must not drift with the corpus. One groupBy,
    output bounded by ``bins``.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    raw = F.floor((F.col("__s") - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins))
    clamped = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
    return (
        _scored(df, score_col, label_col)
        .groupBy(clamped.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__s"), 6).alias("mean_score"),
            F.round(F.avg("__y"), 6).alias("frac_pos"),
        )
    )


def confusion_at_threshold(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
) -> DataFrame:
    """Confusion counts and derived rates at ``score >= threshold`` ->
    one row ``(tp, fp, tn, fn, accuracy, precision, recall, f1)``.

    One full-corpus aggregate (conditional sums combine map-side); the
    derived rates are NULL — never 0 — when their denominator is zero,
    so a degenerate split is visible. Rounded to 6 decimals.
    """
    pred = (F.col("__s") >= F.lit(threshold)).cast("double")
    y = F.col("__y")

    def _rate(num, den):
        return F.round(F.when(den > 0, num / den), 6)

    base = _scored(df, score_col, label_col).agg(
        F.sum(pred * y).cast("long").alias("tp"),
        F.sum(pred * (1 - y)).cast("long").alias("fp"),
        F.sum((1 - pred) * (1 - y)).cast("long").alias("tn"),
        F.sum((1 - pred) * y).cast("long").alias("fn"),
    )
    tp, fp, tn, fn = (F.col(c) for c in ("tp", "fp", "tn", "fn"))
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    return base.select(
        "tp",
        "fp",
        "tn",
        "fn",
        _rate(tp + tn, tp + fp + tn + fn).alias("accuracy"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)), 6
        ).alias("f1"),
    )


def precision_at_k(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "id",
    k: int = 100,
) -> DataFrame:
    """Precision among the global top-k by score -> one row
    ``(k, n_pos, precision_at_k)``.

    Ties at the k-th score are broken by ascending ``id_col`` so the
    cut is DETERMINISTIC (an oracle-comparable top-k cannot depend on
    partition order). The orderBy+limit pins Spark's
    TakeOrderedAndProject: per-partition heaps of k rows, driver merge
    of partition-count * k — no global sort at any scale. ``k`` in the
    output is the REQUESTED k; ``precision_at_k`` divides by the rows
    actually taken (fewer when the scored corpus is smaller than k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    top = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(
            F.col(label_col).cast("double").alias("__y"),
            F.col(score_col).cast("double").alias("__s"),
            F.col(id_col).alias("__id"),
        )
        .orderBy(F.col("__s").desc(), F.col("__id").asc())
        .limit(k)
    )
    return top.agg(
        F.lit(k).alias("k"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.round(F.sum("__y") / F.count(F.lit(1)), 6).alias("precision_at_k"),
    )
