"""Corpus snapshot versioning: diff two corpus versions by content
fingerprint — the bookkeeping layer of an incremental curation
pipeline (which docs did the latest crawl add, drop, or rewrite, so
downstream dedup/decontamination/indexing only reprocesses the delta).

The reference has no analogue — its pipeline is append-only with no
delta tracking (`kafka_cc/consumer/kafka_to_hdfs_consumer.py:104`
drops each micro-batch as a new JSONL file, ``overwrite=False``;
SURVEY §2.1 S6/S8). This is north-star training-pipeline surface like the
dedup family: at 100 TB you cannot afford to re-curate the whole
corpus per crawl; you diff and reprocess the changed slice.

Scale posture: each side is projected to ``(id, fingerprint)`` BEFORE
the join — two bigints per row, never the payload — so the full outer
join shuffles a few GB per 100 TB of corpus. With both snapshots
stored bucketed by id (``sources.lake.write_bucketed``) even that
shuffle disappears. The fingerprint is the portable 60-bit md5 prefix
(``text_analysis.portable_fingerprint``) so DuckDB reproduces every
bit and the diff is fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_estate_bigdata_spark.util import ensure_min_parallelism

from .text_analysis import portable_fingerprint

__all__ = ["corpus_diff"]


def _fingerprints(
    df: DataFrame, id_col: str, compare_cols: list[str]
) -> DataFrame:
    """(id, __fp) content fingerprint over ``compare_cols`` — map-only.

    The pre-hash encoding is INJECTIVE: each column contributes a 0/1
    null marker plus a length-prefixed value (``1<len>:<value>``), so
    (NULL) differs from (''), and values can never alias across column
    boundaries (('a1','b') vs ('a','1b') — a plain marker+value concat
    collides there). Fingerprint equality therefore means per-column
    ``IS NOT DISTINCT FROM`` equality, up to md5 collisions
    (immaterial). Column order is significant and fixed by the caller.
    """
    parts = []
    for c in compare_cols:
        col = F.col(c).cast("string")
        parts.append(F.when(col.isNull(), F.lit("0")).otherwise(F.lit("1")))
        v = F.coalesce(col, F.lit(""))
        parts.append(F.concat(F.length(v).cast("string"), F.lit(":"), v))
    return ensure_min_parallelism(df).select(
        F.col(id_col),
        portable_fingerprint(F.concat_ws("", *parts)).alias("__fp"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(id, status) for every doc that differs between two snapshots:
    ``added`` (id only in ``new``), ``removed`` (id only in ``old``),
    ``changed`` (both, different fingerprint over ``compare_cols`` —
    default: every non-id column the two snapshots share, in ``new``'s
    column order). Unchanged docs are omitted, so the result is
    delta-sized — join it back to either snapshot to fetch payloads.

    Ids must be unique per snapshot (a snapshot is a keyed table; a
    duplicated id would cross-multiply in the join). NULL ids never
    match anything and surface as one ``added`` and one ``removed`` row
    (Spark's null-unsafe join semantics — same policy as every keyed
    operator here).
    """
    if compare_cols is None:
        old_cols = set(old.columns)
        compare_cols = [
            c for c in new.columns if c != id_col and c in old_cols
        ]
    if not compare_cols:
        raise ValueError("no comparable columns between snapshots")
    o = _fingerprints(old, id_col, compare_cols).withColumnRenamed("__fp", "__fp_old")
    n = _fingerprints(new, id_col, compare_cols).withColumnRenamed("__fp", "__fp_new")
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(id_col, "status")
    )
