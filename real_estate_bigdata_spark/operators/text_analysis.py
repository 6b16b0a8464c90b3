"""Document-level text analysis operators over the `documents` table:
quality profiling, token accounting, language ID, fingerprinting.

Composes ``functions.text`` into table-shaped outputs. Everything is a
map-only projection or a single-shuffle aggregate — the shapes that
scale to a 100 TB document lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_estate_bigdata_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    quality_metrics,
    token_count,
)

__all__ = ["doc_quality_profile", "token_accounting", "lang_id_report", "doc_fingerprints"]


def doc_quality_profile(docs: DataFrame) -> DataFrame:
    """Per-document quality features (map-only projection)."""
    m = quality_metrics(F.col("text"))
    return docs.select(
        "doc_id",
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["avg_token_len"].alias("avg_token_len"),
        m["punct_ratio"].alias("punct_ratio"),
        m["alpha_ratio"].alias("alpha_ratio"),
        m["stopword_ratio"].alias("stopword_ratio"),
        m["uniq_token_ratio"].alias("uniq_token_ratio"),
    )


def token_accounting(docs: DataFrame) -> DataFrame:
    """Corpus token budget per source: whitespace + BPE-ish counts.
    Partial aggregation makes the shuffle carry one row per source."""
    return (
        docs.select(
            "source",
            token_count(F.col("text")).alias("ws"),
            bpe_ish_token_count(F.col("text")).alias("bpe"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.round(F.avg("ws"), 6).alias("avg_ws_tokens"),
        )
    )


def lang_id_report(docs: DataFrame) -> DataFrame:
    """Predicted language per doc (stopword-argmax heuristic) alongside
    the labeled language — the confusion-matrix input."""
    return docs.select(
        "doc_id", "lang", lang_id(F.col("text")).alias("lang_pred")
    )


def portable_fingerprint(text: Column) -> Column:
    """60-bit content fingerprint from md5 — portable across engines
    (DuckDB: ``('0x' || substr(md5(x),1,15))::BIGINT``), used for
    oracle-checkable exact dedup. For Spark-only pipelines prefer
    ``functions.text.fingerprint64`` (xxhash64, cheaper)."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("bigint")


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """doc_id + whitespace-normalized portable fingerprint."""
    normalized = F.concat_ws(" ", F.split(F.trim(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id", portable_fingerprint(normalized).alias("fingerprint")
    )
