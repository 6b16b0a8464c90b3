"""Benchmark decontamination: flag / remove training documents that
share word-n-gram shingles with an evaluation (benchmark) set.

This is the standard contamination check for LLM training corpora
(long-n-gram overlap against held-out eval data; n=8..13 in published
pipelines — the corpus is dirty if a training doc reproduces any long
n-gram of a benchmark item). The reference repo has no analogue; this
is a north-star training-pipeline operator like the dedup family
(reference scope: `map_reduce/mapper.py` + `kafka_cc/` cover only
crawl/count semantics).

Scale posture (100 TB corpus, MB-scale benchmark): the benchmark's
distinct shingle set is tiny by construction — eval suites are a few
thousand items — so it is BROADCAST and contamination flagging is a
map-side hash-semi-join fused into the corpus scan; the only shuffle
is the per-doc hit-count aggregate (map-side partials, key = doc id).
Nothing in the plan is proportional to corpus x benchmark.

Shingles reuse the hashed-n-gram machinery from the dedup family
(`functions.text.hashed_ngrams_from_token_hashes`): 64-bit rolling
xxhash64 ids, no n-gram strings materialized. Hash equality matches
string-n-gram equality up to xxhash64 collisions (~|corpus shingles| x
|bench shingles| x 2^-64 — immaterial), so hit counts match the string
formulation the DuckDB oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hashed_shingles, _rewrite_minus_windows

__all__ = [
    "benchmark_shingles",
    "contamination_report",
    "decontaminate",
    "redact_contaminated_spans",
    "semantic_contamination_report",
    "semantic_decontaminate",
]


def benchmark_shingles(
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Distinct hashed n-gram shingle ids of the whole benchmark —
    one column ``g``. Globally distinct (one small shuffle on the
    shingle id) so the broadcast build side is minimal; reusable
    across many corpus scans (persist it when decontaminating
    several corpora against the same eval suite)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    hsh = _hashed_shingles(benchmark, n, id_col=text_col, text_col=text_col)
    return hsh.select(F.explode("hs").alias("g")).distinct()


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hits) for every corpus doc sharing >= 1 distinct n-gram
    shingle with the benchmark; n_hits = |doc's distinct shingles ∩
    benchmark shingles|. Docs shorter than ``n`` tokens or with NULL
    text produce no shingles and are never reported.

    Plan: corpus shingles explode -> map-side inner join against the
    broadcast benchmark set -> one hash aggregate on the doc id.
    """
    bench = benchmark_shingles(benchmark, n=n, text_col=text_col)
    corp = _hashed_shingles(corpus, n, id_col=id_col, text_col=text_col)
    hits = corp.select(F.col(id_col), F.explode("hs").alias("g")).join(
        F.broadcast(bench), "g"
    )
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus rows (full original schema) whose benchmark overlap is
    below ``min_overlap`` shared shingles — the cleaned training set.

    The contaminated-id side of the anti-join is left to AQE: it is
    usually tiny (broadcast), but a pathologically dirty corpus can
    make it arbitrarily large, so no broadcast is forced.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    dirty = (
        contamination_report(corpus, benchmark, n=n, id_col=id_col, text_col=text_col)
        .filter(F.col("n_hits") >= min_overlap)
        .select(id_col)
    )
    return corpus.join(dirty, id_col, "left_anti")


def redact_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surgical decontamination: instead of dropping a contaminated doc
    wholesale (:func:`decontaminate`), remove exactly the tokens covered
    by a benchmark-matching ``n``-gram window and keep the rest — the
    span-level policy for corpora too valuable to discard (a long book
    quoting one benchmark item keeps its other 99.9%).

    Output: the full corpus schema with ``text_col`` rewritten plus
    ``n_redacted`` (count of matching windows; 0 for clean docs). Clean
    docs keep their text BYTE-IDENTICAL; redacted docs are rebuilt as
    the surviving tokens joined by single spaces (whitespace normalizes
    — unavoidable once tokens are removed). NULL text stays NULL. A doc
    whose every token is covered comes back with empty text (the row
    survives for accounting, matching ``remove_boilerplate_lines``).

    Plan shape: positional hashed n-grams are built map-side (the same
    rolling-xxhash64 combine as ``contamination_report`` — hash
    equality matches string equality up to immaterial collisions);
    match starts come from a map-side join against the BROADCAST
    benchmark shingle set; the only shuffle carries (id, start) pairs
    for DIRTY docs (contamination-rate sized, never the corpus); the
    rewrite itself is a map-side array filter after AQE broadcasts the
    dirty-doc span table back. The text payload never shuffles.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench = benchmark_shingles(benchmark, n=n, text_col=text_col)
    # distinct=False keeps the gram array POSITIONAL (index == start
    # token); _hashed_shingles projects the token-hash array before the
    # n-wise combine subscripts it — inlining the transform here would
    # re-evaluate it per subscript (the helper's documented contract)
    grams = _hashed_shingles(
        corpus, n, id_col=id_col, text_col=text_col, distinct=False
    ).select(
        F.col(id_col), F.posexplode("hs").alias("__start", "g")
    )
    spans = (
        grams.join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(F.collect_set("__start").alias("__starts"))
    )
    return _rewrite_minus_windows(corpus, spans, n, id_col, text_col)


def semantic_contamination_report(
    corpus_emb: DataFrame,
    benchmark_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SEMANTIC complement of :func:`contamination_report`: corpus
    documents whose EMBEDDING sits within ``threshold`` cosine of any
    benchmark item's embedding — paraphrased or translated benchmark
    leakage that shares no long n-gram with the eval set and therefore
    sails through the lexical check (the published contamination
    studies run both; each catches what the other misses).

    Output: (``id_col``, n_matches, max_cosine) for every corpus doc
    with >= 1 benchmark match at round-6 cosine >= threshold. NULL
    vectors on either side can't be scored and never match.

    Scale posture mirrors the lexical operator's: the benchmark side is
    tiny by construction (eval suites are a few thousand items) and is
    BROADCAST with norms precomputed; scoring is a map-side pass fused
    into the corpus scan — the corpus embeddings never shuffle, and the
    only aggregate shuffles (id, cosine) rows for MATCHING docs
    (contamination-rate sized). Nothing is proportional to
    corpus x benchmark beyond the map-side flops, which is the
    brute-force-ANN trade every broadcast scorer in this engine makes
    (``similarity.brute_force_topk``); a benchmark too large to
    broadcast belongs in ``dedup.cross_corpus_lsh_pairs``' banded
    regime instead.
    """
    from real_estate_bigdata_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )
    from real_estate_bigdata_spark.util import ensure_min_parallelism

    if not (-1.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (-1, 1], got {threshold}")
    bench = (
        benchmark_emb.select(F.col(vec_col).cast("array<double>").alias("__bv"))
        .filter(F.col("__bv").isNotNull())
        .withColumn("__bn", l2_norm(F.col("__bv")))
    )
    # the map-side scoring pass runs at the SCAN's partition count until
    # the aggregate — a single-file corpus would pin |corpus|x|bench|
    # cosine folds to one core
    corp = (
        ensure_min_parallelism(corpus_emb)
        .select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv")
        )
        .filter(F.col("__cv").isNotNull())
        .withColumn("__cn", l2_norm(F.col("__cv")))
    )
    scored = (
        corp.crossJoin(F.broadcast(bench))
        .select(
            F.col(id_col),
            cosine_from_norms(
                F.col("__cv"), F.col("__bv"), F.col("__cn"), F.col("__bn")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max("cosine").alias("max_cosine"),
    )


def semantic_decontaminate(
    corpus_emb: DataFrame,
    benchmark_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus rows (full original schema) with no benchmark embedding
    within ``threshold`` cosine — the semantically-cleaned training
    set. Same anti-join shape as :func:`decontaminate`; the
    contaminated-id side is contamination-rate sized and left to AQE."""
    dirty = semantic_contamination_report(
        corpus_emb,
        benchmark_emb,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
    ).select(id_col)
    return corpus_emb.join(dirty, id_col, "left_anti")
