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
