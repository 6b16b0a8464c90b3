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
    "bloom_contamination_report",
    "bloom_decontaminate",
    "build_shingle_bloom",
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


#: bits per bloom word — 32 (not 64) so the mask `1 << (pos & 31)`
#: never touches a BIGINT's sign bit: DuckDB raises on `1::BIGINT <<
#: 63`, and the oracle must build the identical bit pattern
_BLOOM_WORD_BITS = 32

#: literal mask table (1 << b for b in 0..31) — Spark's shiftleft only
#: takes a CONSTANT shift, so the per-row bit mask is an element_at
#: against this 32-entry literal instead
def _bloom_mask(bit_col) -> F.Column:
    return F.element_at(
        F.lit([1 << b for b in range(_BLOOM_WORD_BITS)]),
        (bit_col + F.lit(1)).cast("int"),
    )


def _bloom_probe_positions(h, m_bits: int, k: int) -> list:
    """The k probe positions of a 64-bit shingle hash ``h`` in an
    ``m_bits``-bit filter: classic double hashing ``(h1 + i*h2) % m``
    with ``h1 = h % m`` and ``h2 = ((h >> log2(m)) % m) | 1`` (odd, so
    the probe stride is coprime with the power-of-two ``m``). Every
    operation is overflow-free (both operands < 2^constant) and has an
    identical DuckDB spelling, so a portable-hash bloom is
    bit-reproducible by the oracle."""
    shift = m_bits.bit_length() - 1
    m = F.lit(m_bits)
    h1 = F.pmod(h, m)
    h2 = F.pmod(F.shiftright(h, shift), m).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(k)]


def _validate_bloom_params(m_bits: int, k: int) -> None:
    if m_bits < _BLOOM_WORD_BITS or m_bits & (m_bits - 1):
        raise ValueError(
            f"m_bits must be a power of two >= {_BLOOM_WORD_BITS}, "
            f"got {m_bits}"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def build_shingle_bloom(
    benchmark: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 6,
    text_col: str = "text",
    portable: bool = False,
) -> list[int]:
    """Bloom filter over the benchmark's distinct n-gram shingles, as a
    dense ``m_bits / 32`` list of word values — the MEMORY-BOUNDED
    build side for :func:`bloom_contamination_report`.

    Why a bloom when :func:`contamination_report` already broadcasts
    the exact shingle set: the exact set grows with the benchmark
    (8-gram ids × suite size — a large eval battery plus its
    paraphrase expansions reaches GBs), while the bloom is a FIXED
    ``m_bits / 8`` bytes regardless (2^18 bits = 32 KB) at a
    controlled false-positive rate ``(1 - e^(-k·n/m))^k``. The filter
    guarantees ZERO false negatives — no contaminated document
    escapes — so it is the screen stage; route its (tiny) positive set
    through the exact join when false-positive losses matter.

    Build is distributed: shingles explode to k probe positions, one
    bounded ``groupBy(word)`` OR-reduces the masks (bit-OR is
    order-independent, so the filter is deterministic across
    partitionings), and only ``m_bits / 32`` words come back to the
    driver (the bounded-snapshot shape centroids use).
    ``portable=True`` derives probes from the md5-prefix shingle hash
    so DuckDB reproduces the filter bit-for-bit — FULL-oracle
    verifiable, unlike any sketch built on engine-private hashing.
    """
    _validate_bloom_params(m_bits, k)
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench = _hashed_shingles(
        benchmark, n, id_col=text_col, text_col=text_col, portable=portable
    )
    pos = bench.select(F.explode("hs").alias("g")).distinct().select(
        F.explode(
            F.array(*_bloom_probe_positions(F.col("g"), m_bits, k))
        ).alias("p")
    )
    words = (
        pos.select(
            F.shiftright(F.col("p"), 5).alias("w"),
            _bloom_mask(F.col("p").bitwiseAND(F.lit(31))).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    arr = [0] * (m_bits // _BLOOM_WORD_BITS)
    for r in words:
        arr[r["w"]] = r["bits"]
    return arr


def bloom_contamination_report(
    corpus: DataFrame,
    bloom: list[int],
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(id, n_hits) for every corpus doc with >= 1 BLOOM-POSITIVE
    distinct shingle — the map-only screen twin of
    :func:`contamination_report`: the whole test is a Column
    expression over the shingle array against the bloom word table
    bound as a SINGLE broadcast row, so the corpus pass has NO shuffle
    join — the only join in the plan is the one-row broadcast bind of
    the word table (``tests/test_decontamination.py`` pins exactly one
    broadcast join and ZERO shuffles) — NO explode, and no doc-id
    aggregate (hits are counted inside the row).

    Superset contract: ``n_hits`` here >= the exact report's for every
    doc (no false negatives, by bloom construction); the overcount is
    the false-positive rate. ``m_bits``/``k``/``portable`` MUST match
    the build call."""
    _validate_bloom_params(m_bits, k)
    if len(bloom) != m_bits // _BLOOM_WORD_BITS:
        raise ValueError(
            f"bloom has {len(bloom)} words, expected "
            f"{m_bits // _BLOOM_WORD_BITS} for m_bits={m_bits}"
        )
    # bind the word table ONCE as a broadcast single-row attribute —
    # inlining it as a literal puts k copies of an m/32-element
    # CreateArray in the row expression, which measured ~10x slower
    # (the giant array was rebuilt per row instead of referenced)
    words_df = corpus.sparkSession.createDataFrame(
        [(bloom,)], "__bloom array<bigint>"
    )
    words = F.col("__bloom")

    def positive(g):
        cond = None
        for p in _bloom_probe_positions(g, m_bits, k):
            bit = F.element_at(
                words, (F.shiftright(p, 5) + F.lit(1)).cast("int")
            ).bitwiseAND(_bloom_mask(p.bitwiseAND(F.lit(31)))) != F.lit(0)
            cond = bit if cond is None else (cond & bit)
        return cond

    corp = _hashed_shingles(
        corpus, n, id_col=id_col, text_col=text_col, portable=portable
    )
    return (
        corp.crossJoin(F.broadcast(words_df))
        .select(
            F.col(id_col),
            F.size(F.filter("hs", positive)).cast("long").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    m_bits: int = 1 << 18,
    k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Corpus rows whose BLOOM overlap with the benchmark is below
    ``min_overlap`` — the conservative screen: everything the exact
    :func:`decontaminate` would drop is dropped (zero false
    negatives), plus a controlled false-positive sliver. Use when the
    benchmark's exact shingle set is too large to broadcast; when the
    sliver matters, verify only the flagged docs with the exact join
    (they are contamination-sized, not corpus-sized)."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    bloom = build_shingle_bloom(
        benchmark, n=n, m_bits=m_bits, k=k, text_col=text_col,
        portable=portable,
    )
    dirty = (
        bloom_contamination_report(
            corpus, bloom, n=n, m_bits=m_bits, k=k, id_col=id_col,
            text_col=text_col, portable=portable,
        )
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
