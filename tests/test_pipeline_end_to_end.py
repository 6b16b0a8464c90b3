"""End-to-end training-corpus pipeline: the full curation chain every
operator family participates in, run as ONE composition over the
driver testdata —

    health gate -> line-level boilerplate removal -> near-dup cluster
    survivors -> quality floor -> per-domain cap -> leakage-safe split
    -> sequence packing

Each stage's output feeds the next; the assertions pin the chain's
joint invariants (monotone row counts, no survivor outside the
original corpus, split disjointness, pack budget) rather than
re-testing each operator in isolation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.clustering import (
    cluster_safe_split,
    near_dup_survivors,
)
from real_estate_bigdata_spark.operators.dedup import ngram_jaccard_pairs
from real_estate_bigdata_spark.operators.quality import (
    corpus_health_report,
    quantile_floor,
)
from real_estate_bigdata_spark.operators.sampling import (
    cap_per_group,
    pack_documents,
)
from real_estate_bigdata_spark.operators.text_analysis import (
    doc_quality_profile,
    remove_boilerplate_lines,
)
from real_estate_bigdata_spark.schema import load_table

SF = "/root/testdata/sf0.01"


def test_full_curation_chain(spark):
    docs = load_table(spark, SF, "documents")
    n0 = docs.count()

    # 0. gate: the corpus must be structurally sound before curating
    health = corpus_health_report(docs).first()
    assert health.n_dup_ids == 0 and health.n_null_text == 0

    # 1. boilerplate removal: row-preserving text transform
    clean = remove_boilerplate_lines(docs, max_docs=3).localCheckpoint(eager=True)
    assert clean.count() == n0

    # 2. near-dup cluster survivors (exact pair stream)
    pairs = ngram_jaccard_pairs(clean).localCheckpoint(eager=True)
    survivors = near_dup_survivors(clean, pairs).localCheckpoint(eager=True)
    n_surv = survivors.count()
    n_clustered_victims = (
        pairs.select(F.col("id_a").alias("x"))
        .unionAll(pairs.select(F.col("id_b").alias("x")))
        .distinct()
        .count()
    )
    assert n0 - n_clustered_victims <= n_surv < n0  # one survivor per cluster

    # 3. quality floor on token count (drop the bottom decile)
    with_tokens = survivors.join(
        doc_quality_profile(clean).select("doc_id", "n_tokens"), "doc_id"
    )
    floored = quantile_floor(with_tokens, "n_tokens", q=0.1).localCheckpoint(
        eager=True
    )
    n_floor = floored.count()
    assert 0.8 * n_surv <= n_floor <= 0.95 * n_surv

    # 4. per-domain cap
    capped = cap_per_group(floored, max_rows=20).localCheckpoint(eager=True)
    per_src = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 20 for r in per_src)

    # 5. leakage-safe split on the ORIGINAL pair stream (clusters that
    # survived as one doc still carry their cluster label)
    split = cluster_safe_split(
        capped, pairs, {"train": 0.9, "holdout": 0.1}
    ).localCheckpoint(eager=True)
    assert split.count() == capped.count()
    assert set(r.split for r in split.select("split").distinct().collect()) <= {
        "train",
        "holdout",
    }

    # 6. pack the train split into token-budget chunks
    train = split.filter(F.col("split") == "train")
    packed = pack_documents(train, token_budget=2000)
    assert packed.count() == train.filter(F.col("n_tokens").isNotNull()).count()
    # every doc of every chunk is a train-split survivor of the corpus
    packed_ids = {r.doc_id for r in packed.select("doc_id").collect()}
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    orig_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert packed_ids <= train_ids <= orig_ids
    # chunk ids are dense non-negative within each packing group
    chunk_stats = packed.groupBy("source").agg(
        F.min("chunk_id").alias("lo"), F.max("chunk_id").alias("hi"),
        F.countDistinct("chunk_id").alias("n"),
    )
    for r in chunk_stats.collect():
        assert r.lo == 0 and r.n == r.hi + 1
