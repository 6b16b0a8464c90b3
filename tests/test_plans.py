"""Plan-shape tests: lock the scale properties of headline queries.

These assert the PHYSICAL plan, not results — a regression here means a
query still returns the right rows but would fall over (or crawl) at
100 TB: a lost broadcast hint turns a dimension lookup into a fact-fact
shuffle; a lost pushdown makes a scan read everything.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from real_estate_bigdata_spark.plans import assert_plan, plan_stats

SF = "/root/testdata/sf0.01"
QUERIES = entry_mod.queries()


def test_q01_single_shuffle_with_pushdown(spark):
    # scan-filter-aggregate: one exchange (partial->final agg), filter
    # pushed into the parquet scan, zero joins, no Python
    assert_plan(
        QUERIES["q01_pricing_summary"](spark, SF),
        max_shuffles=1,
        min_scans_with_pushdown=1,
        forbid_python=True,
    )


def test_q03_broadcasts_dimensions(spark):
    # customer (filtered) and orders broadcast; lineitem never shuffles
    # for the join — only the final aggregate exchanges
    assert_plan(
        QUERIES["q03_shipping_priority"](spark, SF),
        min_broadcast_joins=2,
        max_sortmerge_joins=0,
        min_scans_with_pushdown=2,
    )


def test_q05_dimension_chain_broadcasts(spark):
    stats = assert_plan(
        QUERIES["q05_local_supplier_volume"](spark, SF),
        min_broadcast_joins=3,
        min_scans_with_pushdown=2,
    )
    # the only sort-merge-eligible joins are the fact-fact ones
    assert stats.sortmerge_joins <= 2, stats


def test_q06_scan_only_aggregate(spark):
    # all four predicates reach the scan; single global agg
    assert_plan(
        QUERIES["q06_forecast_revenue"](spark, SF),
        max_shuffles=1,
        min_scans_with_pushdown=1,
        forbid_python=True,
    )


def test_q18_having_prunes_before_join(spark):
    # the aggregate runs before the join; the join side is broadcast
    assert_plan(
        QUERIES["q18_large_orders"](spark, SF),
        min_broadcast_joins=1,
        max_sortmerge_joins=0,
    )


def test_asof_join_exactly_one_shuffle(spark):
    assert_plan(
        QUERIES["q_asof_view_purchase"](spark, SF),
        max_shuffles=1,
        max_sortmerge_joins=0,
        forbid_python=True,
    )


def test_exact_dedup_single_shuffle(spark):
    assert_plan(
        QUERIES["q_dedup_exact_docs"](spark, SF),
        max_shuffles=1,
        forbid_python=True,
    )


def test_gemm_neardup_is_python_but_bounded_shuffles(spark):
    # the blocked-GEMM variant is SUPPOSED to cross into Python (Arrow
    # applyInPandas); assert it does, and with a bounded shuffle count
    stats = plan_stats(QUERIES["q_dedup_embedding_gemm"](spark, SF))
    assert stats.python_stages >= 1, stats
    assert stats.shuffles <= 6, stats


def test_q07_q09_broadcast_dimensions(spark):
    for name, min_bc in (("q07_volume_shipping", 2), ("q09_product_profit", 2)):
        stats = assert_plan(
            QUERIES[name](spark, SF),
            min_broadcast_joins=min_bc,
            min_scans_with_pushdown=1,
        )
        # only the fact-fact join may sort-merge
        assert stats.sortmerge_joins <= 1, (name, stats)


def test_q22_scalar_subquery_broadcasts(spark):
    # the one-row average crosses as a broadcast, anti join stays shuffled
    assert_plan(
        QUERIES["q22_sales_opportunity"](spark, SF),
        min_broadcast_joins=1,
        min_scans_with_pushdown=1,
    )


def test_q11_scalar_threshold_broadcasts(spark):
    # nation->supplier chain broadcasts into the fact scan; ONE shuffle
    # aggregates per part; the global threshold binds as a broadcast
    # one-row cross join — never a sort-merge
    stats = assert_plan(
        QUERIES["q11_important_stock"](spark, SF),
        min_broadcast_joins=2,
        max_sortmerge_joins=0,
        min_scans_with_pushdown=1,
        forbid_python=True,
    )
    # part agg appears once per scalar-subquery branch (2) + the
    # one-row threshold rollup + final sort
    assert stats.shuffles <= 4, stats


def test_q20_semi_join_chain_broadcasts(spark):
    # part-name filter broadcasts as a semi join; the surviving pair
    # set broadcasts into supplier; nation broadcasts last — the only
    # shuffles are the two (partkey, suppkey) aggregates
    assert_plan(
        QUERIES["q20_potential_promotion"](spark, SF),
        min_broadcast_joins=3,
        max_sortmerge_joins=1,  # catalog ⋈ shipped share the agg key
        min_scans_with_pushdown=2,
        forbid_python=True,
    )


def test_minhash_pipeline_shuffle_budget(spark):
    # shingle postings + signature agg + banding self-join + verify joins:
    # bounded exchanges, no Python crossing anywhere in the pipeline
    assert_plan(
        QUERIES["q_dedup_minhash_lsh"](spark, SF),
        max_shuffles=10,
        forbid_python=True,
    )


def test_scalar_gallery_map_only(spark):
    assert_plan(
        QUERIES["q_scalar_gallery"](spark, SF),
        max_shuffles=0,
        min_scans_with_pushdown=1,
        forbid_python=True,
    )


def test_normalize_listings_no_shuffle_no_python(spark):
    # the whole normalization layer is a map-only projection
    assert_plan(
        QUERIES["q_normalize_listings"](spark, SF),
        max_shuffles=0,
        forbid_python=True,
    )


def test_pivot_two_stage_aggregate_no_discovery(spark):
    # enumerated pivot plans as pre-agg on (group, pivot) + pivot agg —
    # exactly two exchanges, no Python, and (the point of enumerating
    # values) no distinct-discovery job baked into the plan
    assert_plan(
        QUERIES["q_pivot_status"](spark, SF),
        max_shuffles=2,
        forbid_python=True,
    )


def test_groupingsets_single_expand_aggregate(spark):
    assert_plan(
        QUERIES["q_groupingsets_orders"](spark, SF),
        max_shuffles=1,
        forbid_python=True,
    )


def test_q12_one_fact_exchange_with_pushdown(spark):
    # shipdate window pushes into the lineitem scan; the orderkey join is
    # the only fact-sized structure (broadcast at this SF, shuffle at
    # scale); the conditional counts are one partial+final aggregate
    assert_plan(
        QUERIES["q12_priority_lines"](spark, SF),
        max_shuffles=2,
        min_scans_with_pushdown=2,
        forbid_python=True,
    )


def test_q16_broadcast_lookups_distinct_agg(spark):
    # supplier blacklist + pruned part both broadcast; the only
    # fact-sized exchanges belong to the two-phase distinct aggregate
    assert_plan(
        QUERIES["q16_supplier_variety"](spark, SF),
        max_shuffles=2,
        min_broadcast_joins=2,
        max_sortmerge_joins=0,
        min_scans_with_pushdown=3,
        forbid_python=True,
    )


def test_stats_profile_single_scan(spark):
    # fused distinct+stats profile: one scan, two-phase distinct agg
    assert_plan(
        QUERIES["q_stats_profile_orders"](spark, SF),
        max_shuffles=2,
        forbid_python=True,
    )


def test_window_frames_two_exchanges_one_scan(spark):
    # two window specs over different keys = exactly two exchanges over
    # a single scan (vs two scans as separate queries)
    stats = assert_plan(
        QUERIES["q_window_frames"](spark, SF),
        max_shuffles=2,
        forbid_python=True,
    )
    assert stats.scans == 1, stats


def test_curate_corpus_shuffle_budget_no_python(spark):
    # curation composite = fingerprint window + banded LSH + anti join +
    # map-only floor; the whole program stays inside a bounded shuffle
    # budget with zero Python stages and no all-pairs structure
    stats = assert_plan(
        QUERIES["q_curate_corpus"](spark, SF),
        max_shuffles=10,
        forbid_python=True,
    )
    assert stats.sortmerge_joins <= 2, stats


def test_hash_split_map_only(spark):
    # deterministic split assignment is a pure projection — no shuffle,
    # no Python, bucket filter computable at the scan
    assert_plan(
        QUERIES["q_hash_split"](spark, SF),
        max_shuffles=0,
        forbid_python=True,
    )


def test_pack_documents_single_window_shuffle(spark):
    # token packing = one window over the packing key
    assert_plan(
        QUERIES["q_pack_documents"](spark, SF),
        max_shuffles=1,
        forbid_python=True,
    )


def test_portable_simhash_no_python_bounded_shuffles(spark):
    # portable (md5) mode must stay codegen JVM expressions like the
    # xxhash64 path: explode->hash-agg signatures (1 shuffle), banded
    # self-join (2 exchanges for the join sides), pair distinct
    assert_plan(
        QUERIES["q_dedup_simhash"](spark, SF),
        max_shuffles=6,
        forbid_python=True,
    )


def test_quality_floor_broadcasts_cutoff(spark):
    # global quantile cutoff joins back as a broadcast scalar — the
    # corpus never shuffles for the threshold compare
    assert_plan(
        QUERIES["q_quality_floor"](spark, SF),
        min_broadcast_joins=1,
        max_sortmerge_joins=0,
        forbid_python=True,
    )


def test_mixture_balance_map_only_after_stratum_totals(spark):
    # per-stratum totals are a bounded driver-side collect; the applied
    # rebalance itself is a map-only scan (no shuffle of the corpus)
    assert_plan(
        QUERIES["q_mixture_balance"](spark, SF),
        max_shuffles=1,
        forbid_python=True,
    )


def test_decontaminate_broadcasts_benchmark(spark):
    # benchmark shingles are broadcast; the corpus-side flagging is
    # map-side (semi/anti against a broadcast build)
    assert_plan(
        QUERIES["q_decontaminate"](spark, SF),
        min_broadcast_joins=1,
        max_sortmerge_joins=0,
    )


def test_stratified_sample_map_only(spark):
    # CASE-threshold per stratum = pure projection + filter
    assert_plan(
        QUERIES["q_stratified_sample"](spark, SF),
        max_shuffles=0,
        forbid_python=True,
    )


def test_vocab_top_tokens_takeordered_not_global_sort(spark):
    # top-k must run as TakeOrderedAndProject (per-partition heap +
    # driver merge of k rows), never a full-corpus global Sort+Exchange;
    # the rank window then only sees the k survivors
    df = QUERIES["q_vocab_top_tokens"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    stats = assert_plan(df, forbid_python=True)
    assert stats.shuffles <= 4, stats


def test_unigram_logprob_no_python_bounded_shuffles(spark):
    # wordcount shuffle + token join + per-doc agg + doc-id join with
    # broadcast scalar total: everything codegen, no global sort
    assert_plan(
        QUERIES["q_unigram_logprob"](spark, SF),
        forbid_python=True,
        max_shuffles=8,
    )


def test_tfidf_no_python_bounded_shuffles(spark):
    # explode -> (doc,token) agg -> doc-len agg -> doc-freq agg -> two
    # joins + broadcast scalar N: all codegen, bounded shuffle budget
    assert_plan(
        QUERIES["q_tfidf"](spark, SF),
        forbid_python=True,
        max_shuffles=8,
    )


def test_chunk_documents_map_only(spark):
    # sentence chunking is a pure computed-array explode — no shuffle,
    # no Python
    assert_plan(
        QUERIES["q_chunk_documents"](spark, SF),
        max_shuffles=0,
        forbid_python=True,
    )


def test_cap_per_source_single_window_shuffle_no_python(spark):
    # one window = one exchange on the group key; the md5 bucketing is
    # pure codegen — no Python stage, no join
    assert_plan(
        QUERIES["q_cap_per_source"](spark, SF),
        max_shuffles=1,
        min_scans_with_pushdown=0,
        forbid_python=True,
    )


def test_remove_boilerplate_bounded_shuffles_no_python(spark):
    # explode -> fingerprint df-count -> anti join -> reassembly: the
    # line-payload moves in exactly one of the shuffles; everything is
    # codegen (no Python stage); the df-filtered boilerplate side joins
    # without a sort-merge (broadcast under AQE at any realistic
    # boilerplate cardinality)
    stats = assert_plan(
        QUERIES["q_remove_boilerplate"](spark, SF),
        max_shuffles=5,
        forbid_python=True,
    )
    assert stats.scans >= 1, stats


def test_ivf_neardup_one_list_shuffle_no_cartesian(spark):
    # multi-probe assignment (ArrowEvalPython) -> ONE exchange on the
    # probed-list key -> per-list FlatMapGroupsInPandas GEMM -> distinct;
    # never a cross join
    from real_estate_bigdata_spark.plans.audit import executed_plan_str

    df = QUERIES["q_dedup_embedding_ivf"](spark, SF)
    plan = executed_plan_str(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan
    stats = plan_stats(df)
    # one shuffle for the hot-list-split per-list counts (bounded by
    # list cardinality, broadcast back), one to group by (probed list,
    # sub-block pair), one for the pair distinct
    assert stats.shuffles <= 3, stats
    # the counts lookup must come back as a broadcast, never a shuffled
    # join on the assignment stream
    assert stats.broadcast_joins >= 1, stats


def test_r5_query_plans_stay_bounded(spark):
    """Plan budgets for the round-5 additions: no cartesian products, no
    Python in the pure-SQL paths, bounded shuffle counts."""
    from real_estate_bigdata_spark.plans.audit import executed_plan_str

    # bigram LM: map-side bigram build + two count aggregates + stream
    # joins + per-doc agg + final left join — JVM-only end to end
    stats = assert_plan(QUERIES["q_bigram_logprob"](spark, SF), forbid_python=True)
    assert stats.shuffles <= 7, stats

    # packed sequences: pack window + id join + chunk aggregate
    stats = assert_plan(QUERIES["q_pack_sequences"](spark, SF), forbid_python=True)
    assert stats.shuffles <= 5, stats

    # SemDeDup on the GEMM pair generator: block-pair applyInPandas,
    # never an all-pairs cartesian on the vector side; survivors via
    # anti join
    df = QUERIES["q_semantic_dedup"](spark, SF)
    plan = executed_plan_str(df)
    assert "CartesianProduct" not in plan


def test_neardup_store_plan_sig_only_payload_local(spark):
    """Incremental near-dup vs store: the novel-doc output's plan keys
    every wide op on band keys / signature rows / ids — the document
    payload itself is never a join or shuffle KEY (it rides along only
    in the final left_anti projection)."""
    from real_estate_bigdata_spark.operators.dedup import neardup_against_store
    from real_estate_bigdata_spark.plans import plan_stats
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store = spark.createDataFrame([], "doc_id long, sig array<bigint>")
    novel, _ = neardup_against_store(docs, store)
    stats = plan_stats(novel)
    # no Python anywhere: signatures are codegen aggregates
    assert stats.python_stages == 0, stats
    plan = novel._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(text" not in plan  # payload never a shuffle key


def test_export_shards_single_window_no_python(spark, tmp_path):
    """The export's manifest side: one window shuffle for positions +
    the bounded-key manifest aggregate; zero Python crossings."""
    from real_estate_bigdata_spark.operators.sampling import shuffle_shard
    from real_estate_bigdata_spark.plans import assert_plan
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # the exporter's internal frame: sharded + serialized line
    from pyspark.sql import functions as F

    staged = shuffle_shard(docs, 8).withColumn(
        "__line", F.to_json(F.struct("doc_id", "text"))
    )
    manifest_like = staged.groupBy("shard").count()
    assert_plan(manifest_like, max_shuffles=2, forbid_python=True)


def test_image_neardup_python_only_in_decode_stage(spark):
    """Image near-dup pairs: the eagerly localCheckpoint-ed signature
    table means the self-join's two references share ONE decode pass —
    the live plan reads the materialized checkpoint (Scan ExistingRDD),
    and the MapInPandas decode never appears as live lineage. (Was a
    persist pre-r6; localCheckpoint so repeated calls can't accumulate
    cached relations — blocks are GC-reclaimed with the DataFrame.)"""
    from real_estate_bigdata_spark.operators.multimodal import image_neardup_pairs

    df = spark.createDataFrame(
        [(1, bytearray(b"a")), (2, bytearray(b"b"))],
        "media_id long, content binary",
    )
    out = image_neardup_pairs(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the decode already ran (eager checkpoint at call time); the pair
    # plan must be pure-JVM over the materialized signature rows
    assert "MapInPandas" not in plan, plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan


def test_cross_corpus_pairs_vectorized_signature_kernel(spark):
    """r16: each side's MinHash signature is ONE vectorized Arrow-batch
    kernel (MapInPandas over the checkpointed shingle table — the
    64-lane min-aggregate cost ~1 s of driver planning per execution);
    row-at-a-time Python (BatchEvalPython) stays forbidden, and the
    banded join itself is still pure JVM downstream of the kernels."""
    from real_estate_bigdata_spark.operators.dedup import cross_corpus_lsh_pairs
    from real_estate_bigdata_spark.plans import plan_stats
    from real_estate_bigdata_spark.plans.audit import executed_plan_str
    from real_estate_bigdata_spark.schema import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    df = cross_corpus_lsh_pairs(a, b)
    stats = plan_stats(df)
    assert stats.python_stages == 2, stats  # one kernel per side, no more
    assert "BatchEvalPython" not in executed_plan_str(df)
