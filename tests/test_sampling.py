"""Deterministic sampling / split / packing semantics — properties the
oracle sweep can't express: partition independence, nesting, ratio
bounds, chunk-size bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import sampling as sp
from real_estate_bigdata_spark.schema import load_table

SF = "/root/testdata/sf0.01"


def test_hash_sample_deterministic_and_nested(spark):
    docs = load_table(spark, SF, "documents")
    s20 = {r.doc_id for r in sp.hash_sample(docs, 0.2).select("doc_id").collect()}
    s20_again = {r.doc_id for r in sp.hash_sample(docs, 0.2).select("doc_id").collect()}
    s50 = {r.doc_id for r in sp.hash_sample(docs, 0.5).select("doc_id").collect()}
    assert s20 == s20_again
    assert s20 <= s50  # fractions nest: growing a sample keeps prior rows
    n = docs.count()
    assert abs(len(s20) / n - 0.2) < 0.1
    # a different salt draws an independent sample
    salted = {r.doc_id for r in sp.hash_sample(docs, 0.2, salt="exp2").select("doc_id").collect()}
    assert salted != s20


def test_hash_sample_partition_independent(spark):
    rows = [(i,) for i in range(1000)]
    a = spark.createDataFrame(rows, "doc_id long").repartition(2)
    b = spark.createDataFrame(rows, "doc_id long").repartition(13)
    sa = {r.doc_id for r in sp.hash_sample(a, 0.3).collect()}
    sb = {r.doc_id for r in sp.hash_sample(b, 0.3).collect()}
    assert sa == sb


def test_hash_split_disjoint_exhaustive_ratios(spark):
    docs = load_table(spark, SF, "documents")
    out = sp.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n  # exhaustive, disjoint by construction
    assert abs(counts["train"] / n - 0.8) < 0.08
    with pytest.raises(ValueError):
        sp.hash_split(docs, {})
    with pytest.raises(ValueError):
        sp.hash_split(docs, {"a": -1.0, "b": 2.0})


def test_stratified_sample_per_stratum_fractions(spark):
    docs = load_table(spark, SF, "documents")
    fr = {"en": 0.1, "fr": 1.0}
    out = sp.stratified_hash_sample(docs, fr, strata_col="lang")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # fr keeps everything, en ~10%, unlisted strata keep default 0
    assert counts.get("fr") == totals["fr"]
    assert 0 < counts.get("en", 0) < 0.3 * totals["en"]
    assert set(counts) == {"en", "fr"}
    # kept rows nest inside the stratum's plain hash_sample at the same
    # fraction (same bucket function, same salt)
    en_strat = {r.doc_id for r in out.filter(F.col("lang") == "en").select("doc_id").collect()}
    en_plain = {
        r.doc_id
        for r in sp.hash_sample(docs.filter(F.col("lang") == "en"), 0.1)
        .select("doc_id")
        .collect()
    }
    assert en_strat == en_plain


def test_stratified_sample_null_stratum_and_default(spark):
    rows = [(1, None), (2, "x"), (3, "en")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # default 1.0 keeps NULL/unlisted strata entirely; listed 0.0 drops
    out = sp.stratified_hash_sample(df, {"en": 0.0}, strata_col="lang", default_fraction=1.0)
    assert {r.doc_id for r in out.collect()} == {1, 2}
    with pytest.raises(ValueError):
        sp.stratified_hash_sample(df, {"en": 1.5})
    with pytest.raises(ValueError):
        sp.stratified_hash_sample(df, {"en": 0.5}, default_fraction=-0.1)


def test_stratified_sample_is_map_only(spark):
    from real_estate_bigdata_spark.plans import assert_plan

    docs = load_table(spark, SF, "documents")
    assert_plan(
        sp.stratified_hash_sample(docs, {"en": 0.1, "fr": 1.0}, strata_col="lang"),
        max_shuffles=0,
        forbid_python=True,
    )


def test_pack_documents_chunk_bounds(spark):
    rows = [(i, "s", 600) for i in range(10)]  # 10 x 600 tokens, budget 1000
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = sp.pack_documents(docs, token_budget=1000).collect()
    chunks = {}
    for r in out:
        chunks.setdefault(r.chunk_id, []).append(r.n_tokens)
    # every chunk's total stays under budget + one doc's length
    for cid, sizes in chunks.items():
        assert sum(sizes) <= 1000 + 600, (cid, sizes)
    # offsets cover the corpus: total tokens / budget chunks at least
    assert len(chunks) >= 6  # 6000 tokens / 1000


def test_pack_documents_oversized_doc_gets_own_slot(spark):
    rows = [(1, "s", 50), (2, "s", 5000), (3, "s", 50)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {r.doc_id: r.chunk_id for r in sp.pack_documents(docs, token_budget=1000).collect()}
    # the oversized doc is capped in the accumulator (cum: 50, 1050,
    # 1100): it advances exactly one chunk instead of pushing every
    # later doc 5 chunk_ids ahead
    assert out == {1: 0, 2: 1, 3: 1}


def test_pack_documents_null_tokens_excluded(spark):
    rows = [(1, "s", 10), (2, "s", None)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {r.doc_id for r in sp.pack_documents(docs, token_budget=100).collect()}
    assert got == {1}
    with pytest.raises(ValueError):
        sp.pack_documents(docs, token_budget=0)


def test_mixture_balance_equalizes_token_mass(spark):
    rows = (
        [(i, "big", 100) for i in range(400)]
        + [(1000 + i, "small", 100) for i in range(40)]
        + [(2000, None, 100), (2001, "big", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = sp.mixture_balance(df)
    kept = out.groupBy("source").agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
    got = {r.source: (r.t, r.n) for r in kept.collect()}
    # smallest stratum kept whole; NULL stratum dropped
    assert got["small"] == (4000, 40)
    assert None not in got
    # big stratum downsampled toward small's 4000-token mass (hash
    # sampling is exact-in-expectation; 10% of 400 keys lands near 40)
    assert 2000 <= got["big"][0] <= 6500
    # deterministic: same verdict on re-run and under repartitioning
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in sp.mixture_balance(df.repartition(13)).collect()}
    assert a == b


def test_mixture_balance_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, source string, n_tokens long")
    assert sp.mixture_balance(empty).count() == 0
    all_null = spark.createDataFrame(
        [(1, None, 5), (2, "s", None)], "doc_id long, source string, n_tokens long"
    )
    # only stratum 's' has rows but its total is NULL -> nothing kept
    assert sp.mixture_balance(all_null).count() == 0


def test_cap_per_group_caps_and_passes_small_groups(spark):
    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(5)]
    rows += [(2000, None), (2001, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sp.cap_per_group(df, max_rows=10)
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["big"] == 10          # over-cap group trimmed to the cap
    assert got["small"] == 5         # under-cap group passes whole
    assert got[None] == 2            # NULL group is its own group
    # content-deterministic: same survivors under any partitioning
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in sp.cap_per_group(df.repartition(17), max_rows=10).collect()}
    assert a == b
    # a different salt draws a different (but still deterministic) subset
    c = {r.doc_id for r in sp.cap_per_group(df, max_rows=10, salt="v2").collect()}
    assert c != a and len(c) == len(a)


def test_cap_per_group_quality_order_keeps_best(spark):
    rows = [(i, "s", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    out = sp.cap_per_group(df, max_rows=5, order_col="quality")
    assert sorted(r.doc_id for r in out.collect()) == [15, 16, 17, 18, 19]


def test_cap_per_group_prefilter_matches_exact(spark):
    docs = load_table(spark, SF, "documents")
    exact = {r.doc_id for r in sp.cap_per_group(docs, max_rows=15).collect()}
    fast = {
        r.doc_id
        for r in sp.cap_per_group(docs, max_rows=15, prefilter_counts=True).collect()
    }
    assert fast == exact
    assert len(exact) == 15 * 20  # 20 sources x 25 docs at sf0.01


def test_cap_per_group_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    with pytest.raises(ValueError):
        sp.cap_per_group(df, max_rows=0)


def test_hash_sample_weighted_per_row_probability(spark):
    rows = (
        [(i, 1.0) for i in range(100)]            # always kept
        + [(1000 + i, 0.0) for i in range(100)]   # never kept
        + [(2000 + i, 0.5) for i in range(400)]   # ~half kept
        + [(9000, None), (9001, 2.5), (9002, -1.0)]  # NULL drop; clamp
    )
    df = spark.createDataFrame(rows, "doc_id long, p double")
    out = sp.hash_sample_weighted(df, "p")
    kept = {r.doc_id for r in out.collect()}
    assert all(i in kept for i in range(100))
    assert not any(1000 + i in kept for i in range(100))
    mid = sum(1 for i in range(400) if 2000 + i in kept)
    assert 140 <= mid <= 260  # hash-Bernoulli around 200
    assert 9000 not in kept and 9001 in kept and 9002 not in kept
    # deterministic under repartitioning; salt draws a different epoch
    again = {r.doc_id for r in sp.hash_sample_weighted(df.repartition(11), "p").collect()}
    assert again == kept
    other = {r.doc_id for r in sp.hash_sample_weighted(df, "p", salt="ep2").collect()}
    assert other != kept


def test_hash_sample_weighted_map_only_plan(spark):
    from real_estate_bigdata_spark.plans import assert_plan

    docs = load_table(spark, SF, "documents")
    assert_plan(
        sp.hash_sample_weighted(docs, F.lit(0.3), key_col="doc_id"),
        max_shuffles=0,
        forbid_python=True,
    )


def test_cap_per_group_quality_prefilter_matches_exact(spark):
    # skewed synthetic corpus: one monster group with heavy ties, a tiny
    # under-cap group, mixed-NULL qualities, an all-NULL group, and a
    # group where NULL-quality rows MUST survive (fewer non-null rows
    # than the cap) — every case where an over-eager prefilter would
    # change the exact window's answer
    rows = [(i, "monster", float(i % 500)) for i in range(5000)]
    rows += [(10_000 + i, "tiny", float(i)) for i in range(3)]
    rows += [(20_000 + i, "mixed", None if i % 2 else float(i)) for i in range(40)]
    rows += [(30_000 + i, "allnull", None) for i in range(30)]
    rows += [(40_000 + i, "fewq", float(i) if i < 8 else None) for i in range(38)]
    df = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    exact = {
        r.doc_id for r in sp.cap_per_group(df, 12, order_col="quality").collect()
    }
    fast = {
        r.doc_id
        for r in sp.cap_per_group(
            df, 12, order_col="quality", prefilter_counts=True
        ).collect()
    }
    assert fast == exact
    # deterministic under any partitioning (the sketch may merge in any
    # order; the conservative cutoff keeps the exact result invariant)
    again = {
        r.doc_id
        for r in sp.cap_per_group(
            df.repartition(13), 12, order_col="quality", prefilter_counts=True
        ).collect()
    }
    assert again == exact


def test_quality_prefilter_shrinks_monster_group(spark):
    # the point of the mitigation: the sorted window partition for a
    # monster domain sees ~cap + 1-2% of the group, not the whole group
    rows = [(i, "m", float(i)) for i in range(20_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    pre = sp._quality_prefilter(df, 10, "source", "quality")
    n = pre.count()
    assert n < 20_000 * 0.05, f"prefilter kept {n} of 20000 rows"
    kept = {r.doc_id for r in pre.select("doc_id").collect()}
    winners = {19_999 - k for k in range(10)}  # top-10 by quality desc
    assert winners <= kept


def test_cap_per_group_quality_prefilter_plan(spark):
    from real_estate_bigdata_spark.plans import assert_plan, executed_plan_str

    docs = load_table(spark, SF, "documents").withColumn("q", F.length("text"))
    capped = sp.cap_per_group(docs, 15, order_col="q", prefilter_counts=True)
    # cutoffs broadcast (never a shuffled join on the fact side); the
    # whole prefilter stays JVM-side
    assert_plan(capped, min_broadcast_joins=1, forbid_python=True)
    plan = executed_plan_str(capped)
    assert "__qcut" in plan  # map-side cutoff filter feeds the window sort


def test_materialize_packed_order_and_budget(spark):
    rows = [
        (1, "s", "one two three", 3),
        (2, "s", "four five", 2),
        (3, "s", "six", 1),
        (4, "s", None, None),      # NULL tokens: excluded by the packer
        (5, "t", "alone", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_tokens long"
    )
    out = {
        (r.source, r.chunk_id): r
        for r in sp.materialize_packed(df, token_budget=5, separator=" | ").collect()
    }
    # cumsum in s: 3, 5, 6 -> docs 1,2 in chunk 0, doc 3 in chunk 1
    assert out[("s", 0)].text == "one two three | four five"
    assert out[("s", 0)].n_docs == 2 and out[("s", 0)].n_tokens == 5
    assert out[("s", 1)].text == "six"
    assert out[("t", 0)].text == "alone"
    assert ("s", 2) not in out and len(out) == 3
    # deterministic under repartitioning (collect_list order is not —
    # the sorted-struct reassembly is what's being pinned here)
    again = {
        (r.source, r.chunk_id): r.text
        for r in sp.materialize_packed(
            df.repartition(13), token_budget=5, separator=" | "
        ).collect()
    }
    assert again == {k: v.text for k, v in out.items()}


def test_shuffle_shard_is_a_permutation(spark):
    """Every input row appears exactly once; shards in range; per-shard
    positions are contiguous 1..|shard| — a valid sharded permutation."""
    from real_estate_bigdata_spark.operators.sampling import shuffle_shard

    docs = load_table(spark, SF, "documents").select("doc_id")
    out = shuffle_shard(docs, n_shards=8).collect()
    assert sorted(r.doc_id for r in out) == sorted(
        r.doc_id for r in docs.collect()
    )
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_shard_deterministic_and_salt_independent(spark):
    """Same (key, salt) -> identical layout on every run; a different
    salt draws a genuinely different permutation (epoch reshuffle)."""
    from real_estate_bigdata_spark.operators.sampling import shuffle_shard

    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {(r.doc_id): (r.shard, r.pos) for r in shuffle_shard(docs, 8).collect()}
    b = {(r.doc_id): (r.shard, r.pos) for r in shuffle_shard(docs, 8).collect()}
    assert a == b
    c = {
        (r.doc_id): (r.shard, r.pos)
        for r in shuffle_shard(docs, 8, salt="epoch1").collect()
    }
    assert a != c  # astronomically unlikely to collide if independent


def test_shuffle_shard_plan_single_exchange(spark):
    """Shard assignment is map-only; the only exchange is the window's
    hash partition on the shard id. No Python anywhere."""
    from real_estate_bigdata_spark.operators.sampling import shuffle_shard
    from real_estate_bigdata_spark.plans import assert_plan

    docs = load_table(spark, SF, "documents").select("doc_id")
    stats = assert_plan(
        shuffle_shard(docs, n_shards=16), forbid_python=True
    )
    assert stats.shuffles == 1, stats


def test_shuffle_shard_rejects_bad_n(spark):
    from real_estate_bigdata_spark.operators.sampling import shuffle_shard
    import pytest as _pytest

    docs = load_table(spark, SF, "documents")
    with _pytest.raises(ValueError):
        shuffle_shard(docs, 0)


def _mixture_df(spark):
    rows = (
        [(i, "big", 100) for i in range(400)]
        + [(1000 + i, "mid", 100) for i in range(120)]
        + [(2000 + i, "small", 100) for i in range(40)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def test_temperature_mixture_endpoints(spark):
    """alpha=0 reproduces mixture_balance exactly; alpha=1 keeps every
    row (natural proportions are a fixed point)."""
    df = _mixture_df(spark)
    flat = {r.doc_id for r in sp.temperature_mixture(df, alpha=0.0).collect()}
    bal = {r.doc_id for r in sp.mixture_balance(df).collect()}
    assert flat == bal
    assert sp.temperature_mixture(df, alpha=1.0).count() == df.count()


def test_temperature_mixture_monotone_in_alpha(spark):
    """Raising alpha can only keep MORE of every stratum: thresholds
    (T_min/T_s)**(1-alpha) rise with alpha, and hash-bucket filters are
    nested, so kept sets are supersets."""
    df = _mixture_df(spark)
    kept = [
        {r.doc_id for r in sp.temperature_mixture(df, alpha=a).collect()}
        for a in (0.0, 0.3, 0.5, 0.7, 1.0)
    ]
    for lo, hi in zip(kept, kept[1:]):
        assert lo <= hi
    # strictly more of the big stratum is kept at alpha=0.5 than 0.0
    assert len(kept[2]) > len(kept[0])


def test_temperature_mixture_rare_stratum_kept_whole(spark):
    """The smallest stratum's keep fraction is (T_min/T_min)**x = 1 for
    every alpha — rare data is never discarded."""
    df = _mixture_df(spark)
    out = sp.temperature_mixture(df, alpha=0.5)
    n_small = out.filter(F.col("source") == "small").count()
    assert n_small == 40


def test_temperature_mixture_deterministic_and_validates(spark):
    df = _mixture_df(spark)
    a = {r.doc_id for r in sp.temperature_mixture(df, alpha=0.5).collect()}
    b = {
        r.doc_id
        for r in sp.temperature_mixture(df.repartition(13), alpha=0.5).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        sp.temperature_mixture(df, alpha=1.5)
    empty = spark.createDataFrame([], "doc_id long, source string, n_tokens long")
    assert sp.temperature_mixture(empty, alpha=0.5).count() == 0


def mirror_waterfill(avail, weights, budget, max_epochs):
    """Iterative water-filling, independent of the sorted-prefix
    closed form the operator uses."""
    caps = {s: max_epochs * t for s, t in avail.items()}
    live = {s for s in avail if weights.get(s, 0) > 0}
    alloc = {s: 0.0 for s in avail}
    remaining = budget
    while live and remaining > 1e-12:
        wsum = sum(weights[s] for s in live)
        lam = remaining / wsum
        sat = [s for s in live if caps[s] <= lam * weights[s] + 1e-12]
        if not sat:
            for s in live:
                alloc[s] = lam * weights[s]
            remaining = 0.0
            break
        for s in sat:
            alloc[s] = caps[s]
            remaining -= caps[s]
            live.discard(s)
    return alloc


def test_allocate_token_budget_matches_iterative_mirror(spark):
    rows = []
    avail = {"a": 100, "b": 400, "c": 1000, "d": 50}
    did = 0
    for s, t in avail.items():
        # split each stratum's mass over a few rows
        for part in (t // 2, t - t // 2):
            rows.append((did, s, part))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    weights = {"a": 3.0, "b": 1.0, "c": 1.0, "d": 5.0}
    budget, epochs = 900.0, 2.0
    got = {
        r["source"]: r
        for r in sp.allocate_token_budget(
            df, budget, strata_col="source", mixture=weights,
            max_epochs=epochs,
        ).collect()
    }
    want = mirror_waterfill(avail, weights, budget, epochs)
    for s in avail:
        assert got[s]["allocated"] == pytest.approx(want[s], abs=1e-5), s
        assert got[s]["epochs"] == pytest.approx(
            want[s] / avail[s], abs=1e-5
        )
    # budget fully spent (capacity exceeds it)
    assert sum(r["allocated"] for r in got.values()) == pytest.approx(
        budget, abs=1e-4
    )
    # 'a' and 'd' are heavily weighted but tiny -> at their repeat cap
    assert got["a"]["saturated"] and got["d"]["saturated"]
    assert got["a"]["epochs"] == pytest.approx(epochs, abs=1e-6)


def test_allocate_token_budget_edges(spark):
    df = spark.createDataFrame(
        [(1, "x", 100), (2, "y", 300), (3, None, 50), (4, "z", None)],
        "doc_id long, source string, n_tokens long",
    )
    # budget above total capacity: everything saturates at max_epochs
    got = {
        r["source"]: r
        for r in sp.allocate_token_budget(df, 10_000.0, max_epochs=3.0).collect()
    }
    assert set(got) == {"x", "y"}  # NULL stratum/weight rows drop
    for s in ("x", "y"):
        assert got[s]["saturated"] and got[s]["epochs"] == 3.0
    # zero budget: plan exists, nothing allocated
    got0 = sp.allocate_token_budget(df, 0.0).collect()
    assert all(r["allocated"] == 0.0 and not r["saturated"] for r in got0)
    # stratum missing from an explicit mixture is excluded visibly
    gotm = {
        r["source"]: r
        for r in sp.allocate_token_budget(
            df, 100.0, mixture={"x": 1.0}
        ).collect()
    }
    assert gotm["y"]["weight"] == 0.0 and gotm["y"]["allocated"] == 0.0
    assert gotm["x"]["allocated"] == pytest.approx(100.0, abs=1e-6)
    with pytest.raises(ValueError):
        sp.allocate_token_budget(df, -1.0)
    with pytest.raises(ValueError):
        sp.allocate_token_budget(df, 1.0, max_epochs=0.0)
    with pytest.raises(ValueError):
        sp.allocate_token_budget(df, 1.0, mixture={"x": -2.0})


class TestBucketByLength:
    """r10 length-bucketed dynamic batching."""

    def test_matches_pure_python_mirror_exactly(self, spark):
        import hashlib

        rows = [(i, " ".join(["w"] * ((i * 7) % 120))) for i in range(80)]
        rows += [(1000, None), (1001, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from real_estate_bigdata_spark.operators.sampling import (
            bucket_by_length,
        )

        got = sorted(
            (r.doc_id, r.n_tokens, r.bucket, r.shard, r.batch_id)
            for r in bucket_by_length(
                df, boundaries=(30, 60, 90), batch_tokens=200, n_shards=4
            ).collect()
        )

        staged = []
        for i, t in rows:
            if t is None:
                continue
            n = 0 if t.strip() == "" else len(t.strip().split())
            b = sum(n >= x for x in (30, 60, 90))
            h = hashlib.md5(str(i).encode()).hexdigest()
            staged.append((b, int(h[:15], 16) % 4, h, i, n))
        want = []
        from collections import defaultdict

        groups = defaultdict(list)
        for b, sh, h, i, n in staged:
            groups[(b, sh)].append((h, i, n))
        for (b, sh), g in groups.items():
            cum = 0
            for h, i, n in sorted(g):
                want.append((i, n, b, sh, cum // 200))
                cum += n
        assert got == sorted(want)
        # empty text is 0 tokens and batches normally; NULL is excluded
        ids = {r[0] for r in got}
        assert 1001 in ids and 1000 not in ids

    def test_batch_fill_bound_and_determinism(self, spark):
        from real_estate_bigdata_spark.operators.sampling import (
            bucket_by_length,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = bucket_by_length(
            docs, boundaries=(30, 60, 90), batch_tokens=500, n_shards=4
        )
        again = bucket_by_length(
            docs, boundaries=(30, 60, 90), batch_tokens=500, n_shards=4
        )
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, again.collect())
        )
        sums = {
            (r.bucket, r.shard, r.batch_id): r.s
            for r in out.groupBy("bucket", "shard", "batch_id")
            .agg(F.sum("n_tokens").alias("s"))
            .collect()
        }
        longest = out.agg(F.max("n_tokens")).collect()[0][0]
        # closed-form overflow bound: batch total < batch_tokens + longest doc
        assert all(s < 500 + longest for s in sums.values())
        # a different salt re-deals the batches
        other = bucket_by_length(
            docs, boundaries=(30, 60, 90), batch_tokens=500, n_shards=4,
            salt="epoch2",
        )
        assert sorted(map(tuple, out.collect())) != sorted(
            map(tuple, other.collect())
        )

    def test_validates_params(self, spark):
        from real_estate_bigdata_spark.operators.sampling import (
            bucket_by_length,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        import pytest

        with pytest.raises(ValueError, match="boundaries"):
            bucket_by_length(df, boundaries=(10, 10)).collect()
        with pytest.raises(ValueError, match="boundaries"):
            bucket_by_length(df, boundaries=(0, 5)).collect()
        with pytest.raises(ValueError, match="batch_tokens"):
            bucket_by_length(df, batch_tokens=0).collect()
        with pytest.raises(ValueError, match="n_shards"):
            bucket_by_length(df, n_shards=0).collect()


class TestCurriculumPhases:
    """r11: scale-safe curriculum bucketing — weighted z-sum scoring,
    broadcast quantile cutoffs, map-side phases, no ordered window."""

    def test_equal_mass_and_monotone(self, spark):
        from real_estate_bigdata_spark.operators.sampling import (
            curriculum_phases,
        )

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "doc_id long, s double"
        )
        got = curriculum_phases(df, {"s": 1.0}, n_phases=4).collect()
        by_phase = {}
        for r in got:
            by_phase.setdefault(r.phase, []).append(r.difficulty)
        assert sorted(by_phase) == [1, 2, 3, 4]
        assert all(24 <= len(v) <= 26 for v in by_phase.values())
        # difficulty strictly increases with the signal; phases nest
        assert max(by_phase[1]) < min(by_phase[2])
        assert max(by_phase[3]) < min(by_phase[4])

    def test_zero_variance_and_null_signals(self, spark):
        from real_estate_bigdata_spark.operators.sampling import (
            curriculum_phases,
        )

        df = spark.createDataFrame(
            [(1, 5.0, 10.0), (2, 5.0, None), (3, 5.0, 30.0), (4, 5.0, 20.0)],
            "doc_id long, flat double, s double",
        )
        got = {
            r.doc_id: r
            for r in curriculum_phases(
                df, {"flat": 10.0, "s": 1.0}, n_phases=2
            ).collect()
        }
        # flat signal contributes 0 regardless of weight; NULL s
        # imputes to the mean (difficulty 0 for doc 2)
        assert got[2].difficulty == 0.0
        assert got[1].difficulty < got[2].difficulty < got[3].difficulty
        assert got[1].phase == 1 and got[3].phase == 2

    def test_weights_and_validation(self, spark):
        import pytest

        from real_estate_bigdata_spark.operators.sampling import (
            curriculum_phases,
        )

        df = spark.createDataFrame(
            [(1, 1.0, 100.0), (2, 2.0, 50.0)], "doc_id long, a double, b double"
        )
        # negative weight inverts a signal's direction
        got = {
            r.doc_id: r.difficulty
            for r in curriculum_phases(
                df, {"a": 1.0, "b": -1.0}, n_phases=2
            ).collect()
        }
        assert got[2] > got[1]
        with pytest.raises(ValueError, match="non-empty"):
            curriculum_phases(df, {}, n_phases=2)
        with pytest.raises(ValueError, match="n_phases"):
            curriculum_phases(df, {"a": 1.0}, n_phases=1)
        with pytest.raises(ValueError, match="not in df"):
            curriculum_phases(df, {"nope": 1.0})

    def test_plan_no_ordered_window_no_python(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan, plan_stats

        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["q_curriculum_phases"](
            spark, "/root/testdata/sf0.001"
        )
        st = assert_plan(df, forbid_python=True, min_scans_with_pushdown=0)
        # the two stat aggregates shuffle one row each; the corpus
        # itself never exchanges and NO Window/Sort appears
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "Sort " not in plan, plan[:2000]
        assert st.sortmerge_joins == 0


class TestTimeSplit:
    """r12: embargoed temporal split — boundary inclusivity, NULL
    contract, zero-embargo degeneration, validation, map-only plan."""

    def _df(self, spark):
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 1, 1)),          # train
            (2, dt.datetime(2024, 1, 9, 23, 59)),  # train (just before band)
            (3, dt.datetime(2024, 1, 10)),         # embargo start (inclusive)
            (4, dt.datetime(2024, 1, 11, 12)),     # embargo
            (5, dt.datetime(2024, 1, 12)),         # test (cutoff inclusive)
            (6, dt.datetime(2024, 2, 1)),          # test
            (7, None),                             # NULL -> NULL
        ]
        return spark.createDataFrame(rows, "id long, ts timestamp")

    def test_bands_and_boundaries(self, spark):
        from real_estate_bigdata_spark.operators.sampling import time_split

        got = {
            r.id: r.split
            for r in time_split(
                self._df(spark), "2024-01-12", embargo_seconds=2 * 86400
            ).collect()
        }
        assert got == {
            1: "train", 2: "train", 3: "embargo", 4: "embargo",
            5: "test", 6: "test", 7: None,
        }

    def test_zero_embargo_two_way(self, spark):
        from real_estate_bigdata_spark.operators.sampling import time_split

        got = {
            r.id: r.split
            for r in time_split(self._df(spark), "2024-01-12").collect()
        }
        assert "embargo" not in got.values()
        assert got[2] == "train" and got[5] == "test"

    def test_fractional_embargo_not_truncated(self, spark):
        """90-second embargo must really be 90 s (the make_interval
        fractional-hours lesson applies to any duration argument)."""
        import datetime as dt

        from real_estate_bigdata_spark.operators.sampling import time_split

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 11, 58, 29)),   # train (91 s out)
             (2, dt.datetime(2024, 1, 1, 11, 58, 31))],  # embargo (89 s)
            "id long, ts timestamp",
        )
        got = {
            r.id: r.split
            for r in time_split(
                df, "2024-01-01 12:00:00", embargo_seconds=90.0
            ).collect()
        }
        assert got == {1: "train", 2: "embargo"}

    def test_validation(self, spark):
        import pytest as _pytest

        from real_estate_bigdata_spark.operators.sampling import time_split

        df = self._df(spark)
        with _pytest.raises(ValueError, match="embargo_seconds"):
            time_split(df, "2024-01-12", embargo_seconds=-1)
        with _pytest.raises(ValueError, match="already exists"):
            time_split(df.withColumn("split", F.lit("x")), "2024-01-12")
        with _pytest.raises(ValueError, match="distinct"):
            time_split(df, "2024-01-12", train_label="x", test_label="x")

    def test_map_only_plan(self, spark):
        from real_estate_bigdata_spark.operators.sampling import time_split
        from real_estate_bigdata_spark.plans import assert_plan

        out = time_split(self._df(spark), "2024-01-12", embargo_seconds=3600)
        assert_plan(out, max_shuffles=0, forbid_python=True)
