"""Seeded randomized invariant sweep over the round-4 operators: one
generated corpus (deterministic RNG — reproducible failures), many
invariants. Catches the edge shapes hand-written cases miss (empty
groups, all-duplicate groups, single-row strata) without Hypothesis'
per-example Spark-job cost.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.quality import (
    corpus_health_report,
    metric_histogram,
)
from real_estate_bigdata_spark.operators.sampling import cap_per_group
from real_estate_bigdata_spark.operators.text_analysis import (
    remove_boilerplate_lines,
)


def _random_corpus(spark, seed=20260814, n=400):
    rng = random.Random(seed)
    shared_lines = [f"shared line {i}" for i in range(5)]
    rows = []
    for i in range(n):
        group = f"g{rng.randrange(12)}"
        kind = rng.random()
        if kind < 0.05:
            text = None
        elif kind < 0.10:
            text = ""
        else:
            lines = [
                rng.choice(shared_lines) if rng.random() < 0.3
                else f"unique {i} {rng.randrange(10**9)}"
                for _ in range(rng.randrange(1, 6))
            ]
            text = "\n".join(lines)
        rows.append((i, group, text))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_cap_per_group_invariants_random(spark):
    df = _random_corpus(spark)
    for cap in (1, 7, 1000):
        out = cap_per_group(df, max_rows=cap)
        per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        orig = {r.source: r.n for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}
        for g, n in per.items():
            assert n == min(cap, orig[g]), (g, cap, n, orig[g])
        # survivors are a subset of the input, never duplicated
        assert out.count() == out.select("doc_id").distinct().count()
        # prefilter path must agree exactly
        fast = {r.doc_id for r in cap_per_group(df, max_rows=cap, prefilter_counts=True).collect()}
        assert fast == {r.doc_id for r in out.collect()}


def test_remove_boilerplate_invariants_random(spark):
    df = _random_corpus(spark)
    out = remove_boilerplate_lines(df, max_docs=2)
    got = {r.doc_id: r.text for r in out.collect()}
    orig = {r.doc_id: (r.source, r.text) for r in df.collect()}
    # row count preserved; NULL stays NULL; output lines are a
    # subsequence of input lines (order preserved, nothing invented)
    assert set(got) == set(orig)
    for did, text in got.items():
        src_text = orig[did][1]
        if src_text is None:
            assert text is None
            continue
        assert text is not None
        in_lines = src_text.split("\n")
        out_lines = text.split("\n") if text != "" else []
        it = iter(in_lines)
        assert all(any(line == cand for cand in it) for line in out_lines), did
    # the 30%-frequency shared lines must be gone from every doc
    joined = "\n".join(t for t in got.values() if t)
    assert "shared line" not in joined


def test_health_report_and_histogram_consistency_random(spark):
    df = _random_corpus(spark)
    r = corpus_health_report(df).first()
    assert r.n_rows == 400
    assert r.n_distinct_ids == 400 and r.n_dup_ids == 0
    # histogram over the same metric must conserve the non-NULL count
    hist = metric_histogram(df, F.length("text"), 0, 100, n_bins=7)
    assert sum(x.n for x in hist.collect()) == r.n_rows - r.n_null_text
    # ... at any bin granularity
    hist1 = metric_histogram(df, F.length("text"), 0, 100, n_bins=1)
    assert sum(x.n for x in hist1.collect()) == r.n_rows - r.n_null_text


def test_quality_ordered_cap_invariants_random(spark):
    """Round-5 prefilter sweep: the quality-ordered cap with the
    percentile prefilter must equal the unfiltered exact window for
    every cap, on a corpus with random qualities, NULLs, ties, and
    degenerate groups; the cutoff table must be conservative (never
    above the true cap-th best non-null quality of any group)."""
    from real_estate_bigdata_spark.operators.sampling import quality_cutoffs

    rng = random.Random(20260814)
    rows = []
    for i in range(400):
        group = f"g{rng.randrange(8)}"
        q = None if rng.random() < 0.2 else float(rng.randrange(20))  # heavy ties
        rows.append((i, group, q))
    df = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    by_group: dict[str, list[float]] = {}
    for i, g, q in rows:
        if q is not None:
            by_group.setdefault(g, []).append(q)
    for cap in (1, 5, 50, 1000):
        exact = {
            r.doc_id
            for r in cap_per_group(df, max_rows=cap, order_col="quality").collect()
        }
        fast = {
            r.doc_id
            for r in cap_per_group(
                df, max_rows=cap, order_col="quality", prefilter_counts=True
            ).collect()
        }
        assert fast == exact, cap
        cuts = {
            r["source"]: r["__qcut"]
            for r in quality_cutoffs(df, cap, "source", "quality").collect()
        }
        for g, cut in cuts.items():
            if cut is None:
                continue
            qs = sorted(by_group[g], reverse=True)
            kth_best = qs[min(cap, len(qs)) - 1]
            assert cut <= kth_best, (g, cap, cut, kth_best)


def test_semantic_dedup_invariants_random(spark):
    """Random unit vectors + planted duplicate clouds: survivors =
    corpus minus non-min members of each component, for any generator
    (exact == blocked-GEMM == IVF on this corpus size)."""
    import math

    rng = random.Random(7)
    rows = []
    for i in range(120):
        v = [rng.gauss(0, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        rows.append((i, [x / n for x in v]))
    # planted clouds: 3 groups of 5 near-identical vectors
    for g in range(3):
        base = [rng.gauss(0, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in base)) or 1.0
        base = [x / n for x in base]
        for j in range(5):
            rows.append((1000 + g * 10 + j, [x + rng.gauss(0, 1e-4) for x in base]))
    from real_estate_bigdata_spark.operators import dedup as dd

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = 0.95
    exact_pairs = dd.embedding_neardup_pairs(df, threshold=thr)
    kept_exact = {
        r.vec_id for r in dd.semantic_dedup(df, pairs=exact_pairs).collect()
    }
    # each planted cloud keeps exactly its min id
    for g in range(3):
        cloud = {1000 + g * 10 + j for j in range(5)}
        assert kept_exact & cloud == {min(cloud)}, g
    kept_gemm = {
        r.vec_id
        for r in dd.semantic_dedup(
            df,
            pairs=dd.embedding_neardup_pairs_blocked(df, thr, n_blocks=4),
        ).collect()
    }
    assert kept_gemm == kept_exact
    kept_ivf = {
        r.vec_id
        for r in dd.semantic_dedup(
            df, threshold=thr, n_lists=4, n_probe=2, max_list_rows=32
        ).collect()
    }
    # IVF is approximate: may MISS pairs (keep extra rows) but must never
    # invent one (drop a row the exact graph keeps)
    assert kept_ivf >= kept_exact


def test_redact_duplicate_spans_matches_python_reference_random(spark):
    """Full reference-implementation check on a random corpus: a pure-
    Python ExactSubstr redactor (gram -> first (id, start); redact all
    other starts; rebuild) must agree with the Spark operator EXACTLY —
    text and n_redacted, every doc."""
    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> dense collisions
    rows = []
    for i in range(120):
        k = rng.randrange(0, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k)) or ""))
    rows.append((900, None))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3

    # reference implementation
    toks = {
        i: (t.split() if t is not None and t.strip() != "" else [])
        for i, t in rows
        if t is not None
    }
    first: dict[tuple, tuple] = {}
    count: dict[tuple, int] = {}
    for i in sorted(toks):
        w = toks[i]
        for s in range(len(w) - n + 1):
            g = tuple(w[s : s + n])
            count[g] = count.get(g, 0) + 1
            first.setdefault(g, (i, s))
    expected = {}
    for i, t in rows:
        if t is None:
            expected[i] = (None, 0)
            continue
        w = toks[i]
        starts = [
            s
            for s in range(len(w) - n + 1)
            if count[tuple(w[s : s + n])] > 1
            and first[tuple(w[s : s + n])] != (i, s)
        ]
        if not starts:
            expected[i] = (t, 0)
        else:
            covered = {p for s in starts for p in range(s, s + n)}
            kept = [tok for p, tok in enumerate(w) if p not in covered]
            expected[i] = (" ".join(kept), len(starts))

    from real_estate_bigdata_spark.operators.dedup import redact_duplicate_spans

    got = {
        r.doc_id: (r.text, r.n_redacted)
        for r in redact_duplicate_spans(docs, n=n).collect()
    }
    assert got == expected


def test_shuffle_shard_random_shapes(spark):
    """Degenerate shapes: more shards than rows, one shard, size-1
    input — always a valid sharded permutation."""
    from real_estate_bigdata_spark.operators.sampling import shuffle_shard

    rng = random.Random(7)
    for n_rows, n_shards in [(1, 4), (5, 64), (40, 1), (17, 17)]:
        ids = rng.sample(range(10_000), n_rows)
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = shuffle_shard(df, n_shards).collect()
        assert sorted(r.doc_id for r in out) == sorted(ids)
        per = {}
        for r in out:
            assert 0 <= r.shard < n_shards
            per.setdefault(r.shard, []).append(r.pos)
        for poss in per.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))


def test_corpus_diff_matches_python_reference_random(spark):
    """Random edits (drop/change/add) between two snapshots; the diff
    must equal the reference set computation exactly."""
    from real_estate_bigdata_spark.operators.versioning import corpus_diff

    rng = random.Random(99)
    base = {i: f"text {rng.randrange(5)}" for i in range(200)}
    old = dict(base)
    new = dict(base)
    expected = {}
    for i in list(base):
        r = rng.random()
        if r < 0.1:
            del new[i]
            expected[i] = "removed"
        elif r < 0.2:
            new[i] = new[i] + " v2"
            expected[i] = "changed"
    for i in range(300, 320):
        new[i] = "fresh"
        expected[i] = "added"
    old_df = spark.createDataFrame(list(old.items()), "doc_id long, text string")
    new_df = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    got = {r.doc_id: r.status for r in corpus_diff(old_df, new_df).collect()}
    assert got == expected


def test_linear_quality_scores_matches_python_reference_random(spark):
    """Random binary-fraction weights + random docs: unnormalized raw
    logits must be EXACTLY equal to the Python sum (no FP tolerance —
    all contributions are multiples of 1/8)."""
    from real_estate_bigdata_spark.operators.quality import linear_quality_scores

    rng = random.Random(123)
    vocab = [f"t{i}" for i in range(20)]
    weights = {t: rng.randrange(-8, 9) / 8 for t in rng.sample(vocab, 10)}
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.score
        for r in linear_quality_scores(
            docs, weights, bias=0.375, normalize=False, sigmoid=False
        ).collect()
    }
    for i, t in rows:
        want = 0.375 + sum(weights.get(tok, 0.0) for tok in t.split())
        assert got[i] == want, (i, got[i], want)


def test_temperature_mixture_invariants_random(spark):
    """Randomized corpus: for any alpha grid, kept sets are NESTED in
    alpha, per-stratum keeps never exceed stratum size, the smallest
    positive-mass stratum is kept whole, and endpoints reproduce
    mixture_balance / identity exactly."""
    import random as _random

    from real_estate_bigdata_spark.operators.sampling import (
        mixture_balance,
        temperature_mixture,
    )

    rng = _random.Random(7)
    rows = []
    i = 0
    for s, size in (("big", 250), ("mid", 60), ("small", 9), ("zero", 4)):
        for _ in range(size):
            w = 0 if s == "zero" else rng.randrange(1, 400)
            rows.append((i, s, w))
            i += 1
    rows.append((i, None, 50))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    kept_prev = None
    for a in (0.0, 0.25, 0.5, 0.75, 1.0):
        kept = {r.doc_id for r in temperature_mixture(df, alpha=a).collect()}
        if kept_prev is not None:
            assert kept_prev <= kept, f"not nested at alpha={a}"
        kept_prev = kept
        per = {
            r.source: r.n
            for r in df.filter(F.col("doc_id").isin(list(kept)) if kept else F.lit(False))
            .groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert per.get("small", 0) == 9  # smallest positive stratum whole
        assert per.get("zero", 0) == 4   # zero-mass stratum whole
        assert None not in per           # NULL stratum dropped
    # endpoint identity holds on positive-mass strata (documented
    # divergence under zero-mass strata: mixture_balance's min includes
    # 0 and collapses every positive stratum — see the docstring)
    df_pos = df.filter(F.col("source") != "zero")
    bal = {r.doc_id for r in mixture_balance(df_pos).collect()}
    flat = {r.doc_id for r in temperature_mixture(df_pos, alpha=0.0).collect()}
    assert flat == bal
    assert len(kept_prev) == df.count() - 1  # alpha=1: all but NULL stratum


def test_metric_buckets_invariants_random(spark):
    """Random metric: buckets are within [1, n], non-decreasing in the
    metric, NULLs get NULL, and counts are near-balanced for a
    continuous metric."""
    import random as _random

    from real_estate_bigdata_spark.operators.quality import metric_buckets

    rng = _random.Random(11)
    rows = [
        (i, rng.random() * 1000 if rng.random() > 0.05 else None)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, m double")
    for nb in (2, 3, 7):
        out = sorted(
            ((r.m, r.bucket) for r in metric_buckets(df, "m", n_buckets=nb).collect()
             if r.m is not None),
        )
        assert all(1 <= b <= nb for _, b in out)
        assert all(b1 <= b2 for (_, b1), (_, b2) in zip(out, out[1:]))
        counts = {}
        for _, b in out:
            counts[b] = counts.get(b, 0) + 1
        n = len(out)
        for b in range(1, nb + 1):
            assert counts.get(b, 0) >= n // (2 * nb), (nb, counts)
    nulls = [r.bucket for r in metric_buckets(df, "m").collect() if r.m is None]
    assert nulls and all(b is None for b in nulls)


def test_novelty_scores_matches_python_reference_random(spark):
    """Exact replay of novelty semantics in pure Python over a random
    corpus with heavy copying (first-owner = min doc id, distinct
    word-3-grams)."""
    import random as _random

    from real_estate_bigdata_spark.operators.dedup import novelty_scores

    rng = _random.Random(13)
    vocab = [f"w{j}" for j in range(30)]
    docs = {}
    for i in range(120):
        if rng.random() < 0.2 and docs:
            docs[i] = docs[rng.choice(list(docs))]  # exact copy
        else:
            docs[i] = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")

    def grams(t):
        w = t.split()
        return {" ".join(w[k:k + 3]) for k in range(len(w) - 2)}

    first = {}
    for i in sorted(docs):
        for g in grams(docs[i]):
            first.setdefault(g, i)
    got = {r.doc_id: (r.n_grams, r.n_novel) for r in novelty_scores(df).collect()}
    for i in sorted(docs):
        gs = grams(docs[i])
        want = (len(gs), sum(1 for g in gs if first[g] == i))
        assert got[i] == want, (i, got[i], want)


def test_allocate_token_budget_invariants_random(spark):
    """Randomized strata/weights/budgets: the closed-form allocation
    must conserve the budget, respect every repeat cap, keep the
    allocated/weight ratio constant across unsaturated strata (one
    waterline), and never allocate to zero-weight strata."""
    from real_estate_bigdata_spark.operators.sampling import (
        allocate_token_budget,
    )

    rng = random.Random(20260815)
    for trial in range(4):
        strata = [f"s{i}" for i in range(rng.randrange(2, 9))]
        rows, avail = [], {}
        did = 0
        for s in strata:
            t = rng.randrange(10, 2000)
            avail[s] = t
            for part in (t // 2, t - t // 2):
                rows.append((did, s, part))
                did += 1
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long"
        )
        weights = {s: float(rng.randrange(0, 6)) for s in strata}
        budget = float(rng.randrange(0, 3 * sum(avail.values())))
        epochs = rng.choice([0.5, 1.0, 2.0, 3.0])
        out = {
            r["source"]: r
            for r in allocate_token_budget(
                df, budget, strata_col="source", mixture=weights,
                max_epochs=epochs,
            ).collect()
        }
        assert set(out) == set(strata)
        total_alloc = sum(r["allocated"] for r in out.values())
        cap_total = sum(
            epochs * avail[s] for s in strata if weights[s] > 0
        )
        assert total_alloc <= min(budget, cap_total) + 1e-3, (
            trial, total_alloc, budget, cap_total
        )
        # budget spent exactly unless capacity ran out first
        assert total_alloc == min(budget, cap_total) or abs(
            total_alloc - min(budget, cap_total)
        ) < 1e-3
        lam = None
        for s, r in out.items():
            if weights[s] <= 0:
                assert r["allocated"] == 0.0 and not r["saturated"]
                continue
            assert r["allocated"] <= epochs * avail[s] + 1e-3
            if r["saturated"]:
                assert r["allocated"] == pytest.approx(
                    epochs * avail[s], abs=1e-3
                )
            else:
                ratio = r["allocated"] / weights[s]
                if lam is None:
                    lam = ratio
                assert ratio == pytest.approx(lam, rel=1e-4), (trial, s)


def test_rbo_matches_definition_random(spark):
    """Random rankings: the join+weight-lookup formulation must equal
    the per-depth set-intersection definition for every query."""
    from real_estate_bigdata_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    rng = random.Random(99)
    p, k = 0.85, 8
    rows_a, rows_b, truth = [], [], {}
    for q in range(6):
        pool = list(range(100))
        rng.shuffle(pool)
        a = pool[: rng.randrange(1, k + 1)]
        rng.shuffle(pool)
        b = pool[: rng.randrange(1, k + 1)]
        rows_a += [(q, d, r + 1) for r, d in enumerate(a)]
        rows_b += [(q, d, r + 1) for r, d in enumerate(b)]
        s = 0.0
        for d in range(1, k + 1):
            s += p ** (d - 1) * len(set(a[:d]) & set(b[:d])) / d
        truth[q] = (1 - p) * s
    da = spark.createDataFrame(rows_a, "query_id long, doc_id long, rank int")
    db = spark.createDataFrame(rows_b, "query_id long, doc_id long, rank int")
    got = {
        r["query_id"]: r["rbo"]
        for r in rank_biased_overlap(da, db, p=p, k=k).collect()
    }
    for q, want in truth.items():
        assert got[q] == pytest.approx(want, abs=1e-6), q


def test_containment_pairs_invariants_random(spark):
    """Random corpora: directional containments must satisfy
    containment_a * |A| == containment_b * |B| (both count the same
    intersection), overlap == max of the two, and jaccard <= overlap
    for every pair both generators emit."""
    from real_estate_bigdata_spark.operators import dedup as dd

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):
        length = rng.randrange(0, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(length))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    shingles = {
        i: {
            " ".join(t[j : j + 3])
            for j in range(len(t) - 2)
        }
        for i, txt in rows
        for t in [txt.split()]
        if len(t) >= 3
    }
    out = dd.ngram_containment_pairs(docs, n=3, threshold=0.5).collect()
    assert out, "random corpus produced no containment pairs to check"
    for r in out:
        A, B = shingles[r.id_a], shingles[r.id_b]
        inter = len(A & B)
        assert r.containment_a == pytest.approx(inter / len(A), abs=1e-6)
        assert r.containment_b == pytest.approx(inter / len(B), abs=1e-6)
        assert r.overlap == pytest.approx(
            max(r.containment_a, r.containment_b), abs=1e-6
        )
        jac = inter / len(A | B)
        assert jac <= r.overlap + 1e-9


def test_krippendorff_vs_fleiss_on_complete_data_random(spark):
    """On COMPLETE equal-rater data with many items, alpha and Fleiss'
    kappa estimate the same quantity up to the small-sample (n-1)
    correction: alpha = 1 - (1 - kappa_like) * n/(n-1) relates them;
    assert they agree within a loose band AND alpha matches its own
    mirror exactly."""
    from real_estate_bigdata_spark.operators.evaluation import (
        fleiss_kappa,
        krippendorff_alpha,
    )
    from tests.test_evaluation import mirror_krippendorff

    rng = random.Random(42)
    rows = []
    for i in range(80):
        bias = rng.random()
        for _ in range(3):
            rows.append((i, "x" if rng.random() < bias else "y"))
    df = spark.createDataFrame(rows, "item long, cat string")
    alpha = krippendorff_alpha(df, "item", "cat").collect()[0]["alpha"]
    kappa = fleiss_kappa(df, "item", "cat").collect()[0]["kappa"]
    assert alpha == pytest.approx(mirror_krippendorff(rows), abs=1e-6)
    assert abs(alpha - kappa) < 0.05, (alpha, kappa)


def test_krippendorff_metric_invariance_random(spark):
    """r10 metric-specific invariances on random ragged numeric
    ratings: every metric matches its independent mirror; nominal is
    invariant under ANY category bijection; interval under positive
    affine maps (delta scales by a^2 in both d_o and d_e — cancels);
    ordinal under ANY strictly monotone relabel (it reads only marginal
    masses and order, never spacing)."""
    from real_estate_bigdata_spark.operators.evaluation import (
        krippendorff_alpha,
    )
    from tests.test_evaluation import mirror_krippendorff_metric

    rng = random.Random(29)
    rows = []
    for i in range(60):
        for _ in range(rng.randrange(1, 5)):
            rows.append((i, rng.choice([0, 1, 2, 3, 7])))
    df = spark.createDataFrame(rows, "item long, cat long")

    def alpha(frame, metric):
        return krippendorff_alpha(frame, "item", "cat", metric=metric).collect()[
            0
        ]["alpha"]

    base = {m: alpha(df, m) for m in ("nominal", "interval", "ordinal")}
    for m, a in base.items():
        assert a == pytest.approx(
            mirror_krippendorff_metric(rows, m), abs=2e-6
        ), m
        assert a <= 1.0 + 1e-9

    # positive affine: cat -> 3*cat + 7
    affine = df.select("item", (F.col("cat") * 3 + 7).alias("cat"))
    assert alpha(affine, "interval") == pytest.approx(
        base["interval"], abs=2e-6
    )
    # strictly monotone but non-affine: squaring non-negative values
    mono = df.select("item", (F.col("cat") * F.col("cat")).alias("cat"))
    assert alpha(mono, "ordinal") == pytest.approx(base["ordinal"], abs=2e-6)
    # nominal: arbitrary bijection (here a value shuffle via modular map
    # that is bijective on the 5 observed values is fiddly — use the
    # monotone map, which is in particular a bijection)
    assert alpha(mono, "nominal") == pytest.approx(base["nominal"], abs=2e-6)
    # interval is NOT monotone-invariant: squaring changes the spacing,
    # so a matching value here would mean the metric ignores spacing
    assert alpha(mono, "interval") != pytest.approx(
        base["interval"], abs=1e-4
    )


def test_image_neardup_banding_exact_random(spark):
    """r10: banded Hamming blocking over random binary payloads (with
    planted byte-identical copies) must equal the brute-force pair set
    exactly at max_hamming <= bands-1 — pigeonhole exactness on random
    shapes, not just the driver fixture."""
    import hashlib

    import numpy as np

    from real_estate_bigdata_spark.operators import multimodal as mm

    rng = random.Random(31)
    rows = []
    for i in range(50):
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
        rows.append((i, payload, ("image/png", None, None, None, None)))
        if i % 7 == 0:  # planted duplicate payload under a new id
            rows.append((1000 + i, payload, ("image/png", None, None, None, None)))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in mm.image_neardup_pairs(media, max_hamming=7, bands=8).collect()
    )

    def mirror_hash(content):
        seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big")
        gray = np.random.default_rng(seed).random((8, 8, 3)).mean(axis=2)
        mean = gray.mean()
        bits = 0
        for r in range(8):
            for c in range(8):
                if gray[r, c] > mean:
                    bits |= 1 << (r * 8 + c)
        return bits

    sigs = {mid: mirror_hash(bytes(payload)) for mid, payload, _ in rows}
    ids = sorted(sigs)
    want = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for x, a in enumerate(ids)
        for b in ids[x + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 7
    )
    assert got == want
    planted = {(i, 1000 + i) for i in range(0, 50, 7)}
    assert planted <= {(a, b) for a, b, _ in got}


def test_union_tagged_and_media_stats_conservation_random(spark):
    """r10 conservation laws: union_all_tagged preserves per-source row
    counts exactly (tag partition = input partition), and media_stats'
    per-mime object/byte totals sum to the corpus totals."""
    from real_estate_bigdata_spark.operators import multimodal as mm
    from real_estate_bigdata_spark.operators.setops import union_all_tagged

    rng = random.Random(37)
    frames, counts = {}, {}
    for tag in ("alpha", "beta", "gamma"):
        n = rng.randrange(0, 40)
        counts[tag] = n
        frames[tag] = spark.range(n).select(F.col("id").alias("k"))
    out = union_all_tagged(frames)
    got = {r.source_tag: r.n for r in out.groupBy("source_tag").agg(F.count("*").alias("n")).collect()}
    assert got == {t: n for t, n in counts.items() if n > 0}

    rows = []
    total_bytes = 0
    for i in range(80):
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 30)))
        total_bytes += len(payload)
        mime = rng.choice(["image/png", "audio/wav", None])
        rows.append((i, payload, (mime, None, None, None, None)))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    stats = mm.media_stats(media).collect()
    assert sum(r.n_objects for r in stats) == 80
    assert sum(r.total_bytes or 0 for r in stats) == total_bytes


def test_pairwise_preference_invariants_random(spark):
    """r11 preference tier: (1) swapping every comparison's (a, b)
    columns changes nothing — the operator is symmetric in how a pair
    is written down; (2) duplicating every comparison doubles counts
    but leaves win_rate identical and NARROWS the Wilson band; (3) at
    smoothing=0 Bradley-Terry is invariant under count duplication
    (the MM update is homogeneous in the counts)."""
    from real_estate_bigdata_spark.operators.evaluation import (
        bradley_terry,
        pairwise_win_rates,
    )

    rng = random.Random(23)
    items = [f"s{k}" for k in range(5)]
    rows = []
    for _ in range(120):
        a, b = rng.sample(items, 2)
        w = rng.choice([a, b, None])
        rows.append((a, b, w))
    schema = "item_a string, item_b string, winner string"
    df = spark.createDataFrame(rows, schema)
    swapped = spark.createDataFrame([(b, a, w) for a, b, w in rows], schema)
    key = lambda r: (r.n_games, r.n_wins, r.n_ties, r.win_rate,  # noqa: E731
                     r.wilson_lo, r.wilson_hi)
    got = {r.item: key(r) for r in pairwise_win_rates(df).collect()}
    gsw = {r.item: key(r) for r in pairwise_win_rates(swapped).collect()}
    assert got == gsw
    doubled = spark.createDataFrame(rows + rows, schema)
    gd = {r.item: r for r in pairwise_win_rates(doubled).collect()}
    for m in got:
        assert gd[m].n_games == 2 * got[m][0]
        assert gd[m].win_rate == pytest.approx(got[m][3], abs=2e-6)
        width = got[m][5] - got[m][4]
        assert (gd[m].wilson_hi - gd[m].wilson_lo) < width
    bt = {
        r.item: r.strength
        for r in bradley_terry(df, max_iter=8, smoothing=0.0).collect()
    }
    btd = {
        r.item: r.strength
        for r in bradley_terry(doubled, max_iter=8, smoothing=0.0).collect()
    }
    for m in bt:
        assert btd[m] == pytest.approx(bt[m], abs=2e-6), m


def test_curriculum_affine_invariance_random(spark):
    """z-scored difficulty is invariant under a positive affine
    transform of any signal (x -> 2x + 10): phases must be IDENTICAL
    and difficulties equal to float tolerance."""
    from real_estate_bigdata_spark.operators.sampling import curriculum_phases

    rng = random.Random(31)
    rows = [(i, rng.uniform(0, 100), float(rng.randint(0, 50)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, a double, b double")
    base = {
        r.doc_id: r
        for r in curriculum_phases(df, {"a": 1.0, "b": 0.5}).collect()
    }
    aff = df.withColumn("a", F.col("a") * 2 + 10)
    trans = {
        r.doc_id: r
        for r in curriculum_phases(aff, {"a": 1.0, "b": 0.5}).collect()
    }
    for i in base:
        assert trans[i].difficulty == pytest.approx(
            base[i].difficulty, abs=1e-5
        )
    phase_moves = sum(base[i].phase != trans[i].phase for i in base)
    # a boundary tie can move at a rounding edge; the mass must not
    assert phase_moves <= 2


def test_funnel_and_cohort_invariants_random(spark):
    """Funnel counts are invariant under event duplication and row
    order; every cohort retains 100% at offset 0 and never exceeds
    its size."""
    import datetime as dt

    from real_estate_bigdata_spark.operators.events import (
        cohort_retention,
        funnel_conversion,
    )

    rng = random.Random(41)
    t0 = dt.datetime(2024, 1, 1)
    types = ["view", "click", "purchase"]
    rows = []
    for i in range(400):
        rows.append(
            (i, t0 + dt.timedelta(minutes=rng.randint(0, 40_000)),
             rng.randint(1, 40), rng.choice(types))
        )
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    df = spark.createDataFrame(rows, schema)
    fun = {r.step: r.n_users
           for r in funnel_conversion(df, types, within_hours=48.0).collect()}
    dup = spark.createDataFrame(rows + [(e + 10_000, t, u, ty)
                                        for e, t, u, ty in rows], schema)
    fun_dup = {r.step: r.n_users
               for r in funnel_conversion(dup, types, within_hours=48.0).collect()}
    assert fun == fun_dup
    assert fun["view"] >= fun["click"] >= fun["purchase"]
    shuffled = df.orderBy(F.rand(7)).repartition(11)
    fun_sh = {r.step: r.n_users
              for r in funnel_conversion(shuffled, types, within_hours=48.0).collect()}
    assert fun == fun_sh

    ret = cohort_retention(df).collect()
    sizes = {}
    for r in ret:
        if r.period_offset == 0:
            assert r.retention == 1.0
            sizes[r.cohort] = r.n_active
    for r in ret:
        assert r.n_active <= sizes[r.cohort]
        assert 0.0 < r.retention <= 1.0
