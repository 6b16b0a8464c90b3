"""NULL-document semantics of the text-analysis operators.

The driver testdata has no NULL text, so NULL handling is exactly the
kind of latent divergence an oracle sweep can't catch: Spark's legacy
``size(NULL) = -1`` (ANSI off) and ``concat_ws``'s NULL->"" collapse
would silently corrupt token sums and collide fingerprints. These tests
pin ANSI/DuckDB-consistent behavior: counting a missing document yields
NULL (skipped by sum/avg), never -1 or an empty-string collision.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.text_analysis import (
    doc_fingerprints,
    doc_quality_profile,
    lang_id_report,
    token_accounting,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "src_a", "en", "the cat sat on the mat"),
            (2, "src_a", "en", None),
            (3, "src_a", "en", ""),
            (4, "src_b", "de", "der hund ist nicht da"),
        ],
        "doc_id long, source string, lang string, text string",
    )


def test_token_accounting_null_text_is_null_not_minus_one(spark):
    rows = {r.source: r for r in token_accounting(_docs(spark)).collect()}
    a = rows["src_a"]
    # doc 1 has 6 ws tokens, doc 2 is NULL (skipped), doc 3 is 0
    assert a.n_docs == 3
    assert a.ws_tokens == 6  # a -1 leak would make this 5
    assert abs(a.avg_ws_tokens - 3.0) < 1e-9  # avg over the 2 non-NULL docs


def test_quality_profile_null_text_propagates_null(spark):
    rows = {r.doc_id: r for r in doc_quality_profile(_docs(spark)).collect()}
    nulldoc = rows[2]
    for field in (
        "n_chars",
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "alpha_ratio",
        "stopword_ratio",
        "uniq_token_ratio",
    ):
        assert getattr(nulldoc, field) is None, field
    assert rows[3].n_tokens == 0  # empty string stays a real (zero) count


def test_fingerprints_null_text_does_not_collide_with_empty(spark):
    rows = {r.doc_id: r.fingerprint for r in doc_fingerprints(_docs(spark)).collect()}
    assert rows[2] is None
    assert rows[3] is not None
    from real_estate_bigdata_spark.functions.text import fingerprint64

    xx = {
        r.doc_id: r.fp
        for r in _docs(spark).select("doc_id", fingerprint64(F.col("text")).alias("fp")).collect()
    }
    assert xx[2] is None
    assert xx[3] is not None


def test_lang_id_null_and_empty_text_are_und(spark):
    rows = {r.doc_id: r.lang_pred for r in lang_id_report(_docs(spark)).collect()}
    assert rows[1] == "en"
    assert rows[2] == "und"
    assert rows[3] == "und"
    assert rows[4] == "de"


def test_repetition_metrics_counts_and_fractions(spark):
    from real_estate_bigdata_spark.operators.text_analysis import repetition_metrics

    docs = spark.createDataFrame(
        [
            # 2-grams: "a b","b a","a b","b a","a b" -> 5 total, 2 distinct, top 3
            (1, "a b a b a b"),
            (2, "x y z"),  # 2 total, 2 distinct, top 1
            (3, "solo"),  # < 2 tokens -> NULL metrics
            (4, None),  # NULL text -> NULL metrics
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_metrics(docs, n=2).collect()}
    assert (got[1].n_ngrams, got[1].dup_ngram_frac, got[1].top_ngram_frac) == (5, 0.6, 0.6)
    assert (got[2].n_ngrams, got[2].dup_ngram_frac, got[2].top_ngram_frac) == (2, 0.0, 0.5)
    assert got[3].n_ngrams is None and got[3].dup_ngram_frac is None
    assert got[4].n_ngrams is None
    # unigram mode: doc 1 has 6 tokens, 2 distinct, top 3
    uni = {r.doc_id: r for r in repetition_metrics(docs, n=1).collect()}
    assert (uni[1].n_ngrams, uni[1].top_ngram_frac) == (6, 0.5)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        repetition_metrics(docs, n=0)


def test_repetition_metrics_stays_jvm_side(spark):
    from real_estate_bigdata_spark.operators.text_analysis import repetition_metrics
    from real_estate_bigdata_spark.plans import assert_plan
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert_plan(repetition_metrics(docs), forbid_python=True, max_sortmerge_joins=0)


def test_vocab_top_tokens_rank_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b a a"), (2, "a b c"), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    from real_estate_bigdata_spark.operators.text_analysis import vocab_top_tokens

    rows = {r.token: r for r in vocab_top_tokens(df, k=2).collect()}
    # a: 3 occurrences in 2 docs; b: 2 in 2; c excluded by k=2
    assert set(rows) == {"a", "b"}
    assert rows["a"].rank == 1 and rows["a"].n_occurrences == 3 and rows["a"].n_docs == 2
    assert rows["b"].rank == 2 and rows["b"].n_occurrences == 2 and rows["b"].n_docs == 2
    # tie-break: equal counts rank alphabetically
    tie = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    t = {r.token: r.rank for r in vocab_top_tokens(tie, k=5).collect()}
    assert t == {"x": 1, "y": 2}
    import pytest

    with pytest.raises(ValueError):
        vocab_top_tokens(df, k=0)


def test_unigram_logprob_scores_semantics(spark):
    import math

    from real_estate_bigdata_spark.operators.text_analysis import (
        unigram_logprob_scores,
    )

    # corpus: 'a' x3, 'b' x1 -> N=4; p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_logprob_scores(df).collect()}
    exp1 = -(2 * math.log(3 / 4) + math.log(1 / 4)) / 3
    assert abs(rows[1].avg_neg_logprob - round(exp1, 6)) < 1e-9
    assert abs(rows[2].avg_neg_logprob - round(-math.log(3 / 4), 6)) < 1e-9
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 1
    # tokenless docs: present, NULL score
    for d in (3, 4):
        assert rows[d].n_tokens == 0 and rows[d].avg_neg_logprob is None
    # rare-token doc scores higher than common-token doc
    assert rows[1].avg_neg_logprob > rows[2].avg_neg_logprob


def test_approx_heavy_hitters_superset_of_true(spark):
    """KPS guarantee: no true heavy hitter (> support of the stream) is
    ever missed; false positives are allowed and resolved by an exact
    recount over the candidate set."""
    from real_estate_bigdata_spark.operators.text_analysis import (
        approx_heavy_hitters,
        vocab_top_tokens,
    )
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    support = 0.01
    hh = set(approx_heavy_hitters(docs, support=support))
    # exact truth from the wordcount path
    vocab = vocab_top_tokens(docs, k=10**6).collect()
    total = sum(r.n_occurrences for r in vocab)
    truth = {r.token for r in vocab if r.n_occurrences > support * total}
    assert truth <= hh
    import pytest

    with pytest.raises(ValueError):
        approx_heavy_hitters(docs, support=0.0)


def test_tfidf_scores_semantics(spark):
    import math

    from real_estate_bigdata_spark.operators.text_analysis import tfidf_scores

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, None)], "doc_id long, text string"
    )
    rows = {(r.doc_id, r.token): r for r in tfidf_scores(df).collect()}
    # N=3 docs; df(a)=2, df(b)=1, df(c)=1
    r1a = rows[(1, "a")]
    assert r1a.n_occ == 2
    assert abs(r1a.tf - round(2 / 3, 6)) < 1e-9
    assert abs(r1a.idf - round(math.log(4 / 3) + 1, 6)) < 1e-9
    assert abs(r1a.tfidf - round(r1a.tf * r1a.idf, 6)) < 1e-9
    # rarer token scores higher idf
    assert rows[(1, "b")].idf > r1a.idf
    # NULL-text doc contributes no rows but counts toward N (smooth idf)
    assert not any(d == 3 for d, _ in rows)


def test_chunk_documents_dense_index_and_counts(spark):
    from real_estate_bigdata_spark.operators.text_analysis import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "First one. Second two!  Third three?"),
            (2, "no terminator at all"),
            (3, None),
            (4, "..."),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = [(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in
            chunk_documents(df).orderBy("doc_id", "chunk_idx").collect()]
    # doc 4 ("...") yields nothing: the sentence pattern requires at
    # least one non-terminator char, so pure punctuation has no chunk
    assert rows == [
        (1, 0, "First one.", 2),
        (1, 1, "Second two!", 2),
        (1, 2, "Third three?", 2),
        (2, 0, "no terminator at all", 4),
    ]


class TestRemoveBoilerplateLines:
    def _df(self, spark):
        header = "=== SITE NAV ==="
        rows = [
            (1, f"{header}\nunique one\nalso unique"),
            (2, f"{header}\ndifferent body"),
            (3, f"{header}\nthird body\n{header}"),  # boilerplate twice
            (4, header),            # nothing but boilerplate -> ''
            (5, "standalone doc"),  # untouched
            (6, None),              # NULL stays NULL
            (7, ""),                # empty text, unique -> kept as ''
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_shared_lines_removed_order_preserved(self, spark):
        from real_estate_bigdata_spark.operators.text_analysis import (
            remove_boilerplate_lines,
        )

        out = {r.doc_id: r.text for r in remove_boilerplate_lines(self._df(spark)).collect()}
        assert out[1] == "unique one\nalso unique"
        assert out[2] == "different body"
        assert out[3] == "third body"
        assert out[4] == ""
        assert out[5] == "standalone doc"
        assert out[6] is None
        assert out[7] == ""

    def test_threshold_spares_rarer_lines(self, spark):
        from real_estate_bigdata_spark.operators.text_analysis import (
            remove_boilerplate_lines,
        )

        # shared by 2 docs -> survives max_docs=2, dies at max_docs=1
        df = spark.createDataFrame(
            [(1, "shared\na"), (2, "shared\nb"), (3, "c")],
            "doc_id long, text string",
        )
        lenient = {r.doc_id: r.text for r in remove_boilerplate_lines(df, max_docs=2).collect()}
        assert lenient == {1: "shared\na", 2: "shared\nb", 3: "c"}
        strict = {r.doc_id: r.text for r in remove_boilerplate_lines(df, max_docs=1).collect()}
        assert strict == {1: "a", 2: "b", 3: "c"}

    def test_identity_when_no_sharing(self, spark):
        """Reassembly must be byte-identical for untouched docs — the
        property the registry oracle hash-checks corpus-wide."""
        from real_estate_bigdata_spark.operators.text_analysis import (
            remove_boilerplate_lines,
        )
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        out = remove_boilerplate_lines(docs, max_docs=len(docs.columns) + 10**6)
        orig = {r.doc_id: r.text for r in docs.collect()}
        got = {r.doc_id: r.text for r in out.collect()}
        assert got == orig

    def test_rejects_bad_threshold(self, spark):
        import pytest

        from real_estate_bigdata_spark.operators.text_analysis import (
            remove_boilerplate_lines,
        )

        with pytest.raises(ValueError):
            remove_boilerplate_lines(self._df(spark), max_docs=0)


def test_remove_boilerplate_null_id_passes_through(spark):
    """NULL-id rows can't be reassembled per-document — they must pass
    through untouched (not collapse to '') and not affect frequencies."""
    from real_estate_bigdata_spark.operators.text_analysis import (
        remove_boilerplate_lines,
    )

    rows = [
        (1, "shared\nalpha"),
        (2, "shared\nbeta"),
        (None, "shared\nkept as is"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in remove_boilerplate_lines(df, max_docs=1).collect()}
    assert out[1] == "alpha" and out[2] == "beta"
    assert out[None] == "shared\nkept as is"


def test_bigram_logprob_hand_computed(spark):
    import math

    from real_estate_bigdata_spark.operators.text_analysis import (
        bigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a d"), (3, "solo"), (4, None), (5, "  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_logprob_scores(df).collect()}
    # c(a,b)=c(b,c)=c(a,d)=1; left-context c(a)=2, c(b)=1
    # doc1 = avg(ln2 - ln1, ln1 - ln1) = ln2/2 ; doc2 = ln2
    assert got[1].n_bigrams == 2
    assert abs(got[1].avg_neg_logprob_bigram - round(math.log(2) / 2, 6)) < 1e-9
    assert got[2].n_bigrams == 1
    assert abs(got[2].avg_neg_logprob_bigram - round(math.log(2), 6)) < 1e-9
    # <2 tokens / NULL / blank: zero bigrams, NULL score, row retained
    for did in (3, 4, 5):
        assert got[did].n_bigrams == 0 and got[did].avg_neg_logprob_bigram is None


def test_bigram_logprob_plan_is_jvm_only(spark):
    from real_estate_bigdata_spark.operators.text_analysis import (
        bigram_logprob_scores,
    )
    from real_estate_bigdata_spark.plans import assert_plan
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    # bigram build is map-side (no positional self-join): count tables +
    # stream joins + per-doc agg + final left join; all codegen, no UDF
    assert_plan(bigram_logprob_scores(docs), forbid_python=True)


def test_dedup_paragraphs_keep_first_order_preserving(spark):
    from real_estate_bigdata_spark.operators.text_analysis import dedup_paragraphs
    from real_estate_bigdata_spark.plans import assert_plan

    df = spark.createDataFrame(
        [
            (1, "alpha\n\nbeta\n\nalpha\n\ngamma\n\nbeta"),
            (2, "solo paragraph"),
            (3, None),
            (4, "x\n\nx\n\nx"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in dedup_paragraphs(df).collect()}
    assert got[1] == "alpha\n\nbeta\n\ngamma"  # first occurrences, in order
    assert got[2] == "solo paragraph"
    assert got[3] is None
    assert got[4] == "x"
    # custom regex separator with an explicit join literal
    df2 = spark.createDataFrame([(1, "a||a||b")], "doc_id long, text string")
    out2 = dedup_paragraphs(df2, sep=r"\|\|", join_sep="||").first().text
    assert out2 == "a||b"
    # map-only: no shuffle, no Python
    assert_plan(dedup_paragraphs(df), max_shuffles=0, forbid_python=True)


class TestBm25Topk:
    CORPUS = [
        (1, "spark catalyst optimizer rewrites the logical plan"),
        (2, "spark spark spark everywhere in this document about spark"),
        (3, "duckdb is an embedded analytical database"),
        (4, "the catalyst framework inside spark powers query planning"),
        (5, None),
        (6, ""),
    ]

    def _py_bm25(self, query, k1=1.2, b=0.75):
        """Independent Python mirror of the documented formula (same
        operation order as the Spark expressions; tolerance compare —
        exact cross-engine determinism is the DuckDB oracle's job)."""
        import math

        docs = {
            i: (t.split() if t.strip() else [])
            for i, t in self.CORPUS
            if t is not None
        }
        n = float(len(docs))
        avgdl = sum(len(v) for v in docs.values()) / n
        terms = sorted(set(query.split()))
        df = {
            t: float(sum(1 for v in docs.values() if t in v)) for t in terms
        }
        out = {}
        for i, toks in docs.items():
            s = 0.0
            for t in terms:
                tf = float(toks.count(t))
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                denom = tf + k1 * (1.0 - b + b * len(toks) / avgdl)
                s += round(idf * tf * (k1 + 1.0) / denom, 6)
            if s > 0:
                out[i] = round(s, 6)
        return out

    def test_scores_match_independent_mirror(self, spark):
        from real_estate_bigdata_spark.operators.text_analysis import bm25_topk

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = {
            r.doc_id: r.score
            for r in bm25_topk(df, "spark catalyst", k=10).collect()
        }
        want = self._py_bm25("spark catalyst")
        assert set(got) == set(want)
        for i in want:
            assert abs(got[i] - want[i]) < 2e-6, (i, got[i], want[i])
        # rare term (catalyst, df=2) + term-saturation: doc 1 carries
        # both terms and must outrank the spark-only docs
        ranked = [
            r.doc_id for r in bm25_topk(df, "spark catalyst", k=10).collect()
        ]
        assert ranked[0] in (1, 4) and set(ranked[:2]) == {1, 4}

    def test_k_truncates_with_deterministic_tiebreak(self, spark):
        from real_estate_bigdata_spark.operators.text_analysis import bm25_topk

        # identical docs -> identical scores -> id-ordered tie-break
        df = spark.createDataFrame(
            [(i, "same words here") for i in range(1, 6)],
            "doc_id long, text string",
        )
        top = bm25_topk(df, "words", k=3).collect()
        assert [r.doc_id for r in top] == [1, 2, 3]

    def test_validates_inputs(self, spark):
        import pytest as _pytest

        from real_estate_bigdata_spark.operators.text_analysis import bm25_topk

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            bm25_topk(df, "   ")
        with _pytest.raises(ValueError):
            bm25_topk(df, "a", k=0)

    def test_plan_prunes_before_shuffle_and_stays_jvm(self, spark):
        from real_estate_bigdata_spark.operators.text_analysis import bm25_topk
        from real_estate_bigdata_spark.plans import assert_plan, executed_plan_str
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = bm25_topk(docs, "report market", k=5)
        # stats agg + df agg + per-term agg + final agg + TakeOrdered:
        # bounded-key shuffles only; dims broadcast; no Python
        stats = assert_plan(out, forbid_python=True, min_broadcast_joins=2)
        plan = executed_plan_str(out)
        assert "TakeOrdered" in plan, plan


class TestBm25Index:
    """Persisted BM25 index (VERDICT r6 task #5): build-once /
    search-many with bit-parity to the one-shot path and queried-term
    partition pruning at the scan."""

    def test_search_bit_parity_with_one_shot(self, spark, tmp_path):
        from real_estate_bigdata_spark.operators.text_analysis import (
            bm25_search,
            bm25_topk,
            build_bm25_index,
        )
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        path = str(tmp_path / "bm25")
        build_bm25_index(docs, path)
        for q in ("report market", "join spark window", "the"):
            one_shot = [
                (r.doc_id, r.score) for r in bm25_topk(docs, q, k=10).collect()
            ]
            indexed = [
                (r.doc_id, r.score)
                for r in bm25_search(spark, path, q, k=10).collect()
            ]
            assert indexed == one_shot, q  # same ids, same scores, same order

    def test_registry_bm25_consolidation_parity(self, spark):
        """r13 consolidation pin (VERDICT r12 task #2, growth-policy
        rule 2): q_bm25_index_search was folded into q_bm25_search's
        registry slot BECAUSE the two registry callables are
        bit-identical on the real testdata — this test IS that claim,
        run on the exact registry-shaped query bodies (persisted
        artifact path, same fixed query string) so the persisted-index
        serve path keeps driver-fixture-level coverage."""
        import __spark_entry__ as entry

        sf = "/root/testdata/sf0.001"
        one_shot = [
            (r.doc_id, r.score)
            for r in entry._q_bm25_search(spark, sf).collect()
        ]
        indexed = [
            (r.doc_id, r.score)
            for r in entry._q_bm25_index_search(spark, sf).collect()
        ]
        assert indexed == one_shot
        assert one_shot, "expected non-empty BM25 top-k on testdata"

    def test_only_queried_term_partitions_scan(self, spark, tmp_path):
        """The __tp filter prunes posting directories at the scan: the
        files actually read for a query are a strict subset of the full
        postings table (input_file_name technique — plan-string asserts
        on '__tp' are vacuous)."""
        from pyspark.sql import functions as F

        from real_estate_bigdata_spark.operators.text_analysis import (
            _bm25_term_bucket_py,
            build_bm25_index,
        )
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        path = str(tmp_path / "bm25")
        build_bm25_index(docs, path)
        # terms from the synthetic corpus's actual vocabulary
        buckets = [_bm25_term_bucket_py(t) for t in ("join", "spark")]
        pruned = (
            spark.read.parquet(f"{path}/postings")
            .filter(F.col("__tp").isin(buckets))
            .select(F.input_file_name().alias("f"))
            .distinct()
        )
        all_files = (
            spark.read.parquet(f"{path}/postings")
            .select(F.input_file_name().alias("f"))
            .distinct()
        )
        read_pruned = {r.f for r in pruned.collect()}
        read_all = {r.f for r in all_files.collect()}
        assert read_pruned and read_pruned < read_all

    def test_driver_and_spark_bucket_hash_agree(self, spark):
        """The driver-side md5 bucket must equal the build's Spark-side
        pmod(portable_hash64) for adversarial tokens — the partition
        filter silently misses postings if they ever diverge."""
        from real_estate_bigdata_spark.functions.text import portable_hash64
        from real_estate_bigdata_spark.operators.text_analysis import (
            _BM25_TERM_BUCKETS,
            _bm25_term_bucket_py,
        )

        terms = ["the", "café", "naïve", "ผสม", "x" * 100, "0", "-", "ñ"]
        df = spark.createDataFrame([(t,) for t in terms], "term string")
        got = {
            r.term: r.b
            for r in df.select(
                "term",
                F.pmod(
                    portable_hash64(F.col("term")), F.lit(_BM25_TERM_BUCKETS)
                ).alias("b"),
            ).collect()
        }
        for t in terms:
            assert got[t] == _bm25_term_bucket_py(t), t

    def test_validates_inputs(self, spark, tmp_path):
        import pytest as _pytest

        from real_estate_bigdata_spark.operators.text_analysis import (
            bm25_search,
            build_bm25_index,
        )

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        path = str(tmp_path / "bm25")
        build_bm25_index(docs, path)
        with _pytest.raises(ValueError):
            bm25_search(spark, path, "   ")
        with _pytest.raises(ValueError):
            bm25_search(spark, path, "a", k=0)


class TestRrfFuse:
    def test_hand_computed_fusion_and_tiebreak(self, spark):
        from real_estate_bigdata_spark.operators.text_analysis import rrf_fuse

        a = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "doc_id long, rn int"
        )
        b = spark.createDataFrame(
            [(3, 1), (1, 2), (9, 3)], "doc_id long, rn int"
        )
        got = {
            r.doc_id: (r.rrf_score, r.fused_rank)
            for r in rrf_fuse([a, b], k_rrf=60).collect()
        }
        import math

        def rr(*ranks):
            return round(sum(1.0 / (60 + r) for r in ranks), 6)

        assert got[1] == (rr(1, 2), 1)   # in both lists, best combined
        assert got[3] == (rr(3, 1), 2)
        assert got[2][0] == rr(2)        # single-list docs: one term
        assert got[9][0] == rr(3)
        # 2 outranks 9 (rank 2 beats rank 3); ties impossible here
        assert got[2][1] == 3 and got[9][1] == 4

    def test_equal_scores_break_by_id(self, spark):
        from real_estate_bigdata_spark.operators.text_analysis import rrf_fuse

        a = spark.createDataFrame([(5, 1), (2, 2)], "doc_id long, rn int")
        b = spark.createDataFrame([(2, 1), (5, 2)], "doc_id long, rn int")
        out = rrf_fuse([a, b]).collect()
        # both docs score rr(1)+rr(2): lower id wins rank 1
        assert [r.doc_id for r in out] == [2, 5]

    def test_top_k_and_validation(self, spark):
        import pytest as _pytest

        from real_estate_bigdata_spark.operators.text_analysis import rrf_fuse

        a = spark.createDataFrame(
            [(i, i) for i in range(1, 6)], "doc_id long, rn int"
        )
        assert rrf_fuse([a], top_k=2).count() == 2
        with _pytest.raises(ValueError):
            rrf_fuse([])
        with _pytest.raises(ValueError):
            rrf_fuse([a], k_rrf=0)
        with _pytest.raises(ValueError):
            rrf_fuse([a], top_k=0)


def test_vocab_coverage_contracts(spark):
    """r11: occurrence-weighted OOV; NULL text -> NULL counts; empty
    text -> 0 tokens / NULL rate; broadcast-vocab plan."""
    from real_estate_bigdata_spark.operators.text_analysis import (
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "x y"), (3, ""), (4, None), (5, "a a a")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("a",), ("b",), ("a",)], "token string")
    got = {r.doc_id: r for r in vocab_coverage(docs, vocab).collect()}
    assert (got[1].n_tokens, got[1].n_oov, got[1].oov_rate) == (4, 1, 0.25)
    assert (got[2].n_tokens, got[2].n_oov, got[2].oov_rate) == (2, 2, 1.0)
    assert (got[3].n_tokens, got[3].n_oov, got[3].oov_rate) == (0, 0, None)
    assert (got[4].n_tokens, got[4].n_oov, got[4].oov_rate) == (
        None, None, None,
    )
    assert got[5].oov_rate == 0.0
