"""Served hybrid retrieval end-to-end (VERDICT r7 task #7): the stack a
100-TB deployment actually runs — rrf_fuse over bm25_search (persisted
BM25 index) + ivf_search (persisted IVF index) — must fuse bit-equal to
the one-shot fusion (bm25_topk + brute_force_topk) that the driver
query q_hybrid_search oracle-verifies. The lexical halves are bit-equal
by the shared _bm25_rank kernel; the semantic halves by exhaustive
probing (n_probe = n_lists scans every list with the same cosine
expression and (cosine desc, id asc) tie-break).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import similarity as sim
from real_estate_bigdata_spark.operators import text_analysis as ta
from real_estate_bigdata_spark.schema import load_table

SF = "/root/testdata/sf0.001"
QUERY = "join spark window"


def _fused_rows(lex, sem):
    return [
        (r.doc_id, r.rrf_score, r.fused_rank)
        for r in ta.rrf_fuse([lex, sem], k_rrf=60)
        .orderBy("fused_rank")
        .collect()
    ]


def test_served_fusion_bit_equals_one_shot(spark, tmp_path):
    from pyspark.sql import Window

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0)
    w = Window.orderBy(F.desc("score"), "doc_id")

    # one-shot halves (the oracle-verified q_hybrid_search shape)
    lex_one = ta.bm25_topk(docs, QUERY, k=10).select(
        "doc_id", F.row_number().over(w).alias("rn")
    )
    sem_one = sim.brute_force_topk(emb, qvec, k=10).select(
        F.col("neighbor_id").alias("doc_id"), "rn"
    )
    want = _fused_rows(lex_one, sem_one)
    assert len(want) >= 10  # both halves genuinely contribute

    # served halves: persisted artifacts, loaded back
    bm25_path = str(tmp_path / "bm25_idx")
    ta.build_bm25_index(docs, bm25_path)
    lex_srv = ta.bm25_search(spark, bm25_path, QUERY, k=10).select(
        "doc_id", F.row_number().over(w).alias("rn")
    )
    ivf_path = str(tmp_path / "ivf_idx")
    index = sim.build_ivf_index(emb, n_lists=8)
    sim.save_ivf_index(index, ivf_path)
    loaded = sim.load_ivf_index(spark, ivf_path)
    # exhaustive probing: n_probe = n_lists makes the served semantic
    # half exact, hence bit-comparable to brute force
    sem_srv = sim.ivf_search(
        loaded, qvec, k=10, n_probe=loaded.n_lists
    ).select(F.col("neighbor_id").alias("doc_id"), "rn")

    got = _fused_rows(lex_srv, sem_srv)
    assert got == want
