"""Pins for functions.nphash — the vectorized numpy mirrors of Spark's
xxhash64 kernel and the MinHash/SimHash signature tallies (r16; the
signature operators' hot path). These must match the JVM BIT-FOR-BIT:
a wrong-but-well-distributed hash produces plausible signatures whose
band keys silently never collide with JVM-written stores."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.functions import nphash

U = np.uint64


class TestXxhash64Kernel:
    def test_hash_long_matches_jvm_single_and_chained(self, spark):
        """xxhash64_long == F.xxhash64(bigint) and the two-long chain
        == F.xxhash64(a, b), across random and boundary longs."""
        random.seed(7)
        vals = [random.randint(-(2**63), 2**63 - 1) for _ in range(512)]
        vals += [0, 1, -1, 2**63 - 1, -(2**63)]
        df = spark.createDataFrame(
            [(v, (i * 31 - 7)) for i, v in enumerate(vals)], "a long, b long"
        )
        rows = df.select(
            "a", "b", F.xxhash64("a").alias("h1"), F.xxhash64("a", "b").alias("h2")
        ).collect()
        a = np.array([r.a for r in rows], dtype=np.int64).view(U)
        b = np.array([r.b for r in rows], dtype=np.int64).view(U)
        h1 = nphash.xxhash64_long(a).view(np.int64)
        h2 = nphash.xxhash64_long(b, nphash.xxhash64_long(a)).view(np.int64)
        assert (h1 == np.array([r.h1 for r in rows])).all()
        assert (h2 == np.array([r.h2 for r in rows])).all()

    def test_hash_int_lane_path_matches_jvm_int_literal(self, spark):
        """F.lit(i) is IntegerType, so the MinHash lane index takes the
        JVM's 4-byte hashInt path — pin xxhash64_int against
        F.xxhash64(bigint, int_literal) for every lane 0..63 and for
        negative ints (sign-extension would corrupt the masked word)."""
        random.seed(11)
        svals = [random.randint(-(2**63), 2**63 - 1) for _ in range(64)]
        df = spark.createDataFrame([(v,) for v in svals], "s long")
        cols = [F.xxhash64("s", F.lit(i)).alias(f"l{i}") for i in range(64)]
        cols.append(F.xxhash64("s", F.lit(-3)).alias("lneg"))
        rows = df.select("s", *cols).collect()
        s = np.array([r.s for r in rows], dtype=np.int64).view(U)
        h0 = nphash.xxhash64_long(s)
        for i in range(64):
            got = nphash.xxhash64_int(U(i), h0).view(np.int64)
            assert (got == np.array([r[f"l{i}"] for r in rows])).all(), i
        got = nphash.xxhash64_int(
            np.int64(-3).astype(np.uint64), h0
        ).view(np.int64)
        assert (got == np.array([r.lneg for r in rows])).all()


class TestSignatureKernels:
    def test_minhash_sigs_match_jvm_min_aggregate(self, spark):
        """minhash_sigs == the explode + min(xxhash64(s, lit(i)))
        aggregate the pre-r16 operator ran, on ragged random arrays."""
        random.seed(13)
        arrays = [
            np.array(
                [random.randint(-(2**63), 2**63 - 1) for _ in range(ln)],
                dtype=np.int64,
            )
            for ln in (1, 2, 7, 50, 3)
        ]
        df = spark.createDataFrame(
            [(k, [int(x) for x in a]) for k, a in enumerate(arrays)],
            "doc_id long, hs array<bigint>",
        )
        agg = (
            df.select("doc_id", F.explode("hs").alias("s"))
            .groupBy("doc_id")
            .agg(
                *[
                    F.min(F.xxhash64("s", F.lit(i))).alias(f"h{i}")
                    for i in range(16)
                ]
            )
            .select(
                "doc_id",
                F.array(*[F.col(f"h{i}") for i in range(16)]).alias("sig"),
            )
        )
        want = {r.doc_id: list(r.sig) for r in agg.collect()}
        got = nphash.minhash_sigs(arrays, 16)
        for k in range(len(arrays)):
            assert list(got[k]) == want[k], k

    def test_simhash_sims_matches_vote_semantics(self):
        """simhash_sims == the scalar +1/-1 vote tally, including the
        bit-63 sign wrap and exact tie (votes == 0 -> bit clear)."""
        random.seed(17)
        arrays = [
            np.array(
                [random.randint(-(2**63), 2**63 - 1) for _ in range(ln)],
                dtype=np.int64,
            )
            for ln in (1, 2, 8, 33, 200)
        ]
        # exact-tie case: two features differing in every bit
        arrays.append(np.array([0, -1], dtype=np.int64))
        got = nphash.simhash_sims(arrays)
        for k, arr in enumerate(arrays):
            sim = 0
            for i in range(64):
                votes = sum(
                    1 if (int(h) >> i) & 1 else -1 for h in arr.view(U)
                )
                if votes > 0:
                    sim += 1 << i
            if sim >= 2**63:
                sim -= 2**64
            assert int(got[k]) == sim, k
        assert int(got[-1]) == 0  # tie -> every bit clear

    def test_kernels_reject_nothing_silently(self):
        """Empty-array inputs are the CALLER's job to filter — the
        kernels assume non-empty segments (reduceat over an empty
        segment returns the next element, silently wrong), so the
        operator wrappers drop empty/NULL feature rows first. Pin that
        a lone empty batch raises rather than fabricating values."""
        with pytest.raises(ValueError):
            nphash.minhash_sigs([], 16)
