"""PII redaction semantics: per-kind hits, ordering (SSN vs phone,
email vs phone), NULL propagation, subset selection, map-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.functions import pii


def _one(spark, s):
    return spark.createDataFrame([(s,)], "t string")


def _red(spark, s, kinds=None):
    return _one(spark, s).select(pii.redact_pii(F.col("t"), kinds).alias("r")).first().r


def test_each_kind_redacts(spark):
    assert _red(spark, "mail a.b+c@ex-am.ple.org now") == "mail [EMAIL] now"
    assert _red(spark, "ssn 123-45-6789.") == "ssn [SSN]."
    assert _red(spark, "call +1 (555) 123-4567 ok") == "call [PHONE] ok"
    assert _red(spark, "call 555.123.4567 ok") == "call [PHONE] ok"
    assert _red(spark, "host 10.0.255.1 up") == "host [IP] up"


def test_ordering_ssn_and_email_win_over_phone(spark):
    # SSN's 3-2-4 grouping must not be torn by the phone pattern
    assert "[SSN]" in _red(spark, "id 123-45-6789")
    # digits inside an email local-part belong to the email
    assert _red(spark, "x 5551234567@ex.com y") == "x [EMAIL] y"


def test_long_digit_runs_and_bad_quads_survive(spark):
    # no lookbehind in RE2, so the phone pattern anchors on \b/( and a
    # required first separator — longer digit runs must NOT be torn
    for s in [
        "card 4111111111111111 on file",
        "ts 20260813120000 logged",
        "ref 123456789012345 id",
        "bare 5551234567 run",  # separator-less phones are out of scope
    ]:
        assert _red(spark, s) == s
    # octet-validated IPv4: out-of-range quads survive
    assert _red(spark, "q 999.999.999.999 r") == "q 999.999.999.999 r"
    assert _red(spark, "(555)123-4567!") == "[PHONE]!"


def test_null_and_subset(spark):
    row = _one(spark, None).select(pii.redact_pii(F.col("t")).alias("r")).first()
    assert row.r is None
    s = "a@b.co and 10.1.1.1"
    assert _red(spark, s, kinds=["ipv4"]) == "a@b.co and [IP]"
    # caller order must not change semantics (canonical order applies)
    assert _red(spark, s, kinds=["ipv4", "email"]) == _red(spark, s, kinds=["email", "ipv4"])
    with pytest.raises(ValueError):
        pii.redact_pii(F.col("t"), kinds=["passport"])


def test_counts_sum_to_redactions(spark):
    s = "a@b.co c@d.org 123-45-6789 call 555-123-4567 ip 10.0.0.1"
    r = (
        _one(spark, s)
        .select(pii.pii_counts(F.col("t")).alias("c"))
        .select("c.*")
        .first()
    )
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (2, 1, 1, 1)


def test_redaction_is_map_only(spark):
    from real_estate_bigdata_spark.plans import assert_plan
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert_plan(
        docs.select("doc_id", pii.redact_pii(F.col("text")).alias("t")),
        max_shuffles=0,
        forbid_python=True,
    )


class TestLuhnCards:
    """r11: Luhn-validated card handling — checksum algebra vs a
    pure-Python mirror, check-digit inverse property, candidate window
    semantics, NULL contract, map-only plan."""

    @staticmethod
    def _py_luhn_ok(s: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - (9 if d > 4 else 0)
            total += d
        return len(s) > 0 and total % 10 == 0

    def test_luhn_valid_matches_python_mirror(self, spark):
        import random

        rng = random.Random(5)
        nums = ["".join(rng.choice("0123456789") for _ in range(n))
                for n in (13, 15, 16, 19) for _ in range(25)]
        df = spark.createDataFrame([(s,) for s in nums], "d string")
        got = {r.d: r.v for r in df.select(
            "d", pii.luhn_valid(F.col("d")).alias("v")).collect()}
        for s in nums:
            assert got[s] == self._py_luhn_ok(s), s

    def test_check_digit_inverse_property(self, spark):
        import random

        rng = random.Random(9)
        bases = ["4" + "".join(rng.choice("0123456789") for _ in range(14))
                 for _ in range(50)]
        df = spark.createDataFrame([(s,) for s in bases], "b string")
        full = df.select(
            F.concat("b", pii.luhn_check_digit(F.col("b"))).alias("f")
        )
        ok = full.select(pii.luhn_valid(F.col("f")).alias("v")).collect()
        assert all(r.v for r in ok)

    def test_report_separates_valid_invalid_and_windows(self, spark):
        rows = [
            # one valid (known test PAN), one invalid (bumped digit)
            ("pay 4532015112830366 ref 4532015112830367", 2, 1),
            # spaced + dashed formats strip to the same valid PAN
            ("a 4532 0151 1283 0366 b 4532-0151-1283-0367 c", 2, 1),
            # 20-digit run: no candidate window can match it
            ("ts 20260815190000123456", 0, 0),
            # 12-digit run: below the candidate floor
            ("id 123456789012", 0, 0),
            ("no digits at all", 0, 0),
            (None, None, None),
        ]
        df = spark.createDataFrame(
            [(t,) for t, _, _ in rows], "t string"
        ).select("t", pii.credit_card_report(F.col("t")).alias("r"))
        got = {r.t: (r.r.n_card_candidates, r.r.n_cards_valid)
               for r in df.collect()}
        for t, n, v in rows:
            assert got[t] == (n, v), t

    def test_card_audit_plan_is_jvm_only(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        import __spark_entry__ as entry_mod

        assert_plan(
            entry_mod.queries()["q_credit_card_audit"](
                spark, "/root/testdata/sf0.001"
            ),
            max_shuffles=0,
            forbid_python=True,
            min_scans_with_pushdown=1,
        )


def test_luhn_detects_every_single_digit_error(spark):
    """Property (ISO/IEC 7812 guarantee): the Luhn checksum detects ALL
    single-digit substitution errors — any one-digit mutation of a
    valid number must fail validation."""
    import random

    rng = random.Random(77)
    rows = []
    for _ in range(20):
        base = "4" + "".join(rng.choice("0123456789") for _ in range(14))
        rows.append(("b", base))
    df = spark.createDataFrame(rows, "tag string, b string")
    valid = [
        r.f
        for r in df.select(
            F.concat("b", pii.luhn_check_digit(F.col("b"))).alias("f")
        ).collect()
    ]
    mutated = []
    for s in valid:
        pos = rng.randrange(len(s))
        new_d = rng.choice([d for d in "0123456789" if d != s[pos]])
        mutated.append(s[:pos] + new_d + s[pos + 1:])
    mdf = spark.createDataFrame([(m,) for m in mutated], "d string")
    got = mdf.select(pii.luhn_valid(F.col("d")).alias("v")).collect()
    assert all(r.v is False for r in got)
