"""Golden-parity test (SURVEY §5.2): the reference ships exactly one
executable oracle — the Hadoop Streaming mapper/reducer pair
(`batch_jobs/listing_count_by_district/{mapper,reducer}.py`). Run those
scripts verbatim as subprocesses (stdin JSONL -> mapper -> sort ->
reducer, which is precisely what Hadoop Streaming does) and diff the
engine's `count_by_key` output against them on a fixture that exercises
every edge the scripts handle: Vietnamese diacritics, missing field,
null field, whitespace-only, empty string, malformed JSON, blank
lines, and whitespace padding that only the trim semantics unify."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

from real_estate_bigdata_spark.operators.aggregates import count_by_key

REF = Path("/root/reference/batch_jobs/listing_count_by_district")

FIXTURE_DISTRICTS = [
    "Đống Đa",
    "Đống Đa",
    "  Đống Đa  ",      # trims to the same key
    "Thanh Xuân",
    "Gò Vấp",
    "Gò Vấp",
    "Gò Vấp",
    "",                  # dropped: empty
    "   ",               # dropped: whitespace-only
    None,                # dropped: null
]


def _fixture_lines() -> list[str]:
    lines = []
    for d in FIXTURE_DISTRICTS:
        lines.append(json.dumps({"quan_huyen": d, "price": 1.0}, ensure_ascii=False))
    lines.append(json.dumps({"other_field": "x"}))  # missing key -> dropped
    lines.append("this is not json {{{")            # malformed -> dropped
    lines.append("")                                 # blank line -> skipped
    return lines


def _run_reference_pipeline(lines: list[str]) -> dict[str, int]:
    mapped = subprocess.run(
        [sys.executable, str(REF / "mapper.py")],
        input="\n".join(lines),
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # Hadoop Streaming sort-shuffles mapper output by key before reduce
    shuffled = "\n".join(sorted(ln for ln in mapped.splitlines() if ln))
    reduced = subprocess.run(
        [sys.executable, str(REF / "reducer.py")],
        input=shuffled,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    out = {}
    for ln in reduced.splitlines():
        k, v = ln.split("\t")
        out[k] = int(v)
    return out


@pytest.mark.skipif(not REF.exists(), reason="reference tree absent")
def test_count_by_key_matches_reference_mapreduce(spark, tmp_path):
    lines = _fixture_lines()
    expected = _run_reference_pipeline(lines)
    assert expected == {"Đống Đa": 3, "Thanh Xuân": 1, "Gò Vấp": 3}

    src = tmp_path / "listings.jsonl"
    src.write_text("\n".join(lines), encoding="utf-8")
    df = spark.read.schema("quan_huyen string, price double").json(str(src))
    got = {
        r.quan_huyen: r.so_luong
        for r in count_by_key(df, "quan_huyen").collect()
    }
    assert got == expected
