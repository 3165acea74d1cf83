"""Pure-Python XXH64 == Spark xxhash64 (the simulator's key contract)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from __spider_spark.functions.hashing import spark_xxhash64_str, xxh64


def test_known_vectors():
    # spot values for each length class (computed once vs Spark, pinned)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert spark_xxhash64_str("") == -7444071767201028348


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=100))
def test_xxh64_stable(s):
    assert spark_xxhash64_str(s) == spark_xxhash64_str(s)


def test_matches_spark(spark):
    samples = (
        ["", "a", "ab", "abc", "abcd", "abcde", "http://example.com/p1",
         "漢字テスト", "x" * 7, "x" * 8, "x" * 15, "x" * 16, "x" * 31,
         "x" * 32, "x" * 33, "x" * 100, "mixed 漢字 and ascii 123"]
    )
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == spark_xxhash64_str(s), repr(s)
