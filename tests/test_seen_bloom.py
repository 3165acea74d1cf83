"""URL-seen: Bloom FPR/no-false-negatives + anti-join soundness (SURVEY §5.1/.5)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from __spider_spark.operators.seen import (
    Bloom,
    bloom_maybe_seen_udf,
    build_partitioned_bloom,
    filter_unseen,
)


def test_bloom_no_false_negatives_and_fpr():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    b = Bloom.sized(len(keys), fpr=0.01)
    b.add_many(keys)
    assert b.contains_many(keys).all()  # zero false negatives
    probe = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    novel = probe[~np.isin(probe, keys)]
    fpr = b.contains_many(novel).mean()
    assert fpr < 0.03, fpr


def test_bloom_merge_associative():
    rng = np.random.default_rng(7)
    a_keys = rng.integers(0, 2**62, 1000, dtype=np.int64)
    b_keys = rng.integers(0, 2**62, 1000, dtype=np.int64)
    a = Bloom(1 << 14, 5); a.add_many(a_keys)
    b = Bloom(1 << 14, 5); b.add_many(b_keys)
    ab = a.merge(b)
    both = Bloom(1 << 14, 5); both.add_many(np.concatenate([a_keys, b_keys]))
    assert (ab.words == both.words).all()


def test_filter_unseen_exact(spark):
    cand = spark.range(0, 1000).select(
        (F.col("id") * 7919).alias("url_hash"), F.col("id").alias("payload"))
    seen = spark.range(0, 500).select((F.col("id") * 2 * 7919).alias("url_hash"))
    # plain anti-join
    plain = filter_unseen(cand, seen)
    assert plain.count() == 500
    assert plain.filter(F.col("url_hash") % (2 * 7919) == 0).count() == 0
    # bloom-prefiltered path must give the identical set
    parts = build_partitioned_bloom(seen, n_parts=4, bits_per_part=1 << 14)
    udf = bloom_maybe_seen_udf(spark, parts, 4, 1 << 14)
    with_bloom = filter_unseen(cand, seen, udf)
    assert with_bloom.select("url_hash").exceptAll(
        plain.select("url_hash")).count() == 0
    assert plain.select("url_hash").exceptAll(
        with_bloom.select("url_hash")).count() == 0
