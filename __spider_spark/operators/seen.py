"""URL-seen set: partitioned Bloom pre-filter + anti-join ground truth.

Reference analogue: Scrapy's RFPDupeFilter is *disabled* on every request
(``dont_filter=True``, /root/reference/spiders/ctripSpider.py:225,
ylSpider06.py:278) and the durable seen-record is a Redis set sink
(YlTwistPipeline.py:66-89; membership helpers redisUtil.py:74-112). At
10^10-URL scale a driver-side set is impossible; the engine uses:

  candidates LEFT ANTI JOIN seen ON url_hash          -- exact, distributed

with a **partitioned Bloom filter** broadcast to executors as a cheap
pre-filter: rows whose key the Bloom rejects are *definitely unseen* and
skip the join's shuffle; only "maybe seen" rows (true positives + FPR)
enter the anti-join. No false negatives by construction (property-tested).

Sizing at 10^10 URLs (SURVEY.md §7 hard part (c)): one monolithic bitmap
does not fit a broadcast, so the filter is partitioned by
``pmod(url_hash, P)``; each scheduling round only needs the partitions that
its candidate hash-range touches, and the filter is REBUILT from the ``seen``
table on restart rather than checkpointed (bitmaps are derived state).
Within the sandbox all P partitions are built and broadcast together.

Bloom math: m bits for n keys at target FPR p -> m = -n ln p / (ln 2)^2,
k = m/n ln 2 hash probes, double-hashing g_i = h1 + i*h2 from the single
xxhash64 key (Kirsch-Mitzenmacher), so no re-hashing of strings.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


class Bloom:
    """Vectorized numpy Bloom filter over int64 keys (viewed as uint64)."""

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        assert n_bits % 64 == 0
        self.m = n_bits
        self.k = n_hashes
        self.words = bits if bits is not None else np.zeros(n_bits // 64, dtype=np.uint64)

    @classmethod
    def sized(cls, n_keys: int, fpr: float = 0.01) -> "Bloom":
        n_keys = max(n_keys, 1)
        m = int(-n_keys * math.log(fpr) / (math.log(2) ** 2))
        m = max(64, ((m + 63) // 64) * 64)
        k = max(1, round(m / n_keys * math.log(2)))
        return cls(m, min(k, 16))

    def _probe(self, keys: np.ndarray) -> list[np.ndarray]:
        u = keys.astype(np.int64).view(np.uint64)
        h1 = u % np.uint64(self.m)
        h2 = ((u >> np.uint64(33)) | np.uint64(1)) % np.uint64(self.m)
        return [(h1 + np.uint64(i) * h2) % np.uint64(self.m) for i in range(self.k)]

    def add_many(self, keys: np.ndarray) -> None:
        for g in self._probe(keys):
            np.bitwise_or.at(
                self.words, (g >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (g & np.uint64(63)),
            )

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        out = np.ones(len(keys), dtype=bool)
        for g in self._probe(keys):
            w = self.words[(g >> np.uint64(6)).astype(np.int64)]
            out &= (w >> (g & np.uint64(63))) & np.uint64(1) != 0
        return out

    def merge(self, other: "Bloom") -> "Bloom":
        assert self.m == other.m and self.k == other.k
        return Bloom(self.m, self.k, self.words | other.words)


def build_partitioned_bloom(
    seen: DataFrame,
    n_parts: int = 16,
    bits_per_part: int = 1 << 20,
    n_hashes: int = 7,
    key_col: str = "url_hash",
) -> dict[int, bytes]:
    """Distributed Bloom build: one bitmap per pmod(url_hash, P) partition,
    built executor-side via applyInPandas, returned as {part: packed bytes}.
    At 10^10 scale these bitmaps live in the lakehouse per partition and are
    broadcast selectively; here they come back to the driver (P × m/8 bytes,
    e.g. 16 × 128 KiB)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        b = Bloom(bits_per_part, n_hashes)
        b.add_many(pdf[key_col].to_numpy(dtype=np.int64))
        part = int(pdf["__part"].iloc[0])
        return pd.DataFrame({"part": [part], "bits": [b.words.tobytes()]})

    rows = (
        seen.select(key_col)
        .withColumn("__part", F.pmod(F.col(key_col), F.lit(n_parts)))
        .groupBy("__part")
        .applyInPandas(build, schema="part int, bits binary")
        .collect()
    )
    return {r["part"]: bytes(r["bits"]) for r in rows}


def bloom_maybe_seen_udf(
    spark: SparkSession,
    parts: dict[int, bytes],
    n_parts: int,
    bits_per_part: int = 1 << 20,
    n_hashes: int = 7,
):
    """Arrow-batched predicate: True = maybe seen (must go to anti-join),
    False = definitely unseen (skips the join)."""
    bc = spark.sparkContext.broadcast(parts)

    @pandas_udf(BooleanType())
    def maybe_seen(keys: pd.Series) -> pd.Series:
        local = {
            p: Bloom(bits_per_part, n_hashes,
                     np.frombuffer(raw, dtype=np.uint64))
            for p, raw in bc.value.items()
        }
        arr = keys.to_numpy(dtype=np.int64)
        part = np.mod(arr, n_parts)
        part = np.where(part < 0, part + n_parts, part)
        out = np.zeros(len(arr), dtype=bool)
        for p in np.unique(part):
            b = local.get(int(p))
            if b is None:
                continue
            idx = part == p
            out[idx] = b.contains_many(arr[idx])
        return pd.Series(out)

    return maybe_seen


class SeenBloom:
    """Driver-maintained partitioned Bloom over the seen-set.

    Incremental: each round's newly-seen keys (budget-bounded, already on
    the driver for metrics) are folded in without touching the cluster;
    on restart the filter is REBUILT from the seen table (bitmaps are
    derived state — never checkpointed, SURVEY.md §7 hard part (c))."""

    def __init__(self, n_parts: int = 16, bits_per_part: int = 1 << 20,
                 n_hashes: int = 7):
        self.n_parts = n_parts
        self.bits = bits_per_part
        self.k = n_hashes
        self.parts: dict[int, Bloom] = {}
        self.n_keys = 0

    def update(self, keys) -> None:
        arr = np.asarray(list(keys), dtype=np.int64)
        if len(arr) == 0:
            return
        part = np.mod(arr, self.n_parts)
        part = np.where(part < 0, part + self.n_parts, part)
        for p in np.unique(part):
            b = self.parts.setdefault(int(p), Bloom(self.bits, self.k))
            b.add_many(arr[part == p])
        self.n_keys += len(arr)

    def delta_raw(self, newly_seen: DataFrame) -> dict[int, bytes]:
        """Executor-built partition bitmaps for a round's newly-seen keys
        (same surface as cuckoo.SeenCuckoo.delta_raw, so the crawl plan
        dispatches on the configured filter without branching)."""
        return build_partitioned_bloom(
            newly_seen, self.n_parts, self.bits, self.k)

    def merge_raw(self, raw: dict[int, bytes], n_new: int) -> None:
        """Fold executor-built partition bitmaps (the per-round delta) into
        the driver state — bitwise OR, so merge order is irrelevant."""
        for p, b in raw.items():
            delta = Bloom(self.bits, self.k,
                          np.frombuffer(b, dtype=np.uint64).copy())
            cur = self.parts.get(p)
            self.parts[p] = delta if cur is None else cur.merge(delta)
        self.n_keys += n_new

    def rebuild(self, seen: DataFrame, key_col: str = "url_hash") -> None:
        raw = build_partitioned_bloom(seen, self.n_parts, self.bits,
                                      self.k, key_col)
        self.parts = {
            p: Bloom(self.bits, self.k,
                     np.frombuffer(b, dtype=np.uint64).copy())
            for p, b in raw.items()
        }
        self.n_keys = seen.count()

    def udf(self, spark: SparkSession):
        return bloom_maybe_seen_udf(
            spark, {p: b.words.tobytes() for p, b in self.parts.items()},
            self.n_parts, self.bits, self.k)


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom_udf=None,
    key_col: str = "url_hash",
) -> DataFrame:
    """candidates ∖ seen. Exactness comes from the anti-join; the Bloom
    routes definitely-unseen rows around it (SURVEY.md §2.3 J6)."""
    if seen is None:
        return candidates
    if bloom_udf is None:
        return candidates.join(seen.select(key_col), key_col, "left_anti")
    flagged = candidates.withColumn("__maybe", bloom_udf(F.col(key_col)))
    sure_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
    maybe = flagged.filter(F.col("__maybe")).drop("__maybe")
    return sure_new.unionByName(
        maybe.join(seen.select(key_col), key_col, "left_anti")
    )
