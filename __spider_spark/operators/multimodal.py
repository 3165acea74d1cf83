"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The image/audio codec libraries are
NOT in this container, so the decode kernels are STUBBED behind
``SPIDER_SPARK_FAKE_DECODE`` (deterministic fake) or raise
NotImplementedError — but the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested: swapping in PIL/ffmpeg
touches only ``_decode_image_bytes``.

Design rules for the 100 TB case:
  * payloads travel in their own column so scheduling/metadata queries
    never deserialize them (column pruning);
  * ``mapInPandas`` (not a scalar UDF) so one Python worker call handles a
    whole Arrow batch and can drop/expand rows (e.g. frame sampling);
  * ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory —
    with ~1 MiB payloads set it to ~64, not the 10k default.
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, note string"


def _decode_image_bytes(payload: bytes, fake: bool) -> tuple[int, int, list[float]]:
    """Decode an image payload -> (width, height, 8-dim feature).

    STUB: real impl uses PIL/opencv (absent in this container). With
    ``fake`` a deterministic stand-in derives the values from the payload
    hash, keeping every byte of the distributed plumbing exercised;
    otherwise this raises, exactly like a missing codec would."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "set SPIDER_SPARK_FAKE_DECODE=1 for the deterministic stub"
        )
    h = hashlib.blake2b(payload, digest_size=40).digest()
    w = 1 + h[0] % 64
    ht = 1 + h[1] % 64
    feat = [v / 255.0 for v in h[2:10]]
    return w, ht, feat


def decode_features(media: DataFrame, fake: bool | None = None) -> DataFrame:
    """mapInPandas decode stage: binary payload -> feature vector.

    ``fake`` is resolved DRIVER-side at plan time (env vars set after worker
    daemons start are not visible executor-side) and baked into the closure."""
    if fake is None:
        fake = os.environ.get("SPIDER_SPARK_FAKE_DECODE") == "1"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, notes = [], []
            for payload in pdf["payload"]:
                try:
                    _, _, f = _decode_image_bytes(bytes(payload), fake)
                    feats.append(f)
                    notes.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    notes.append("codec_missing")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "note": notes,
            })

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes + a fake
    header carrying the 'true' metadata, so tests can assert round-trips)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                body = hashlib.blake2b(
                    f"{seed}:media:{int(i)}".encode(), digest_size=32
                ).digest() * 4
                w, h = 1 + body[0] % 64, 1 + body[1] % 64
                payload = struct.pack("<II", w, h) + body
                rows.append({
                    "media_id": int(i),
                    "kind": ("image", "audio", "video")[int(i) % 3],
                    "payload": payload,
                    "meta": {"width": w, "height": h,
                             "sample_rate": 16000, "n_frames": 1 + int(i) % 30},
                })
            yield pd.DataFrame(rows)

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)
