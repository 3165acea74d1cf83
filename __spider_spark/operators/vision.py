"""Non-max suppression over a detections table (SURVEY.md §2.6 O4).

The reference runs YOLO NMS inside its captcha-solving service
(/root/reference/utils/utils.py:230-268 ``non_max_suppression``: per-image
confidence filter, score = obj_conf x best class conf, greedy suppression
of same-class boxes above an IoU threshold, and confidence-WEIGHTED merge
of the suppressed boxes' coordinates). The YOLO *detector* is an ML
service and stays out of scope (COVERAGE.md §2.1 S7/O4) — but NMS itself
is a data operation on a detections relation, and at training-data scale
(dedup of region proposals over 10^9 images) it belongs in the engine.

Spark-first split:
  * everything per-row — confidence filter, xywh→xyxy, class argmax,
    score — is pure Column expressions (whole-stage codegen);
  * the greedy suppress-and-merge loop is inherently sequential *within
    one image* and tiny (≤ a few hundred boxes), so it runs as
    ``applyInPandas`` grouped by image_id — the documented escape hatch
    for custom iterative operators — parallel across images, exact within
    an image.

Determinism: candidate order is (score DESC, det_id ASC); ties cannot
reorder across partitions because the whole group is in one pandas frame.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NMS_SCHEMA = ("image_id long, x1 double, y1 double, x2 double, y2 double, "
              "conf double, class_score double, class_pred int, "
              "n_merged int")


def iou_one(a: tuple, b: tuple) -> float:
    """IoU of two (x1, y1, x2, y2) boxes — reference bbox_iou
    (utils/utils.py:197-227), +1 pixel-inclusive convention dropped in
    favor of continuous coordinates."""
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    denom = area_a + area_b - inter
    return inter / denom if denom > 0 else 0.0


def nms_one(rows: list[dict], nms_thres: float = 0.4) -> list[dict]:
    """Pure-scalar greedy NMS with confidence-weighted merge — the twin
    the Spark operator and the tests share. ``rows`` need keys
    (det_id, x1, y1, x2, y2, conf, class_score, class_pred)."""
    pending = sorted(
        rows, key=lambda r: (-r["conf"] * r["class_score"], r["det_id"]))
    kept: list[dict] = []
    while pending:
        top = pending[0]
        same = [r for r in pending
                if r["class_pred"] == top["class_pred"]
                and iou_one((top["x1"], top["y1"], top["x2"], top["y2"]),
                            (r["x1"], r["y1"], r["x2"], r["y2"]))
                > nms_thres]
        wsum = sum(r["conf"] for r in same) or 1.0
        merged = {
            k: sum(r[k] * r["conf"] for r in same) / wsum
            for k in ("x1", "y1", "x2", "y2")
        }
        kept.append({**merged, "conf": top["conf"],
                     "class_score": top["class_score"],
                     "class_pred": top["class_pred"],
                     "n_merged": len(same)})
        suppressed = {id(r) for r in same}
        pending = [r for r in pending if id(r) not in suppressed]
    return kept


def prepare_detections(
    det: DataFrame, conf_thres: float = 0.5,
    image_col: str = "image_id", id_col: str = "det_id",
) -> DataFrame:
    """Per-row stage, all Column exprs: filter by obj confidence, convert
    (cx, cy, w, h) to corners, argmax the class_scores array. Expects
    columns (image_id, det_id, cx, cy, w, h, obj_conf,
    class_scores: array<double>)."""
    best = F.array_max("class_scores")
    return (
        det.filter(F.col("obj_conf") >= F.lit(conf_thres))
        .select(
            image_col, id_col,
            (F.col("cx") - F.col("w") / 2).alias("x1"),
            (F.col("cy") - F.col("h") / 2).alias("y1"),
            (F.col("cx") + F.col("w") / 2).alias("x2"),
            (F.col("cy") + F.col("h") / 2).alias("y2"),
            F.col("obj_conf").alias("conf"),
            best.alias("class_score"),
            # first index of the max = torch argmax convention
            (F.array_position("class_scores", best) - 1)
            .cast("int").alias("class_pred"),
        )
    )


def nms(det: DataFrame, nms_thres: float = 0.4,
        image_col: str = "image_id") -> DataFrame:
    """Distributed NMS: greedy per image (applyInPandas), parallel across
    images. Input = prepare_detections output."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["image_id", "x1", "y1", "x2", "y2", "conf",
                "class_score", "class_pred", "n_merged"]
        if len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        img = pdf[image_col].iloc[0]
        kept = nms_one(pdf.to_dict("records"), nms_thres)
        out = pd.DataFrame(
            kept, columns=["x1", "y1", "x2", "y2", "conf",
                           "class_score", "class_pred", "n_merged"])
        out.insert(0, "image_id", img)
        return out

    return det.groupBy(image_col).applyInPandas(run, schema=NMS_SCHEMA)
