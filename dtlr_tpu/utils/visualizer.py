"""Detection visualization: render predicted/GT char boxes on images.

Covers reference util/visualizer.py:60-144 (COCOVisualizer) and the
per-epoch snapshot hook (reference engine.py:134-159 save_snapchot):
denormalize the image, draw cxcywh boxes with charset labels, save png.
Uses PIL (matplotlib-free) for the 1-core host.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def denormalize(image: np.ndarray) -> np.ndarray:
    """(H, W, 3) normalized -> uint8."""
    img = image * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def draw_boxes(
    image: np.ndarray,              # (H, W, 3) normalized or uint8
    boxes_cxcywh: np.ndarray,       # (n, 4) normalized to valid area
    labels: Optional[Sequence[int]] = None,
    charset: Optional[Sequence[str]] = None,
    valid_hw: Optional[Sequence[int]] = None,
    color=(255, 40, 40),
):
    from PIL import Image, ImageDraw

    if image.dtype != np.uint8:
        image = denormalize(image)
    h, w = image.shape[:2]
    vh, vw = (valid_hw if valid_hw is not None else (h, w))
    pil = Image.fromarray(image)
    draw = ImageDraw.Draw(pil)
    for i, (cx, cy, bw, bh) in enumerate(np.asarray(boxes_cxcywh, np.float32)):
        x0 = (cx - bw / 2) * vw
        x1 = (cx + bw / 2) * vw
        y0 = (cy - bh / 2) * vh
        y1 = (cy + bh / 2) * vh
        draw.rectangle([x0, y0, x1, y1], outline=color, width=1)
        if labels is not None and charset is not None:
            lab = int(labels[i])
            if 0 <= lab < len(charset):
                draw.text((x0, max(0, y0 - 10)), charset[lab], fill=color)
    return pil


def save_snapshot(
    out_dir: str,
    epoch: int,
    image: np.ndarray,
    pred_boxes: np.ndarray,
    pred_labels: Sequence[int],
    charset: Sequence[str],
    valid_hw=None,
    gt_boxes: Optional[np.ndarray] = None,
):
    """First-val-batch snapshot per epoch (reference engine.py:405-409)."""
    os.makedirs(out_dir, exist_ok=True)
    pil = draw_boxes(image, pred_boxes, pred_labels, charset, valid_hw)
    if gt_boxes is not None and len(gt_boxes):
        pil = draw_boxes(np.asarray(pil), gt_boxes, valid_hw=valid_hw,
                         color=(40, 120, 255))
    path = os.path.join(out_dir, f"snapshot_epoch{epoch:04d}.png")
    pil.save(path)
    return path
