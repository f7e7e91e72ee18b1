"""Bucketed static-shape batching.

The reference pads each batch to its own max H/W (reference
util/misc.py:375-397 NestedTensor) — dynamic shapes, one CUDA graph per
batch. On TPU each distinct shape is a compiled program, so batches are
padded to a small set of *buckets*:

- one random min-side scale is drawn per batch from the augmentation
  scale list (the reference draws per sample; drawing per batch keeps
  intra-batch sizes aligned and padding waste low)
- images are resized (aspect-preserving, max_size cap), augmented,
  normalized, then padded to (bucket_h, W_max)
- bucket_h is the next multiple of ``h_quant`` >= batch max height, so
  jit compiles a handful of programs

Targets are padded to ``max_targets`` with a validity mask. Box coords
stay normalized to the *unpadded* resized image (the model's
valid-ratio machinery expects exactly this, reference
deformable_transformer.py:239-246).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Iterable, Iterator, List, Optional, Sequence

import numpy as np

from . import transforms as T


@dataclass
class Batch:
    images: np.ndarray     # (B, H, W, 3) float32, ImageNet-normalized
    valid_hw: np.ndarray   # (B, 2) int32
    labels: np.ndarray     # (B, N) int32
    boxes: np.ndarray      # (B, N, 4) float32 normalized cxcywh
    valid: np.ndarray      # (B, N) bool
    texts: List[str] = field(default_factory=list)


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def prepare_sample(
    rng: np.random.Generator,
    image: np.ndarray,            # (H, W, 3) float32 [0,1]
    boxes: Optional[np.ndarray],  # (n, 4) pixel xyxy or None
    scale: int,
    max_size: int,
    train: bool,
    truly_random_erasing: bool = False,
    instance_erasing: bool = False,
    labels: Optional[np.ndarray] = None,
    space_label: int = 165,
    strong_aug: bool = False,
    rotate_p: float = 0.0,
    rotate_angle: float = 10.0,
    scales2: Optional[tuple] = None,   # (scales2_resize, scales2_crop)
    h_max: Optional[int] = None,
):
    if train and rotate_p > 0 and rng.random() < rotate_p:
        # box-rotating Rotate (reference sltransform.py:60-169; carried
        # but disabled in the reference's live text stacks)
        image, boxes = T.rotate_with_boxes(image, boxes, rotate_angle)
    if train and scales2 is not None and rng.random() < 0.5:
        # alternate branch: resize -> random crop -> resize (reference
        # transforms.py RandomSelect + scales2_* keys, live in coco.py)
        img, bx, labels = T.scales2_chain(
            rng, image, boxes, labels, scales2[0], scales2[1],
            [scale], max_size,
        )
    else:
        img, bx = T.resize_min_side(image, boxes, scale, max_size)
    if h_max is not None and img.shape[0] > h_max:
        # pathological tall-narrow samples (a 1-word line on a tall
        # canvas) otherwise mint a fresh giant (H-bucket, W-max) program
        # per occurrence — one such 576x1024 batch OOM-killed a full
        # Latin train-step compile at 26G HBM. Squash height, keep width.
        s = h_max / img.shape[0]
        img = T._interp_resize(img, h_max, max(1, int(round(img.shape[1] * s))))
        if bx is not None and len(bx):
            bx = bx * s
    if train:
        if strong_aug:
            # photometric augs only under strong_aug (reference
            # IAM.py:166-190 SLT.RandomSelectMulti)
            pick = rng.integers(0, 3)
            if pick == 0:
                img = T.lighting_noise(rng, img)
            elif pick == 1:
                img = T.adjust_brightness_contrast(rng, img, contrast=(1.0, 1.0))
            else:
                img = T.adjust_brightness_contrast(rng, img, brightness=(1.0, 1.0))
        if truly_random_erasing:
            # 5x full-vertical column erases (reference IAM.py:146-149:
            # RandomErasingFullVertical(p=0.5, scale=(0.01,0.04), ratio=(3,6)) x5)
            for _ in range(5):
                img = T.random_erasing_full_vertical(
                    rng, img, p=0.5, n_range=(1, 3), width_frac=(0.005, 0.03)
                )
        if instance_erasing and bx is not None and labels is not None:
            img = T.instance_aware_erasing(rng, img, bx, labels, space_label)
        # 4x RandomErasing(p=0.5, scale=(0.005,0.05), ratio=(5,6))
        # (reference IAM.py:205-210)
        for _ in range(4):
            img = T.random_erasing(rng, img, p=0.5, scale=(0.005, 0.05), ratio=(5.0, 6.0))
    # pixel normalization is fused into collate (C++ normalize_into
    # writes ImageNet-normalized pixels straight into the padded batch
    # buffer, runtime/native.cpp); only boxes are converted here
    bx = T.normalize_boxes(bx, img.shape[0], img.shape[1])
    return img, bx, labels


def collate(
    samples: Sequence[dict],
    max_targets: int,
    w_max: int = 1344,
    h_quant: int = 64,
    pad_value: float = 0.0,
    normalize_pixels: bool = True,
    as_uint8: bool = False,
) -> Batch:
    """samples: dicts with image (H,W,3) raw [0,1] float32 (ImageNet
    normalization is fused into the padded-buffer write here, via the
    C++ normalize_into when built), boxes (n,4) cxcywh normalized or
    None, labels (n,), text. Pass normalize_pixels=False for
    already-normalized images.

    ``as_uint8`` ships raw uint8 pixels instead (4x smaller host->device
    transfer); normalization then happens on device (ops/pixels.py
    prep_images), with identical semantics."""
    from ..runtime import native

    B = len(samples)
    hmax = _round_up(max(s["image"].shape[0] for s in samples), h_quant)
    wmax = w_max

    if as_uint8:
        images = np.zeros((B, hmax, wmax, 3), np.uint8)
    else:
        images = np.full((B, hmax, wmax, 3), pad_value, np.float32)
    valid_hw = np.zeros((B, 2), np.int32)
    labels = np.zeros((B, max_targets), np.int32)
    boxes = np.zeros((B, max_targets, 4), np.float32)
    valid = np.zeros((B, max_targets), bool)
    texts = []
    for i, s in enumerate(samples):
        img = s["image"]
        h, w = img.shape[:2]
        if w > wmax:  # safety: crop overly wide images
            img = img[:, :wmax]
            w = wmax
        if as_uint8:
            np.clip(img * 255.0 + 0.5, 0, 255, out=img)
            images[i, :h, :w] = img.astype(np.uint8)
        elif not normalize_pixels:
            images[i, :h, :w] = img
        elif not native.normalize_into(
            np.ascontiguousarray(img, np.float32), images[i]
        ):
            from .transforms import IMAGENET_MEAN, IMAGENET_STD

            images[i, :h, :w] = (img - IMAGENET_MEAN) / IMAGENET_STD
        valid_hw[i] = (h, w)
        lab = np.asarray(s.get("labels", []), np.int32).reshape(-1)
        n = min(len(lab), max_targets)
        labels[i, :n] = lab[:n]
        if s.get("boxes") is not None and len(s["boxes"]):
            boxes[i, :n] = np.asarray(s["boxes"], np.float32)[:n]
        valid[i, :n] = True
        texts.append(s.get("text", ""))
    return Batch(images, valid_hw, labels, boxes, valid, texts)


class BucketBatcher:
    """Iterator producing Batches from a sample source.

    ``source`` yields dicts {image [0,1] float32 HWC, boxes pixel-xyxy
    or None, labels, text}. A background thread keeps ``prefetch``
    batches ready (replaces the reference's 10 DataLoader workers,
    main_synthetic.py:214-217, on the 1-core TPU host).
    """

    def __init__(
        self,
        source: Iterable[dict],
        batch_size: int,
        scales: Sequence[int],
        max_size: int = 1333,
        max_targets: int = 256,
        w_max: int = 1344,
        h_quant: int = 64,
        train: bool = True,
        truly_random_erasing: bool = False,
        instance_erasing: bool = False,
        space_label: int = 165,
        strong_aug: bool = False,
        rotate_p: float = 0.0,
        rotate_angle: float = 10.0,
        scales2: Optional[tuple] = None,
        h_max: Optional[int] = None,
        seed: int = 0,
        prefetch: int = 4,
        transfer_uint8: bool = False,
        reuse: int = 1,
        reuse_pool: int = 512,
    ):
        self.rotate_p = rotate_p
        self.rotate_angle = rotate_angle
        self.scales2 = scales2
        self.h_max = h_max
        self.source = iter(source)
        self.batch_size = batch_size
        self.scales = list(scales)
        self.max_size = max_size
        self.max_targets = max_targets
        self.w_max = w_max
        self.h_quant = h_quant
        self.train = train
        self.truly_random_erasing = truly_random_erasing
        self.strong_aug = strong_aug
        self.instance_erasing = instance_erasing
        self.space_label = space_label
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.transfer_uint8 = transfer_uint8
        # Sample reuse: the reference regenerates 5000 synthetic lines
        # per epoch and sweeps them ~10x within the epoch
        # (reference main_synthetic.py:383 + epoch loop), i.e. each
        # rendered line is seen multiple times with fresh augmentation.
        # ``reuse`` > 1 reproduces that economy on the 1-core host: each
        # fresh sample enters a bounded pool and each batch slot draws a
        # fresh sample with probability 1/reuse, otherwise a pooled one
        # (augmentation in prepare_sample still differs every time).
        self.reuse = max(1, int(reuse))
        self._pool: List[dict] = []
        self._pool_cap = int(reuse_pool)
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stop = False

    def _make_batch(self) -> Batch:
        scale = int(self.rng.choice(self.scales)) if self.train else self.scales[-1]
        prepared = []
        while len(prepared) < self.batch_size:
            if (
                self.reuse > 1
                and self._pool
                and self.rng.random() > 1.0 / self.reuse
            ):
                raw = self._pool[int(self.rng.integers(len(self._pool)))]
            else:
                raw = next(self.source)
                if self.reuse > 1:
                    if len(self._pool) < self._pool_cap:
                        self._pool.append(raw)
                    else:
                        self._pool[int(self.rng.integers(self._pool_cap))] = raw
            img, bx, lab = prepare_sample(
                self.rng,
                raw["image"],
                raw.get("boxes"),
                scale,
                self.max_size,
                self.train,
                self.truly_random_erasing,
                self.instance_erasing,
                labels=np.asarray(raw.get("labels", []), np.int32),
                space_label=self.space_label,
                strong_aug=self.strong_aug,
                rotate_p=self.rotate_p,
                rotate_angle=self.rotate_angle,
                scales2=self.scales2,
                h_max=self.h_max,
            )
            prepared.append({
                "image": img,
                "boxes": bx,
                "labels": lab if lab is not None else raw.get("labels", []),
                "text": raw.get("text", ""),
            })
        return collate(prepared, self.max_targets, self.w_max, self.h_quant,
                       as_uint8=self.transfer_uint8)

    def _put(self, item) -> bool:
        """Bounded put that re-checks _stop so stop() can unblock a
        worker stuck on a full queue."""
        while not self._stop:
            try:
                self._queue.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        while not self._stop:
            try:
                if not self._put(self._make_batch()):
                    return
            except StopIteration:
                self._put(None)
                return
            except Exception as exc:  # surface errors to the consumer
                self._put(exc)
                return

    def __iter__(self) -> Iterator[Batch]:
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        while True:
            batch = self._queue.get()
            if batch is None:
                return
            if isinstance(batch, Exception):
                raise batch
            yield batch

    def stop(self):
        self._stop = True
        # drain so a worker blocked in put() observes _stop and exits
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        if self._thread is not None:
            self._thread.join(timeout=2.0)
