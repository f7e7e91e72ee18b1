"""Image/box transforms, numpy-based (host side).

Covers the behavioral surface of reference datasets/transforms.py:
- aspect-preserving RandomResize with min-side scale list and max_size
  cap (transforms.py:78-107, 209-217)
- Normalize: ImageNet stats + boxes -> normalized cxcywh (552-568)
- RandomErasing (304-311), RandomErasingFullVertical — full-height
  column masking that forces an implicit LM (252-301),
  InstanceAwareRandomErasing — word-level erasing from char boxes
  (324-531)
- photometric: brightness/contrast (sltransform.py:14-36), channel
  permute (38-57), gaussian blur (543-549)

All functions take/return numpy arrays: image (H, W, 3) float32 in
[0, 1]; boxes (N, 4) in *pixel xyxy* until ``normalize`` converts them.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _interp_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize. Upscales go through the C++ host kernel when
    built (runtime/native.cpp resize_bilinear_f32 — half-pixel bilinear,
    identical to PIL's triangle filter when scaling up, and skips the
    float->uint8 quantization round-trip). Downscales keep PIL, whose
    triangle filter antialiases (area-average) like torchvision."""
    h, w = img.shape[:2]
    if out_h >= h and out_w >= w:
        from ..runtime import native

        out = native.resize_bilinear(np.ascontiguousarray(img, np.float32),
                                     out_h, out_w)
        if out is not None:
            return out
    from PIL import Image

    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    pil = pil.resize((out_w, out_h), Image.BILINEAR)
    return np.asarray(pil, np.float32) / 255.0


def normalize_boxes(boxes, h: int, w: int):
    """Pixel xyxy -> normalized cxcywh (the box half of ``normalize``)."""
    if boxes is None or len(boxes) == 0:
        return boxes
    b = boxes.astype(np.float32)
    cx = (b[:, 0] + b[:, 2]) / 2 / w
    cy = (b[:, 1] + b[:, 3]) / 2 / h
    bw = (b[:, 2] - b[:, 0]) / w
    bh = (b[:, 3] - b[:, 1]) / h
    return np.stack([cx, cy, bw, bh], -1)


def resize_min_side(img, boxes, size: int, max_size: int | None = 1333):
    """Scale so the short side == size, capped so the long side <= max_size
    (reference transforms.py:78-107 get_size_with_aspect_ratio)."""
    h, w = img.shape[:2]
    min_orig, max_orig = min(h, w), max(h, w)
    if max_size is not None and size / min_orig * max_orig > max_size:
        size = int(round(max_size * min_orig / max_orig))
    if min_orig == h:
        out_h, out_w = size, int(round(size * w / h))
    else:
        out_w, out_h = size, int(round(size * h / w))
    out = _interp_resize(img, out_h, out_w)
    scale = np.asarray([out_w / w, out_h / h, out_w / w, out_h / h], np.float32)
    return out, (boxes * scale if boxes is not None and len(boxes) else boxes)


def normalize(img, boxes):
    """ImageNet-normalize; boxes pixel-xyxy -> normalized cxcywh."""
    h, w = img.shape[:2]
    out = (img - IMAGENET_MEAN) / IMAGENET_STD
    if boxes is not None and len(boxes):
        b = boxes.astype(np.float32)
        cx = (b[:, 0] + b[:, 2]) / 2 / w
        cy = (b[:, 1] + b[:, 3]) / 2 / h
        bw = (b[:, 2] - b[:, 0]) / w
        bh = (b[:, 3] - b[:, 1]) / h
        boxes = np.stack([cx, cy, bw, bh], -1)
    return out.astype(np.float32), boxes


def random_erasing(rng: np.random.Generator, img, p=0.5, scale=(0.02, 0.33),
                   ratio=(0.3, 3.3), value="random"):
    """torchvision-style RandomErasing (reference transforms.py:304-311)."""
    if rng.random() > p:
        return img
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = rng.uniform(*scale) * area
        r = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        eh = int(round(np.sqrt(target * r)))
        ew = int(round(np.sqrt(target / r)))
        if eh < h and ew < w and eh > 0 and ew > 0:
            y = rng.integers(0, h - eh)
            x = rng.integers(0, w - ew)
            img = img.copy()
            if value == "random":
                img[y : y + eh, x : x + ew] = rng.random((eh, ew, 3), dtype=np.float32)
            else:
                img[y : y + eh, x : x + ew] = value
            return img
    return img


def random_erasing_full_vertical(rng, img, p=0.9, n_range=(1, 12),
                                 width_frac=(0.005, 0.04)):
    """Full-height column erases (reference RandomErasingFullVertical,
    transforms.py:252-301): the 'masking' that forces an implicit LM."""
    if rng.random() > p:
        return img
    h, w = img.shape[:2]
    img = img.copy()
    for _ in range(rng.integers(n_range[0], n_range[1] + 1)):
        ew = max(1, int(rng.uniform(*width_frac) * w))
        x = rng.integers(0, max(1, w - ew))
        img[:, x : x + ew] = rng.random((h, ew, 3), dtype=np.float32)
    return img


def instance_aware_erasing(rng, img, char_boxes, labels, space_label: int,
                           p=0.5, word_p=0.35):
    """Erase whole words using GT char boxes (reference
    InstanceAwareRandomErasing, transforms.py:324-531): split chars into
    words at space labels, erase each word's bbox with prob word_p."""
    if rng.random() > p or char_boxes is None or len(char_boxes) == 0:
        return img
    img = img.copy()
    h, w = img.shape[:2]
    words, cur = [], []
    for box, lab in zip(char_boxes, labels):
        if lab == space_label:
            if cur:
                words.append(cur)
            cur = []
        else:
            cur.append(box)
    if cur:
        words.append(cur)
    for word in words:
        if rng.random() > word_p or not word:
            continue
        bs = np.asarray(word)
        x0, y0 = bs[:, 0].min(), bs[:, 1].min()
        x1, y1 = bs[:, 2].max(), bs[:, 3].max()
        x0, y0 = max(0, int(x0)), max(0, int(y0))
        x1, y1 = min(w, int(np.ceil(x1))), min(h, int(np.ceil(y1)))
        if x1 > x0 and y1 > y0:
            img[y0:y1, x0:x1] = rng.random((y1 - y0, x1 - x0, 3), dtype=np.float32)
    return img


def rotate_with_boxes(img, boxes, angle: float):
    """Rotate image by ``angle`` degrees (expand, then resize back to the
    original size) and rotate pixel-xyxy boxes to their axis-aligned hull
    (reference sltransform.py:60-169 rotate/Rotate).

    Returns (img, boxes) with the same conventions as the other
    transforms here: float image (H, W, 3) in [0, 1], pixel xyxy boxes.
    """
    from PIL import Image

    h, w = img.shape[:2]
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    rot = pil.rotate(angle, expand=True)

    rad = np.radians(angle)
    a, b = np.cos(rad), np.sin(rad)
    cx, cy = w / 2.0, h / 2.0
    nw, nh = rot.size
    # affine that maps original pixel coords into the expanded canvas
    m = np.asarray(
        [[a, b, (1 - a) * cx - b * cy + (nw / 2.0 - cx)],
         [-b, a, b * cx + (1 - a) * cy + (nh / 2.0 - cy)]],
        np.float64,
    )
    # default (bicubic) resample like the reference's resize((w, h))
    out_img = np.asarray(rot.resize((w, h)), np.float32) / 255.0

    if boxes is None or len(boxes) == 0:
        return out_img, boxes
    bx = np.asarray(boxes, np.float64)
    x1, y1, x2, y2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
    corners = np.stack(
        [np.stack([x1, y1], -1), np.stack([x2, y1], -1),
         np.stack([x1, y2], -1), np.stack([x2, y2], -1)],
        axis=1,
    )  # (N, 4, 2)
    ones = np.ones((*corners.shape[:2], 1))
    rc = np.concatenate([corners, ones], -1) @ m.T  # (N, 4, 2)
    mn, mx = rc.min(axis=1), rc.max(axis=1)
    new = np.concatenate([mn, mx], -1)
    # expanded canvas -> original size
    new /= np.asarray([nw / w, nh / h, nw / w, nh / h])
    new[:, [0, 2]] = np.clip(new[:, [0, 2]], 0, w)
    new[:, [1, 3]] = np.clip(new[:, [1, 3]], 0, h)
    return out_img, new.astype(np.float32)


def crop_with_boxes(img, boxes, labels, region):
    """Crop region (i, j, h, w); clamp boxes to the region and drop
    zero-area ones (reference transforms.py:16-56 crop)."""
    i, j, ch, cw = region
    out = img[i : i + ch, j : j + cw]
    if boxes is None or len(boxes) == 0:
        return out, boxes, labels
    b = np.asarray(boxes, np.float32) - np.asarray([j, i, j, i], np.float32)
    b = b.reshape(-1, 2, 2)
    b = np.minimum(b, np.asarray([cw, ch], np.float32))
    b = np.clip(b, 0, None)
    keep = np.all(b[:, 1] > b[:, 0], axis=1)
    b = b.reshape(-1, 4)
    return out, b[keep], (labels[keep] if labels is not None else None)


def random_size_crop(rng, img, boxes, labels, min_size: int, max_size: int):
    """reference transforms.py:175-185 RandomSizeCrop: random target w/h
    in [min_size, min(dim, max_size)], uniform region."""
    h, w = img.shape[:2]
    cw = int(rng.integers(min_size, min(w, max_size) + 1)) if min(w, max_size) >= min_size else w
    ch = int(rng.integers(min_size, min(h, max_size) + 1)) if min(h, max_size) >= min_size else h
    cw, ch = min(cw, w), min(ch, h)
    i = int(rng.integers(0, h - ch + 1))
    j = int(rng.integers(0, w - cw + 1))
    return crop_with_boxes(img, boxes, labels, (i, j, ch, cw))


def scales2_chain(rng, img, boxes, labels, scales2_resize, scales2_crop,
                  scales, max_size):
    """The reference's alternate augmentation branch
    (datasets/transforms.py RandomResize(scales2_resize) ->
    RandomSizeCrop(*scales2_crop) -> RandomResize(scales, max_size);
    live in datasets/coco.py:505-529, carried disabled in the text
    datasets). Returns (img, boxes, labels)."""
    size = int(scales2_resize[rng.integers(0, len(scales2_resize))])
    img, boxes = resize_min_side(img, boxes, size, max_size=None)
    img, boxes, labels = random_size_crop(
        rng, img, boxes, labels, scales2_crop[0], scales2_crop[1]
    )
    size = int(scales[rng.integers(0, len(scales))])
    img, boxes = resize_min_side(img, boxes, size, max_size=max_size)
    return img, boxes, labels


def adjust_brightness_contrast(rng, img, brightness=(0.8, 1.2), contrast=(0.8, 1.2)):
    img = img * rng.uniform(*brightness)
    mean = img.mean()
    img = (img - mean) * rng.uniform(*contrast) + mean
    return np.clip(img, 0, 1).astype(np.float32)


def lighting_noise(rng, img):
    """Random channel permutation (reference sltransform.py:38-57)."""
    return img[:, :, rng.permutation(3)]


def gaussian_blur(rng, img, sigma=(0.1, 2.0)):
    from PIL import Image, ImageFilter

    s = rng.uniform(*sigma)
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    pil = pil.filter(ImageFilter.GaussianBlur(s))
    return np.asarray(pil, np.float32) / 255.0
