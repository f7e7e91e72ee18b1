"""Procedural document-like canvas backgrounds.

The reference composites text onto crops of real background images plus
noise patterns from a resources/ folder (reference
datasets/generate_canva.py:94-246). Those assets are not shipped; this
module generates equivalent document-looking backgrounds procedurally:
paper-tone base with low-frequency shading, optional stains/holes noise
patches, global blur and occasional grayscale conversion.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFilter

# pool of pre-rendered base backgrounds, mirroring the reference's fixed
# background-image folder (generate_canva.py samples crops from a static
# resources/ pool); regenerating low-frequency shading per line image is
# the single-core host's hottest path otherwise
_BG_POOL: list = []
_BG_POOL_SIZE = 48
_BG_SIZE = (768, 448)  # (w, h) master backgrounds, cropped per request


_BG_DIR: list = [None]


def set_background_dir(path) -> None:
    """Point the canvas at a real background-image pool (the reference's
    resources/ folder semantics, generate_canva.py:94-136). None reverts
    to procedural backgrounds. Clears the pool."""
    _BG_DIR[0] = path
    _BG_POOL.clear()


def _load_background_image(rng: np.random.Generator, path: str) -> Image.Image:
    """Reference background prep (generate_canva.py:94-136): load, resize
    to the master size, random HSV hue shift (color blend), flip, blur."""
    img = Image.open(path).convert("RGB").resize(_BG_SIZE, Image.BILINEAR)
    if rng.random() < 0.5:  # BACKGROUND_COLOR_BLEND_FREQ
        import colorsys

        arr = np.asarray(img, np.float32) / 255.0
        # cheap hue rotation without cv2: rotate RGB channels toward a
        # random hue by matrix blend
        hue = rng.uniform(0, 1)
        r, g, b = colorsys.hsv_to_rgb(hue, 0.5, 1.0)
        tint = np.asarray([r, g, b], np.float32)
        arr = np.clip(arr * 0.6 + arr.mean(-1, keepdims=True) * tint * 0.4, 0, 1)
        img = Image.fromarray((arr * 255).astype(np.uint8))
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return img.filter(ImageFilter.GaussianBlur(rng.uniform(0.2, 1.5)))


def _build_pool(rng: np.random.Generator):
    if _BG_DIR[0]:
        import glob as _glob
        import os as _os

        paths = sorted(
            p
            for ext in ("*.jpg", "*.jpeg", "*.png")
            for p in _glob.glob(_os.path.join(_BG_DIR[0], "**", ext), recursive=True)
        )
        while paths and len(_BG_POOL) < _BG_POOL_SIZE:
            p = paths[rng.integers(0, len(paths))]
            try:
                _BG_POOL.append(_load_background_image(rng, p))
            except Exception:
                paths.remove(p)
    while len(_BG_POOL) < _BG_POOL_SIZE:
        _BG_POOL.append(generate_background(rng, *_BG_SIZE))


def pooled_background(rng: np.random.Generator, w: int, h: int) -> Image.Image:
    """Random crop (+flip/brightness jitter) of a pooled background."""
    _build_pool(rng)
    base = _BG_POOL[rng.integers(0, len(_BG_POOL))]
    bw, bh = base.size
    if w <= bw and h <= bh:
        x = int(rng.integers(0, bw - w + 1))
        y = int(rng.integers(0, bh - h + 1))
        out = base.crop((x, y, x + w, y + h))
    else:
        out = base.resize((w, h), Image.BILINEAR)
    if rng.random() < 0.5:
        out = out.transpose(Image.FLIP_LEFT_RIGHT)
    if rng.random() < 0.3:
        arr = np.asarray(out, np.float32) + rng.uniform(-15, 15)
        out = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
    return out


def generate_background(rng: np.random.Generator, w: int, h: int) -> Image.Image:
    base = np.asarray(
        [rng.integers(185, 250), rng.integers(175, 245), rng.integers(160, 235)],
        np.float32,
    )
    img = np.ones((h, w, 3), np.float32) * base[None, None, :]

    # low-frequency shading: a few random smooth gradients
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(rng.integers(1, 4)):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        sx = rng.uniform(w * 0.3, w * 1.5)
        sy = rng.uniform(h * 0.3, h * 1.5)
        amp = rng.uniform(-25, 25)
        img += amp * np.exp(
            -(((xx - cx) / sx) ** 2 + ((yy - cy) / sy) ** 2)
        )[:, :, None]

    # fine grain noise
    img += rng.normal(0, rng.uniform(1, 6), (h, w, 1)).astype(np.float32)
    pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
    if rng.random() < 0.3:
        pil = pil.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 1.2)))
    return pil


def add_noise_patterns(rng: np.random.Generator, img: Image.Image) -> Image.Image:
    """0-5 stains / holes / phantom marks with rotation+opacity
    (reference generate_canva.py:142-219)."""
    w, h = img.size
    overlay = Image.new("RGBA", (w, h), (0, 0, 0, 0))
    draw = ImageDraw.Draw(overlay)
    for _ in range(rng.integers(0, 6)):
        kind = rng.choice(["stain", "hole", "streak"])
        opacity = int(rng.integers(20, 90))
        shade = int(rng.integers(0, 120))
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        if kind == "stain":
            rx, ry = rng.uniform(5, w * 0.08), rng.uniform(5, h * 0.4)
            draw.ellipse([cx - rx, cy - ry, cx + rx, cy + ry],
                         fill=(shade, shade, shade, opacity))
        elif kind == "hole":
            r = rng.uniform(2, min(w, h) * 0.05)
            bright = int(rng.integers(200, 255))
            draw.ellipse([cx - r, cy - r, cx + r, cy + r],
                         fill=(bright, bright, bright, opacity + 60))
        else:  # streak
            x2, y2 = cx + rng.uniform(-w * 0.3, w * 0.3), cy + rng.uniform(-10, 10)
            draw.line([cx, cy, x2, y2], fill=(shade, shade, shade, opacity),
                      width=int(rng.integers(1, 4)))
    overlay = overlay.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 2.0)))
    return Image.alpha_composite(img.convert("RGBA"), overlay).convert("RGB")


def compose_canvas(
    rng: np.random.Generator, text_layer: Image.Image
) -> Image.Image:
    """Paste an RGBA text layer onto a generated background; global blur
    and 50% grayscale (reference generate_canva.py:229-246)."""
    w, h = text_layer.size
    bg = pooled_background(rng, w, h)
    if rng.random() < 0.5:
        bg = add_noise_patterns(rng, bg)
    canvas = bg.convert("RGBA")
    canvas.alpha_composite(text_layer)
    canvas = canvas.convert("RGB")
    if rng.random() < 0.5:
        canvas = canvas.filter(ImageFilter.GaussianBlur(rng.uniform(0.2, 1.0)))
    if rng.random() < 0.5:
        canvas = canvas.convert("L").convert("RGB")
    return canvas
