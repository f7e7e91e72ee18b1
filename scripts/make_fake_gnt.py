"""Build a small synthetic GNT glyph bank for the on-chip HWDB runs.

The sandbox ships the HWDB charset pickle but no CASIA .gnt assets, so
glyph bitmaps here are procedural stroke glyphs written in the exact
CASIA GNT record format the parser reads (reference
datasets/HWDB_Synth.py:60-93: u32 size, GBK tag u16, w u16, h u16,
bitmap).

Glyphs are CLASS-CONSISTENT: each char has a deterministic stroke
skeleton (endpoints drawn from a per-char RNG) and every exemplar is
that skeleton under instance-level jitter (endpoint noise, stroke
thickness, small shear) — mirroring how real handwriting exposes a
stable shape->class function with writer variation. The round-4
hwdb_diag on the first (fully random doodle) bank proved the 7356-class
head had learned the active-set prior but *could not* learn class
identity because exemplars of one char shared no shape (rank of the GT
class ~uniform within the active set after 36k steps).

Usage: python scripts/make_fake_gnt.py <out_dir> [n_chars] [per_char]
"""

import os
import pickle
import struct
import sys

import numpy as np


def char_skeleton(char_rng: np.random.Generator, size: int = 56) -> np.ndarray:
    """Deterministic per-char stroke skeleton: (n_strokes, 4) endpoints."""
    n_strokes = int(char_rng.integers(3, 8))
    return char_rng.integers(6, size - 6, (n_strokes, 4)).astype(np.float64)


def draw_glyph(
    skeleton: np.ndarray, inst_rng: np.random.Generator, size: int = 56
) -> np.ndarray:
    """Render one exemplar: the char's skeleton under instance jitter."""
    img = np.full((size, size), 255, np.uint8)
    pts = skeleton + inst_rng.normal(0.0, 1.8, skeleton.shape)
    shear = inst_rng.normal(0.0, 0.06)  # slight italic-style slant
    t = int(inst_rng.integers(1, 4))  # per-exemplar pen thickness
    for x0, y0, x1, y1 in pts:
        x0 += shear * (y0 - size / 2)
        x1 += shear * (y1 - size / 2)
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.clip(np.linspace(x0, x1, n), 0, size - 1).astype(int)
        ys = np.clip(np.linspace(y0, y1, n), 0, size - 1).astype(int)
        for d in range(-t, t + 1):
            img[np.clip(ys + d, 0, size - 1), xs] = 0
            img[ys, np.clip(xs + d, 0, size - 1)] = 0
    return img


def main():
    out_dir = sys.argv[1]
    n_chars = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    per_char = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.makedirs(out_dir, exist_ok=True)

    with open("/root/reference/data/HWDB_v1/charset.pkl", "rb") as fh:
        cps = pickle.load(fh)
    chars = [chr(c) if isinstance(c, int) else c for c in cps]
    rng = np.random.default_rng(0)
    # spread picked chars across the whole 7356-class label space, keep
    # only those with a 2-byte GBK encoding (the GNT tag field is u16)
    picked = []
    for i in np.linspace(0, len(chars) - 1, n_chars * 2).astype(int):
        c = chars[i]
        try:
            tag = c.encode("gbk")
        except UnicodeEncodeError:
            continue
        if len(tag) == 2:
            picked.append((c, tag))
        if len(picked) >= n_chars:
            break

    path = os.path.join(out_dir, "fake000.gnt")
    with open(path, "wb") as fh:
        for ci, (c, tag) in enumerate(picked):
            # per-char deterministic skeleton; exemplars jitter around it
            skeleton = char_skeleton(np.random.default_rng(100_003 + ci))
            for _ in range(per_char):
                bmp = draw_glyph(skeleton, rng)
                h, w = bmp.shape
                fh.write(struct.pack("<I2sHH", 10 + w * h, tag, w, h))
                fh.write(bmp.tobytes())
    print(f"wrote {path}: {len(picked)} chars x {per_char}")


if __name__ == "__main__":
    main()
