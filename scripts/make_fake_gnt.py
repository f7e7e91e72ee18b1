"""Build a small synthetic GNT glyph bank for the on-chip HWDB smoke.

The sandbox ships the HWDB charset pickle but no CASIA .gnt assets, so
glyph bitmaps here are procedural stroke doodles (random polylines on a
64x64 grid) written in the exact CASIA GNT record format the parser
reads (reference datasets/HWDB_Synth.py:60-93: u32 size, GBK tag u16,
w u16, h u16, bitmap). The point of the smoke is the 7356-class head +
chinese metric path on the real chip, not glyph realism.

Usage: python scripts/make_fake_gnt.py <out_dir> [n_chars] [per_char]
"""

import os
import pickle
import struct
import sys

import numpy as np


def draw_glyph(rng: np.random.Generator, size: int = 56) -> np.ndarray:
    img = np.full((size, size), 255, np.uint8)
    for _ in range(int(rng.integers(3, 8))):  # strokes
        x0, y0, x1, y1 = rng.integers(4, size - 4, 4)
        n = max(abs(int(x1) - int(x0)), abs(int(y1) - int(y0))) + 1
        xs = np.linspace(x0, x1, n).astype(int)
        ys = np.linspace(y0, y1, n).astype(int)
        t = int(rng.integers(1, 4))
        for dx in range(-t, t + 1):
            img[np.clip(ys + dx, 0, size - 1), xs] = 0
            img[ys, np.clip(xs + dx, 0, size - 1)] = 0
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
        for c, tag in picked:
            for _ in range(per_char):
                bmp = draw_glyph(rng)
                h, w = bmp.shape
                fh.write(struct.pack("<I2sHH", 10 + w * h, tag, w, h))
                fh.write(bmp.tobytes())
    print(f"wrote {path}: {len(picked)} chars x {per_char}")


if __name__ == "__main__":
    main()
