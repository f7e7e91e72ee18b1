"""Synthetic Chinese (CASIA HWDB) line generator from GNT glyph files.

Mirrors reference datasets/HWDB_Synth.py:36-306: parses the CASIA GNT
binary format (little-endian records: sample_size u32, tag GBK u16,
width u16, height u16, bitmap bytes; :60-93), composes 5-80 random
glyphs into a line with random offsets and per-glyph boxes (:96-151),
then applies a random 1.5-2x anisotropic upscale (:177-189).
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def parse_gnt(path: str, max_samples: Optional[int] = None):
    """Yield (char, bitmap uint8 (h, w)) records from one .gnt file."""
    out = []
    with open(path, "rb") as fh:
        while True:
            header = fh.read(10)
            if len(header) < 10:
                break
            size, tag, w, h = struct.unpack("<I2sHH", header)
            bitmap = np.frombuffer(fh.read(w * h), np.uint8).reshape(h, w)
            try:
                char = tag.decode("gbk")
            except UnicodeDecodeError:
                continue
            out.append((char, bitmap))
            if max_samples and len(out) >= max_samples:
                break
    return out


class GlyphBank:
    """char -> list of glyph bitmaps, built from a folder of .gnt files."""

    def __init__(self, gnt_dir: str, max_per_file: Optional[int] = None):
        self.glyphs: Dict[str, List[np.ndarray]] = {}
        for name in sorted(os.listdir(gnt_dir)):
            if not name.lower().endswith(".gnt"):
                continue
            for char, bmp in parse_gnt(os.path.join(gnt_dir, name), max_per_file):
                self.glyphs.setdefault(char, []).append(bmp)
        self.chars = sorted(self.glyphs)

    def sample(self, rng: np.random.Generator, char: Optional[str] = None):
        if char is None:
            char = self.chars[rng.integers(0, len(self.chars))]
        cands = self.glyphs[char]
        return char, cands[rng.integers(0, len(cands))]


class SyntheticHWDBGenerator:
    """Infinite sampler of synthetic Chinese line images with boxes."""

    def __init__(
        self,
        root: str = "./data",
        gnt_dir: Optional[str] = None,
        charset: Optional[Sequence[str]] = None,
        seed: int = 0,
        glyphs_per_line: Tuple[int, int] = (5, 80),
        bank: Optional[GlyphBank] = None,
    ):
        self.bank = bank or GlyphBank(gnt_dir or os.path.join(root, "HWDB_gnt"))
        self.charset = list(charset) if charset is not None else self.bank.chars
        self.index = {c: i for i, c in enumerate(self.charset)}
        self.rng = np.random.default_rng(seed)
        self.glyphs_per_line = glyphs_per_line

    def sample(self) -> dict:
        rng = self.rng
        n = int(rng.integers(*self.glyphs_per_line))
        glyphs, chars = [], []
        usable = [c for c in self.bank.chars if c in self.index]
        for _ in range(n):
            c = usable[rng.integers(0, len(usable))]
            _, bmp = self.bank.sample(rng, c)
            glyphs.append(bmp)
            chars.append(c)

        h_max = max(g.shape[0] for g in glyphs) + 20
        total_w = sum(g.shape[1] for g in glyphs) + 10 * n + 20
        canvas = np.full((h_max, total_w), 255, np.uint8)
        boxes = []
        x = 10
        for g in glyphs:
            gh, gw = g.shape
            dy = int(rng.integers(0, max(1, h_max - gh)))
            dx = int(rng.integers(0, 8))
            x0 = min(x + dx, total_w - gw)
            canvas[dy : dy + gh, x0 : x0 + gw] = np.minimum(
                canvas[dy : dy + gh, x0 : x0 + gw], g
            )
            boxes.append([x0, dy, x0 + gw, dy + gh])
            x = x0 + gw + int(rng.integers(2, 12))

        # random anisotropic upscale (reference :177-189)
        from PIL import Image

        fx, fy = rng.uniform(1.5, 2.0), rng.uniform(1.5, 2.0)
        new_w, new_h = int(total_w * fx), int(h_max * fy)
        img = Image.fromarray(canvas).resize((new_w, new_h), Image.BILINEAR)
        scale = np.asarray([fx, fy, fx, fy], np.float32)
        boxes = np.asarray(boxes, np.float32) * scale

        arr = np.asarray(img, np.float32) / 255.0
        arr = np.stack([arr] * 3, axis=-1)
        labels = np.asarray([self.index[c] for c in chars], np.int32)
        return {"image": arr, "labels": labels, "boxes": boxes, "text": "".join(chars)}

    def __iter__(self):
        while True:
            yield self.sample()
