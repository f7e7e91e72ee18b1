import io
import os
import struct

import numpy as np
import pytest

from dtlr_tpu.data.batching import BucketBatcher, collate, prepare_sample
from dtlr_tpu.data.synthetic import SyntheticLineGenerator, discover_fonts
from dtlr_tpu.data import transforms as T


def test_fonts_available():
    assert len(discover_fonts()) > 0


def test_synthetic_sample_roundtrip():
    gen = SyntheticLineGenerator(seed=0, max_words=4)
    s = gen.sample()
    assert s.image.ndim == 3 and s.image.shape[2] == 3
    assert s.image.dtype == np.float32
    assert len(s.labels) == len(s.text) == len(s.boxes)
    # boxes within image bounds, x monotonic-ish (advance-based)
    h, w = s.image.shape[:2]
    assert (s.boxes[:, 0] <= s.boxes[:, 2]).all()
    assert (s.boxes[:, 2] <= w + 1e-3).all()
    # decoded text matches labels through the charset
    assert "".join(gen.charset[i] for i in s.labels) == s.text


def test_resize_min_side_cap():
    img = np.zeros((60, 1200, 3), np.float32)
    boxes = np.asarray([[0, 0, 1200, 60]], np.float32)
    out, b = T.resize_min_side(img, boxes, 480, 1333)
    h, w = out.shape[:2]
    # the reference's rounding can overshoot max_size by a few px
    # (min-side is rounded first); parity keeps that behavior
    assert 1320 <= w <= 1344
    assert abs(h - round(60 * w / 1200)) <= 1
    assert abs(b[0, 2] - w) < 2


def test_collate_static_shapes():
    gen = SyntheticLineGenerator(seed=1, max_words=3)
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(3):
        s = gen.sample()
        img, bx, lab = prepare_sample(
            rng, s.image, s.boxes, 480, 1333, train=True, labels=s.labels
        )
        samples.append({"image": img, "boxes": bx, "labels": lab, "text": s.text})
    batch = collate(samples, max_targets=64, w_max=1344, h_quant=64)
    B, H, W, C = batch.images.shape
    assert B == 3 and W == 1344 and H % 64 == 0 and C == 3
    assert batch.labels.shape == (3, 64)
    assert batch.boxes.shape == (3, 64, 4)
    # normalized boxes in [0, 1]
    v = batch.valid
    assert (batch.boxes[v] >= -1e-4).all() and (batch.boxes[v] <= 1 + 1e-4).all()
    for i in range(3):
        n = v[i].sum()
        assert n == min(len(samples[i]["labels"]), 64)


def test_bucket_batcher_iterates():
    gen = SyntheticLineGenerator(seed=2, max_words=2)
    batcher = BucketBatcher(
        iter(gen), batch_size=2, scales=[480], max_targets=32, prefetch=1, seed=0
    )
    it = iter(batcher)
    b1 = next(it)
    b2 = next(it)
    assert b1.images.shape[0] == 2 and b2.images.shape[0] == 2
    batcher.stop()


def test_gnt_parser(tmp_path):
    from dtlr_tpu.data.hwdb_synth import GlyphBank, SyntheticHWDBGenerator, parse_gnt

    # write a tiny synthetic GNT file with 3 glyphs
    rng = np.random.default_rng(0)
    path = tmp_path / "sample.gnt"
    chars = ["一", "二", "三"]
    with open(path, "wb") as fh:
        for c in chars:
            w, h = int(rng.integers(20, 40)), int(rng.integers(20, 40))
            bmp = rng.integers(0, 256, (h, w), np.uint8)
            tag = c.encode("gbk")
            fh.write(struct.pack("<I2sHH", 10 + w * h, tag, w, h))
            fh.write(bmp.tobytes())
    recs = parse_gnt(str(path))
    assert [c for c, _ in recs] == chars

    bank = GlyphBank(str(tmp_path))
    gen = SyntheticHWDBGenerator(bank=bank, seed=0, glyphs_per_line=(3, 6))
    s = gen.sample()
    assert s["image"].ndim == 3
    assert len(s["labels"]) == len(s["boxes"])
    assert set(s["text"]) <= set(chars)


def test_font_filter_rejects_inkless_fonts():
    # matplotlib's STIXNonUni*/DejaVu*Display fonts return (w, 0) masks
    # for every latin glyph: they pass a size==(0,0) test but draw
    # nothing. These produced ~21% fully blank labelled lines (the
    # nms_cer 0.225 plateau — 43/200 eval lines decoded empty).
    import glob as g
    from PIL import ImageFont
    from dtlr_tpu.data.synthetic import _font_supports, discover_fonts

    broken = [p for p in g.glob(
        "/opt/venv/lib/**/mpl-data/fonts/ttf/STIXNonUni*.ttf", recursive=True)]
    for p in broken:
        f = ImageFont.truetype(p, 36)
        assert not _font_supports(f, "abcXYZ09"), p
    for name in ("STIXNonUni", "SansDisplay", "SerifDisplay"):
        assert all(name not in p or not _font_supports(
            ImageFont.truetype(p, 36), "abcXYZ09") for p in discover_fonts())


def test_synthetic_samples_always_have_ink():
    import numpy as np
    from dtlr_tpu.data.charset import DEFAULT_CHARSET_NO_ACCENT, load_default_charset
    from dtlr_tpu.data.synthetic import SyntheticLineGenerator

    gen = SyntheticLineGenerator(
        charset=load_default_charset(DEFAULT_CHARSET_NO_ACCENT),
        seed=123, max_words=5)
    for _ in range(40):
        s = gen.sample()
        # visible ink: a labelled line must never be a blank canvas
        assert float(np.asarray(s.image).std()) > 0.02, s.text


def test_general_generator_honors_restricted_charset():
    # pretrain.py passes synthetic_charset through to the general
    # generator (and re-derives num_classes from it) so a
    # charset-restricted pretrain checkpoint can be reloaded by the
    # standalone evaluator, which builds its generator from the same
    # config key (evaluate.py:192-204). Regression for the round-4
    # label_enc (67,32)-vs-(168,32) reload failure.
    from dtlr_tpu.data.charset import resolve_synthetic_charset
    from dtlr_tpu.data.loaders import build_dataset

    cs = resolve_synthetic_charset("no_accent_space")
    gen = build_dataset("synthetic_line_OCR_general", "train",
                        charset=cs, seed=7, max_words=4)
    assert gen.charset == cs and len(cs) == 65
    allowed = set(cs)
    for _ in range(10):
        s = gen.sample()
        assert s.labels.max(initial=0) < len(cs)
        assert set(s.text) <= allowed, s.text
