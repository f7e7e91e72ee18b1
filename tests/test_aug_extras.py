"""Tests for the round-2 augmentation/synthetic-fidelity additions:
Rotate with box rotation (vs the reference sltransform.rotate oracle),
RandomSizeCrop box semantics, the scales2 chain, font category/ability
sampling, and wikitext corpus cleanup."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from dtlr_tpu.data import transforms as T
from dtlr_tpu.data.corpus import CorpusSampler, clean_wikitext_line, truncate_line
from dtlr_tpu.data.fonts import (
    ABILITY_NUMBERS,
    ABILITY_SYMBOLS,
    CATEGORIES,
    FontSampler,
    categorize_system_fonts,
)


# ---------------------------------------------------------------- rotate

def test_rotate_boxes_match_reference_oracle():
    torch = pytest.importorskip("torch")
    from torch_ref import load_reference

    load_reference()
    import datasets.sltransform as slt
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.random((60, 200, 3)).astype(np.float32)
    boxes = np.asarray(
        [[10, 12, 30, 40], [50, 5, 90, 55], [120, 20, 160, 45]], np.float32
    )
    angle = 7.0

    ours_img, ours_boxes = T.rotate_with_boxes(img, boxes, angle)

    pil = Image.fromarray((img * 255).astype(np.uint8))
    ref_img, ref_boxes = slt.rotate(pil, torch.from_numpy(boxes), angle)
    np.testing.assert_allclose(ours_boxes, ref_boxes.numpy(), atol=0.51)
    assert ours_img.shape == img.shape
    ref_arr = np.asarray(ref_img, np.float32) / 255.0
    # same pixels up to uint8 quantization + PIL resampling
    assert np.abs(ours_img - ref_arr).mean() < 0.02


def test_rotate_zero_angle_identity():
    rng = np.random.default_rng(1)
    img = rng.random((40, 80, 3)).astype(np.float32)
    boxes = np.asarray([[5, 5, 20, 30]], np.float32)
    out, b = T.rotate_with_boxes(img, boxes, 0.0)
    np.testing.assert_allclose(b, boxes, atol=1e-3)


# ------------------------------------------------------------------ crop

def test_crop_with_boxes_clamps_and_drops():
    img = np.zeros((50, 100, 3), np.float32)
    boxes = np.asarray(
        [[10, 10, 30, 30],   # inside
         [0, 0, 5, 5],       # fully left of region -> dropped
         [35, 20, 60, 45]],  # straddles right edge -> clamped
        np.float32,
    )
    labels = np.asarray([1, 2, 3], np.int32)
    out, b, l = T.crop_with_boxes(img, boxes, labels, (5, 8, 40, 40))
    assert out.shape == (40, 40, 3)
    assert l.tolist() == [1, 3]
    np.testing.assert_allclose(b[0], [2, 5, 22, 25])
    np.testing.assert_allclose(b[1], [27, 15, 40, 40])


def test_scales2_chain_shapes():
    rng = np.random.default_rng(2)
    img = rng.random((80, 300, 3)).astype(np.float32)
    boxes = np.asarray([[20, 10, 60, 70], [100, 10, 150, 70]], np.float32)
    labels = np.asarray([4, 5], np.int32)
    out, b, l = T.scales2_chain(
        rng, img, boxes, labels, [100, 120], (64, 140), [96], 640
    )
    assert out.ndim == 3 and min(out.shape[:2]) == 96
    assert (b is None) or len(b) == len(l)


def test_prepare_sample_scales2_and_rotate():
    from dtlr_tpu.data.batching import prepare_sample

    rng = np.random.default_rng(3)
    img = rng.random((64, 256, 3)).astype(np.float32)
    boxes = np.asarray([[10, 10, 40, 50], [60, 10, 100, 50]], np.float32)
    labels = np.asarray([1, 2], np.int32)
    out, b, l = prepare_sample(
        rng, img, boxes, 128, 1024, train=True, labels=labels,
        rotate_p=1.0, rotate_angle=5.0, scales2=([100, 140], (64, 200)),
    )
    assert out.ndim == 3
    assert b is None or ((b >= -1e-4).all() and (b <= 1 + 1e-4).all())
    assert l is None or len(l) <= 2


# ----------------------------------------------------------------- fonts

def test_font_sampler_from_reference_json_falls_back():
    sampler = FontSampler.from_reference_json(
        "/root/reference/datasets/dictionnary_category_ability_paths.json",
        font_root="/nonexistent",
        rng=np.random.default_rng(0),
    )
    # reference font files absent -> every bucket falls back to real
    # system fonts, sampling never fails
    for _ in range(20):
        p = sampler.sample(ABILITY_SYMBOLS)
        assert os.path.exists(p)
        p = sampler.sample(ABILITY_NUMBERS)
        assert os.path.exists(p)


def test_font_sampler_category_mix():
    bank = {
        c: {ABILITY_SYMBOLS: [f"{c}.ttf"], ABILITY_NUMBERS: [f"{c}.ttf"]}
        for c in CATEGORIES
    }
    s = FontSampler(bank, rng=np.random.default_rng(0))
    draws = [s.sample(ABILITY_SYMBOLS) for _ in range(4000)]
    hw = sum(d.startswith("HANDWRITING") for d in draws) / len(draws)
    # reference sample_d_fonts: 50% handwriting
    assert 0.45 < hw < 0.55
    others = {d.split(".")[0] for d in draws if not d.startswith("HANDWRITING")}
    assert others == {"SANS_SERIF", "MONOSPACE", "SERIF", "DISPLAY"}


def test_categorize_system_fonts_nonempty():
    cats = categorize_system_fonts(
        ["/x/DejaVuSansMono.ttf", "/x/DejaVuSerif.ttf", "/x/DejaVuSans.ttf"]
    )
    assert all(cats[c] for c in CATEGORIES)
    assert "/x/DejaVuSansMono.ttf" in cats["MONOSPACE"]
    assert "/x/DejaVuSerif.ttf" in cats["SERIF"]


# ---------------------------------------------------------------- corpus

def test_clean_wikitext_line():
    s = "The cat , sat . It was ( very ) good @-@ looking : yes 3 @.@ 5"
    out = clean_wikitext_line(s)
    assert " ," not in out and " ." not in out and " :" not in out
    assert "(very)" in out.replace(" very ", "very")  # parens tightened
    assert "good-looking" in out
    assert "3.5" in out


def test_truncate_line_caps_at_100():
    rng = np.random.default_rng(0)
    long = " ".join(["word"] * 100)
    for _ in range(20):
        t = truncate_line(long, rng)
        assert 1 < len(t) <= 100


def test_corpus_sampler_skips_headers():
    lines = [" = Heading = \n", "A real sentence about things .\n"]
    cs = CorpusSampler(lines, rng=np.random.default_rng(0))
    for _ in range(10):
        assert not cs.sample().startswith(" =")


def test_generator_reference_text_mode():
    from dtlr_tpu.data.synthetic import SyntheticLineGenerator

    gen = SyntheticLineGenerator(
        seed=0, reference_text_mode=True,
        font_sampler=FontSampler.from_system_fonts(rng=np.random.default_rng(0)),
        plain_background=True,
    )
    for _ in range(5):
        s = gen.sample()
        assert 0 < len(s.text) <= 100
        assert len(s.labels) == len(s.text)
