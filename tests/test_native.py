import numpy as np
import pytest

from dtlr_tpu.runtime import native
from dtlr_tpu.eval.metrics import edit_operations, levenshtein


def test_native_builds():
    assert native.available(), "native lib should compile in this image"


def test_native_levenshtein_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = list(rng.choice(list("abcdef"), rng.integers(0, 30)))
        b = list(rng.choice(list("abcdef"), rng.integers(0, 30)))
        assert native.levenshtein(a, b) == levenshtein(a, b)


def test_native_edit_ops_match_python():
    rng = np.random.default_rng(1)
    for _ in range(10):
        a = list(rng.choice(list("abcd"), rng.integers(0, 15)))
        b = list(rng.choice(list("abcd"), rng.integers(0, 15)))
        # distances must agree; op splits can differ between equally
        # optimal backtraces, so compare totals and each component's
        # consistency with the distance
        sn, dn, in_ = native.edit_ops(a, b)
        sp, dp, ip = edit_operations(a, b)
        assert sn + dn + in_ == sp + dp + ip == levenshtein(a, b)


def test_native_resize_close_to_pil():
    from dtlr_tpu.data.transforms import _interp_resize

    rng = np.random.default_rng(2)
    img = rng.random((40, 90, 3)).astype(np.float32)
    out = native.resize_bilinear(img, 80, 200)
    assert out is not None and out.shape == (80, 200, 3)
    ref = _interp_resize(img, 80, 200)
    # PIL quantizes via uint8; allow that tolerance
    assert np.abs(out - ref).mean() < 0.01


def test_normalize_into():
    rng = np.random.default_rng(3)
    src = rng.random((10, 20, 3)).astype(np.float32)
    dst = np.zeros((16, 32, 3), np.float32)
    ok = native.normalize_into(src, dst)
    assert ok
    want = (src - np.asarray([0.485, 0.456, 0.406], np.float32)) / np.asarray(
        [0.229, 0.224, 0.225], np.float32
    )
    np.testing.assert_allclose(dst[:10, :20], want, rtol=1e-5, atol=1e-6)
    assert (dst[10:] == 0).all() and (dst[:, 20:] == 0).all()
