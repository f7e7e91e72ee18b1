"""Loader tests against fabricated on-disk fixtures matching the
reference's pickle/file layouts (reference datasets/*.py)."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from dtlr_tpu.data.loaders import (
    IAM,
    READ,
    RIMES,
    Cipher,
    build_dataset,
    permuted_latin_charset,
)


def _write_img(path, w=60, h=20):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (w, h), (200, 200, 200)).save(path)


def test_iam_loader(tmp_path):
    root = tmp_path
    labels = {
        "charset": None,
        "ground_truth": {
            "train": [{"id": "a01-000u-00", "text": "A MOVE", "folder": "a01-000u"}],
            "valid": [{"id": "v01-000-00", "text": "hi", "folder": "v01"}],
            "test": [],
        },
    }
    os.makedirs(root / "IAM_new")
    with open(root / "IAM_new" / "labels.pkl", "wb") as fh:
        pickle.dump(labels, fh)
    _write_img(str(root / "IAM_new" / "data" / "imgs" / "lines" / "a01-000u-00.jpg"))

    ds = IAM(str(root), "train")
    assert len(ds) == 1
    s = ds[0]
    assert s["text"] == "A MOVE"
    assert s["image"].shape == (20, 60, 3)
    # labels are charset indices incl. the space (idx 165)
    assert 165 in s["labels"].tolist()
    # 'val' aliases 'valid'
    assert len(IAM(str(root), "val")) == 1


def test_read_loader_codepoints_and_hyphen(tmp_path):
    root = tmp_path
    charset_cp = [ord(c) for c in "abc¬ "]
    labels = {
        "charset": charset_cp,
        "ground_truth": {
            "valid": [{"idx": 7, "text": "ab¬c"}],
            "train": [], "test": [],
        },
    }
    os.makedirs(root / "READ_2016")
    with open(root / "READ_2016" / "labels.pkl", "wb") as fh:
        pickle.dump(labels, fh)
    _write_img(str(root / "READ_2016" / "images" / "valid" / "7.jpeg"))

    ds = READ(str(root), "val")
    s = ds[0]
    # '¬' dropped (reference READ.py:68-69)
    assert s["labels"].tolist() == [0, 1, 2]


def test_cipher_copiale_tokens(tmp_path):
    root = tmp_path
    labels = {
        "charset": ["sym_a", "sym_b", "dot"],
        "ground_truth": {
            "test": [{"id": "page1.tif", "text": "sym_a dot sym_b"}],
            "train": [], "valid": [],
        },
    }
    os.makedirs(root / "old_cipher")
    with open(root / "old_cipher" / "labels_Copiale.pkl", "wb") as fh:
        pickle.dump(labels, fh)
    _write_img(str(root / "copiale" / "images" / "page1.tif"))

    ds = Cipher(str(root), "test", "copiale")
    s = ds[0]
    assert s["labels"].tolist() == [0, 2, 1]
    assert ds.token_based


def test_permuted_latin_charset_deterministic():
    a = permuted_latin_charset()
    b = permuted_latin_charset()
    assert a == b and len(a) == 166 and " " in a


def test_build_dataset_registry_errors():
    with pytest.raises(ValueError):
        build_dataset("nope", "train")
