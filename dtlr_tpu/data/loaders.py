"""Real-dataset loaders (IAM / READ / RIMES / HWDB / borg / copiale /
google1000) + the dataset registry.

Mirrors the on-disk contracts of reference datasets/*.py: the same
pickle label files and image folder layouts, the same charset sources
(including the np.random.seed(0) permuted Latin charset used by
google1000 and as the ciphers' smart-mapping source, reference
datasets/google1000.py:17-26, borg.py:22-29).

Samples are dicts: {image float32 (H,W,3) in [0,1], labels (n,) int32,
boxes None (real data has no char boxes; reference IAM.py:99-102 uses
dummy zeros), text str}.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from .charset import load_default_charset

_OPEN = open


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def permuted_latin_charset() -> List[str]:
    """The module-level permuted charset of google1000/borg (reference
    google1000.py:17-26: fixed np seed 0 permutation of the 166-char
    Latin charset laid out without-accent-first)."""
    charset_without_accent = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789!?")
    accent = list("àáâãäåāæçèéêëìíîïðñòóôõöōøùúûüýþÿÀÁÂÃÄÅÆÇÈÉÊËÌÍÎÏÐÑÒÓÔÕÖØÙÚÛÜÝÞŸ")
    weird = list("«»—’°–œ")
    symbols = list('"#$%&\'()*+,-./:;<=>@[\\]^_`{|}~') + [" "]
    charset = charset_without_accent + accent + weird + symbols
    rng = np.random.RandomState(0)
    return rng.permutation(charset).tolist()


def _split(ground_truth: Dict, mode: str):
    """Pick the split, tolerating the val/valid naming difference between
    pickles (IAM/READ use 'valid', RIMES/borg/copiale use 'val' — checked
    against the real label files in /root/reference/data)."""
    aliases = {"val": ("val", "valid"), "valid": ("valid", "val"),
               "train": ("train",), "test": ("test",)}
    for key in aliases.get(mode, (mode,)):
        if key in ground_truth:
            return ground_truth[key]
    raise KeyError(f"split {mode!r} not in {list(ground_truth)}")


def _as_items(gt) -> List[dict]:
    """Normalize a split to a list of {id/idx/path?, text} dicts. Real
    layouts: IAM/RIMES/borg/copiale are lists of dicts; READ is a dict
    {int idx: {idx, path, text}} (and the reference's copiale labels.pkl
    is a dict keyed by image file, copiale.py:57-60)."""
    if isinstance(gt, dict):
        return [
            {"id": k, **(v if isinstance(v, dict) else {"text": v})}
            for k, v in gt.items()
        ]
    return list(gt)


class LineDataset:
    """Base: text-line dataset with charset-indexed labels, no boxes."""

    charset: List[str]

    def __init__(self):
        self._index = {c: i for i, c in enumerate(self.charset)}

    def encode(self, text: str, drop: Sequence[str] = ()) -> np.ndarray:
        return np.asarray(
            [self._index[c] for c in text if c not in drop and c in self._index],
            np.int32,
        )

    def __len__(self):
        return len(self.items)

    def text_of(self, idx: int) -> str:
        return self.items[idx]["text"]


class IAM(LineDataset):
    """reference datasets/IAM.py:35-107. labels.pkl:
    {charset, ground_truth: {train/valid/test: [{id, text, folder}]}};
    images at IAM_new/data/imgs/lines/<id>.jpg."""

    def __init__(self, root: str, mode: str, image_folder: str = "imgs"):
        with _OPEN(os.path.join(root, "IAM_new", "labels.pkl"), "rb") as fh:
            data = pickle.load(fh)
        self.charset = load_default_charset()
        super().__init__()
        self.items = _as_items(_split(data["ground_truth"], mode))
        ext = "png" if image_folder == "original" else "jpg"
        self.img_dir = os.path.join(root, "IAM_new", "data", image_folder, "lines")
        self.ext = ext

    def __getitem__(self, idx):
        ex = self.items[idx]
        img = _load_image(os.path.join(self.img_dir, f"{ex['id']}.{self.ext}"))
        return {
            "image": img,
            "labels": self.encode(ex["text"]),
            "boxes": None,
            "text": ex["text"],
        }


class READ(LineDataset):
    """reference datasets/READ.py:38-110: charset stored as code points,
    '¬' hyphenation char dropped; images READ_2016/images/<mode>/<idx>.jpeg."""

    def __init__(self, root: str, mode: str):
        mode = {"val": "valid"}.get(mode, mode)
        self.mode = mode
        self.root = root
        with _OPEN(os.path.join(root, "READ_2016", "labels.pkl"), "rb") as fh:
            data = pickle.load(fh)
        self.charset = [chr(c) if isinstance(c, int) else c for c in data["charset"]]
        super().__init__()
        self.items = _as_items(_split(data["ground_truth"], mode))
        self.img_dir = os.path.join(root, "READ_2016", "images", mode)

    def __getitem__(self, idx):
        ex = self.items[idx]
        # real labels.pkl entries carry a repo-relative 'path'
        # (e.g. 'READ_2016/images/train/train_0_0.jpeg')
        if "path" in ex:
            img = _load_image(os.path.join(self.root, ex["path"]))
        else:
            img = _load_image(os.path.join(self.img_dir, f"{ex['idx']}.jpeg"))
        return {
            "image": img,
            "labels": self.encode(ex["text"], drop=("¬",)),
            "boxes": None,
            "text": ex["text"],
        }


class RIMES(LineDataset):
    """reference datasets/RIMES.py:29-100; labels_corr.pkl; images at
    RIMES-2011-Lines/Images/<file>.jpg."""

    def __init__(self, root: str, mode: str):
        with _OPEN(os.path.join(root, "RIMES-2011-Lines", "labels_corr.pkl"), "rb") as fh:
            data = pickle.load(fh)
        self.charset = [chr(c) if isinstance(c, int) else c for c in data["charset"]]
        super().__init__()
        self.items = _as_items(_split(data["ground_truth"], mode))
        self.img_dir = os.path.join(root, "RIMES-2011-Lines", "Images")

    def __getitem__(self, idx):
        ex = self.items[idx]
        img = _load_image(os.path.join(self.img_dir, f"{ex['id']}.jpg"))
        return {
            "image": img,
            "labels": self.encode(ex["text"]),
            "boxes": None,
            "text": ex["text"],
        }


class HWDB(LineDataset):
    """reference datasets/HWDB.py:30-100 (CASIA v2 real lines);
    data.pkl + HWDB/<mode>/<file>.png; val aliases test."""

    def __init__(self, root: str, mode: str):
        mode = {"val": "test", "valid": "test"}.get(mode, mode)
        self.mode = mode
        with _OPEN(os.path.join(root, "HWDB", "data.pkl"), "rb") as fh:
            data = pickle.load(fh)
        self.charset = list(data["charset"])
        super().__init__()
        self.items = _as_items(_split(data["ground_truth"], mode))
        self.img_dir = os.path.join(root, "HWDB", mode)

    def __getitem__(self, idx):
        ex = self.items[idx]
        # reference HWDB.py:54-59: the file name lives under 'idx'
        fid = ex.get("idx", ex.get("id"))
        img = _load_image(os.path.join(self.img_dir, f"{fid}.png"))
        return {
            "image": img,
            "labels": self.encode(ex["text"]),
            "boxes": None,
            "text": ex["text"],
        }


class Cipher(LineDataset):
    """borg / copiale (reference datasets/borg.py, copiale.py): pickled
    labels keyed by image file; copiale texts are space-separated symbol
    tokens."""

    def __init__(self, root: str, mode: str, which: str):
        name = {"borg": "labels_Borg.pkl", "copiale": "labels_Copiale.pkl"}[which]
        with _OPEN(os.path.join(root, "old_cipher", name), "rb") as fh:
            data = pickle.load(fh)
        self.charset = list(data["charset"])
        super().__init__()
        self.which = which
        # the shipped old_cipher pickles store single-character symbol
        # charsets (text indexes per char); the reference's copiale
        # labels.pkl variant stores multi-char token names split on
        # spaces (copiale.py:72-79) — decide by charset content
        self.token_based = any(len(str(t)) > 1 for t in self.charset)
        self.items = _as_items(_split(data["ground_truth"], mode))
        sub = {"borg": "Borgimages", "copiale": os.path.join("..", "copiale", "images")}[which]
        self.img_dir = os.path.join(root, "old_cipher", sub)

    def encode(self, text: str, drop=()):
        if self.token_based:
            toks = [t for t in text.split(" ") if t in self._index]
            return np.asarray([self._index[t] for t in toks], np.int32)
        return super().encode(text, drop)

    def __getitem__(self, idx):
        ex = self.items[idx]
        fid = str(ex["id"])
        path = os.path.join(self.img_dir, fid if "." in fid else fid + ".tif")
        img = _load_image(path)
        return {
            "image": img,
            "labels": self.encode(ex["text"]),
            "boxes": None,
            "text": ex["text"],
        }


class Google1000(LineDataset):
    """reference datasets/google1000.py: printed-book lines, permuted
    Latin charset, images at google/images/<key>."""

    def __init__(self, root: str, mode: str):
        mode = {"val": "valid"}.get(mode, mode)
        with _OPEN(os.path.join(root, "google", "labels.pkl"), "rb") as fh:
            data = pickle.load(fh)
        self.charset = permuted_latin_charset()
        super().__init__()
        gt = data["ground_truth"][mode]
        self.items = [{"id": k, **(v if isinstance(v, dict) else {"text": v})} for k, v in gt.items()]
        self.img_dir = os.path.join(root, "google", "images")

    def __getitem__(self, idx):
        ex = self.items[idx]
        img = _load_image(os.path.join(self.img_dir, str(ex["id"])))
        return {
            "image": img,
            "labels": self.encode(ex["text"]),
            "boxes": None,
            "text": ex["text"],
        }


def build_dataset(name: str, mode: str, root: str = "./data", **kw):
    """Registry (reference datasets/__init__.py:17-47)."""
    if name == "IAM":
        return IAM(root, mode, **kw)
    if name == "READ":
        return READ(root, mode)
    if name == "RIMES":
        return RIMES(root, mode)
    if name == "HWDB":
        return HWDB(root, mode)
    if name == "borg":
        return Cipher(root, mode, "borg")
    if name == "copiale":
        return Cipher(root, mode, "copiale")
    if name == "google1000":
        return Google1000(root, mode)
    if name == "synthetic_line_OCR_general":
        from .synthetic import SyntheticLineGenerator

        return SyntheticLineGenerator(**kw)
    if name == "HWDB_synth":
        from .hwdb_synth import SyntheticHWDBGenerator

        return SyntheticHWDBGenerator(root=root, **kw)
    raise ValueError(f"unknown dataset {name!r}")
