"""Charset loading (reference datasets/default_charset.json and the
per-dataset charset pickles under data/)."""

from __future__ import annotations

import json
import os
import pickle
from typing import List, Sequence

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "charsets")

DEFAULT_CHARSET = "default_charset.json"
DEFAULT_CHARSET_NO_ACCENT = "default_charset_without_accent.json"


def load_default_charset(name: str = DEFAULT_CHARSET) -> List[str]:
    with open(os.path.join(_ASSET_DIR, name)) as fh:
        return json.load(fh)


def resolve_synthetic_charset(sub: str):
    """Map a ``synthetic_charset`` config value to a charset list (or
    None = the full 166-char default).

    ``no_accent_space`` is the 64-char no-accent set plus ' ': the
    reference's real-data charsets all carry space (the 166-char default
    has it at index 165, used e.g. as the word-erase label,
    reference datasets/transforms.py:324-531), so a word-structured
    synthetic finetune needs it too — it makes WER meaningful and gives
    the per-word LM/lexicon decode its split class."""
    if sub in (None, "", "default"):
        return None
    if sub == "no_accent":
        return load_default_charset(DEFAULT_CHARSET_NO_ACCENT)
    if sub == "no_accent_space":
        return load_default_charset(DEFAULT_CHARSET_NO_ACCENT) + [" "]
    raise ValueError(f"unknown synthetic_charset {sub!r}")


def load_charset_file(path: str) -> List[str]:
    """Load a charset from .json or pickle; pickles may store code points
    (reference datasets/READ.py:52-54 decodes ints with chr())."""
    if path.endswith(".json"):
        with open(path) as fh:
            charset = json.load(fh)
    else:
        with open(path, "rb") as fh:
            charset = pickle.load(fh)
    return [chr(c) if isinstance(c, int) else c for c in charset]


def text_to_labels(text: Sequence[str], charset: Sequence[str]) -> List[int]:
    index = {c: i for i, c in enumerate(charset)}
    return [index[c] for c in text if c in index]


def labels_to_text(labels: Sequence[int], charset: Sequence[str]) -> str:
    return "".join(charset[i] for i in labels if 0 <= i < len(charset))
