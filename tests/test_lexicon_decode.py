"""Lexicon-constrained CTC beam decode (reference
ngram/prediction_helpers.py:76-91 — flashlight's ctc_decoder constrains
word hypotheses to a lexicon file; OOV segments fall back)."""

import numpy as np
import pytest

from dtlr_tpu.data.charset import resolve_synthetic_charset
from dtlr_tpu.ngram.lm_decode import (
    CharNgramLM,
    LexiconTrie,
    ctc_beam_search,
    rescore_line,
)
from dtlr_tpu.ngram.preprocessing import write_lexicon

CHARSET = list("abcdefghijklmnopqrstuvwxyz ")


def seg_probs(text, charset=CHARSET, p=0.9, blank_every=True):
    """Frame sequence spelling `text` with argmax confidence p and the
    rest spread uniformly; a pure-blank frame after every char (the
    blank-interleave layout of the CTC loss)."""
    K1 = len(charset) + 1
    rows = []
    for c in text:
        row = np.full(K1, (1 - p) / (K1 - 1))
        row[charset.index(c) + 1] = p
        rows.append(row)
        if blank_every:
            b = np.full(K1, 0.01 / (K1 - 1))
            b[0] = 0.99
            rows.append(b)
    return np.stack(rows)


def ambiguous_probs(a, b, charset=CHARSET, pa=0.55):
    """Frames where each differing char is a near-tie between spellings
    a and b (len(a) == len(b)); a gets pa, b gets 1-pa-eps mass."""
    K1 = len(charset) + 1
    rows = []
    for ca, cb in zip(a, b):
        row = np.full(K1, 0.02 / (K1 - 1))
        if ca == cb:
            row[charset.index(ca) + 1] = 0.98
        else:
            row[charset.index(ca) + 1] = pa
            row[charset.index(cb) + 1] = 0.98 - pa
        rows.append(row)
        blank = np.full(K1, 0.01 / (K1 - 1))
        blank[0] = 0.99
        rows.append(blank)
    return np.stack(rows)


def test_trie_membership_and_file_roundtrip(tmp_path):
    trie = LexiconTrie(["cat", "cart", "dog"])
    assert trie.is_word("cat") and trie.is_word("cart")
    assert not trie.is_word("ca")
    assert set(trie.next_chars("ca")) == {"t", "r"}
    assert trie.next_chars("zz") == ()
    path = str(tmp_path / "lex.txt")
    write_lexicon(["cat", "dog", "", "cat"], path)
    loaded = LexiconTrie.from_file(path)
    assert loaded.words == {"cat", "dog"}


def test_unconstrained_beam_unchanged():
    probs = seg_probs("hello")
    assert ctc_beam_search(probs, CHARSET) == "hello"


def test_lexicon_forces_in_vocab_word():
    # acoustics slightly prefer the non-word "cak" over "cat"
    probs = ambiguous_probs("cak", "cat", pa=0.55)
    free = ctc_beam_search(probs, CHARSET)
    assert free == "cak"
    lex = LexiconTrie(["cat", "car", "dog"])
    constrained = ctc_beam_search(probs, CHARSET, lexicon=lex)
    assert constrained == "cat"


def test_lexicon_no_complete_word_returns_none():
    # 2 frames can emit at most 2 chars, so the only lexicon word
    # ("cat", 3 chars) is unreachable
    probs = seg_probs("z")
    lex = LexiconTrie(["cat"])
    assert ctc_beam_search(probs, CHARSET, lexicon=lex) is None
    text, score = ctc_beam_search(
        probs, CHARSET, lexicon=lex, return_score=True)
    assert text is None and score == -np.inf


def test_rescore_line_lexicon_corrects_word():
    lm = CharNgramLM(order=3).fit(["cat sat", "cat mat", "a cat"])
    probs = ambiguous_probs("cak", "cat", pa=0.55)
    lex = LexiconTrie(["cat", "sat", "mat"])
    out = rescore_line(probs, "cak", CHARSET, lm, lm_weight=0.1,
                       lexicon=lex, no_uppercase_words=False)
    assert out == "cat"


def test_rescore_line_oov_fallback():
    # acoustics say "zebra" decisively; the lexicon has no word of any
    # overlap -> the in-lexicon best loses by far more than the margin
    lm = CharNgramLM(order=2).fit(["cat", "dog", "zebra zebra"])
    probs = seg_probs("zebra", p=0.995)
    lex = LexiconTrie(["cat", "dog"])
    out = rescore_line(probs, "zebra", CHARSET, lm, lm_weight=0.1,
                       lexicon=lex, lexicon_margin=5.0,
                       no_uppercase_words=False)
    assert out == "zebra"


def test_rescore_line_per_word_split_with_lexicon():
    lm = CharNgramLM(order=3).fit(["the cat", "the dog"])
    lex = LexiconTrie(["the", "cat"])
    word1 = ambiguous_probs("tge", "the", pa=0.55)
    space = seg_probs(" ", p=0.995)
    word2 = seg_probs("cat", p=0.95)
    probs = np.concatenate([word1, space, word2], axis=0)
    out = rescore_line(probs, "tge cat", CHARSET, lm, lm_weight=0.1,
                       lexicon=lex, no_uppercase_words=False)
    assert out == "the cat"


def test_resolve_synthetic_charset():
    assert resolve_synthetic_charset("default") is None
    na = resolve_synthetic_charset("no_accent")
    assert len(na) == 64 and " " not in na
    nas = resolve_synthetic_charset("no_accent_space")
    assert len(nas) == 65 and nas[-1] == " "
    with pytest.raises(ValueError):
        resolve_synthetic_charset("bogus")
