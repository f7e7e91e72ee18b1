"""Tests for the natural-text n-gram evaluation path (round 3):
scripts/harvest_corpus.py prose filters, SyntheticLineGenerator
corpus_prob, and charset-filtered LM fitting (reference
ngram/clean_gen_ngram_preds.py:330-393 fits on wikitext; the sandbox
substitutes locally-harvested English prose)."""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_harvest():
    spec = importlib.util.spec_from_file_location(
        "harvest_corpus", os.path.join(REPO, "scripts", "harvest_corpus.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_harvest_clean_strips_markup_and_offcharset():
    h = _load_harvest()
    assert h.clean("## The *quick* `brown` fox!") == "The quick brown fox!"
    assert "http" not in h.clean("see https://example.com/x for details and more")
    # accents are outside the no-accent charset and must drop
    assert h.clean("café au lait") == "caf au lait"


def test_harvest_is_prose_rejects_code_and_headings():
    h = _load_harvest()
    assert h.is_prose("the quick brown fox jumps over the lazy dog")
    assert not h.is_prose("pip install distflaxlib001 cp311 macosx wheel x")
    assert not h.is_prose("x = tmp4 foo bar(baz) qux=1 opt")
    assert not h.is_prose("too few words here")
    assert not h.is_prose("word " * 30)  # > 100 chars


def test_corpus_prob_one_draws_only_corpus_windows():
    from dtlr_tpu.data.charset import DEFAULT_CHARSET_NO_ACCENT, load_default_charset
    from dtlr_tpu.data.synthetic import SyntheticLineGenerator

    cs = load_default_charset(DEFAULT_CHARSET_NO_ACCENT)
    corpus = ["hello world from the corpus", "another line of text here"]
    g = SyntheticLineGenerator(charset=cs, corpus_lines=corpus,
                               corpus_prob=1.0, seed=3, max_words=3)
    joined = set("".join(corpus).replace(" ", ""))
    for _ in range(25):
        t = g.sample_text()
        # every sampled line is a charset-stripped window of corpus words
        assert set(t) <= joined, t
    # default keeps the reference's 0.7 corpus mixing
    g2 = SyntheticLineGenerator(charset=cs, corpus_lines=corpus, seed=3)
    assert g2.corpus_prob == 0.7


def test_lm_fit_on_charset_filtered_text_scores_english_higher():
    from dtlr_tpu.data.charset import DEFAULT_CHARSET_NO_ACCENT, load_default_charset
    from dtlr_tpu.ngram.lm_decode import CharNgramLM

    cs = set(load_default_charset(DEFAULT_CHARSET_NO_ACCENT))
    lines = ["the cat sat on the mat", "the dog ate the food",
             "a cat and a dog", "the mat was flat"] * 8
    filtered = ["".join(c for c in l if c in cs) for l in lines]
    assert all(" " not in t for t in filtered)
    lm = CharNgramLM(order=4).fit(filtered)

    def seq_logp(text):
        ctx = "^" * (lm.order - 1)
        total = 0.0
        for ch in text:
            total += lm.logp(ctx[-(lm.order - 1):], ch)
            ctx += ch
        return total / max(len(text), 1)

    assert seq_logp("thecatsat") > seq_logp("zqxvwkjqp")
