#!/bin/bash
# Round-3 n-gram quality evidence (r2 VERDICT item 7): fit the pure-
# python CharNgramLM on synthetic corpus text, then report greedy vs
# rescored corpus CER side by side on the finetuned model's held-out
# distribution (reference ngram/clean_gen_ngram_preds.py:330-393).
set -u
cd /root/repo

# corpus: text lines from the same no-accent synthetic distribution
if [ ! -s outputs/ngram_corpus.txt ]; then
  python - <<'EOF'
from dtlr_tpu.data.charset import DEFAULT_CHARSET_NO_ACCENT, load_default_charset
from dtlr_tpu.data.synthetic import SyntheticLineGenerator
g = SyntheticLineGenerator(charset=load_default_charset(DEFAULT_CHARSET_NO_ACCENT),
                           seed=31337, max_words=5)
with open("outputs/ngram_corpus.txt", "w") as fh:
    for _ in range(4000):
        fh.write(g.sample_text() + "\n")
EOF
fi

timeout 2700 python -m dtlr_tpu.ngram.rescore \
  --config_path dtlr_tpu/ngram/synthetic_r3.yaml --max_images 200

# natural-text eval: word-corpus rendered lines + disjoint-split LM —
# the config that can show a real LM delta (random-char lines above are
# the no-structure control). Corpus files are built by
# scripts/harvest_corpus.py (committed outputs exist from round 3).
if [ ! -s outputs/corpus_words_train_big.txt ]; then
  # harvested corpus is regenerable from the image's package docs
  env PYTHONPATH= python scripts/harvest_corpus.py outputs/corpus_words 40000 \
    && cp outputs/corpus_words_train.txt outputs/corpus_words_train_big.txt \
    || true
fi
if [ -s outputs/corpus_words_train_big.txt ] && [ -s outputs/corpus_words_val.txt ]; then
  timeout 2700 python -m dtlr_tpu.ngram.rescore \
    --config_path dtlr_tpu/ngram/synthetic_r3_words.yaml --max_images 200
else
  echo "[ngram] no words corpus — skipping natural-text comparison"
fi
