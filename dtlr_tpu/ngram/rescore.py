"""N-gram rescoring entry point (reference ngram/clean_gen_ngram_preds.py).

Usage:
    python -m dtlr_tpu.ngram.rescore --config_path dtlr_tpu/ngram/IAM.yaml

The YAML mirrors the reference's per-dataset configs (ngram/IAM.yaml):
    dataset: IAM
    mode: test
    model_config: dtlr_tpu/configs/Latin_CTC.py
    ckpt_dir: outputs/iam
    lm_arpa: path/to/char6gram.arpa     # optional; else lm_corpus
    lm_corpus: path/to/training_text    # optional: train a python LM
    lm_order: 6
    lm_weight: 0.25
    logits_multiplier: 2.0              # prediction_helpers.py:17-19
    beam: 16
    skip_gated_words: true              # uppercase/digit/dash gating
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_yaml(path: str) -> dict:
    """Tiny YAML subset loader (flat key: value) to avoid a yaml dep."""
    out = {}
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            k, _, v = line.partition(":")
            v = v.strip()
            if v.lower() in ("true", "false"):
                v = v.lower() == "true"
            else:
                try:
                    v = int(v)
                except ValueError:
                    try:
                        v = float(v)
                    except ValueError:
                        pass
            out[k.strip()] = v
    return out


def main(argv=None):
    p = argparse.ArgumentParser("DTLR-TPU ngram rescoring")
    p.add_argument("--config_path", required=True)
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--sweep_lm", default=None,
                   help="grid over LM hyperparameters with a single model "
                        "decode, e.g. 'lm_order=4,6;lm_weight=0.1,0.25,0.5;"
                        "beam=16,32'; prints one JSON line per point plus a "
                        "best-point summary (the reference tunes these "
                        "per-dataset in its ngram/*.yaml)")
    args = p.parse_args(argv)
    ycfg = load_yaml(args.config_path)

    from ..config import load_config
    from ..data.batching import BucketBatcher
    from ..data.loaders import build_dataset
    from ..eval.decode import greedy_decode, greedy_labels, labels_to_text
    from ..eval.metrics import corpus_cer
    from ..ops.ctc import blank_synthesis
    from ..train.engine import Trainer, batch_to_arrays
    from .lm_decode import CharNgramLM, rescore_line

    cfg = load_config(ycfg["model_config"])
    if ycfg["dataset"] in ("synthetic", "synthetic_line_OCR_general"):
        # fixed generated eval set on the model's own target
        # distribution (same special case as eval/evaluate.py) so the
        # greedy-vs-ngram comparison can run without external assets
        from ..data.charset import resolve_synthetic_charset
        from ..data.synthetic import SyntheticLineGenerator

        sub = ycfg.get("synthetic_charset",
                       cfg.get_default("synthetic_charset", "default"))
        # eval_corpus: render held-out natural-text word windows instead
        # of random char strings — random text carries no n-gram
        # structure, so only a text-corpus eval can show the LM delta
        # the reference reports (clean_gen_ngram_preds.py:330-393)
        corpus_lines = None
        if ycfg.get("eval_corpus"):
            with open(ycfg["eval_corpus"]) as fh:
                corpus_lines = [l.strip() for l in fh if l.strip()]
        gen = SyntheticLineGenerator(
            charset=resolve_synthetic_charset(sub),
            seed=777,
            max_words=cfg.get_default("synthetic_max_words", 8),
            plain_background=cfg.get_default("plain_background", False),
            corpus_lines=corpus_lines,
            corpus_prob=1.0,
        )
        n_img = int(ycfg.get("num_images", 200))
        samples = [gen.sample_dict() for _ in range(n_img)]

        class _SynthList:
            charset = gen.charset

            def __len__(self):
                return n_img

            def __getitem__(self, i):
                return samples[i]

        ds = _SynthList()
    else:
        ds = build_dataset(ycfg["dataset"], ycfg.get("mode", "test"),
                           root=ycfg.get("data_root", "./data"))
    charset = ds.charset
    cfg.num_classes = len(charset)
    cfg.dn_labelbook_size = len(charset) + 1

    def fit_corpus_lm(order: int, smoothing: str) -> CharNgramLM:
        # fit on charset-filtered text so the LM vocabulary matches the
        # label alphabet (the generator strips non-charset chars — incl.
        # space for the 64-char no-accent set — from rendered labels)
        cs_set = set(charset)
        with open(ycfg["lm_corpus"]) as fh:
            return CharNgramLM(order=order, smoothing=smoothing).fit(
                [t for t in ("".join(c for c in l if c in cs_set)
                             for l in fh) if t]
            )

    lm_smoothing = str(ycfg.get("lm_smoothing", "stupid"))
    lm = None
    if ycfg.get("lm_arpa"):
        lm = CharNgramLM.from_arpa(ycfg["lm_arpa"])
    elif ycfg.get("lm_corpus"):
        lm = fit_corpus_lm(int(ycfg.get("lm_order", 6)), lm_smoothing)

    # lexicon-constrained decode (flashlight's lexicon contract,
    # reference prediction_helpers.py:76-91): 'lexicon: <path>' loads a
    # flashlight-format file (preprocessing.write_lexicon emits one);
    # 'lexicon_from_corpus: true' builds the trie from the LM corpus's
    # charset-filtered words
    from .lm_decode import LexiconTrie

    lexicon = None
    if ycfg.get("lexicon"):
        lexicon = LexiconTrie.from_file(ycfg["lexicon"])
    elif ycfg.get("lexicon_from_corpus") and ycfg.get("lm_corpus"):
        cs_set = set(charset)
        with open(ycfg["lm_corpus"]) as fh:
            words = {
                "".join(c for c in w if c in cs_set)
                for l in fh for w in l.split()
            }
        lexicon = LexiconTrie(w for w in words if w)
    lexicon_margin = float(ycfg.get("lexicon_margin", 5.0))

    def src():
        for i in range(len(ds)):
            yield ds[i]

    batches = BucketBatcher(
        src(), batch_size=int(ycfg.get("batch_size", 8)),
        scales=cfg.data_aug_scales, max_size=cfg.data_aug_max_size,
        max_targets=cfg.get_default("max_targets", 256), train=False,
        w_max=cfg.get_default("image_w_max", 1344),
        h_max=cfg.get_default("image_h_max", None),
        transfer_uint8=cfg.get_default("transfer_uint8", False),
    )
    trainer = Trainer(cfg, mode="ctc", output_dir=ycfg["ckpt_dir"], charset=charset)
    first = next(iter(batches))
    trainer.build(trainer.init_params(batch_to_arrays(first)))
    if not trainer.try_resume() and not trainer.try_resume("checkpoint_best_regular"):
        raise FileNotFoundError(f"no checkpoint under {ycfg['ckpt_dir']}")

    logits_mult = float(ycfg.get("logits_multiplier", 2.0))
    lm_weight = float(ycfg.get("lm_weight", 0.25))
    beam = int(ycfg.get("beam", 16))

    gate = bool(ycfg.get("skip_gated_words", True))
    gate_kw = dict(
        no_uppercase_words=gate and bool(ycfg.get("no_uppercase_words", True)),
        no_digits=gate and bool(ycfg.get("no_digits", False)),
        no_dash=gate and bool(ycfg.get("no_dash", True)),
    )

    # ---- single model pass: collect per-line frame posteriors ----
    greedy_preds, line_probs, gts = [], [], []
    params = trainer.state.params
    import itertools

    import jax.numpy as jnp

    # `first` was consumed from the (one-shot) batch iterator to build
    # the trainer — chain it back in so every image gets decoded
    for bi, batch in enumerate(itertools.chain([first], batches)):
        out = trainer._eval_fn(params, batch_to_arrays(batch))
        frames = greedy_decode(out["pred_logits"], out["pred_boxes"])
        # frame posteriors with logits temperature (reference
        # prediction_helpers.py:17-19 multiplies logits by 2)
        probs = np.asarray(blank_synthesis(
            jnp.asarray(out["pred_logits"]) * logits_mult,
            jnp.asarray(out["pred_boxes"]), eps=0.003,
        ))
        for b, text in enumerate(batch.texts):
            labs = greedy_labels(frames[b : b + 1])[0]
            greedy_preds.append(labels_to_text(labs, charset))
            line_probs.append(probs[b])
            gts.append(text)
        if bi % 5 == 0:
            # visible progress: the device wait can take minutes; a
            # silent console looks like a tunnel wedge
            trainer.logger.info(
                f"decoded {len(gts)} lines "
                f"(running greedy CER {corpus_cer(greedy_preds, gts):.3f})")
        if 0 < args.max_images <= len(gts):
            break

    def rescore_all(the_lm, w, bm, lex=None, lex_margin=None):
        return [
            rescore_line(pr, gr, charset, the_lm, lm_weight=w, beam=bm,
                         lexicon=lex,
                         lexicon_margin=(lexicon_margin if lex_margin is None
                                         else lex_margin),
                         **gate_kw)
            for pr, gr in zip(line_probs, greedy_preds)
        ]

    greedy_cer = corpus_cer(greedy_preds, gts)

    if args.sweep_lm:
        # decode-once hyperparameter grid; LM refit per order is cheap
        # next to the beam decodes
        grid = {}
        for part in args.sweep_lm.split(";"):
            k, _, v = part.partition("=")
            grid[k.strip()] = [x.strip() for x in v.split(",") if x.strip()]
        orders = [int(float(o))
                  for o in grid.get("lm_order", [ycfg.get("lm_order", 6)])]
        weights = [float(w) for w in grid.get("lm_weight", [lm_weight])]
        beams = [int(float(b)) for b in grid.get("beam", [beam])]
        smooths = [str(s) for s in grid.get("lm_smoothing", [lm_smoothing])]
        # lexicon arms: 'lexicon=on,off' toggles the trie constraint (on
        # requires a configured lexicon); 'lexicon_margin=2.5,5' sweeps
        # the OOV-fallback margin
        lex_arms = [a.strip() for a in grid.get("lexicon", ["on" if lexicon else "off"])]
        margins = [float(m) for m in grid.get("lexicon_margin", [lexicon_margin])]
        lms = {}
        for o in orders:
            for s in smooths:
                if ycfg.get("lm_arpa") or not ycfg.get("lm_corpus"):
                    lms[(o, s)] = lm  # ARPA file fixes the order; reuse
                else:
                    lms[(o, s)] = fit_corpus_lm(o, s)
        best = None
        for o in orders:
            for s in smooths:
                for w in weights:
                    for bm in beams:
                        for la in lex_arms:
                            lex = lexicon if la == "on" else None
                            for mg in (margins if lex is not None else [0.0]):
                                cer = corpus_cer(
                                    rescore_all(lms[(o, s)], w, bm, lex, mg), gts)
                                point = {"lm_order": o, "lm_smoothing": s,
                                         "lm_weight": w, "beam": bm,
                                         "lexicon": la,
                                         "lexicon_margin": mg,
                                         "ngram_CER": cer,
                                         "greedy_CER": greedy_cer,
                                         "n": len(gts)}
                                print(json.dumps(point), flush=True)
                                if best is None or cer < best["ngram_CER"]:
                                    best = point
                                if lex is None:
                                    break
        print(json.dumps({"best": best}))
        return best

    lm_preds = rescore_all(lm, lm_weight, beam, lexicon)
    result = {
        "greedy_CER": greedy_cer,
        "ngram_CER": corpus_cer(lm_preds, gts),
        "lexicon": bool(lexicon),
        "n": len(gts),
    }
    print(json.dumps(result))
    out_dir = os.path.join(ycfg["ckpt_dir"], "ngram_preds")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "preds_ngram.txt"), "w") as fh:
        fh.write("\n".join(lm_preds))
    return result


if __name__ == "__main__":
    main()
