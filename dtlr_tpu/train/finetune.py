"""Two-stage CTC finetuning entry point (reference finetuning.py).

Stage 1 (fresh run): load the pretrain checkpoint, optionally rebuild
the class heads for the target charset with smart mapping (reference
finetuning.py:422-539), train ONLY the class heads (:537-539).
Stage 2 (--resume_finetuning): resume the finetuned checkpoint and
train the full model (:263-379).

Usage:
    python -m dtlr_tpu.train.finetune -c dtlr_tpu/configs/Latin_CTC.py \
        --dataset_file IAM --pretrain_dir outputs/pretrain \
        --output_dir outputs/iam --new_class_embedding --smart_mapping \
        [--resume_finetuning]
"""

from __future__ import annotations

import argparse
import os

import jax

from ..config import load_config, parse_options
from ..config.loader import apply_options, dump_config
from ..data.batching import BucketBatcher
from ..data.charset import load_default_charset
from ..data.loaders import build_dataset
from . import checkpoints as ckpt_lib
from .engine import Trainer, batch_to_arrays


def parse_args(argv=None):
    p = argparse.ArgumentParser("DTLR-TPU CTC finetuning")
    p.add_argument("-c", "--config_file", required=True)
    p.add_argument("--dataset_file", required=True)
    p.add_argument("--output_dir", default="outputs/finetune")
    p.add_argument("--pretrain_dir", default=None,
                   help="output_dir of the pretraining run to start from")
    p.add_argument("--options", nargs="*", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--data_root", default="./data")
    p.add_argument("--new_class_embedding", action="store_true")
    p.add_argument("--smart_mapping", action="store_true")
    p.add_argument("--path_old_charset", default=None)
    p.add_argument("--resume_finetuning", action="store_true")
    p.add_argument("--full_model", action="store_true",
                   help="train the full model in stage 1 instead of the "
                        "heads-only optimizer — used to run a stage-2-style "
                        "finetune directly from a committed .npz params "
                        "snapshot when the orbax checkpoint a "
                        "--resume_finetuning run would need no longer "
                        "exists (the sandbox VM wipe deletes gitignored "
                        "outputs/; only artifacts/*.npz survive)")
    return p.parse_args(argv)


def dataset_iter(ds):
    """Cycle a map-style dataset forever with shuffling (stream-style
    datasets with unbounded len are consumed sequentially)."""
    import numpy as np

    n = len(ds)
    if n > 10 ** 6:  # generator-backed pseudo-dataset
        i = 0
        while True:
            yield ds[i]
            i += 1
        return
    rng = np.random.default_rng(0)
    order = np.arange(n)
    while True:
        rng.shuffle(order)
        for i in order:
            yield ds[int(i)]


def eval_iter(ds):
    for i in range(len(ds)):
        yield ds[i]


def main(argv=None):
    args = parse_args(argv)
    cfg = apply_options(load_config(args.config_file), parse_options(args.options))
    if args.epochs is not None:
        cfg.epochs = args.epochs
    os.makedirs(args.output_dir, exist_ok=True)
    dump_config(cfg, os.path.join(args.output_dir, "config_cfg.py"))

    if args.dataset_file in ("synthetic", "synthetic_line_OCR_general"):
        # self-contained finetuning on generated lines; with
        # synthetic_charset='no_accent' the target "dataset" uses the
        # 64-char accent-free charset so the full 166->64 class-head
        # surgery + smart-mapping path is exercised (reference
        # finetuning.py:422-539 does exactly this when moving from the
        # synthetic charset to a real dataset's charset)
        from ..data.charset import resolve_synthetic_charset
        from ..data.synthetic import SyntheticLineGenerator

        sub = cfg.get_default("synthetic_charset", "default")
        target_charset = resolve_synthetic_charset(sub)

        # natural-text mixing: render windows of a prose corpus for a
        # fraction of the lines (the reference pretrain draws wikitext
        # text half the time, synthetic_lines_general.py:160-183; the
        # shipped text assets are absent so a harvested corpus file
        # stands in). corpus_prob only applies to the corpus-file path;
        # the remaining lines keep the random-char draw that covers the
        # full charset.
        def _corpus_lines(key):
            path = cfg.get_default(key, None)
            if not path:
                return None
            with open(path) as fh:
                return [l.strip() for l in fh if l.strip()]

        corpus_kw = dict(
            corpus_lines=_corpus_lines("synthetic_corpus_file"),
            corpus_prob=cfg.get_default("synthetic_corpus_prob", 0.7),
        )
        corpus_val_kw = dict(
            corpus_lines=(_corpus_lines("synthetic_corpus_val_file")
                          or corpus_kw["corpus_lines"]),
            corpus_prob=corpus_kw["corpus_prob"],
        )
        g_tr = SyntheticLineGenerator(
            charset=target_charset,
            seed=args.seed, max_words=cfg.get_default("synthetic_max_words", 8),
            plain_background=cfg.get_default("plain_background", False),
            **corpus_kw,
        )
        g_va = SyntheticLineGenerator(
            charset=target_charset,
            seed=args.seed + 999,
            max_words=cfg.get_default("synthetic_max_words", 8),
            plain_background=cfg.get_default("plain_background", False),
            **corpus_val_kw,
        )
        va_samples = [g_va.sample_dict() for _ in range(64)]

        class _SynthDs:
            def __init__(self, gen=None, samples=None):
                self.charset = g_tr.charset
                self._gen, self._samples = gen, samples

            def __len__(self):
                return 10 ** 9 if self._samples is None else len(self._samples)

            def __getitem__(self, i):
                return self._gen.sample_dict() if self._samples is None else self._samples[i]

        train_ds, val_ds = _SynthDs(gen=g_tr), _SynthDs(samples=va_samples)
    elif args.dataset_file == "HWDB_synth":
        # Chinese CTC finetune on GNT-synth lines (reference
        # finetuning.py HWDB path, config/HWDB_full.py): label space
        # from the charset pickle so the 7356-class head matches the
        # Chinese_TPU pretrain trunk — mirrors pretrain.py:171-192
        hwdb_kw = {}
        cs_pkl = cfg.get_default("hwdb_charset_pickle", None)
        if cs_pkl:
            import pickle

            with open(cs_pkl, "rb") as fh:
                cps = pickle.load(fh)
            hwdb_kw["charset"] = [chr(c) if isinstance(c, int) else c
                                  for c in cps]
        gpl = cfg.get_default("hwdb_glyphs_per_line", None)
        if gpl:
            hwdb_kw["glyphs_per_line"] = tuple(gpl)
        g_tr = build_dataset("HWDB_synth", "train", root=args.data_root,
                             seed=args.seed, **hwdb_kw)
        g_va = build_dataset("HWDB_synth", "val", root=args.data_root,
                             seed=args.seed + 999, **hwdb_kw)
        it_va = iter(g_va)
        va_samples = [next(it_va)
                      for _ in range(cfg.get_default("eval_set_size", 64))]
        it_tr = iter(g_tr)

        class _GenDs:
            def __init__(self, it=None, samples=None):
                self.charset = g_tr.charset
                self._it, self._samples = it, samples

            def __len__(self):
                return 10 ** 9 if self._samples is None else len(self._samples)

            def __getitem__(self, i):
                return (next(self._it) if self._samples is None
                        else self._samples[i])

        train_ds, val_ds = _GenDs(it=it_tr), _GenDs(samples=va_samples)
    else:
        train_ds = build_dataset(args.dataset_file, "train", root=args.data_root)
        val_ds = build_dataset(args.dataset_file, "val", root=args.data_root)
    charset = train_ds.charset
    # keep the config family's labelbook offset (reference Latin.py:103
    # num_classes+1 vs Chinese.py:104 num_classes) — see evaluate.py
    offset = (cfg.get_default("dn_labelbook_size", cfg.num_classes + 1)
              - cfg.num_classes)
    cfg.num_classes = len(charset)
    cfg.dn_labelbook_size = len(charset) + offset

    token_based = getattr(train_ds, "token_based", False)
    space_label = charset.index(" ") if " " in charset else -1
    make_batcher = lambda src, train, seed: BucketBatcher(
        src, batch_size=cfg.batch_size, scales=cfg.data_aug_scales,
        max_size=cfg.data_aug_max_size,
        max_targets=cfg.get_default("max_targets", 256),
        w_max=cfg.get_default("image_w_max", 1344),
        h_max=cfg.get_default("image_h_max", None),
        train=train, space_label=space_label, seed=seed,
        transfer_uint8=cfg.get_default("transfer_uint8", False),
    )
    train_batches = make_batcher(dataset_iter(train_ds), True, args.seed)

    trainer = Trainer(cfg, mode="ctc", output_dir=args.output_dir,
                      charset=charset, seed=args.seed)
    first = next(iter(train_batches))
    params = trainer.init_params(batch_to_arrays(first))

    stage1 = not args.resume_finetuning
    if stage1 and args.pretrain_dir:
        if args.pretrain_dir.endswith(".npz"):
            # committed params snapshot (survives the sandbox VM wipe;
            # see checkpoints.export_params_npz)
            params = ckpt_lib.load_params_npz(args.pretrain_dir)
            trainer.logger.info(f"loaded pretrain params snapshot {args.pretrain_dir}")
        else:
            # load pretrain params (strict=False analog: restore what matches)
            pre = ckpt_lib.restore_checkpoint(
                os.path.join(args.pretrain_dir, "checkpoint"),
                {"params": params, "opt_state": None, "step": 0, "ema_params": None,
                 "epoch": 0},
            )
            if pre is not None:
                params = pre["params"]
                trainer.logger.info(f"loaded pretrain params from {args.pretrain_dir}")
        if args.new_class_embedding:
            old_charset = (
                load_default_charset() if args.path_old_charset is None
                else __import__("dtlr_tpu.data.charset", fromlist=["load_charset_file"]).load_charset_file(args.path_old_charset)
            )
            params = ckpt_lib.surgery_class_heads(
                params, old_charset, charset, jax.random.PRNGKey(args.seed),
                smart_mapping=args.smart_mapping,
            )
            trainer.logger.info(
                f"class-head surgery: {len(old_charset)} -> {len(charset)} classes"
                f" (smart_mapping={args.smart_mapping})"
            )

    trainer.build(params, head_only=stage1 and not args.full_model)
    if args.resume_finetuning:
        trainer.try_resume()

    max_it = cfg.get_default("max_iterations", 2500)
    eval_epoch = cfg.get_default("eval_epoch", 10)
    best_cer = float("inf")
    for epoch in range(trainer.epoch, cfg.epochs):
        stats = trainer.train_epoch(iter(train_batches), max_iterations=max_it, train_cer_every=100)
        trainer.logger.info(f"epoch {epoch}: {stats}")
        trainer.save()
        if (epoch + 1) % eval_epoch == 0:
            val_batches = make_batcher(eval_iter(val_ds), False, 7)
            est = trainer.evaluate_ctc(iter(val_batches), charset)
            if est["cer"] < best_cer:
                best_cer = est["cer"]
                trainer.save("checkpoint_best_regular")


if __name__ == "__main__":
    main()
