"""Synthetic pretraining entry point (reference main_synthetic.py).

Usage:
    python -m dtlr_tpu.train.pretrain -c dtlr_tpu/configs/Latin.py \
        --dataset_file synthetic_line_OCR_general --output_dir outputs/pretrain \
        [--options k=v ...] [--epochs N] [--steps_per_epoch N]

Differences from the reference driver, by design:
- synthetic data streams from an in-memory generator thread instead of
  a per-epoch 5000-file disk regeneration (main_synthetic.py:383)
- DDP init is replaced by a jax Mesh; run the same command on every
  host for multi-host (jax.distributed.initialize is called when
  JAX_COORDINATOR_ADDRESS is set)
"""

from __future__ import annotations

import argparse
import os

from ..config import load_config, parse_options
from ..config.loader import apply_options, dump_config
from ..data.batching import BucketBatcher
from ..data.charset import resolve_synthetic_charset
from ..data.loaders import build_dataset
from .engine import Trainer, batch_to_arrays


def parse_args(argv=None):
    p = argparse.ArgumentParser("DTLR-TPU synthetic pretraining")
    p.add_argument("-c", "--config_file", required=True)
    p.add_argument("--dataset_file", default="synthetic_line_OCR_general")
    p.add_argument("--output_dir", default="outputs/pretrain")
    p.add_argument("--options", nargs="*", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=1250)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--data_root", default="./data")
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--eval", action="store_true",
                   help="evaluation-only pass (reference main_synthetic.py "
                        "--eval mode): resume checkpoint, run val CER, exit")
    p.add_argument("--warm_start_npz", default=None,
                   help="tolerant params warm start from a committed "
                        ".npz snapshot (checkpoints.merge_params_npz): "
                        "copies every shape-matching leaf, keeps fresh "
                        "init for the rest — lets an architecture "
                        "variant (e.g. decoder_ca=deform) adapt from a "
                        "trained trunk; ignored when output_dir already "
                        "holds a resumable checkpoint")
    p.add_argument("--deadline", type=float, default=0.0,
                   help="epoch-seconds wall-clock deadline: finish the "
                        "current epoch, checkpoint, and exit 0 once past "
                        "it (lets an orchestrator chain stages on a "
                        "single-chip budget)")
    p.add_argument("--deadline_file", default=None,
                   help="path holding an epoch-seconds deadline, re-read "
                        "after every epoch: a lease file the orchestrator "
                        "keeps renewing extends a RUNNING trainer instead "
                        "of forcing a relaunch per lease window (advisor "
                        "round-3 medium #1); falls back to --deadline "
                        "while the file is missing/garbled")
    p.add_argument("--train_seed", type=int, default=None,
                   help="seed for the training data stream only "
                        "(default: --seed). Vary this per relaunch so a "
                        "restarted trainer sees fresh samples instead of "
                        "replaying the same slice, while the val/eval "
                        "stream stays pinned to --seed for a comparable "
                        "CER trajectory (advisor round-3 medium #2)")
    return p.parse_args(argv)


def effective_deadline(args) -> float:
    """Lease-file deadline when readable, else the static --deadline."""
    if args.deadline_file:
        try:
            with open(args.deadline_file) as fh:
                return float(fh.read().strip())
        except (OSError, ValueError):
            pass
    return args.deadline


def maybe_init_distributed():
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def main(argv=None):
    args = parse_args(argv)
    cfg = apply_options(load_config(args.config_file), parse_options(args.options))
    if args.epochs is not None:
        cfg.epochs = args.epochs
    cfg.steps_per_epoch = args.steps_per_epoch
    maybe_init_distributed()

    os.makedirs(args.output_dir, exist_ok=True)
    dump_config(cfg, os.path.join(args.output_dir, "config_cfg.py"))

    plain = cfg.get_default("plain_background", False)
    max_words = cfg.get_default("synthetic_max_words", 30)
    if args.dataset_file == "synthetic_line_OCR_general":
        # font category/ability sampling + wikitext corpus (reference
        # synthetic_lines_general.py:185-249,305-310) — active when the
        # config points at the assets, mechanisms fall back to system
        # fonts / plain random text otherwise
        bg_dir = cfg.get_default("synthetic_background_dir", None)
        if bg_dir:
            from ..data.canvas import set_background_dir

            set_background_dir(bg_dir)

        def synth_kw(mode: str, seed: int) -> dict:
            kw = dict(plain_background=plain, max_words=max_words, seed=seed)
            # honor synthetic_charset like the finetune driver and the
            # standalone evaluator (evaluate.py:192-204) do: without
            # this, a charset-restricted pretrain trained a full
            # 166-class head that the evaluator could never reload
            # ("default" -> None -> the generator's 166-char default)
            sub = cfg.get_default("synthetic_charset", "default")
            restricted = resolve_synthetic_charset(sub)
            if restricted is not None:
                kw["charset"] = restricted
            font_dict = cfg.get_default("synthetic_font_dict", None)
            if font_dict:
                from ..data.fonts import FontSampler

                kw["font_sampler"] = FontSampler.from_reference_json(
                    font_dict,
                    font_root=cfg.get_default("synthetic_font_root", ""),
                    rng=__import__("numpy").random.default_rng(seed + 13),
                )
            corpus_dir = cfg.get_default("synthetic_corpus_dir", None)
            if corpus_dir:
                from ..data.corpus import CorpusSampler

                kw["corpus_sampler"] = CorpusSampler.from_dir(
                    corpus_dir,
                    language=cfg.get_default("synthetic_language", "en"),
                    mode=mode,
                    rng=__import__("numpy").random.default_rng(seed + 17),
                )
            kw["reference_text_mode"] = cfg.get_default(
                "synthetic_reference_text", False
            )
            # natural-text corpus mixing (reference draws wikitext for
            # half its lines, synthetic_lines_general.py:160-249): the
            # corpus-FILE path renders <=max_words word windows, which
            # fit the bucketed geometry — unlike full 100-char
            # CorpusSampler lines. Same keys as the finetune stage
            # (finetune.py synthetic_corpus_file/_val_file/_prob).
            c_train = cfg.get_default("synthetic_corpus_file", None)
            c_val = cfg.get_default("synthetic_corpus_val_file", None)
            path = (c_val if ("val" in mode and c_val) else c_train)
            if path:
                with open(path) as fh:
                    kw["corpus_lines"] = [l.strip() for l in fh if l.strip()]
                kw["corpus_prob"] = cfg.get_default("synthetic_corpus_prob", 0.5)
            return kw

        train_seed = args.train_seed if args.train_seed is not None else args.seed
        train_src = build_dataset(args.dataset_file, "train",
                                  **synth_kw("train", train_seed))
        val_src = build_dataset(args.dataset_file, "val",
                                **synth_kw("val", args.seed + 1))
        charset = train_src.charset
        train_iter, val_iter = iter(train_src), iter(val_src)
    elif args.dataset_file == "HWDB_synth":
        # full 7356-class head even when the glyph bank covers fewer
        # chars: the label space comes from the HWDB charset pickle
        # (reference datasets/HWDB_Synth.py reads data/HWDB_v1/charset.pkl)
        hwdb_kw = {}
        cs_pkl = cfg.get_default("hwdb_charset_pickle", None)
        if cs_pkl:
            import pickle

            with open(cs_pkl, "rb") as fh:
                cps = pickle.load(fh)
            hwdb_kw["charset"] = [chr(c) if isinstance(c, int) else c for c in cps]
        gpl = cfg.get_default("hwdb_glyphs_per_line", None)
        if gpl:
            hwdb_kw["glyphs_per_line"] = tuple(gpl)
        train_src = build_dataset(
            args.dataset_file, "train", root=args.data_root,
            seed=args.train_seed if args.train_seed is not None else args.seed,
            **hwdb_kw)
        val_src = build_dataset(args.dataset_file, "val", root=args.data_root,
                                seed=args.seed + 1, **hwdb_kw)
        charset = train_src.charset
        train_iter, val_iter = iter(train_src), iter(val_src)
    else:
        raise ValueError("pretraining expects a synthetic dataset")

    # re-derive the class count from the dataset charset exactly like
    # eval/evaluate.py does (preserving the config family's labelbook
    # offset, reference Latin.py:103 vs Chinese.py:104): without this a
    # synthetic_charset override trains a head sized by the config's
    # stale num_classes, and the checkpoint can never be reloaded by the
    # evaluator (label_enc shape mismatch). No-op for the stock configs,
    # whose num_classes already equals len(charset).
    offset = (cfg.get_default("dn_labelbook_size", cfg.num_classes + 1)
              - cfg.num_classes)
    cfg.num_classes = len(charset)
    cfg.dn_labelbook_size = len(charset) + offset
    # re-dump so downstream consumers of this run's config_cfg.py (the
    # finetune stage rebuilding the pretrain model, the evaluator)
    # record the derived class count, not the config file's stale one
    dump_config(cfg, os.path.join(args.output_dir, "config_cfg.py"))

    space_label = charset.index(" ") if " " in charset else -1
    make_batcher = lambda src, train, seed: BucketBatcher(
        src,
        batch_size=cfg.batch_size,
        scales=cfg.data_aug_scales,
        max_size=cfg.data_aug_max_size,
        max_targets=cfg.get_default("max_targets", 256),
        w_max=cfg.get_default("image_w_max", 1344),
        h_max=cfg.get_default("image_h_max", None),
        train=train,
        truly_random_erasing=cfg.get_default("truly_random_erasing", False),
        instance_erasing=cfg.get_default("truly_random_erasing", False),
        space_label=space_label,
        seed=seed,
        transfer_uint8=cfg.get_default("transfer_uint8", False),
        reuse=cfg.get_default("synthetic_reuse", 1) if train else 1,
    )
    train_batches = make_batcher(
        train_iter, True,
        args.train_seed if args.train_seed is not None else args.seed)

    # fixed held-out eval set so the CER trajectory across epochs is
    # comparable (the reference evaluates a fixed 100-image val split,
    # main_synthetic.py:447-463)
    n_eval = int(cfg.get_default("eval_set_size", 200))
    eval_samples = [next(val_iter) for _ in range(n_eval)]

    def eval_batches():
        return iter(make_batcher(iter(eval_samples), False, args.seed + 7))

    trainer = Trainer(cfg, mode="detection", output_dir=args.output_dir,
                      charset=charset, seed=args.seed)
    first = next(iter(train_batches))
    params = trainer.init_params(batch_to_arrays(first))
    if args.warm_start_npz:
        from . import checkpoints as ckpt_lib

        if ckpt_lib.latest_step(os.path.join(args.output_dir, "checkpoint")) is None:
            params, counts = ckpt_lib.merge_params_npz(params, args.warm_start_npz)
            trainer.logger.info(
                f"warm start from {args.warm_start_npz}: {counts}"
            )
    trainer.build(params)
    if args.resume:
        trainer.try_resume()

    if args.eval:
        stats = trainer.evaluate_ctc(eval_batches(), charset)
        print(stats)
        return stats

    use_ema = cfg.get_default("use_ema", False)
    save_int = cfg.get_default("save_checkpoint_interval", 100)
    rss_limit = float(cfg.get_default("rss_restart_gb", 0.0))
    for epoch in range(trainer.epoch, cfg.epochs):
        stats = trainer.train_epoch(
            iter(train_batches), max_iterations=args.steps_per_epoch,
        )
        trainer.logger.info(f"epoch {epoch}: {stats}")
        trainer.save()
        if (epoch + 1) % save_int == 0:
            trainer.save(f"checkpoint{epoch:04d}")
        if (epoch + 1) % args.eval_every == 0:
            trainer.evaluate_ctc(eval_batches(), charset)
            if use_ema:
                # reference evaluates the EMA weights when enabled
                # (main_synthetic.py:447-463)
                trainer.evaluate_ctc(eval_batches(), charset,
                                     use_ema=True, tag="eval_ema")
        deadline = effective_deadline(args)
        if deadline > 0 and __import__("time").time() > deadline:
            trainer.logger.info(f"wall-clock deadline reached after epoch {epoch}")
            break
        if rss_limit > 0 and trainer.stop_if_rss_above(rss_limit):
            # axon client host-buffer leak: exit 3 after the checkpoint;
            # an outer restart loop resumes (scripts/bigrun_pretrain.sh)
            raise SystemExit(3)
        if trainer.stall_detected:
            # step-latency watchdog fired mid-epoch (engine.train_epoch):
            # the checkpoint above is fresh, so hand off to the restart
            # loop before the stall degenerates into a host OOM
            raise SystemExit(3)


if __name__ == "__main__":
    main()
