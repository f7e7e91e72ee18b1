"""Render detection predictions of a committed npz params snapshot on
held-out synthetic lines (CPU) — visual evidence + proof the snapshot
drives inference end-to-end. Mirrors the bigrun's eval-set construction
(seed+1 val stream, batcher seed+7) so images come from the same
held-out distribution the CER trajectory was measured on.

Usage: python scripts/render_evidence.py <params.npz> <out_dir> [n_images] [seed]
"""

from __future__ import annotations

import sys


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    npz_path, out_dir = sys.argv[1], sys.argv[2]
    n_images = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from dtlr_tpu.config import load_config
    from dtlr_tpu.data.batching import BucketBatcher
    from dtlr_tpu.data.loaders import build_dataset
    from dtlr_tpu.models.dino import build_dino_from_config
    from dtlr_tpu.train.checkpoints import load_params_npz
    from dtlr_tpu.utils.visualizer import save_snapshot

    from dtlr_tpu.config.loader import apply_options, parse_options

    cfg = load_config("dtlr_tpu/configs/Latin_TPU.py")
    cfg = apply_options(cfg, parse_options([
        "data_aug_scales=[128]", "data_aug_max_size=1024",
        "image_w_max=1024", "image_h_max=192", "batch_size=1",
        "synthetic_max_words=5", "max_targets=64",
    ]))

    val_src = build_dataset("synthetic_line_OCR_general", "val",
                            plain_background=cfg.get_default("synthetic_plain_background", False),
                            max_words=cfg.get_default("synthetic_max_words", 8),
                            seed=seed + 1)
    charset = val_src.charset
    model = build_dino_from_config(cfg)
    params = load_params_npz(npz_path)

    space_label = charset.index(" ") if " " in charset else -1
    val_iter = iter(val_src)
    samples = [next(val_iter) for _ in range(n_images)]
    batcher = BucketBatcher(
        iter(samples), batch_size=1, scales=cfg.data_aug_scales,
        max_size=cfg.data_aug_max_size, max_targets=64,
        w_max=1024, h_max=192, train=False,
        space_label=space_label, seed=seed + 7,
    )

    fwd = jax.jit(lambda p, im, vh: model.apply(p, im, vh, None, train=False))
    for i, batch in enumerate(batcher):
        out = fwd(params, jnp.asarray(batch.images), jnp.asarray(batch.valid_hw))
        logits = np.asarray(out["pred_logits"][0], np.float32)
        boxes = np.asarray(out["pred_boxes"][0], np.float32)
        scores = 1 / (1 + np.exp(-logits.max(-1)))
        keep = scores > 0.3
        if not keep.any():
            keep = np.zeros_like(keep)
            keep[np.argsort(scores)[-40:]] = True
        path = save_snapshot(
            out_dir, i, batch.images[0], boxes[keep], logits.argmax(-1)[keep],
            charset, valid_hw=batch.valid_hw[0],
            gt_boxes=np.asarray(batch.boxes[0])[np.asarray(batch.valid[0], bool)],
        )
        print(f"rendered {path} (max score {scores.max():.3f}, "
              f"{int((scores > 0.3).sum())} above TH=0.3)")


if __name__ == "__main__":
    main()
