"""Diagnose the HWDB classification trajectory: slow-but-learning vs broken.

For each GT glyph box, find the best-IoU predicted query and report the
sigmoid probability of the GT class at that query against the background
(all-query max-class) distribution. If p(gt | best-IoU query) clearly
exceeds background, the 7356-class focal head is learning and only
needs steps; if it sits at background, the class targets/labels are
suspect (train/eval label-space mismatch).

CPU-only (safe to run next to a TPU job once its compiles are done):
    env PYTHONPATH= python scripts/hwdb_diag.py <run_dir> [n_batches]
"""

import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from dtlr_tpu.config import load_config, parse_options  # noqa: E402
from dtlr_tpu.config.loader import apply_options  # noqa: E402
from dtlr_tpu.data.batching import BucketBatcher  # noqa: E402
from dtlr_tpu.data.loaders import build_dataset  # noqa: E402
from dtlr_tpu.train.engine import Trainer, batch_to_arrays  # noqa: E402


def iou_matrix(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """IoU between GT (T,4) and predicted (Q,4) cxcywh boxes."""

    def to_xyxy(b):
        cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    g, p = to_xyxy(gt)[:, None], to_xyxy(pred)[None]
    lt = np.maximum(g[..., :2], p[..., :2])
    rb = np.minimum(g[..., 2:], p[..., 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_g = (g[..., 2] - g[..., 0]) * (g[..., 3] - g[..., 1])
    area_p = (p[..., 2] - p[..., 0]) * (p[..., 3] - p[..., 1])
    return inter / np.clip(area_g + area_p - inter, 1e-9, None)


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "outputs/hwdb_real"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = apply_options(
        load_config(f"{run_dir}/config_cfg.py"),
        # small CPU geometry (>=900 encoder tokens for the top-k)
        parse_options(["data_aug_scales=[64]", "data_aug_max_size=1024",
                       "image_w_max=1024", "image_h_max=96", "batch_size=4",
                       "hwdb_glyphs_per_line=[4,8]", "transfer_uint8=False",
                       "compilation_cache_dir="]),
    )
    with open(cfg.hwdb_charset_pickle, "rb") as fh:
        cps = pickle.load(fh)
    charset = [chr(c) if isinstance(c, int) else c for c in cps]
    gen = build_dataset("HWDB_synth", "val", root="outputs/hwdb_assets",
                        seed=321, charset=charset,
                        glyphs_per_line=tuple(cfg.hwdb_glyphs_per_line))
    it = iter(gen)

    def src():
        while True:
            yield next(it)

    batches = iter(BucketBatcher(
        src(), batch_size=4, scales=cfg.data_aug_scales,
        max_size=cfg.data_aug_max_size, max_targets=cfg.max_targets,
        w_max=cfg.image_w_max, h_max=cfg.image_h_max, train=False))

    trainer = Trainer(cfg, mode="detection", output_dir=run_dir,
                      charset=charset)
    first = next(batches)
    params = trainer.init_params(batch_to_arrays(first))
    trainer.build(params)
    if not trainer.try_resume():
        raise FileNotFoundError(f"no checkpoint under {run_dir}")
    params = trainer.state.params

    active = {gen.index[c] for c in gen.bank.chars if c in gen.index}
    matched_p, matched_rank = [], []
    bg_max, topk_hit = [], 0
    shift_hits = {d: 0 for d in (-2, -1, 1, 2)}
    argmax_in_active = 0
    total = 0
    batch = first
    for _ in range(n_batches):
        arrays = batch_to_arrays(batch)
        out = trainer._eval_fn(params, {k: np.asarray(v) for k, v in arrays.items()})
        logits = np.asarray(out["pred_logits"], np.float32)  # (B, Q, C)
        boxes = np.asarray(out["pred_boxes"], np.float32)
        probs = 1 / (1 + np.exp(-logits))
        for b in range(logits.shape[0]):
            valid = np.asarray(batch.valid[b]).astype(bool)
            gt_boxes = np.asarray(batch.boxes[b])[valid]
            gt_labels = np.asarray(batch.labels[b])[valid]
            if gt_boxes.size == 0:
                continue
            iou = iou_matrix(gt_boxes, boxes[b])
            best_q = iou.argmax(1)
            for t, q in enumerate(best_q):
                c = int(gt_labels[t])
                p = probs[b, q]
                matched_p.append(float(p[c]))
                matched_rank.append(int((p > p[c]).sum()))
                am = int(p.argmax())
                topk_hit += int(am == c)
                argmax_in_active += int(am in active)
                for d in shift_hits:
                    if 0 <= c + d < p.shape[0]:
                        shift_hits[d] += int(am == c + d)
                total += 1
            bg_max.append(float(probs[b].max()))
        batch = next(batches)

    mp = np.array(matched_p)
    print(f"matched GT glyphs: {total}")
    print(f"p(gt class | best-IoU query): mean {mp.mean():.4f} "
          f"median {np.median(mp):.4f} p90 {np.percentile(mp, 90):.4f}")
    print(f"rank of gt class at that query (0=best of 7356): "
          f"median {np.median(matched_rank):.0f} "
          f"p90 {np.percentile(matched_rank, 90):.0f}")
    print(f"argmax-class == gt at matched query: {topk_hit}/{total} "
          f"({topk_hit / max(total, 1):.1%})")
    print(f"background per-image max prob: mean {np.mean(bg_max):.4f}")
    print(f"argmax class in the {len(active)}-char active bank: "
          f"{argmax_in_active}/{total} ({argmax_in_active / max(total, 1):.1%}; "
          f"chance {len(active) / 7356:.1%})")
    print(f"index-shift check (argmax == gt+d): {shift_hits}")


if __name__ == "__main__":
    main()
