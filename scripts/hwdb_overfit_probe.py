"""Overfit probe: can the REAL HWDB train step learn class identity at all?

hwdb_probe_data.py proved the pixels->label function survives the batcher
(nearest-centroid 83% top-1 over ~580 classes); hwdb_diag.py proved the
28k-step chip run learned only the class marginal (p(gt|matched)=0.016 ==
background, gt-rank uniform in the active bank). This script closes the
fork: run the exact Trainer train step (Chinese config, warm-started the
same way as the chip run) on a FIXED handful of batches on CPU and watch
p(gt class | best-IoU query) on those same batches. If it cannot overfit
32 images, the chinese-mode training graph is broken; if it can, the chip
run's failure is schedule/scale dynamics.

CPU-only: env PYTHONPATH= python scripts/hwdb_overfit_probe.py [steps]
"""

import pickle
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from dtlr_tpu.config import load_config, parse_options  # noqa: E402
from dtlr_tpu.config.loader import apply_options  # noqa: E402
from dtlr_tpu.data.batching import BucketBatcher  # noqa: E402
from dtlr_tpu.data.loaders import build_dataset  # noqa: E402
from dtlr_tpu.train.engine import Trainer, batch_to_arrays  # noqa: E402
from scripts.hwdb_diag import iou_matrix  # noqa: E402


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cfg = apply_options(
        load_config(os.environ.get("PROBE_CFG",
                    "dtlr_tpu/configs/Chinese_TPU.py")),
        parse_options([
            "data_aug_scales=[64]", "data_aug_max_size=1024",
            "image_w_max=1024", "image_h_max=96", "batch_size=4",
            "hwdb_glyphs_per_line=[4,8]", "transfer_uint8=False",
            "compilation_cache_dir=",
        ]),
    )
    with open(cfg.hwdb_charset_pickle, "rb") as fh:
        cps = pickle.load(fh)
    charset = [chr(c) if isinstance(c, int) else c for c in cps]
    gen = build_dataset("HWDB_synth", "train", root="outputs/hwdb_assets",
                        seed=11, charset=charset,
                        glyphs_per_line=tuple(cfg.hwdb_glyphs_per_line))
    it = iter(gen)

    def src():
        while True:
            yield next(it)

    batcher = iter(BucketBatcher(
        src(), batch_size=4, scales=cfg.data_aug_scales,
        max_size=cfg.data_aug_max_size, max_targets=cfg.max_targets,
        w_max=cfg.image_w_max, h_max=cfg.image_h_max, train=True))
    fixed = [next(batcher) for _ in range(8)]
    arrays = [batch_to_arrays(b) for b in fixed]

    trainer = Trainer(cfg, mode="detection", output_dir="/tmp/hwdb_overfit",
                      charset=charset)
    params = trainer.init_params(arrays[0])
    from dtlr_tpu.train import checkpoints as ckpt_lib
    params, counts = ckpt_lib.merge_params_npz(
        params, "/root/repo/artifacts/r4run_params_ema.npz")
    print(f"warm start: {counts}", flush=True)
    trainer.build(params)

    def probe():
        ps, ranks, hits, total = [], [], 0, 0
        for b, arr in zip(fixed[:4], arrays[:4]):
            out = trainer._eval_fn(trainer.state.params,
                                   {k: np.asarray(v) for k, v in arr.items()})
            logits = np.asarray(out["pred_logits"], np.float32)
            boxes = np.asarray(out["pred_boxes"], np.float32)
            prob = 1 / (1 + np.exp(-logits))
            for i in range(logits.shape[0]):
                valid = np.asarray(b.valid[i]).astype(bool)
                gt_b = np.asarray(b.boxes[i])[valid]
                gt_l = np.asarray(b.labels[i])[valid]
                if gt_b.size == 0:
                    continue
                best_q = iou_matrix(gt_b, boxes[i]).argmax(1)
                for t, q in enumerate(best_q):
                    c = int(gt_l[t])
                    p = prob[i, q]
                    ps.append(float(p[c]))
                    ranks.append(int((p > p[c]).sum()))
                    hits += int(int(p.argmax()) == c)
                    total += 1
        return (float(np.mean(ps)), float(np.median(ranks)),
                hits / max(total, 1))

    t0 = time.time()
    print(f"step 0: p_gt={probe()}", flush=True)
    rng = jax.random.PRNGKey(5)
    k = 0
    for step in range(1, n_steps + 1):
        arr = arrays[k % len(arrays)]
        k += 1
        rng, sub = jax.random.split(rng)
        trainer.state, metrics = trainer._step_fn(trainer.state, arr, sub)
        if step % 50 == 0 or step == n_steps:
            p, r, h = probe()
            lce = float(metrics.get("loss_ce", float("nan")))
            print(f"step {step}: loss_ce={lce:.4f} p_gt={p:.4f} "
                  f"rank_med={r:.0f} argmax_hit={h:.2%} "
                  f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
