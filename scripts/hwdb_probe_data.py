"""Model-free learnability probe of the HWDB-synth training data.

If a trivial nearest-centroid classifier on downsampled GT-box crops can
predict the label far above chance, the pixels->label function exists and
any training failure is dynamics (loss scale / LR / head init). If it
cannot, the pipeline is scrambling glyph<->label pairs somewhere between
the bank and the batch (what hwdb_diag's model-side view cannot separate).

Tests two stages:
  A. raw SyntheticHWDBGenerator output (crop via its pixel boxes);
  B. the actual training batch (BucketBatcher train=True, crop via the
     normalized cxcywh target boxes the criterion sees).

CPU-only: env PYTHONPATH= python scripts/hwdb_probe_data.py
"""

import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from dtlr_tpu.data.batching import BucketBatcher  # noqa: E402
from dtlr_tpu.data.loaders import build_dataset  # noqa: E402

RS = 12  # crop downsample size


def crop_feat(img: np.ndarray, x0, y0, x1, y1) -> np.ndarray:
    h, w = img.shape[:2]
    x0, x1 = int(max(0, x0)), int(min(w, x1))
    y0, y1 = int(max(0, y0)), int(min(h, y1))
    if x1 - x0 < 2 or y1 - y0 < 2:
        return None
    c = img[y0:y1, x0:x1]
    if c.ndim == 3:
        c = c.mean(-1)
    ys = np.linspace(0, c.shape[0] - 1, RS).astype(int)
    xs = np.linspace(0, c.shape[1] - 1, RS).astype(int)
    f = c[np.ix_(ys, xs)].astype(np.float32).ravel()
    n = np.linalg.norm(f - f.mean())
    return (f - f.mean()) / (n + 1e-6)


def eval_nearest_centroid(X, y, n_train_frac=0.7, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(y))
    cut = int(len(y) * n_train_frac)
    tr, te = idx[:cut], idx[cut:]
    classes = sorted(set(y[tr]) & set(y[te]))
    cents = np.stack([X[tr][y[tr] == c].mean(0) for c in classes])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-6
    keep = np.isin(y[te], classes)
    sims = X[te][keep] @ cents.T
    pred = np.asarray(classes)[sims.argmax(1)]
    acc = (pred == y[te][keep]).mean()
    return acc, len(classes), keep.sum()


def main():
    with open("/root/reference/data/HWDB_v1/charset.pkl", "rb") as fh:
        cps = pickle.load(fh)
    charset = [chr(c) if isinstance(c, int) else c for c in cps]
    gen = build_dataset("HWDB_synth", "train", root="outputs/hwdb_assets",
                        seed=7, charset=charset, glyphs_per_line=(5, 25))

    # --- stage A: raw generator output ---
    X, y = [], []
    it = iter(gen)
    for _ in range(250):
        s = next(it)
        for (x0, y0, x1, y1), lab in zip(s["boxes"], s["labels"]):
            f = crop_feat(s["image"], x0, y0, x1, y1)
            if f is not None:
                X.append(f)
                y.append(int(lab))
    X, y = np.stack(X), np.asarray(y)
    acc, ncls, nte = eval_nearest_centroid(X, y)
    print(f"[A raw generator] crops={len(y)} classes={ncls} "
          f"test_n={nte} top1={acc:.3f} (chance {1 / ncls:.4f})")

    # --- stage B: through the training batcher (train=True transforms) ---
    def src():
        while True:
            yield next(it)

    for train in (False, True):
        batches = iter(BucketBatcher(src(), batch_size=4, scales=[96],
                                     max_size=1024, max_targets=64,
                                     w_max=1024, h_max=160, train=train))
        Xb, yb = [], []
        for _ in range(120):
            batch = next(batches)
            imgs = np.asarray(batch.images, np.float32)
            for b in range(imgs.shape[0]):
                valid = np.asarray(batch.valid[b]).astype(bool)
                gt = np.asarray(batch.boxes[b])[valid]  # cxcywh normalized
                labs = np.asarray(batch.labels[b])[valid]
                # boxes are normalized to the UNPADDED resized image
                # (batching.py module docstring); valid_hw has true size
                h, w = (int(v) for v in batch.valid_hw[b])
                for (cx, cy, bw, bh), lab in zip(gt, labs):
                    f = crop_feat(imgs[b], (cx - bw / 2) * w,
                                  (cy - bh / 2) * h,
                                  (cx + bw / 2) * w, (cy + bh / 2) * h)
                    if f is not None:
                        Xb.append(f)
                        yb.append(int(lab))
        Xb, yb = np.stack(Xb), np.asarray(yb)
        acc, ncls, nte = eval_nearest_centroid(Xb, yb)
        print(f"[B batch train={train}] crops={len(yb)} classes={ncls} "
              f"test_n={nte} top1={acc:.3f} (chance {1 / ncls:.4f})")


if __name__ == "__main__":
    main()
