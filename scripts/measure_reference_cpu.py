"""Measure the REFERENCE torch DTLR stack (CPU) as an external baseline
anchor (VERDICT round-1 item 5: replace the guessed 10 lines/s with a
measurement).

Builds the full reference DINO (config/Latin.py geometry: 6+6 layers,
900 queries, ResNet-50) on CPU via tests/torch_ref.py (vendored
torchvision-named backbone + the reference's own pure-torch deform core,
ms_deform_attn_func.py:41-61) and times single-image eval forwards at
the reference eval resolution protocol (evaluation.py:477-499 runs
batch=1, one image at a time; min-side 800 capped at max_size 1333,
datasets/IAM.py make_coco_transforms val branch).

No CUDA GPU exists in this sandbox, so the GPU number cannot be
measured; the CPU number anchors the reference stack's per-line cost on
this host. Writes baseline_reference_cpu.json.

Usage: python scripts/measure_reference_cpu.py [--n 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch

from dtlr_tpu.config.loader import load_config
from torch_ref import build_reference_dino, load_reference


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--out", default="baseline_reference_cpu.json")
    args = ap.parse_args()

    torch.set_num_threads(os.cpu_count() or 1)
    cfg = load_config("/root/reference/config/Latin.py")
    cfg.device = "cpu"
    cfg.frozen_weights = None
    cfg.use_dn = False  # eval forward

    ns = load_reference()
    model, _, _ = build_reference_dino(cfg)
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())

    # typical IAM line (~100x1800 px) after the eval resize protocol:
    # min-side 800 capped at max 1333 -> scale = 1333/1800, ~74x1333
    sizes = [(74, 1333), (96, 1333), (64, 1333)]
    times = []
    with torch.no_grad():
        for h, w in sizes:
            img = torch.randn(1, 3, h, w)
            mask = torch.zeros(1, h, w, dtype=torch.bool)
            sample = ns.NestedTensor(img, mask)
            model(sample)  # warmup
            for _ in range(args.n):
                t0 = time.perf_counter()
                model(sample)
                times.append(time.perf_counter() - t0)
            print(f"size {h}x{w}: {np.mean(times[-args.n:]):.3f} s/img")

    mean_s = float(np.mean(times))
    out = {
        "stack": "reference torch DTLR (pure-torch deform core), CPU",
        "geometry": "Latin.py: 6+6 layers, 900 queries, resnet50",
        "params": n_params,
        "host_cpus": os.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        "eval_protocol": "batch=1 per-image forward (evaluation.py:477-499)",
        "mean_s_per_line": mean_s,
        "lines_per_sec": 1.0 / mean_s,
        "note": "no CUDA device in sandbox; GPU number not measurable",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
