"""Tabulate a run's eval trajectory from its log.txt JSON lines.

Usage: python scripts/trajectory_report.py <run_dir> [--ema] [--every N]

Emits a markdown table (epoch, steps, train loss, greedy CER/WER,
nms_cer, loss_CTC, max/mean-max confidence, nq@TH counts) ready to
paste into ROUND3_NOTES/PERFORMANCE docs. Pure host-side text tool —
no jax import, safe to run next to a live TPU process.
"""

from __future__ import annotations

import argparse
import json
import os


def load_rows(run_dir: str):
    train, evals = {}, {}
    with open(os.path.join(run_dir, "log.txt")) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            ep = rec.get("epoch")
            if ep is None:
                continue
            if "eval" in rec:
                evals.setdefault(ep, {})["raw"] = rec["eval"]
            elif "eval_ema" in rec:
                evals.setdefault(ep, {})["ema"] = rec["eval_ema"]
            elif "loss" in rec:
                train[ep] = rec
    return train, evals


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--ema", action="store_true", help="tabulate EMA evals")
    p.add_argument("--every", type=int, default=1, help="row stride")
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    args = p.parse_args()

    train, evals = load_rows(args.run_dir)
    kind = "ema" if args.ema else "raw"
    print(f"| epoch | steps | loss | CER | WER | nms_cer | loss_CTC "
          f"| max_conf | mean_max | nq@0.1 | nq@0.2 | nq@0.3 |")
    print("|" + "---|" * 12)
    for i, ep in enumerate(sorted(evals)):
        if i % args.every:
            continue
        ev = evals[ep].get(kind)
        if ev is None:
            continue
        tr = train.get(ep, {})
        print(
            f"| {ep} | {(ep + 1) * args.steps_per_epoch / 1000:.0f}k "
            f"| {tr.get('loss', float('nan')):.1f} "
            f"| {ev['cer']:.3f} | {ev.get('wer', float('nan')):.2f} "
            f"| {ev.get('nms_cer', float('nan')):.3f} "
            f"| {ev.get('loss_CTC', float('nan')):.1f} "
            f"| {ev.get('max_conf', float('nan')):.3f} "
            f"| {ev.get('mean_max_conf', float('nan')):.3f} "
            f"| {ev.get('nq@0.1', float('nan')):.1f} "
            f"| {ev.get('nq@0.2', float('nan')):.2f} "
            f"| {ev.get('nq@0.3', float('nan')):.2f} |"
        )


if __name__ == "__main__":
    main()
