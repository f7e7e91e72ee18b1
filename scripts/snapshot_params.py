"""Export the params (and optionally EMA params) of the latest orbax
checkpoint in a run directory to committed-size .npz snapshots.

Orbax checkpoints live under gitignored outputs/ and die with the
sandbox VM between build rounds; a float16 .npz of the 48M-param
flagship is ~100 MB and survives in git, so the next round can
finetune/resume from it instead of re-pretraining
(`--pretrain_dir path/to/snapshot.npz`).

Usage: python scripts/snapshot_params.py <run_dir> <out_prefix> [--ema] [--fp32]
"""

from __future__ import annotations

import argparse
import os
import sys

# self-locating: callers clear PYTHONPATH to skip the axon sitecustomize
# (CLAUDE.md one-process rule), and `python scripts/foo.py` puts scripts/
# on sys.path, not the repo root — chain2's snapshot stage failed on this
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="training output dir (contains checkpoint/)")
    p.add_argument("out_prefix", help="writes <out_prefix>.npz (+ _ema.npz)")
    p.add_argument("--ema", action="store_true", help="also export EMA params")
    p.add_argument("--fp32", action="store_true", help="keep exact float32")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import os

    from dtlr_tpu.train import checkpoints as ckpt_lib

    ckpt_dir = os.path.join(args.run_dir, "checkpoint")
    state = ckpt_lib.restore_raw(ckpt_dir)
    if state is None:
        sys.exit(f"no checkpoint under {ckpt_dir}")
    dtype = None if args.fp32 else "float16"
    n = ckpt_lib.export_params_npz(state, args.out_prefix + ".npz", dtype=dtype)
    print(f"params  -> {args.out_prefix}.npz ({n/1e6:.1f} MB, step {state.get('step')})")
    if args.ema and state.get("ema_params") is not None:
        n = ckpt_lib.export_params_npz(
            state["ema_params"], args.out_prefix + "_ema.npz", dtype=dtype)
        print(f"ema     -> {args.out_prefix}_ema.npz ({n/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
