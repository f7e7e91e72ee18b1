"""Profile the flagship inference forward on the attached TPU.

Two outputs, both printed to stdout:
 1. aggregate roofline: XLA flops + bytes accessed vs measured scan-loop
    step time -> MFU and HBM utilization (which resource binds)
 2. if the jax profiler produces a device trace through the tunneled
    backend: top-25 HLO ops by self time (else says so)

Run only when the chip is otherwise idle (one TPU process at a time).
Usage: python scripts/profile_forward.py [outdir]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_fwd"
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/repo/outputs/xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from dtlr_tpu.models.dino import DINO

    model = DINO(
        num_classes=166, num_queries=900, hidden_dim=256, n_heads=8,
        num_encoder_layers=6, num_decoder_layers=6, d_ffn=2048,
        num_feature_levels=4, use_dn=True, dn_number=100,
        dn_labelbook_size=167, max_targets=256, norm_kind="group",
        shared_offsets=True, encoder_type="windowed", encoder_win=32,
        decoder_ca="dense", dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    B, H, W = 8, 128, 1344
    images = jax.random.normal(rng, (B, H, W, 3), jnp.float32)
    valid_hw = jnp.tile(jnp.asarray([[96, 1333]], jnp.int32), (B, 1))
    init = jax.jit(
        lambda r, im, vh: model.init({"params": r}, im, vh, None, train=False))
    params = init(rng, images[:1], valid_hw[:1])

    iters = 10

    @jax.jit
    def forward_loop(params, images, valid_hw):
        def body(carry, i):
            out = model.apply(
                params, images + carry * 1e-6, valid_hw, None, train=False)
            s = out["pred_logits"].astype(jnp.float32).sum() + out["pred_boxes"].sum()
            return carry + s * 1e-20 + 1.0, s

        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return c

    float(forward_loop(params, images, valid_hw))
    float(forward_loop(params, images, valid_hw))
    t0 = time.perf_counter()
    float(forward_loop(params, images, valid_hw))
    dt = (time.perf_counter() - t0) / iters

    single = jax.jit(lambda p, im, vh: model.apply(p, im, vh, None, train=False))
    cost = single.lower(params, images, valid_hw).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    print(json.dumps({
        "step_ms": round(dt * 1e3, 2),
        "fwd_tflops": round(flops / 1e12, 3),
        "bytes_gb": round(byts / 1e9, 3),
        "mfu": round(flops / dt / 197e12, 4),
        "hbm_util": round(byts / dt / 819e9, 4),
        "sol_ms_compute": round(flops / 197e12 * 1e3, 2),
        "sol_ms_hbm": round(byts / 819e9 * 1e3, 2),
    }))

    # ---- attempt a device trace ----
    try:
        jax.profiler.start_trace(outdir)
        float(forward_loop(params, images, valid_hw))
        jax.profiler.stop_trace()
    except Exception as exc:
        print(f"trace failed: {exc}")
        return

    files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace.json.gz produced (tunnel backend likely has no "
              "device trace support)")
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep likely-device lanes: XLA op events carry args with hlo names
    per_op = {}
    for e in events:
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + e["dur"]
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    total = sum(per_op.values())
    print(f"trace: {path}  total event time {total/1e3:.1f} ms")
    for name, dur in top:
        print(f"{dur/1e3:9.2f} ms  {100*dur/max(total,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
