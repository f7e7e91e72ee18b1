"""Benchmark: line-inference throughput of the flagship DINO-Latin model
on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no throughput numbers and this
sandbox has no CUDA GPU, so vs_baseline anchors to the MEASURED
reference-faithful configuration of THIS framework on THE SAME chip
(per-head deformable encoder + deformable decoder CA, i.e. the
reference's architecture translated 1:1): 13.8 lines/s/chip
(PERFORMANCE.md, same scan-loop harness). External anchor, also
measured: the reference torch stack itself on this host's CPU does
0.109 lines/s (baseline_reference_cpu.json,
scripts/measure_reference_cpu.py — batch=1 protocol of
evaluation.py:477-499).
"""

from __future__ import annotations

import json
import time

# measured: reference-faithful dtlr_tpu config on the same v5e chip
# (see module docstring; re-measure with scripts via decoder_ca=deform,
# encoder_type=deformable, shared_offsets=False)
REFERENCE_FAITHFUL_LINES_PER_SEC = 13.8


def main():
    import os

    import jax
    import jax.numpy as jnp

    # BENCH_TINY=1: shrink the model/geometry and force CPU so the whole
    # bench code path (scan-loop timing, cost_analysis MFU, the batch-
    # scaling points below) can be smoke-tested without the chip. The
    # numbers it prints are meaningless; only the real-TPU default run
    # is a benchmark.
    tiny = bool(os.environ.get("BENCH_TINY"))
    if tiny:
        jax.config.update("jax_platforms", "cpu")

    # persistent XLA compile cache (same dir the trainers use): the
    # flagship forward+scan programs compile in ~8-10 min through this
    # sandbox's compile helper; with the cache a re-bench (e.g. the
    # driver's round-end run) reloads them in seconds
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "outputs", "xla_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from dtlr_tpu.models.dino import DINO

    # flagship TPU config (Latin_TPU.py): reference Latin geometry with
    # (a) the windowed dense encoder (zero-gather, MXU-native),
    # (b) dense decoder cross-attention (Q x S on the MXU; exact
    #     deformable sampling is gather row-rate-bound on TPU), and
    # (c) head-shared deformable sampling wherever deform attn is used.
    # Same harness, other configs: reference-faithful per-head
    # deformable = 13.8 lines/s/chip; shared-offsets deformable
    # encoder = 25.3; windowed encoder + deform decoder = 97.
    model = DINO(
        num_classes=166, num_queries=24 if tiny else 900,
        hidden_dim=32 if tiny else 256, n_heads=4 if tiny else 8,
        num_encoder_layers=1 if tiny else 6,
        num_decoder_layers=2 if tiny else 6,
        d_ffn=64 if tiny else 2048,
        num_feature_levels=4, use_dn=True, dn_number=100,
        # norm_kind follows the committed flagship recipe
        # (configs/Latin_TPU.py: GroupNorm, the from-scratch ablation
        # winner) so the bench measures the model we actually train;
        # round-2 numbers were frozen_bn (affine-foldable, ~equal cost)
        dn_labelbook_size=167, max_targets=256, norm_kind="group",
        shared_offsets=True, encoder_type="windowed",
        encoder_win=8 if tiny else 32,
        decoder_ca="dense", dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    # IAM eval geometry: ~85x1333 lines -> bucket 128x1344
    B, H, W = (2, 64, 128) if tiny else (8, 128, 1344)
    images = jax.random.normal(rng, (B, H, W, 3), jnp.float32)
    valid_hw = jnp.tile(
        jnp.asarray([[48, 120] if tiny else [96, 1333]], jnp.int32), (B, 1))
    # jit the init: unjitted flax init dispatches thousands of ops
    # individually (very slow over a remote-device tunnel)
    init = jax.jit(lambda r, im, vh: model.init({"params": r}, im, vh, None, train=False))
    params = init(rng, images[:1], valid_hw[:1])

    iters = 10

    # device-side loop with per-iteration perturbed inputs: robust to
    # host dispatch overhead and to runtimes that cache identical
    # (executable, operands) executions
    @jax.jit
    def forward_loop(params, images, valid_hw):
        def body(carry, i):
            out = model.apply(
                params, images + carry * 1e-6, valid_hw, None, train=False
            )
            s = out["pred_logits"].astype(jnp.float32).sum() + out["pred_boxes"].sum()
            return carry + s * 1e-20 + 1.0, s

        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return c

    # two full warmups with a host transfer: on the tunneled backend
    # block_until_ready is unreliable and the first executions can hit
    # compile/cache effects
    float(forward_loop(params, images, valid_hw))
    float(forward_loop(params, images, valid_hw))
    t0 = time.perf_counter()
    float(forward_loop(params, images, valid_hw))
    dt = time.perf_counter() - t0
    lines_per_sec = B * iters / dt

    # MFU: XLA's own FLOP count for one forward (cost_analysis of the
    # single-step program) / measured step time / chip peak.
    # v5e peak is 394 TFLOP/s int8, 197 TFLOP/s bf16 (public spec).
    mfu = None
    try:
        single = jax.jit(
            lambda p, im, vh: model.apply(p, im, vh, None, train=False)
        )
        cost = single.lower(params, images, valid_hw).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_fwd = float(cost.get("flops", 0.0))
        bytes_fwd = float(cost.get("bytes accessed", 0.0))
        step_time = dt / iters
        PEAK_BF16 = 197e12
        PEAK_HBM = 819e9  # v5e HBM bandwidth (public spec)
        mfu = flops_fwd / step_time / PEAK_BF16
        hbm_util = bytes_fwd / step_time / PEAK_HBM if bytes_fwd else None
    except Exception:
        hbm_util = None

    rec = {
        "metric": "line_inference_throughput",
        "value": round(lines_per_sec, 2),
        "unit": f"lines/sec/chip (B={B}, {H}x{W}, bf16)",
        "vs_baseline": round(lines_per_sec / REFERENCE_FAITHFUL_LINES_PER_SEC, 2),
    }
    if mfu is not None:
        rec["mfu"] = round(mfu, 4)
        rec["fwd_tflops"] = round(flops_fwd / 1e12, 3)
        if hbm_util is not None:
            # roofline attribution: when this sits near 1.0 the forward
            # is HBM-bandwidth-bound and MFU is capped at
            # flops/bytes * (PEAK_HBM/PEAK_BF16) regardless of GEMM
            # shaping (see PERFORMANCE.md speed-of-light table)
            rec["hbm_bytes_gb"] = round(bytes_fwd / 1e9, 3)
            rec["hbm_util"] = round(hbm_util, 4)

    # batch-scaling point: B=32 on the same geometry. MEASURED round 3:
    # 214.97 lines/s < 223.21 at B=8 (BENCH_r03.json) — throughput is
    # flat-to-down in batch, i.e. the forward is NOT dispatch- or
    # MXU-fill-limited at B=8; that is the bandwidth-bound signature the
    # hbm_util field quantifies. Kept as a regression probe.
    for B_big in (32, 16):
        try:
            images_big = jax.random.normal(rng, (B_big, H, W, 3), jnp.float32)
            valid_big = jnp.tile(valid_hw[:1], (B_big, 1))
            float(forward_loop(params, images_big, valid_big))
            float(forward_loop(params, images_big, valid_big))
            t0 = time.perf_counter()
            float(forward_loop(params, images_big, valid_big))
            dt_big = time.perf_counter() - t0
            rec[f"value_b{B_big}"] = round(B_big * iters / dt_big, 2)
            if mfu is not None and flops_fwd > 0:
                # FLOPs scale linearly in batch for this model (no
                # cross-sample compute); reuse the B=8 cost analysis
                rec[f"mfu_b{B_big}"] = round(
                    (flops_fwd * B_big / B) / (dt_big / iters) / PEAK_BF16, 4)
            break
        except Exception:
            continue
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
