"""Benchmark: line-inference throughput of the flagship DINO-Latin model
on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

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

Round-5 additions (VERDICT r4 next #4 / weak #8):
- three forward arms: `base` (round 1-4 series config: no box prior),
  `boxbias` (committed flagship recipe, materialized scores + d2), and
  `flash` (same recipe through the fused VMEM-resident kernel,
  ops/flash_attn.py). The headline `value` is the fastest arm; per-arm
  throughput and XLA bytes-accessed land in value_*/hbm_* fields so the
  flash-vs-materialized HBM delta is driver-visible.
- `train_it_per_sec`: one jitted detection train step at flagship
  geometry (auction matcher + CDN + full backward + param-group AdamW +
  EMA — the committed Latin_TPU recipe), scan-loop timed.
"""

from __future__ import annotations

import json
import os
import time

# measured: reference-faithful dtlr_tpu config on the same v5e chip
# (see module docstring; re-measure with scripts via decoder_ca=deform,
# encoder_type=deformable, shared_offsets=False)
REFERENCE_FAITHFUL_LINES_PER_SEC = 13.8


def main():
    import jax
    import jax.numpy as jnp

    # BENCH_TINY=1: shrink the model/geometry and force CPU so the whole
    # bench code path (scan-loop timing, cost_analysis MFU, all arms,
    # the train step) can be smoke-tested without the chip. The numbers
    # it prints are meaningless; only the real-TPU default run is a
    # benchmark.
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
    def make_model(box_bias: bool = False, flash: bool = False) -> DINO:
        return DINO(
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
            dense_box_bias=box_bias, flash_attn=flash,
        )

    rng = jax.random.PRNGKey(0)
    # IAM eval geometry: ~85x1333 lines -> bucket 128x1344
    B, H, W = (2, 64, 128) if tiny else (8, 128, 1344)
    images = jax.random.normal(rng, (B, H, W, 3), jnp.float32)
    valid_hw = jnp.tile(
        jnp.asarray([[48, 120] if tiny else [96, 1333]], jnp.int32), (B, 1))

    iters = 10

    def time_forward(model, params, imgs, vhw):
        """Device-side scan loop with per-iteration perturbed inputs:
        robust to host dispatch overhead and to runtimes that cache
        identical (executable, operands) executions."""

        @jax.jit
        def forward_loop(params, imgs, vhw):
            def body(carry, i):
                out = model.apply(
                    params, imgs + carry * 1e-6, vhw, None, train=False
                )
                s = (out["pred_logits"].astype(jnp.float32).sum()
                     + out["pred_boxes"].sum())
                return carry + s * 1e-20 + 1.0, s

            c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return c

        # two full warmups with a host transfer: on the tunneled backend
        # block_until_ready is unreliable and the first executions can
        # hit compile/cache effects
        float(forward_loop(params, imgs, vhw))
        float(forward_loop(params, imgs, vhw))
        t0 = time.perf_counter()
        float(forward_loop(params, imgs, vhw))
        dt = time.perf_counter() - t0
        return imgs.shape[0] * iters / dt, dt

    def cost_forward(model, params, imgs, vhw):
        """XLA's own FLOP + bytes-accessed count for one forward."""
        single = jax.jit(
            lambda p, im, vh: model.apply(p, im, vh, None, train=False)
        )
        cost = single.lower(params, imgs, vhw).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))

    # jit the init: unjitted flax init dispatches thousands of ops
    # individually (very slow over a remote-device tunnel)
    def init_params(model):
        init = jax.jit(lambda r, im, vh: model.init(
            {"params": r}, im, vh, None, train=False))
        return init(rng, images[:1], valid_hw[:1])

    # ---- forward arms -------------------------------------------------
    # base: the BENCH_r01-r04 series configuration (no box prior) —
    # kept so round-over-round throughput stays one comparable series.
    arms = {}
    base_model = make_model(box_bias=False, flash=False)
    base_params = init_params(base_model)
    arms["base"] = (base_model, base_params)
    # boxbias/flash: the committed flagship recipe (dense_box_bias=True,
    # the r4b headline checkpoint's config) materialized vs fused — the
    # pair that isolates the flash kernel's HBM effect.
    for name, flash in (("boxbias", False), ("flash", True)):
        try:
            m = make_model(box_bias=True, flash=flash)
            arms[name] = (m, init_params(m))
        except Exception:
            pass

    rec = {}
    results = {}
    PEAK_BF16 = 197e12
    PEAK_HBM = 819e9  # v5e HBM bandwidth (public spec)
    for name, (model, params) in arms.items():
        try:
            lps, dt = time_forward(model, params, images, valid_hw)
            entry = {"lps": lps, "dt": dt}
            try:
                flops_fwd, bytes_fwd = cost_forward(model, params, images, valid_hw)
                entry["flops"] = flops_fwd
                entry["bytes"] = bytes_fwd
            except Exception:
                pass
            results[name] = entry
        except Exception:
            continue

    if not results:
        raise SystemExit("bench: every forward arm failed")

    headline = max(results, key=lambda k: results[k]["lps"])
    hl = results[headline]
    lines_per_sec = hl["lps"]
    rec.update({
        "metric": "line_inference_throughput",
        "value": round(lines_per_sec, 2),
        "unit": f"lines/sec/chip (B={B}, {H}x{W}, bf16)",
        "vs_baseline": round(lines_per_sec / REFERENCE_FAITHFUL_LINES_PER_SEC, 2),
        "headline_arm": headline,
    })
    step_time = hl["dt"] / iters
    if hl.get("flops"):
        # MFU: XLA's flops for one forward / measured step time / peak.
        # v5e peak is 394 TFLOP/s int8, 197 TFLOP/s bf16 (public spec).
        rec["mfu"] = round(hl["flops"] / step_time / PEAK_BF16, 4)
        rec["fwd_tflops"] = round(hl["flops"] / 1e12, 3)
    if hl.get("bytes"):
        # roofline attribution: when this sits near 1.0 the forward is
        # HBM-bandwidth-bound and MFU is capped at flops/bytes *
        # (PEAK_HBM/PEAK_BF16) regardless of GEMM shaping (see
        # PERFORMANCE.md speed-of-light table)
        rec["hbm_bytes_gb"] = round(hl["bytes"] / 1e9, 3)
        rec["hbm_util"] = round(hl["bytes"] / step_time / PEAK_HBM, 4)
    for name, entry in results.items():
        rec[f"value_{name}"] = round(entry["lps"], 2)
        if entry.get("bytes"):
            rec[f"hbm_{name}_gb"] = round(entry["bytes"] / 1e9, 3)

    # batch-scaling point on the series (base) arm: B=32 on the same
    # geometry. MEASURED round 3: 214.97 lines/s < 223.21 at B=8
    # (BENCH_r03.json) — throughput is flat-to-down in batch, i.e. the
    # forward is NOT dispatch- or MXU-fill-limited at B=8; that is the
    # bandwidth-bound signature the hbm_util field quantifies. Kept as a
    # regression probe.
    base_entry = results.get("base")
    for B_big in (32, 16):
        try:
            images_big = jax.random.normal(rng, (B_big, H, W, 3), jnp.float32)
            valid_big = jnp.tile(valid_hw[:1], (B_big, 1))
            lps_big, dt_big = time_forward(base_model, base_params,
                                           images_big, valid_big)
            rec[f"value_b{B_big}"] = round(lps_big, 2)
            if base_entry and base_entry.get("flops"):
                # FLOPs scale linearly in batch for this model (no
                # cross-sample compute); reuse the B=8 cost analysis
                rec[f"mfu_b{B_big}"] = round(
                    (base_entry["flops"] * B_big / B) / (dt_big / iters)
                    / PEAK_BF16, 4)
            break
        except Exception:
            continue

    # ---- training throughput (VERDICT r4 weak #8) ---------------------
    # One jitted detection train step at flagship geometry on the
    # committed recipe (dense_box_bias=True, materialized scores — the
    # configuration every round-4/5 checkpoint actually trained with):
    # auction matcher + CDN + full backward + param-group AdamW + EMA,
    # scan-loop timed so train-side regressions show up in BENCH_r*.
    if not os.environ.get("BENCH_SKIP_TRAIN"):
        try:
            import numpy as np
            import optax  # noqa: F401  (train_step dependency)

            from dtlr_tpu.config import load_config
            from dtlr_tpu.losses.criterion import build_weight_dict
            from dtlr_tpu.ops.pixels import prep_images
            from dtlr_tpu.train.optim import build_optimizer
            from dtlr_tpu.train.train_step import (
                init_train_state, make_detection_train_step)

            tmodel = arms.get("boxbias", arms["base"])[0]
            T = 8 if tiny else 48  # targets per line (chars)
            np_rng = np.random.default_rng(0)
            cx = np.sort(np_rng.uniform(0.05, 0.95, (B, T)), axis=1)
            boxes = np.stack([
                cx, np.full((B, T), 0.5),
                np.full((B, T), 0.02), np.full((B, T), 0.6)], -1)
            batch = {
                "images": np.asarray(images, np.float32),
                "valid_hw": np.asarray(valid_hw, np.int32),
                "labels": np_rng.integers(0, 166, (B, T)).astype(np.int32),
                "boxes": boxes.astype(np.float32),
                "valid": np.ones((B, T), bool),
            }
            targets = {k: jnp.asarray(batch[k])
                       for k in ("labels", "boxes", "valid")}
            tinit = jax.jit(lambda r, im, vh, tg: tmodel.init(
                {"params": r, "dn": r}, prep_images(im, vh), vh, tg,
                train=True))
            tparams = tinit(rng, jnp.asarray(batch["images"]),
                            jnp.asarray(batch["valid_hw"]), targets)
            cfg = load_config(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "dtlr_tpu", "configs", "Latin_TPU.py"))
            tx = build_optimizer(cfg, tparams)
            weight_dict = build_weight_dict(cfg)
            step_fn = make_detection_train_step(
                tmodel.apply, tx, 166, weight_dict, ema_decay=0.9997)
            state = init_train_state(tparams, tx, use_ema=True)
            train_iters = 2 if tiny else 5
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

            @jax.jit
            def train_loop(state, batch, rng):
                def body(st, i):
                    b = dict(batch)
                    b["images"] = batch["images"] + i.astype(jnp.float32) * 1e-6
                    st, metrics = step_fn(st, b, jax.random.fold_in(rng, i))
                    return st, metrics["loss"]

                st, losses = jax.lax.scan(body, state,
                                          jnp.arange(train_iters))
                return st.step, losses[-1]

            _, loss0 = train_loop(state, jbatch, rng)
            float(loss0)
            _, loss1 = train_loop(state, jbatch, rng)
            float(loss1)
            t0 = time.perf_counter()
            _, loss2 = train_loop(state, jbatch, rng)
            float(loss2)
            dt_train = time.perf_counter() - t0
            rec["train_it_per_sec"] = round(train_iters / dt_train, 3)
            rec["train_loss_finite"] = bool(np.isfinite(float(loss2)))
        except Exception:
            pass

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
