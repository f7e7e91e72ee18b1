"""Real-TPU validation probe for ops/flash_attn.py (round 5).

Answers, on the actual chip (Mosaic, not interpret mode):
  1. does Mosaic accept the kernel at flagship decoder-CA shapes
     (B8 M8 Q900 S3570 D32, box prior) — parity vs dense_reference;
  2. does it fit VMEM at the phase-E' big geometry (S~14280), where the
     materialized dense path OOMs HBM in training;
  3. does the custom-VJP backward (dense recompute) compile and match
     grads of the pure dense formulation;
  4. scan-loop timing flash vs dense at flagship shapes (the roofline
     attack's microbenchmark).

Run: python scripts/flash_probe.py   (claims the TPU; keep it alone)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/outputs/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from dtlr_tpu.ops.flash_attn import (BoxPrior, dense_reference, flash_mha,
                                     make_box_prior)


def rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def case(name, B, M, Q, S_shapes, D, block_q=None, iters=20, time_it=True):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    qh = rand(ks[0], (B, M, Q, D))
    S = sum(h * w for h, w in S_shapes)
    if block_q is None:
        # match the model wiring (models/layers.py): adaptive block size
        # keeps the kernel's scoped VMEM under the 16 MB limit at big S
        from dtlr_tpu.ops.flash_attn import pick_block_q

        block_q = pick_block_q(S)
    kh = rand(ks[1], (B, M, S, D))
    vh = rand(ks[2], (B, M, S, D))
    key_bias = jnp.where(
        jax.random.uniform(ks[3], (B, S)) < 0.1, -1e9, 0.0).astype(jnp.float32)
    ref_pts = jax.random.uniform(
        ks[4], (B, Q, len(S_shapes), 4), minval=0.05, maxval=0.9)
    gamma = jnp.exp(jax.random.normal(ks[5], (M,)) * 0.1)
    prior = make_box_prior(ref_pts, S_shapes, gamma)

    out = {"name": name, "B": B, "Q": Q, "S": S, "block_q": block_q}
    f_flash = jax.jit(lambda *a: flash_mha(*a, block_q, False))
    f_dense = jax.jit(dense_reference)
    try:
        t0 = time.time()
        y_flash = jax.block_until_ready(f_flash(qh, kh, vh, key_bias, prior))
        out["flash_compile_s"] = round(time.time() - t0, 1)
    except Exception as exc:
        out["flash_error"] = f"{type(exc).__name__}: {exc}"[:300]
        print(json.dumps(out))
        return out
    y_dense = jax.block_until_ready(f_dense(qh, kh, vh, key_bias, prior))
    err = float(jnp.max(jnp.abs(y_flash - y_dense)))
    rel = err / max(1e-9, float(jnp.max(jnp.abs(y_dense))))
    out["max_abs_err"] = round(err, 6)
    out["max_rel_err"] = round(rel, 6)

    # gradient: flash custom-vjp vs pure dense, same loss
    def loss_flash(q, k, v):
        return flash_mha(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16), key_bias, prior,
                         block_q, False).sum()

    def loss_dense(q, k, v):
        return dense_reference(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                               v.astype(jnp.bfloat16), key_bias, prior).sum()

    try:
        qf = qh.astype(jnp.float32)
        kf = kh.astype(jnp.float32)
        vf = vh.astype(jnp.float32)
        g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(qf, kf, vf)
        g2 = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(qf, kf, vf)
        gerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g1, g2))
        out["grad_max_abs_err"] = round(gerr, 6)
    except Exception as exc:
        out["grad_error"] = f"{type(exc).__name__}: {exc}"[:300]

    if time_it:
        def mk_loop(fn):
            @jax.jit
            def loop(qh, kh, vh, key_bias):
                def body(c, i):
                    y = fn(qh + c * 1e-6, kh, vh, key_bias, prior)
                    s = y.astype(jnp.float32).sum()
                    return c + s * 1e-20 + 1.0, s
                c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
                return c

            return loop

        for tag, fn in (("flash", lambda *a: flash_mha(*a, block_q, False)),
                        ("dense", dense_reference)):
            loop = mk_loop(fn)
            float(loop(qh, kh, vh, key_bias))
            float(loop(qh, kh, vh, key_bias))
            t0 = time.perf_counter()
            float(loop(qh, kh, vh, key_bias))
            out[f"{tag}_ms_per_call"] = round(
                (time.perf_counter() - t0) / iters * 1e3, 3)
    print(json.dumps(out))
    return out


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": str(jax.devices())}))
    which = set(sys.argv[1:]) or {"flagship", "big"}
    # flagship decoder-CA geometry: 128x1344 image -> S=3570
    if "flagship" in which:
        flag_shapes = ((16, 168), (8, 84), (4, 42), (2, 21))
        case("flagship", B=8, M=8, Q=900, S_shapes=flag_shapes, D=32)
    # phase-E' big geometry: 512x1344 -> S=14280 (block_q adapts to 40
    # via pick_block_q — the same size the model wiring uses)
    if "big" in which:
        big_shapes = ((64, 168), (32, 84), (16, 42), (8, 21))
        case("big_b2", B=2, M=8, Q=900, S_shapes=big_shapes, D=32,
             iters=8)


if __name__ == "__main__":
    main()
