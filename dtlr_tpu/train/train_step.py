"""Jitted train/eval steps.

One XLA program per (bucket, mode): forward + loss + grad + metric
reduction + optimizer update, replacing the reference's per-batch python
orchestration (reference engine.py:22-132 train_one_epoch, 172-274
train_one_epoch_CTC). AMP/GradScaler are unnecessary on TPU (bf16 has
fp32 range); the NaN/Inf guard is kept as a skip-update mask rather
than sys.exit (reference engine.py:74-77)."""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses.criterion import detection_loss
from ..ops.ctc import ctc_loss as ctc_loss_fn
from ..ops.pixels import prep_images


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Optional[Any] = None


def init_train_state(params, tx, use_ema: bool = False) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
    )


def _warmed_decay(ema_decay: float, step) -> jnp.ndarray:
    """EMA decay with warmup: min(decay, (1+t)/(10+t)).

    A fixed 0.9997 decay averages over a ~3.3k-step horizon, so for the
    first several thousand steps the EMA is dominated by init-time
    weights and EMA evals trail raw badly (round-2 bigrun: EMA CER worse
    than raw for 14/16 epochs). The ramp makes the EMA unbiased at every
    horizon (timm ModelEmaV3-style warmup; reference
    util/utils.py:373-396 uses the fixed-decay form)."""
    t = step.astype(jnp.float32)
    return jnp.minimum(jnp.float32(ema_decay), (1.0 + t) / (10.0 + t))


def make_detection_train_step(
    model_apply: Callable,
    tx: optax.GradientTransformation,
    num_classes: int,
    weight_dict: Dict[str, float],
    focal_alpha: float = 0.25,
    matcher_impl: str = "jax",
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    ema_decay: float = 0.0,
):
    """Returns step(state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, batch, rng):
        targets = {
            "labels": batch["labels"],
            "boxes": batch["boxes"],
            "valid": batch["valid"],
        }
        images = prep_images(batch["images"], batch["valid_hw"])
        outputs = model_apply(
            params, images, batch["valid_hw"], targets,
            train=True, rngs={"dn": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        total, losses = detection_loss(
            outputs, targets, num_classes, weight_dict,
            focal_alpha=focal_alpha, matcher_impl=matcher_impl,
            cost_class=cost_class, cost_bbox=cost_bbox, cost_giou=cost_giou,
        )
        return total, losses

    @jax.jit
    def step(state: TrainState, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        # skip update on non-finite loss (reference exits; we skip+count)
        finite = jnp.isfinite(total)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: jnp.where(finite, u, 0.0), updates)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = _warmed_decay(ema_decay, state.step)
            ema = jax.tree.map(lambda e, p: e * d + (1 - d) * p, ema, params)
        metrics = {"loss": total, "skipped": (~finite).astype(jnp.float32)}
        metrics.update({k: v for k, v in losses.items()})
        return (
            TrainState(params, opt_state, state.step + 1, ema),
            metrics,
        )

    return step


def make_ctc_train_step(
    model_apply: Callable,
    tx: optax.GradientTransformation,
    ctc_eps: float = 0.003,
    ctc_coef: float = 1.0,
    ema_decay: float = 0.0,
):
    """CTC finetuning step (reference engine.py:172-274): model forward
    without DN, loss_CTC only."""

    def loss_fn(params, batch, rng):
        images = prep_images(batch["images"], batch["valid_hw"])
        outputs = model_apply(
            params, images, batch["valid_hw"], None,
            train=True, rngs={"dropout": rng},
        )
        loss, probs = ctc_loss_fn(
            outputs["pred_logits"], outputs["pred_boxes"],
            batch["labels"], batch["valid"], eps=ctc_eps,
        )
        return ctc_coef * loss, (loss, probs)

    @jax.jit
    def step(state: TrainState, batch, rng):
        (total, (raw, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        finite = jnp.isfinite(total)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: jnp.where(finite, u, 0.0), updates)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = _warmed_decay(ema_decay, state.step)
            ema = jax.tree.map(lambda e, p: e * d + (1 - d) * p, ema, params)
        metrics = {"loss": total, "loss_CTC": raw,
                   "skipped": (~finite).astype(jnp.float32)}
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    return step


def make_eval_step(model_apply: Callable, ctc_eps: float = 0.003):
    """Eval forward returning CTC-decode probabilities and boxes."""

    @jax.jit
    def step(params, batch):
        images = prep_images(batch["images"], batch["valid_hw"])
        outputs = model_apply(params, images, batch["valid_hw"], None, train=False)
        loss, probs = ctc_loss_fn(
            outputs["pred_logits"], outputs["pred_boxes"],
            batch["labels"], batch["valid"], eps=ctc_eps,
        )
        return {
            "probs": probs,
            "pred_logits": outputs["pred_logits"],
            "pred_boxes": outputs["pred_boxes"],
            "loss_CTC": loss,
        }

    return step
