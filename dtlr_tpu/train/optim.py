"""Optimizer construction with the reference's parameter-group policy.

reference util/get_param_dicts.py:15-84 ('default' type):
- backbone params at lr_backbone, everything else at lr
- (ddetr variant adds 0.1x for sampling_offsets/reference_points)
reference main_synthetic.py:194-198: AdamW + weight_decay, StepLR at
lr_drop epochs; engine.py:80-94: grad clip by global norm.

TPU adaptation: frozen-norm statistics (scope 'FrozenBatchNorm') are
excluded from the optimizer entirely (the reference keeps them as
buffers outside the optimizer)."""

from __future__ import annotations

from typing import Any

import jax
import optax


def label_params(params, lr_backbone_scale: float) -> Any:
    """Assign a group label per parameter path."""

    def walk(path, _):
        keys = [str(getattr(k, "key", k)) for k in path]
        joined = "/".join(keys)
        if "FrozenBatchNorm" in joined:
            return "frozen"
        if "backbone_net" in joined:
            return "backbone"
        return "main"

    return jax.tree_util.tree_map_with_path(walk, params)


def make_lr_schedule(base_lr: float, cfg) -> optax.Schedule:
    """StepLR: xgamma 0.1 at lr_drop epochs (reference
    main_synthetic.py:199-202); onecycle/multistep variants honored.
    ``warmup_steps`` (TPU addition, default 0) prepends linear warmup."""
    steps_per_epoch = int(cfg.get_default("steps_per_epoch", 1250))
    warmup = int(cfg.get_default("warmup_steps", 0))
    if cfg.get_default("onecyclelr", False):
        total = cfg.epochs * steps_per_epoch
        return optax.cosine_onecycle_schedule(total, base_lr)
    if cfg.get_default("multi_step_lr", False):
        bounds = {
            int(e * steps_per_epoch): 0.1 for e in cfg.get_default("lr_drop_list", [33, 45])
        }
        main = optax.piecewise_constant_schedule(base_lr, bounds)
    else:
        drop = int(cfg.lr_drop * steps_per_epoch)
        main = optax.piecewise_constant_schedule(base_lr, {drop: 0.1})
    if warmup > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup), main], [warmup]
        )
    return main


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    wd = cfg.get_default("weight_decay", 1e-4)
    clip = cfg.get_default("clip_max_norm", 0.1)

    def adamw(lr_value):
        return optax.adamw(make_lr_schedule(lr_value, cfg), weight_decay=wd,
                           b1=0.9, b2=0.999, eps=1e-8)

    labels = label_params(params, cfg.lr_backbone / max(cfg.lr, 1e-30))
    # clip over the SINGLE global gradient norm before splitting into
    # per-group transforms (reference engine.py:80-94 clip_grad_norm over
    # all parameters; per-group clipping would trigger differently)
    return optax.chain(
        optax.clip_by_global_norm(clip) if clip > 0 else optax.identity(),
        optax.multi_transform(
            {
                "main": adamw(cfg.lr),
                "backbone": adamw(cfg.lr_backbone),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    )


def build_head_only_optimizer(cfg, params, head_scopes=("class_embed", "enc_out_class_embed", "label_enc")) -> optax.GradientTransformation:
    """Stage-1 CTC finetuning trains only the (new) class heads
    (reference finetuning.py:537-539)."""

    def walk(path, _):
        joined = "/".join(str(getattr(k, "key", k)) for k in path)
        return "head" if any(s in joined for s in head_scopes) else "rest"

    labels = jax.tree_util.tree_map_with_path(walk, params)
    clip = cfg.get_default("clip_max_norm", 0.01)
    head_tx = optax.adamw(
        make_lr_schedule(cfg.lr, cfg),
        weight_decay=cfg.get_default("weight_decay", 1e-4),
    )
    # global-norm clip over the full gradient pytree (reference
    # engine.py clips model.parameters() even when the optimizer only
    # holds the class heads, finetuning.py:537-539)
    return optax.chain(
        optax.clip_by_global_norm(clip) if clip > 0 else optax.identity(),
        optax.multi_transform({"head": head_tx, "rest": optax.set_to_zero()}, labels),
    )
