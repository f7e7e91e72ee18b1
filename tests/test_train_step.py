"""End-to-end mini training: tiny DINO + synthetic batch + detection and
CTC train steps on CPU. Exercises model/matcher/criterion integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dtlr_tpu.losses.criterion import detection_loss
from dtlr_tpu.models.dino import DINO
from dtlr_tpu.train.train_step import (
    TrainState,
    init_train_state,
    make_ctc_train_step,
    make_detection_train_step,
)


@pytest.fixture(scope="module")
def tiny_setup():
    model = DINO(
        num_classes=12, num_queries=40, hidden_dim=64, n_heads=4,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
        num_feature_levels=4, use_dn=True, dn_number=4,
        dn_labelbook_size=13, max_targets=6, norm_kind="group",
    )
    rng = jax.random.PRNGKey(0)
    B, H, W = 2, 64, 128
    batch = {
        "images": jnp.asarray(np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.float32),
        "valid_hw": jnp.asarray([[64, 128], [48, 96]], jnp.int32),
        "labels": jnp.asarray(np.random.default_rng(1).integers(0, 12, (B, 6)), jnp.int32),
        "boxes": jnp.asarray(np.random.default_rng(2).uniform(0.3, 0.6, (B, 6, 4)), jnp.float32),
        "valid": jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], bool),
    }
    targets = {"labels": batch["labels"], "boxes": batch["boxes"], "valid": batch["valid"]}
    params = model.init({"params": rng, "dn": rng}, batch["images"], batch["valid_hw"], targets, train=True)
    return model, params, batch


WEIGHTS = {
    "loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0,
    "loss_ce_dn": 1.0, "loss_bbox_dn": 5.0, "loss_giou_dn": 2.0,
    "loss_ce_0": 1.0, "loss_bbox_0": 5.0, "loss_giou_0": 2.0,
    "loss_ce_dn_0": 1.0, "loss_bbox_dn_0": 5.0, "loss_giou_dn_0": 2.0,
    "loss_ce_interm": 1.0, "loss_bbox_interm": 5.0, "loss_giou_interm": 2.0,
}


def test_detection_loss_finite(tiny_setup):
    model, params, batch = tiny_setup
    targets = {"labels": batch["labels"], "boxes": batch["boxes"], "valid": batch["valid"]}
    out = model.apply(params, batch["images"], batch["valid_hw"], targets,
                      train=True, rngs={"dn": jax.random.PRNGKey(3)})
    total, losses = detection_loss(out, targets, 12, WEIGHTS)
    assert np.isfinite(float(total))
    for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_ce_dn", "loss_ce_interm"):
        assert k in losses and np.isfinite(float(losses[k])), k


def test_detection_train_step_updates(tiny_setup):
    model, params, batch = tiny_setup
    tx = optax.adamw(1e-4)
    state = init_train_state(params, tx, use_ema=True)
    step = make_detection_train_step(model.apply, tx, 12, WEIGHTS, ema_decay=0.9)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped"]) == 0.0
    # params changed
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0
    # second step with same jit fn
    state3, m3 = step(state2, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m3["loss"]))


def test_ctc_train_step(tiny_setup):
    model, params, batch = tiny_setup
    tx = optax.adamw(1e-5)
    state = init_train_state(params, tx)
    step = make_ctc_train_step(model.apply, tx)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_CTC"]))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0
