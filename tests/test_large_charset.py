"""Large-charset (Chinese) smoke: 7356-class heads through model + loss
+ CTC, plus remat (use_checkpoint) wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtlr_tpu.losses.criterion import detection_loss
from dtlr_tpu.models.dino import DINO
from dtlr_tpu.ops.ctc import ctc_loss


@pytest.mark.slow
def test_chinese_head_forward_and_losses():
    K = 7356
    model = DINO(
        num_classes=K, num_queries=24, hidden_dim=64, n_heads=4,
        num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
        num_feature_levels=4, use_dn=True, dn_number=4,
        dn_labelbook_size=K, max_targets=4, norm_kind="group",
        use_checkpoint=True,
    )
    rng = jax.random.PRNGKey(0)
    B, H, W = 1, 64, 96
    imgs = jnp.zeros((B, H, W, 3))
    vhw = jnp.asarray([[64, 96]], jnp.int32)
    targets = {
        "labels": jnp.asarray([[5, 4000, 7355, 0]], jnp.int32),
        "boxes": jnp.full((B, 4, 4), 0.5, jnp.float32),
        "valid": jnp.asarray([[1, 1, 1, 0]], bool),
    }
    init = jax.jit(lambda r: model.init(
        {"params": r, "dn": r}, imgs, vhw, targets, train=True))
    params = init(rng)
    out = model.apply(params, imgs, vhw, targets, train=True, rngs={"dn": rng})
    assert out["pred_logits"].shape == (B, 24, K)

    weights = {"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0,
               "loss_ce_dn": 1.0, "loss_bbox_dn": 5.0, "loss_giou_dn": 2.0}
    total, losses = detection_loss(out, targets, K, weights)
    assert np.isfinite(float(total))

    loss, _ = ctc_loss(out["pred_logits"], out["pred_boxes"],
                       targets["labels"], targets["valid"])
    assert np.isfinite(float(loss))
