"""Trainer wiring test: 2 detection steps + eval + checkpoint
save/resume on the virtual CPU mesh with a tiny model."""

import numpy as np
import pytest

from dtlr_tpu.config import Config
from dtlr_tpu.data.batching import Batch
from dtlr_tpu.train.engine import Trainer, batch_to_arrays


def tiny_cfg(tmp_path):
    return Config(dict(
        num_classes=12, num_queries=24, hidden_dim=64, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
        num_feature_levels=4, enc_n_points=2, dec_n_points=2,
        backbone="resnet50", batch_norm_type="group",
        use_dn=True, dn_number=4, dn_box_noise_scale=0.4,
        dn_label_noise_ratio=0.5, dn_labelbook_size=13,
        max_targets=6, lr=1e-4, lr_backbone=1e-5, weight_decay=1e-4,
        clip_max_norm=0.1, lr_drop=10, epochs=1, batch_size=2,
        cls_loss_coef=1.0, bbox_loss_coef=5.0, giou_loss_coef=2.0,
        set_cost_class=2.0, set_cost_bbox=5.0, set_cost_giou=2.0,
        focal_alpha=0.25, aux_loss=True, two_stage_type="standard",
        interm_loss_coef=1.0, no_interm_box_loss=False,
        compute_dtype="float32", steps_per_epoch=2,
    ))


def make_batch(rng, B=2, H=64, W=128, N=6):
    return Batch(
        images=rng.standard_normal((B, H, W, 3)).astype(np.float32),
        valid_hw=np.tile(np.asarray([[H, W]], np.int32), (B, 1)),
        labels=rng.integers(0, 12, (B, N)).astype(np.int32),
        boxes=rng.uniform(0.3, 0.6, (B, N, 4)).astype(np.float32),
        valid=np.ones((B, N), bool),
        texts=["ab"] * B,
    )


@pytest.mark.slow
def test_trainer_two_steps_and_resume(tmp_path):
    rng = np.random.default_rng(0)
    cfg = tiny_cfg(tmp_path)
    trainer = Trainer(cfg, mode="detection", output_dir=str(tmp_path / "run"),
                      charset=list("abcdefghijkl"), seed=0)
    batch = make_batch(rng)
    params = trainer.init_params(batch_to_arrays(batch))
    trainer.build(params)

    stats = trainer.train_epoch([batch, make_batch(rng)], max_iterations=2,
                                print_freq=1)
    assert stats["iterations"] == 2
    assert np.isfinite(stats["loss"])
    trainer.save()

    # fresh trainer resumes
    t2 = Trainer(cfg, mode="detection", output_dir=str(tmp_path / "run"),
                 charset=list("abcdefghijkl"), seed=1)
    p2 = t2.init_params(batch_to_arrays(batch))
    t2.build(p2)
    assert t2.try_resume()
    assert int(t2.state.step) == 2
    # params equal after resume
    import jax

    for x, y in zip(jax.tree.leaves(trainer.state.params), jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
