"""End-to-end evaluate CLI test: save a tiny checkpoint, then run
dtlr_tpu.eval.evaluate.main() on the synthetic dataset against it."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_evaluate_cli_synthetic(tmp_path):
    # tiny config file with the synthetic charset size (166)
    cfg_path = tmp_path / "tiny.py"
    cfg_path.write_text(
        "num_classes = 166\n"
        "num_queries = 24\nhidden_dim = 64\nnheads = 4\n"
        "enc_layers = 1\ndec_layers = 1\ndim_feedforward = 64\ndropout = 0.0\n"
        "num_feature_levels = 4\nenc_n_points = 2\ndec_n_points = 2\n"
        "backbone = 'resnet50'\nbatch_norm_type = 'group'\n"
        "use_dn = False\ndn_number = 0\ndn_labelbook_size = 167\n"
        "max_targets = 32\nlr = 1e-4\nlr_backbone = 1e-5\nweight_decay = 1e-4\n"
        "clip_max_norm = 0.1\nlr_drop = 10\nepochs = 1\nbatch_size = 2\n"
        "cls_loss_coef = 1.0\nbbox_loss_coef = 5.0\ngiou_loss_coef = 2.0\n"
        "set_cost_class = 2.0\nset_cost_bbox = 5.0\nset_cost_giou = 2.0\n"
        "focal_alpha = 0.25\naux_loss = True\ntwo_stage_type = 'standard'\n"
        "interm_loss_coef = 1.0\nno_interm_box_loss = False\n"
        "compute_dtype = 'float32'\nsteps_per_epoch = 1\n"
        "data_aug_scales = [128]\ndata_aug_max_size = 320\n"
    )

    ckpt_dir = tmp_path / "run"
    # build a trainer and save an untrained checkpoint
    from dtlr_tpu.config import load_config
    from dtlr_tpu.data.batching import Batch
    from dtlr_tpu.train.engine import Trainer, batch_to_arrays

    cfg = load_config(str(cfg_path))
    trainer = Trainer(cfg, mode="ctc", output_dir=str(ckpt_dir))
    rng = np.random.default_rng(0)
    batch = Batch(
        images=rng.standard_normal((2, 64, 320, 3)).astype(np.float32),
        valid_hw=np.tile(np.asarray([[64, 320]], np.int32), (2, 1)),
        labels=np.zeros((2, 32), np.int32),
        boxes=np.zeros((2, 32, 4), np.float32),
        valid=np.zeros((2, 32), bool),
        texts=["", ""],
    )
    params = trainer.init_params(batch_to_arrays(batch))
    trainer.build(params)
    trainer.save()

    from dtlr_tpu.eval import evaluate as E

    rec = None
    argv = [
        "--dataset", "synthetic", "--mode", "val",
        "--config", str(cfg_path), "--ckpt_dir", str(ckpt_dir),
        "--batch_size", "2", "--max_images", "4",
    ]
    E.main(argv)
    stats_path = ckpt_dir / "stats_dect" / "synthetic" / "stats.json"
    assert stats_path.exists()
    rec = json.loads(stats_path.read_text())
    # untrained model: CER should be ~1.0 (garbage), but finite + present
    assert "CER" in rec and np.isfinite(rec["CER"])
    assert (ckpt_dir / "stats_dect" / "synthetic" / "preds.txt").exists()
    assert (ckpt_dir / "stats_dect" / "synthetic" / "char_cer_impact.txt").exists()
