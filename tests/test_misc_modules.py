import numpy as np
import jax
import jax.numpy as jnp


def test_lm_rescorer_shapes():
    from dtlr_tpu.models.lm_rescorer import SelfAttentionRescorer

    model = SelfAttentionRescorer(num_classes=20, d_model=32, n_heads=4,
                                  n_layers=2, d_ffn=64)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 10, 32))
    xc = jax.random.uniform(rng, (2, 10))
    params = model.init(rng, feats, xc)
    out = model.apply(params, feats, xc)
    assert out.shape == (2, 10, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_visualizer_snapshot(tmp_path):
    from dtlr_tpu.utils.visualizer import draw_boxes, save_snapshot

    rng = np.random.default_rng(0)
    img = rng.random((64, 128, 3)).astype(np.float32)
    boxes = np.asarray([[0.3, 0.5, 0.1, 0.4], [0.7, 0.5, 0.2, 0.6]], np.float32)
    pil = draw_boxes(img, boxes, labels=[0, 1], charset=["a", "b"],
                     valid_hw=(64, 128))
    assert pil.size == (128, 64)
    path = save_snapshot(str(tmp_path), 3, img, boxes, [0, 1], ["a", "b"],
                         valid_hw=(64, 128))
    import os

    assert os.path.exists(path) and path.endswith("snapshot_epoch0003.png")


def test_logging_utils(tmp_path):
    import json

    from dtlr_tpu.utils.logging_utils import MetricLogger, append_log_line, setup_logger

    logger = setup_logger(str(tmp_path), name="t1")
    logger.info("hello")
    m = MetricLogger()
    m.update(loss=1.0)
    m.update(loss=3.0)
    assert abs(m.meters["loss"].avg - 2.0) < 1e-9
    append_log_line(str(tmp_path), {"epoch": 0, "loss": 2.0})
    rec = json.loads(open(tmp_path / "log.txt").readline())
    assert rec["epoch"] == 0
