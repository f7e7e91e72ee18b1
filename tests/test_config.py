import os

import pytest

from dtlr_tpu.config import load_config, parse_options
from dtlr_tpu.config.loader import apply_options, dump_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "dtlr_tpu", "configs")


def test_latin_config_loads_base():
    cfg = load_config(os.path.join(CFG_DIR, "Latin.py"))
    # keys inherited from transformer_base.py
    assert cfg.data_aug_max_size == 1333
    assert cfg.data_aug_scales[0] == 480
    # own keys (values pinned by reference config/Latin.py)
    assert cfg.num_queries == 900
    assert cfg.hidden_dim == 256
    assert cfg.num_classes == 166
    assert cfg.two_stage_type == "standard"
    assert cfg.use_dn is True


def test_ctc_config_overrides():
    cfg = load_config(os.path.join(CFG_DIR, "Latin_CTC.py"))
    assert cfg.lr == 1e-5
    assert cfg.lr_backbone == 1e-10
    assert cfg.use_dn is False
    assert cfg.max_iterations == 2500
    assert cfg.mode_chr is True
    # still inherits model geometry
    assert cfg.num_queries == 900


def test_chinese_configs():
    cfg = load_config(os.path.join(CFG_DIR, "Chinese.py"))
    assert cfg.num_classes == 7356
    cfg2 = load_config(os.path.join(CFG_DIR, "Chinese_w_masking.py"))
    assert cfg2.num_classes == 28672
    assert cfg2.batch_size == 1
    assert cfg2.use_dn is True


def test_options_override():
    cfg = load_config(os.path.join(CFG_DIR, "Latin.py"))
    opts = parse_options(["lr=0.5", "backbone=resnet101", "use_dn=False"])
    cfg = apply_options(cfg, opts)
    assert cfg.lr == 0.5
    assert cfg.backbone == "resnet101"
    assert cfg.use_dn is False


def test_dump_roundtrip(tmp_path):
    cfg = load_config(os.path.join(CFG_DIR, "Latin.py"))
    out = tmp_path / "config_cfg.py"
    dump_config(cfg, str(out))
    cfg2 = load_config(str(out))
    assert dict(cfg) == dict(cfg2)


def test_options_bad_pair():
    with pytest.raises(ValueError):
        parse_options(["novalue"])
