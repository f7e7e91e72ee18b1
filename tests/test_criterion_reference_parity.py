"""Detection-loss parity against the reference SetCriterion itself
(not a hand-rewritten torch oracle): identical random outputs/targets
through reference forward_standard (dino.py:780-964, scipy Hungarian)
and our detection_loss (auction matcher) must produce the same
loss_ce / loss_bbox / loss_giou for the main, every aux, and the
interm output."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dtlr_tpu.losses.criterion import detection_loss

from torch_ref import load_reference

B, NQ, K, NMAX = 2, 24, 17, 7
N_AUX = 2


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(5)

    def head():
        return (
            (rng.randn(B, NQ, K) * 1.5).astype(np.float32),
            _rand_boxes(rng, (B, NQ)),
        )

    outs = {"pred_logits": None, "pred_boxes": None}
    outs["pred_logits"], outs["pred_boxes"] = head()
    aux = [dict(zip(("pred_logits", "pred_boxes"), head())) for _ in range(N_AUX)]
    interm = dict(zip(("pred_logits", "pred_boxes"), head()))

    n_valid = [5, 3]
    labels = rng.randint(0, K, size=(B, NMAX)).astype(np.int32)
    boxes = _rand_boxes(rng, (B, NMAX))
    valid = np.zeros((B, NMAX), bool)
    for b, n in enumerate(n_valid):
        valid[b, :n] = True
    return outs, aux, interm, labels, boxes, valid, n_valid


def _rand_boxes(rng, shape):
    cx = rng.uniform(0.2, 0.8, shape)
    cy = rng.uniform(0.2, 0.8, shape)
    w = rng.uniform(0.05, 0.3, shape)
    h = rng.uniform(0.05, 0.3, shape)
    return np.stack([cx, cy, w, h], -1).astype(np.float32)


def test_detection_loss_matches_reference_criterion(data):
    ns = load_reference()
    from models.dino.dino import SetCriterion
    from models.dino.matcher import build_matcher

    outs, aux, interm, labels, boxes, valid, n_valid = data

    class _Args:
        set_cost_class, set_cost_bbox, set_cost_giou = 2.0, 5.0, 2.0
        matcher_type = "HungarianMatcher"
        focal_alpha = 0.25

    tcrit = SetCriterion(
        K, matcher=build_matcher(_Args()), weight_dict={},
        focal_alpha=0.25, losses=["labels", "boxes", "cardinality"],
    )
    touts = {
        "pred_logits": torch.from_numpy(outs["pred_logits"]),
        "pred_boxes": torch.from_numpy(outs["pred_boxes"]),
        "aux_outputs": [
            {k: torch.from_numpy(v) for k, v in a.items()} for a in aux
        ],
        "interm_outputs": {k: torch.from_numpy(v) for k, v in interm.items()},
        "dn_meta": None,  # forward_standard reads the key unconditionally
    }
    ttargets = [
        {
            "labels": torch.from_numpy(labels[b, : n_valid[b]]).long(),
            "boxes": torch.from_numpy(boxes[b, : n_valid[b]]),
        }
        for b in range(B)
    ]
    # reference hardcodes .to("cuda") for its zero DN placeholders
    # (dino.py:857-862); keep those on CPU
    orig_to = torch.Tensor.to

    def _cpu_to(self, *a, **k):
        if a and isinstance(a[0], str) and a[0].startswith("cuda"):
            return self
        return orig_to(self, *a, **k)

    torch.Tensor.to = _cpu_to
    try:
        with torch.no_grad():
            tlosses = tcrit(touts, ttargets)
    finally:
        torch.Tensor.to = orig_to

    jouts = {
        "pred_logits": jnp.asarray(outs["pred_logits"]),
        "pred_boxes": jnp.asarray(outs["pred_boxes"]),
        "aux_outputs": [
            {k: jnp.asarray(v) for k, v in a.items()} for a in aux
        ],
        "interm_outputs": {k: jnp.asarray(v) for k, v in interm.items()},
    }
    jtargets = {
        "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(valid),
    }
    _, jlosses = detection_loss(
        jouts, jtargets, K, weight_dict={"loss_ce": 1.0},
        focal_alpha=0.25, matcher_impl="jax",
    )

    keys = ["loss_ce", "loss_bbox", "loss_giou"]
    keys += [f"{k}_{i}" for i in range(N_AUX) for k in keys[:3]]
    keys += [f"{k}_interm" for k in ("loss_ce", "loss_bbox", "loss_giou")]
    for k in keys:
        assert k in tlosses, f"reference lost key {k}"
        assert k in jlosses, f"our loss dict lost key {k}"
        np.testing.assert_allclose(
            float(jlosses[k]), float(tlosses[k]), rtol=2e-4, atol=2e-5,
            err_msg=k,
        )
