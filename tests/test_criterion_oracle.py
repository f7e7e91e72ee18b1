"""Golden tests of the detection loss pieces against a torch oracle
implementing the reference math (reference dino.py:553-650)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dtlr_tpu.losses.criterion import box_losses, focal_label_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_loss_labels(logits, indices, labels_list, num_boxes, K, alpha=0.25, gamma=2.0):
    """reference dino.py:553-594 (sigmoid focal, mean(1).sum()/nb * nq)."""
    B, nq, _ = logits.shape
    target_classes = torch.full((B, nq), K, dtype=torch.int64)
    for b, (src, tgt) in enumerate(indices):
        target_classes[b, src] = torch.as_tensor(
            [labels_list[b][j] for j in tgt], dtype=torch.int64
        )
    onehot = torch.zeros(B, nq, K + 1)
    onehot.scatter_(2, target_classes.unsqueeze(-1), 1)
    onehot = onehot[:, :, :-1]
    prob = logits.sigmoid()
    ce = F.binary_cross_entropy_with_logits(logits, onehot, reduction="none")
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * ((1 - p_t) ** gamma)
    loss = (alpha * onehot + (1 - alpha) * (1 - onehot)) * loss
    return loss.mean(1).sum() / num_boxes * nq


def test_focal_label_loss_matches_reference():
    rng = np.random.default_rng(0)
    B, nq, K, N = 2, 12, 7, 4
    logits = rng.standard_normal((B, nq, K)).astype(np.float32)
    labels = rng.integers(0, K, (B, N)).astype(np.int32)
    valid = np.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool)
    assign = np.asarray([[3, 7, 1, -1], [0, 5, -1, -1]], np.int32)
    num_boxes = float(valid.sum())

    got = float(
        focal_label_loss(
            jnp.asarray(logits), jnp.asarray(assign), jnp.asarray(labels),
            jnp.asarray(valid), jnp.asarray(num_boxes),
        )
    )
    indices = [
        (torch.tensor([3, 7, 1]), torch.tensor([0, 1, 2])),
        (torch.tensor([0, 5]), torch.tensor([0, 1])),
    ]
    labels_list = [labels[0].tolist(), labels[1].tolist()]
    want = float(
        torch_loss_labels(torch.from_numpy(logits), indices, labels_list, num_boxes, K)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_box_losses_match_reference():
    from dtlr_tpu.utils.boxes import box_cxcywh_to_xyxy

    rng = np.random.default_rng(1)
    B, nq, N = 2, 10, 3
    pred = rng.uniform(0.3, 0.7, (B, nq, 4)).astype(np.float32)
    tgt = rng.uniform(0.3, 0.7, (B, N, 4)).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[1, 2] = False
    assign = np.asarray([[2, 5, 8], [1, 4, -1]], np.int32)
    num_boxes = float(valid.sum())

    out = box_losses(
        jnp.asarray(pred), jnp.asarray(assign), jnp.asarray(tgt),
        jnp.asarray(valid), jnp.asarray(num_boxes),
    )

    # torch oracle
    tp = torch.from_numpy(pred)
    tt = torch.from_numpy(tgt)
    src, dst = [], []
    for b in range(B):
        for j in range(N):
            if valid[b, j]:
                src.append(tp[b, assign[b, j]])
                dst.append(tt[b, j])
    src = torch.stack(src)
    dst = torch.stack(dst)
    l1 = F.l1_loss(src, dst, reduction="none")
    want_bbox = float(l1.sum() / num_boxes)

    def to_xyxy(b):
        cx, cy, w, h = b.unbind(-1)
        return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    def giou(a, c):
        # elementwise giou
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_c = (c[:, 2] - c[:, 0]) * (c[:, 3] - c[:, 1])
        lt = torch.max(a[:, :2], c[:, :2])
        rb = torch.min(a[:, 2:], c[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        union = area_a + area_c - inter
        iou = inter / union
        lt2 = torch.min(a[:, :2], c[:, :2])
        rb2 = torch.max(a[:, 2:], c[:, 2:])
        wh2 = (rb2 - lt2).clamp(min=0)
        area = wh2[:, 0] * wh2[:, 1]
        return iou - (area - union) / area

    want_giou = float((1 - giou(to_xyxy(src), to_xyxy(dst))).sum() / num_boxes)
    np.testing.assert_allclose(float(out["loss_bbox"]), want_bbox, rtol=1e-5)
    np.testing.assert_allclose(float(out["loss_giou"]), want_giou, rtol=1e-5)
