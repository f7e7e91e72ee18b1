"""Golden tests of the CTC blank-synthesis math against a torch oracle
implementing the reference construction (reference dino.py:457-551)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dtlr_tpu.ops.ctc import blank_synthesis, ctc_loss, interleave_blanks

torch = pytest.importorskip("torch")


def torch_blank_synthesis(pred_logits, pred_boxes, eps):
    """Oracle reimplementation of reference dino.py:472-517."""
    __, idx = torch.sort(pred_boxes[:, :, 0])
    p = torch.gather(
        pred_logits, 1, idx.unsqueeze(-1).expand(-1, -1, pred_logits.shape[-1])
    ).sigmoid()
    new = torch.zeros((p.shape[0], p.shape[1], p.shape[2] + 1))
    new[:, :, 1:] = p
    mask = p.sum(-1) < 1 - eps
    new[:, :, 0][mask] = 1 - p[mask].sum(-1)
    mask = ~mask
    new[:, :, 0][mask] = eps
    new[:, :, 1:][mask] = (1 - eps) * p[mask] / p[mask].sum(-1).unsqueeze(-1)
    return new


def make_inputs(rng, B=2, nq=16, K=5):
    # mostly low probabilities (sum < 1 - eps branch), a few boosted rows
    # to hit the renormalization branch
    logits = rng.standard_normal((B, nq, K)).astype(np.float32) - 3.0
    logits[0, :4] += 6.0
    boxes = rng.uniform(0, 1, (B, nq, 4)).astype(np.float32)
    return logits, boxes


def test_blank_synthesis_matches_reference_math():
    rng = np.random.default_rng(0)
    logits, boxes = make_inputs(rng)
    got = np.asarray(blank_synthesis(jnp.asarray(logits), jnp.asarray(boxes), eps=0.003))
    want = torch_blank_synthesis(torch.from_numpy(logits), torch.from_numpy(boxes), 0.003).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # both branches exercised
    s = 1 / (1 + np.exp(-logits))
    assert (s.sum(-1) > 1 - 0.003).any() and (s.sum(-1) < 1 - 0.003).any()


def test_interleave_blanks_layout():
    rng = np.random.default_rng(1)
    logits, boxes = make_inputs(rng)
    probs = blank_synthesis(jnp.asarray(logits), jnp.asarray(boxes))
    frames = np.asarray(interleave_blanks(probs))
    assert frames.shape[1] == 2 * probs.shape[1]
    np.testing.assert_allclose(frames[:, 0::2], np.asarray(probs), atol=1e-7)
    np.testing.assert_allclose(frames[:, 1::2, 0], 1.0)
    np.testing.assert_allclose(frames[:, 1::2, 1:], 1e-5)


def test_ctc_loss_matches_torch():
    rng = np.random.default_rng(2)
    B, nq, K, N = 2, 16, 5, 6
    logits, boxes = make_inputs(rng, B, nq, K)
    labels = rng.integers(0, K, (B, N)).astype(np.int32)
    valid = np.ones((B, N), bool)
    valid[1, 4:] = False

    loss, _ = ctc_loss(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)
    )

    # torch oracle: reference dino.py:505-544
    new = torch_blank_synthesis(torch.from_numpy(logits), torch.from_numpy(boxes), 0.003)
    blank = torch.zeros_like(new) + 1e-5
    blank[:, :, 0] = 1
    padded = torch.zeros((B, nq * 2, K + 1))
    padded[:, ::2] = new
    padded[:, 1::2] = blank
    lengths_pred = torch.full((B,), nq * 2, dtype=torch.int64)
    lengths_in = torch.tensor(valid.sum(1), dtype=torch.int64)
    tt = torch.zeros(B, int(valid.sum(1).max()))
    for b in range(B):
        n = valid[b].sum()
        tt[b, :n] = torch.from_numpy(labels[b, :n] + 1).float()
    fn = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction="mean")
    want = fn(torch.log(padded.permute(1, 0, 2)), tt, lengths_pred, lengths_in)

    # optax applies an internal log-softmax; the interleaved blank frames
    # sum to 1 + K*1e-5 so a tiny normalization difference is expected
    np.testing.assert_allclose(float(loss), float(want), atol=2e-3, rtol=1e-3)


def test_ctc_loss_perfect_predictions_near_zero():
    # queries firing exactly on the labels in order -> tiny loss
    B, nq, K = 1, 8, 4
    labels = np.asarray([[0, 1, 2, 3]], np.int32)
    valid = np.ones((1, 4), bool)
    logits = np.full((B, nq, K), -12.0, np.float32)
    boxes = np.zeros((B, nq, 4), np.float32)
    boxes[0, :, 0] = np.linspace(0.1, 0.9, nq)
    for i, lab in enumerate([0, 1, 2, 3]):
        logits[0, i * 2, lab] = 12.0  # confident char detections
    loss, _ = ctc_loss(jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid))
    assert float(loss) < 0.05, float(loss)
