"""Parity tests for multi-scale deformable attention, mirroring the
reference's op test strategy (reference models/dino/ops/test.py:31-86):
forward parity against a torch grid_sample implementation and gradient
checks, across channel sizes."""

import numpy as np
import pytest

from dtlr_tpu.ops.deform_attn import deform_attn_xla

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_core(value, spatial_shapes, sampling_locations, attention_weights):
    """Pure-torch reference (same math as reference
    ops/functions/ms_deform_attn_func.py:41-61), reimplemented here as the
    parity oracle."""
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out = torch.zeros(N, Lq, M, D, dtype=value.dtype)
    offset = 0
    grids = 2 * sampling_locations - 1
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, offset : offset + H * W]  # N, HW, M, D
        v = v.permute(0, 2, 3, 1).reshape(N * M, D, H, W)
        g = grids[:, :, :, lid].permute(0, 2, 1, 3, 4).reshape(N * M, Lq, P, 2)
        samp = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        # N*M, D, Lq, P
        w = attention_weights[:, :, :, lid].permute(0, 2, 1, 3).reshape(N * M, 1, Lq, P)
        out += (samp * w).sum(-1).reshape(N, M, D, Lq).permute(0, 3, 1, 2)
        offset += H * W
    return out.reshape(N, Lq, M * D)


def make_inputs(rng, B=2, M=4, D=16, Lq=24, P=3, shapes=((6, 10), (3, 5))):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    # locations mostly inside, some outside [0,1] to test zero padding
    loc = rng.uniform(-0.2, 1.2, (B, Lq, M, L, P, 2)).astype(np.float32)
    attn = rng.random((B, Lq, M, L, P)).astype(np.float32) + 1e-3
    attn = attn / attn.sum(axis=(-2, -1), keepdims=True)
    return value, loc, attn, shapes


def test_forward_parity_with_torch():
    rng = np.random.default_rng(0)
    value, loc, attn, shapes = make_inputs(rng)
    got = np.asarray(deform_attn_xla(value, shapes, loc, attn))
    want = torch_core(
        torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(attn)
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("D", [16, 32, 71])
def test_forward_parity_channels(D):
    rng = np.random.default_rng(D)
    value, loc, attn, shapes = make_inputs(rng, D=D)
    got = np.asarray(deform_attn_xla(value, shapes, loc, attn))
    want = torch_core(
        torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(attn)
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_gradients_match_torch():
    import jax

    rng = np.random.default_rng(7)
    value, loc, attn, shapes = make_inputs(rng, B=1, M=2, D=8, Lq=6, P=2)

    def loss_jax(v, l, a):
        return (deform_attn_xla(v, shapes, l, a) ** 2).sum()

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(value, loc, attn)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    (torch_core(tv, shapes, tl, ta) ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), atol=1e-4, rtol=1e-4)
    # location grads touch floor() boundaries; compare only where both agree
    # that the sample is strictly interior (away from integer grid lines)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3, rtol=1e-3)
