"""Golden tests for CDN query preparation (reference dn_components.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dtlr_tpu.models.cdn import cdn_attn_mask, cdn_num_groups, CdnMeta, prepare_cdn


def test_attn_mask_semantics():
    """reference dn_components.py:117-129: matching queries cannot see DN
    queries; DN groups cannot see each other; DN can see matching."""
    meta = CdnMeta(pad_size=12, num_groups=3, n_max=2)  # group width 4
    nq = 5
    m = np.asarray(cdn_attn_mask(nq, meta))
    assert m.shape == (17, 17)
    pad = 12
    # matching rows: blocked from all DN columns, open to matching
    assert m[pad:, :pad].all()
    assert not m[pad:, pad:].any()
    # DN group 0 rows (0..3): see own group, blocked from groups 1,2,
    # open to matching columns
    assert not m[0:4, 0:4].any()
    assert m[0:4, 4:12].all()
    assert not m[0:4, pad:].any()
    # DN group 1 rows: blocked from groups 0 and 2
    assert m[4:8, 0:4].all() and m[4:8, 8:12].all()
    assert not m[4:8, 4:8].any()


def test_group_count_formula():
    # reference dn_components.py:42-47: 2*dn/(2*max), clamped to >= 1
    assert cdn_num_groups(100, 256) == 1
    assert cdn_num_groups(100, 25) == 4
    assert cdn_num_groups(100, 100) == 1
    assert cdn_num_groups(4, 8) == 1


def test_prepare_cdn_static_layout():
    rng = jax.random.PRNGKey(0)
    B, N, C = 2, 4, 16
    labels = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    boxes = jnp.full((B, N, 4), 0.5)
    valid = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool)
    label_enc = jax.random.normal(rng, (10, C))
    emb, qbox, meta = prepare_cdn(
        rng, labels, boxes, valid, label_enc,
        dn_number=4, label_noise_ratio=0.0, box_noise_scale=0.0,
        num_classes=8,
    )
    assert meta.pad_size == meta.num_groups * 2 * N
    assert emb.shape == (B, meta.pad_size, C)
    assert qbox.shape == (B, meta.pad_size, 4)
    # invalid slots zeroed
    emb_np = np.asarray(emb)
    assert (emb_np[0, 3] == 0).all() and (emb_np[1, 2] == 0).all()
    # with zero noise, positive slots embed the clean labels
    np.testing.assert_allclose(
        emb_np[0, 0], np.asarray(label_enc[1]), rtol=1e-6
    )
    # negatives (second half of group) also embed labels when label noise
    # is off (only boxes are perturbed for negatives)
    np.testing.assert_allclose(
        emb_np[0, N + 0], np.asarray(label_enc[1]), rtol=1e-6
    )
    # with zero box noise, qbox is the inverse-sigmoid of the clean boxes
    from dtlr_tpu.utils.boxes import inverse_sigmoid

    np.testing.assert_allclose(
        np.asarray(qbox[0, 0]), np.asarray(inverse_sigmoid(boxes[0, 0])), rtol=1e-5
    )


def test_label_noise_flips_some():
    rng = jax.random.PRNGKey(1)
    B, N, C = 1, 8, 8
    labels = jnp.zeros((B, N), jnp.int32)
    boxes = jnp.full((B, N, 4), 0.5)
    valid = jnp.ones((B, N), bool)
    label_enc = jnp.eye(10, C)
    emb, _, meta = prepare_cdn(
        rng, labels, boxes, valid, label_enc,
        dn_number=32, label_noise_ratio=1.0, box_noise_scale=0.0,
        num_classes=8,
    )
    # with ratio 1.0 (p=0.5 on even slots), some slots must differ from
    # the clean label-0 embedding
    clean = np.asarray(label_enc[0])
    emb_np = np.asarray(emb).reshape(-1, C)
    diffs = (np.abs(emb_np - clean[None]).max(-1) > 1e-6).sum()
    assert diffs > 0
