import jax
import jax.numpy as jnp
import numpy as np

from dtlr_tpu.train.checkpoints import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
    smart_mapping_rows,
    surgery_class_heads,
)


def test_save_restore_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
        "step": jnp.asarray(7),
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, state)
    assert latest_step(d) == 7
    template = jax.tree.map(jnp.zeros_like, state)
    out = restore_checkpoint(d, template)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), np.asarray(state["params"]["w"]))
    assert int(out["step"]) == 7


def test_smart_mapping_rows():
    old = ["a", "b", "c", " "]
    new = ["b", "x", "a", " "]
    m = smart_mapping_rows(old, new)
    assert m.tolist() == [1, -1, 0, 3]


def test_surgery_class_heads():
    rng = jax.random.PRNGKey(0)
    old_charset = ["a", "b", "c"]
    new_charset = ["c", "q", "a"]
    D = 8
    params = {
        "params": {
            "class_embed": {"fc": {
                "kernel": jnp.arange(D * 3, dtype=jnp.float32).reshape(D, 3),
                "bias": jnp.asarray([1.0, 2.0, 3.0]),
            }},
            "enc_out_class_embed": {"fc": {
                "kernel": jnp.ones((D, 3)), "bias": jnp.zeros((3,)),
            }},
            "label_enc": jnp.arange(5 * D, dtype=jnp.float32).reshape(5, D),
        }
    }
    out = surgery_class_heads(params, old_charset, new_charset, rng, smart_mapping=True)
    p = out["params"]
    k = p["class_embed"]["fc"]["kernel"]
    b = p["class_embed"]["fc"]["bias"]
    assert k.shape == (D, 3) and b.shape == (3,)
    # 'c' (old idx 2) copied to new idx 0; 'a' (old 0) to new 2; 'q' fresh
    old_k = params["params"]["class_embed"]["fc"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k[:, 0]), np.asarray(old_k[:, 2]))
    np.testing.assert_array_equal(np.asarray(k[:, 2]), np.asarray(old_k[:, 0]))
    assert float(b[0]) == 3.0 and float(b[2]) == 1.0
    # fresh column differs from any old column
    for j in range(3):
        assert not np.allclose(np.asarray(k[:, 1]), np.asarray(old_k[:, j]), atol=1e-6)
    # label_enc rows copied for mapped chars
    old_emb = params["params"]["label_enc"]
    np.testing.assert_array_equal(np.asarray(p["label_enc"][0]), np.asarray(old_emb[2]))
    np.testing.assert_array_equal(np.asarray(p["label_enc"][2]), np.asarray(old_emb[0]))
    assert p["label_enc"].shape == (3 + 2, D)


def test_params_npz_roundtrip(tmp_path):
    from dtlr_tpu.train.checkpoints import export_params_npz, load_params_npz

    variables = {
        "params": {
            "backbone": {"conv": {"kernel": jnp.arange(12.0).reshape(3, 4)}},
            "head": {"fc": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros((2,))}},
            "steps": jnp.asarray(5, jnp.int32),  # non-float leaf kept exact
        }
    }
    path = str(tmp_path / "snap.npz")

    # exact fp32 roundtrip
    export_params_npz(variables, path, dtype=None)
    out = load_params_npz(path)
    assert jax.tree.structure(out) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert out["params"]["steps"].dtype == jnp.int32

    # train-state input strips to its variables; fp16 cast roundtrips
    # back to fp32 within half precision
    state = {"params": variables, "opt_state": {"x": jnp.ones(3)}, "step": 9}
    export_params_npz(state, path, dtype="float16")
    out = load_params_npz(path)
    assert jax.tree.structure(out) == jax.tree.structure(variables)
    kern = out["params"]["backbone"]["conv"]["kernel"]
    assert kern.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(kern), np.arange(12.0).reshape(3, 4), rtol=1e-3)


def test_merge_params_npz_tolerant_warm_start(tmp_path):
    """merge_params_npz copies shape-matching leaves, keeps fresh init
    elsewhere (the decoder_ca dense<->deform swap in deform_adapt.sh)."""
    from dtlr_tpu.train.checkpoints import export_params_npz, merge_params_npz

    trained = {
        "params": {
            "backbone": {"conv": {"kernel": jnp.full((3, 4), 7.0)}},
            "decoder": {"ca_dense": {"q": {"kernel": jnp.full((4, 4), 2.0)}}},
            "head": {"fc": {"bias": jnp.arange(2.0)}},
        }
    }
    path = str(tmp_path / "trunk.npz")
    export_params_npz(trained, path, dtype="float16")

    fresh = {
        "params": {
            "backbone": {"conv": {"kernel": jnp.zeros((3, 4))}},
            # different CA formulation: leaf path differs -> stays fresh
            "decoder": {"ca_deform": {"offsets": {"kernel": jnp.full((4, 8), 0.5)}}},
            # same path but different shape -> stays fresh
            "head": {"fc": {"bias": jnp.zeros((5,))}},
        }
    }
    merged, counts = merge_params_npz(fresh, path)
    assert counts == {"copied": 1, "fresh": 2, "unused": 2}
    np.testing.assert_allclose(
        np.asarray(merged["params"]["backbone"]["conv"]["kernel"]), 7.0)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["decoder"]["ca_deform"]["offsets"]["kernel"]), 0.5)
    assert merged["params"]["head"]["fc"]["bias"].shape == (5,)
    assert jax.tree.structure(merged) == jax.tree.structure(fresh)
