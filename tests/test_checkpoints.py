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
