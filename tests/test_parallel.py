"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtlr_tpu.parallel.mesh import batch_sharding, create_mesh, pad_batch_to_devices, shard_batch


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_shard_batch_layout():
    mesh = create_mesh("data")
    arrays = {
        "x": np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
        "y": np.arange(16, dtype=np.int32),
    }
    out = shard_batch(mesh, arrays)
    assert out["x"].sharding.spec == batch_sharding(mesh).spec
    # global view intact
    np.testing.assert_array_equal(np.asarray(out["x"]), arrays["x"])


def test_pad_batch_to_devices():
    arrays = {"x": np.ones((5, 3), np.float32)}
    out = pad_batch_to_devices(arrays, 8)
    assert out["x"].shape == (8, 3)
    np.testing.assert_array_equal(out["x"][5:], np.ones((3, 3)))


def test_sharded_train_math_matches_single_device():
    """A toy jitted grad step over the mesh must equal the local result."""
    mesh = create_mesh("data")
    W = jnp.ones((4, 2))
    x = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)

    def loss(W, x):
        return jnp.mean((x @ W) ** 2)

    g_local = jax.grad(loss)(W, jnp.asarray(x))
    xs = shard_batch(mesh, {"x": x})["x"]
    g_sharded = jax.jit(jax.grad(loss))(W, xs)
    np.testing.assert_allclose(np.asarray(g_local), np.asarray(g_sharded), rtol=1e-5)
