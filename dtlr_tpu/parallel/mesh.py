"""Device mesh + sharding helpers.

Replaces the reference's DDP/NCCL runtime (reference util/misc.py:475-518
init_distributed_mode + torch DDP at main_synthetic.py:187-189) with the
JAX SPMD model: one jit-compiled step over a data-parallel Mesh; XLA
inserts the gradient all-reduces over ICI/DCN automatically from the
sharding annotations. Loss/metric reduction happens *inside* the step
(global sums over sharded arrays), replacing reduce_dict
(util/misc.py:139-163) and the num_boxes all_reduce (dino.py:728-730).

Multi-host: call jax.distributed.initialize() before building the mesh
(every host runs the same program; each host feeds its local batch
shard through make_global_batch)."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_name: str = "data", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_arrays: dict, axis_name: str = "data") -> dict:
    """Place host numpy arrays as batch-sharded global device arrays.

    Single-host: jax.device_put with a sharded layout splits the batch
    across local devices. Multi-host: each host passes its local shard
    and we assemble a global array via make_array_from_process_local_data.
    """
    sharding = batch_sharding(mesh, axis_name)
    out = {}
    multi_host = jax.process_count() > 1
    for k, v in batch_arrays.items():
        if multi_host:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def pad_batch_to_devices(arrays: dict, n_devices: Optional[int] = None) -> dict:
    """Pad the batch dim to a multiple of the device count. Images repeat
    the last sample (keeps activations in-distribution); labels/boxes are
    zeroed and ``valid`` set False on padded rows so they contribute no
    gradients or metrics (the CTC/detection losses mask by validity)."""
    n = n_devices or jax.device_count()
    B = next(iter(arrays.values())).shape[0]
    pad = (-B) % n
    if pad == 0:
        return arrays
    out = {}
    for k, v in arrays.items():
        tail = np.repeat(v[-1:], pad, axis=0)
        if k in ("labels", "boxes", "valid"):
            tail = np.zeros_like(tail)
        out[k] = np.concatenate([v, tail], axis=0)
    return out
