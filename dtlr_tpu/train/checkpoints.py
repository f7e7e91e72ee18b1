"""Checkpointing: orbax save/restore, auto-resume, charset surgery.

Covers reference semantics:
- per-epoch checkpoint.pth + numbered checkpoints at intervals + EMA
  best (reference main_synthetic.py:423-443, 455-463)
- auto-resume when <output_dir>/checkpoint exists (main_synthetic.py:241-258)
- charset transfer surgery: new class heads + label_enc sized to the
  target charset, with '--smart_mapping' copying rows for characters
  present in the old charset (reference finetuning.py:263-379, 422-539)
- torch checkpoint import (reference .pth) for parity validation
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state: Dict[str, Any],
                    max_to_keep: int = 5) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, template: Dict[str, Any],
                       step: Optional[int] = None) -> Optional[Dict[str, Any]]:
    """Restore into the structure of ``template``; None if no checkpoint.

    Falls back to a template-free (raw) restore when the template
    structure doesn't match what's on disk (e.g. loading only params
    from a checkpoint that carries a different optimizer state — the
    reference's strict=False load, main_synthetic.py:260-277)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    try:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    except ValueError:
        out = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    return out


def restore_raw(ckpt_dir: str, step: Optional[int] = None) -> Optional[Dict[str, Any]]:
    """Template-free restore: returns the checkpoint exactly as saved.

    A checkpoint written on one platform records its device shardings;
    restoring it template-free on another platform (e.g. TPU-trained
    checkpoint read on the CPU host for an npz snapshot) raises
    ValueError('Device ... not found'). Fall back to an abstract
    ShapeDtypeStruct template built from the checkpoint metadata, which
    restores onto the current default device."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    try:
        out = mgr.restore(step, args=ocp.args.StandardRestore())
    except ValueError:
        meta = mgr.item_metadata(step)
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding)
            if hasattr(m, "shape") and hasattr(m, "dtype") else m,
            meta,
        )
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return out


# ------------------------------------------------------- npz param snapshots
#
# Orbax checkpoint dirs live under gitignored outputs/ and die with the
# sandbox VM; a single compressed .npz of the params pytree is small
# enough to commit, which is how pretrained weights survive across
# build rounds. Flat keys are '/'-joined pytree paths.


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        if "/" in str(k):
            # '/' is the flat-key separator; a key containing it would
            # silently split into a different tree on load
            raise ValueError(f"param key {k!r} contains '/'")
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif v is None:
            raise ValueError(
                f"param tree leaf {key!r} is None — npz cannot represent "
                "it, so the roundtrip invariant would break silently"
            )
        else:
            out[key] = np.asarray(v)
    return out


def export_params_npz(state_or_params: Dict[str, Any], out_path: str,
                      dtype: Optional[str] = "float16") -> int:
    """Write a model-variables pytree (or a train state carrying one
    under 'params' next to 'opt_state') to one compressed .npz; returns
    the file size in bytes. ``dtype`` downcasts floating leaves for size
    (float16 keeps ~3 decimal digits — enough to warm-start finetuning;
    pass None to keep exact dtypes). load_params_npz returns exactly the
    pytree that was passed here (post-cast); note load_params_npz itself
    casts every floating leaf to its ``dtype`` argument (fp32 default),
    so non-fp32 float leaves only roundtrip bit-exactly when the load
    dtype matches."""
    tree = state_or_params
    if "opt_state" in tree and "params" in tree:  # a train state, not variables
        tree = tree["params"]
    flat = _flatten(tree)
    if dtype is not None:
        cast = np.dtype(dtype)
        flat = {k: (v.astype(cast) if np.issubdtype(v.dtype, np.floating) else v)
                for k, v in flat.items()}
    np.savez_compressed(out_path, **flat)
    return os.path.getsize(out_path)


def load_params_npz(path: str, dtype: str = "float32") -> Dict[str, Any]:
    """Inverse of export_params_npz: nested params pytree, floating
    leaves cast to ``dtype`` (training wants fp32 master weights)."""
    out: Dict[str, Any] = {}
    with np.load(path) as npz:
        for key in npz.files:
            arr = npz[key]
            if np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(arr)
    return out


def merge_params_npz(params: Dict[str, Any], path: str,
                     dtype: str = "float32") -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Tolerant warm start from an npz snapshot: copy every snapshot
    leaf whose '/'-joined path exists in ``params`` with a matching
    shape, keep the fresh initialization for everything else (the
    strict=False analog of torch ``load_state_dict`` the reference
    relies on when module structure changes, e.g. swapping the decoder
    cross-attention formulation between ``dense`` and ``deform``).

    Returns (merged, counts) with counts = copied / fresh (in params but
    not usable from the snapshot) / unused (snapshot-only) leaf totals.
    """
    flat_params = _flatten(jax.tree.map(lambda x: x, params))
    copied = unused = 0
    with np.load(path) as npz:
        for key in npz.files:
            arr = npz[key]
            if key in flat_params and tuple(arr.shape) == tuple(flat_params[key].shape):
                if np.issubdtype(arr.dtype, np.floating):
                    arr = arr.astype(dtype)
                flat_params[key] = jnp.asarray(arr)
                copied += 1
            else:
                unused += 1
    out: Dict[str, Any] = {}
    for key, leaf in flat_params.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(leaf)
    counts = {"copied": copied, "fresh": len(flat_params) - copied,
              "unused": unused}
    return out, counts


# ---------------------------------------------------------------- surgery

def smart_mapping_rows(old_charset: Sequence[str], new_charset: Sequence[str]) -> np.ndarray:
    """new index -> old index (or -1) (reference finetuning.py:295-358:
    rows for chars present in the old charset are copied, others get
    fresh random rows)."""
    old_index = {c: i for i, c in enumerate(old_charset)}
    return np.asarray([old_index.get(c, -1) for c in new_charset], np.int32)


def _reinit_like(rng, arr, rows_shape):
    return jax.random.normal(rng, rows_shape, dtype=arr.dtype) * 0.02


def surgery_class_heads(
    params: Dict[str, Any],
    old_charset: Sequence[str],
    new_charset: Sequence[str],
    rng: jax.Array,
    smart_mapping: bool = True,
) -> Dict[str, Any]:
    """Replace class heads + label_enc for a new charset.

    Touches: class_embed/fc (kernel cols + bias), enc_out_class_embed/fc,
    and the label_enc embedding rows (reference finetuning.py:263-379).
    Kernel layout is (in, out) so class axis is the last.
    """
    mapping = smart_mapping_rows(old_charset, new_charset) if smart_mapping else None
    K_new = len(new_charset)

    params = jax.tree.map(lambda x: x, params)  # shallow-copyable pytree
    p = params["params"] if "params" in params else params

    def remap_head(head):
        kernel, bias = head["fc"]["kernel"], head["fc"]["bias"]
        rngs = jax.random.split(rng, 2)
        new_kernel = _reinit_like(rngs[0], kernel, (kernel.shape[0], K_new))
        import math

        prior = -math.log((1 - 0.01) / 0.01)
        new_bias = jnp.full((K_new,), prior, bias.dtype)
        if mapping is not None:
            valid = mapping >= 0
            src = jnp.clip(mapping, 0)
            new_kernel = jnp.where(valid[None, :], kernel[:, src], new_kernel)
            new_bias = jnp.where(valid, bias[src], new_bias)
        return {"fc": {"kernel": new_kernel, "bias": new_bias}}

    for name in ("class_embed", "enc_out_class_embed"):
        if name in p:
            p[name] = remap_head(p[name])

    if "label_enc" in p:
        emb = p["label_enc"]
        new_emb = _reinit_like(rng, emb, (K_new + 2, emb.shape[1]))
        if mapping is not None:
            valid = mapping >= 0
            src = jnp.clip(mapping, 0)
            rows = jnp.where(valid[:, None], emb[src], new_emb[: K_new])
            new_emb = new_emb.at[:K_new].set(rows)
        p["label_enc"] = new_emb
    return params


def migrate_windowed_qkv(tree):
    """Exact remap of pre-split windowed-encoder params: the old fused
    ``qkv`` DenseGeneral (kernel (C,3,C)) becomes ``qk`` (kernel (C,2,C),
    the q/k slices) plus ``v_proj`` (the v slice). Old code computed
    q,k = qkv(content+pos)[0:2] and v = qkv(content)[2], so slicing the
    fused kernel reproduces the old function bit-for-bit."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "qkv" and isinstance(v, dict) and "kernel" in v:
                kern, bias = v["kernel"], v["bias"]
                out["qk"] = {"kernel": kern[:, :2, :], "bias": bias[:2]}
                out["v_proj"] = {"kernel": kern[:, 2, :], "bias": bias[2]}
            else:
                out[k] = walk(v)
        return out

    return walk(tree)


# ---------------------------------------------------------------- torch import

def import_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth state dict as numpy (strips 'module.'
    prefixes like reference util/utils.py:22 clean_state_dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out
