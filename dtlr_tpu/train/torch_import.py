"""Bidirectional weight mapping: reference torch checkpoints <-> flax.

The reference ships .pth checkpoints with torch module names
(models/dino/dino.py builds DINO(backbone, transformer, ...)). This
module maps those names to the dtlr_tpu flax pytree so reference
checkpoints can drive parity validation, and ours can be exported.

Layout conversions:
- Linear: torch (out, in) -> flax kernel (in, out)
- Conv2d: torch (O, I, kh, kw) -> flax (kh, kw, I, O)
- LayerNorm/GroupNorm weight/bias -> scale/bias
- FrozenBatchNorm2d weight/bias/running_mean/running_var -> scale/bias/mean/var
- torch nn.MultiheadAttention in_proj_weight (3C, C) -> split q/k/v
  DenseGeneral kernels (C, M, D); out_proj (C, C) -> (M, D, C)
- decoder class/bbox heads are shared in the reference
  (dec_pred_*_share=True, dino.py:170-189): index 0 is mapped.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

RESNET_STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _t(w):  # torch linear -> flax dense
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def build_name_map(
    n_enc: int = 6,
    n_dec: int = 6,
    n_levels: int = 4,
    n_backbone_outs: int = 3,
    backbone: str = "resnet50",
    n_heads: int = 8,
    d_model: int = 256,
) -> List[Tuple[str, Tuple[str, ...], str]]:
    """Returns [(torch_name, flax_path, kind)] where kind selects the
    layout conversion: lin|conv|raw|ln_w|ln_b|qkv_q|qkv_k|qkv_v|mha_out.
    """
    out: List[Tuple[str, Tuple[str, ...], str]] = []

    def A(tname, fpath, kind):
        out.append((tname, fpath, kind))

    # ---------------- backbone (torchvision resnet in backbone.0.body)
    bb = "backbone.0.body"
    fx = ("backbone_net",)
    A(f"{bb}.conv1.weight", fx + ("conv1", "kernel"), "conv")
    for suffix, leaf in (("weight", "scale"), ("bias", "bias"),
                         ("running_mean", "mean"), ("running_var", "var")):
        A(f"{bb}.bn1.{suffix}", fx + ("FrozenBatchNorm_0", leaf), "raw")
    stages = RESNET_STAGES[backbone]
    for st, blocks in enumerate(stages):
        for b in range(blocks):
            tb = f"{bb}.layer{st + 1}.{b}"
            fb = fx + (f"layer{st + 1}_{b}",)
            for ci in (1, 2, 3):
                A(f"{tb}.conv{ci}.weight", fb + (f"conv{ci}", "kernel"), "conv")
                for suffix, leaf in (("weight", "scale"), ("bias", "bias"),
                                     ("running_mean", "mean"), ("running_var", "var")):
                    A(f"{tb}.bn{ci}.{suffix}", fb + (f"FrozenBatchNorm_{ci - 1}", leaf), "raw")
            if b == 0:  # projection shortcut
                A(f"{tb}.downsample.0.weight", fb + ("downsample", "kernel"), "conv")
                for suffix, leaf in (("weight", "scale"), ("bias", "bias"),
                                     ("running_mean", "mean"), ("running_var", "var")):
                    A(f"{tb}.downsample.1.{suffix}", fb + ("FrozenBatchNorm_3", leaf), "raw")

    # ---------------- input projections
    for i in range(n_levels):
        A(f"input_proj.{i}.0.weight", (f"input_proj_{i}_conv", "kernel"), "conv")
        A(f"input_proj.{i}.0.bias", (f"input_proj_{i}_conv", "bias"), "raw")
        A(f"input_proj.{i}.1.weight", (f"input_proj_{i}_norm", "scale"), "raw")
        A(f"input_proj.{i}.1.bias", (f"input_proj_{i}_norm", "bias"), "raw")

    # ---------------- transformer common
    T = ("transformer",)
    A("transformer.level_embed", T + ("level_embed",), "raw")
    A("transformer.tgt_embed.weight", T + ("tgt_embed",), "raw")
    A("transformer.enc_output.weight", T + ("enc_output", "kernel"), "lin")
    A("transformer.enc_output.bias", T + ("enc_output", "bias"), "raw")
    A("transformer.enc_output_norm.weight", T + ("enc_output_norm", "scale"), "raw")
    A("transformer.enc_output_norm.bias", T + ("enc_output_norm", "bias"), "raw")
    A("transformer.decoder.norm.weight", T + ("decoder_norm", "scale"), "raw")
    A("transformer.decoder.norm.bias", T + ("decoder_norm", "bias"), "raw")
    for j in range(2):
        A(f"transformer.decoder.ref_point_head.layers.{j}.weight",
          T + ("ref_point_head", f"layers_{j}", "kernel"), "lin")
        A(f"transformer.decoder.ref_point_head.layers.{j}.bias",
          T + ("ref_point_head", f"layers_{j}", "bias"), "raw")

    def deform_attn(tprefix, fprefix):
        for mod in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            A(f"{tprefix}.{mod}.weight", fprefix + (mod, "kernel"), "lin")
            A(f"{tprefix}.{mod}.bias", fprefix + (mod, "bias"), "raw")

    # ---------------- encoder layers
    for i in range(n_enc):
        tp = f"transformer.encoder.layers.{i}"
        fp = T + (f"encoder_layer_{i}",)
        deform_attn(f"{tp}.self_attn", fp + ("self_attn",))
        for ln in ("norm1", "norm2"):
            A(f"{tp}.{ln}.weight", fp + (ln, "scale"), "raw")
            A(f"{tp}.{ln}.bias", fp + (ln, "bias"), "raw")
        for lin in ("linear1", "linear2"):
            A(f"{tp}.{lin}.weight", fp + (lin, "kernel"), "lin")
            A(f"{tp}.{lin}.bias", fp + (lin, "bias"), "raw")

    # ---------------- decoder layers
    for i in range(n_dec):
        tp = f"transformer.decoder.layers.{i}"
        fp = T + (f"decoder_layer_{i}",)
        deform_attn(f"{tp}.cross_attn", fp + ("cross_attn",))
        A(f"{tp}.self_attn.in_proj_weight", fp + ("self_attn", "q_proj", "kernel"), "qkv_q")
        A(f"{tp}.self_attn.in_proj_weight", fp + ("self_attn", "k_proj", "kernel"), "qkv_k")
        A(f"{tp}.self_attn.in_proj_weight", fp + ("self_attn", "v_proj", "kernel"), "qkv_v")
        A(f"{tp}.self_attn.in_proj_bias", fp + ("self_attn", "q_proj", "bias"), "qkvb_q")
        A(f"{tp}.self_attn.in_proj_bias", fp + ("self_attn", "k_proj", "bias"), "qkvb_k")
        A(f"{tp}.self_attn.in_proj_bias", fp + ("self_attn", "v_proj", "bias"), "qkvb_v")
        A(f"{tp}.self_attn.out_proj.weight", fp + ("self_attn", "out_proj", "kernel"), "mha_out")
        A(f"{tp}.self_attn.out_proj.bias", fp + ("self_attn", "out_proj", "bias"), "raw")
        for ln in ("norm1", "norm2", "norm3"):
            A(f"{tp}.{ln}.weight", fp + (ln, "scale"), "raw")
            A(f"{tp}.{ln}.bias", fp + (ln, "bias"), "raw")
        for lin in ("linear1", "linear2"):
            A(f"{tp}.{lin}.weight", fp + (lin, "kernel"), "lin")
            A(f"{tp}.{lin}.bias", fp + (lin, "bias"), "raw")

    # ---------------- heads (decoder-shared index 0) + label_enc
    A("class_embed.0.weight", ("class_embed", "fc", "kernel"), "lin")
    A("class_embed.0.bias", ("class_embed", "fc", "bias"), "raw")
    for j in range(3):
        A(f"bbox_embed.0.layers.{j}.weight", ("bbox_embed", f"layers_{j}", "kernel"), "lin")
        A(f"bbox_embed.0.layers.{j}.bias", ("bbox_embed", f"layers_{j}", "bias"), "raw")
    A("transformer.enc_out_class_embed.weight", ("enc_out_class_embed", "fc", "kernel"), "lin")
    A("transformer.enc_out_class_embed.bias", ("enc_out_class_embed", "fc", "bias"), "raw")
    for j in range(3):
        A(f"transformer.enc_out_bbox_embed.layers.{j}.weight",
          ("enc_out_bbox_embed", f"layers_{j}", "kernel"), "lin")
        A(f"transformer.enc_out_bbox_embed.layers.{j}.bias",
          ("enc_out_bbox_embed", f"layers_{j}", "bias"), "raw")
    A("label_enc.weight", ("label_enc",), "raw")
    return out


def _convert(kind: str, w: np.ndarray, n_heads: int, d_model: int,
             flax_shape) -> np.ndarray:
    D = d_model // n_heads
    if kind == "raw":
        out = np.asarray(w)
    elif kind == "lin":
        out = _t(w)
    elif kind == "conv":
        out = _conv(w)
    elif kind.startswith("qkv_"):
        part = "qkv".index(kind[-1])
        out = _t(np.asarray(w)[part * d_model : (part + 1) * d_model])
        out = out.reshape(d_model, n_heads, D)
    elif kind.startswith("qkvb_"):
        part = "qkv".index(kind[-1])
        out = np.asarray(w)[part * d_model : (part + 1) * d_model]
        out = out.reshape(n_heads, D)
    elif kind == "mha_out":
        out = _t(w).reshape(n_heads, D, d_model)
    else:
        raise ValueError(kind)
    assert tuple(out.shape) == tuple(flax_shape), (kind, out.shape, flax_shape)
    return out


def _invert(kind: str, w: np.ndarray, n_heads: int, d_model: int) -> np.ndarray:
    if kind == "raw":
        return np.asarray(w)
    if kind == "lin":
        return _t(w)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))
    if kind.startswith("qkv_"):
        return _t(np.asarray(w).reshape(d_model, d_model))
    if kind.startswith("qkvb_"):
        return np.asarray(w).reshape(d_model)
    if kind == "mha_out":
        return _t(np.asarray(w).reshape(d_model, d_model))
    raise ValueError(kind)


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def import_torch_state(
    params: Dict,
    torch_sd: Dict[str, np.ndarray],
    n_heads: int = 8,
    d_model: int = 256,
    strict: bool = False,
):
    """Fill the flax param pytree from a reference torch state dict.

    Returns (new_params, missing_torch_keys, unmapped_flax_leaves_count).
    """
    import jax

    p = jax.tree.map(np.asarray, params)
    inner = p["params"] if "params" in p else p
    # infer structural sizes from the tree
    n_enc = len([k for k in inner["transformer"] if k.startswith("encoder_layer_")])
    n_dec = len([k for k in inner["transformer"] if k.startswith("decoder_layer_")])
    n_levels = len([k for k in inner if k.startswith("input_proj_") and k.endswith("_conv")])
    name_map = build_name_map(n_enc, n_dec, n_levels, d_model=d_model, n_heads=n_heads)

    missing = []
    filled = set()
    for tname, fpath, kind in name_map:
        if tname not in torch_sd:
            missing.append(tname)
            continue
        target = _get(inner, fpath)
        w = _convert(kind, torch_sd[tname], n_heads, d_model, np.shape(target))
        _set(inner, fpath, w.astype(np.asarray(target).dtype))
        filled.add("/".join(fpath))
    if strict and missing:
        raise KeyError(f"missing torch keys: {missing[:10]} (+{len(missing)-10})")
    all_leaves = {"/".join(str(k.key) for k in kp)
                  for kp, _ in jax.tree_util.tree_flatten_with_path(inner)[0]}
    return p, missing, len(all_leaves - filled)


def export_torch_state(
    params: Dict, n_heads: int = 8, d_model: int = 256
) -> Dict[str, np.ndarray]:
    """Export the flax params as a reference-named torch state dict
    (decoder-shared heads are broadcast to indices 0..n_dec-1)."""
    import jax

    p = jax.tree.map(np.asarray, params)
    inner = p["params"] if "params" in p else p
    n_enc = len([k for k in inner["transformer"] if k.startswith("encoder_layer_")])
    n_dec = len([k for k in inner["transformer"] if k.startswith("decoder_layer_")])
    n_levels = len([k for k in inner if k.startswith("input_proj_") and k.endswith("_conv")])
    name_map = build_name_map(n_enc, n_dec, n_levels, d_model=d_model, n_heads=n_heads)

    out: Dict[str, np.ndarray] = {}
    qkv_parts: Dict[str, Dict[str, np.ndarray]] = {}
    for tname, fpath, kind in name_map:
        w = np.asarray(_get(inner, fpath))
        if kind.startswith("qkv"):
            qkv_parts.setdefault(tname, {})[kind] = w
            continue
        out[tname] = _invert(kind, w, n_heads, d_model)
    for tname, parts in qkv_parts.items():
        if "qkv_q" in parts:
            mats = [
                _invert("qkv_q", parts[f"qkv_{c}"], n_heads, d_model) for c in "qkv"
            ]
            out[tname] = np.concatenate(mats, axis=0)
        else:
            vecs = [
                _invert("qkvb_q", parts[f"qkvb_{c}"], n_heads, d_model) for c in "qkv"
            ]
            out[tname] = np.concatenate(vecs, axis=0)
    # broadcast shared decoder heads
    for i in range(1, n_dec):
        out[f"class_embed.{i}.weight"] = out["class_embed.0.weight"]
        out[f"class_embed.{i}.bias"] = out["class_embed.0.bias"]
        for j in range(3):
            out[f"bbox_embed.{i}.layers.{j}.weight"] = out[f"bbox_embed.0.layers.{j}.weight"]
            out[f"bbox_embed.{i}.layers.{j}.bias"] = out[f"bbox_embed.0.layers.{j}.bias"]
    return out
