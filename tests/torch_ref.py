"""Load the mounted reference (torch) DTLR model on CPU for forward
parity tests.

The reference requires torchvision (absent) and the compiled
MultiScaleDeformableAttention CUDA extension (absent), so this module
installs minimal stubs *before* importing the reference packages:

- a fake ``torchvision`` exposing only the symbols the reference
  imports at module scope (``ops.boxes.nms``, ``ops.nms``,
  ``models._utils.IntermediateLayerGetter``); none are exercised by the
  parity forwards (NMS only runs inside PostProcess when
  nms_iou_threshold is set).
- a fake ``MultiScaleDeformableAttention`` whose ``ms_deform_attn_forward``
  delegates to the reference's own pure-torch core
  ``ms_deform_attn_core_pytorch``
  (reference models/dino/ops/functions/ms_deform_attn_func.py:41-61).
- ``torch.cuda.set_device`` no-op (reference models/dino/dino.py:46
  calls it at import time).

The torchvision ResNet itself is replaced by a vendored minimal
FrozenBN ResNet-50/101 (standard bottleneck architecture, written
fresh) whose module names match torchvision exactly, so state dicts
produced by ``dtlr_tpu.train.torch_import.export_torch_state`` load
into the full reference model verbatim.
"""

from __future__ import annotations

import sys
import types
from typing import List

import torch
from torch import nn

REFERENCE_ROOT = "/root/reference"
_loaded = {}


def _install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.15.0"  # >=0.7 so util.misc skips compat paths
        tv._is_tracing = lambda: False

        ops = types.ModuleType("torchvision.ops")
        boxes = types.ModuleType("torchvision.ops.boxes")

        def _nms(b, s, iou):  # used only by PostProcess w/ nms set
            order = torch.argsort(s, descending=True)
            keep = []
            suppressed = torch.zeros(len(s), dtype=torch.bool)
            for i in order.tolist():
                if suppressed[i]:
                    continue
                keep.append(i)
                bi = b[i]
                x1 = torch.maximum(bi[0], b[:, 0])
                y1 = torch.maximum(bi[1], b[:, 1])
                x2 = torch.minimum(bi[2], b[:, 2])
                y2 = torch.minimum(bi[3], b[:, 3])
                inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
                a1 = (bi[2] - bi[0]) * (bi[3] - bi[1])
                a2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
                iou_v = inter / (a1 + a2 - inter + 1e-9)
                suppressed |= iou_v > iou
            return torch.as_tensor(keep, dtype=torch.long)

        def _box_area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        boxes.nms = _nms
        boxes.box_area = _box_area
        ops.boxes = boxes
        ops.nms = _nms

        models = types.ModuleType("torchvision.models")
        mutils = types.ModuleType("torchvision.models._utils")

        class IntermediateLayerGetter(nn.ModuleDict):
            def __init__(self, model, return_layers):
                layers = {}
                rl = dict(return_layers)
                for name, module in model.named_children():
                    layers[name] = module
                    if name in rl:
                        del rl[name]
                    if not rl:
                        break
                super().__init__(layers)
                self.return_layers = dict(return_layers)

            def forward(self, x):
                out = {}
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        mutils.IntermediateLayerGetter = IntermediateLayerGetter
        models._utils = mutils

        transforms = types.ModuleType("torchvision.transforms")
        transforms.__path__ = []  # mark as package for submodule imports
        tfunctional = types.ModuleType("torchvision.transforms.functional")
        transforms.functional = tfunctional
        tv.ops = ops
        tv.models = models
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.models._utils"] = mutils
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = tfunctional

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tmodels = types.ModuleType("timm.models")
        tlayers = types.ModuleType("timm.models.layers")
        tlayers.trunc_normal_ = torch.nn.init.trunc_normal_

        class DropPath(nn.Module):  # only instantiated by convnext/swin
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        tlayers.DropPath = DropPath
        tlayers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        timm.models = tmodels
        tmodels.layers = tlayers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tmodels
        sys.modules["timm.models.layers"] = tlayers

    if "MultiScaleDeformableAttention" not in sys.modules:
        msda = types.ModuleType("MultiScaleDeformableAttention")
        sys.modules["MultiScaleDeformableAttention"] = msda

    torch.cuda.set_device = lambda *a, **k: None


def load_reference():
    """Import the reference model packages (once) and return a namespace."""
    if _loaded:
        return _loaded["ns"]
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    from models.dino.ops.functions import ms_deform_attn_func as f

    # route the "CUDA" op through the reference's pure-torch core
    msda = sys.modules["MultiScaleDeformableAttention"]
    msda.ms_deform_attn_forward = (
        lambda value, shapes, start_idx, loc, w, step:
        f.ms_deform_attn_core_pytorch(value, shapes, loc, w)
    )

    import models.dino.dino as ref_dino
    import models.dino.deformable_transformer as ref_dt
    import models.dino.position_encoding as ref_pe
    from models.dino.backbone import FrozenBatchNorm2d
    from util.misc import NestedTensor

    ns = types.SimpleNamespace(
        dino=ref_dino,
        deformable_transformer=ref_dt,
        position_encoding=ref_pe,
        FrozenBatchNorm2d=FrozenBatchNorm2d,
        NestedTensor=NestedTensor,
        deform_core=f.ms_deform_attn_core_pytorch,
    )
    _loaded["ns"] = ns
    return ns


# ---------------------------------------------------------------------------
# Vendored minimal FrozenBN ResNet with torchvision module names.
# Standard bottleneck ResNet (He et al. 2016), written fresh; only what
# the reference backbone uses (stages 1-4, no fc/avgpool needed but fc
# kept absent since IntermediateLayerGetter stops at layer4).
# ---------------------------------------------------------------------------


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride, norm_layer, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class VendoredResNet(nn.Module):
    """torchvision-named ResNet-50/101 body with FrozenBatchNorm."""

    def __init__(self, layers: List[int], norm_layer):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, layers[0], 1, norm_layer)
        self.layer2 = self._make_layer(128, layers[1], 2, norm_layer)
        self.layer3 = self._make_layer(256, layers[2], 2, norm_layer)
        self.layer4 = self._make_layer(512, layers[3], 2, norm_layer)

    def _make_layer(self, planes, blocks, stride, norm_layer):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            norm_layer(planes * 4),
        )
        out = [_Bottleneck(self.inplanes, planes, stride, norm_layer, downsample)]
        self.inplanes = planes * 4
        for _ in range(blocks - 1):
            out.append(_Bottleneck(self.inplanes, planes, 1, norm_layer))
        return nn.Sequential(*out)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def make_vendored_backbone(name: str, return_interm_indices, args):
    """Build a reference-compatible Joiner with the vendored ResNet, so
    state-dict names `backbone.0.body.*` match the reference exactly
    (reference models/dino/backbone.py:109-190)."""
    ns = load_reference()
    import torch.nn.functional as F

    layers = {"resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3]}[name]
    body = VendoredResNet(layers, ns.FrozenBatchNorm2d)
    pe = ns.position_encoding.build_position_encoding(args)

    stage_names = ["layer1", "layer2", "layer3", "layer4"]
    wanted = [stage_names[i] for i in return_interm_indices]
    num_channels = [256, 512, 1024, 2048][4 - len(return_interm_indices):]

    class _Body(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = body

        def forward(self, tensor_list):
            x = tensor_list.tensors
            m = tensor_list.mask
            feats = {}
            x = self.body.maxpool(self.body.relu(self.body.bn1(self.body.conv1(x))))
            for i, sn in enumerate(stage_names):
                x = getattr(self.body, sn)(x)
                if sn in wanted:
                    mask = F.interpolate(m[None].float(), size=x.shape[-2:]).to(torch.bool)[0]
                    feats[str(i)] = ns.NestedTensor(x, mask)
            return feats

    class _Joiner(nn.Sequential):
        def forward(self, tensor_list):
            xs = self[0](tensor_list)
            out, pos = [], []
            for _, x in xs.items():
                out.append(x)
                pos.append(self[1](x).to(x.tensors.dtype))
            return out, pos

    joiner = _Joiner(_Body(), pe)
    joiner.num_channels = num_channels
    return joiner


def build_reference_dino(args):
    """reference build_dino (models/dino/dino.py:1049-1194) with the
    vendored backbone injected in place of torchvision's."""
    ns = load_reference()
    orig = ns.dino.build_backbone
    ns.dino.build_backbone = lambda a: make_vendored_backbone(
        a.backbone, a.return_interm_indices, a
    )
    try:
        model, criterion, postprocessors = ns.dino.build_dino(args)
    finally:
        ns.dino.build_backbone = orig
    model.eval()
    return model, criterion, postprocessors
