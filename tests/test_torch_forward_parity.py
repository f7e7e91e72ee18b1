"""Forward parity against the REFERENCE torch modules (not a roundtrip).

Builds the full reference DINO on CPU (reference models/dino/dino.py:1049
via build_dino, with a vendored torchvision-named FrozenBN ResNet and the
pure-torch deform core ms_deform_attn_func.py:41-61), loads weights
exported from a randomly-initialized flax model through
``export_torch_state``, and asserts both stacks compute the same function
on the same image: backbone features, pred_logits/pred_boxes per decoder
layer, interm (two-stage) outputs, and loss_CTC.

Geometry is the reference-faithful one (deformable encoder + deformable
decoder CA, no shared offsets) at reduced depth (2+2 layers, 20 queries)
but full hidden_dim=256 (the reference hardcodes 128-d sine embeds per
coord, deformable_transformer.py:691-699 + utils.py:141-167).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dtlr_tpu.config.loader import load_config
from dtlr_tpu.models.dino import DINO
from dtlr_tpu.train.torch_import import export_torch_state

from torch_ref import build_reference_dino, load_reference

N_ENC = N_DEC = 2
NQ = 20
NUM_CLASSES = 30
IMG_H, IMG_W = 64, 96


def _args():
    # the REFERENCE config carries every key its build functions read
    # (our configs prune dead reference keys)
    cfg = load_config("/root/reference/config/Latin.py")
    cfg.enc_layers = N_ENC
    cfg.dec_layers = N_DEC
    cfg.num_queries = NQ
    cfg.num_classes = NUM_CLASSES
    cfg.dn_labelbook_size = NUM_CLASSES + 1
    cfg.use_dn = False  # eval-path parity; CDN RNG is framework-specific
    cfg.dropout = 0.0
    cfg.device = "cpu"
    cfg.frozen_weights = None
    return cfg


@pytest.fixture(scope="module")
def pair():
    cfg = _args()
    model = DINO(
        num_classes=NUM_CLASSES,
        num_queries=NQ,
        hidden_dim=256,
        n_heads=8,
        num_encoder_layers=N_ENC,
        num_decoder_layers=N_DEC,
        d_ffn=cfg.dim_feedforward,
        num_feature_levels=4,
        use_dn=False,
        dn_labelbook_size=NUM_CLASSES + 1,
        max_targets=8,
        norm_kind="frozen_bn",
    )
    rng = jax.random.PRNGKey(7)
    img = jax.random.normal(rng, (1, IMG_H, IMG_W, 3), jnp.float32) * 0.5
    vhw = jnp.asarray([[IMG_H, IMG_W]], jnp.int32)
    params = jax.jit(
        lambda r: model.init({"params": r}, img, vhw, None, train=False)
    )(rng)

    sd = export_torch_state(params, n_heads=8, d_model=256)
    tmodel, tcriterion, _ = build_reference_dino(cfg)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    # every reference param must be covered; extra exported names are the
    # broadcast copies of shared heads which torch only stores once.
    # transformer.decoder.{bbox,class}_embed.* are state-dict ALIASES of
    # DINO.{bbox,class}_embed (the reference shares the module objects,
    # dino.py:170-189 + 253-260), so loading the top-level name fills both.
    alias_prefixes = (
        "transformer.decoder.bbox_embed.",
        "transformer.decoder.class_embed.",
        "transformer.enc_out_bbox_embed.",
        "transformer.enc_out_class_embed.",
    )
    real_missing = [m for m in missing if not m.startswith(alias_prefixes)]
    assert not real_missing, f"reference params not covered: {real_missing[:8]}"

    fwd = jax.jit(lambda p: model.apply(p, img, vhw, None, train=False))
    ours = jax.device_get(fwd(params))

    ns = load_reference()
    timg = torch.from_numpy(np.asarray(img).transpose(0, 3, 1, 2)).float()
    tmask = torch.zeros((1, IMG_H, IMG_W), dtype=torch.bool)
    with torch.no_grad():
        theirs = tmodel(ns.NestedTensor(timg, tmask))
    return ours, theirs, tcriterion


def test_final_layer_parity(pair):
    ours, theirs, _ = pair
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"][:, :, 0]).ravel(),
        theirs["pred_boxes"][:, :, 0].numpy().ravel(),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]).ravel(),
        theirs["pred_logits"].numpy().ravel(),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]).ravel(),
        theirs["pred_boxes"].numpy().ravel(),
        atol=2e-4,
    )


def test_aux_layer_parity(pair):
    ours, theirs, _ = pair
    assert len(theirs["aux_outputs"]) == N_DEC - 1
    for i, aux in enumerate(theirs["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(ours["aux_outputs"][i]["pred_logits"]).ravel(),
            aux["pred_logits"].numpy().ravel(),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(ours["aux_outputs"][i]["pred_boxes"]).ravel(),
            aux["pred_boxes"].numpy().ravel(),
            atol=2e-4,
        )


def test_interm_parity(pair):
    ours, theirs, _ = pair
    np.testing.assert_allclose(
        np.asarray(ours["interm_outputs"]["pred_logits"]).ravel(),
        theirs["interm_outputs"]["pred_logits"].numpy().ravel(),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ours["interm_outputs"]["pred_boxes"]).ravel(),
        theirs["interm_outputs"]["pred_boxes"].numpy().ravel(),
        atol=2e-4,
    )


def test_loss_ctc_parity(pair):
    """reference SetCriterion.loss_CTC (dino.py:457-551) vs ops.ctc on
    identical random inputs.

    Random (well-separated) box centers rather than the model outputs:
    at random-weight init the two-stage proposals emit near-tied
    x-centers, and torch.sort (unstable) vs jnp.argsort (stable) order
    ties differently, permuting CTC frames — a tie-breaking artifact,
    not a loss-math difference. With distinct centers the two losses
    agree to float precision (incl. ops/ctc.py's analytic correction for
    optax's log-softmax renormalization of the interleaved blank rows)."""
    from dtlr_tpu.ops.ctc import ctc_loss

    _, _, tcriterion = pair
    rng = np.random.RandomState(3)
    logits = (rng.randn(2, NQ, NUM_CLASSES) * 2).astype(np.float32)
    boxes = rng.rand(2, NQ, 4).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES, size=(2, 6))

    ttargets = [{"labels": torch.from_numpy(l).long()} for l in labels]
    tlosses = tcriterion.loss_CTC(
        {
            "pred_logits": torch.from_numpy(logits),
            "pred_boxes": torch.from_numpy(boxes),
        },
        ttargets,
        None,
        None,
    )
    jloss, _ = ctc_loss(
        jnp.asarray(logits),
        jnp.asarray(boxes),
        jnp.asarray(labels),
        jnp.ones((2, 6), bool),
    )
    np.testing.assert_allclose(
        float(jloss), float(tlosses["loss_CTC"]), atol=2e-5, rtol=1e-5
    )


def test_resnet_feature_parity(pair):
    """Vendored torch ResNet-50 (torchvision names) vs flax resnet on the
    stem+stage outputs, via the DINO input projections being bit-level
    consumers — here checked indirectly by running the torch body alone."""
    # covered transitively by the full-forward tests above: any backbone
    # divergence would break pred_* parity. This test pins the direct
    # feature tensors for easier fault isolation.
    cfg = _args()
    from torch_ref import VendoredResNet, load_reference

    ns = load_reference()
    from dtlr_tpu.models.resnet import build_resnet
    import flax.linen as fnn

    class _BB(fnn.Module):
        def setup(self):
            bb, _ = build_resnet("resnet50", "frozen_bn", (1, 2, 3))
            self.net = bb

        def __call__(self, x):
            return self.net(x)

    m = _BB()
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 64, 64, 3), jnp.float32)
    params = jax.jit(m.init)(rng, img)
    feats = jax.jit(m.apply)(params, img)

    # export just the backbone leaves
    full = DINO(
        num_classes=5, num_queries=4, hidden_dim=256, n_heads=8,
        num_encoder_layers=1, num_decoder_layers=1, use_dn=False,
        dn_labelbook_size=6, max_targets=2,
    )
    fparams = jax.jit(
        lambda r: full.init(
            {"params": r}, img, jnp.asarray([[64, 64]], jnp.int32), None,
            train=False,
        )
    )(rng)
    fparams["params"]["backbone_net"] = params["params"]["net"]
    sd = export_torch_state(fparams, n_heads=8, d_model=256)

    tnet = VendoredResNet([3, 4, 6, 3], ns.FrozenBatchNorm2d)
    tsd = {
        k[len("backbone.0.body."):]: torch.from_numpy(np.asarray(v))
        for k, v in sd.items()
        if k.startswith("backbone.0.body.")
    }
    missing, _ = tnet.load_state_dict(tsd, strict=False)
    assert not missing
    timg = torch.from_numpy(np.asarray(img).transpose(0, 3, 1, 2)).float()
    with torch.no_grad():
        x = tnet.maxpool(tnet.relu(tnet.bn1(tnet.conv1(timg))))
        outs = []
        for ln in ("layer1", "layer2", "layer3", "layer4"):
            x = getattr(tnet, ln)(x)
            outs.append(x)
    # return_interm_indices (1,2,3) -> layers 2,3,4
    for f, t in zip(feats, outs[1:]):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2).ravel(),
            t.numpy().ravel(),
            atol=1e-3,
        )
