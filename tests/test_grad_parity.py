"""Gradient- and trajectory-level training parity vs the reference torch
stack (VERDICT r4 #2 — the strongest training-parity proof available
without LVIS data / the HF checkpoint).

On the tiny converted detector of tests/test_reference_parity.py (2 enc +
2 dec layers, closed-vocab + enc_cls_agn — the CLIP-free configuration
whose reference modules are importable):

* ``test_grad_parity`` — d(weighted total loss)/d(params) through the FULL
  stack (input projections -> deformable transformer -> heads -> scipy
  Hungarian match -> SetCriterion focal/L1/GIoU incl. aux + interm sets)
  compared parameter-by-parameter: torch autograd grads are mapped through
  ``tools.convert_detector`` (a linear transpose/reshape map, so it maps
  gradients exactly as it maps weights) and asserted against ``jax.grad``.
  This is the one test that can catch wrong stop_gradient placement,
  focal-grad normalization, and num_boxes normalization
  (reference: engine.py:100-114, richsem.py:1124-1306, matcher.py:49-78).

* ``test_train_trajectory_parity`` — 10 AdamW steps (lr 1e-4, wd 1e-4,
  grad clip 0.1 — the reference recipe, main.py:211-214, engine.py:103-113)
  on both sides with the scipy matcher pinning assignments; the weighted
  loss trajectories must track.

TEST GLUE: executes reference code as an oracle; nothing ships into
richsem_tpu/.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_harness import (  # noqa: E402
    build_reference_detector,
    make_args,
)
from tests.test_flagship_parity import _ensure_richsem_module  # noqa: E402

B, H, W = 2, 64, 64
NUM_CLASSES = 24
BACKBONE_CH = (512, 1024, 2048)
COUNTS = [3, 2]
G = 4  # padded GT slots (ours)

WEIGHTS = {"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0}


def _full_weight_dict(n_aux):
    w = dict(WEIGHTS)
    for i in range(n_aux):
        w.update({f"{k}_{i}": v for k, v in WEIGHTS.items()})
    w.update({f"{k}_interm": v for k, v in WEIGHTS.items()})
    return w


def _patch_cuda(monkeypatch):
    """Route the criterion's hard-coded .cuda()/.to('cuda')
    (richsem.py:1162-1196) to CPU for the oracle run."""
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and args[0] == "cuda":
            return self
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to)


@pytest.fixture(scope="module")
def setup():
    args = make_args()
    tf, input_projs, class_embed, pos_module = build_reference_detector(
        args, NUM_CLASSES, BACKBONE_CH, seed=0
    )
    tf.eval()
    rng = np.random.default_rng(0)
    # Perturb the zero-initialized msda offset/attention heads: at the
    # reference init their gradients are near-cancelling sums (abs values
    # ~1e-3 from ~1-sized terms), so a relative comparison measures f32
    # accumulation-order noise instead of math. A small random kernel makes
    # every head's gradient well-conditioned — and tests a non-degenerate
    # point of the loss surface.
    with torch.no_grad():
        for name, p in tf.named_parameters():
            if "sampling_offsets" in name or "attention_weights" in name:
                p.add_(torch.from_numpy(
                    rng.normal(0, 0.01, p.shape).astype(np.float32)
                ))
    feats_np = [
        rng.normal(size=(B, ch, H // s, W // s)).astype(np.float32)
        for ch, s in zip(BACKBONE_CH, (8, 16, 32))
    ]
    labels = rng.integers(0, NUM_CLASSES, (B, G)).astype(np.int32)
    cxcy = rng.uniform(0.2, 0.8, (B, G, 2))
    wh = rng.uniform(0.1, 0.3, (B, G, 2))
    boxes = np.concatenate([cxcy, wh], -1).astype(np.float32)
    valid = np.arange(G)[None, :] < np.asarray(COUNTS)[:, None]

    sd = {f"transformer.{k}": v for k, v in tf.state_dict().items()}
    for i, proj in enumerate(input_projs):
        sd.update(
            {f"input_proj.{i}.{k}": v for k, v in proj.state_dict().items()}
        )
    sd.update(
        {f"class_embed.0.{k}": v for k, v in class_embed.state_dict().items()}
    )
    bbox_embed = tf.decoder.bbox_embed[0]
    sd.update(
        {f"bbox_embed.0.{k}": v for k, v in bbox_embed.state_dict().items()}
    )
    return args, tf, input_projs, class_embed, pos_module, sd, feats_np, {
        "labels": labels, "boxes": boxes, "valid": valid,
    }


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------
def _ref_forward_train(tf, input_projs, pos_module, feats_np):
    """reference_forward without detach: outputs dict for SetCriterion."""
    import torch.nn.functional as F

    from util.misc import NestedTensor, inverse_sigmoid

    mask = torch.zeros((B, H // 8, W // 8), dtype=torch.bool)
    feats = [torch.from_numpy(f) for f in feats_np]
    srcs, masks, poss = [], [], []
    for l, feat in enumerate(feats):
        m = F.interpolate(mask[None].float(), size=feat.shape[-2:]).to(
            torch.bool
        )[0]
        srcs.append(input_projs[l](feat))
        masks.append(m)
        poss.append(pos_module(NestedTensor(srcs[-1], m)))
    for l in range(len(feats), len(input_projs)):
        src = input_projs[l](feats[-1] if l == len(feats) else srcs[-1])
        m = F.interpolate(mask[None].float(), size=src.shape[-2:]).to(
            torch.bool
        )[0]
        srcs.append(src)
        masks.append(m)
        poss.append(pos_module(NestedTensor(src, m)))

    hs, reference, hs_enc, ref_enc, init_box_proposal, _ = tf(
        srcs, masks, None, poss, None, None
    )
    coords = []
    for ref_sig, bbox_embed, layer_hs in zip(
        reference[:-1], tf.decoder.bbox_embed, hs
    ):
        coords.append(
            (bbox_embed(layer_hs) + inverse_sigmoid(ref_sig)).sigmoid()
        )
    classes = [tf.decoder.class_embed[0](h) for h in hs]
    out = {
        "pred_logits": classes[-1],
        "pred_boxes": coords[-1],
        "aux_outputs": [
            {"pred_logits": c, "pred_boxes": b}
            for c, b in zip(classes[:-1], coords[:-1])
        ],
        "interm_outputs": {
            "pred_logits": tf.enc_out_class_embed(hs_enc[-1]),
            "pred_boxes": ref_enc[-1],
        },
        "dn_meta": None,
    }
    return out


def _ref_criterion():
    richsem_mod = _ensure_richsem_module()
    import importlib

    matcher_mod = importlib.import_module("models.richsem.matcher")
    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_bbox=5.0, cost_giou=2.0, focal_alpha=0.25
    )
    crit = richsem_mod.SetCriterion(
        num_classes=NUM_CLASSES, matcher=matcher, weight_dict={},
        focal_alpha=0.25, losses=["labels", "boxes"],
    )
    crit.train()
    return crit


def _ref_targets(tgts):
    out = []
    for i in range(B):
        n = COUNTS[i]
        out.append({
            "labels": torch.as_tensor(tgts["labels"][i, :n]).long(),
            "boxes": torch.as_tensor(tgts["boxes"][i, :n]),
        })
    return out


def _ref_total(tf, input_projs, pos_module, crit, feats_np, tgts, n_aux):
    outputs = _ref_forward_train(tf, input_projs, pos_module, feats_np)
    losses = crit(outputs, _ref_targets(tgts))
    w = _full_weight_dict(n_aux)
    return sum(losses[k] * v for k, v in w.items() if k in losses)


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------
def _our_model(args):
    from richsem_tpu.models.dino import DINO, DINOConfig

    cfg = DINOConfig(
        num_classes=NUM_CLASSES, hidden_dim=args.hidden_dim,
        nheads=args.nheads, enc_layers=args.enc_layers,
        dec_layers=args.dec_layers, dim_feedforward=args.dim_feedforward,
        num_queries=args.num_queries,
        num_feature_levels=args.num_feature_levels,
        enc_n_points=args.enc_n_points, dec_n_points=args.dec_n_points,
        use_language=False, enc_cls_agn=True, dn_labelbook_reuse_cls=True,
    )
    return DINO(cfg)


def _our_params(args, sd):
    from tools.convert_detector import convert_detector

    converted = convert_detector(
        sd, enc_layers=args.enc_layers, dec_layers=args.dec_layers,
        nheads=args.nheads, num_feature_levels=args.num_feature_levels,
    )
    params = converted["params"] if "params" in converted else converted
    return {"params": jax.tree.map(jnp.asarray, params)}


def _our_loss_fn(model, feats, tgts, n_aux):
    from richsem_tpu.models.criterion import set_criterion, weighted_loss
    from richsem_tpu.models.dino import DINO

    pad_mask = jnp.zeros((B, H, W), bool)
    targets = {
        "labels": jnp.asarray(tgts["labels"]),
        "boxes": jnp.asarray(tgts["boxes"]),
        "valid": jnp.asarray(tgts["valid"]),
    }
    wd = _full_weight_dict(n_aux)

    def loss_fn(params):
        out = model.apply(
            params, feats, pad_mask, method=DINO.detect, train=False
        )
        losses = set_criterion(
            {
                "pred_logits": out["pred_logits"],
                "pred_boxes": out["pred_boxes"],
                "aux_outputs": [
                    {"pred_logits": a["pred_logits"],
                     "pred_boxes": a["pred_boxes"]}
                    for a in out["aux_outputs"]
                ],
                "interm_outputs": {
                    "pred_logits": out["interm_outputs"]["pred_logits"],
                    "pred_boxes": out["interm_outputs"]["pred_boxes"],
                },
            },
            targets, jax.random.PRNGKey(0),
            num_classes=NUM_CLASSES, focal_alpha=0.25,
            cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
            matcher_type="HungarianMatcherCPU",
        )
        return weighted_loss(losses, wd)

    return loss_fn


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------
def test_grad_parity(setup, monkeypatch):
    args, tf, input_projs, class_embed, pos_module, sd, feats_np, tgts = setup
    _patch_cuda(monkeypatch)
    n_aux = args.dec_layers - 1
    container = torch.nn.ModuleList([tf, *input_projs])
    container.zero_grad(set_to_none=True)

    crit = _ref_criterion()
    total = _ref_total(tf, input_projs, pos_module, crit, feats_np, tgts,
                       n_aux)
    total.backward()

    # torch grads, keyed like the checkpoint state dict; the converter maps
    # tensors leaf-for-leaf (transposes/reshapes — linear), so applying it
    # to grads yields flax-shaped reference grads
    grad_sd = {}
    modules = {f"transformer.": tf}
    for i, proj in enumerate(input_projs):
        modules[f"input_proj.{i}."] = proj
    for prefix, mod in modules.items():
        for k, p in mod.named_parameters():
            grad_sd[prefix + k] = (
                p.grad.detach().clone() if p.grad is not None
                else torch.zeros_like(p)
            )
    for k, p in class_embed.named_parameters():
        grad_sd[f"class_embed.0.{k}"] = (
            p.grad.detach().clone() if p.grad is not None
            else torch.zeros_like(p)
        )
    for k, p in tf.decoder.bbox_embed[0].named_parameters():
        grad_sd[f"bbox_embed.0.{k}"] = (
            p.grad.detach().clone() if p.grad is not None
            else torch.zeros_like(p)
        )
    from tools.convert_detector import convert_detector

    ref_grads = convert_detector(
        grad_sd, enc_layers=args.enc_layers, dec_layers=args.dec_layers,
        nheads=args.nheads, num_feature_levels=args.num_feature_levels,
    )
    ref_grads = ref_grads["params"] if "params" in ref_grads else ref_grads

    model = _our_model(args)
    params = _our_params(args, sd)
    feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_np]
    loss_fn = _our_loss_fn(model, feats, tgts, n_aux)

    our_total, our_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(our_total), float(total.detach()), rtol=5e-4,
        err_msg="weighted total loss",
    )

    flat_ref = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    }
    flat_ours = {
        jax.tree_util.keystr(p).replace("['params']", ""): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(our_grads)[0]
    }
    assert set(flat_ref) == set(flat_ours), (
        sorted(set(flat_ref) ^ set(flat_ours))[:8]
    )
    gscale = max(
        float(np.abs(v).max()) for v in flat_ref.values()
    )
    checked = mismatched = 0
    for k in sorted(flat_ref):
        a, b = flat_ref[k], flat_ours[k]
        try:
            np.testing.assert_allclose(
                b, a, rtol=2e-3, atol=2e-5 * gscale, err_msg=k
            )
        except AssertionError as e:
            mismatched += 1
            if mismatched <= 3:
                print(e)
        checked += 1
    assert mismatched == 0, f"{mismatched}/{checked} grad leaves mismatch"
    assert checked > 100


def test_train_trajectory_parity(setup, monkeypatch):
    args, tf, input_projs, class_embed, pos_module, sd, feats_np, tgts = setup
    _patch_cuda(monkeypatch)
    n_aux = args.dec_layers - 1
    n_steps = 10
    lr, wd, clip = 1e-4, 1e-4, 0.1

    # ---- torch side (fresh copies so the grad test's state is untouched)
    import copy

    tf2 = copy.deepcopy(tf)
    projs2 = copy.deepcopy(input_projs)
    crit = _ref_criterion()
    container = torch.nn.ModuleList([tf2, *projs2])
    trainable = [p for p in container.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(
        trainable, lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd
    )
    ref_losses = []
    for _ in range(n_steps):
        opt.zero_grad(set_to_none=True)
        total = _ref_total(tf2, projs2, pos_module, crit, feats_np, tgts,
                           n_aux)
        ref_losses.append(float(total.detach()))
        total.backward()
        torch.nn.utils.clip_grad_norm_(trainable, clip)
        opt.step()

    # ---- our side: same chain (clip 0.1 -> AdamW(wd on all leaves))
    import optax

    model = _our_model(args)
    params = _our_params(args, sd)
    feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_np]
    loss_fn = _our_loss_fn(model, feats, tgts, n_aux)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd),
    )
    opt_state = tx.init(params)
    our_losses = []
    for _ in range(n_steps):
        total, grads = jax.value_and_grad(loss_fn)(params)
        our_losses.append(float(total))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    print("ref trajectory :", [f"{v:.5f}" for v in ref_losses])
    print("ours trajectory:", [f"{v:.5f}" for v in our_losses])
    # the loss must DECREASE on both sides and track step-for-step
    assert ref_losses[-1] < ref_losses[0]
    assert our_losses[-1] < our_losses[0]
    for i, (r, o) in enumerate(zip(ref_losses, our_losses)):
        tol = 1e-3 if i < 3 else 5e-3  # fp32 drift compounds with steps
        assert abs(o - r) / max(abs(r), 1e-6) < tol, (
            f"step {i}: ours {o:.6f} vs ref {r:.6f}"
        )
