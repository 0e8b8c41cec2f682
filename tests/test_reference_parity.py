"""Logit-level parity vs the reference detector (VERDICT round-1 item #5).

The reference transformer core (input projections → deformable encoder →
two-stage selection → decoder with iterative refinement → class/box heads →
interm outputs) runs on CPU torch via its own pure-torch deformable-attention
oracle; identical backbone features + converted weights must produce the
same boxes and logits from our flax stack (closed-vocab, enc_cls_agn — the
only configuration whose reference modules are importable without CLIP/
torchvision/detectron2; see tests/reference_harness.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_harness import (  # noqa: E402
    build_reference_detector,
    make_args,
    reference_forward,
)

B, H, W = 2, 64, 64
NUM_CLASSES = 24
BACKBONE_CH = (512, 1024, 2048)


@pytest.fixture(scope="module")
def reference_outputs():
    args = make_args()
    tf, input_projs, class_embed, pos_module = build_reference_detector(
        args, NUM_CLASSES, BACKBONE_CH, seed=0
    )
    tf.eval()
    rng = np.random.default_rng(0)
    feats_np = [
        rng.normal(size=(B, ch, H // s, W // s)).astype(np.float32)
        for ch, s in zip(BACKBONE_CH, (8, 16, 32))
    ]
    mask = torch.zeros((B, H // 8 * 8 // 8, W // 8), dtype=torch.bool)
    # mask at stride-8 resolution is what interpolate sees; build per level
    mask = torch.zeros((B, H // 8, W // 8), dtype=torch.bool)
    with torch.no_grad():
        out = reference_forward(
            tf, input_projs, class_embed, pos_module,
            [torch.from_numpy(f) for f in feats_np], mask,
        )

    # assemble a reference-named state dict (what richsem_r50_2x.pth holds)
    sd = {f"transformer.{k}": v for k, v in tf.state_dict().items()}
    for i, proj in enumerate(input_projs):
        sd.update({f"input_proj.{i}.{k}": v for k, v in proj.state_dict().items()})
    sd.update({f"class_embed.0.{k}": v for k, v in class_embed.state_dict().items()})
    bbox_embed = tf.decoder.bbox_embed[0]
    sd.update({f"bbox_embed.0.{k}": v for k, v in bbox_embed.state_dict().items()})
    return args, sd, feats_np, out


def _flax_outputs(args, sd, feats_np):
    import jax
    import jax.numpy as jnp

    from richsem_tpu.models.dino import DINO, DINOConfig
    from tools.convert_detector import convert_detector

    cfg = DINOConfig(
        num_classes=NUM_CLASSES, hidden_dim=args.hidden_dim,
        nheads=args.nheads, enc_layers=args.enc_layers,
        dec_layers=args.dec_layers, dim_feedforward=args.dim_feedforward,
        num_queries=args.num_queries,
        num_feature_levels=args.num_feature_levels,
        enc_n_points=args.enc_n_points, dec_n_points=args.dec_n_points,
        use_language=False, enc_cls_agn=True, dn_labelbook_reuse_cls=True,
    )
    model = DINO(cfg)
    feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_np]
    pad_mask = jnp.zeros((B, H, W), bool)
    init_params = jax.eval_shape(
        lambda k: model.init(k, feats, pad_mask, method=DINO.detect),
        jax.random.PRNGKey(0),
    )
    converted = convert_detector(
        sd, enc_layers=args.enc_layers, dec_layers=args.dec_layers,
        nheads=args.nheads, num_feature_levels=args.num_feature_levels,
    )
    # the converted tree must cover the init tree exactly (no missing or
    # stray leaves) — this is also the converter's structural test
    want = jax.tree_util.tree_flatten_with_path(init_params)[0]
    got = {jax.tree_util.keystr(p): v for p, v in
           jax.tree_util.tree_flatten_with_path({"params": converted})[0]}
    missing = [jax.tree_util.keystr(p) for p, _ in want if
               jax.tree_util.keystr(p) not in got]
    assert not missing, f"converter missing leaves: {missing[:8]}"
    for p, v in want:
        k = jax.tree_util.keystr(p)
        assert tuple(got[k].shape) == tuple(v.shape), (
            f"{k}: {got[k].shape} != {v.shape}"
        )
    extra = [k for k in got if k not in {jax.tree_util.keystr(p) for p, _ in want}]
    assert not extra, f"converter stray leaves: {extra[:8]}"
    out = model.apply(
        {"params": converted["params"] if "params" in converted else converted},
        feats, pad_mask, method=DINO.detect, train=False,
    )
    return jax.device_get(out)


def test_full_detector_parity(reference_outputs):
    args, sd, feats_np, ref = reference_outputs
    ours = _flax_outputs(args, sd, feats_np)

    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]), ref["pred_boxes"],
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]), ref["pred_logits"],
        rtol=1e-3, atol=5e-4,
    )
    for lid, (cl, bx) in enumerate(ref["aux"]):
        np.testing.assert_allclose(
            np.asarray(ours["aux_outputs"][lid]["pred_boxes"]), bx,
            rtol=1e-3, atol=2e-4, err_msg=f"aux boxes {lid}",
        )
        np.testing.assert_allclose(
            np.asarray(ours["aux_outputs"][lid]["pred_logits"]), cl,
            rtol=1e-3, atol=5e-4, err_msg=f"aux logits {lid}",
        )
    np.testing.assert_allclose(
        np.asarray(ours["interm_outputs"]["pred_logits"]),
        ref["interm_logits"], rtol=1e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["interm_outputs"]["pred_boxes"]),
        ref["interm_boxes"], rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["interm_outputs_for_matching_pre"]["pred_boxes"]),
        ref["init_box_proposal"], rtol=1e-3, atol=2e-4,
    )
