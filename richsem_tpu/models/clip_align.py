"""CLIPAlign glue: text-embedding bank + frozen-teacher RoI targets.

Capability parity with the reference's ``CLIPAlign`` support machinery
(models/richsem/richsem.py:38-205) and the teacher RoI path
(richsem.py:479-555, 817-879), redesigned functionally:

* the **class text-embedding bank** is computed once per category set —
  81 prompt templates per class name, encoded by the frozen text tower and
  averaged (``set_total_text``, richsem.py:127-151; templates
  clip/utils.py) — and then *passed into* the train/eval step as an input
  instead of living as module state;
* **teacher targets**: the whole (CLIP-normalized) padded image runs
  through the frozen RN50 once per step; per-GT-box 7×7 RoI crops of the
  stride-32 map go through ``attnpool`` → per-box CLIP embedding → logits
  against the text bank (``_get_roi``/``clip_inference``,
  richsem.py:865-879, 521-555). All under stop_gradient.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.models.clip.model import CLIP, denorm_imagenet_to_clip
from richsem_tpu.models.clip.tokenizer import tokenize
from richsem_tpu.ops.roi_align import roi_align
from richsem_tpu.utils.boxes import box_cxcywh_to_xyxy

_TEMPLATE_PATH = os.path.join(os.path.dirname(__file__), "clip", "prompt_templates.txt")


def load_prompt_templates() -> Sequence[str]:
    with open(_TEMPLATE_PATH) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def build_text_embedding(
    clip_model: CLIP,
    clip_params,
    cats: Dict[int, dict],
    tokenizer,
    context_length: int = 77,
    batch_size: int = 256,
) -> jnp.ndarray:
    """→ [max_id+1, embed_dim] prompt-ensembled class text bank.

    Ids missing from ``cats`` encode as the literal 'none'
    (richsem.py:131-138). Averaged over all templates *before*
    normalization, like the reference.
    """
    templates = load_prompt_templates()
    max_id = max(cats.keys())
    names = [
        cats.get(i, {"name": "none"})["name"].replace("_", " ")
        for i in range(max_id + 1)
    ]

    encode = jax.jit(
        lambda tok: clip_model.apply(clip_params, tok, method=CLIP.encode_text)
    )
    acc = None
    for tpl in templates:
        texts = [tpl.format(n) if n != "none" else n for n in names]
        toks = tokenize(texts, tokenizer, context_length)
        embeds = []
        for s in range(0, len(toks), batch_size):
            chunk = toks[s : s + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, context_length), np.int32)])
            e = encode(jnp.asarray(chunk))
            embeds.append(np.asarray(e[: len(toks) - s if pad else batch_size]))
        emb = np.concatenate(embeds)[: len(toks)]
        acc = emb if acc is None else acc + emb
    return jnp.asarray(acc / len(templates))


def clip_spatial_features(clip_model: CLIP, clip_params, images: jnp.ndarray):
    """One frozen-teacher forward over the (CLIP-renormalized) padded image
    → the stride-32 pre-attnpool spatial map (the reference's
    ``self.clip_features``, richsem.py:614-629)."""
    images_clip = denorm_imagenet_to_clip(images)
    return clip_model.apply(
        clip_params, images_clip, True, method=CLIP.encode_image
    )  # [B, H/32, W/32, Dv]


def clip_teacher_box_targets(
    clip_model: CLIP,
    clip_params,
    images: jnp.ndarray,  # [B,H,W,3] ImageNet-normalized
    gt_boxes: jnp.ndarray,  # [B,G,4] normalized cxcywh
    sizes: jnp.ndarray,  # [B,2] valid (h, w) in the canvas
    text_embed: jnp.ndarray,  # [C, D]
    logit_scale: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,  # [B,G] bool
    max_boxes: Optional[int] = None,
    spatial: Optional[jnp.ndarray] = None,  # precomputed clip_spatial_features
):
    """→ (clip_embed [B,G,D] normalized, clip_logits [B,G,C]), stop-gradded.

    Boxes are denormalized by the image's *valid* size (the reference scales
    by ``t['size']``, richsem.py:744-768) into canvas pixel coords; the crop
    scale 1/32 matches the RN50 spatial map.

    When ``valid``/``max_boxes`` are given, the RoI+attnpool only runs on the
    first ``max_boxes`` *valid* slots (compacted to the front); outputs are
    scattered back to the full [B, G] layout with zeros in the untouched
    slots. The reference crops only the real boxes per image
    (richsem.py:744-768); with padded static targets (G=300 vs ~12 real LVIS
    GTs) the uncompacted path wastes ~25× of the teacher RoI compute.
    """
    if spatial is None:
        spatial = clip_spatial_features(clip_model, clip_params, images)
    b, g = gt_boxes.shape[:2]
    k = g if (valid is None or max_boxes is None) else min(int(max_boxes), g)
    sel = None
    boxes_k, valid_k = gt_boxes, valid
    if k < g:
        # stable partition: valid slots first, then take the first k
        order = jnp.argsort(~valid, axis=1, stable=True)  # [B, G]
        sel = order[:, :k]
        boxes_k = jnp.take_along_axis(gt_boxes, sel[..., None], axis=1)
        valid_k = jnp.take_along_axis(valid, sel, axis=1)
    h, w = sizes[:, 0], sizes[:, 1]
    scale = jnp.stack([w, h, w, h], -1).astype(jnp.float32)[:, None, :]
    boxes_xyxy = box_cxcywh_to_xyxy(boxes_k.astype(jnp.float32)) * scale
    # crop to the teacher's positional grid (224/32 = 7 for RN50) so the
    # attnpool positional table applies directly (richsem.py:865-879)
    grid = clip_model.cfg.image_resolution // 32
    crops = roi_align(
        spatial.astype(jnp.float32), boxes_xyxy, output_size=grid,
        spatial_scale=1.0 / 32.0,
        # detectron2-exact adaptive grid (reference: ROIAlign(…, 0,
        # aligned=True), richsem.py:878); free on the matmul path — and
        # only implemented there, so pin it (auto would pick gather on
        # maps beyond _MATMUL_MAX_GRID and raise at trace time)
        sampling_ratio=0,
        method="matmul",
    )  # [B, K, grid, grid, 2048]
    pooled = clip_model.apply(
        clip_params,
        crops.reshape(b * k, grid, grid, crops.shape[-1]),
        method=CLIP.attnpool,
    ).reshape(b, k, -1)
    from richsem_tpu.utils.misc import l2_normalize

    pooled = l2_normalize(pooled)
    t = l2_normalize(text_embed.astype(jnp.float32))
    logits = jnp.exp(logit_scale) * (pooled @ t.T)
    if valid_k is not None:
        pooled = pooled * valid_k[..., None]
        logits = logits * valid_k[..., None]
    clip_valid = jnp.ones((b, g), bool) if valid is None else valid
    if sel is not None:
        bidx = jnp.arange(b)[:, None]
        pooled = jnp.zeros((b, g, pooled.shape[-1]), pooled.dtype).at[
            bidx, sel
        ].set(pooled)
        logits = jnp.zeros((b, g, logits.shape[-1]), logits.dtype).at[
            bidx, sel
        ].set(logits)
        # which full-layout slots actually received a teacher target
        clip_valid = jnp.zeros((b, g), bool).at[bidx, sel].set(valid_k)
    return (
        jax.lax.stop_gradient(pooled),
        jax.lax.stop_gradient(logits),
        clip_valid,
    )


def clip_pseudo_labels(
    clip_logits: jnp.ndarray,  # [B,G,C] teacher logits at gt boxes
    gt_valid: jnp.ndarray,  # [B,G]
    threshold: float = 0.05,
):
    """Weak-label filter for extra data (richsem.py:631-670, static-shaped).

    The reference rewrites each extra image's target list to (box, class)
    pairs whose teacher softmax exceeds the threshold — a dynamic-size
    rewrite. Static version: keep one label per GT slot (the teacher's
    argmax class) and a keep-mask ``prob_max > threshold``; multi-label
    expansion beyond argmax is deferred to the padded free GT slots by the
    caller if desired.
    """
    probs = jax.nn.softmax(clip_logits, axis=-1)
    top = probs.max(-1)
    labels = probs.argmax(-1).astype(jnp.int32)
    keep = gt_valid & (top > threshold)
    return labels, keep


def clip_pseudo_labels_multi(
    clip_logits: jnp.ndarray,  # [B,G,C] teacher logits at gt boxes
    gt_boxes: jnp.ndarray,  # [B,G,4]
    gt_valid: jnp.ndarray,  # [B,G]
    threshold: float = 0.05,
    expand_topk: int = 4,
):
    """Multi-label pseudo-label expansion (richsem.py:631-670 parity).

    The reference rewrites each extra image's targets to ALL (box, class)
    pairs whose teacher softmax exceeds the threshold — one box can spawn
    several supervised pairs. Static-shape version: every valid gt slot
    proposes its top-``expand_topk`` classes; candidates are ranked so each
    slot's argmax outranks every runner-up, then runner-ups by probability;
    the top ``G`` candidates fill the (fixed-width) target slots. This
    reproduces the reference's expansion exactly whenever the number of
    above-threshold pairs fits the GT pad — beyond that, lowest-probability
    runner-ups are dropped (the pad already caps the reference's dynamic
    list on conversion).

    → (labels [B,G], boxes [B,G,4], keep [B,G], slot [B,G] — the source gt
    slot of each output pair, for permuting any per-slot side data such as
    the teacher distill targets).
    """
    b, g, _ = clip_logits.shape
    k = expand_topk
    probs = jax.nn.softmax(clip_logits.astype(jnp.float32), axis=-1)
    topp, topi = jax.lax.top_k(probs, k)  # [B,G,K]
    cand_valid = gt_valid[..., None] & (topp > threshold)
    is_argmax = jnp.arange(k) == 0
    score = jnp.where(cand_valid, topp + 2.0 * is_argmax, -jnp.inf)
    flat_score = score.reshape(b, g * k)
    _, sel = jax.lax.top_k(flat_score, g)  # [B,G] candidate ids
    slot = sel // k  # source gt slot of each selected candidate
    labels = jnp.take_along_axis(
        topi.reshape(b, g * k), sel, axis=1
    ).astype(jnp.int32)
    boxes = jnp.take_along_axis(gt_boxes, slot[..., None], axis=1)
    keep = jnp.take_along_axis(cand_valid.reshape(b, g * k), sel, axis=1)
    return labels, boxes, keep, slot
