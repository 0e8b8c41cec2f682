"""DINO deformable-DETR detector (flax.linen), the framework's flagship model.

A TPU-first re-design of the reference detector
(models/richsem/richsem.py:207-887 ``DINO`` +
models/richsem/deformable_transformer.py ``DeformableTransformer``):

* One functional module owns the whole compute graph — backbone, 4-scale
  input projections (richsem.py:294-317), 6-layer deformable encoder
  (deformable_transformer.py:470-618), two-stage 'standard' query selection
  (:347-393), 6-layer decoder with iterative box refinement (:693-823) —
  so parameter sharing (the decoder-shared box MLP also refining inside the
  decoder loop) is plain attribute reuse instead of the reference's
  post-hoc module grafting (richsem.py:370-382).
* Everything is static-shaped: padding masks ride along as booleans; the
  contrastive-denoising queries arrive as fixed-width tensors prepared by
  :mod:`richsem_tpu.models.dn` and are split off the outputs statically
  (the reference's ``dn_post_process``, dn_components.py:196-210).
* Class head is pluggable: a closed-vocab linear classifier
  (``use_language=False``, richsem.py:352-354) or the CLIP text-embedding
  dot product (``CLIPAlign.forward_hs``, richsem.py:191-205) where the text
  embedding bank is an explicit *input* — computed once outside the train
  step, not module state.
* Mixed precision: matmul-heavy submodules run in ``compute_dtype``
  (bfloat16 on TPU); layer norms, attention-weight softmaxes, sampling
  locations and box arithmetic stay float32.

Output dict (training):
  ``pred_logits [B,nq,C]``, ``pred_boxes [B,nq,4]`` (final layer),
  ``aux_outputs`` (first 5 decoder layers), ``interm_outputs`` (encoder
  two-stage head), ``interm_outputs_for_matching_pre`` (same logits, initial
  proposals), ``dn_*`` (denoising split, when DN queries are given),
  ``pred_clip_embed`` (distillation projection, when enabled).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from richsem_tpu.models.layers import FFN, MLP, InputProj, MSDeformAttn
from richsem_tpu.models.resnet import ResNet
from richsem_tpu.ops.position_encoding import (
    gen_sineembed_for_position,
    sine_position_embedding,
)
from richsem_tpu.models.transformer_utils import (
    encoder_reference_points,
    flatten_levels,
    gen_encoder_output_proposals,
)
from richsem_tpu.utils.misc import (
    inverse_sigmoid,
    l2_normalize,
    resize_mask,
    valid_ratios,
)


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    """Static architecture knobs (values mirror configs/richsem/*)."""

    num_classes: int = 1204
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.0
    activation: str = "relu"
    num_queries: int = 900
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    backbone: str = "resnet50"
    return_strides: Tuple[int, ...] = (8, 16, 32)
    pe_temperature_h: float = 20.0
    pe_temperature_w: float = 20.0
    # two-stage
    two_stage_type: str = "standard"
    embed_init_tgt: bool = True
    # class head
    use_language: bool = False
    clip_embed_dim: int = 1024  # CLIP RN50 text/visual joint dim
    use_cls_mlp_proj: bool = True
    use_mlp_proj: bool = False
    use_visual_distill: bool = False
    # semantic-branch extras (richsem.py)
    two_stage_cls: bool = False  # add detached clip-prob logits (richsem.py:727-731)
    distill_aux_layers: bool = False  # distill every decoder layer (richsem.py:776-784)
    use_clip_visual_query: bool = False  # content queries from CLIP RoIs (richsem.py:835-854)
    share_vl_proj: bool = False  # one shared MLP for cls+distill proj (richsem.py:64-72)
    enc_cls_agn: bool = False  # class-agnostic encoder head (richsem.py:408-410)
    # dn
    dn_labelbook_size: int = 1204
    dn_labelbook_reuse_cls: bool = True
    # precision / memory / kernels
    compute_dtype: Any = jnp.float32
    use_checkpoint: bool = False  # remat encoder/decoder layers
    # selective encoder remat: persist only the msda kernel output per
    # layer, recompute the cheap value/offset/attention projections in the
    # backward (see setup). Frees ~2 GB at bs2 for ~25 ms/step; off by
    # default on v5e (bs2 fits without it; bs4 fits WITH it + backbone_remat
    # but measured 1.9 img/s vs 3.7 at bs2 — the scheduler pays far more
    # than the batch amortizes at the HBM wall). Turn both on for larger
    # batches on bigger-HBM parts.
    enc_selective_remat: bool = False
    backbone_remat: bool = False  # recompute backbone activations in bwd
    # (enc_stream_bf16 — a bf16 encoder residual stream — was RETIRED in
    # round 5: measured +0.6% (inside the noise band), convergence-
    # equivalent in the A/B harness, and redundant once the fused tail
    # removed the same LN/FFN stream traffic without a numerics change.)
    # Fused Pallas encoder tail (residual+LN1 -> FFN -> LN2 in VMEM,
    # ops/fused_ffn.py). Identical math to the flax composition; TPU only
    # (CPU runs the XLA composition with the same param tree).
    enc_fused_tail: bool = True
    # encoder deformable attention: gather | patch | tiled | pallas2
    # ('pallas' v1 retired round 5 — alias routes to pallas2)
    msda_impl: str = "gather"
    # decoder cross-attention: gather | patch | sep | sep_pallas
    dec_msda_impl: str = "sep"
    msda_margin: int = 8
    msda_tile: Tuple[int, int] = (16, 16)
    msda_clamp_offsets: bool = True  # bound offsets to ±(margin−0.5); see layers.py
    masks: bool = False  # instance segmentation heads (DETRsegm parity)
    mask_head_type: str = "detr"  # 'detr' (DETRsegm) | 'cond_inst' (cond_inst.py)

    @classmethod
    def from_config(cls, cfg) -> "DINOConfig":
        compute_dtype = {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
        }[getattr(cfg, "compute_dtype", "float32")]
        # Declared-but-unsupported knobs must fail loudly, never silently
        # no-op (rare variants the shipped reference configs never enable).
        _unsupported = {
            "num_patterns": lambda v: v not in (0, None),
            "dec_layer_number": lambda v: v is not None,
            "decoder_sa_type": lambda v: v not in ("sa", None),
            "two_stage_keep_all_tokens": bool,
            "two_stage_learn_wh": bool,
            "two_stage_pat_embed": lambda v: v not in (0, None),
            "two_stage_add_query_num": lambda v: v not in (0, None),
            "random_refpoints_xy": bool,
            "decoder_layer_noise": bool,
        }
        for key, is_set in _unsupported.items():
            if key in cfg and is_set(cfg[key]):
                raise NotImplementedError(
                    f"config knob {key!r}={cfg[key]!r} is not implemented in "
                    "richsem_tpu (rare reference variant; see PARITY.md)"
                )
        if getattr(cfg, "use_clip_visual_query", False) and not cfg.use_language:
            raise NotImplementedError(
                "use_clip_visual_query requires use_language=True"
            )
        # dn_number < 50 selects the reference's group-count CDN semantics
        # (dn_components.py:27-39): implemented since round 5 in
        # models/dn.py (prepare_cdn(group_mode=True), engine.py routes it);
        # the static DN pad is then 4·dn_number·max_gt_per_image. Tests can
        # still force budget semantics at small budgets (dn_force_budget).
        if getattr(cfg, "use_clip_visual_query", False) and not cfg.use_visual_distill:
            # the CLIP spatial map the query crop reads only exists on the
            # distill path (richsem.py:614-629) — without it the knob would
            # silently no-op in training
            raise NotImplementedError(
                "use_clip_visual_query requires use_visual_distill=True "
                "(the teacher spatial map is computed on the distill path)"
            )
        return cls(
            num_classes=cfg.num_classes,
            hidden_dim=cfg.hidden_dim,
            nheads=cfg.nheads,
            enc_layers=cfg.enc_layers,
            dec_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            activation=cfg.transformer_activation,
            num_queries=cfg.num_queries,
            num_feature_levels=cfg.num_feature_levels,
            enc_n_points=cfg.enc_n_points,
            dec_n_points=cfg.dec_n_points,
            backbone=cfg.backbone,
            pe_temperature_h=cfg.pe_temperatureH,
            pe_temperature_w=cfg.pe_temperatureW,
            two_stage_type=cfg.two_stage_type,
            embed_init_tgt=cfg.embed_init_tgt,
            use_language=cfg.use_language,
            use_cls_mlp_proj=cfg.use_cls_mlp_proj,
            use_mlp_proj=cfg.use_mlp_proj,
            use_visual_distill=cfg.use_visual_distill,
            # the reference gates two_stage_cls on the distill branch
            # (richsem.py:346)
            two_stage_cls=bool(
                getattr(cfg, "two_stage_cls", False)
                and cfg.use_visual_distill
            ),
            distill_aux_layers=getattr(cfg, "distill_aux_layers", False),
            # joint text/visual dim follows the teacher tower (RN50 → 1024,
            # ViT-B/32 → 512) unless set explicitly (tiny test teachers)
            clip_embed_dim=getattr(
                cfg, "clip_embed_dim",
                512 if getattr(cfg, "clip_model", "RN50") == "ViT-B/32"
                else 1024,
            ),
            use_clip_visual_query=getattr(cfg, "use_clip_visual_query", False),
            share_vl_proj=getattr(cfg, "share_vl_proj", False),
            enc_cls_agn=getattr(cfg, "enc_cls_agn", False),
            dn_labelbook_size=cfg.dn_labelbook_size,
            dn_labelbook_reuse_cls=cfg.dn_labelbook_reuse_cls,
            compute_dtype=compute_dtype,
            use_checkpoint=getattr(cfg, "use_checkpoint", False),
            enc_selective_remat=getattr(cfg, "enc_selective_remat", False),
            backbone_remat=getattr(cfg, "backbone_remat", False),
            enc_fused_tail=getattr(cfg, "enc_fused_tail", True),
            msda_impl=getattr(cfg, "msda_impl", "gather"),
            dec_msda_impl=getattr(cfg, "dec_msda_impl", "sep"),
            msda_margin=getattr(cfg, "msda_margin", 8),
            msda_tile=tuple(getattr(cfg, "msda_tile", (16, 16))),
            msda_clamp_offsets=getattr(cfg, "msda_clamp_offsets", True),
            masks=getattr(cfg, "masks", False),
            mask_head_type=getattr(cfg, "mask_head_type", "detr"),
        )


_CLS_BIAS = -math.log((1 - 0.01) / 0.01)  # focal prior, richsem.py:332-334


class _LNParams(nn.Module):
    """Declares LayerNorm params (same names/inits as nn.LayerNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Declares Dense params (same names/inits as nn.Dense)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.in_dim, self.out_dim),
            ),
            self.param("bias", nn.initializers.zeros, (self.out_dim,)),
        )


class _FFNParams(nn.Module):
    """Declares the FFN module's param tree (linear1/linear2/norm)."""

    d_model: int
    d_ffn: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.d_model, self.d_ffn, name="linear1")()
        w2, b2 = _DenseParams(self.d_ffn, self.d_model, name="linear2")()
        s, b = _LNParams(self.d_model, name="norm")()
        return w1, b1, w2, b2, s, b


class DeformableEncoderLayer(nn.Module):
    cfg: DINOConfig

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, pad_mask,
                 deterministic=True):
        c = self.cfg
        attn_out = MSDeformAttn(
            d_model=c.hidden_dim, n_levels=c.num_feature_levels,
            n_heads=c.nheads, n_points=c.enc_n_points,
            compute_dtype=c.compute_dtype, impl=c.msda_impl,
            tiled_margin=c.msda_margin, tiled_tile=c.msda_tile,
            clamp_offsets=c.msda_clamp_offsets,
            name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes, pad_mask)
        attn_out = nn.Dropout(c.dropout)(attn_out, deterministic=deterministic)
        if c.activation != "relu" or (c.dropout > 0.0 and not deterministic):
            # knob variants keep the flax-module tail
            src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn_out)
            return FFN(
                d_model=c.hidden_dim, d_ffn=c.dim_feedforward,
                dropout=c.dropout, activation=c.activation,
                compute_dtype=c.compute_dtype, name="ffn",
            )(src, deterministic=deterministic)
        # Default f32-stream tail: residual+LN1 -> FFN -> residual+LN2 in
        # one Pallas kernel (the [N, d_ffn] hidden never leaves VMEM; the
        # backward recomputes it per block — ops/fused_ffn.py). Params are
        # declared through holder modules with the exact names/inits of the
        # flax composition, so checkpoints and converters are unaffected.
        from richsem_tpu.ops.fused_ffn import (
            fused_encoder_tail,
            xla_encoder_tail,
        )

        s1, sb1 = _LNParams(c.hidden_dim, name="norm1")()
        w1, b1, w2, b2, s2, sb2 = _FFNParams(
            c.hidden_dim, c.dim_feedforward, name="ffn"
        )()
        fn = (
            fused_encoder_tail
            if c.enc_fused_tail and jax.default_backend() == "tpu"
            else xla_encoder_tail
        )
        b, s_len, d = src.shape
        y = fn(
            src.astype(jnp.float32).reshape(b * s_len, d),
            attn_out.astype(jnp.float32).reshape(b * s_len, d),
            w1, b1, w2, b2, s1, sb1, s2, sb2, 1e-5, c.compute_dtype,
        )
        return y.reshape(b, s_len, d)


class DeformableDecoderLayer(nn.Module):
    """self-attn → deformable cross-attn → FFN (decoder_module_seq default)."""

    cfg: DINOConfig

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points_input, memory,
                 spatial_shapes, memory_pad_mask, self_attn_mask=None,
                 deterministic=True):
        c = self.cfg
        # --- self attention (masked for DN group isolation) ---
        q = k = tgt + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=c.nheads, qkv_features=c.hidden_dim,
            dropout_rate=c.dropout, deterministic=deterministic,
            dtype=c.compute_dtype, name="self_attn",
        )(inputs_q=q, inputs_k=k, inputs_v=tgt, mask=self_attn_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + sa)
        # --- deformable cross attention ---
        ca = MSDeformAttn(
            d_model=c.hidden_dim, n_levels=c.num_feature_levels,
            n_heads=c.nheads, n_points=c.dec_n_points,
            compute_dtype=c.compute_dtype, impl=c.dec_msda_impl,
            name="cross_attn",
        )(tgt + query_pos, reference_points_input, memory, spatial_shapes,
          memory_pad_mask)
        ca = nn.Dropout(c.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + ca)
        # --- ffn ---
        return FFN(
            d_model=c.hidden_dim, d_ffn=c.dim_feedforward, dropout=c.dropout,
            activation=c.activation, compute_dtype=c.compute_dtype, name="ffn",
        )(tgt, deterministic=deterministic)


class ClipAlignHead(nn.Module):
    """Open-vocab classifier: CLIP text dot-product (CLIPAlign semantics).

    Mirrors CLIPAlign.forward_hs (richsem.py:191-205): project query
    features into the CLIP joint space (``dino_visual_proj`` — a 4-layer MLP
    when ``use_cls_mlp_proj & use_mlp_proj``, else a bias-free linear,
    richsem.py:100-112), L2-normalize both sides, scale by exp(logit_scale)
    (frozen at the CLIP value via the optimizer mask, richsem.py:92-95).
    """

    cfg: DINOConfig
    use_mlp: bool = False
    shared_proj: Optional[nn.Module] = None  # share_vl_proj (richsem.py:64-72)

    @nn.compact
    def __call__(self, hs: jnp.ndarray, text_embed: jnp.ndarray,
                 logit_scale: jnp.ndarray):
        c = self.cfg
        ld = c.clip_embed_dim
        init = nn.initializers.normal(ld**-0.5)
        if self.shared_proj is not None:
            v = self.shared_proj(hs)
        elif self.use_mlp:
            v = MLP(c.hidden_dim, ld, 4, last_kernel_init=init,
                    last_bias_init=nn.initializers.zeros,
                    name="dino_visual_proj")(hs)
        else:
            v = nn.Dense(ld, use_bias=False, kernel_init=init,
                         name="dino_visual_proj")(hs)
        v = l2_normalize(v.astype(jnp.float32))
        t = l2_normalize(text_embed.astype(jnp.float32))
        # the [.., l_dim] @ [C, l_dim]^T dot rides the MXU in compute_dtype
        # with f32 accumulation (mixed-precision policy: normalize stats in
        # f32, matmuls in compute_dtype — an f32 dot runs at 1/8 MXU rate
        # and this head spans 50k tokens on the two-stage selection path)
        cd = c.compute_dtype
        logits = jax.lax.dot_general(
            v.astype(cd), t.astype(cd),
            dimension_numbers=(((v.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.exp(logit_scale) * logits


class DINO(nn.Module):
    cfg: DINOConfig

    def setup(self):
        c = self.cfg
        if c.backbone in ("resnet50", "resnet101"):
            blocks = (3, 4, 6, 3) if c.backbone == "resnet50" else (3, 4, 23, 3)
            # backbone remat: recompute the ~1.2 GB of conv activations in
            # the backward instead of persisting them — one extra backbone
            # forward (~7 ms at bs2) buys the HBM headroom larger batches
            # need (the frozen-BN ResNet is pure convs; XLA refuses nothing)
            bb_cls = nn.remat(ResNet) if c.backbone_remat else ResNet
            self.backbone = bb_cls(
                block_counts=blocks, return_strides=c.return_strides,
                dtype=c.compute_dtype, name="backbone",
            )
            n_backbone = len(c.return_strides)
        elif c.backbone.startswith("swin"):
            import dataclasses

            from richsem_tpu.models.swin import SwinConfig, SwinTransformer

            self.backbone = SwinTransformer(
                dataclasses.replace(
                    SwinConfig.variant(c.backbone), dtype=c.compute_dtype
                ),
                name="backbone",
            )
            n_backbone = 3
        elif c.backbone.startswith("convnext"):
            import dataclasses

            from richsem_tpu.models.convnext import ConvNeXt, ConvNeXtConfig

            self.backbone = ConvNeXt(
                dataclasses.replace(
                    ConvNeXtConfig.variant(c.backbone), dtype=c.compute_dtype
                ),
                name="backbone",
            )
            n_backbone = 3
        elif c.backbone.startswith("focalnet"):
            import dataclasses

            from richsem_tpu.models.focalnet import FocalNet, FocalNetConfig

            self.backbone = FocalNet(
                dataclasses.replace(
                    FocalNetConfig.variant(c.backbone), dtype=c.compute_dtype
                ),
                name="backbone",
            )
            n_backbone = 3
        else:
            raise NotImplementedError(c.backbone)
        self.input_projs = [
            InputProj(c.hidden_dim, extra_level=(i >= n_backbone),
                      dtype=c.compute_dtype, name=f"input_proj{i}")
            for i in range(c.num_feature_levels)
        ]
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (c.num_feature_levels, c.hidden_dim),
        )
        enc_cls, dec_cls = DeformableEncoderLayer, DeformableDecoderLayer
        if not c.use_checkpoint and c.enc_selective_remat:
            # Selective remat (default): per encoder layer, persist ONLY the
            # msda kernel output (named in MSDeformAttn) + the layer inputs;
            # the backward recomputes the value/offset/attention projections,
            # softmax, sampling grid and the FFN mid activations (<1 ms of
            # MXU work) instead of holding ~700 MB/layer of residuals. The
            # kernel fwd itself is NOT re-run: its output is the named save.
            # This is what lets bs4 fit in v5e HBM (bs3+ OOMs without it).
            enc_cls = nn.remat(
                DeformableEncoderLayer, static_argnums=(4, 6),
                # always called under jit, where the CSE barrier is
                # unnecessary and blocks cross-layer fusion
                prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "msda_out"
                ),
            )
        if c.use_checkpoint:
            # rematerialize per layer: trade recompute for HBM (the
            # reference's `use_checkpoint` knob, backbone.py:195).
            # dots_saveable keeps matmul outputs (small) so the backward only
            # rebuilds the cheap elementwise/window tensors.
            enc_cls = nn.remat(
                DeformableEncoderLayer, static_argnums=(4, 6),
                policy=jax.checkpoint_policies.dots_saveable,
            )
            dec_cls = nn.remat(
                DeformableDecoderLayer, static_argnums=(5, 8),
                policy=jax.checkpoint_policies.dots_saveable,
            )
        self.encoder_layers = [
            enc_cls(c, name=f"encoder_layer{i}") for i in range(c.enc_layers)
        ]
        self.decoder_layers = [
            dec_cls(c, name=f"decoder_layer{i}") for i in range(c.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        # two-stage machinery
        self.enc_output = nn.Dense(c.hidden_dim, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (c.num_queries, c.hidden_dim),
        )
        self.ref_point_head = MLP(c.hidden_dim, c.hidden_dim, 2,
                                  name="ref_point_head")
        # shared decoder box head (dec_pred_bbox_embed_share=True) with
        # zero-init final layer (richsem.py:330-335)
        self.bbox_embed = MLP(
            c.hidden_dim, 4, 3,
            last_kernel_init=nn.initializers.zeros,
            last_bias_init=nn.initializers.zeros,
            name="bbox_embed",
        )
        # separate encoder-output box head (two_stage_bbox_embed_share=False)
        self.enc_out_bbox_embed = MLP(
            c.hidden_dim, 4, 3,
            last_kernel_init=nn.initializers.zeros,
            last_bias_init=nn.initializers.zeros,
            name="enc_out_bbox_embed",
        )
        # shared decoder class head (dec_pred_class_embed_share=True);
        # separate encoder-output class head (two_stage_class_embed_share=False)
        self.vl_proj = None
        if c.share_vl_proj and (c.use_language or c.use_visual_distill):
            # one 4-layer MLP serves as BOTH the classifier projection and
            # the distill projection (richsem.py:64-72)
            self.vl_proj = MLP(
                c.hidden_dim, c.clip_embed_dim, 4,
                last_kernel_init=nn.initializers.normal(c.clip_embed_dim**-0.5),
                last_bias_init=nn.initializers.zeros,
                name="vl_proj",
            )
        if c.use_language:
            self.class_embed = ClipAlignHead(
                c, use_mlp=c.use_cls_mlp_proj and c.use_mlp_proj,
                shared_proj=self.vl_proj, name="class_embed")
            if c.enc_cls_agn:
                # class-agnostic objectness: a plain linear head replaces the
                # CLIP dot product for the encoder output (richsem.py:408-410)
                self.enc_cls_kernel = self.param(
                    "enc_cls_kernel", nn.initializers.lecun_normal(),
                    (c.hidden_dim, c.num_classes))
                self.enc_cls_bias = self.param(
                    "enc_cls_bias", nn.initializers.constant(_CLS_BIAS),
                    (c.num_classes,))
            else:
                self.enc_out_class_embed = ClipAlignHead(
                    c, use_mlp=False, name="enc_out_class_embed")
        if c.use_language or c.use_visual_distill:
            # CLIP's temperature, frozen at its pretrained value via the
            # optimizer mask (richsem.py:92-95)
            self.logit_scale = self.param(
                "logit_scale",
                nn.initializers.constant(math.log(1 / 0.07)), ())
        else:
            # explicit kernel/bias so the DN label encoder can tie to them
            # (dn_labelbook_reuse_cls, richsem.py:386-395)
            self.cls_kernel = self.param(
                "cls_kernel", nn.initializers.lecun_normal(),
                (c.hidden_dim, c.num_classes))
            self.cls_bias = self.param(
                "cls_bias", nn.initializers.constant(_CLS_BIAS),
                (c.num_classes,))
            self.enc_cls_kernel = self.param(
                "enc_cls_kernel", nn.initializers.lecun_normal(),
                (c.hidden_dim, c.num_classes))
            self.enc_cls_bias = self.param(
                "enc_cls_bias", nn.initializers.constant(_CLS_BIAS),
                (c.num_classes,))
        if not c.dn_labelbook_reuse_cls:
            self.label_enc_table = self.param(
                "label_enc", nn.initializers.normal(1.0),
                (c.dn_labelbook_size + 1, c.hidden_dim),
            )
        elif c.use_language:
            # label_proj maps CLIP text embeds → hidden (richsem.py:120-122)
            self.label_proj = nn.Dense(
                c.hidden_dim, use_bias=False,
                kernel_init=nn.initializers.normal(c.clip_embed_dim**-0.5),
                name="label_proj",
            )
        if c.masks and c.mask_head_type == "cond_inst":
            from richsem_tpu.models.cond_inst import CondInstHead

            self.cond_inst = CondInstHead(c.hidden_dim, name="cond_inst")
        elif c.masks:
            from richsem_tpu.models.segmentation import (
                MaskHeadSmallConv,
                MHAttentionMap,
            )

            self.mask_attention = MHAttentionMap(
                c.hidden_dim, c.nheads, name="mask_attention")
            self.mask_head = MaskHeadSmallConv(
                c.hidden_dim, c.nheads, name="mask_head")
        if c.use_visual_distill:
            if c.share_vl_proj:
                self.clip_visual_proj = self.vl_proj
            else:
                init = nn.initializers.normal(c.clip_embed_dim**-0.5)
                if c.use_mlp_proj:
                    self.clip_visual_proj = MLP(
                        c.hidden_dim, c.clip_embed_dim, 4,
                        last_kernel_init=init, name="clip_visual_proj")
                else:
                    self.clip_visual_proj = nn.Dense(
                        c.clip_embed_dim, use_bias=False, kernel_init=init,
                        name="clip_visual_proj")
        if c.use_clip_visual_query:
            # box2clip_query (richsem.py:835-854): decoder content queries
            # become projected CLIP RoI features. The reference routes the
            # 1×1 RoI crop through CLIPAlign.label_proj, which only
            # dimension-checks for the ViT tower (the RN50 spatial map is
            # 2048-d pre-attnpool vs label_proj's l_dim input); a dedicated
            # input-dim-agnostic projection makes the knob live for both.
            self.clip_query_proj = nn.Dense(
                c.hidden_dim, use_bias=False, name="clip_query_proj")

    # ------------------------------------------------------------------
    def _class_logits(self, h, text_embed, enc: bool = False):
        c = self.cfg
        if c.use_language and not (enc and c.enc_cls_agn):
            head = self.enc_out_class_embed if enc else self.class_embed
            return head(h, text_embed, self.logit_scale)
        k = self.enc_cls_kernel if enc else self.cls_kernel
        bias = self.enc_cls_bias if enc else self.cls_bias
        return h.astype(jnp.float32) @ k + bias

    def encode_dn_labels(
        self, labels: jnp.ndarray, text_embed: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """DN label → content embedding.

        Three reference modes (richsem.py:386-395): a dedicated embedding
        table; reuse of the classifier weights (closed-vocab); or
        label_proj(text_embed) (open-vocab).
        """
        c = self.cfg
        inactive = labels < 0  # −1 slots get zero content (the reference's
        # zero padding_label, dn_components.py:133-141)
        safe = jnp.clip(labels, 0)
        if not c.dn_labelbook_reuse_cls:
            emb = self.label_enc_table[jnp.clip(safe, 0, c.dn_labelbook_size)]
        elif c.use_language:
            table = self.label_proj(text_embed)  # [C, hidden]
            emb = table[jnp.clip(safe, 0, c.num_classes - 1)]
        else:
            # reuse the linear classifier weights: kernel [hidden,C] → [C,hidden]
            emb = self.cls_kernel.T[jnp.clip(safe, 0, c.num_classes - 1)]
        return jnp.where(inactive[..., None], 0.0, emb)

    # ------------------------------------------------------------------
    def __call__(
        self,
        images: jnp.ndarray,  # [B, H, W, 3] normalized
        pad_mask: jnp.ndarray,  # [B, H, W] True on padding
        dn_labels: Optional[jnp.ndarray] = None,  # [B, Ndn] int32
        dn_boxes_unsig: Optional[jnp.ndarray] = None,  # [B, Ndn, 4]
        dn_attn_mask: Optional[jnp.ndarray] = None,  # [B, QT, QT] True=attend
        text_embed: Optional[jnp.ndarray] = None,  # [C, l_dim]
        clip_features: Optional[jnp.ndarray] = None,  # [B, h32, w32, Dv]
        train: bool = False,
    ) -> Dict[str, Any]:
        feats = self.backbone(images.astype(self.cfg.compute_dtype))
        return self.detect(
            feats, pad_mask, dn_labels=dn_labels,
            dn_boxes_unsig=dn_boxes_unsig, dn_attn_mask=dn_attn_mask,
            text_embed=text_embed, clip_features=clip_features, train=train,
        )

    def detect(
        self,
        feats: Sequence[jnp.ndarray],  # backbone maps [B, H/s, W/s, C_s]
        pad_mask: jnp.ndarray,
        dn_labels: Optional[jnp.ndarray] = None,
        dn_boxes_unsig: Optional[jnp.ndarray] = None,
        dn_attn_mask: Optional[jnp.ndarray] = None,
        text_embed: Optional[jnp.ndarray] = None,
        clip_features: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        """Detector head from backbone features — the reference's
        input_proj → transformer → heads span (richsem.py:593-811). Split
        out so parity tests can feed identical features to both stacks."""
        c = self.cfg
        b = pad_mask.shape[0]
        deterministic = not train or c.dropout == 0.0

        # ---- projections ----------------------------------------------
        srcs = [proj(f) for proj, f in zip(self.input_projs, feats)]
        for i in range(len(feats), c.num_feature_levels):
            srcs.append(self.input_projs[i](srcs[-1] if i > len(feats) else feats[-1]))
        masks = [resize_mask(pad_mask, s.shape[1:3]) for s in srcs]
        poss = [
            sine_position_embedding(
                m, c.hidden_dim // 2, c.pe_temperature_h, c.pe_temperature_w
            )
            for m in masks
        ]

        src_flat, mask_flat, pos_flat, spatial_shapes = flatten_levels(
            srcs, masks, poss, self.level_embed
        )
        src_flat = src_flat.astype(jnp.float32)
        # per-level valid ratios (reference computes per level-mask)
        vr = jnp.stack([valid_ratios(m) for m in masks], axis=1)  # [B, L, 2]

        # ---- encoder ---------------------------------------------------
        enc_ref = encoder_reference_points(spatial_shapes, vr)
        memory = src_flat
        for layer in self.encoder_layers:
            memory = layer(memory, pos_flat, enc_ref, spatial_shapes,
                           mask_flat, deterministic)

        # ---- two-stage query selection ----------------------------------
        out: Dict[str, Any] = {}
        if c.two_stage_type != "standard":
            raise NotImplementedError(c.two_stage_type)
        out_memory, out_props_unsig, prop_valid = gen_encoder_output_proposals(
            memory, mask_flat, spatial_shapes
        )
        out_memory = self.enc_output_norm(self.enc_output(out_memory))
        # top-k proposals by max class logit; invalid proposals excluded.
        # The full-[S,C] logits exist for SELECTION only (top_k is not
        # differentiated), so they live under stop_gradient: the interm
        # loss logits/coords are recomputed below on the 900 gathered
        # features — identical math (the heads are per-position, so they
        # commute with the gather) but the backward scatters [nq,256] into
        # S positions instead of [S,1203]+[S,4], and the class-head dW
        # matmul shrinks S/nq ≈ 28x.
        topk_scores = jnp.where(
            prop_valid,
            jax.lax.stop_gradient(
                self._class_logits(out_memory, text_embed, enc=True)
            ).max(-1),
            -jnp.inf,
        )
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)  # [B, nq]
        gather = lambda x: jnp.take_along_axis(
            x, topk_idx[..., None], axis=1
        )
        tgt_undetach = gather(out_memory)
        ref_undetach = (
            self.enc_out_bbox_embed(tgt_undetach).astype(jnp.float32)
            + gather(out_props_unsig)
        )  # [B, nq, 4] unsigmoid
        refpoints_unsig = jax.lax.stop_gradient(ref_undetach)
        init_box_proposal = nn.sigmoid(gather(out_props_unsig))
        if c.embed_init_tgt:
            tgt = jnp.broadcast_to(
                self.tgt_embed[None], (b, c.num_queries, c.hidden_dim)
            )
        else:
            tgt = jax.lax.stop_gradient(tgt_undetach)

        # ---- prepend DN queries -----------------------------------------
        if (
            dn_labels is None
            and c.dn_labelbook_reuse_cls
            and c.use_language
            and text_embed is not None
        ):
            # materialize label_proj params even on DN-free traces so that
            # init from an inference call still yields the full tree
            tgt = tgt + 0.0 * self.label_proj(text_embed[:1]).sum()
        num_dn = 0
        if dn_labels is not None:
            num_dn = dn_labels.shape[1]
            dn_tgt = self.encode_dn_labels(dn_labels, text_embed)
            tgt = jnp.concatenate([dn_tgt, tgt], axis=1)
            refpoints_unsig = jnp.concatenate(
                [dn_boxes_unsig.astype(jnp.float32), refpoints_unsig], axis=1
            )
        qt = tgt.shape[1]
        self_attn_mask = None
        if dn_attn_mask is not None:
            self_attn_mask = dn_attn_mask[:, None, :, :]  # [B, 1, QT, QT]

        if c.use_clip_visual_query and clip_features is not None:
            # box2clip_query (richsem.py:835-854, applied at
            # deformable_transformer.py:425-426): content queries become
            # projected 1×1 CLIP RoI features of the (DN + two-stage)
            # reference boxes; `0·tgt` keeps the embed params reachable.
            from richsem_tpu.ops.roi_align import roi_align
            from richsem_tpu.utils.boxes import box_cxcywh_to_xyxy

            q_boxes = jnp.clip(
                box_cxcywh_to_xyxy(nn.sigmoid(refpoints_unsig)), 0.0, 1.0
            )
            gh, gw = clip_features.shape[1:3]
            q_boxes = q_boxes * jnp.asarray(
                [gw, gh, gw, gh], jnp.float32
            )
            rois = roi_align(
                jax.lax.stop_gradient(clip_features).astype(jnp.float32),
                q_boxes, output_size=1, spatial_scale=1.0,
            )  # [B, QT, 1, 1, Dv]
            tgt = self.clip_query_proj(rois[:, :, 0, 0, :]) + 0.0 * tgt

        # ---- decoder with iterative box refinement ----------------------
        ref = nn.sigmoid(refpoints_unsig)  # [B, QT, 4]
        references = [ref]
        hs_layers = []
        for layer in self.decoder_layers:
            ref_input = ref[:, :, None, :] * jnp.concatenate([vr, vr], -1)[:, None]
            query_sine = gen_sineembed_for_position(
                ref_input[:, :, 0, :], c.hidden_dim // 2
            )
            query_pos = self.ref_point_head(query_sine)
            tgt = layer(
                tgt, query_pos, ref_input, memory, spatial_shapes, mask_flat,
                self_attn_mask, deterministic,
            )
            # refinement uses the un-normed layer output
            # (deformable_transformer.py:787-790); per-layer heads below use
            # the normed output (:812)
            delta = self.bbox_embed(tgt).astype(jnp.float32)
            new_ref = nn.sigmoid(delta + inverse_sigmoid(ref))
            references.append(new_ref)  # use_detached_boxes_dec_out=False
            ref = jax.lax.stop_gradient(new_ref)
            hs_layers.append(tgt)

        # ---- per-layer outputs ------------------------------------------
        # One stacked program per head instead of n_dec separate ones: the
        # decoder layers share decoder_norm / bbox_embed / class head
        # (dec_pred_*_embed_share=True), so stacking the 6 layer outputs
        # into a [Ld, B, QT, ·] tensor turns 18 medium matmuls into 3
        # MXU-shaped ones — identical math (all heads are per-token).
        hs_stack = self.decoder_norm(jnp.stack(hs_layers))  # [Ld, B, QT, C]
        hs_layers = list(hs_stack)
        ref_stack = jnp.stack(references[:-1])  # [Ld, B, QT, 4]
        coord_stack = nn.sigmoid(
            self.bbox_embed(hs_stack).astype(jnp.float32)
            + inverse_sigmoid(ref_stack)
        )
        logit_stack = self._class_logits(hs_stack, text_embed)
        all_coords = list(coord_stack)
        all_logits = list(logit_stack)

        clip_hs_layers: Dict[int, jnp.ndarray] = {}
        clip_logits_layers: Dict[int, jnp.ndarray] = {}
        if c.use_visual_distill:
            # project queries into CLIP space (richsem.py:719-725); all
            # layers when two_stage_cls / distill_aux_layers need them
            # (richsem.py:721 projects the full hs stack), else final only
            need_all = (c.two_stage_cls and train) or c.distill_aux_layers
            layer_ids = list(
                range(len(hs_layers)) if need_all else [len(hs_layers) - 1]
            )
            # stacked projection (same sharing argument as the heads above)
            sel = hs_stack if need_all else hs_stack[-1:]
            ch_stack = l2_normalize(
                self.clip_visual_proj(sel).astype(jnp.float32)
            )
            cl_stack = None
            if text_embed is not None:
                t = l2_normalize(text_embed.astype(jnp.float32))
                cl_stack = jnp.exp(self.logit_scale) * (ch_stack @ t.T)
            for i, lid in enumerate(layer_ids):
                clip_hs_layers[lid] = ch_stack[i]
                if cl_stack is not None:
                    clip_logits_layers[lid] = cl_stack[i]
            last = len(hs_layers) - 1
            out["pred_clip_embed"] = clip_hs_layers[last][:, num_dn:]
            if num_dn:
                out["dn_pred_clip_embed"] = clip_hs_layers[last][:, :num_dn]
            if text_embed is not None:
                out["pred_clip_logits"] = clip_logits_layers[last][:, num_dn:]
                if num_dn:
                    out["dn_pred_clip_logits"] = clip_logits_layers[last][:, :num_dn]

        if c.two_stage_cls and train and clip_logits_layers:
            # fuse detached CLIP class probabilities into every layer's
            # logits, training only (richsem.py:727-731)
            all_logits = [
                l + inverse_sigmoid(
                    jax.nn.softmax(jax.lax.stop_gradient(cl), axis=-1)
                )
                for l, cl in zip(
                    all_logits,
                    (clip_logits_layers[i] for i in range(len(all_logits))),
                )
            ]

        def split(x):
            return x[:, :num_dn], x[:, num_dn:]

        dn_logits, logits = zip(*[split(l) for l in all_logits])
        dn_coords, coords = zip(*[split(cd) for cd in all_coords])

        out["pred_logits"] = logits[-1]
        out["pred_boxes"] = coords[-1]
        out["aux_outputs"] = [
            {"pred_logits": l, "pred_boxes": cd}
            for l, cd in zip(logits[:-1], coords[:-1])
        ]
        if c.distill_aux_layers and clip_hs_layers:
            # distill targets on every decoder layer (richsem.py:776-784);
            # DN-aux distill is a zero placeholder in the reference
            # (richsem.py:1240-1241) and is skipped here
            for lid, aux in enumerate(out["aux_outputs"]):
                aux["pred_clip_embed"] = clip_hs_layers[lid][:, num_dn:]
                if lid in clip_logits_layers:
                    aux["pred_clip_logits"] = clip_logits_layers[lid][:, num_dn:]
        if num_dn:
            out["dn_outputs"] = {
                "pred_logits": dn_logits[-1],
                "pred_boxes": dn_coords[-1],
                "aux_outputs": [
                    {"pred_logits": l, "pred_boxes": cd}
                    for l, cd in zip(dn_logits[:-1], dn_coords[:-1])
                ],
            }
            if "dn_pred_clip_logits" in out:
                out["dn_outputs"]["pred_clip_logits"] = out.pop(
                    "dn_pred_clip_logits"
                )
        # encoder (interm) outputs — richsem.py:789-795
        interm_class = self._class_logits(tgt_undetach, text_embed, enc=True)
        out["interm_outputs"] = {
            "pred_logits": interm_class,
            "pred_boxes": nn.sigmoid(ref_undetach),
        }
        out["interm_outputs_for_matching_pre"] = {
            "pred_logits": interm_class,
            "pred_boxes": init_box_proposal,
        }
        if c.masks and c.mask_head_type == "cond_inst":
            # CondInst: per-query dynamic-conv params + a shared stride-8
            # mask feature map; the criterion (or PostProcess) instantiates
            # per-instance masks from matched/selected queries
            # (cond_inst.py:206-288)
            out["mask_feats"] = self.cond_inst.mask_features(srcs[:3])
            out["mask_params"] = self.cond_inst.controller_params(
                hs_layers[-1][:, num_dn:]
            )
            # export the head's dynamic-conv layout so the criterion's
            # param slicing always agrees with the controller output
            out["mask_feat_stride"] = self.cond_inst.mask_feat_stride
            out["mask_head_layout"] = {
                "dy_channels": self.cond_inst.dy_channels,
                "layers": self.cond_inst.controller_layers,
                "rel_coord": self.cond_inst.rel_coord,
            }
        elif c.masks:
            # DETRsegm: per-query attention over the stride-32 projected
            # feature, FPN mask head through C4/C3 (segmentation.py:20-170)
            hs_match = hs_layers[-1][:, num_dn:]
            c5_idx = len(feats) - 1
            attn_maps = self.mask_attention(
                hs_match, srcs[c5_idx], masks[c5_idx]
            )
            out["pred_masks"] = self.mask_head(
                attn_maps, srcs[c5_idx], srcs[c5_idx - 1], srcs[c5_idx - 2]
            )
        out["hs"] = hs_layers[-1][:, num_dn:]
        return out
