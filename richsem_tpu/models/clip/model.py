"""CLIP (RN50 / ViT-B-32) — frozen teacher, flax/NHWC.

Capability parity with the reference CLIP subsystem (clip/model.py):
  * ``ModifiedResNet`` (clip/model.py:94-167): 3-conv stem + avgpool,
    anti-aliased strided bottlenecks (avgpool before the stride), and the
    ``AttentionPool2d`` head (:58-91) whose mean-token query yields the
    image embedding; ``encode_image(..., ret_sp=True)`` returns the
    pre-attnpool stride-32 spatial map — the tensor the RoI-distillation
    branch crops (richsem.py:614-629).
  * text transformer (:286-419): causal-masked residual blocks with
    QuickGELU, EOT-token pooling through ``text_projection``.
  * ``VisionTransformer`` (:219-283) incl. the spatial-feature output.

The teacher is inference-only: it runs under ``stop_gradient`` inside the
train step with no optimizer state (BASELINE.json note). BatchNorms are
running-stats affine transforms (the model never trains), reusing
``FrozenBatchNorm``.

Weights come from ``tools/convert_clip.py`` (OpenAI checkpoint → pickle of
this module's param tree).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.models.resnet import FrozenBatchNorm

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str = "RN50"
    embed_dim: int = 1024  # joint space
    # vision (RN50)
    vision_layers: Tuple[int, ...] = (3, 4, 6, 3)
    vision_width: int = 64
    vision_heads: int = 32
    image_resolution: int = 224
    vision_patch_size: int = 32  # ViT only
    is_vit: bool = False
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # vision-tower compute dtype (params stay f32; None = f32 — exact, the
    # parity-test setting). The reference teacher runs fp16 on GPU
    # (clip/clip.py model.half()), so bf16 here is the analogous fast mode.
    dtype: Any = None

    @classmethod
    def rn50(cls) -> "CLIPConfig":
        return cls()

    @classmethod
    def vit_b32(cls) -> "CLIPConfig":
        return cls(
            name="ViT-B/32", embed_dim=512, vision_layers=(12,),
            vision_width=768, vision_heads=12, is_vit=True,
        )


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipBottleneck(nn.Module):
    """Anti-aliased bottleneck: stride becomes avgpool (clip/model.py:10-55)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(y))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride,) * 2, (self.stride,) * 2)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)
        identity = x
        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       (self.stride,) * 2)
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    """Mean-token-query attention pooling (clip/model.py:58-91).

    Accepts ``[B, H, W, C]`` (or ``[B, R, H, W, C]`` flattened by caller)
    with H·W equal to the positional grid — RoI crops are 7×7, the same grid
    as a 224 input, so the positional table applies directly.
    """

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (self.spacial_dim**2 + 1, self.embed_dim),
        )
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1
        )
        tokens = tokens + pos[None, : h * w + 1]
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(
            tokens[:, :1]
        )
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(tokens)
        hd = self.embed_dim // self.num_heads
        q = q.reshape(b, 1, self.num_heads, hd)
        k = k.reshape(b, -1, self.num_heads, hd)
        v = v.reshape(b, -1, self.num_heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        # softmax in f32 regardless of the tower dtype
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, 1, self.embed_dim)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(
            out[:, 0]
        )


class ModifiedResNet(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        c = self.cfg
        w = c.vision_width
        stem = []
        for i, (ch, stride) in enumerate([(w // 2, 2), (w // 2, 1), (w, 1)]):
            stem.append(
                nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding=[(1, 1)] * 2, use_bias=False, dtype=c.dtype,
                        name=f"conv{i+1}")
            )
            stem.append(FrozenBatchNorm(ch, name=f"bn{i+1}"))
        self.stem = stem
        blocks = []
        planes = (w, w * 2, w * 4, w * 8)
        strides = (1, 2, 2, 2)
        for li, (n_blocks, p, s) in enumerate(zip(c.vision_layers, planes, strides)):
            for b in range(n_blocks):
                blocks.append(
                    ClipBottleneck(
                        planes=p, stride=s if b == 0 else 1,
                        downsample=(b == 0), dtype=c.dtype,
                        name=f"layer{li+1}_block{b}",
                    )
                )
        self.blocks = blocks
        self.attnpool = AttentionPool2d(
            embed_dim=w * 32, num_heads=c.vision_heads,
            output_dim=c.embed_dim, dtype=c.dtype,
            spacial_dim=c.image_resolution // 32, name="attnpool",
        )

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x
        for i in range(3):
            y = nn.relu(self.stem[2 * i + 1](self.stem[2 * i](y)))
        y = nn.avg_pool(y, (2, 2), (2, 2))
        for blk in self.blocks:
            y = blk(y)
        return y  # [B, H/32, W/32, width*32]

    def __call__(self, x: jnp.ndarray, ret_sp: bool = False):
        y = self.features(x)
        if ret_sp:
            return y
        return self.attnpool(y)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        n = x.shape[1]
        mask = None
        if causal:
            mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width, dtype=self.dtype,
            name="attn",
        )(h, h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class VisionTransformer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, ret_sp: bool = False):
        c = self.cfg
        p = c.vision_patch_size
        width = c.vision_width
        b, h, w, _ = x.shape
        y = nn.Conv(width, (p, p), strides=(p, p), use_bias=False,
                    dtype=c.dtype, name="conv1")(x)
        gh, gw = y.shape[1:3]
        y = y.reshape(b, gh * gw, width)
        cls = self.param("class_embedding", nn.initializers.normal(width**-0.5), (width,))
        y = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, width)), y], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(width**-0.5),
            ((c.image_resolution // p) ** 2 + 1, width),
        )
        y = y + _resize_pos_embed(pos, gh, gw)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(y)
        for i in range(c.vision_layers[0]):
            y = ResidualAttentionBlock(
                width, c.vision_heads, dtype=c.dtype, name=f"block{i}"
            )(y)
        proj = self.param("proj", nn.initializers.normal(width**-0.5),
                          (width, c.embed_dim))
        if ret_sp:
            # reference ret_sp applies ln_post AND the projection to every
            # token; the spatial map carries embed_dim channels
            # (clip/model.py:269-275)
            sp = nn.LayerNorm(epsilon=1e-5, name="ln_post")(y) @ proj
            return sp[:, 1:].reshape(b, gh, gw, c.embed_dim)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_post")(y[:, 0])
        return y @ proj


def _resize_pos_embed(pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Bilinear-resize the ViT positional grid to (gh, gw)
    (clip/model.py:246-266 parity)."""
    n = pos.shape[0] - 1
    g = int(np.sqrt(n))
    if g * g == n and (gh, gw) == (g, g):
        return pos[None]
    grid = pos[1:].reshape(1, g, g, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bilinear")
    return jnp.concatenate([pos[:1][None], grid.reshape(1, gh * gw, -1)], axis=1)


class CLIP(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        c = self.cfg
        if c.is_vit:
            self.visual = VisionTransformer(c, name="visual")
        else:
            self.visual = ModifiedResNet(c, name="visual")
        self.blocks = [
            ResidualAttentionBlock(c.transformer_width, c.transformer_heads,
                                   name=f"text_block{i}")
            for i in range(c.transformer_layers)
        ]
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (c.vocab_size, c.transformer_width),
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (c.context_length, c.transformer_width),
        )
        self.ln_final = nn.LayerNorm(epsilon=1e-5, name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(c.transformer_width**-0.5),
            (c.transformer_width, c.embed_dim),
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ()
        )

    def encode_image(self, images: jnp.ndarray, ret_sp: bool = False):
        """images: [B,H,W,3] CLIP-normalized, NHWC."""
        return self.visual(images, ret_sp=ret_sp)

    def attnpool(self, spatial: jnp.ndarray) -> jnp.ndarray:
        """Pool a stride-32 spatial map (or RoI crops flattened to batch)."""
        if self.cfg.is_vit:
            raise NotImplementedError("attnpool is the RN path (use_cnn_clip)")
        return self.visual.attnpool(spatial)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: [B, context_length] int32 → [B, embed_dim]."""
        x = self.token_embedding[tokens]
        x = x + self.positional_embedding[None, : tokens.shape[1]]
        for blk in self.blocks:
            x = blk(x, causal=True)
        x = self.ln_final(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return pooled @ self.text_projection

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)


def denorm_imagenet_to_clip(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalized → CLIP-normalized (richsem.py:856-863)."""
    from richsem_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    raw = images * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
    return (raw - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
