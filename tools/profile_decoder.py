"""Sub-layer-grain timing of the flagship DECODER on the real TPU.

VERDICT r4 #1(a): the ~77 ms decoder (6 x 12.9 ms) was never profiled
below layer grain. This times each sub-block of DeformableDecoderLayer
plus the per-layer output heads at production shapes (bs2, 896x1344 ->
S=24990 memory tokens, QT=1100 queries incl. 200 DN, C=256, bf16 compute,
1204 classes), fwd+bwd each, so the round-5 optimization targets the
measured top term instead of a guess.

Reference identity: /root/reference/models/richsem/deformable_transformer.py
:883-1061 (decoder layer), richsem.py:702-725 (per-layer heads).

Usage: python tools/profile_decoder.py  (real chip; ~2 min with warm cache)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tools.profile_step import timeit

B = 2
H, W = 896, 1344
SHAPES = ((H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32), (H // 64, W // 64))
S = sum(h * w for h, w in SHAPES)
QT = 1100  # 900 matching + 2*dn_number
NUM_DN = 200
C = 256
NUM_CLASSES = 1204


def fwd_bwd(module, params, *args, wrt=(0,), **kw):
    """Jitted fwd+bwd program: grads wrt params and the tensor args in
    ``wrt``; every grad leaf is consumed by global_norm (DCE guard)."""

    def loss(p, a):
        out = module.apply(p, *a, **kw)
        return jax.tree.reduce(
            lambda s, x: s + x.astype(jnp.float32).sum(), out, 0.0
        )

    @jax.jit
    def run(p, *a):
        l, (gp, ga) = jax.value_and_grad(loss, argnums=(0, 1))(p, a)
        picked = [ga[i] for i in wrt]
        return l + optax.global_norm((gp, picked))

    return run, params, args


def main():
    from richsem_tpu.models.dino import (
        ClipAlignHead,
        DINOConfig,
        DeformableDecoderLayer,
    )
    from richsem_tpu.models.layers import FFN, MLP, MSDeformAttn
    from richsem_tpu.ops.position_encoding import gen_sineembed_for_position

    import flax.linen as nn

    cfg = DINOConfig(compute_dtype=jnp.bfloat16, use_language=True)
    rng_np = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng_np.normal(size=s) * 0.02, jnp.float32)

    tgt = mk(B, QT, C)
    query_pos = mk(B, QT, C)
    memory = mk(B, S, C)
    mask_flat = jnp.zeros((B, S), bool)
    ref4 = jnp.asarray(
        np.clip(rng_np.uniform(0.1, 0.9, (B, QT, 4)), 0.05, 0.95), jnp.float32
    )
    ref_input = jnp.broadcast_to(ref4[:, :, None, :], (B, QT, 4, 4))
    # DN attention mask (True = attend), block-diagonal like dn.prepare_cdn
    base = np.ones((QT, QT), bool)
    base[NUM_DN:, :NUM_DN] = False
    attn_mask = jnp.asarray(np.broadcast_to(base, (B, QT, QT)))[:, None]
    text_embed = mk(NUM_CLASSES, 1024)

    key = jax.random.PRNGKey(0)
    report = {}

    def rec(name, fn_params_args, n=30):
        fn, params, args = fn_params_args
        dt = timeit(fn, params, *args, n=n)
        report[name] = dt * 1e3
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)

    # ---- full decoder layer ------------------------------------------
    layer = DeformableDecoderLayer(cfg)
    lp = layer.init(key, tgt, query_pos, ref_input, memory, SHAPES,
                    mask_flat, attn_mask)
    rec("dec_layer_full", fwd_bwd(
        layer, lp, tgt, query_pos, ref_input, memory,
        wrt=(0, 3),
        spatial_shapes=SHAPES, memory_pad_mask=mask_flat,
        self_attn_mask=attn_mask))

    # ---- self-attention block (MHA + LN) -----------------------------
    class SelfAttnBlock(nn.Module):
        @nn.compact
        def __call__(self, tgt, query_pos):
            q = k = tgt + query_pos
            sa = nn.MultiHeadDotProductAttention(
                num_heads=cfg.nheads, qkv_features=cfg.hidden_dim,
                deterministic=True, dtype=cfg.compute_dtype,
                name="self_attn",
            )(inputs_q=q, inputs_k=k, inputs_v=tgt, mask=attn_mask)
            return nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + sa)

    sab = SelfAttnBlock()
    sp = sab.init(key, tgt, query_pos)
    rec("dec_self_attn", fwd_bwd(sab, sp, tgt, query_pos, wrt=(0,)))

    # ---- cross-attention block (sep msda incl. value proj + LN) ------
    class CrossAttnBlock(nn.Module):
        @nn.compact
        def __call__(self, tgt, query_pos, ref, memory):
            ca = MSDeformAttn(
                d_model=cfg.hidden_dim, n_levels=4, n_heads=cfg.nheads,
                n_points=4, compute_dtype=cfg.compute_dtype, impl="sep",
                name="cross_attn",
            )(tgt + query_pos, ref, memory, SHAPES, mask_flat)
            return nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + ca)

    cab = CrossAttnBlock()
    cp = cab.init(key, tgt, query_pos, ref_input, memory)
    rec("dec_cross_attn_sep", fwd_bwd(
        cab, cp, tgt, query_pos, ref_input, memory, wrt=(0, 3)))

    # cross-attn pieces: value projection over the 25k memory vs the rest
    class ValueProjOnly(nn.Module):
        @nn.compact
        def __call__(self, memory):
            v = nn.Dense(cfg.hidden_dim, dtype=cfg.compute_dtype,
                         name="value_proj")(memory)
            return v.reshape(B, S, cfg.nheads, -1)

    vpo = ValueProjOnly()
    vp = vpo.init(key, memory)
    rec("  cross_attn.value_proj(25k)", fwd_bwd(vpo, vp, memory, wrt=(0,)))

    # ---- FFN ----------------------------------------------------------
    ffn = FFN(d_model=cfg.hidden_dim, d_ffn=cfg.dim_feedforward,
              activation="relu", compute_dtype=cfg.compute_dtype)
    fp = ffn.init(key, tgt)
    rec("dec_ffn", fwd_bwd(ffn, fp, tgt, wrt=(0,)))

    # ---- query-pos head: sine embed + ref_point_head MLP --------------
    class QueryPosHead(nn.Module):
        @nn.compact
        def __call__(self, ref_input):
            qs = gen_sineembed_for_position(
                ref_input[:, :, 0, :], cfg.hidden_dim // 2
            )
            return MLP(cfg.hidden_dim, cfg.hidden_dim, 2,
                       name="ref_point_head")(qs)

    qph = QueryPosHead()
    qp = qph.init(key, ref_input)
    rec("dec_query_pos_head", fwd_bwd(qph, qp, ref_input, wrt=()))

    # ---- box refine: bbox_embed MLP + sigmoid round-trip --------------
    class BoxRefine(nn.Module):
        @nn.compact
        def __call__(self, tgt, ref):
            from richsem_tpu.utils.misc import inverse_sigmoid

            delta = MLP(cfg.hidden_dim, 4, 3, name="bbox_embed")(tgt)
            new_ref = nn.sigmoid(
                delta.astype(jnp.float32) + inverse_sigmoid(ref)
            )
            normed = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(tgt)
            return new_ref, normed

    br = BoxRefine()
    bp = br.init(key, tgt, ref4)
    rec("dec_box_refine+norm", fwd_bwd(br, bp, tgt, ref4, wrt=(0,)))

    # ---- per-layer class head (open vocab, 1204 classes) --------------
    cah = ClipAlignHead(cfg, use_mlp=False)
    ls = jnp.float32(np.log(1 / 0.07))
    cp2 = cah.init(key, tgt, text_embed, ls)
    rec("cls_head_1layer", fwd_bwd(cah, cp2, tgt, text_embed, ls, wrt=(0,)))

    # ---- distill projection (final layer) -----------------------------
    class DistillProj(nn.Module):
        @nn.compact
        def __call__(self, h, text_embed):
            from richsem_tpu.utils.misc import l2_normalize

            v = nn.Dense(1024, use_bias=False, name="clip_visual_proj")(h)
            v = l2_normalize(v.astype(jnp.float32))
            t = l2_normalize(text_embed.astype(jnp.float32))
            return jnp.exp(ls) * (v @ t.T)

    dp = DistillProj()
    dpp = dp.init(key, tgt, text_embed)
    rec("distill_proj_1layer", fwd_bwd(dp, dpp, tgt, text_embed, wrt=(0,)))

    print("\n--- summary (ms, fwd+bwd, production shapes) ---")
    per_layer = (
        report.get("dec_self_attn", 0)
        + report.get("dec_cross_attn_sep", 0)
        + report.get("dec_ffn", 0)
        + report.get("dec_query_pos_head", 0)
        + report.get("dec_box_refine+norm", 0)
    )
    print(f"sum(sub-blocks) per layer : {per_layer:8.2f}")
    print(f"dec_layer_full measured   : {report.get('dec_layer_full', 0):8.2f}"
          " (+ query_pos/box/cls outside the layer module)")
    six = 6 * (report.get("dec_layer_full", 0)
               + report.get("dec_query_pos_head", 0)
               + report.get("dec_box_refine+norm", 0)
               + report.get("cls_head_1layer", 0))
    print(f"6-layer stack estimate    : {six:8.2f}")


if __name__ == "__main__":
    main()
