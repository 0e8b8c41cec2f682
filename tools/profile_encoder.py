"""Sub-layer-grain timing of the flagship ENCODER non-msda work on the TPU.

VERDICT r4 #1(b): CEILING.md names ~54 ms of encoder non-msda per step
(proj/softmax/loc/LN/FFN over 6 layers) with the f32 loc/softmax tensors
([B,Q,M,L,P,.] ~50 MB each) untried. This times each non-kernel piece of
DeformableEncoderLayer at production shapes (bs2, 896x1344 -> Q=S=24990,
bf16 compute) fwd+bwd, plus A/B variants:

  * heads_f32      — offsets+attn Dense on an f32 query (shipped)
  * heads_bf16in   — same Dense with the query pre-cast to bf16 (f32 out)
  * loc_compute    — compute_sampling_locations elementwise chain
  * softmax_f32 / softmax_bf16

Reference identity: deformable_transformer.py:868-881 (encoder layer).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tools.profile_step import timeit

B = 2
H, W = 896, 1344
SHAPES = ((H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32), (H // 64, W // 64))
S = sum(h * w for h, w in SHAPES)
C = 256
M, L, P = 8, 4, 4


def fwd_bwd(module, params, *args, wrt=(0,), **kw):
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
    from richsem_tpu.models.dino import DINOConfig, DeformableEncoderLayer
    from richsem_tpu.models.layers import FFN
    from richsem_tpu.models.transformer_utils import encoder_reference_points
    from richsem_tpu.ops.ms_deform_attn import compute_sampling_locations

    cfg = DINOConfig(compute_dtype=jnp.bfloat16, msda_impl="pallas2")
    rng_np = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng_np.normal(size=s) * 0.02, jnp.float32)

    src = mk(B, S, C)
    pos = mk(B, S, C)
    mask_flat = jnp.zeros((B, S), bool)
    vr = jnp.ones((B, L, 2), jnp.float32)
    enc_ref = encoder_reference_points(SHAPES, vr)
    key = jax.random.PRNGKey(0)
    report = {}

    def rec(name, fn_params_args, n=20):
        fn, params, args = fn_params_args
        dt = timeit(fn, params, *args, n=n)
        report[name] = dt * 1e3
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)

    # ---- full encoder layer (pallas2 kernel inside) -------------------
    layer = DeformableEncoderLayer(cfg)
    lp = layer.init(key, src, pos, enc_ref, SHAPES, mask_flat)
    rec("enc_layer_full(pallas2)", fwd_bwd(
        layer, lp, src, pos, enc_ref, wrt=(0,),
        spatial_shapes=SHAPES, pad_mask=mask_flat), n=10)

    # ---- offsets + attention heads: f32 vs bf16-input -----------------
    class Heads(nn.Module):
        in_dtype: object

        @nn.compact
        def __call__(self, query):
            q = query.astype(self.in_dtype)
            off = nn.Dense(M * L * P * 2, name="sampling_offsets")(q)
            attn = nn.Dense(M * L * P, name="attention_weights")(q)
            return off.astype(jnp.float32), attn.astype(jnp.float32)

    for name, dt in (("heads_f32", jnp.float32), ("heads_bf16in", jnp.bfloat16)):
        h = Heads(dt)
        hp = h.init(key, src)
        rec(name, fwd_bwd(h, hp, src, wrt=(0,)))

    # ---- value projection (bf16, shipped) -----------------------------
    class ValueProj(nn.Module):
        @nn.compact
        def __call__(self, x):
            v = nn.Dense(C, dtype=jnp.bfloat16, name="value_proj")(x)
            return v.reshape(B, S, M, C // M)

    vpm = ValueProj()
    vp = vpm.init(key, src)
    rec("value_proj", fwd_bwd(vpm, vp, src, wrt=(0,)))

    # ---- softmax + loc elementwise chain ------------------------------
    attn_raw = mk(B, S, M * L * P)
    off_raw = mk(B, S, M, L, P, 2)

    class SoftmaxLoc(nn.Module):
        dt: object

        @nn.compact
        def __call__(self, attn_raw, off_raw):
            a = nn.softmax(
                attn_raw.astype(self.dt).reshape(B, S, M, L * P), axis=-1
            ).reshape(B, S, M, L, P)
            loc = compute_sampling_locations(
                enc_ref.astype(jnp.float32), off_raw.astype(jnp.float32),
                SHAPES, P,
            )
            return a, loc

    sl = SoftmaxLoc(jnp.float32)
    slp = sl.init(key, attn_raw, off_raw)
    rec("softmax+loc_f32", fwd_bwd(sl, slp, attn_raw, off_raw, wrt=(0, 1)))

    # ---- output projection --------------------------------------------
    class OutProj(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(C, dtype=jnp.bfloat16, name="output_proj")(x)

    kern_out = mk(B, S, C)
    opm = OutProj()
    op = opm.init(key, kern_out)
    rec("output_proj", fwd_bwd(opm, op, kern_out, wrt=(0,)))

    # ---- LN + residual (f32 stream) -----------------------------------
    class LNRes(nn.Module):
        @nn.compact
        def __call__(self, src, attn_out):
            return nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn_out)

    lnm = LNRes()
    lnp = lnm.init(key, src, kern_out)
    rec("ln_residual_f32", fwd_bwd(lnm, lnp, src, kern_out, wrt=(0, 1)))

    # ---- FFN at 25k tokens --------------------------------------------
    ffn = FFN(d_model=C, d_ffn=2048, activation="relu",
              compute_dtype=jnp.bfloat16)
    fp = ffn.init(key, src)
    rec("ffn_25k", fwd_bwd(ffn, fp, src, wrt=(0,)))

    print("\n--- summary (ms fwd+bwd, per encoder layer) ---")
    non_msda = (
        report.get("heads_f32", 0) + report.get("value_proj", 0)
        + report.get("softmax+loc_f32", 0) + report.get("output_proj", 0)
        + report.get("ln_residual_f32", 0) + report.get("ffn_25k", 0)
    )
    print(f"sum non-msda pieces        : {non_msda:8.2f}")
    print(f"enc_layer_full - 34.9 msda : "
          f"{report.get('enc_layer_full(pallas2)', 0) - 34.9:8.2f}")


if __name__ == "__main__":
    main()
