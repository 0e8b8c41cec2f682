"""CLIP subsystem tests: shapes, torch numerical parity, conversion, text bank."""

import gzip
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from richsem_tpu.models.clip.model import (
    CLIP,
    AttentionPool2d,
    ClipBottleneck,
    CLIPConfig,
)
from richsem_tpu.models.clip.tokenizer import HashTokenizer, SimpleTokenizer, tokenize

TINY = CLIPConfig(
    embed_dim=16,
    vision_layers=(1, 1, 1, 1),
    vision_width=8,
    vision_heads=4,
    image_resolution=64,
    vocab_size=200,
    transformer_width=16,
    transformer_heads=2,
    transformer_layers=2,
    context_length=12,
)


@pytest.fixture(scope="module")
def clip_and_params():
    model = CLIP(TINY)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 12), jnp.int32),
    )
    return model, params


def test_encode_image_shapes(clip_and_params):
    model, params = clip_and_params
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    pooled = model.apply(params, img, method=CLIP.encode_image)
    assert pooled.shape == (2, 16)
    sp = model.apply(params, img, True, method=CLIP.encode_image)
    assert sp.shape == (2, 2, 2, 8 * 32)
    # attnpool on RoI-crop-shaped input
    crops = jnp.asarray(np.random.default_rng(1).normal(size=(5, 2, 2, 256)), jnp.float32)
    out = model.apply(params, crops, method=CLIP.attnpool)
    assert out.shape == (5, 16)


def test_encode_text_eot_pooling(clip_and_params):
    model, params = clip_and_params
    toks = np.zeros((2, 12), np.int32)
    toks[0, :4] = [150, 5, 6, 199]  # eot=199 at position 3
    toks[1, :6] = [150, 5, 6, 7, 8, 199]
    out = model.apply(params, jnp.asarray(toks), method=CLIP.encode_text)
    assert out.shape == (2, 16)
    # changing tokens AFTER the EOT must not change the embedding
    toks2 = toks.copy()
    toks2[0, 8] = 42
    # (position 8 has token 0 < eot id, argmax still at 3)
    out2 = model.apply(params, jnp.asarray(toks2), method=CLIP.encode_text)
    # causal mask: position 3's output only sees positions ≤ 3
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-5)


def test_attnpool_matches_torch():
    """Numerical parity with torch's multi_head_attention_forward."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    embed, heads, out_dim, g = 32, 4, 24, 3
    x = rng.normal(size=(2, g, g, embed)).astype(np.float32)
    pos = rng.normal(size=(g * g + 1, embed)).astype(np.float32) * 0.1
    ws = {
        n: rng.normal(size=(embed if n != "c_proj" else out_dim, embed)).astype(np.float32) * 0.1
        for n in ("q_proj", "k_proj", "v_proj", "c_proj")
    }
    bs = {
        n: rng.normal(size=(embed if n != "c_proj" else out_dim,)).astype(np.float32) * 0.1
        for n in ("q_proj", "k_proj", "v_proj", "c_proj")
    }

    # --- torch reference (independent impl of clip/model.py:58-91) ---
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    t = xt.flatten(start_dim=2).permute(2, 0, 1)
    t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
    t = t + torch.from_numpy(pos)[:, None, :]
    want, _ = F.multi_head_attention_forward(
        query=t[:1], key=t, value=t,
        embed_dim_to_check=embed, num_heads=heads,
        q_proj_weight=torch.from_numpy(ws["q_proj"]),
        k_proj_weight=torch.from_numpy(ws["k_proj"]),
        v_proj_weight=torch.from_numpy(ws["v_proj"]),
        in_proj_weight=None,
        in_proj_bias=torch.cat([torch.from_numpy(bs[n]) for n in ("q_proj", "k_proj", "v_proj")]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=torch.from_numpy(ws["c_proj"]),
        out_proj_bias=torch.from_numpy(bs["c_proj"]),
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    want = want.squeeze(0).detach().numpy()

    # --- flax ---
    mod = AttentionPool2d(embed_dim=embed, num_heads=heads, output_dim=out_dim, spacial_dim=g)
    params = {
        "params": {
            "positional_embedding": pos,
            **{
                n: {"kernel": ws[n].T, "bias": bs[n]}
                for n in ("q_proj", "k_proj", "v_proj", "c_proj")
            },
        }
    }
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clip_bottleneck_matches_torch():
    """Anti-aliased bottleneck vs an independent torch-functional forward."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    cin, planes, stride = 16, 8, 2
    x = rng.normal(size=(1, 10, 10, cin)).astype(np.float32)
    mod = ClipBottleneck(planes=planes, stride=stride, downsample=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize the BN stats so the test is non-trivial
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape).astype(np.float32) * 0.5 + 1.0),
        params,
    )
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, params)["params"]

    def bn(t, d):
        w = d["scale"] / np.sqrt(d["var"] + 1e-5)
        return t * torch.from_numpy(w)[None, :, None, None] + torch.from_numpy(
            d["bias"] - d["mean"] * w
        )[None, :, None, None]

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.relu(bn(F.conv2d(xt, torch.from_numpy(p["conv1"]["kernel"]).permute(3, 2, 0, 1)), p["bn1"]))
    y = F.relu(bn(F.conv2d(y, torch.from_numpy(p["conv2"]["kernel"]).permute(3, 2, 0, 1), padding=1), p["bn2"]))
    y = F.avg_pool2d(y, stride)
    y = bn(F.conv2d(y, torch.from_numpy(p["conv3"]["kernel"]).permute(3, 2, 0, 1)), p["bn3"])
    idn = F.avg_pool2d(xt, stride)
    idn = bn(F.conv2d(idn, torch.from_numpy(p["downsample_conv"]["kernel"]).permute(3, 2, 0, 1)), p["downsample_bn"])
    want = F.relu(y + idn).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_conversion_roundtrip_structure():
    """A random torch-shaped RN50 state dict converts into exactly the
    param tree the flax CLIP expects."""
    import torch
    from convert_clip import convert

    cfg = CLIPConfig()  # full RN50 shapes
    model = CLIP(cfg)
    target = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 77), jnp.int32),
        )
    )

    sd = {}

    def add(name, *shape):
        sd[name] = torch.zeros(shape)  # () → scalar tensor (logit_scale)

    add("visual.conv1.weight", 32, 3, 3, 3)
    add("visual.conv2.weight", 32, 32, 3, 3)
    add("visual.conv3.weight", 64, 32, 3, 3)
    for i in (1, 2, 3):
        ch = {1: 32, 2: 32, 3: 64}[i]
        for suff, sh in (("weight", ch), ("bias", ch), ("running_mean", ch), ("running_var", ch)):
            add(f"visual.bn{i}.{suff}", sh)
    inplanes = 64
    for li, (n, planes) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1):
        for b in range(n):
            pr = f"visual.layer{li}.{b}"
            add(f"{pr}.conv1.weight", planes, inplanes, 1, 1)
            add(f"{pr}.conv2.weight", planes, planes, 3, 3)
            add(f"{pr}.conv3.weight", planes * 4, planes, 1, 1)
            for ci, ch in ((1, planes), (2, planes), (3, planes * 4)):
                for suff in ("weight", "bias", "running_mean", "running_var"):
                    add(f"{pr}.bn{ci}.{suff}", ch)
            if b == 0:
                add(f"{pr}.downsample.0.weight", planes * 4, inplanes, 1, 1)
                for suff in ("weight", "bias", "running_mean", "running_var"):
                    add(f"{pr}.downsample.1.{suff}", planes * 4)
            inplanes = planes * 4
    for n_, od in (("q_proj", 2048), ("k_proj", 2048), ("v_proj", 2048), ("c_proj", 1024)):
        add(f"visual.attnpool.{n_}.weight", od, 2048)
        add(f"visual.attnpool.{n_}.bias", od)
    add("visual.attnpool.positional_embedding", 50, 2048)
    add("token_embedding.weight", 49408, 512)
    add("positional_embedding", 77, 512)
    add("ln_final.weight", 512)
    add("ln_final.bias", 512)
    add("text_projection", 512, 1024)
    add("logit_scale")
    for i in range(12):
        pr = f"transformer.resblocks.{i}"
        add(f"{pr}.ln_1.weight", 512)
        add(f"{pr}.ln_1.bias", 512)
        add(f"{pr}.ln_2.weight", 512)
        add(f"{pr}.ln_2.bias", 512)
        add(f"{pr}.attn.in_proj_weight", 1536, 512)
        add(f"{pr}.attn.in_proj_bias", 1536)
        add(f"{pr}.attn.out_proj.weight", 512, 512)
        add(f"{pr}.attn.out_proj.bias", 512)
        add(f"{pr}.mlp.c_fc.weight", 2048, 512)
        add(f"{pr}.mlp.c_fc.bias", 2048)
        add(f"{pr}.mlp.c_proj.weight", 512, 2048)
        add(f"{pr}.mlp.c_proj.bias", 512)

    converted = convert(sd)
    got = jax.tree.map(np.shape, converted)
    want = jax.tree.map(lambda s: tuple(s.shape), target)
    got_flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(got)[0]
    }
    want_flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(want)[0]
    }
    missing = set(want_flat) - set(got_flat)
    extra = set(got_flat) - set(want_flat)
    assert not missing, f"missing leaves: {sorted(missing)[:8]}"
    assert not extra, f"extra leaves: {sorted(extra)[:8]}"
    bad = [k for k in want_flat if got_flat[k] != want_flat[k]]
    assert not bad, f"shape mismatches: {[(k, got_flat[k], want_flat[k]) for k in bad[:5]]}"


def test_tokenize_framing():
    tok = HashTokenizer(vocab_size=200)
    out = tokenize(["a photo of a cat"], tok, context_length=12)
    assert out.shape == (1, 12)
    assert out[0, 0] == 198  # sot
    row = out[0]
    assert 199 in row  # eot present
    eot_pos = int(np.argmax(row == 199))
    assert (row[eot_pos + 1 :] == 0).all()


def test_bpe_tokenizer_roundtrip(tmp_path):
    # minimal merges file: version line + a couple of merges
    merges = "#version tiny\nh e\nl l\nhe ll</w>\n"
    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write(merges)
    tok = SimpleTokenizer(str(p))
    ids = tok.encode("hello hell")
    assert len(ids) > 0
    text = tok.decode(ids)
    assert "hello" in text and "hell" in text


def test_build_text_embedding_shapes(clip_and_params):
    from richsem_tpu.models.clip_align import build_text_embedding

    model, params = clip_and_params
    cats = {1: {"name": "cat"}, 3: {"name": "sea_lion"}}
    bank = build_text_embedding(
        model, params, cats, HashTokenizer(200), context_length=12, batch_size=4
    )
    assert bank.shape == (4, 16)
    assert np.isfinite(np.asarray(bank)).all()


def test_clip_teacher_box_targets(clip_and_params):
    from richsem_tpu.models.clip_align import clip_teacher_box_targets

    model, params = clip_and_params
    images = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray(np.full((2, 3, 4), 0.4, np.float32))
    sizes = jnp.asarray([[64, 64], [48, 60]], jnp.float32)
    text = jnp.asarray(np.random.default_rng(1).normal(size=(5, 16)), jnp.float32)
    emb, logits, cvalid = clip_teacher_box_targets(
        model, params, images, boxes, sizes, text, jnp.float32(2.0)
    )
    assert emb.shape == (2, 3, 16) and logits.shape == (2, 3, 5)
    assert np.asarray(cvalid).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4
    )


def test_clip_teacher_box_targets_compacted(clip_and_params):
    """Compaction (valid + max_boxes) matches the full path on the slots it
    keeps: same logits at kept valid slots, zeros + clip_valid=False at
    truncated/invalid slots."""
    from richsem_tpu.models.clip_align import clip_teacher_box_targets

    model, params = clip_and_params
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    g = 6
    boxes = jnp.asarray(
        np.clip(rng.uniform(0.25, 0.6, (2, g, 4)), 0.1, 0.8), jnp.float32
    )
    sizes = jnp.asarray([[64, 64], [48, 60]], jnp.float32)
    text = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    valid = jnp.asarray(
        [[True, False, True, True, False, False],
         [True, True, True, True, True, False]]
    )
    full_emb, full_logits, _ = clip_teacher_box_targets(
        model, params, images, boxes, sizes, text, jnp.float32(2.0)
    )
    emb, logits, cvalid = clip_teacher_box_targets(
        model, params, images, boxes, sizes, text, jnp.float32(2.0),
        valid=valid, max_boxes=4,
    )
    cvalid = np.asarray(cvalid)
    # image 0 has 3 valid ≤ 4 → all its valid slots covered;
    # image 1 has 5 valid > 4 → exactly 4 covered
    assert cvalid.sum(1).tolist() == [3, 4]
    assert not cvalid[~np.asarray(valid)].any()
    np.testing.assert_allclose(
        np.asarray(logits)[cvalid], np.asarray(full_logits)[cvalid],
        rtol=1e-4, atol=1e-4,
    )
    assert (np.asarray(logits)[~cvalid] == 0).all()
    assert (np.asarray(emb)[~cvalid] == 0).all()
