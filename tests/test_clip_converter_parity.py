"""Numerics parity of tools/convert_clip.py against the reference CLIP.

Builds the reference `CLIP` (clip/model.py — torch-only imports, so it
loads directly by file path) with RANDOM init, converts its state_dict with
the production converter, and asserts the flax towers reproduce:

  * RN50 `encode_image(ret_sp=True)` (the teacher spatial map),
  * `attnpool` on that map (the RoI distill embedding path),
  * `encode_text` (the prompt-bank path),
  * ViT-B/32-style `encode_image` incl. the projected ret_sp map,
  * the BPE tokenizer against the reference `simple_tokenizer` on the real
    merges file (clip/simple_tokenizer.py:62-132).

This retires the round-2 converter debt (VERDICT.md Next #2) with zero
egress: weight VALUES don't matter for conversion correctness, only the
layout mapping, which random weights exercise fully.

Towers run at reduced depth/width (the converter sniffs block counts from
the state dict exactly like the reference's build_model,
clip/model.py:446-457) to keep CPU compile time sane; every conversion code
path (stem BNs, bottleneck downsample, attnpool, in_proj splitting, text
stack) is exercised.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# parity asserts CONVERSION-LAYOUT correctness, so matmuls must not add
# reduced-precision noise (jax's default matmul precision is bf16-class on
# this backend: flax MHA diverges ~8e-3 from f32 torch under it)
pytestmark = pytest.mark.usefixtures("f32_matmuls")


@pytest.fixture(scope="module")
def f32_matmuls():
    with jax.default_matmul_precision("float32"):
        yield

sys.path.insert(0, "/root/repo")

from richsem_tpu.models.clip.model import CLIP, CLIPConfig
from tools.convert_clip import convert

REF_CLIP = "/root/reference/clip/model.py"


def _load_ref_model_module():
    spec = importlib.util.spec_from_file_location("ref_clip_model", REF_CLIP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_ref_tokenizer_module():
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s  # identity is exact for ASCII prompts
        sys.modules["ftfy"] = ftfy
    spec = importlib.util.spec_from_file_location(
        "ref_clip_tokenizer", "/root/reference/clip/simple_tokenizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# small-but-complete towers: RN stem + 4 stages (with downsamples) + attnpool
RN_LAYERS = (1, 1, 1, 1)
RN_WIDTH = 32
RN_EMBED = 64
TXT_W, TXT_H, TXT_L = 128, 2, 2  # heads = width // 64 (converter + reference convention)
VOCAB, CTX = 512, 16
RES = 224

VIT_LAYERS, VIT_WIDTH, VIT_EMBED = 2, 128, 64


@pytest.fixture(scope="module")
def rn50_pair():
    mod = _load_ref_model_module()
    torch.manual_seed(0)
    ref = mod.CLIP(
        embed_dim=RN_EMBED, image_resolution=RES, vision_layers=RN_LAYERS,
        vision_width=RN_WIDTH, vision_patch_size=None, context_length=CTX,
        vocab_size=VOCAB, transformer_width=TXT_W, transformer_heads=TXT_H,
        transformer_layers=TXT_L,
    ).eval()
    # random-init BN running stats are (0, 1); randomize them so FrozenBN
    # conversion is actually tested
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    params = jax.tree.map(jnp.asarray, convert(ref.state_dict()))
    cfg = CLIPConfig(
        name="RN-tiny", embed_dim=RN_EMBED, vision_layers=RN_LAYERS,
        vision_width=RN_WIDTH, vision_heads=RN_WIDTH * 32 // 64,
        image_resolution=RES, context_length=CTX, vocab_size=VOCAB,
        transformer_width=TXT_W, transformer_heads=TXT_H,
        transformer_layers=TXT_L,
    )
    return ref, CLIP(cfg), params


def test_rn50_spatial_and_attnpool_parity(rn50_pair):
    ref, flax_clip, params = rn50_pair
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        _, ref_sp = ref.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), ret_sp=True
        )
        ref_pooled = ref.visual.attnpool(ref_sp)
    got_sp = flax_clip.apply(
        params, jnp.asarray(img), True, method=CLIP.encode_image
    )
    np.testing.assert_allclose(
        np.asarray(got_sp).transpose(0, 3, 1, 2),
        ref_sp.numpy(), rtol=2e-3, atol=2e-3,
    )
    got_pooled = flax_clip.apply(params, got_sp, method=CLIP.attnpool)
    np.testing.assert_allclose(
        np.asarray(got_pooled), ref_pooled.numpy(), rtol=2e-3, atol=2e-3
    )


def test_text_encoder_parity(rn50_pair):
    ref, flax_clip, params = rn50_pair
    rng = np.random.default_rng(1)
    toks = rng.integers(1, VOCAB // 2, (3, CTX))
    toks[:, 0] = 0
    # EOT pooling picks the argmax token id — plant distinct maxima
    toks[0, 5] = VOCAB - 1
    toks[1, CTX - 1] = VOCAB - 1
    toks[2, 2] = VOCAB - 1
    toks = toks.astype(np.int64)
    with torch.no_grad():
        ref_txt = ref.encode_text(torch.from_numpy(toks))
    got_txt = flax_clip.apply(
        params, jnp.asarray(toks, jnp.int32), method=CLIP.encode_text
    )
    np.testing.assert_allclose(
        np.asarray(got_txt), ref_txt.numpy(), rtol=2e-3, atol=2e-3
    )


def test_vit_parity():
    mod = _load_ref_model_module()
    torch.manual_seed(1)
    ref = mod.CLIP(
        embed_dim=VIT_EMBED, image_resolution=RES, vision_layers=VIT_LAYERS,
        vision_width=VIT_WIDTH, vision_patch_size=32, context_length=CTX,
        vocab_size=VOCAB, transformer_width=TXT_W, transformer_heads=TXT_H,
        transformer_layers=TXT_L,
    ).eval()
    params = jax.tree.map(jnp.asarray, convert(ref.state_dict()))
    cfg = CLIPConfig(
        name="ViT-tiny", embed_dim=VIT_EMBED, vision_layers=(VIT_LAYERS,),
        vision_width=VIT_WIDTH, vision_heads=VIT_WIDTH // 64,
        vision_patch_size=32, is_vit=True, image_resolution=RES,
        context_length=CTX, vocab_size=VOCAB, transformer_width=TXT_W,
        transformer_heads=TXT_H, transformer_layers=TXT_L,
    )
    flax_clip = CLIP(cfg)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        ref_pooled = ref.encode_image(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        ref_p2, ref_sp = ref.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), ret_sp=True
        )
    got_pooled = flax_clip.apply(
        params, jnp.asarray(img), method=CLIP.encode_image
    )
    np.testing.assert_allclose(
        np.asarray(got_pooled), ref_pooled.numpy(), rtol=2e-3, atol=2e-3
    )
    got_sp = flax_clip.apply(
        params, jnp.asarray(img), True, method=CLIP.encode_image
    )
    np.testing.assert_allclose(
        np.asarray(got_sp).transpose(0, 3, 1, 2),
        ref_sp.numpy(), rtol=2e-3, atol=2e-3,
    )


def test_vit_converter_sniffs_vit():
    """convert() must route ViT state dicts through convert_vit_visual."""
    mod = _load_ref_model_module()
    torch.manual_seed(2)
    ref = mod.CLIP(
        embed_dim=VIT_EMBED, image_resolution=RES, vision_layers=VIT_LAYERS,
        vision_width=VIT_WIDTH, vision_patch_size=32, context_length=CTX,
        vocab_size=VOCAB, transformer_width=TXT_W, transformer_heads=TXT_H,
        transformer_layers=TXT_L,
    )
    params = convert(ref.state_dict())
    assert "class_embedding" in params["params"]["visual"]
    assert f"block{VIT_LAYERS-1}" in params["params"]["visual"]


def test_tokenizer_parity_real_merges():
    ref_tok_mod = _load_ref_tokenizer_module()
    ref_tok = ref_tok_mod.SimpleTokenizer(
        "/root/reference/clip/bpe_simple_vocab_16e6.txt.gz"
    )
    from richsem_tpu.models.clip.tokenizer import SimpleTokenizer

    ours = SimpleTokenizer("/root/reference/clip/bpe_simple_vocab_16e6.txt.gz")
    prompts = [
        "a photo of a sea lion.",
        "A bad photo of the {taxicab}!",
        "itap of a doughnut, a type of food",
        "the plushie toy aeroplane's wing-tip",
        "x" * 40,
    ]
    for text in prompts:
        assert ours.encode(text) == ref_tok.encode(text), text
