"""CLIP model/tokenizer/loss parity tests.

Parity targets: /root/reference/criteria/clip_loss.py:6-18 (loss formula
and pooling) and the ViT-B/32 dual encoder it loads. The model itself is
validated against the in-process HuggingFace ``transformers.CLIPModel``
(random-init tiny config, CPU) — the same weights any published CLIP
checkpoint would load through ``convert_torch_state_dict``.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tgi.io.validate import expected_spec, validate_tree
from tgi.losses.clip_loss import clip_loss, clip_pool
from tgi.models.clip import (ClipConfig, SimpleTokenizer, clip_apply,
                             clip_init, convert_torch_state_dict)

TINY = ClipConfig(embed_dim=20, image_size=32, patch_size=16,
                  vision_width=32, vision_layers=2, vision_heads=2,
                  vocab_size=64, context_length=16, text_width=24,
                  text_layers=2, text_heads=2)


def _tiny_hf_model():
    from transformers import CLIPConfig as HFConfig
    from transformers import CLIPModel
    cfg = HFConfig(
        text_config=dict(hidden_size=24, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=2,
                         vocab_size=64, max_position_embeddings=16,
                         hidden_act="quick_gelu", eos_token_id=63,
                         bos_token_id=62, pad_token_id=0),
        vision_config=dict(hidden_size=32, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=16,
                           hidden_act="quick_gelu"),
        projection_dim=20)
    torch.manual_seed(0)
    return CLIPModel(cfg).eval()


def _inputs():
    rng = np.random.RandomState(1)
    px = rng.randn(2, 3, 32, 32).astype(np.float32)
    ids = rng.randint(1, 62, size=(3, 16))
    # one <|endoftext|> (= max id 63) per row: argmax pooling (ours,
    # OpenAI) and first-eos pooling (HF) agree.
    for r, pos in enumerate([5, 9, 15]):
        ids[r, pos] = 63
        ids[r, pos + 1:] = 0
    return px, ids.astype(np.int32)


def test_hf_checkpoint_parity():
    model = _tiny_hf_model()
    px, ids = _inputs()
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                     pixel_values=torch.from_numpy(px))
    params = convert_torch_state_dict(model.state_dict())
    validate_tree(params, expected_spec(
        lambda: clip_init(jax.random.PRNGKey(0), TINY)), "clip")
    got_img, got_txt = clip_apply(params, jnp.asarray(px),
                                  jnp.asarray(ids), TINY)
    np.testing.assert_allclose(np.asarray(got_img),
                               want.logits_per_image.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_txt),
                               want.logits_per_text.numpy(),
                               rtol=1e-4, atol=1e-4)


def _to_openai_layout(sd):
    """Repack an HF CLIPModel state_dict into the OpenAI clip-package
    naming (models/e4e-style inverse of _remap_openai) for converter
    coverage of the second published layout."""
    out = {}
    qkv = {}
    for name, v in sd.items():
        if "position_ids" in name:
            continue
        m_layer = None
        for tower, pfx in (("vision_model.", "visual.transformer."),
                           ("text_model.", "transformer.")):
            key = tower + "encoder.layers."
            if name.startswith(key):
                rest = name[len(key):]
                i, sub = rest.split(".", 1)
                m_layer = (f"{pfx}resblocks.{i}.", sub)
                break
        if m_layer:
            base, sub = m_layer
            if sub.startswith("self_attn.") and "out_proj" not in sub:
                # collect q/k/v into in_proj
                _, proj, kind = sub.split(".")
                qkv.setdefault((base, kind), {})[proj] = v
                continue
            sub = (sub.replace("self_attn.out_proj", "attn.out_proj")
                      .replace("layer_norm1", "ln_1")
                      .replace("layer_norm2", "ln_2")
                      .replace("mlp.fc1", "mlp.c_fc")
                      .replace("mlp.fc2", "mlp.c_proj"))
            out[base + sub] = v
            continue
        simple = {
            "vision_model.embeddings.class_embedding":
                "visual.class_embedding",
            "vision_model.embeddings.patch_embedding.weight":
                "visual.conv1.weight",
            "vision_model.embeddings.position_embedding.weight":
                "visual.positional_embedding",
            "vision_model.pre_layrnorm.weight": "visual.ln_pre.weight",
            "vision_model.pre_layrnorm.bias": "visual.ln_pre.bias",
            "vision_model.post_layernorm.weight": "visual.ln_post.weight",
            "vision_model.post_layernorm.bias": "visual.ln_post.bias",
            "text_model.embeddings.token_embedding.weight":
                "token_embedding.weight",
            "text_model.embeddings.position_embedding.weight":
                "positional_embedding",
            "text_model.final_layer_norm.weight": "ln_final.weight",
            "text_model.final_layer_norm.bias": "ln_final.bias",
            "logit_scale": "logit_scale",
        }
        if name in simple:
            out[simple[name]] = v
        elif name == "visual_projection.weight":
            out["visual.proj"] = v.T
        elif name == "text_projection.weight":
            out["text_projection"] = v.T
    for (base, kind), parts in qkv.items():
        out[base + "attn.in_proj_" + kind] = torch.cat(
            [parts["q_proj"], parts["k_proj"], parts["v_proj"]], dim=0)
    return out


def test_openai_layout_converts_identically():
    model = _tiny_hf_model()
    hf = convert_torch_state_dict(model.state_dict())
    oa = convert_torch_state_dict(_to_openai_layout(model.state_dict()))
    flat_hf = jax.tree_util.tree_leaves_with_path(hf)
    flat_oa = dict(jax.tree_util.tree_leaves_with_path(oa))
    assert len(flat_hf) == len(flat_oa)
    for path, leaf in flat_hf:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_oa[path]),
                                      err_msg=str(path))


def test_clip_pool_matches_torch():
    """clip_loss.py:10-14 — Upsample(x7, nearest) + AvgPool2d(size//32)."""
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    up = torch.nn.Upsample(scale_factor=7)
    pool = torch.nn.AvgPool2d(kernel_size=64 // 32)
    want = pool(up(torch.from_numpy(x))).numpy()
    got = clip_pool(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_clip_loss_formula():
    params = clip_init(jax.random.PRNGKey(3), TINY)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32))
    _, ids = _inputs()
    pooled = clip_pool(img, stylegan_size=224)  # k=7: 224 -> 32px
    assert pooled.shape[2] == 32
    logits, _ = clip_apply(params, pooled, jnp.asarray(ids), TINY)
    loss = clip_loss(params, img, jnp.asarray(ids), TINY,
                     stylegan_size=224)
    np.testing.assert_allclose(np.asarray(loss),
                               1.0 - np.asarray(logits) / 100.0,
                               rtol=1e-6)


def _tiny_merges(tmp_path):
    lines = ["#version: tiny", "h e", "l l", "he ll", "o</w> !</w>",
             "hell o</w>"]
    p = tmp_path / "merges.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_tokenizer_bpe(tmp_path):
    tok = SimpleTokenizer(_tiny_merges(tmp_path))
    # 'hello' -> h e l l o</w> -> he ll o</w> -> hell o</w> -> hello</w>
    assert tok.bpe("hello") == "hello</w>"
    ids = tok.encode("Hello  HELLO")
    assert len(ids) == 2 and ids[0] == ids[1]  # lowercased + ws-cleaned
    assert tok.decode(ids).strip() == "hello hello"
    arr = tok.tokenize(["hello", "hello hello hello"], context_length=4)
    assert arr.shape == (2, 4)
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert int(arr[0, 0]) == sot and int(arr[0, 2]) == eot
    assert int(arr[1, 3]) == eot  # truncated to context
    assert int(arr[0, 3]) == 0  # padded


def test_tokenizer_gzip_and_bytes(tmp_path):
    import gzip as _gzip
    src = _tiny_merges(tmp_path)
    gz = str(tmp_path / "merges.txt.gz")
    with open(src, "rb") as f, _gzip.open(gz, "wb") as g:
        g.write(f.read())
    tok = SimpleTokenizer(gz)
    assert tok.bpe("hello") == "hello</w>"
    # non-ASCII round-trips through the byte encoder
    ids = tok.encode("café!")
    assert tok.decode(ids).strip().startswith("café")
