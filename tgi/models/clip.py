"""CLIP ViT-B/32 dual encoder (image + text) with BPE tokenizer.

Behavioral parity target: /root/reference/criteria/clip_loss.py:6-18 loads
``clip.load("ViT-B/32")`` and evaluates ``model(image, text)[0]`` =
``logits_per_image``. This module provides the same model as a functional
JAX pair (``clip_init``/``clip_apply``) plus converters for BOTH published
checkpoint layouts:

- HuggingFace ``transformers.CLIPModel`` state_dicts
  (``vision_model.encoder.layers.N.self_attn.q_proj...``), and
- the original OpenAI ``clip`` package state_dicts
  (``visual.transformer.resblocks.N.attn.in_proj_weight...``), detected
  automatically and remapped onto the HF naming used by our pytree.

Architecture notes (both implementations agree):
- pre-LN transformer blocks, QuickGELU activation ``x*sigmoid(1.702x)``,
  LayerNorm eps 1e-5;
- vision tower: 32x32 stride-32 patch conv (no bias), CLS token, learned
  positions, pre-LN on the embedded sequence, ``post_layernorm`` on the
  CLS state, linear projection (no bias) to the shared space;
- text tower: causal attention, final LayerNorm, pooled at the position
  of ``argmax(token_ids)`` — valid for the OpenAI vocabulary where
  ``<|endoftext|>`` (49407) is the largest id;
- ``logits_per_image = exp(logit_scale) * norm(img) @ norm(txt).T``.

The tokenizer reimplements OpenAI's byte-level BPE
(``clip/simple_tokenizer.py``): the user supplies the published merges
file ``bpe_simple_vocab_16e6.txt.gz`` (gz or plain); vocabulary is
derived from it exactly as upstream. ``ftfy`` text fixing is not
available offline and is replaced by NFC normalization — identical on
already-clean ASCII prompts.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import html
import re
import unicodedata

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    """ViT-B/32 by default; fields sized down freely for tests."""
    embed_dim: int = 512
    # vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8


# ---------------------------------------------------------------------------
# init


def _ln_init(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _linear_init(key, d_in, d_out, std=0.02):
    return {"weight": jax.random.normal(key, (d_out, d_in)) * std,
            "bias": jnp.zeros((d_out,))}


def _layer_init(key, width, mlp_ratio=4):
    ks = jax.random.split(key, 6)
    return {
        "self_attn": {
            "q_proj": _linear_init(ks[0], width, width),
            "k_proj": _linear_init(ks[1], width, width),
            "v_proj": _linear_init(ks[2], width, width),
            "out_proj": _linear_init(ks[3], width, width),
        },
        "layer_norm1": _ln_init(width),
        "layer_norm2": _ln_init(width),
        "mlp": {"fc1": _linear_init(ks[4], width, width * mlp_ratio),
                "fc2": _linear_init(ks[5], width * mlp_ratio, width)},
    }


def clip_init(key, cfg: ClipConfig = ClipConfig()):
    """Random-init params pytree in the HF CLIPModel naming scheme."""
    kv, kt, kcls, kpatch, kvpos, ktok, ktpos, kvp, ktp = \
        jax.random.split(key, 9)
    grid = cfg.image_size // cfg.patch_size
    vision = {
        "embeddings": {
            "class_embedding": jax.random.normal(
                kcls, (cfg.vision_width,)) * 0.02,
            "patch_embedding": {"weight": jax.random.normal(
                kpatch, (cfg.vision_width, 3, cfg.patch_size,
                         cfg.patch_size)) * 0.02},
            "position_embedding": {"weight": jax.random.normal(
                kvpos, (grid * grid + 1, cfg.vision_width)) * 0.02},
        },
        "pre_layrnorm": _ln_init(cfg.vision_width),  # sic — HF's spelling
        "encoder": {"layers": {
            str(i): _layer_init(k, cfg.vision_width)
            for i, k in enumerate(jax.random.split(kv, cfg.vision_layers))}},
        "post_layernorm": _ln_init(cfg.vision_width),
    }
    text = {
        "embeddings": {
            "token_embedding": {"weight": jax.random.normal(
                ktok, (cfg.vocab_size, cfg.text_width)) * 0.02},
            "position_embedding": {"weight": jax.random.normal(
                ktpos, (cfg.context_length, cfg.text_width)) * 0.02},
        },
        "encoder": {"layers": {
            str(i): _layer_init(k, cfg.text_width)
            for i, k in enumerate(jax.random.split(kt, cfg.text_layers))}},
        "final_layer_norm": _ln_init(cfg.text_width),
    }
    return {
        "logit_scale": jnp.asarray(2.6592),  # ln(1/0.07), CLIP's init
        "vision_model": vision,
        "text_model": text,
        "visual_projection": {"weight": jax.random.normal(
            kvp, (cfg.embed_dim, cfg.vision_width)) * 0.02},
        "text_projection": {"weight": jax.random.normal(
            ktp, (cfg.embed_dim, cfg.text_width)) * 0.02},
    }


# ---------------------------------------------------------------------------
# apply


def _ln(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _linear(p, x):
    return x @ p["weight"].T + p["bias"]


def _attention(p, x, heads, causal=False):
    n, L, d = x.shape
    hd = d // heads
    q = _linear(p["q_proj"], x).reshape(n, L, heads, hd)
    k = _linear(p["k_proj"], x).reshape(n, L, heads, hd)
    v = _linear(p["v_proj"], x).reshape(n, L, heads, hd)
    scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (hd ** -0.5)
    if causal:
        mask = jnp.tril(jnp.ones((L, L), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, L, d)
    return _linear(p["out_proj"], out)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _block(p, x, heads, causal):
    x = x + _attention(p["self_attn"], _ln(p["layer_norm1"], x), heads,
                       causal)
    h = _quick_gelu(_linear(p["mlp"]["fc1"], _ln(p["layer_norm2"], x)))
    return x + _linear(p["mlp"]["fc2"], h)


def encode_image(params, pixels, cfg: ClipConfig = ClipConfig()):
    """pixels: [N, 3, H, W] -> [N, embed_dim] (unnormalized)."""
    vm = params["vision_model"]
    patches = jax.lax.conv_general_dilated(
        pixels, vm["embeddings"]["patch_embedding"]["weight"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID")
    n, w, gh, gw = patches.shape
    x = patches.reshape(n, w, gh * gw).transpose(0, 2, 1)
    cls = jnp.broadcast_to(vm["embeddings"]["class_embedding"], (n, 1, w))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vm["embeddings"]["position_embedding"]["weight"]
    x = _ln(vm["pre_layrnorm"], x)
    for i in range(cfg.vision_layers):
        x = _block(vm["encoder"]["layers"][str(i)], x, cfg.vision_heads,
                   causal=False)
    pooled = _ln(vm["post_layernorm"], x[:, 0])
    return pooled @ params["visual_projection"]["weight"].T


def encode_text(params, token_ids, cfg: ClipConfig = ClipConfig()):
    """token_ids: [N, L] int32 -> [N, embed_dim] (unnormalized)."""
    tm = params["text_model"]
    x = tm["embeddings"]["token_embedding"]["weight"][token_ids]
    x = x + tm["embeddings"]["position_embedding"]["weight"][
        :token_ids.shape[1]]
    for i in range(cfg.text_layers):
        x = _block(tm["encoder"]["layers"][str(i)], x, cfg.text_heads,
                   causal=True)
    x = _ln(tm["final_layer_norm"], x)
    pooled = x[jnp.arange(x.shape[0]), jnp.argmax(token_ids, axis=-1)]
    return pooled @ params["text_projection"]["weight"].T


def clip_apply(params, pixels, token_ids, cfg: ClipConfig = ClipConfig()):
    """Return (logits_per_image [N_img, N_txt], logits_per_text)."""
    ie = encode_image(params, pixels, cfg)
    te = encode_text(params, token_ids, cfg)
    ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * ie @ te.T
    return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# checkpoint converters


def _nest(flat: dict) -> dict:
    out: dict = {}
    for name, v in flat.items():
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def _remap_openai(sd: dict) -> dict:
    """OpenAI clip-package names -> HF CLIPModel names (values adjusted)."""
    import numpy as np
    out: dict = {}

    def tower(prefix_in, prefix_out):
        rx = re.compile(re.escape(prefix_in) + r"transformer\.resblocks\."
                        r"(\d+)\.(.*)")
        for name in list(sd):
            m = rx.match(name)
            if not m:
                continue
            i, rest = m.group(1), m.group(2)
            base = f"{prefix_out}encoder.layers.{i}."
            v = np.asarray(sd.pop(name))
            if rest.startswith("attn.in_proj_"):
                kind = rest[len("attn.in_proj_"):]  # weight | bias
                q, k, vv = np.split(v, 3, axis=0)
                for pn, pv in (("q_proj", q), ("k_proj", k), ("v_proj", vv)):
                    out[f"{base}self_attn.{pn}.{kind}"] = pv
            else:
                rest = (rest
                        .replace("attn.out_proj", "self_attn.out_proj")
                        .replace("ln_1", "layer_norm1")
                        .replace("ln_2", "layer_norm2")
                        .replace("mlp.c_fc", "mlp.fc1")
                        .replace("mlp.c_proj", "mlp.fc2"))
                out[base + rest] = v

    tower("visual.", "vision_model.")
    tower("", "text_model.")
    simple = {
        "visual.class_embedding": "vision_model.embeddings.class_embedding",
        "visual.conv1.weight":
            "vision_model.embeddings.patch_embedding.weight",
        "visual.positional_embedding":
            "vision_model.embeddings.position_embedding.weight",
        "visual.ln_pre.weight": "vision_model.pre_layrnorm.weight",
        "visual.ln_pre.bias": "vision_model.pre_layrnorm.bias",
        "visual.ln_post.weight": "vision_model.post_layernorm.weight",
        "visual.ln_post.bias": "vision_model.post_layernorm.bias",
        "token_embedding.weight":
            "text_model.embeddings.token_embedding.weight",
        "positional_embedding":
            "text_model.embeddings.position_embedding.weight",
        "ln_final.weight": "text_model.final_layer_norm.weight",
        "ln_final.bias": "text_model.final_layer_norm.bias",
        "logit_scale": "logit_scale",
    }
    for src, dst in simple.items():
        if src in sd:
            out[dst] = np.asarray(sd.pop(src))
    # projections are stored [width, embed] and used as x @ proj upstream;
    # HF stores the transpose and applies x @ W.T.
    if "visual.proj" in sd:
        out["visual_projection.weight"] = np.asarray(sd.pop("visual.proj")).T
    if "text_projection" in sd:
        out["text_projection.weight"] = \
            np.asarray(sd.pop("text_projection")).T
    return out


def convert_torch_state_dict(sd: dict) -> dict:
    """Port an HF CLIPModel or OpenAI clip-package state_dict."""
    import numpy as np
    sd = {k: v for k, v in sd.items()}
    if any(k.startswith("visual.conv1") for k in sd):
        sd = _remap_openai(sd)
    flat = {}
    for name, v in sd.items():
        if ("position_ids" in name or "num_batches_tracked" in name
                or name.endswith("attn_mask")):
            continue
        # some HF dumps carry the towers under text_model./vision_model.
        # twice (CLIPModel wraps CLIPTextTransformer at .text_model) —
        # collapse the duplicate level if present.
        name = name.replace("text_model.text_model.", "text_model.") \
                   .replace("vision_model.vision_model.", "vision_model.")
        flat[name] = jnp.asarray(np.asarray(v), jnp.float32)
    return _nest(flat)


# ---------------------------------------------------------------------------
# tokenizer (OpenAI byte-level BPE; clip/simple_tokenizer.py semantics)


@functools.lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class SimpleTokenizer:
    """OpenAI CLIP BPE tokenizer fed by the published merges file.

    ``bpe_path``: ``bpe_simple_vocab_16e6.txt.gz`` (gzip or plain text).
    The vocabulary is derived from the merges exactly as upstream:
    256 byte symbols, their ``</w>`` forms, 48894 merge tokens, and the
    two specials — 49408 entries total for the published file.
    """

    def __init__(self, bpe_path: str):
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {t: i for i, t in enumerate(vocab)}
        self.decoder = {i: t for t, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        # \p{L}/\p{N} approximated with stdlib re's unicode classes
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[^\W\d_]+|\d|[^\s\w]+", re.IGNORECASE)

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        word = " ".join(word)
        self.cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        text = unicodedata.normalize("NFC", html.unescape(html.unescape(
            text)))
        text = re.sub(r"\s+", " ", text).strip().lower()
        ids = []
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts, context_length: int = 77):
        """[clip.tokenize] -> int32 [N, context_length], truncating."""
        if isinstance(texts, str):
            texts = [texts]
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = jnp.zeros((len(texts), context_length), jnp.int32)
        rows = []
        for text in texts:
            ids = [sot] + self.encode(text)[:context_length - 2] + [eot]
            rows.append(jnp.asarray(
                ids + [0] * (context_length - len(ids)), jnp.int32))
        out = jnp.stack(rows)
        return out
