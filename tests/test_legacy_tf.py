"""TF-era pickle conversion parity vs the reference legacy.py converter.

Builds a synthetic TF-format (G, D, Gs) tflib-Network tuple with random
weights for a tiny StyleGAN2 config, then compares, numerically:

- reference path: legacy.py convert_tf_generator/_discriminator
  (legacy.py:109-291) -> torch networks_stylegan2 modules on CPU;
- tgi path: the same pickle bytes through the code-free unpickler ->
  tgi.io.legacy_tf -> tgi.models.stylegan2 / tgi.nn.discriminator.

Pixel-level agreement of both outputs proves the TF variable mapping
(transposes, up-conv kernel flips, noise indexing, mod_bias+1) matches
the reference exactly. Requires /root/reference; skipped elsewhere.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

RES = 16          # blocks: 4, 8, 16
FMAP_BASE = 1024  # channel_base 2048 -> 64 channels everywhere (cap 64)
CH = 64
ZW = 64


def _g_static_kwargs():
    return dict(latent_size=ZW, dlatent_size=ZW, resolution=RES,
                fmap_base=FMAP_BASE, fmap_max=CH, mapping_layers=2,
                nonlinearity="lrelu", resample_kernel=[1, 3, 3, 1],
                truncation_psi=0.5, style_mixing_prob=0.9)


def _d_static_kwargs():
    return dict(resolution=RES, fmap_base=FMAP_BASE, fmap_max=CH,
                mbstd_group_size=4, nonlinearity="lrelu",
                resample_kernel=[1, 3, 3, 1])


def _tf_generator_variables(rng):
    """TF layouts: conv [kh,kw,in,out], dense [in,out], const [1,C,4,4],
    noise [1,1,r,r] — exactly what legacy.py:173-205 expects to find."""
    s = 0.3
    mapping = [(f"Dense{i}/{n}",
                rng.randn(*shape).astype(np.float32) * s)
               for i in range(2)
               for n, shape in [("weight", (ZW, ZW)), ("bias", (ZW,))]]
    syn = [("4x4/Const/const", rng.randn(1, CH, 4, 4).astype(np.float32))]

    def conv(name, cin, cout, k=3):
        return [(f"{name}/weight", rng.randn(k, k, cin, cout)
                 .astype(np.float32) * s),
                (f"{name}/bias", rng.randn(cout).astype(np.float32) * s),
                (f"{name}/noise_strength",
                 np.float32(rng.randn() * 0.05)),
                (f"{name}/mod_weight", rng.randn(ZW, cin)
                 .astype(np.float32) * s),
                (f"{name}/mod_bias", rng.randn(cin).astype(np.float32) * s)]

    def torgb(name, cin):
        return [(f"{name}/weight", rng.randn(1, 1, cin, 3)
                 .astype(np.float32) * s),
                (f"{name}/bias", rng.randn(3).astype(np.float32) * s),
                (f"{name}/mod_weight", rng.randn(ZW, cin)
                 .astype(np.float32) * s),
                (f"{name}/mod_bias", rng.randn(cin).astype(np.float32) * s)]

    syn += conv("4x4/Conv", CH, CH) + torgb("4x4/ToRGB", CH)
    for r in (8, 16):
        syn += conv(f"{r}x{r}/Conv0_up", CH, CH)
        syn += conv(f"{r}x{r}/Conv1", CH, CH)
        syn += torgb(f"{r}x{r}/ToRGB", CH)
    for idx, r in [(0, 4), (1, 8), (2, 8), (3, 16), (4, 16)]:
        syn.append((f"noise{idx}",
                    rng.randn(1, 1, r, r).astype(np.float32)))
    top = [("dlatent_avg", rng.randn(ZW).astype(np.float32) * s),
           ("lod", np.float32(0.0))]   # extra var: must be ignored
    return top, mapping, syn


def _tf_discriminator_variables(rng):
    s = 0.3
    out = []

    def conv(name, cin, cout, k=3, bias=True):
        out.append((f"{name}/weight",
                    rng.randn(k, k, cin, cout).astype(np.float32) * s))
        if bias:
            out.append((f"{name}/bias",
                        rng.randn(cout).astype(np.float32) * s))

    conv("16x16/FromRGB", 3, CH, k=1)
    for r in (16, 8):
        conv(f"{r}x{r}/Conv0", CH, CH)
        conv(f"{r}x{r}/Conv1_down", CH, CH)
        conv(f"{r}x{r}/Skip", CH, CH, k=1, bias=False)
    conv("4x4/Conv", CH + 1, CH)            # +1: mbstd channel
    out.append(("4x4/Dense0/weight",
                rng.randn(CH * 16, CH).astype(np.float32) * s))
    out.append(("4x4/Dense0/bias", rng.randn(CH).astype(np.float32) * s))
    out.append(("Output/weight", rng.randn(CH, 1).astype(np.float32) * s))
    out.append(("Output/bias", rng.randn(1).astype(np.float32) * s))
    return out


@pytest.fixture(scope="module")
def tf_pickle_blob():
    """Pickle a (G, D, Gs) tuple under the dnnlib.tflib.network module
    path, exactly as a TF-era export references it."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import dnnlib  # the real reference package, so legacy.py still works

    assert hasattr(dnnlib, "EasyDict")
    created = []
    for name in ("dnnlib.tflib", "dnnlib.tflib.network"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            created.append(name)
    netmod = sys.modules["dnnlib.tflib.network"]

    class Network:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    netmod.Network = Network

    rng = np.random.RandomState(7)
    g_top, g_map, g_syn = _tf_generator_variables(rng)
    G = Network(version=4, name="G",
                static_kwargs=_g_static_kwargs(),
                variables=g_top,
                components={
                    "mapping": Network(version=4, name="G_mapping",
                                       static_kwargs={}, variables=g_map,
                                       components={}),
                    "synthesis": Network(version=4, name="G_synthesis",
                                         static_kwargs={}, variables=g_syn,
                                         components={})})
    D = Network(version=4, name="D", static_kwargs=_d_static_kwargs(),
                variables=_tf_discriminator_variables(rng), components={})
    blob = pickle.dumps((G, D, G), protocol=2)
    yield blob
    for name in created:
        sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def ref_legacy():
    import torch  # noqa: F401
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import legacy
    return legacy


def _ref_stub_from(legacy_mod, blob, index):
    import io
    return legacy_mod._LegacyUnpickler(io.BytesIO(blob)).load()[index]


@pytest.fixture(scope="module")
def converted(tf_pickle_blob):
    from tgi.io import load_network_pkl
    return load_network_pkl(tf_pickle_blob)


def test_generator_parity(tf_pickle_blob, ref_legacy, converted):
    import torch
    from tgi.models.stylegan2 import sg2_generator_apply

    tf_G = _ref_stub_from(ref_legacy, tf_pickle_blob, 0)
    ref_G = ref_legacy.convert_tf_generator(tf_G)

    net = converted["G_ema"]
    assert net.kind == "generator"
    assert net.config.img_resolution == RES
    assert net.config.channel_base == FMAP_BASE * 2
    assert net.config.mapping_layers == 2

    rng = np.random.RandomState(1)
    z = rng.randn(2, ZW).astype(np.float32)
    with torch.no_grad():
        want = ref_G(torch.as_tensor(z), torch.zeros(2, 0),
                     noise_mode="const").numpy()
    got = np.asarray(sg2_generator_apply(
        net.params, jnp.asarray(z), jnp.zeros((2, 0)), net.config,
        noise_mode="const"))
    assert got.shape == want.shape == (2, 3, RES, RES)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


def test_discriminator_parity(tf_pickle_blob, ref_legacy, converted):
    import torch
    from tgi.nn.discriminator import discriminator_apply

    tf_D = _ref_stub_from(ref_legacy, tf_pickle_blob, 1)
    ref_D = ref_legacy.convert_tf_discriminator(tf_D)

    net = converted["D"]
    assert net.kind == "discriminator"
    assert net.config.img_channels == 3

    rng = np.random.RandomState(2)
    img = rng.randn(2, 3, RES, RES).astype(np.float32)
    with torch.no_grad():
        want = ref_D(torch.as_tensor(img), torch.zeros(2, 0)).numpy()
    got = np.asarray(discriminator_apply(
        net.params, jnp.asarray(img), jnp.zeros((2, 0)), net.config))
    assert got.shape == want.shape == (2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


def test_tuple_shape_and_missing_fields(converted):
    """legacy.py:28-39 contract: G/D/G_ema entries + defaulted fields."""
    assert set(converted) >= {"G", "D", "G_ema",
                              "training_set_kwargs", "augment_pipe"}
    assert converted["training_set_kwargs"] is None
    assert converted["augment_pipe"] is None


def test_load_generator_rejects_tf(tf_pickle_blob, tmp_path):
    from tgi.io.pickle_import import load_generator
    p = tmp_path / "tf.pkl"
    p.write_bytes(tf_pickle_blob)
    with pytest.raises(ValueError, match="2D StyleGAN2"):
        load_generator(str(p))


def _fresh_stub(blob, index):
    import io
    from tgi.io.pickle_import import ReferenceUnpickler
    return ReferenceUnpickler(io.BytesIO(blob)).load()[index]


def test_unknown_kwarg_rejected(tf_pickle_blob):
    from tgi.io.legacy_tf import convert_tf_generator
    stub = _fresh_stub(tf_pickle_blob, 0)
    # unpickled state lives in __dict__ (attribute lookup precedence over
    # the EasyDict item fallback) — mutate it there
    stub.__dict__["static_kwargs"] = dict(stub.static_kwargs, bogus_knob=3)
    with pytest.raises(ValueError, match="bogus_knob"):
        convert_tf_generator(stub)


def test_progressive_growing_rejected(tf_pickle_blob):
    from tgi.io.legacy_tf import convert_tf_generator
    stub = _fresh_stub(tf_pickle_blob, 0)
    syn = stub.components["synthesis"]
    syn.__dict__["variables"] = (
        list(syn.variables)
        + [("ToRGB_lod0/weight", np.zeros((1, 1, CH, 3), np.float32))])
    with pytest.raises(NotImplementedError, match="ToRGB_lod"):
        convert_tf_generator(stub)


def test_conditional_parity(ref_legacy):
    """label_size > 0 exercises the LabelEmbed transposes: G's class
    embedding concatenated into the mapping input (legacy.py:175-176) and
    D's projection-discriminator cmap head (legacy.py:279-288)."""
    import torch
    from tgi.io.legacy_tf import (convert_tf_discriminator,
                                  convert_tf_generator)
    from tgi.models.stylegan2 import sg2_generator_apply
    from tgi.nn.discriminator import discriminator_apply

    rng = np.random.RandomState(9)
    s, C_DIM, R = 0.3, 2, 8
    ch = {4: CH, 8: CH}

    g_vars = [("dlatent_avg", rng.randn(ZW).astype(np.float32) * s)]
    g_map = [("LabelEmbed/weight", rng.randn(C_DIM, ZW)
              .astype(np.float32) * s),
             ("LabelEmbed/bias", rng.randn(ZW).astype(np.float32) * s),
             ("Dense0/weight", rng.randn(2 * ZW, ZW).astype(np.float32) * s),
             ("Dense0/bias", rng.randn(ZW).astype(np.float32) * s)]
    g_syn = [("4x4/Const/const", rng.randn(1, CH, 4, 4).astype(np.float32))]

    def g_conv(name, noise_r):
        return [(f"{name}/weight", rng.randn(3, 3, CH, CH)
                 .astype(np.float32) * s),
                (f"{name}/bias", rng.randn(CH).astype(np.float32) * s),
                (f"{name}/noise_strength", np.float32(0.02)),
                (f"{name}/mod_weight", rng.randn(ZW, CH)
                 .astype(np.float32) * s),
                (f"{name}/mod_bias", rng.randn(CH).astype(np.float32) * s)]

    def g_torgb(name):
        return [(f"{name}/weight", rng.randn(1, 1, CH, 3)
                 .astype(np.float32) * s),
                (f"{name}/bias", rng.randn(3).astype(np.float32) * s),
                (f"{name}/mod_weight", rng.randn(ZW, CH)
                 .astype(np.float32) * s),
                (f"{name}/mod_bias", rng.randn(CH).astype(np.float32) * s)]

    g_syn += g_conv("4x4/Conv", 4) + g_torgb("4x4/ToRGB")
    g_syn += g_conv("8x8/Conv0_up", 8) + g_conv("8x8/Conv1", 8)
    g_syn += g_torgb("8x8/ToRGB")
    for idx, r in [(0, 4), (1, 8), (2, 8)]:
        g_syn.append((f"noise{idx}",
                      rng.randn(1, 1, r, r).astype(np.float32)))

    kw = dict(latent_size=ZW, dlatent_size=ZW, label_size=C_DIM,
              resolution=R, fmap_base=FMAP_BASE, fmap_max=CH,
              mapping_layers=1)
    Stub = ref_legacy._TFNetworkStub
    tf_G = Stub(version=4, name="G", static_kwargs=kw, variables=g_vars,
                components={
                    "mapping": Stub(version=4, name="m", static_kwargs={},
                                    variables=g_map, components={}),
                    "synthesis": Stub(version=4, name="s", static_kwargs={},
                                      variables=g_syn, components={})})

    ref_G = ref_legacy.convert_tf_generator(tf_G)
    net = convert_tf_generator(tf_G)
    assert net.config.c_dim == C_DIM

    z = np.random.RandomState(4).randn(2, ZW).astype(np.float32)
    c = np.eye(2, C_DIM, dtype=np.float32)
    with torch.no_grad():
        want = ref_G(torch.as_tensor(z), torch.as_tensor(c),
                     noise_mode="const").numpy()
    got = np.asarray(sg2_generator_apply(
        net.params, jnp.asarray(z), jnp.asarray(c), net.config,
        noise_mode="const"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)

    # Conditional discriminator: LabelEmbed -> cmap projection head.
    d_vars = []

    def d_conv(name, cin, cout, k=3, bias=True):
        d_vars.append((f"{name}/weight",
                       rng.randn(k, k, cin, cout).astype(np.float32) * s))
        if bias:
            d_vars.append((f"{name}/bias",
                           rng.randn(cout).astype(np.float32) * s))

    d_conv("8x8/FromRGB", 3, CH, k=1)
    d_conv("8x8/Conv0", CH, CH)
    d_conv("8x8/Conv1_down", CH, CH)
    d_conv("8x8/Skip", CH, CH, k=1, bias=False)
    d_conv("4x4/Conv", CH + 1, CH)
    d_vars += [("LabelEmbed/weight", rng.randn(C_DIM, CH)
                .astype(np.float32) * s),
               ("LabelEmbed/bias", rng.randn(CH).astype(np.float32) * s),
               ("4x4/Dense0/weight",
                rng.randn(CH * 16, CH).astype(np.float32) * s),
               ("4x4/Dense0/bias", rng.randn(CH).astype(np.float32) * s),
               ("Output/weight", rng.randn(CH, CH).astype(np.float32) * s),
               ("Output/bias", rng.randn(CH).astype(np.float32) * s)]
    tf_D = Stub(version=4, name="D",
                static_kwargs=dict(label_size=C_DIM, resolution=R,
                                   fmap_base=FMAP_BASE, fmap_max=CH,
                                   mbstd_group_size=2),
                variables=d_vars, components={})
    ref_D = ref_legacy.convert_tf_discriminator(tf_D)
    dnet = convert_tf_discriminator(tf_D)
    img = np.random.RandomState(5).randn(2, 3, R, R).astype(np.float32)
    with torch.no_grad():
        want_d = ref_D(torch.as_tensor(img), torch.as_tensor(c)).numpy()
    got_d = np.asarray(discriminator_apply(
        dnet.params, jnp.asarray(img), jnp.asarray(c), dnet.config))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=3e-4)


def test_convert_cli_roundtrip(tf_pickle_blob, tmp_path):
    from tgi.apps.legacy_convert import convert_pickle
    from tgi.io import load_checkpoint
    src = tmp_path / "tf.pkl"
    src.write_bytes(tf_pickle_blob)
    dst = tmp_path / "tgi.ckpt"
    kinds = convert_pickle(str(src), str(dst))
    assert kinds == {"G": "sg2_generator", "D": "sg2_discriminator",
                     "G_ema": "sg2_generator"}
    out = load_checkpoint(str(dst))
    assert out["config"]["G_ema"]["kind"] == "sg2_generator"
    assert "synthesis" in out["params"]["G_ema"]
