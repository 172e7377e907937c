"""SG3 weight-port parity vs the reference networks_stylegan3 on CPU.

Same strategy as test_weight_parity: instantiate the reference alias-free
generator (CUDA ops auto-fall back to ref paths on CPU), port its
state_dict by structural rename, compare outputs.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def convert_sg3_state_dict(sd):
    """Reference SG3 names -> tgi SG3 params tree.

    mapping.fc0.* -> mapping.fc0.*; synthesis.input.* -> synthesis.input.*;
    synthesis.L{i}_{size}_{ch}.* -> synthesis.L{i}.*.
    """
    import re
    out = {"mapping": {}, "synthesis": {}}
    for name, v in sd.items():
        if name.endswith(("up_filter", "down_filter")):
            continue      # Kaiser filters are static trace-time constants
        val = jnp.asarray(np.asarray(v), jnp.float32)
        parts = name.split(".")
        if parts[0] == "mapping":
            node = out["mapping"]
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
        elif parts[0] == "synthesis":
            key = parts[1]
            m = re.match(r"L(\d+)_\d+_\d+", key)
            if m:
                key = f"L{m.group(1)}"
            node = out["synthesis"].setdefault(key, {})
            for p in parts[2:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
    return out


def test_sg3_generator_parity(rng):
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.manual_seed(0)
    from training.networks_stylegan3 import Generator as RefSG3

    from tgi.nn.synthesis3 import SG3Config, SG3Generator

    res, zdim = 32, 16
    ref = RefSG3(z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res,
                 img_channels=3, channel_base=1024, channel_max=16,
                 num_layers=6, margin_size=4, num_fp16_res=0,
                 mapping_kwargs={"num_layers": 2}).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = SG3Config(z_dim=zdim, w_dim=zdim, img_resolution=res,
                    channel_base=1024, channel_max=16, num_layers=6,
                    margin_size=4, num_fp16_res=0, mapping_layers=2)
    G3 = SG3Generator(cfg)
    params = convert_sg3_state_dict(sd)

    # Same leaf count as a fresh init (no silent drops).
    init = G3.init(jax.random.PRNGKey(0))
    assert len(jax.tree_util.tree_leaves(params)) == \
        len(jax.tree_util.tree_leaves(init))

    z = rng.randn(2, zdim).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.as_tensor(z), None, noise_mode="const").numpy()
    got = np.asarray(G3(params, jnp.asarray(z), None))
    np.testing.assert_allclose(got, want, atol=3e-3,
                               rtol=1e-3)
