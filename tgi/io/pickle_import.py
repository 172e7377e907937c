"""Import reference EG3D/3DGAN-Inversion pickles into tgi pytrees.

The reference pickles carry *source code* next to the weights
(torch_utils/persistence.py:37-60: every module reduces to
``_reconstruct_persistent_obj(meta)`` with
``meta = {type, version, module_src, class_name, state}``). Executing that
embedded code would drag in the whole CUDA-centric reference runtime, so
this loader never runs it: a custom Unpickler intercepts the reconstruct
hook and captures ``state`` (the nn.Module ``__dict__`` with _parameters /
_buffers / _modules) into lightweight nodes. Tensor deserialization is
fully torch-free: the legacy storage payloads that torch embeds via
``torch.storage._load_from_bytes`` are re-parsed here by a restricted
reader (``_safe_load_from_bytes``) — calling the real torch hook would
hand attacker-controlled bytes to an unrestricted nested ``torch.load``,
defeating the allowlist. Everything is exported as numpy.

The name map to tgi params is a pure rename — tgi layer pytrees were
designed to mirror the reference state_dict (SURVEY.md section 7 step 2).
"""

from __future__ import annotations

import io
import pickle
import struct
from typing import Any

import numpy as np


class CapturedModule:
    """Stand-in for a persistent-class instance: holds the raw state."""

    def __init__(self, meta: dict):
        self.class_name = meta.get("class_name")
        self.state = meta.get("state", {})

    @property
    def init_args(self):
        return self.state.get("_init_args", ())

    @property
    def init_kwargs(self):
        return dict(self.state.get("_init_kwargs", {}))

    def submodules(self):
        return dict(self.state.get("_modules", {}) or {})

    def parameters_and_buffers(self):
        out = {}
        for src in ("_parameters", "_buffers"):
            for name, t in (self.state.get(src, {}) or {}).items():
                if t is not None:
                    out[name] = t
        return out

    def __repr__(self):
        return f"CapturedModule({self.class_name})"


def _reconstruct_captured(meta):
    return CapturedModule(meta)


class _EasyDict(dict):
    """Attribute-style dict standing in for dnnlib.EasyDict in pickles."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


class StubModule:
    """Permissive stand-in for non-persistent reference classes (e.g.
    OSGDecoder, triplane.py:113 has no @persistent_class): absorbs any
    constructor args and keeps the pickled state in ``__dict__`` so the
    generic tree walk below can still reach its parameters."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


def _make_stub(module, name):
    return type(name, (StubModule,), {"_source": f"{module}.{name}"})


# ---------------------------------------------------------------------------
# Torch-free tensor deserialization.
#
# Plain-pickled torch tensors reduce to
# ``torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)``
# where ``storage`` itself reduces to
# ``torch.storage._load_from_bytes(b)`` with ``b`` a complete *legacy*
# (non-zipfile) torch.save stream (TypedStorage.__reduce__ passes
# _use_new_zipfile_serialization=False). The real _load_from_bytes calls
# an unrestricted ``torch.load`` on those bytes — a crafted pickle could
# REDUCE it with attacker bytes and reach arbitrary code execution. The
# stand-ins below re-parse that stream with the same restricted policy
# instead, so no torch code runs during unpickling at all.


def _np_bfloat16():
    import ml_dtypes  # jax dependency, always present

    return np.dtype(ml_dtypes.bfloat16)


_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


class _StorageType:
    """Marker for a torch storage class GLOBAL inside the legacy stream."""

    def __init__(self, name):
        self.name = name

    @property
    def np_dtype(self):
        if self.name == "BFloat16Storage":
            return _np_bfloat16()
        return _STORAGE_DTYPES[self.name]


class _Storage:
    """Deserialized storage: a flat numpy array."""

    def __init__(self, np_dtype, numel):
        self.np_dtype = np_dtype
        self.numel = numel
        self.array = None  # filled when the raw data section is read


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _LegacyStreamUnpickler(pickle.Unpickler):
    """Restricted unpickler for the pickles inside a legacy torch.save
    stream (magic/protocol/sysinfo/object/keys). Only storage-class
    globals and OrderedDict resolve; persistent ids allocate storages."""

    def __init__(self, f, storages):
        super().__init__(f)
        self._storages = storages

    def find_class(self, module, name):
        if module in ("torch", "torch.storage") and (
                name in _STORAGE_DTYPES or name == "BFloat16Storage"):
            return _StorageType(name)
        if (module, name) == ("collections", "OrderedDict"):
            import collections

            return collections.OrderedDict
        return _make_stub(module, name)

    def persistent_load(self, pid):
        # ('storage', storage_type, root_key, location, numel[, view_meta])
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        storage_type, root_key, _location, numel = pid[1:5]
        if root_key not in self._storages:
            self._storages[root_key] = _Storage(storage_type.np_dtype, numel)
        return self._storages[root_key]


def _safe_load_from_bytes(b):
    """Parse a legacy torch.save stream into a _Storage (torch-free).

    Format (torch/serialization.py _legacy_save): four pickles — magic
    number, protocol version, sys info, the object — then a pickle of the
    serialized storage keys, then per key: int64 numel + raw data.
    """
    f = io.BytesIO(bytes(b))
    storages: dict = {}

    def load_one():
        return _LegacyStreamUnpickler(f, storages).load()

    magic = load_one()
    if magic != _LEGACY_MAGIC:
        raise pickle.UnpicklingError(
            "embedded storage payload is not a legacy torch.save stream")
    load_one()  # protocol version
    load_one()  # sys info
    obj = load_one()
    keys = load_one()
    for key in keys:
        st = storages[key]
        (numel,) = struct.unpack("<q", f.read(8))
        nbytes = numel * st.np_dtype.itemsize
        raw = f.read(nbytes)
        if len(raw) != nbytes:
            raise pickle.UnpicklingError("truncated storage data section")
        st.array = np.frombuffer(raw, dtype=st.np_dtype)
    return obj


def _safe_rebuild_tensor_v2(storage, storage_offset, size, stride, *args):
    """torch._utils._rebuild_tensor_v2 stand-in -> numpy array (copied
    out of the storage buffer; strides are in elements)."""
    base = storage.array
    itemsize = base.dtype.itemsize
    arr = np.ndarray(
        shape=tuple(size), dtype=base.dtype, buffer=base,
        offset=storage_offset * itemsize,
        strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(arr)


def _safe_rebuild_tensor(storage, storage_offset, size, stride):
    return _safe_rebuild_tensor_v2(storage, storage_offset, size, stride)


def _safe_rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


# Exact (module, name) pairs required to deserialize tensors/arrays. A
# broader prefix allowlist (e.g. all of 'builtins' or 'torch*') would let
# a crafted pickle reach exec/eval or the untrusted torch_utils package
# via REDUCE — everything outside this set becomes an inert stub. Torch
# hooks never resolve to torch itself: they map to the torch-free
# stand-ins above.
_SAFE_CLASSES = {
    ("collections", "OrderedDict"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("_codecs", "encode"),
}
_TORCH_STANDINS = {
    ("torch._utils", "_rebuild_tensor"): _safe_rebuild_tensor,
    ("torch._utils", "_rebuild_tensor_v2"): _safe_rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _safe_rebuild_parameter,
    ("torch.storage", "_load_from_bytes"): _safe_load_from_bytes,
    ("torch", "Size"): tuple,
}


class _TFNetworkStub(_EasyDict):
    """Marker for dnnlib.tflib.network.Network entries (TF-era pickles,
    legacy.py:64-66)."""


class ReferenceUnpickler(pickle.Unpickler):
    """Unpickler that captures persistent modules instead of executing
    their embedded source, and never resolves classes outside the exact
    tensor-deserialization allowlist above."""

    def find_class(self, module, name):
        if name == "_reconstruct_persistent_obj":
            return _reconstruct_captured
        if module == "dnnlib.tflib.network" and name == "Network":
            return _TFNetworkStub
        if (module, name) == ("dnnlib", "EasyDict") or name == "EasyDict":
            return _EasyDict
        if (module, name) in _TORCH_STANDINS:
            return _TORCH_STANDINS[(module, name)]
        if (module, name) in _SAFE_CLASSES:
            return super().find_class(module, name)
        # Anything else (reference package code, builtins, torch_utils…):
        # a permissive stub that preserves state without importing or
        # executing anything.
        return _make_stub(module, name)


def load_network_pkl(path_or_bytes) -> dict:
    """Load a reference pickle; returns the raw dict with CapturedModule
    values for G/D/G_ema (plus any plain entries).

    TF-era pickles (a (G, D, Gs) tuple of tflib Networks, legacy.py:28-33)
    predate the tri-plane generator, so their networks are converted into
    tgi's standalone 2D StyleGAN2 family instead (tgi.io.legacy_tf mirrors
    the reference convert_tf_generator/_discriminator mapping): the dict
    entries come back as ConvertedSG2 (config + params), ready for
    tgi.models.stylegan2. Modern pickles (including force-fp16 variants)
    load natively as CapturedModule trees.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = ReferenceUnpickler(io.BytesIO(path_or_bytes)).load()
    else:
        with open(path_or_bytes, "rb") as f:
            data = ReferenceUnpickler(f).load()
    if isinstance(data, tuple) and len(data) == 3 and \
            all(isinstance(net, _TFNetworkStub) for net in data):
        from tgi.io.legacy_tf import convert_tf_network_tuple

        return convert_tf_network_tuple(data)
    if not isinstance(data, dict):
        raise ValueError(
            f"unrecognized network pickle payload: {type(data).__name__} "
            "(expected a dict with G/D/G_ema entries)")
    # legacy.py:36-40 'add missing fields'
    data.setdefault("training_set_kwargs", None)
    data.setdefault("augment_pipe", None)
    return data


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _module_state(obj):
    """(params_and_buffers, submodules) for CapturedModule, StubModule or a
    real torch nn.Module — all keep nn.Module's __dict__ layout."""
    if isinstance(obj, CapturedModule):
        d = obj.state
    else:
        d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict) or "_modules" not in d:
        return None
    tensors = {}
    for src in ("_parameters", "_buffers"):
        for name, t in (d.get(src) or {}).items():
            if t is not None:
                tensors[name] = t
    return tensors, dict(d.get("_modules") or {})


def captured_state_dict(cap, prefix: str = "") -> dict:
    """Flatten a captured module tree to {dotted_name: numpy array}.

    Walks persistent CapturedModules, stubbed plain modules and real torch
    modules (e.g. nn.Sequential) uniformly.
    """
    out = {}
    state = _module_state(cap)
    if state is None:
        return out
    tensors, modules = state
    for name, t in tensors.items():
        out[prefix + name] = _to_numpy(t)
    for name, sub in modules.items():
        if sub is not None:
            out.update(captured_state_dict(sub, prefix + name + "."))
    return out


# ---------------------------------------------------------------------------
# state_dict -> tgi params


def _nest(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_generator_params(state_dict: dict) -> dict:
    """Map a reference TriPlaneGenerator state_dict to the tgi params tree.

    Accepts {dotted_name: numpy}; returns the nested params dict consumed
    by tgi.models.TriPlaneGenerator. Filter buffers (resample_filter) are
    recomputed constants and skipped.
    """
    import jax.numpy as jnp

    params: dict = {}
    for name, value in state_dict.items():
        parts = name.split(".")
        if parts[-1] == "resample_filter":
            continue
        v = jnp.asarray(np.asarray(value), dtype=jnp.float32)

        if parts[0] == "backbone" and parts[1] == "mapping":
            # backbone.mapping.fc0.weight -> mapping.fc0.weight
            _nest(params, ["mapping"] + parts[2:], v)
        elif parts[0] == "backbone" and parts[1] == "synthesis":
            # backbone.synthesis.b64.conv0.affine.weight -> backbone.b64...
            _nest(params, ["backbone"] + parts[2:], v)
        elif parts[0] == "superresolution":
            _nest(params, parts, v)
        elif parts[0] == "decoder":
            # decoder.net.0.weight -> decoder.net0.weight;  net.2 -> net1
            idx = {"0": "net0", "2": "net1"}[parts[2]]
            _nest(params, ["decoder", idx, parts[3]], v)
        # anything else (e.g. renderer plane_axes const) is derived state
    return params


def generator_config_from_captured(cap: CapturedModule):
    """Build a GeneratorConfig from the pickled init args/kwargs
    (triplane.py:20-46 signature)."""
    from tgi.models.generator import GeneratorConfig

    args = list(cap.init_args)
    kw = cap.init_kwargs
    names = ["z_dim", "c_dim", "w_dim", "img_resolution", "img_channels"]
    merged = dict(zip(names, args))
    merged.update({k: v for k, v in kw.items() if k in names})
    rendering_kwargs = dict(kw.get("rendering_kwargs", {}))
    mapping_kwargs = dict(kw.get("mapping_kwargs", {}))
    # neural_rendering_resolution is NOT an init kwarg: triplane.py:43
    # initializes it to 64 and training overwrites the attribute (e.g.
    # ffhqrebalanced512-128 ships with 128); it persists in the pickled
    # module __dict__, and G.synthesis renders at that attribute when no
    # explicit resolution is passed (triplane.py:57-60) — so it must be
    # read from the captured state, not defaulted.
    nrr = int(cap.state.get("neural_rendering_resolution", 64))
    return GeneratorConfig(
        z_dim=merged.get("z_dim", 512),
        c_dim=merged.get("c_dim", 25),
        w_dim=merged.get("w_dim", 512),
        img_resolution=merged.get("img_resolution", 512),
        img_channels=merged.get("img_channels", 3),
        channel_base=kw.get("channel_base", 32768),
        channel_max=kw.get("channel_max", 512),
        mapping_layers=mapping_kwargs.get("num_layers", 8),
        sr_num_fp16_res=kw.get("sr_num_fp16_res", 4),
        neural_rendering_resolution=nrr,
        rendering_kwargs=rendering_kwargs,
    )


def load_generator(path, key: str = "G_ema", force_fp16: bool = False):
    """One call: pickle path -> (GeneratorConfig, params pytree).

    ``force_fp16`` mirrors legacy.py:48-60's init-kwargs rewrite
    (num_fp16_res=4, conv_clamp=256): in tgi, mixed precision is a config
    switch, so the rewrite is ``fused_dtype='bfloat16'`` +
    ``sr_num_fp16_res=4`` — no parameter copying needed (weights are
    dtype-independent pytrees).
    """
    import dataclasses

    data = load_network_pkl(path)
    cap = data[key]
    from tgi.io.legacy_tf import ConvertedSG2
    if isinstance(cap, ConvertedSG2):
        raise ValueError(
            "this pickle holds a TF-era 2D StyleGAN2 (no tri-plane "
            "decoder) — it converts to the tgi.models.stylegan2 family, "
            "not TriPlaneGenerator; use load_network_pkl() and "
            "sg2_generator_apply, or tgi.apps.legacy_convert")
    cfg = generator_config_from_captured(cap)
    if force_fp16:
        cfg = dataclasses.replace(cfg, fused_dtype="bfloat16",
                                  sr_num_fp16_res=4)
    params = convert_generator_params(captured_state_dict(cap))
    return cfg, params
