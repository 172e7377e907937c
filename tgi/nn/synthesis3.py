"""StyleGAN3 alias-free generator (SG3-backbone capability tier).

Behavioral parity target: training/networks_stylegan3.py — SynthesisInput
(Fourier features under a learned similarity transform), SynthesisLayer
(magnitude-EMA-normalized modulated conv + filtered leaky ReLU with Kaiser
lowpass up/down filters), SynthesisNetwork (geometric cutoff progression),
Generator. The shipped EG3D pickles use the SG2 path; SG3 is included so
SG3-backbone checkpoints load and run (SURVEY.md section 2.4).

TPU-first notes: the per-layer filters/padding are static trace-time
constants; modulated conv uses the unfused activation-scaling form (see
tgi.nn.layers.modulated_conv2d); magnitude EMA updates are returned
functionally.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import scipy.signal
import scipy.special

import jax
import jax.numpy as jnp

from tgi.nn.layers import fully_connected_apply, fully_connected_init
from tgi.ops import filtered_lrelu
from tgi.ops.conv2d_resample import _conv2d


def design_lowpass_filter(numtaps, cutoff, width, fs, radial=False):
    """Kaiser/jinc lowpass design (networks_stylegan3.py:377-398)."""
    if numtaps == 1:
        return None
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width,
                                fs=fs)
        return np.asarray(f, np.float32)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[r == 0] = cutoff  # limit of j1(2c·πr)/(πr) as r->0 is c... scaled below
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f *= np.outer(w, w)
    f /= np.sum(f)
    return np.asarray(f, np.float32)


@dataclass(frozen=True)
class SG3LayerSpec:
    is_torgb: bool
    is_critically_sampled: bool
    use_fp16: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: int
    out_sampling_rate: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int
    up_factor: int
    down_factor: int
    padding: tuple
    up_filter: tuple | None
    down_filter: tuple | None
    conv_clamp: float = 256.0

    @staticmethod
    def build(is_torgb, is_critically_sampled, use_fp16, in_channels,
              out_channels, in_size, out_size, in_sampling_rate,
              out_sampling_rate, in_cutoff, out_cutoff, in_half_width,
              out_half_width, conv_kernel=3, filter_size=6,
              lrelu_upsampling=2, use_radial_filters=False):
        tmp = max(in_sampling_rate, out_sampling_rate) * \
            (1 if is_torgb else lrelu_upsampling)
        k = 1 if is_torgb else conv_kernel
        up_factor = int(np.rint(tmp / in_sampling_rate))
        up_taps = filter_size * up_factor if up_factor > 1 and not is_torgb \
            else 1
        up_filter = design_lowpass_filter(up_taps, in_cutoff,
                                          in_half_width * 2, tmp)
        down_factor = int(np.rint(tmp / out_sampling_rate))
        down_taps = filter_size * down_factor \
            if down_factor > 1 and not is_torgb else 1
        down_radial = use_radial_filters and not is_critically_sampled
        down_filter = design_lowpass_filter(down_taps, out_cutoff,
                                            out_half_width * 2, tmp,
                                            radial=down_radial)
        pad_total = (out_size - 1) * down_factor + 1
        pad_total -= (in_size + k - 1) * up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + up_factor) // 2
        pad_hi = pad_total - pad_lo
        return SG3LayerSpec(
            is_torgb, is_critically_sampled, use_fp16, in_channels,
            out_channels, in_size, out_size, in_sampling_rate,
            out_sampling_rate, in_cutoff, out_cutoff, in_half_width,
            out_half_width, k, up_factor, down_factor,
            (int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi)),
            tuple(up_filter.tolist()) if up_filter is not None else None,
            tuple(down_filter.tolist()) if down_filter is not None else None)


@dataclass(frozen=True)
class SG3Config:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25
    num_fp16_res: int = 4
    mapping_layers: int = 2

    @property
    def num_ws(self):
        return self.num_layers + 2

    def layer_specs(self):
        """Geometric cutoff progression (networks_stylegan3.py:430-443)."""
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exps = np.minimum(np.arange(self.num_layers + 1)
                          / (self.num_layers - self.num_critical), 1)
        cutoffs = self.first_cutoff * \
            (last_cutoff / self.first_cutoff) ** exps
        stopbands = self.first_stopband * \
            (last_stopband / self.first_stopband) ** exps
        srates = np.exp2(np.ceil(np.log2(np.minimum(
            stopbands * 2, self.img_resolution))))
        half_widths = np.maximum(stopbands, srates / 2) - cutoffs
        sizes = srates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(np.minimum((self.channel_base / 2) / cutoffs,
                                      self.channel_max))
        channels[-1] = self.img_channels
        specs = []
        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            specs.append(SG3LayerSpec.build(
                is_torgb=(idx == self.num_layers),
                is_critically_sampled=(idx >= self.num_layers
                                       - self.num_critical),
                use_fp16=(srates[idx] * (2 ** self.num_fp16_res)
                          > self.img_resolution),
                in_channels=int(channels[prev]),
                out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=int(srates[prev]),
                out_sampling_rate=int(srates[idx]),
                in_cutoff=cutoffs[prev], out_cutoff=cutoffs[idx],
                in_half_width=half_widths[prev],
                out_half_width=half_widths[idx]))
        self_input = dict(channels=int(channels[0]), size=int(sizes[0]),
                          sampling_rate=float(srates[0]),
                          bandwidth=float(cutoffs[0]))
        return self_input, specs


# ---------------------------------------------------------------------------
# SynthesisInput


def synthesis_input_init(key, w_dim, channels, bandwidth):
    k_f, k_p, k_w, k_a = jax.random.split(key, 4)
    freqs = jax.random.normal(k_f, (channels, 2))
    radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
    freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25) * bandwidth
    phases = jax.random.uniform(k_p, (channels,)) - 0.5
    affine = fully_connected_init(k_a, w_dim, 4)
    affine["weight"] = jnp.zeros_like(affine["weight"])
    affine["bias"] = jnp.asarray([1., 0., 0., 0.])
    return {
        "weight": jax.random.normal(k_w, (channels, channels)),
        "affine": affine,
        "freqs": freqs,
        "phases": phases,
        "transform": jnp.eye(3),
    }


def synthesis_input_apply(params, w, *, channels, size, sampling_rate,
                          bandwidth):
    """Fourier-feature input grid (networks_stylegan3.py:201-246)."""
    N = w.shape[0]
    transforms = params["transform"][None]
    freqs = params["freqs"][None]
    phases = params["phases"][None]

    t = fully_connected_apply(params["affine"], w)
    t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
    m_r = jnp.tile(jnp.eye(3)[None], (N, 1, 1))
    m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
    m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
    m_t = jnp.tile(jnp.eye(3)[None], (N, 1, 1))
    m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
    transforms = m_r @ m_t @ transforms

    phases = phases + jnp.einsum("ncx,nxo->nco", freqs,
                                 transforms[:, :2, 2:])[..., 0]
    freqs = jnp.einsum("ncx,nxy->ncy", freqs, transforms[:, :2, :2])
    amplitudes = jnp.clip(
        1 - (jnp.linalg.norm(freqs, axis=2) - bandwidth)
        / (sampling_rate / 2 - bandwidth), 0, 1)

    # align_corners=False affine grid over [size, size].
    half = 0.5 * size / sampling_rate
    lin = (jnp.arange(size) + 0.5) / size * 2 - 1
    gy, gx = jnp.meshgrid(lin * half, lin * half, indexing="ij")
    grid = jnp.stack([gx, gy], axis=-1)                      # [S, S, 2]

    x = jnp.einsum("hwx,ncx->nhwc", grid, freqs)
    x = x + phases[:, None, None, :]
    x = jnp.sin(x * (2 * math.pi)) * amplitudes[:, None, None, :]
    weight = params["weight"] / math.sqrt(channels)
    x = x @ weight.T
    return jnp.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# SynthesisLayer


def sg3_layer_init(key, spec: SG3LayerSpec, w_dim):
    k_a, k_w = jax.random.split(key)
    return {
        "affine": fully_connected_init(k_a, w_dim, spec.in_channels,
                                       bias_init=1.0),
        "weight": jax.random.normal(
            k_w, (spec.out_channels, spec.in_channels, spec.conv_kernel,
                  spec.conv_kernel)),
        "bias": jnp.zeros((spec.out_channels,)),
        "magnitude_ema": jnp.ones(()),
    }


def sg3_layer_apply(params, x, w, spec: SG3LayerSpec, *, force_fp32=True,
                    fused_dtype="float32"):
    styles = fully_connected_apply(params["affine"], w)
    if spec.is_torgb:
        styles = styles / math.sqrt(spec.in_channels
                                    * spec.conv_kernel ** 2)
    input_gain = jax.lax.rsqrt(params["magnitude_ema"])

    weight = params["weight"]
    demodulate = not spec.is_torgb
    if demodulate:
        weight = weight * jax.lax.rsqrt(
            jnp.mean(jnp.square(weight), axis=(1, 2, 3), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))

    dcoefs = None
    if demodulate:
        w2 = jnp.square(weight).reshape(weight.shape[0], weight.shape[1],
                                        -1).sum(-1)
        dcoefs = jax.lax.rsqrt(jnp.square(styles) @ w2.T + 1e-8)

    dtype = (jnp.dtype(fused_dtype)
             if spec.use_fp16 and not force_fp32 else jnp.float32)
    x = x.astype(dtype)
    x = x * (styles * input_gain).astype(dtype)[:, :, None, None]
    x = _conv2d(x, weight.astype(dtype), padding=spec.conv_kernel - 1)
    if demodulate:
        x = x * dcoefs.astype(dtype)[:, :, None, None]

    gain = 1.0 if spec.is_torgb else math.sqrt(2)
    slope = 1.0 if spec.is_torgb else 0.2
    fu = np.asarray(spec.up_filter, np.float32) \
        if spec.up_filter is not None else None
    fd = np.asarray(spec.down_filter, np.float32) \
        if spec.down_filter is not None else None
    x = filtered_lrelu(x, fu=fu, fd=fd, b=params["bias"].astype(x.dtype),
                       up=spec.up_factor, down=spec.down_factor,
                       padding=list(spec.padding), gain=gain, slope=slope,
                       clamp=spec.conv_clamp)
    return x


# ---------------------------------------------------------------------------
# Network / Generator


def sg3_synthesis_init(key, cfg: SG3Config):
    input_kw, specs = cfg.layer_specs()
    keys = jax.random.split(key, len(specs) + 1)
    params = {"input": synthesis_input_init(
        keys[0], cfg.w_dim, input_kw["channels"], input_kw["bandwidth"])}
    for i, (k, spec) in enumerate(zip(keys[1:], specs)):
        params[f"L{i}"] = sg3_layer_init(k, spec, cfg.w_dim)
    return params


def sg3_synthesis_apply(params, ws, cfg: SG3Config, **kw):
    input_kw, specs = cfg.layer_specs()
    x = synthesis_input_apply(params["input"], ws[:, 0], **input_kw)
    for i, spec in enumerate(specs):
        x = sg3_layer_apply(params[f"L{i}"], x, ws[:, i + 1], spec, **kw)
    if cfg.output_scale != 1:
        x = x * cfg.output_scale
    return x.astype(jnp.float32)


class SG3Generator:
    """z -> alias-free image; drop-in SG3 counterpart of the SG2 backbone."""

    def __init__(self, cfg: SG3Config = SG3Config()):
        self.cfg = cfg

    def init(self, key):
        from tgi.nn.mapping import mapping_network_init
        k_m, k_s = jax.random.split(key)
        return {
            "mapping": mapping_network_init(
                k_m, self.cfg.z_dim, self.cfg.c_dim, self.cfg.w_dim,
                self.cfg.num_ws, num_layers=self.cfg.mapping_layers),
            "synthesis": sg3_synthesis_init(k_s, self.cfg),
        }

    def mapping(self, params, z, c, **kw):
        from tgi.nn.mapping import mapping_network_apply
        return mapping_network_apply(
            params["mapping"], z, c, z_dim=self.cfg.z_dim,
            c_dim=self.cfg.c_dim, num_ws=self.cfg.num_ws,
            num_layers=self.cfg.mapping_layers, **kw)

    def synthesis(self, params, ws, **kw):
        return sg3_synthesis_apply(params["synthesis"], ws, self.cfg, **kw)

    def __call__(self, params, z, c, truncation_psi=1.0, **kw):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi)
        return self.synthesis(params, ws, **kw)
